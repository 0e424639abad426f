"""Vectorized ray-primitive intersection and surface normals.

Branchless, mask-based re-design of the reference's intersection and
closest-hit shaders (reference ``src/shader.rs:302-357, 468-650``): every
ray tests every object over a broadcast ``[n_rays, n_objects]`` grid on
the VPU, and the reference's sort-and-take-first becomes a masked argmin.

Semantics notes (compat quirks preserved):

* slab test uses NaN-ignoring min/max (Rust ``f32::min/max`` semantics ->
  ``jnp.fmin/fmax``), strict ``t_max > t_min`` and ``t_max >= 0``
  (reference ``src/shader.rs:531-556``);
* plain boxes intersect in world space against their stored min/max;
  rotated boxes in local space against ``+-half_dim`` after inverse
  rotation (reference ``src/shader.rs:560-579``);
* the reference's outer world-AABB cull (``src/shader.rs:472``) is pure
  CPU early-out; on TPU the exact tests subsume it (the cull can only
  disagree on measure-zero grazing rays), so it is not replicated;
* ``submit_ray`` keeps hits with ``t > 0`` strictly and takes the nearest,
  ties broken by lowest object index (stable sort in the reference,
  first-occurrence argmin here).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spectral_tpu.ops.vecmath import Vec3, matrix_rows, rotate
from spectral_tpu.scene.flatten import (
    OBJ_PLAIN_BOX,
    OBJ_ROTATED_BOX,
    OBJ_SPHERE,
    OBJ_TRIANGLE,
    SceneArrays,
)

F32_DELTA = jnp.float32(1e-5)  # reference src/shader.rs:7
_INF = jnp.float32(jnp.inf)


def ray_slabs(origin: Vec3, direction: Vec3, smin: Vec3, smax: Vec3):
    """Slab-method ray/AABB test (reference ``src/shader.rs:531-556``).

    Returns ``(t_min, t_max, hit)`` where ``hit`` requires ``t_max > t_min``
    (strict, so zero-thickness slabs miss, as in the reference's
    mid-loop early return) and ``t_max >= 0``.
    """
    inv = Vec3(1.0 / direction.x, 1.0 / direction.y, 1.0 / direction.z)

    t_min = jnp.float32(-jnp.inf)
    t_max = jnp.float32(jnp.inf)
    for lo, hi, o, iv in (
        (smin.x, smax.x, origin.x, inv.x),
        (smin.y, smax.y, origin.y, inv.y),
        (smin.z, smax.z, origin.z, inv.z),
    ):
        t1 = (lo - o) * iv
        t2 = (hi - o) * iv
        swap = iv < 0.0
        t_near = jnp.where(swap, t2, t1)
        t_far = jnp.where(swap, t1, t2)
        # Rust f32::max/min ignore NaN operands (0 * inf cases on
        # boundary-grazing axis-parallel rays) -> fmax/fmin.
        t_min = jnp.fmax(t_min, t_near)
        t_max = jnp.fmin(t_max, t_far)

    hit = (t_max > t_min) & (t_max >= 0.0)
    return t_min, t_max, hit


def slab_pick(t_min, t_max):
    """Entry-distance pick shared by both box types (reference
    ``src/shader.rs:329-355``): nearest slab crossing, falling back to the
    exit when the origin is inside."""
    return jnp.where(t_min >= 0.0, t_min, t_max)


def sphere_nearest_t(oc: Vec3, d: Vec3, radius):
    """Nearest non-negative sphere intersection (reference
    ``src/shader.rs:302-327, 508-527``). ``oc`` is origin - center;
    all inputs must already be broadcast to a common shape.

    Returns ``(t, valid)``; the caller applies the strict ``t > 0`` rule.
    """
    a = d.dot(d)
    b = 2.0 * oc.dot(d)
    c = oc.dot(oc) - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    # disc == 0 single-root case coincides with t1 == t2; same select.
    t = jnp.where(t1 >= 0.0, t1, t2)
    return t, (disc >= 0.0) & (t >= 0.0)


def _box_t(origin: Vec3, direction: Vec3, scene: SceneArrays):
    """Entry distance for both box types over ``[n_rays, n_objects]``.

    Plain box pick: ``t_min >= 0 ? t_min : t_max`` (reference
    ``src/shader.rs:329-339``; the outer cull guarantees ``t_max >= 0``).
    Rotated box adds the explicit ``t_max >= 0`` reject
    (``src/shader.rs:340-355``); with the cull folded in, both reduce to
    the same select + validity condition.
    """
    smin = Vec3.from_array(scene.slab_min)  # [O] components
    smax = Vec3.from_array(scene.slab_max)
    shift = Vec3.from_array(scene.shift)
    inv_rows = matrix_rows(scene.inv_rot)  # row Vec3s of [O] components

    # local-space ray per object: [N, O]
    o_rel = Vec3(
        origin.x[:, None] - shift.x[None, :],
        origin.y[:, None] - shift.y[None, :],
        origin.z[:, None] - shift.z[None, :],
    )
    inv_rows_b = tuple(
        Vec3(r.x[None, :], r.y[None, :], r.z[None, :]) for r in inv_rows
    )
    local_o = rotate(inv_rows_b, o_rel)
    d_b = Vec3(direction.x[:, None], direction.y[:, None], direction.z[:, None])
    local_d = rotate(inv_rows_b, d_b)

    smin_b = Vec3(smin.x[None, :], smin.y[None, :], smin.z[None, :])
    smax_b = Vec3(smax.x[None, :], smax.y[None, :], smax.z[None, :])
    t_min, t_max, hit = ray_slabs(local_o, local_d, smin_b, smax_b)

    return slab_pick(t_min, t_max), hit


def triangle_t(origin: Vec3, direction: Vec3, v0: Vec3, e1: Vec3, e2: Vec3):
    """Moller-Trumbore ray/triangle intersection (beyond-reference
    geometry — the reference has only boxes and spheres,
    src/shader.rs:302-357). All inputs broadcast to a common shape.

    Two-sided (both determinant signs accepted); ``t >= 0`` here, the
    caller applies the strict ``t > 0`` rule like every other primitive.
    A zero determinant makes ``inv_det`` inf, which drives u/v/t to
    inf/NaN and the barycentric box conditions reject them — no explicit
    epsilon is needed (NaN comparisons are false).

    Returns ``(t, valid, u, v)`` — the barycentrics feed Phong normal
    interpolation for free (see ``surface_normal``).
    """
    p = direction.cross(e2)
    det = e1.dot(p)
    inv_det = 1.0 / det
    s = origin - v0
    u = s.dot(p) * inv_det
    q = s.cross(e1)
    v = direction.dot(q) * inv_det
    t = e2.dot(q) * inv_det
    valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
    return t, valid, u, v


def _triangle_t(origin: Vec3, direction: Vec3, scene: SceneArrays):
    """Triangle candidates over ``[n_rays, n_objects]`` (triangle rows
    store v0 in ``shift``, e1/e2 in ``slab_min``/``slab_max``)."""
    v0 = Vec3.from_array(scene.shift)
    e1 = Vec3.from_array(scene.slab_min)
    e2 = Vec3.from_array(scene.slab_max)
    b = lambda c: c[None, :]  # noqa: E731
    v0b = Vec3(b(v0.x), b(v0.y), b(v0.z))
    e1b = Vec3(b(e1.x), b(e1.y), b(e1.z))
    e2b = Vec3(b(e2.x), b(e2.y), b(e2.z))
    ob = Vec3(origin.x[:, None], origin.y[:, None], origin.z[:, None])
    db = Vec3(
        direction.x[:, None], direction.y[:, None], direction.z[:, None]
    )
    t, valid, _u, _v = triangle_t(ob, db, v0b, e1b, e2b)
    return t, valid


def _sphere_t(origin: Vec3, direction: Vec3, scene: SceneArrays):
    """Nearest non-negative sphere intersection over ``[n_rays, n_objects]``."""
    sp = Vec3.from_array(scene.sphere_pos)
    oc = Vec3(
        origin.x[:, None] - sp.x[None, :],
        origin.y[:, None] - sp.y[None, :],
        origin.z[:, None] - sp.z[None, :],
    )
    d_b = Vec3(
        direction.x[:, None], direction.y[:, None], direction.z[:, None]
    )
    return sphere_nearest_t(oc, d_b, scene.radius[None, :])


class TraceResult(NamedTuple):
    t: jax.Array  # [N] nearest hit distance (+inf on miss)
    obj_idx: jax.Array  # [N] int32 index of nearest object (0 on miss)
    hit: jax.Array  # [N] bool


# Cap on the [n_rays, n_objects] broadcast intermediates (elements). Above
# this, rays are traced in sequential chunks via lax.map so HBM stays
# bounded for many-object scenes (e.g. the 1000-sphere stress config).
_BROADCAST_BUDGET = 32 * 1024 * 1024


def _trace_dense(origin: Vec3, direction: Vec3, scene: SceneArrays) -> TraceResult:
    t_box, hit_box = _box_t(origin, direction, scene)
    t_sph, hit_sph = _sphere_t(origin, direction, scene)

    is_sphere = (scene.obj_type == OBJ_SPHERE)[None, :]
    t = jnp.where(is_sphere, t_sph, t_box)
    valid = jnp.where(is_sphere, hit_sph, hit_box)
    if OBJ_TRIANGLE in scene.obj_types_static:
        # triangle rows reuse the slab columns for e1/e2, so t_box is
        # garbage there — selected out here (mirroring the sphere select)
        t_tri, hit_tri = _triangle_t(origin, direction, scene)
        is_tri = (scene.obj_type == OBJ_TRIANGLE)[None, :]
        t = jnp.where(is_tri, t_tri, t)
        valid = jnp.where(is_tri, hit_tri, valid)
    valid = valid & (t > 0.0)

    t_all = jnp.where(valid, t, _INF)
    t_hit = jnp.min(t_all, axis=1)
    obj_idx = jnp.argmin(t_all, axis=1).astype(jnp.int32)
    return TraceResult(t_hit, obj_idx, jnp.isfinite(t_hit))


def trace(origin: Vec3, direction: Vec3, scene: SceneArrays) -> TraceResult:
    """The reference's ``submit_ray`` trace phase (``src/shader.rs:468-483``):
    test all objects, keep ``t > 0``, nearest wins (stable ties).

    Rays x objects is evaluated as one dense broadcast when it fits the
    memory budget, otherwise in sequential ray chunks (many-object
    scenes)."""
    n_obj = scene.obj_type.shape[0]
    n = origin.x.shape[0]
    if n_obj == 0:
        return TraceResult(
            jnp.full((n,), _INF),
            jnp.zeros((n,), dtype=jnp.int32),
            jnp.zeros((n,), dtype=bool),
        )
    if n * n_obj <= _BROADCAST_BUDGET:
        return _trace_dense(origin, direction, scene)

    chunk = max(128, _BROADCAST_BUDGET // n_obj)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def pad_split(a):
        return jnp.pad(a, (0, pad)).reshape(n_chunks, chunk)

    o = Vec3(pad_split(origin.x), pad_split(origin.y), pad_split(origin.z))
    d = Vec3(pad_split(direction.x), pad_split(direction.y), pad_split(direction.z))

    def body(args):
        oc, dc = args
        r = _trace_dense(oc, dc, scene)
        return r.t, r.obj_idx, r.hit

    t, idx, hit = jax.lax.map(body, (o, d))
    return TraceResult(
        t.reshape(-1)[:n], idx.reshape(-1)[:n], hit.reshape(-1)[:n]
    )


def trace_shadow(
    origin: Vec3, direction: Vec3, max_distance, scene: SceneArrays
) -> jax.Array:
    """Occlusion query: true iff the *nearest* positive hit lies within
    ``max_distance`` (reference shadow-ray handling,
    ``src/shader.rs:484-489``: ``skip_hit_shader`` + ``max_hit_distance``)."""
    res = trace(origin, direction, scene)
    return res.hit & (res.t <= max_distance)


# --------------------------------------------------------------- normals


def _plain_box_normal(ip: Vec3, amin: Vec3, amax: Vec3) -> Vec3:
    """Face normal from proximity to the AABB planes (reference
    ``src/shader.rs:582-605``): min-face checked first, then max-face."""
    def axis(p, lo, hi):
        return jnp.where(
            jnp.abs(p - lo) < F32_DELTA,
            jnp.float32(-1.0),
            jnp.where(jnp.abs(p - hi) < F32_DELTA, jnp.float32(1.0), jnp.float32(0.0)),
        )

    n = Vec3(axis(ip.x, amin.x, amax.x), axis(ip.y, amin.y, amax.y),
             axis(ip.z, amin.z, amax.z))
    return n.normalize()


def _rotated_box_normal(
    ip: Vec3, pos: Vec3, half: Vec3, rot_rows, inv_rows
) -> Vec3:
    """Closest-face normal in local space, rotated back to world
    (reference ``src/shader.rs:608-650``). The face scan order and strict
    ``<`` comparisons are preserved so face ties resolve identically."""
    local = rotate(inv_rows, ip - pos)

    dx = jnp.abs(half.x - local.x)
    dy = jnp.abs(half.y - local.y)
    dz = jnp.abs(half.z - local.z)
    dxn = jnp.abs(-half.x - local.x)
    dyn = jnp.abs(-half.y - local.y)
    dzn = jnp.abs(-half.z - local.z)

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    min_dist = dx
    n = Vec3(jnp.broadcast_to(one, dx.shape), jnp.broadcast_to(zero, dx.shape),
             jnp.broadcast_to(zero, dx.shape))
    for dist, cand in (
        (dxn, Vec3(-one, zero, zero)),
        (dy, Vec3(zero, one, zero)),
        (dyn, Vec3(zero, -one, zero)),
        (dz, Vec3(zero, zero, one)),
        (dzn, Vec3(zero, zero, -one)),
    ):
        closer = dist < min_dist
        cand_b = Vec3(
            jnp.broadcast_to(cand.x, dx.shape),
            jnp.broadcast_to(cand.y, dx.shape),
            jnp.broadcast_to(cand.z, dx.shape),
        )
        n = cand_b.where(closer, n)
        min_dist = jnp.fmin(min_dist, dist)

    return rotate(rot_rows, n)


def surface_normal(
    ip: Vec3,
    obj_idx: jax.Array,
    scene: SceneArrays,
    origin: Vec3 | None = None,
    direction: Vec3 | None = None,
) -> Vec3:
    """Per-ray surface normal at hit points (reference ``hit_shader``
    normal dispatch, ``src/shader.rs:366-378``).

    ``origin``/``direction`` (the ray that produced ``ip``) enable the
    triangle shading normal: the Moller-Trumbore barycentrics are
    recomputed for the winning row (identical op order to the trace) and
    interpolate ``normalize(n0 + u*dn1 + v*dn2)`` — Phong smooth shading
    when the mesh carries vertex normals, the flat winding normal
    otherwise (zero deltas). Without the ray, triangles fall back to the
    stored flat normal."""
    amin = Vec3.from_array(scene.aabb_min).take(obj_idx)
    amax = Vec3.from_array(scene.aabb_max).take(obj_idx)
    pos = Vec3.from_array(scene.center).take(obj_idx)
    half = Vec3.from_array(scene.half_dim).take(obj_idx)
    sp = Vec3.from_array(scene.sphere_pos).take(obj_idx)
    rot_rows = tuple(r.take(obj_idx) for r in matrix_rows(scene.rot))
    inv_rows = tuple(r.take(obj_idx) for r in matrix_rows(scene.inv_rot))
    otype = scene.obj_type[obj_idx]

    n_box = _plain_box_normal(ip, amin, amax)
    n_sphere = (ip - sp).normalize()
    n_rot = _rotated_box_normal(ip, pos, half, rot_rows, inv_rows)

    n = n_box.where(otype == OBJ_PLAIN_BOX, n_rot)
    n = n_sphere.where(otype == OBJ_SPHERE, n)
    if OBJ_TRIANGLE in scene.obj_types_static:
        # triangle: inv_rot rows carry (n0, n1-n0, n2-n0) — winding
        # normal with zero deltas for flat meshes, vertex normals for
        # smooth ones. Never ray-flipped, matching the reference's
        # geometric-normal convention.
        n0, dn1, dn2 = inv_rows
        if (
            scene.smooth_tri_static
            and origin is not None
            and direction is not None
        ):
            v0 = Vec3.from_array(scene.shift).take(obj_idx)
            e1 = Vec3.from_array(scene.slab_min).take(obj_idx)
            e2 = Vec3.from_array(scene.slab_max).take(obj_idx)
            _t, _ok, u, v = triangle_t(origin, direction, v0, e1, e2)
            n_tri = (n0 + dn1 * u + dn2 * v).normalize()
        else:
            n_tri = n0  # flat meshes: the exact stored winding normal
        n = n_tri.where(otype == OBJ_TRIANGLE, n)
    return n
