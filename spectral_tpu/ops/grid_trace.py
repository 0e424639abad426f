"""Uniform-grid traced intersection (3D-DDA over the wavefront).

Drop-in alternative to the brute-force ``ops.geometry.trace`` for
many-object scenes: every lane walks the grid front-to-back with masked
DDA steps, testing only the objects binned into its current cell.
State per lane is fixed-size (cell coords, per-axis crossing distances,
best hit), the step loop is a bounded ``while_loop``, and per-cell object
lists are visited in ascending index order so the reference's
lowest-index tie rule is preserved within a cell.

Known divergence from brute force (documented): two objects touching
exactly on a shared cell boundary at identical ``t`` may resolve to the
object in the nearer cell rather than the globally lowest index — a
measure-zero case for real scenes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spectral_tpu.ops.geometry import (
    TraceResult,
    ray_slabs,
    slab_pick,
    sphere_nearest_t,
)
from spectral_tpu.ops.vecmath import Vec3, matrix_rows, rotate
from spectral_tpu.scene.accel import GridStatic, UniformGrid
from spectral_tpu.scene.flatten import OBJ_SPHERE, SceneArrays

_INF = jnp.float32(jnp.inf)


def _intersect_gathered(
    origin: Vec3, direction: Vec3, obj: jax.Array, scene: SceneArrays
):
    """Per-lane single-object intersection with gathered parameters.

    Same math as the broadcast kernels in ``ops.geometry`` (slab for both
    box types via the local transform, quadratic for spheres), evaluated
    for one (ray, object) pair per lane.
    """
    shift = Vec3.from_array(scene.shift).take(obj)
    inv_rows = tuple(r.take(obj) for r in matrix_rows(scene.inv_rot))
    smin = Vec3.from_array(scene.slab_min).take(obj)
    smax = Vec3.from_array(scene.slab_max).take(obj)

    local_o = rotate(inv_rows, origin - shift)
    local_d = rotate(inv_rows, direction)
    t_min, t_max, hit_slab = ray_slabs(local_o, local_d, smin, smax)
    t_box = slab_pick(t_min, t_max)

    sp = Vec3.from_array(scene.sphere_pos).take(obj)
    t_sph, hit_sph = sphere_nearest_t(origin - sp, direction, scene.radius[obj])

    is_sphere = scene.obj_type[obj] == OBJ_SPHERE
    t = jnp.where(is_sphere, t_sph, t_box)
    ok = jnp.where(is_sphere, hit_sph, hit_slab) & (t > 0.0)
    return t, ok


def trace_grid(
    origin: Vec3,
    direction: Vec3,
    scene: SceneArrays,
    grid: UniformGrid,
    static: GridStatic,
) -> TraceResult:
    """Nearest positive hit via DDA grid traversal."""
    rx, ry, rz = static.res
    n = origin.x.shape[0]

    g_lo = Vec3(grid.origin[0], grid.origin[1], grid.origin[2])
    csize = Vec3(grid.cell_size[0], grid.cell_size[1], grid.cell_size[2])
    g_hi = Vec3(
        g_lo.x + csize.x * rx, g_lo.y + csize.y * ry, g_lo.z + csize.z * rz
    )

    t_min, t_max, hit_grid = ray_slabs(
        origin,
        direction,
        g_lo.broadcast_to((n,)),
        g_hi.broadcast_to((n,)),
    )
    t_enter = jnp.fmax(t_min, 0.0)
    active0 = hit_grid & (t_max >= t_enter)

    # entry point nudged inside; cell coordinates clamped to the grid
    p = origin + direction * (t_enter + 1e-6)
    inv_cell = Vec3(grid.inv_cell[0], grid.inv_cell[1], grid.inv_cell[2])

    def cell_of(px, lo, ic, r):
        c = jnp.floor((px - lo) * ic).astype(jnp.int32)
        return jnp.clip(c, 0, r - 1)

    cx = cell_of(p.x, g_lo.x, inv_cell.x, rx)
    cy = cell_of(p.y, g_lo.y, inv_cell.y, ry)
    cz = cell_of(p.z, g_lo.z, inv_cell.z, rz)

    def axis_setup(d, o, lo, cs, c):
        stepa = jnp.where(d >= 0.0, jnp.int32(1), jnp.int32(-1))
        next_b = lo + (c + (d >= 0.0).astype(jnp.int32)).astype(jnp.float32) * cs
        t_axis = (next_b - o) / d  # d == 0 -> +-inf/NaN, sanitized below
        t_axis = jnp.where(jnp.isfinite(t_axis), t_axis, _INF)
        t_delta = jnp.abs(cs / d)
        t_delta = jnp.where(jnp.isfinite(t_delta), t_delta, _INF)
        return stepa, t_axis, t_delta

    sx, tax, tdx = axis_setup(direction.x, origin.x, g_lo.x, csize.x, cx)
    sy, tay, tdy = axis_setup(direction.y, origin.y, g_lo.y, csize.y, cy)
    sz, taz, tdz = axis_setup(direction.z, origin.z, g_lo.z, csize.z, cz)

    best_t0 = jnp.full((n,), _INF)
    best_i0 = jnp.zeros((n,), jnp.int32)
    max_steps = rx + ry + rz + 2

    def cond(state):
        _cx, _cy, _cz, _tax, _tay, _taz, _bt, _bi, active, steps = state
        return jnp.any(active) & (steps < max_steps)

    def body(state):
        cx, cy, cz, tax, tay, taz, best_t, best_i, active, steps = state

        cid = (cx * ry + cy) * rz + cz
        cid = jnp.clip(cid, 0, rx * ry * rz - 1)
        start = grid.cell_start[cid]
        count = grid.cell_start[cid + 1] - start
        count = jnp.where(active, count, 0)
        max_count = jnp.max(count)

        def item_body(m, carry):
            bt, bi = carry
            valid = active & (m < count)
            idx = jnp.clip(start + m, 0, max(static.n_items - 1, 0))
            obj = grid.items[idx]
            t, ok = _intersect_gathered(origin, direction, obj, scene)
            better = valid & ok & (
                (t < bt) | ((t == bt) & (obj < bi))
            )
            return jnp.where(better, t, bt), jnp.where(better, obj, bi)

        best_t, best_i = jax.lax.fori_loop(
            0, max_count, item_body, (best_t, best_i)
        )

        t_exit = jnp.fmin(tax, jnp.fmin(tay, taz))
        finished = best_t <= t_exit

        # DDA advance along the nearest crossing axis
        is_x = (tax <= tay) & (tax <= taz)
        is_y = (~is_x) & (tay <= taz)
        is_z = (~is_x) & (~is_y)
        cx = cx + jnp.where(is_x, sx, 0)
        cy = cy + jnp.where(is_y, sy, 0)
        cz = cz + jnp.where(is_z, sz, 0)
        tax = tax + jnp.where(is_x, tdx, 0.0)
        tay = tay + jnp.where(is_y, tdy, 0.0)
        taz = taz + jnp.where(is_z, tdz, 0.0)

        out = (cx < 0) | (cx >= rx) | (cy < 0) | (cy >= ry) | (cz < 0) | (cz >= rz)
        active = active & (~finished) & (~out)
        return (cx, cy, cz, tax, tay, taz, best_t, best_i, active, steps + 1)

    state = (
        cx, cy, cz, tax, tay, taz, best_t0, best_i0, active0, jnp.int32(0)
    )
    *_rest, best_t, best_i, _active, _steps = jax.lax.while_loop(cond, body, state)

    hit = jnp.isfinite(best_t)
    return TraceResult(best_t, best_i, hit)
