"""Whole-frame wavefront megakernel (Pallas / Mosaic TPU).

The performance-critical re-design of the bounce loop: where the jnp
integrator (``spectral_tpu.render.integrator``) round-trips every
``[n_rays, n_lambda]`` state array through HBM once per bounce (~6 GB per
512x512x32 frame), this kernel keeps a tile of rays — origins, directions,
spectral throughput, radiance accumulator, masks — resident in VMEM for
the *entire* bounce loop. HBM traffic per frame drops to one read of the
primary rays and one write of the radiance (~90 MB), an ~8x reduction in
memory volume on the dominant cost.

Layout: lanes are tiled ``[R8, 128]`` (full (8,128) VPU tiles); spectra
are ``[S, R8, 128]`` — the wavelength axis is a leading batch dimension
and every spectral op is an unrolled loop over ``S`` fully-packed VPU
ops. Per-object scene constants are scalar VMEM reads; per-object code is
specialized at build time on the (static) object type list, so there is
no runtime type dispatch.

Two occupancy harvesters are built in: *path regeneration*
(``regen_frames=K`` — terminating lanes immediately start the same
pixel's next progressive frame, retiring K frames per launch; measured
1.43-1.48x on the BASELINE configs) and the *bounce-segmented* kernel
(``state_io`` — the phased/cascade compaction pipeline's building block).

Mosaic workarounds (verified on v5e):
* no uint32<->float32 casts -> exact conversion via 16-bit halves
  (``_u32_to_f32``; single final rounding, bit-identical to Rust
  ``u32 as f32``);
* no ``asin`` -> the cosine-hemisphere sampler uses the algebraic
  identities ``sin(asin(sqrt(x))) == sqrt(x)``, ``cos == sqrt(1-x)``
  (documented micro-divergence from the jnp path; both land within the
  reference's own 1-ulp coin-flip envelope, see
  tests/test_integrator_vs_oracle.py).

The kernel matches the reference semantics bounce-for-bounce (same PCG3D
streams, NEE, specular gate, un-offset diffuse origin quirk) — see
``spectral_tpu.render.integrator`` for the semantic source of truth and
reference citations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectral_tpu.scene.flatten import (
    OBJ_PLAIN_BOX,
    OBJ_ROTATED_BOX,
    OBJ_SPHERE,
    OBJ_TRIANGLE,
    RenderConfig,
    SceneArrays,
)

LANE = 128
DEFAULT_TILE = 8192

_INV_2_32 = np.float32(2.3283064365386963e-10)
_OFFSET = np.float32(1e-5)
_SPEC_MIN = np.float32(1e-4)
_F32_DELTA = np.float32(1e-5)
_PI = np.float32(np.pi)
_INF = np.float32(np.inf)

# geom table row layout ([GEOM_COLS, O] float32 — transposed, see pack_geometry)
_SLAB_MIN = 0  # 0-2
_SLAB_MAX = 3  # 3-5
_SHIFT = 6  # 6-8: rotbox center / sphere center
_INV_ROT = 9  # 9-17 row-major
_ROT = 18  # 18-26 row-major
_RADIUS = 27
_METAL = 28
_ROUGH = 29
_TRANS = 30  # transmission branch probability
_IOR = 31  # Cauchy A
_CAUCHY = 32  # Cauchy B (um^2)
_MATID = 33  # material table index (fori object loop)
_TYPE = 34  # object type tag as f32 (fori object loop)
_ORIG = 35  # original object index as f32 (clustered loop tie rule)
_TEXS = 36  # checker texture cell size (0 = untextured)
_TEXL = 37  # checker dark-cell albedo factor
GEOM_COLS = 38

# poison base for row groups absent from a scene's compact layout: any
# unexpectedly-traced read of an absent group is a loud static IndexError
# instead of a silent wrong-row read
_ABSENT = -(1 << 20)

# cluster-loop auto policy (see build_megakernel's cluster_loop arg): at
# >= this many clustered runs the per-cluster Python-unrolled emission is
# replaced by one lax.fori_loop per uniform streak — the unrolled program
# grows ~linearly in cluster count and faults the scalar core's
# instruction memory near ~100 clusters (mesh5k on v5e), while 16 runs
# (the tuned 1000-sphere config) measured fine. Benchmark tools may pin
# CLUSTER_LOOP_AUTO_OVERRIDE to "static"/"dynamic" for A/B runs.
CLUSTER_LOOP_DYNAMIC_MIN = 24
CLUSTER_LOOP_AUTO_OVERRIDE: str | None = None


def geom_layout(
    obj_types: tuple[int, ...],
    has_transmission: bool,
    has_texture: bool,
) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Static geometry-table ROW layout for a scene's feature set.

    The full 38-row table wastes SMEM on scenes that never read whole row
    groups (no rotated boxes -> the 9 _ROT rows are dead; no transmission
    -> 3 dead rows; the _TYPE row is never read at all — ``obj_types`` is
    static). SMEM is the binding resource for many-object scenes: the
    mesh5k config's full table is 40 x pad128(6405) x 4 = 1020 KB, 15.6 KB
    OVER the 1 MiB budget, while its live rows fit in 612 KB.

    Returns ``(bases, rows)``:

    * ``bases``: compact-table base indices for ``(_SLAB_MIN, _SLAB_MAX,
      _SHIFT, _INV_ROT, _ROT, _RADIUS, _METAL, _ROUGH, _TRANS, _IOR,
      _CAUCHY, _MATID, _ORIG, _TEXS, _TEXL)`` — absent groups get the
      ``_ABSENT`` poison.
    * ``rows``: the full-table row indices kept, in compact order —
      exactly what ``pack_geometry``'s ``layout=`` selects.

    ``build_megakernel`` derives the layout from its own static args and
    shadows the module-level index constants, so every ``geom[_X, o]``
    read site is unchanged; the packing call MUST pass the layout built
    from the same ``(obj_types, has_transmission, has_texture)`` (the
    kernel asserts the row count at trace time)."""
    present = set(obj_types)
    rows: list[int] = []

    def grp(base: int, n: int, need: bool) -> int:
        if not need:
            return _ABSENT
        start = len(rows)
        rows.extend(range(base, base + n))
        return start

    slab = grp(_SLAB_MIN, 6, bool(present - {OBJ_SPHERE}))
    shift = grp(_SHIFT, 3, bool(
        present & {OBJ_SPHERE, OBJ_ROTATED_BOX, OBJ_TRIANGLE}
    ))
    inv_rot = grp(_INV_ROT, 9, bool(
        present & {OBJ_ROTATED_BOX, OBJ_TRIANGLE}
    ))
    rot = grp(_ROT, 9, OBJ_ROTATED_BOX in present)
    radius = grp(_RADIUS, 1, OBJ_SPHERE in present)
    metal = grp(_METAL, 2, True)  # metal + rough
    trans = grp(_TRANS, 3, has_transmission)  # trans + ior + cauchy
    matid = grp(_MATID, 1, True)
    orig = grp(_ORIG, 1, True)
    tex = grp(_TEXS, 2, has_texture)  # texs + texl
    bases = (
        slab, slab + 3, shift, inv_rot, rot, radius,
        metal, metal + 1, trans, trans + 1, trans + 2,
        matid, orig, tex, tex + 1,
    )
    return bases, tuple(rows)


def _u32_to_f32(u):
    """Exact uint32 -> float32 (round-to-nearest), Mosaic-safe."""
    hi = (u >> 16).astype(jnp.int32)
    lo = (u & jnp.uint32(0xFFFF)).astype(jnp.int32)
    return hi.astype(jnp.float32) * jnp.float32(65536.0) + lo.astype(jnp.float32)


def _radical_inverse_m(bits):
    """Mosaic-safe ``ops.rng.radical_inverse``: the same bit reversal,
    with the final uint32 -> float32 conversion routed through 16-bit
    halves (Mosaic has no direct u32->f32 cast; the halved conversion is
    exact round-to-nearest, so values match the host bit-for-bit)."""
    u = jnp.uint32
    bits = (bits >> 16) | (bits << 16)
    bits = ((bits & u(0x55555555)) << 1) | ((bits & u(0xAAAAAAAA)) >> 1)
    bits = ((bits & u(0x33333333)) << 2) | ((bits & u(0xCCCCCCCC)) >> 2)
    bits = ((bits & u(0x0F0F0F0F)) << 4) | ((bits & u(0xF0F0F0F0)) >> 4)
    bits = ((bits & u(0x00FF00FF)) << 8) | ((bits & u(0xFF00FF00)) >> 8)
    return _u32_to_f32(bits) * _INV_2_32


def _pcg3d(x, y, z):
    mul = jnp.uint32(1664525)
    add = jnp.uint32(1013904223)
    x = x * mul + add
    y = y * mul + add
    z = z * mul + add
    x = y * z + x
    y = z * x + y
    z = x * y + z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = y * z + x
    y = z * x + y
    z = x * y + z
    return (
        _u32_to_f32(x) * _INV_2_32,
        _u32_to_f32(y) * _INV_2_32,
        _u32_to_f32(z) * _INV_2_32,
    )


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _slab_t(ox, oy, oz, dx, dy, dz, mnx, mny, mnz, mxx, mxy, mxz):
    """Reference slab test (src/shader.rs:531-556) on a lane tile.
    Returns (t_min, t_max, hit)."""
    t_min = jnp.full_like(ox, -_INF)
    t_max = jnp.full_like(ox, _INF)
    for lo, hi, o, d in ((mnx, mxx, ox, dx), (mny, mxy, oy, dy), (mnz, mxz, oz, dz)):
        inv = 1.0 / d
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        swap = inv < 0.0
        t_near = jnp.where(swap, t2, t1)
        t_far = jnp.where(swap, t1, t2)
        t_min = jnp.fmax(t_min, t_near)
        t_max = jnp.fmin(t_max, t_far)
    hit = (t_max > t_min) & (t_max >= 0.0)
    return t_min, t_max, hit


def _cluster_segments(cluster_runs: tuple, dyn_min: int) -> list:
    """Partition ``cluster_runs`` into code-emission segments for the
    clustered object loop.

    A *uniform streak* — consecutive CLUSTERED runs with the same type
    tag, the same member count, and contiguous packed-table columns
    (``start == first_start + k * size``) — of length >= ``dyn_min``
    becomes one ``("dyn", tag, cidx_lo, cidx_hi, base_start, size)``
    segment, compiled as a single ``lax.fori_loop`` over the cluster
    index (program size constant in streak length). Everything else is
    emitted run-by-run as ``("run", cidx, run_tuple)`` exactly like the
    historical static path. ``plan_clusters`` output is uniform by
    construction except at most one ragged tail chunk per type, so a
    scene compiles to O(object types) segments."""
    segs: list = []
    i, n = 0, len(cluster_runs)
    while i < n:
        tag, start, stop, is_cl = cluster_runs[i]
        size = stop - start
        if is_cl and size > 0:
            j = i + 1
            while j < n:
                t2, s2, e2, c2 = cluster_runs[j]
                if not (c2 and t2 == tag and e2 - s2 == size
                        and s2 == start + (j - i) * size):
                    break
                j += 1
            if j - i >= dyn_min:
                segs.append(("dyn", tag, i, j, start, size))
                i = j
                continue
        segs.append(("run", i, cluster_runs[i]))
        i += 1
    return segs


def _grid_tiles(np_lanes: int, tile: int) -> int:
    """Grid size for ``tile``-lane tiles over ``np_lanes`` padded lanes.

    The tiling must cover the planes EXACTLY (and stay 128-lane aligned):
    a ragged tail would silently never be traced — no grid step writes
    its output rows — so validate loudly instead of flooring."""
    if tile % LANE or np_lanes % tile:
        raise ValueError(
            f"{np_lanes} lanes do not tile into {tile}-lane blocks: pad "
            f"the wavefront to a multiple of the tile (and the tile to a "
            f"multiple of {LANE})"
        )
    return np_lanes // tile


def build_megakernel(
    obj_types: tuple[int, ...],
    config: RenderConfig,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    has_transmission: bool = False,
    has_emission: bool = False,
    bounce_start: int = 0,
    bounce_stop: int | None = None,
    state_io: bool = False,
    object_loop: str = "auto",
    regen_frames: int = 1,
    cost_out: bool = False,
    cluster_runs: tuple | None = None,
    member_unroll: int = 8,
    persist: tuple[int, int] | None = None,
    lane_stop: bool = False,
    shadow_interval: bool = False,
    has_texture: bool = False,
    has_sky: bool = False,
    cluster_loop: str = "auto",
):
    """Compile-time specialization on the scene structure.

    Args:
        obj_types: static per-object type tags (the kernel unrolls the
            object loop with per-type code).
        config: static render parameters.
        tile: rays per grid step (multiple of 128).
        has_transmission/has_emission: enable the dielectric branch /
            emissive-surface accumulation (static so reference-style
            scenes pay nothing for the extra physics).
        has_sky: enable environment emission on the alive->miss
            transition (beyond-reference; the upstream miss shader is
            zero, src/shader.rs:460-463). The sky spectrum ships as ONE
            EXTRA ROW appended to the light-spectrum SMEM table at static
            index ``max(n_lights, 1)`` — zero new kernel operands.
        regen_frames: K > 1 enables *in-kernel path regeneration*: when a
            lane's path terminates it immediately starts the SAME pixel's
            next progressive frame (selecting its host-precomputed primary
            direction by the lane's frame counter), retiring K frames per
            launch. Harvests the dead-lane tail of the bounce loop: mean
            live-lane occupancy is ~29% on the cornell512 profile, so a
            lone frame executes ~71% dead work that regeneration converts
            into the following frames' paths. The returned radiance is the
            SUM over the K frames (per lane, frames accumulate in order,
            each path bit-identical to its monolithic rendering; only the
            cross-frame addition order differs from summing K separate
            launches). Requires ``state_io=False`` and full-range bounces.
        persist: ``(ring_slots, budget)`` enables *persistent
            lane-asynchronous regeneration*: every launch runs exactly
            ``budget`` bounce iterations over CARRIED per-lane state
            (ray, throughput, radiance sum, frame id, bounce budget), so
            no tile ever waits for its slowest lane to finish a fixed
            frame window — the regeneration straggler tail (measured
            1.79x E[tile-max]/ideal on the 1000-sphere config, and
            irreducible by any static pixel->lane permutation because
            per-pixel cost is jitter-coupled noise) becomes per-lane
            frame-progress skew absorbed by a ring of ``ring_slots``
            (power of two) host-precomputed primary-direction planes.
            A lane whose path terminates restarts at its own next frame
            ``nf = fid + 1`` if ``nf < lead`` (its primary plane is
            resident in ring slot ``nf & (ring_slots - 1)``) and
            ``nf < end`` (frames still owed); otherwise it idles until a
            later launch advances ``lead``. The host advances ``lead``
            at most to ``min(fid) + ring_slots`` using a one-launch-
            stale min-progress readback, which keeps every resident
            slot's previous occupant unreachable (safe) and the minimum
            lane always able to restart (deadlock-free). Mutually
            exclusive with ``regen_frames``/``state_io``/``cost_out``.

            ``ring_slots=0`` selects the *free-running* variant: there is
            no ring and no ``lead`` gate — a terminated lane recomputes
            its next frame's primary direction IN-KERNEL from
            ``(px, py, nf)`` and the host-packed camera basis (the
            screen-wide-jitter quirk makes raygen elementwise per lane:
            Hammersley of the frame id is pure bit arithmetic). Every
            lane advances through its own frame stream with no global
            coupling, so the trailing-window pathology of the ring
            variant (measured: steady-state throughput gated by the
            single slowest PIXEL on the whole device) disappears; the
            residual straggler is the per-tile max of whole-render cost
            (CV ~ 1/sqrt(n_frames)). In-kernel raygen lands ulps from
            host raygen (cross-program FMA), so free-running renders are
            valid estimator samples but not bit-comparable with
            host-primary paths; launch-split invariance (same total
            budget, different launch boundaries) IS bit-exact. The cam
            table must come from ``pack_camera_basis``.
        lane_stop: accept a per-lane *stop mask* input plane (free-running
            persist only) and gate path restarts on it: a lane whose mask
            is > 0 finishes its in-flight frame and then idles; a tile
            whose lanes are all stopped or done retires via the
            whole-launch skip. This is the kernel half of variance-
            adaptive sampling (a capability the reference lacks — its
            iteration count is fixed up front, reference src/main.rs
            render loop): the HOST decides who stops, at launch
            boundaries, from statistics of the radiance accumulator it
            already owns (see ``render_persistent``). The first, rejected
            design computed the statistics in-kernel with four extra
            loop-carried planes — measured SLOWER than not stopping at
            all (PARITY.md round-3 adaptive ledger); the mask is
            read-only and read in-body, so it adds no live state to the
            bounce loop, and a zero mask is semantically (and in
            interpret mode, bit-) identical to the plain kernel.
        shadow_interval: fori-loop shadow occlusion via a SQRT-FREE
            sign-test predicate instead of computing root values.
            Occlusion only needs "does the chosen root lie in
            (0, maxd]", which for the sphere quadratic
            f(t) = a t^2 + b t + c (a > 0, disc >= 0) — preserving the
            reference's pick-t1-if-t1>=0 quirk (src/shader.rs:508-529)
            — is
            ``(b<0 ∧ c>0 ∧ (vertex<=maxd ∨ f(maxd)<=0))  [t = t1 > 0]
              ∨ (c<0 ∧ vertex<=maxd ∧ f(maxd)>=0)        [t = t2 > 0]``
            with ``vertex<=maxd ⟺ b + 2·a·maxd >= 0`` and the identity
            ``disc - (b + 2·a·maxd)^2 = -4·a·f(maxd)``. This drops the
            sqrt, both root multiplies and the root select from the hot
            many-object shadow loop. NOT bit-identical to the
            root-based test: a lane whose occluder sits within rounding
            of exactly t=0 or t=maxd can flip (f(maxd) is evaluated
            directly, rounding differently than the root), so it is
            opt-in; fori-loop only. MEASURED AND REJECTED as the
            default (v5e, 1000-sphere config, clustered regen K=100:
            37.10 -> 37.65 ms/frame, tools/shadow_interval_bench.py):
            the VPU's pipelined sqrt costs less than the predicate's
            extra compare/select traffic. Kept opt-in with the
            measurement so the negative result stays reproducible.
    Returns:
        fn(ox, oy, oz, dx, dy, dz, px, py, frame_id, geom, cbounds,
           albedo, emission, mat_albedo, mat_emission, mat_scalars,
           light_pos, light_spec) -> radiance [S, NP//128, 128]
        (``cbounds`` is the [8, n_runs] cluster-bounds table; pass a
        [1, 8] zero dummy when ``cluster_runs`` is None)
        (with ``state_io`` the fn also takes/returns the full wavefront
        state, see ``kernel_seg``; with ``regen_frames`` > 1 the fn takes
        a trailing ``cam`` table, see ``pack_camera``)
    """
    if regen_frames > 1 and (state_io or bounce_start != 0 or bounce_stop is not None):
        raise ValueError(
            "regen_frames > 1 needs the monolithic full-bounce kernel "
            "(no state_io / bounce segments)"
        )
    if cost_out and (state_io or regen_frames > 1):
        raise ValueError("cost_out is a monolithic-kernel instrumentation")
    persist_mode = persist is not None
    if persist_mode:
        ring_w, budget = int(persist[0]), int(persist[1])
        if ring_w != 0 and (ring_w < 2 or ring_w & (ring_w - 1)):
            raise ValueError(
                "persist ring_slots must be 0 (free-running, in-kernel "
                "restart raygen) or a power of two >= 2"
            )
        if budget < 1:
            raise ValueError("persist budget must be >= 1")
        if regen_frames > 1 or state_io or cost_out or bounce_start != 0 \
                or bounce_stop is not None:
            raise ValueError(
                "persist needs the monolithic full-bounce kernel (no "
                "regen_frames/state_io/cost_out/bounce segments)"
            )
    else:
        ring_w, budget = 0, 0
    if lane_stop and not (persist_mode and ring_w == 0):
        raise ValueError(
            "lane_stop needs the free-running persist kernel "
            "(persist=(0, budget))"
        )
    # compact geometry-table layout: shadow the module-level row-index
    # constants with this scene's static layout (see geom_layout) — every
    # geom[_X, o] read below resolves to these locals. The packed table
    # must use the same layout; _n_geom_rows is asserted where the table
    # enters the trace.
    (_SLAB_MIN, _SLAB_MAX, _SHIFT, _INV_ROT, _ROT, _RADIUS, _METAL,
     _ROUGH, _TRANS, _IOR, _CAUCHY, _MATID, _ORIG, _TEXS, _TEXL) = (
        geom_layout(obj_types, has_transmission, has_texture)[0]
    )
    _n_geom_rows = len(
        geom_layout(obj_types, has_transmission, has_texture)[1]
    )

    n_obj = len(obj_types)
    n_lights = config.n_lights
    # sky spectrum row: appended after the real lights (a zero-light scene
    # ships a one-row placeholder table, hence the max)
    sky_row = max(n_lights, 1)
    s_dim = config.n_samples
    max_bounces = config.max_bounces
    n_valid = config.width * config.height
    r8 = tile // LANE
    n_materials = config.n_materials
    # object-loop strategy: unrolled per-type code for small scenes (zero
    # runtime dispatch), a fori_loop with runtime type/material selects for
    # many-object scenes (compile size stays constant in n_obj)
    if object_loop == "auto":
        object_loop = "fori" if n_obj > 64 else "unrolled"
    if object_loop not in ("unrolled", "fori"):
        raise ValueError(f"unknown object_loop {object_loop!r}")
    clustered = cluster_runs is not None
    if clustered:
        object_loop = "fori"  # the clustered loop is the fori loop
        covered = sorted(
            i for _t, s, e, _c in cluster_runs for i in range(s, e)
        )
        if covered != list(range(n_obj)):
            raise ValueError("cluster_runs must cover every object exactly once")
        # cluster-LOOP strategy: the static path emits one slab-test +
        # cond + member loop PER CLUSTER (Python-unrolled) — measured
        # fastest on small cluster counts but the Mosaic program grows
        # linearly in cluster count and faults the scalar core's
        # instruction memory at many-cluster scale (mesh5k, ~101 runs:
        # reproducible "TPU device error — kernel fault" on v5e, while
        # the 16-run spheres config runs clean). The dynamic path folds
        # every uniform streak of clusters (same type tag, same member
        # count, contiguous table columns — plan_clusters emits exactly
        # this shape, one ragged tail chunk per type at most) into ONE
        # lax.fori_loop over the cluster index: the member start is
        # affine in the cluster index and the bounds table is read at
        # the traced column, so program size is O(types), not
        # O(clusters). Visit order, cull test and tie rule are
        # unchanged -> results stay bit-identical to the static path
        # (pinned by tests/test_many_objects.py in interpret mode).
        n_cl_runs = sum(1 for r in cluster_runs if r[3])
        if cluster_loop == "auto":
            cluster_loop = CLUSTER_LOOP_AUTO_OVERRIDE or (
                "dynamic" if n_cl_runs >= CLUSTER_LOOP_DYNAMIC_MIN
                else "static"
            )
        if cluster_loop not in ("static", "dynamic"):
            raise ValueError(f"unknown cluster_loop {cluster_loop!r}")
        cl_segments = _cluster_segments(
            cluster_runs, 2 if cluster_loop == "dynamic" else n_cl_runs + 1
        )
    use_fori = object_loop == "fori"
    if shadow_interval and not use_fori:
        raise ValueError(
            "shadow_interval is a fori-object-loop optimization (the "
            "unrolled loop keeps the reference-exact division form)"
        )
    if use_fori and not 0 < n_materials <= 256:
        raise ValueError(
            "the fori object loop selects materials by index and supports "
            f"1..256 distinct materials (scene has {n_materials}); the "
            "select cost is linear in the material count, so consolidate "
            "materials rather than raising the cap"
        )
    # material one-hot masks: precomputed once per bounce for small tables
    # (32 masks = 128 KiB VMEM at a 4096-lane tile); recomputed inline per
    # (material, sample) for big tables so VMEM stays flat in n_materials
    precompute_mat_masks = n_materials <= 32
    # material-indexed shading for the UNROLLED loop: when the scene has
    # fewer materials than objects (cornell: 3 vs 7), select the per-λ
    # albedo/emission rows by the winner's MATERIAL id (n_materials
    # select chains per sample) instead of per-object rows (n_obj
    # chains) — the per-sample select chain dominates the shading loop's
    # arithmetic, and the winner material id costs n_obj selects ONCE
    # per bounce. Bit-identical: mat_albedo rows are bitwise copies of
    # the object rows (flatten.py builds them from the same values), one
    # winner mask is set at most once, and zero-plus-winner f32 sums are
    # order-exact. `_mat_light_tables` mirrors this predicate to ship
    # the material tables instead of the per-object rows.
    mat_shade = object_loop == "unrolled" and 0 < n_materials < n_obj
    # hero-wavelength grid parameters (exact f32 grid reconstruction:
    # lambda_i = lo + f32(step * i), matching flatten._lambda_grid)
    lam_lo = np.float32(config.lambda_lo)
    lam_step = np.float32(
        np.float32(np.float32(config.lambda_hi) - lam_lo)
        / np.float32(s_dim - 1)
    )

    def _candidate_t(geom, o, ox, oy, oz, dx, dy, dz):
        """Per-object candidate hit ``(t, valid)`` for the UNROLLED
        loops, in the reference-exact division form (sphere quadratic
        src/shader.rs:508-529, slab/rotated-box src/shader.rs:530-560).
        ``trace_tile`` pass 1 and ``shadow_blocked`` must stay
        op-for-op identical — a numerics or tie-rule fix applied to one
        but not the other silently breaks the bit-parity contract — so
        both call this single definition. (The fori loops use the
        reciprocal-multiply ``_sphere_t`` variant instead, a documented
        <=1-ulp divergence.)"""
        ot = obj_types[o]
        if ot == OBJ_SPHERE:
            spx, spy, spz = geom[_SHIFT, o], geom[_SHIFT + 1, o], geom[_SHIFT + 2, o]
            rad = geom[_RADIUS, o]
            ocx, ocy, ocz = ox - spx, oy - spy, oz - spz
            a = _dot(dx, dy, dz, dx, dy, dz)
            b = 2.0 * _dot(ocx, ocy, ocz, dx, dy, dz)
            c = _dot(ocx, ocy, ocz, ocx, ocy, ocz) - rad * rad
            disc = b * b - 4.0 * a * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = (-b - sq) / (2.0 * a)
            t2 = (-b + sq) / (2.0 * a)
            t = jnp.where(t1 >= 0.0, t1, t2)
            valid = (disc >= 0.0) & (t >= 0.0)
        elif ot == OBJ_TRIANGLE:
            t, valid, _u, _v = _tri_t(geom, o, ox, oy, oz, dx, dy, dz)
        else:
            if ot == OBJ_ROTATED_BOX:
                shx, shy, shz = (
                    geom[_SHIFT, o], geom[_SHIFT + 1, o], geom[_SHIFT + 2, o]
                )
                rx, ry, rz = ox - shx, oy - shy, oz - shz
                ir = [geom[_INV_ROT + k, o] for k in range(9)]
                lox = ir[0] * rx + ir[1] * ry + ir[2] * rz
                loy = ir[3] * rx + ir[4] * ry + ir[5] * rz
                loz = ir[6] * rx + ir[7] * ry + ir[8] * rz
                ldx = ir[0] * dx + ir[1] * dy + ir[2] * dz
                ldy = ir[3] * dx + ir[4] * dy + ir[5] * dz
                ldz = ir[6] * dx + ir[7] * dy + ir[8] * dz
            else:
                lox, loy, loz = ox, oy, oz
                ldx, ldy, ldz = dx, dy, dz
            t_min, t_max, hit = _slab_t(
                lox, loy, loz, ldx, ldy, ldz,
                geom[_SLAB_MIN, o], geom[_SLAB_MIN + 1, o], geom[_SLAB_MIN + 2, o],
                geom[_SLAB_MAX, o], geom[_SLAB_MAX + 1, o], geom[_SLAB_MAX + 2, o],
            )
            t = jnp.where(t_min >= 0.0, t_min, t_max)
            valid = hit
        return t, valid & (t > 0.0)

    def trace_tile(geom, ox, oy, oz, dx, dy, dz):
        """Nearest-hit over all objects. Returns per-lane winner
        (t, hit, normal, metal, rough, one-hot winner masks)."""
        assert geom.shape[0] == _n_geom_rows, (
            f"geom table has {geom.shape[0]} rows, kernel layout expects "
            f"{_n_geom_rows} — pack_geometry called with a different "
            "geom_layout than build_megakernel derived"
        )
        t_best = jnp.full_like(ox, _INF)
        masks = []
        # pass 1: nearest t
        cand_ts = []
        for o in range(n_obj):
            t, valid = _candidate_t(geom, o, ox, oy, oz, dx, dy, dz)
            t = jnp.where(valid, t, _INF)
            cand_ts.append(t)
            t_best = jnp.fmin(t_best, t)

        hit = t_best < _INF
        # pass 2: winner masks (lowest index wins ties, like the
        # reference's stable sort) + winner attributes
        taken = jnp.zeros_like(ox, dtype=jnp.float32)
        nx = jnp.zeros_like(ox)
        ny = jnp.zeros_like(ox)
        nz = jnp.zeros_like(ox)
        metal = jnp.zeros_like(ox)
        rough = jnp.zeros_like(ox)
        transw = jnp.zeros_like(ox)
        ior = jnp.ones_like(ox)
        cauchy = jnp.zeros_like(ox)
        ipx, ipy, ipz = (
            ox + dx * jnp.where(hit, t_best, 0.0),
            oy + dy * jnp.where(hit, t_best, 0.0),
            oz + dz * jnp.where(hit, t_best, 0.0),
        )
        for o in range(n_obj):
            is_win = (cand_ts[o] == t_best) & hit & (taken == 0.0)
            taken = jnp.where(is_win, 1.0, taken)
            masks.append(is_win)
            ot = obj_types[o]
            if ot == OBJ_SPHERE:
                cnx, cny, cnz = _normalize(
                    ipx - geom[_SHIFT, o], ipy - geom[_SHIFT + 1, o],
                    ipz - geom[_SHIFT + 2, o],
                )
            elif ot == OBJ_PLAIN_BOX:
                def axis(p, lo, hi):
                    return jnp.where(
                        jnp.abs(p - lo) < _F32_DELTA, jnp.float32(-1.0),
                        jnp.where(jnp.abs(p - hi) < _F32_DELTA,
                                  jnp.float32(1.0), jnp.float32(0.0)),
                    )
                ux = axis(ipx, geom[_SLAB_MIN, o], geom[_SLAB_MAX, o])
                uy = axis(ipy, geom[_SLAB_MIN + 1, o], geom[_SLAB_MAX + 1, o])
                uz = axis(ipz, geom[_SLAB_MIN + 2, o], geom[_SLAB_MAX + 2, o])
                cnx, cny, cnz = _normalize(ux, uy, uz)
            elif ot == OBJ_TRIANGLE:
                # shading normal at the hit's barycentrics (winding
                # normal when the mesh is flat — zero deltas)
                _tt, _tv, u_, v_ = _tri_t(geom, o, ox, oy, oz, dx, dy, dz)
                cnx, cny, cnz = _tri_normal(geom, o, u_, v_)
            else:  # rotated box: closest local face, strict < scan order
                shx, shy, shz = (
                    geom[_SHIFT, o], geom[_SHIFT + 1, o], geom[_SHIFT + 2, o]
                )
                rx_, ry_, rz_ = ipx - shx, ipy - shy, ipz - shz
                ir = [geom[_INV_ROT + k, o] for k in range(9)]
                lx = ir[0] * rx_ + ir[1] * ry_ + ir[2] * rz_
                ly = ir[3] * rx_ + ir[4] * ry_ + ir[5] * rz_
                lz = ir[6] * rx_ + ir[7] * ry_ + ir[8] * rz_
                hx = geom[_SLAB_MAX, o]
                hy = geom[_SLAB_MAX + 1, o]
                hz = geom[_SLAB_MAX + 2, o]
                one = jnp.float32(1.0)
                zero = jnp.float32(0.0)
                min_d = jnp.abs(hx - lx)
                lnx = jnp.full_like(lx, one)
                lny = jnp.zeros_like(lx)
                lnz = jnp.zeros_like(lx)
                for dist, cand in (
                    (jnp.abs(-hx - lx), (-one, zero, zero)),
                    (jnp.abs(hy - ly), (zero, one, zero)),
                    (jnp.abs(-hy - ly), (zero, -one, zero)),
                    (jnp.abs(hz - lz), (zero, zero, one)),
                    (jnp.abs(-hz - lz), (zero, zero, -one)),
                ):
                    closer = dist < min_d
                    lnx = jnp.where(closer, cand[0], lnx)
                    lny = jnp.where(closer, cand[1], lny)
                    lnz = jnp.where(closer, cand[2], lnz)
                    min_d = jnp.fmin(min_d, dist)
                r = [geom[_ROT + k, o] for k in range(9)]
                cnx = r[0] * lnx + r[1] * lny + r[2] * lnz
                cny = r[3] * lnx + r[4] * lny + r[5] * lnz
                cnz = r[6] * lnx + r[7] * lny + r[8] * lnz
            nx = jnp.where(is_win, cnx, nx)
            ny = jnp.where(is_win, cny, ny)
            nz = jnp.where(is_win, cnz, nz)
            metal = jnp.where(is_win, geom[_METAL, o], metal)
            rough = jnp.where(is_win, geom[_ROUGH, o], rough)
            if has_transmission:
                transw = jnp.where(is_win, geom[_TRANS, o], transw)
                ior = jnp.where(is_win, geom[_IOR, o], ior)
                cauchy = jnp.where(is_win, geom[_CAUCHY, o], cauchy)
        return (
            t_best, hit, ipx, ipy, ipz, nx, ny, nz,
            metal, rough, transw, ior, cauchy, masks,
        )

    def shadow_blocked(geom, ox, oy, oz, dx, dy, dz, max_dist):
        """Nearest positive hit <= max_dist (reference src/shader.rs:484-489)."""
        t_best = jnp.full_like(ox, _INF)
        for o in range(n_obj):
            t, valid = _candidate_t(geom, o, ox, oy, oz, dx, dy, dz)
            t_best = jnp.fmin(t_best, jnp.where(valid, t, _INF))
        return (t_best < _INF) & (t_best <= max_dist)

    # contiguous same-type object runs: the fori loop is emitted once per
    # run with a minimal per-type body (no runtime type dispatch, no wasted
    # rotation/quadratic math), while the ascending visit order — and with
    # it the reference's lowest-index-wins tie rule — is preserved exactly.
    type_runs: tuple[tuple[int, int, int], ...] = ()
    if use_fori:
        _runs = []
        _i = 0
        while _i < n_obj:
            _j = _i
            while _j < n_obj and obj_types[_j] == obj_types[_i]:
                _j += 1
            _runs.append((obj_types[_i], _i, _j))
            _i = _j
        type_runs = tuple(_runs)

    def _sphere_t(geom, o, ox, oy, oz, dx, dy, dz, inv2a, foura):
        """Sphere quadratic (reference src/shader.rs:508-529). ``1/(2a)``
        and ``4a`` are hoisted per trace call; multiplying by the
        reciprocal instead of dividing per object diverges from the
        reference by <=1 ulp in t — inside the documented chaos envelope
        (the jnp path keeps reference-exact division)."""
        cx_ = geom[_SHIFT, o]
        cy_ = geom[_SHIFT + 1, o]
        cz_ = geom[_SHIFT + 2, o]
        rad = geom[_RADIUS, o]
        rx_, ry_, rz_ = ox - cx_, oy - cy_, oz - cz_
        b = 2.0 * _dot(rx_, ry_, rz_, dx, dy, dz)
        c = _dot(rx_, ry_, rz_, rx_, ry_, rz_) - rad * rad
        disc = b * b - foura * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sq) * inv2a
        t2 = (-b + sq) * inv2a
        t = jnp.where(t1 >= 0.0, t1, t2)
        valid = (disc >= 0.0) & (t > 0.0)
        return t, valid, (cx_, cy_, cz_)

    def _tri_t(geom, o, ox, oy, oz, dx, dy, dz):
        """Moller-Trumbore over the tile (beyond-reference geometry —
        mesh faces; triangle rows reuse _SHIFT = v0, _SLAB_MIN = e1,
        _SLAB_MAX = e2, and _INV_ROT rows carry the shading normal as
        (n0, n1-n0, n2-n0) — zero deltas for flat meshes). Two-sided;
        det == 0 drives u/v/t to inf/NaN and the barycentric box
        conditions reject them (no epsilon needed). Op order matches
        ``ops.geometry.triangle_t`` exactly so the jnp and pallas paths
        agree bitwise on deterministic rays. Returns (t, valid, u, v);
        the barycentrics feed Phong normal interpolation."""
        e1x, e1y, e1z = (
            geom[_SLAB_MIN, o], geom[_SLAB_MIN + 1, o], geom[_SLAB_MIN + 2, o]
        )
        e2x, e2y, e2z = (
            geom[_SLAB_MAX, o], geom[_SLAB_MAX + 1, o], geom[_SLAB_MAX + 2, o]
        )
        v0x, v0y, v0z = (
            geom[_SHIFT, o], geom[_SHIFT + 1, o], geom[_SHIFT + 2, o]
        )
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = _dot(e1x, e1y, e1z, px, py, pz)
        inv_det = 1.0 / det
        sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
        u = _dot(sx, sy, sz, px, py, pz) * inv_det
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = _dot(dx, dy, dz, qx, qy, qz) * inv_det
        t = _dot(e2x, e2y, e2z, qx, qy, qz) * inv_det
        valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
        return t, valid & (t > 0.0), u, v

    def _tri_normal(geom, o, u, v):
        """Shading normal at barycentrics (u, v): normalize(n0 + u*dn1 +
        v*dn2) — Phong interpolation for smooth meshes, the flat winding
        normal (zero deltas, normalize of a unit vector) otherwise."""
        return _normalize(
            geom[_INV_ROT, o] + u * geom[_INV_ROT + 3, o]
            + v * geom[_INV_ROT + 6, o],
            geom[_INV_ROT + 1, o] + u * geom[_INV_ROT + 4, o]
            + v * geom[_INV_ROT + 7, o],
            geom[_INV_ROT + 2, o] + u * geom[_INV_ROT + 5, o]
            + v * geom[_INV_ROT + 8, o],
        )

    def _plain_box_t(geom, o, ox, oy, oz, dx, dy, dz):
        """World-space slab test — plain boxes carry an identity rotation
        and zero shift, so the local frame IS the world frame."""
        t_min, t_max, hit = _slab_t(
            ox, oy, oz, dx, dy, dz,
            geom[_SLAB_MIN, o], geom[_SLAB_MIN + 1, o], geom[_SLAB_MIN + 2, o],
            geom[_SLAB_MAX, o], geom[_SLAB_MAX + 1, o], geom[_SLAB_MAX + 2, o],
        )
        t = jnp.where(t_min >= 0.0, t_min, t_max)
        return t, hit & (t > 0.0)

    def _rot_box_t(geom, o, ox, oy, oz, dx, dy, dz):
        """Local-frame slab test for rotated boxes."""
        shx = geom[_SHIFT, o]
        shy = geom[_SHIFT + 1, o]
        shz = geom[_SHIFT + 2, o]
        rx_, ry_, rz_ = ox - shx, oy - shy, oz - shz
        ir = [geom[_INV_ROT + k, o] for k in range(9)]
        lox = ir[0] * rx_ + ir[1] * ry_ + ir[2] * rz_
        loy = ir[3] * rx_ + ir[4] * ry_ + ir[5] * rz_
        loz = ir[6] * rx_ + ir[7] * ry_ + ir[8] * rz_
        ldx = ir[0] * dx + ir[1] * dy + ir[2] * dz
        ldy = ir[3] * dx + ir[4] * dy + ir[5] * dz
        ldz = ir[6] * dx + ir[7] * dy + ir[8] * dz
        t_min, t_max, hit = _slab_t(
            lox, loy, loz, ldx, ldy, ldz,
            geom[_SLAB_MIN, o], geom[_SLAB_MIN + 1, o], geom[_SLAB_MIN + 2, o],
            geom[_SLAB_MAX, o], geom[_SLAB_MAX + 1, o], geom[_SLAB_MAX + 2, o],
        )
        t = jnp.where(t_min >= 0.0, t_min, t_max)
        return t, hit & (t > 0.0), ir

    def _member_loop(body, start, stop, carry):
        """fori over objects [start, stop), unrolled ``member_unroll``-wide
        (ragged tail visited at static indices) — the unrolled body gives
        Mosaic independent work to overlap each member's SMEM scalar
        loads and sqrt latency with its neighbours' vector math. Visit
        order is unchanged, so results are bit-identical to the plain
        loop. Measured on v5e (1000-sphere config, regen K=100, C=32
        clusters): unroll 1/2/4/8/16 = 48.2/42.4/39.3/37.9/43.4 ms/frame
        (tools/block_tile_bench.py --unrolls)."""
        n_m = stop - start
        u = member_unroll
        if u <= 1 or n_m < u:
            return jax.lax.fori_loop(start, stop, body, carry)
        main = n_m - n_m % u

        def body_u(i, c):
            o0 = start + i * u
            for j in range(u):
                c = body(o0 + j, c)
            return c

        carry = jax.lax.fori_loop(0, main // u, body_u, carry)
        for o in range(start + main, stop):  # static tail (< u members)
            carry = body(o, carry)
        return carry

    def _member_loop_fixed(body, start, size, carry):
        """``_member_loop`` for a DYNAMIC base index with a STATIC member
        count (the dynamic cluster loop): every trip count stays static
        (Mosaic-friendly), only the object index is traced. Same visit
        order and unroll width as ``_member_loop``, so results are
        bit-identical to the static per-cluster emission."""
        u = member_unroll
        if u <= 1 or size < u:
            return jax.lax.fori_loop(
                0, size, lambda i, c: body(start + i, c), carry
            )
        main = size - size % u

        def body_u(i, c):
            o0 = start + i * u
            for j in range(u):
                c = body(o0 + j, c)
            return c

        carry = jax.lax.fori_loop(0, main // u, body_u, carry)
        for r in range(main, size):  # static-count tail, dynamic base
            carry = body(start + r, carry)
        return carry

    def trace_tile_fori(geom, m_scal, ox, oy, oz, dx, dy, dz,
                        alive=None, cbounds=None):
        """Per-type-run fori nearest hit: constant compile size in n_obj.
        Strict ``t < t_best`` keeps the lowest object index on ties
        (ascending visit order), matching the unrolled kernel and the
        reference. With ``cluster_runs`` the visit order is the Morton
        permutation instead, a per-cluster AABB pre-test skips clusters no
        relevant lane can hit (tile-uniform ``lax.cond``), and exact ties
        resolve by ORIGINAL object index (carried in geom's _ORIG column)
        so results stay identical to the unclustered loop."""
        assert geom.shape[0] == _n_geom_rows, (
            f"geom table has {geom.shape[0]} rows, kernel layout expects "
            f"{_n_geom_rows} — pack_geometry called with a different "
            "geom_layout than build_megakernel derived"
        )
        a = _dot(dx, dy, dz, dx, dy, dz)  # loop-invariant per trace
        inv2a = 1.0 / (2.0 * a)
        foura = 4.0 * a
        # carry slots s1..s3 hold the winner's normal for box runs, but the
        # winner's CENTER for sphere runs (flagged by win_sphere) — the
        # sphere normal is derived once after the loop, keeping the hot
        # sphere body free of per-object normalization (~35% fewer ops)
        init = (
            jnp.full((r8, LANE), _INF),  # t_best
            jnp.zeros((r8, LANE), jnp.float32),  # winner material id
            jnp.zeros((r8, LANE), jnp.float32),  # s1
            jnp.zeros((r8, LANE), jnp.float32),  # s2
            jnp.zeros((r8, LANE), jnp.float32),  # s3
            jnp.zeros((r8, LANE), jnp.float32),  # win_sphere flag
        )
        if clustered:
            # winner's ORIGINAL index for the tie rule (visit order is the
            # Morton permutation, so first-visited no longer == lowest)
            init = init + (jnp.full((r8, LANE), jnp.float32(n_obj)),)

        def accum(carry, o, t_o, valid, s1, s2, s3, is_sphere):
            t_best, win_mat, c1, c2, c3, winsph = carry[:6]
            if clustered:
                worig = carry[6]
                o_orig = geom[_ORIG, o]
                closer = valid & (
                    (t_o < t_best) | ((t_o == t_best) & (o_orig < worig))
                )
            else:
                closer = valid & (t_o < t_best)
            out = (
                jnp.where(closer, t_o, t_best),
                jnp.where(closer, geom[_MATID, o], win_mat),
                jnp.where(closer, s1, c1),
                jnp.where(closer, s2, c2),
                jnp.where(closer, s3, c3),
                jnp.where(closer, jnp.float32(is_sphere), winsph),
            )
            if clustered:
                out = out + (jnp.where(closer, o_orig, worig),)
            return out

        def sphere_body(o, carry):
            t_o, valid, (cx_, cy_, cz_) = _sphere_t(
                geom, o, ox, oy, oz, dx, dy, dz, inv2a, foura
            )
            return accum(carry, o, t_o, valid, cx_, cy_, cz_, 1.0)

        def axis(p, lo, hi):
            return jnp.where(
                jnp.abs(p - lo) < _F32_DELTA, jnp.float32(-1.0),
                jnp.where(jnp.abs(p - hi) < _F32_DELTA,
                          jnp.float32(1.0), jnp.float32(0.0)),
            )

        def plain_body(o, carry):
            t_o, valid = _plain_box_t(geom, o, ox, oy, oz, dx, dy, dz)
            ipx = ox + dx * t_o
            ipy = oy + dy * t_o
            ipz = oz + dz * t_o
            ux = axis(ipx, geom[_SLAB_MIN, o], geom[_SLAB_MAX, o])
            uy = axis(ipy, geom[_SLAB_MIN + 1, o], geom[_SLAB_MAX + 1, o])
            uz = axis(ipz, geom[_SLAB_MIN + 2, o], geom[_SLAB_MAX + 2, o])
            pnx, pny, pnz = _normalize(ux, uy, uz)
            return accum(carry, o, t_o, valid, pnx, pny, pnz, 0.0)

        def rot_body(o, carry):
            t_o, valid, ir = _rot_box_t(geom, o, ox, oy, oz, dx, dy, dz)
            ipx = ox + dx * t_o
            ipy = oy + dy * t_o
            ipz = oz + dz * t_o
            # rotated box normal: closest local face, strict < scan order
            rx_ = ipx - geom[_SHIFT, o]
            ry_ = ipy - geom[_SHIFT + 1, o]
            rz_ = ipz - geom[_SHIFT + 2, o]
            lx = ir[0] * rx_ + ir[1] * ry_ + ir[2] * rz_
            ly = ir[3] * rx_ + ir[4] * ry_ + ir[5] * rz_
            lz = ir[6] * rx_ + ir[7] * ry_ + ir[8] * rz_
            hx = geom[_SLAB_MAX, o]
            hy = geom[_SLAB_MAX + 1, o]
            hz = geom[_SLAB_MAX + 2, o]
            one = jnp.float32(1.0)
            zero = jnp.float32(0.0)
            min_d = jnp.abs(hx - lx)
            lnx = jnp.full((r8, LANE), one)
            lny = jnp.zeros((r8, LANE), jnp.float32)
            lnz = jnp.zeros((r8, LANE), jnp.float32)
            for dist, cand in (
                (jnp.abs(-hx - lx), (-one, zero, zero)),
                (jnp.abs(hy - ly), (zero, one, zero)),
                (jnp.abs(-hy - ly), (zero, -one, zero)),
                (jnp.abs(hz - lz), (zero, zero, one)),
                (jnp.abs(-hz - lz), (zero, zero, -one)),
            ):
                c2 = dist < min_d
                lnx = jnp.where(c2, cand[0], lnx)
                lny = jnp.where(c2, cand[1], lny)
                lnz = jnp.where(c2, cand[2], lnz)
                min_d = jnp.fmin(min_d, dist)
            r = [geom[_ROT + k, o] for k in range(9)]
            rnx = r[0] * lnx + r[1] * lny + r[2] * lnz
            rny = r[3] * lnx + r[4] * lny + r[5] * lnz
            rnz = r[6] * lnx + r[7] * lny + r[8] * lnz
            return accum(carry, o, t_o, valid, rnx, rny, rnz, 0.0)

        def tri_body(o, carry):
            t_o, valid, u_, v_ = _tri_t(geom, o, ox, oy, oz, dx, dy, dz)
            tnx, tny, tnz = _tri_normal(geom, o, u_, v_)
            return accum(carry, o, t_o, valid, tnx, tny, tnz, 0.0)

        bodies = {
            OBJ_SPHERE: sphere_body,
            OBJ_PLAIN_BOX: plain_body,
            OBJ_ROTATED_BOX: rot_body,
            OBJ_TRIANGLE: tri_body,
        }
        carry = init
        if clustered:
            # cluster AABB pre-test: skip the whole member loop when no
            # RELEVANT lane (alive, and not already holding a nearer
            # hit) can intersect the cluster's union AABB — a member
            # hit t obeys t >= max(cluster t_min, 0), so the test is
            # conservative.
            # <= not <: a member hit can equal the current best
            # bitwise (t >= ct_min, and ties are resolved by lowest
            # ORIGINAL index) — a cluster whose entry t equals t_best
            # may still hold the tie-winning member, so it must be
            # visited. The shadow loop uses <= for the same reason.
            def _cl_relevant(cidx, t_best_c):
                ct_min, _ct_max, c_hit = _slab_t(
                    ox, oy, oz, dx, dy, dz,
                    cbounds[0, cidx], cbounds[1, cidx], cbounds[2, cidx],
                    cbounds[3, cidx], cbounds[4, cidx], cbounds[5, cidx],
                )
                rel = c_hit & (ct_min <= t_best_c)
                if alive is not None:
                    rel = rel & (alive > 0.0)
                return jnp.max(rel.astype(jnp.float32)) > 0.0

            for seg in cl_segments:
                if seg[0] == "dyn":
                    # one fori over the streak's cluster indices: member
                    # start is affine in the index, bounds read at the
                    # traced cbounds column (see _cluster_segments)
                    _dtag, _lo, _hi, _base, _csz = seg[1:]
                    dbody = bodies[_dtag]

                    def _cl_body(ci, c, _b=_base, _l=_lo, _s=_csz,
                                 _bd=dbody):
                        start = _b + (ci - _l) * _s
                        return jax.lax.cond(
                            _cl_relevant(ci, c[0]),
                            lambda cc: _member_loop_fixed(
                                _bd, start, _s, cc
                            ),
                            lambda cc: cc,
                            c,
                        )

                    carry = jax.lax.fori_loop(_lo, _hi, _cl_body, carry)
                    continue
                cidx, (run_tag, start, stop, is_cl) = seg[1], seg[2]
                body = bodies[run_tag]
                if not is_cl:
                    if stop - start == 1:
                        carry = body(start, carry)
                    else:
                        carry = jax.lax.fori_loop(start, stop, body, carry)
                    continue
                carry = jax.lax.cond(
                    _cl_relevant(cidx, carry[0]),
                    lambda c, s=start, e=stop, b=body: _member_loop(
                        b, s, e, c
                    ),
                    lambda c: c,
                    carry,
                )
            t_best, win_mat, s1, s2, s3, winsph = carry[:6]
        else:
            for run_tag, start, stop in type_runs:
                body = bodies[run_tag]
                if stop - start == 1:  # static index: direct SMEM reads
                    carry = body(start, carry)
                else:
                    carry = _member_loop(body, start, stop, carry)
            t_best, win_mat, s1, s2, s3, winsph = carry
        hit = t_best < _INF
        t_safe = jnp.where(hit, t_best, 0.0)
        ipx = ox + dx * t_safe
        ipy = oy + dy * t_safe
        ipz = oz + dz * t_safe
        # winner normal: boxes stored it directly; spheres stored their
        # center — derive the normal once here (matches the per-object
        # in-loop computation exactly: same ip, same normalize)
        is_sph = winsph > 0.0
        snx, sny, snz = _normalize(ipx - s1, ipy - s2, ipz - s3)
        nx = jnp.where(is_sph, snx, s1)
        ny = jnp.where(is_sph, sny, s2)
        nz = jnp.where(is_sph, snz, s3)
        # winner material scalars: one-hot selects over the material table
        # (the winner id is carried through the object loop; the per-s
        # albedo/emission selects in the bounce body re-derive masks from
        # the same win_mat)
        metal = jnp.zeros((r8, LANE), jnp.float32)
        rough = jnp.zeros((r8, LANE), jnp.float32)
        transw = jnp.zeros((r8, LANE), jnp.float32)
        ior = jnp.ones((r8, LANE), jnp.float32)
        cauchy = jnp.zeros((r8, LANE), jnp.float32)
        for m in range(n_materials):
            is_m = win_mat == jnp.float32(m)
            metal = jnp.where(is_m, m_scal[m, 0], metal)
            rough = jnp.where(is_m, m_scal[m, 1], rough)
            if has_transmission:
                transw = jnp.where(is_m, m_scal[m, 2], transw)
                ior = jnp.where(is_m, m_scal[m, 3], ior)
                cauchy = jnp.where(is_m, m_scal[m, 4], cauchy)
        return (
            t_best, hit, ipx, ipy, ipz, nx, ny, nz,
            metal, rough, transw, ior, cauchy, win_mat,
        )

    def shadow_blocked_fori_multi(geom, rays, relevant=None, cbounds=None):
        """Occlusion tests for several shadow rays (one per light) fused
        into ONE object loop: per-object scalar SMEM loads and loop
        control are shared across lights. ``rays`` is a list of
        ``(ox, oy, oz, dx, dy, dz, max_dist)``; returns one blocked mask
        per ray. No normals, no materials. With ``cluster_runs``, a
        cluster is skipped when no RELEVANT lane's shadow ray enters its
        union AABB within its light distance (entry t_min <= max_dist is
        conservative: any member hit obeys t >= cluster t_min).

        With ``shadow_interval`` the carried state is a latched
        per-light BLOCKED mask (f32 0/1) instead of a nearest-t plane,
        and the sphere body decides "root in (0, maxd]" by the sqrt-free
        sign tests documented on ``build_megakernel``."""
        pre = []
        for (sox, soy, soz, sdx, sdy, sdz, maxd) in rays:
            a = _dot(sdx, sdy, sdz, sdx, sdy, sdz)
            if shadow_interval:
                # per-light loop invariants for the sign-test predicate:
                # 4a (disc), 2·a·maxd (vertex test) and a·maxd² (f(maxd))
                pre.append((4.0 * a, 2.0 * a * maxd, a * maxd * maxd))
            else:
                pre.append((1.0 / (2.0 * a), 4.0 * a))

        def sphere_body(o, carry):
            cx_ = geom[_SHIFT, o]
            cy_ = geom[_SHIFT + 1, o]
            cz_ = geom[_SHIFT + 2, o]
            rad = geom[_RADIUS, o]
            r2 = rad * rad
            out = []
            if shadow_interval:
                for (sox, soy, soz, sdx, sdy, sdz, maxd), (
                    foura, g0, amax2
                ), blk in zip(rays, pre, carry):
                    rx_, ry_, rz_ = sox - cx_, soy - cy_, soz - cz_
                    b = 2.0 * _dot(rx_, ry_, rz_, sdx, sdy, sdz)
                    c = _dot(rx_, ry_, rz_, rx_, ry_, rz_) - r2
                    disc = b * b - foura * c
                    fm = amax2 + b * maxd + c  # f(maxd), a·maxd² hoisted
                    v_ok = b + g0 >= 0.0  # parabola vertex -b/(2a) <= maxd
                    # t = t1 branch: 0 < t1 <= maxd
                    near = (b < 0.0) & (c > 0.0) & (v_ok | (fm <= 0.0))
                    # t = t2 branch (t1 < 0): 0 < t2 <= maxd
                    far = (c < 0.0) & v_ok & (fm >= 0.0)
                    hit_o = (disc >= 0.0) & (near | far)
                    out.append(jnp.where(hit_o, 1.0, blk))
                return tuple(out)
            for (sox, soy, soz, sdx, sdy, sdz, _m), (inv2a, foura), t_best in zip(
                rays, pre, carry
            ):
                rx_, ry_, rz_ = sox - cx_, soy - cy_, soz - cz_
                b = 2.0 * _dot(rx_, ry_, rz_, sdx, sdy, sdz)
                c = _dot(rx_, ry_, rz_, rx_, ry_, rz_) - r2
                disc = b * b - foura * c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t1 = (-b - sq) * inv2a
                t2 = (-b + sq) * inv2a
                t = jnp.where(t1 >= 0.0, t1, t2)
                valid = (disc >= 0.0) & (t > 0.0)
                out.append(jnp.fmin(t_best, jnp.where(valid, t, _INF)))
            return tuple(out)

        def _box_accum(t_o, valid, ray, prev):
            if shadow_interval:
                return jnp.where(valid & (t_o <= ray[6]), 1.0, prev)
            return jnp.fmin(prev, jnp.where(valid, t_o, _INF))

        def plain_body(o, carry):
            out = []
            for ray, prev in zip(rays, carry):
                t_o, valid = _plain_box_t(geom, o, *ray[:6])
                out.append(_box_accum(t_o, valid, ray, prev))
            return tuple(out)

        def rot_body(o, carry):
            out = []
            for ray, prev in zip(rays, carry):
                t_o, valid, _ir = _rot_box_t(geom, o, *ray[:6])
                out.append(_box_accum(t_o, valid, ray, prev))
            return tuple(out)

        def tri_body(o, carry):
            out = []
            for ray, prev in zip(rays, carry):
                t_o, valid, _u, _v = _tri_t(geom, o, *ray[:6])
                out.append(_box_accum(t_o, valid, ray, prev))
            return tuple(out)

        bodies = {
            OBJ_SPHERE: sphere_body,
            OBJ_PLAIN_BOX: plain_body,
            OBJ_ROTATED_BOX: rot_body,
            OBJ_TRIANGLE: tri_body,
        }
        if shadow_interval:
            t_bests = tuple(jnp.zeros((r8, LANE), jnp.float32) for _ in rays)
        else:
            t_bests = tuple(jnp.full((r8, LANE), _INF) for _ in rays)
        if clustered:
            # a lane already blocked (some earlier cluster hit within the
            # light distance) needs no more tests — occlusion is any-hit,
            # so 'blocked' can only latch, never unlatch: skipping keeps
            # the output identical
            def _sh_relevant(cidx, t_bests_c):
                rel = None
                for ri, (sox, soy, soz, sdx, sdy, sdz, maxd) in enumerate(
                    rays
                ):
                    ct_min, _ct_max, c_hit = _slab_t(
                        sox, soy, soz, sdx, sdy, sdz,
                        cbounds[0, cidx], cbounds[1, cidx], cbounds[2, cidx],
                        cbounds[3, cidx], cbounds[4, cidx], cbounds[5, cidx],
                    )
                    unblocked = (
                        (t_bests_c[ri] <= 0.0) if shadow_interval
                        else ~(t_bests_c[ri] <= maxd)
                    )
                    r = c_hit & (ct_min <= maxd) & unblocked
                    rel = r if rel is None else (rel | r)
                if relevant is not None:
                    rel = rel & relevant
                return jnp.max(rel.astype(jnp.float32)) > 0.0

            for seg in cl_segments:
                if seg[0] == "dyn":
                    _dtag, _lo, _hi, _base, _csz = seg[1:]
                    dbody = bodies[_dtag]

                    def _sh_body(ci, ts, _b=_base, _l=_lo, _s=_csz,
                                 _bd=dbody):
                        start = _b + (ci - _l) * _s
                        return jax.lax.cond(
                            _sh_relevant(ci, ts),
                            lambda tss: _member_loop_fixed(
                                _bd, start, _s, tss
                            ),
                            lambda tss: tss,
                            ts,
                        )

                    t_bests = jax.lax.fori_loop(_lo, _hi, _sh_body, t_bests)
                    continue
                cidx, (run_tag, start, stop, is_cl) = seg[1], seg[2]
                body = bodies[run_tag]
                if not is_cl:
                    if stop - start == 1:
                        t_bests = body(start, t_bests)
                    else:
                        t_bests = jax.lax.fori_loop(start, stop, body, t_bests)
                    continue
                t_bests = jax.lax.cond(
                    _sh_relevant(cidx, t_bests),
                    lambda ts, s=start, e=stop, b=body: _member_loop(
                        b, s, e, ts
                    ),
                    lambda ts: ts,
                    t_bests,
                )
        else:
            for run_tag, start, stop in type_runs:
                body = bodies[run_tag]
                if stop - start == 1:
                    t_bests = body(start, t_bests)
                else:
                    t_bests = _member_loop(body, start, stop, t_bests)
        if shadow_interval:
            return [blk > 0.0 for blk in t_bests]
        return [
            (t < _INF) & (t <= ray[6]) for t, ray in zip(t_bests, rays)
        ]

    regen = regen_frames > 1 or persist_mode

    def make_body(
        frame_ref, px_ref, py_ref, geom_ref, albedo_ref, emis_ref,
        m_alb_ref, m_emis_ref, m_scal_ref,
        lpos_ref, lspec_ref, rad_ref, thr_ref,
        cam_ref=None, valid=None,
        dirx_ref=None, diry_ref=None, dirz_ref=None,
        cbounds_ref=None,
        lead=None, end=None, persist_pre=None, stop_ref=None,
    ):
        """Bind the per-bounce body to this tile's refs."""
        frame_id = frame_ref[0, 0]
        geom = geom_ref
        px = px_ref[:]
        py = py_ref[:]

        def bounce(i, carry):
            # bl/fid: per-lane bounces-left countdown and frame id. Without
            # regeneration they are uniform across live lanes (bl ==
            # max_bounces - bounce_index, so values — and the RNG streams —
            # are identical to the former loop-index derivation); with it,
            # each lane walks its own (frame, bounce) schedule.
            ox, oy, oz, dx, dy, dz, alive, gate, hero, bl, fid = carry
            bounces_left = bl

            if use_fori:
                (
                    t, hit, ipx, ipy, ipz, nx, ny, nz,
                    metal, rough, transw, ior, cauchy, win_mat,
                ) = trace_tile_fori(
                    geom, m_scal_ref, ox, oy, oz, dx, dy, dz,
                    alive=alive, cbounds=cbounds_ref,
                )
                masks = None
                if precompute_mat_masks:
                    _masks = [
                        win_mat == jnp.float32(m) for m in range(n_materials)
                    ]

                    def mat_mask(m, _masks=_masks):
                        return _masks[m]
                else:
                    def mat_mask(m, win_mat=win_mat):
                        return win_mat == jnp.float32(m)
            else:
                (
                    t, hit, ipx, ipy, ipz, nx, ny, nz,
                    metal, rough, transw, ior, cauchy, masks,
                ) = trace_tile(geom, ox, oy, oz, dx, dy, dz)
                mat_mask = None
                if mat_shade:
                    # winner material id from the object winner masks
                    # (exclusive; miss lanes land on material 0, whose
                    # albedo/emission never reaches any output: direct is
                    # gated on contrib, throughput on cont, emission on
                    # live — all false without a hit)
                    win_mat = jnp.zeros((r8, LANE), jnp.float32)
                    for o in range(n_obj):
                        win_mat = jnp.where(
                            masks[o], geom[_MATID, o], win_mat
                        )
                    _masks = [
                        win_mat == jnp.float32(m) for m in range(n_materials)
                    ]

                    def mat_mask(m, _masks=_masks):
                        return _masks[m]
            texf = None
            if has_texture:
                # winner material's checker params -> one lane-plane
                # albedo factor per bounce (lambda-independent; op order
                # mirrors integrator.checker_factor). Static gate:
                # untextured scenes compile none of this.
                texs = jnp.zeros((r8, LANE), jnp.float32)
                texl = jnp.ones((r8, LANE), jnp.float32)
                if masks is not None:
                    for o in range(n_obj):
                        texs = jnp.where(masks[o], geom[_TEXS, o], texs)
                        texl = jnp.where(masks[o], geom[_TEXL, o], texl)
                else:
                    for m in range(n_materials):
                        is_m = mat_mask(m)
                        texs = jnp.where(is_m, m_scal_ref[m, 5], texs)
                        texl = jnp.where(is_m, m_scal_ref[m, 6], texl)
                inv_ts = 1.0 / texs
                pp = (
                    jnp.floor(ipx * inv_ts) + jnp.floor(ipy * inv_ts)
                    + jnp.floor(ipz * inv_ts)
                )
                odd = (pp - 2.0 * jnp.floor(pp * 0.5)) != 0.0
                texf = jnp.where(
                    texs > 0.0, jnp.where(odd, texl, 1.0), 1.0
                )

            gate_ok = (gate == 0.0) | (t > _SPEC_MIN)
            if has_sky:
                # environment emission fires on the alive->miss
                # transition. gate_ok is always true on a miss (t ==
                # _INF), so gated-out short HITS collect no sky — the
                # same mask as integrator.py's sky_mask.
                missf = jnp.where((alive > 0.0) & (~hit), 1.0, 0.0)
            alive = alive * hit.astype(jnp.float32) * gate_ok.astype(jnp.float32)
            live = alive > 0.0

            # continuation/termination is decidable right after the trace;
            # with regeneration a terminating lane starts the SAME pixel's
            # next progressive frame at the end of this iteration
            can_bounce = (bounces_left > jnp.uint32(1)).astype(jnp.float32)
            cont = alive * can_bounce
            if persist_mode:
                # restart is gated by the render's total frame budget and
                # (ring variant only) the ring window; a gated lane idles
                # and re-checks every iteration, so a later launch with an
                # advanced `lead` revives it. Free-running lanes never
                # stall short of `end`.
                new_path = valid & (cont <= 0.0) & (fid + jnp.uint32(1) < end)
                if ring_w:
                    new_path &= fid + jnp.uint32(1) < lead
                if stop_ref is not None:
                    # host-decided stop mask (variance-adaptive sampling):
                    # read IN-BODY each iteration — a hoisted read would
                    # be one more live plane across the whole bounce loop
                    # (the measured raygen-hoist regression, PARITY.md)
                    new_path &= stop_ref[:] <= 0.0
            elif regen:
                new_path = (
                    valid & (cont <= 0.0)
                    & (fid < frame_id + jnp.uint32(regen_frames - 1))
                )

            rx, ry, rz = _pcg3d(px, py, fid + bounces_left)
            spec = rz < metal
            if has_transmission:
                trans = (~spec) & (rz < metal + transw)
                # hero-wavelength collapse at the first dispersive event
                dispersive = cauchy > 0.0
                needs_hero = live & trans & dispersive & (hero < 0.0)
                h_new = jnp.minimum(
                    jnp.floor(ry * jnp.float32(s_dim)), jnp.float32(s_dim - 1)
                )
                hero = jnp.where(needs_hero, h_new, hero)
                lam_nm = jnp.where(
                    hero >= 0.0, lam_lo + lam_step * jnp.maximum(hero, 0.0),
                    jnp.float32(587.6),
                )
                lam_um2 = (lam_nm * jnp.float32(1e-3)) ** 2
                n_lam = ior + cauchy / lam_um2
            else:
                trans = spec & (~spec)  # all-false
                needs_hero = None

            offx = ipx + nx * _OFFSET
            offy = ipy + ny * _OFFSET
            offz = ipz + nz * _OFFSET

            cos_out = jnp.maximum(-(dx * nx + dy * ny + dz * nz), 0.0)

            # --- NEE: per-light occlusion + scale; spectra folded per-s.
            # All lights' shadow rays share ONE object loop (fori mode) so
            # per-object scalar loads and loop control are paid once.
            light_rays = []
            light_geo = []
            for l in range(n_lights):
                lx, ly, lz = lpos_ref[l, 0], lpos_ref[l, 1], lpos_ref[l, 2]
                ldx_, ldy_, ldz_ = lx - offx, ly - offy, lz - offz
                dist2 = _dot(ldx_, ldy_, ldz_, ldx_, ldy_, ldz_)
                dist = jnp.sqrt(dist2)
                lnx, lny, lnz = _normalize(ldx_, ldy_, ldz_)
                light_rays.append((offx, offy, offz, lnx, lny, lnz, dist))
                light_geo.append((lnx, lny, lnz, dist2))
            if use_fori and n_lights:
                blockeds = shadow_blocked_fori_multi(
                    geom, light_rays,
                    relevant=live & (~spec) & (~trans),
                    cbounds=cbounds_ref,
                )
            else:
                blockeds = [
                    shadow_blocked(geom, *ray) for ray in light_rays
                ]
            scales = []
            for (lnx, lny, lnz, dist2), blocked in zip(light_geo, blockeds):
                # reference re-normalizes the normalized direction
                l2x, l2y, l2z = _normalize(lnx, lny, lnz)
                cos_in = jnp.maximum(l2x * nx + l2y * ny + l2z * nz, 0.0)
                scales.append(
                    jnp.where(blocked, 0.0, (cos_in * cos_out) / dist2)
                )

            live_f = jnp.where(live, 1.0, 0.0)
            contrib = jnp.where(live & (~spec) & (~trans), 1.0, 0.0)
            for s in range(s_dim):
                thr_s = thr_ref[s]
                if has_emission:
                    emis_s = jnp.zeros((r8, LANE), jnp.float32)
                    if mat_mask is not None:
                        for m in range(n_materials):
                            emis_s = emis_s + jnp.where(
                                mat_mask(m), m_emis_ref[m, s], 0.0
                            )
                    else:
                        for o in range(n_obj):
                            emis_s = emis_s + jnp.where(
                                masks[o], emis_ref[o, s], 0.0
                            )
                    emis_term = live_f * thr_s * emis_s
                    rad_ref[s] = rad_ref[s] + emis_term
                if has_sky:
                    # sky row rides the light-spectrum table (see the
                    # builder docstring); miss lanes are disjoint from
                    # every other radiance term, so placement among
                    # them is f32-order-free.
                    sky_term = missf * thr_s * lspec_ref[sky_row, s]
                    rad_ref[s] = rad_ref[s] + sky_term
                if has_transmission:
                    # collapse throughput onto the hero bin (S-fold weight)
                    pick = jnp.where(
                        hero == jnp.float32(s), jnp.float32(s_dim), 0.0
                    )
                    thr_s = jnp.where(needs_hero, thr_s * pick, thr_s)
                direct_s = jnp.zeros((r8, LANE), jnp.float32)
                for l in range(n_lights):
                    direct_s = direct_s + scales[l] * lspec_ref[l, s]
                alb_s = jnp.zeros((r8, LANE), jnp.float32)
                if mat_mask is not None:
                    for m in range(n_materials):
                        alb_s = alb_s + jnp.where(
                            mat_mask(m), m_alb_ref[m, s], 0.0
                        )
                else:
                    for o in range(n_obj):
                        alb_s = alb_s + jnp.where(masks[o], albedo_ref[o, s], 0.0)
                if texf is not None:
                    alb_s = alb_s * texf
                # select, not multiply-by-mask: 0 * NaN = NaN, and a NaN
                # direct_s on a masked lane (e.g. dist2 == 0 on a dead or
                # specular lane) must not poison the accumulator — mirror
                # integrator.py's jnp.where(contributes, ...) semantics.
                direct_term = jnp.where(
                    contrib > 0.0, thr_s * alb_s * direct_s, 0.0
                )
                rad_ref[s] = rad_ref[s] + direct_term
                if regen:
                    # regenerating lanes start their next path at unit
                    # throughput; continuing lanes multiply in the hit's
                    # albedo. Gated on CONT (not live) to match the
                    # integrator's carried-state contract
                    # (integrator.py: where(cont, thr*albedo, thr)): a
                    # lane ending via the bounce budget shades this
                    # iteration from the LOCAL thr_s * alb_s (direct_term
                    # above), but its carried thr is never read again, so
                    # both kernels and the jnp path agree plane-for-plane.
                    thr_ref[s] = jnp.where(
                        new_path, 1.0,
                        jnp.where(cont > 0.0, thr_s * alb_s, thr_s),
                    )
                else:
                    thr_ref[s] = jnp.where(cont > 0.0, thr_s * alb_s, thr_s)

            # --- continuation rays
            # specular: mirror + optional cone perturbation
            ndoti = nx * dx + ny * dy + nz * dz
            refx = dx - 2.0 * ndoti * nx
            refy = dy - 2.0 * ndoti * ny
            refz = dz - 2.0 * ndoti * nz
            # cone sample around the reflection
            theta_max = rough * rough * (_PI / 2.0)
            cos_t = (1.0 - rx) + rx * jnp.cos(theta_max)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
            phi = 2.0 * _PI * ry
            wx, wy, wz = _normalize(refx, refy, refz)
            near_z = jnp.abs(wz) < 0.999
            ax = jnp.where(near_z, 0.0, 1.0)
            ay = jnp.zeros_like(wx)
            az = jnp.where(near_z, 1.0, 0.0)
            vx, vy, vz = _normalize(
                wy * az - wz * ay, wz * ax - wx * az, wx * ay - wy * ax
            )
            ux = vy * wz - vz * wy
            uy = vz * wx - vx * wz
            uz = vx * wy - vy * wx
            cl_x = sin_t * jnp.cos(phi)
            cl_y = sin_t * jnp.sin(phi)
            conex, coney, conez = _normalize(
                ux * cl_x + vx * cl_y + wx * cos_t,
                uy * cl_x + vy * cl_y + wy * cos_t,
                uz * cl_x + vz * cl_y + wz * cos_t,
            )
            use_cone = rough >= 0.001
            sdx = jnp.where(use_cone, conex, refx)
            sdy = jnp.where(use_cone, coney, refy)
            sdz = jnp.where(use_cone, conez, refz)

            # diffuse: cosine hemisphere about the normal
            # sin(asin(sqrt(rx))) == sqrt(rx); cos == sqrt(1 - rx)
            d_sin = jnp.sqrt(jnp.clip(rx, 0.0, 1.0))
            d_cos = jnp.sqrt(jnp.clip(1.0 - rx, 0.0, 1.0))
            d_phi = 2.0 * _PI * ry
            znx, zny, znz = _normalize(nx, ny, nz)
            near_y = jnp.abs(zny) > 0.9999
            upx = jnp.where(near_y, 1.0, 0.0)
            upy = jnp.where(near_y, 0.0, 1.0)
            upz = jnp.zeros_like(nx)
            bx, by, bz = _normalize(
                upy * znz - upz * zny, upz * znx - upx * znz, upx * zny - upy * znx
            )
            cx, cy, cz = _normalize(
                zny * bz - znz * by, znz * bx - znx * bz, znx * by - zny * bx
            )
            dl_x = d_sin * jnp.cos(d_phi)
            dl_y = d_sin * jnp.sin(d_phi)
            ddx = bx * dl_x + cx * dl_y + znx * d_cos
            ddy = by * dl_x + cy * dl_y + zny * d_cos
            ddz = bz * dl_x + cz * dl_y + znz * d_cos

            if has_transmission:
                # dielectric: Snell + Schlick-Fresnel + TIR
                cosi_signed = -(dx * nx + dy * ny + dz * nz)
                entering = cosi_signed > 0.0
                tsgn = jnp.where(entering, 1.0, -1.0)
                nox_, noy_, noz_ = nx * tsgn, ny * tsgn, nz * tsgn
                cosi = jnp.abs(cosi_signed)
                eta = jnp.where(entering, 1.0 / n_lam, n_lam)
                kk = 1.0 - eta * eta * (1.0 - cosi * cosi)
                tir_m = kk < 0.0
                cos_tr = jnp.sqrt(jnp.maximum(kk, 0.0))
                r0 = ((n_lam - 1.0) / (n_lam + 1.0)) ** 2
                cos_x = jnp.where(entering, cosi, cos_tr)
                fres = r0 + (1.0 - r0) * (1.0 - cos_x) ** 5
                t_reflects = tir_m | (rx < fres)
                # mirror about the oriented normal (== refl: sign cancels)
                coef = eta * cosi - cos_tr
                rfx = dx * eta + nox_ * coef
                rfy = dy * eta + noy_ * coef
                rfz = dz * eta + noz_ * coef
                tdx = jnp.where(t_reflects, refx, rfx)
                tdy = jnp.where(t_reflects, refy, rfy)
                tdz = jnp.where(t_reflects, refz, rfz)
                off_sgn = jnp.where(t_reflects, _OFFSET, -_OFFSET)
                tox = ipx + nox_ * off_sgn
                toy = ipy + noy_ * off_sgn
                toz = ipz + noz_ * off_sgn

            # diffuse continuation starts at the UN-offset hit point
            # (reference quirk src/shader.rs:444) — EXCEPT for sky scenes,
            # where the miss-vs-self-hit ULP coin-flip would pay
            # throughput*sky nondeterministically; mirror
            # integrator.py's static sky gate exactly.
            dgx = offx if has_sky else ipx
            dgy = offy if has_sky else ipy
            dgz = offz if has_sky else ipz
            if has_transmission:
                newdx = jnp.where(spec, sdx, jnp.where(trans, tdx, ddx))
                newdy = jnp.where(spec, sdy, jnp.where(trans, tdy, ddy))
                newdz = jnp.where(spec, sdz, jnp.where(trans, tdz, ddz))
                newox = jnp.where(spec, offx, jnp.where(trans, tox, dgx))
                newoy = jnp.where(spec, offy, jnp.where(trans, toy, dgy))
                newoz = jnp.where(spec, offz, jnp.where(trans, toz, dgz))
            else:
                newdx = jnp.where(spec, sdx, ddx)
                newdy = jnp.where(spec, sdy, ddy)
                newdz = jnp.where(spec, sdz, ddz)
                newox = jnp.where(spec, offx, dgx)
                newoy = jnp.where(spec, offy, dgy)
                newoz = jnp.where(spec, offz, dgz)
            newdx, newdy, newdz = _normalize(newdx, newdy, newdz)

            cl = cont > 0.0
            if regen:
                # ---- next frame's primary ray. The direction is NOT
                # computed in-kernel: raygen re-derived inside the kernel
                # program picks up different FMA contraction than the host
                # raygen and lands ulps away, and a last-ulp origin shift
                # flips the un-offset diffuse self-intersection coin
                # (measured: ~11%/frame of pixels diverge). Instead the
                # host precomputes frames [first+1, first+K) with the SAME
                # generate_primary_rays call the monolithic path uses, and
                # the kernel selects by the lane's frame counter — keeping
                # every path bit-identical to its monolithic rendering.
                nf = fid + jnp.uint32(1)
                if persist_mode and ring_w == 0:
                    # free-running: in-kernel restart raygen. The screen-
                    # wide jitter quirk (one Hammersley offset per FRAME,
                    # reference src/shader.rs:271-293) makes the primary
                    # direction elementwise in (px, py, nf): jitter is
                    # pure bit arithmetic on nf, and everything frame-
                    # independent (per-lane jitter-free direction `base`,
                    # the jitter axis vectors `va`/`vb`, 1/N) is hoisted
                    # to launch entry (`persist_pre`) — the loop body
                    # pays only the Hammersley bits, 8 FMAs and two
                    # rsqrt-normalizes per iteration. This program lands
                    # FMA-ulps from host raygen anyway (documented), so
                    # reciprocal-multiply and rsqrt are fair game.
                    # crx/cry/crz are the CAMERA RIGHT basis — named so
                    # they can never shadow the per-bounce PCG draws
                    # rx/ry/rz (reading those after this block would
                    # silently yield camera components, not randoms)
                    (fx, fy, fz, crx, cry, crz, ux, uy, uz,
                     sx, sy, aspect, inv_n) = persist_pre
                    nff = nf.astype(jnp.int32).astype(jnp.float32)
                    pxf = px.astype(jnp.int32).astype(jnp.float32)
                    pyf = py.astype(jnp.int32).astype(jnp.float32)
                    off_x = (nff + 0.5) * inv_n
                    off_y = _radical_inverse_m(nf + jnp.uint32(1))
                    # x_ndc = ((x+ox)/w*2-1)*aspect = (x+ox)*sx - aspect;
                    # y_ndc = -((y+oy)/h*2-1)      = 1 - (y+oy)*sy
                    x_ndc = (pxf + off_x) * sx - aspect
                    y_ndc = 1.0 - (pyf + off_y) * sy
                    gdx = fx - crx * x_ndc + ux * y_ndc
                    gdy = fy - cry * x_ndc + uy * y_ndc
                    gdz = fz - crz * x_ndc + uz * y_ndc
                    # reference normalizes in raygen AND in Ray::new
                    for _ in range(2):
                        inv = jax.lax.rsqrt(
                            gdx * gdx + gdy * gdy + gdz * gdz
                        )
                        gdx, gdy, gdz = gdx * inv, gdy * inv, gdz * inv
                elif persist_mode:
                    # ring slot by frame modulo (power-of-two -> AND). The
                    # select chain's cost was measured free at K=100 in
                    # the fixed-window kernel; W is the same scale.
                    slot = nf & jnp.uint32(ring_w - 1)
                    gdx, gdy, gdz = dirx_ref[0], diry_ref[0], dirz_ref[0]
                    for w in range(1, ring_w):
                        m = slot == jnp.uint32(w)
                        gdx = jnp.where(m, dirx_ref[w], gdx)
                        gdy = jnp.where(m, diry_ref[w], gdy)
                        gdz = jnp.where(m, dirz_ref[w], gdz)
                else:
                    gdx, gdy, gdz = dirx_ref[0], diry_ref[0], dirz_ref[0]
                    for k in range(2, regen_frames):
                        m = nf == frame_id + jnp.uint32(k)
                        gdx = jnp.where(m, dirx_ref[k - 1], gdx)
                        gdy = jnp.where(m, diry_ref[k - 1], gdy)
                        gdz = jnp.where(m, dirz_ref[k - 1], gdz)
                if not persist_mode and cam_ref.shape[0] > 1:
                    # depth of field: per-frame thin-lens origins
                    # (pack_camera_frames, row k-1 = frame first+k) —
                    # the same frame-counter select as the direction
                    # planes above; rows are bit-identical to host
                    # raygen's origins, so every restarted path stays
                    # bit-identical to its monolithic rendering
                    cpx, cpy, cpz = (
                        cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
                    )
                    for k in range(2, regen_frames):
                        m = nf == frame_id + jnp.uint32(k)
                        cpx = jnp.where(m, cam_ref[k - 1, 0], cpx)
                        cpy = jnp.where(m, cam_ref[k - 1, 1], cpy)
                        cpz = jnp.where(m, cam_ref[k - 1, 2], cpz)
                else:
                    cpx, cpy, cpz = (
                        cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
                    )

                ox = jnp.where(cl, newox, jnp.where(new_path, cpx, ox))
                oy = jnp.where(cl, newoy, jnp.where(new_path, cpy, oy))
                oz = jnp.where(cl, newoz, jnp.where(new_path, cpz, oz))
                dx = jnp.where(cl, newdx, jnp.where(new_path, gdx, dx))
                dy = jnp.where(cl, newdy, jnp.where(new_path, gdy, dy))
                dz = jnp.where(cl, newdz, jnp.where(new_path, gdz, dz))
                gate = jnp.where(
                    cl, spec.astype(jnp.float32),
                    jnp.where(new_path, 0.0, gate),
                )
                hero = jnp.where(new_path, jnp.float32(-1.0), hero)
                alive = jnp.where(new_path, 1.0, cont)
                bl = jnp.where(
                    cl, bl - jnp.uint32(1),
                    jnp.where(new_path, jnp.uint32(max_bounces), bl),
                )
                fid = jnp.where(new_path, nf, fid)
                return (ox, oy, oz, dx, dy, dz, alive, gate, hero, bl, fid)
            ox = jnp.where(cl, newox, ox)
            oy = jnp.where(cl, newoy, oy)
            oz = jnp.where(cl, newoz, oz)
            dx = jnp.where(cl, newdx, dx)
            dy = jnp.where(cl, newdy, dy)
            dz = jnp.where(cl, newdz, dz)
            gate = jnp.where(cl, spec.astype(jnp.float32), gate)
            bl = jnp.where(cl, bl - jnp.uint32(1), bl)
            return (ox, oy, oz, dx, dy, dz, cont, gate, hero, bl, fid)

        def guarded(i, carry):
            if persist_mode:
                # a tile of all-dead lanes may still hold restartable ones
                # (revival happens inside `bounce`); skipping them would
                # deadlock a launch that begins with every lane stalled.
                fid_c = carry[10]
                restartable = valid & (fid_c + jnp.uint32(1) < end)
                if ring_w:
                    restartable &= fid_c + jnp.uint32(1) < lead
                if stop_ref is not None:
                    restartable &= stop_ref[:] <= 0.0
                any_alive = (jnp.max(carry[6]) > 0.0) | (
                    jnp.max(restartable.astype(jnp.float32)) > 0.0
                )
            else:
                any_alive = jnp.max(carry[6]) > 0.0
            return jax.lax.cond(any_alive, lambda c: bounce(i, c), lambda c: c, carry)

        return guarded

    b_start = bounce_start
    b_stop = max_bounces if bounce_stop is None else bounce_stop

    def _trace_tile(
        frame_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        px_ref, py_ref,
        geom_ref, cb_ref, albedo_ref, emis_ref,
        m_alb_ref, m_emis_ref, m_scal_ref,
        lpos_ref, lspec_ref,
        rad_ref, thr_ref,
    ):
        """Shared monolithic-kernel body: init the tile's radiance/
        throughput planes, build the bounce body, run the bounce loop.
        Returns the final carry (``kernel`` discards it; ``kernel_cost``
        derives the per-lane path cost from carry slot 9, the bounce
        budget ``bl`` — keep that slot's position in sync with
        ``make_body``'s carry layout)."""
        # lane validity: global index < n_valid
        tile_idx = pl.program_id(0)
        row = jax.lax.broadcasted_iota(jnp.int32, (r8, LANE), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (r8, LANE), 1)
        gidx = tile_idx * tile + row * LANE + col
        alive0 = (gidx < n_valid).astype(jnp.float32)

        for s in range(s_dim):
            rad_ref[s] = jnp.zeros((r8, LANE), jnp.float32)
            thr_ref[s] = jnp.ones((r8, LANE), jnp.float32)

        guarded = make_body(
            frame_ref, px_ref, py_ref, geom_ref, albedo_ref, emis_ref,
            m_alb_ref, m_emis_ref, m_scal_ref,
            lpos_ref, lspec_ref, rad_ref, thr_ref,
            cbounds_ref=cb_ref,
        )
        carry = (
            ox_ref[:], oy_ref[:], oz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:],
            alive0, jnp.zeros((r8, LANE), jnp.float32),
            jnp.full((r8, LANE), -1.0, jnp.float32),  # hero wavelength bin
            jnp.full((r8, LANE), max_bounces - b_start, jnp.uint32),
            jnp.zeros((r8, LANE), jnp.uint32) + frame_ref[0, 0],
        )
        return jax.lax.fori_loop(b_start, b_stop, guarded, carry)

    def kernel(
        frame_ref,  # SMEM (1,1) uint32
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # [R8,128] f32
        px_ref, py_ref,  # [R8,128] uint32
        geom_ref,  # [GEOM_COLS, O] f32 (SMEM; lane-padded minor dim = O)
        cb_ref,  # [8, n_runs] f32 (SMEM) cluster bounds (dummy unclustered)
        albedo_ref,  # [O, S] f32 (SMEM)
        emis_ref,  # [O, S] f32 (SMEM)
        m_alb_ref,  # [M, S] f32 (SMEM)
        m_emis_ref,  # [M, S] f32 (SMEM)
        m_scal_ref,  # [M, 8] f32 (SMEM)
        lpos_ref,  # [L, 4] f32 (SMEM)
        lspec_ref,  # [L, S] f32 (SMEM)
        rad_ref,  # out [S, R8, 128] f32
        thr_ref,  # scratch [S, R8, 128] f32
    ):
        _trace_tile(
            frame_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            px_ref, py_ref, geom_ref, cb_ref, albedo_ref, emis_ref,
            m_alb_ref, m_emis_ref, m_scal_ref, lpos_ref, lspec_ref,
            rad_ref, thr_ref,
        )

    def kernel_cost(
        frame_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        px_ref, py_ref,
        geom_ref, cb_ref, albedo_ref, emis_ref,
        m_alb_ref, m_emis_ref, m_scal_ref,
        lpos_ref, lspec_ref,
        rad_ref, cost_ref, thr_ref,
    ):
        """Monolithic kernel + per-lane path-cost output: the number of
        bounce iterations each lane executed while alive (its realized
        path length this frame) — the probe behind cost-sorted pixel->
        lane assignment for the regeneration kernel."""
        out = _trace_tile(
            frame_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            px_ref, py_ref, geom_ref, cb_ref, albedo_ref, emis_ref,
            m_alb_ref, m_emis_ref, m_scal_ref, lpos_ref, lspec_ref,
            rad_ref, thr_ref,
        )
        # bl decrements once per continued iteration and freezes at death:
        # live iterations = max_bounces - bl_final + 1 (a lane that dies on
        # its primary trace scores 1; a budget-exhausted lane scores
        # max_bounces; never-alive padding scores a harmless 1)
        bl_f = out[9].astype(jnp.int32).astype(jnp.float32)
        cost_ref[:] = jnp.float32(max_bounces + 1) - bl_f

    def kernel_regen(
        frame_ref,  # SMEM (1,1) uint32: FIRST frame id of the K-frame run
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # [R8,128] f32
        px_ref, py_ref,  # [R8,128] uint32
        geom_ref, cb_ref, albedo_ref, emis_ref,
        m_alb_ref, m_emis_ref, m_scal_ref,
        lpos_ref, lspec_ref,
        cam_ref,  # [1,4] f32 (SMEM): camera position (pack_camera); or
        # [K-1,4] per-frame thin-lens origins for a depth-of-field
        # render (pack_camera_frames, selected by frame counter)
        dirx_ref, diry_ref, dirz_ref,  # [K-1, R8, 128] f32: frames 1..K-1
        rad_ref, thr_ref,
    ):
        """Path-regeneration kernel: K progressive frames per launch.
        ``rad_ref`` accumulates the SUM of the K frames' radiance."""
        tile_idx = pl.program_id(0)
        row = jax.lax.broadcasted_iota(jnp.int32, (r8, LANE), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (r8, LANE), 1)
        gidx = tile_idx * tile + row * LANE + col
        valid = gidx < n_valid
        alive0 = valid.astype(jnp.float32)

        for s in range(s_dim):
            rad_ref[s] = jnp.zeros((r8, LANE), jnp.float32)
            thr_ref[s] = jnp.ones((r8, LANE), jnp.float32)

        guarded = make_body(
            frame_ref, px_ref, py_ref, geom_ref, albedo_ref, emis_ref,
            m_alb_ref, m_emis_ref, m_scal_ref,
            lpos_ref, lspec_ref, rad_ref, thr_ref,
            cam_ref=cam_ref, valid=valid,
            dirx_ref=dirx_ref, diry_ref=diry_ref, dirz_ref=dirz_ref,
            cbounds_ref=cb_ref,
        )
        carry = (
            ox_ref[:], oy_ref[:], oz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:],
            alive0, jnp.zeros((r8, LANE), jnp.float32),
            jnp.full((r8, LANE), -1.0, jnp.float32),
            jnp.full((r8, LANE), max_bounces, jnp.uint32),
            jnp.zeros((r8, LANE), jnp.uint32) + frame_ref[0, 0],
        )
        # worst case: every path on some lane runs the full bounce budget;
        # expected executed iterations per tile ~ K * mean path length +
        # straggler tail (the all-done guard skips the rest)
        jax.lax.fori_loop(0, regen_frames * max_bounces, guarded, carry)

    def _persist_core(
        lead_ref, end_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        px_ref, py_ref, alive_in, gate_in, hero_in, bl_in, fid_in,
        geom_ref, cb_ref, albedo_ref, emis_ref,
        m_alb_ref, m_emis_ref, m_scal_ref,
        lpos_ref, lspec_ref, cam_ref,
        ringx_ref, ringy_ref, ringz_ref,
        thr_in_ref, rad_in_ref,
        rad_ref, thr_ref,
        oxo_ref, oyo_ref, ozo_ref, dxo_ref, dyo_ref, dzo_ref,
        alive_o, gate_o, hero_o, bl_o, fid_o,
        stop_ref=None,
    ):
        """Persistent-state kernel body: exactly ``budget`` bounce
        iterations over carried lane state; lanes advance through their
        own frame streams, restarting from the primary-direction ring
        (ring variant) or from in-kernel raygen (free-running,
        ``lead_ref``/ring refs None)."""
        tile_idx = pl.program_id(0)
        row = jax.lax.broadcasted_iota(jnp.int32, (r8, LANE), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (r8, LANE), 1)
        gidx = tile_idx * tile + row * LANE + col
        valid = gidx < n_valid

        for s in range(s_dim):
            rad_ref[s] = rad_in_ref[s]
            thr_ref[s] = thr_in_ref[s]

        persist_pre = None
        if ring_w == 0:
            # hoist the frame-independent SCALARS of the restart raygen
            # to launch entry (repeated SMEM scalar reads serialize
            # against vector math — the member-unroll finding). Only
            # scalars: hoisting the per-lane jitter-free direction as 3
            # extra loop-carried planes measured 4.68 -> 5.78 ms/frame
            # on cornell512 (live-range pressure on the bounce body).
            cb = cam_ref
            focal, aspect = cb[0, 12], cb[0, 13]
            inv_w, inv_h = 1.0 / cb[0, 14], 1.0 / cb[0, 15]
            persist_pre = (
                cb[0, 3] * focal, cb[0, 4] * focal, cb[0, 5] * focal,
                cb[0, 6], cb[0, 7], cb[0, 8],
                cb[0, 9], cb[0, 10], cb[0, 11],
                2.0 * inv_w * aspect, 2.0 * inv_h, aspect,
                1.0 / cb[0, 16],
            )
        guarded = make_body(
            end_ref if lead_ref is None else lead_ref,  # frame_id unused
            px_ref, py_ref, geom_ref, albedo_ref, emis_ref,
            m_alb_ref, m_emis_ref, m_scal_ref,
            lpos_ref, lspec_ref, rad_ref, thr_ref,
            cam_ref=cam_ref, valid=valid,
            dirx_ref=ringx_ref, diry_ref=ringy_ref, dirz_ref=ringz_ref,
            cbounds_ref=cb_ref,
            lead=None if lead_ref is None else lead_ref[0, 0],
            end=end_ref[0, 0],
            persist_pre=persist_pre,
            stop_ref=stop_ref,
        )
        carry = (
            ox_ref[:], oy_ref[:], oz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:],
            alive_in[:], gate_in[:], hero_in[:],
            bl_in[:], fid_in[:],
        )
        # whole-launch tile skip: a tile with no live and no restartable
        # lane cannot acquire one mid-launch (`lead`/`end`/stop mask are
        # launch constants), so one reduce replaces `budget` per-iteration
        # guard evaluations — measured 29-launch cornell512 runs spent
        # more time in finished tiles' guard loops than in real work
        fid0 = fid_in[:]
        startable = valid & (fid0 + jnp.uint32(1) < end_ref[0, 0])
        if lead_ref is not None:
            startable &= fid0 + jnp.uint32(1) < lead_ref[0, 0]
        if stop_ref is not None:
            startable &= stop_ref[:] <= 0.0
        has_work = (jnp.max(alive_in[:]) > 0.0) | (
            jnp.max(startable.astype(jnp.float32)) > 0.0
        )
        out = jax.lax.cond(
            has_work,
            lambda c: jax.lax.fori_loop(0, budget, guarded, c),
            lambda c: c,
            carry,
        )
        oxo_ref[:], oyo_ref[:], ozo_ref[:] = out[0], out[1], out[2]
        dxo_ref[:], dyo_ref[:], dzo_ref[:] = out[3], out[4], out[5]
        alive_o[:], gate_o[:], hero_o[:] = out[6], out[7], out[8]
        bl_o[:], fid_o[:] = out[9], out[10]

    # persist positional-ref layout — the ONE definition both the
    # kernel_persist splices and run_persist's alias/index arithmetic
    # derive from: [lead?] end | _PS_STATE state planes (ox..dz, px, py,
    # alive, gate, hero, bl, fid) | [stop?] | _PS_TABLES tables
    # (geom, cbounds, albedo, emission, m_alb, m_emis, m_scal, lpos,
    # lspec, cam) | [3 ring planes?] | thr_in, rad_in || outputs:
    # rad, thr, 11 state planes
    _PS_STATE = 13
    _PS_TABLES = 10

    if ring_w:
        def kernel_persist(lead_ref, end_ref, *refs):
            _persist_core(lead_ref, end_ref, *refs)
    elif lane_stop:
        def kernel_persist(end_ref, *refs):
            # free-running + stop mask: inputs are the state planes, the
            # read-only stop plane, the tables, thr_in, rad_in; outputs
            # are rad, thr, 11 state planes (the stop plane has no
            # output). The splice indices derive from _PS_STATE /
            # _PS_TABLES, shared with run_persist's alias arithmetic —
            # one layout definition, so they cannot drift apart.
            state_in, stop_in = refs[:_PS_STATE], refs[_PS_STATE]
            mid = _PS_STATE + 1
            tabs = refs[mid:mid + _PS_TABLES]
            spec_in = refs[mid + _PS_TABLES:mid + _PS_TABLES + 2]
            outs = refs[mid + _PS_TABLES + 2:]
            _persist_core(
                None, end_ref, *state_in, *tabs,
                None, None, None, *spec_in, *outs,
                stop_ref=stop_in,
            )
    else:
        def kernel_persist(end_ref, *refs):
            # free-running: no lead scalar, no ring planes — splice Nones
            # into the core's ring-ref slots
            pre = refs[:_PS_STATE + _PS_TABLES]
            post = refs[_PS_STATE + _PS_TABLES:]
            _persist_core(None, end_ref, *pre, None, None, None, *post)

    def kernel_seg(
        frame_ref,  # SMEM (1,1) uint32
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # [R8,128] f32
        px_ref, py_ref,  # [R8,128] uint32
        geom_ref, cb_ref, albedo_ref, emis_ref,
        m_alb_ref, m_emis_ref, m_scal_ref,
        lpos_ref, lspec_ref,  # SMEM tables
        thr_in_ref,  # [S, R8, 128] f32
        rad_in_ref,  # [S, R8, 128] f32
        alive_in_ref, gate_in_ref, hero_in_ref,  # [R8,128] f32
        # outputs
        rad_ref, thr_ref,
        oxo_ref, oyo_ref, ozo_ref, dxo_ref, dyo_ref, dzo_ref,
        alive_o_ref, gate_o_ref, hero_o_ref,
    ):
        """Bounce-segment variant: full wavefront state in and out, so the
        host can permute live lanes to the front between segments (tiles
        that become all-dead then skip their remaining bounces)."""
        for s in range(s_dim):
            rad_ref[s] = rad_in_ref[s]
            thr_ref[s] = thr_in_ref[s]

        guarded = make_body(
            frame_ref, px_ref, py_ref, geom_ref, albedo_ref, emis_ref,
            m_alb_ref, m_emis_ref, m_scal_ref,
            lpos_ref, lspec_ref, rad_ref, thr_ref,
            cbounds_ref=cb_ref,
        )
        carry = (
            ox_ref[:], oy_ref[:], oz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:],
            alive_in_ref[:], gate_in_ref[:], hero_in_ref[:],
            # live lanes entering a segment are all at bounce b_start
            jnp.full((r8, LANE), max_bounces - b_start, jnp.uint32),
            jnp.zeros((r8, LANE), jnp.uint32) + frame_ref[0, 0],
        )
        out = jax.lax.fori_loop(b_start, b_stop, guarded, carry)
        oxo_ref[:], oyo_ref[:], ozo_ref[:] = out[0], out[1], out[2]
        dxo_ref[:], dyo_ref[:], dzo_ref[:] = out[3], out[4], out[5]
        alive_o_ref[:], gate_o_ref[:], hero_o_ref[:] = out[6], out[7], out[8]

    @functools.partial(jax.jit, static_argnames=())
    def run(
        ox, oy, oz, dx, dy, dz, px, py, frame_id,
        geom, cbounds, albedo, emission, m_albedo, m_emission, m_scalars,
        lpos, lspec,
    ):
        np_lanes = ox.shape[0] * ox.shape[1]
        n_tiles = _grid_tiles(np_lanes, tile)
        ray_spec = pl.BlockSpec(
            (r8, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec(
            (s_dim, r8, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                smem,  # frame id (1,1)
                ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                ray_spec, ray_spec,
                # scalar-indexed tables live in SMEM
                smem, smem, smem, smem, smem, smem, smem, smem, smem,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(
                (s_dim, np_lanes // LANE, LANE), jnp.float32
            ),
            scratch_shapes=[pltpu.VMEM((s_dim, r8, LANE), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(
            frame_id.reshape(1, 1), ox, oy, oz, dx, dy, dz, px, py,
            geom, cbounds, albedo, emission, m_albedo, m_emission,
            m_scalars, lpos, lspec,
        )

    @functools.partial(jax.jit, static_argnames=())
    def run_regen(
        ox, oy, oz, dx, dy, dz, px, py, frame_id,
        geom, cbounds, albedo, emission, m_albedo, m_emission, m_scalars,
        lpos, lspec, cam, dirx, diry, dirz,
    ):
        np_lanes = ox.shape[0] * ox.shape[1]
        n_tiles = _grid_tiles(np_lanes, tile)
        ray_spec = pl.BlockSpec(
            (r8, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        dir_spec = pl.BlockSpec(
            (regen_frames - 1, r8, LANE), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (s_dim, r8, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel_regen,
            grid=(n_tiles,),
            in_specs=[
                smem,
                ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                ray_spec, ray_spec,
                smem, smem, smem, smem, smem, smem, smem, smem, smem,
                smem,  # cam table
                dir_spec, dir_spec, dir_spec,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(
                (s_dim, np_lanes // LANE, LANE), jnp.float32
            ),
            scratch_shapes=[pltpu.VMEM((s_dim, r8, LANE), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(
            frame_id.reshape(1, 1), ox, oy, oz, dx, dy, dz, px, py,
            geom, cbounds, albedo, emission, m_albedo, m_emission,
            m_scalars, lpos, lspec, cam, dirx, diry, dirz,
        )

    @functools.partial(jax.jit, static_argnames=())
    def run_persist(
        ox, oy, oz, dx, dy, dz, px, py,
        alive, gate, hero, bl, fid, thr, rad,
        lead, end,
        geom, cbounds, albedo, emission, m_albedo, m_emission, m_scalars,
        lpos, lspec, cam, ringx=None, ringy=None, ringz=None,
        stop=None,
    ):
        np_lanes = ox.shape[0] * ox.shape[1]
        n_tiles = _grid_tiles(np_lanes, tile)
        ray_spec = pl.BlockSpec(
            (r8, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        spec_spec = pl.BlockSpec(
            (s_dim, r8, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        lane_f32 = jax.ShapeDtypeStruct((np_lanes // LANE, LANE), jnp.float32)
        lane_u32 = jax.ShapeDtypeStruct((np_lanes // LANE, LANE), jnp.uint32)
        spec_shape = jax.ShapeDtypeStruct(
            (s_dim, np_lanes // LANE, LANE), jnp.float32
        )
        # input order: [lead?] end state... [stop mask] tables cam
        # [ring?] thr rad; state planes, thr and rad update in place via
        # aliasing (the stop mask is read-only: no output, no alias)
        lead_in, lead_spec = ((lead.reshape(1, 1),), (smem,)) if ring_w \
            else ((), ())
        if ring_w:
            ring_spec = pl.BlockSpec(
                (ring_w, r8, LANE), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
            ring_in = (ringx, ringy, ringz)
            ring_specs = (ring_spec,) * 3
        else:
            ring_in, ring_specs = (), ()
        if lane_stop:
            stop_in, stop_specs = (stop,), (ray_spec,)
        else:
            stop_in, stop_specs = (), ()
        base = len(lead_in) + 1  # index of ox
        # last table (cam) sits after state + [stop] + the other tables
        cam_idx = base + _PS_STATE + len(stop_in) + (_PS_TABLES - 1)
        thr_idx = cam_idx + 1 + len(ring_in)
        aliases = {base + i: 2 + i for i in range(6)}  # ray planes
        aliases.update({base + 8 + i: 8 + i for i in range(5)})  # flags/ctrs
        aliases[thr_idx] = 1
        aliases[thr_idx + 1] = 0
        return pl.pallas_call(
            kernel_persist,
            grid=(n_tiles,),
            in_specs=[
                *lead_spec, smem,  # [lead], end
                ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                ray_spec, ray_spec,  # px, py
                ray_spec, ray_spec, ray_spec,  # alive, gate, hero
                ray_spec, ray_spec,  # bl, fid
                *stop_specs,  # host stop mask
                smem, smem, smem, smem, smem, smem, smem, smem, smem,
                smem,  # cam
                *ring_specs,
                spec_spec, spec_spec,  # thr_in, rad_in
            ],
            out_specs=(
                spec_spec, spec_spec,
                ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                ray_spec, ray_spec, ray_spec,
                ray_spec, ray_spec,
            ),
            out_shape=(
                spec_shape, spec_shape,
                lane_f32, lane_f32, lane_f32, lane_f32, lane_f32, lane_f32,
                lane_f32, lane_f32, lane_f32,
                lane_u32, lane_u32,
            ),
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(
            *lead_in, end.reshape(1, 1),
            ox, oy, oz, dx, dy, dz, px, py,
            alive, gate, hero, bl, fid, *stop_in,
            geom, cbounds, albedo, emission, m_albedo, m_emission,
            m_scalars, lpos, lspec, cam, *ring_in,
            thr, rad,
        )

    @functools.partial(jax.jit, static_argnames=())
    def run_cost(
        ox, oy, oz, dx, dy, dz, px, py, frame_id,
        geom, cbounds, albedo, emission, m_albedo, m_emission, m_scalars,
        lpos, lspec,
    ):
        np_lanes = ox.shape[0] * ox.shape[1]
        n_tiles = _grid_tiles(np_lanes, tile)
        ray_spec = pl.BlockSpec(
            (r8, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec(
            (s_dim, r8, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel_cost,
            grid=(n_tiles,),
            in_specs=[
                smem,
                ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                ray_spec, ray_spec,
                smem, smem, smem, smem, smem, smem, smem, smem, smem,
            ],
            out_specs=(out_spec, ray_spec),
            out_shape=(
                jax.ShapeDtypeStruct(
                    (s_dim, np_lanes // LANE, LANE), jnp.float32
                ),
                jax.ShapeDtypeStruct((np_lanes // LANE, LANE), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((s_dim, r8, LANE), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(
            frame_id.reshape(1, 1), ox, oy, oz, dx, dy, dz, px, py,
            geom, cbounds, albedo, emission, m_albedo, m_emission,
            m_scalars, lpos, lspec,
        )

    if persist_mode:
        return run_persist

    if regen:
        return run_regen

    if cost_out:
        return run_cost

    if not state_io:
        return run

    @functools.partial(jax.jit, static_argnames=())
    def run_seg(
        ox, oy, oz, dx, dy, dz, px, py, frame_id,
        geom, cbounds, albedo, emission, m_albedo, m_emission, m_scalars,
        lpos, lspec, thr, rad, alive, gate, hero,
    ):
        np_lanes = ox.shape[0] * ox.shape[1]
        n_tiles = _grid_tiles(np_lanes, tile)
        ray_spec = pl.BlockSpec(
            (r8, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        spec_spec = pl.BlockSpec(
            (s_dim, r8, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        lane_shape = jax.ShapeDtypeStruct((np_lanes // LANE, LANE), jnp.float32)
        spec_shape = jax.ShapeDtypeStruct(
            (s_dim, np_lanes // LANE, LANE), jnp.float32
        )
        return pl.pallas_call(
            kernel_seg,
            grid=(n_tiles,),
            in_specs=[
                smem,
                ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                ray_spec, ray_spec,
                smem, smem, smem, smem, smem, smem, smem, smem, smem,
                spec_spec, spec_spec, ray_spec, ray_spec, ray_spec,
            ],
            out_specs=(
                spec_spec, spec_spec,
                ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                ray_spec, ray_spec, ray_spec,
            ),
            out_shape=(
                spec_shape, spec_shape,
                lane_shape, lane_shape, lane_shape,
                lane_shape, lane_shape, lane_shape,
                lane_shape, lane_shape, lane_shape,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(
            frame_id.reshape(1, 1), ox, oy, oz, dx, dy, dz, px, py,
            geom, cbounds, albedo, emission, m_albedo, m_emission,
            m_scalars, lpos, lspec,
            thr, rad, alive, gate, hero,
        )

    return run_seg


def _morton3(q: "np.ndarray") -> "np.ndarray":
    """Interleave 10-bit xyz quantized coordinates into a Morton key."""
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )


def plan_clusters(
    aabb_min: "np.ndarray",
    aabb_max: "np.ndarray",
    obj_types: tuple[int, ...],
    cluster_size: int = 32,
    min_run: int = 8,
    camera_pos=None,
):
    """Host-side cluster plan for the culled many-object loop.

    Objects are partitioned by type, Morton-sorted by world-AABB center
    within each type, and chunked into clusters of ``cluster_size``. Runs
    smaller than ``min_run`` stay unclustered (always visited — the cond
    overhead would exceed the skipped work).

    ``camera_pos`` orders the clusters front-to-back from the camera:
    near clusters tighten every lane's ``t_best`` early, so the
    ``ct_min < t_best`` relevance test skips far clusters outright —
    free early-out for the (dominant) primary bounces. Pure visit-order
    change; results stay identical (original-index tie rule).

    Returns ``(sigma, runs)``:
    * ``sigma``: tuple of original object indices in visit order (the
      geometry table is reordered by it — ``pack_geometry(scene, sigma)``);
    * ``runs``: tuple of ``(type_tag, start, stop, clustered)`` in the NEW
      index space, one entry per cluster (or per unclustered type run).

    Both are static (hashable) so the kernel specializes on them; the
    cluster AABBs themselves stay runtime arrays.
    """
    amin = np.asarray(aabb_min, np.float64)
    amax = np.asarray(aabb_max, np.float64)
    centers = (amin + amax) * 0.5
    types = np.asarray(obj_types, np.int32)
    lo = centers.min(axis=0)
    span = np.maximum(centers.max(axis=0) - lo, 1e-9)
    q = np.clip(((centers - lo) / span * 1023.0), 0, 1023).astype(np.uint32)
    keys = _morton3(q)

    sigma: list[int] = []
    runs: list[tuple[int, int, int, bool]] = []
    for tag in sorted(set(obj_types)):
        idx = np.nonzero(types == tag)[0]
        if len(idx) < min_run:
            start = len(sigma)
            sigma.extend(int(i) for i in idx)
            runs.append((int(tag), start, len(sigma), False))
            continue
        order = idx[np.argsort(keys[idx], kind="stable")]
        chunks = [
            order[c0:c0 + cluster_size]
            for c0 in range(0, len(order), cluster_size)
        ]
        if camera_pos is not None:
            cam = np.asarray(camera_pos, np.float64)
            chunks.sort(
                key=lambda ch: float(
                    np.linalg.norm(centers[ch].mean(axis=0) - cam)
                )
            )
        for chunk in chunks:
            start = len(sigma)
            sigma.extend(int(i) for i in chunk)
            runs.append((int(tag), start, len(sigma), True))
    return tuple(sigma), tuple(runs)


def pack_cluster_bounds(scene: SceneArrays, sigma: tuple, runs: tuple):
    """[8, n_runs] world-AABB union per run (min xyz, max xyz, pad) for
    the in-kernel cluster slab test — transposed like ``pack_geometry``
    so run count rides the lane-padded SMEM minor dim. Unclustered runs
    get columns too (never read). Computed in-jit — cluster membership is
    static, bounds follow the runtime scene values."""
    sig = jnp.asarray(np.asarray(sigma, np.int32))
    amin = scene.aabb_min[sig]
    amax = scene.aabb_max[sig]
    rows = []
    z = jnp.zeros((2,), jnp.float32)
    for _tag, start, stop, _clustered in runs:
        rows.append(
            jnp.concatenate(
                [amin[start:stop].min(axis=0), amax[start:stop].max(axis=0), z]
            )
        )
    return jnp.stack(rows).astype(jnp.float32).T


def pack_camera(scene: SceneArrays) -> jax.Array:
    """[1, 4] SMEM table for the path-regeneration kernel: the camera
    position (every regenerated primary ray originates there; the per-frame
    directions are host-precomputed and shipped as arrays — see the
    regeneration note in ``make_body``)."""
    z = jnp.zeros((), jnp.float32)
    return jnp.stack(
        [scene.cam_pos[0], scene.cam_pos[1], scene.cam_pos[2], z]
    ).astype(jnp.float32).reshape(1, 4)


def pack_camera_frames(
    scene: SceneArrays, config: RenderConfig, first_frame_id, k: int
) -> jax.Array:
    """[k-1, 4] SMEM table for a DEPTH-OF-FIELD path-regeneration launch:
    row ``j-1`` is frame ``first+j``'s thin-lens camera origin (one lens
    point per FRAME — screen-wide, like the reference's Hammersley jitter
    — so the origin is frame-constant and fits an SMEM scalar row). Built
    with the host raygen's own :func:`camera_basis` + :func:`lens_point`
    ops, so each row is bit-identical to the origin
    ``generate_primary_rays`` would produce for that frame; the kernel
    selects a restarting lane's origin by its frame counter exactly like
    the host-precomputed direction planes."""
    from spectral_tpu.render.camera import camera_basis, lens_point

    _fwd, right, true_up, _focal, _aspect = camera_basis(
        scene.cam_dir, scene.cam_up, scene.fov_y_deg,
        config.width, config.height,
    )
    first_frame_id = jnp.asarray(first_frame_id, jnp.uint32)
    z = jnp.zeros((), jnp.float32)
    rows = []
    for j in range(1, int(k)):
        shift = lens_point(
            right, true_up, scene.cam_aperture,
            first_frame_id + jnp.uint32(j),
        )
        rows.append(
            jnp.stack([
                scene.cam_pos[0] + shift.x,
                scene.cam_pos[1] + shift.y,
                scene.cam_pos[2] + shift.z,
                z,
            ])
        )
    return jnp.stack(rows).astype(jnp.float32)


def pack_camera_basis(scene: SceneArrays, config: RenderConfig) -> jax.Array:
    """[1, 20] SMEM table for the FREE-RUNNING persist kernel's in-kernel
    restart raygen: camera position (cols 0-2, same slots as
    ``pack_camera`` so ``make_body``'s origin reads are unchanged), the
    frame-independent basis from :func:`camera_basis` — forward (3-5),
    right (6-8), true_up (9-11), focal (12), aspect (13) — plus the NDC
    divisors width/height (14-15) and the Hammersley denominator
    ``intended_frames`` (16). Basis values are computed ONCE here with
    the host raygen's exact op order, so only the per-lane NDC/direction
    arithmetic can differ (by FMA ulps) from host raygen."""
    from spectral_tpu.render.camera import camera_basis

    fwd, right, true_up, focal, aspect = camera_basis(
        scene.cam_dir, scene.cam_up, scene.fov_y_deg,
        config.width, config.height,
    )
    z = jnp.zeros((), jnp.float32)
    cols = [
        scene.cam_pos[0], scene.cam_pos[1], scene.cam_pos[2],
        fwd.x, fwd.y, fwd.z,
        right.x, right.y, right.z,
        true_up.x, true_up.y, true_up.z,
        focal, aspect,
        jnp.float32(config.width), jnp.float32(config.height),
        jnp.float32(config.intended_frames),
        z, z, z,
    ]
    return jnp.stack([jnp.asarray(c, jnp.float32) for c in cols]).reshape(1, 20)


def pack_geometry(
    scene: SceneArrays,
    sigma: tuple | None = None,
    layout: tuple | None = None,
) -> jax.Array:
    """Pack per-object geometry/material scalars into the [n_rows, O]
    table — TRANSPOSED so the object count rides the (lane-padded) minor
    dimension: Mosaic pads an SMEM window's minor dim to 128 lanes, so an
    [O, 38] layout would cost O x 128 x 4 bytes of the 1 MiB SMEM (3.3 MB
    at mesh5k's 6,405 rows) while [38, O] costs 38 x pad128(O) x 4
    (~993 KB). ``sigma`` (a static visit-order permutation from
    ``plan_clusters``) reorders the object columns; the _ORIG row always
    carries the ORIGINAL object index so the clustered loop can keep the
    reference's lowest-original-index tie rule.

    ``layout`` is the ``geom_layout(...)`` result for the scene's static
    feature set: only its ``rows`` are kept (compact table — the kernel
    shadows its row-index constants to match). It must be built from the
    SAME ``(obj_types, has_transmission, has_texture)`` the kernel is
    compiled with; ``None`` packs the legacy full 38-row table (standalone
    tools only — ``build_megakernel`` now always expects compact)."""
    o = scene.obj_type.shape[0]
    geom = jnp.zeros((o, GEOM_COLS), dtype=jnp.float32)
    geom = geom.at[:, _SLAB_MIN:_SLAB_MIN + 3].set(scene.slab_min)
    geom = geom.at[:, _SLAB_MAX:_SLAB_MAX + 3].set(scene.slab_max)
    # shift slot: rotbox center / sphere center
    is_sphere = (scene.obj_type == OBJ_SPHERE)[:, None]
    shift = jnp.where(is_sphere, scene.sphere_pos, scene.shift)
    geom = geom.at[:, _SHIFT:_SHIFT + 3].set(shift)
    geom = geom.at[:, _INV_ROT:_INV_ROT + 9].set(scene.inv_rot.reshape(o, 9))
    geom = geom.at[:, _ROT:_ROT + 9].set(scene.rot.reshape(o, 9))
    geom = geom.at[:, _RADIUS].set(scene.radius)
    geom = geom.at[:, _METAL].set(scene.metallicness)
    geom = geom.at[:, _ROUGH].set(scene.roughness)
    geom = geom.at[:, _TRANS].set(scene.transmission)
    geom = geom.at[:, _IOR].set(scene.ior)
    geom = geom.at[:, _CAUCHY].set(scene.cauchy_b)
    geom = geom.at[:, _MATID].set(scene.mat_id.astype(jnp.float32))
    geom = geom.at[:, _TYPE].set(scene.obj_type.astype(jnp.float32))
    geom = geom.at[:, _TEXS].set(scene.tex_scale)
    geom = geom.at[:, _TEXL].set(scene.tex_low)
    geom = geom.at[:, _ORIG].set(
        jnp.arange(o, dtype=jnp.int32).astype(jnp.float32)
    )
    if sigma is not None:
        geom = geom[jnp.asarray(np.asarray(sigma, np.int32))]
    if layout is not None:
        geom = geom[:, jnp.asarray(np.asarray(layout[1], np.int32))]
    return geom.T
