"""Pallas-accelerated frame integration.

Same semantics as ``spectral_tpu.render.integrator.integrate_frame`` but
the whole bounce loop runs inside the VMEM-resident megakernel
(``spectral_tpu.ops.pallas.megakernel``). The kernel is specialized on
the static scene *structure* (object type list + render config) and
cached; scene *values* (positions, spectra, materials) stay runtime
arrays, so editing a scene without changing its shape reuses the
compiled kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spectral_tpu.ops.pallas import megakernel as mk
from spectral_tpu.render.camera import generate_primary_rays, scene_dof
from spectral_tpu.render.color import spectra_to_rgb
from spectral_tpu.render.integrator import accumulate_frame
from spectral_tpu.scene.flatten import RenderConfig, SceneArrays


@functools.lru_cache(maxsize=32)
def _kernel(
    obj_types: tuple,
    config: RenderConfig,
    tile: int,
    interpret: bool,
    has_transmission: bool,
    has_emission: bool,
    object_loop: str = "auto",
    cluster_runs: tuple | None = None,
    has_texture: bool = False,
    has_sky: bool = False,
):
    return mk.build_megakernel(
        obj_types,
        config,
        tile=tile,
        interpret=interpret,
        has_transmission=has_transmission,
        has_emission=has_emission,
        object_loop=object_loop,
        cluster_runs=cluster_runs,
        has_texture=has_texture,
        has_sky=has_sky,
    )


@functools.lru_cache(maxsize=64)
def _kernel_seg(
    obj_types: tuple,
    config: RenderConfig,
    tile: int,
    interpret: bool,
    has_transmission: bool,
    has_emission: bool,
    bounce_start: int,
    bounce_stop: int | None,
    cluster_runs: tuple | None = None,
    has_texture: bool = False,
    has_sky: bool = False,
):
    return mk.build_megakernel(
        obj_types,
        config,
        tile=tile,
        interpret=interpret,
        has_transmission=has_transmission,
        has_emission=has_emission,
        bounce_start=bounce_start,
        bounce_stop=bounce_stop,
        state_io=True,
        cluster_runs=cluster_runs,
        has_texture=has_texture,
        has_sky=has_sky,
    )


@functools.lru_cache(maxsize=32)
def _kernel_regen(
    obj_types: tuple,
    config: RenderConfig,
    tile: int,
    interpret: bool,
    has_transmission: bool,
    has_emission: bool,
    object_loop: str,
    regen_frames: int,
    cluster_runs: tuple | None = None,
    member_unroll: int = 8,
    shadow_interval: bool = False,
    has_texture: bool = False,
    has_sky: bool = False,
):
    return mk.build_megakernel(
        obj_types,
        config,
        tile=tile,
        interpret=interpret,
        has_transmission=has_transmission,
        has_emission=has_emission,
        object_loop=object_loop,
        regen_frames=regen_frames,
        cluster_runs=cluster_runs,
        member_unroll=member_unroll,
        shadow_interval=shadow_interval,
        has_texture=has_texture,
        has_sky=has_sky,
    )


@functools.lru_cache(maxsize=16)
def _kernel_persist(
    obj_types: tuple,
    config: RenderConfig,
    tile: int,
    interpret: bool,
    has_transmission: bool,
    has_emission: bool,
    ring_slots: int,
    budget: int,
    cluster_runs: tuple | None = None,
    member_unroll: int = 8,
    lane_stop: bool = False,
    has_texture: bool = False,
    has_sky: bool = False,
):
    return mk.build_megakernel(
        obj_types,
        config,
        tile=tile,
        interpret=interpret,
        has_transmission=has_transmission,
        has_emission=has_emission,
        cluster_runs=cluster_runs,
        member_unroll=member_unroll,
        persist=(ring_slots, budget),
        lane_stop=lane_stop,
        has_texture=has_texture,
        has_sky=has_sky,
    )


@functools.lru_cache(maxsize=32)
def _kernel_cost(
    obj_types: tuple,
    config: RenderConfig,
    tile: int,
    interpret: bool,
    has_transmission: bool,
    has_emission: bool,
    object_loop: str,
    cluster_runs: tuple | None = None,
    has_texture: bool = False,
    has_sky: bool = False,
):
    return mk.build_megakernel(
        obj_types,
        config,
        tile=tile,
        interpret=interpret,
        has_transmission=has_transmission,
        has_emission=has_emission,
        object_loop=object_loop,
        cost_out=True,
        cluster_runs=cluster_runs,
        has_texture=has_texture,
        has_sky=has_sky,
    )


def _pack_geom_clusters(
    scene: SceneArrays,
    clusters: tuple | None,
    obj_types: tuple,
    has_transmission: bool,
):
    """Geometry table + cluster-bounds table for the kernel. Without
    clusters, ships a never-read one-row dummy bounds table (the kernel
    signature is uniform). ``obj_types``/``has_transmission`` MUST be the
    same static values the kernel is built with — they pick the compact
    geometry-row layout (``mk.geom_layout``; the kernel asserts the row
    count at trace time)."""
    layout = mk.geom_layout(
        obj_types, has_transmission, scene.textured_static
    )
    if clusters is None:
        return (
            mk.pack_geometry(scene, layout=layout),
            jnp.zeros((8, 1), jnp.float32),
        )
    sigma, runs = clusters
    return (
        mk.pack_geometry(scene, sigma, layout=layout),
        mk.pack_cluster_bounds(scene, sigma, runs),
    )


def _slot_inverse(pixel_of_slot, n: int):
    """Pixel->slot inverse of a (compacted) slot map, int32 ``[n]``, for
    the finish/preview unpermute gather; negative slot entries (padding)
    are skipped (their pixels do not exist). The sharded repack reuses
    this per shard with shard-local pixel ids."""
    import numpy as _np

    inv_np = _np.zeros(n, _np.int32)
    slots = _np.nonzero(pixel_of_slot >= 0)[0]
    inv_np[pixel_of_slot[slots]] = slots.astype(_np.int32)
    return inv_np


def _cost_sort_perm(cost):
    """Descending-cost stable pixel order and its inverse (int32 device
    arrays) from a per-pixel path-cost probe. The STABLE sort is part of
    the bit-identical-relabeling contract — equal-cost pixels keep image
    order — and both consumers (the Renderer's regen lane permutation
    and ``render_persistent(cost_sort=N)``) must derive the permutation
    identically, so they share this one definition."""
    import numpy as _np

    order = _np.argsort(-_np.asarray(cost), kind="stable").astype(_np.int32)
    return (
        jnp.asarray(order),
        jnp.asarray(_np.argsort(order).astype(_np.int32)),
    )


def _mat_light_tables(scene: SceneArrays, config, obj_types: tuple,
                      clusters: tuple | None, object_loop: str = "auto"):
    """Material + light SMEM operands, trimmed to the rows the chosen
    object loop reads.

    ``build_megakernel`` compiles one of two object-loop families: the
    fori (many-object / clustered) loop reads the MATERIAL-indexed rows
    (``mat_albedo``/``mat_emission``/``mat_scalars``), the unrolled loop
    the PER-OBJECT rows (``albedo``/``emission``) — EXCEPT when the
    scene has fewer materials than objects, where the unrolled kernel's
    shading loop also selects by material (``mat_shade`` in
    build_megakernel: shorter per-λ select chains). The family that is
    not read is shipped as a never-read one-row dummy so SMEM stays
    lean. The predicates here must mirror build_megakernel's choices
    EXACTLY — shipping the wrong variant makes the kernel read
    out-of-bounds SMEM — which is why every launcher calls this helper
    instead of hand-trimming. Lights: position padded to 4 columns; a
    light-less scene ships one zero row (pallas rejects zero-row tables;
    the kernel's static light loop has zero iterations, so it is never
    read).

    Returns ``(albedo, emission, mat_albedo, mat_emission, mat_scalars,
    lpos, lspec)``.
    """
    fori = (
        clusters is not None
        or object_loop == "fori"
        or (object_loop == "auto" and len(obj_types) > 64)
    )
    # unrolled kernel with material-indexed shading (build_megakernel's
    # mat_shade): reads the material albedo/emission rows, not per-object
    mat_rows = fori or 0 < config.n_materials < len(obj_types)
    lpos = jnp.pad(scene.light_pos, ((0, 0), (0, 1)))  # [L, 4]
    lspec = scene.light_spec
    if config.n_lights == 0:
        lpos = jnp.zeros((1, 4), jnp.float32)
        lspec = jnp.zeros((1, config.n_samples), jnp.float32)
    if scene.sky is not None:
        # environment emission rides the light-spectrum table as one extra
        # row at static index max(n_lights, 1) — the kernel's sky_row
        lspec = jnp.concatenate([lspec, scene.sky[None, :]], axis=0)
    return (
        scene.albedo[:1] if mat_rows else scene.albedo,
        scene.emission[:1] if mat_rows else scene.emission,
        scene.mat_albedo if mat_rows else scene.mat_albedo[:1],
        scene.mat_emission if mat_rows else scene.mat_emission[:1],
        scene.mat_scalars if fori else scene.mat_scalars[:1],
        lpos, lspec,
    )


# Mosaic requires block shapes with the last two dims divisible by (8, 128):
# a tile is r8 x 128 lanes, so the smallest legal tile is 8 * 128.
_MIN_TILE = 8 * mk.LANE


def _pick_tile(n: int) -> int:
    """Largest tile (<= DEFAULT) that keeps padding waste small, clamped to
    the smallest Mosaic-legal block (8 sublanes x 128 lanes)."""
    tile = mk.DEFAULT_TILE
    while tile > _MIN_TILE and n < tile:
        tile //= 2
    return tile


def integrate_frame_pallas(
    scene: SceneArrays,
    config: RenderConfig,
    frame_id,
    obj_types: tuple,
    tile: int | None = None,
    interpret: bool = False,
    full_height: int | None = None,
    row_offset=0,
    has_transmission: bool = False,
    has_emission: bool = False,
    object_loop: str = "auto",
    clusters: tuple | None = None,
) -> jax.Array:
    """One progressive frame -> linear RGB ``[H, W, 3]``.

    ``obj_types`` must be the static tuple of per-object type tags
    (``tuple(np.asarray(scene.obj_type).tolist())`` taken outside jit);
    likewise ``has_transmission``/``has_emission`` are static feature
    flags the caller derives outside jit.
    ``full_height``/``row_offset`` render a row slab of a taller image in
    global coordinates (row-sharded rendering).

    ``clusters`` (static ``(sigma, runs)`` from ``mk.plan_clusters``)
    switches the many-object loop to its cluster-culled form: objects are
    visited in Morton order and a per-cluster AABB pre-test lets a tile
    skip clusters none of its live rays can hit. Result-identical to the
    unclustered loop (original-index tie rule carried in geom).
    """
    frame_id = jnp.asarray(frame_id, dtype=jnp.uint32)
    n = config.width * config.height
    if config.n_objects == 0:
        # nothing to hit: every ray misses -> black frame (jnp-path parity)
        return jnp.zeros((config.height, config.width, 3), dtype=jnp.float32)
    tile = tile or _pick_tile(n)
    n_pad = -(-n // tile) * tile

    origin, direction, px, py = generate_primary_rays(
        scene.cam_pos, scene.cam_dir, scene.cam_up, scene.fov_y_deg,
        config.width, config.height, frame_id, config.intended_frames,
        full_height=full_height, row_offset=row_offset,
        dof=scene_dof(scene, config),
    )

    def lanes(a, dtype=jnp.float32):
        a = jnp.asarray(a, dtype)
        return jnp.pad(a, (0, n_pad - n)).reshape(n_pad // mk.LANE, mk.LANE)

    geom, cbounds = _pack_geom_clusters(
        scene, clusters, obj_types, has_transmission
    )
    (albedo_in, emission_in, m_alb, m_emis, m_scal,
     lpos, lspec) = _mat_light_tables(
        scene, config, obj_types, clusters, object_loop)

    run = _kernel(
        obj_types, config, tile, interpret, has_transmission, has_emission,
        object_loop, clusters[1] if clusters else None,
        has_texture=scene.textured_static,
        has_sky=scene.sky is not None,
    )
    rad = run(
        lanes(origin.x), lanes(origin.y), lanes(origin.z),
        lanes(direction.x), lanes(direction.y), lanes(direction.z),
        lanes(px, jnp.uint32), lanes(py, jnp.uint32),
        frame_id, geom, cbounds, albedo_in, emission_in,
        m_alb, m_emis, m_scal,
        lpos, lspec,
    )
    # [S, NP/128, 128] -> [n, S]
    rad = rad.reshape(config.n_samples, n_pad).T[:n]
    rgb = spectra_to_rgb(rad, scene.xyz_weights, scene.xyz_to_rgb)
    return rgb.reshape(config.height, config.width, 3)


def probe_path_cost(
    scene: SceneArrays,
    config: RenderConfig,
    obj_types: tuple,
    n_probe_frames: int = 2,
    first_frame_id: int = 0,
    tile: int | None = None,
    interpret: bool = False,
    has_transmission: bool = False,
    has_emission: bool = False,
    object_loop: str = "auto",
    clusters: tuple | None = None,
) -> jax.Array:
    """Per-pixel realized path length, summed over ``n_probe_frames``
    frames — flat ``[width * height]`` float32.

    Runs the monolithic megakernel with its path-cost instrumentation
    (``cost_out``): each lane reports how many bounce iterations it
    executed while alive. A pixel's EXPECTED path length is stable across
    frames (geometry + material mix at that pixel), so a couple of frames
    suffice to rank pixels for cost-sorted lane assignment."""
    n = config.width * config.height
    if config.n_objects == 0:
        return jnp.ones((n,), jnp.float32) * jnp.float32(n_probe_frames)
    tile = tile or _pick_tile(n)
    n_pad = -(-n // tile) * tile

    def lanes(a, dtype=jnp.float32):
        a = jnp.asarray(a, dtype)
        return jnp.pad(a, (0, n_pad - n)).reshape(n_pad // mk.LANE, mk.LANE)

    geom, cbounds = _pack_geom_clusters(
        scene, clusters, obj_types, has_transmission
    )
    (albedo_in, emission_in, m_alb, m_emis, m_scal,
     lpos, lspec) = _mat_light_tables(
        scene, config, obj_types, clusters, object_loop)

    run = _kernel_cost(
        obj_types, config, tile, interpret, has_transmission, has_emission,
        object_loop, clusters[1] if clusters else None,
        has_texture=scene.textured_static,
        has_sky=scene.sky is not None,
    )
    total = jnp.zeros((n_pad // mk.LANE, mk.LANE), jnp.float32)
    for j in range(n_probe_frames):
        fid = jnp.uint32(first_frame_id + j)
        origin, direction, px, py = generate_primary_rays(
            scene.cam_pos, scene.cam_dir, scene.cam_up, scene.fov_y_deg,
            config.width, config.height, fid, config.intended_frames,
                dof=scene_dof(scene, config),
        )
        _rad, cost = run(
            lanes(origin.x), lanes(origin.y), lanes(origin.z),
            lanes(direction.x), lanes(direction.y), lanes(direction.z),
            lanes(px, jnp.uint32), lanes(py, jnp.uint32),
            fid, geom, cbounds, albedo_in, emission_in,
            m_alb, m_emis, m_scal, lpos, lspec,
        )
        total = total + cost
    return total.reshape(n_pad)[:n]


def integrate_frames_pallas_regen(
    scene: SceneArrays,
    config: RenderConfig,
    first_frame_id,
    obj_types: tuple,
    k: int,
    tile: int | None = None,
    interpret: bool = False,
    has_transmission: bool = False,
    has_emission: bool = False,
    object_loop: str = "auto",
    full_height: int | None = None,
    row_offset=0,
    lane_perm: jax.Array | None = None,
    lane_inv: jax.Array | None = None,
    clusters: tuple | None = None,
    member_unroll: int = 8,
    shadow_interval: bool = False,
) -> jax.Array:
    """K progressive frames in ONE kernel launch via in-kernel path
    regeneration -> the SUM of their linear-RGB frames ``[H, W, 3]``.

    When a lane's path terminates, the kernel immediately starts the same
    pixel's next frame, so the dead-lane tail of the bounce loop does the
    following frames' work instead of idling — the bounce loop's mean
    live-lane occupancy (~29% on cornell512) is the headroom. All K
    frames' primary directions are precomputed here with the SAME
    ``generate_primary_rays`` the monolithic path uses (re-deriving them
    in-kernel picks up different FMA contraction and flips the un-offset
    diffuse self-intersection coin — measured and rejected); the kernel
    selects a terminating lane's next direction by its frame counter.
    Every individual path is therefore computed bit-identically to its
    monolithic rendering; only the order the K frames' contributions are
    summed in differs (pure f32 reassociation — no RNG/jitter
    divergence). Blend the result with ``integrator.accumulate_frames``.

    ``full_height``/``row_offset`` render a row slab in global image
    coordinates (row-sharded rendering, like ``integrate_frame_pallas``).
    Not composable with the phased/cascade pipeline.

    ``lane_perm``/``lane_inv`` (both ``[width * height]`` int32,
    ``lane_inv = argsort(lane_perm)``) assign pixel ``lane_perm[p]`` to
    wavefront lane ``p`` — cost-sorted lane assignment: a regeneration
    tile runs until its slowest lane finishes all K paths, so packing
    systematically-expensive pixels (measured by ``probe_path_cost``)
    into the SAME tiles lets cheap tiles retire early. Per-pixel results
    are bit-identical to the unpermuted launch (tile membership does not
    enter any lane's arithmetic; the per-pixel RNG streams and primaries
    travel with the lane); only which tile computes a pixel changes.
    """
    if k < 2:
        raise ValueError("regen wants k >= 2 (use integrate_frame_pallas)")
    if (lane_perm is None) != (lane_inv is None):
        raise ValueError("lane_perm and lane_inv must be passed together")
    first_frame_id = jnp.asarray(first_frame_id, dtype=jnp.uint32)
    n = config.width * config.height
    if config.n_objects == 0:
        return jnp.zeros((config.height, config.width, 3), dtype=jnp.float32)
    # default tile 4096, NOT _pick_tile's 8192: measured straggler sweet
    # spot for regeneration on every BASELINE config (cornell512 K=50:
    # 8192/4096/2048/1024 lanes = 3.63/3.48/3.58/4.36 ms/frame on v5e —
    # smaller tiles isolate expensive pixel clusters so cheap tiles
    # retire early; 1024 pays per-grid-step overheads). CLUSTERED scenes
    # default to 2048: the cluster pre-test is tile-uniform, and halving
    # the any() pool culls more than the extra grid steps cost (round-5
    # sweep, tools/layout_bench.py: spheres morton 4096/2048/1024 =
    # 39.1/35.1/42.5 ms/frame, mesh5k 900/894.7/1027)
    tile = tile or (
        2048 if clusters is not None else min(_pick_tile(n), 4096)
    )
    # v5e scoped VMEM is 16 MiB; the K-1 per-frame direction arrays live
    # there alongside rad/thr. Shrink the tile until the working set fits
    # (measured: S=64, K=50, 8192-lane tiles = 17.18M > 16M; model
    # calibrated on that failure: ~4S + 6(K-1) + 32 f32 per lane).
    f32_per_lane = 4 * config.n_samples + 6 * (int(k) - 1) + 32
    while tile > _MIN_TILE and tile * f32_per_lane * 4 > 15_500_000:
        tile //= 2
    n_pad = -(-n // tile) * tile

    pixel_xy = None
    if lane_perm is not None:
        # permute the pixel COORDINATE arrays once; every frame's raygen
        # then emits lane-permuted primaries directly — raygen is
        # elementwise in (px, py), so each ray is bit-identical to its
        # row-major twin. (Permuting raygen's OUTPUT planes instead costs
        # 3*(K-1) full-image random gathers per launch — measured +6.2
        # ms/frame on cornell512 K=100, swamping the sort's benefit.)
        py0 = (
            jax.lax.broadcasted_iota(
                jnp.uint32, (config.height, config.width), 0
            ) + jnp.asarray(row_offset, jnp.uint32)
        ).reshape(n)
        px0 = jax.lax.broadcasted_iota(
            jnp.uint32, (config.height, config.width), 1
        ).reshape(n)
        pixel_xy = (px0[lane_perm], py0[lane_perm])

    dof = scene_dof(scene, config)
    origin, direction, px, py = generate_primary_rays(
        scene.cam_pos, scene.cam_dir, scene.cam_up, scene.fov_y_deg,
        config.width, config.height, first_frame_id, config.intended_frames,
        full_height=full_height, row_offset=row_offset, pixel_xy=pixel_xy,
        dof=dof,
    )

    def lanes(a, dtype=jnp.float32):
        a = jnp.asarray(a, dtype)
        return jnp.pad(a, (0, n_pad - n)).reshape(n_pad // mk.LANE, mk.LANE)

    # frames first+1 .. first+k-1: primary directions for the in-kernel
    # frame restarts (same raygen call as the monolithic path — see
    # docstring); origins are all cam_pos (shipped via pack_camera), or
    # — with depth of field — the per-frame thin-lens origins
    # (frame-constant scalars, shipped as a [k-1, 4] SMEM table the
    # kernel selects from by frame counter, pack_camera_frames)
    later = [
        generate_primary_rays(
            scene.cam_pos, scene.cam_dir, scene.cam_up, scene.fov_y_deg,
            config.width, config.height,
            first_frame_id + jnp.uint32(j), config.intended_frames,
            full_height=full_height, row_offset=row_offset,
            pixel_xy=pixel_xy, dof=dof,
        )[1]
        for j in range(1, int(k))
    ]
    dirx = jnp.stack([lanes(d.x) for d in later])
    diry = jnp.stack([lanes(d.y) for d in later])
    dirz = jnp.stack([lanes(d.z) for d in later])

    geom, cbounds = _pack_geom_clusters(
        scene, clusters, obj_types, has_transmission
    )
    cam = (
        mk.pack_camera_frames(scene, config, first_frame_id, int(k))
        if config.has_dof else mk.pack_camera(scene)
    )
    (albedo_in, emission_in, m_alb, m_emis, m_scal,
     lpos, lspec) = _mat_light_tables(
        scene, config, obj_types, clusters, object_loop)

    run = _kernel_regen(
        obj_types, config, tile, interpret, has_transmission, has_emission,
        object_loop, int(k), clusters[1] if clusters else None,
        member_unroll, shadow_interval,
        has_texture=scene.textured_static,
        has_sky=scene.sky is not None,
    )
    rad = run(
        lanes(origin.x), lanes(origin.y), lanes(origin.z),
        lanes(direction.x), lanes(direction.y), lanes(direction.z),
        lanes(px, jnp.uint32), lanes(py, jnp.uint32),
        first_frame_id, geom, cbounds, albedo_in, emission_in,
        m_alb, m_emis, m_scal,
        lpos, lspec, cam, dirx, diry, dirz,
    )
    rad = rad.reshape(config.n_samples, n_pad).T[:n]
    rgb = spectra_to_rgb(rad, scene.xyz_weights, scene.xyz_to_rgb)
    if lane_inv is not None:
        # back to pixel order AFTER the RGB fold: a [n, 3] gather once per
        # K-frame launch instead of an [n, S] one
        rgb = rgb[lane_inv]
    return rgb.reshape(config.height, config.width, 3)


def render_frames_step_pallas_regen(
    scene: SceneArrays,
    config: RenderConfig,
    accum: jax.Array,
    first_frame_id,
    obj_types: tuple,
    k: int,
    interpret: bool = False,
    has_transmission: bool = False,
    has_emission: bool = False,
    tile: int | None = None,
    lane_perm: jax.Array | None = None,
    lane_inv: jax.Array | None = None,
    clusters: tuple | None = None,
    shadow_interval: bool = False,
) -> jax.Array:
    """K progressive frames (one regeneration launch) blended into the
    accumulator — the K-frame analog of ``render_frame_step_pallas``."""
    from spectral_tpu.render.integrator import accumulate_frames

    rgb_sum = integrate_frames_pallas_regen(
        scene, config, first_frame_id, obj_types, k, tile=tile,
        interpret=interpret, has_transmission=has_transmission,
        has_emission=has_emission, lane_perm=lane_perm, lane_inv=lane_inv,
        clusters=clusters, shadow_interval=shadow_interval,
    )
    return accumulate_frames(accum, rgb_sum, first_frame_id, k)


@functools.lru_cache(maxsize=16)
def _persist_step_fn(
    obj_types: tuple,
    config: RenderConfig,
    tile: int,
    interpret: bool,
    has_transmission: bool,
    has_emission: bool,
    ring_slots: int,
    budget: int,
    cluster_runs: tuple | None,
    member_unroll: int,
    lane_stop: bool = False,
    has_texture: bool = False,
    has_sky: bool = False,
):
    """One persistent launch: ``budget`` bounce iterations over donated
    carried state; returns the new state and the minimum per-lane count of
    COMPLETED frames (the scheduler scalar). With ``lane_stop``, a lane
    whose stop mask is set AND whose in-flight frame has finished counts
    as fully done — its tile owes no more frames; a stopped lane still
    mid-path keeps the loop alive until that frame completes, so its
    partial radiance never leaks into the per-count average."""
    run = _kernel_persist(
        obj_types, config, tile, interpret, has_transmission, has_emission,
        ring_slots, budget, cluster_runs, member_unroll, lane_stop,
        has_texture=has_texture,
        has_sky=has_sky,
    )
    n = config.width * config.height

    @functools.partial(
        jax.jit,
        donate_argnums=(0, 1, 2, 3, 4, 5, 8, 9, 10, 11, 12, 13, 14),
    )
    def step(
        ox, oy, oz, dx, dy, dz, px, py, alive, gate, hero, bl, fid,
        thr, rad, stop=None,
        lead=None, end=None,
        geom=None, cbounds=None, albedo=None, emission=None, m_alb=None,
        m_emis=None, m_scal=None,
        lpos=None, lspec=None, cam=None, ringx=None, ringy=None, ringz=None,
    ):
        rad_o, thr_o, oxo, oyo, ozo, dxo, dyo, dzo, al_o, ga_o, he_o, \
            bl_o, fid_o = run(
                ox, oy, oz, dx, dy, dz, px, py, alive, gate, hero, bl, fid,
                thr, rad, lead, end,
                geom, cbounds, albedo, emission, m_alb, m_emis, m_scal,
                lpos, lspec, cam, ringx=ringx, ringy=ringy, ringz=ringz,
                stop=stop,
            )
        # a dead lane has COMPLETED its current frame (it shaded the
        # terminal hit before going dead); an alive lane is mid-path
        completed = fid_o + jnp.where(
            al_o <= 0.0, jnp.uint32(1), jnp.uint32(0)
        )
        state = (oxo, oyo, ozo, dxo, dyo, dzo, al_o, ga_o, he_o, bl_o,
                 fid_o, thr_o, rad_o)
        if lane_stop:
            # a stopped AND dead lane owes no more frames; a stopped
            # alive lane reports its true count so the render keeps
            # running until its in-flight frame completes
            completed = jnp.where(
                (stop > 0.0) & (al_o <= 0.0), end, completed
            )
        min_done = jnp.min(completed.reshape(-1)[:n])
        return state, min_done

    return step


@functools.lru_cache(maxsize=16)
def _persist_init_fn(config: RenderConfig, n_pad: int, jit_host: bool = True):
    """Build the full frame-0 carried state (+ pixel-coordinate planes)
    in ONE program. Eager construction costs ~50 host dispatches (~0.4 s
    through the axon tunnel — measured dominating a single-frame persist
    render at 415 ms); jitted it is one dispatch. ``jit_host=False``
    keeps the eager op-by-op path whose raygen is bit-comparable with
    the other eager-raygen consumers (tests)."""
    n = config.width * config.height
    rows = n_pad // mk.LANE
    s_dim = config.n_samples

    def init(cam_pos, cam_dir, cam_up, fov, px_in, py_in):
        origin, direction, px, py = generate_primary_rays(
            cam_pos, cam_dir, cam_up, fov,
            config.width, config.height, jnp.uint32(0),
            config.intended_frames, pixel_xy=(px_in, py_in),
        )

        def lanes(a, dtype=jnp.float32):
            a = jnp.asarray(a, dtype)
            return jnp.pad(a, (0, n_pad - n)).reshape(rows, mk.LANE)

        state = (
            lanes(origin.x), lanes(origin.y), lanes(origin.z),
            lanes(direction.x), lanes(direction.y), lanes(direction.z),
            lanes(jnp.ones((n,), jnp.float32)),               # alive
            jnp.zeros((rows, mk.LANE), jnp.float32),          # gate
            jnp.full((rows, mk.LANE), -1.0, jnp.float32),     # hero
            jnp.full((rows, mk.LANE), config.max_bounces, jnp.uint32),
            jnp.zeros((rows, mk.LANE), jnp.uint32),           # fid
            jnp.ones((s_dim, rows, mk.LANE), jnp.float32),    # thr
            jnp.zeros((s_dim, rows, mk.LANE), jnp.float32),   # rad
        )
        return state + (lanes(px, jnp.uint32), lanes(py, jnp.uint32))

    if jit_host:
        init = jax.jit(init)
    return init


@functools.lru_cache(maxsize=16)
def _persist_finish_fn(config: RenderConfig, n_pad: int,
                       jit_host: bool = True):
    """Per-pixel completed-frame average of the carried radiance, as one
    program (the eager epilogue is another ~10 tunnel dispatches)."""
    n = config.width * config.height
    s_dim = config.n_samples

    def finish(alive_f, fid_f, rad_f, xyz_weights, xyz_to_rgb,
               lane_inv=None):
        rad2 = rad_f.reshape(s_dim, n_pad).T[:n]
        rgb = spectra_to_rgb(rad2, xyz_weights, xyz_to_rgb)
        completed = fid_f + jnp.where(
            alive_f <= 0.0, jnp.uint32(1), jnp.uint32(0)
        )
        counts = jnp.maximum(
            completed.reshape(-1)[:n].astype(jnp.float32), 1.0
        )
        rgb = rgb / counts[:, None]
        if lane_inv is not None:
            # back to pixel order AFTER the RGB fold: one [n, 3] gather
            rgb = rgb[lane_inv]
        return rgb.reshape(config.height, config.width, 3)

    if jit_host:
        finish = jax.jit(finish)
    return finish


@functools.lru_cache(maxsize=16)
def _persist_refill_fn(
    config: RenderConfig, ring_slots: int, n_pad: int, jit_refill: bool = True
):
    """Write one frame's primary directions into its ring slot
    (``frame % ring_slots``).

    With ``jit_refill`` the raygen + ring update is one donated XLA
    program (production: one tiny dispatch per advanced frame). A jitted
    raygen picks up different FMA contraction than op-by-op eager raygen
    and lands ulps away — which flips the un-offset diffuse
    self-intersection coin on ~11% of pixels/frame (the round-2
    measurement) — so bit-exactness tests against the eager-raygen regen
    path pass ``jit_refill=False``; either program's rays are an equally
    valid sample of the estimator."""
    n = config.width * config.height

    def refill(ringx, ringy, ringz, frame_id, cam_pos, cam_dir, cam_up, fov):
        _o, d, _px, _py = generate_primary_rays(
            cam_pos, cam_dir, cam_up, fov,
            config.width, config.height, frame_id, config.intended_frames,
        )

        def lanes(a):
            a = jnp.asarray(a, jnp.float32)
            return jnp.pad(a, (0, n_pad - n)).reshape(
                n_pad // mk.LANE, mk.LANE
            )

        slot = (frame_id % jnp.uint32(ring_slots)).astype(jnp.int32)
        ringx = jax.lax.dynamic_update_slice(ringx, lanes(d.x)[None], (slot, 0, 0))
        ringy = jax.lax.dynamic_update_slice(ringy, lanes(d.y)[None], (slot, 0, 0))
        ringz = jax.lax.dynamic_update_slice(ringz, lanes(d.z)[None], (slot, 0, 0))
        return ringx, ringy, ringz

    if jit_refill:
        refill = jax.jit(refill, donate_argnums=(0, 1, 2))
    return refill


def _workable_mask(alive, fid, stop, n_frames):
    """Host-side twin of the convergence update's ``workable`` predicate
    (a lane still owing frames: alive, or unstopped with frames left).
    One definition serves the single-chip and sharded repack triggers so
    the two can never count different populations than the device-side
    ``n_work`` scalar."""
    done = fid + (alive <= 0.0)
    return (alive > 0.0) | ((stop <= 0.0) & (done < n_frames))


@functools.lru_cache(maxsize=8)
def _compact_perm_fn(n_pad: int, s_dim: int):
    """One jitted gather that relabels the ENTIRE carried persist state
    (ray/flag planes, pixel coordinates, stop mask, adaptive stats,
    throughput, radiance) by a lane permutation. Raygen — host and
    in-kernel — is elementwise in (px, py), so relabeling is bit-exact:
    it only changes WHICH tile computes a pixel (the cost_sort
    precedent). Used to pack still-working lanes into the leading tiles
    so fully-retired trailing tiles skip whole launches."""

    @functools.partial(jax.jit, donate_argnums=tuple(range(1, 22)))
    def perm(order, *planes):
        def g(a):
            flat = a.reshape(n_pad) if a.ndim == 2 else a.reshape(
                s_dim, n_pad
            )
            out = flat[order] if a.ndim == 2 else flat[:, order]
            return out.reshape(a.shape)

        return tuple(g(a) for a in planes)

    return perm


@functools.lru_cache(maxsize=16)
def _adapt_update_fn(n_pad: int, min_frames: int, rtol: float, atol: float):
    """Between-launch convergence update for variance-adaptive sampling.

    Treats each launch's per-frame luminance mean as ONE weighted sample
    (weight = frames the lane completed that launch) and maintains the
    weighted incremental mean/M2 of West 1979. Because a sample of
    weight ``w`` is the average of ``w`` i.i.d. per-frame luminances,
    every M2 increment ``w * (x - mean)^2`` has expectation ~ the
    PER-FRAME variance — so ``M2 / (j - 1)`` estimates it from ``j``
    launch aggregates, and the standard error of the lane's final mean
    is ``sqrt(M2 / (j - 1) / c_total)``. A lane stops once that is
    under ``rtol * |mean| + atol`` (compared squared and STRICT, so zero
    tolerances never stop anyone) with ``c_total >= min_frames`` and
    ``j >= 2``. Launch aggregates also dampen path tracing's heavy
    per-frame tails — a spiky frame inflates its whole launch's sample.

    State planes (all ``[n_pad/LANE, LANE]`` f32, device-resident):
    stop mask (the only one the kernel reads), previous launch's
    luminance and count snapshots, weighted mean, M2, sample count j.
    """
    minf = float(min_frames)
    rtol = jnp.float32(rtol)
    atol = jnp.float32(atol)

    @functools.partial(jax.jit, donate_argnums=(4, 5, 6, 7, 8))
    def update(rad, fid, alive, stop, prev_lum, prev_cnt, s_mean, s_m2,
               s_j, end):
        lum = jnp.sum(rad, axis=0)  # per-lane spectral luminance total
        cnt = (
            fid + jnp.where(alive <= 0.0, jnp.uint32(1), jnp.uint32(0))
        ).astype(jnp.float32)  # completed frames (dead = frame finished)
        dc = cnt - prev_cnt
        upd = (dc > 0.0) & (stop <= 0.0)
        x = (lum - prev_lum) / jnp.maximum(dc, 1.0)
        delta = x - s_mean
        mean_new = jnp.where(upd, s_mean + (dc / jnp.maximum(cnt, 1.0)) * delta, s_mean)
        m2_new = jnp.where(upd, s_m2 + dc * delta * (x - mean_new), s_m2)
        j_new = jnp.where(upd, s_j + 1.0, s_j)
        mean_frame = lum / jnp.maximum(cnt, 1.0)
        thresh = rtol * jnp.abs(mean_frame) + atol
        sigma2 = m2_new / jnp.maximum(j_new - 1.0, 1.0)
        conv = (j_new >= 2.0) & (cnt >= minf) & (
            sigma2 < thresh * thresh * cnt
        )
        stop_new = jnp.where(upd & conv, 1.0, stop)
        # snapshots advance ONLY where a sample was taken: a launch in
        # which a lane completes zero frames leaves its partial-frame
        # radiance in the accumulator delta, so the frame's FULL
        # luminance lands in the next dc > 0 sample instead of being
        # silently absorbed (small budgets would otherwise sample only
        # frame tails and underestimate the per-frame variance)
        lum_out = jnp.where(upd, lum, prev_lum)
        cnt_out = jnp.where(upd, cnt, prev_cnt)
        # working-lane count feeds the compaction trigger one-launch-stale
        workable = (alive > 0.0) | (
            (stop_new <= 0.0) & (cnt < end.astype(jnp.float32))
        )
        n_work = jnp.sum(workable.astype(jnp.int32))
        return stop_new, lum_out, cnt_out, mean_new, m2_new, j_new, n_work

    return update


def render_persistent(
    scene: SceneArrays,
    config: RenderConfig,
    obj_types: tuple,
    n_frames: int,
    tile: int | None = None,
    interpret: bool = False,
    has_transmission: bool = False,
    has_emission: bool = False,
    clusters: tuple | None = None,
    ring_slots: int | None = None,
    budget: int | None = None,
    frames_per_launch: int | None = None,
    member_unroll: int = 8,
    progress: "callable | None" = None,
    should_abort: "callable | None" = None,
    jit_refill: bool = True,
    cost_sort: int = 0,
    lane_perm: jax.Array | None = None,
    lane_inv: jax.Array | None = None,
    adaptive: tuple | None = None,
    compact: bool = True,
    preview=None,
    resume_state: dict | None = None,
    return_state: bool = False,
):
    """Render ``n_frames`` progressive frames with *persistent
    lane-asynchronous regeneration* and return ``(rgb_mean, info)``.

    ``return_state=True`` puts the complete carried state (ray planes,
    pixel coordinates, throughput/radiance, adaptive stats and slot map)
    into ``info["resume_state"]``; feeding that dict back as
    ``resume_state`` continues the render exactly where it stopped —
    the free-running scheduler needs no other bookkeeping, because a
    restored lane simply keeps walking its own frame stream (aborted
    adaptive renders resume with their convergence statistics intact).
    ``budget``/``tile`` are taken from the saved state so the SAME
    kernel program continues. Free-running only, and incompatible with
    ``lane_perm`` (the saved pixel planes already carry any relabeling).

    ``preview(make_rgb)`` is called once per launch with a zero-argument
    closure that materializes the CURRENT per-pixel average (one small
    jitted epilogue program over the carried state — the same estimator
    the final image uses, just earlier); live viewers call it at their
    own rate and skip it otherwise, so an unviewed render pays nothing.
    The closure is valid ONLY inside the callback: the state it reads is
    donated to the next launch as soon as the callback returns.

    ``adaptive=(min_frames, rtol, atol)`` enables per-pixel variance-
    adaptive stopping (free-running variant only). The statistics live on
    the HOST side of the launch boundary: after every launch a small
    jitted update reduces the radiance accumulator (already in HBM) to
    per-lane luminance, treats each launch's per-frame luminance mean as
    one weighted sample (weight = frames completed that launch — the
    weighted Welford of West 1979, so ``M2 / (j - 1)`` estimates the
    PER-FRAME variance from ``j`` launch aggregates), and sets a stop
    mask for lanes whose standard error of the final mean falls under
    ``rtol * |mean| + atol`` with at least ``min_frames`` completed
    frames and at least two launch samples. The kernel's only change is
    that the restart gate reads the mask — the first design carried the
    statistics per-lane in the bounce loop and was measured SLOWER than
    not stopping at all (PARITY.md round-3 adaptive ledger). Stop
    granularity is therefore one launch (~``budget / mean_path_length``
    frames); launch-aggregate samples are also more robust to the
    heavy-tailed per-frame luminance of path tracing than per-frame
    tests. ``n_frames`` becomes the per-pixel CAP; a stopped lane
    finishes its in-flight frame (no partial-frame bias). The returned
    image is each pixel's average over its own completed frames, and
    ``info`` gains ``min_counts`` / ``max_counts`` / ``mean_counts``,
    the full per-pixel ``counts`` array (image row-major), and
    ``compactions``.

    ``compact`` (default on, adaptive only) adds *launch-boundary lane
    compaction*: a lane-level stop only saves work when its WHOLE tile
    retires, and scattered convergence rarely empties a tile — so when
    the working-lane count falls under 3/4 of the last packing, the
    carried state is relabeled (stable sort: working lanes first,
    preserving their spatial order) by one jitted gather, and the
    fully-retired trailing tiles then skip every remaining launch via
    the whole-launch guard. Relabeling is bit-exact (raygen is
    elementwise in the carried px/py planes — the ``cost_sort``
    precedent), so ``compact`` changes which tile computes a pixel and
    NOTHING else; ``info["compactions"]`` counts the repacks.

    ``cost_sort=N > 0`` probes per-pixel path cost over N frames and
    assigns pixels to lanes in descending-cost order (bit-exact
    relabeling: raygen — host AND in-kernel — is elementwise in (px,
    py), so only WHICH tile computes a pixel changes). Rationale: a
    free-running tile runs until its slowest lane finishes ALL
    n_frames, and whole-render pixel totals are dominated by the
    SYSTEMATIC component of per-pixel cost (the per-frame noise, which
    defeated cost-sorting for fixed-window regeneration — see
    PARITY.md — averages out over the render), so a probe-learned rank
    transfers to totals. Cost-homogeneous tiles retire together instead
    of every tile waiting on one expensive pixel.

    Fixed-window regeneration (``integrate_frames_pallas_regen``) makes a
    4096-lane tile run until its SLOWEST lane finishes all K frames; the
    measured straggler factor (E[sum of tile maxes] / ideal) is 1.79x on
    the 1000-sphere config at K=100 and is irreducible by any static
    pixel->lane permutation because per-pixel cost is ~90% per-frame
    stochastic (see PARITY.md). Here instead every launch executes exactly
    ``budget`` bounce iterations and each lane advances through its OWN
    frame stream (state carried in HBM between launches), so a fast lane
    simply runs ahead — the only idle work left is the end-of-render tail.

    Two restart-raygen variants, selected by ``ring_slots``:

    * ``ring_slots=0`` (default, *free-running*): a terminated lane
      recomputes its next frame's primary direction IN-KERNEL (the
      screen-wide-jitter quirk makes raygen elementwise per lane). No
      global coupling at all — measured on v5e, the ring variant's
      steady state was gated by the single slowest pixel on the whole
      device (cornell512 7.58 vs regen 2.88 ms/frame). Paths are valid
      estimator samples but land FMA-ulps from host-raygen paths, so
      results are launch-split invariant yet not bit-comparable with
      the regen/monolithic kernels.
    * ``ring_slots=W`` (power of two >= 2): primary directions come from
      a W-frame host-refilled ring; every path is bit-identical to its
      monolithic rendering (host-raygen primaries, per-lane RNG
      counters), and the per-pixel sum matches fixed-window regeneration
      with K=n_frames. Lanes stall at the trailing-window edge
      (``lead <= min_done + ring_slots``) — bit-exactness at the price
      of slowest-pixel pacing; use for parity testing, not speed.

    ``progress(min_frames_done, launches)`` is called once per launch;
    ``should_abort()`` checked once per launch — on abort, drain
    launches with ``end=0`` (restarts blocked, same compiled step) first
    walk every in-flight path to completion, so the returned image is
    the per-pixel average of each pixel's COMPLETED frames with no
    partial-path contribution in the numerator (a valid estimator;
    counts may differ by a few frames across pixels, unlike the
    reference's frame-granular abort — documented divergence). Live
    ``preview`` images are NOT drained: an alive lane's in-flight
    partial radiance is included over a completed-frame divisor, a
    ~1/count brightening that fades as frames accumulate (display only).
    ``info`` is a dict with launches, min frames done, budget, ring size.
    """
    if config.has_dof:
        raise ValueError(
            "the persist kernels restart frames from the packed "
            "frame-constant camera, but depth of field shifts the origin "
            "per frame; render DoF scenes without persist=True"
        )
    if n_frames < 1:
        raise ValueError("n_frames must be >= 1")
    n = config.width * config.height
    if config.n_objects == 0:
        info = {"launches": 0, "frames_done": n_frames, "budget": 0,
                "ring_slots": 0, "tile": 0, "aborted": False}
        if adaptive is not None:
            import numpy as _np

            info.update(
                min_counts=n_frames, max_counts=n_frames,
                mean_counts=float(n_frames), compactions=0,
                counts=_np.full(n, n_frames, _np.int64),
                adaptive=tuple(adaptive),
            )
        return (
            jnp.zeros((config.height, config.width, 3), dtype=jnp.float32),
            info,
        )
    s_dim = config.n_samples
    if ring_slots is None:
        ring_slots = 0
    if cost_sort and ring_slots:
        raise ValueError(
            "cost_sort needs the free-running variant (ring_slots=0): "
            "the ring's refill planes are row-major"
        )
    if adaptive is not None:
        if ring_slots:
            raise ValueError(
                "adaptive sampling needs the free-running variant "
                "(ring_slots=0): the ring's host refills assume uniform "
                "frame progress across lanes"
            )
        adaptive = (int(adaptive[0]), float(adaptive[1]), float(adaptive[2]))
        if adaptive[0] < 2:
            raise ValueError(
                "adaptive min_frames must be >= 2 (the variance estimate "
                "needs at least two samples)"
            )
        if not (adaptive[1] >= 0.0 and adaptive[2] >= 0.0):
            raise ValueError("adaptive rtol/atol must be >= 0")
    if (resume_state is not None or return_state) and ring_slots:
        raise ValueError(
            "persist checkpointing is free-running only (the ring's host "
            "refill window is not part of the carried state)"
        )
    if (resume_state is not None or return_state) and (
        cost_sort or lane_perm is not None
    ):
        # the finish/preview unpermute (lane_inv) is not part of the
        # carried state, so a relabeled render would resume to a
        # pixel-scrambled image — and cost_sort would re-probe a FRESH
        # permutation that mismatches the saved planes. Cost-sorted lane
        # assignment was measured-and-rejected for persist anyway
        # (PARITY.md): checkpointing supports the identity layout only.
        raise ValueError(
            "persist checkpointing does not compose with cost_sort/"
            "lane_perm (the saved planes' pixel relabeling cannot be "
            "undone on resume)"
        )
    if resume_state is not None:
        if lane_perm is not None:
            raise ValueError(
                "resume_state already carries its pixel planes; do not "
                "pass lane_perm"
            )
        meta = resume_state["meta"]
        if int(meta["n_frames"]) != n_frames:
            raise ValueError(
                f"resume state was saved for a {meta['n_frames']}-frame "
                f"render, not {n_frames}"
            )
        saved_ad = meta.get("adaptive")
        if (saved_ad is None) != (adaptive is None) or (
            saved_ad is not None and tuple(saved_ad) != tuple(adaptive)
        ):
            raise ValueError(
                f"resume state was saved with adaptive={saved_ad}, "
                f"not {adaptive}"
            )
        # the SAME kernel program must continue: budget/tile are state
        budget = int(meta["budget"])
        tile = int(meta["tile"])
    # frames-per-launch default: the ring variant must keep launches
    # shorter than the ring window (lead only advances between launches);
    # free-running has no such constraint, and per-launch costs (state
    # round trip, min-reduce readback, finished tiles' guard loops before
    # the whole-launch skip) favor LONG launches — budget=1760 (~200
    # frames) measured 4.56 ms/frame vs 9.63 at budget=138 on cornell512
    fpl = frames_per_launch or (max(4, ring_slots // 4) if ring_slots else 64)

    tile = tile or min(_pick_tile(n), 4096)
    # VMEM model: state planes stream in AND out (double-buffered), the
    # ring and throughput/radiance ride along: ~(80 + 8S + 6W) f32/lane;
    # the adaptive stop mask adds one read-only plane
    f32_per_lane = 80 + 8 * s_dim + 6 * ring_slots \
        + (1 if adaptive is not None else 0)
    while resume_state is None and tile > _MIN_TILE \
            and tile * f32_per_lane * 4 > 15_500_000:
        tile //= 2
    n_pad = -(-n // tile) * tile

    if (lane_perm is None) != (lane_inv is None):
        raise ValueError("lane_perm and lane_inv must be passed together")
    if lane_perm is not None and ring_slots:
        raise ValueError("lane_perm needs the free-running variant")
    want_sort = cost_sort and lane_perm is None
    if budget is None or want_sort:
        # one probe serves both: the budget heuristic needs the MEAN
        # cost, the sort needs the per-pixel rank (noise in the rank
        # shrinks with probe frames; the budget only needs frame 1)
        n_probe = max(1, int(cost_sort)) if want_sort else 1
        cost = probe_path_cost(
            scene, config, obj_types, n_probe_frames=n_probe,
            interpret=interpret, has_transmission=has_transmission,
            has_emission=has_emission, clusters=clusters,
        )
        if budget is None:
            mean_cost = float(jnp.mean(cost)) / n_probe
            budget = max(8, int(round(fpl * mean_cost)))
        if want_sort:
            lane_perm, lane_inv = _cost_sort_perm(cost)

    geom, cbounds = _pack_geom_clusters(
        scene, clusters, obj_types, has_transmission
    )
    cam = (mk.pack_camera(scene) if ring_slots
           else mk.pack_camera_basis(scene, config))
    (albedo_in, emission_in, m_alb, m_emis, m_scal,
     lpos, lspec) = _mat_light_tables(scene, config, obj_types, clusters)
    tables = (geom, cbounds, albedo_in, emission_in, m_alb, m_emis, m_scal,
              lpos, lspec, cam)

    # --- initial state: every lane starts frame 0 (one jitted program;
    # jit_refill=False keeps the eager bit-comparable path for tests)
    rows = n_pad // mk.LANE
    if resume_state is not None:
        state = tuple(jnp.asarray(a) for a in resume_state["state"])
        px_l = jnp.asarray(resume_state["px"])
        py_l = jnp.asarray(resume_state["py"])
        if state[0].shape != (rows, mk.LANE):
            raise ValueError(
                f"resume state shape {state[0].shape} does not match this "
                f"render's lane layout {(rows, mk.LANE)}"
            )
    else:
        py0 = jax.lax.broadcasted_iota(
            jnp.uint32, (config.height, config.width), 0
        ).reshape(n)
        px0 = jax.lax.broadcasted_iota(
            jnp.uint32, (config.height, config.width), 1
        ).reshape(n)
        if lane_perm is not None:
            px0, py0 = px0[lane_perm], py0[lane_perm]
        *state, px_l, py_l = _persist_init_fn(config, n_pad, jit_refill)(
            scene.cam_pos, scene.cam_dir, scene.cam_up, scene.fov_y_deg,
            px0, py0,
        )
        state = tuple(state)
    if adaptive is not None:
        import numpy as _np

        # host-side convergence state: stop mask (the only plane the
        # kernel sees) + five stat planes for the between-launch update.
        # Padding lanes start stopped: the kernel's valid gate already
        # blocks them, and under compaction they can drift into the
        # leading [:n] scheduler window, where an unstopped dead lane
        # would pin min_done at 1 forever.
        if resume_state is not None:
            stop = jnp.asarray(resume_state["stop"])
            ad_stats = tuple(
                jnp.asarray(a) for a in resume_state["stats"]
            )
            pixel_of_slot = _np.asarray(
                resume_state["pixel_of_slot"], _np.int64
            )
            packed_workable = int(resume_state["packed_workable"])
            compactions = int(resume_state["compactions"])
        else:
            stop_np = _np.zeros(n_pad, _np.float32)
            stop_np[n:] = 1.0
            stop = jnp.asarray(stop_np.reshape(rows, mk.LANE))
            ad_stats = tuple(
                jnp.zeros((rows, mk.LANE), jnp.float32) for _ in range(5)
            )
            # compaction bookkeeping: which pixel lives in each lane slot
            # (-1 = padding), and the working count at the last packing
            pixel_of_slot = _np.full(n_pad, -1, _np.int64)
            pixel_of_slot[:n] = (
                _np.asarray(lane_perm) if lane_perm is not None
                else _np.arange(n)
            )
            packed_workable = n
            compactions = 0
        adapt_update = _adapt_update_fn(n_pad, *adaptive)
        compact_fn = _compact_perm_fn(n_pad, s_dim) if compact else None

    # --- primary ring (ring variant only): frames 1 .. lead-1 resident
    if ring_slots:
        ring = (
            jnp.zeros((ring_slots, rows, mk.LANE), jnp.float32),
            jnp.zeros((ring_slots, rows, mk.LANE), jnp.float32),
            jnp.zeros((ring_slots, rows, mk.LANE), jnp.float32),
        )
        refill = _persist_refill_fn(config, ring_slots, n_pad, jit_refill)
        lead = min(ring_slots, n_frames)
        for f in range(1, lead):
            ring = refill(
                *ring, jnp.uint32(f),
                scene.cam_pos, scene.cam_dir, scene.cam_up, scene.fov_y_deg,
            )
    else:
        ring = ()
        lead = n_frames  # unused by the free-running kernel

    step = _persist_step_fn(
        obj_types, config, tile, interpret, has_transmission, has_emission,
        ring_slots, budget, clusters[1] if clusters else None, member_unroll,
        adaptive is not None, has_texture=scene.textured_static,
        has_sky=scene.sky is not None,
    )

    end_arr = jnp.uint32(n_frames)
    pending: list = []
    launches = 0
    min_done = 0
    aborted = False
    # generous runaway bound: ideal launches * 8 + slack
    max_launches = 16 + 8 * (
        (n_frames * config.max_bounces) // max(budget, 1) + 1
    )
    pending_work: list = []
    cur_lane_inv = lane_inv  # re-derived after every compaction
    if adaptive is not None and compactions:
        # resumed mid-compaction: rebuild the inverse from the slot map
        cur_lane_inv = jnp.asarray(_slot_inverse(pixel_of_slot, n))
    while True:
        st = step(
            *state[:6], px_l, py_l, *state[6:13],
            stop if adaptive is not None else None,
            jnp.uint32(lead), end_arr, *tables, *ring,
        )
        state, md = st
        if adaptive is not None:
            # between-launch convergence update: reduces the radiance
            # accumulator to per-lane luminance and refreshes the stop
            # mask the NEXT launch will see (stats stay on-device; the
            # update enqueues behind the launch, preserving the pipeline)
            stop, *rest = adapt_update(
                state[12], state[10], state[6], stop, *ad_stats, end_arr,
            )
            ad_stats, n_work_dev = tuple(rest[:5]), rest[5]
            if compact_fn is not None:
                pending_work.append(n_work_dev)
            if compact_fn is not None and len(pending_work) >= 2:
                # one-launch-stale working count; repack when the packing
                # is 25% hollow AND at least one whole tile would empty
                n_work = int(pending_work.pop(0))
                if 0 < n_work < packed_workable - max(
                    packed_workable // 4, tile
                ):
                    import numpy as _np

                    alive_f = _np.asarray(state[6]).reshape(-1)
                    fid_f = _np.asarray(state[10]).reshape(-1)
                    stop_f = _np.asarray(stop).reshape(-1)
                    workable = _workable_mask(
                        alive_f, fid_f, stop_f, n_frames
                    )
                    order_np = _np.argsort(
                        ~workable, kind="stable"
                    ).astype(_np.int32)
                    out = compact_fn(
                        jnp.asarray(order_np), *state[:11], px_l, py_l,
                        stop, *ad_stats, state[11], state[12],
                    )
                    state = out[:11] + (out[19], out[20])
                    px_l, py_l = out[11], out[12]
                    stop = out[13]
                    ad_stats = tuple(out[14:19])
                    pixel_of_slot = pixel_of_slot[order_np]
                    packed_workable = int(workable.sum())
                    compactions += 1
                    cur_lane_inv = jnp.asarray(
                        _slot_inverse(pixel_of_slot, n))
        pending.append(md)
        launches += 1
        if launches > max_launches:
            raise RuntimeError(
                f"persistent render exceeded {max_launches} launches "
                f"(budget={budget}, n_frames={n_frames}) — scheduler bug"
            )
        if preview is not None:
            st_now = state  # bind THIS launch's state, not the loop var
            preview(lambda st=st_now, inv=cur_lane_inv: _persist_finish_fn(
                config, n_pad, jit_refill
            )(st[6], st[10], st[12], scene.xyz_weights, scene.xyz_to_rgb,
              inv))
        if len(pending) >= 2:
            # one-launch-stale readback: blocks only on an already-retired
            # launch, so the device queue never drains
            min_done = int(pending.pop(0))
            if min_done >= n_frames:
                break
            if ring_slots:
                new_lead = min(min_done + ring_slots, n_frames)
                while lead < new_lead:
                    ring = refill(
                        *ring, jnp.uint32(lead),
                        scene.cam_pos, scene.cam_dir, scene.cam_up,
                        scene.fov_y_deg,
                    )
                    lead += 1
        if progress is not None:
            progress(min_done, launches)
        if should_abort is not None and should_abort():
            aborted = True
            break
    # drain the pipeline
    for md in pending:
        min_done = max(min_done, int(md))

    state_pre_drain = None
    if aborted:
        # Complete every in-flight path before finishing: the radiance
        # accumulator already holds the partial bounce contributions of
        # in-flight frames, which the completed-frame divisor would not
        # count — an upward bias of ~1/count on an aborted image.
        # ``end=0`` blocks every restart (``fid + 1 < 0`` never holds),
        # so each drain launch only walks alive lanes to their terminal
        # hit and tiles with no alive lanes skip the whole launch; the
        # SAME compiled step runs, no recompile. Path values are
        # unchanged (launch-split invariance) — but the drain DOES shift
        # lanes' phase relative to the adaptive launch-boundary stat
        # samples, so the checkpointed state is snapshotted BEFORE the
        # drain: a resume then replays the exact launch stream of an
        # uninterrupted render (bit-identical stop decisions), while the
        # returned aborted image is the unbiased drained average. Drain
        # mds are discarded: with lane_stop, stopped dead lanes report
        # ``end`` (= 0 here) as their count.
        if return_state:
            state_pre_drain = tuple(jnp.array(p) for p in state)
        zero_end = jnp.uint32(0)
        max_drains = 2 + config.max_bounces // max(budget, 1)
        for _ in range(max_drains):
            if float(jnp.max(state[6])) <= 0.0:
                break
            st = step(
                *state[:6], px_l, py_l, *state[6:13],
                stop if adaptive is not None else None,
                jnp.uint32(lead), zero_end, *tables, *ring,
            )
            state, _drain_md = st

    rgb = _persist_finish_fn(config, n_pad, jit_refill)(
        state[6], state[10], state[12], scene.xyz_weights, scene.xyz_to_rgb,
        cur_lane_inv,
    )
    info = {
        "launches": launches, "frames_done": int(min_done),
        "budget": budget, "ring_slots": ring_slots, "tile": tile,
        "aborted": aborted,
    }
    if return_state:
        rs = {
            "state": state_pre_drain if state_pre_drain is not None
            else state,
            "px": px_l, "py": py_l,
            "meta": {"n_frames": n_frames, "budget": budget, "tile": tile,
                     "adaptive": adaptive},
        }
        if adaptive is not None:
            rs.update(
                stop=stop, stats=ad_stats, pixel_of_slot=pixel_of_slot,
                packed_workable=packed_workable, compactions=compactions,
            )
        info["resume_state"] = rs
    if adaptive is not None:
        import numpy as _np

        fid_s = _np.asarray(state[10]).reshape(-1).astype(_np.int64)
        dead_s = _np.asarray(state[6]).reshape(-1) <= 0.0
        counts_slot = fid_s + dead_s  # a dead lane completed its frame
        slots = _np.nonzero(pixel_of_slot >= 0)[0]
        counts = _np.empty(n, _np.int64)
        counts[pixel_of_slot[slots]] = counts_slot[slots]
        info.update(
            compactions=compactions,
            min_counts=int(counts.min()),
            max_counts=int(counts.max()),
            mean_counts=float(counts.mean()),
            counts=counts,
            adaptive=adaptive,
        )
    return rgb, info


def integrate_frame_pallas_split(
    scene: SceneArrays,
    config: RenderConfig,
    frame_id,
    obj_types: tuple,
    split: int,
    tile: int | None = None,
    interpret: bool = False,
    has_transmission: bool = False,
    has_emission: bool = False,
) -> jax.Array:
    """Bounce-split frame integration with live-lane compaction.

    Runs bounces ``[0, split)`` on the full wavefront, then *permutes*
    live lanes to the front (a pure permutation — no paths are dropped,
    so the estimator is untouched; bit-identical to the monolithic kernel)
    and runs bounces ``[split, max)``; tiles that became all-dead skip
    their remaining bounces via the kernel's tile-level early exit.

    MEASURED VERDICT (v5e, Cornell 512^2x32x30): the lane permutation's
    minor-axis gathers cost ~40 ms/frame on the TPU's scatter/gather
    engine — an order of magnitude more than the tail-bounce work it
    saves (the monolithic kernel runs 5.1 ms/frame). Kept as a validated
    experimental path; lane occupancy remains the known headroom
    (PARITY.md known gaps).
    """
    frame_id = jnp.asarray(frame_id, dtype=jnp.uint32)
    n = config.width * config.height
    if config.n_objects == 0:
        return jnp.zeros((config.height, config.width, 3), dtype=jnp.float32)
    tile = tile or _pick_tile(n)
    n_pad = -(-n // tile) * tile
    s_dim = config.n_samples
    rows = n_pad // mk.LANE

    origin, direction, px, py = generate_primary_rays(
        scene.cam_pos, scene.cam_dir, scene.cam_up, scene.fov_y_deg,
        config.width, config.height, frame_id, config.intended_frames,
        dof=scene_dof(scene, config),
    )

    def lanes(a, dtype=jnp.float32):
        a = jnp.asarray(a, dtype)
        return jnp.pad(a, (0, n_pad - n)).reshape(rows, mk.LANE)

    geom, cbounds = _pack_geom_clusters(
        scene, None, obj_types, has_transmission
    )
    lpos = jnp.pad(scene.light_pos, ((0, 0), (0, 1)))
    lspec = scene.light_spec
    if config.n_lights == 0:
        lpos = jnp.zeros((1, 4), jnp.float32)
        lspec = jnp.zeros((1, s_dim), jnp.float32)
    if scene.sky is not None:
        lspec = jnp.concatenate([lspec, scene.sky[None, :]], axis=0)

    k1 = _kernel_seg(
        obj_types, config, tile, interpret, has_transmission, has_emission,
        0, split, has_texture=scene.textured_static,
        has_sky=scene.sky is not None,
    )
    k2 = _kernel_seg(
        obj_types, config, tile, interpret, has_transmission, has_emission,
        split, None, has_texture=scene.textured_static,
        has_sky=scene.sky is not None,
    )

    gidx = jnp.arange(n_pad, dtype=jnp.int32).reshape(rows, mk.LANE)
    alive0 = (gidx < n).astype(jnp.float32)
    zeros_spec = jnp.zeros((s_dim, rows, mk.LANE), jnp.float32)
    albedo_in, emission_in = scene.albedo, scene.emission
    if len(obj_types) > 64:
        albedo_in = scene.albedo[:1]
        emission_in = scene.emission[:1]
    args = (
        lanes(origin.x), lanes(origin.y), lanes(origin.z),
        lanes(direction.x), lanes(direction.y), lanes(direction.z),
        lanes(px, jnp.uint32), lanes(py, jnp.uint32),
        frame_id, geom, cbounds, albedo_in, emission_in,
        scene.mat_albedo, scene.mat_emission, scene.mat_scalars,
        lpos, lspec,
    )
    (rad1, thr1, ox1, oy1, oz1, dx1, dy1, dz1, alive1, gate1, hero1) = k1(
        *args,
        jnp.ones((s_dim, rows, mk.LANE), jnp.float32), zeros_spec,
        alive0, jnp.zeros((rows, mk.LANE), jnp.float32),
        jnp.full((rows, mk.LANE), -1.0, jnp.float32),
    )

    # pack live lanes to the front (stable, so intra-order is preserved)
    perm = jnp.argsort(-alive1.reshape(n_pad), stable=True)

    def P(a):
        return a.reshape(n_pad)[perm].reshape(rows, mk.LANE)

    def PS(a):
        return a.reshape(s_dim, n_pad)[:, perm].reshape(s_dim, rows, mk.LANE)

    px_lanes, py_lanes = args[6], args[7]
    out2 = k2(
        P(ox1), P(oy1), P(oz1), P(dx1), P(dy1), P(dz1),
        P(px_lanes), P(py_lanes),
        frame_id, geom, cbounds, albedo_in, emission_in,
        scene.mat_albedo, scene.mat_emission, scene.mat_scalars,
        lpos, lspec,
        PS(thr1), PS(rad1), P(alive1), P(gate1), P(hero1),
    )
    rad2 = out2[0]

    inv = jnp.argsort(perm)
    rad = rad2.reshape(s_dim, n_pad)[:, inv].T[:n]
    rgb = spectra_to_rgb(rad, scene.xyz_weights, scene.xyz_to_rgb)
    return rgb.reshape(config.height, config.width, 3)


def integrate_frame_pallas_phased(
    scene: SceneArrays,
    config: RenderConfig,
    frame_id,
    obj_types: tuple,
    split: int = 2,
    capacity_lanes: int | None = None,
    tile: int | None = None,
    interpret: bool = False,
    has_transmission: bool = False,
    has_emission: bool = False,
    clusters: tuple | None = None,
):
    """Occupancy-harvesting two-phase frame integration.

    Measured motivation (tools/occupancy_sweep.py + bench occupancy
    counters on v5e, 1000-sphere scene): live-lane occupancy entering
    bounce 2 is ~3%, yet per-bounce cost is flat (~20 ms) because the
    tile-level all-dead exit never fires with survivors scattered across
    8192-lane tiles — bounces 2..7 execute ~97% dead work.

    Phase 1 runs bounces ``[0, split)`` on the full wavefront. The live
    lanes are then *extracted* (``jnp.nonzero`` with a static capacity —
    NOT the bounce-split argsort permutation, whose full-wavefront
    minor-axis gathers were measured at ~40 ms and rejected): only the
    throughput spectra + 8 per-lane scalars move; phase-1 radiance never
    moves. Phase 2 finishes bounces ``[split, max)`` on the compacted
    (~16x smaller) wavefront, and its radiance is scatter-added back.

    Returns ``(rgb, overflow)``: ``overflow`` is True when live lanes
    exceeded the static capacity — the caller must then re-render this
    frame with the monolithic kernel (the estimator is never truncated).
    Lanes are extracted in ascending index order and the per-lane RNG
    streams travel with ``px``/``py``, so non-overflow results are
    bit-identical to the monolithic kernel.

    This is the single-stage form of ``integrate_frame_pallas_cascade``.
    """
    n = config.width * config.height
    tile_eff = tile or _pick_tile(n)
    n_pad = -(-n // tile_eff) * tile_eff
    # compacted-wavefront capacity: default 1/16 of the padded wavefront
    # (~2.3x the measured post-split occupancy), at least one tile
    cap = capacity_lanes or max(tile_eff, n_pad // 16)
    return integrate_frame_pallas_cascade(
        scene, config, frame_id, obj_types, ((split, cap),), tile=tile,
        interpret=interpret, has_transmission=has_transmission,
        has_emission=has_emission, clusters=clusters,
    )


def integrate_frame_pallas_cascade(
    scene: SceneArrays,
    config: RenderConfig,
    frame_id,
    obj_types: tuple,
    stages: tuple,
    tile: int | None = None,
    interpret: bool = False,
    has_transmission: bool = False,
    has_emission: bool = False,
    clusters: tuple | None = None,
):
    """N-stage occupancy-compacted frame integration.

    ``stages`` is a tuple of ``(split_bounce, capacity_lanes)`` pairs with
    strictly increasing splits: bounces ``[0, s0)`` run on the full
    wavefront, ``[s0, s1)`` on a ``cap0``-lane compacted wavefront, ...,
    ``[s_last, max_bounces)`` on ``cap_last`` lanes. Each extraction pulls
    the lanes still alive on the *current* (already compacted) wavefront,
    so deep bounces run on wavefronts sized to their measured occupancy.
    The extraction layout and its measured economics are documented on
    ``integrate_frame_pallas_phased`` (the single-stage form).

    Returns ``(rgb, overflow)``: ``overflow`` is True when ANY stage's
    live-lane count exceeded its capacity — the caller must then re-render
    the frame with the monolithic kernel (the estimator is never
    truncated). Non-overflow results are bit-identical to the monolithic
    kernel: lanes are extracted in ascending index order and the per-lane
    RNG streams travel with ``px``/``py``.
    """
    frame_id = jnp.asarray(frame_id, dtype=jnp.uint32)
    n = config.width * config.height
    if config.n_objects == 0:
        rgb = jnp.zeros((config.height, config.width, 3), dtype=jnp.float32)
        return rgb, jnp.array(False)
    splits = tuple(int(s) for s, _ in stages)
    if not splits:
        raise ValueError("stages must be non-empty")
    if list(splits) != sorted(set(splits)):
        raise ValueError(f"stage splits must be strictly increasing: {splits}")
    if not (0 < splits[0] and splits[-1] < config.max_bounces):
        raise ValueError(
            f"stage splits {splits} must lie inside (0, {config.max_bounces})"
        )
    tile = tile or _pick_tile(n)
    n_pad = -(-n // tile) * tile
    s_dim = config.n_samples
    rows = n_pad // mk.LANE
    # capacities rounded up to whole tiles (Mosaic-legal wavefronts)
    caps = [-(-min(int(c), n_pad) // tile) * tile for _, c in stages]

    origin, direction, px, py = generate_primary_rays(
        scene.cam_pos, scene.cam_dir, scene.cam_up, scene.fov_y_deg,
        config.width, config.height, frame_id, config.intended_frames,
        dof=scene_dof(scene, config),
    )

    def lanes(a, dtype=jnp.float32):
        a = jnp.asarray(a, dtype)
        return jnp.pad(a, (0, n_pad - n)).reshape(rows, mk.LANE)

    geom, cbounds = _pack_geom_clusters(
        scene, clusters, obj_types, has_transmission
    )
    (albedo_in, emission_in, m_alb, m_emis, m_scal,
     lpos, lspec) = _mat_light_tables(scene, config, obj_types, clusters)
    tables = (
        geom, cbounds, albedo_in, emission_in, m_alb, m_emis, m_scal,
        lpos, lspec,
    )

    bounds = (0,) + splits + (None,)
    kernels = [
        _kernel_seg(
            obj_types, config, tile, interpret, has_transmission,
            has_emission, bounds[i], bounds[i + 1],
            clusters[1] if clusters else None,
            has_texture=scene.textured_static,
            has_sky=scene.sky is not None,
        )
        for i in range(len(bounds) - 1)
    ]

    # segment-0 wavefront: the full padded image
    cap = n_pad
    ox, oy, oz = lanes(origin.x), lanes(origin.y), lanes(origin.z)
    dx_, dy_, dz_ = lanes(direction.x), lanes(direction.y), lanes(direction.z)
    px_l, py_l = lanes(px, jnp.uint32), lanes(py, jnp.uint32)
    gidx = jnp.arange(n_pad, dtype=jnp.int32).reshape(rows, mk.LANE)
    alive = (gidx < n).astype(jnp.float32)
    gate = jnp.zeros((rows, mk.LANE), jnp.float32)
    hero = jnp.full((rows, mk.LANE), -1.0, jnp.float32)
    thr = jnp.ones((s_dim, rows, mk.LANE), jnp.float32)

    rad_t = None  # [n_pad, S] lane-major accumulated radiance
    chain = None  # [cap] int32: current wavefront lane -> full-image lane
    overflow = jnp.array(False)

    for i, k in enumerate(kernels):
        crows = cap // mk.LANE
        (rad, thr, ox, oy, oz, dx_, dy_, dz_, alive, gate, hero) = k(
            ox, oy, oz, dx_, dy_, dz_, px_l, py_l, frame_id, *tables,
            thr, jnp.zeros((s_dim, crows, mk.LANE), jnp.float32),
            alive, gate, hero,
        )
        # lane-major throughout: the extraction gathers and the final RGB
        # conversion both consume [lanes, S] rows (minor-axis lane gathers
        # were measured at ~50 ms/frame on v5e and rejected)
        rad_lm = rad.reshape(s_dim, cap).T  # [cap, S]
        if chain is None:
            rad_t = rad_lm
        else:
            rad_t = rad_t.at[chain].add(rad_lm)
        if i == len(kernels) - 1:
            break

        ncap = caps[i]
        nrows = ncap // mk.LANE
        flat_alive = alive.reshape(cap) > 0.0
        count = jnp.sum(flat_alive.astype(jnp.int32))
        overflow = overflow | (count > ncap)
        # ascending-order extraction; fill entries point at lane 0 but
        # carry a dead alive flag, so they trace harmlessly
        (idx,) = jnp.nonzero(flat_alive, size=ncap, fill_value=0)

        def G(a, idx=idx, nrows=nrows):
            return a.reshape(-1)[idx].reshape(nrows, mk.LANE)

        thr = thr.reshape(s_dim, cap).T[idx].T.reshape(s_dim, nrows, mk.LANE)
        ox, oy, oz = G(ox), G(oy), G(oz)
        dx_, dy_, dz_ = G(dx_), G(dy_), G(dz_)
        px_l, py_l = G(px_l), G(py_l)
        gate, hero = G(gate), G(hero)
        alive = (
            (jnp.arange(ncap) < count)
            .astype(jnp.float32).reshape(nrows, mk.LANE)
        )
        chain = idx if chain is None else chain[idx]
        cap = ncap

    rgb = spectra_to_rgb(rad_t[:n], scene.xyz_weights, scene.xyz_to_rgb)
    return rgb.reshape(config.height, config.width, 3), overflow


def render_frame_step_pallas(
    scene: SceneArrays,
    config: RenderConfig,
    accum: jax.Array,
    frame_id,
    obj_types: tuple,
    interpret: bool = False,
    has_transmission: bool = False,
    has_emission: bool = False,
    tile: int | None = None,
    clusters: tuple | None = None,
) -> jax.Array:
    """Pallas-path equivalent of ``render_frame_step``."""
    rgb = integrate_frame_pallas(
        scene, config, frame_id, obj_types, interpret=interpret,
        has_transmission=has_transmission, has_emission=has_emission,
        tile=tile, clusters=clusters,
    )
    return accumulate_frame(accum, rgb, frame_id)


def render_frame_step_pallas_phased(
    scene: SceneArrays,
    config: RenderConfig,
    accum: jax.Array,
    frame_id,
    obj_types: tuple,
    split: int = 2,
    capacity_lanes: int | None = None,
    interpret: bool = False,
    has_transmission: bool = False,
    has_emission: bool = False,
    tile: int | None = None,
):
    """Phased (occupancy-compacted) frame step.

    Returns ``(accum', overflow)``; on overflow the returned accumulator
    already contains a *wrong* frame — the caller must discard it and
    re-render the frame with ``render_frame_step_pallas`` (see
    ``Renderer._advance`` for the fallback pattern). Overflow is expected
    to be rare: capacity defaults to ~2x the measured post-split
    occupancy.
    """
    rgb, overflow = integrate_frame_pallas_phased(
        scene, config, frame_id, obj_types, split=split,
        capacity_lanes=capacity_lanes, tile=tile, interpret=interpret,
        has_transmission=has_transmission, has_emission=has_emission,
    )
    return accumulate_frame(accum, rgb, frame_id), overflow
