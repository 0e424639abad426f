"""Sharding placement for scene tables and framebuffers.

Scene tables (object/material/light SoA) are tiny and read by every ray —
they are replicated across the mesh. The framebuffer (and with it the
whole per-pixel wavefront, via XLA SPMD propagation) is sharded over pixel
rows; each device traces its row slice independently, mirroring the
reference's row-per-thread fan-out (src/main.rs:1286-1307) at chip
granularity over ICI instead of a thread pool.
"""

from __future__ import annotations

import jax

from spectral_tpu.parallel.mesh import replicated, row_sharding
from spectral_tpu.scene.flatten import RenderConfig, SceneArrays


def shard_scene(
    scene: SceneArrays,
    sharding: jax.sharding.NamedSharding,
    config: RenderConfig,
):
    """Place scene tables (replicated) and return the framebuffer sharding.

    ``sharding`` may be any NamedSharding on the target mesh; its mesh is
    reused. Raises if the row count does not divide over the mesh.
    """
    mesh = sharding.mesh
    n_dev = mesh.devices.size
    if config.height % n_dev != 0:
        raise ValueError(
            f"image height {config.height} must be divisible by the mesh "
            f"size {n_dev} (pad the image or shrink the mesh)"
        )
    scene_rep = jax.device_put(scene, replicated(mesh))
    return scene_rep, row_sharding(mesh)


def build_sharded_pallas_step(
    mesh, config: RenderConfig, obj_types: tuple, interpret: bool = False,
    has_transmission: bool = False, has_emission: bool = False,
    clusters: tuple | None = None,
):
    """Row-sharded megakernel step via shard_map.

    Each device runs the VMEM-resident bounce megakernel on its own row
    slab, generating camera rays in *global* image coordinates from its
    mesh position — the multi-chip analog of the reference's
    row-per-thread fan-out, with zero per-frame collectives.
    """
    import dataclasses

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from spectral_tpu.parallel.mesh import ROW_AXIS
    from spectral_tpu.render.integrator import accumulate_frame
    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas

    n_dev = mesh.devices.size
    local_h = config.height // n_dev
    local_config = dataclasses.replace(config, height=local_h)

    def shard_fn(scene_local, accum_local, frame_id):
        idx = jax.lax.axis_index(ROW_AXIS)
        rgb = integrate_frame_pallas(
            scene_local,
            local_config,
            frame_id,
            obj_types,
            interpret=interpret,
            has_transmission=has_transmission,
            has_emission=has_emission,
            full_height=config.height,
            row_offset=idx * local_h,
            clusters=clusters,
        )
        return accumulate_frame(accum_local, rgb, frame_id)

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(ROW_AXIS), P()),
        out_specs=P(ROW_AXIS),
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1,))


def build_sharded_persist_step(
    mesh, local_config, obj_types: tuple, tile: int, budget: int,
    interpret: bool = False,
    has_transmission: bool = False, has_emission: bool = False,
    cluster_runs: tuple | None = None, member_unroll: int = 8,
    lane_stop: bool = False, has_texture: bool = False,
    has_sky: bool = False,
):
    """Row-sharded persistent launch: each device runs ``budget`` bounce
    iterations of the free-running persist kernel over ITS row slab's
    carried lane state. The only cross-device communication is a single
    ``pmin`` of the per-shard completed-frame minimum per LAUNCH (~64
    frames), so the zero-per-frame-collectives layout of the other
    sharded steps is preserved. ``local_config`` is the per-device config
    (height = global height / mesh size); state planes arrive sharded on
    their row axis in the per-shard-padded layout built by
    ``render_persistent_sharded``."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from spectral_tpu.parallel.mesh import ROW_AXIS
    from spectral_tpu.render.pallas_integrator import _kernel_persist

    run = _kernel_persist(
        obj_types, local_config, tile, interpret, has_transmission,
        has_emission, 0, budget, cluster_runs, member_unroll, lane_stop,
        has_texture=has_texture,
        has_sky=has_sky,
    )
    local_n = local_config.width * local_config.height

    def shard_fn(
        ox, oy, oz, dx, dy, dz, px, py, alive, gate, hero, bl, fid,
        thr, rad, stop, end,
        geom, cbounds, albedo, emission, m_alb, m_emis, m_scal,
        lpos, lspec, cam,
    ):
        rad_o, thr_o, oxo, oyo, ozo, dxo, dyo, dzo, al_o, ga_o, he_o, \
            bl_o, fid_o = run(
                ox, oy, oz, dx, dy, dz, px, py, alive, gate, hero, bl, fid,
                thr, rad, None, end,
                geom, cbounds, albedo, emission, m_alb, m_emis, m_scal,
                lpos, lspec, cam, stop=stop,
            )
        completed = fid_o + jnp.where(
            al_o <= 0.0, jnp.uint32(1), jnp.uint32(0)
        )
        if lane_stop:
            completed = jnp.where(
                (stop > 0.0) & (al_o <= 0.0), end, completed
            )
        md = jax.lax.pmin(
            jnp.min(completed.reshape(-1)[:local_n]), ROW_AXIS
        )
        return (oxo, oyo, ozo, dxo, dyo, dzo, al_o, ga_o, he_o, bl_o,
                fid_o, thr_o, rad_o, md)

    plane = P(ROW_AXIS)
    spec = P(None, ROW_AXIS)
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (plane,) * 13  # ray/pixel/flag planes
            + (spec, spec)  # thr, rad
            + (plane, P())  # stop mask (unused unless lane_stop), end
            + (P(),) * 10  # replicated tables
        ),
        out_specs=(plane,) * 11 + (spec, spec) + (P(),),
        check_vma=False,
    )
    return jax.jit(
        mapped,
        donate_argnums=(0, 1, 2, 3, 4, 5, 8, 9, 10, 11, 12, 13, 14),
    )


def _scalar(x) -> int:
    """Read a replicated scalar from a (possibly multi-process) global
    array: ``int()`` requires full addressability, but a replicated
    out_spec means any local shard holds the value."""
    if getattr(x, "is_fully_addressable", True):
        return int(x)
    return int(x.addressable_data(0))


def _sharded_finish(mesh, local_config, local_n_pad, with_inv: bool = False):
    """Jitted shard_map per-pixel-average epilogue for sharded persist
    (also serves as the per-launch live preview). Cached per (mesh,
    config, padding) so repeated preview calls reuse one program.
    ``with_inv`` adds a per-shard LOCAL pixel->slot table (compaction is
    shard-local, so pixels never leave their shard)."""
    from jax.sharding import PartitionSpec as P

    from spectral_tpu.parallel.mesh import ROW_AXIS
    from spectral_tpu.render.pallas_integrator import _persist_finish_fn

    key = (id(mesh), local_config, local_n_pad, with_inv)
    cached = _sharded_finish._cache.get(key)
    if cached is not None:
        return cached
    local_finish = _persist_finish_fn(local_config, local_n_pad,
                                      jit_host=False)

    if with_inv:
        def fin(alive, fid, rad, xyzw, x2r, inv):
            return local_finish(alive, fid, rad, xyzw, x2r,
                                inv.reshape(-1))

        in_specs = (P(ROW_AXIS), P(ROW_AXIS), P(None, ROW_AXIS), P(), P(),
                    P(ROW_AXIS))
    else:
        def fin(alive, fid, rad, xyzw, x2r):
            return local_finish(alive, fid, rad, xyzw, x2r)

        in_specs = (P(ROW_AXIS), P(ROW_AXIS), P(None, ROW_AXIS), P(), P())

    fn = jax.jit(jax.shard_map(
        fin, mesh=mesh,
        in_specs=in_specs,
        out_specs=P(ROW_AXIS),
        check_vma=False,
    ))
    if len(_sharded_finish._cache) > 16:
        _sharded_finish._cache.clear()
    _sharded_finish._cache[key] = fn
    return fn


_sharded_finish._cache = {}


def _sharded_compact_fn(mesh, local_n_pad: int, s_dim: int):
    """Jitted shard_map gather that relabels each shard's carried persist
    state by a shard-LOCAL lane permutation (compaction never crosses
    shards — a pixel's rows stay on its device, so the repack is a
    block-diagonal permutation with zero collectives)."""
    from jax.sharding import PartitionSpec as P

    from spectral_tpu.parallel.mesh import ROW_AXIS

    def fn(order, *planes):
        idx = order.reshape(-1)

        def g(a):
            if a.ndim == 2:
                return a.reshape(local_n_pad)[idx].reshape(a.shape)
            return a.reshape(s_dim, local_n_pad)[:, idx].reshape(a.shape)

        return tuple(g(a) for a in planes)

    plane = P(ROW_AXIS)
    spec = P(None, ROW_AXIS)
    # order + 19 lane planes (11 state, px, py, stop, 5 stats) + thr + rad
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(plane,) * 20 + (spec, spec),
        out_specs=(plane,) * 19 + (spec, spec),
        check_vma=False,
    ), donate_argnums=tuple(range(1, 22)))


def render_persistent_sharded(
    scene: SceneArrays,
    config: RenderConfig,
    obj_types: tuple,
    mesh,
    n_frames: int,
    budget: int | None = None,
    frames_per_launch: int | None = None,
    tile: int | None = None,
    interpret: bool = False,
    has_transmission: bool = False,
    has_emission: bool = False,
    clusters: tuple | None = None,
    member_unroll: int = 8,
    adaptive: tuple | None = None,
    compact: bool = True,
    progress=None,
    should_abort=None,
    preview=None,
):
    """Row-sharded ``render_persistent`` (free-running variant only).

    Each device owns ``height / n_devices`` image rows; its lanes carry
    state across launches exactly like the single-chip persist render
    (raygen is elementwise in the per-lane GLOBAL pixel coordinates, so
    restarts need no cross-device data). Between launches the host reads
    one replicated ``pmin`` scalar; with ``adaptive`` the convergence
    update runs as a plain jitted elementwise program over the sharded
    stat planes (sharding propagates — no shard_map, no collectives).
    Returns ``(rgb, info)`` with the same semantics as
    ``render_persistent``; the per-shard lane padding means lane order is
    slab-major, which this function unpacks back to image order.

    The ring variant is intentionally not offered here: its host-refilled
    ring planes assume a single global frame window, which reintroduces
    whole-mesh coupling (the measured slowest-pixel pacing, PARITY.md).
    """
    if config.has_dof:
        raise ValueError(
            "the persist kernel's in-kernel restart raygen assumes the "
            "frame-constant pinhole camera, incompatible with depth of "
            "field; use the per-frame sharded step"
        )
    import dataclasses
    import functools

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.parallel.mesh import ROW_AXIS
    from spectral_tpu.render.camera import generate_primary_rays
    from spectral_tpu.render.pallas_integrator import (
        _MIN_TILE,
        _adapt_update_fn,
        _mat_light_tables,
        _pack_geom_clusters,
        _pick_tile,
        probe_path_cost,
    )

    if n_frames < 1:
        raise ValueError("n_frames must be >= 1")
    n_dev = mesh.devices.size
    if config.height % n_dev != 0:
        raise ValueError(
            f"image height {config.height} must be divisible by the mesh "
            f"size {n_dev}"
        )
    if config.n_objects == 0:
        # mirror render_persistent's black-image early return (a 0-object
        # megakernel is not buildable)
        n_px = config.width * config.height
        info = {"launches": 0, "frames_done": n_frames, "budget": 0,
                "ring_slots": 0, "tile": 0, "aborted": False,
                "n_devices": n_dev}
        if adaptive is not None:
            info.update(
                min_counts=n_frames, max_counts=n_frames,
                mean_counts=float(n_frames), compactions=0,
                counts=np.full(n_px, n_frames, np.int64),
                adaptive=tuple(adaptive),
            )
        return (
            jnp.zeros((config.height, config.width, 3), jnp.float32),
            info,
        )
    if adaptive is not None:
        adaptive = (int(adaptive[0]), float(adaptive[1]), float(adaptive[2]))
        if adaptive[0] < 2:
            raise ValueError("adaptive min_frames must be >= 2")
        if not (adaptive[1] >= 0.0 and adaptive[2] >= 0.0):
            raise ValueError("adaptive rtol/atol must be >= 0")
    local_h = config.height // n_dev
    local_n = config.width * local_h
    local_config = dataclasses.replace(config, height=local_h)
    s_dim = config.n_samples

    fpl = frames_per_launch or 64
    tile = tile or min(_pick_tile(local_n), 4096)
    f32_per_lane = 80 + 8 * s_dim + (1 if adaptive is not None else 0)
    while tile > _MIN_TILE and tile * f32_per_lane * 4 > 15_500_000:
        tile //= 2
    if budget is None:
        cost = probe_path_cost(
            scene, config, obj_types, n_probe_frames=1,
            interpret=interpret, has_transmission=has_transmission,
            has_emission=has_emission, clusters=clusters,
        )
        budget = max(8, int(round(fpl * float(jnp.mean(cost)))))

    # --- per-shard-padded lane layout: each shard's block is its row
    # slab's pixels (global row-major) followed by its own padding
    local_n_pad = -(-local_n // tile) * tile
    local_rows = local_n_pad // mk.LANE
    rows_g = n_dev * local_rows
    px_np = np.zeros((n_dev, local_n_pad), np.uint32)
    py_np = np.zeros((n_dev, local_n_pad), np.uint32)
    valid_np = np.zeros((n_dev, local_n_pad), np.float32)
    px_slab = np.tile(np.arange(config.width, dtype=np.uint32), local_h)
    for d in range(n_dev):
        py_np[d, :local_n] = np.repeat(
            np.arange(local_h, dtype=np.uint32) + d * local_h, config.width
        )
        px_np[d, :local_n] = px_slab
        valid_np[d, :local_n] = 1.0
    plane_sh = NamedSharding(mesh, P(ROW_AXIS))
    spec_sh = NamedSharding(mesh, P(None, ROW_AXIS))
    rep_sh = NamedSharding(mesh, P())
    px_l = jax.device_put(px_np.reshape(rows_g, mk.LANE), plane_sh)
    py_l = jax.device_put(py_np.reshape(rows_g, mk.LANE), plane_sh)
    valid_l = jax.device_put(valid_np.reshape(rows_g, mk.LANE), plane_sh)

    # --- tables, replicated (fori trimming mirrors render_persistent)
    geom, cbounds = _pack_geom_clusters(
        scene, clusters, obj_types, has_transmission
    )
    cam = mk.pack_camera_basis(scene, config)
    (albedo_in, emission_in, m_alb, m_emis, m_scal,
     lpos, lspec) = _mat_light_tables(scene, config, obj_types, clusters)
    tables = tuple(
        jax.device_put(t, rep_sh)
        for t in (
            geom, cbounds, albedo_in, emission_in, m_alb, m_emis, m_scal,
            lpos, lspec, cam,
        )
    )

    # --- frame-0 state, one jitted elementwise program over the sharded
    # coordinate planes (raygen is elementwise in px/py — padding lanes
    # get harmless rays and alive=0, the kernel's valid mask ignores them)
    @functools.partial(
        jax.jit,
        out_shardings=(plane_sh,) * 11 + (spec_sh,) * 2,
    )
    def init(cam_pos, cam_dir, cam_up, fov, px_pl, py_pl, valid_pl):
        o, dvec, _, _ = generate_primary_rays(
            cam_pos, cam_dir, cam_up, fov,
            config.width, config.height, jnp.uint32(0),
            config.intended_frames,
            pixel_xy=(px_pl.reshape(-1), py_pl.reshape(-1)),
        )
        shp = px_pl.shape

        def pl(a):
            return jnp.asarray(a, jnp.float32).reshape(shp)

        return (
            pl(o.x), pl(o.y), pl(o.z),
            pl(dvec.x), pl(dvec.y), pl(dvec.z),
            valid_pl,                                   # alive
            jnp.zeros_like(valid_pl),                   # gate
            jnp.full_like(valid_pl, -1.0),              # hero
            jnp.full_like(px_pl, config.max_bounces),   # bl
            jnp.zeros_like(px_pl),                      # fid
            jnp.ones((s_dim, *shp), jnp.float32),       # thr
            jnp.zeros((s_dim, *shp), jnp.float32),      # rad
        )

    state = tuple(init(
        scene.cam_pos, scene.cam_dir, scene.cam_up, scene.fov_y_deg,
        px_l, py_l, valid_l,
    ))
    if adaptive is not None:
        # padding lanes start stopped (the kernel's valid gate blocks
        # them anyway, but under compaction they can drift into the
        # leading scheduler window where an unstopped dead lane would
        # pin the pmin forever)
        stop = jax.device_put(
            (1.0 - valid_np.reshape(rows_g, mk.LANE)).astype(np.float32),
            plane_sh,
        )
        ad_stats = tuple(
            jax.device_put(np.zeros((rows_g, mk.LANE), np.float32), plane_sh)
            for _ in range(5)
        )
        adapt_update = _adapt_update_fn(rows_g * mk.LANE, *adaptive)
        # compaction bookkeeping: GLOBAL pixel id living in each slot
        # (-1 = padding); shard d's pixels are the contiguous global
        # range [d*local_n, (d+1)*local_n) and never leave their shard
        pixel_of_slot = np.full(n_dev * local_n_pad, -1, np.int64)
        for d in range(n_dev):
            pixel_of_slot[d * local_n_pad:d * local_n_pad + local_n] = (
                np.arange(local_n) + d * local_n
            )
        packed_workable = n_dev * local_n
        compactions = 0
        compact_fn = (
            _sharded_compact_fn(mesh, local_n_pad, s_dim) if compact
            else None
        )
        inv_plane = None  # per-shard LOCAL pixel->slot, set on repack

    step = build_sharded_persist_step(
        mesh, local_config, obj_types, tile, budget, interpret,
        has_transmission, has_emission,
        clusters[1] if clusters else None, member_unroll,
        lane_stop=adaptive is not None,
        has_texture=scene.textured_static,
        has_sky=scene.sky is not None,
    )

    end_arr = jnp.uint32(n_frames)
    zero_stop = jax.device_put(
        np.zeros((rows_g, mk.LANE), np.float32), plane_sh
    )
    pending: list = []
    pending_work: list = []
    launches = 0
    min_done = 0
    aborted = False
    if adaptive is None:
        inv_plane = None

    def _do_finish(st, iv):
        if iv is None:
            return _sharded_finish(mesh, local_config, local_n_pad)(
                st[6], st[10], st[12],
                scene.xyz_weights, scene.xyz_to_rgb,
            )
        return _sharded_finish(
            mesh, local_config, local_n_pad, with_inv=True
        )(st[6], st[10], st[12], scene.xyz_weights, scene.xyz_to_rgb, iv)
    max_launches = 16 + 8 * (
        (n_frames * config.max_bounces) // max(budget, 1) + 1
    )
    while True:
        *new_state, md = step(
            *state[:6], px_l, py_l, *state[6:13],
            stop if adaptive is not None else zero_stop,
            end_arr, *tables,
        )
        state = tuple(new_state)
        if adaptive is not None:
            stop, *rest = adapt_update(
                state[12], state[10], state[6], stop, *ad_stats, end_arr,
            )
            ad_stats, n_work_dev = tuple(rest[:5]), rest[5]
            if compact_fn is not None:
                pending_work.append(n_work_dev)
            if compact_fn is not None and len(pending_work) >= 2:
                # floor note: a strictly per-shard-faithful floor would
                # be n_dev * tile (a one-tile global drop spread across
                # shards empties nothing), but that forbids repacks on
                # small renders outright; at real resolutions the
                # packed//4 fraction dominates either floor, and a rare
                # zero-benefit repack costs one gather
                n_work = _scalar(pending_work.pop(0))
                if 0 < n_work < packed_workable - max(
                    packed_workable // 4, tile
                ):
                    # shard-LOCAL repack (block-diagonal permutation, no
                    # collectives): working lanes first within each
                    # shard. One stacked fetch (not three) — on a
                    # multi-process mesh each fetch_global is a blocking
                    # DCN allgather on the launch critical path.
                    from spectral_tpu.parallel.distributed import (
                        fetch_global,
                    )
                    from spectral_tpu.render.pallas_integrator import (
                        _slot_inverse,
                        _workable_mask,
                    )

                    planes3 = fetch_global(jnp.stack([
                        state[6], state[10].astype(jnp.float32), stop,
                    ])).reshape(3, n_dev, local_n_pad)
                    workable = _workable_mask(
                        planes3[0], planes3[1], planes3[2], n_frames
                    )
                    order_np = np.argsort(
                        ~workable, axis=1, kind="stable"
                    ).astype(np.int32)
                    order_pl = jax.device_put(
                        order_np.reshape(rows_g, mk.LANE), plane_sh
                    )
                    out = compact_fn(
                        order_pl, *state[:11], px_l, py_l, stop,
                        *ad_stats, state[11], state[12],
                    )
                    state = out[:11] + (out[19], out[20])
                    px_l, py_l = out[11], out[12]
                    stop = out[13]
                    ad_stats = tuple(out[14:19])
                    g_order = (
                        np.arange(n_dev)[:, None] * local_n_pad + order_np
                    ).reshape(-1)
                    pixel_of_slot = pixel_of_slot[g_order]
                    packed_workable = int(workable.sum())
                    compactions += 1
                    # per-shard LOCAL pixel->slot for the finish/preview
                    # (compaction is shard-local: shift each shard's
                    # global pixel ids to local; padding stays negative)
                    pos2 = pixel_of_slot.reshape(n_dev, local_n_pad)
                    inv_np = np.stack([
                        _slot_inverse(pos2[d] - d * local_n, local_n)
                        for d in range(n_dev)
                    ])
                    inv_plane = jax.device_put(inv_np, plane_sh)
        pending.append(md)
        launches += 1
        if launches > max_launches:
            raise RuntimeError(
                f"sharded persistent render exceeded {max_launches} "
                f"launches (budget={budget}, n_frames={n_frames})"
            )
        if preview is not None:
            st_now, inv_now = state, inv_plane
            preview(lambda st=st_now, iv=inv_now: _do_finish(st, iv))
        if len(pending) >= 2:
            min_done = _scalar(pending.pop(0))
            if min_done >= n_frames:
                break
        if progress is not None:
            progress(min_done, launches)
        if should_abort is not None and should_abort():
            aborted = True
            break
    for md in pending:
        min_done = max(min_done, _scalar(md))

    if aborted:
        # complete every in-flight path before finishing (mirrors
        # render_persistent's abort drain): end=0 blocks all restarts,
        # so the radiance accumulator holds only COMPLETED frames when
        # the completed-count divisor is applied — no partial-path
        # upward bias on the aborted image. Same compiled step; drain
        # mds are discarded (with lane_stop, stopped dead lanes report
        # end = 0 as their count).
        zero_end = jnp.uint32(0)
        max_drains = 2 + config.max_bounces // max(budget, 1)
        for _ in range(max_drains):
            if _scalar(jnp.max(state[6])) <= 0.0:
                break
            *new_state, _drain_md = step(
                *state[:6], px_l, py_l, *state[6:13],
                stop if adaptive is not None else zero_stop,
                zero_end, *tables,
            )
            state = tuple(new_state)

    rgb = _do_finish(state, inv_plane)

    info = {
        "launches": launches, "frames_done": int(min_done),
        "budget": budget, "ring_slots": 0, "tile": tile,
        "aborted": aborted, "n_devices": n_dev,
    }
    if adaptive is not None:
        from spectral_tpu.parallel.distributed import fetch_global

        # fetch_global handles non-fully-addressable planes on
        # multi-process meshes (np.asarray would raise there)
        fid_np = fetch_global(state[10]).reshape(-1)
        alive_np = fetch_global(state[6]).reshape(-1)
        counts_slot = fid_np.astype(np.int64) + (alive_np <= 0.0)
        slots = np.nonzero(pixel_of_slot >= 0)[0]
        counts = np.empty(n_dev * local_n, np.int64)
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


def build_sharded_pallas_regen_step(
    mesh, config: RenderConfig, obj_types: tuple, k: int,
    interpret: bool = False,
    has_transmission: bool = False, has_emission: bool = False,
    clusters: tuple | None = None,
):
    """Row-sharded path-regeneration step: each device retires ``k``
    progressive frames of its row slab in one megakernel launch
    (``integrate_frames_pallas_regen``), then blends the k-frame sum.
    Same zero-per-frame-collectives layout as the per-frame step."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from spectral_tpu.parallel.mesh import ROW_AXIS
    from spectral_tpu.render.integrator import accumulate_frames
    from spectral_tpu.render.pallas_integrator import (
        integrate_frames_pallas_regen,
    )

    n_dev = mesh.devices.size
    local_h = config.height // n_dev
    local_config = dataclasses.replace(config, height=local_h)

    def shard_fn(scene_local, accum_local, first_frame):
        idx = jax.lax.axis_index(ROW_AXIS)
        rgb_sum = integrate_frames_pallas_regen(
            scene_local,
            local_config,
            first_frame,
            obj_types,
            k,
            interpret=interpret,
            has_transmission=has_transmission,
            has_emission=has_emission,
            full_height=config.height,
            row_offset=idx * local_h,
            clusters=clusters,
        )
        return accumulate_frames(accum_local, rgb_sum, first_frame, k)

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(ROW_AXIS), P()),
        out_specs=P(ROW_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1,))
