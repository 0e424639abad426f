"""Headline benchmark: BASELINE-config throughput on real TPU hardware.

With no arguments, prints ONE JSON line PER BASELINE config (accuracy
line first, the headline cornell512 throughput last):
    {"metric": ..., "value": N, "unit": "Mrays/s*lambda", "vs_baseline": N}
``python bench.py <config>`` runs a single config.

The throughput metric is reference-equivalent ray throughput times spectral width —
each counted ray is one ``submit_ray`` the reference CPU renderer would
have performed (primary + continuation + NEE shadow rays; retired
wavefront lanes are NOT counted), times the number of wavelength samples
carried per ray. Baseline: the driver's north-star target of 100
Mrays/s*lambda per chip (BASELINE.md; the reference publishes no numbers).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp


BASELINE_MRAYS_LAMBDA = 100.0


class BenchTimeout(Exception):
    pass


def _arm_watchdog(seconds: int = 1500) -> None:
    """The TPU tunnel can wedge indefinitely if a previous client died
    mid-claim; raise (so the process unwinds and releases its own claim
    CLEANLY — a hard exit would orphan the claim and wedge the tunnel for
    the next client) and emit an explanatory JSON line.

    Caveat: a Python-level SIGALRM handler only runs when the interpreter
    regains control; observed behavior on the axon platform is that its
    blocking waits poll through Python (the watchdog has fired in practice
    on a wedged tunnel), but a wait stuck purely in native code would
    defer it."""
    import signal

    def _timeout(_sig, _frm):
        raise BenchTimeout(
            f"TPU unresponsive for {seconds}s (wedged tunnel?)"
        )

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(seconds)


def _enable_compile_cache() -> None:
    import os

    try:
        cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _make_scene(name: str):
    from spectral_tpu.scene import presets

    if name == "cornell512":
        scene = presets.cornell_box()
        scene.width = scene.height = 512
        scene.nbr_of_ray_bounces = 30
        scene.nbr_of_iterations = 100
        return scene, "cornell 512x512, 32 lambda, 30 bounces, pallas megakernel"
    if name == "hero":
        # BASELINE config #5 (single-chip slice of the v5e-4 hero render)
        scene = presets.cornell_box(n_samples=64)
        scene.width, scene.height = 1920, 1080
        scene.nbr_of_ray_bounces = 30
        scene.nbr_of_iterations = 1000
        return scene, "hero 1920x1080, 64 lambda, 30 bounces, pallas megakernel"
    if name == "prism":
        scene = presets.prism(n_samples=64)
        scene.nbr_of_ray_bounces = 8
        return scene, "prism 800x600, 64 lambda, dispersion, pallas megakernel"
    if name == "spheres":
        scene = presets.sphere_field(n_spheres=1000)
        scene.nbr_of_iterations = 100
        return scene, (
            "1000 spheres 1024x768, 32 lambda, 8 bounces, "
            "fori megakernel with in-kernel path regeneration"
        )
    if name == "mesh":
        # beyond-BASELINE config (opt-in, not part of the no-arg 'all'
        # run): the triangle-mesh preset — 340 object rows dominated by
        # Moller-Trumbore triangles on the clustered fori loop
        scene = presets.PRESETS["mesh"]()
        scene.width = scene.height = 512
        scene.nbr_of_ray_bounces = 30
        scene.nbr_of_iterations = 100
        return scene, (
            "mesh preset 512x512 (340 triangle rows), 32 lambda, "
            "30 bounces, clustered fori megakernel"
        )
    if name == "mesh5k":
        # beyond-BASELINE config (opt-in): the production-scale mesh —
        # ~6.4k triangle rows (5,120-face mirror icosphere + 1,280-face
        # icosahedron) on the clustered fori loop; the [GEOM_COLS, O]
        # SMEM transpose exists for this config (megakernel.pack_geometry)
        scene = presets.PRESETS["mesh5k"]()
        scene.width = scene.height = 512
        scene.nbr_of_ray_bounces = 30
        scene.nbr_of_iterations = 100
        return scene, (
            "mesh5k preset 512x512 (~6.4k triangle rows), 32 lambda, "
            "30 bounces, clustered fori megakernel"
        )
    raise SystemExit(f"unknown bench config {name!r}")


# phased (occupancy-compacted) rendering: kept for configs where it wins;
# since round 2 the in-kernel path-regeneration kernel below beats it on
# every BASELINE config (spheres: phased 95.9 ms/frame vs regen 86.7), so
# no config uses it here — `--phase-split` remains a CLI/Renderer feature
_PHASED: dict = {}

# in-kernel path regeneration (tools/regen_bench.py, v5e): (K, tile) per
# config — K frames per megakernel launch, terminating lanes immediately
# start the pixel's next frame. 4096-lane tiles are the measured
# straggler sweet spot on the few-object configs (cornell512 K=50:
# 8192/4096/2048/1024 = 3.63/3.48/3.58/4.36 ms/frame); CLUSTERED configs
# run 2048-lane tiles + the Morton pixel->lane layout (round-5 sweep,
# tools/layout_bench.py: spheres 37.3 -> 35.1 ms/frame, mesh5k 980 ->
# 894.7 — the tile-uniform cluster pre-test culls better over a compact
# 2048-lane Morton block; 1024 pays per-grid-step overheads). ms/frame
# mono -> chosen: cornell512 5.17 -> 3.10 (K=100), hero 47.3 -> 27.05
# (K=100), prism 4.0 -> 2.33 (K=100), spheres 126.5 -> 78.4 (K=100).
_REGEN = {
    "cornell512": (100, 4096),
    "hero": (100, 4096),
    "prism": (100, 4096),
    "spheres": (100, 2048),
    "mesh": (100, 2048),
    "mesh5k": (100, 2048),
}


def main(config_name: str = "cornell512", tile: int | None = None) -> None:
    import signal

    import numpy as np

    _enable_compile_cache()
    _arm_watchdog()

    from spectral_tpu.render.integrator import accumulate_frame, integrate_frame
    from spectral_tpu.render.pallas_integrator import render_frame_step_pallas
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.flatten import flatten_scene, host_meta

    def _stage(msg: str) -> None:
        # progress breadcrumbs on stderr (stdout stays one JSON line);
        # the tunnel can stall for minutes after an aborted client, and
        # these make the stuck stage visible
        print(f"# bench[{config_name}]: {msg}", file=sys.stderr, flush=True)

    scene, desc = _make_scene(config_name)
    _stage("scene built; flattening (device placement)")
    arrays, config = flatten_scene(scene)
    host = host_meta(arrays)  # no device readback before the first kernel
    obj_types = tuple(host.obj_type.tolist())
    _stage("flattened")
    has_trans = host.has_transmission
    has_emis = host.has_emission
    # many-object configs: Morton-clustered, AABB-culled object loop with
    # 8-wide member unroll (bit-identical to brute force; v5e spheres
    # regen 78.4 -> 37.1 ms/frame, tools/cluster_bench.py +
    # tools/block_tile_bench.py)
    clusters = None
    if config.n_objects > 64:
        from spectral_tpu.ops.pallas.megakernel import plan_clusters

        clusters = plan_clusters(
            host.aabb_min, host.aabb_max,
            obj_types, cluster_size=64,
            camera_pos=host.cam_pos[:3],
        )

    # reference-equivalent ray counts + per-bounce live-lane occupancy,
    # measured via the instrumented jnp path for the SAME frames the timed
    # loop renders (ray survival varies per frame with the RNG seeds and
    # Hammersley jitter)
    @partial(jax.jit, static_argnums=(1,))
    def count(scn, cfg, frame_id):
        _rgb, rays, hist = integrate_frame(
            scn, cfg, frame_id, return_stats=True, return_occupancy=True
        )
        return rays, hist

    # timed path: the VMEM-resident Pallas megakernel, k frames fused per
    # dispatch (lax.scan over frame ids — same estimator; measured on v5e
    # the axon tunnel's per-dispatch latency costs ~0.4 ms/frame at ~5 ms
    # frames, tools/multiframe_bench.py)
    frames_per_dispatch = 10

    @partial(jax.jit, static_argnums=(1, 4, 5, 6, 7, 8), donate_argnums=(2,))
    def step(scn, cfg, accum, first_fid, k, ots, ht, he, tl):
        def body(acc, i):
            return render_frame_step_pallas(
                scn, cfg, acc, first_fid + i, ots, has_transmission=ht,
                has_emission=he, tile=tl,
            ), None

        accum, _ = jax.lax.scan(body, accum, jnp.arange(k, dtype=jnp.uint32))
        return accum

    n_frames = 50
    timed_frames = range(1, n_frames + 1)
    phased = _PHASED.get(config_name)
    overflow_frames = 0
    if phased is not None:
        from spectral_tpu.render.renderer import Renderer, _mono_rgb

        n_lanes0 = config.width * config.height
        renderer = Renderer(
            scene,
            phase_split=phased["split"],
            phase_capacity=n_lanes0 // phased["capacity_frac"],
        )
        renderer.render_frames(1)  # compile the phased step + blend
        # precompile the overflow fallback so a rare overflow mid-timing
        # doesn't pay compilation
        jax.block_until_ready(
            _mono_rgb(
                renderer.scene_arrays, config, jnp.uint32(0),
                renderer.obj_types, renderer.has_transmission,
                renderer.has_emission, False, None,
            )
        )
        jax.block_until_ready(renderer.accum)
        t0 = time.perf_counter()
        renderer.render_frames(n_frames)
        renderer._flush_pending()
        jax.block_until_ready(renderer.accum)
        dt = time.perf_counter() - t0
        overflow_frames = renderer.overflow_frames
    elif config_name in _REGEN:
        from spectral_tpu.render.pallas_integrator import (
            render_frames_step_pallas_regen,
        )

        k, regen_tile = _REGEN[config_name]

        # clustered configs ride the Morton pixel->lane layout (pure
        # relabeling, bit-identical per pixel — tools/layout_bench.py)
        lane_perm = lane_inv = None
        if clusters is not None:
            from spectral_tpu.render.layout import morton_layout

            lane_perm, lane_inv = morton_layout(config.width, config.height)

        @partial(
            jax.jit, static_argnums=(1, 4, 5, 6, 7, 8, 9),
            donate_argnums=(2,),
        )
        def step_regen(scn, cfg, accum, first_fid, kk, ots, ht, he, tl, cl):
            return render_frames_step_pallas_regen(
                scn, cfg, accum, first_fid, ots, kk,
                has_transmission=ht, has_emission=he, tile=tl, clusters=cl,
                lane_perm=lane_perm, lane_inv=lane_inv,
            )

        # single-launch device-time budget: the TPU serving path kills any
        # one kernel launch past ~60s (measured on v5e through the axon
        # relay: mesh5k 512^2 K=100 ~= 80s faults reproducibly; K=25 ~= 22s
        # and 256^2 K=100 ~= 19s run clean), surfacing as "UNAVAILABLE: TPU
        # device error".  Calibrate with a one-frame launch and shrink K so
        # a launch stays well under the deadline; fast configs keep their
        # tuned K untouched.
        launch_budget_s = 15.0
        # K=4, not the minimum K=2: the K=2 mesh5k program reproducibly
        # wedges the axon remote compiler (3/3 hangs at 512^2 on v5e,
        # 2026-08-21) while K>=4 compiles in seconds
        _stage("compiling K=4 calibration step")
        accum = jnp.zeros((config.height, config.width, 4), dtype=jnp.float32)
        accum = step_regen(
            arrays, config, accum, jnp.uint32(0), 4, obj_types, has_trans,
            has_emis, regen_tile, clusters,
        )
        jax.block_until_ready(accum)
        _stage("calibrating (one K=4 launch)")
        t0 = time.perf_counter()
        accum = step_regen(
            arrays, config, accum, jnp.uint32(4), 4, obj_types, has_trans,
            has_emis, regen_tile, clusters,
        )
        jax.block_until_ready(accum)
        s_frame_est = (time.perf_counter() - t0) / 4.0
        if s_frame_est * k > launch_budget_s:
            k = max(1, int(launch_budget_s / s_frame_est))
            print(
                f"# launch budget: K capped to {k} "
                f"({s_frame_est * 1e3:.1f} ms/frame calibration)",
                file=sys.stderr,
            )
        n_frames = k * max(1, -(-n_frames // k))  # >= 50, multiple of k
        timed_frames = range(k, k + n_frames)

        _stage(f"compiling K={k} step")
        accum = jnp.zeros((config.height, config.width, 4), dtype=jnp.float32)
        accum = step_regen(
            arrays, config, accum, jnp.uint32(0), k, obj_types, has_trans,
            has_emis, regen_tile, clusters,
        )  # compile (renders frames 0..k-1, outside the timed window)
        jax.block_until_ready(accum)
        _stage(f"timing {n_frames} frames in launches of {k}")

        t0 = time.perf_counter()
        for base in range(k, k + n_frames, k):
            accum = step_regen(
                arrays, config, accum, jnp.uint32(base), k, obj_types,
                has_trans, has_emis, regen_tile, clusters,
            )
        jax.block_until_ready(accum)
        dt = time.perf_counter() - t0
    else:
        k = frames_per_dispatch
        assert n_frames % k == 0
        timed_frames = range(k, k + n_frames)
        accum = jnp.zeros((config.height, config.width, 4), dtype=jnp.float32)
        accum = step(
            arrays, config, accum, jnp.uint32(0), k, obj_types, has_trans,
            has_emis, tile,
        )  # compile (renders frames 0..k-1, outside the timed window)
        jax.block_until_ready(accum)

        t0 = time.perf_counter()
        for base in range(k, k + n_frames, k):
            accum = step(
                arrays, config, accum, jnp.uint32(base), k, obj_types,
                has_trans, has_emis, tile,
            )
        jax.block_until_ready(accum)
        dt = time.perf_counter() - t0

    # ray accounting runs the instrumented jnp path once per counted frame
    # (seconds per frame on the hero/spheres configs) — sample evenly
    # instead of counting all 100 timed frames; per-frame ray counts vary
    # <1% (only via RNG path survival), so the extrapolation error is well
    # under the run-to-run timing noise
    sample_frames = list(timed_frames)
    # the instrumented jnp path runs the chunked many-object trace — at
    # 6.4k objects one counted frame costs ~a minute of sequential chunk
    # steps, so huge scenes sample 4 frames instead of 12 (per-frame ray
    # counts vary <1%, far under run-to-run timing noise)
    n_count = 4 if config.n_objects > 2000 else 12
    if len(sample_frames) > n_count:
        picks = np.linspace(
            0, len(sample_frames) - 1, n_count
        ).round().astype(int)
        sample_frames = [sample_frames[i] for i in sorted(set(picks.tolist()))]
    total_rays = 0.0
    occupancy = np.zeros((config.max_bounces,), np.float64)
    _stage(f"ray accounting over {len(sample_frames)} frames (jnp path)")
    for f in sample_frames:
        rays, hist = count(arrays, config, jnp.uint32(f))
        total_rays += float(rays)
        occupancy += np.asarray(hist, np.float64)
    rays_per_frame = total_rays / len(sample_frames)
    total_rays = rays_per_frame * n_frames
    # live-lane fraction entering each bounce, averaged over sampled frames
    n_lanes = config.width * config.height
    occ_frac = occupancy / (len(sample_frames) * n_lanes)

    signal.alarm(0)  # measurement done; disarm the watchdog
    total_ray_lambda = total_rays * config.n_samples
    mrays_lambda = total_ray_lambda / dt / 1e6

    # analytic roofline: executed VPU ops per frame (exact for the dense
    # loop; a dense upper bound for clustered configs since cluster skips
    # only remove work) vs the v5e VPU peak — see utils/flops.py
    from spectral_tpu.utils.flops import kernel_ops, roofline

    # clustered configs: MEASURE the visit fractions by exact replay of
    # the kernel's cluster walks (tools/visit_replay.py) on one counted
    # frame — the dense assumption overstates executed member tests by
    # 3-6x on the many-object configs. Tile subsampling keeps this to a
    # few seconds; the replay models the per-frame walk (the regen
    # kernel's realized fractions lie between this and dense).
    visit_fracs = None
    if clusters is not None:
        import os

        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from visit_replay import replay_frame

        # lane budget: the host-numpy replay costs ~lanes x clustered
        # members x bounces x (1 + lights) element-ops; at mesh5k scale the
        # round-4 fixed stride (4) was a multi-HOUR replay. Keep whole
        # production tiles (each tile's walk is independent, so any tile
        # subset is exact for its lanes) and pick the stride so total work
        # stays ~1.5e9 element-ops (a few minutes of numpy).
        _members_cl = sum(
            (s1 - s0) for _t, s0, s1, is_cl in clusters[1] if is_cl
        )
        n_lanes0 = config.width * config.height
        _replay_cost = (
            float(n_lanes0) * _members_cl * config.max_bounces
            * (1 + config.n_lights)
        )
        _tile0 = 4096
        _n_tiles = -(-n_lanes0 // _tile0)
        stride = max(1, min(_n_tiles, int(_replay_cost // 1.5e9) + 1))
        keep = np.arange(0, _n_tiles, stride)
        lane_idx = jnp.asarray(
            (keep[:, None] * _tile0 + np.arange(_tile0)[None, :])
            .ravel().clip(max=n_lanes0 - 1).astype(np.int32)
        )
        _stage(
            f"visit replay: {len(keep)}/{_n_tiles} tiles (stride {stride})"
        )
        rec = jax.device_get(
            jax.jit(
                lambda s, f: jax.tree.map(
                    lambda a: a[:, lane_idx],
                    integrate_frame(s, config, f, return_bounce_rays=True)[1],
                )
            )(arrays, jnp.uint32(sample_frames[0]))
        )  # slice to kept tiles ON DEVICE: the full bounce-ray record is
        #    ~350 MB at 512^2 x 30 bounces and the tunnel D2H is the
        #    bench's slowest link
        vr, dtr, dsh = replay_frame(
            arrays, clusters, rec, (4096,), config.n_lights, tile_stride=1
        )
        visit_fracs = {
            "trace": vr[4096]["trace_exec"] / max(dtr, 1.0),
            "shadow": vr[4096]["shadow_exec"] / max(dsh, 1.0),
            "replay_tiles": f"{len(keep)}/{_n_tiles}",
        }
        _stage("visit replay done")

    ops_kw = dict(
        n_materials=int(np.asarray(arrays.mat_scalars).shape[0]),
        clusters=clusters, has_transmission=has_trans,
        has_emission=has_emis, has_sky=arrays.sky is not None,
        has_texture=arrays.textured_static,
    )
    # upper bound: the full bounce budget every frame (exact for the
    # monolithic kernel; regen/persist skip all-done tile iterations)
    ops = kernel_ops(config, obj_types, **ops_kw)
    rl = roofline(ops.per_frame, dt / n_frames)
    # zero-straggler lower bound for regen: executed iterations/frame =
    # sum of per-bounce live-lane fractions (measured occupancy)
    ops_lo = kernel_ops(
        config, obj_types, bounce_iters=float(occ_frac.sum()), **ops_kw
    )
    rl_lo = roofline(ops_lo.per_frame, dt / n_frames)
    rl_meas = None
    if visit_fracs is not None:
        ops_meas = kernel_ops(
            config, obj_types,
            visited_fraction=visit_fracs["trace"],
            visited_fraction_shadow=visit_fracs["shadow"], **ops_kw
        )
        rl_meas = roofline(ops_meas.per_frame, dt / n_frames)
    print(
        json.dumps(
            {
                "metric": f"{config_name}_throughput",
                "value": round(mrays_lambda, 2),
                "unit": "Mrays/s*lambda",
                "vs_baseline": round(mrays_lambda / BASELINE_MRAYS_LAMBDA, 3),
                "detail": {
                    "config": desc,
                    "rays_per_frame": rays_per_frame,
                    "rays_sampled_frames": len(sample_frames),
                    "seconds_per_frame": dt / n_frames,
                    "est_wall_1000_iters_s": round(dt / n_frames * 1000, 1),
                    "device": str(jax.devices()[0]),
                    "tile": tile or "auto",
                    "phased": phased,
                    "regen": (
                        {"frames_per_launch": k, "tile": regen_tile}
                        if config_name in _REGEN
                        else {"frames_per_launch": None, "tile": None}
                    ),
                    "overflow_frames": overflow_frames,
                    # analytic roofline (utils/flops.py): executed VPU ops
                    # (dense-loop exact; clustered = upper bound) vs the
                    # FMA-fused v5e VPU peak. *_useful scales by the live-
                    # lane fraction: the share of peak doing useful work.
                    "vpu_ops_per_frame": round(ops.per_frame),
                    "vpu_ops_per_s": round(rl["vpu_ops_per_s"]),
                    "pct_vpu_peak": round(rl["pct_vpu_peak"], 2),
                    # == useful-work share of peak too: counting only
                    # live-lane ops gives the same n_lanes*sum(occ) factor
                    "pct_vpu_peak_regen_lower": round(
                        rl_lo["pct_vpu_peak"], 2
                    ),
                    # MEASURED roofline for clustered configs: member
                    # loops scaled by the replayed visit fractions
                    # (tools/visit_replay.py) instead of counted dense
                    "pct_vpu_peak_measured": (
                        round(rl_meas["pct_vpu_peak"], 2)
                        if rl_meas is not None else None
                    ),
                    "visited_frac_trace": (
                        round(visit_fracs["trace"], 4)
                        if visit_fracs is not None else None
                    ),
                    "visited_frac_shadow": (
                        round(visit_fracs["shadow"], 4)
                        if visit_fracs is not None else None
                    ),
                    "visit_replay_tiles": (
                        visit_fracs["replay_tiles"]
                        if visit_fracs is not None else None
                    ),
                    "ops_per_lane_bounce": ops.as_dict(),
                    "roofline_note": (
                        "pct_vpu_peak assumes the full bounce budget every "
                        "frame (upper bound on executed work); _regen_lower "
                        "assumes zero straggler iterations"
                        + (
                            "; clustered member loops counted dense "
                            "(every cluster visited); _measured scales "
                            "them by the replayed per-frame visit "
                            "fractions (regen realized work lies between "
                            "_measured and the dense bound)"
                            if clusters is not None else ""
                        )
                    ),
                    # mean live-lane fraction over the bounce loop: the
                    # megakernel executes every lane every bounce, so this
                    # is the fraction of executed work that is useful
                    "mean_occupancy": round(float(occ_frac.mean()), 4),
                    "occupancy_per_bounce": [
                        round(float(x), 4) for x in occ_frac
                    ],
                },
            }
        )
    )


BASELINE_RMSE = 0.05  # "visually matching" budget vs the reference render


def main_rmse(iterations: int = 1000) -> None:
    """Accuracy line for BASELINE config #1: render the default scene at
    the reference's shipped ``example_image.png`` resolution and report
    pixel RMSE against that artifact (the only render the reference
    publishes; see tools/compare_reference.py for the full analysis —
    measured 0.0159 at 1000 iterations on v5e)."""
    import os
    import signal

    import numpy as np

    ref_png = "/root/reference/example_image.png"
    if not os.path.exists(ref_png):
        print(
            json.dumps(
                {
                    "metric": "default_rmse",
                    "value": 0.0,
                    "unit": "rmse",
                    "vs_baseline": 0.0,
                    "error": f"reference artifact missing: {ref_png}",
                }
            ),
            flush=True,
        )
        return

    _enable_compile_cache()
    _arm_watchdog()
    from PIL import Image

    from spectral_tpu.render import image as image_mod
    from spectral_tpu.render.renderer import Renderer
    from spectral_tpu.scene import presets

    ref_img = np.asarray(
        Image.open(ref_png).convert("RGB"), dtype=np.float32
    ) / 255.0
    scene = presets.default_scene()
    scene.height, scene.width = ref_img.shape[:2]
    scene.nbr_of_iterations = iterations
    t0 = time.perf_counter()
    fb = Renderer(scene).render()
    dt = time.perf_counter() - t0
    ours = image_mod.accum_to_u8(fb)[..., :3].astype(np.float32) / 255.0
    rmse = float(np.sqrt(np.mean((ours - ref_img) ** 2)))
    signal.alarm(0)
    print(
        json.dumps(
            {
                "metric": "default_rmse",
                "value": round(rmse, 5),
                "unit": "rmse",
                # lower is better: >1 means inside the visual-match budget
                "vs_baseline": round(BASELINE_RMSE / max(rmse, 1e-9), 3),
                "detail": {
                    "config": (
                        f"default scene {scene.width}x{scene.height}, "
                        f"{iterations} iterations vs reference "
                        "example_image.png"
                    ),
                    "render_seconds": round(dt, 1),
                },
            }
        ),
        flush=True,
    )


def main_adaptive(config_name: str = "prism", n_frames: int = 1000,
                  minf: int = 32, rtol: float = 0.03,
                  atol: float = 1e-4) -> None:
    """Variance-adaptive quality-target mode (a capability the reference
    lacks): per-pixel stopping on the persist kernel at an rtol standard
    -error tolerance, against the fixed-count persist render at the same
    frame cap. Reports the wall-clock speedup, the per-pixel frame-count
    distribution, and the relative RMSE the early stops introduce."""
    import numpy as np

    _enable_compile_cache()
    _arm_watchdog()
    from spectral_tpu.render.pallas_integrator import render_persistent
    from spectral_tpu.scene.flatten import flatten_scene, host_meta

    scene, desc = _make_scene(config_name)
    arrays, config = flatten_scene(scene)
    host = host_meta(arrays)
    obj_types = tuple(host.obj_type.tolist())
    kw = dict(
        has_transmission=host.has_transmission,
        has_emission=host.has_emission,
        ring_slots=0,
    )
    if config.n_objects > 64:
        from spectral_tpu.ops.pallas.megakernel import plan_clusters

        kw["clusters"] = plan_clusters(
            host.aabb_min, host.aabb_max,
            obj_types, cluster_size=64,
            camera_pos=host.cam_pos[:3],
        )

    rgb_fix, _ = render_persistent(
        arrays, config, obj_types, n_frames=n_frames, **kw)  # compile
    jax.block_until_ready(rgb_fix)
    t0 = time.perf_counter()
    rgb_fix, _ = render_persistent(
        arrays, config, obj_types, n_frames=n_frames, **kw)
    jax.block_until_ready(rgb_fix)
    t_fix = time.perf_counter() - t0

    ad = (minf, rtol, atol)
    rgb_ad, info = render_persistent(
        arrays, config, obj_types, n_frames=n_frames, adaptive=ad, **kw)
    jax.block_until_ready(rgb_ad)
    t0 = time.perf_counter()
    rgb_ad, info = render_persistent(
        arrays, config, obj_types, n_frames=n_frames, adaptive=ad, **kw)
    jax.block_until_ready(rgb_ad)
    t_ad = time.perf_counter() - t0

    fix64 = np.asarray(rgb_fix, np.float64)
    rmse = float(np.sqrt(((np.asarray(rgb_ad, np.float64) - fix64) ** 2).mean()))
    rms_img = float(np.sqrt((fix64 ** 2).mean()))
    print(
        json.dumps(
            {
                "metric": f"{config_name}_adaptive_speedup",
                "value": round(t_fix / t_ad, 3),
                "unit": "x_vs_fixed_persist",
                "vs_baseline": round(t_fix / t_ad, 3),
                "detail": {
                    "config": f"{desc}; adaptive {ad} vs fixed persist, "
                    f"{n_frames}-frame cap",
                    "fixed_seconds": round(t_fix, 3),
                    "adaptive_seconds": round(t_ad, 3),
                    "mean_counts": round(info["mean_counts"], 1),
                    "min_counts": info["min_counts"],
                    "max_counts": info["max_counts"],
                    "compactions": info["compactions"],
                    "launches": info["launches"],
                    "rel_rmse_vs_fixed": round(rmse / max(rms_img, 1e-9), 5),
                },
            }
        ),
        flush=True,
    )


def _run_config(cfg: str, tile) -> bool:
    """Run one config; returns True on success. A timeout or crash in one
    config prints an error JSON line instead of aborting the process, so
    the remaining configs of an ``all`` run still report."""
    try:
        if cfg == "default_rmse":
            main_rmse()
        elif cfg.startswith("adaptive"):
            name = cfg.split(":", 1)[1] if ":" in cfg else "prism"
            main_adaptive(name)
        else:
            main(cfg, tile)
        return True
    except (BenchTimeout, Exception) as e:  # noqa: BLE001 — isolate configs
        print(
            json.dumps(
                {
                    "metric": f"{cfg}_throughput",
                    "value": 0.0,
                    "unit": "Mrays/s*lambda",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}",
                }
            ),
            flush=True,
        )
        return False


if __name__ == "__main__":
    import sys

    _cfg = sys.argv[1] if len(sys.argv) > 1 else "all"
    _tile = int(sys.argv[2]) if len(sys.argv) > 2 else None
    if _cfg == "all":
        # one JSON line per BASELINE config, driver-capturable in one run;
        # the headline cornell512 config prints LAST (the driver's tail)
        _ok = True
        for _c in (
            "default_rmse", "hero", "prism", "spheres", "mesh5k",
            "adaptive:prism", "cornell512",
        ):
            _ok = _run_config(_c, None) and _ok
        raise SystemExit(0 if _ok else 2)
    raise SystemExit(0 if _run_config(_cfg, _tile) else 2)
