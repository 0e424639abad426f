"""Measure variance-adaptive per-pixel stopping on the persist kernel.

Adaptive stopping (a capability the reference lacks — its iteration count
is fixed up front, reference src/main.rs render loop) lets each pixel
render only until the standard error of its per-frame luminance mean is
under ``rtol * |mean| + atol``, with ``n_frames`` as the cap. The win is
scene-dependent: pixels that converge fast (direct-lit walls) stop early
while caustic/penumbra pixels spend the full budget. This tool measures,
on real hardware:

* wall-clock per RENDER (not per frame — frames/pixel now varies),
* the per-pixel frame-count distribution (min/mean/max),
* RMSE of the adaptive image vs a fixed-count persist render at the cap
  (quality check: adaptive must trade provably little error).

Usage: python tools/adaptive_bench.py [configs...] [--frames=N]
           [--min=M] [--rtol=R] [--atol=A] [--budget=B]
Configs default to cornell512; "all" = cornell512 hero prism spheres.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(name: str, n_frames: int, minf: int, rtol: float,
                 atol: float, budget: int | None,
                 truth_frames: int = 0) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _make_scene
    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.pallas_integrator import render_persistent
    from spectral_tpu.scene.flatten import flatten_scene

    scene, _ = _make_scene(name)
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    ht = bool(np.asarray(arrays.transmission).any())
    he = bool(np.asarray(arrays.emission).any())
    clusters = None
    if config.n_objects > 64:
        clusters = mk.plan_clusters(
            np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max),
            obj_types, cluster_size=64,
            camera_pos=np.asarray(arrays.cam_pos)[:3],
        )
    kw = dict(has_transmission=ht, has_emission=he, clusters=clusters,
              ring_slots=0, budget=budget)

    # fixed-count reference at the cap (also the warmup for shared shapes)
    rgb_fix, info = render_persistent(
        arrays, config, obj_types, n_frames=n_frames, **kw)
    jax.block_until_ready(rgb_fix)
    t0 = time.perf_counter()
    rgb_fix, info = render_persistent(
        arrays, config, obj_types, n_frames=n_frames, **kw)
    jax.block_until_ready(rgb_fix)
    t_fix = time.perf_counter() - t0
    print(f"[{name}] FIXED   {t_fix * 1e3:8.1f} ms/render "
          f"({n_frames} frames/pixel, budget={info['budget']}, "
          f"tile={info['tile']})", flush=True)

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
    err = np.asarray(rgb_ad, np.float64) - fix64
    rmse = float(np.sqrt((err ** 2).mean()))
    rms_img = float(np.sqrt((fix64 ** 2).mean()))
    print(f"[{name}] ADAPTIVE{t_ad * 1e3:8.1f} ms/render "
          f"(counts min={info['min_counts']} "
          f"mean={info['mean_counts']:.1f} max={info['max_counts']}, "
          f"{info['launches']} launches) -> {t_fix / t_ad:.2f}x, "
          f"RMSE vs fixed {rmse:.2e} ({100 * rmse / rms_img:.2f}% of "
          f"image RMS {rms_img:.3f}, max px {fix64.max():.1f})", flush=True)

    if truth_frames:
        # equal-quality framing: both estimators against a much longer
        # fixed render — adaptive wins if it reaches the FIXED render's
        # error in less time (the per-pixel tolerance spends samples only
        # where the image still needs them)
        rgb_truth, _ = render_persistent(
            arrays, config, obj_types, n_frames=truth_frames, **kw)
        truth = np.asarray(rgb_truth, np.float64)

        def rmse_vs_truth(img):
            return float(np.sqrt(((np.asarray(img, np.float64) - truth) ** 2).mean()))

        print(f"[{name}] vs TRUTH({truth_frames}f): fixed({n_frames}f) "
              f"rmse {rmse_vs_truth(rgb_fix):.3e} in {t_fix * 1e3:.0f} ms; "
              f"adaptive rmse {rmse_vs_truth(rgb_ad):.3e} in "
              f"{t_ad * 1e3:.0f} ms", flush=True)


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    names = [a for a in args if not a.startswith("--")] or ["cornell512"]
    if names == ["all"]:
        names = ["cornell512", "hero", "prism", "spheres"]

    def flag(key, default, cast):
        for a in args:
            if a.startswith(f"--{key}="):
                return cast(a.split("=", 1)[1])
        return default

    frames = flag("frames", 1000, int)
    minf = flag("min", 16, int)
    rtol = flag("rtol", 0.02, float)
    atol = flag("atol", 1e-4, float)
    budget = flag("budget", None, int)
    truth = flag("truth", 0, int)
    for n in names:
        bench_config(n, frames, minf, rtol, atol, budget, truth_frames=truth)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
