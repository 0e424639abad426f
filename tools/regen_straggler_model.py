"""Decompose the regeneration kernel's gap to its occupancy floor.

A K-frame regen launch retires a tile when its SLOWEST lane finishes K
paths, so the realized ms/frame is

    floor x E[max over lanes of sum_K(path_len)] / (K x mean_path_len)

where floor = mono ms/frame x mean_occupancy. Per-pixel per-frame path
cost is ~90% stochastic (frame-pair corr 0.097, PARITY.md), so we model
a lane's K-frame total by bootstrap: sample K per-frame cost planes from
measured probe frames (probe_path_cost, the kernel's own bl counter)
with independent per-frame shuffles of which plane is drawn, keeping the
PIXEL fixed (preserving the small systematic component), and take the
per-tile max of lane sums.

If predicted ms/frame ~= measured ms/frame, regeneration sits at its
straggler-bound floor and only per-lane work reassignment (not offered
by the VPU model) could close the rest; a large residual would instead
point at fixed per-iteration overhead worth hunting.

    python tools/regen_straggler_model.py [spheres|cornell512] [--k 100]
        [--tile 4096] [--frames 16]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="spheres",
                   choices=["spheres", "cornell512"])
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--tile", type=int, default=4096)
    p.add_argument("--frames", type=int, default=16,
                   help="measured probe frames to bootstrap from")
    p.add_argument("--boot", type=int, default=200,
                   help="bootstrap replicates of the K-frame launch")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spectral_tpu.render.pallas_integrator import probe_path_cost
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.flatten import flatten_scene

    if args.config == "spheres":
        scene = presets.sphere_field(n_spheres=1000)
    else:
        scene = presets.cornell_box()
        scene.width = scene.height = 512
        scene.nbr_of_ray_bounces = 30
    scene.nbr_of_iterations = max(scene.nbr_of_iterations, args.frames)
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())

    # [frames, n_pixels] realized per-path bounce counts
    costs = np.stack([
        np.asarray(
            probe_path_cost(
                arrays, config, obj_types, n_probe_frames=1,
                first_frame_id=f,
            )
        )
        for f in range(args.frames)
    ])
    n = costs.shape[1]
    mean_path = float(costs.mean())
    print(f"{args.config}: {args.frames} probe frames, {n} pixels, "
          f"mean path {mean_path:.3f} bounces, "
          f"per-frame std {costs.std():.3f}")

    n_pad = -(-n // args.tile) * args.tile
    pad = np.full((costs.shape[0], n_pad - n), 1.0, costs.dtype)
    costs = np.concatenate([costs, pad], axis=1)
    tiles = costs.reshape(args.frames, -1, args.tile)  # [F, T, tile]
    n_tiles = tiles.shape[1]

    # variance decomposition: systematic (between-pixel means) vs
    # per-frame stochastic (within-pixel) — F-frame means carry noise
    # var/F, subtract it for an unbiased between-pixel term
    pix_mean = costs.mean(axis=0)
    within = float(costs.var(axis=0).mean())
    between = max(float(pix_mean.var()) - within / args.frames, 0.0)
    print(f"variance decomposition: between-pixel {between:.3f} "
          f"(std {between ** 0.5:.3f}), within-pixel per-frame {within:.3f} "
          f"(std {within ** 0.5:.3f})")

    rng = np.random.default_rng(0)

    def overhead(order=None, eval_frames=None):
        """Bootstrap E[sum-of-tile-maxes]/ideal for a pixel->lane order.

        Per replicate, draw K frame indices (a frame is one coherent draw
        — the screen-wide jitter correlates all pixels), sum per lane,
        take per-tile max; tiles run back-to-back on one core, so the
        launch executes the sum of tile maxes. ``eval_frames`` restricts
        the draw to a holdout so a rank derived from the OTHER frames is
        scored out-of-sample.
        """
        t = tiles if order is None else costs[:, order].reshape(
            args.frames, -1, args.tile
        )
        pool = np.arange(args.frames) if eval_frames is None else eval_frames
        out = np.empty(args.boot)
        for b in range(args.boot):
            pick = pool[rng.integers(0, len(pool), size=args.k)]
            lane_tot = t[pick].sum(axis=0)
            out[b] = lane_tot.max(axis=1).sum()
        return out / (n_tiles * args.k * mean_path)

    pad_order = np.arange(costs.shape[1])
    o_row = overhead()
    # ideal sort: rank by the 16-frame mean (the best static estimate)
    srt = pad_order.copy()
    srt[:n] = np.argsort(-pix_mean[:n], kind="stable")
    o_sort = overhead(srt)
    # realistic sort: rank by a 2-frame probe (what the renderer does)
    probe2 = costs[:2, :n].sum(axis=0)
    srt2 = pad_order.copy()
    srt2[:n] = np.argsort(-probe2, kind="stable")
    o_probe = overhead(srt2)
    shuf = pad_order.copy()
    rng.shuffle(shuf[:n])
    o_rand = overhead(shuf)
    # out-of-sample: rank on the first half, score on the second half
    half = args.frames // 2
    srt_h = pad_order.copy()
    srt_h[:n] = np.argsort(-costs[:half, :n].mean(axis=0), kind="stable")
    o_hold = overhead(srt_h, eval_frames=np.arange(half, args.frames))
    o_row_hold = overhead(None, eval_frames=np.arange(half, args.frames))
    for name, o in (("row-major", o_row), ("sorted (true mean)", o_sort),
                    ("sorted (2-frame probe)", o_probe),
                    ("random shuffle", o_rand),
                    (f"sorted ({half}-frame probe, holdout eval)", o_hold),
                    ("row-major (holdout eval)", o_row_hold)):
        print(f"K={args.k} tile={args.tile} {name}: straggler overhead "
              f"{o.mean():.3f}x (p5 {np.percentile(o, 5):.3f}, "
              f"p95 {np.percentile(o, 95):.3f})")
    print("multiply the occupancy floor (mono ms/frame x mean_occupancy) "
          "by these factors for straggler-bound regen predictions")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
