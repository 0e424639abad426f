"""Measure the sqrt-free shadow-occlusion predicate on v5e.

The many-object NEE shadow loop is 51% of the 1000-sphere frame
(PARITY.md many-object ledger). Occlusion needs no root values — only
"does a root lie in (0, maxd]" — so ``shadow_interval=True`` replaces
each sphere's sqrt + two root multiplies + root select with sign tests
on f(maxd) and the parabola vertex (derivation on
``build_megakernel``). This tool times the production spheres
configuration (clustered fori loop, in-kernel regeneration) with the
predicate off vs on, and reports the image divergence (the predicate is
not bit-identical: lanes whose occluder sits within rounding of exactly
t=0 or t=maxd can flip — Monte Carlo noise dwarfs it).

    python tools/shadow_interval_bench.py [spheres] [--k 100]
        [--tile 4096] [--cluster 64] [--launches 2]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name: str, k: int, tile: int, cluster: int,
          n_launches: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _make_scene
    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.pallas_integrator import (
        render_frames_step_pallas_regen,
    )
    from spectral_tpu.scene.flatten import flatten_scene

    scene, _ = _make_scene(name)
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    ht = bool(np.asarray(arrays.transmission).any())
    he = bool(np.asarray(arrays.emission).any())
    clusters = None
    if cluster and config.n_objects > cluster:
        sigma, runs = mk.plan_clusters(
            np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max),
            obj_types, cluster_size=cluster,
            camera_pos=np.asarray(
                [arrays.cam_pos[0], arrays.cam_pos[1], arrays.cam_pos[2]]
            ),
        )
        clusters = (sigma, runs)

    @partial(
        jax.jit, static_argnums=(1, 4, 5, 6, 7, 8, 9, 10),
        donate_argnums=(2,),
    )
    def regen(scn, cfg, accum, fid, kk, ots, t, e, tl, cl, interval):
        return render_frames_step_pallas_regen(
            scn, cfg, accum, fid, ots, kk, has_transmission=t,
            has_emission=e, tile=tl, clusters=cl, shadow_interval=interval,
        )

    def run(interval: bool):
        accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
        accum = regen(
            arrays, config, accum, jnp.uint32(0), k, obj_types, ht, he,
            tile, clusters, interval,
        )
        jax.block_until_ready(accum)
        first = np.asarray(accum)
        t0 = time.perf_counter()
        for i in range(n_launches):
            accum = regen(
                arrays, config, accum, jnp.uint32((i + 1) * k), k,
                obj_types, ht, he, tile, clusters, interval,
            )
        jax.block_until_ready(accum)
        ms = (time.perf_counter() - t0) / (n_launches * k) * 1e3
        return ms, first

    ms_base, img_base = run(False)
    print(f"{name}: root-test shadow  {ms_base:.2f} ms/frame", flush=True)
    ms_int, img_int = run(True)
    diff = np.abs(img_base - img_int)
    frac = float((diff.max(axis=-1) > 0).mean())
    print(
        f"{name}: interval shadow   {ms_int:.2f} ms/frame "
        f"({ms_base / ms_int:.3f}x) | first-launch image: "
        f"max|d|={float(diff.max()):.3e}, {frac * 100:.4f}% pixels differ",
        flush=True,
    )


def main(argv=None) -> int:
    args = list(argv if argv is not None else sys.argv[1:])
    k, tile, cluster, launches = 100, 4096, 64, 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--k":
            k = int(args[i + 1]); i += 2
        elif args[i] == "--tile":
            tile = int(args[i + 1]); i += 2
        elif args[i] == "--cluster":
            cluster = int(args[i + 1]); i += 2
        elif args[i] == "--launches":
            launches = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    for name in names or ["spheres"]:
        bench(name, k, tile, cluster, launches)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
