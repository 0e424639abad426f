"""Floor probe: what would PERFECT cluster culling cost? (v5e)

Replaces the runtime cluster-bounds table with degenerate (inverted)
boxes so the in-kernel slab pre-test skips EVERY cluster: the kernel
executes zero member loops but pays all per-cluster overhead (slab test
+ any-relevant reduce + cond). The image is wrong (all rays miss) — this
is a timing probe only. The gap between this floor and the real
clustered time is member-loop work; the gap between the floor and a
zero-cluster kernel is pure per-cluster overhead.

    python tools/cluster_floor_probe.py [spheres] [--k 100] [--size 32]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name: str, k: int, size: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _make_scene
    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.pallas_integrator import (
        integrate_frames_pallas_regen,
    )
    from spectral_tpu.scene.flatten import flatten_scene

    scene, _ = _make_scene(name)
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    ht = bool(np.asarray(arrays.transmission).any())
    he = bool(np.asarray(arrays.emission).any())
    clusters = mk.plan_clusters(
        np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max),
        obj_types, cluster_size=size,
    )

    @partial(jax.jit, static_argnums=(1, 3, 4, 5, 6))
    def launch(scn, cfg, fid, kk, ots, t, e):
        return integrate_frames_pallas_regen(
            scn, cfg, fid, ots, kk, tile=4096,
            has_transmission=t, has_emission=e, clusters=clusters,
        )

    def run(scn, label):
        out = launch(scn, config, jnp.uint32(0), k, obj_types, ht, he)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(2):
            out = launch(
                scn, config, jnp.uint32((i + 1) * k), k, obj_types, ht, he
            )
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / (2 * k) * 1e3
        print(f"{name}: {label}: {ms:.2f} ms/frame", flush=True)
        return ms

    real = run(arrays, f"real bounds      C={size} regen(K={k})")
    # degenerate world AABBs: min=+1e30, max=-1e30 -> every cluster slab
    # test misses -> every member loop skipped (pure-overhead floor).
    # pack_cluster_bounds unions the per-object aabbs, so degenerate
    # per-object aabbs produce degenerate cluster rows. aabb_* feed ONLY
    # the cluster table (intersection math reads slab/center columns), so
    # the kernel's per-member work is unchanged when it does run.
    import dataclasses

    degen = dataclasses.replace(
        arrays,
        aabb_min=jnp.full_like(arrays.aabb_min, 1e30),
        aabb_max=jnp.full_like(arrays.aabb_max, -1e30),
    )
    floor = run(degen, f"skip-all bounds  C={size} regen(K={k})")
    print(
        f"{name}: member-loop work {real - floor:.2f} ms/frame; "
        f"overhead floor {floor:.2f}",
        flush=True,
    )


def main(argv=None) -> int:
    args = list(argv if argv is not None else sys.argv[1:])
    k, size = 100, 32
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--k":
            k = int(args[i + 1]); i += 2
        elif args[i] == "--size":
            size = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    names = names or ["spheres"]

    import jax

    cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for n in names:
        bench(n, k, size)
    return 0


if __name__ == "__main__":
    sys.exit(main())
