"""Measure cost-sorted pixel->lane assignment for the regeneration kernel.

The regeneration kernel's straggler gap (PARITY.md): a tile runs until its
slowest lane finishes all K paths, and per-PIXEL expected path length is
heterogeneous, so a tile's wall time is set by its most expensive pixel.
Host-side fix measured here: probe each pixel's realized path length
(``probe_path_cost``, the megakernel's cost instrumentation), sort pixels
by descending cost, and assign them to wavefront lanes in that order —
expensive pixels share tiles, cheap tiles retire early. Bit-exact per
pixel (tile membership does not enter any lane's arithmetic).

    python tools/lane_sort_bench.py cornell512 [hero prism spheres ...]

Prints ms/frame unsorted vs sorted per config, plus a bit-exactness check
of one launch.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(name: str, k: int = 100, tile: int = 4096,
                 n_launches: int = 3, probe_frames: int = 2,
                 use_clusters: bool = False) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _make_scene
    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.pallas_integrator import (
        probe_path_cost,
        render_frames_step_pallas_regen,
    )
    from spectral_tpu.scene.flatten import flatten_scene

    scene, _desc = _make_scene(name)
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    ht = bool(np.asarray(arrays.transmission).any())
    he = bool(np.asarray(arrays.emission).any())
    n = config.width * config.height
    clusters = None
    if use_clusters:
        sigma, runs = mk.plan_clusters(
            np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max),
            obj_types, cluster_size=64,
            camera_pos=np.asarray(arrays.cam_pos[:3]),
        )
        clusters = (sigma, runs)

    @partial(jax.jit, static_argnums=(1, 4, 5, 6, 7, 8, 9),
             donate_argnums=(2,))
    def step(scn, cfg, accum, first_fid, kk, ots, t, e, tl, cl):
        return render_frames_step_pallas_regen(
            scn, cfg, accum, first_fid, ots, kk,
            has_transmission=t, has_emission=e, tile=tl, clusters=cl,
        )

    @partial(jax.jit, static_argnums=(1, 4, 5, 6, 7, 8, 9),
             donate_argnums=(2,))
    def step_sorted(scn, cfg, accum, first_fid, kk, ots, t, e, tl, cl,
                    perm, inv):
        return render_frames_step_pallas_regen(
            scn, cfg, accum, first_fid, ots, kk,
            has_transmission=t, has_emission=e, tile=tl,
            lane_perm=perm, lane_inv=inv, clusters=cl,
        )

    # probe + permutation
    t0 = time.perf_counter()
    cost = np.asarray(
        probe_path_cost(
            arrays, config, obj_types, n_probe_frames=probe_frames,
            has_transmission=ht, has_emission=he, clusters=clusters,
        )
    )
    jax.block_until_ready(cost)
    t_probe = time.perf_counter() - t0
    order = np.argsort(-cost, kind="stable").astype(np.int32)
    perm = jnp.asarray(order)
    inv = jnp.asarray(np.argsort(order).astype(np.int32))

    def run(sorted_: bool):
        accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
        args = (arrays, config, accum, jnp.uint32(0), k, obj_types, ht, he,
                tile, clusters)
        if sorted_:
            accum = step_sorted(*args, perm, inv)
        else:
            accum = step(*args)
        jax.block_until_ready(accum)  # compile + warm launch
        first = np.asarray(accum)
        t0 = time.perf_counter()
        for i in range(n_launches):
            if sorted_:
                accum = step_sorted(
                    arrays, config, accum, jnp.uint32((i + 1) * k), k,
                    obj_types, ht, he, tile, clusters, perm, inv,
                )
            else:
                accum = step(
                    arrays, config, accum, jnp.uint32((i + 1) * k), k,
                    obj_types, ht, he, tile, clusters,
                )
        jax.block_until_ready(accum)
        dt = time.perf_counter() - t0
        return dt / (n_launches * k) * 1e3, first

    ms_plain, first_plain = run(False)
    ms_sorted, first_sorted = run(True)
    exact = bool(np.array_equal(first_plain, first_sorted))
    print(
        f"{name}: unsorted {ms_plain:.3f} ms/frame, sorted "
        f"{ms_sorted:.3f} ms/frame ({ms_plain / ms_sorted:.3f}x), "
        f"probe {t_probe * 1e3:.0f} ms ({probe_frames} frames), "
        f"K={k} tile={tile}, bit-exact={exact}, "
        f"cost[min/mean/max]={cost.min():.0f}/{cost.mean():.1f}/{cost.max():.0f}",
        flush=True,
    )


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    names = [a for a in args if not a.startswith("--")] or ["cornell512"]

    def flag(key, default, cast=int):
        for a in args:
            if a.startswith(f"--{key}="):
                return cast(a.split("=", 1)[1])
        return default

    probe = flag("probe", 2)
    k = flag("k", 100)
    tile = flag("tile", 4096)
    use_clusters = "--clusters" in args
    import jax

    cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for name in names:
        bench_config(name, k=k, tile=tile, probe_frames=probe,
                     use_clusters=use_clusters)
    return 0


if __name__ == "__main__":
    sys.exit(main())
