"""Measure persistent lane-asynchronous regeneration vs fixed-window regen.

Fixed-window regeneration (K frames per launch) makes each 4096-lane tile
run until its SLOWEST lane finishes all K frames — a measured 1.79x
straggler factor on the spheres config that no static pixel->lane
permutation can remove (PARITY.md). The persistent kernel carries lane
state across launches so every lane advances through its own frame
stream; this tool measures whether that recovers the straggler gap on
real v5e hardware.

Usage: python tools/persist_bench.py [configs...] [--frames=N]
           [--ring=W] [--fpl=N] [--budget=B] [--no-regen]
Configs default to cornell512; "all" = cornell512 hero prism spheres.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(name: str, n_frames: int, ring: int | None,
                 fpl: int | None, budget: int | None,
                 with_regen: bool = True, sort: int = 0) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _make_scene
    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.pallas_integrator import (
        render_frames_step_pallas_regen,
        render_persistent,
    )
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

    kw = dict(
        has_transmission=ht, has_emission=he, clusters=clusters,
        ring_slots=ring, budget=budget, frames_per_launch=fpl,
    )
    if sort:
        # probe + argsort OUTSIDE the timed loop (a Renderer computes it
        # once per scene, so renders shouldn't be charged per call)
        from spectral_tpu.render.pallas_integrator import probe_path_cost

        cost = np.asarray(probe_path_cost(
            arrays, config, obj_types, n_probe_frames=sort,
            has_transmission=ht, has_emission=he, clusters=clusters,
        ))
        order = np.argsort(-cost, kind="stable").astype(np.int32)
        kw["lane_perm"] = jnp.asarray(order)
        kw["lane_inv"] = jnp.asarray(np.argsort(order).astype(np.int32))

    # warmup (compile), then timed full renders
    rgb, info = render_persistent(
        arrays, config, obj_types, n_frames=min(8, n_frames), **kw)
    jax.block_until_ready(rgb)
    print(f"[{name}] persist compiled: budget={info['budget']} "
          f"ring={info['ring_slots']} tile={info['tile']}", flush=True)

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        rgb, info = render_persistent(
            arrays, config, obj_types, n_frames=n_frames, **kw)
        jax.block_until_ready(rgb)
        dt = (time.perf_counter() - t0) / n_frames
        best = dt if best is None else min(best, dt)
    print(f"[{name}] PERSIST {best * 1e3:.2f} ms/frame "
          f"({info['launches']} launches, budget={info['budget']}, "
          f"ring={info['ring_slots']}, tile={info['tile']}, "
          f"sort={sort})", flush=True)

    if not with_regen:
        return
    # fixed-window regen reference, K=100 tile 4096 (bench defaults)
    k = 100

    @partial(jax.jit, static_argnums=(1, 4, 5, 6, 7, 8, 9),
             donate_argnums=(2,))
    def step(scn, cfg, accum, first_fid, kk, ots, t, e, tl, cl):
        return render_frames_step_pallas_regen(
            scn, cfg, accum, first_fid, ots, kk,
            has_transmission=t, has_emission=e, tile=tl, clusters=cl,
        )

    accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
    accum = step(arrays, config, accum, jnp.uint32(0), k, obj_types, ht, he,
                 4096, clusters)
    jax.block_until_ready(accum)
    n_launch = max(1, n_frames // k)
    best_r = None
    for _ in range(2):
        accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
        t0 = time.perf_counter()
        for i in range(n_launch):
            accum = step(arrays, config, accum, jnp.uint32(i * k), k,
                         obj_types, ht, he, 4096, clusters)
        jax.block_until_ready(accum)
        dt = (time.perf_counter() - t0) / (n_launch * k)
        best_r = dt if best_r is None else min(best_r, dt)
    print(f"[{name}] REGEN-K100 {best_r * 1e3:.2f} ms/frame -> persist "
          f"speedup {best_r / best:.2f}x", flush=True)


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    names = [a for a in args if not a.startswith("--")] or ["cornell512"]
    if names == ["all"]:
        names = ["cornell512", "hero", "prism", "spheres"]

    def flag(key, default, cast=int):
        for a in args:
            if a.startswith(f"--{key}="):
                return cast(a.split("=", 1)[1])
        return default

    frames = flag("frames", 200)
    ring = flag("ring", None)
    fpl = flag("fpl", None)
    budget = flag("budget", None)
    sort = flag("sort", 0)
    with_regen = "--no-regen" not in args

    import jax

    cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for name in names:
        bench_config(name, frames, ring, fpl, budget, with_regen, sort)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
