"""Measure cluster-culled many-object tracing on v5e.

The 1000-sphere config's object loop is brute force: every lane tests
every object every bounce (~28 ops each). The clustered loop Morton-sorts
objects, chunks them into clusters, and skips a whole cluster when no
live lane's ray enters its union AABB nearer than its current best hit
(tile-uniform ``lax.cond``). Primary bounces are ray-coherent per tile,
so most clusters miss; deep bounces are incoherent and pay only the
pre-test. NEE shadow rays cull the same way (cluster entry beyond the
light distance also skips). Result-identical to the brute-force loop
(original-index tie rule carried in the geometry table).

    python tools/cluster_bench.py [spheres] [--sizes 16,32,64] [--k 100]
        [--camera] [--tile 4096]

``--camera`` orders the clusters front-to-back from the camera (near
clusters tighten t_best early, so the relevance pre-test skips far
clusters outright); ``--tile`` sets the regeneration tile size (smaller
tiles bundle tighter ray frusta -> more cluster skips, but pay more
fixed per-tile overhead).

Prints ms/frame for mono and regeneration, unclustered vs clustered.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name: str, sizes, k: int, n_mono_frames: int = 6,
          n_regen_launches: int = 2, camera: bool = False,
          tile: int = 4096) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _make_scene
    from spectral_tpu.ops.pallas import megakernel as mk
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas,
        render_frames_step_pallas_regen,
    )
    from spectral_tpu.scene.flatten import flatten_scene

    scene, _ = _make_scene(name)
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    ht = bool(np.asarray(arrays.transmission).any())
    he = bool(np.asarray(arrays.emission).any())

    @partial(jax.jit, static_argnums=(1, 3, 4, 5, 6))
    def mono(scn, cfg, fid, ots, t, e, clusters):
        return integrate_frame_pallas(
            scn, cfg, fid, ots, has_transmission=t, has_emission=e,
            clusters=clusters,
        )

    @partial(jax.jit, static_argnums=(1, 4, 5, 6, 7, 8, 9), donate_argnums=(2,))
    def regen(scn, cfg, accum, fid, kk, ots, t, e, tl, clusters):
        return render_frames_step_pallas_regen(
            scn, cfg, accum, fid, ots, kk,
            has_transmission=t, has_emission=e, tile=tl, clusters=clusters,
        )

    def time_mono(clusters):
        out = mono(arrays, config, jnp.uint32(0), obj_types, ht, he, clusters)
        jax.block_until_ready(out)
        ref = np.asarray(out)
        t0 = time.perf_counter()
        for f in range(1, n_mono_frames + 1):
            out = mono(
                arrays, config, jnp.uint32(f), obj_types, ht, he, clusters
            )
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n_mono_frames * 1e3, ref

    def time_regen(clusters):
        accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
        accum = regen(
            arrays, config, accum, jnp.uint32(0), k, obj_types, ht, he,
            tile, clusters,
        )
        jax.block_until_ready(accum)
        first = np.asarray(accum)
        t0 = time.perf_counter()
        for i in range(n_regen_launches):
            accum = regen(
                arrays, config, accum, jnp.uint32((i + 1) * k), k, obj_types,
                ht, he, tile, clusters,
            )
        jax.block_until_ready(accum)
        return (time.perf_counter() - t0) / (n_regen_launches * k) * 1e3, first

    ms_mono, ref_mono = time_mono(None)
    ms_regen, ref_regen = time_regen(None)
    print(
        f"{name}: unclustered mono {ms_mono:.2f} ms/frame, "
        f"regen(K={k}) {ms_regen:.2f} ms/frame",
        flush=True,
    )
    for c in sizes:
        sigma, runs = mk.plan_clusters(
            np.asarray(arrays.aabb_min), np.asarray(arrays.aabb_max),
            obj_types, cluster_size=c,
            camera_pos=np.asarray(
                [arrays.cam_pos[0], arrays.cam_pos[1], arrays.cam_pos[2]]
            ) if camera else None,
        )
        clusters = (sigma, runs)
        cm, got_m = time_mono(clusters)
        cr, got_r = time_regen(clusters)
        print(
            f"{name}: C={c:3d} ({len(runs)} runs) mono {cm:.2f} ms/frame "
            f"({ms_mono / cm:.2f}x, exact={np.array_equal(ref_mono, got_m)}), "
            f"regen {cr:.2f} ms/frame ({ms_regen / cr:.2f}x, "
            f"exact={np.array_equal(ref_regen, got_r)})",
            flush=True,
        )


def main(argv=None) -> int:
    args = list(argv if argv is not None else sys.argv[1:])
    sizes = [16, 32, 64]
    k = 100
    tile = 4096
    camera = False
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sizes":
            sizes = [int(s) for s in args[i + 1].split(",")]
            i += 2
        elif args[i] == "--k":
            k = int(args[i + 1])
            i += 2
        elif args[i] == "--tile":
            tile = int(args[i + 1])
            i += 2
        elif args[i] == "--camera":
            camera = True
            i += 1
        else:
            names.append(args[i])
            i += 1
    names = names or ["spheres"]

    import jax

    cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for n in names:
        bench(n, sizes, k, camera=camera, tile=tile)
    return 0


if __name__ == "__main__":
    sys.exit(main())
