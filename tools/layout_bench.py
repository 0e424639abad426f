#!/usr/bin/env python
"""A/B the pixel->lane layout on the clustered many-object configs (TPU).

Times the regen megakernel on the spheres/mesh configs with
(a) row-major lanes (current default) and (b) Morton 64x64-block lanes
(``render.layout.morton_layout``) — same compiled kernel, only the
px/py/direction input planes change, so the A/B needs no recompile and
per-pixel results are bit-identical.

Usage: python tools/layout_bench.py [spheres|mesh] [K] [frames]
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def main(config_name: str = "spheres", k: int = 100, n_frames: int = 200,
         tile: int = 4096, cluster_size: int = 64):
    sys.path.insert(0, "/root/repo")
    import bench
    from spectral_tpu.ops.pallas.megakernel import plan_clusters
    from spectral_tpu.render.layout import morton_layout
    from spectral_tpu.render.pallas_integrator import (
        render_frames_step_pallas_regen,
    )
    from spectral_tpu.scene.flatten import flatten_scene, host_meta

    bench._enable_compile_cache()
    scene, desc = bench._make_scene(config_name)
    arrays, config = flatten_scene(scene)
    host = host_meta(arrays)
    obj_types = tuple(host.obj_type.tolist())
    has_trans = host.has_transmission
    has_emis = host.has_emission
    clusters = None
    if config.n_objects > 64:
        clusters = plan_clusters(
            host.aabb_min, host.aabb_max,
            obj_types, cluster_size=cluster_size,
            camera_pos=host.cam_pos[:3],
        )

    @partial(jax.jit, static_argnums=(1, 4, 5, 6, 7), donate_argnums=(2,))
    def step(scn, cfg, accum, first_fid, kk, ots, ht, he, perm, inv):
        return render_frames_step_pallas_regen(
            scn, cfg, accum, first_fid, ots, kk,
            has_transmission=ht, has_emission=he, tile=tile,
            lane_perm=perm, lane_inv=inv, clusters=clusters,
        )

    perm, inv = morton_layout(config.width, config.height)
    results = {}
    images = {}
    for name, (p, iv) in (
        ("rowmajor", (None, None)),
        ("morton", (perm, inv)),
    ):
        accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
        accum = step(
            arrays, config, accum, jnp.uint32(0), k, obj_types,
            has_trans, has_emis, p, iv,
        )
        jax.block_until_ready(accum)
        t0 = time.perf_counter()
        for base in range(k, k + n_frames, k):
            accum = step(
                arrays, config, accum, jnp.uint32(base), k, obj_types,
                has_trans, has_emis, p, iv,
            )
        jax.block_until_ready(accum)
        dt = time.perf_counter() - t0
        results[name] = dt / n_frames * 1e3
        images[name] = np.asarray(accum)
        print(f"{name}: {results[name]:.2f} ms/frame", flush=True)

    bit_equal = bool(
        np.array_equal(images["rowmajor"], images["morton"])
    )
    print(json.dumps({
        "config": config_name,
        "desc": desc,
        "k": k,
        "tile": tile,
        "cluster_size": cluster_size,
        "frames": n_frames,
        "ms_per_frame": {m: round(v, 3) for m, v in results.items()},
        "speedup_morton": round(
            results["rowmajor"] / results["morton"], 3
        ),
        "bit_identical": bit_equal,
    }))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0] if a else "spheres",
        int(a[1]) if len(a) > 1 else 100,
        int(a[2]) if len(a) > 2 else 200,
        int(a[3]) if len(a) > 3 else 4096,
        int(a[4]) if len(a) > 4 else 64,
    )
