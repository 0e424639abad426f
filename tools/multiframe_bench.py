"""Does fusing k progressive frames into one dispatch (lax.scan over
frame ids) beat one dispatch per frame? The axon TPU tunnel adds
per-dispatch latency that async enqueue may not fully hide at ~5 ms
frames. Prints one JSON line per variant. Run on TPU."""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(config_name: str = "cornell512") -> None:
    from spectral_tpu.render.pallas_integrator import render_frame_step_pallas
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.flatten import flatten_scene

    cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    scene = presets.cornell_box()
    scene.width = scene.height = 512
    scene.nbr_of_ray_bounces = 30
    arrays, config = flatten_scene(scene)
    ots = tuple(np.asarray(arrays.obj_type).tolist())

    n_frames = 60

    @partial(jax.jit, static_argnums=(1, 4), donate_argnums=(2,))
    def step(scn, cfg, accum, fid, ots):
        return render_frame_step_pallas(scn, cfg, accum, fid, ots)

    def run_single():
        accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
        accum = step(arrays, config, accum, jnp.uint32(0), ots)
        jax.block_until_ready(accum)
        t0 = time.perf_counter()
        for f in range(1, n_frames + 1):
            accum = step(arrays, config, accum, jnp.uint32(f), ots)
        jax.block_until_ready(accum)
        return (time.perf_counter() - t0) / n_frames

    @partial(jax.jit, static_argnums=(1, 3, 4), donate_argnums=(2,))
    def step_k(scn, cfg, accum, k, ots, first_fid):
        def body(acc, i):
            fid = first_fid + i
            return render_frame_step_pallas(scn, cfg, acc, fid, ots), None

        accum, _ = jax.lax.scan(
            body, accum, jnp.arange(k, dtype=jnp.uint32)
        )
        return accum

    def run_fused(k):
        accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
        accum = step_k(arrays, config, accum, k, ots, jnp.uint32(0))
        jax.block_until_ready(accum)
        t0 = time.perf_counter()
        for base in range(1, n_frames + 1, k):
            accum = step_k(arrays, config, accum, k, ots, jnp.uint32(base))
        jax.block_until_ready(accum)
        return (time.perf_counter() - t0) / n_frames

    dt1 = run_single()
    print(json.dumps({"name": "dispatch_per_frame",
                      "ms_per_frame": round(dt1 * 1e3, 3)}), flush=True)
    for k in (5, 10, 20):
        dtk = run_fused(k)
        print(json.dumps({"name": f"scan_k{k}",
                          "ms_per_frame": round(dtk * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "cornell512")
