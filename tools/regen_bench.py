"""Path-regeneration megakernel vs per-frame dispatch, on real TPU.

One JSON line per variant: ms/frame on the cornell512 (or given) config.
The theoretical ceiling is 1/mean-occupancy (~3.4x on cornell512); the
realized win is gated by per-tile stragglers (a tile runs until its
slowest lane finishes its K paths) and the per-iteration regen overhead.
"""

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
    from spectral_tpu.render.pallas_integrator import (
        render_frame_step_pallas, render_frames_step_pallas_regen)
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.flatten import flatten_scene

    cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if config_name == "cornell512":
        scene = presets.cornell_box()
        scene.width = scene.height = 512
        scene.nbr_of_ray_bounces = 30
        scene.nbr_of_iterations = 100
        ht = he = False
    elif config_name == "hero":
        scene = presets.cornell_box(n_samples=64)
        scene.width, scene.height = 1920, 1080
        scene.nbr_of_ray_bounces = 30
        scene.nbr_of_iterations = 1000
        ht = he = False
    elif config_name == "prism":
        scene = presets.prism(n_samples=64)
        scene.nbr_of_ray_bounces = 8
        ht = he = True
    elif config_name == "spheres":
        scene = presets.sphere_field(n_spheres=1000)
        scene.nbr_of_iterations = 100
        ht = he = False
    else:
        raise SystemExit(f"unknown config {config_name}")
    arrays, config = flatten_scene(scene)
    ots = tuple(np.asarray(arrays.obj_type).tolist())
    n_frames = 50

    @partial(jax.jit, static_argnums=(1, 4, 5, 6), donate_argnums=(2,))
    def mono(scn, cfg, accum, fid, ots, h1, h2):
        return render_frame_step_pallas(
            scn, cfg, accum, fid, ots, has_transmission=h1, has_emission=h2)

    accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
    accum = mono(arrays, config, accum, jnp.uint32(0), ots, ht, he)
    jax.block_until_ready(accum)
    t0 = time.perf_counter()
    for f in range(1, n_frames + 1):
        accum = mono(arrays, config, accum, jnp.uint32(f), ots, ht, he)
    jax.block_until_ready(accum)
    dt = (time.perf_counter() - t0) / n_frames
    print(json.dumps({"name": "mono_per_frame",
                      "ms_per_frame": round(dt * 1e3, 3)}), flush=True)

    tile = int(os.environ.get("REGEN_TILE", 0)) or None

    @partial(jax.jit, static_argnums=(1, 4, 5, 6, 7), donate_argnums=(2,))
    def regen(scn, cfg, accum, fid, k, ots, h1, h2):
        return render_frames_step_pallas_regen(
            scn, cfg, accum, fid, ots, k,
            has_transmission=h1, has_emission=h2, tile=tile)

    ks = tuple(
        int(v) for v in (sys.argv[2].split(",") if len(sys.argv) > 2 else ())
    ) or (5, 10, 25, 50)
    for k in ks:
        accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
        accum = regen(arrays, config, accum, jnp.uint32(0), k, ots, ht, he)
        jax.block_until_ready(accum)
        t0 = time.perf_counter()
        for base in range(k, k + n_frames, k):
            accum = regen(arrays, config, accum, jnp.uint32(base), k, ots, ht, he)
        jax.block_until_ready(accum)
        dt = (time.perf_counter() - t0) / n_frames
        print(json.dumps({"name": f"regen_k{k}",
                          "ms_per_frame": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "cornell512")
