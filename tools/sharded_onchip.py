"""Run the row-sharded (shard_map) Pallas step on the REAL chip with a
1-device mesh — compile-path validation of shard_map + Mosaic on hardware
(the virtual CPU mesh tests exercise the sharding semantics, not the
Mosaic lowering) — and measure its per-frame overhead vs the unsharded
step. Prints JSON lines."""

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


def main() -> None:
    from spectral_tpu.parallel.mesh import make_mesh, row_sharding
    from spectral_tpu.parallel.sharding import (
        build_sharded_pallas_step,
        shard_scene,
    )
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

    n_frames = 50

    # unsharded baseline
    @partial(jax.jit, static_argnums=(1, 4), donate_argnums=(2,))
    def step(scn, cfg, accum, fid, ots):
        return render_frame_step_pallas(scn, cfg, accum, fid, ots)

    accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
    accum = step(arrays, config, accum, jnp.uint32(0), ots)
    jax.block_until_ready(accum)
    t0 = time.perf_counter()
    for f in range(1, n_frames + 1):
        accum = step(arrays, config, accum, jnp.uint32(f), ots)
    jax.block_until_ready(accum)
    dt_plain = (time.perf_counter() - t0) / n_frames
    print(json.dumps({"name": "unsharded", "ms_per_frame":
                      round(dt_plain * 1e3, 3)}), flush=True)

    # sharded over a 1-device mesh on the real chip
    mesh = make_mesh(1)
    arrays_sh, accum_sharding = shard_scene(arrays, row_sharding(mesh), config)
    sharded = build_sharded_pallas_step(mesh, config, ots)
    accum = jax.device_put(
        jnp.zeros((config.height, config.width, 4), jnp.float32),
        accum_sharding,
    )
    accum = sharded(arrays_sh, accum, jnp.uint32(0))
    jax.block_until_ready(accum)
    t0 = time.perf_counter()
    for f in range(1, n_frames + 1):
        accum = sharded(arrays_sh, accum, jnp.uint32(f))
    jax.block_until_ready(accum)
    dt_sh = (time.perf_counter() - t0) / n_frames
    print(json.dumps({
        "name": "shard_map_1dev",
        "ms_per_frame": round(dt_sh * 1e3, 3),
        "overhead_ms": round((dt_sh - dt_plain) * 1e3, 3),
        "device": str(jax.devices()[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
