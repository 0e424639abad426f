"""Measured tile-size / bounce-guard sweep on real TPU hardware.

The megakernel executes every lane of a tile for every bounce; the only
in-kernel occupancy lever is the tile-level all-dead early exit (the
``guarded`` cond in megakernel.make_body). Smaller grid tiles make that
exit more likely to fire (death is spatially coherent for sky regions)
at the cost of more grid steps. This script times the production step at
several tile sizes plus a reduced-bounce diagnostic that bounds how much
the guard could ever save.

Prints one JSON line per configuration. Run on the TPU host:
    python tools/occupancy_sweep.py > sweep.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

# runnable as `python tools/occupancy_sweep.py` (sys.path[0] is tools/)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _enable_compile_cache() -> None:
    import os

    cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def time_config(name: str, scene, tile: int | None, n_frames: int = 30):
    from spectral_tpu.render.pallas_integrator import render_frame_step_pallas
    from spectral_tpu.scene.flatten import flatten_scene

    arrays, config = flatten_scene(scene)
    ots = tuple(np.asarray(arrays.obj_type).tolist())
    ht = bool(np.asarray(arrays.transmission).any())
    he = bool(np.asarray(arrays.emission).any())

    @partial(jax.jit, static_argnums=(1, 4, 5, 6, 7), donate_argnums=(2,))
    def step(scn, cfg, accum, fid, ots, ht, he, tl):
        return render_frame_step_pallas(
            scn, cfg, accum, fid, ots,
            has_transmission=ht, has_emission=he, tile=tl,
        )

    accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
    accum = step(arrays, config, accum, jnp.uint32(0), ots, ht, he, tile)
    jax.block_until_ready(accum)
    t0 = time.perf_counter()
    for f in range(1, n_frames + 1):
        accum = step(arrays, config, accum, jnp.uint32(f), ots, ht, he, tile)
    jax.block_until_ready(accum)
    dt = (time.perf_counter() - t0) / n_frames
    print(
        json.dumps(
            {"name": name, "tile": tile, "ms_per_frame": round(dt * 1e3, 2)}
        ),
        flush=True,
    )


def main() -> None:
    from spectral_tpu.scene import presets

    _enable_compile_cache()

    def spheres(bounces=8):
        sc = presets.sphere_field(n_spheres=1000)
        sc.nbr_of_ray_bounces = bounces
        return sc

    def cornell():
        sc = presets.cornell_box()
        sc.width = sc.height = 512
        sc.nbr_of_ray_bounces = 30
        return sc

    for tile in (8192, 4096, 2048, 1024):
        time_config("spheres_b8", spheres(), tile)
    # guard upper bound: if the all-dead exit were perfect, 8 bounces would
    # cost barely more than 2 (occupancy entering bounce 2 is ~3%)
    time_config("spheres_b2", spheres(bounces=2), 8192)
    for tile in (8192, 2048):
        time_config("cornell512_b30", cornell(), tile)


if __name__ == "__main__":
    main()
