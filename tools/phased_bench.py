"""Measure the phased (occupancy-compacted) step vs the monolithic kernel
on real TPU hardware. Prints one JSON line per variant."""

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


def _enable_compile_cache() -> None:
    cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    from spectral_tpu.render.pallas_integrator import (
        render_frame_step_pallas,
        render_frame_step_pallas_phased,
    )
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.flatten import flatten_scene

    _enable_compile_cache()
    scene = presets.sphere_field(n_spheres=1000)
    scene.nbr_of_ray_bounces = 8
    arrays, config = flatten_scene(scene)
    ots = tuple(np.asarray(arrays.obj_type).tolist())

    @partial(jax.jit, static_argnums=(1, 4), donate_argnums=(2,))
    def mono(scn, cfg, accum, fid, ots):
        return render_frame_step_pallas(scn, cfg, accum, fid, ots)

    def make_phased(split, cap_frac):
        n_pad = 786432  # 1024*768 lanes, already tile-aligned
        cap = n_pad // cap_frac

        @partial(jax.jit, static_argnums=(1, 4), donate_argnums=(2,))
        def step(scn, cfg, accum, fid, ots):
            return render_frame_step_pallas_phased(
                scn, cfg, accum, fid, ots, split=split, capacity_lanes=cap
            )

        return step

    n_frames = 30

    def time_step(name, step, check_overflow):
        accum = jnp.zeros((config.height, config.width, 4), jnp.float32)
        out = step(arrays, config, accum, jnp.uint32(0), ots)
        accum = out[0] if check_overflow else out
        jax.block_until_ready(accum)
        overflows = 0
        t0 = time.perf_counter()
        for f in range(1, n_frames + 1):
            out = step(arrays, config, accum, jnp.uint32(f), ots)
            if check_overflow:
                accum, ovf = out
                overflows += int(ovf)  # per-frame host sync, as production would
            else:
                accum = out
        jax.block_until_ready(accum)
        dt = (time.perf_counter() - t0) / n_frames
        print(
            json.dumps(
                {
                    "name": name,
                    "ms_per_frame": round(dt * 1e3, 2),
                    "overflow_frames": overflows,
                }
            ),
            flush=True,
        )

    def make_cascade(stages):
        @partial(jax.jit, static_argnums=(1, 4), donate_argnums=(2,))
        def step(scn, cfg, accum, fid, ots):
            from spectral_tpu.render.integrator import accumulate_frame
            from spectral_tpu.render.pallas_integrator import (
                integrate_frame_pallas_cascade,
            )

            rgb, ovf = integrate_frame_pallas_cascade(
                scn, cfg, fid, ots, stages
            )
            return accumulate_frame(accum, rgb, fid), ovf

        return step

    time_step("mono_b8", mono, False)
    # capacity from measured occupancy (bounce 2: 15%, 3: 9.2%, 4: 6%)
    for split, frac in ((2, 4), (3, 8), (4, 8)):
        time_step(f"phased_s{split}_cap{frac}", make_phased(split, frac), True)
    # cascades: measured occupancy entering bounce 1 is ~59%, so the first
    # compaction needs >= 5/8 capacity; margins widen each config
    n_pad = 786432
    for tag, stages in (
        ("casc_1_3", ((1, n_pad * 11 // 16), (3, n_pad // 8))),
        ("casc_1_3_tight", ((1, n_pad * 5 // 8), (3, n_pad // 8))),
        ("casc_1_4", ((1, n_pad * 11 // 16), (4, n_pad // 16))),
        ("casc_1_3_5", ((1, n_pad * 11 // 16), (3, n_pad // 8),
                        (5, n_pad // 16))),
        ("casc_2_4", ((2, n_pad // 4), (4, n_pad // 16))),
    ):
        time_step(tag, make_cascade(stages), True)
    # what the auto-tuner would pick for this scene
    from spectral_tpu.render.renderer import choose_stages

    occ = [1.0, 0.59, 0.20, 0.094, 0.063, 0.046, 0.035, 0.029]
    auto_stages = choose_stages(occ, n_pad, 8192)
    print(json.dumps({"name": "auto_choice", "stages": auto_stages}),
          flush=True)
    if auto_stages:
        time_step("casc_auto", make_cascade(tuple(auto_stages)), True)


if __name__ == "__main__":
    main()
