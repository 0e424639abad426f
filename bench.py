"""Headline benchmark: Cornell box throughput on real TPU hardware.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s*lambda", "vs_baseline": N}

The metric is reference-equivalent ray throughput times spectral width —
each counted ray is one ``submit_ray`` the reference CPU renderer would
have performed (primary + continuation + NEE shadow rays; retired
wavefront lanes are NOT counted), times the number of wavelength samples
carried per ray. Baseline: the driver's north-star target of 100
Mrays/s*lambda per chip (BASELINE.md; the reference publishes no numbers).
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp


BASELINE_MRAYS_LAMBDA = 100.0


class BenchTimeout(Exception):
    pass


def _arm_watchdog(seconds: int = 1500) -> None:
    """The TPU tunnel can wedge indefinitely if a previous client died
    mid-claim; raise (so the process unwinds and releases its own claim
    CLEANLY — a hard exit would orphan the claim and wedge the tunnel for
    the next client) and emit an explanatory JSON line."""
    import signal

    def _timeout(_sig, _frm):
        raise BenchTimeout(
            f"TPU unresponsive for {seconds}s (wedged tunnel?)"
        )

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(seconds)


def _enable_compile_cache() -> None:
    import os

    try:
        cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main() -> None:
    import signal

    import numpy as np

    _enable_compile_cache()
    _arm_watchdog()

    from spectral_tpu.render.integrator import accumulate_frame, integrate_frame
    from spectral_tpu.render.pallas_integrator import render_frame_step_pallas
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.flatten import flatten_scene

    # BASELINE.json config #2: Cornell box, 512x512, default spectral width.
    scene = presets.cornell_box()
    scene.width = scene.height = 512
    scene.nbr_of_ray_bounces = 30
    scene.nbr_of_iterations = 100
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())

    # reference-equivalent ray counts, measured via the instrumented jnp
    # path for the SAME frames the timed loop renders (ray survival varies
    # per frame with the RNG seeds and Hammersley jitter)
    @partial(jax.jit, static_argnums=(1,))
    def count(scn, cfg, frame_id):
        _rgb, rays = integrate_frame(scn, cfg, frame_id, return_stats=True)
        return rays

    # timed path: the VMEM-resident Pallas megakernel
    @partial(jax.jit, static_argnums=(1, 4), donate_argnums=(2,))
    def step(scn, cfg, accum, frame_id, ots):
        return render_frame_step_pallas(scn, cfg, accum, frame_id, ots)

    accum = jnp.zeros((config.height, config.width, 4), dtype=jnp.float32)
    accum = step(arrays, config, accum, jnp.uint32(0), obj_types)  # compile
    jax.block_until_ready(accum)

    n_frames = 50
    t0 = time.perf_counter()
    for f in range(1, n_frames + 1):
        accum = step(arrays, config, accum, jnp.uint32(f), obj_types)
    jax.block_until_ready(accum)
    dt = time.perf_counter() - t0

    total_rays = float(
        sum(float(count(arrays, config, jnp.uint32(f))) for f in range(1, n_frames + 1))
    )
    rays_per_frame = total_rays / n_frames

    signal.alarm(0)  # measurement done; disarm the watchdog
    total_ray_lambda = total_rays * config.n_samples
    mrays_lambda = total_ray_lambda / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "cornell512_throughput",
                "value": round(mrays_lambda, 2),
                "unit": "Mrays/s*lambda",
                "vs_baseline": round(mrays_lambda / BASELINE_MRAYS_LAMBDA, 3),
                "detail": {
                    "config": "cornell 512x512, 32 lambda, 30 bounces, pallas megakernel",
                    "rays_per_frame": rays_per_frame,
                    "seconds_per_frame": dt / n_frames,
                    "est_wall_1000_iters_s": round(dt / n_frames * 1000, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except BenchTimeout as e:
        print(
            json.dumps(
                {
                    "metric": "cornell512_throughput",
                    "value": 0.0,
                    "unit": "Mrays/s*lambda",
                    "vs_baseline": 0.0,
                    "error": str(e),
                }
            ),
            flush=True,
        )
        raise SystemExit(2)
