"""Decompose the regen megakernel's frame time into its lambda-scaling
and lambda-independent parts.

Times the K=100 regeneration step on the cornell512 profile at
n_samples = 8/16/32/64 (four kernel compiles; each shape is cached by
the persistent XLA compile cache afterwards). A linear fit
``ms/frame = a + b * S`` splits the per-bounce-iteration cost into the
per-wavelength shading loop (slope ``b``: the albedo/direct/throughput
chains and the thr/rad VMEM traffic) and everything lambda-independent
(intercept ``a``: trace, shadow occlusion, PCG3D, the cone/diffuse/
dielectric sampling math, normalizes, the regen frame-select chain, and
loop mechanics).

Measured on v5e after the material-indexed-shading change (round 3):
S = 8/16/32/64 -> 2.284/2.372/2.554/2.923 ms/frame, i.e. slope ~11.4 us
per lambda bin and intercept ~2.19 ms — at the default 32 samples the
shading loop is ~14% of frame time and the lambda-INDEPENDENT
per-iteration work is ~86%, almost all of it math the bit-exact
reference contract mandates per bounce (intersection tests, the
stochastic branch's basis constructions and normalizes, the RNG). This
is the evidence that further per-lambda optimization is out of leverage
on the default configs; remaining headroom lives in the per-iteration
fixed work and the straggler factor (both with measured-and-rejected
ledgers in PARITY.md).

    python tools/lambda_scaling_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/spectral_tpu_xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spectral_tpu.render.renderer import _step_regen
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.flatten import flatten_scene

    k = 100
    points = []
    for s_count in (8, 16, 32, 64):
        scene = presets.cornell_box(n_samples=s_count)
        scene.width = scene.height = 512
        scene.nbr_of_ray_bounces = 30
        scene.nbr_of_iterations = 1000
        arrays, config = flatten_scene(scene)
        obj_types = tuple(np.asarray(arrays.obj_type).tolist())
        accum = jnp.zeros((512, 512, 4), jnp.float32)
        accum = _step_regen(
            arrays, config, accum, jnp.uint32(0), k, obj_types, False, False
        )
        jax.block_until_ready(accum)  # warm (compile + first launch)
        launches = 4
        t0 = time.perf_counter()
        for i in range(1, launches + 1):
            accum = _step_regen(
                arrays, config, accum, jnp.uint32(i * k), k, obj_types,
                False, False,
            )
        jax.block_until_ready(accum)
        dt = (time.perf_counter() - t0) / (launches * k)
        points.append((s_count, dt * 1000))
        print(f"S={s_count:3d}  {dt * 1000:.3f} ms/frame", flush=True)

    xs = np.array([p[0] for p in points], np.float64)
    ys = np.array([p[1] for p in points], np.float64)
    b, a = np.polyfit(xs, ys, 1)
    s32 = a + 32 * b
    print(
        f"fit: {a:.3f} ms lambda-independent + {b * 1000:.1f} us/bin "
        f"(at S=32: {100 * 32 * b / s32:.0f}% of frame time scales "
        "with lambda)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
