"""Reference-algorithm ground-truth goldens.

Unlike tests/test_goldens.py (framework-self-generated regression pins),
these goldens were produced by the scalar oracle — an independent replay
of the reference's recursive shader (``src/shader.rs``) — and committed
(tools/make_oracle_goldens.py). Both compute backends are asserted
against them:

* bounces=1 (direct-only) frames are deterministic -> tight comparison;
* bounces=3 frames include diffuse continuations whose un-offset origins
  (reference quirk §2.5) make per-pixel output a last-ulp coin flip
  between any two compilations -> bounded flip fraction + tight RMSE on
  the rest (same envelope as tests/test_integrator_vs_oracle.py).
"""

from pathlib import Path

import numpy as np
import pytest

from spectral_tpu.render.integrator import integrate_frame
from spectral_tpu.render.pallas_integrator import integrate_frame_pallas
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import flatten_scene

GOLDEN_DIR = Path(__file__).parent / "goldens"


def _frames(preset, bounces, backend):
    scene = presets.PRESETS[preset]()
    scene.width, scene.height = 32, 24
    scene.nbr_of_ray_bounces = bounces
    scene.nbr_of_iterations = 4
    arrays, config = flatten_scene(scene)
    if backend == "jnp":
        return np.stack(
            [
                np.asarray(integrate_frame(arrays, config, np.uint32(f)))
                for f in range(2)
            ]
        )
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    return np.stack(
        [
            np.asarray(
                integrate_frame_pallas(
                    arrays, config, np.uint32(f), obj_types, interpret=True
                )
            )
            for f in range(2)
        ]
    )


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
@pytest.mark.parametrize("preset", ["default", "cornell"])
def test_direct_only_matches_oracle_golden(preset, backend):
    want = np.load(
        GOLDEN_DIR / f"oracle_{preset}_32x24_b1.npz"
    )["frames"].astype(np.float32)
    got = _frames(preset, 1, backend)
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(got - want).max() / scale < 1e-3


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
@pytest.mark.parametrize("preset", ["default", "cornell"])
def test_multibounce_matches_oracle_golden(preset, backend):
    want = np.load(
        GOLDEN_DIR / f"oracle_{preset}_32x24_b3.npz"
    )["frames"].astype(np.float32)
    got = _frames(preset, 3, backend)
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want).max(axis=-1) / scale
    flips = int((err > 1e-3).sum())
    # the closed Cornell box gives every pixel a diffuse continuation, so
    # its coin-flip fraction runs higher than the open scenes (~11.5%
    # observed between ANY two compilations of the same math)
    assert flips <= 0.15 * err.size, f"{flips}/{err.size} coin-flip pixels"
    ok = err[err <= 1e-3]
    assert float(np.sqrt(np.mean(ok**2))) < 2e-4
