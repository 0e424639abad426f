"""Golden-image regression tests.

Direct-only (bounces=1) frames of both reference presets are
deterministic up to f32 compilation rounding; these goldens pin the whole
pipeline (camera -> trace -> NEE -> CIE -> RGB) against semantic
regressions across refactors. Stored f16, tolerance covers the storage
quantization plus last-ulp compilation drift.
"""

from pathlib import Path

import numpy as np
import pytest

from spectral_tpu.render.integrator import integrate_frame
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import flatten_scene

GOLDEN_DIR = Path(__file__).parent / "goldens"


@pytest.mark.parametrize("preset", ["default", "cornell"])
def test_direct_only_golden(preset):
    data = np.load(GOLDEN_DIR / f"{preset}_32x24_b1.npz")
    want = data["frames"].astype(np.float32)

    scene = presets.PRESETS[preset]()
    scene.width, scene.height = 32, 24
    scene.nbr_of_ray_bounces = 1
    scene.nbr_of_iterations = 4
    arrays, config = flatten_scene(scene)
    got = np.stack(
        [np.asarray(integrate_frame(arrays, config, np.uint32(f))) for f in range(2)]
    )

    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want) / scale
    assert float(err.max()) < 2e-3, f"max rel err {err.max():.2e}"
    rmse = float(np.sqrt(np.mean(err**2)))
    assert rmse < 2e-4, f"rel RMSE {rmse:.2e}"
