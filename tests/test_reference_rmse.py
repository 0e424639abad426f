"""Pinned accuracy regression vs the reference's ONLY published render.

The reference ships exactly one ground-truth artifact: a 1920x1080
1000-iteration render of the default scene (``example_image.png``,
referenced from its README). ``tests/goldens/example_image_160x90.png``
is a checked-in Lanczos downsample of it, so the accuracy claim stays a
pinned regression test even where ``/root/reference`` is absent.

Measured envelope (CPU, jnp backend, default scene at 160x90):
RMSE 0.0196 at 200 iterations, dominated by our render's residual Monte
Carlo noise against the reference's 1000-iteration average (the
full-resolution, 1000-iteration comparison measures 0.0159 —
``bench.py default_rmse`` / ``tools/compare_reference.py``). The
threshold 0.030 leaves ~50% headroom over the measured value while
still catching any real shading/geometry regression (a single material
or light change moves the RMSE by far more — e.g. dropping one light
roughly triples it).
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "goldens" / "example_image_160x90.png"
UPSTREAM = Path("/root/reference/example_image.png")

RMSE_THRESHOLD = 0.030
ITERATIONS = 150  # ~75 s on the 1-CPU host; noise well inside threshold


def _load(p) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0


def test_checked_in_golden_matches_upstream_artifact():
    """The committed downsample must stay a faithful copy of the upstream
    artifact (guards against accidental regeneration drift)."""
    if not UPSTREAM.exists():
        pytest.skip("upstream reference artifact not present")
    from PIL import Image

    ref = Image.open(UPSTREAM).convert("RGB").resize(
        (160, 90), Image.LANCZOS
    )
    np.testing.assert_array_equal(
        np.asarray(ref), (np.asarray(_load(GOLDEN)) * 255).round()
    )


def test_render_matches_reference_within_rmse_budget():
    from spectral_tpu.render import image as image_mod
    from spectral_tpu.render.renderer import Renderer
    from spectral_tpu.scene import presets

    ref = _load(GOLDEN)
    h, w = ref.shape[:2]
    scene = presets.default_scene()
    scene.width, scene.height = w, h
    scene.nbr_of_iterations = ITERATIONS
    fb = Renderer(scene, backend="jnp").render()
    ours = (
        image_mod.accum_to_u8(np.asarray(fb))[..., :3].astype(np.float32)
        / 255.0
    )
    rmse = float(np.sqrt(np.mean((ours - ref) ** 2)))
    assert rmse < RMSE_THRESHOLD, f"RMSE {rmse:.4f} vs reference artifact"
    # and the comparison has teeth: the images are actually correlated
    # (a black frame would sit near the image RMS, ~10x the threshold)
    assert rmse < 0.5 * float(np.sqrt(np.mean(ref**2)))
