"""RGB -> spectral reflectance uplift (capability beyond the reference).

The uplift must be an exact metamer under the framework's own color
pipeline (the reference-compatible CIE table / float-walk weights /
XYZ->RGB matrix of ``spectral_tpu.spectral.cie``), so the round trip is
checked with ``rgb_from_samples_host`` — the host-side ``get_rgb_early``
(reference ``src/spectrum.rs:238-261``) — not with the uplift's own math.
"""

import numpy as np
import pytest

from spectral_tpu.scene import schema
from spectral_tpu.spectral.cie import rgb_from_samples_host
from spectral_tpu.spectral.uplift import uplift_rgb, white_point

IN_GAMUT = [
    (1.0, 1.0, 1.0),
    (0.5, 0.5, 0.5),
    (0.18, 0.18, 0.18),
    (0.7, 0.3, 0.2),
    (0.2, 0.4, 0.8),
    (0.9, 0.9, 0.1),
    (0.05, 0.6, 0.4),
]


@pytest.mark.parametrize("rgb", IN_GAMUT)
def test_round_trip_in_gamut(rgb):
    n = 32
    s = uplift_rgb(rgb, n=n)
    assert s.shape == (n,) and s.dtype == np.float32
    assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0
    got = np.array(rgb_from_samples_host(s, 380.0, 780.0, n))
    rel = got / white_point(n=n)
    # f32 evaluation of an f64-exact metamer: ~1e-3 channel agreement
    np.testing.assert_allclose(rel, rgb, atol=2e-3)


def test_gray_is_flat_and_white_is_ones():
    s = uplift_rgb((0.5, 0.5, 0.5), n=32)
    np.testing.assert_allclose(s, 0.5, atol=1e-4)
    s1 = uplift_rgb((1.0, 1.0, 1.0), n=32)
    np.testing.assert_allclose(s1, 1.0, atol=1e-4)


@pytest.mark.parametrize("n", [8, 16, 32, 64, 128])
def test_sample_counts(n):
    rgb = (0.6, 0.35, 0.15)
    s = uplift_rgb(rgb, n=n)
    got = np.array(rgb_from_samples_host(s, 380.0, 780.0, n))
    rel = got / white_point(n=n)
    np.testing.assert_allclose(rel, rgb, atol=5e-3)


def test_out_of_gamut_reports_clipping():
    for prim in [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]:
        s, info = uplift_rgb(prim, n=32, return_info=True)
        assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0
        # pure sRGB primaries are outside the smooth [0,1]-reflectance
        # gamut: the solver lands nearby and reports how near
        assert 0.0 < info["max_channel_error"] < 0.2
        got = np.array(rgb_from_samples_host(s, 380.0, 780.0, 32))
        rel = got / white_point(n=32)
        np.testing.assert_allclose(rel, info["achieved_rgb"], atol=2e-3)
    # the blue primary happens to be (near-)achievable
    _, info = uplift_rgb((0.0, 0.0, 1.0), n=32, return_info=True)
    assert info["max_channel_error"] < 5e-3


def test_smoothness_beats_band_spectra():
    """The uplift's point vs the reference's R/G/B band constructors:
    same color family, but without the hard band edges."""
    s = uplift_rgb((0.2, 0.4, 0.8), n=64)
    steps = np.abs(np.diff(s))
    assert float(steps.max()) < 0.15  # band spectra jump 0 -> 1


def test_input_validation():
    with pytest.raises(ValueError):
        uplift_rgb((0.5, 0.5))
    with pytest.raises(ValueError):
        uplift_rgb((-0.1, 0.5, 0.5))
    with pytest.raises(ValueError):
        uplift_rgb((1.5, 0.5, 0.5))
    with pytest.raises(ValueError):
        uplift_rgb((np.nan, 0.5, 0.5))


class TestSceneSpectrumFromRgb:
    def test_reflective_spectrum_valid_in_scene(self):
        from spectral_tpu.scene import presets
        from spectral_tpu.scene.flatten import flatten_scene

        scene = presets.cornell_box()
        sp = schema.SceneSpectrum.from_rgb("brick", (0.55, 0.25, 0.18))
        assert isinstance(sp.spectrum_type, schema.Custom)
        assert sp.effect_type == schema.SpectrumEffectType.REFLECTIVE
        scene.spectra.append(sp)
        scene.materials.append(
            schema.Material(0.0, 0.0, sp, "brick mat")
        )
        scene.objects[0].material = scene.materials[-1]
        scene.validate()
        arrays, config = flatten_scene(scene)  # renderable snapshot
        assert config.n_objects == len(scene.visible_objects())

    def test_emissive_factor_scales(self):
        lamp = schema.SceneSpectrum.from_rgb(
            "warm lamp", (0.9, 0.6, 0.3),
            effect_type=schema.SpectrumEffectType.EMISSIVE, factor=50.0,
        )
        base = schema.SceneSpectrum.from_rgb(
            "warm lamp unit", (0.9, 0.6, 0.3),
            effect_type=schema.SpectrumEffectType.EMISSIVE,
        )
        np.testing.assert_allclose(
            lamp.spectrum.values, base.spectrum.values * 50.0, rtol=1e-6
        )

    def test_factor_rejected_for_reflective(self):
        with pytest.raises(schema.SceneError):
            schema.SceneSpectrum.from_rgb("x", (0.5, 0.5, 0.5), factor=2.0)

    def test_negative_emissive_factor_rejected(self):
        with pytest.raises(schema.SceneError):
            schema.SceneSpectrum.from_rgb(
                "x", (0.5, 0.5, 0.5),
                effect_type=schema.SpectrumEffectType.EMISSIVE, factor=-1.0,
            )

    def test_resample_keeps_color(self):
        """Custom spectra resample lossily on sample-count change; the
        uplift's smoothness keeps the color stable through it."""
        sp = schema.SceneSpectrum.from_rgb("c", (0.3, 0.55, 0.4), n=64)
        sp.regenerate(380.0, 780.0, 32)
        got = np.array(
            rgb_from_samples_host(sp.spectrum.values, 380.0, 780.0, 32)
        )
        rel = got / white_point(n=32)
        np.testing.assert_allclose(rel, (0.3, 0.55, 0.4), atol=0.02)
