"""Spectral-core goldens.

The first five tests are ports of the reference's only unit tests
(reference ``src/spectrum.rs:772-886``), locking in behavior including the
reversed-lerp interpolation quirk. The rest cover constructors, resampling
and the radiometric helpers the reference validates only visually.
"""

import numpy as np
import pytest

from spectral_tpu.spectral import cie, solar
from spectral_tpu.spectral.blackbody import black_body_radiation
from spectral_tpu.spectral.spectrum import (
    Spectrum,
    VISIBLE_LIGHT_WAVELENGTH_LOWER_BOUND as LO,
    VISIBLE_LIGHT_WAVELENGTH_UPPER_BOUND as HI,
)

F32_DELTA = 1e-5  # reference src/shader.rs:7


class TestWavelengthToXYZ:
    """Port of test_wavelength_to_XYZ (reference src/spectrum.rs:777-804)."""

    def test_out_of_range(self):
        assert np.all(cie.wavelength_to_xyz(379.0) == 0.0)
        assert np.all(cie.wavelength_to_xyz(781.0) == 0.0)

    def test_exact_table_hit(self):
        xyz = cie.wavelength_to_xyz(750.0)
        assert tuple(xyz) == (np.float32(0.000251), np.float32(0.000098), 0.0)

    def test_interpolate_perfect_middle(self):
        # Locks in the REVERSED lerp weights (quirk, SURVEY.md §2.7).
        xyz = cie.wavelength_to_xyz(702.5)
        assert abs(xyz[0] - 0.008_091) <= F32_DELTA
        assert abs(xyz[1] - 0.003_141_5) <= F32_DELTA
        assert xyz[2] == 0.0

    def test_interpolate_skewed(self):
        xyz = cie.wavelength_to_xyz(776.0)
        assert abs(xyz[0] - 0.000_043_4) <= F32_DELTA
        assert abs(xyz[1] - 0.000_017) <= F32_DELTA
        assert xyz[2] == 0.0


class TestSpectrumToRGB:
    """Port of test_spectrum_to_rgb (reference src/spectrum.rs:806-830)."""

    def test_xyz_to_rgb_white(self):
        d65 = np.array([95.047, 100.0, 108.883], dtype=np.float32)
        white = cie.XYZ_TO_RGB_MATRIX @ d65
        assert np.all(np.abs(white - 100.0) <= 0.01)

    def test_sunlight_is_grey(self):
        # NOTE: the reference's own assertion (|r-g| < 0.01 absolute) FAILS
        # upstream — src/spectrum.rs:829 admits it ("TODO more useful tests
        # as soon as the current one passes"). A 6500 K blackbody through
        # this pipeline is grey only to ~5% relative. We lock in relative
        # greyness plus exact regression goldens of our f32 pipeline.
        sun = Spectrum.new_sunlight_spectrum(LO, HI, 64, 1.0)
        r, g, b = sun.get_rgb_early()
        m = max(r, g, b)
        assert abs(r - g) / m < 0.06
        assert abs(g - b) / m < 0.06
        assert abs(r - b) / m < 0.06
        assert (r, g, b) == pytest.approx(
            (12604.8828125, 11952.8935546875, 12413.98046875), rel=1e-6
        )


class TestBlackBody:
    """Port of test_black_body_calculation (reference src/spectrum.rs:832-869)."""

    @pytest.mark.parametrize(
        "wavelength,temperature,expected",
        [
            (500.0, 5000.0, 12_107.190_590_398),
            (500.0, 1000.0, 0.000_001_213_4),
            (700.0, 2000.0, 24.390_318_624),
        ],
    )
    def test_known_points(self, wavelength, temperature, expected):
        value = black_body_radiation(wavelength, temperature)
        assert abs(1.0 - value / expected) < 1e-4

    def test_cold_uv_is_dark(self):
        assert black_body_radiation(400.0, 500.0) < 1e-10

    def test_illegal_temperature(self):
        with pytest.raises(ValueError):
            black_body_radiation(100.0, -1.0)

    def test_illegal_wavelength(self):
        with pytest.raises(ValueError):
            black_body_radiation(0.0, 1000.0)


class TestIntegrationWeights:
    def test_default_32_sample_walk(self):
        # The f32-accumulating walk at the default config (380-780, 32).
        w = cie.xyz_integration_weights(LO, HI, 32)
        assert w.shape[1] == 3
        assert w.shape[0] in (31, 32)  # one row may drop to f32 rounding
        # weights already carry the 1/n factor
        assert w.max() < WAVELENGTH_XYZ_MAX / 32 + 1e-6

    def test_full_128(self):
        w = cie.xyz_integration_weights(LO, HI, 128)
        assert w.shape[0] in (127, 128)


WAVELENGTH_XYZ_MAX = float(cie.WAVELENGTH_TO_XYZ_TABLE.max())


class TestConstructors:
    def test_flat(self):
        s = Spectrum.new_singular_reflectance_factor(LO, HI, 32, 0.7)
        assert s.nbr_of_samples == 32
        assert np.all(s.values == np.float32(0.7))
        # reference fills the entire 128-wide array
        assert np.all(s.intensities == np.float32(0.7))

    def test_temperature_padding_has_values(self):
        # reference iterates all 128 slots (src/spectrum.rs:116-119)
        s = Spectrum.new_temperature_spectrum(LO, HI, 6500.0, 32, 1.0)
        assert np.all(s.intensities > 0.0)

    def test_band_spectra(self):
        red = Spectrum.new_reflective_spectrum_red(LO, HI, 32, 1.0)
        green = Spectrum.new_reflective_spectrum_green(LO, HI, 32, 1.0)
        blue = Spectrum.new_reflective_spectrum_blue(LO, HI, 32, 1.0)
        wl = red.get_wavelengths()
        assert np.array_equal(red.values > 0, wl > 550.0)
        assert np.array_equal(green.values > 0, (wl > 500.0) & (wl < 575.0))
        assert np.array_equal(blue.values > 0, wl < 475.0)
        # bands must not touch padding
        assert np.all(red.intensities[32:] == 0.0)

    def test_normalized_white_max_channel_is_one(self):
        s = Spectrum.new_normalized_white(LO, HI, 32)
        r, g, b = s.get_rgb_early()
        assert abs(max(r, g, b) - 1.0) < 1e-3

    def test_empty_like(self):
        a = Spectrum.new_temperature_spectrum(LO, HI, 5000.0, 48, 2.0)
        z = Spectrum.new_equal_size_empty_spectrum(a)
        assert z.nbr_of_samples == 48
        assert np.all(z.intensities == 0.0)
        assert z.get_range() == a.get_range()


class TestLookupAndRadiance:
    def test_reversed_lerp_lookup(self):
        # grid 0..7 step 1, values 8*i; a lookup 1/4 past sample 2 must land
        # nearer sample 3 (reversed weights: lower*fract + upper*(1-fract)).
        vals = [8.0 * i for i in range(8)] + [0.0] * 120
        s = Spectrum.new_from_list(vals, 0.0, 7.0, 8)
        v = s.get_spectral_radiance_by_wavelength(2.25)
        assert 21.9 < v < 22.1  # reversed -> 22; standard lerp would give 18
        # exact integer sample hit
        assert s.get_spectral_radiance_by_wavelength(3.0) == np.float32(24.0)
        # out of range
        assert s.get_spectral_radiance_by_wavelength(100.0) == 0.0

    def test_radiance_flat(self):
        s = Spectrum.new_singular_reflectance_factor(LO, HI, 32, 1.0)
        # 32 samples * step (400/31) ~= 412.9
        assert abs(s.get_radiance() - 32 * (400.0 / 31.0)) < 0.05


class TestResample:
    def test_upsample_preserves_endpoints(self):
        s = Spectrum.new_from_list(list(range(8)) + [0.0] * 120, LO, HI, 8)
        s.resample(32)
        assert s.nbr_of_samples == 32
        assert s.values[0] == 0.0
        assert abs(s.values[-1] - 7.0) < 1e-5

    def test_downsample_flat_stays_flat(self):
        s = Spectrum.new_singular_reflectance_factor(LO, HI, 64, 0.5)
        s.intensities[64:] = 0.0  # isolate active region
        s.resample(32)
        assert s.nbr_of_samples == 32
        assert np.allclose(s.values, 0.5, atol=1e-6)

    def test_same_size_noop(self):
        s = Spectrum.new_singular_reflectance_factor(LO, HI, 32, 0.3)
        before = s.intensities.copy()
        s.resample(32)
        assert np.array_equal(s.intensities, before)

    def test_round_trip_close(self):
        # the reference's resampling is intentionally lossy ("quiet lossy",
        # src/main.rs UISpectrumType docs); a smooth spectrum survives a
        # 32 -> 64 -> 32 round trip to within a few percent.
        vals = (0.5 + 0.4 * np.sin(np.linspace(0, 3.0, 32))).astype(np.float32)
        s = Spectrum.new_from_list(list(vals) + [0.0] * 96, LO, HI, 32)
        s.resample(64)
        s.resample(32)
        assert np.allclose(s.values, vals, atol=0.03)


class TestSolarData:
    def test_table_loads(self):
        t = solar.sunlight_spectrum_table()
        assert t.shape == (2399,)

    def test_lookup_exact_and_interp(self):
        t = solar.sunlight_spectrum_table()
        assert solar.get_sunlight_intensity(500.0) == t[499]
        assert solar.get_sunlight_intensity(0.5) == 0.0
        assert solar.get_sunlight_intensity(2400.0) == 0.0
        mid = solar.get_sunlight_intensity(500.5)
        # reversed weights: lower*fract + upper*(1-fract)
        expected = np.float32(t[499] * np.float32(0.5)) + np.float32(
            t[500] * np.float32(0.5)
        )
        assert mid == pytest.approx(float(expected), rel=1e-6)


class TestOperators:
    def test_mul_add_div(self):
        a = Spectrum.new_singular_reflectance_factor(LO, HI, 16, 2.0)
        b = Spectrum.new_singular_reflectance_factor(LO, HI, 16, 3.0)
        assert np.all((a * b).values == 6.0)
        assert np.all((a + b).values == 5.0)
        assert np.all((a / b).values == np.float32(2.0) / np.float32(3.0))
        assert np.all((a * 2.0).values == 4.0)

    def test_clamps(self):
        s = Spectrum.new_from_list([-1.0, 0.5, 2.0] + [0.0] * 125, LO, HI, 8)
        t = s.copy()
        t.max0()
        assert t.values[0] == 0.0 and t.values[2] == 2.0
        u = s.copy()
        u.min1()
        assert u.values[0] == -1.0 and u.values[2] == 1.0


class TestRebound:
    def test_rebound_narrows_range(self):
        # reference declares rebound but leaves it todo!(); we implement it
        s = Spectrum.new_temperature_spectrum(LO, HI, 5000.0, 32, 1.0)
        before_mid = s.get_spectral_radiance_by_wavelength(580.0)
        s.rebound(480.0, 680.0)
        assert s.get_range() == (480.0, 680.0)
        assert s.nbr_of_samples == 32
        # value at 580 nm is preserved to lookup accuracy
        after_mid = s.get_spectral_radiance_by_wavelength(580.0)
        assert abs(after_mid - before_mid) / before_mid < 0.02

    def test_rebound_outside_is_zero(self):
        s = Spectrum.new_singular_reflectance_factor(LO, HI, 16, 1.0)
        s.intensities[16:] = 0.0
        s.rebound(200.0, 1000.0)
        assert s.get_spectral_radiance_by_wavelength(250.0) == 0.0
        assert s.get_spectral_radiance_by_wavelength(550.0) > 0.9

    def test_rebound_rejects_bad_bounds(self):
        s = Spectrum.new_singular_reflectance_factor(LO, HI, 16, 1.0)
        with pytest.raises(ValueError):
            s.rebound(700.0, 500.0)


class TestPreviewColors:
    def test_reflective_preview_has_all_three(self):
        from spectral_tpu.scene.schema import (
            PlainReflective, SceneSpectrum, SpectrumEffectType,
        )
        sp = SceneSpectrum.new(
            "g", PlainReflective(0.5), SpectrumEffectType.REFLECTIVE, n=32
        )
        colors = sp.preview_colors()
        assert set(colors) == {"observed", "normalized", "reflected"}
        r, g, b = colors["normalized"]
        assert abs(max(r, g, b) - 1.0) < 1e-3

    def test_emissive_preview_has_two(self):
        from spectral_tpu.scene.schema import (
            SceneSpectrum, SpectrumEffectType, Temperature,
        )
        sp = SceneSpectrum.new(
            "t", Temperature(3000.0, 1.0), SpectrumEffectType.EMISSIVE, n=32
        )
        colors = sp.preview_colors()
        assert set(colors) == {"observed", "normalized"}
        r, g, b = colors["observed"]
        assert r > g > b  # 3000 K is warm


def test_normalize_leaves_padding_untouched():
    # reference Div<f32> divides active samples only (src/spectrum.rs:447)
    s = Spectrum.new_temperature_spectrum(LO, HI, 5000.0, 32, 1.0)
    pad_before = s.intensities[32:].copy()
    out = s.normalize()
    assert np.array_equal(out.intensities[32:], pad_before)


class TestMeasuredSolar:
    # golden values copied BY HAND from the reference source table
    # (/root/reference/src/spectral_data.rs:31, entry i = (i+1) nm) —
    # independent of the shipped .npy asset
    RUST_GOLDENS = {
        1: 0.000006,
        380: 1.1771,
        500: 1.9377999,
        550: 1.8733001,
        780: 1.1626,
        2399: 0.061981,
    }

    def test_table_matches_rust_source_goldens(self):
        t = solar.sunlight_spectrum_table()
        for nm, want in self.RUST_GOLDENS.items():
            assert t[nm - 1] == np.float32(want), nm

    def test_lookup_midpoint_reversed_lerp_golden(self):
        # midpoint between two hand-copied values with the reference's
        # REVERSED weights: lower*fract + upper*(1-fract)
        lo = np.float32(self.RUST_GOLDENS[500])
        hi = np.float32(t501 := solar.sunlight_spectrum_table()[500])
        got = solar.get_sunlight_intensity(500.25)
        want = np.float32(lo * np.float32(0.25)) + np.float32(
            hi * np.float32(0.75)
        )
        assert got == pytest.approx(float(want), rel=1e-6)
        assert hi == t501  # lock the neighbor too

    def test_constructor_shape_and_normalization(self):
        s = Spectrum.new_measured_solar_spectrum(LO, HI, 32, 1.0)
        w = Spectrum.new_sunlight_spectrum(LO, HI, 32, 1.0)
        # radiance-normalized: drop-in brightness for the workaround
        assert s.get_radiance() == pytest.approx(w.get_radiance(), rel=1e-4)
        # but the SHAPE is the measured curve, not a blackbody: the
        # measured spectrum dips where the blackbody is smooth
        ratio = s.values / w.values
        assert ratio.max() / ratio.min() > 1.2
        # raw units: the table's own W/m^2/nm scale
        raw = Spectrum.new_measured_solar_spectrum(
            LO, HI, 32, 1.0, normalize=False
        )
        mid = solar.get_sunlight_intensity(float(raw.lowest_wavelength))
        assert raw.values[0] == np.float32(mid)
        assert raw.values.max() < 3.0

    def test_factor_scales(self):
        a = Spectrum.new_measured_solar_spectrum(LO, HI, 16, 1.0)
        b = Spectrum.new_measured_solar_spectrum(LO, HI, 16, 2.0)
        np.testing.assert_allclose(b.values, a.values * 2.0, rtol=1e-6)

    def test_scene_spectrum_and_json_round_trip(self, tmp_path):
        from spectral_tpu.scene.schema import (
            Light, MeasuredSolar, Scene, SceneSpectrum, SpectrumEffectType,
        )
        from spectral_tpu.utils import sceneio

        sun = SceneSpectrum.new(
            "real sun", MeasuredSolar(1.5), SpectrumEffectType.EMISSIVE,
            n=16,
        )
        sc = Scene(
            width=8, height=8, nbr_of_iterations=1,
            lights=[Light((0.0, 5.0, 0.0), sun, "sun")],
            objects=[], spectra=[sun], materials=[],
            spectrum_number_of_samples=16,
        )
        sc.validate()
        p = tmp_path / "sun.json"
        sceneio.save_scene(sc, p)
        back = sceneio.load_scene(p)
        assert isinstance(back.spectra[0].spectrum_type, MeasuredSolar)
        assert back.spectra[0].spectrum_type.factor == 1.5
        np.testing.assert_array_equal(
            back.spectra[0].spectrum.values, sun.spectrum.values
        )

    def test_renders_under_measured_sun(self):
        """End-to-end: the default scene relit by the measured sun renders
        to a comparable (same order of magnitude) brightness."""
        from spectral_tpu.render.integrator import integrate_frame
        from spectral_tpu.scene import presets
        from spectral_tpu.scene.flatten import flatten_scene
        from spectral_tpu.scene.schema import MeasuredSolar

        sc = presets.default_scene()
        sc.width, sc.height = 16, 12
        sc.nbr_of_ray_bounces = 2
        base_arrays, cfg = flatten_scene(sc)
        base = np.asarray(integrate_frame(base_arrays, cfg, np.uint32(0)))
        for sp in sc.spectra:
            from spectral_tpu.scene.schema import Solar

            if isinstance(sp.spectrum_type, Solar):
                sp.spectrum_type = MeasuredSolar(sp.spectrum_type.factor)
                sp.regenerate(
                    sp.spectrum.lowest_wavelength,
                    sp.spectrum.highest_wavelength,
                    sp.spectrum.nbr_of_samples,
                )
        arrays, cfg = flatten_scene(sc)
        got = np.asarray(integrate_frame(arrays, cfg, np.uint32(0)))
        assert got.max() > 0.0
        assert 0.2 < got.max() / base.max() < 5.0
