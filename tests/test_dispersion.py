"""Beyond-reference physics: refraction, dispersion, emissive surfaces.

These capabilities are absent from the reference (its README motivates
dispersion but no refraction code exists — SURVEY.md §2.12); they are
validated against analytic optics rather than the oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spectral_tpu.ops.sampling import refract_or_reflect
from spectral_tpu.ops.vecmath import Vec3
from spectral_tpu.render.integrator import integrate_frame
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import flatten_scene
from spectral_tpu.scene.schema import (
    Camera,
    Light,
    Material,
    PlainBox,
    PlainReflective,
    Scene,
    SceneError,
    SceneObject,
    SceneSpectrum,
    Solar,
    SpectrumEffectType,
    Temperature,
)


def _vec(x, y, z):
    return Vec3(jnp.float32([x]), jnp.float32([y]), jnp.float32([z]))


class TestRefraction:
    def test_snell_angle(self):
        # 45 deg incidence onto n=1.5 glass: sin(t) = sin(45)/1.5
        d = _vec(np.sin(np.pi / 4), -np.cos(np.pi / 4), 0.0)
        n = _vec(0.0, 1.0, 0.0)
        out, reflected, n_or = refract_or_reflect(
            d, n, jnp.float32([1.5]), jnp.float32([0.99])  # force refraction
        )
        assert not bool(reflected[0])
        sin_t = float(out.x[0]) / float(out.magnitude()[0])
        assert sin_t == pytest.approx(np.sin(np.pi / 4) / 1.5, abs=1e-6)
        assert float(out.y[0]) < 0  # continues downward into the medium
        assert float(n_or.y[0]) == 1.0  # oriented against the incident ray

    def test_normal_incidence_goes_straight(self):
        d = _vec(0.0, -1.0, 0.0)
        n = _vec(0.0, 1.0, 0.0)
        out, reflected, _ = refract_or_reflect(
            d, n, jnp.float32([1.5]), jnp.float32([0.99])
        )
        assert not bool(reflected[0])
        assert float(out.x[0]) == 0.0 and float(out.z[0]) == 0.0

    def test_total_internal_reflection(self):
        # exiting glass at 60 deg > critical angle asin(1/1.5) ~ 41.8 deg
        d = _vec(np.sin(np.pi / 3), np.cos(np.pi / 3), 0.0)
        n = _vec(0.0, 1.0, 0.0)  # outward normal; ray exits from below
        out, reflected, n_or = refract_or_reflect(
            d, n, jnp.float32([1.5]), jnp.float32([0.99])
        )
        assert bool(reflected[0])  # TIR regardless of the fresnel draw
        assert float(n_or.y[0]) == -1.0
        # mirror: x preserved, y flipped
        assert float(out.x[0]) == pytest.approx(np.sin(np.pi / 3), abs=1e-6)
        assert float(out.y[0]) == pytest.approx(-np.cos(np.pi / 3), abs=1e-6)

    def test_fresnel_reflects_at_grazing(self):
        # grazing incidence: Schlick -> ~1, tiny draw still reflects
        d = _vec(0.9999, -0.0141, 0.0)
        n = _vec(0.0, 1.0, 0.0)
        _, reflected, _ = refract_or_reflect(
            d, n, jnp.float32([1.5]), jnp.float32([0.5])
        )
        assert bool(reflected[0])

    def test_dispersion_blue_bends_more(self):
        d = _vec(np.sin(np.pi / 4), -np.cos(np.pi / 4), 0.0)
        n = _vec(0.0, 1.0, 0.0)
        cauchy = lambda lam_um: 1.5046 + 0.0042 / lam_um**2
        outs = {}
        for name, lam in (("blue", 0.38), ("red", 0.78)):
            out, _, _ = refract_or_reflect(
                d, n, jnp.float32([cauchy(lam)]), jnp.float32([0.99])
            )
            outs[name] = float(out.x[0]) / float(out.magnitude()[0])
        assert outs["blue"] < outs["red"]  # higher n -> smaller sin(theta_t)


def _emissive_panel_scene(n=16):
    emis = SceneSpectrum.new(
        "emit", Temperature(5000.0, 2.0), SpectrumEffectType.EMISSIVE, n=n
    )
    black = SceneSpectrum.new(
        "black", PlainReflective(0.0), SpectrumEffectType.REFLECTIVE, n=n
    )
    panel = Material(0.0, 0.0, black, "panel", emission=emis)
    return Scene(
        width=8,
        height=6,
        nbr_of_iterations=2,
        nbr_of_ray_bounces=1,
        camera=Camera(position=(0.0, 0.0, -2.0)),
        lights=[],
        objects=[SceneObject((0.0, 0.0, 2.0), PlainBox(8.0, 8.0, 1.0), panel, "panel")],
        spectra=[emis, black],
        materials=[panel],
        spectrum_number_of_samples=n,
    ), emis


class TestEmission:
    def test_hit_emissive_panel_yields_its_spectrum(self):
        scene, emis = _emissive_panel_scene()
        arrays, config = flatten_scene(scene)
        rgb = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
        want = np.array(emis.spectrum.get_rgb_early(), dtype=np.float32)
        # every camera ray hits the panel head-on: pure emission, T = 1
        assert np.allclose(rgb, want[None, None, :], rtol=1e-4)

    def test_emission_validation(self):
        scene, emis = _emissive_panel_scene()
        scene.spectra.remove(emis)
        with pytest.raises(SceneError, match="emission spectrum"):
            scene.validate()


class TestHeroWavelength:
    def test_hero_collapse_sets_onehot_throughput(self):
        from spectral_tpu.render.integrator import _BounceState, _bounce

        scene = presets.prism(n_samples=16)
        scene.width, scene.height = 4, 2
        arrays, config = flatten_scene(scene)
        n, s = 8, 16
        # lanes flying straight at the glass slab front face
        origin = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, -2.0))
        direction = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
        state = _BounceState(
            origin, direction,
            jnp.ones((n, s)), jnp.zeros((n, s)),
            jnp.ones(n, bool), jnp.zeros(n, bool), jnp.float32(0),
            jnp.full(n, -1, jnp.int32),
        )
        out = _bounce(
            state, jnp.uint32(4), jnp.uint32(0),
            jnp.arange(n, dtype=jnp.uint32), jnp.zeros(n, jnp.uint32),
            arrays, config,
        )
        hero = np.asarray(out.hero_idx)
        thr = np.asarray(out.throughput)
        assert np.all(hero >= 0)  # all lanes hit dispersive glass
        for i in range(n):
            nz = np.nonzero(thr[i])[0]
            assert len(nz) == 1 and nz[0] == hero[i]
            assert thr[i, hero[i]] == pytest.approx(s, rel=1e-6)

    @staticmethod
    def _red_blue_centroid_split(cauchy_b: float, frames: int = 10) -> float:
        scene = presets.prism(n_samples=16)
        scene.width, scene.height = 64, 32
        scene.nbr_of_iterations = frames
        scene.nbr_of_ray_bounces = 4
        scene.materials[0].cauchy_b_um2 = cauchy_b
        arrays, config = flatten_scene(scene)
        img = np.mean(
            [
                np.asarray(integrate_frame(arrays, config, np.uint32(f)))
                for f in range(frames)
            ],
            axis=0,
        )
        band = img[8:24].copy()
        band[band < 0.1 * band.max()] = 0.0  # mask background noise
        xs = np.arange(band.shape[1])

        def centroid(c):
            w = band[..., c].sum(axis=0)
            return float((xs * w).sum() / max(w.sum(), 1e-6))

        return centroid(0) - centroid(2)

    def test_prism_disperses_spatially(self):
        """Red and blue images of the strip separate along x when and only
        when the glass is dispersive. Exaggerated Cauchy term so the
        separation is super-pixel at test resolution (the BK7 value gives
        a physically correct ~0.02 px at 64 px wide)."""
        split = self._red_blue_centroid_split(cauchy_b=0.05)
        control = self._red_blue_centroid_split(cauchy_b=0.0)
        assert abs(split) > 0.2, f"no chromatic separation: {split:.3f}px"
        assert abs(control) < 0.05, f"control not achromatic: {control:.3f}px"


class TestOracleEquivalence:
    def test_prism_matches_recursive_oracle(self):
        """Full-path validation of refraction + hero collapse + emission
        against the independent scalar recursion (tests/oracle.py)."""
        from tests.oracle import OracleRenderer

        scene = presets.prism(n_samples=8)
        scene.width, scene.height = 12, 8
        scene.nbr_of_ray_bounces = 4
        scene.nbr_of_iterations = 2
        arrays, config = flatten_scene(scene)
        got = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
        want = OracleRenderer(arrays, config).render_frame(0)
        scale = max(1.0, float(np.abs(want).max()))
        err = np.abs(got - want).max(axis=-1) / scale
        flips = int((err > 1e-3).sum())
        # glass grazing/Fresnel boundaries flip on last-ulp differences
        assert flips <= 0.15 * err.size
        assert float(err[err <= 1e-3].max()) < 1e-5


class TestCompatUnchanged:
    def test_reference_scene_materials_have_no_new_physics(self):
        for preset in ("default", "cornell"):
            scene = presets.PRESETS[preset]()
            arrays, _ = flatten_scene(scene)
            assert not np.asarray(arrays.transmission).any()
            assert not np.asarray(arrays.emission).any()
