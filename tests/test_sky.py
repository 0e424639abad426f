"""Environment emission ("sky") on ray miss — beyond-reference.

The reference's miss shader returns the zero spectrum
(``src/shader.rs:460-463``); ``Scene.sky`` replaces it with a spectral
environment term ``throughput * sky`` collected exactly once, on the
alive->miss transition. Sky-less scenes keep the absent ``SceneArrays.sky``
pytree leaf, so every compiled program is bit-identical to the pre-sky
framework (the static gate IS the tree structure).
"""

import numpy as np
import pytest

from spectral_tpu.render.integrator import integrate_frame
from spectral_tpu.scene.flatten import flatten_scene
from spectral_tpu.scene.schema import (
    Camera,
    Custom,
    Material,
    PlainReflective,
    Scene,
    SceneError,
    SceneObject,
    SceneSpectrum,
    SpectrumEffectType,
    Sphere,
    Temperature,
)


def _open_scene(n=16, bounces=3, sky_factor=0.8, with_sky=True,
                metallic=0.0):
    """A lone sphere in front of the camera with open background."""
    sky = SceneSpectrum.new(
        "sky", Temperature(6500.0, sky_factor), SpectrumEffectType.EMISSIVE,
        n=n,
    )
    grey = SceneSpectrum.new(
        "grey", PlainReflective(0.6), SpectrumEffectType.REFLECTIVE, n=n
    )
    lamp = SceneSpectrum.new(
        "lamp", Temperature(5000.0, 3.0), SpectrumEffectType.EMISSIVE, n=n
    )
    mat = Material(metallic, 0.1, grey, "grey mat")
    from spectral_tpu.scene.schema import Light

    sc = Scene(
        width=24,
        height=16,
        nbr_of_iterations=2,
        nbr_of_ray_bounces=bounces,
        camera=Camera(position=(0.0, 0.0, -4.0)),
        lights=[Light((3.0, 4.0, -3.0), lamp, "lamp")],
        objects=[SceneObject((0.0, 0.0, 2.0), Sphere(1.2), mat, "ball")],
        spectra=[sky, grey, lamp],
        materials=[mat],
        spectrum_number_of_samples=n,
    )
    if with_sky:
        sc.sky = sky
    return sc


def test_primary_miss_is_exact_sky_color():
    sc = _open_scene()
    sc.validate()
    arrays, config = flatten_scene(sc)
    rgb = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    # corner pixel: primary ray misses the sphere -> radiance == sky
    # exactly (throughput 1), so the pixel is the sky's own RGB
    want = np.array(sc.sky.spectrum.get_rgb_early(), dtype=np.float32)
    np.testing.assert_allclose(rgb[0, 0], want, rtol=1e-5)
    # center pixel hits the sphere: not the raw sky color
    assert not np.allclose(rgb[8, 12], want, rtol=1e-3)


def test_zero_sky_matches_no_sky_bitwise():
    """An all-zero sky spectrum must change nothing: the sky term is
    exactly zero everywhere, pinning the mask/ordering of the new code."""
    sc = _open_scene(with_sky=False)
    arrays0, config = flatten_scene(sc)
    assert arrays0.sky is None
    base = np.asarray(integrate_frame(arrays0, config, np.uint32(0)))

    sc2 = _open_scene(with_sky=True)
    zero = SceneSpectrum.new(
        "zero sky", Custom(), SpectrumEffectType.EMISSIVE, n=16,
        values=np.zeros(16, np.float32),
    )
    sc2.spectra.append(zero)
    sc2.sky = zero
    arrays1, config1 = flatten_scene(sc2)
    assert arrays1.sky is not None
    got = np.asarray(integrate_frame(arrays1, config1, np.uint32(0)))
    np.testing.assert_array_equal(base, got)


def test_indirect_sky_light_brightens_geometry():
    """Bounce rays that escape must collect sky through the albedo: the
    sphere's camera-facing side gets brighter with a sky than without."""
    dark = _open_scene(with_sky=False, bounces=3)
    lit = _open_scene(with_sky=True, bounces=3)
    a0, c0 = flatten_scene(dark)
    a1, c1 = flatten_scene(lit)
    rgb0 = np.asarray(integrate_frame(a0, c0, np.uint32(0)))
    rgb1 = np.asarray(integrate_frame(a1, c1, np.uint32(0)))
    center0 = rgb0[8, 12].mean()
    center1 = rgb1[8, 12].mean()
    assert center1 > center0 + 1e-4


def test_specular_miss_collects_sky():
    """A mirror sphere reflects the environment (bounce-1 miss)."""
    sc = _open_scene(with_sky=True, metallic=1.0, bounces=3)
    arrays, config = flatten_scene(sc)
    rgb = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    # mirror center pixel reflects some escaped direction: throughput is
    # the (clamped) grey albedo times sky -> strictly positive
    assert rgb[8, 12].min() > 0.0


def test_pallas_matches_jnp_unrolled_and_fori():
    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas

    sc = _open_scene(bounces=3)
    arrays, config = flatten_scene(sc)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    want = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    got = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(0), obj_types, interpret=True
        )
    )
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(got - want).max() / scale < 1e-5

    # fori object loop (many objects): add an icosphere mesh
    from spectral_tpu.scene.mesh import icosphere

    sc2 = _open_scene(bounces=2)
    sc2.objects.append(
        SceneObject(
            (2.5, 0.0, 3.0), icosphere(1.0, 2), sc2.materials[0], "mesh"
        )
    )
    arrays2, config2 = flatten_scene(sc2)
    assert config2.n_objects > 64
    obj_types2 = tuple(np.asarray(arrays2.obj_type).tolist())
    want2 = np.asarray(integrate_frame(arrays2, config2, np.uint32(0)))
    got2 = np.asarray(
        integrate_frame_pallas(
            arrays2, config2, np.uint32(0), obj_types2, interpret=True
        )
    )
    scale2 = max(1.0, float(np.abs(want2).max()))
    assert np.abs(got2 - want2).max() / scale2 < 1e-5


def test_regen_kernel_matches_per_frame_sum():
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas,
        integrate_frames_pallas_regen,
    )

    sc = _open_scene(bounces=3)
    sc.nbr_of_iterations = 3
    arrays, config = flatten_scene(sc)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    per_frame = sum(
        np.asarray(
            integrate_frame_pallas(
                arrays, config, np.uint32(f), obj_types, interpret=True
            )
        ).astype(np.float64)
        for f in range(3)
    )
    fused = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True
        )
    )
    scale = max(1.0, float(np.abs(per_frame).max()))
    assert np.abs(fused - per_frame).max() / scale < 1e-5


def test_matches_oracle():
    from tests.oracle import OracleRenderer

    sc = _open_scene(bounces=2)
    arrays, config = flatten_scene(sc)
    got = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    want = OracleRenderer(arrays, config).render_frame(0)
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want).max(axis=-1) / scale
    assert float(err.max()) < 1e-3  # grazing-silhouette envelope
    assert float(np.quantile(err, 0.99)) < 1e-5


def test_empty_scene_renders_sky_everywhere():
    sc = _open_scene(with_sky=True)
    sc.objects = []
    arrays, config = flatten_scene(sc)
    assert config.n_objects == 0
    rgb = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    want = np.array(sc.sky.spectrum.get_rgb_early(), dtype=np.float32)
    np.testing.assert_allclose(
        rgb, np.broadcast_to(want, rgb.shape), rtol=1e-5
    )


def test_validation():
    sc = _open_scene()
    rogue = SceneSpectrum.new(
        "rogue", Temperature(5000.0, 1.0), SpectrumEffectType.EMISSIVE, n=16
    )
    sc.sky = rogue  # not in sc.spectra
    with pytest.raises(SceneError, match="sky"):
        sc.validate()

    sc2 = _open_scene()
    sc2.sky = sc2.spectra[1]  # the REFLECTIVE grey spectrum
    with pytest.raises(SceneError, match="EMISSIVE"):
        sc2.validate()


def test_json_round_trip(tmp_path):
    from spectral_tpu.utils import sceneio

    sc = _open_scene()
    sc.validate()
    p = tmp_path / "sky.json"
    sceneio.save_scene(sc, p)
    back = sceneio.load_scene(p)
    assert back.sky is not None and back.sky.name == "sky"
    assert back.sky is back.spectra[0]  # reference identity preserved
    back.validate()
    a0, _ = flatten_scene(sc)
    a1, _ = flatten_scene(back)
    np.testing.assert_array_equal(np.asarray(a0.sky), np.asarray(a1.sky))

    # pre-sky scene files load with sky=None
    sc_nosky = _open_scene(with_sky=False)
    p2 = tmp_path / "nosky.json"
    sceneio.save_scene(sc_nosky, p2)
    import json

    # top-level key absent (a SPECTRUM named "sky" is still in the file,
    # so a substring check would false-positive)
    assert "sky" not in json.loads(p2.read_text())
    assert sceneio.load_scene(p2).sky is None
