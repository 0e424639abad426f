"""Randomized-scene equivalence fuzz.

Seeded random scenes (mixed sphere/box/rotated-box geometry, random
materials and lights) rendered three ways — the scalar recursive oracle
(tests/oracle.py), the wavefront jnp integrator, and the Pallas
megakernel in interpret mode — must agree. Direct-only renders
(``nbr_of_ray_bounces=1``) have no diffuse-continuation coin-flip hazard
(SURVEY.md §2.5), so the comparison is tight everywhere; a structured
preset can only cover the geometry/material combinations someone thought
of, while the fuzz sweeps arbitrary overlaps, off-axis rotations, and
metallic/diffuse mixes with the same rigor.
"""

import numpy as np
import pytest

from spectral_tpu.render.integrator import integrate_frame
from spectral_tpu.render.pallas_integrator import integrate_frame_pallas
from spectral_tpu.scene.flatten import flatten_scene
from spectral_tpu.scene.schema import (
    Camera,
    Light,
    Material,
    PlainBox,
    PlainReflective,
    RotatedBox,
    Scene,
    SceneObject,
    SceneSpectrum,
    Solar,
    Sphere,
    SpectrumEffectType,
)
from tests.oracle import OracleRenderer


def _random_scene(seed: int, bounces: int = 1) -> Scene:
    rng = np.random.default_rng(seed)
    emis = SceneSpectrum.new(
        "sun", Solar(float(rng.uniform(0.5, 2.0))),
        SpectrumEffectType.EMISSIVE, n=8,
    )
    spectra = [emis]
    materials = []
    for i in range(int(rng.integers(2, 4))):
        refl = SceneSpectrum.new(
            f"refl{i}", PlainReflective(float(rng.uniform(0.2, 0.95))),
            SpectrumEffectType.REFLECTIVE, n=8,
        )
        spectra.append(refl)
        materials.append(
            Material(
                metallicness=float(rng.choice([0.0, 1.0, rng.uniform()])),
                roughness=float(rng.uniform(0.0, 0.5)),
                spectrum=refl,
                name=f"m{i}",
            )
        )
    objects = []
    for i in range(int(rng.integers(3, 7))):
        pos = tuple(float(v) for v in rng.uniform([-4, -3, 2], [4, 3, 10]))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            ot = Sphere(radius=float(rng.uniform(0.3, 1.5)))
        elif kind == 1:
            ot = PlainBox(*(float(v) for v in rng.uniform(0.5, 2.5, 3)))
        else:
            ot = RotatedBox(
                *(float(v) for v in rng.uniform(0.5, 2.5, 3)),
                *(float(v) for v in rng.uniform(-1.5, 1.5, 3)),
            )
        objects.append(
            SceneObject(
                pos, ot, materials[int(rng.integers(len(materials)))],
                name=f"o{i}",
            )
        )
    lights = [
        Light(
            tuple(float(v) for v in rng.uniform([-6, 2, -2], [6, 8, 12])),
            emis, f"L{j}",
        )
        for j in range(int(rng.integers(1, 3)))
    ]
    scene = Scene(
        width=10,
        height=8,
        nbr_of_iterations=4,
        nbr_of_ray_bounces=bounces,
        camera=Camera((0.0, 0.0, -3.0), (0.0, 0.0, 1.0), (0.0, 1.0, 0.0), 55.0),
        lights=lights,
        objects=objects,
        spectra=spectra,
        materials=materials,
        spectrum_number_of_samples=8,
    )
    scene.validate()
    return scene


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_fuzz_direct_only_oracle_jnp_pallas(seed):
    scene = _random_scene(seed, bounces=1)
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    for frame in (0, 3):
        want = OracleRenderer(arrays, config).render_frame(frame)
        got = np.asarray(integrate_frame(arrays, config, np.uint32(frame)))
        pal = np.asarray(
            integrate_frame_pallas(
                arrays, config, np.uint32(frame), obj_types, interpret=True
            )
        )
        scale = max(1.0, float(np.abs(want).max()))
        assert float(np.abs(got - want).max()) / scale < 1e-3
        assert float(np.abs(pal - got).max()) / scale < 1e-4


@pytest.mark.parametrize("seed", [7, 23])
def test_fuzz_specular_chain_oracle_jnp(seed):
    """3-bounce fuzz with all materials forced mirror (metallicness 1,
    roughness 0): specular chains use OFFSET origins, so there is no
    un-offset coin-flip hazard and the recursion must match tightly even
    multi-bounce (misses terminate; the budget caps depth)."""
    scene = _random_scene(seed, bounces=3)
    for m in scene.materials:
        m.metallicness = 1.0
        m.roughness = 0.0
    arrays, config = flatten_scene(scene)
    want = OracleRenderer(arrays, config).render_frame(1)
    got = np.asarray(integrate_frame(arrays, config, np.uint32(1)))
    scale = max(1.0, float(np.abs(want).max()))
    assert float(np.abs(got - want).max()) / scale < 1e-3
