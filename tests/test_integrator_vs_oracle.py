"""Whole-frame equivalence: wavefront integrator vs the recursive oracle.

The wavefront loop must reproduce the reference's depth-first recursion —
same RNG streams, same stochastic branches, same NEE shadows.

Exactness caveat: the reference spawns indirect *diffuse* rays from the
un-offset hit point (``src/shader.rs:444``, SURVEY.md §2.5), so whether a
child re-intersects its own surface at t ~ 1e-7 is a coin flip decided by
the last ulp of f32 arithmetic. Any two compilations of the *same* math
(e.g. XLA's fori_loop body vs an unrolled loop) flip some of those coins.
Therefore:

* paths with no diffuse continuation (direct-only, pure specular chains)
  are compared exactly;
* diffuse multi-bounce frames are compared statistically, with a bounded
  fraction of coin-flip pixels and a tight RMSE on the rest.
"""

import numpy as np
import pytest

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
    SceneObject,
    SceneSpectrum,
    Solar,
    SpectrumEffectType,
)
from tests.oracle import OracleRenderer


def _render_both(scene, frame_id):
    arrays, config = flatten_scene(scene)
    got = np.asarray(integrate_frame(arrays, config, np.uint32(frame_id)))
    want = OracleRenderer(arrays, config).render_frame(frame_id)
    return got, want


@pytest.mark.parametrize("preset", ["default", "cornell"])
def test_direct_only_exact(preset):
    # one bounce: camera hit + NEE only — deterministic, must match tightly
    scene = presets.PRESETS[preset]()
    scene.width, scene.height = 16, 12
    scene.nbr_of_ray_bounces = 1
    scene.nbr_of_iterations = 4
    got, want = _render_both(scene, frame_id=0)
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(got - want).max() / scale < 1e-3
    assert np.abs(got - want).max() / scale == pytest.approx(0.0, abs=1e-3)


def _mirror_corridor_scene(gap_z: float) -> Scene:
    """Camera faces a perfect mirror; the reflection looks back onto a lit
    diffuse wall behind the camera. Specular origins are offset by 1e-5, so
    the chain is deterministic — an exact multi-bounce compat test."""
    emissive = SceneSpectrum.new(
        "light", Solar(0.01), SpectrumEffectType.EMISSIVE, n=16
    )
    white = SceneSpectrum.new(
        "white", PlainReflective(1.0), SpectrumEffectType.REFLECTIVE, n=16
    )
    grey = SceneSpectrum.new(
        "grey", PlainReflective(0.7), SpectrumEffectType.REFLECTIVE, n=16
    )
    mirror = Material(1.0, 0.0, white, "mirror")
    diffuse = Material(0.0, 0.0, grey, "diffuse")
    return Scene(
        width=12,
        height=8,
        nbr_of_iterations=4,
        nbr_of_ray_bounces=3,
        camera=Camera(position=(0.0, 0.0, 0.0)),
        lights=[Light((0.0, 2.0, -1.0), emissive, "lamp")],
        objects=[
            SceneObject((0.0, 0.0, gap_z), PlainBox(8.0, 8.0, 1.0), mirror, "mirror"),
            SceneObject((0.0, 0.0, -4.0), PlainBox(8.0, 8.0, 1.0), diffuse, "back wall"),
        ],
        spectra=[emissive, white, grey],
        materials=[mirror, diffuse],
        spectrum_number_of_samples=16,
    )


def test_specular_chain_exact():
    scene = _mirror_corridor_scene(gap_z=3.0)
    got, want = _render_both(scene, frame_id=1)
    assert want.max() > 0.01  # the mirrored wall is actually lit
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(got - want).max() / scale < 1e-3


def test_specular_min_distance_gate():
    """White-box: a lane whose parent bounce was specular and whose next
    hit is closer than 1e-4 must be retired with no radiance contribution
    (reference src/shader.rs:14, 407: children shorter than the minimum
    are discarded along with their whole subtree)."""
    import jax.numpy as jnp

    from spectral_tpu.ops.vecmath import Vec3
    from spectral_tpu.render.integrator import _BounceState, _bounce

    scene = _mirror_corridor_scene(gap_z=3.0)
    arrays, config = flatten_scene(scene)
    n, s = 2, config.n_samples
    # both lanes sit 5e-5 in front of the mirror's front face (z = 2.5),
    # flying straight at it -> hit distance ~5e-5 < 1e-4
    origin = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, 2.5 - 5e-5))
    direction = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    state = _BounceState(
        origin=origin,
        direction=direction,
        throughput=jnp.ones((n, s)),
        radiance=jnp.zeros((n, s)),
        alive=jnp.ones(n, dtype=bool),
        # lane 0: specular parent (gated); lane 1: diffuse parent (not gated)
        pending_gate=jnp.array([True, False]),
        ray_count=jnp.float32(0.0),
        hero_idx=jnp.full((n,), -1, jnp.int32),
    )
    out = _bounce(
        state,
        jnp.uint32(3),
        jnp.uint32(0),
        jnp.zeros(n, jnp.uint32),
        jnp.zeros(n, jnp.uint32),
        arrays,
        config,
    )
    assert not bool(out.alive[0])  # gated lane dies
    assert float(jnp.abs(out.radiance[0]).max()) == 0.0
    assert bool(out.alive[1])  # ungated lane continues


@pytest.mark.parametrize("preset,budget", [("default", 0.25), ("cornell", 0.25)])
def test_three_bounces_statistical(preset, budget):
    """Diffuse chains: allow the coin-flip pixel fraction, require the rest
    to match at f32 noise level."""
    scene = presets.PRESETS[preset]()
    scene.width, scene.height = 12, 10
    scene.nbr_of_ray_bounces = 3
    scene.nbr_of_iterations = 4
    diverged = 0
    total = 0
    agree_err = []
    for frame_id in range(3):
        got, want = _render_both(scene, frame_id)
        scale = max(1.0, float(np.abs(want).max()))
        err = np.abs(got - want).max(axis=-1) / scale
        diverged += int((err > 1e-3).sum())
        total += err.size
        agree_err.append(err[err <= 1e-3])
    frac = diverged / total
    assert frac <= budget, f"{frac:.1%} coin-flip pixels (budget {budget:.0%})"
    # the agreeing majority must agree to f32 rounding noise
    agree = np.concatenate(agree_err)
    assert len(agree) > 0.5 * total
    assert float(agree.max()) < 1e-3


def test_different_frames_differ():
    scene = presets.default_scene()
    scene.width, scene.height = 16, 12
    scene.nbr_of_ray_bounces = 2
    scene.nbr_of_iterations = 8
    arrays, config = flatten_scene(scene)
    f0 = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    f1 = np.asarray(integrate_frame(arrays, config, np.uint32(1)))
    assert not np.array_equal(f0, f1)  # jitter + RNG must vary per frame


def test_sphere_field_subset_matches_oracle():
    """Mixed diffuse/mirror materials at moderate object count (chunked
    trace path feeds the same integrator)."""
    scene = presets.sphere_field(n_spheres=25)
    scene.width, scene.height = 10, 8
    scene.nbr_of_ray_bounces = 2
    scene.nbr_of_iterations = 3
    got, want = _render_both(scene, frame_id=2)
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want).max(axis=-1) / scale
    flips = int((err > 1e-3).sum())
    assert flips <= 0.25 * err.size
    assert float(err[err <= 1e-3].max()) < 1e-3


def test_max_spectral_width_direct_only():
    """128 wavelength samples (the reference's maximum) through the whole
    pipeline, exact at one bounce."""
    scene = presets.default_scene(n_samples=128)
    scene.width, scene.height = 12, 8
    scene.nbr_of_ray_bounces = 1
    scene.nbr_of_iterations = 2
    got, want = _render_both(scene, frame_id=0)
    scale = max(1.0, float(np.abs(want).max()))
    assert float(np.abs(got - want).max() / scale) < 1e-3
