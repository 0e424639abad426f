"""Pallas megakernel vs the jnp integrator (interpret mode on CPU).

The megakernel must reproduce the jnp path's semantics. Deterministic
paths (direct lighting) match to f32 rounding; diffuse multi-bounce paths
sit inside the reference's 1-ulp coin-flip envelope (see
test_integrator_vs_oracle.py for why exactness is impossible there).

Interpret mode is slow, so scenes here are tiny.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.render.integrator import integrate_frame
from spectral_tpu.render.pallas_integrator import integrate_frame_pallas
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import flatten_scene


def _pair(preset, w, h, bounces, samples=8):
    scene = presets.PRESETS[preset](n_samples=samples)
    scene.width, scene.height = w, h
    scene.nbr_of_ray_bounces = bounces
    scene.nbr_of_iterations = 2
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    return arrays, config, obj_types


@pytest.mark.parametrize("preset", ["default", "cornell"])
def test_direct_only_matches_jnp(preset):
    arrays, config, obj_types = _pair(preset, 16, 8, bounces=1)
    want = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    got = np.asarray(
        integrate_frame_pallas(arrays, config, np.uint32(0), obj_types, interpret=True)
    )
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(got - want).max() / scale < 1e-5


def test_multibounce_within_coinflip_envelope():
    """Stochastic multibounce scene: flips at the un-offset diffuse
    origin are irreducible across two compiled programs (see
    test_multibounce_deterministic_zero_flips for the flip-free
    equivalence pin); here the flip BUDGET is bounded and every
    non-flipped pixel must agree to 1e-5 — a semantic regression shows
    up as either mass flips or loose agreement."""
    arrays, config, obj_types = _pair("cornell", 16, 8, bounces=3)
    want = np.asarray(integrate_frame(arrays, config, np.uint32(1)))
    got = np.asarray(
        integrate_frame_pallas(arrays, config, np.uint32(1), obj_types, interpret=True)
    )
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want).max(axis=-1) / scale
    flips = int((err > 1e-3).sum())
    assert flips <= 0.15 * err.size
    agree = err[err <= 1e-3]
    assert len(agree) >= 0.85 * err.size
    assert float(agree.max()) < 1e-5


def _periscope_scene(bounces=3, samples=8):
    """Deterministic 3-bounce scene with NO coin-flip hazard: camera rays
    reflect off two 45-degree mirrors (metal=1, offset origins — no
    self-intersection coin) and land on a diffuse wall exactly at the
    LAST bounce, so the un-offset diffuse continuation (the 1-ulp
    self-intersection coin, SURVEY.md section 2.5) is never traced. Every
    lane's path is fully determined by geometry, which pins pallas-vs-jnp
    equivalence to pure f32 rounding on a genuinely multibounce scene."""
    from spectral_tpu.scene import schema as S

    base = presets.default_scene()
    refl = [
        sp for sp in base.spectra if sp.effect_type.name == "REFLECTIVE"
    ][0]
    emis = [sp for sp in base.spectra if sp.effect_type.name == "EMISSIVE"][0]
    mirror = S.Material(1.0, 0.0, refl, "mirror")
    diffuse = S.Material(0.0, 0.0, refl, "wall")
    quarter = float(np.pi / 4)
    scene = S.Scene(
        width=12, height=8, nbr_of_iterations=2, nbr_of_ray_bounces=bounces,
        camera=S.Camera(
            position=(0.0, 0.0, 0.0), direction=(0.0, 0.0, 1.0),
            up=(0.0, 1.0, 0.0), fov_y_deg=30.0,
        ),
        lights=[S.Light((0.0, 4.0, 9.0), emis, "lamp")],
        objects=[
            # periscope: +z -> up -> +z -> diffuse wall
            S.SceneObject(
                (0.0, 0.0, 6.0),
                S.RotatedBox(4.0, 4.0, 0.2, quarter, 0.0, 0.0), mirror, "M1",
            ),
            S.SceneObject(
                (0.0, 4.0, 6.0),
                S.RotatedBox(4.0, 4.0, 0.2, quarter, 0.0, 0.0), mirror, "M2",
            ),
            S.SceneObject(
                (0.0, 4.0, 12.0), S.PlainBox(8.0, 8.0, 0.2), diffuse, "wall",
            ),
        ],
        spectra=base.spectra,
        materials=[mirror, diffuse],
        spectrum_number_of_samples=samples,
    )
    scene.update_all_spectrum_sample_sizes()
    scene.validate()
    return scene


def test_multibounce_deterministic_zero_flips():
    """Megakernel vs jnp on the periscope scene (VERDICT r2 #7): a REAL
    multibounce path (mirror -> mirror -> diffuse NEE) with the coin-flip
    hazard excluded by construction — so the equivalence bound is
    1e-4-class on EVERY pixel, not a flip-budget envelope. A semantic
    regression anywhere in the specular chain, gate, NEE, or throughput
    product cannot hide here."""
    arrays, config = flatten_scene(_periscope_scene())
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    for frame in (0, 1):
        want = np.asarray(integrate_frame(arrays, config, np.uint32(frame)))
        got = np.asarray(
            integrate_frame_pallas(
                arrays, config, np.uint32(frame), obj_types, interpret=True
            )
        )
        # the scene must actually exercise the 3-bounce chain
        assert float(want.max()) > 0.1
        assert int((want.max(-1) > 1e-6).sum()) > 20
        scale = max(1.0, float(np.abs(want).max()))
        assert float(np.abs(got - want).max()) / scale < 1e-4  # zero flips


def test_unique_materials_shade_by_object_rows():
    """Same periscope scene, but every object owns a UNIQUE material, so
    ``n_materials == n_objects`` and build_megakernel's material-indexed
    shading (``mat_shade``) stays OFF — this pins the per-object-row
    shading branch, which presets no longer reach (they all share
    materials, so they shade via the material table). Guards both the
    branch itself and the `_mat_light_tables` predicate staying in sync
    with build_megakernel (a drift ships the wrong SMEM table variant)."""
    from spectral_tpu.scene import schema as S

    scene = _periscope_scene()
    # give each object its own material copy (unique identity, same values)
    new_mats = []
    for obj in scene.objects:
        m = obj.material.copy()
        m.name = f"{m.name}@{obj.name}"
        obj.material = m
        new_mats.append(m)
    scene.materials = new_mats
    scene.validate()
    arrays, config = flatten_scene(scene)
    assert config.n_materials == config.n_objects  # mat_shade off
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    want = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    got = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(0), obj_types, interpret=True
        )
    )
    assert float(want.max()) > 0.1
    scale = max(1.0, float(np.abs(want).max()))
    assert float(np.abs(got - want).max()) / scale < 1e-4


def test_transmission_emission_matches_jnp():
    """Megakernel v2 physics: refraction + hero wavelength + emission."""
    scene = presets.prism(n_samples=8)
    scene.width, scene.height = 12, 8
    scene.nbr_of_ray_bounces = 4
    scene.nbr_of_iterations = 2
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    want = np.asarray(integrate_frame(arrays, config, np.uint32(0)))
    got = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(0), obj_types, interpret=True,
            has_transmission=True, has_emission=True,
        )
    )
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want).max(axis=-1) / scale
    flips = int((err > 1e-3).sum())
    assert flips <= 0.1 * err.size
    agree = err[err <= 1e-3]
    assert float(agree.max()) < 1e-5  # everything but coin flips is exact-ish


def test_sharded_pallas_step_direct_only():
    import jax
    import jax.numpy as jnp

    from spectral_tpu.parallel.mesh import make_mesh, row_sharding
    from spectral_tpu.parallel.sharding import (
        build_sharded_pallas_step,
        shard_scene,
    )
    from spectral_tpu.render.integrator import render_frame_step

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    arrays, config, obj_types = _pair("cornell", 16, 16, bounces=1)
    want = np.asarray(
        render_frame_step(arrays, config, jnp.zeros((16, 16, 4)), jnp.uint32(0))
    )
    mesh = make_mesh(8)
    arr_s, acc_sh = shard_scene(arrays, row_sharding(mesh), config)
    step = build_sharded_pallas_step(mesh, config, obj_types, interpret=True)
    got = np.asarray(
        step(arr_s, jax.device_put(jnp.zeros((16, 16, 4)), acc_sh), jnp.uint32(0))
    )
    # global pixel coordinates must be preserved across shards: a row
    # offset bug would show O(1) errors, compilation noise stays tiny
    assert np.abs(got - want).max() < 1e-4


def test_split_compaction_bit_exact():
    """The bounce-split + live-lane-permutation path must be bit-identical
    to the monolithic kernel (the permutation carries RNG coordinates with
    the lanes; no paths are dropped)."""
    from spectral_tpu.render.pallas_integrator import integrate_frame_pallas_split

    arrays, config, obj_types = _pair("cornell", 16, 8, bounces=6)
    mono = np.asarray(
        integrate_frame_pallas(arrays, config, np.uint32(1), obj_types, interpret=True)
    )
    split = np.asarray(
        integrate_frame_pallas_split(
            arrays, config, np.uint32(1), obj_types, split=3, interpret=True
        )
    )
    assert np.array_equal(mono, split)


@pytest.mark.parametrize("preset,n", [("cornell", None), ("spheres", 12)])
def test_fori_object_loop_matches_jnp(preset, n):
    """The fori object loop (many-object scenes: runtime type dispatch +
    material indirection) must reproduce the jnp integrator across all
    three primitive types and mixed materials."""
    if preset == "spheres":
        scene = presets.sphere_field(n_spheres=n)
    else:
        scene = presets.PRESETS[preset](n_samples=8)
    scene.width, scene.height = 12, 8
    scene.nbr_of_ray_bounces = 3
    scene.nbr_of_iterations = 2
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    want = np.asarray(integrate_frame(arrays, config, np.uint32(1)))
    got = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(1), obj_types, interpret=True,
            object_loop="fori",
        )
    )
    scale = max(1.0, float(np.abs(want).max()))
    err = np.abs(got - want).max(axis=-1) / scale
    flips = int((err > 1e-3).sum())
    assert flips <= 0.1 * err.size
    assert float(err[err <= 1e-3].max()) < 1e-5



def _phase_scene():
    """Canonical scene for every phased/cascade test below: ONE
    (scene, tile) configuration so the interpret-mode kernel segments
    compile once per pytest process (_kernel/_kernel_seg LRU-cache on the
    static config) — sharing it cut this module's wall time roughly in
    half. 2048 lanes = 2 min-size tiles; occupancy facts the tests rely
    on: >1024 lanes alive entering bounce 1, <=1024 entering bounce 2."""
    sc = presets.sphere_field(n_spheres=12, n_samples=8)
    sc.width, sc.height = 16, 128
    sc.nbr_of_ray_bounces = 5
    sc.nbr_of_iterations = 2
    return sc


def test_phased_matches_monolithic():
    """The occupancy-compacted two-phase path is bit-identical to the
    monolithic kernel when capacity is not exceeded (lanes extracted in
    ascending order, RNG streams travel with px/py)."""
    arrays, config = flatten_scene(_phase_scene())
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    mono = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(1), obj_types, tile=1024, interpret=True
        )
    )
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas_phased,
    )

    phased, overflow = integrate_frame_pallas_phased(
        arrays, config, np.uint32(1), obj_types, split=2,
        capacity_lanes=1024, tile=1024, interpret=True,
    )
    assert not bool(overflow)
    assert np.array_equal(mono, np.asarray(phased))


def test_phased_reports_overflow():
    arrays, config = flatten_scene(_phase_scene())
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas_phased,
    )

    # capacity of one tile CAN hold the survivors (previous test); split
    # at bounce 1 with a fully-occupied wavefront cannot: 2048 live > 1024
    _rgb, overflow = integrate_frame_pallas_phased(
        arrays, config, np.uint32(1), obj_types, split=1,
        capacity_lanes=1024, tile=1024, interpret=True,
    )
    assert bool(overflow)


def test_renderer_phased_pipeline_and_fallback():
    """Renderer-level phased mode: one-frame-deep pipelined overflow
    check, exact monolithic fallback on overflow, flush before fetch."""
    import jax.numpy as jnp

    from spectral_tpu.render.renderer import Renderer, _blend

    scene = _phase_scene

    from spectral_tpu.render.renderer import _mono_rgb

    arrays, config = flatten_scene(scene())
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    # expected: monolithic frames through the renderer's own jitted
    # fallback path + blend
    want = jnp.zeros((config.height, config.width, 4), jnp.float32)
    for f in range(2):
        rgb = _mono_rgb(
            arrays, config, jnp.uint32(f), obj_types, False, False, True,
            1024, None,
        )
        want = _blend(want, rgb, jnp.uint32(f))
    want = np.asarray(want)

    r = Renderer(
        scene(), phase_split=2, phase_capacity=1024,
        _interpret=True, _phase_tile=1024,
    )
    got = r.render_frames(2)  # frame 0 warmup path, frame 1 fused path
    assert r.overflow_frames == 0
    # kernels are bit-exact (test_phased_matches_monolithic, eager); the
    # outer jits fuse the raygen/RGB glue differently -> last-ulp drift
    assert np.allclose(got, want, rtol=2e-6, atol=1e-6)

    # split=1 leaves ~all 2048 lanes alive > capacity 1024: the frame
    # overflows; the flush path re-renders it monolithically — bit-exact,
    # it IS the same jitted program as `want`
    want1 = np.asarray(
        _blend(
            jnp.zeros((config.height, config.width, 4), jnp.float32),
            _mono_rgb(
                arrays, config, jnp.uint32(0), obj_types, False, False,
                True, 1024, None,
            ),
            jnp.uint32(0),
        )
    )
    r2 = Renderer(
        scene(), phase_split=1, phase_capacity=1024,
        _interpret=True, _phase_tile=1024,
    )
    got2 = r2.render_frames(1)  # framebuffer() flush resolves the overflow
    assert r2.overflow_frames == 1
    assert np.array_equal(got2, want1)


def test_cascade_matches_monolithic():
    """The N-stage cascade (two successive compactions) is bit-identical
    to the monolithic kernel when no stage overflows."""
    arrays, config = flatten_scene(_phase_scene())
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    mono = np.asarray(
        integrate_frame_pallas(
            arrays, config, np.uint32(1), obj_types, tile=1024, interpret=True
        )
    )
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas_cascade,
    )

    rgb, overflow = integrate_frame_pallas_cascade(
        arrays, config, np.uint32(1), obj_types,
        stages=((2, 1024), (3, 1024)), tile=1024, interpret=True,
    )
    assert not bool(overflow)
    assert np.array_equal(mono, np.asarray(rgb))


def test_cascade_overflow_any_stage():
    """Overflow is reported when ANY stage's live count exceeds its
    capacity — including a later stage after a roomy first one. Inside
    the closed Cornell box nearly every lane survives every bounce, so a
    half-wavefront capacity at stage 2 must overflow even though stage 1
    (full capacity) cannot."""
    scene = presets.cornell_box(n_samples=8)
    scene.width, scene.height = 16, 128  # 2048 lanes
    scene.nbr_of_ray_bounces = 5
    scene.nbr_of_iterations = 2
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas_cascade,
    )

    _rgb, overflow = integrate_frame_pallas_cascade(
        arrays, config, np.uint32(1), obj_types,
        stages=((1, 2048), (3, 1024)), tile=1024, interpret=True,
    )
    assert bool(overflow)


def test_cascade_rejects_bad_splits():
    arrays, config, obj_types = _pair("default", 16, 64, 4)
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas_cascade,
    )

    for stages in (((2, 512), (2, 512)), ((3, 512), (1, 512)), ((0, 512),),
                   ((4, 512),), ()):
        with pytest.raises(ValueError):
            integrate_frame_pallas_cascade(
                arrays, config, np.uint32(0), obj_types, stages=stages,
                tile=1024, interpret=True,
            )


def test_choose_stages_cost_model():
    """The auto-tuner's enumeration: steeply decaying occupancy earns a
    cascade; flat occupancy keeps the monolithic kernel."""
    from spectral_tpu.render.renderer import choose_stages

    n_pad, tile = 786432, 8192
    # the measured 1000-sphere profile (PARITY.md)
    occ = [1.0, 0.59, 0.20, 0.094, 0.063, 0.046, 0.035, 0.029]
    stages = choose_stages(occ, n_pad, tile)
    # the calibrated model must land on the measured winner: ONE split at
    # bounce 3 (large-capacity extractions were measured 24x more
    # expensive and are ineligible; see the v5e sweep in choose_stages)
    assert stages is not None
    splits = [s for s, _ in stages]
    caps = [c for _, c in stages]
    assert splits == [3]
    assert splits == sorted(set(splits))
    assert all(c % tile == 0 for c in caps)
    assert all(b < a for a, b in zip([n_pad] + caps, caps))
    # every capacity clears the measured occupancy with real headroom
    # (1/16 caps at ~1.06x occupancy overflowed every frame on v5e)
    for s, c in stages:
        assert c >= occ[s] * n_pad * 1.3
        assert c <= 0.25 * n_pad

    # closed-box profile: occupancy never drops -> no split is worth it
    assert choose_stages([1.0] * 8, n_pad, tile) is None
    # a gentle decay where the extraction overhead exceeds the savings
    assert choose_stages([1.0, 0.97, 0.95, 0.93], n_pad, tile) is None


def test_renderer_auto_phase_and_cascade():
    """Renderer-level: phase_split='auto' probes occupancy and renders
    exactly like the monolithic path (same estimator); an explicit
    cascade tuple is honored."""
    import jax.numpy as jnp

    from spectral_tpu.render.renderer import Renderer, _blend, _mono_rgb

    scene = _phase_scene

    arrays, config = flatten_scene(scene())
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    want = jnp.zeros((config.height, config.width, 4), jnp.float32)
    for f in range(2):
        rgb = _mono_rgb(
            arrays, config, jnp.uint32(f), obj_types, False, False, True,
            1024, None,
        )
        want = _blend(want, rgb, jnp.uint32(f))
    want = np.asarray(want)

    def assert_same_estimator(got):
        # the kernels are bit-exact eager (test_cascade_matches_monolithic)
        # but the outer jits fuse the raygen/RGB glue differently, and over
        # the diffuse bounce chain a last-ulp difference flips the self-intersection
        # coin on a few paths (the documented reference-chaos envelope, see
        # test_integrator_vs_oracle.py) — so: few flipped pixels, everything
        # else at f32 rounding
        scale = max(1.0, float(np.abs(want).max()))
        err = np.abs(got - want).max(axis=-1) / scale
        flips = int((err > 1e-3).sum())
        assert flips <= 0.02 * err.size
        assert float(err[err <= 1e-3].max()) < 1e-5

    r = Renderer(
        scene(), phase_split=(2, 3), phase_capacity=(1024, 1024),
        _interpret=True, _phase_tile=1024,
    )
    assert r.phase_stages == ((2, 1024), (3, 1024))
    got = r.render_frames(2)
    assert r.overflow_frames == 0
    assert_same_estimator(got)

    r_auto = Renderer(scene(), phase_split="auto", _interpret=True,
                      _phase_tile=1024)
    got_auto = r_auto.render_frames(2)
    # auto may legitimately choose no stages (tiny wavefront: every
    # capacity rounds up to one tile); either way the image must match
    assert_same_estimator(got_auto)


def _regen_scene():
    sc = presets.default_scene()
    sc.spectrum_number_of_samples = 8
    sc.update_all_spectrum_sample_sizes()
    sc.width, sc.height = 16, 128  # 2048 lanes
    sc.nbr_of_ray_bounces = 4
    sc.nbr_of_iterations = 3
    return sc


def test_regen_matches_monolithic_sum():
    """Path regeneration (K frames per launch) computes every path
    bit-identically to the monolithic kernel — primaries are
    host-precomputed with the same raygen, RNG streams travel with the
    per-lane (frame, bounces_left) counters — so the K-frame radiance sum
    matches the sum of K monolithic frames up to pure f32 reassociation
    (no self-intersection coin flips; re-deriving raygen in-kernel was
    measured to flip ~11%/frame of pixels and rejected)."""
    from spectral_tpu.render.pallas_integrator import (
        integrate_frames_pallas_regen,
    )

    arrays, config = flatten_scene(_regen_scene())
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    mono = sum(
        np.asarray(
            integrate_frame_pallas(
                arrays, config, np.uint32(f), obj_types, interpret=True
            ),
            np.float64,
        )
        for f in range(3)
    )
    regen = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True
        ),
        np.float64,
    )
    err = np.abs(regen - mono)
    assert float(err.max()) < 1e-4  # f32 reassociation only — zero flips


def test_regen_lane_sort_bit_exact():
    """Cost-sorted pixel->lane assignment is a pure relabeling: per-pixel
    results must be BIT-identical to the unpermuted regeneration launch
    (tile membership never enters a lane's arithmetic; RNG streams and
    primaries travel with the lane). Checked for the production cost-sort
    permutation AND an adversarial random shuffle."""
    from spectral_tpu.render.pallas_integrator import (
        integrate_frames_pallas_regen,
        probe_path_cost,
    )

    arrays, config = flatten_scene(_regen_scene())
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    plain = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True
        )
    )

    cost = np.asarray(
        probe_path_cost(
            arrays, config, obj_types, n_probe_frames=2, interpret=True
        )
    )
    n = config.width * config.height
    assert cost.shape == (n,)
    assert cost.min() >= 1.0 and cost.max() <= 2 * config.max_bounces

    rng = np.random.default_rng(3)
    for order in (
        np.argsort(-cost, kind="stable").astype(np.int32),  # production
        rng.permutation(n).astype(np.int32),  # adversarial shuffle
    ):
        inv = np.argsort(order).astype(np.int32)
        sorted_ = np.asarray(
            integrate_frames_pallas_regen(
                arrays, config, np.uint32(0), obj_types, 3, interpret=True,
                lane_perm=jnp.asarray(order), lane_inv=jnp.asarray(inv),
            )
        )
        assert np.array_equal(plain, sorted_)


def test_renderer_regen_chunks_and_estimator():
    from spectral_tpu.render.renderer import Renderer

    scene = _regen_scene
    ref = None
    r_mono = Renderer(scene(), _interpret=True, backend="jnp")
    # force the pallas step despite the CPU host (interpret mode)
    r_mono.backend = "pallas"
    ref = r_mono.render()

    r = Renderer(scene(), regen_frames=2, _interpret=True, backend="jnp")
    r.backend = "pallas"
    seen = []
    got = r.render(progress=lambda p: seen.append(p.frame_id))
    assert seen == [1, 2]  # chunks of 2, then the ragged tail frame
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-4


def test_renderer_regen_sort_matches_unsorted():
    """Renderer-level: regen_sort (probe + permutation, auto-on with
    regeneration) produces the same image as the unsorted regen path."""
    from spectral_tpu.render.renderer import Renderer

    r_plain = Renderer(
        _regen_scene(), regen_frames=2, regen_sort=False,
        _interpret=True, backend="jnp",
    )
    r_plain.backend = "pallas"
    ref = r_plain.render()

    r_sorted = Renderer(
        _regen_scene(), regen_frames=2, regen_sort=True,
        _interpret=True, backend="jnp",
    )
    r_sorted.backend = "pallas"
    got = r_sorted.render()
    assert r_sorted._lane_perm is not None  # the probe actually ran
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_regen_rejects_incompatible_modes():
    from spectral_tpu.render.renderer import Renderer

    with pytest.raises(ValueError, match="regen_frames"):
        Renderer(_regen_scene(), regen_frames=0)
    with pytest.raises(ValueError, match="composes|plain"):
        Renderer(
            _regen_scene(), regen_frames=2, frames_per_dispatch=2,
            _interpret=True,
        )
    import jax as _jax

    if "tpu" not in _jax.devices()[0].platform.lower():
        with pytest.raises(ValueError, match="pallas"):
            Renderer(_regen_scene(), regen_frames=2)


@pytest.mark.parametrize(
    "maker, kwargs",
    [
        # dispersion: hero-wavelength collapse + dielectric branch must
        # reset cleanly (hero bin back to -1) at each in-kernel restart
        ("prism", {"has_transmission": True, "has_emission": True}),
        # many-object fori loop + material-table indirection
        ("sphere_field", {}),
    ],
)
def test_regen_matches_monolithic_sum_physics(maker, kwargs):
    from spectral_tpu.render.pallas_integrator import (
        integrate_frames_pallas_regen,
    )

    if maker == "prism":
        sc = presets.prism(n_samples=8)
    else:
        sc = presets.sphere_field(n_spheres=80, n_samples=8)
    sc.width, sc.height = 16, 128
    sc.nbr_of_ray_bounces = 4
    sc.nbr_of_iterations = 3
    arrays, config = flatten_scene(sc)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    mono = sum(
        np.asarray(
            integrate_frame_pallas(
                arrays, config, np.uint32(f), obj_types, interpret=True,
                **kwargs,
            ),
            np.float64,
        )
        for f in range(3)
    )
    regen = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 3, interpret=True,
            **kwargs,
        ),
        np.float64,
    )
    err = np.abs(regen - mono)
    # f32 reassociation of the per-frame sums only — zero path flips
    assert float(err.max()) < 1e-3 * max(1.0, float(np.abs(mono).max()))


def test_sharded_pallas_regen_step():
    """Row-sharded regeneration step == single-device regeneration (the
    per-shard raygen runs in global image coordinates, dirs included)."""
    import jax
    import jax.numpy as jnp

    from spectral_tpu.parallel.mesh import make_mesh, row_sharding
    from spectral_tpu.parallel.sharding import (
        build_sharded_pallas_regen_step,
        shard_scene,
    )
    from spectral_tpu.render.integrator import accumulate_frames
    from spectral_tpu.render.pallas_integrator import (
        integrate_frames_pallas_regen,
    )

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    # 1 bounce, like test_sharded_pallas_step_direct_only: deeper bounces
    # roll the un-offset diffuse self-intersection coin on program-fusion
    # ulps between the two outer jits (documented chaos envelope); at one
    # bounce the regen machinery (terminate -> restart with the next
    # frame's dirs) is still fully exercised
    arrays, config, obj_types = _pair("cornell", 16, 16, bounces=1)
    rgb_sum = integrate_frames_pallas_regen(
        arrays, config, jnp.uint32(0), obj_types, 2, interpret=True
    )
    want = np.asarray(
        accumulate_frames(jnp.zeros((16, 16, 4)), rgb_sum, jnp.uint32(0), 2)
    )
    mesh = make_mesh(8)
    arr_s, acc_sh = shard_scene(arrays, row_sharding(mesh), config)
    step = build_sharded_pallas_regen_step(
        mesh, config, obj_types, 2, interpret=True
    )
    got = np.asarray(
        step(arr_s, jax.device_put(jnp.zeros((16, 16, 4)), acc_sh), jnp.uint32(0))
    )
    assert np.abs(got - want).max() < 1e-4
