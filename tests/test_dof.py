"""Thin-lens depth of field (a capability the reference lacks — its
ray generation is the fixed pinhole, src/shader.rs:271-293).

Design under test (render/camera.py): one lens point per FRAME
(screen-wide, like the reference's screen-wide sub-pixel jitter),
PCG3D-derived from the frame id; every pixel ray is re-aimed at its
pinhole ray's intersection with the focus plane, so progressive
accumulation integrates the aperture. ``aperture_radius == 0`` keeps
the compile-time pinhole path (``config.has_dof`` is static)."""

import numpy as np
import pytest

from spectral_tpu.scene import presets, schema
from spectral_tpu.scene.flatten import flatten_scene


def _dof_scene(aperture=0.08, focus=2.0):
    scene = presets.default_scene()
    scene.width, scene.height = 32, 24
    scene.nbr_of_iterations = 4
    scene.nbr_of_ray_bounces = 2
    scene.camera.aperture_radius = aperture
    scene.camera.focus_distance = focus
    return scene


def test_validate_rejects_bad_dof():
    scene = _dof_scene(aperture=-0.1)
    with pytest.raises(schema.SceneError, match="aperture_radius"):
        scene.validate()
    scene = _dof_scene(aperture=0.1, focus=0.0)
    with pytest.raises(schema.SceneError, match="focus_distance"):
        scene.validate()
    _dof_scene().validate()  # positive aperture + focus is legal


def test_pinhole_default_is_static():
    arrays, config = flatten_scene(presets.default_scene())
    assert config.has_dof is False
    assert float(arrays.cam_aperture) == 0.0
    arrays, config = flatten_scene(_dof_scene())
    assert config.has_dof is True
    assert float(arrays.cam_aperture) == pytest.approx(0.08)
    assert float(arrays.cam_focus) == pytest.approx(2.0)


def test_lens_rays_converge_on_the_focus_plane():
    """The defining thin-lens property: for every frame (= lens point),
    each pixel's DoF ray passes through its own pinhole ray's focal
    point, so objects ON the focus plane are sharp and everything else
    blurs with distance from it."""
    import jax.numpy as jnp

    from spectral_tpu.ops.vecmath import Vec3
    from spectral_tpu.render.camera import (
        camera_basis,
        generate_primary_rays,
        scene_dof,
    )

    scene = _dof_scene(aperture=0.15, focus=3.0)
    arrays, config = flatten_scene(scene)
    forward, *_ = camera_basis(
        arrays.cam_dir, arrays.cam_up, arrays.fov_y_deg,
        config.width, config.height,
    )

    def focal_points(o, d, focus):
        t = focus / d.dot(forward)
        return np.stack(
            [np.asarray(o.x + d.x * t), np.asarray(o.y + d.y * t),
             np.asarray(o.z + d.z * t)], axis=1
        )

    for frame in range(3):
        fid = jnp.uint32(frame)
        args = (
            arrays.cam_pos, arrays.cam_dir, arrays.cam_up,
            arrays.fov_y_deg, config.width, config.height, fid,
            config.intended_frames,
        )
        o0, d0, _, _ = generate_primary_rays(*args)
        o1, d1, _, _ = generate_primary_rays(
            *args, dof=scene_dof(arrays, config)
        )
        # a real lens offset was applied (nonzero with probability 1)
        shift = np.asarray(o1.x - o0.x)[0], np.asarray(o1.y - o0.y)[0]
        assert np.hypot(*shift) > 0.0
        assert np.hypot(*shift) <= 0.15 * 1.0001  # within the aperture
        f0 = focal_points(o0, d0, 3.0)
        f1 = focal_points(o1, d1, 3.0)
        assert np.allclose(f0, f1, atol=2e-4), np.abs(f0 - f1).max()


def test_dof_render_smoke_and_pinhole_unchanged():
    """A DoF render is finite, nonzero, and differs from the pinhole
    render of the same scene; aperture 0 takes the has_dof=False path
    (bit-identical raygen by construction — same compiled program)."""
    from spectral_tpu.render.renderer import Renderer

    pin = Renderer(presets_scene := _dof_scene(aperture=0.0)).render()
    assert presets_scene.camera.aperture_radius == 0.0
    img = Renderer(_dof_scene()).render()
    assert np.isfinite(img).all()
    assert float(img[..., :3].max()) > 0.01
    assert not np.array_equal(img, pin)


def test_dof_rejects_persist():
    from spectral_tpu.render.renderer import Renderer

    with pytest.raises(ValueError, match="persist"):
        Renderer(_dof_scene(), persist=True)
    # fixed-window regeneration, by contrast, composes with DoF (the
    # per-frame lens origins ship as an SMEM table — see
    # test_dof_regen_matches_per_frame_sum)
    r = Renderer(_dof_scene(), regen_frames=4, _interpret=True)
    assert r.regen_frames == 4


def test_dof_regen_matches_per_frame_sum():
    """Fixed-window path regeneration composes with depth of field: the
    per-frame thin-lens origins are frame-constant (one lens point per
    frame, screen-wide) and ship as a [K-1, 4] SMEM table built with host
    raygen's own camera_basis + lens_point ops (pack_camera_frames), so
    every restarted path is bit-identical to its per-frame rendering —
    the K-frame radiance sum matches the sum of K per-frame launches up
    to pure f32 reassociation (an origin mismatch would flip the
    un-offset diffuse self-intersection coin and blow this bound up)."""
    from spectral_tpu.render.pallas_integrator import (
        integrate_frame_pallas,
        integrate_frames_pallas_regen,
    )

    scene = _dof_scene()  # 32x24, 4 frames, 2 bounces
    scene.spectrum_number_of_samples = 8
    scene.update_all_spectrum_sample_sizes()
    arrays, config = flatten_scene(scene)
    obj_types = tuple(np.asarray(arrays.obj_type).tolist())
    mono = sum(
        np.asarray(
            integrate_frame_pallas(
                arrays, config, np.uint32(f), obj_types, interpret=True
            ),
            np.float64,
        )
        for f in range(4)
    )
    regen = np.asarray(
        integrate_frames_pallas_regen(
            arrays, config, np.uint32(0), obj_types, 4, interpret=True
        ),
        np.float64,
    )
    assert float(np.abs(regen - mono).max()) < 1e-4


def test_dof_scene_json_round_trip(tmp_path):
    from spectral_tpu.utils import sceneio

    scene = _dof_scene(aperture=0.25, focus=4.5)
    path = tmp_path / "dof.json"
    sceneio.save_scene(scene, path)
    loaded = sceneio.load_scene(path)
    assert loaded.camera.aperture_radius == pytest.approx(0.25)
    assert loaded.camera.focus_distance == pytest.approx(4.5)
    # pre-DoF scene files (no aperture keys) default to the pinhole
    import json

    data = json.loads(path.read_text())
    del data["camera"]["aperture_radius"]
    del data["camera"]["focus_distance"]
    path.write_text(json.dumps(data))
    legacy = sceneio.load_scene(path)
    assert legacy.camera.aperture_radius == 0.0


def test_rack_focus_animation_tracks():
    """``camera.focus_distance`` / ``aperture_radius`` are animatable:
    every frame shares one RenderConfig (has_dof is static and constant
    when the aperture stays positive), so the whole rack-focus rides a
    single compiled program."""
    from spectral_tpu.render.animation import Animation, Track

    scene = _dof_scene(aperture=0.1, focus=2.0)
    anim = Animation(
        scene=scene,
        n_frames=3,
        tracks=[
            Track("camera.focus_distance", [(0.0, 1.0), (1.0, 6.0)]),
            Track("camera.aperture_radius", [(0.0, 0.05), (1.0, 0.2)]),
        ],
    )
    configs = set()
    focuses = []
    for f in range(3):
        s = anim.scene_at(f)
        s.validate()
        arrays, config = flatten_scene(s)
        configs.add(config)
        focuses.append(float(arrays.cam_focus))
    assert len(configs) == 1 and next(iter(configs)).has_dof
    assert focuses == pytest.approx([1.0, 3.5, 6.0])
