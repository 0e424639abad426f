"""Keyframe animation: track evaluation, scene materialization, the
frame-parallel renderer, the one-program SPMD batch form, and the CLI.

The reference renders one still per session; animation is a
beyond-reference capability built purely on the scene schema, so each
animated frame is a normal validated Scene and renders through the
standard paths — the tests pin frame renders bit-identical to the
corresponding single-scene renders.
"""

import json

import numpy as np
import pytest

from spectral_tpu.render import animation as anim_mod
from spectral_tpu.render.animation import (
    Animation,
    Track,
    animation_from_dict,
    animation_to_dict,
    orbit_tracks,
    render_animation,
    render_batch_spmd,
    save_gif,
)
from spectral_tpu.scene import presets
from spectral_tpu.scene.schema import Scene, SceneError, Sphere


def _small_scene(w=16, h=12, iters=2, bounces=2):
    scene = presets.default_scene()
    scene.width, scene.height = w, h
    scene.nbr_of_iterations = iters
    scene.nbr_of_ray_bounces = bounces
    return scene


# ------------------------------------------------------------------ tracks


def test_track_scalar_interpolation_and_clamping():
    t = Track("camera.fov_y_deg", [(0.2, 30.0), (0.8, 90.0)])
    assert t.value_at(0.0) == 30.0  # clamped before the first key
    assert t.value_at(1.0) == 90.0  # clamped after the last key
    assert t.value_at(0.5) == pytest.approx(60.0)
    assert t.value_at(0.2) == 30.0


def test_track_vector_interpolation():
    t = Track("camera.position", [(0.0, (0, 0, 0)), (1.0, (2, -4, 6))])
    assert t.value_at(0.5) == pytest.approx((1.0, -2.0, 3.0))


def test_track_rejects_empty_and_unsorted_keys():
    with pytest.raises(ValueError):
        Track("camera.fov_y_deg", [])
    with pytest.raises(ValueError):
        Track("camera.fov_y_deg", [(0.5, 1.0), (0.2, 2.0)])


def test_track_rejects_bad_vector_length():
    t = Track("camera.position", [(0.0, (1, 2))])
    with pytest.raises(ValueError):
        t.value_at(0.0)


# ------------------------------------------------------- path application


def test_scene_at_applies_every_supported_path_kind():
    scene = _small_scene()
    # give object 0 a sphere type so the radius path is exercised
    scene.objects[0].object_type = Sphere(radius=1.0)
    anim = Animation(
        scene,
        n_frames=3,
        tracks=[
            Track("camera.position", [(0.0, (0, 0, -4)), (1.0, (0, 0, -2))]),
            Track("camera.fov_y_deg", [(0.0, 40.0), (1.0, 80.0)]),
            Track("objects[0].position", [(0.0, (0, 0, 2)), (1.0, (2, 0, 2))]),
            Track("objects[0].object_type.radius", [(0.0, 0.5), (1.0, 1.5)]),
            Track("lights[0].position", [(0.0, (0, 2, 0)), (1.0, (0, 4, 0))]),
            Track("materials[0].roughness", [(0.0, 0.0), (1.0, 1.0)]),
        ],
    )
    mid = anim.scene_at(1)  # t = 0.5
    assert mid.camera.position == pytest.approx((0, 0, -3))
    assert mid.camera.fov_y_deg == pytest.approx(60.0)
    assert mid.objects[0].position == pytest.approx((1, 0, 2))
    assert mid.objects[0].object_type.radius == pytest.approx(1.0)
    assert mid.lights[0].position == pytest.approx((0, 3, 0))
    assert mid.materials[0].roughness == pytest.approx(0.5)
    # the base scene is untouched
    assert scene.objects[0].position != mid.objects[0].position
    assert scene.objects[0].object_type.radius == 1.0
    # identity references survive the deep copy: validate() accepted it,
    # and the animated object's material IS one of the scene's materials
    assert any(mid.objects[0].material is m for m in mid.materials)


def test_scene_at_rejects_bad_paths_and_frames():
    scene = _small_scene()
    with pytest.raises(ValueError):
        Animation(scene, 2, [Track("camera.nope", [(0, 1.0)])]).scene_at(0)
    with pytest.raises(ValueError):
        Animation(scene, 2, [Track("objects[99].position", [(0, (0, 0, 0))])]).scene_at(0)
    with pytest.raises(ValueError):
        Animation(scene, 2, [Track("objects[0].object_type.radius", [(0, 1.0)])]).scene_at(0)  # not a sphere
    anim = Animation(scene, 2)
    with pytest.raises(ValueError):
        anim.scene_at(2)
    with pytest.raises(ValueError):
        Animation(scene, 0)


def test_single_frame_animation_evaluates_at_t0():
    scene = _small_scene()
    anim = Animation(
        scene, 1, [Track("camera.fov_y_deg", [(0.0, 10.0), (1.0, 99.0)])]
    )
    assert anim.scene_at(0).camera.fov_y_deg == 10.0


# ------------------------------------------------------------------- orbit


def test_orbit_tracks_circle_geometry():
    scene = _small_scene()
    scene.camera.position = (0.0, 1.0, -3.0)
    tracks = orbit_tracks(scene, degrees=360.0, n_frames=9, center=(0, 1, 0))
    pos, direc = tracks[0], tracks[1]
    r0 = np.linalg.norm(np.asarray(pos.keys[0][1]) - np.array([0, 1, 0]))
    for _, p in pos.keys:
        r = np.linalg.norm(np.asarray(p) - np.array([0, 1, 0]))
        assert r == pytest.approx(r0)  # constant orbit radius
    for (_, p), (_, d) in zip(pos.keys, direc.keys):
        d = np.asarray(d)
        assert np.linalg.norm(d) == pytest.approx(1.0)
        to_center = np.array([0, 1, 0]) - np.asarray(p)
        assert np.dot(d, to_center / np.linalg.norm(to_center)) == pytest.approx(1.0)
    # full turns sample the circle half-open so a looping GIF has no
    # duplicated frame: the last key is one step SHORT of the start...
    assert pos.keys[-1][1] != pytest.approx(pos.keys[0][1], abs=1e-6)
    # ...at exactly 360 * (n-1)/n degrees
    ang = np.radians(360.0 * 8 / 9)
    expect = (-3 * np.sin(ang), 1.0, -3 * np.cos(ang))
    assert pos.keys[-1][1] == pytest.approx(expect, abs=1e-9)


def test_orbit_partial_arc_samples_inclusively():
    scene = _small_scene()
    scene.camera.position = (0.0, 0.0, -3.0)
    tracks = orbit_tracks(scene, degrees=180.0, n_frames=5, center=(0, 0, 0))
    # a half-turn ENDS at the diametrically opposite pose
    assert tracks[0].keys[-1][1] == pytest.approx((0, 0, 3), abs=1e-9)


def test_orbit_rejects_degenerate_center():
    scene = _small_scene()
    with pytest.raises(ValueError):
        orbit_tracks(scene, center=scene.camera.position, n_frames=2)


# ----------------------------------------------------------------- JSON IO


def test_animation_json_round_trip(tmp_path):
    scene = _small_scene()
    anim = Animation(
        scene,
        n_frames=5,
        tracks=[Track("camera.position", [(0.0, (0, 0, -4)), (1.0, (1, 0, -4))])],
        fps=24.0,
    )
    p = tmp_path / "anim.json"
    anim_mod.save_animation(anim, p)
    loaded = anim_mod.load_animation(p)
    assert loaded.n_frames == 5 and loaded.fps == 24.0
    assert loaded.tracks[0].path == "camera.position"
    # evaluated frames agree field-for-field
    a, b = anim.scene_at(2), loaded.scene_at(2)
    assert a.camera.position == pytest.approx(b.camera.position)
    assert a.width == b.width and len(a.objects) == len(b.objects)


def test_animation_from_dict_requires_a_scene():
    with pytest.raises(ValueError):
        animation_from_dict({"n_frames": 2, "tracks": []})
    # explicit scene overrides the embedded one
    anim = Animation(_small_scene(), 2)
    d = animation_to_dict(anim)
    override = _small_scene(w=8, h=8)
    assert animation_from_dict(d, scene=override).scene.width == 8


# --------------------------------------------------------------- rendering


def test_render_animation_matches_per_frame_renders(tmp_path):
    from spectral_tpu.render.renderer import Renderer

    scene = _small_scene(iters=2)
    anim = Animation(
        scene,
        n_frames=3,
        tracks=[Track("camera.position", [(0.0, (0, 0, -4)), (1.0, (0.5, 0, -4))])],
    )
    calls = []
    frames = render_animation(
        anim,
        out_dir=tmp_path,
        progress=lambda d, t: calls.append((d, t)),
        backend="jnp",
        regen_frames=1,
    )
    assert frames.shape == (3, 12, 16, 3) and frames.dtype == np.uint8
    assert calls[-1] == (3, 3) and len(calls) == 3
    for f in range(3):
        assert (tmp_path / f"frame_{f:04d}.png").exists()
        r = Renderer(anim.scene_at(f), backend="jnp", regen_frames=1)
        r.render()
        from spectral_tpu.render import image as image_mod

        expect = image_mod.accum_to_u8(r.framebuffer())[..., :3]
        np.testing.assert_array_equal(frames[f], expect)
    # the animation actually moves: frame 0 differs from frame 2
    assert (frames[0] != frames[2]).any()


def test_render_animation_multi_device_threads_match_single_device():
    import jax

    devices = jax.devices()
    assert len(devices) >= 2, "conftest forces 8 virtual CPU devices"
    scene = _small_scene(iters=1)
    anim = Animation(
        scene,
        n_frames=4,
        tracks=[Track("camera.fov_y_deg", [(0.0, 50.0), (1.0, 70.0)])],
    )
    multi = render_animation(anim, devices=devices[:3], backend="jnp",
                             regen_frames=1)
    single = render_animation(anim, devices=devices[:1], backend="jnp",
                              regen_frames=1)
    np.testing.assert_array_equal(multi, single)


def test_render_animation_rejects_config_changes():
    scene = _small_scene()
    anim = Animation(scene, 2)
    anim.scene_at = lambda f: (  # frame 1 changes the image size
        _small_scene(w=16 + 4 * f)
    )
    anim.n_frames = 2
    with pytest.raises(SceneError):
        render_animation(anim, backend="jnp")


def test_render_batch_spmd_matches_individual_renders():
    import jax
    from jax.sharding import Mesh

    scenes = []
    for k in range(4):
        s = _small_scene(iters=2)
        s.camera.fov_y_deg = 50.0 + 5.0 * k
        scenes.append(s)
    mesh = Mesh(np.array(jax.devices()[:4]), ("anim",))
    batch = render_batch_spmd(scenes, mesh=mesh)
    assert batch.shape == (4, 12, 16, 4)

    from spectral_tpu.render.renderer import Renderer

    for k, s in enumerate(scenes):
        r = Renderer(s, backend="jnp", regen_frames=1)
        expect = r.render()
        np.testing.assert_allclose(batch[k], expect, rtol=0, atol=1e-6)

    # an iterations override must change the Hammersley jitter stream
    # exactly like setting nbr_of_iterations on the scene (the screen-
    # wide jitter denominator is intended_frames), i.e. match an
    # individual render of the overridden scene bit-for-bit
    batch1 = render_batch_spmd(scenes[:1], iterations=1)
    s1 = _small_scene(iters=1)
    s1.camera.fov_y_deg = 50.0
    expect1 = Renderer(s1, backend="jnp", regen_frames=1).render()
    np.testing.assert_allclose(batch1[0], expect1, rtol=0, atol=1e-6)
    assert scenes[0].nbr_of_iterations == 2  # caller's scenes untouched


def test_render_batch_spmd_rejects_mismatched_configs():
    with pytest.raises(SceneError):
        render_batch_spmd([_small_scene(w=16), _small_scene(w=20)])
    with pytest.raises(ValueError):
        render_batch_spmd([])


# --------------------------------------------------------------------- GIF


def test_save_gif_round_trip(tmp_path):
    from PIL import Image

    frames = np.zeros((3, 8, 8, 3), np.uint8)
    frames[1] = 128
    frames[2] = 255
    p = save_gif(frames, tmp_path / "a.gif", fps=10)
    with Image.open(p) as im:
        assert im.n_frames == 3
    with pytest.raises(ValueError):
        save_gif(np.zeros((8, 8, 3), np.uint8), tmp_path / "b.gif")


# --------------------------------------------------------------------- CLI


def test_cli_animate_orbit_smoke(tmp_path):
    from spectral_tpu.cli import main

    out_dir = tmp_path / "frames"
    gif = tmp_path / "orbit.gif"
    dump = tmp_path / "anim.json"
    rc = main([
        "animate", "--preset", "default", "--width", "16", "--height", "12",
        "--iterations", "1", "--bounces", "2",
        "--orbit", "90", "--frames", "2",
        "--out-dir", str(out_dir), "--gif", str(gif),
        "--dump-anim", str(dump),
    ])
    assert rc == 0
    assert (out_dir / "frame_0000.png").exists()
    assert (out_dir / "frame_0001.png").exists()
    assert gif.exists()
    data = json.loads(dump.read_text())
    assert data["n_frames"] == 2
    assert {t["path"] for t in data["tracks"]} == {
        "camera.position", "camera.direction"
    }


def test_cli_animate_tracks_file(tmp_path):
    from spectral_tpu.cli import main

    anim_json = tmp_path / "anim.json"
    anim_json.write_text(json.dumps({
        "n_frames": 2,
        "tracks": [
            {"path": "camera.fov_y_deg", "keys": [[0.0, 50.0], [1.0, 70.0]]}
        ],
    }))
    out_dir = tmp_path / "frames"
    rc = main([
        "animate", "--preset", "default", "--width", "16", "--height", "12",
        "--iterations", "1", "--bounces", "2",
        "--anim", str(anim_json), "--out-dir", str(out_dir),
    ])
    assert rc == 0
    assert (out_dir / "frame_0001.png").exists()


def test_cli_animate_requires_anim_or_orbit(capsys):
    from spectral_tpu.cli import main

    rc = main(["animate", "--preset", "default", "--gif", "/tmp/x.gif"])
    assert rc == 2


def test_cli_animate_requires_an_output(tmp_path):
    from spectral_tpu.cli import main

    rc = main(["animate", "--preset", "default", "--orbit", "90"])
    assert rc == 2  # refuses BEFORE rendering anything


def test_cli_animate_uses_embedded_scene_when_none_given(tmp_path):
    """A saved animation round-trips through the CLI: with no --scene or
    --preset, the file's embedded scene renders (not the default preset)."""
    from spectral_tpu.cli import main

    scene = _small_scene(iters=1)
    scene.camera.fov_y_deg = 25.0  # a recognizably non-default base scene
    anim = Animation(
        scene, 2, [Track("camera.fov_y_deg", [(0.0, 25.0), (1.0, 30.0)])]
    )
    path = tmp_path / "anim.json"
    anim_mod.save_animation(anim, path)

    out_dir = tmp_path / "frames"
    rc = main(["animate", "--anim", str(path), "--out-dir", str(out_dir)])
    assert rc == 0
    got = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(
        out_dir / "frame_0000.png"
    ))
    # the embedded scene rendered: matches a direct render of it
    from spectral_tpu.render import image as image_mod
    from spectral_tpu.render.renderer import Renderer

    r = Renderer(anim.scene_at(0), backend="jnp", regen_frames=1)
    r.render()
    expect = image_mod.accum_to_u8(r.framebuffer())
    np.testing.assert_array_equal(got, expect)


def test_cli_animate_overrides_validate(tmp_path):
    from spectral_tpu.cli import main

    anim_json = tmp_path / "anim.json"
    anim = Animation(_small_scene(iters=1), 2)
    anim_mod.save_animation(anim, anim_json)
    with pytest.raises(ValueError, match="n_frames"):
        main(["animate", "--anim", str(anim_json), "--frames", "0",
              "--gif", str(tmp_path / "x.gif")])
    with pytest.raises(ValueError, match="fps"):
        main(["animate", "--anim", str(anim_json), "--fps", "0",
              "--gif", str(tmp_path / "x.gif")])


# ------------------------------------------------------------- motion blur


def test_vdc_base3_sequence():
    from spectral_tpu.render.animation import _vdc_base3

    got = [_vdc_base3(n) for n in range(1, 7)]
    expect = [1 / 3, 2 / 3, 1 / 9, 1 / 9 + 1 / 3, 1 / 9 + 2 / 3, 2 / 9]
    np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_shutter_on_static_tracks_matches_unblurred():
    """With tracks that are constant over time, every shutter sample is
    the same scene — the motion-blur path must reproduce the plain
    render bit-exactly (pins the schedule plumbing: same RNG streams,
    same accumulation)."""
    scene = _small_scene(iters=3)
    anim = Animation(
        scene, n_frames=2,
        tracks=[Track("camera.fov_y_deg", [(0.0, 60.0), (1.0, 60.0)])],
    )
    plain = render_animation(anim, backend="jnp")
    blurred = render_animation(anim, backend="jnp", shutter=0.5)
    np.testing.assert_array_equal(plain, blurred)


def test_motion_blur_spreads_a_moving_object():
    """A sphere sweeping across the view: the shutter samples hit
    different scenes, so the blurred render must differ from the static
    one (the static-tracks test above pins the converse)."""
    scene = _small_scene(w=24, h=16, iters=8, bounces=2)
    anim = Animation(
        scene, n_frames=1,
        tracks=[Track(
            "objects[0].position",
            [(0.0, (-1.5, 0.0, 2.0)), (1.0, (1.5, 0.0, 2.0))],
        )],
    )
    static = render_animation(anim, backend="jnp")
    blurred = render_animation(anim, backend="jnp", shutter=1.0)
    assert blurred.shape == static.shape
    assert (blurred != static).any()


def test_schedule_rejects_fused_modes():
    from spectral_tpu.render.renderer import Renderer

    scene = _small_scene()
    sched = lambda fid: None  # noqa: E731 - never called
    with pytest.raises(ValueError, match="scene schedule"):
        Renderer(scene, backend="jnp", persist=True, _interpret=True,
                 _scene_schedule=sched)
    with pytest.raises(ValueError, match="regen_frames"):
        Renderer(scene, backend="jnp", regen_frames=5, _interpret=True,
                 _scene_schedule=sched)


def test_shutter_transmission_flag_is_conservative():
    from spectral_tpu.render.animation import _tracks_can_enable

    scene = _small_scene()
    on = Animation(
        scene, 2,
        [Track("materials[0].transmission", [(0.0, 0.0), (1.0, 0.8)])],
    )
    off = Animation(
        scene, 2,
        [Track("materials[0].transmission", [(0.0, 0.0), (1.0, 0.0)])],
    )
    assert _tracks_can_enable(on, "transmission")
    assert not _tracks_can_enable(off, "transmission")


def test_cli_animate_shutter(tmp_path):
    from spectral_tpu.cli import main

    rc = main([
        "animate", "--preset", "default", "--width", "12", "--height", "8",
        "--iterations", "2", "--bounces", "2", "--orbit", "30",
        "--frames", "2", "--shutter", "0.5",
        "--gif", str(tmp_path / "mb.gif"),
    ])
    assert rc == 0
    assert (tmp_path / "mb.gif").exists()
