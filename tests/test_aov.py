"""First-hit AOV buffers (depth / normal / albedo / obj_id).

Geometry facts asserted below come from the default preset
(scene/presets.py): camera at (0,0,-2) looking +z with the left sphere
(object index 1) centered at (0,0,1) radius 1 — so the image-center
pixel ray hits its front pole at depth exactly 2 with normal (0,0,-1).
Odd image dimensions put a pixel exactly on the optical axis (the AOV
trace uses pixel centers: frame 0 of 1 has Hammersley offset 0.5).
"""

import numpy as np
import pytest

from spectral_tpu.render.aov import compute_aovs, save_aovs
from spectral_tpu.scene import presets


def _scene(w=17, h=13):
    scene = presets.default_scene()
    scene.width, scene.height = w, h
    return scene


def test_center_pixel_hits_left_sphere_exactly():
    aovs = compute_aovs(_scene())
    cy, cx = 6, 8  # optical axis pixel for 17x13
    assert aovs["obj_id"][cy, cx] == 1  # the left sphere
    assert aovs["depth"][cy, cx] == pytest.approx(2.0, abs=1e-5)
    assert aovs["normal"][cy, cx] == pytest.approx((0, 0, -1), abs=1e-5)


def test_miss_pixels_are_marked():
    aovs = compute_aovs(_scene())
    # the top-center ray climbs over every object into empty sky
    assert aovs["obj_id"][0, 8] == -1
    assert np.isinf(aovs["depth"][0, 8])
    assert aovs["normal"][0, 8] == pytest.approx((0, 0, 0))
    assert aovs["albedo"][0, 8] == pytest.approx((0, 0, 0))
    # the bottom-center ray lands on the floor (object index 3)
    assert aovs["obj_id"][12, 8] == 3
    assert np.isfinite(aovs["depth"][12, 8])


def test_normals_are_unit_where_hit():
    aovs = compute_aovs(_scene())
    hit = aovs["obj_id"] >= 0
    norms = np.linalg.norm(aovs["normal"][hit], axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-4)


def test_albedo_is_the_hit_objects_reflectance_color():
    from spectral_tpu.render.color import spectra_to_rgb
    from spectral_tpu.scene.flatten import flatten_scene

    scene = _scene()
    aovs = compute_aovs(scene)
    arrays, _ = flatten_scene(scene)
    # the buffer IS the hit object's albedo spectrum through the same
    # CIE pipeline as the beauty image (object 1 = the left sphere)
    expect = np.asarray(
        spectra_to_rgb(arrays.albedo[1], arrays.xyz_weights, arrays.xyz_to_rgb)
    )
    np.testing.assert_allclose(aovs["albedo"][6, 8], expect, atol=1e-6)
    assert expect.max() > 0.1  # and it is a real, non-black reflectance


def test_empty_scene_aovs():
    scene = _scene()
    scene.objects = []
    aovs = compute_aovs(scene)
    assert (aovs["obj_id"] == -1).all()
    assert np.isinf(aovs["depth"]).all()


def test_save_aovs_writes_npy_and_png(tmp_path):
    aovs = compute_aovs(_scene())
    written = save_aovs(aovs, tmp_path)
    names = {p.name for p in written}
    for base in ("depth", "normal", "albedo", "obj_id"):
        assert f"{base}.npy" in names
        assert f"{base}.png" in names
    # .npy round-trips exactly, including the inf misses
    np.testing.assert_array_equal(
        np.load(tmp_path / "depth.npy"), aovs["depth"]
    )


def test_cli_render_aovs_flag(tmp_path):
    from spectral_tpu.cli import main

    rc = main([
        "render", "--preset", "default", "--width", "16", "--height", "12",
        "--iterations", "1", "--bounces", "2", "--quiet",
        "--out", str(tmp_path / "img.png"),
        "--aovs", str(tmp_path / "aovs"),
    ])
    assert rc == 0
    assert (tmp_path / "img.png").exists()
    assert (tmp_path / "aovs" / "normal.npy").exists()
    assert (tmp_path / "aovs" / "depth.png").exists()


def test_save_aovs_exr_multilayer(tmp_path):
    """All AOVs + beauty land in ONE multi-layer EXR, f32 bit-exact."""
    from spectral_tpu.render.aov import save_aovs_exr
    from tests.test_exr import _read_exr

    aovs = compute_aovs(_scene())
    beauty = np.random.default_rng(0).random(
        aovs["normal"].shape[:2] + (4,)
    ).astype(np.float32)
    p = save_aovs_exr(aovs, tmp_path / "ml.exr", beauty=beauty)
    planes, channels, _ = _read_exr(p)
    names = {n for n, _ in channels}
    assert {b"R", b"G", b"B", b"A", b"depth.Z", b"normal.R",
            b"albedo.G", b"obj_id.Z"} <= names
    np.testing.assert_array_equal(planes[b"depth.Z"], aovs["depth"])
    np.testing.assert_array_equal(planes[b"normal.G"],
                                  aovs["normal"][..., 1])
    np.testing.assert_array_equal(planes[b"R"], beauty[..., 0])
    np.testing.assert_array_equal(
        planes[b"obj_id.Z"], aovs["obj_id"].astype(np.float32)
    )


def test_cli_render_aovs_exr_flag(tmp_path):
    from spectral_tpu.cli import main
    from tests.test_exr import _read_exr

    rc = main([
        "render", "--preset", "default", "--width", "16", "--height", "12",
        "--iterations", "1", "--bounces", "2", "--quiet",
        "--out", str(tmp_path / "img.png"),
        "--aovs", str(tmp_path / "render.exr"),
    ])
    assert rc == 0
    planes, channels, (w, h) = _read_exr(tmp_path / "render.exr")
    assert (w, h) == (16, 12)
    assert b"depth.Z" in dict(channels)
    assert b"R" in dict(channels)  # beauty pass present
