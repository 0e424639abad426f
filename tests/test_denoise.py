"""AOV-guided a-trous denoiser (spectral_tpu.render.denoise).

Beyond-reference capability — the reference ships raw Monte-Carlo output
(src/text_resources.rs:8-11 tells the user to raise the iteration
count). These tests pin the three properties that make a feature-guided
denoiser usable: it removes noise, it does NOT cross geometric edges,
and it never touches the beauty render (strictly post-process).
"""

import numpy as np
import pytest

from spectral_tpu.render.denoise import atrous_denoise, denoise_render


def _split_scene(h=64, w=64, noise=0.2, seed=0):
    """Synthetic two-region image: left/right halves differ in albedo,
    normal, depth and illumination — a hard geometric + material edge
    down the middle. Returns (noisy_rgb, clean_rgb, aovs...)."""
    rng = np.random.RandomState(seed)
    left = np.arange(w) < w // 2

    albedo = np.where(
        left[None, :, None],
        np.float32([0.8, 0.2, 0.2]),
        np.float32([0.2, 0.2, 0.8]),
    ) * np.ones((h, w, 3), np.float32)
    illum = np.where(left[None, :, None], 0.5, 1.5).astype(np.float32)
    illum = illum * np.ones((h, w, 3), np.float32)
    depth = np.broadcast_to(
        np.where(left[None, :], 5.0, 11.0), (h, w)
    ).astype(np.float32)
    normal = np.where(
        left[None, :, None],
        np.float32([0.0, 0.0, 1.0]),
        np.float32([0.0, 1.0, 0.0]),
    ) * np.ones((h, w, 3), np.float32)

    clean = illum * albedo
    noisy = clean + rng.normal(0.0, noise, clean.shape).astype(np.float32)
    return noisy, clean, depth, normal, albedo


def test_noise_reduction():
    noisy, clean, depth, normal, albedo = _split_scene()
    out = atrous_denoise(noisy, depth, normal, albedo)
    assert out.shape == clean.shape and out.dtype == np.float32
    mse_in = float(np.mean((noisy - clean) ** 2))
    mse_out = float(np.mean((out - clean) ** 2))
    assert np.isfinite(out).all()
    # the flat regions are fully filterable: demand a big reduction
    assert mse_out < mse_in / 10.0, (mse_in, mse_out)


def test_edge_is_not_crossed():
    """Region means must stay put: blurring across the center edge would
    drag the dim left half up and the bright right half down."""
    noisy, clean, depth, normal, albedo = _split_scene()
    out = atrous_denoise(noisy, depth, normal, albedo)
    h, w = depth.shape
    lm_clean = clean[:, : w // 2].mean(axis=(0, 1))
    rm_clean = clean[:, w // 2 :].mean(axis=(0, 1))
    lm = out[:, : w // 2].mean(axis=(0, 1))
    rm = out[:, w // 2 :].mean(axis=(0, 1))
    np.testing.assert_allclose(lm, lm_clean, atol=0.02)
    np.testing.assert_allclose(rm, rm_clean, atol=0.02)
    # the columns flanking the edge are the leak detector: their means
    # must match their own region, not an average of the two
    edge_l = out[:, w // 2 - 1].mean(axis=0)
    edge_r = out[:, w // 2].mean(axis=0)
    np.testing.assert_allclose(edge_l, lm_clean, atol=0.06)
    np.testing.assert_allclose(edge_r, rm_clean, atol=0.06)


def test_sky_and_geometry_stay_separated():
    """Miss pixels (depth=inf, zero normal/albedo) smooth among
    themselves and never bleed into geometry."""
    rng = np.random.RandomState(1)
    h, w = 48, 48
    top = (np.arange(h) < h // 2)[:, None]

    depth = np.broadcast_to(np.where(top, np.inf, 4.0), (h, w)).astype(
        np.float32
    )
    normal = np.where(
        top[..., None], 0.0, np.float32([0.0, 1.0, 0.0])
    ) * np.ones((h, w, 3), np.float32)
    albedo = np.where(top[..., None], 0.0, 0.6).astype(
        np.float32
    ) * np.ones((h, w, 3), np.float32)
    clean = np.where(top[..., None], 0.05, 0.9).astype(
        np.float32
    ) * np.ones((h, w, 3), np.float32)
    noisy = clean + rng.normal(0.0, 0.1, clean.shape).astype(np.float32)

    out = atrous_denoise(noisy, depth, normal, albedo)
    sky = out[: h // 2]
    geo = out[h // 2 :]
    assert float(np.mean((sky - 0.05) ** 2)) < float(
        np.mean((noisy[: h // 2] - 0.05) ** 2)
    ) / 5.0
    np.testing.assert_allclose(sky.mean(), 0.05, atol=0.02)
    np.testing.assert_allclose(geo.mean(), 0.9, atol=0.02)


def test_demodulation_preserves_albedo_texture():
    """A checkerboard albedo under flat illumination must survive
    perfectly: demodulation filters illumination, not texture."""
    h, w = 32, 32
    checker = ((np.arange(h)[:, None] // 4 + np.arange(w)[None, :] // 4) % 2
               ).astype(np.float32)
    albedo = (0.2 + 0.6 * checker)[..., None] * np.ones((h, w, 3), np.float32)
    depth = np.full((h, w), 3.0, np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    clean = 1.0 * albedo  # flat unit illumination
    out = atrous_denoise(clean, depth, normal, albedo)
    # noise-free input with constant illumination: the filter is exact
    np.testing.assert_allclose(out, clean, atol=1e-5)


def test_denoise_render_end_to_end():
    """Denoise an actual low-iteration render: variance in the floor
    region drops, alpha passes through, the framebuffer is untouched."""
    from spectral_tpu.render.renderer import Renderer
    from spectral_tpu.scene import presets

    scene = presets.default_scene()
    scene.width, scene.height = 64, 48
    scene.nbr_of_iterations = 2
    scene.nbr_of_ray_bounces = 3
    r = Renderer(scene)
    fb = np.asarray(r.render())
    fb_copy = fb.copy()

    out = denoise_render(scene, fb, iterations=3)
    assert out.shape == fb.shape and out.dtype == np.float32
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(fb, fb_copy)  # strictly post-process
    assert not np.array_equal(out[..., :3], fb[..., :3])
    np.testing.assert_array_equal(out[..., 3], fb[..., 3])
    # overall energy is preserved to a few percent (it is an average)
    assert abs(float(out[..., :3].mean()) - float(fb[..., :3].mean())) < 0.05


def test_shape_validation():
    with pytest.raises(ValueError):
        atrous_denoise(
            np.zeros((4, 4), np.float32),
            np.zeros((4, 4), np.float32),
            np.zeros((4, 4, 3), np.float32),
            np.zeros((4, 4, 3), np.float32),
        )
    with pytest.raises(ValueError):
        atrous_denoise(
            np.zeros((4, 4, 3), np.float32),
            np.zeros((5, 4), np.float32),
            np.zeros((4, 4, 3), np.float32),
            np.zeros((4, 4, 3), np.float32),
        )


def test_cli_denoise_flag(tmp_path):
    from spectral_tpu.cli import main

    out = tmp_path / "img.png"
    rc = main([
        "render", "--preset", "default", "--width", "16", "--height", "12",
        "--iterations", "1", "--bounces", "2", "--quiet",
        "--out", str(out), "--denoise", "3",
    ])
    assert rc == 0
    assert out.exists()
    assert (tmp_path / "img.denoised.png").exists()
