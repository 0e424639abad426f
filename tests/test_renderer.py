"""Progressive renderer orchestration: accumulation, abort, checkpoint,
image export, and multi-device row sharding."""

import numpy as np
import pytest

from spectral_tpu.render import image as image_mod
from spectral_tpu.render.renderer import Renderer
from spectral_tpu.scene import presets


def _small_scene(w=32, h=24, iters=4, bounces=2):
    scene = presets.default_scene()
    scene.width, scene.height = w, h
    scene.nbr_of_iterations = iters
    scene.nbr_of_ray_bounces = bounces
    return scene


def test_progressive_average():
    """The running 1/(frame+1) blend must equal the arithmetic mean of the
    blended frames (reference src/main.rs:1316, src/custom_image.rs:59)."""
    from spectral_tpu.render.integrator import accumulate_frame

    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 2, size=(5, 6, 8, 3)).astype(np.float32)
    accum = np.zeros((6, 8, 4), np.float32)
    for i in range(5):
        accum = np.asarray(accumulate_frame(accum, frames[i], np.uint32(i)))
    assert np.allclose(accum[..., :3], frames.mean(axis=0), atol=1e-6)
    assert np.allclose(accum[..., 3], 1.0, atol=1e-6)  # alpha blends to 1


def test_renderer_end_to_end_nonblack():
    r = Renderer(_small_scene(iters=2))
    img = r.render()
    assert img.shape == (24, 32, 4)
    assert not np.isnan(img).any()
    assert float(img[..., :3].max()) > 0.1  # the scene is actually lit


def test_progress_and_abort():
    scene = _small_scene(iters=10)
    r = Renderer(scene)
    seen = []
    r.render(progress=lambda p: seen.append(p.frame_id), abort=lambda: len(seen) >= 3)
    assert seen == [0, 1, 2]  # frame-granular abort after the 3rd frame
    assert r.next_frame == 3


def test_checkpoint_resume(tmp_path):
    scene = _small_scene(iters=4)
    r = Renderer(scene)
    r.render_frames(2)
    ckpt = tmp_path / "render.npz"
    r.save_checkpoint(ckpt)

    r2 = Renderer(_small_scene(iters=4))
    r2.load_checkpoint(ckpt)
    assert r2.next_frame == 2
    a = r.render()  # frames 2..3
    b = r2.render()
    assert np.array_equal(a, b)


def test_checkpoint_rejects_mismatched_config(tmp_path):
    r = Renderer(_small_scene(iters=4))
    r.render_frames(1)
    ckpt = tmp_path / "c.npz"
    r.save_checkpoint(ckpt)
    other = Renderer(_small_scene(w=16, h=24, iters=4))
    with pytest.raises(ValueError):
        other.load_checkpoint(ckpt)


def test_checkpoint_rejects_different_scene(tmp_path):
    """Same dimensions, different scene content: the checkpoint's scene
    digest must refuse the resume (blending two unrelated renders)."""
    r = Renderer(_small_scene(iters=4))
    r.render_frames(1)
    ckpt = tmp_path / "c.npz"
    r.save_checkpoint(ckpt)

    other_scene = _small_scene(iters=4)
    other_scene.objects[0].position = (9.0, 9.0, 9.0)
    other = Renderer(other_scene)
    with pytest.raises(ValueError, match="DIFFERENT scene"):
        other.load_checkpoint(ckpt)

    # identical scene content still resumes
    same = Renderer(_small_scene(iters=4))
    same.load_checkpoint(ckpt)
    assert same.next_frame == 1


def test_scene_digest_stable_across_processes():
    """The digest must be a pure content hash: identical in fresh
    interpreters. (Regression: ``np.asarray(None)`` hashed the ``None``
    PyObject pointer — different per process under ASLR — so every
    cross-process ``--resume`` of a sky-less scene was refused.)"""
    import subprocess
    import sys

    prog = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from spectral_tpu.scene.presets import default_scene\n"
        "from spectral_tpu.scene.flatten import flatten_scene\n"
        "from spectral_tpu.render.renderer import scene_digest\n"
        "a, c = flatten_scene(default_scene())\n"
        "assert a.sky is None\n"
        "print(scene_digest(a, c))\n"
    )
    outs = [
        subprocess.run(
            [sys.executable, "-c", prog],
            capture_output=True, text=True, check=True, cwd="/root/repo",
        ).stdout.strip()
        for _ in range(2)
    ]
    assert outs[0] == outs[1] and len(outs[0]) == 64


def test_checkpoint_without_digest_warns(tmp_path):
    """Pre-fingerprint checkpoints load with a warning, not an error."""
    r = Renderer(_small_scene(iters=4))
    r.render_frames(1)
    legacy = tmp_path / "legacy.npz"
    with open(legacy, "wb") as f:
        np.savez(
            f,
            accum=r.framebuffer(),
            next_frame=1,
            intended_frames=r.config.intended_frames,
            width=r.config.width,
            height=r.config.height,
        )
    r2 = Renderer(_small_scene(iters=4))
    with pytest.warns(UserWarning, match="fingerprint"):
        r2.load_checkpoint(legacy)
    assert r2.next_frame == 1


def test_image_export_formats(tmp_path):
    r = Renderer(_small_scene(iters=1))
    r.render()
    for ext in ("png", "jpg", "bmp", "tiff"):
        p = tmp_path / f"out.{ext}"
        r.save_image(p)
        assert p.exists() and p.stat().st_size > 0
    # u8 conversion clamps and truncates like Rust `as u8`
    u8 = image_mod.accum_to_u8(np.array([[[1.5, -0.2, 0.5, 1.0]]], np.float32))
    assert u8.tolist() == [[[255, 0, 127, 255]]]


def test_row_sharded_render_matches_single_device():
    import jax

    from spectral_tpu.parallel.mesh import make_mesh, row_sharding

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    scene = _small_scene(h=24, iters=2)
    single = Renderer(scene).render()

    mesh = make_mesh(8)
    sharded = Renderer(_small_scene(h=24, iters=2), sharding=row_sharding(mesh)).render()
    # pixel rows are independent; SPMD partitioning may reassociate f32 ops
    # (observed max diff ~2e-7) but no pixel may change visibly
    assert np.allclose(single, sharded, atol=1e-5)


def test_sharding_rejects_indivisible_height():
    import jax

    from spectral_tpu.parallel.mesh import make_mesh, row_sharding

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        Renderer(_small_scene(h=30), sharding=row_sharding(mesh))


def test_checkpoint_arbitrary_extension(tmp_path):
    # np.savez silently appends .npz to bare paths; ours must not
    r = Renderer(_small_scene(iters=2))
    r.render_frames(1)
    p = tmp_path / "run.ckpt"
    r.save_checkpoint(p)
    assert p.exists()
    r2 = Renderer(_small_scene(iters=2))
    r2.load_checkpoint(p)
    assert r2.next_frame == 1


def test_renderer_does_not_mutate_scene_spectra():
    scene = _small_scene()
    edited = scene.spectra[0].spectrum.values.copy()
    edited[3] = 123.0
    scene.spectra[0].spectrum.intensities[3] = 123.0
    Renderer(scene)
    assert scene.spectra[0].spectrum.values[3] == 123.0  # edit preserved


def test_zero_light_and_zero_object_scenes():
    scene = _small_scene(iters=1, bounces=2)
    for l in scene.lights:
        l.hidden = True
    img = Renderer(scene).render()
    assert not np.isnan(img).any()

    scene2 = _small_scene(iters=1)
    for o in scene2.objects:
        o.hidden = True
    img2 = Renderer(scene2).render()
    assert float(np.abs(img2[..., :3]).max()) == 0.0  # all rays miss -> black


def test_grid_accel_conflicts_with_explicit_pallas():
    from spectral_tpu.scene import presets as P

    scene = _small_scene()
    # on CPU hosts the explicit-pallas request is refused first; either
    # way the conflicting combination must raise
    with pytest.raises(ValueError, match="accel='grid'|requires a TPU"):
        Renderer(scene, backend="pallas", accel="grid")


def test_explicit_pallas_on_cpu_raises():
    import jax

    if "tpu" in jax.devices()[0].platform.lower():
        pytest.skip("TPU host")
    with pytest.raises(ValueError, match="requires a TPU"):
        Renderer(_small_scene(), backend="pallas")


def test_frames_per_dispatch_matches_per_frame():
    """lax.scan-fused dispatch (frames_per_dispatch=k) is bit-identical to
    per-frame dispatch: the scan body IS the per-frame step, including the
    1/(frame+1) blend. 7 frames at k=3 exercises the ragged tail (3+3+1)."""
    ref = Renderer(_small_scene(iters=7)).render()

    r = Renderer(_small_scene(iters=7), frames_per_dispatch=3)
    seen = []
    got = r.render(progress=lambda p: seen.append(p.frame_id))
    assert seen == [2, 5, 6]  # progress fires once per chunk
    assert np.array_equal(ref, got)

    # mid-render checkpointing still lands on a frame boundary
    r2 = Renderer(_small_scene(iters=7), frames_per_dispatch=4)
    r2.render_frames(4)
    assert r2.next_frame == 4
    r2.render_frames(99)
    assert np.array_equal(ref, r2.framebuffer())


def test_frames_per_dispatch_rejects_incompatible_modes():
    with pytest.raises(ValueError, match="frames_per_dispatch"):
        Renderer(_small_scene(), frames_per_dispatch=0)
    import jax

    if jax.device_count() >= 2:
        from spectral_tpu.parallel.mesh import make_mesh, row_sharding

        with pytest.raises(ValueError, match="per-frame"):
            Renderer(
                _small_scene(h=24),
                sharding=row_sharding(make_mesh(2)),
                frames_per_dispatch=2,
            )


def test_accumulate_frames_equals_sequential_blend():
    """The k-frame blend (regen path) must equal k sequential
    accumulate_frame calls: both are the running mean in exact math;
    check f32 agreement to tight tolerance."""
    from spectral_tpu.render.integrator import (
        accumulate_frame, accumulate_frames,
    )

    rng = np.random.default_rng(7)
    frames = rng.uniform(0, 2, size=(5, 4, 6, 3)).astype(np.float32)
    seq = np.zeros((4, 6, 4), np.float32)
    for i in range(5):
        seq = np.asarray(accumulate_frame(seq, frames[i], np.uint32(i)))
    # two chunks: frames 0-2 then 3-4
    chunked = np.zeros((4, 6, 4), np.float32)
    chunked = np.asarray(
        accumulate_frames(chunked, frames[:3].sum(axis=0), np.uint32(0), 3)
    )
    chunked = np.asarray(
        accumulate_frames(chunked, frames[3:].sum(axis=0), np.uint32(3), 2)
    )
    assert np.allclose(seq, chunked, atol=2e-6)
    assert np.allclose(chunked[..., 3], 1.0, atol=1e-6)


def test_regen_checkpoint_resume_chunks(tmp_path):
    """Checkpoint/resume lands on chunk boundaries and the resumed
    renderer finishes with the same frame count."""
    from spectral_tpu.render.renderer import Renderer

    def scene():
        sc = _small_scene(iters=7)
        return sc

    r = Renderer(scene(), regen_frames=3, _interpret=True, backend="jnp")
    r.backend = "pallas"
    r.render_frames(3)
    assert r.next_frame == 3
    ckpt = tmp_path / "regen.npz"
    r.save_checkpoint(ckpt)

    r2 = Renderer(scene(), regen_frames=3, _interpret=True, backend="jnp")
    r2.backend = "pallas"
    r2.load_checkpoint(ckpt)
    r2.render()
    assert r2.next_frame == 7  # chunks 3 + 1 tail after resume... 3,1
    assert not np.isnan(r2.framebuffer()).any()


def test_display_transform_opt_in():
    """--exposure/--gamma are export-time opt-ins; the default stays the
    reference's straight linear u8 conversion (a documented quirk)."""
    rng = np.random.default_rng(3)
    accum = rng.uniform(0, 1.4, size=(4, 6, 4)).astype(np.float32)

    out = image_mod.apply_display_transform(accum, exposure=2.0, gamma=2.2)
    expect = np.clip(accum[..., :3], 0, None) * 2.0
    expect = np.power(expect, 1.0 / 2.2)
    assert np.allclose(out[..., :3], expect, atol=1e-6)
    assert np.array_equal(out[..., 3], accum[..., 3])  # alpha untouched
    # the input buffer is not mutated
    assert accum.max() < 1.5

    import pytest as _pytest

    with _pytest.raises(ValueError):
        image_mod.apply_display_transform(accum, exposure=0.0)
    with _pytest.raises(ValueError):
        image_mod.apply_display_transform(accum, gamma=-1.0)


def test_save_image_display_transform(tmp_path):
    accum = np.full((4, 4, 4), 0.25, np.float32)
    accum[..., 3] = 1.0
    p_lin = tmp_path / "lin.png"
    p_g22 = tmp_path / "g22.png"
    image_mod.save_image(accum, p_lin)
    image_mod.save_image(accum, p_g22, gamma=2.2)
    from PIL import Image

    lin = np.asarray(Image.open(p_lin))
    g22 = np.asarray(Image.open(p_g22))
    assert lin[0, 0, 0] == int(0.25 * 255)
    assert g22[0, 0, 0] == int(0.25 ** (1 / 2.2) * 255)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        image_mod.save_image(accum, tmp_path / "x.png",
                             u8=np.zeros((4, 4, 4), np.uint8), gamma=2.2)
