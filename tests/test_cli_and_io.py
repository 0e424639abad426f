"""Scene JSON round-trip and CLI driver."""

import json

import numpy as np
import pytest

from spectral_tpu.cli import main
from spectral_tpu.scene import presets
from spectral_tpu.scene.flatten import flatten_scene
from spectral_tpu.scene.schema import Custom, SceneSpectrum, SpectrumEffectType
from spectral_tpu.utils import sceneio


@pytest.mark.parametrize("preset", ["default", "cornell"])
def test_scene_json_round_trip(preset):
    scene = presets.PRESETS[preset]()
    loaded = sceneio.scene_from_dict(sceneio.scene_to_dict(scene))
    a, ca = flatten_scene(scene)
    b, cb = flatten_scene(loaded)
    assert ca == cb
    for field in (
        "obj_type", "slab_min", "slab_max", "rot", "sphere_pos", "radius",
        "metallicness", "roughness", "albedo", "light_pos", "light_spec",
        "cam_pos", "cam_dir", "cam_up",
    ):
        assert np.array_equal(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        ), field


def test_custom_spectrum_round_trip(tmp_path):
    scene = presets.default_scene()
    vals = np.linspace(0.1, 0.9, 32).astype(np.float32)
    custom = SceneSpectrum.new(
        "my custom", Custom(), SpectrumEffectType.REFLECTIVE, values=vals
    )
    scene.spectra.append(custom)
    p = tmp_path / "scene.json"
    sceneio.save_scene(scene, p)
    loaded = sceneio.load_scene(p)
    assert loaded.spectra[-1].name == "my custom"
    assert np.allclose(loaded.spectra[-1].spectrum.values, vals)


def test_rejects_unknown_format():
    with pytest.raises(ValueError, match="unsupported scene format"):
        sceneio.scene_from_dict({"format": "something/v9"})


def test_cli_render_and_describe(tmp_path, capsys):
    out = tmp_path / "img.png"
    ckpt = tmp_path / "c.npz"
    rc = main([
        "render", "--preset", "cornell", "--width", "24", "--height", "16",
        "--iterations", "2", "--bounces", "2", "--samples", "8",
        "--out", str(out), "--checkpoint", str(ckpt), "--quiet",
    ])
    assert rc == 0
    assert out.exists() and ckpt.exists()

    rc = main(["describe", "--preset", "cornell"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "Top light" in text and "7 objects" in text


def test_cli_scene_dump_and_render(tmp_path):
    scene_file = tmp_path / "s.json"
    assert main(["scene", "dump", "--preset", "default", "--out", str(scene_file)]) == 0
    data = json.loads(scene_file.read_text())
    assert data["format"] == "spectral_tpu.scene/v1"
    out = tmp_path / "o.png"
    rc = main([
        "render", "--scene", str(scene_file), "--width", "16", "--height", "8",
        "--iterations", "1", "--bounces", "1", "--out", str(out), "--quiet",
    ])
    assert rc == 0 and out.exists()


def test_cli_resume(tmp_path):
    out = tmp_path / "img.png"
    ckpt = tmp_path / "c.npz"
    main([
        "render", "--preset", "default", "--width", "16", "--height", "8",
        "--iterations", "2", "--bounces", "1", "--out", str(out),
        "--checkpoint", str(ckpt), "--quiet",
    ])
    first = out.read_bytes()
    # resuming a finished render with the same config is a no-op re-save
    rc = main([
        "render", "--preset", "default", "--width", "16", "--height", "8",
        "--iterations", "2", "--bounces", "1", "--out", str(out),
        "--resume", str(ckpt), "--quiet",
    ])
    assert rc == 0
    assert out.read_bytes() == first


def test_cli_resume_rejects_mismatch(tmp_path):
    out = tmp_path / "img.png"
    ckpt = tmp_path / "c.npz"
    main([
        "render", "--preset", "default", "--width", "16", "--height", "8",
        "--iterations", "2", "--bounces", "1", "--out", str(out),
        "--checkpoint", str(ckpt), "--quiet",
    ])
    with pytest.raises(ValueError):
        main([
            "render", "--preset", "default", "--width", "32", "--height", "8",
            "--iterations", "2", "--bounces", "1", "--out", str(out),
            "--resume", str(ckpt), "--quiet",
        ])


def test_dielectric_fields_round_trip_without_transmission():
    # staged glass: transmission 0 but tuned ior/cauchy must survive
    scene = presets.default_scene()
    scene.materials[0].ior = 1.8
    scene.materials[0].cauchy_b_um2 = 0.01
    loaded = sceneio.scene_from_dict(sceneio.scene_to_dict(scene))
    assert loaded.materials[0].ior == 1.8
    assert loaded.materials[0].cauchy_b_um2 == 0.01


def test_cli_compare(tmp_path, capsys):
    import numpy as np
    from PIL import Image

    a = np.zeros((8, 8, 3), np.uint8)
    b = a.copy()
    b[0, 0] = 255
    Image.fromarray(a).save(tmp_path / "a.png")
    Image.fromarray(b).save(tmp_path / "b.png")
    assert main(["compare", str(tmp_path / "a.png"), str(tmp_path / "b.png")]) == 0
    out = capsys.readouterr().out
    assert "rmse" in out
    # one of 64 pixels fully different in 3 channels: rmse = sqrt(3/192)
    assert "0.125" in out


def test_cli_profile_writes_trace(tmp_path):
    out = tmp_path / "img.png"
    prof = tmp_path / "trace"
    rc = main([
        "render", "--preset", "default", "--width", "16", "--height", "8",
        "--iterations", "1", "--bounces", "1", "--out", str(out),
        "--profile", str(prof), "--quiet",
    ])
    assert rc == 0
    assert any(prof.rglob("*"))  # jax wrote trace artifacts


def test_cli_describe_shows_dielectric_fields(capsys):
    assert main(["describe", "--preset", "prism"]) == 0
    text = capsys.readouterr().out
    assert "transmission 1.0" in text and "emission 'Strip emission'" in text


def test_cli_sigint_aborts_gracefully_and_resumes(tmp_path):
    """First Ctrl-C finishes the current frame, saves image + auto
    checkpoint, exits 0; the checkpoint then resumes to completion
    (reference abort semantics, src/main.rs:1351-1357 +
    text_resources.rs:112-113)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    out = tmp_path / "img.png"
    base = [
        sys.executable, "-m", "spectral_tpu", "--platform", "cpu",
        "render", "--preset", "default", "--width", "16", "--height", "8",
        "--iterations", "60", "--bounces", "2", "--samples", "8",
        "--out", str(out),
    ]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.Popen(base, stderr=subprocess.PIPE, env=env)
    # wait for the first per-frame progress report, then interrupt
    buf = b""
    deadline = time.monotonic() + 180
    while b"frame " not in buf:
        assert time.monotonic() < deadline, buf.decode(errors="replace")
        chunk = proc.stderr.read1(4096)
        if not chunk:
            time.sleep(0.05)
            continue
        buf += chunk
    proc.send_signal(signal.SIGINT)
    _, rest = proc.communicate(timeout=120)
    buf += rest or b""
    text = buf.decode(errors="replace")
    assert proc.returncode == 0, text
    assert "abort requested" in text and "aborted after" in text
    assert out.exists()
    ckpt = tmp_path / "img.png.ckpt.npz"
    assert ckpt.exists(), text

    data = np.load(ckpt)
    frames_done = int(data["next_frame"])
    assert 0 < frames_done < 60

    # the auto-saved checkpoint resumes in-process (conftest already on CPU)
    rc = main([
        "render", "--preset", "default", "--width", "16", "--height", "8",
        "--iterations", "60", "--bounces", "2", "--samples", "8",
        "--out", str(out), "--resume", str(ckpt), "--quiet",
    ])
    assert rc == 0


def test_spectrum_edit_api(tmp_path):
    """Per-sample spectrum editing (reference UISpectrum::edit,
    src/main.rs:1799): only Custom spectra are editable, slider bounds are
    enforced, edits survive a JSON round-trip, and an edited spectrum
    renders differently."""
    import jax.numpy as jnp

    from spectral_tpu.render.renderer import Renderer
    from spectral_tpu.scene.schema import SceneError

    scene = presets.default_scene()
    n = scene.spectrum_number_of_samples
    vals = np.linspace(0.2, 0.8, n).astype(np.float32)
    custom = SceneSpectrum.new(
        "editable", Custom(), SpectrumEffectType.REFLECTIVE, values=vals
    )
    scene.spectra.append(custom)
    # point the first object's material at the custom spectrum
    scene.materials[0].spectrum = custom

    before = Renderer(scene).render_frames(1)

    # generated spectra refuse edits (the reference disables their sliders)
    with pytest.raises(SceneError, match="only Custom"):
        scene.spectra[0].edit(np.zeros(n, np.float32))
    # bounds: reflective samples stay in [0, 1]
    with pytest.raises(SceneError, match="<= 1"):
        custom.edit(np.full(n, 1.5, np.float32))
    with pytest.raises(SceneError, match="non-negative"):
        custom.edit(np.full(n, -0.1, np.float32))
    with pytest.raises(SceneError, match="expected"):
        custom.edit(np.zeros(n + 8, np.float32))

    edited = np.zeros(n, np.float32)
    edited[: n // 2] = 1.0  # half-band reflector: clearly different color
    custom.edit(edited)
    assert np.allclose(custom.spectrum.intensities[:n], edited)
    custom.edit_sample(n - 1, 0.5)
    assert custom.spectrum.intensities[n - 1] == np.float32(0.5)

    # JSON round-trip preserves the edit
    p = tmp_path / "edited.json"
    sceneio.save_scene(scene, p)
    loaded = sceneio.load_scene(p)
    got = loaded.spectra[-1].spectrum.intensities[:n]
    want = custom.spectrum.intensities[:n]
    assert np.allclose(got, want)

    after = Renderer(scene).render_frames(1)
    assert not np.array_equal(before, after)


def test_phase_capacity_rejects_auto():
    """--phase-capacity 'auto' used to crash deep inside the Renderer with
    int('a'); the CLI must reject it with a clear message."""
    from spectral_tpu.cli import _parse_phase

    assert _parse_phase("auto") == "auto"  # split accepts it
    assert _parse_phase("3,5", allow_auto=False) == (3, 5)
    with pytest.raises(SystemExit, match="phase-split auto"):
        _parse_phase("auto", allow_auto=False)


def test_cli_adaptive_flag_validation(capsys):
    """--adaptive requires --persist and a MIN,RTOL,ATOL triple; both
    error paths must exit with a clear message rather than a traceback."""
    from spectral_tpu.cli import main

    rc = main([
        "render", "--preset", "cornell", "--width", "16", "--height", "8",
        "--iterations", "2", "--adaptive", "4,0.1,1e-4", "--quiet",
        "--out", "/tmp/_noadaptive.png",
    ])
    assert rc == 2
    assert "requires --persist" in capsys.readouterr().err

    rc = main([
        "render", "--preset", "cornell", "--width", "16", "--height", "8",
        "--iterations", "2", "--persist", "--adaptive", "nonsense",
        "--quiet", "--out", "/tmp/_noadaptive.png",
    ])
    assert rc == 2
    assert "MIN,RTOL,ATOL" in capsys.readouterr().err


def test_validate_rejects_nonpositive_iterations():
    from spectral_tpu.scene.schema import SceneError

    scene = presets.default_scene()
    scene.nbr_of_iterations = 0
    with pytest.raises(SceneError, match="iterations"):
        scene.validate()
