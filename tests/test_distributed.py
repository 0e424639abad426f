"""Multi-host (multi-process) rendering: 2 processes x 4 virtual CPU
devices, wired via jax.distributed — the TPU-pod analog run without a pod
(SURVEY.md C12/§5: the reference is single-process; scale past one host is
the rebuild's addition)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from spectral_tpu.render.renderer import Renderer
from spectral_tpu.scene import presets


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _scene():
    scene = presets.default_scene()
    scene.width, scene.height = 16, 24
    scene.nbr_of_iterations = 2
    scene.nbr_of_ray_bounces = 2
    scene.spectrum_number_of_samples = 8
    scene.update_all_spectrum_sample_sizes()
    return scene


def test_two_process_render_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "dist.png"
    ckpt = tmp_path / "dist.ckpt.npz"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    def proc(pid: int) -> subprocess.Popen:
        return subprocess.Popen(
            [
                sys.executable, "-m", "spectral_tpu", "--platform", "cpu",
                "render", "--preset", "default", "--width", "16",
                "--height", "24", "--iterations", "2", "--bounces", "2",
                "--samples", "8", "--mesh", "8", "--quiet",
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                "--out", str(out), "--checkpoint", str(ckpt),
            ],
            env=env,
            stderr=subprocess.PIPE,
        )

    p0, p1 = proc(0), proc(1)
    _, err0 = p0.communicate(timeout=540)
    _, err1 = p1.communicate(timeout=60)
    assert p0.returncode == 0, err0.decode(errors="replace")
    assert p1.returncode == 0, err1.decode(errors="replace")
    assert out.exists()
    text = err0.decode(errors="replace")
    assert "distributed: process 0/2" in text

    got = np.load(ckpt)["accum"]

    want = Renderer(_scene()).render()
    # rows are pixel-disjoint; SPMD partitioning may reassociate f32 ops
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-5)


def test_two_process_persist_adaptive(tmp_path):
    """Sharded persist + adaptive stopping across TWO processes: the
    launch loop reads replicated pmin scalars and the adaptive epilogue
    all-gathers non-addressable count planes — both multi-process-only
    code paths."""
    port = _free_port()
    out = tmp_path / "dist_persist.png"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    def proc(pid: int) -> subprocess.Popen:
        return subprocess.Popen(
            [
                sys.executable, "-m", "spectral_tpu", "--platform", "cpu",
                "render", "--preset", "default", "--width", "16",
                "--height", "24", "--iterations", "8", "--bounces", "2",
                "--samples", "8", "--mesh", "8", "--quiet",
                "--persist", "--persist-budget", "4", "--interpret",
                "--adaptive", "2,1e9,1e9",
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                "--out", str(out),
            ],
            env=env,
            stderr=subprocess.PIPE,
        )

    p0, p1 = proc(0), proc(1)
    _, err0 = p0.communicate(timeout=540)
    _, err1 = p1.communicate(timeout=60)
    assert p0.returncode == 0, err0.decode(errors="replace")
    assert p1.returncode == 0, err1.decode(errors="replace")
    assert out.exists()
    text = err0.decode(errors="replace")
    assert "adaptive:" in text  # per-pixel count report reached stderr
    assert "compactions" in text  # repack counter plumbed end-to-end
