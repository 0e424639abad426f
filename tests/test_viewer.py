"""Live HTTP viewer (the reference Display tab, src/main.rs:2573-2611)."""

import io
import json
import urllib.request

import numpy as np

from spectral_tpu.utils.viewer import LiveViewer


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def test_viewer_serves_frames_and_abort():
    v = LiveViewer(port=0)
    try:
        status, body = _get(v.url)
        assert status == 200 and b"Abort" in body

        # no frame yet
        try:
            status, _ = _get(v.url + "frame.png")
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 404

        accum = np.zeros((8, 8, 4), np.float32)
        accum[..., 1] = 0.5
        accum[..., 3] = 1.0
        v.update(accum, frame=3, total=10, elapsed_s=1.5)

        status, png = _get(v.url + "frame.png")
        assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(png)))
        assert img.shape == (8, 8, 4) and img[0, 0, 1] == 127

        status, body = _get(v.url + "status")
        s = json.loads(body)
        assert s["frame"] == 3 and s["total"] == 10 and not s["aborting"]

        assert not v.abort_requested()
        req = urllib.request.Request(v.url + "abort", method="POST")
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
        assert v.abort_requested()
    finally:
        v.close()


def test_cli_serve_end_to_end(tmp_path):
    """Full loop: render with --serve, watch progress over HTTP, press the
    Abort button, get a clean frame-granular abort + checkpoint."""
    import os
    import re
    import subprocess
    import sys
    import time

    out = tmp_path / "img.png"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "spectral_tpu", "--platform", "cpu",
            "render", "--preset", "default", "--width", "16", "--height",
            "8", "--iterations", "300", "--bounces", "2", "--samples", "8",
            "--out", str(out), "--serve", "0", "--quiet",
        ],
        env=env,
        stderr=subprocess.PIPE,
    )
    buf = b""
    deadline = time.monotonic() + 180
    while b"live view at " not in buf:
        assert time.monotonic() < deadline, buf.decode(errors="replace")
        chunk = proc.stderr.read1(4096)
        buf += chunk or b""
        if not chunk:
            time.sleep(0.05)
    url = re.search(rb"live view at (http://\S+)", buf).group(1).decode()

    # wait until a frame is visible, then abort via the HTTP button
    # very generous: alone this passes in ~5 s, but under the full suite
    # the render subprocess is starved while interpret-mode kernels
    # compile on every core (observed >300 s at -x with 141 tests)
    deadline = time.monotonic() + 900
    while True:
        assert time.monotonic() < deadline
        try:
            s = json.loads(_get(url + "status")[1])
            if s["frame"] > 0:
                break
        except Exception:
            pass
        time.sleep(0.25)
    status, png = _get(url + "frame.png")
    assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
    req = urllib.request.Request(url + "abort", method="POST")
    urllib.request.urlopen(req, timeout=10)

    _, rest = proc.communicate(timeout=120)
    text = (buf + (rest or b"")).decode(errors="replace")
    assert proc.returncode == 0, text
    assert "aborted after" in text
    assert out.exists()
    assert (tmp_path / "img.png.ckpt.npz").exists()
