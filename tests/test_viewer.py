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
            # iterations high enough that the render can NEVER finish
            # before the abort lands (with a warm persistent XLA cache a
            # 300-iteration 16x8 render completes in ~2 s — faster than
            # this poll loop can observe it — which orphans the poll)
            "8", "--iterations", "100000", "--bounces", "2",
            "--samples", "8",
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
        assert proc.poll() is None, buf.decode(errors="replace")
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


def test_viewer_scene_edit_endpoints():
    """GET /scene serves the published scene; POST /scene validates (400
    on legality errors) and queues the edit for the render loop."""
    from spectral_tpu.scene import presets
    from spectral_tpu.utils import sceneio

    v = LiveViewer(port=0)
    try:
        # nothing published yet
        try:
            status, _ = _get(v.url + "scene")
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 404

        scene = presets.default_scene()
        v.publish_scene(scene)
        status, body = _get(v.url + "scene")
        assert status == 200
        d = json.loads(body)
        assert d["settings"]["width"] == scene.width

        # illegal edit: nonpositive iterations -> 400, nothing queued
        bad = json.loads(body)
        bad["settings"]["iterations"] = 0
        req = urllib.request.Request(
            v.url + "scene", data=json.dumps(bad).encode(), method="POST"
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                status = r.status
        except urllib.error.HTTPError as e:
            status = e.code
            msg = e.read()
        assert status == 400 and b"iterations" in msg
        assert not v.scene_edit_pending()

        # legal edit: shrink the image -> queued and retrievable once
        good = json.loads(body)
        good["settings"]["width"] = 24
        req = urllib.request.Request(
            v.url + "scene", data=json.dumps(good).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
        assert v.scene_edit_pending()
        edited = v.take_scene_edit()
        assert edited.width == 24
        assert v.take_scene_edit() is None
        # the queued object is a real Scene (round-trips through sceneio)
        assert sceneio.scene_to_dict(edited)["settings"]["width"] == 24
    finally:
        v.close()


def test_cli_serve_scene_edit_restarts(tmp_path):
    """Submitting a scene edit over HTTP restarts the render with the new
    scene at a frame boundary (the reference's edit-then-Start cycle)."""
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
            # never-finishing iteration count: see test_cli_serve_end_to_end
            "8", "--iterations", "100000", "--bounces", "2",
            "--samples", "8",
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

    deadline = time.monotonic() + 900
    while True:
        assert time.monotonic() < deadline
        assert proc.poll() is None, buf.decode(errors="replace")
        try:
            if json.loads(_get(url + "status")[1])["frame"] > 0:
                break
        except Exception:
            pass
        time.sleep(0.25)

    # edit: brighten nothing fancy — just change the height (shape change
    # proves the renderer was genuinely rebuilt)
    d = json.loads(_get(url + "scene")[1])
    d["settings"]["height"] = 16
    req = urllib.request.Request(
        url + "scene", data=json.dumps(d).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200

    # the served scene must flip to the edited one after the restart
    deadline = time.monotonic() + 900
    while True:
        assert time.monotonic() < deadline
        assert proc.poll() is None, buf.decode(errors="replace")
        try:
            if json.loads(_get(url + "scene")[1])["settings"]["height"] == 16:
                break
        except Exception:
            pass
        time.sleep(0.25)

    req = urllib.request.Request(url + "abort", method="POST")
    urllib.request.urlopen(req, timeout=10)
    _, rest = proc.communicate(timeout=300)
    text = (buf + (rest or b"")).decode(errors="replace")
    assert proc.returncode == 0, text
    assert "restarting render" in text
    from PIL import Image

    assert np.asarray(Image.open(out)).shape[0] == 16  # edited height


def test_viewer_spectrum_editor_endpoints():
    """GET /spectra lists editor state; POST /spectrum/preview computes
    live colors without touching the scene; POST /spectrum validates and
    queues the edit (the reference's right panel, src/main.rs:894-1064)."""
    from spectral_tpu.scene import presets
    from spectral_tpu.scene.schema import (
        Custom, SceneSpectrum, SpectrumEffectType,
    )

    v = LiveViewer(port=0)
    try:
        scene = presets.default_scene()
        # add an editable Custom reflective spectrum
        custom = SceneSpectrum.new(
            "my custom", Custom(), SpectrumEffectType.REFLECTIVE,
            n=scene.spectrum_number_of_samples,
            values=np.full(scene.spectrum_number_of_samples, 0.25,
                           np.float32),
        )
        scene.spectra.append(custom)
        v.publish_scene(scene)

        status, body = _get(v.url + "spectra")
        assert status == 200
        spectra = json.loads(body)
        assert len(spectra) == len(scene.spectra)
        mine = spectra[-1]
        assert mine["name"] == "my custom" and mine["editable"]
        assert len(mine["wavelengths"]) == len(mine["values"])
        assert mine["slider_max"] == 1.0  # reflective bound
        # reflective spectra get all three preview squares
        assert set(mine["previews"]) == {
            "observed", "normalized", "reflected"
        }
        # generated types are read-only, like upstream
        solarish = spectra[0]
        assert not solarish["editable"]
        assert solarish["slider_max"] > 0.01  # emissive: 2x max

        # live preview: doubled values brighten the reflected color and
        # do NOT modify the published scene
        cand = [min(1.0, 2 * x) for x in mine["values"]]
        req = urllib.request.Request(
            v.url + "spectrum/preview",
            data=json.dumps(
                {"index": len(spectra) - 1, "values": cand}
            ).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            p = json.loads(r.read())
        assert p["previews"]["reflected"][1] > mine["previews"]["reflected"][1]
        assert json.loads(_get(v.url + "spectra")[1])[-1]["values"] == mine[
            "values"
        ]

        # invalid edit: reflective sample > 1 -> 400, nothing queued
        bad = list(mine["values"])
        bad[0] = 2.0
        req = urllib.request.Request(
            v.url + "spectrum",
            data=json.dumps(
                {"index": len(spectra) - 1, "values": bad}
            ).encode(),
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                status = r.status
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 400
        assert not v.scene_edit_pending()

        # editing a generated spectrum is refused (reference disables
        # those sliders)
        req = urllib.request.Request(
            v.url + "spectrum",
            data=json.dumps({"index": 0, "values": cand}).encode(),
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                status = r.status
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 400

        # valid edit: queued for the frame boundary + published state
        # reflects it immediately
        req = urllib.request.Request(
            v.url + "spectrum",
            data=json.dumps(
                {"index": len(spectra) - 1, "values": cand}
            ).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
        assert v.scene_edit_pending()
        edited = v.take_scene_edit()
        np.testing.assert_allclose(
            edited.spectra[-1].spectrum.values, np.asarray(cand, np.float32)
        )
        assert json.loads(_get(v.url + "spectra")[1])[-1]["values"] == [
            float(np.float32(x)) for x in cand
        ]
    finally:
        v.close()


def test_viewer_per_object_editor_endpoints():
    """The per-object editor (the reference's Objects tab forms and
    copy/hide/delete context menu, src/main.rs:101-1259 /
    src/main.rs:2619-2666): GET /objects state, and POST /object
    update/copy/toggle_hidden/delete for objects, lights and materials —
    every accepted edit is validated and queued for the next frame
    boundary; illegal edits are refused with HTTP 400 and change
    nothing."""
    from spectral_tpu.scene import presets

    v = LiveViewer(port=0)
    try:
        scene = presets.cornell_box()
        v.publish_scene(scene)

        status, body = _get(v.url + "objects")
        state = json.loads(body)
        assert status == 200
        n_obj = len(state["objects"])
        n_lights = len(state["lights"])
        assert n_obj == len(scene.objects)
        assert state["materials"] and state["material_names"]
        first = state["objects"][0]
        assert first["kind"] in (
            "PlainBox", "Sphere", "RotatedBox", "Mesh"
        )
        assert first["material"] in state["material_names"]

        def post(body_dict, expect_ok=True):
            req = urllib.request.Request(
                v.url + "object", method="POST",
                data=json.dumps(body_dict).encode(),
            )
            try:
                with urllib.request.urlopen(req, timeout=10) as r:
                    return r.status, r.read()
            except urllib.error.HTTPError as e:
                assert not expect_ok, e.read()
                return e.code, b""

        # update: move + rename + resize the first object
        new_pos = [p + 0.25 for p in first["position"]]
        params = {k: float(first["params"][k]) * 1.5
                  for k in first["editable_params"]}
        status, msg = post({
            "kind": "object", "index": 0, "action": "update",
            "fields": {"name": "edited-obj", "position": new_pos,
                       "params": params, "material": first["material"]},
        })
        assert status == 200 and b"edited-obj" in msg
        edited = v.take_scene_edit()
        assert edited is not None
        assert edited.objects[0].name == "edited-obj"
        assert edited.objects[0].position[0] == new_pos[0]

        # the published JSON reflects the accepted edit
        state2 = json.loads(_get(v.url + "objects")[1])
        assert state2["objects"][0]["name"] == "edited-obj"

        # copy then delete an object (reference context menu)
        status, _ = post({"kind": "object", "index": 1, "action": "copy"})
        assert status == 200
        state3 = json.loads(_get(v.url + "objects")[1])
        assert len(state3["objects"]) == n_obj + 1
        assert state3["objects"][-1]["name"].endswith(" copy")
        status, _ = post({
            "kind": "object", "index": n_obj, "action": "delete",
        })
        assert status == 200
        assert len(json.loads(_get(v.url + "objects")[1])["objects"]) \
            == n_obj

        # hide / show round-trip
        status, _ = post({
            "kind": "object", "index": 0, "action": "toggle_hidden",
        })
        assert status == 200
        assert json.loads(_get(v.url + "objects")[1])["objects"][0]["hidden"]
        post({"kind": "object", "index": 0, "action": "toggle_hidden"})
        assert not json.loads(
            _get(v.url + "objects")[1]
        )["objects"][0]["hidden"]

        # light edit: move + respectrum
        li = json.loads(_get(v.url + "objects")[1])["lights"][0]
        status, _ = post({
            "kind": "light", "index": 0, "action": "update",
            "fields": {"position": [0.0, 0.9, 0.5],
                       "spectrum": li["spectrum"]},
        })
        assert status == 200
        assert json.loads(
            _get(v.url + "objects")[1]
        )["lights"][0]["position"][1] == 0.9
        assert len(json.loads(_get(v.url + "objects")[1])["lights"]) \
            == n_lights

        # material scalar edit
        status, _ = post({
            "kind": "material", "index": 0, "action": "update",
            "fields": {"metallicness": 0.75, "roughness": 0.3},
        })
        assert status == 200
        m0 = json.loads(_get(v.url + "objects")[1])["materials"][0]
        assert m0["metallicness"] == 0.75 and m0["roughness"] == 0.3

        # rejected edits: unknown material, out-of-range index, illegal
        # scalar (validate() refuses) — all 400, nothing queued
        v.take_scene_edit()
        status, _ = post({
            "kind": "object", "index": 0, "action": "update",
            "fields": {"material": "no-such-material"},
        }, expect_ok=False)
        assert status == 400
        status, _ = post(
            {"kind": "object", "index": 99, "action": "delete"},
            expect_ok=False,
        )
        assert status == 400
        status, _ = post({
            "kind": "material", "index": 0, "action": "update",
            "fields": {"transmission": 2.0},
        }, expect_ok=False)
        assert status == 400
        assert not v.scene_edit_pending()
    finally:
        v.close()
