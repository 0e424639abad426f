"""Live progressive-render viewer.

Headless re-design of the reference's Display tab (reference
``src/main.rs:2573-2611``): the tab shows each progressive frame as it
lands, a progress bar + timing labels, and an Abort button
(``src/main.rs:1238-1247``). Here that is a tiny in-process HTTP server:

* ``GET /``          — auto-refreshing page with the latest frame,
                       progress, an Abort button, and a scene editor
* ``GET /frame.png`` — latest frame as PNG
* ``GET /status``    — progress JSON
* ``POST /abort``    — request frame-granular abort (same semantics as
                       Ctrl-C: the current frame is finished first)
* ``GET /scene``     — the scene as editable JSON (the headless analog of
                       the reference's Objects / Spectra-and-Materials
                       tabs, reference ``src/main.rs:2392-2572``)
* ``POST /scene``    — submit an edited scene JSON; it is validated
                       immediately (HTTP 400 on a legality error — the
                       reference's blinking-red dispatch refusal,
                       ``src/main.rs:1452-1484``) and applied at the next
                       frame boundary: the render restarts progressive
                       accumulation with the new scene, exactly like
                       pressing Start after editing in the reference UI

The render thread pushes frames via :meth:`LiveViewer.update` and polls
:meth:`LiveViewer.take_scene_edit` between frames; the server thread only
ever serves cached bytes / queues validated edits, so no JAX state
crosses threads.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!doctype html>
<html><head><title>spectral_tpu live render</title>
<style>
 body { background: #111; color: #ddd; font: 14px monospace; margin: 2em; }
 img { image-rendering: pixelated; border: 1px solid #444; max-width: 95vw; }
 button { background: #922; color: #fff; border: 0; padding: .5em 1.2em;
          font: inherit; cursor: pointer; }
 #bar { background: #333; height: 8px; width: 480px; margin: .6em 0; }
 #fill { background: #2a7; height: 8px; width: 0; }
</style></head><body>
<h3>spectral_tpu &mdash; progressive render</h3>
<div id="status">waiting for first frame&hellip;</div>
<div id="bar"><div id="fill"></div></div>
<p><img id="frame" src="/frame.png" alt="(no frame yet)"></p>
<button onclick="fetch('/abort', {method: 'POST'})">Abort
 (finishes current frame)</button>
<details style="margin-top:1.5em"><summary>Edit scene (restarts render)</summary>
 <p><textarea id="scene" rows="24" cols="100"
  style="background:#181818;color:#cdc;border:1px solid #444;font:12px monospace"
  ></textarea></p>
 <button style="background:#272" onclick="applyScene()">Apply scene</button>
 <button style="background:#444" onclick="loadScene()">Reload from server</button>
 <span id="editmsg"></span>
</details>
<script>
 async function tick() {
   try {
     const s = await (await fetch('/status')).json();
     const spf = s.frame > 0 ? s.elapsed_s / s.frame : 0;
     const eta = s.frame > 0 ? spf * (s.total - s.frame) : 0;
     document.getElementById('status').textContent =
       `frame ${s.frame}/${s.total}  elapsed ${s.elapsed_s.toFixed(1)}s` +
       (s.frame > 0
         ? `  (${(spf * 1000).toFixed(1)} ms/frame, ETA ${eta.toFixed(0)}s)`
         : '') +
       (s.aborting ? '  [abort requested]' : '');
     document.getElementById('fill').style.width =
       (100 * s.frame / Math.max(1, s.total)) + '%';
     document.getElementById('frame').src = '/frame.png?t=' + Date.now();
   } catch (e) {}
 }
 async function loadScene() {
   const r = await fetch('/scene');
   document.getElementById('scene').value =
     JSON.stringify(await r.json(), null, 1);
 }
 async function applyScene() {
   const r = await fetch('/scene', {
     method: 'POST', body: document.getElementById('scene').value});
   document.getElementById('editmsg').textContent = await r.text();
 }
 setInterval(tick, 1000); tick(); loadScene();
</script></body></html>"""


class LiveViewer:
    """Serves the latest progressive frame over HTTP; thread-safe."""

    def __init__(self, port: int = 0, host: str = "127.0.0.1"):
        self._lock = threading.Lock()
        self._png: bytes | None = None
        self._status: dict = {"frame": 0, "total": 0, "elapsed_s": 0.0}
        self._abort = threading.Event()
        self._scene_dict: dict | None = None  # currently rendering scene
        self._pending_scene = None  # validated edit awaiting frame boundary
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/":
                    self._send(200, "text/html", _PAGE.encode())
                elif path == "/frame.png":
                    with viewer._lock:
                        png = viewer._png
                    if png is None:
                        self._send(404, "text/plain", b"no frame yet")
                    else:
                        self._send(200, "image/png", png)
                elif path == "/status":
                    with viewer._lock:
                        body = dict(viewer._status)
                    body["aborting"] = viewer._abort.is_set()
                    self._send(200, "application/json",
                               json.dumps(body).encode())
                elif path == "/scene":
                    with viewer._lock:
                        scene = viewer._scene_dict
                    if scene is None:
                        self._send(404, "text/plain", b"no scene published")
                    else:
                        self._send(200, "application/json",
                                   json.dumps(scene).encode())
                else:
                    self._send(404, "text/plain", b"not found")

            def do_POST(self):
                if self.path == "/abort":
                    viewer._abort.set()
                    self._send(200, "text/plain", b"abort requested")
                elif self.path == "/scene":
                    length = int(self.headers.get("Content-Length", 0))
                    raw = self.rfile.read(length)
                    try:
                        scene = viewer._validate_scene_json(raw)
                    except Exception as e:  # legality / parse errors -> 400
                        self._send(400, "text/plain",
                                   f"scene rejected: {e}".encode())
                        return
                    with viewer._lock:
                        viewer._pending_scene = scene
                    self._send(
                        200, "text/plain",
                        b"scene accepted; the render restarts with it at "
                        b"the next frame boundary",
                    )
                else:
                    self._send(404, "text/plain", b"not found")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    @property
    def url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}/"

    def abort_requested(self) -> bool:
        return self._abort.is_set()

    @staticmethod
    def _validate_scene_json(raw: bytes):
        """Parse + legality-check an edited scene (raises on any error —
        the reference refuses dispatch on an illegal scene,
        src/main.rs:1452-1484)."""
        from spectral_tpu.utils import sceneio

        scene = sceneio.scene_from_dict(json.loads(raw.decode()))
        scene.update_all_spectrum_sample_sizes()
        scene.validate()
        return scene

    def publish_scene(self, scene) -> None:
        """Expose the scene currently being rendered on ``GET /scene``."""
        from spectral_tpu.utils import sceneio

        d = sceneio.scene_to_dict(scene)
        with self._lock:
            self._scene_dict = d

    def take_scene_edit(self):
        """Pop a pending validated scene edit (None if none). Called by
        the render loop at frame boundaries."""
        with self._lock:
            scene, self._pending_scene = self._pending_scene, None
        return scene

    def scene_edit_pending(self) -> bool:
        with self._lock:
            return self._pending_scene is not None

    def update(self, framebuffer, frame: int, total: int, elapsed_s: float):
        """Publish a new frame (called from the render thread)."""
        import io

        from PIL import Image

        from spectral_tpu.render import image as image_mod

        u8 = image_mod.accum_to_u8(framebuffer)
        buf = io.BytesIO()
        Image.fromarray(u8, mode="RGBA").save(buf, format="PNG")
        with self._lock:
            self._png = buf.getvalue()
            self._status = {
                "frame": frame, "total": total, "elapsed_s": elapsed_s,
            }

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
