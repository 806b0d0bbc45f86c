"""Live render preview over HTTP (the headless answer to minifb).

The reference opens a minifb window and blits the progressive film every
frame (``src/main.rs:79-89,262-267``). A TPU render node has no display,
so the interactive equivalent is a tiny zero-dependency HTTP server:

    GET /          auto-refreshing HTML page with the preview + telemetry
    GET /frame.png latest tonemapped film
    GET /stats     render telemetry as JSON (the title-bar stats,
                   ``src/main.rs:352-388``)

The CLI enables it with ``--serve PORT``; the render loop publishes each
pass with :meth:`PreviewServer.publish`.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = b"""<!doctype html>
<html><head><title>bendy-tpu</title>
<style>body{background:#111;color:#ccc;font-family:monospace;text-align:center}
img{image-rendering:pixelated;margin-top:1em;max-width:90vw}</style>
<script>
async function tick(){
  const s = await (await fetch('/stats')).json();
  document.getElementById('s').textContent = JSON.stringify(s);
  document.getElementById('f').src = '/frame.png?' + s.passes;
}
setInterval(tick, 1000); window.onload = tick;
</script></head>
<body><h3>bendy-tpu live preview</h3><div id=s></div><img id=f src=/frame.png></body></html>
"""


class PreviewServer:
    def __init__(self, port: int) -> None:
        self._lock = threading.Lock()
        self._png = b""
        self._stats = {}
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def do_GET(self):
                if self.path.startswith("/frame.png"):
                    with server._lock:
                        body, ctype = server._png, "image/png"
                elif self.path.startswith("/stats"):
                    with server._lock:
                        body = json.dumps(server._stats).encode()
                    ctype = "application/json"
                else:
                    body, ctype = _PAGE, "text/html"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        self.port = port

    def publish(self, film, **stats) -> None:
        """Publish the film's current preview + telemetry."""
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(film.preview()).save(buf, format="PNG")
        with self._lock:
            self._png = buf.getvalue()
            self._stats = {"samples": film.samples, "passes": film.passes, **stats}

    def close(self) -> None:
        self._httpd.shutdown()
