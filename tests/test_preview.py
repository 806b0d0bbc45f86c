"""Live-preview HTTP server tests (the headless minifb replacement)."""

import json
import urllib.request

import numpy as np

from bendy_tpu.film import Film
from bendy_tpu.preview import PreviewServer


def test_preview_server_roundtrip():
    film = Film(16, 16)
    film.add_pass(np.random.default_rng(0).random((16, 16, 3)).astype(np.float32), 1)
    srv = PreviewServer(0)  # port 0: bind any free port
    port = srv._httpd.server_address[1]
    try:
        srv.publish(film, mrays=1.5)
        stats = json.load(urllib.request.urlopen(f"http://localhost:{port}/stats", timeout=10))
        assert stats["samples"] == 1 and stats["passes"] == 1 and stats["mrays"] == 1.5
        png = urllib.request.urlopen(f"http://localhost:{port}/frame.png", timeout=10).read()
        assert png[:4] == b"\x89PNG"
        page = urllib.request.urlopen(f"http://localhost:{port}/", timeout=10).read()
        assert b"bendy-tpu" in page
    finally:
        srv.close()
