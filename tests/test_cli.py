"""End-to-end CLI tests on the CPU mesh: the reference binary's surface
(``src/main.rs:49-72``) driven through bendy_tpu.cli.main."""

import os

import numpy as np
import pytest

from bendy_tpu.cli import main
from bendy_tpu.film import Film


def _args(tmp_path, **over):
    base = {
        "--width": "16", "--height": "16", "--samples": "2", "--subsample": "1",
        "--scene": "scenes/cornell.json.gz",
        "--screenshot": str(tmp_path / "shot.png"),
        "--max-bounces": "2", "--spp-per-pass": "2", "--seed": "3",
        "--compile-cache": "",  # keep tests hermetic (no ~/.cache writes)
    }
    base.update(over)
    argv = []
    for k, v in base.items():
        argv += [k, v]
    return argv


def test_cli_renders_screenshot(tmp_path):
    assert main(_args(tmp_path)) == 0
    shot = tmp_path / "shot.png"
    assert shot.exists()
    from PIL import Image

    img = np.asarray(Image.open(shot))
    assert img.shape == (16, 16, 3)
    assert img.mean() > 5  # not black


def test_cli_checkpoint_resume(tmp_path):
    ckpt = str(tmp_path / "film.npz")
    assert main(_args(tmp_path, **{"--checkpoint": ckpt})) == 0
    film, seed = Film.load_checkpoint(ckpt)
    assert film.samples == 2 and seed == 3
    # resume: max samples 4 -> one more pass on top of the checkpoint
    assert main(_args(tmp_path, **{"--checkpoint": ckpt, "--samples": "4"})) == 0
    film2, _ = Film.load_checkpoint(ckpt)
    assert film2.samples == 4 and film2.passes == 2


def test_cli_checkpoint_cadence(tmp_path, monkeypatch):
    """Default cadence saves ONCE at exit (no per-pass film fetch);
    --checkpoint-every N saves every N passes plus the final one."""
    from bendy_tpu.film import DeviceFilm

    saves = []
    orig = DeviceFilm.save_checkpoint

    def counting_save(self, path, seed=0):
        saves.append(self.passes)
        return orig(self, path, seed=seed)

    monkeypatch.setattr(DeviceFilm, "save_checkpoint", counting_save)
    ckpt = str(tmp_path / "film.npz")
    # 3 passes (6 samples at 2 spp/pass), default cadence: one exit save
    assert main(_args(tmp_path, **{"--checkpoint": ckpt, "--samples": "6"})) == 0
    assert saves == [3]
    film, _ = Film.load_checkpoint(ckpt)
    assert film.samples == 6 and film.passes == 3

    # resume with a cadence of 2: passes 4..6 -> saves at pass 4, 6, exit
    saves.clear()
    assert main(_args(tmp_path, **{"--checkpoint": ckpt, "--samples": "12",
                                   "--checkpoint-every": "2"})) == 0
    assert saves == [4, 6, 6]
    film, _ = Film.load_checkpoint(ckpt)
    assert film.samples == 12 and film.passes == 6


def test_cli_compile_cache_populates(tmp_path):
    """[+] --compile-cache DIR: the jit programs persist across processes
    (the reference binary has zero compile cost; this flag keeps ours to
    once per machine instead of once per process)."""
    import jax

    cache = tmp_path / "xla-cache"
    # tiny CPU compiles can be fast: cache everything for the assertion
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        # a film shape no other test renders: the in-process jit cache
        # must MISS for an XLA compile (and hence a cache write) to happen
        assert main(_args(tmp_path, **{"--compile-cache": str(cache),
                                       "--width": "20", "--height": "12"})) == 0
        assert cache.is_dir() and len(os.listdir(cache)) > 0
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_compilation_cache_dir", None)


def test_cli_depth_channel_and_missing_camera(tmp_path):
    assert main(_args(tmp_path, **{"--output": "depth"})) == 0
    # a scene with no camera tag errors out cleanly (rc=2)
    import gzip
    import json

    from bendy_tpu.scene import load_scene, save_scene

    scene = load_scene("scenes/cornell.json.gz")
    cam = scene.find_by_tag("camera")
    scene.get_object(cam).tag = "not-a-camera"
    bad = str(tmp_path / "bad.json.gz")
    save_scene(bad, scene)
    assert main(_args(tmp_path, **{"--scene": bad})) == 2


def test_cli_mesh_oneshot(tmp_path):
    argv = _args(tmp_path, **{"--mesh": "4x2", "--samples": "4"})
    assert main(argv) == 0
    assert (tmp_path / "shot.png").exists()


def test_cli_serve_control_loop(tmp_path):
    """--serve: stop a running render through the control endpoint."""
    import json as _json
    import threading
    import urllib.request

    import bendy_tpu.cli as cli

    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    rc = {}

    def run():
        rc["rc"] = main(
            _args(tmp_path, **{"--samples": "512", "--serve": str(port)})
        )

    t = threading.Thread(target=run)
    t.start()
    # wait for the server, then request a screenshot and a stop
    import time

    deadline = time.time() + 120
    stats = None
    while time.time() < deadline:
        try:
            stats = _json.load(
                urllib.request.urlopen(f"http://localhost:{port}/stats", timeout=5)
            )
            if stats.get("passes", 0) >= 1:
                break
        except Exception:
            time.sleep(0.5)
    assert stats is not None, "preview server never came up"
    for cmd in ("screenshot", "stop"):
        req = urllib.request.Request(
            f"http://localhost:{port}/{cmd}", method="POST"
        )
        urllib.request.urlopen(req, timeout=5)
    t.join(timeout=180)
    assert not t.is_alive(), "render loop did not stop"
    assert rc["rc"] == 0
    assert (tmp_path / "shot.png").exists()


def test_cli_turntable(tmp_path):
    """[+] --turntable N renders N orbit frames to <screenshot>_###.png."""
    # the sphere showcase scene is visible from every orbit azimuth
    # (emissive environment); the cornell box is only open on one side
    assert main(_args(tmp_path, **{"--turntable": "2", "--width": "8",
                                   "--height": "8", "--samples": "1",
                                   "--scene": "scenes/scene.json.gz"})) == 0
    from PIL import Image

    for i in range(2):
        p = tmp_path / f"shot_{i:03d}.png"
        assert p.exists()
        assert np.asarray(Image.open(p)).mean() > 1  # not black
