"""Live-preview HTTP server tests (the headless minifb replacement),
including the runtime control endpoints (the reference's live-loop
hotkeys, ``src/main.rs:275-348``)."""

import json
import urllib.request

import numpy as np
import pytest

from bendy_tpu.film import Film
from bendy_tpu.preview import PreviewServer


def _post(port, path):
    req = urllib.request.Request(f"http://localhost:{port}{path}", method="POST")
    return json.load(urllib.request.urlopen(req, timeout=10))


def test_control_endpoints_enqueue_commands():
    srv = PreviewServer(0)
    try:
        assert _post(srv.port, "/screenshot") == {"queued": True}
        assert _post(srv.port, "/reload-scene") == {"queued": True}
        assert _post(srv.port, "/resize?width=32&height=16") == {"queued": True}
        assert _post(srv.port, "/stop") == {"queued": True}
        cmds = srv.drain_commands()
        assert [c[0] for c in cmds] == ["screenshot", "reload-scene", "resize", "stop"]
        assert cmds[2][1] == {"width": "32", "height": "16"}
        assert srv.drain_commands() == []  # drained
    finally:
        srv.close()


def test_unknown_command_404():
    import urllib.error

    import pytest

    srv = PreviewServer(0)
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, "/format-disk")
        assert e.value.code == 404
        assert srv.drain_commands() == []
    finally:
        srv.close()


def test_cli_command_handlers(tmp_path):
    """reload-scene rebuilds the renderer + clears the film; resize updates
    the film and camera aspect; stop flips the flag; checkpoint persists."""
    import argparse

    from bendy_tpu.cli import handle_command
    from bendy_tpu.render import Config, Renderer
    from bendy_tpu.scene import load_scene, save_scene

    scene = load_scene("scenes/cornell.json.gz")
    camera = scene.find_by_tag("camera")
    scene.get_object(camera).as_camera().aspect_ratio = 1.0
    renderer = Renderer(scene, Config(max_bounces=1))
    film = Film(8, 8)
    film.add_pass(np.ones((8, 8, 3), np.float32), 1)
    scene_path = str(tmp_path / "scene.json.gz")
    save_scene(scene_path, scene)
    args = argparse.Namespace(
        scene=scene_path, screenshot=str(tmp_path / "shot.png"),
        save_scene=None, checkpoint=None, seed=0,
    )

    s2, r2, cam2, stopped = handle_command(
        "reload-scene", {}, args, scene, renderer, camera, film
    )
    assert not stopped and s2 is not scene and r2 is not renderer
    assert film.samples == 0 and film.passes == 0

    _, _, _, stopped = handle_command(
        "resize", {"width": "16", "height": "8"}, args, s2, r2, cam2, film
    )
    assert (film.width, film.height) == (16, 8)
    assert s2.get_object(cam2).as_camera().aspect_ratio == 2.0

    _, _, _, stopped = handle_command("stop", {}, args, s2, r2, cam2, film)
    assert stopped

    ckpt = str(tmp_path / "f.npz")
    handle_command("checkpoint", {"path": ckpt}, args, s2, r2, cam2, film)
    loaded, _ = Film.load_checkpoint(ckpt)
    assert (loaded.width, loaded.height) == (16, 8)

    handle_command("screenshot", {}, args, s2, r2, cam2, film)
    assert (tmp_path / "shot.png").exists()


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


def test_publish_fetches_frame_only_on_demand():
    """publish() must not fetch the film every pass: on a DeviceFilm that
    is a ~24 MB device->host transfer per 1080p frame. The fetch+encode
    runs on the first publish and then only after a /frame.png request."""
    film = Film(8, 8)
    film.add_pass(np.ones((8, 8, 3), np.float32), 1)
    fetches = []
    orig = Film.preview

    class Counting(Film):
        def preview(self):
            fetches.append(1)
            return orig(self)

    film.__class__ = Counting
    srv = PreviewServer(0)
    try:
        srv.publish(film)  # first publish: encode (page needs something)
        assert len(fetches) == 1
        srv.publish(film)  # nobody asked since: no fetch
        srv.publish(film)
        assert len(fetches) == 1
        png = urllib.request.urlopen(
            f"http://localhost:{srv.port}/frame.png", timeout=10
        ).read()
        assert png[:4] == b"\x89PNG"  # served (stale) frame immediately
        srv.publish(film)  # demand flag set -> refresh
        assert len(fetches) == 2
        srv.publish(film)  # consumed -> back to idle
        assert len(fetches) == 2
        # stats stay live even when the frame is idle
        stats = json.load(urllib.request.urlopen(
            f"http://localhost:{srv.port}/stats", timeout=10))
        assert stats["passes"] == 1
    finally:
        srv.close()


def test_publish_lazy_stats_only_on_demand():
    """The ``lazy`` stats callable costs a device sync on the render
    loop: it must run only when a client polled /stats since the last
    publish, and its last value must persist in between."""
    film = Film(8, 8)
    film.add_pass(np.ones((8, 8, 3), np.float32), 1)
    calls = []

    def lazy():
        calls.append(1)
        return {"mrays": float(len(calls))}

    srv = PreviewServer(0)
    try:
        srv.publish(film, lazy=lazy)  # nobody polled yet
        srv.publish(film, lazy=lazy)
        assert calls == []
        stats = json.load(urllib.request.urlopen(
            f"http://localhost:{srv.port}/stats", timeout=10))
        assert "mrays" not in stats  # never computed so far
        srv.publish(film, lazy=lazy)  # demand flag set -> compute
        assert len(calls) == 1
        srv.publish(film, lazy=lazy)  # consumed -> idle again
        assert len(calls) == 1
        stats = json.load(urllib.request.urlopen(
            f"http://localhost:{srv.port}/stats", timeout=10))
        assert stats["mrays"] == 1.0  # persisted from the last compute
    finally:
        srv.close()


def test_camera_command_moves_and_aims(tmp_path):
    """[+] POST /camera: translation-only keeps the rotation; with a
    target it aims -Z at the target; both clear the film."""
    import argparse

    from bendy_tpu.cli import handle_command
    from bendy_tpu.render import Config, Renderer
    from bendy_tpu.scene import load_scene

    scene = load_scene("scenes/cornell.json.gz")
    camera = scene.find_by_tag("camera")
    renderer = Renderer(scene, Config(max_bounces=1), use_pallas=False)
    film = Film(8, 8)
    film.add_pass(np.ones((8, 8, 3), np.float32), 1)
    args = argparse.Namespace(scene="x", screenshot="y", save_scene=None,
                              checkpoint=None, seed=0)

    rot_before = np.array(scene.get_object(camera).transform.world[:, :3])
    handle_command("camera", {"x": "1.5", "y": "2.0"}, args, scene, renderer,
                   camera, film)
    w = scene.get_object(camera).transform.world
    assert film.samples == 0  # film cleared
    np.testing.assert_allclose(w[:, :3], rot_before)  # rotation kept
    assert (w[0, 3], w[1, 3]) == (1.5, 2.0)

    film.add_pass(np.ones((8, 8, 3), np.float32), 1)
    handle_command("camera", {"x": "0", "y": "0", "z": "5", "tx": "0",
                              "ty": "0", "tz": "0"}, args, scene, renderer,
                   camera, film)
    w = scene.get_object(camera).transform.world
    assert film.samples == 0
    # -Z column points from eye toward the target (origin)
    np.testing.assert_allclose(-w[:, 2], [0, 0, -1], atol=1e-12)
    # orthonormal basis
    np.testing.assert_allclose(w[:, :3].T @ w[:, :3], np.eye(3), atol=1e-12)


def test_affine_look_at():
    from bendy_tpu.scene.graph import affine_look_at

    a = affine_look_at((3.0, 1.0, 2.0), (0.0, 1.0, 2.0))
    np.testing.assert_allclose(-a[:, 2], [-1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(a[:, :3].T @ a[:, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(a[:, 3], [3, 1, 2])
    # straight-down forward degenerates vs. the default up: falls back
    a = affine_look_at((0.0, 5.0, 0.0), (0.0, 0.0, 0.0))
    np.testing.assert_allclose(a[:, :3].T @ a[:, :3], np.eye(3), atol=1e-12)
    with pytest.raises(ValueError):
        affine_look_at((1.0, 1.0, 1.0), (1.0, 1.0, 1.0))
