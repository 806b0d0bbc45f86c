"""Multi-process jax.distributed rendering tests.

Exercises bendy_tpu.parallel.multihost for real: N subprocesses with
8/N virtual CPU devices each form one 8-device ('tiles','samples') mesh,
run the SPMD sharded render (film psum over the sample axis crosses the
process boundaries), gather the film to process 0, and the result must
match a single-process render of the same pass — the multihost claim of
parallel/mesh.py's design (global-lane-id RNG ⇒ mesh-shape invariance).
Covered layouts: 2 processes × 4 devices and 4 processes × 2 devices
(the same global mesh cut along more process boundaries).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, local_devices: int, out: str) -> None:
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(f"--xla_force_host_platform_device_count={local_devices}")
        env["XLA_FLAGS"] = " ".join(flags)
        env["PYTHONPATH"] = (
            env["PYTHONPATH"] + os.pathsep + _REPO if env.get("PYTHONPATH") else _REPO
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(_REPO, "tests", "multihost_worker.py"),
                 str(pid), str(nproc), str(port), out, str(local_devices)],
                env=env, cwd=_REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"


@pytest.fixture(scope="module")
def single_reference():
    """The same pass rendered in-process (8-device mesh, XLA path)."""
    import jax.numpy as jnp

    from bendy_tpu.render import Config, Renderer, render_pass
    from bendy_tpu.scene import load_scene

    scene = load_scene("scenes/cornell.json.gz")
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=2), use_pallas=False)
    cfg = r.trace_config(r.config)
    W = H = 16
    single, rays = render_pass(
        r.arrays, r.camera_params(cam_ref), jnp.uint32(3), jnp.uint32(0),
        jnp.int32(0), W, H, H, 4, 1, cfg, "full",
    )
    return np.asarray(single), float(rays)


def _check(out: str, single_reference) -> None:
    z = np.load(out)
    single, rays = single_reference
    np.testing.assert_allclose(z["sums"], single, rtol=2e-5, atol=2e-5)
    assert float(z["rays"]) == pytest.approx(rays)


def test_two_process_render_matches_single(tmp_path, single_reference):
    out = str(tmp_path / "multihost2.npz")
    _run_workers(2, 4, out)
    _check(out, single_reference)


def test_four_process_render_matches_single(tmp_path, single_reference):
    out = str(tmp_path / "multihost4.npz")
    _run_workers(4, 2, out)
    _check(out, single_reference)
