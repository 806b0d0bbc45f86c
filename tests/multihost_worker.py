"""Worker process for the multi-process jax.distributed tests.

Launched by tests/test_multihost.py with a private coordinator port;
each of ``nproc`` processes owns ``local_devices`` virtual CPU devices
(8 global in every configuration), initializes the distributed runtime
through bendy_tpu.parallel.multihost, renders one sharded pass over the
full 8-device mesh, gathers the film to every process, and process 0
writes it to disk for the parent to compare.
"""

import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]
    local_devices = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    import jax

    from bendy_tpu.parallel.multihost import film_to_host0, initialize

    initialize(coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == local_devices, jax.local_devices()
    assert jax.device_count() == nproc * local_devices, jax.device_count()

    import jax.numpy as jnp
    import numpy as np

    from bendy_tpu.parallel.mesh import make_mesh, render_pass_sharded
    from bendy_tpu.render import Config, Renderer
    from bendy_tpu.scene import load_scene

    scene = load_scene("scenes/cornell.json.gz")
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=2), use_pallas=False)
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)

    W = H = 16
    mesh = make_mesh(4, 2)  # spans all processes
    sums, rays = render_pass_sharded(
        r.arrays, cam, jnp.uint32(3), jnp.uint32(0), mesh,
        W, H, 2, 1, cfg, "full",
    )
    gathered = film_to_host0(sums)  # numpy on every process
    if pid == 0:
        np.savez(out_path, sums=np.asarray(gathered), rays=float(rays))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
