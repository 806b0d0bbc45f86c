"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates the central sharding claim: because RNG streams key off global
lane ids, a mesh render computes the SAME per-lane radiance as a single
device — only the f32 film summation order differs.
"""

import jax
import numpy as np
import pytest

from bendy_tpu.film import Film
from bendy_tpu.parallel.mesh import make_mesh, render_pass_sharded
from bendy_tpu.render import Config, Renderer, RenderConfig, Subsample, render_pass
from bendy_tpu.scene import load_scene


@pytest.fixture(scope="module")
def cornell():
    scene = load_scene("scenes/cornell.json.gz")
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    return scene, cam_ref


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("tiles,samples", [(8, 1), (4, 2), (2, 4)])
def test_sharded_equals_single_device(cornell, tiles, samples):
    scene, cam_ref = cornell
    r = Renderer(scene, Config(max_bounces=2))
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)
    W = H = 16
    spp_total = 4

    import jax.numpy as jnp

    single, rays1 = render_pass(
        r.arrays, cam, jnp.uint32(3), jnp.uint32(0), jnp.int32(0),
        W, H, H, spp_total, 1, cfg, "full",
    )

    mesh = make_mesh(tiles, samples)
    assert spp_total % samples == 0
    sharded, rays2 = render_pass_sharded(
        r.arrays, cam, jnp.uint32(3), jnp.uint32(0), mesh,
        W, H, spp_total // samples, 1, cfg, "full",
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), rtol=2e-5, atol=2e-5)
    assert float(rays1) == pytest.approx(float(rays2))


MODE_SCENES = {
    # volume march through the unrolled primitive sweep
    "cloud": Config(max_bounces=2),
    # dense 32³ grid (XLA einsum lookup on this path; the megakernel's
    # vol_operand variant is gated in test_pallas.py)
    "dense_cloud": Config(max_bounces=2),
    # geodesic x volume march x capture-inside-media (scene geo block)
    "blackhole_cloud": Config(max_bounces=2, volume_step=0.6),
}


@pytest.mark.parametrize("name", sorted(MODE_SCENES))
def test_sharded_modes_equal_single_device(name):
    """Mesh-shape invariance for every wavefront mode class, not just
    flat cornell: volume march, dense-grid lookup, and geodesic x media
    must produce the same per-lane radiance under shard_map as on one
    device (the reference's parallelism contract, tracer/mod.rs:194,
    holds for every mode through the same rayon loop)."""
    import jax.numpy as jnp

    scene = load_scene(f"scenes/{name}.json.gz")
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, MODE_SCENES[name], use_pallas=False)
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config, cam_ref)
    if name == "dense_cloud":
        assert cfg.has_volumes and not cfg.geodesic
    if name == "blackhole_cloud":
        assert cfg.geodesic and cfg.has_volumes
    W = H = 16
    spp_total = 4

    single, rays1 = render_pass(
        r.arrays, cam, jnp.uint32(7), jnp.uint32(0), jnp.int32(0),
        W, H, H, spp_total, 1, cfg, "full",
    )
    mesh = make_mesh(4, 2)
    sharded, rays2 = render_pass_sharded(
        r.arrays, cam, jnp.uint32(7), jnp.uint32(0), mesh,
        W, H, spp_total // 2, 1, cfg, "full",
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), rtol=2e-5, atol=2e-5
    )
    assert float(rays1) == pytest.approx(float(rays2))


def test_row_chunking_bit_identical(cornell):
    """Renderer-level chunking must not change the image at all."""
    scene, cam_ref = cornell
    img = {}
    for ml in (1 << 7, 1 << 14):  # 128 lanes forces row chunking at 16x16 spp=1
        r = Renderer(scene, Config(max_bounces=2), max_lanes=ml)
        film = Film(16, 16)
        r.render(cam_ref, RenderConfig(samples=1, subsample=Subsample(1)), film, seed=5)
        img[ml] = film.mean().copy()
    np.testing.assert_array_equal(img[1 << 7], img[1 << 14])
