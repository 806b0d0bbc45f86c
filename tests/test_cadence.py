"""Loop-cadence statics are exact.

``TraceConfig.regen_every=2`` (the finalize+camera block compiles into
every other iteration) and ``pending_check=N`` (the all-lanes-done
reduction runs every N iterations) both claim bit-identity with the
cadence-1 configs: a delayed regeneration only makes dead lanes wait (the
RNG is keyed by per-lane (pixel, sample) state, never by the iteration
index), and iterating an all-dead state is a fully-masked no-op. These
tests pin those claims with exact-equality renders, mirroring
tests/test_specialize.py for the scene-specialization statics.
"""

import numpy as np
import pytest

from bendy_tpu.render import Config, Renderer, render_pass
from bendy_tpu.scene import load_scene


def _render_with_cfg(renderer, cam_ref, tcfg, W=16, H=16, spp=6):
    cam = renderer.camera_params(cam_ref)
    sums, rays = render_pass(
        renderer.arrays, cam, np.uint32(11), np.int32(0), np.int32(0),
        W, H, H, spp, 1, tcfg, "full",
    )
    return np.asarray(sums), float(rays)


def assert_cadence_exact(scene, config, **overrides):
    r = Renderer(scene, config, use_pallas=False)
    cam_ref = scene.find_by_tag("camera")
    base = r.trace_config(r.config, cam_ref)
    varied = base._replace(**overrides)
    assert base != varied  # the test must exercise a real cadence change
    img_a, rays_a = _render_with_cfg(r, cam_ref, base)
    img_b, rays_b = _render_with_cfg(r, cam_ref, varied)
    np.testing.assert_array_equal(img_a, img_b)
    assert rays_a == rays_b  # alive-lane iteration counts match exactly


def test_regen_every_derivation():
    # cadence is backend-tuned (bit-identical output, so a pure
    # scheduling choice): TPU flat/volume 2, TPU geodesic 8, CPU 1
    # (XLA-CPU compile grows superlinearly with the k-unrolled body)
    from bendy_tpu.render import derive_regen_every

    assert derive_regen_every(False, backend="tpu") == 2
    assert derive_regen_every(True, backend="tpu") == 8
    assert derive_regen_every(False, backend="cpu") == 1
    assert derive_regen_every(True, backend="cpu") == 1
    assert derive_regen_every(False, backend="axon") == 2


def test_regen_every_exact_volume():
    # the TPU-production cadence (2) vs the CPU-derived base (1)
    scene = load_scene("scenes/volume.json.gz")
    cfg = Config(max_bounces=4, max_volume_bounces=8)
    assert_cadence_exact(scene, cfg, regen_every=2)


def test_regen_every_exact_geodesic():
    # the TPU-production geodesic cadence (8) vs the base (1). This is
    # the suite's slowest single compile (~100 s: the loop body unrolls
    # 8x) — kept because it gates the exact production config
    from bendy_tpu.geodesic import GeoParams

    scene = load_scene("scenes/blackhole.json.gz")
    cfg = Config(max_bounces=2, geo=GeoParams(max_steps=48))
    assert_cadence_exact(scene, cfg, regen_every=8)


def test_regen_every_exact_flat_forced():
    # flat scenes derive 2 on TPU; gate it (and the must-divide rule
    # covers 4 via test_max_iters/test_regen_every_validated)
    scene = load_scene("scenes/cornell.json.gz")
    assert_cadence_exact(scene, Config(max_bounces=4), regen_every=2)


def test_pending_check_exact_volume():
    scene = load_scene("scenes/volume.json.gz")
    assert_cadence_exact(
        scene, Config(max_bounces=4, max_volume_bounces=8), pending_check=1
    )


def test_pending_check_exact_geodesic():
    from bendy_tpu.geodesic import GeoParams

    scene = load_scene("scenes/blackhole.json.gz")
    assert_cadence_exact(
        scene, Config(max_bounces=2, geo=GeoParams(max_steps=48)), pending_check=1
    )


def test_regen_every_validated():
    scene = load_scene("scenes/cornell.json.gz")
    r = Renderer(scene, Config(), use_pallas=False)
    cam_ref = scene.find_by_tag("camera")
    bad = r.trace_config(r.config, cam_ref)._replace(regen_every=3)
    with pytest.raises(ValueError, match="regen_every"):
        _render_with_cfg(r, cam_ref, bad, W=4, H=4, spp=1)


def test_max_iters_covers_regen_delay():
    # regen_every=k delays each path start by up to k-1 iterations; the
    # safety cap must gain spp*(k-1) so capped-bounce paths can't drop
    # samples
    from bendy_tpu.ops.wavefront import TraceConfig

    c1 = TraceConfig(regen_every=1)
    assert TraceConfig(regen_every=2).max_iters(16) == c1.max_iters(16) + 16
    assert TraceConfig(regen_every=8).max_iters(16) == c1.max_iters(16) + 7 * 16
