"""March-iteration cadence (``TraceConfig.march_every``) gates.

The cadence interleaves one full iteration with m-1 march-specialized
iterations (no regen/camera, no surface shade, no surface bounce cap;
only MODE_MARCH lanes advance). Because a frozen lane's ``path_step``
does not advance, it redraws the same uniforms and recomputes the same
hit when it resumes, so the whole schedule must be BIT-identical to
``march_every=0`` — same radiance, same AOVs, same traced-ray count.
Only the iteration count may differ.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bendy_tpu.models.dense_cloud import build_dense_cloud
from bendy_tpu.ops.wavefront import trace
from bendy_tpu.render import Config, Renderer
from bendy_tpu.scene import load_scene
from bendy_tpu.utils.rng import render_key


def _setup(scene, config):
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, config, use_pallas=False)
    cfg = r.trace_config(r.config, cam_ref)
    assert cfg.regen_every == 1  # cpu backend; march_every requires it
    return r, r.camera_params(cam_ref), cfg


def _trace(r, cam, cfg, W=16, H=16, spp=4, seed=3):
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sub = jnp.zeros(W * H, jnp.uint32)
    return trace(
        r.arrays, cam, render_key(jnp.uint32(seed), jnp.uint32(0)),
        pix, sub, W, H, spp, 1, cfg,
    )


def _assert_identical(a, b):
    for ch in ("x", "y", "z"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a.radiance, ch)),
            np.asarray(getattr(b.radiance, ch)),
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(a.aov_albedo, ch)),
            np.asarray(getattr(b.aov_albedo, ch)),
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(a.aov_normal, ch)),
            np.asarray(getattr(b.aov_normal, ch)),
        )
    np.testing.assert_array_equal(np.asarray(a.aov_depth), np.asarray(b.aov_depth))
    assert float(a.rays) == float(b.rays)


@pytest.mark.parametrize("m", [2, 4])
def test_march_cadence_bit_identical_cloud(m):
    r, cam, cfg = _setup(load_scene("scenes/cloud.json.gz"),
                         Config(max_bounces=3))
    base = _trace(r, cam, cfg)
    cad = _trace(r, cam, cfg._replace(march_every=m))
    _assert_identical(base, cad)


def test_march_cadence_bit_identical_dense_grid(m=2):
    """Dense 32³ grid: the cadence must compose with the einsum lookup
    (XLA path) — the operand-path composition is gated on hardware via
    tools/knob_ab.py --march-cadence."""
    r, cam, cfg = _setup(build_dense_cloud(), Config(max_bounces=2))
    base = _trace(r, cam, cfg, spp=2)
    cad = _trace(r, cam, cfg._replace(march_every=m), spp=2)
    _assert_identical(base, cad)


def test_march_cadence_validation():
    r, cam, cfg = _setup(load_scene("scenes/cloud.json.gz"), Config())
    with pytest.raises(ValueError, match="march_every"):
        _trace(r, cam, cfg._replace(march_every=3))  # 3 does not divide 8
    with pytest.raises(ValueError, match="march_every"):
        _trace(r, cam, cfg._replace(march_every=2, regen_every=2))
    r2, cam2, cfg2 = _setup(load_scene("scenes/cornell.json.gz"),
                            Config(max_bounces=2))
    with pytest.raises(ValueError, match="march_every"):
        _trace(r2, cam2, cfg2._replace(march_every=2))  # no volumes
