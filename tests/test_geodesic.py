"""Geodesic propagator physics tests.

No reference implementation exists (the reference advertises lensing but
ships straight rays — SURVEY.md §0), so these gates are analytic:

- weak-field deflection: alpha ~= 2·rs/b for b >> rs,
- photon sphere: critical impact parameter b_crit = (3*sqrt(3)/2)·rs —
  rays inside are captured, rays outside escape,
- flat limit: rs = 0 leaves rays exactly straight.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bendy_tpu.geodesic import (
    GeoParams,
    acceleration,
    capture_and_far,
    geo_step_begin,
    rk4_step,
    step_size,
)
from bendy_tpu.scene import Data, Material, Object, ObjectFlags, Scene, Sphere, compile_scene
from bendy_tpu.utils.v3 import V3


def mass_scene(rs: float) -> Scene:
    scene = Scene()
    scene.add_object(Object().with_tag(f"mass:{rs}"))
    # a dummy light keeps the compiler's light table non-degenerate
    mat = scene.add_data(Data(Material.emissive((1, 1, 1), 1.0)))
    scene.add_object(
        Object(Sphere(material=mat, radius=0.1)).with_translation([0, 0, 500.0]).with_flags(
            ObjectFlags.LIGHT
        )
    )
    return scene


def integrate(scn, x0, d0, n_steps, ds=None, geo=GeoParams()):
    """Pure-python RK4 driver over the jnp step function."""
    x, d = x0, d0
    min_r = jnp.full_like(x0.x, jnp.inf)
    for _ in range(n_steps):
        h = step_size(scn, x, geo) if ds is None else jnp.full_like(x.x, ds)
        x, d = rk4_step(scn, x, d, h)
        min_r = jnp.minimum(min_r, x.length())
    return x, d, min_r


def v3(x, y, z, n=1):
    return V3(jnp.full(n, float(x)), jnp.full(n, float(y)), jnp.full(n, float(z)))


class TestDeflection:
    def test_weak_field_angle(self):
        """alpha = 2·rs/b within a few percent for b >> rs."""
        rs = 0.01
        scn = compile_scene(mass_scene(rs))
        for b in [1.0, 2.0, 4.0]:
            x = v3(-60.0, b, 0.0)
            d = v3(1.0, 0.0, 0.0)
            x, d, _ = integrate(scn, x, d, 2600, ds=0.05)
            assert float(x.x[0]) > 50.0  # passed the mass
            alpha = float(jnp.arctan2(-d.y[0], d.x[0]))
            expected = 2.0 * rs / b
            assert alpha == pytest.approx(expected, rel=0.05), (b, alpha, expected)

    def test_frozen_h2_matches_generic_rk4(self):
        """The production step (geo_step_begin's frozen per-step h²) and
        the generic per-stage-h² step discretize the same ODE: after a
        full grazing flyby the deflection angles agree to ~1e-3 rel and
        the capture/far/ds outputs match the standalone functions."""
        rs = 0.02
        scn = compile_scene(mass_scene(rs))
        geo = GeoParams()

        # the fused sweep reproduces the standalone capture/far/ds outputs
        x0, d0 = v3(-60.0, 0.03, 0.0), v3(0.9, 0.01, 0.02)
        cap, far, ds, _ = geo_step_begin(scn, x0, d0, geo)
        cap2, far2 = capture_and_far(scn, x0, d0, geo)
        np.testing.assert_array_equal(np.asarray(cap), np.asarray(cap2))
        np.testing.assert_array_equal(np.asarray(far), np.asarray(far2))
        np.testing.assert_allclose(
            np.asarray(ds), np.asarray(step_size(scn, x0, geo)), rtol=1e-6
        )

        import jax

        from functools import partial

        @partial(jax.jit, static_argnums=0)
        def fly(frozen: bool):
            def step(_, xd):
                x, d = xd
                h = jnp.full_like(x.x, 0.05)
                if frozen:
                    _, _, _, h2s = geo_step_begin(scn, x, d, geo)
                    return rk4_step(scn, x, d, h, h2s=h2s)
                return rk4_step(scn, x, d, h)

            x, d = jax.lax.fori_loop(
                0, 2600, step, (v3(-60.0, 1.0, 0.0), v3(1.0, 0.0, 0.0))
            )
            return jnp.arctan2(-d.y[0], d.x[0])

        a_frozen = float(fly(True))
        a_generic = float(fly(False))
        assert a_frozen == pytest.approx(a_generic, rel=1e-3)
        assert a_frozen == pytest.approx(2.0 * rs / 1.0, rel=0.05)

    def test_deflection_scales_inverse_b(self):
        rs = 0.02
        scn = compile_scene(mass_scene(rs))
        angles = []
        for b in [2.0, 4.0]:
            x, d, _ = integrate(scn, v3(-60, b, 0), v3(1, 0, 0), 2600, ds=0.05)
            angles.append(float(jnp.arctan2(-d.y[0], d.x[0])))
        assert angles[0] / angles[1] == pytest.approx(2.0, rel=0.05)

    def test_flat_limit_rs_zero(self):
        scn = compile_scene(mass_scene(0.0))
        x, d, _ = integrate(scn, v3(-30, 1.5, 0), v3(1, 0, 0), 600, ds=0.1)
        np.testing.assert_allclose(np.asarray(d.y), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(d.x), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(x.y), 1.5, atol=1e-10)

    def test_out_of_plane_symmetry(self):
        """Deflection is rotationally symmetric about the mass axis."""
        rs = 0.01
        scn = compile_scene(mass_scene(rs))
        _, d1, _ = integrate(scn, v3(-60, 2.0, 0), v3(1, 0, 0), 2600, ds=0.05)
        _, d2, _ = integrate(scn, v3(-60, 0, 2.0), v3(1, 0, 0), 2600, ds=0.05)
        a1 = float(jnp.arctan2(-d1.y[0], d1.x[0]))
        a2 = float(jnp.arctan2(-d2.z[0], d2.x[0]))
        assert a1 == pytest.approx(a2, rel=1e-3)


class TestPhotonSphere:
    RS = 0.5
    B_CRIT = 3 * np.sqrt(3) / 2 * RS  # ~1.299

    def run(self, b):
        scn = compile_scene(mass_scene(self.RS))
        geo = GeoParams(eta=0.02, min_step=0.002, max_step=0.5)
        x = v3(-20.0, b, 0.0)
        d = v3(1.0, 0.0, 0.0)
        captured = False
        for _ in range(6000):
            h = step_size(scn, x, geo)
            x, d = rk4_step(scn, x, d, h)
            cap, _ = capture_and_far(scn, x, d, geo)
            if bool(cap[0]):
                captured = True
                break
            if float(x.length()[0]) > 30.0 and float(x.dot(d)[0]) > 0:
                break
        return captured

    def test_inside_critical_captured(self):
        assert self.run(self.B_CRIT * 0.85)

    def test_outside_critical_escapes(self):
        assert not self.run(self.B_CRIT * 1.25)


class TestImageOracle:
    """Image-level ground truth: the numpy oracle's independent RK4
    chord-stepping implementation renders the flagship blackhole scene;
    our wavefront render must match statistically (the BASELINE.md MSE
    gate, extended to curved space)."""

    def test_blackhole_matches_numpy_oracle(self):
        import os
        import sys

        from bendy_tpu.render import Config, Renderer
        from bendy_tpu.scene import load_scene
        from bendy_tpu.scene.compiler import find_camera
        from bendy_tpu.ops.wavefront import trace
        from bendy_tpu.utils.rng import render_key

        scene = load_scene("scenes/blackhole.json.gz")
        cam_ref = scene.find_by_tag("camera")
        scene.get_object(cam_ref).inner.aspect_ratio = 1.0

        r = Renderer(scene, Config(max_bounces=2))
        cfg = r.trace_config(r.config)
        assert cfg.geodesic
        W = H = 16
        spp = 48
        pix = jnp.arange(W * H, dtype=jnp.uint32)
        sub = jnp.zeros(W * H, jnp.uint32)
        res = trace(
            r.arrays, r.camera_params(cam_ref), render_key(jnp.uint32(5), jnp.uint32(0)),
            pix, sub, W, H, spp, 1, cfg,
        )
        ours = np.stack(
            [np.asarray(c).reshape(H, W) for c in res.radiance], -1
        ) / spp

        sys.path.insert(0, os.path.dirname(__file__))
        from oracle import Oracle

        cam, world = find_camera(scene)
        o = Oracle(scene, max_bounces=2, seed=7)
        ref = o.render(cam, world, W, H, spp=6)

        # the oracle's own seed-to-seed row noise reaches ~0.16 at this spp
        # (binary ring-edge pixels under jitter); the gates below catch
        # systematic estimator/geometry errors, which shift regions by O(1)
        d = np.abs((ours - ref).mean(axis=(1, 2)))
        assert d.max() < 0.17, d
        assert abs(ours.mean() - ref.mean()) < 0.04
        # lensed structure (Einstein ring, arcs, shadow) must coincide: a
        # wrong deflection law displaces the ring and kills the correlation
        a = ours.mean(-1).ravel()
        b = ref.mean(-1).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.92, corr
        # the black shadow (captured lanes) must be black in both
        assert ours.min() >= 0.0 and ref.min() >= 0.0
        shadow_ours = (ours.mean(-1) < 0.02).sum()
        shadow_ref = (ref.mean(-1) < 0.02).sum()
        assert abs(int(shadow_ours) - int(shadow_ref)) <= max(3, 0.2 * shadow_ref)


    def test_binary_blackhole_matches_native_oracle(self):
        """Multi-mass geodesic propagation (the superposed-acceleration
        sweep over both holes) gates against the C++ oracle's independent
        multi-mass RK4 (``native/oracle.cpp`` geo_accel)."""
        from bendy_tpu.native import available, oracle_render_scene
        from bendy_tpu.render import Config, Renderer
        from bendy_tpu.scene import load_scene
        from bendy_tpu.ops.wavefront import trace
        from bendy_tpu.utils.rng import render_key

        if not available():
            pytest.skip("native oracle not built")

        scene = load_scene("scenes/binary_blackhole.json.gz")
        cam_ref = scene.find_by_tag("camera")
        scene.get_object(cam_ref).inner.aspect_ratio = 1.0

        r = Renderer(scene, Config(max_bounces=2))
        cfg = r.trace_config(r.config, cam_ref)
        assert cfg.geodesic and r.arrays.n_masses == 2
        W = H = 24
        spp = 64
        pix = jnp.arange(W * H, dtype=jnp.uint32)
        sub = jnp.zeros(W * H, jnp.uint32)
        res = trace(
            r.arrays, r.camera_params(cam_ref),
            render_key(jnp.uint32(6), jnp.uint32(0)),
            pix, sub, W, H, spp, 1, cfg,
        )
        ours = np.stack(
            [np.asarray(c).reshape(H, W) for c in res.radiance], -1
        ) / spp
        ref = oracle_render_scene(scene, W, H, 128, seed=3, max_bounces=2,
                                  geo=cfg.geo)

        d = np.abs((ours - ref).mean(axis=(1, 2)))
        assert d.max() < 0.1, d
        assert abs(ours.mean() - ref.mean()) < 0.03
        corr = np.corrcoef(ours.mean(-1).ravel(), ref.mean(-1).ravel())[0, 1]
        assert corr > 0.92, corr

    def test_native_and_numpy_geodesic_oracles_agree(self):
        """The C++ and numpy oracles implement geodesic propagation
        independently; their blackhole renders must coincide."""
        import os
        import sys

        from bendy_tpu.native import available, oracle_render_scene
        from bendy_tpu.scene import load_scene
        from bendy_tpu.scene.compiler import find_camera

        if not available():
            pytest.skip("native oracle not built")
        sys.path.insert(0, os.path.dirname(__file__))
        from oracle import Oracle

        scene = load_scene("scenes/blackhole.json.gz")
        scene.get_object(scene.find_by_tag("camera")).inner.aspect_ratio = 1.0
        native = oracle_render_scene(scene, 16, 16, 256, seed=2, max_bounces=2)
        cam, world = find_camera(scene)
        pynum = Oracle(scene, max_bounces=2, seed=7).render(cam, world, 16, 16, spp=6)
        d = np.abs((native - pynum).mean(axis=(1, 2)))
        assert d.max() < 0.17, d  # 6-spp numpy-oracle noise floor
        assert abs(native.mean() - pynum.mean()) < 0.03
        corr = np.corrcoef(native.mean(-1).ravel(), pynum.mean(-1).ravel())[0, 1]
        assert corr > 0.92, corr


class TestStepControl:
    def test_adaptive_step_clamped(self):
        scn = compile_scene(mass_scene(1.0))
        geo = GeoParams(eta=0.1, min_step=0.05, max_step=1.5)
        near = step_size(scn, v3(0.2, 0, 0), geo)
        far = step_size(scn, v3(500.0, 0, 0), geo)
        assert float(near[0]) == pytest.approx(geo.min_step)
        assert float(far[0]) == pytest.approx(geo.max_step)

    def test_acceleration_points_inward(self):
        scn = compile_scene(mass_scene(0.5))
        a = acceleration(scn, v3(3.0, 0, 0), v3(0, 1, 0))
        assert float(a.x[0]) < 0
        np.testing.assert_allclose(np.asarray(a.y), 0.0, atol=1e-9)
