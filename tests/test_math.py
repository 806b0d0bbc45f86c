"""Unit tests for vector math and sampling distributions.

The reference has essentially no tests (SURVEY.md §4); these validate every
formula against closed forms and the distributions against their analytic
moments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bendy_tpu.ops import distr
from bendy_tpu.utils import vecmath
from bendy_tpu.utils.color import linear_to_srgb, srgb_to_linear


def uniforms(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.random(n), jnp.float32) for _ in range(d)]


class TestVecmath:
    def test_reflect(self):
        v = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
        n = jnp.array([[0.0, 1.0, 0.0]])
        out = vecmath.reflect(v, n)
        np.testing.assert_allclose(out, [[1 / np.sqrt(2), 1 / np.sqrt(2), 0.0]], atol=1e-6)

    def test_reflect_preserves_length(self):
        rng = np.random.default_rng(1)
        v = vecmath.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
        n = vecmath.normalize(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32))
        out = vecmath.reflect(v, n)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)

    def test_refract_snell(self):
        # 45° incidence air->glass (relative ior = 1/1.5 entering)
        theta_i = np.pi / 4
        v = jnp.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], dtype=jnp.float32)
        n = jnp.array([[0.0, 1.0, 0.0]], dtype=jnp.float32)
        ior = 1.0 / 1.5
        out = np.asarray(vecmath.refract(v, n, jnp.float32(ior)))[0]
        sin_t = abs(out[0]) / np.linalg.norm(out)
        np.testing.assert_allclose(sin_t, ior * np.sin(theta_i), atol=1e-6)

    def test_fresnel_normal_incidence(self):
        v = jnp.array([[0.0, -1.0, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        ior = 1.0 / 1.5
        r0 = ((1 - ior) / (1 + ior)) ** 2
        np.testing.assert_allclose(vecmath.fresnel_schlick(v, n, ior), [r0], atol=1e-6)

    def test_fresnel_grazing(self):
        v = jnp.array([[1.0, -1e-4, 0.0]])
        v = vecmath.normalize(v)
        n = jnp.array([[0.0, 1.0, 0.0]])
        fr = float(vecmach_fr := vecmath.fresnel_schlick(v, n, 1.0 / 1.5)[0])
        assert fr > 0.99

    def test_orthonormal_frame(self):
        rng = np.random.default_rng(2)
        n = vecmath.normalize(jnp.asarray(rng.normal(size=(256, 3)), jnp.float32))
        t, b = vecmath.orthonormal_frame(n)
        np.testing.assert_allclose(vecmath.dot(t, n), 0.0, atol=1e-5)
        np.testing.assert_allclose(vecmath.dot(b, n), 0.0, atol=1e-5)
        np.testing.assert_allclose(vecmath.dot(t, b), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)

    def test_normalize_or_zero(self):
        v = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
        out = np.asarray(vecmath.normalize_or_zero(v))
        np.testing.assert_allclose(out[0], [0.6, 0.0, 0.8], atol=1e-6)
        np.testing.assert_allclose(out[1], 0.0)


class TestColor:
    def test_srgb_roundtrip(self):
        x = jnp.linspace(0.0, 1.0, 64)
        np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x, atol=1e-5)

    def test_srgb_breakpoints(self):
        # exact piecewise values (``src/color.rs:6-20``)
        np.testing.assert_allclose(srgb_to_linear(jnp.float32(0.04045)), 0.04045 / 12.92, atol=1e-7)
        np.testing.assert_allclose(linear_to_srgb(jnp.float32(0.0031308)), 12.92 * 0.0031308, atol=1e-7)
        np.testing.assert_allclose(srgb_to_linear(jnp.float32(0.5)), 0.21404114, atol=1e-6)


class TestDistributions:
    N = 200_000

    def test_unit_sphere_uniform(self):
        u1, u2 = uniforms(self.N, 2)
        v = np.asarray(distr.unit_sphere(u1, u2))
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-4)
        # each component has mean 0 and variance 1/3 on the uniform sphere
        np.testing.assert_allclose(v.mean(axis=0), 0.0, atol=0.01)
        np.testing.assert_allclose((v**2).mean(axis=0), 1 / 3, atol=0.01)

    def test_cosine_hemisphere_moments(self):
        u1, u2 = uniforms(self.N, 2, seed=3)
        n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (self.N, 3))
        v = np.asarray(distr.cosine_hemisphere(n, u1, u2))
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-4)
        assert (v[:, 2] >= -1e-6).all()
        # E[cos theta] = 2/3 for pdf = cos/pi
        np.testing.assert_allclose(v[:, 2].mean(), 2 / 3, atol=0.005)

    def test_unit_hemisphere_matches_reference_form(self):
        """z = 1-r2 with the sphere's x,y — intentionally non-unit
        (``src/math/distr.rs:49-58``)."""
        u1, u2 = uniforms(self.N, 2, seed=4)
        n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (self.N, 3))
        v = np.asarray(distr.unit_hemisphere(n, u1, u2))
        assert (v[:, 2] >= -1e-6).all()
        np.testing.assert_allclose(v[:, 2].mean(), 0.5, atol=0.005)  # E[1-r2]
        norm2 = (v**2).sum(-1)
        # E[(1-r2)(1+3 r2)] = E[1+2r2-3r2^2] = 1 + 1 - 1 = 1
        np.testing.assert_allclose(norm2.mean(), 1.0, atol=0.01)
        assert norm2.std() > 0.1  # genuinely non-unit

    def test_unit_disk_center_heavy(self):
        """Uniform radius, not sqrt: E[r] = 1/2 (uniform-area would be 2/3)
        — SURVEY quirk #3."""
        u1, u2 = uniforms(self.N, 2, seed=5)
        n = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (self.N, 3))
        v = np.asarray(distr.unit_disk(n, u1, u2))
        np.testing.assert_allclose(v[:, 2], 0.0, atol=1e-6)  # in-plane
        r = np.linalg.norm(v[:, :2], axis=-1)
        np.testing.assert_allclose(r.mean(), 0.5, atol=0.005)
        # angle uniform
        ang = np.arctan2(v[:, 1], v[:, 0])
        hist, _ = np.histogram(ang, bins=16, range=(-np.pi, np.pi))
        assert hist.min() > 0.8 * self.N / 16


class TestRng:
    def test_lane_keys_deterministic(self):
        from bendy_tpu.utils.rng import iter_uniforms, lane_keys

        k1 = lane_keys(7, 0, jnp.arange(16))
        k2 = lane_keys(7, 0, jnp.arange(16))
        u1 = iter_uniforms(k1, jnp.int32(3), 4)
        u2 = iter_uniforms(k2, jnp.int32(3), 4)
        np.testing.assert_array_equal(u1, u2)

    def test_lane_keys_distinct_by_pass(self):
        from bendy_tpu.utils.rng import iter_uniforms, lane_keys

        u1 = iter_uniforms(lane_keys(7, 0, jnp.arange(16)), jnp.int32(0), 4)
        u2 = iter_uniforms(lane_keys(7, 1, jnp.arange(16)), jnp.int32(0), 4)
        assert not np.allclose(u1, u2)
