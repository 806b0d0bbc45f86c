"""Unit tests for V3 vector math, RNG, and sampling distributions.

The reference has essentially no tests (SURVEY.md §4); these validate every
formula against closed forms and the distributions against their analytic
moments.
"""

import jax.numpy as jnp
import numpy as np

from bendy_tpu.ops import distr
from bendy_tpu.utils.color import linear_to_srgb, srgb_to_linear
from bendy_tpu.utils.rng import lane_uniforms, render_key, threefry2x32
from bendy_tpu.utils.v3 import V3


def uniforms(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.random(n), jnp.float32) for _ in range(d)]


def randv3(n, seed=0, unit=True):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(3, n)).astype(np.float32)
    if unit:
        a /= np.linalg.norm(a, axis=0)
    return V3(jnp.asarray(a[0]), jnp.asarray(a[1]), jnp.asarray(a[2]))


class TestV3:
    def test_reflect(self):
        v = V3.of(1 / np.sqrt(2), -1 / np.sqrt(2), 0.0)
        n = V3.of(0.0, 1.0, 0.0)
        out = v.reflect(n)
        np.testing.assert_allclose(
            [out.x, out.y, out.z], [1 / np.sqrt(2), 1 / np.sqrt(2), 0.0], atol=1e-6
        )

    def test_reflect_preserves_length(self):
        v = randv3(64, 1)
        n = randv3(64, 2)
        out = v.reflect(n)
        np.testing.assert_allclose(out.length(), 1.0, atol=1e-5)

    def test_refract_snell(self):
        theta_i = np.pi / 4
        v = V3.of(np.sin(theta_i), -np.cos(theta_i), 0.0)
        n = V3.of(0.0, 1.0, 0.0)
        ior = 1.0 / 1.5
        out = v.refract(n, ior)
        sin_t = float(jnp.abs(out.x) / out.length())
        np.testing.assert_allclose(sin_t, ior * np.sin(theta_i), atol=1e-6)

    def test_fresnel_normal_incidence(self):
        v = V3.of(0.0, -1.0, 0.0)
        n = V3.of(0.0, 1.0, 0.0)
        ior = 1.0 / 1.5
        r0 = ((1 - ior) / (1 + ior)) ** 2
        np.testing.assert_allclose(v.fresnel(n, ior), r0, atol=1e-6)

    def test_fresnel_grazing(self):
        v = V3.of(1.0, -1e-4, 0.0).normalize()
        n = V3.of(0.0, 1.0, 0.0)
        assert float(v.fresnel(n, 1.0 / 1.5)) > 0.99

    def test_orthonormal_frame(self):
        n = randv3(256, 2)
        t, b = n.orthonormal_frame()
        np.testing.assert_allclose(t.dot(n), 0.0, atol=1e-5)
        np.testing.assert_allclose(b.dot(n), 0.0, atol=1e-5)
        np.testing.assert_allclose(t.dot(b), 0.0, atol=1e-5)
        np.testing.assert_allclose(t.length(), 1.0, atol=1e-5)

    def test_normalize_or_zero(self):
        v = V3(jnp.array([3.0, 0.0]), jnp.array([0.0, 0.0]), jnp.array([4.0, 0.0]))
        out = v.normalize_or_zero()
        np.testing.assert_allclose(out.x, [0.6, 0.0], atol=1e-6)
        np.testing.assert_allclose(out.z, [0.8, 0.0], atol=1e-6)

    def test_cross_lerp(self):
        a = V3.of(1.0, 0.0, 0.0)
        b = V3.of(0.0, 1.0, 0.0)
        c = a.cross(b)
        np.testing.assert_allclose([c.x, c.y, c.z], [0, 0, 1], atol=1e-7)
        m = a.lerp(b, 0.25)
        np.testing.assert_allclose([m.x, m.y, m.z], [0.75, 0.25, 0.0], atol=1e-7)


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

    def normal(self, z=1.0):
        n = V3.zeros(self.N)
        return V3(n.x, n.y, n.z + z)

    def test_unit_sphere_uniform(self):
        u1, u2 = uniforms(self.N, 2)
        v = distr.unit_sphere(u1, u2)
        np.testing.assert_allclose(v.length(), 1.0, atol=1e-4)
        # each component has mean 0 and variance 1/3 on the uniform sphere
        for c in (v.x, v.y, v.z):
            np.testing.assert_allclose(np.mean(c), 0.0, atol=0.01)
            np.testing.assert_allclose(np.mean(np.square(c)), 1 / 3, atol=0.01)

    def test_cosine_hemisphere_moments(self):
        u1, u2 = uniforms(self.N, 2, seed=3)
        v = distr.cosine_hemisphere(self.normal(), u1, u2)
        np.testing.assert_allclose(v.length(), 1.0, atol=1e-4)
        assert (np.asarray(v.z) >= -1e-6).all()
        # E[cos theta] = 2/3 for pdf = cos/pi
        np.testing.assert_allclose(np.mean(v.z), 2 / 3, atol=0.005)

    def test_unit_hemisphere_matches_reference_form(self):
        """z = 1-r2 with the sphere's x,y — intentionally non-unit
        (``src/math/distr.rs:49-58``)."""
        u1, u2 = uniforms(self.N, 2, seed=4)
        v = distr.unit_hemisphere(self.normal(), u1, u2)
        assert (np.asarray(v.z) >= -1e-6).all()
        np.testing.assert_allclose(np.mean(v.z), 0.5, atol=0.005)  # E[1-r2]
        norm2 = np.asarray(v.length_squared())
        # E[(1-r2)(1+3 r2)] = 1 + 2·E[r2] - 3·E[r2²] = 1
        np.testing.assert_allclose(norm2.mean(), 1.0, atol=0.01)
        assert norm2.std() > 0.1  # genuinely non-unit

    def test_unit_disk_center_heavy(self):
        """Uniform radius, not sqrt: E[r] = 1/2 (uniform-area would be 2/3)
        — SURVEY quirk #3."""
        u1, u2 = uniforms(self.N, 2, seed=5)
        v = distr.unit_disk(self.normal(-1.0), u1, u2)
        np.testing.assert_allclose(v.z, 0.0, atol=1e-6)  # in-plane
        r = np.hypot(np.asarray(v.x), np.asarray(v.y))
        np.testing.assert_allclose(r.mean(), 0.5, atol=0.005)
        ang = np.arctan2(np.asarray(v.y), np.asarray(v.x))
        hist, _ = np.histogram(ang, bins=16, range=(-np.pi, np.pi))
        assert hist.min() > 0.8 * self.N / 16


class TestRng:
    def test_threefry_known_vector(self):
        """Threefry-2x32-20 test vector (Random123 kat_vectors: zero key,
        zero counter)."""
        x0, x1 = threefry2x32(jnp.uint32(0), jnp.uint32(0), jnp.uint32(0), jnp.uint32(0))
        assert (int(x0), int(x1)) == (0x6B200159, 0x99BA4EFE)

    def test_threefry_ones_vector(self):
        x0, x1 = threefry2x32(
            jnp.uint32(0xFFFFFFFF), jnp.uint32(0xFFFFFFFF),
            jnp.uint32(0xFFFFFFFF), jnp.uint32(0xFFFFFFFF),
        )
        assert (int(x0), int(x1)) == (0x1CB996FC, 0xBB002BE7)

    def test_uniforms_deterministic_and_distinct(self):
        key = render_key(jnp.uint32(7), jnp.uint32(0))
        lane = jnp.arange(1024, dtype=jnp.uint32)
        a = lane_uniforms(key, lane, 3, 8)
        b = lane_uniforms(key, lane, 3, 8)
        for ua, ub in zip(a, b):
            np.testing.assert_array_equal(ua, ub)
        c = lane_uniforms(render_key(jnp.uint32(7), jnp.uint32(1)), lane, 3, 8)
        assert not np.allclose(a[0], c[0])

    def test_uniform_range_and_mean(self):
        key = render_key(jnp.uint32(1), jnp.uint32(2))
        lane = jnp.arange(1 << 16, dtype=jnp.uint32)
        us = lane_uniforms(key, lane, 5, 4)
        for u in us:
            u = np.asarray(u)
            assert (u >= 0).all() and (u < 1).all()
            np.testing.assert_allclose(u.mean(), 0.5, atol=0.01)
        # slots are decorrelated
        assert abs(np.corrcoef(us[0], us[1])[0, 1]) < 0.02


def test_sin_cos_polynomials_match_reference_trig():
    """sin_cos_tau / sin_cos_small agree with jnp trig to f32 noise."""
    import jax.numpy as jnp
    import numpy as np

    from bendy_tpu.ops.distr import TAU, sin_cos_small, sin_cos_tau

    u = jnp.asarray(np.linspace(0.0, 1.0, 4097, endpoint=False, dtype=np.float32))
    s, c = sin_cos_tau(u)
    # ~2e-5 abs: truncation + f32 Horner rounding through the double-angle
    # step. A smooth 1e-5 warp of a sampling angle distorts the sampled
    # density by ~1e-5 relative — far below any MC gate's resolution.
    np.testing.assert_allclose(np.asarray(s), np.sin(np.asarray(u) * TAU), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c), np.cos(np.asarray(u) * TAU), atol=2e-5)

    x = jnp.asarray(np.linspace(-1.2, 1.2, 4097, dtype=np.float32))
    s, c = sin_cos_small(x)
    np.testing.assert_allclose(np.asarray(s), np.sin(np.asarray(x)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.cos(np.asarray(x)), atol=1e-6)
