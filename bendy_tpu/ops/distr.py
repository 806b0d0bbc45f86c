"""Sampling distributions, formula-for-formula with the reference.

Each sampler takes pre-drawn U[0,1) uniforms instead of an RNG handle so
the wavefront integrator can draw one uniform block per loop iteration and
feed every masked branch from it (branchless dispatch). All inputs/outputs
are SoA ([B] scalars, V3 of [B]).

Parity notes (reference ``src/math/distr.rs``):
- ``unit_sphere``     (distr.rs:11-21):  the (theta, r2) parametrization
  x = cos(t)·2·sqrt(r2(1-r2)), z = 1-2·r2. Uniform on the sphere.
- ``unit_hemisphere`` (distr.rs:49-58):  same x,y but z = 1-r2 — the
  result is intentionally NOT unit length (norm² = (1-r2)(1+3r2)); the
  reference uses it as a fuzz vector that gets normalized later.
- ``cosine_hemisphere`` (distr.rs:87-96): cosine-weighted, unit length.
- ``unit_disk``       (distr.rs:119-131): uniform angle and *uniform
  radius* (not sqrt) — the defocus bokeh is center-heavy by design;
  preserved deliberately (SURVEY.md quirk #3).

The tangent frame is the branchless Duff construction rather than glam's
``any_orthonormal_pair`` (``distr.rs:37-45``); the samplers are isotropic
about the normal, so any orthonormal pair yields the same distribution.
"""

from __future__ import annotations

import jax.numpy as jnp

from bendy_tpu.utils.v3 import V3

TAU = 2.0 * jnp.pi


def sin_cos_tau(u: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sin, cos) of 2π·u for u in [0,1), as half-angle Taylor polynomials.

    Every sampler angle is uniform on one full turn, so the domain is
    fixed and no range reduction is needed: h = π·(u−1/2)/... lands in
    [−π/2, π/2) where 9th/10th-order series are accurate to ~4e-6 abs
    (f32-noise for MC sampling). ~26 fused VPU ops for the pair vs two
    range-reduced transcendentals — the samplers run every wavefront
    iteration, so this is a measurable slice of the megakernel body.
    """
    h = (u - 0.5) * jnp.float32(jnp.pi)  # half of (angle - π), in [-π/2, π/2)
    h2 = h * h
    s_h = h * (
        1.0
        + h2 * (-1.0 / 6.0 + h2 * (1.0 / 120.0 + h2 * (-1.0 / 5040.0 + h2 * (1.0 / 362880.0))))
    )
    c_h = 1.0 + h2 * (
        -0.5
        + h2 * (1.0 / 24.0 + h2 * (-1.0 / 720.0 + h2 * (1.0 / 40320.0 + h2 * (-1.0 / 3628800.0))))
    )
    # angle = 2h + π:  sin = -sin(2h) = -2·s·c;  cos = -cos(2h) = 2s² - 1
    return -2.0 * s_h * c_h, 2.0 * (s_h * s_h) - 1.0


def sin_cos_small(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sin, cos) for |x| <= ~1.2 rad (no range reduction; Taylor 9/10).

    Abs error < 2e-7 at 1.2 — below f32 round-off of the downstream math.
    Used for frustum angles when the camera FOV statically bounds them
    (TraceConfig.frustum_poly).
    """
    x2 = x * x
    s = x * (
        1.0
        + x2 * (-1.0 / 6.0 + x2 * (1.0 / 120.0 + x2 * (-1.0 / 5040.0 + x2 * (1.0 / 362880.0))))
    )
    c = 1.0 + x2 * (
        -0.5
        + x2 * (1.0 / 24.0 + x2 * (-1.0 / 720.0 + x2 * (1.0 / 40320.0 + x2 * (-1.0 / 3628800.0))))
    )
    return s, c


def unit_sphere(u1: jnp.ndarray, u2: jnp.ndarray) -> V3:
    """Uniform direction on S² from two uniforms (``distr.rs:11-21``)."""
    sin1, cos1 = sin_cos_tau(u1)
    s = 2.0 * jnp.sqrt(u2 * (1.0 - u2))
    return V3(cos1 * s, sin1 * s, 1.0 - 2.0 * u2)


def unit_hemisphere(normal: V3, u1: jnp.ndarray, u2: jnp.ndarray) -> V3:
    """Hemisphere fuzz vector about ``normal`` (``distr.rs:49-58``).

    Deliberately not normalized, matching the reference — callers add it
    as fuzz and re-normalize.
    """
    sin1, cos1 = sin_cos_tau(u1)
    s = 2.0 * jnp.sqrt(u2 * (1.0 - u2))
    t, b = normal.orthonormal_frame()
    return t * (cos1 * s) + b * (sin1 * s) + normal * (1.0 - u2)


def cosine_hemisphere(normal: V3, u1: jnp.ndarray, u2: jnp.ndarray) -> V3:
    """Cosine-weighted unit direction about ``normal`` (``distr.rs:87-96``)."""
    sin1, cos1 = sin_cos_tau(u1)
    sq = jnp.sqrt(u2)
    t, b = normal.orthonormal_frame()
    return t * (cos1 * sq) + b * (sin1 * sq) + normal * jnp.sqrt(1.0 - u2)


def unit_disk(normal: V3, u1: jnp.ndarray, u2: jnp.ndarray) -> V3:
    """Center-heavy disk sample in the plane ⊥ ``normal`` (``distr.rs:119-131``).

    Radius is uniform (NOT sqrt-warped): density ∝ 1/r. This shapes the
    thin-lens bokeh and is preserved for pixel parity.
    """
    sin1, cos1 = sin_cos_tau(u1)
    t, b = normal.orthonormal_frame()
    return (t * cos1 + b * sin1) * u2
