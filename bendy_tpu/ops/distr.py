"""Sampling distributions, formula-for-formula with the reference.

Each sampler takes pre-drawn U[0,1) uniforms instead of an RNG handle so
the wavefront integrator can draw one uniform block per loop iteration and
feed every masked branch from it (branchless dispatch).

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
"""

from __future__ import annotations

import jax.numpy as jnp

from bendy_tpu.utils.vecmath import orthonormal_frame

TAU = 2.0 * jnp.pi


def unit_sphere(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on S² from two uniforms (``distr.rs:11-21``)."""
    r1 = u1 * TAU
    s = 2.0 * jnp.sqrt(u2 * (1.0 - u2))
    return jnp.stack([jnp.cos(r1) * s, jnp.sin(r1) * s, 1.0 - 2.0 * u2], axis=-1)


def unit_hemisphere(normal: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Hemisphere fuzz vector about ``normal`` (``distr.rs:49-58``).

    Deliberately not normalized, matching the reference (z = 1-r2 with the
    sphere's x,y) — callers add it as fuzz and re-normalize.
    """
    r1 = u1 * TAU
    s = 2.0 * jnp.sqrt(u2 * (1.0 - u2))
    x = jnp.cos(r1) * s
    y = jnp.sin(r1) * s
    z = 1.0 - u2
    t, b = orthonormal_frame(normal)
    return t * x[..., None] + b * y[..., None] + normal * z[..., None]


def cosine_hemisphere(normal: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted unit direction about ``normal`` (``distr.rs:87-96``)."""
    r1 = u1 * TAU
    sq = jnp.sqrt(u2)
    x = jnp.cos(r1) * sq
    y = jnp.sin(r1) * sq
    z = jnp.sqrt(1.0 - u2)
    t, b = orthonormal_frame(normal)
    return t * x[..., None] + b * y[..., None] + normal * z[..., None]


def unit_disk(normal: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Center-heavy disk sample in the plane ⊥ ``normal`` (``distr.rs:119-131``).

    Radius is uniform (NOT sqrt-warped): density ∝ 1/r. This shapes the
    thin-lens bokeh and is preserved for pixel parity.
    """
    angle = u1 * TAU
    t, b = orthonormal_frame(normal)
    return (t * jnp.cos(angle)[..., None] + b * jnp.sin(angle)[..., None]) * u2[..., None]
