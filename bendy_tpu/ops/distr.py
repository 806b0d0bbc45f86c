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


def unit_sphere(u1: jnp.ndarray, u2: jnp.ndarray) -> V3:
    """Uniform direction on S² from two uniforms (``distr.rs:11-21``)."""
    r1 = u1 * TAU
    s = 2.0 * jnp.sqrt(u2 * (1.0 - u2))
    return V3(jnp.cos(r1) * s, jnp.sin(r1) * s, 1.0 - 2.0 * u2)


def unit_hemisphere(normal: V3, u1: jnp.ndarray, u2: jnp.ndarray) -> V3:
    """Hemisphere fuzz vector about ``normal`` (``distr.rs:49-58``).

    Deliberately not normalized, matching the reference — callers add it
    as fuzz and re-normalize.
    """
    r1 = u1 * TAU
    s = 2.0 * jnp.sqrt(u2 * (1.0 - u2))
    t, b = normal.orthonormal_frame()
    return t * (jnp.cos(r1) * s) + b * (jnp.sin(r1) * s) + normal * (1.0 - u2)


def cosine_hemisphere(normal: V3, u1: jnp.ndarray, u2: jnp.ndarray) -> V3:
    """Cosine-weighted unit direction about ``normal`` (``distr.rs:87-96``)."""
    r1 = u1 * TAU
    sq = jnp.sqrt(u2)
    t, b = normal.orthonormal_frame()
    return t * (jnp.cos(r1) * sq) + b * (jnp.sin(r1) * sq) + normal * jnp.sqrt(1.0 - u2)


def unit_disk(normal: V3, u1: jnp.ndarray, u2: jnp.ndarray) -> V3:
    """Center-heavy disk sample in the plane ⊥ ``normal`` (``distr.rs:119-131``).

    Radius is uniform (NOT sqrt-warped): density ∝ 1/r. This shapes the
    thin-lens bokeh and is preserved for pixel parity.
    """
    angle = u1 * TAU
    t, b = normal.orthonormal_frame()
    return (t * jnp.cos(angle) + b * jnp.sin(angle)) * u2
