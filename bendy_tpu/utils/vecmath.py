"""Vector math primitives for the tracer's compute path.

Parity notes (reference ``src/math/mod.rs``):
- ``reflect(v, n) = v - 2 (v.n) n``                       (mod.rs:41-43)
- ``refract(v, n, ior)``: Snell with the total-internal-reflection guard
  expressed through ``abs()`` under the sqrt                (mod.rs:45-50)
- ``fresnel``: Schlick approximation with r0 from ior      (mod.rs:52-57)
- ``lerp(a, b, t) = a + (b - a) t``                        (mod.rs:9-25)

The orthonormal-frame builder replaces glam's ``any_orthonormal_pair``
(used by the samplers at ``src/math/distr.rs:37-45``) with the branchless
Pixar/Duff construction — the samplers built on it are isotropic about the
normal, so the specific tangent choice does not affect any distribution.

All functions operate on ``[..., 3]`` arrays and are jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis, keepdims=False."""
    return jnp.sum(a * b, axis=-1)


def normalize(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """v / |v|. With eps=0 reproduces glam's plain ``normalize``."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def normalize_or_zero(v: jnp.ndarray) -> jnp.ndarray:
    """glam's ``normalize_or_zero``: zero vector stays zero.

    Used by the ray transform (``src/tracer/ray.rs:131-134``).
    """
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    safe = jnp.where(n2 > 0.0, n2, 1.0)
    return jnp.where(n2 > 0.0, v / jnp.sqrt(safe), 0.0)


def lerp(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation ``a + (b - a) * t`` (``src/math/mod.rs:9-13``)."""
    return a + (b - a) * t


def project(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Project v onto unit n (``src/math/mod.rs:37-39``)."""
    return n * dot(v, n)[..., None]


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection about unit normal n (``src/math/mod.rs:41-43``)."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(v: jnp.ndarray, n: jnp.ndarray, ior: jnp.ndarray) -> jnp.ndarray:
    """Snell refraction of unit v about unit n with relative IOR.

    Mirrors ``src/math/mod.rs:45-50`` exactly, including the ``abs()``
    guard that silently degenerates at total internal reflection (callers
    check the TIR condition separately, as the reference's glass shader
    does at ``src/scene/data/material.rs:253``).
    """
    ior = jnp.asarray(ior)
    if ior.ndim < jnp.ndim(v):
        ior = ior[..., None]
    cos_theta = jnp.minimum(dot(-v, n), 1.0)[..., None]
    perp = (n * cos_theta + v) * ior
    parallel = n * -jnp.sqrt(jnp.abs(1.0 - jnp.sum(perp * perp, axis=-1, keepdims=True)))
    return perp + parallel


def fresnel_schlick(v: jnp.ndarray, n: jnp.ndarray, ior: jnp.ndarray) -> jnp.ndarray:
    """Schlick reflectance for unit incident v (``src/math/mod.rs:52-57``)."""
    cos_theta = jnp.minimum(dot(-v, n), 1.0)
    r0 = (1.0 - ior) / (1.0 + ior)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5


def orthonormal_frame(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless tangent/bitangent for unit n (Duff et al. 2017).

    Replaces glam's ``any_orthonormal_pair`` (``src/math/distr.rs:37-45``);
    any orthonormal pair is equivalent for the isotropic samplers built on
    top of it.
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    bt = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt
