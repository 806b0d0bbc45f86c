"""V3: structure-of-arrays 3-vectors for the TPU hot path.

TPU lesson baked into this type: ``[B,3]``-shaped arrays force XLA into
(sublane, lane) layouts whose minor dim is 3 — every gather/reshape then
pays a relayout copy, and fusions break at those copies (measured ~100x
slowdown in the wavefront loop). Three independent ``[B]`` arrays have
identical layouts, fuse into single VPU kernels, and broadcast against
scalars for free.

Also used for RGB colors (x=r, y=g, z=b) — the reference's ``LinearRgb``
arithmetic (``src/color.rs:274-288``) maps onto the same ops.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- constructors -------------------------------------------------------

    @staticmethod
    def of(x: Scalar, y: Scalar, z: Scalar) -> "V3":
        return V3(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))

    @staticmethod
    def splat(v: Scalar) -> "V3":
        v = jnp.asarray(v)
        return V3(v, v, v)

    @staticmethod
    def zeros(shape=(), dtype=jnp.float32) -> "V3":
        z = jnp.zeros(shape, dtype)
        return V3(z, z, z)

    @staticmethod
    def from_array(a: jnp.ndarray) -> "V3":
        """[...,3] -> V3 of [...] components."""
        return V3(a[..., 0], a[..., 1], a[..., 2])

    def to_array(self) -> jnp.ndarray:
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    # -- arithmetic ----------------------------------------------------------

    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __radd__(self, o):
        return self.__add__(o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    def __rmul__(self, o):
        return self.__mul__(o)

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # -- geometry ------------------------------------------------------------

    def dot(self, o: "V3") -> jnp.ndarray:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "V3") -> "V3":
        return V3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_squared(self) -> jnp.ndarray:
        return self.dot(self)

    def length(self) -> jnp.ndarray:
        return jnp.sqrt(self.length_squared())

    def normalize(self) -> "V3":
        return self * jax_rsqrt(self.length_squared())

    def normalize_or_zero(self) -> "V3":
        """glam semantics (``src/tracer/ray.rs:131-134``): zero stays zero."""
        n2 = self.length_squared()
        inv = jnp.where(n2 > 0.0, jax_rsqrt(jnp.where(n2 > 0.0, n2, 1.0)), 0.0)
        return self * inv

    # -- selection / blending ------------------------------------------------

    @staticmethod
    def where(mask: jnp.ndarray, a: "V3", b: "V3") -> "V3":
        return V3(
            jnp.where(mask, a.x, b.x),
            jnp.where(mask, a.y, b.y),
            jnp.where(mask, a.z, b.z),
        )

    def lerp(self, o: "V3", t: Scalar) -> "V3":
        """a + (b-a)·t (``src/math/mod.rs:9-25``)."""
        return self + (o - self) * t

    def max_component(self) -> jnp.ndarray:
        return jnp.maximum(self.x, jnp.maximum(self.y, self.z))

    # -- reference BSDF math (``src/math/mod.rs:27-63``) ---------------------

    def project(self, n: "V3") -> "V3":
        return n * self.dot(n)

    def reflect(self, n: "V3") -> "V3":
        return self - n * (2.0 * self.dot(n))

    def refract(self, n: "V3", ior: Scalar) -> "V3":
        cos_theta = jnp.minimum((-self).dot(n), 1.0)
        perp = (n * cos_theta + self) * ior
        parallel = n * -jnp.sqrt(jnp.abs(1.0 - perp.length_squared()))
        return perp + parallel

    def fresnel(self, n: "V3", ior: Scalar) -> jnp.ndarray:
        cos_theta = jnp.minimum((-self).dot(n), 1.0)
        r0 = (1.0 - ior) / (1.0 + ior)
        r0 = r0 * r0
        return r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5

    def orthonormal_frame(self) -> tuple["V3", "V3"]:
        """Branchless tangent frame for a unit vector (Duff et al. 2017)."""
        sign = jnp.where(self.z >= 0.0, 1.0, -1.0)
        a = -1.0 / (sign + self.z)
        b = self.x * self.y * a
        t = V3(1.0 + sign * self.x * self.x * a, sign * b, -sign * self.x)
        bt = V3(b, sign + self.y * self.y * a, -self.y)
        return t, bt


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.rsqrt(x)
