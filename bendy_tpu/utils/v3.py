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


# -- host-constant folding ---------------------------------------------------
#
# The Pallas megakernel bakes the compiled scene as numpy constants
# (ops/pallas_trace.py), so per-primitive geometry is concrete at trace
# time. Axis-aligned bases and origin-centered masses then have *exact*
# zero / ±1 components, and the corresponding multiply-add terms can be
# dropped in Python before anything is traced — the skipped work never
# reaches Mosaic. Exact for finite inputs: x·(±1) and x+0.0 are identity
# in IEEE 754 (modulo sign-of-zero, which nothing downstream observes).
# Under jit (traced scene arrays) every helper degrades to the generic op.


def host_const(v):
    """Concrete float when ``v`` is a host (python/numpy) scalar, else None."""
    import numpy as np

    if isinstance(v, (int, float, np.floating, np.integer)):
        return float(v)
    return None


def cmul(x, c):
    """``x*c`` with Python-level strength reduction for constant ``c``.

    Returns None when the term vanishes (c == 0) so callers can skip it.
    """
    cv = host_const(c)
    if cv is None:
        return x * c
    if cv == 0.0:
        return None
    if cv == 1.0:
        return x
    if cv == -1.0:
        return -x
    return x * c


def cdot(v: "V3", c: "V3"):
    """``v·c`` skipping exactly-zero constant components of ``c``."""
    terms = [t for t in (cmul(v.x, c.x), cmul(v.y, c.y), cmul(v.z, c.z))
             if t is not None]
    if not terms:
        return v.x * 0.0
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def cdot_get(get, c: "V3"):
    """Like :func:`cdot` but components come from ``get(i)`` — called only
    for nonzero constant entries of ``c`` (lazy: skipped components are
    never built, so no reliance on downstream dead-code elimination)."""
    terms = []
    probe = None
    for i, cc in enumerate((c.x, c.y, c.z)):
        if host_const(cc) == 0.0:
            continue
        vi = get(i)
        probe = vi
        t = cmul(vi, cc)
        if t is not None:
            terms.append(t)
    if not terms:
        return (probe if probe is not None else get(0)) * 0.0
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def csub(v: "V3", c: "V3") -> "V3":
    """``v - c`` dropping exactly-zero constant components of ``c``."""
    def one(a, cc):
        if host_const(cc) == 0.0:
            return a
        return a - cc

    return V3(one(v.x, c.x), one(v.y, c.y), one(v.z, c.z))


def caxpy(acc: "V3", c: "V3", s) -> "V3":
    """``acc + c*s`` dropping exactly-zero constant components of ``c``."""
    def one(a, cc):
        t = cmul(s, cc)
        return a if t is None else a + t

    return V3(one(acc.x, c.x), one(acc.y, c.y), one(acc.z, c.z))
