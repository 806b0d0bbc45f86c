"""Participating media: trilinear density lookup + probabilistic scattering.

Reproduces ``Volume::shade`` and ``DensityMap::sample``
(``src/scene/data/volume.rs:26-67,140-166``):

- normalized coordinate from the hit object's AABB      (volume.rs:32-34)
- scatter probability = step · trilinear(coord), no exponential
  attenuation                                            (volume.rs:36-38)
- on scatter: isotropic new direction, origin jittered up to one step
  backwards for *interior* events, hardcoded albedo 0.8  (volume.rs:38-53)
- otherwise the ray passes through unattenuated          (volume.rs:54-59)

The eight grid-corner reads are the one true gather in the whole
integrator (dynamic (grid, z, y, x) indices); everything else is fused
[B] elementwise work.

Uniform layout (shares the iteration block with surface shading):
    u0 scatter bernoulli · u1 back jitter · u2,u3 isotropic direction
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from bendy_tpu.ops import distr
from bendy_tpu.ops.intersect import FACE_VOLUME, Hit
from bendy_tpu.scene.compiler import SceneArrays
from bendy_tpu.utils.v3 import V3


def density_sample(scn: SceneArrays, hit: Hit, coord: V3) -> jnp.ndarray:
    """Trilinear density at normalized coord (``volume.rs:140-166``).

    coord is clamped to [0,1]; grid coordinates scale by (w-1,h-1,d-1).
    The reference's floor/ceil corner pair equals floor/min(floor+1, max)
    because the far corner only contributes when fract > 0.
    """
    G, D, H, W = scn.vol_grid.shape
    flat = scn.vol_grid.reshape(-1)
    size = hit.vol_size  # (w-1, h-1, d-1) of the hit sphere's grid
    cx = jnp.clip(coord.x, 0.0, 1.0) * size.x
    cy = jnp.clip(coord.y, 0.0, 1.0) * size.y
    cz = jnp.clip(coord.z, 0.0, 1.0) * size.z
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    z0 = jnp.floor(cz)
    fx, fy, fz = cx - x0, cy - y0, cz - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, size.x.astype(jnp.int32))
    y1i = jnp.minimum(y0i + 1, size.y.astype(jnp.int32))
    z1i = jnp.minimum(z0i + 1, size.z.astype(jnp.int32))
    g = jnp.maximum(hit.vol_grid, 0)

    def at(xi, yi, zi):
        idx = ((g * D + zi) * H + yi) * W + xi
        return flat[idx]

    def lerp(a, b, t):
        return a + (b - a) * t

    ya0 = lerp(at(x0i, y0i, z0i), at(x1i, y0i, z0i), fx)
    yb0 = lerp(at(x0i, y1i, z0i), at(x1i, y1i, z0i), fx)
    za = lerp(ya0, yb0, fy)
    ya1 = lerp(at(x0i, y0i, z1i), at(x1i, y0i, z1i), fx)
    yb1 = lerp(at(x0i, y1i, z1i), at(x1i, y1i, z1i), fx)
    zb = lerp(ya1, yb1, fy)
    return lerp(za, zb, fz)


class VolumeShade(NamedTuple):
    scattered: jnp.ndarray  # [B] bool: a scattering event happened
    origin: V3  # next ray origin
    direction: V3  # next ray direction
    weight: jnp.ndarray  # [B] throughput multiplier (0.8 on scatter, 1 otherwise)


def volume_shade(
    dir_in: V3,
    hit: Hit,
    scn: SceneArrays,
    u: Sequence[jnp.ndarray],
    step: float,
) -> VolumeShade:
    """One probabilistic scattering decision at a volume event."""
    coord = (hit.position - hit.bbox_min) / hit.bbox_size
    density = step * density_sample(scn, hit, coord)
    scattered = u[0] < density  # covers density >= 1 too (``volume.rs:38``)

    # interior events jitter the origin up to one step backwards (``volume.rs:40-42``)
    back = V3.where(hit.face == FACE_VOLUME, dir_in * (step * u[1]), V3.zeros(u[0].shape))
    scatter_org = hit.position - back
    scatter_dir = distr.unit_sphere(u[2], u[3])

    origin = V3.where(scattered, scatter_org, hit.position)
    direction = V3.where(scattered, scatter_dir, dir_in)
    weight = jnp.where(scattered, 0.8, 1.0)
    return VolumeShade(scattered=scattered, origin=origin, direction=direction, weight=weight)
