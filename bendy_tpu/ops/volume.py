"""Participating media: trilinear density lookup + probabilistic scattering.

Reproduces ``Volume::shade`` and ``DensityMap::sample``
(``src/scene/data/volume.rs:26-67,140-166``):

- normalized coordinate from the hit object's AABB      (volume.rs:32-34)
- scatter probability = step · trilinear(coord), no exponential
  attenuation                                            (volume.rs:36-38)
- on scatter: isotropic new direction, origin jittered up to one step
  backwards for *interior* events, hardcoded albedo 0.8  (volume.rs:38-53)
- otherwise the ray passes through unattenuated          (volume.rs:54-59)

Uniform layout (shares the iteration block with surface shading):
    u0 scatter bernoulli · u1 back jitter · u2,u3 isotropic direction
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bendy_tpu.ops import distr
from bendy_tpu.ops.intersect import FACE_VOLUME, Hit
from bendy_tpu.scene.compiler import SceneArrays


def density_sample(scn: SceneArrays, vol: jnp.ndarray, coord: jnp.ndarray) -> jnp.ndarray:
    """Trilinear density at normalized coord [B,3] (``volume.rs:140-166``).

    coord is clamped to [0,1]; grid coordinates scale by (w-1,h-1,d-1).
    The reference's floor/ceil corner pair equals floor/min(floor+1, max)
    because the x1 corner only contributes when fract > 0.
    """
    v = jnp.clip(vol, 0, scn.vol_grid.shape[0] - 1)
    size = scn.vol_size[v]  # [B,3] (w-1, h-1, d-1)
    c = jnp.clip(coord, 0.0, 1.0) * size
    c0 = jnp.floor(c)
    fr = c - c0
    i0 = c0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size.astype(jnp.int32))

    def at(xi, yi, zi):
        return scn.vol_grid[v, zi, yi, xi]

    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    x1, y1, z1 = i1[:, 0], i1[:, 1], i1[:, 2]
    fx, fy, fz = fr[:, 0], fr[:, 1], fr[:, 2]

    def lerp(a, b, t):
        return a + (b - a) * t

    ya0 = lerp(at(x0, y0, z0), at(x1, y0, z0), fx)
    yb0 = lerp(at(x0, y1, z0), at(x1, y1, z0), fx)
    za = lerp(ya0, yb0, fy)
    ya1 = lerp(at(x0, y0, z1), at(x1, y0, z1), fx)
    yb1 = lerp(at(x0, y1, z1), at(x1, y1, z1), fx)
    zb = lerp(ya1, yb1, fy)
    return lerp(za, zb, fz)


class VolumeShade(NamedTuple):
    scattered: jnp.ndarray  # [B] bool: a scattering event happened
    origin: jnp.ndarray  # [B,3] next ray origin
    direction: jnp.ndarray  # [B,3] next ray direction
    weight: jnp.ndarray  # [B,3] throughput multiplier (0.8 on scatter, 1 otherwise)


def volume_shade(
    dir_in: jnp.ndarray,
    hit: Hit,
    scn: SceneArrays,
    u: jnp.ndarray,
    step: float,
) -> VolumeShade:
    """One probabilistic scattering decision at a volume event."""
    coord = (hit.position - hit.bbox_min) / hit.bbox_size
    density = step * density_sample(scn, hit.vol, coord)
    scattered = u[:, 0] < density  # covers density >= 1 too (``volume.rs:38``)

    # interior events jitter the origin up to one step backwards (``volume.rs:40-42``)
    back = jnp.where((hit.face == FACE_VOLUME)[:, None], dir_in * (step * u[:, 1])[:, None], 0.0)
    scatter_org = hit.position - back
    scatter_dir = distr.unit_sphere(u[:, 2], u[:, 3])

    origin = jnp.where(scattered[:, None], scatter_org, hit.position)
    direction = jnp.where(scattered[:, None], scatter_dir, dir_in)
    weight = jnp.where(scattered[:, None], 0.8, 1.0) * jnp.ones_like(dir_in)
    return VolumeShade(scattered=scattered, origin=origin, direction=direction, weight=weight)
