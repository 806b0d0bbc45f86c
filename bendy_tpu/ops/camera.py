"""Camera ray generation: jittered frustum rays + thin-lens defocus.

Parity notes (reference ``src/tracer/mod.rs:244-302``, ``src/tracer/ray.rs:103-113``):

- yfov = 2·atan2(sensor_size, 2·focal_length); xfov = yfov·aspect — the
  horizontal FOV scales the *angle*, not the tangent  (tracer/mod.rs:248-249).
- The frustum ray is the YXZ Euler rotation of -Z by (yrot, xrot) =
  (-xfov·u/2, -yfov·v/2), which closed-forms to
      d = (-cos(xrot)·sin(yrot), sin(xrot), -cos(xrot)·cos(yrot)).
  This is NOT a pinhole projection onto a plane (SURVEY quirk #6).
- NDC: u = x·(2/W) - 1 + subpixel·(2/W) + U(±(2/W)/(2n))  (tracer/mod.rs:255-283).
- Camera transform quirk: ``Affine3A * Ray`` translates the origin but does
  NOT rotate it; the direction is rotated and re-normalized
  (``src/tracer/ray.rs:126-137``). Camera rays start at origin zero so only
  the translation matters — reproduced exactly.
- Thin lens (tracer/mod.rs:286-302): aperture = focal/(2·fstop); a
  center-heavy unit-disk sample (⊥ -Z) is rotated into world space;
  focus distance divides by |d.z| *before* the camera rotation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bendy_tpu.ops.distr import sin_cos_tau
from bendy_tpu.utils.rng import CAMERA_TAG, lane_uniforms
from bendy_tpu.utils.v3 import V3


class CameraParams(NamedTuple):
    sensor_size: jnp.ndarray  # [] f32
    focal_length: jnp.ndarray
    aspect_ratio: jnp.ndarray
    fstop: jnp.ndarray
    focus: jnp.ndarray  # [] f32; <= 0 means no defocus (focus disabled)
    rotation: jnp.ndarray  # [3,3] world rotation (linear part)
    translation: jnp.ndarray  # [3]
    yfov: jnp.ndarray  # [] f32 = 2·atan2(sensor, 2·focal), precomputed on
    #   the host (Mosaic has no arctan; tracer/mod.rs:248)


def rotate(m: jnp.ndarray, v: V3) -> V3:
    """Apply a [3,3] rotation (traced scalars) to a V3 of [B] arrays."""
    return V3(
        m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z,
        m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z,
        m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z,
    )


def ndc_base(width: int, height: int, subsample: int, px, py, si, sj):
    """Jitter-free NDC base per lane (``tracer/mod.rs:271-275``)."""
    n = max(subsample, 1)
    pw = 2.0 / width
    ph = 2.0 / height
    u = px * pw - 1.0 + (si / n) * pw
    v = py * ph - 1.0 + (sj / n) * ph
    return u, v


def camera_ray(
    cam: CameraParams,
    width: int,
    height: int,
    subsample: int,
    key: tuple,
    sample_id: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    si: jnp.ndarray,
    sj: jnp.ndarray,
    poly_trig: bool = False,
    has_dof: bool = True,
    uv_base=None,
) -> tuple[V3, V3]:
    """Generate one primary ray per lane from explicit coordinates.

    ``sample_id`` is the *global* (pixel, sample, subpixel) id — it keys
    the jitter/defocus RNG streams, so any chunking/sharding of lanes
    produces identical rays. (px, py) are pixel coords, (si, sj) the
    subpixel cell. ``uv_base`` optionally supplies the per-lane NDC base
    (the jitter-free part of u, v) precomputed once — the wavefront loop
    carries it instead of redoing the int div/mod + converts every
    iteration; the arithmetic is bit-identical either way.
    """
    n = max(subsample, 1)
    pw = 2.0 / width
    ph = 2.0 / height
    uj = lane_uniforms(key, sample_id, CAMERA_TAG, 4)

    # jittered NDC (``tracer/mod.rs:255-283``); subpixel offset is i/n of a pixel
    if uv_base is not None:
        u_base, v_base = uv_base
    else:
        u_base, v_base = ndc_base(width, height, n, px, py, si, sj)
    u = u_base + (uj[0] - 0.5) * (pw / n)
    v = v_base + (uj[1] - 0.5) * (ph / n)

    yfov = cam.yfov  # host-precomputed 2·atan2(sensor, 2·focal)
    xfov = yfov * cam.aspect_ratio
    yrot = xfov * 0.5 * -u
    xrot = yfov * 0.5 * -v
    if poly_trig:
        # the renderer sets this only when the FOV statically bounds the
        # angles below ~1.2 rad (TraceConfig.frustum_poly): range-free
        # Taylor polys, abs error < 2e-7 (ops/distr.sin_cos_small)
        from bendy_tpu.ops.distr import sin_cos_small

        sin_x, cos_x = sin_cos_small(xrot)
        sin_y, cos_y = sin_cos_small(yrot)
    else:
        cos_x, sin_x = jnp.cos(xrot), jnp.sin(xrot)
        cos_y, sin_y = jnp.cos(yrot), jnp.sin(yrot)
    d_frustum = V3(-cos_x * sin_y, sin_x, -cos_x * cos_y)

    d_world = rotate(cam.rotation, d_frustum).normalize()
    origin = V3(
        jnp.broadcast_to(cam.translation[0], u.shape),
        jnp.broadcast_to(cam.translation[1], u.shape),
        jnp.broadcast_to(cam.translation[2], u.shape),
    )

    # thin-lens defocus (``tracer/mod.rs:286-302``). ``has_dof=False`` is a
    # *static* camera fact (focus is None): the whole block is dead code
    # then, so it is dropped from the loop body rather than select-masked.
    if not has_dof:
        return origin, d_world
    # unit_disk about the constant -Z axis: the Duff frame of (0,0,-1) is
    # t=(1,0,0), b=(0,-1,0) by construction, so the disk sample is
    # (cos, -sin, 0)·r directly — bit-identical to the generic frame math
    # (which previously ran on traced zeros every iteration) minus ~30 ops
    sin1, cos1 = sin_cos_tau(uj[2])  # unit_disk's own angle parametrization
    aperture = 0.5 * cam.focal_length / cam.fstop
    dx = (cos1 * uj[3]) * aperture
    dy = (-sin1 * uj[3]) * aperture
    m = cam.rotation  # rotate() with the z=0 component folded out
    defocus_offset = V3(
        m[0, 0] * dx + m[0, 1] * dy,
        m[1, 0] * dx + m[1, 1] * dy,
        m[2, 0] * dx + m[2, 1] * dy,
    )
    frac_f_z = cam.focus / jnp.abs(d_frustum.z)
    origin_dof = origin + defocus_offset
    dir_dof = (d_world * frac_f_z - defocus_offset).normalize()

    # full-shape predicate: Mosaic mis-lays-out scalar-pred selects
    use_dof = (cam.focus > 0.0) & jnp.full(u.shape, True)
    origin = V3.where(use_dof, origin_dof, origin)
    direction = V3.where(use_dof, dir_dof, d_world)
    return origin, direction
