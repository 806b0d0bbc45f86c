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

import jax
import jax.numpy as jnp

from bendy_tpu.ops.distr import unit_disk
from bendy_tpu.utils.vecmath import normalize


class CameraParams(NamedTuple):
    sensor_size: jnp.ndarray  # [] f32
    focal_length: jnp.ndarray
    aspect_ratio: jnp.ndarray
    fstop: jnp.ndarray
    focus: jnp.ndarray  # [] f32; <= 0 means no defocus (focus disabled)
    rotation: jnp.ndarray  # [3,3] world rotation (linear part)
    translation: jnp.ndarray  # [3]


def camera_rays(
    cam: CameraParams,
    width: int,
    height: int,
    spp: int,
    subsample: int,
    keys: jax.Array,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate one primary ray per lane.

    Lane layout is pixel-major: lane = ((y·W + x)·spp + s)·n² + (j·n + i),
    so per-pixel reduction is a reshape, not a scatter. Returns
    (origins [B,3], directions [B,3]).
    """
    n = max(subsample, 1)
    B = width * height * spp * n * n
    lane = jnp.arange(B)
    sub = lane % (n * n)
    pix = lane // (spp * n * n)
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)
    si = (sub % n).astype(jnp.float32)
    sj = (sub // n).astype(jnp.float32)

    pw = 2.0 / width
    ph = 2.0 / height
    uj = jax.vmap(lambda k: jax.random.uniform(k, (4,)))(
        jax.vmap(lambda k: jax.random.fold_in(k, 0x00C0FFEE))(keys)
    )

    # jittered NDC (``tracer/mod.rs:255-283``); subpixel offset is i/n of a pixel
    u = px * pw - 1.0 + (si / n) * pw + (uj[:, 0] - 0.5) * (pw / n)
    v = py * ph - 1.0 + (sj / n) * ph + (uj[:, 1] - 0.5) * (ph / n)

    yfov = 2.0 * jnp.arctan2(cam.sensor_size, 2.0 * cam.focal_length)
    xfov = yfov * cam.aspect_ratio
    yrot = xfov * 0.5 * -u
    xrot = yfov * 0.5 * -v
    d_frustum = jnp.stack(
        [
            -jnp.cos(xrot) * jnp.sin(yrot),
            jnp.sin(xrot),
            -jnp.cos(xrot) * jnp.cos(yrot),
        ],
        axis=-1,
    )

    d_world = normalize(d_frustum @ cam.rotation.T)
    origin = jnp.broadcast_to(cam.translation, d_world.shape)

    # thin-lens defocus (``tracer/mod.rs:286-302``)
    neg_z = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0], d_world.dtype), d_world.shape)
    defocus = unit_disk(neg_z, uj[:, 2], uj[:, 3])
    aperture = 0.5 * cam.focal_length / cam.fstop
    defocus_offset = (defocus * aperture) @ cam.rotation.T
    frac_f_z = cam.focus / jnp.abs(d_frustum[:, 2])
    origin_dof = origin + defocus_offset
    dir_dof = normalize(d_world * frac_f_z[:, None] - defocus_offset)

    use_dof = cam.focus > 0.0
    origin = jnp.where(use_dof, origin_dof, origin)
    direction = jnp.where(use_dof, dir_dof, d_world)
    return origin, direction
