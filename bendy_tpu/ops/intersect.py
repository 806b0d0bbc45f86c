"""Batched, branchless primitive intersection.

The reference finds the nearest hit with a linear object scan that shrinks
``clip.max`` (``src/tracer/mod.rs:389-402``). Here every lane tests every
primitive at once: a [B, Ns] sphere sweep + a [B, Nr] rect sweep followed
by one argmin reduction — pure VPU work with no divergence.

Face codes (``src/tracer/ray.rs:8-15``):
    0 FRONT, 1 BACK, 2 VOLUME (interior march event),
    3 VOLUME_FRONT, 4 VOLUME_BACK.  MISS = -1.

Formulas:
- sphere: half-b quadratic, near root preferred, far root fallback within
  clip (``src/scene/object/sphere.rs:121-148``),
- rect: plane hit t = ((c-o)·n)/(d·n) with |d·n| <= 1e-5 parallel reject
  and in-plane containment via basis projection
  (``src/scene/object/rect.rs:110-142``); front when (c-o)·n < 0,
- volume march step: for the lane's current volume sphere, an *interior*
  pseudo-hit at t = clip_max replaces the surface test whenever the point
  at clip_max is still inside (``src/scene/object/sphere.rs:150-166``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bendy_tpu.scene.compiler import SceneArrays
from bendy_tpu.utils.vecmath import dot

INF = jnp.inf

FACE_FRONT = 0
FACE_BACK = 1
FACE_VOLUME = 2
FACE_VOLUME_FRONT = 3
FACE_VOLUME_BACK = 4
FACE_MISS = -1


class Hit(NamedTuple):
    """Nearest-hit record for a batch of lanes (the SoA ``Manifold``)."""

    t: jnp.ndarray  # [B] distance, +inf on miss
    valid: jnp.ndarray  # [B] bool
    position: jnp.ndarray  # [B,3]
    normal: jnp.ndarray  # [B,3] (zero for interior volume events)
    face: jnp.ndarray  # [B] face code
    mat: jnp.ndarray  # [B] dense material idx (undefined on miss)
    vol: jnp.ndarray  # [B] dense volume idx, -1 = none
    sphere_row: jnp.ndarray  # [B] sphere row when the hit is a sphere, else -1
    bbox_min: jnp.ndarray  # [B,3] hit object's AABB (volume lookup)
    bbox_size: jnp.ndarray  # [B,3]


def sphere_ts(org: jnp.ndarray, dir: jnp.ndarray, cmin: jnp.ndarray, cmax: jnp.ndarray,
              scn: SceneArrays) -> jnp.ndarray:
    """Per-(lane, sphere) hit distance, +inf on miss. [B, Ns].

    Mirrors ``Sphere::hit`` (``sphere.rs:121-148``): prefer the near root,
    fall back to the far root if the near one is outside [cmin, cmax].
    """
    oc = org[:, None, :] - scn.sph_center[None, :, :]  # [B,Ns,3]
    half_b = jnp.sum(oc * dir[:, None, :], axis=-1)  # [B,Ns]
    c = jnp.sum(oc * oc, axis=-1) - scn.sph_radius[None, :] ** 2
    disc = half_b * half_b - c
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = -half_b - sqrtd
    t_far = -half_b + sqrtd
    near_ok = (t_near >= cmin[:, None]) & (t_near <= cmax[:, None])
    far_ok = (t_far >= cmin[:, None]) & (t_far <= cmax[:, None])
    t = jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, INF))
    return jnp.where((disc >= 0.0) & scn.sph_valid[None, :], t, INF)


def rect_ts(org: jnp.ndarray, dir: jnp.ndarray, cmin: jnp.ndarray, cmax: jnp.ndarray,
            scn: SceneArrays) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(lane, rect) hit distance (+inf miss) and plane-side sign p.

    Mirrors ``Rect::hit`` (``rect.rs:110-142``). Returns (t [B,Nr], p [B,Nr]);
    p < 0 means front face.
    """
    n = scn.rct_z  # [Nr,3] world unit normals
    q = jnp.einsum("bi,ri->br", dir, n)
    co = scn.rct_center[None, :, :] - org[:, None, :]  # [B,Nr,3]
    p = jnp.sum(co * n[None, :, :], axis=-1)  # [B,Nr]
    q_safe = jnp.where(jnp.abs(q) <= 1e-5, 1.0, q)
    t = p / q_safe
    pos_local = org[:, None, :] + t[..., None] * dir[:, None, :] - scn.rct_center[None, :, :]
    lx = jnp.sum(pos_local * scn.rct_x[None, :, :], axis=-1)
    ly = jnp.sum(pos_local * scn.rct_y[None, :, :], axis=-1)
    inside = (lx * lx <= scn.rct_hw[None, :] ** 2) & (ly * ly <= scn.rct_hh[None, :] ** 2)
    ok = (
        (jnp.abs(q) > 1e-5)
        & (t >= cmin[:, None])
        & (t <= cmax[:, None])
        & inside
        & scn.rct_valid[None, :]
    )
    return jnp.where(ok, t, INF), p


def nearest_hit(
    org: jnp.ndarray,
    dir: jnp.ndarray,
    cmin: jnp.ndarray,
    cmax: jnp.ndarray,
    scn: SceneArrays,
    march: jnp.ndarray | None = None,
    last_sphere: jnp.ndarray | None = None,
) -> Hit:
    """Nearest hit across all primitives for each lane.

    When ``march`` lanes are given, the lane's ``last_sphere`` gets the
    volumetric treatment (``sphere.rs:150-166``): if the point at t=cmax is
    still inside, an interior VOLUME event at t=cmax replaces that sphere's
    surface test.
    """
    B = org.shape[0]
    t_sph = sphere_ts(org, dir, cmin, cmax, scn)  # [B,Ns]
    t_rct, p_rct = rect_ts(org, dir, cmin, cmax, scn)  # [B,Nr]

    interior = jnp.zeros(B, dtype=bool)
    if march is not None:
        rows = jnp.arange(scn.n_spheres)[None, :] == last_sphere[:, None]  # [B,Ns]
        center = scn.sph_center[jnp.clip(last_sphere, 0, scn.n_spheres - 1)]
        radius = scn.sph_radius[jnp.clip(last_sphere, 0, scn.n_spheres - 1)]
        end = org + cmax[:, None] * dir
        inside = jnp.sum((end - center) ** 2, axis=-1) <= radius * radius
        interior = march & inside & (last_sphere >= 0)
        # interior pseudo-hit at t = cmax replaces the sphere's surface test
        t_sph = jnp.where(rows & interior[:, None], cmax[:, None], t_sph)

    t_all = jnp.concatenate([t_sph, t_rct], axis=1)  # [B, Ns+Nr]
    idx = jnp.argmin(t_all, axis=1)  # [B]
    t = jnp.take_along_axis(t_all, idx[:, None], axis=1)[:, 0]
    valid = jnp.isfinite(t)

    is_sphere = idx < scn.n_spheres
    srow = jnp.where(is_sphere, idx, 0)
    rrow = jnp.where(is_sphere, 0, idx - scn.n_spheres)

    position = org + t[:, None] * dir

    # sphere manifold (``sphere.rs:85-119``)
    s_center = scn.sph_center[srow]
    s_radius = scn.sph_radius[srow]
    s_normal = (position - s_center) / s_radius[:, None]
    s_front = dot(dir, s_normal) < 0.0
    s_normal = jnp.where(s_front[:, None], s_normal, -s_normal)
    s_has_vol = scn.sph_vol[srow] >= 0
    s_face = jnp.where(
        s_has_vol,
        jnp.where(s_front, FACE_VOLUME_FRONT, FACE_VOLUME_BACK),
        jnp.where(s_front, FACE_FRONT, FACE_BACK),
    )
    s_bbox_min = s_center - s_radius[:, None]
    s_bbox_size = 2.0 * s_radius[:, None] * jnp.ones_like(s_center)

    # the interior pseudo-hit overrides: zero normal, VOLUME face (``sphere.rs:71-83``)
    if march is not None:
        hit_interior = interior & valid & is_sphere & (srow == last_sphere)
        s_normal = jnp.where(hit_interior[:, None], 0.0, s_normal)
        s_face = jnp.where(hit_interior, FACE_VOLUME, s_face)

    # rect manifold (``rect.rs:138-142``)
    r_normal_raw = scn.rct_z[rrow]
    r_p = jnp.take_along_axis(p_rct, rrow[:, None], axis=1)[:, 0]
    r_front = r_p < 0.0
    r_normal = jnp.where(r_front[:, None], r_normal_raw, -r_normal_raw)
    r_face = jnp.where(r_front, FACE_FRONT, FACE_BACK)

    normal = jnp.where(is_sphere[:, None], s_normal, r_normal)
    face = jnp.where(is_sphere, s_face, r_face)
    face = jnp.where(valid, face, FACE_MISS)
    mat = jnp.where(is_sphere, scn.sph_mat[srow], scn.rct_mat[rrow])
    vol = jnp.where(is_sphere, scn.sph_vol[srow], -1)
    sphere_row = jnp.where(is_sphere & valid, srow, -1)

    return Hit(
        t=t,
        valid=valid,
        position=position,
        normal=normal,
        face=face,
        mat=mat,
        vol=vol,
        sphere_row=sphere_row,
        bbox_min=s_bbox_min,
        bbox_size=s_bbox_size,
    )


def light_pdf(
    org: jnp.ndarray,
    dir: jnp.ndarray,
    cmin: jnp.ndarray,
    cmax: jnp.ndarray,
    scn: SceneArrays,
    light_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Area-form pdf of sampling direction ``dir`` toward light ``light_idx``.

    Matches ``light_pdf`` (``src/scene/data/material.rs:313-316``) +
    per-shape pdfs: sphere t²/(πr²) (``sphere.rs:44-61``), rect
    t²/(area·|d·n|) (``rect.rs:92-108``), cuboid = nearest face's pdf
    (``cuboid.rs:56-81``). 0.0 when the ray misses the light
    (``unwrap_or_default``).
    """
    kind = scn.light_kind[light_idx]  # [B]
    # sphere lights
    srow = jnp.clip(scn.light_sphere[light_idx], 0, scn.n_spheres - 1)
    center = scn.sph_center[srow]
    radius = scn.sph_radius[srow]
    oc = org - center
    half_b = dot(oc, dir)
    c = dot(oc, oc) - radius * radius
    disc = half_b * half_b - c
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = -half_b - sqrtd
    t_far = -half_b + sqrtd
    near_ok = (t_near >= cmin) & (t_near <= cmax)
    far_ok = (t_far >= cmin) & (t_far <= cmax)
    t_s = jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, INF))
    s_hit = (disc >= 0.0) & jnp.isfinite(t_s)
    pdf_sphere = jnp.where(s_hit, t_s * t_s / (jnp.pi * radius * radius), 0.0)

    # rect-set lights: nearest face within clip, then that face's pdf
    rows = jnp.clip(scn.light_faces[light_idx], 0, scn.n_rects - 1)  # [B,F]
    row_ok = scn.light_faces[light_idx] >= 0
    n = scn.rct_z[rows]  # [B,F,3]
    q = jnp.sum(dir[:, None, :] * n, axis=-1)
    co = scn.rct_center[rows] - org[:, None, :]
    p = jnp.sum(co * n, axis=-1)
    q_safe = jnp.where(jnp.abs(q) <= 1e-5, 1.0, q)
    t_r = p / q_safe
    pos_local = org[:, None, :] + t_r[..., None] * dir[:, None, :] - scn.rct_center[rows]
    lx = jnp.sum(pos_local * scn.rct_x[rows], axis=-1)
    ly = jnp.sum(pos_local * scn.rct_y[rows], axis=-1)
    hw = scn.rct_hw[rows]
    hh = scn.rct_hh[rows]
    ok = (
        (jnp.abs(q) > 1e-5)
        & (t_r >= cmin[:, None])
        & (t_r <= cmax[:, None])
        & (lx * lx <= hw * hw)
        & (ly * ly <= hh * hh)
        & row_ok
    )
    t_r = jnp.where(ok, t_r, INF)
    best = jnp.argmin(t_r, axis=1)
    t_b = jnp.take_along_axis(t_r, best[:, None], axis=1)[:, 0]
    q_b = jnp.take_along_axis(q, best[:, None], axis=1)[:, 0]
    hw_b = jnp.take_along_axis(hw, best[:, None], axis=1)[:, 0]
    hh_b = jnp.take_along_axis(hh, best[:, None], axis=1)[:, 0]
    area = 4.0 * hw_b * hh_b
    # shadow = area * |d·n| with the *oriented* manifold normal; |.| makes
    # the orientation irrelevant (``rect.rs:101``)
    pdf_rect = jnp.where(jnp.isfinite(t_b), t_b * t_b / (area * jnp.abs(q_b)), 0.0)

    return jnp.where(kind == 0, pdf_sphere, pdf_rect)
