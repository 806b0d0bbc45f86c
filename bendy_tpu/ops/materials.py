"""Branchless surface shading: all five material kinds, masked-select.

Reproduces the estimator of ``Material::shade`` / ``ChunkState::sample_surface``
(``src/scene/data/material.rs:81-199``, ``src/tracer/mod.rs:454-486``):

    color = emitted + albedo · bsdf_pdf(scatter) · L(scatter) / shader_pdf

- Flat      terminates with emitted = albedo              (material.rs:76,88-97)
- Diffuse   samples the 0.5 cosine / 0.5 light mixture PDF (material.rs:106-137)
            bsdf_pdf = n·d/π (signed!), shader_pdf = lerp(diffuse, light, 0.5)
            |shader_pdf| <= 1e-5 ⇒ path absorbed to black   (material.rs:279-286)
- Metallic  reflect + roughness·hemisphere fuzz; pdf ≡ 1    (material.rs:231-239,305)
- Glass     Schlick-probability reflect/refract + fuzz; pdf ≡ 1
            ior flips by face side                          (material.rs:240-261,309)
- Emissive  terminates with emitted = albedo·intensity      (material.rs:77,193-198)

AOV quirks preserved: terminating lanes report ColorData::from_emitted
(albedo := emitted, normal := 0, depth := +inf, ``src/tracer/ray.rs:57-65``);
scattering lanes report the hit's material albedo / shading normal / t.

Every lane evaluates every branch; ``mat_type`` selects. The per-lane
uniform block ``u`` is laid out as:
    u0 light pick · u1 mix bernoulli · u2,u3 cosine/fuzz ·
    u4,u5 light point · u6 cuboid face pick · u7 glass reflect bernoulli
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bendy_tpu.ops import distr
from bendy_tpu.ops.intersect import FACE_FRONT, FACE_VOLUME_FRONT, Hit, light_pdf
from bendy_tpu.scene.compiler import SceneArrays
from bendy_tpu.utils.vecmath import dot, fresnel_schlick, normalize, reflect, refract

MAT_FLAT = 0
MAT_DIFFUSE = 1
MAT_METALLIC = 2
MAT_GLASS = 3
MAT_EMISSIVE = 4


class Shade(NamedTuple):
    emitted: jnp.ndarray  # [B,3] radiance emitted at this event
    scatter: jnp.ndarray  # [B] bool: does the path continue?
    direction: jnp.ndarray  # [B,3] next ray direction (unit)
    weight: jnp.ndarray  # [B,3] throughput multiplier for the next segment
    aov_albedo: jnp.ndarray  # [B,3]
    aov_normal: jnp.ndarray  # [B,3]
    aov_depth: jnp.ndarray  # [B]


def sample_light_point(scn: SceneArrays, light_idx: jnp.ndarray,
                       u_a: jnp.ndarray, u_b: jnp.ndarray, u_face: jnp.ndarray) -> jnp.ndarray:
    """Uniform point on light ``light_idx`` (``Object::random_point``).

    sphere: center + r·unit_sphere       (``sphere.rs:40-42``)
    rect:   center + x·x̂·U(-hw,hw) + ...  (``rect.rs:82-86``)
    cuboid: area-weighted face, then rect (``cuboid.rs:48-54``)
    """
    srow = jnp.clip(scn.light_sphere[light_idx], 0, scn.n_spheres - 1)
    p_sphere = scn.sph_center[srow] + scn.sph_radius[srow][:, None] * distr.unit_sphere(u_a, u_b)

    cdf = scn.light_face_cdf[light_idx]  # [B,F]
    face = jnp.argmax(u_face[:, None] < cdf, axis=1)  # first face with cdf > u
    rrow = jnp.clip(jnp.take_along_axis(scn.light_faces[light_idx], face[:, None], axis=1)[:, 0],
                    0, scn.n_rects - 1)
    x = (u_a * 2.0 - 1.0) * scn.rct_hw[rrow]
    y = (u_b * 2.0 - 1.0) * scn.rct_hh[rrow]
    p_rect = scn.rct_center[rrow] + x[:, None] * scn.rct_x[rrow] + y[:, None] * scn.rct_y[rrow]

    return jnp.where((scn.light_kind[light_idx] == 0)[:, None], p_sphere, p_rect)


def shade_surface(
    dir_in: jnp.ndarray,
    hit: Hit,
    scn: SceneArrays,
    u: jnp.ndarray,
    clip_min: float,
    clip_max: float,
) -> Shade:
    """Shade surface-face lanes; volume faces are handled by ops.volume."""
    B = dir_in.shape[0]
    mtype = scn.mat_type[hit.mat]
    albedo = scn.mat_albedo[hit.mat]
    rough = scn.mat_rough[hit.mat]
    ior = scn.mat_ior[hit.mat]
    emitted = scn.mat_emitted[hit.mat]
    n = hit.normal
    pos = hit.position
    cmin = jnp.full(B, clip_min, dir_in.dtype)
    cmax = jnp.full(B, clip_max, dir_in.dtype)

    # --- diffuse: mixture of cosine BSDF and next-event light sampling ----
    nl = jnp.maximum(scn.num_lights, 1)
    light_idx = jnp.clip((u[:, 0] * nl).astype(jnp.int32), 0, nl - 1)
    d_cos = distr.cosine_hemisphere(n, u[:, 2], u[:, 3])
    lp = sample_light_point(scn, light_idx, u[:, 4], u[:, 5], u[:, 6])
    d_light = normalize(lp - pos)
    # gen_bool(0.5) picks the light branch (``material.rs:269-274`` with x=0.5)
    pick_light = u[:, 1] < 0.5
    d_diff = jnp.where(pick_light[:, None], d_light, d_cos)
    pdf_cos = dot(n, d_diff) * (1.0 / jnp.pi)  # signed (``material.rs:301-303``)
    pdf_light = light_pdf(pos, d_diff, cmin, cmax, scn, light_idx)
    pdf_mix = pdf_cos + (pdf_light - pdf_cos) * 0.5  # lerp(a,b,0.5) (``material.rs:294-297``)
    absorbed = jnp.abs(pdf_mix) <= 1e-5  # (``material.rs:279-286``)
    pdf_mix_safe = jnp.where(absorbed, 1.0, pdf_mix)
    w_diff = albedo * (pdf_cos / pdf_mix_safe)[:, None]

    # --- metallic: mirror + fuzz, unit weight --------------------------
    fuzz = distr.unit_hemisphere(n, u[:, 2], u[:, 3])
    d_metal = normalize(reflect(dir_in, n) + fuzz * rough[:, None])

    # --- glass: probabilistic reflect/refract + fuzz --------------------
    is_front = (hit.face == FACE_FRONT) | (hit.face == FACE_VOLUME_FRONT)
    ior_eff = jnp.where(is_front, 1.0 / ior, ior)
    cos_theta = jnp.minimum(dot(-dir_in, n), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    fr = fresnel_schlick(dir_in, n, ior_eff)
    must_reflect = ior_eff * sin_theta > 1.0
    do_reflect = must_reflect | (u[:, 7] < fr)
    d_glass_base = jnp.where(
        do_reflect[:, None], reflect(dir_in, n), refract(dir_in, n, ior_eff)
    )
    d_glass = normalize(d_glass_base + fuzz * rough[:, None])

    # --- select by material type ----------------------------------------
    scatter = (
        ((mtype == MAT_DIFFUSE) & ~absorbed) | (mtype == MAT_METALLIC) | (mtype == MAT_GLASS)
    )
    direction = jnp.where(
        (mtype == MAT_DIFFUSE)[:, None],
        d_diff,
        jnp.where((mtype == MAT_METALLIC)[:, None], d_metal, d_glass),
    )
    weight = jnp.where((mtype == MAT_DIFFUSE)[:, None], w_diff, albedo)
    weight = jnp.where(scatter[:, None], weight, 0.0)

    # --- AOVs -------------------------------------------------------------
    aov_albedo = jnp.where(scatter[:, None], albedo, emitted)
    aov_normal = jnp.where(scatter[:, None], n, 0.0)
    aov_depth = jnp.where(scatter, hit.t, jnp.inf)

    return Shade(
        emitted=emitted,
        scatter=scatter,
        direction=direction,
        weight=weight,
        aov_albedo=aov_albedo,
        aov_normal=aov_normal,
        aov_depth=aov_depth,
    )
