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

Every lane evaluates every branch; ``hit.mtype`` selects. The per-lane
uniform list ``u`` is laid out as (6 slots = 3 threefry blocks/iteration):
    u0 light pick, whose fraction u0·L mod 1 is an independent uniform
       reused as the cuboid face pick ·
    u1 mix bernoulli (diffuse) / reflect bernoulli (glass — disjoint
       material, same slot) ·
    u2,u3 cosine/fuzz · u4,u5 light point
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from bendy_tpu.ops import distr
from bendy_tpu.ops.intersect import (
    FACE_FRONT,
    FACE_VOLUME_FRONT,
    LIGHT_FACE_COLS,
    Hit,
    light_pdf,
    light_pdf_looped,
    row3,
)
from bendy_tpu.scene.compiler import (
    MAT_DIFFUSE,
    MAT_GLASS,
    MAT_METALLIC,
    SceneArrays,
)
from bendy_tpu.utils.v3 import V3, caxpy, host_const


class Shade(NamedTuple):
    emitted: V3  # radiance emitted at this event
    scatter: jnp.ndarray  # [B] bool: does the path continue?
    direction: V3  # next ray direction (unit)
    weight: V3  # throughput multiplier for the next segment
    aov_albedo: V3
    aov_normal: V3
    aov_depth: jnp.ndarray  # [B]


def sample_light_point(scn: SceneArrays, light_idx: jnp.ndarray,
                       u_a: jnp.ndarray, u_b: jnp.ndarray, u_face: jnp.ndarray) -> V3:
    """Uniform point on light ``light_idx`` (``Object::random_point``).

    sphere: center + r·unit_sphere       (``sphere.rs:40-42``)
    rect:   center + x̂·U(-hw,hw) + ...    (``rect.rs:82-86``)
    cuboid: area-weighted face, then rect (``cuboid.rs:48-54``)

    Static loop over lights; per-light faces are scalar slices.
    """
    from bendy_tpu.ops.intersect import static_int

    B = u_a.shape
    kinds_c = [static_int(scn.light_kind, li) for li in range(scn.n_lights)]
    if any(k != 1 for k in kinds_c):  # a sphere light exists (or unknown)
        usphere = distr.unit_sphere(u_a, u_b)
    out = V3.zeros(B)
    for li in range(scn.n_lights):
        sel = light_idx == li
        kind_c = kinds_c[li]
        if kind_c != 1:
            p_sphere = row3(scn.light_sph_center, li) + usphere * scn.light_sph_radius[li]
        if kind_c == 0:
            out = V3.where(sel, p_sphere, out)
            continue

        nf = scn.light_face_cdf.shape[1]
        # first face whose cdf exceeds u_face
        remaining = jnp.ones(B, bool)
        p_rect = V3.zeros(B)
        for f in range(nf):
            if static_int(scn.light_face_valid, (li, f)) is False:
                continue
            cdf = scn.light_face_cdf[li, f]
            pick = remaining & (u_face < cdf) & scn.light_face_valid[li, f]
            remaining = remaining & ~pick
            x = (u_a * 2.0 - 1.0) * scn.light_face_hw[li, f]
            y = (u_b * 2.0 - 1.0) * scn.light_face_hh[li, f]
            # caxpy: basis components that are exact host-constant zeros
            # (axis-aligned faces under the Pallas-baked scene) drop their
            # multiply-add at trace time
            p_f = caxpy(
                caxpy(
                    V3(scn.light_face_center[li, f, 0],
                       scn.light_face_center[li, f, 1],
                       scn.light_face_center[li, f, 2]),
                    V3(scn.light_face_x[li, f, 0], scn.light_face_x[li, f, 1],
                       scn.light_face_x[li, f, 2]),
                    x,
                ),
                V3(scn.light_face_y[li, f, 0], scn.light_face_y[li, f, 1],
                   scn.light_face_y[li, f, 2]),
                y,
            )
            # a component with both basis entries zero stays a host scalar
            # (the face's normal axis): broadcast it for the select
            p_f = V3(*[c if host_const(c) is None else jnp.zeros(B) + c
                       for c in p_f])
            p_rect = V3.where(pick, p_f, p_rect)

        if kind_c == 1:
            out = V3.where(sel, p_rect, out)
        else:  # kind unknown at trace time: generic masked select
            out = V3.where(sel, V3.where(scn.light_kind[li] == 0, p_sphere, p_rect), out)
    return out


def sample_light_point_looped(
    scn: SceneArrays,
    light_idx: jnp.ndarray,
    u_a: jnp.ndarray,
    u_b: jnp.ndarray,
    u_face: jnp.ndarray,
    table=None,
    table_is_ref: bool = False,
) -> V3:
    """Compile-time-flat :func:`sample_light_point`: fori_loop over light
    rows (prim_tables()["light"]; SMEM ref inside the megakernel). Same
    float arithmetic in the same order as the traced (non-pruned) branch
    of the unrolled sweep — forcing ``looped_lights`` on a small scene is
    bit-identical. See :func:`bendy_tpu.ops.intersect.light_pdf_looped`
    for why: many-LIGHT scenes otherwise hit the unroll's superlinear
    compile wall.
    """
    import jax

    from bendy_tpu.ops.intersect import prim_tables

    B = u_a.shape
    is_ref = table_is_ref
    if table is None:
        table = prim_tables(scn, jnp, kinds=("light",))["light"]
    F = scn.light_face_cdf.shape[1]
    usphere = distr.unit_sphere(u_a, u_b)

    def body(li, out):
        if is_ref:
            g = lambda c: table[li, c]  # noqa: E731
        else:
            row = jax.lax.dynamic_slice_in_dim(table, li, 1, axis=0)
            g = lambda c: row[0, c]  # noqa: E731
        sel = light_idx == li
        p_sphere = V3(g(1), g(2), g(3)) + usphere * g(4)

        remaining = jnp.ones(B, bool)
        p_rect = V3.zeros(B)
        for f in range(F):
            base = 5 + LIGHT_FACE_COLS * f
            cdf = g(base + 21)
            pick = remaining & (u_face < cdf) & (g(base + 22) > 0.0)
            remaining = remaining & ~pick
            x = (u_a * 2.0 - 1.0) * g(base + 18)
            y = (u_b * 2.0 - 1.0) * g(base + 19)
            p_f = caxpy(
                caxpy(
                    V3(g(base + 0), g(base + 1), g(base + 2)),
                    V3(g(base + 3), g(base + 4), g(base + 5)),  # fx
                    x,
                ),
                V3(g(base + 6), g(base + 7), g(base + 8)),  # fy
                y,
            )
            p_rect = V3.where(pick, p_f, p_rect)
        return V3.where(sel, V3.where(g(0) == 0, p_sphere, p_rect), out)

    return jax.lax.fori_loop(0, scn.n_lights, body, V3.zeros(B))


def shade_surface(
    dir_in: V3,
    hit: Hit,
    scn: SceneArrays,
    u: Sequence[jnp.ndarray],
    clip_min: float,
    clip_max: float,
    has_diffuse: bool = True,
    has_metallic: bool = True,
    has_glass: bool = True,
    looped_lights: bool = False,
    light_table=None,
    light_table_is_ref: bool = False,
) -> Shade:
    """Shade surface-face lanes; volume faces are handled by ops.volume.

    ``has_diffuse`` / ``has_metallic`` / ``has_glass`` are *static* scene
    facts (derived by the renderer from the compiled primitive materials):
    a branch whose material kind no primitive carries never wins a select,
    so skipping it is exact — it only removes per-iteration VPU work. The
    diffuse branch is the expensive one (light-point sampling + light pdf
    are full sweeps over the light list, every iteration); the glass
    branch carries the fresnel/refract math and the ior attribute, so
    metallic-only scenes (cornell2, the lensed showcase's companion) drop
    ~60 ops/iteration by the finer split.
    """
    B = dir_in.x.shape
    n = hit.normal
    pos = hit.position
    albedo = hit.albedo
    emitted = hit.emitted
    mtype = hit.mtype

    # --- diffuse: mixture of cosine BSDF and next-event light sampling ----
    if has_diffuse:
        cmin = jnp.full(B, clip_min, dir_in.x.dtype)
        cmax = jnp.full(B, clip_max, dir_in.x.dtype)
        nl = scn.n_lights
        scaled = u[0] * nl
        light_idx = jnp.clip(scaled.astype(jnp.int32), 0, nl - 1)
        u_face = scaled - jnp.floor(scaled)  # independent uniform given the pick
        d_cos = distr.cosine_hemisphere(n, u[2], u[3])
        # looped_lights (TraceConfig.looped_lights, derived from the
        # light count alone — render.LIGHT_LOOP_THRESHOLD): fori_loop light
        # sweeps — compile-time flat in the light count, bit-identical
        table_is_ref = light_table_is_ref
        if looped_lights and light_table is None:
            from bendy_tpu.ops.intersect import prim_tables

            light_table = prim_tables(scn, jnp, kinds=("light",))["light"]
        if looped_lights:
            lp = sample_light_point_looped(
                scn, light_idx, u[4], u[5], u_face, table=light_table,
                table_is_ref=table_is_ref,
            )
        else:
            lp = sample_light_point(scn, light_idx, u[4], u[5], u_face)
        d_light = (lp - pos).normalize()
        # gen_bool(0.5) picks the light branch (``material.rs:269-274`` with x=0.5)
        pick_light = u[1] < 0.5
        d_diff = V3.where(pick_light, d_light, d_cos)
        pdf_cos = n.dot(d_diff) * (1.0 / jnp.pi)  # signed (``material.rs:301-303``)
        if looped_lights:
            pdf_light = light_pdf_looped(
                pos, d_diff, cmin, cmax, scn, light_idx, table=light_table,
                table_is_ref=table_is_ref,
            )
        else:
            pdf_light = light_pdf(pos, d_diff, cmin, cmax, scn, light_idx)
        pdf_mix = pdf_cos + (pdf_light - pdf_cos) * 0.5  # lerp(a,b,0.5) (``material.rs:294-297``)
        absorbed = jnp.abs(pdf_mix) <= 1e-5  # (``material.rs:279-286``)
        pdf_mix_safe = jnp.where(absorbed, 1.0, pdf_mix)
        w_diff = albedo * (pdf_cos / pdf_mix_safe)

    if has_metallic or has_glass:
        # the hemisphere fuzz vector is shared by both specular kinds
        fuzz = distr.unit_hemisphere(n, u[2], u[3])

    if has_metallic:
        # --- metallic: mirror + fuzz, unit weight --------------------------
        d_metal = (dir_in.reflect(n) + fuzz * hit.rough).normalize()

    if has_glass:
        # --- glass: probabilistic reflect/refract + fuzz --------------------
        is_front = (hit.face == FACE_FRONT) | (hit.face == FACE_VOLUME_FRONT)
        ior_eff = jnp.where(is_front, 1.0 / hit.ior, hit.ior)
        cos_theta = jnp.minimum((-dir_in).dot(n), 1.0)
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
        fr = dir_in.fresnel(n, ior_eff)
        do_reflect = (ior_eff * sin_theta > 1.0) | (u[1] < fr)
        d_glass_base = V3.where(do_reflect, dir_in.reflect(n), dir_in.refract(n, ior_eff))
        d_glass = (d_glass_base + fuzz * hit.rough).normalize()

    # --- select by material type -----------------------------------------
    # present kinds, in the fixed nesting order of the original
    # diffuse/metallic/glass select tree (the last present kind is the
    # select default, so every prior configuration is bit-identical)
    kinds = []
    if has_diffuse:
        kinds.append((MAT_DIFFUSE, d_diff))
    if has_metallic:
        kinds.append((MAT_METALLIC, d_metal))
    if has_glass:
        kinds.append((MAT_GLASS, d_glass))

    if not kinds:
        # flat/emissive-only scene: every surface event terminates
        scatter = jnp.zeros(B, bool)
        direction = dir_in
        weight = V3.zeros(B)
    else:
        scatter = None
        for code, _ in kinds:
            is_k = mtype == code
            if code == MAT_DIFFUSE:
                is_k = is_k & ~absorbed
            scatter = is_k if scatter is None else scatter | is_k
        direction = kinds[-1][1]
        for code, d in reversed(kinds[:-1]):
            direction = V3.where(mtype == code, d, direction)
        if has_diffuse and len(kinds) > 1:
            weight = V3.where(mtype == MAT_DIFFUSE, w_diff, albedo)
        elif has_diffuse:
            weight = w_diff
        else:
            weight = albedo
    weight = V3.where(scatter, weight, V3.zeros(B))

    # --- AOVs -------------------------------------------------------------
    aov_albedo = V3.where(scatter, albedo, emitted)
    aov_normal = V3.where(scatter, n, V3.zeros(B))
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
