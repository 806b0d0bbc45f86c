"""Wavefront path-tracing integrator.

The reference integrates by *recursion*: ``ChunkState::sample`` calls
itself per bounce (``src/tracer/mod.rs:322-342``) and interleaves with a
second recursion for volume marching (``sample_volumetric``,
``tracer/mod.rs:344-373``) — up to 8 surface levels × 32 volume levels of
call stack per ray.

On TPU, recursion and divergent control flow are poison. This module
flattens both recursions into ONE ``lax.while_loop`` over a megabatch of
ray lanes. Each lane carries a small state machine:

    mode 0 = dead · 1 = surface trace (clip [clip_min, clip_max]) ·
    2 = volume march (clip [0, volume_step], ``tracer/mod.rs:382-387``)

and the estimator identity that makes the flattening exact:

    recursive:  color = emitted + w · sample(scatter, bounce+1)
    iterative:  radiance += throughput · emitted;  throughput *= w

with w = albedo · bsdf_pdf(scatter) / shader_pdf (``tracer/mod.rs:471-482``).

Per iteration every lane performs one batched intersection sweep against
every primitive and one masked shade — no divergence, all VPU work.

AOV semantics match the reference's ColorData flow: the FIRST claiming
event (surface shade, env miss, or volume *scatter* — a volume
pass-through does not claim, ``volume.rs:54-59``) fixes albedo/normal/depth
for the lane; recursion below it only modifies color.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bendy_tpu.ops.intersect import (
    FACE_BACK,
    FACE_FRONT,
    FACE_VOLUME_BACK,
    nearest_hit,
)
from bendy_tpu.ops.materials import MAT_EMISSIVE, MAT_FLAT, shade_surface
from bendy_tpu.ops.volume import volume_shade
from bendy_tpu.scene.compiler import SceneArrays
from bendy_tpu.utils.rng import iter_uniforms

MODE_DEAD = 0
MODE_SURFACE = 1
MODE_MARCH = 2

N_UNIFORMS = 8  # see ops.materials / ops.volume uniform layouts


class TraceConfig(NamedTuple):
    """Static trace knobs (defaults = ``Config::DEFAULT``, ``tracer/mod.rs:29-38``)."""

    max_bounces: int = 8
    max_volume_bounces: int = 32
    clip_min: float = 0.01
    clip_max: float = 1000.0
    volume_step: float = 0.1
    has_volumes: bool = False  # static: volume branch compiled only when needed

    @property
    def max_iters(self) -> int:
        if self.has_volumes:
            return (self.max_bounces + 2) * (self.max_volume_bounces + 2)
        return self.max_bounces + 2


class TraceResult(NamedTuple):
    radiance: jnp.ndarray  # [B,3]
    aov_albedo: jnp.ndarray  # [B,3]
    aov_normal: jnp.ndarray  # [B,3]
    aov_depth: jnp.ndarray  # [B] raw t (inf for background/emissive)
    rays: jnp.ndarray  # [] f32: total alive-lane iterations (traced rays)


class _State(NamedTuple):
    it: jnp.ndarray
    org: jnp.ndarray
    dir: jnp.ndarray
    thr: jnp.ndarray
    rad: jnp.ndarray
    bounce: jnp.ndarray
    vbounce: jnp.ndarray
    mode: jnp.ndarray
    last_sph: jnp.ndarray
    aov_open: jnp.ndarray
    aov_alb: jnp.ndarray
    aov_nrm: jnp.ndarray
    aov_dep: jnp.ndarray
    rays: jnp.ndarray


def _env_terms(scn: SceneArrays, dir: jnp.ndarray, clip_max: float):
    """Environment (root-material) shading on miss (``tracer/mod.rs:429-452``).

    All five material kinds collapse to a fixed color here because
    ``sample_root`` ignores the scatter ray: flat/emissive contribute their
    emitted color, the rest their albedo. AOVs keep the reference's quirks
    (flat env reports BLACK albedo; emissive env zero normal / inf depth).
    """
    root = scn.root_mat
    mtype = scn.mat_type[root]
    albedo = scn.mat_albedo[root]
    emitted = scn.mat_emitted[root]
    is_const = (mtype == MAT_FLAT) | (mtype == MAT_EMISSIVE)
    color = jnp.where(is_const, emitted, albedo)  # [3]
    aov_albedo = jnp.where(is_const, 0.0, albedo)  # [3]
    is_em = mtype == MAT_EMISSIVE
    aov_normal = jnp.where(is_em, 0.0, -dir)  # [B,3]
    aov_depth = jnp.where(is_em, jnp.inf, clip_max)  # [] broadcast
    return color, aov_albedo, aov_normal, aov_depth


@partial(jax.jit, static_argnames=("cfg",))
def trace(
    scn: SceneArrays,
    org: jnp.ndarray,
    direction: jnp.ndarray,
    keys: jax.Array,
    cfg: TraceConfig,
) -> TraceResult:
    """Trace a megabatch of rays to completion. All lanes start in surface mode."""
    B = org.shape[0]
    f3 = lambda v: jnp.full((B, 3), v, org.dtype)  # noqa: E731

    state = _State(
        it=jnp.int32(0),
        org=org,
        dir=direction,
        thr=f3(1.0),
        rad=f3(0.0),
        bounce=jnp.zeros(B, jnp.int32),
        vbounce=jnp.zeros(B, jnp.int32),
        mode=jnp.full(B, MODE_SURFACE, jnp.int32),
        last_sph=jnp.full(B, -1, jnp.int32),
        aov_open=jnp.ones(B, bool),
        aov_alb=f3(0.0),
        aov_nrm=f3(0.0),
        aov_dep=jnp.full(B, jnp.inf, org.dtype),
        rays=jnp.float32(0.0),
    )

    def cond(s: _State):
        return (s.it < cfg.max_iters) & jnp.any(s.mode != MODE_DEAD)

    def body(s: _State) -> _State:
        # --- bounce-cap kills at loop entry (``tracer/mod.rs:323-325,352-354``)
        over_b = (s.mode == MODE_SURFACE) & (s.bounce > cfg.max_bounces)
        over_v = (s.mode == MODE_MARCH) & (s.vbounce > cfg.max_volume_bounces)
        mode = jnp.where(over_b | over_v, MODE_DEAD, s.mode)
        alive = mode != MODE_DEAD
        march = mode == MODE_MARCH

        # --- one intersection sweep for every lane -----------------------
        cmin = jnp.where(march, 0.0, cfg.clip_min).astype(s.org.dtype)
        cmax = jnp.where(march, cfg.volume_step, cfg.clip_max).astype(s.org.dtype)
        hit = nearest_hit(s.org, s.dir, cmin, cmax, scn,
                          march=march if cfg.has_volumes else None,
                          last_sphere=s.last_sph if cfg.has_volumes else None)

        miss = alive & ~hit.valid
        surf = alive & hit.valid & ((hit.face == FACE_FRONT) | (hit.face == FACE_BACK))
        vol = alive & hit.valid & (hit.face >= 2) & (hit.vol >= 0) if cfg.has_volumes else jnp.zeros(B, bool)

        u = iter_uniforms(keys, s.it, N_UNIFORMS)
        sh = shade_surface(s.dir, hit, scn, u, cfg.clip_min, cfg.clip_max)

        env_color, env_alb, env_nrm, env_dep = _env_terms(scn, s.dir, cfg.clip_max)

        # --- radiance & throughput ---------------------------------------
        rad = s.rad
        rad = rad + jnp.where(miss[:, None], s.thr * env_color, 0.0)
        rad = rad + jnp.where(surf[:, None], s.thr * sh.emitted, 0.0)

        thr = jnp.where((surf & sh.scatter)[:, None], s.thr * sh.weight, s.thr)

        # --- continuation ray & mode transitions -------------------------
        new_org = jnp.where(surf[:, None], hit.position, s.org)
        new_dir = jnp.where(surf[:, None], sh.direction, s.dir)
        surf_cont = surf & sh.scatter
        new_mode = jnp.where(alive, jnp.where(surf_cont, MODE_SURFACE, MODE_DEAD), MODE_DEAD)
        bounce = jnp.where(surf_cont, s.bounce + 1, s.bounce)
        vbounce = s.vbounce
        last_sph = s.last_sph

        claim_alb = jnp.where(surf[:, None], sh.aov_albedo, env_alb)
        claim_nrm = jnp.where(surf[:, None], sh.aov_normal, env_nrm)
        claim_dep = jnp.where(surf, sh.aov_depth, env_dep)
        claim = (surf | miss) & s.aov_open

        if cfg.has_volumes:
            vs = volume_shade(s.dir, hit, scn, u, cfg.volume_step)
            thr = jnp.where((vol & vs.scattered)[:, None], thr * vs.weight, thr)
            new_org = jnp.where(vol[:, None], vs.origin, new_org)
            new_dir = jnp.where(vol[:, None], vs.direction, new_dir)

            # VolumeBack exits to the surface integrator at bounce+1
            # (``tracer/mod.rs:503-513``); everything else keeps marching.
            vol_exit = vol & (hit.face == FACE_VOLUME_BACK)
            vol_march = vol & (hit.face != FACE_VOLUME_BACK)
            new_mode = jnp.where(vol_exit, MODE_SURFACE, new_mode)
            new_mode = jnp.where(vol_march, MODE_MARCH, new_mode)
            bounce = jnp.where(vol_exit, s.bounce + 1, bounce)
            vbounce = jnp.where(vol_march, jnp.where(march, s.vbounce + 1, 1), s.vbounce)
            last_sph = jnp.where(vol_march, hit.sphere_row, s.last_sph)

            vol_claim = vol & vs.scattered
            claim_alb = jnp.where(vol_claim[:, None], jnp.full_like(claim_alb, 0.8), claim_alb)
            claim_nrm = jnp.where(vol_claim[:, None], hit.normal, claim_nrm)
            claim_dep = jnp.where(vol_claim, hit.t, claim_dep)
            claim = claim | (vol_claim & s.aov_open)

        aov_alb = jnp.where(claim[:, None], claim_alb, s.aov_alb)
        aov_nrm = jnp.where(claim[:, None], claim_nrm, s.aov_nrm)
        aov_dep = jnp.where(claim, claim_dep, s.aov_dep)

        return _State(
            it=s.it + 1,
            org=new_org,
            dir=new_dir,
            thr=thr,
            rad=rad,
            bounce=bounce,
            vbounce=vbounce,
            mode=new_mode,
            last_sph=last_sph,
            aov_open=s.aov_open & ~claim,
            aov_alb=aov_alb,
            aov_nrm=aov_nrm,
            aov_dep=aov_dep,
            rays=s.rays + jnp.sum(alive).astype(jnp.float32),
        )

    final = jax.lax.while_loop(cond, body, state)
    return TraceResult(
        radiance=final.rad,
        aov_albedo=final.aov_alb,
        aov_normal=final.aov_nrm,
        aov_depth=final.aov_dep,
        rays=final.rays,
    )
