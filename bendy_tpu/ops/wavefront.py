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

Everything is structure-of-arrays: state is [B] scalars and V3-of-[B]
triples, the per-primitive sweep is statically unrolled, RNG is raw
counter-mode threefry — the whole body fuses into a handful of VPU
kernels with zero gathers (except density-grid reads in volume scenes).

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
from bendy_tpu.ops.materials import shade_surface
from bendy_tpu.ops.volume import volume_shade
from bendy_tpu.scene.compiler import MAT_EMISSIVE, MAT_FLAT, SceneArrays
from bendy_tpu.utils.rng import lane_uniforms
from bendy_tpu.utils.v3 import V3

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
    radiance: V3
    aov_albedo: V3
    aov_normal: V3
    aov_depth: jnp.ndarray  # [B] raw t (inf for background/emissive)
    rays: jnp.ndarray  # [] f32: total alive-lane iterations (traced rays)


class _State(NamedTuple):
    it: jnp.ndarray
    org: V3
    dir: V3
    thr: V3
    rad: V3
    bounce: jnp.ndarray
    vbounce: jnp.ndarray
    mode: jnp.ndarray
    last_sph: jnp.ndarray
    aov_open: jnp.ndarray
    aov_alb: V3
    aov_nrm: V3
    aov_dep: jnp.ndarray
    rays: jnp.ndarray


def _env_terms(scn: SceneArrays, dir: V3, clip_max: float):
    """Environment (root-material) shading on miss (``tracer/mod.rs:429-452``).

    All five material kinds collapse to a fixed color here because
    ``sample_root`` ignores the scatter ray: flat/emissive contribute their
    emitted color, the rest their albedo. AOVs keep the reference's quirks
    (flat env reports BLACK albedo; emissive env zero normal / inf depth).
    """
    mtype = scn.root_mtype
    albedo = V3(scn.root_albedo[0], scn.root_albedo[1], scn.root_albedo[2])
    emitted = V3(scn.root_emitted[0], scn.root_emitted[1], scn.root_emitted[2])
    is_const = (mtype == MAT_FLAT) | (mtype == MAT_EMISSIVE)
    B = dir.x.shape[0]
    color = V3.where(is_const, V3.zeros(B) + emitted, V3.zeros(B) + albedo)
    aov_albedo = V3.where(is_const, V3.zeros(B), V3.zeros(B) + albedo)
    is_em = mtype == MAT_EMISSIVE
    aov_normal = V3.where(is_em, V3.zeros(B), -dir)
    aov_depth = jnp.where(is_em, jnp.inf, clip_max) * jnp.ones(B)
    return color, aov_albedo, aov_normal, aov_depth


@partial(jax.jit, static_argnames=("cfg",))
def trace(
    scn: SceneArrays,
    org: V3,
    direction: V3,
    key: tuple,
    lane: jnp.ndarray,
    cfg: TraceConfig,
) -> TraceResult:
    """Trace a megabatch of rays to completion. All lanes start in surface mode."""
    B = org.x.shape[0]

    state = _State(
        it=jnp.uint32(0),
        org=org,
        dir=direction,
        thr=V3.zeros(B) + 1.0,
        rad=V3.zeros(B),
        bounce=jnp.zeros(B, jnp.int32),
        vbounce=jnp.zeros(B, jnp.int32),
        mode=jnp.full(B, MODE_SURFACE, jnp.int32),
        last_sph=jnp.full(B, -1, jnp.int32),
        aov_open=jnp.ones(B, bool),
        aov_alb=V3.zeros(B),
        aov_nrm=V3.zeros(B),
        aov_dep=jnp.full(B, jnp.inf, org.x.dtype),
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
        cmin = jnp.where(march, 0.0, cfg.clip_min).astype(s.org.x.dtype)
        cmax = jnp.where(march, cfg.volume_step, cfg.clip_max).astype(s.org.x.dtype)
        hit = nearest_hit(
            s.org, s.dir, cmin, cmax, scn,
            march=march if cfg.has_volumes else None,
            last_sphere=s.last_sph if cfg.has_volumes else None,
        )

        miss = alive & ~hit.valid
        surf = alive & hit.valid & ((hit.face == FACE_FRONT) | (hit.face == FACE_BACK))

        u = lane_uniforms(key, lane, s.it, N_UNIFORMS)
        sh = shade_surface(s.dir, hit, scn, u, cfg.clip_min, cfg.clip_max)
        env_color, env_alb, env_nrm, env_dep = _env_terms(scn, s.dir, cfg.clip_max)

        # --- radiance & throughput ---------------------------------------
        rad = s.rad + V3.where(miss, s.thr * env_color, V3.zeros(B))
        rad = rad + V3.where(surf, s.thr * sh.emitted, V3.zeros(B))
        thr = V3.where(surf & sh.scatter, s.thr * sh.weight, s.thr)

        # --- continuation ray & mode transitions -------------------------
        new_org = V3.where(surf, hit.position, s.org)
        new_dir = V3.where(surf, sh.direction, s.dir)
        surf_cont = surf & sh.scatter
        new_mode = jnp.where(alive & surf_cont, MODE_SURFACE, MODE_DEAD)
        bounce = jnp.where(surf_cont, s.bounce + 1, s.bounce)
        vbounce = s.vbounce
        last_sph = s.last_sph

        claim_alb = V3.where(surf, sh.aov_albedo, env_alb)
        claim_nrm = V3.where(surf, sh.aov_normal, env_nrm)
        claim_dep = jnp.where(surf, sh.aov_depth, env_dep)
        claim = (surf | miss) & s.aov_open

        if cfg.has_volumes:
            vol = alive & hit.valid & (hit.face >= 2) & (hit.vol_grid >= 0)
            vs = volume_shade(s.dir, hit, scn, u, cfg.volume_step)
            thr = V3.where(vol & vs.scattered, thr * vs.weight, thr)
            new_org = V3.where(vol, vs.origin, new_org)
            new_dir = V3.where(vol, vs.direction, new_dir)

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
            claim_alb = V3.where(vol_claim, V3.zeros(B) + 0.8, claim_alb)
            claim_nrm = V3.where(vol_claim, hit.normal, claim_nrm)
            claim_dep = jnp.where(vol_claim, hit.t, claim_dep)
            claim = claim | (vol_claim & s.aov_open)

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
            aov_alb=V3.where(claim, claim_alb, s.aov_alb),
            aov_nrm=V3.where(claim, claim_nrm, s.aov_nrm),
            aov_dep=jnp.where(claim, claim_dep, s.aov_dep),
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
