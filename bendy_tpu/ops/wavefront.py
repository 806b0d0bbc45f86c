"""Wavefront path-tracing integrator with ray regeneration.

The reference integrates by *recursion*: ``ChunkState::sample`` calls
itself per bounce (``src/tracer/mod.rs:322-342``) and interleaves with a
second recursion for volume marching (``sample_volumetric``,
``tracer/mod.rs:344-373``) — up to 8 surface levels × 32 volume levels of
call stack per ray.

On TPU this flattens into ONE ``lax.while_loop`` over a megabatch of
lanes. Each lane owns one (pixel, subpixel) and traces its ``spp``
samples *sequentially*: the moment a path terminates, the lane
immediately regenerates the camera ray for its next sample. Regeneration
is the utilization lever: a fixed wavefront runs until its worst
straggler (a glass caustic chain, or a photon-sphere orbiter in geodesic
mode — 500+ steps) while the average path needs only a handful, wasting
>90% of the VPU; with per-lane sample queues the loop length concentrates
at spp × E[path length] and utilization stays near 1.

Per-lane state machine:

    mode 0 = path terminated (regenerate or finish) ·
    1 = surface trace (clip [clip_min, clip_max]) ·
    2 = volume march (clip [0, volume_step], ``tracer/mod.rs:382-387``)

Estimator identity that makes the flattening exact
(``tracer/mod.rs:471-482``):

    recursive:  color = emitted + w · sample(scatter, bounce+1)
    iterative:  radiance += throughput · emitted;  throughput *= w

Geodesic mode (scene has ``mass:<rs>`` objects): surface propagation
becomes stepped — an adaptive RK4 step bends the ray, intersection runs
along the straight chord, far receding lanes switch to an exact straight
trace, horizon-crossing lanes are swallowed (see bendy_tpu.geodesic).

Everything is structure-of-arrays ([B] scalars, V3-of-[B]); the primitive
sweep is statically unrolled; RNG is counter-mode threefry keyed by the
global (pixel, sample) id — deterministic, chunking- and mesh-invariant.

AOV semantics match the reference's ColorData flow: per sample, the FIRST
claiming event (surface shade, env miss, or volume *scatter* — a volume
pass-through does not claim, ``volume.rs:54-59``) fixes albedo/normal/
depth; depth is normalized and clamped per sample before accumulation
(``tracer/mod.rs:306-308``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bendy_tpu.geodesic import (
    GeoParams,
    geo_step_begin,
    geo_step_begin_looped,
    rk4_step,
    rk4_step_looped,
)
from bendy_tpu.ops.camera import CameraParams, camera_ray, ndc_base
from bendy_tpu.ops.intersect import (
    FACE_BACK,
    FACE_FRONT,
    FACE_VOLUME_BACK,
    nearest_hit,
    nearest_hit_looped,
)
from bendy_tpu.ops.materials import shade_surface
from bendy_tpu.ops import volume as _volume
from bendy_tpu.ops.volume import volume_shade
from bendy_tpu.scene.compiler import MAT_EMISSIVE, MAT_FLAT, SceneArrays
from bendy_tpu.utils.rng import lane_uniforms
from bendy_tpu.utils.v3 import V3

_DEFAULT_GEO = GeoParams()

MODE_DEAD = 0
MODE_SURFACE = 1
MODE_MARCH = 2

N_UNIFORMS = 6  # see ops.materials / ops.volume uniform layouts

RAYS_COUNT = "alive"  # probe knob (tools/phase_probe.py --march-share):
#   "march" makes the per-lane rays counter count MODE_MARCH lanes
#   instead of alive lanes, so rays(march)/rays(alive) over two fresh
#   traces measures the march share of lane-iterations — the weight on
#   the marchspec phase bound. Read at trace time; production value
#   "alive" compiles the identical counter as always.


class TraceConfig(NamedTuple):
    """Static trace knobs (defaults = ``Config::DEFAULT``, ``tracer/mod.rs:29-38``)."""

    max_bounces: int = 8
    max_volume_bounces: int = 32
    clip_min: float = 0.01
    clip_max: float = 1000.0
    volume_step: float = 0.1
    has_volumes: bool = False  # static: volume branch compiled only when needed
    vol_nearest: bool = False  # static: SamplingMode::Nearest density lookups
    #   (``volume.rs:146-150``); default Trilinear like the reference tracer
    geodesic: bool = False  # static: curved-ray propagation (scene has masses)
    frustum_poly: bool = False  # static: FOV bounds the frustum angles
    #   under ~1.2 rad -> range-free polynomial sin/cos in camera_ray
    geo: "GeoParams" = None  # type: ignore[assignment]
    # Static scene specialization (Renderer derives these from the compiled
    # scene + camera). Branches whose material kinds are absent from the
    # scene are dead code for every lane, so dropping them cannot change the
    # image — it only removes per-iteration VPU work. Measured: the diffuse
    # next-event machinery (light sweep + light pdf) dominates the shade
    # block, so no-diffuse scenes (the lensed showcase) gain the most.
    has_diffuse: bool = True  # any Diffuse material on a primitive
    has_metallic: bool = True  # any Metallic material on a primitive
    has_glass: bool = True  # any Glass material on a primitive (the ior
    #   carry, fresnel/refract math and the reflect-probability branch
    #   exist only for it)
    has_dof: bool = True  # camera has a focus distance (thin-lens defocus)
    regen_every: int = 1  # static regen cadence: k = the finalize+camera
    #   block compiles into every k-th iteration only (dead lanes wait at
    #   most k-1 iterations; alive lanes are unaffected). Swept under
    #   tile-major lane ordering: k=2 wins on flat and volume scenes
    #   (cornell +10%, cornell2 +13%, scene +11%; k=4 loses — deaths are
    #   frequent so idle iterations overtake the saved camera math), k=8
    #   wins on geodesic scenes (rare deaths over 100s-iteration paths:
    #   blackhole +12%, disk showcase +8%; k=16 over-delays). Must divide
    #   pending_check.
    pending_check: int = 8  # termination test cadence: the all-lanes-done
    #   reduction runs every N iterations (iterating an all-dead state is a
    #   masked no-op, so overshooting by up to N-1 iterations is exact; the
    #   cross-lane reduction was ~2 transposes + log2(B) adds per iteration)
    want_aovs: bool = True  # static: False drops the whole AOV pipeline from
    #   the loop carry (13 [B] arrays + claim logic) for FULL-only renders
    looped_sweep: bool = False  # static: sweep primitives with a
    #   lax.fori_loop over stacked rows (compile time O(1) in primitive
    #   count) instead of the static unroll (whose XLA compile grows
    #   superlinearly — docs/prim_scaling.json). The renderer derives it
    #   for scenes above render.LOOP_SWEEP_THRESHOLD primitives. In the
    #   megakernel the row tables arrive as SMEM operands (prim_tables)
    #   read with scalar loads; under plain XLA they stack from the
    #   traced scene leaves.
    looped_lights: bool = False  # static: sweep LIGHTS with fori_loops
    #   (sample_light_point_looped / light_pdf_looped) instead of the
    #   per-light unroll. Decoupled from looped_sweep (r4): lights have
    #   their own compile wall (hundreds of LIGHT objects), but a LARGE
    #   scene with FEW lights should keep the unrolled light sweeps —
    #   they fold axis-aligned face terms at trace time under the baked
    #   megakernel scene (~44 -> ~17 ops per rect face), which the
    #   row-table loads cannot. The renderer derives it from the light
    #   count alone (render.LIGHT_LOOP_THRESHOLD); bit-identical either
    #   way (tests/test_looped_sweep.py::test_looped_lights_bit_identical).
    looped_masses: bool = False  # static: sweep geodesic MASSES with
    #   fori_loops (geo_step_begin_looped + rk4_step_looped over a
    #   [M_pad, 5] mass table) instead of the per-mass unroll — the
    #   cluster-lensing scale path (tens-to-hundreds of masses compile
    #   flat). The unrolled path's frozen-h² list would be M loop-carried
    #   [B] arrays here, so the looped step recomputes h² per RK4 stage
    #   (same ODE, O(ds⁵) local error either way; physics gates re-run
    #   on this path — tests/test_looped_masses.py). The renderer
    #   derives it from the mass count (render.MASS_LOOP_THRESHOLD);
    #   the megakernel ships the table as an SMEM operand like the
    #   primitive tables.
    march_every: int = 0  # static EVENT-CLASS iteration cadence (0/1 =
    #   off): at m >= 2 the loop interleaves ONE shade iteration with
    #   m-1 march iterations, splitting the body by the EVENT a lane's
    #   sweep produced rather than by lane mode:
    #     march iteration — compiled without the regen/camera block, the
    #       surface-shade block (incl. the diffuse next-event machinery
    #       and its second pcg4d draw) and the surface bounce cap;
    #       advances lanes whose event is a VOLUME event (march step OR
    #       first entry) or a miss; lanes that hit a plain surface
    #       freeze.
    #     shade iteration — the full body with the volume block
    #       compile-time ABSENT (no volume_shade, no density lookup/MXU
    #       fetch): lanes with volume events freeze; everything else
    #       (shade, miss, regen) advances.
    #   BIT-IDENTICAL to march_every=0 (gated:
    #   tests/test_march_cadence.py): a frozen lane's path_step does not
    #   advance, so on resume it redraws the SAME uniforms and
    #   recomputes the SAME hit the unsplit schedule would have used.
    #   Requires has_volumes, no geodesic, regen_every=1, and
    #   march_every | pending_check. Win condition (tools/phase_probe.py
    #   --march-share + the marchspec/volume phase fractions): the
    #   volume share of events weighted by what each specialized body
    #   drops — on cloud the volume block is ~58% of the iteration wall
    #   and volume events are ~72% of advances, so the ideal split runs
    #   at ~0.76x the unsplit wall.
    block_cull: bool = False  # static: with looped_sweep in the MEGAKERNEL,
    #   ship per-fori-block bounding spheres (intersect.block_bounds) and
    #   skip whole primitive blocks no (alive) lane's feasible segment can
    #   reach — bit-identical by construction (conservative test; gated by
    #   tests/test_block_cull.py). Only the Pallas path acts on it: under
    #   plain XLA the any-reduce spans the whole megabatch. DEFAULT OFF:
    #   measured a 17-28% NET LOSS on v5e across flat (258/512-prim) and
    #   march-dominated (256-puff cloud_field) scenes — the while-as-cond
    #   boundary is ~free (3%) but the per-block feasibility test + cross-
    #   lane any-reduce costs ~68% of the 8-prim body it guards, while
    #   only 17-28% of block work is skippable (every coherent lane block
    #   contains some surface-mode lane whose clip_max segment reaches
    #   nearly every block). Full decomposition: docs/looped_hw.json,
    #   tools/looped_hw_check.py --cull-ab.

    def max_iters(self, spp: int) -> int:
        """Loop-length safety cap: per-path worst case × samples."""
        per_path = self.max_bounces + 2
        if self.has_volumes:
            per_path = (self.max_bounces + 2) * (self.max_volume_bounces + 2)
        if self.geodesic:
            per_path += (self.geo or _DEFAULT_GEO).max_steps
        # regen_every=k delays each regeneration by up to k-1 iterations:
        # a lane can idle k-1 no-regen iterations per path, so the worst
        # case gains spp*(k-1) extra iterations (without this, a
        # hand-built config whose paths all hit the bounce cap could hit
        # the cap and silently drop tail samples)
        cap = per_path * spp + spp * (self.regen_every - 1)
        if self.march_every > 1:
            # every surface event (and the regen) can wait up to m-1
            # march-only iterations; an all-surface path advances only on
            # the 1-in-m full iterations
            cap *= self.march_every
        return cap


class TraceSums(NamedTuple):
    """Per-lane accumulations over all spp samples."""

    radiance: V3
    aov_albedo: V3
    aov_normal: V3
    aov_depth: jnp.ndarray  # [B] normalized+clamped depth sum
    rays: jnp.ndarray  # [] f32: total alive-lane iterations (traced rays)
    # (inside the loop this is a [B] per-lane counter — one masked add per
    #  iteration instead of a cross-lane reduction; summed once at the end)
    iters: jnp.ndarray = None  # [] f32: loop iterations executed (per block
    #   in the megakernel, whole batch under XLA). The VPU issues work for
    #   EVERY lane every iteration, so iters × lanes is the issued-slot
    #   count tools/perf_report.py turns into a utilization figure;
    #   rays/(iters·lanes) is the live-lane occupancy.


class _State(NamedTuple):
    it: jnp.ndarray
    n_pending: jnp.ndarray  # [] scalar count of lanes with work left
    #   (carried so the while cond reads a scalar — a vector reduction in
    #   the cond trips Mosaic layout inference)
    sample: jnp.ndarray  # [B] current sample index (starts at -1)
    path_step: jnp.ndarray  # [B] iteration count within the current path
    path_open: jnp.ndarray  # [B] current path not yet folded into the accumulators
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
    geo_steps: jnp.ndarray
    fresh: jnp.ndarray  # first segment after a bounce: clip_min applies
    u_base: jnp.ndarray  # [B] jitter-free NDC, computed once (passthrough
    v_base: jnp.ndarray  #   carries: int div/mod + converts leave the loop)
    # per-lane accumulators over completed samples
    acc_rad: V3
    acc_alb: V3
    acc_nrm: V3
    acc_dep: jnp.ndarray
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
    B = dir.x.shape
    color = V3.where(is_const, V3.zeros(B) + emitted, V3.zeros(B) + albedo)
    aov_albedo = V3.where(is_const, V3.zeros(B), V3.zeros(B) + albedo)
    is_em = mtype == MAT_EMISSIVE
    aov_normal = V3.where(is_em, V3.zeros(B), -dir)
    aov_depth = jnp.where(is_em, jnp.inf, clip_max) * jnp.ones(B)
    return color, aov_albedo, aov_normal, aov_depth


def trace_core(
    scn: SceneArrays,
    cam: CameraParams,
    key: tuple,
    pix: jnp.ndarray,  # [B] u32 global pixel index (y*W + x)
    sub: jnp.ndarray,  # [B] u32 subpixel index (j*n + i)
    width: int,
    height: int,
    spp: int,
    subsample: int,
    cfg: TraceConfig,
    spp_total: int | None = None,
    sample0=0,
    active=None,
    vol_grid_t=None,
    prim_tables=None,
) -> TraceSums:
    """Trace spp samples for every (pixel, subpixel) lane; return sums.

    ``spp_total``/``sample0`` let a sample-sharded mesh assign each device
    the slice [sample0, sample0+spp) of a global spp_total while keeping
    globally unique RNG stream ids.

    ``active`` ([B] mask, optional) marks real lanes; padding lanes (the
    megakernel rounds B up to its block size) start with their sample
    budget exhausted — they never trace, never count rays, and return
    zeros. Applied only to the carry *init* (an in-loop capture of a
    loop-invariant vector would trip Mosaic layout inference).

    ``vol_grid_t`` (megakernel only): the density-grid stack as a traced
    kernel operand, packed into a brick table (ops.volume.pack_vol_operand)
    — dense grids too big for the baked scalar unroll (see
    ops.volume._density_operand).

    ``prim_tables`` (megakernel only, with ``cfg.looped_sweep``): the
    stacked primitive-row matrices as SMEM refs — the looped sweep reads
    them with scalar loads instead of stacking from the baked scene (a
    traced row id cannot index numpy constants). The XLA path leaves this
    None and stacks from the scene leaves.
    """
    if cfg.regen_every < 1 or cfg.pending_check % cfg.regen_every:
        raise ValueError(
            f"regen_every={cfg.regen_every} must be >= 1 and divide "
            f"pending_check={cfg.pending_check} (the cadence is a static "
            "unroll of one regen + k-1 no-regen iterations)"
        )
    if cfg.march_every > 1:
        if not cfg.has_volumes or cfg.geodesic:
            raise ValueError(
                "march_every needs has_volumes and no geodesic (march-"
                "specialized iterations advance MODE_MARCH lanes only)"
            )
        if cfg.regen_every != 1 or cfg.pending_check % cfg.march_every:
            raise ValueError(
                f"march_every={cfg.march_every} requires regen_every=1 "
                f"(full iterations regen) and must divide "
                f"pending_check={cfg.pending_check}"
            )
    B = pix.shape
    n = max(subsample, 1)
    nn = n * n
    geo = cfg.geo or _DEFAULT_GEO
    # hoist the looped-sweep tables out of the loop body: built once here
    # from the traced scene leaves (the megakernel passes SMEM refs in
    # instead — never both)
    tables_are_refs = prim_tables is not None
    if prim_tables is None and (
        cfg.looped_sweep or cfg.looped_lights or cfg.looped_masses
    ):
        from bendy_tpu.ops.intersect import prim_tables as _prim_tables

        kinds = (
            (("sph", "rct", "box") if cfg.looped_sweep else ())
            + (("light",) if cfg.looped_lights else ())
            + (("mass",) if cfg.looped_masses else ())
        )
        prim_tables = _prim_tables(scn, jnp, kinds=kinds)
    if spp_total is None:
        spp_total = spp
    # Stream ids are u32: id = (pix*spp_total + s)*nn + sub, so the id
    # space is width*height*spp_total*nn. Overflow would silently alias
    # RNG streams across the image (correlated noise, no error) — refuse
    # at trace time instead. 1080p x 256spp x 2x2 subpixels fits (2.1e9);
    # 4K x 256 x 2x2 does not — lower spp per pass and accumulate.
    id_space = width * height * spp_total * nn
    if id_space > 0xFFFFFFFF:
        raise ValueError(
            f"RNG stream-id space {width}x{height}x{spp_total}spp x{nn}sub "
            f"= {id_space} exceeds u32 ({0xFFFFFFFF}); ids would alias and "
            "silently correlate samples across pixels. Render in multiple "
            "passes with lower spp_total (progressive film accumulation "
            "re-keys each pass) or drop --subsample."
        )
    sample0 = jnp.asarray(sample0, jnp.uint32)

    def lane_coords():
        # per-lane coordinates. Casts go u32->i32->f32: Mosaic has no
        # u32->f32, and the values are < 2^31. Recomputed inside the loop
        # body (7 ops) — loop-invariant vector captures trip Mosaic layout
        # inference ("replicated in destination but not in source").
        pix_i = pix.astype(jnp.int32)
        sub_i = sub.astype(jnp.int32)
        px = (pix_i % width).astype(jnp.float32)
        py = (pix_i // width).astype(jnp.float32)
        si = (sub_i % n).astype(jnp.float32)
        sj = (sub_i // n).astype(jnp.float32)
        return px, py, si, sj

    def sample_id(sample):
        """Global RNG stream id for (pixel, sample, subpixel)."""
        s_glob = sample0 + sample.astype(jnp.uint32)
        return (pix * jnp.uint32(spp_total) + s_glob) * jnp.uint32(nn) + sub

    # Carry inits are seeded with a lane-varying zero: Mosaic infers while
    # carry layouts from the init values, and pure broadcast constants get
    # a replicated layout the loop body then cannot store varying data
    # into ("Invalid relayout ... replicated in destination").
    # [B] zeros with a genuinely varying layout: pix < 2^31, so the shift
    # yields 0, but unlike x^x or x*0 no compiler pass can fold it away
    zi = (pix >> jnp.uint32(31)).astype(jnp.int32)
    zf = zi.astype(jnp.float32)
    zv = V3(zf, zf, zf)
    za = zf if cfg.want_aovs else jnp.float32(0.0)
    zav = zv if cfg.want_aovs else V3.zeros(())
    if active is None:
        sample_init = zi - 1
    else:
        # inactive lanes start at sample spp-1: `sample + 1 < spp` is
        # False, so they never regenerate, stay MODE_DEAD, and add nothing
        # to the accumulators or the ray count
        sample_init = zi - 1 + (1 - active.astype(jnp.int32)) * spp
    px0, py0, si0, sj0 = lane_coords()
    ub0, vb0 = ndc_base(width, height, n, px0, py0, si0, sj0)
    state = _State(
        it=jnp.uint32(0),
        n_pending=jnp.int32(1),
        sample=sample_init,
        path_step=zi,
        path_open=zi,  # int32 mask: Mosaic can't carry i1
        org=zv,
        dir=zv + V3.of(0.0, 0.0, -1.0),
        thr=zv,
        rad=zv,
        bounce=zi,
        # statically-dead carries collapse to traced scalars: a while-loop
        # carry is live across the entire body (VMEM/vreg residency every
        # iteration), so a mode that never reads one should not pay for it
        vbounce=zi if cfg.has_volumes else jnp.int32(0),
        mode=zi + MODE_DEAD,
        last_sph=(zi - 1) if cfg.has_volumes else jnp.int32(-1),
        aov_open=(zi if cfg.want_aovs else jnp.int32(0)),
        aov_alb=zav,
        aov_nrm=zav,
        aov_dep=za + jnp.inf,
        geo_steps=zi if cfg.geodesic else jnp.int32(0),
        fresh=(zi + 1) if cfg.geodesic else jnp.int32(1),
        u_base=ub0,
        v_base=vb0,
        acc_rad=zv,
        acc_alb=zav,
        acc_nrm=zav,
        acc_dep=za,
        rays=zf,
    )

    def cond(s: _State):
        return (s.it < cfg.max_iters(spp)) & (s.n_pending > 0)

    def body(s: _State, do_regen: bool = True, freeze_vol: bool = False) -> _State:
        # === finalize dead paths, regenerate camera rays ===================
        # ``do_regen`` is STATIC: on a no-regen iteration (regen_every > 1)
        # the whole finalize+camera block is compile-time absent — dead
        # lanes keep waiting (their paths fold on the next regen iteration
        # or in the post-loop fold), alive lanes trace as usual. The
        # bounce-cap section below still runs (caps kill at path entry).
        if not do_regen:
            acc_rad, acc_alb, acc_nrm, acc_dep = (
                s.acc_rad, s.acc_alb, s.acc_nrm, s.acc_dep
            )
            path_open, path_step, sample = s.path_open, s.path_step, s.sample
            sid = sample_id(jnp.maximum(sample, 0))
            org, dirv, thr, rad = s.org, s.dir, s.thr, s.rad
            bounce, vbounce, mode = s.bounce, s.vbounce, s.mode
            aov_open, aov_alb, aov_nrm, aov_dep = (
                s.aov_open, s.aov_alb, s.aov_nrm, s.aov_dep
            )
            geo_steps, fresh = s.geo_steps, s.fresh
            return _body_trace(
                s, acc_rad, acc_alb, acc_nrm, acc_dep, path_open, path_step,
                sample, sid, org, dirv, thr, rad, bounce, vbounce, mode,
                aov_open, aov_alb, aov_nrm, aov_dep, geo_steps, fresh,
                freeze_vol=freeze_vol,
            )
        dead = s.mode == MODE_DEAD
        fin = dead & (s.path_open != 0)
        acc_rad = s.acc_rad + V3.where(fin, s.rad, zv)
        if cfg.want_aovs:
            # normalized+clamped per-sample depth (``tracer/mod.rs:306-308``)
            dep_n = jnp.clip(
                (s.aov_dep - cfg.clip_min) / (cfg.clip_max - cfg.clip_min), 0.0, 1.0
            )
            acc_alb = s.acc_alb + V3.where(fin, s.aov_alb, zv)
            acc_nrm = s.acc_nrm + V3.where(fin, s.aov_nrm, zv)
            acc_dep = s.acc_dep + jnp.where(fin, dep_n, 0.0)
        else:
            acc_alb, acc_nrm, acc_dep = s.acc_alb, s.acc_nrm, s.acc_dep

        regen = dead & (s.sample + 1 < spp)
        regen_i = regen.astype(jnp.int32)
        keep_i = 1 - regen_i
        path_open = jnp.maximum(regen_i, s.path_open * (1 - fin.astype(jnp.int32)))
        path_step = s.path_step * keep_i
        sample = s.sample + regen_i
        sid = sample_id(jnp.maximum(sample, 0))
        cam_org, cam_dir = camera_ray(
            cam, width, height, n, key, sid, None, None, None, None,
            poly_trig=cfg.frustum_poly, has_dof=cfg.has_dof,
            uv_base=(s.u_base, s.v_base),
        )
        org = V3.where(regen, cam_org, s.org)
        dirv = V3.where(regen, cam_dir, s.dir)
        thr = V3.where(regen, zv + 1.0, s.thr)
        rad = V3.where(regen, zv, s.rad)
        bounce = s.bounce * keep_i
        vbounce = s.vbounce * keep_i if cfg.has_volumes else s.vbounce
        mode = s.mode * keep_i + MODE_SURFACE * regen_i
        if cfg.want_aovs:
            aov_open = jnp.maximum(regen_i, s.aov_open)
            aov_alb = V3.where(regen, zav, s.aov_alb)
            aov_nrm = V3.where(regen, zav, s.aov_nrm)
            aov_dep = jnp.where(regen, jnp.inf, s.aov_dep)
        else:
            aov_open, aov_alb, aov_nrm, aov_dep = (
                s.aov_open, s.aov_alb, s.aov_nrm, s.aov_dep
            )
        geo_steps = s.geo_steps * keep_i if cfg.geodesic else s.geo_steps
        fresh = jnp.maximum(regen_i, s.fresh) if cfg.geodesic else s.fresh
        return _body_trace(
            s, acc_rad, acc_alb, acc_nrm, acc_dep, path_open, path_step,
            sample, sid, org, dirv, thr, rad, bounce, vbounce, mode,
            aov_open, aov_alb, aov_nrm, aov_dep, geo_steps, fresh,
            freeze_vol=freeze_vol,
        )

    def _body_trace(s, acc_rad, acc_alb, acc_nrm, acc_dep, path_open,
                    path_step, sample, sid, org, dirv, thr, rad, bounce,
                    vbounce, mode, aov_open, aov_alb, aov_nrm, aov_dep,
                    geo_steps, fresh, freeze_vol=False) -> _State:
        # === bounce-cap kills at path entry (``tracer/mod.rs:323-325,352-354``)
        over_b = (mode == MODE_SURFACE) & (bounce > cfg.max_bounces)
        if cfg.has_volumes:
            over_v = (mode == MODE_MARCH) & (vbounce > cfg.max_volume_bounces)
            over_b = over_b | over_v
        mode = mode * (1 - over_b.astype(jnp.int32))

        if cfg.geodesic:
            # horizon capture / step-budget exhaustion swallow the path.
            # geo_step_begin fuses the capture/far tests, the adaptive step
            # and the conserved per-mass h² into one mass sweep. Capture
            # applies to EVERY alive lane — volume-marching lanes included
            # (a medium enclosing the mass must not let straight march
            # segments tunnel through the horizon); the step budget only
            # binds surface-mode lanes (geo_steps does not advance during
            # a march).
            surf_mode = mode == MODE_SURFACE
            if cfg.looped_masses:
                mass_tab = prim_tables["mass"]
                captured, far_field, ds = geo_step_begin_looped(
                    scn, org, dirv, geo, table=mass_tab, steps=geo_steps,
                    table_is_ref=tables_are_refs,
                )
                h2s = None
            else:
                captured, far_field, ds, h2s = geo_step_begin(
                    scn, org, dirv, geo, steps=geo_steps
                )
            swallowed = captured | (surf_mode & (geo_steps > geo.max_steps))
            mode = mode * (1 - ((mode != MODE_DEAD) & swallowed).astype(jnp.int32))

        alive = mode != MODE_DEAD
        march = mode == MODE_MARCH

        # === propagation segment + one intersection sweep ==================
        if cfg.geodesic:
            if cfg.looped_masses:
                x_next, d_next = rk4_step_looped(
                    scn, org, dirv, ds, table=mass_tab,
                    table_is_ref=tables_are_refs,
                )
            else:
                x_next, d_next = rk4_step(scn, org, dirv, ds, h2s=h2s)
            chord = x_next - org
            chord_len = chord.length()
            seg_dir = chord * (1.0 / jnp.maximum(chord_len, 1e-20))
            near = (mode == MODE_SURFACE) & ~far_field
            trace_dir = V3.where(near, seg_dir, dirv)
            # without volumes, march is statically never true: the clip
            # selects against it fold away (mode provably stays in {0,1})
            if cfg.has_volumes:
                cmin = jnp.where(march, 0.0, jnp.where(fresh, cfg.clip_min, 0.0))
                cmax = jnp.where(march, cfg.volume_step,
                                 jnp.where(near, chord_len, cfg.clip_max))
            else:
                cmin = jnp.where(fresh, cfg.clip_min, 0.0)
                cmax = jnp.where(near, chord_len, cfg.clip_max)
        else:
            trace_dir = dirv
            if cfg.has_volumes:
                cmin = jnp.where(march, 0.0, cfg.clip_min) * jnp.ones(B)
                cmax = jnp.where(march, cfg.volume_step, cfg.clip_max) * jnp.ones(B)
            else:
                # plain Python floats: vector-vs-scalar compares downstream
                cmin = cfg.clip_min
                cmax = cfg.clip_max

        hit_kw = (
            {
                "tables": prim_tables,
                "tables_are_refs": tables_are_refs,
                # block culling (active only when the tables carry
                # block_bounds entries — the megakernel ships them when
                # cfg.block_cull): dead lanes don't vote in the
                # feasibility reduce, and cull_slack absorbs the box
                # parallel-slab drift (a freely-passing slab's hit can
                # sit t*1e-5 outside the true box)
                "cull_mask": alive,
                "cull_slack": cfg.clip_max * 1e-5,
            }
            if cfg.looped_sweep
            else {}
        )
        hit_fn = nearest_hit_looped if cfg.looped_sweep else nearest_hit
        hit = hit_fn(
            org, trace_dir, cmin, cmax, scn,
            march=march if cfg.has_volumes else None,
            last_sphere=s.last_sph if cfg.has_volumes else None,
            carry_rough=cfg.has_metallic or cfg.has_glass,
            carry_ior=cfg.has_glass,
            carry_volumes=cfg.has_volumes,
            **hit_kw,
        )

        # dense-grid operand scenes: ISSUE the MXU corner fetch now, apply
        # deferred into volume_shade below — the shade block between them
        # has no data dependence on the fetch, so in-order issue hides its
        # VPU time under the ~2.5 us dot (ops/volume.VOL_FETCH_OVERLAP;
        # bit-identical to the inline fetch — same ops, moved apply)
        vol_pending = None
        if (cfg.has_volumes and not freeze_vol and vol_grid_t is not None
                and _volume.VOL_FETCH_OVERLAP):
            vol_pending = _volume.density_fetch_begin(
                scn, hit, nearest=cfg.vol_nearest, grid_t=vol_grid_t
            )

        miss = alive & ~hit.valid
        if cfg.geodesic:
            geo_cont = miss & near  # no hit inside the chord: keep bending
            miss = miss & ~near  # environment only in flat space
        surf = alive & hit.valid & ((hit.face == FACE_FRONT) | (hit.face == FACE_BACK))

        # the diffuse branch draws 6 uniforms (slots 4,5 = light point);
        # without it slots 0-3 suffice — one pcg4d call instead of two,
        # and the shared slots keep their values (same first hash block)
        n_u = N_UNIFORMS if cfg.has_diffuse else 4
        u = lane_uniforms(key, sid, path_step, n_u)
        sh = shade_surface(
            trace_dir, hit, scn, u, cfg.clip_min, cfg.clip_max,
            has_diffuse=cfg.has_diffuse, has_metallic=cfg.has_metallic,
            has_glass=cfg.has_glass,
            looped_lights=cfg.looped_lights,
            light_table=None if prim_tables is None else prim_tables.get("light"),
            light_table_is_ref=tables_are_refs,
        )
        env_color, env_alb, env_nrm, env_dep = _env_terms(scn, trace_dir, cfg.clip_max)

        # === radiance & throughput =========================================
        rad = rad + V3.where(miss, thr * env_color, zv)
        rad = rad + V3.where(surf, thr * sh.emitted, zv)
        thr = V3.where(surf & sh.scatter, thr * sh.weight, thr)

        # === continuation ray & mode transitions ===========================
        new_org = V3.where(surf, hit.position, org)
        new_dir = V3.where(surf, sh.direction, dirv)
        surf_cont = surf & sh.scatter
        new_mode = MODE_SURFACE * (alive & surf_cont).astype(jnp.int32)
        bounce = bounce + surf_cont.astype(jnp.int32)
        last_sph = s.last_sph
        if cfg.geodesic:
            fresh = jnp.maximum(fresh, surf.astype(jnp.int32))
        if cfg.geodesic:
            new_org = V3.where(geo_cont, x_next, new_org)
            new_dir = V3.where(geo_cont, d_next, new_dir)
            new_mode = jnp.maximum(new_mode, MODE_SURFACE * geo_cont.astype(jnp.int32))
            geo_steps = geo_steps + near.astype(jnp.int32)
            fresh = fresh * (1 - geo_cont.astype(jnp.int32))

        if cfg.want_aovs:
            claim_alb = V3.where(surf, sh.aov_albedo, env_alb)
            claim_nrm = V3.where(surf, sh.aov_normal, env_nrm)
            claim_dep = jnp.where(surf, sh.aov_depth, env_dep)
            claim = (surf | miss) & (aov_open != 0)

        vol_i = None
        if cfg.has_volumes and freeze_vol:
            # shade iteration of the march_every cadence: volume events
            # FREEZE (state untouched, path_step/rays held) and the whole
            # volume block — volume_shade and its density lookup/MXU
            # fetch — is compile-time absent; the next march iteration
            # recomputes the identical sweep and applies it
            vol = alive & hit.valid & (hit.face >= 2) & (hit.vol_grid >= 0)
            vol_i = vol.astype(jnp.int32)
            new_mode = new_mode + mode * vol_i
        elif cfg.has_volumes:
            vol = alive & hit.valid & (hit.face >= 2) & (hit.vol_grid >= 0)
            # (a lax.cond skipping the dense-grid lookup for blocks with no
            # volume-event lanes was tried and reverted: Mosaic cannot
            # legalize scf.if with vector results)
            vs = volume_shade(trace_dir, hit, scn, u, cfg.volume_step,
                              nearest=cfg.vol_nearest, grid_t=vol_grid_t,
                              pending=vol_pending)
            thr = V3.where(vol & vs.scattered, thr * vs.weight, thr)
            new_org = V3.where(vol, vs.origin, new_org)
            new_dir = V3.where(vol, vs.direction, new_dir)

            # VolumeBack exits to the surface integrator at bounce+1
            # (``tracer/mod.rs:503-513``); everything else keeps marching.
            vol_exit = vol & (hit.face == FACE_VOLUME_BACK)
            vol_march = vol & (hit.face != FACE_VOLUME_BACK)
            vol_exit_i = vol_exit.astype(jnp.int32)
            vol_march_i = vol_march.astype(jnp.int32)
            new_mode = (
                new_mode * (1 - vol_exit_i - vol_march_i)
                + MODE_SURFACE * vol_exit_i
                + MODE_MARCH * vol_march_i
            )
            bounce = bounce + vol_exit_i
            vbounce = (
                vbounce * (1 - vol_march_i)
                + (jnp.where(march, vbounce + 1, 1)) * vol_march_i
            )
            last_sph = (
                last_sph * (1 - vol_march_i) + hit.sphere_row * vol_march_i
            )
            if cfg.geodesic:  # fresh is a geodesic-chord concept only
                fresh = jnp.maximum(fresh, vol.astype(jnp.int32))

            if cfg.want_aovs:
                vol_claim = vol & vs.scattered
                claim_alb = V3.where(vol_claim, zv + 0.8, claim_alb)
                claim_nrm = V3.where(vol_claim, hit.normal, claim_nrm)
                claim_dep = jnp.where(vol_claim, hit.t, claim_dep)
                claim = claim | (vol_claim & (aov_open != 0))

        return _State(
            it=s.it + 1,
            n_pending=s.n_pending,  # refreshed every pending_check iters (outer)
            sample=sample,
            path_step=path_step + (1 if vol_i is None else 1 - vol_i),
            path_open=path_open,
            org=new_org,
            dir=new_dir,
            thr=thr,
            rad=rad,
            bounce=bounce,
            vbounce=vbounce,
            mode=new_mode,
            last_sph=last_sph,
            aov_open=aov_open * (1 - claim.astype(jnp.int32)) if cfg.want_aovs else aov_open,
            aov_alb=V3.where(claim, claim_alb, aov_alb) if cfg.want_aovs else aov_alb,
            aov_nrm=V3.where(claim, claim_nrm, aov_nrm) if cfg.want_aovs else aov_nrm,
            aov_dep=jnp.where(claim, claim_dep, aov_dep) if cfg.want_aovs else aov_dep,
            geo_steps=geo_steps,
            fresh=fresh,
            u_base=s.u_base,
            v_base=s.v_base,
            acc_rad=acc_rad,
            acc_alb=acc_alb,
            acc_nrm=acc_nrm,
            acc_dep=acc_dep,
            rays=s.rays + (
                march if RAYS_COUNT == "march"
                else (alive & ~vol if vol_i is not None else alive)
            ).astype(jnp.float32),
        )

    def body_march(s: _State) -> _State:
        """March iteration of the event-class cadence (``march_every`` > 1).

        Advances any alive lane whose event is a VOLUME event (march
        step or first entry through a volume face) or a MISS; a lane
        that hits a plain surface freezes and is shaded by the next
        shade iteration, which recomputes the identical sweep (same
        org/dir/clip/path_step) and draws the same uniforms. Compile-
        time absent vs the full body: the regen/camera block,
        shade_surface (incl. the diffuse next-event machinery and its
        second pcg4d block: volume consumes u[0..3], which a 4-slot
        draw reproduces bit-exactly), and the surf AOV claim — so the
        schedule stays bit-identical to march_every=0; only the
        iteration count changes. Both bounce caps stay: lanes of either
        mode can advance (and die) here.
        """
        march0 = s.mode == MODE_MARCH
        # BOTH bounce-cap kills at path entry (same path point as the
        # full body's over_b/over_v: surface lanes can advance here via
        # miss/volume-entry events, so an over-cap surface lane must die
        # before contributing env radiance; the dead lane folds on the
        # next regen)
        over_v = march0 & (s.vbounce > cfg.max_volume_bounces)
        over_s = (s.mode == MODE_SURFACE) & (s.bounce > cfg.max_bounces)
        mode = s.mode * (1 - (over_v | over_s).astype(jnp.int32))
        march = mode == MODE_MARCH
        alive = mode != MODE_DEAD

        hit_kw = (
            {
                "tables": prim_tables,
                "tables_are_refs": tables_are_refs,
                "cull_mask": alive,
                "cull_slack": cfg.clip_max * 1e-5,
            }
            if cfg.looped_sweep
            else {}
        )
        hit_fn = nearest_hit_looped if cfg.looped_sweep else nearest_hit
        # the full body's per-lane clips (march vs surface), so surface
        # lanes' entry/miss events are found exactly as unsplit
        cmin = jnp.where(march, 0.0, cfg.clip_min) * jnp.ones(B)
        cmax = jnp.where(march, cfg.volume_step, cfg.clip_max) * jnp.ones(B)
        hit = hit_fn(
            s.org, s.dir, cmin, cmax, scn,
            march=march, last_sphere=s.last_sph,
            carry_rough=cfg.has_metallic or cfg.has_glass,
            carry_ior=cfg.has_glass,
            carry_volumes=True,
            **hit_kw,
        )
        vol_pending = None
        if vol_grid_t is not None and _volume.VOL_FETCH_OVERLAP:
            vol_pending = _volume.density_fetch_begin(
                scn, hit, nearest=cfg.vol_nearest, grid_t=vol_grid_t
            )

        miss = alive & ~hit.valid
        vol = alive & hit.valid & (hit.face >= 2) & (hit.vol_grid >= 0)
        # lane hit a plain surface: freeze, shade next shade iteration
        advancing = miss | vol

        sid = sample_id(jnp.maximum(s.sample, 0))
        u = lane_uniforms(key, sid, s.path_step, 4)
        env_color, env_alb, env_nrm, env_dep = _env_terms(
            scn, s.dir, cfg.clip_max
        )
        rad = s.rad + V3.where(miss, s.thr * env_color, zv)

        vs = volume_shade(s.dir, hit, scn, u, cfg.volume_step,
                          nearest=cfg.vol_nearest, grid_t=vol_grid_t,
                          pending=vol_pending)
        thr = V3.where(vol & vs.scattered, s.thr * vs.weight, s.thr)
        new_org = V3.where(vol, vs.origin, s.org)
        new_dir = V3.where(vol, vs.direction, s.dir)

        vol_exit = vol & (hit.face == FACE_VOLUME_BACK)
        vol_march = vol & (hit.face != FACE_VOLUME_BACK)
        miss_i = miss.astype(jnp.int32)
        vol_exit_i = vol_exit.astype(jnp.int32)
        vol_march_i = vol_march.astype(jnp.int32)
        # frozen lanes keep their mode; miss -> DEAD, exit -> SURFACE,
        # continue -> MARCH (identity for the frozen march-surface case)
        mode = (
            mode * (1 - miss_i - vol_exit_i - vol_march_i)
            + MODE_SURFACE * vol_exit_i
            + MODE_MARCH * vol_march_i
        )
        bounce = s.bounce + vol_exit_i
        vbounce = (
            s.vbounce * (1 - vol_march_i)
            + (jnp.where(march, s.vbounce + 1, 1)) * vol_march_i
        )
        last_sph = s.last_sph * (1 - vol_march_i) + hit.sphere_row * vol_march_i

        if cfg.want_aovs:
            vol_claim = vol & vs.scattered
            claim_alb = V3.where(vol_claim, zv + 0.8, env_alb)
            claim_nrm = V3.where(vol_claim, hit.normal, env_nrm)
            claim_dep = jnp.where(vol_claim, hit.t, env_dep)
            claim = (miss | vol_claim) & (s.aov_open != 0)

        adv_i = advancing.astype(jnp.int32)
        return s._replace(
            it=s.it + 1,
            path_step=s.path_step + adv_i,
            org=new_org,
            dir=new_dir,
            thr=thr,
            rad=rad,
            bounce=bounce,
            vbounce=vbounce,
            mode=mode,
            last_sph=last_sph,
            aov_open=(
                s.aov_open * (1 - claim.astype(jnp.int32))
                if cfg.want_aovs else s.aov_open
            ),
            aov_alb=(V3.where(claim, claim_alb, s.aov_alb)
                     if cfg.want_aovs else s.aov_alb),
            aov_nrm=(V3.where(claim, claim_nrm, s.aov_nrm)
                     if cfg.want_aovs else s.aov_nrm),
            aov_dep=(jnp.where(claim, claim_dep, s.aov_dep)
                     if cfg.want_aovs else s.aov_dep),
            rays=s.rays + adv_i.astype(jnp.float32),
        )

    def outer_body(s: _State) -> _State:
        # run pending_check iterations, then one termination reduction.
        # Iterating an all-dead state is a fully-masked no-op, so the
        # overshoot is exact; the savings are (N-1)/N of the per-iteration
        # cross-lane reductions. With regen_every=k the fori step is a
        # statically-unrolled group of one regen + k-1 no-regen iterations
        # (total unrolled bodies per fori step stays pending_check).
        k = cfg.regen_every
        m = cfg.march_every
        if m > 1:
            # one SHADE iteration (regen + surface shade, volume events
            # frozen and the volume block compile-time absent), then m-1
            # MARCH iterations; bit-identical to the unsplit schedule
            # (see body_march / the freeze_vol block in _body_trace)
            def group_m(ss):
                ss = body(ss, True, freeze_vol=True)
                for _ in range(m - 1):
                    ss = body_march(ss)
                return ss

            s = jax.lax.fori_loop(
                0, max(cfg.pending_check // m, 1), lambda _, ss: group_m(ss), s
            )
        elif k > 1:
            def group(ss):
                ss = body(ss, True)
                for _ in range(k - 1):
                    ss = body(ss, False)
                return ss

            s = jax.lax.fori_loop(
                0, max(cfg.pending_check // k, 1), lambda _, ss: group(ss), s
            )
        else:
            s = jax.lax.fori_loop(
                0, max(cfg.pending_check, 1), lambda _, ss: body(ss), s
            )
        n_pending = jnp.sum(
            ((s.mode != MODE_DEAD) | (s.sample + 1 < spp)).astype(jnp.int32)
        )
        return s._replace(n_pending=n_pending)

    final = jax.lax.while_loop(cond, outer_body, state)

    # fold in each lane's last completed path (not yet accumulated in-loop)
    fin = (final.mode == MODE_DEAD) & (final.path_open != 0)
    B_ = pix.shape
    rays_total = jnp.sum(final.rays)  # [B] per-lane counters -> scalar
    radiance = final.acc_rad + V3.where(fin, final.rad, zv)
    if not cfg.want_aovs:
        # AOV slots alias the radiance (callers only read .radiance)
        return TraceSums(
            radiance=radiance,
            aov_albedo=radiance,
            aov_normal=radiance,
            aov_depth=radiance.x,
            rays=rays_total,
            iters=final.it.astype(jnp.int32).astype(jnp.float32),
        )
    dep_n = jnp.clip(
        (final.aov_dep - cfg.clip_min) / (cfg.clip_max - cfg.clip_min), 0.0, 1.0
    )
    return TraceSums(
        radiance=radiance,
        aov_albedo=final.acc_alb + V3.where(fin, final.aov_alb, zv),
        aov_normal=final.acc_nrm + V3.where(fin, final.aov_nrm, zv),
        aov_depth=final.acc_dep + jnp.where(fin, dep_n, 0.0),
        rays=rays_total,
        iters=final.it.astype(jnp.int32).astype(jnp.float32),
    )


trace = partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "subsample", "cfg", "spp_total"),
)(trace_core)
"""XLA-compiled entry point; ``trace_core`` stays reusable inside the
Pallas megakernel (ops/pallas_trace.py), where the same body runs on
VMEM-resident values with one kernel launch for the whole loop."""
