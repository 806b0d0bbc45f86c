"""Phase-level wall-time decomposition of the megakernel hot loop.

Generalizes the dense-grid probe (tools/dense_grid_sweep.py
--probe-serial) to every phase of the wavefront body: each phase is
stubbed with a cheap LIVE-value stand-in (constants alone would let
Mosaic fold downstream consumers too — every stub output that feeds
later masks/selects derives from a live lane value so only the stubbed
phase disappears), the kernel re-traces, and the per-block-iteration
wall is measured on the real chip via the stats-tile iteration counters
(rate-valid even though stubs change path behavior: we time
iterations, not rays).

Phases (cornell-class surface scenes):

  full        production kernel
  light       sample_light_point + light_pdf stubbed (the diffuse
              next-event machinery inside shade_surface)
  shade       whole shade_surface stubbed
  sweep       nearest_hit stubbed (the unrolled primitive sweep)
  rng         wavefront lane_uniforms stubbed (pcg4d draws; the camera
              block's own draws are part of `camera`)
  camera      camera_ray stubbed (regen-block ray gen incl. its RNG)
  floor       shade+sweep+camera+rng all stubbed — the residual loop
              glue (mode machinery, accumulators, carries)

t_phase = t_full - t_stub (includes lost ILP overlap, i.e. it is the
phase's *schedule* cost, which is what optimization cares about).

Run (tunnel up, nothing else on the chip):
  python3 tools/phase_probe.py [--scene cornell] [--phases light,shade]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _stubs():
    """Build {phase: [(module, attr, replacement)]} patch tables."""
    import jax.numpy as jnp

    import bendy_tpu.ops.materials as materials
    import bendy_tpu.ops.wavefront as wavefront
    from bendy_tpu.ops.intersect import FACE_BACK, FACE_FRONT, Hit
    from bendy_tpu.ops.materials import Shade
    from bendy_tpu.scene.compiler import MAT_DIFFUSE, MAT_EMISSIVE
    from bendy_tpu.utils.v3 import V3

    def stub_light_point(scn, light_idx, u_a, u_b, u_face, **kw):
        # live via u_a; one FMA per component
        return V3(u_a * 0.5 + 1.0, u_a * 0.5 + 2.0, u_a * 0.5 + 0.5)

    def stub_light_pdf(pos, d, cmin, cmax, scn, light_idx, **kw):
        return pos.x * 0.0 + d.x * 0.1 + 0.3  # live via d

    def stub_shade(dir_in, hit, scn, u, clip_min, clip_max, **kw):
        B = dir_in.x.shape
        scatter = u[1] < 0.5  # live mask (mixed when rng is unstubbed)
        zv = V3.zeros(B)
        return Shade(
            emitted=zv + 0.1,
            scatter=scatter,
            direction=dir_in,
            weight=zv + 0.5,
            aov_albedo=zv + 0.5,
            aov_normal=hit.normal,
            aov_depth=hit.t,
        )

    def stub_hit(org, dirv, cmin, cmax, scn, **kw):
        B = org.x.shape
        mixed = dirv.x > 0.0  # genuinely mixed mask
        zf = org.x * 0.0
        return Hit(
            t=zf + 1.0,
            valid=mixed,
            position=org + dirv,
            normal=-dirv,  # unit + live, feeds the shade frame
            face=jnp.where(mixed, FACE_FRONT, FACE_BACK),
            mtype=jnp.where(mixed, MAT_DIFFUSE, MAT_EMISSIVE),
            albedo=V3(zf + 0.6, zf + 0.6, zf + 0.6),
            rough=zf,
            ior=zf + 1.4,
            emitted=V3(zf + 0.1, zf + 0.1, zf + 0.1),
            vol_grid=(zf - 1.0).astype(jnp.int32),
            vol_size=V3(zf + 1.0, zf + 1.0, zf + 1.0),
            sphere_row=(zf - 1.0).astype(jnp.int32),
            bbox_min=org,
            bbox_size=V3(zf + 1.0, zf + 1.0, zf + 1.0),
        )

    def stub_uniforms(key, lane, tag, n):
        li = lane.astype(jnp.int32)
        # distinct live mixed-value slots, ~3 ops each vs a pcg4d block
        return [
            ((li >> jnp.int32(i)) & jnp.int32(1)).astype(jnp.float32) * 0.25
            + 0.27
            for i in range(n)
        ]

    def stub_camera(cam, width, height, nsub, key, sid, px, py, si, sj,
                    poly_trig=False, has_dof=True, uv_base=None):
        zf = sid.astype(jnp.int32).astype(jnp.float32) * 0.0
        from bendy_tpu.utils.v3 import V3 as _V3

        return _V3(zf, zf, zf + 14.0), _V3(zf, zf, zf - 1.0)

    import bendy_tpu.ops.volume as volume_mod
    from bendy_tpu.ops.volume import VolumeShade

    def stub_volume_shade(dir_in, hit, scn, u, step, nearest=False,
                          grid_t=None, pending=None):
        # live mixed scatter mask via rng slot 2; everything else passes
        # through live lane values so downstream selects stay un-foldable
        scattered = u[2] < 0.3
        return VolumeShade(
            scattered=scattered,
            origin=hit.position,
            direction=dir_in,
            weight=hit.t * 0.0 + 0.8,
        )

    def stub_fetch_begin(scn, hit, nearest=False, grid_t=None):
        return None  # volume_shade stub ignores pending anyway

    light = [
        (materials, "sample_light_point", stub_light_point),
        (materials, "sample_light_point_looped", stub_light_point),
        (materials, "light_pdf", stub_light_pdf),
        (materials, "light_pdf_looped", stub_light_pdf),
    ]
    shade = [(wavefront, "shade_surface", stub_shade)]
    sweep = [
        (wavefront, "nearest_hit", stub_hit),
        (wavefront, "nearest_hit_looped", stub_hit),
    ]
    rng = [(wavefront, "lane_uniforms", stub_uniforms)]
    camera = [(wavefront, "camera_ray", stub_camera)]
    # the whole volume block: scattering decision + density lookup (incl.
    # the dense-grid MXU fetch when vol_operand) — what a SURFACE-
    # specialized iteration would drop
    vol = [
        (wavefront, "volume_shade", stub_volume_shade),
        (volume_mod, "density_fetch_begin", stub_fetch_begin),
    ]
    return {
        "light": light,
        "shade": shade,
        "sweep": sweep,
        "rng": rng,
        "camera": camera,
        "volume": vol,
        # what a MARCH-specialized iteration would drop (the VERDICT r4
        # item-3 bound): the surface shade block incl. the diffuse
        # next-event machinery. phase_frac(marchspec) x (march share of
        # iterations) upper-bounds the mode-cadence win.
        "marchspec": shade + light,
        "floor": shade + sweep + rng + camera,
    }


def measure_slope(info, repeats=5, chains=(2, 10)):
    """Block-iterations/s from the SLOPE between two chain lengths.

    Stubbed kernels shorten paths (fewer iterations per pass), so a
    single chained timing is polluted by the constant ~30 ms tunnel
    sync. Timing chains of c1 and c2 passes and dividing the iteration
    delta by the wall delta cancels every per-sync constant:
        rate = (I(c2) - I(c1)) / (t(c2) - t(c1)).
    The kernel is built once (one compile per variant).

    The sync INSIDE the timed region is a scalar fetch — axon's
    block_until_ready on a bare jit result can return early, and that
    error scales with the chain length (measured 1.65x-fast slopes), so
    it does NOT cancel; the scalar-fetch RTT is constant and does.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bendy_tpu.ops.pallas_trace import lane_order, make_pallas_tracer

    r = info["renderer"]
    W, H, spp, n = info["width"], info["height"], info["spp"], info["subsample"]
    nn = n * n
    cfg = info["cfg"]
    kern = make_pallas_tracer(r.arrays, W, H, spp, n, cfg,
                              block_rows=info["block_rows"],
                              vol_operand=r.vol_operand())
    B = W * H * nn
    order = lane_order(W, H, nn, info["block_rows"] * 128)
    if order is not None:
        pix, sub = order[0], order[1]
    else:
        local = jnp.arange(B, dtype=jnp.uint32)
        pix, sub = local // jnp.uint32(nn), local % jnp.uint32(nn)
    base = int.from_bytes(os.urandom(4), "little")
    out = kern(r._cam_packed, jnp.uint32(base), jnp.uint32(0), pix, sub)
    float(out.radiance.x.mean())  # compile + honest sync
    seed = base
    samples = {c: [] for c in chains}
    for _ in range(repeats):
        for c in chains:
            acc, stats = None, []
            t0 = time.time()
            for p in range(c):
                seed += 1
                o = kern(r._cam_packed, jnp.uint32(seed), jnp.uint32(p),
                         pix, sub)
                acc = o.radiance.x if acc is None else acc + o.radiance.x
                stats.append(o.iters)
            float(acc.mean())  # scalar fetch: the only honest sync here
            dt = time.time() - t0
            iters = float(np.sum(jax.device_get(stats)))
            samples[c].append((iters, dt))
    med = {}
    for c in chains:
        ss = sorted(samples[c], key=lambda s: s[1])
        med[c] = ss[len(ss) // 2]
    c1, c2 = chains
    di = med[c2][0] - med[c1][0]
    dt = med[c2][1] - med[c1][1]
    return di / max(dt, 1e-9)


def probe(scene_name: str, phases=None, repeats: int = 5) -> dict:
    from perf_report import loop_body_ops

    tables = _stubs()
    order = ["full"] + list(tables.keys())
    if phases:
        order = ["full"] + [p for p in order if p in phases]
    out = {}
    for tag in order:
        patches = tables.get(tag, [])
        saved = [(m, a, getattr(m, a)) for m, a, _ in patches]
        try:
            for m, a, repl in patches:
                setattr(m, a, repl)
            info = loop_body_ops(scene_name)
            it_s = measure_slope(info, repeats=repeats)
            out[tag] = {
                "block_iters_per_sec": round(it_s),
                "us_per_iter": round(1e6 / it_s, 3),
                "ops_per_lane_iter": round(info["vpu_ops_per_lane_iter"], 1),
            }
            print(f"{tag}: {out[tag]}", flush=True)
        finally:
            for m, a, orig in saved:
                setattr(m, a, orig)
    t_full = out["full"]["us_per_iter"]
    for tag in order[1:]:
        if tag in out:
            out[tag]["phase_us"] = round(t_full - out[tag]["us_per_iter"], 3)
            out[tag]["phase_frac"] = round(
                (t_full - out[tag]["us_per_iter"]) / t_full, 3
            )
    return out


def march_share(scene_name: str, width=64, height=64, spp=4) -> float:
    """March-mode share of alive lane-iterations (same paths both runs).

    Toggles wavefront.RAYS_COUNT so the in-loop per-lane counter counts
    MODE_MARCH lanes, re-jits trace_core fresh (module knobs don't key
    the jit cache), and divides by the alive count from an identical-seed
    run. This weights the `marchspec` phase bound: the mode-cadence win
    cannot exceed phase_frac(marchspec) x march_share.
    """
    import jax
    import jax.numpy as jnp

    import bendy_tpu.ops.wavefront as wavefront
    from bendy_tpu.render import Config, Renderer
    from bendy_tpu.scene import load_scene
    from bendy_tpu.utils.rng import render_key

    if scene_name.startswith("prim_grid_"):
        from bendy_tpu.models.prim_grid import build_prim_grid

        scene = build_prim_grid(int(scene_name.split("_")[-1]))
    else:
        scene = load_scene(f"scenes/{scene_name}.json.gz")
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = width / height
    r = Renderer(scene, Config(), use_pallas=False)
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config, cam_ref)
    from bendy_tpu.ops.pallas_trace import make_pallas_tracer

    del cam  # the kernel reads the packed camera
    B = width * height
    pix = jnp.arange(B, dtype=jnp.uint32)
    sub = jnp.zeros(B, jnp.uint32)
    seed = int.from_bytes(os.urandom(4), "little")
    vals = {}
    for knob in ("alive", "march"):
        wavefront.RAYS_COUNT = knob
        try:
            # the production megakernel, built FRESH per knob (the build
            # re-traces trace_core, so the module knob takes effect; the
            # dense-grid XLA fallback path is pathologically slow and is
            # not what production runs anyway)
            kern = make_pallas_tracer(r.arrays, width, height, spp, 1, cfg,
                                      vol_operand=r.vol_operand())
            res = kern(r._cam_packed, jnp.uint32(seed), jnp.uint32(0),
                       pix, sub)
            vals[knob] = float(res.rays)
        finally:
            wavefront.RAYS_COUNT = "alive"
    return vals["march"] / max(vals["alive"], 1.0)


def main() -> None:
    scene = "cornell"
    if "--scene" in sys.argv:
        scene = sys.argv[sys.argv.index("--scene") + 1]
    phases = None
    if "--phases" in sys.argv:
        phases = sys.argv[sys.argv.index("--phases") + 1].split(",")
    repeats = 5
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    if "--march-share" in sys.argv:
        share = march_share(scene)
        print(json.dumps({"scene": scene, "march_share": round(share, 4)}))
        return
    res = probe(scene, phases, repeats)
    print(json.dumps({"scene": scene, "phases": res}))


if __name__ == "__main__":
    main()
