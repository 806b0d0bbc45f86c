"""Hardware A/B of the dense-grid fetch formulations (VERDICT r4 item 1).

Sweeps the ops/volume knobs on the real chip over scenes/dense_cloud
(full 32^3 grid — the megakernel brick-table operand path):

  f32+outer   round-3 shipped form (f32 one-hot via (z ⊗ (y ⊗ x)))
  f32+direct  one iota-compare against the flat brick id
  bf16+outer  bf16 operands (halved one-hot/table VMEM traffic)
  bf16+direct both

Every variant is cross-checked against the XLA einsum path before it is
timed (bad Mosaic lowerings must fail loudly here, not ship). Prints one
line per variant; pick the winner and bake it as the module defaults.

Run (tunnel up):  python3 tools/dense_grid_sweep.py [--repeats N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_parity(r, cam_ref, W=32, H=32, spp=8) -> float:
    """Megakernel (vol_operand) vs XLA trace: max rel err (statistical
    knife-edge scatter flips allowed; gross lowering bugs are not)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bendy_tpu.ops.pallas_trace import make_pallas_tracer, pack_camera
    from bendy_tpu.ops.wavefront import trace as xla_trace
    from bendy_tpu.utils.rng import render_key

    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config, cam_ref)
    B = W * H
    pix = jnp.arange(B, dtype=jnp.uint32)
    sub = jnp.zeros(B, jnp.uint32)
    kern = make_pallas_tracer(r.arrays, W, H, spp, 1, cfg, vol_operand=True)
    pal = kern(pack_camera(cam), jnp.uint32(7), jnp.uint32(0), pix, sub)
    jax.block_until_ready(pal.radiance.x)
    xla = xla_trace(r.arrays, cam, render_key(jnp.uint32(7), jnp.uint32(0)),
                    pix, sub, W, H, spp, 1, cfg)
    a = np.asarray(pal.radiance.x)
    b = np.asarray(xla.radiance.x)
    # mean-level agreement: per-lane equality is NOT expected (the operand
    # path's bf16 rounding can flip knife-edge Bernoulli scatters)
    return abs(float(a.mean() - b.mean())) / max(abs(float(b.mean())), 1e-6)


def probe_serialization() -> dict:
    """Prove (or refute) the VPU/MXU serialization claim with phase times.

    Measures the dense_cloud kernel's per-block-iteration wall twice:
    the production kernel, and the same kernel with the density fetch
    stubbed to a constant (identical control-flow machinery, zero MXU
    work; per-iteration rate comparisons stay valid because the stats
    tile counts iterations, not rays). t_mxu_implied = t_full - t_stub.
    If t_stub + implied MXU-at-measured-duty ~= t_full, the fetch and
    the wavefront VPU work serialize (the fetch feeds the very next
    Bernoulli scatter decision, so no overlap is schedulable).
    """
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from perf_report import loop_body_ops, measure_iters_per_sec

    import bendy_tpu.ops.volume as volume

    out = {}
    orig = volume.density_sample
    orig_overlap = volume.VOL_FETCH_OVERLAP
    for tag in ("full", "no_dot", "stub"):
        try:
            # the phase decomposition is defined on the SERIALIZED
            # (inline-fetch) formulation, and the 'stub' variant replaces
            # density_sample — which the deferred begin/finish path
            # bypasses entirely
            volume.VOL_FETCH_OVERLAP = False
            if tag == "stub":
                volume.density_sample = (
                    lambda scn, hit, coord, nearest=False, grid_t=None:
                    jnp.zeros_like(coord.x) + 0.35
                )
            volume.VOL_PROBE_NO_DOT = tag == "no_dot"
            info = loop_body_ops("dense_cloud")
            it_s, rays_s = measure_iters_per_sec(info)
            out[tag] = {"block_iters_per_sec": round(it_s),
                        "us_per_iter": round(1e6 / it_s, 3)}
        finally:
            volume.density_sample = orig
            volume.VOL_PROBE_NO_DOT = False
            volume.VOL_FETCH_OVERLAP = orig_overlap
    t_fetch = out["full"]["us_per_iter"] - out["stub"]["us_per_iter"]
    t_dot = out["full"]["us_per_iter"] - out["no_dot"]["us_per_iter"]
    out["fetch_us_per_iter"] = round(t_fetch, 3)
    out["dot_us_per_iter"] = round(t_dot, 3)
    out["fetch_vpu_us_per_iter"] = round(t_fetch - t_dot, 3)
    out["mxu_flops_per_iter"] = 2 * 128 * 512 * 16 * 128  # padded, 32^3
    if t_dot > 0:
        out["mxu_util_during_dot"] = round(
            out["mxu_flops_per_iter"] / (t_dot * 1e-6) / 1.97e14, 3
        )
    return out


def main() -> None:
    import bendy_tpu.ops.volume as volume
    import jax.numpy as jnp

    from bendy_tpu.film import DeviceFilm
    from bendy_tpu.render import Config, Renderer, RenderConfig, Subsample
    from bendy_tpu.scene import load_scene

    repeats = 5
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    if "--probe-serial" in sys.argv:
        import json

        print(json.dumps(probe_serialization()))
        return

    from bendy_tpu.ops import pallas_trace

    R = pallas_trace.DENSE_OPERAND_ROWS  # the height dense scenes run at
    variants = [("f32", False, 4, 1, R), ("f32", True, 4, 1, R),
                ("bf16", False, 4, 1, R), ("bf16", True, 4, 1, R)]
    if "--bricks" in sys.argv:
        # brick-size sweep (r4 probe: the dot is VMEM-bandwidth-bound on
        # the [K, lanes] one-hot stream; bigger bricks shrink K 8x per
        # doubling and even cut FLOPs — apron overhead (bs+1)^3/bs^3
        # falls with bs)
        variants = [("bf16", True, 4, 1, R), ("bf16", True, 8, 1, R),
                    ("bf16", True, 16, 1, R)]
    if "--lane-chunks" in sys.argv:
        # lane-row chunking A/B: chunk k+1's one-hot build (VPU) is
        # independent of chunk k's dot (MXU) — if Mosaic's in-order issue
        # lets the systolic array run ahead, the build hides behind the
        # dot (the only overlap the march's step->decision serialization
        # leaves schedulable). Sub-16-row chunks pad the bf16 (16,128)
        # minimum tile (measured exactly 2x/2.27x slower at 16 rows), so
        # the fair test is a 32-row block split into two 16-row chunks
        # against the same block unsplit. Interleaved 16-row controls.
        variants = [("bf16", True, 4, 1, 16), ("bf16", True, 4, 1, 32),
                    ("bf16", True, 4, 2, 32), ("bf16", True, 4, 1, 16)]
    if "--lane-chunks-deep" in sys.argv:
        # follow-up: does the overlap keep paying as block height and
        # chunk count scale together (16-row tile-aligned chunks)?
        variants = [("bf16", True, 4, 1, 16), ("bf16", True, 4, 2, 32),
                    ("bf16", True, 4, 4, 64), ("bf16", True, 4, 2, 32),
                    ("bf16", True, 4, 1, 16)]
    if "--overlap" in sys.argv:
        # deferred-apply A/B (VOL_FETCH_OVERLAP): issue the dots before the
        # shade block, apply after it. mxu_shape_probe measured the
        # isolated dot at ~100% of the bf16 peak vs 55% in-kernel, so up
        # to ~0.7 us/iter of fetch-independent VPU work is hideable.
        # 6th field = overlap; interleaved on/off at the production config.
        variants = [("bf16", True, 4, 2, 32, False),
                    ("bf16", True, 4, 2, 32, True),
                    ("bf16", True, 4, 2, 32, False),
                    ("bf16", True, 4, 2, 32, True)]
    results = {}
    orig_brick = volume.VOL_BRICK
    orig_rows = pallas_trace.DEFAULT_ROWS
    orig_chunks = volume.VOL_LANE_CHUNKS
    orig_overlap = volume.VOL_FETCH_OVERLAP
    for vi, var in enumerate(variants):
        (dtype_name, direct, brick, chunks, rows), overlap = var[:5], (
            var[5] if len(var) > 5 else volume.VOL_FETCH_OVERLAP)
        volume.VOL_FETCH_OVERLAP = overlap
        volume.VOL_FETCH_DTYPE = (
            jnp.float32 if dtype_name == "f32" else jnp.bfloat16
        )
        volume.VOL_ONEHOT_DIRECT = direct
        volume.VOL_BRICK = brick
        volume.VOL_LANE_CHUNKS = chunks
        pallas_trace.DEFAULT_ROWS = rows
        pallas_trace.DENSE_OPERAND_ROWS = rows  # dense scenes read this one
        tag = f"{dtype_name}+{'direct' if direct else 'outer'}+b{brick}"
        if chunks != 1 or rows != orig_rows or any(
                a.startswith("--lane-chunks") for a in sys.argv):
            tag += f"+c{chunks}r{rows}#{vi}"
        if "--overlap" in sys.argv:
            tag += f"+ov{int(overlap)}#{vi}"
        scene = load_scene("scenes/dense_cloud.json.gz")
        cam_ref = scene.find_by_tag("camera")
        scene.get_object(cam_ref).inner.aspect_ratio = 1.0
        r = Renderer(scene, Config())
        try:
            rel = check_parity(Renderer(scene, Config(), use_pallas=False),
                               cam_ref)
        except Exception as e:  # pragma: no cover - device-dependent
            print(f"{tag}: REJECTED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            results[tag] = {"ok": False}
            continue
        rc = RenderConfig(samples=64, subsample=Subsample(2))
        base = int.from_bytes(os.urandom(4), "little")
        film = DeviceFilm(256, 256)
        t0 = time.time()
        r.render(cam_ref, rc, film, seed=base)
        film.block_until_ready()
        compile_s = time.time() - t0
        float(r.rays_traced)
        mrays = []
        for i in range(repeats):
            film = DeviceFilm(256, 256)
            r.rays_traced = 0.0
            t0 = time.time()
            for p in range(4):
                r.render(cam_ref, rc, film, seed=base + 1 + 4 * i + p)
            film.block_until_ready()
            mrays.append(r.rays_traced / (time.time() - t0) / 1e6)
        med = statistics.median(mrays)
        results[tag] = {"ok": True, "mrays": round(med, 1),
                        "best": round(max(mrays), 1),
                        "mean_rel_err_vs_xla": round(rel, 5)}
        print(f"{tag}: {med:.1f} Mrays/s median (best {max(mrays):.1f}), "
              f"compile {compile_s:.1f}s, mean-rel-err {rel:.2e}, "
              f"pallas={r.use_pallas}", flush=True)
    volume.VOL_FETCH_DTYPE = jnp.bfloat16
    volume.VOL_ONEHOT_DIRECT = True
    volume.VOL_BRICK = orig_brick
    volume.VOL_LANE_CHUNKS = orig_chunks
    volume.VOL_FETCH_OVERLAP = orig_overlap
    pallas_trace.DEFAULT_ROWS = orig_rows
    pallas_trace.DENSE_OPERAND_ROWS = R
    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
