"""Hardware validation of the looped (SMEM-table) megakernel.

Interpret-mode CI (tests/test_looped_sweep.py) proves the kernel's
semantics; this script proves the real Mosaic build: compile + run the
looped megakernel on the TPU for a 258-primitive scene, cross-check it
against the XLA looped trace, and sweep the LOOP_BLOCK unroll factor.

Run (tunnel up):  python3 tools/looped_hw_check.py [--sweep]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mosaic_check() -> bool:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bendy_tpu.models.prim_grid import build_prim_grid
    from bendy_tpu.ops.pallas_trace import make_pallas_tracer, pack_camera
    from bendy_tpu.ops.wavefront import trace as xla_trace
    from bendy_tpu.render import Config, Renderer
    from bendy_tpu.utils.rng import render_key

    r = Renderer(build_prim_grid(256), Config(max_bounces=3), use_pallas=False)
    cam_ref = r.scene.find_by_tag("camera")
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config, cam_ref)
    assert cfg.looped_sweep
    W = H = 64
    B = W * H
    pix = jnp.arange(B, dtype=jnp.uint32)
    sub = jnp.zeros(B, jnp.uint32)
    try:
        kern = make_pallas_tracer(r.arrays, W, H, 4, 1, cfg)
        t0 = time.time()
        pal = kern(pack_camera(cam), jnp.uint32(9), jnp.uint32(0), pix, sub)
        jax.block_until_ready(pal.radiance.x)
        print(f"looped megakernel Mosaic OK: compile+run {time.time() - t0:.1f}s",
              flush=True)
    except Exception as e:  # pragma: no cover - device-dependent
        print(f"looped megakernel REJECTED on hardware: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        return False
    xla = xla_trace(r.arrays, cam, render_key(jnp.uint32(9), jnp.uint32(0)),
                    pix, sub, W, H, 4, 1, cfg)
    err = np.abs(np.asarray(pal.radiance.x) - np.asarray(xla.radiance.x))
    rel = err / (np.abs(np.asarray(xla.radiance.x)) + 1e-5)
    print(f"looped megakernel vs XLA: max abs {err.max():.2e} "
          f"max rel {rel.max():.2e}", flush=True)
    return bool(rel.max() < 5e-3)


def measure(n_prims: int, blk: int | None = None, block_rows: int | None = None,
            repeats: int = 5, block_cull: bool | None = None,
            mix: str = "full", carry_probe: str | None = None) -> dict:
    """Mrays/s of prim_grid(n_prims) at the given LOOP_BLOCK / kernel
    block height (None = production defaults). ``block_cull`` overrides
    the TraceConfig flag (None = the derived default). ``mix``/
    ``carry_probe`` drive the dead-column A/B (--carry-ab)."""
    import bendy_tpu.ops.intersect as intersect
    import bendy_tpu.ops.pallas_trace as pallas_trace
    from bendy_tpu.film import DeviceFilm
    from bendy_tpu.models.prim_grid import build_prim_grid
    from bendy_tpu.render import Config, Renderer, RenderConfig, Subsample

    old_blk = intersect.LOOP_BLOCK
    old_rows_for = pallas_trace.rows_for
    old_carry = intersect.CARRY_PROBE
    if blk is not None:
        intersect.LOOP_BLOCK = blk  # late-bound by prim_tables/nearest_hit_looped
    if block_rows is not None:
        # late-bound too (match the production signature incl. vol_operand)
        pallas_trace.rows_for = lambda cfg, vol_operand=False: block_rows
    intersect.CARRY_PROBE = carry_probe
    try:
        scene = build_prim_grid(n_prims, mix=mix)
        cam_ref = scene.find_by_tag("camera")
        scene.get_object(cam_ref).inner.aspect_ratio = 1.0
        r = Renderer(scene, Config(max_bounces=4))
        if block_cull is not None:
            orig_tc = r.trace_config

            def tc(cfg, camera_ref=None, _o=orig_tc, _c=block_cull):
                return _o(cfg, camera_ref)._replace(block_cull=_c)

            r.trace_config = tc
        rc = RenderConfig(samples=16, subsample=Subsample(1))
        base = int.from_bytes(os.urandom(4), "little")
        t0 = time.time()
        film = DeviceFilm(256, 256)
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
        return {"n_prims": n_prims, "loop_block": blk, "block_rows": block_rows,
                "block_cull": block_cull, "mix": mix, "carry_probe": carry_probe,
                "compile_s": round(compile_s, 1),
                "mrays": round(statistics.median(mrays), 1),
                "best": round(max(mrays), 1), "pallas": r.use_pallas}
    finally:
        intersect.LOOP_BLOCK = old_blk
        pallas_trace.rows_for = old_rows_for
        intersect.CARRY_PROBE = old_carry


def block_sweep(n_prims: int = 256) -> None:
    """Mrays/s across LOOP_BLOCK x kernel block height (VERDICT r4 #2:
    joint sweep; the round-3 sweep varied LOOP_BLOCK alone)."""
    for blk in (4, 8, 16, 32):
        for rows in (None, 8, 32):
            res = measure(n_prims, blk, rows)
            print(f"LOOP_BLOCK={blk} rows={rows}: {res['mrays']} median "
                  f"{res['best']} best Mrays/s (compile {res['compile_s']}s, "
                  f"pallas={res['pallas']})", flush=True)


if __name__ == "__main__":
    ok = mosaic_check()
    if "--sweep" in sys.argv:
        n = 256
        if "--prims" in sys.argv:
            n = int(sys.argv[sys.argv.index("--prims") + 1])
        block_sweep(n)
    if "--flat-ab" in sys.argv:
        import bendy_tpu.ops.pallas_trace as pt

        for flat in (True, False, True, False):  # interleaved: link drift
            pt.FLAT_TABLES = flat
            for n in (258, 512):
                res = measure(n, repeats=3)
                print(f"flat={flat} n={n}: {res['mrays']} median "
                      f"{res['best']} best Mrays/s", flush=True)
        pt.FLAT_TABLES = True
    if "--cull-ab" in sys.argv:
        # interleaved A/B of the block-culled sweep (VERDICT r3 #2's real
        # fix: skip primitive blocks no alive lane's segment reaches).
        # Absolute link rates drift; only within-run pairs are comparable.
        import json

        rows = []
        for rep in range(2):
            for cull in (False, True):
                for n in (258, 512):
                    res = measure(n, repeats=3, block_cull=cull)
                    rows.append(res)
                    print(f"cull={cull} n={n}: {res['mrays']} median "
                          f"{res['best']} best Mrays/s "
                          f"(compile {res['compile_s']}s, pallas={res['pallas']})",
                          flush=True)
        print(json.dumps(rows))
    if "--carry-ab" in sys.argv:
        # interleaved A/B of the dead attribute columns + dead [B] fori
        # carries (VERDICT r4 item 4): a DIFFUSE-only field compiles the
        # rough/ior carries off; CARRY_PROBE="force_on" restores the old
        # behavior (loads + [B] carries) with an identical film. The
        # carries-off config also scalar-collapses the dead _Sweep
        # carries (ops/intersect.py). Within-run pairs only (link drift).
        import json

        rows = []
        for rep in range(2):
            for probe in (None, "force_on"):
                for n in (258, 512):
                    res = measure(n, repeats=3, mix="diffuse",
                                  carry_probe=probe)
                    rows.append(res)
                    print(f"carry_probe={probe} n={n}: {res['mrays']} median "
                          f"{res['best']} best Mrays/s "
                          f"(compile {res['compile_s']}s, pallas={res['pallas']})",
                          flush=True)
        print(json.dumps(rows))
    if "--scaling" in sys.argv:
        # the VERDICT r4 #2 target row: hold >= 50 Mrays/s at 512 prims
        import json

        rows = [measure(n) for n in (258, 512)]
        for res in rows:
            print(res, flush=True)
        print(json.dumps(rows))
    sys.exit(0 if ok else 1)
