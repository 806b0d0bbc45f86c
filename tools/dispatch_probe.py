"""Measure per-dispatch overhead of chained render passes (remote axon).

The slope-based phase probe measured cornell at 0.42 us/block-iter while
the single-chain perf_report saw 0.72 — a gap that smells like per-pass
dispatch cost on the tunnel (each chained pass is its own jit dispatch;
the device may idle between programs). This probe decides it:

  chain   N passes as N separate jit dispatches, one block at the end
          (exactly bench.py's film pattern)
  fused   N passes inside ONE jit: lax.fori_loop over the pass index
          around the pallas_call, accumulating sums on device. Same
          render_key per pass -> bit-identical accumulated image.

Both are timed interleaved (A/B within one session, fresh seeds), with a
scalar fetch inside the timed region (bare block_until_ready can return
early under axon) — the ~30 ms fetch RTT cancels in the chain-vs-fused
comparison since both pay exactly one.

Run:  python3 tools/dispatch_probe.py [--passes 4] [--repeats 5]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bendy_tpu.ops.pallas_trace import lane_order, make_pallas_tracer
    from bendy_tpu.render import Config, Renderer
    from bendy_tpu.scene import load_scene

    passes = 4
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    repeats = 5
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    W = H = 256
    spp, n = 64, 2
    nn = n * n

    scene = load_scene("scenes/cornell.json.gz")
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(), use_pallas=False)
    r.camera_params(cam_ref)
    cfg = r.trace_config(r.config, cam_ref)
    kern = make_pallas_tracer(r.arrays, W, H, spp, n, cfg)

    B = W * H * nn
    order = lane_order(W, H, nn, 16 * 128)
    pix, sub = (order[0], order[1]) if order is not None else (
        jnp.arange(B, dtype=jnp.uint32) // jnp.uint32(nn),
        jnp.arange(B, dtype=jnp.uint32) % jnp.uint32(nn),
    )

    @jax.jit
    def fused(cam_packed, seed, pass0):
        def step(p, carry):
            acc, rays = carry
            o = kern(cam_packed, seed, pass0 + p.astype(jnp.uint32), pix, sub)
            return acc + o.radiance.x, rays + o.rays

        acc0 = jnp.zeros((B,), jnp.float32)
        return jax.lax.fori_loop(0, passes, step, (acc0, jnp.float32(0.0)))

    def run_chain(seed):
        acc, rays = None, []
        for p in range(passes):
            o = kern(r._cam_packed, jnp.uint32(seed), jnp.uint32(p), pix, sub)
            acc = o.radiance.x if acc is None else acc + o.radiance.x
            rays.append(o.rays)
        return acc, rays

    base = int.from_bytes(os.urandom(4), "little")
    # compile both once (same statics as measured)
    a, ry = run_chain(base)
    float(a.mean())
    fa, fr = fused(r._cam_packed, jnp.uint32(base), jnp.uint32(0))
    float(fa.mean())
    # cross-check: identical accumulation (same seeds/pass ids -> same image)
    import numpy as np

    a2, _ = run_chain(base)
    fa2, _ = fused(r._cam_packed, jnp.uint32(base), jnp.uint32(0))
    max_dev = float(np.abs(np.asarray(a2) - np.asarray(fa2)).max())

    chain_t, fused_t, chain_rays, fused_rays = [], [], [], []
    seed = base
    for _ in range(repeats):
        seed += 1
        t0 = time.time()
        acc, rays = run_chain(seed)
        s = float(acc.mean())  # scalar fetch: honest sync
        chain_t.append(time.time() - t0)
        chain_rays.append(float(np.sum(jax.device_get(rays))))
        seed += 1
        t0 = time.time()
        facc, frays = fused(r._cam_packed, jnp.uint32(seed), jnp.uint32(0))
        s = float(facc.mean())
        fused_t.append(time.time() - t0)
        fused_rays.append(float(frays))
        del s

    ct, ft = statistics.median(chain_t), statistics.median(fused_t)
    out = {
        "passes": passes,
        "chain_s_median": round(ct, 4),
        "fused_s_median": round(ft, 4),
        "chain_all": [round(t, 4) for t in chain_t],
        "fused_all": [round(t, 4) for t in fused_t],
        "chain_mrays": round(statistics.median(chain_rays) / ct / 1e6, 1),
        "fused_mrays": round(statistics.median(fused_rays) / ft / 1e6, 1),
        "per_pass_overhead_ms": round((ct - ft) / passes * 1e3, 2),
        "max_image_dev": max_dev,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
