"""Interleaved hardware A/B of bit-identical scheduling knobs.

Link throughput drifts hour-scale (CLAUDE.md), so variants are measured
INTERLEAVED (A,B,C,A,B,C,...) within one session and compared by median.
All knobs here are scheduling statics whose output is bit-identical by
construction (pending_check cadence, block height, regen cadence — gated
by tests/test_cadence.py), so no parity run is needed.

Timing = dispatch_probe's trusted pattern: N chained kernel calls, a
scalar fetch inside the timed region, rays fetched outside.

Run:  python3 tools/knob_ab.py [--scene cornell] [--repeats 5]
      [--variants pc16,pc32,rows8] (default pc16,pc32,rows8)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(scene_name: str, cfg_tweak=None, block_rows=None):
    import jax.numpy as jnp

    from bendy_tpu.ops.pallas_trace import lane_order, make_pallas_tracer, rows_for
    from bendy_tpu.render import Config, Renderer
    from bendy_tpu.scene import load_scene

    W = H = 256
    spp, n = 64, 2
    nn = n * n
    scene = load_scene(f"scenes/{scene_name}.json.gz")
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(), use_pallas=False)
    r.camera_params(cam_ref)
    cfg = r.trace_config(r.config, cam_ref)
    if cfg_tweak:
        cfg = cfg._replace(**cfg_tweak)
    rows = block_rows or rows_for(cfg)
    kern = make_pallas_tracer(r.arrays, W, H, spp, n, cfg, block_rows=rows,
                              vol_operand=r.vol_operand())
    B = W * H * nn
    order = lane_order(W, H, nn, rows * 128)
    if order is not None:
        pix, sub = order[0], order[1]
    else:
        local = jnp.arange(B, dtype=jnp.uint32)
        pix, sub = local // jnp.uint32(nn), local % jnp.uint32(nn)
    return r, kern, pix, sub


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    scene = "cornell"
    if "--scene" in sys.argv:
        scene = sys.argv[sys.argv.index("--scene") + 1]
    repeats = 5
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    names = "pc16,pc32,rows8"
    if "--variants" in sys.argv:
        names = sys.argv[sys.argv.index("--variants") + 1]

    catalog = {
        "pc16": dict(cfg_tweak={"pending_check": 16}),
        "pc32": dict(cfg_tweak={"pending_check": 32}),
        "pc16k4": dict(cfg_tweak={"pending_check": 16, "regen_every": 4}),
        "rows8": dict(block_rows=8),
        "rows32": dict(block_rows=32),
        "k1": dict(cfg_tweak={"regen_every": 1}),
        "k4": dict(cfg_tweak={"regen_every": 4}),
        # march-iteration cadence (volume scenes; VERDICT r4 item 3):
        # bit-identical by construction (tests/test_march_cadence.py).
        # Compare against BOTH base (production regen cadence) and k1
        # (the cadence requires regen_every=1, so k1 isolates the
        # march-specialization effect from the regen change).
        "m2": dict(cfg_tweak={"march_every": 2, "regen_every": 1}),
        "m4": dict(cfg_tweak={"march_every": 4, "regen_every": 1}),
        "m8": dict(cfg_tweak={"march_every": 8, "regen_every": 1}),
    }
    variants = [("base", {})] + [(v, catalog[v]) for v in names.split(",")]

    built = {}
    for tag, kw in variants:
        built[tag] = build(scene, **kw)
        print(f"built {tag}", flush=True)

    base_seed = int.from_bytes(os.urandom(4), "little")
    # compile all (fresh seeds; same statics as measured)
    for tag, (r, kern, pix, sub) in built.items():
        o = kern(r._cam_packed, jnp.uint32(base_seed), jnp.uint32(0), pix, sub)
        float(o.radiance.x.mean())
        print(f"compiled {tag}", flush=True)

    times = {tag: [] for tag, _ in variants}
    rays = {tag: [] for tag, _ in variants}
    seed = base_seed
    chain = 4
    for rep in range(repeats):
        for tag, _ in variants:
            r, kern, pix, sub = built[tag]
            seed += 1
            acc, ry = None, []
            t0 = time.time()
            for p in range(chain):
                o = kern(r._cam_packed, jnp.uint32(seed), jnp.uint32(p), pix, sub)
                acc = o.radiance.x if acc is None else acc + o.radiance.x
                ry.append(o.rays)
            float(acc.mean())  # honest sync
            dt = time.time() - t0
            times[tag].append(dt)
            rays[tag].append(float(np.sum(jax.device_get(ry))))
    out = {}
    for tag, _ in variants:
        mr = [rays[tag][i] / times[tag][i] / 1e6 for i in range(repeats)]
        out[tag] = {
            "mrays_median": round(statistics.median(mr), 1),
            "mrays_all": [round(m, 1) for m in mr],
        }
        print(f"{tag}: {out[tag]['mrays_median']} Mrays/s {out[tag]['mrays_all']}",
              flush=True)
    print(json.dumps({"scene": scene, "variants": out}))


if __name__ == "__main__":
    main()
