"""Sweep megakernel block heights (and lane order) on the real TPU.

Informs ops/pallas_trace.rows_for: per-scene-class block height under
tile-major lane ordering. Timing per CLAUDE.md rules: fresh seeds, 4
device-chained passes per timed region, medians across repeats.

    python3 tools/block_sweep.py [scene ...] [--rows 8 16 32 64] [--spp 64]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*", default=["cornell", "cloud", "blackhole"])
    ap.add_argument("--rows", type=int, nargs="*", default=[8, 16, 32, 64])
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--no-tile", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bendy_tpu.ops.pallas_trace import make_pallas_render_pass
    from bendy_tpu.render import Config, Renderer
    from bendy_tpu.scene import load_scene

    W = H = args.res
    base = int.from_bytes(os.urandom(4), "little")
    for name in args.scenes:
        scene = load_scene(f"scenes/{name}.json.gz")
        cam_ref = scene.find_by_tag("camera")
        scene.get_object(cam_ref).inner.aspect_ratio = W / H
        r = Renderer(scene, Config(), use_pallas=False)
        r.camera_params(cam_ref)
        cfg = r.trace_config(r.config)
        for rows_blk in args.rows:
            fn = make_pallas_render_pass(
                r.arrays, W, H, H, args.spp, 2, cfg, "full",
                block_rows=rows_blk, tile=not args.no_tile,
                vol_operand=r.vol_operand(),
            )
            s, ry = fn(r._cam_packed, jnp.uint32(base), jnp.uint32(0), jnp.uint32(0))
            jax.block_until_ready(s)
            base += 1
            rates = []
            for _ in range(args.repeats):
                t0 = time.time()
                tot, acc = [], None
                for p in range(4):
                    s, ry = fn(r._cam_packed, jnp.uint32(base), jnp.uint32(p),
                               jnp.uint32(0))
                    base += 1
                    acc = s if acc is None else acc + s
                    tot.append(ry)
                jax.block_until_ready(acc)
                dt = time.time() - t0
                rays = float(sum(jax.device_get(tot)))
                rates.append(rays / dt / 1e6)
            print(f"{name} rows={rows_blk} tile={not args.no_tile}: "
                  f"median {statistics.median(rates):.1f} "
                  f"best {max(rates):.1f} Mrays/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
