"""Primitive-count scaling characterization on real TPU hardware.

Measures, for generated n-primitive scenes (models/prim_grid.py):
  - megakernel compile wall time (the cost of the statically unrolled
    primitive sweep — the reference's linear scan compiles nothing),
  - steady-state Mrays/s (median of fresh-seed 4-pass-chained walls).

Writes docs/prim_scaling.json; run:  python3 tools/prim_scaling.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bendy_tpu.film import DeviceFilm  # noqa: E402
from bendy_tpu.models.prim_grid import build_prim_grid  # noqa: E402
from bendy_tpu.render import Config, Renderer, RenderConfig, Subsample  # noqa: E402

COUNTS = (8, 16, 32, 64, 128)
LOOPED_COUNTS = (64, 128, 256, 512)  # the fori_loop row sweep
#   (ops/intersect.nearest_hit_looped): compile-flat, XLA path. Overlap
#   at 64/128 measures the crossover against the unrolled megakernel.
W = H = 256
SPP = 64


def measure(n: int, force_looped: bool | None = None) -> dict:
    scene = build_prim_grid(n)
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = W / H
    r = Renderer(scene, Config(max_bounces=4))
    if force_looped is not None:
        orig = r.trace_config

        def tc(cfg, camera_ref=None):
            return orig(cfg, camera_ref)._replace(looped_sweep=force_looped)

        r.trace_config = tc
        # the looped sweep stays in the megakernel: prim_tables() ships the
        # primitive-row matrices as SMEM operands (ops/pallas_trace.py); a
        # Mosaic rejection falls back to the XLA looped path at run time
        # and the row records which one ran via its "pallas" field.
    rc = RenderConfig(samples=SPP, subsample=Subsample(1))
    base = int.from_bytes(os.urandom(4), "little")

    t0 = time.time()
    film = DeviceFilm(W, H)
    r.render(cam_ref, rc, film, seed=base)
    film.block_until_ready()
    compile_s = time.time() - t0  # includes one warm pass (~tens of ms)
    float(r.rays_traced)

    mrays = []
    for i in range(5):
        film = DeviceFilm(W, H)
        r.rays_traced = 0.0
        t0 = time.time()
        for p in range(4):
            r.render(cam_ref, rc, film, seed=base + 1 + 4 * i + p)
        film.block_until_ready()
        dt = time.time() - t0
        mrays.append(r.rays_traced / dt / 1e6)
    host = r.arrays.host_copy()
    return {
        "n_field_prims": n,
        "spheres": int(host.sph_radius.shape[0]),
        "boxes": int(host.box_rough.shape[0]),
        "trace_rects": int(host.rct_traced.shape[0]),
        "pallas": bool(r.use_pallas),
        "looped_sweep": bool(r.trace_config(r.config).looped_sweep),
        "compile_s": round(compile_s, 1),
        "mrays_median": round(statistics.median(mrays), 1),
        "mrays_best": round(max(mrays), 1),
    }


def main() -> None:
    rows = []
    for n in COUNTS:
        row = measure(n, force_looped=False)
        rows.append(row)
        print(row, file=sys.stderr, flush=True)
    looped_rows = []
    for n in LOOPED_COUNTS:
        row = measure(n, force_looped=True)
        looped_rows.append(row)
        print(row, file=sys.stderr, flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "prim_scaling.json")
    with open(out, "w") as f:
        json.dump({"workload": f"{W}x{H}@{SPP}spp mb=4 field scene",
                   "rows": rows, "looped_rows": looped_rows}, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
