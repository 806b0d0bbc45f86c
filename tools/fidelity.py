"""Regenerate docs/fidelity.json: MSE-vs-spp curves against the oracle.

For every bundled scene (and the blackhole geodesic showcase), renders
the framework at several spp levels and compares against a high-spp
C++-oracle ground truth (``native/oracle.cpp`` — for blackhole its
independent RK4 geodesic implementation). An unbiased estimator of the
same integral shows mse ~ 1/spp with bias -> 0; a systematic estimator
difference shows up as a bias floor.

Run from the repo root (uses the configured JAX platform — TPU under
axon, CPU elsewhere):

    python3 tools/fidelity.py [--res 24] [--ref-spp 8192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_ours(scene, cam_ref, width, height, spp, max_bounces, seed=5):
    import jax.numpy as jnp

    from bendy_tpu.ops.wavefront import trace
    from bendy_tpu.render import Config, Renderer
    from bendy_tpu.utils.rng import render_key

    r = Renderer(scene, Config(max_bounces=max_bounces))
    pix = jnp.arange(width * height, dtype=jnp.uint32)
    sub = jnp.zeros(width * height, jnp.uint32)
    res = trace(
        r.arrays, r.camera_params(cam_ref), render_key(jnp.uint32(seed), jnp.uint32(0)),
        pix, sub, width, height, spp, 1, r.trace_config(r.config),
    )
    return np.stack(
        [np.asarray(c).reshape(height, width) for c in res.radiance], -1
    ) / spp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=24)
    ap.add_argument("--ref-spp", type=int, default=8192)
    ap.add_argument("--ref-spp-geodesic", type=int, default=2048)
    ap.add_argument("--spp", type=int, nargs="*", default=[16, 64, 256, 1024])
    ap.add_argument("--max-bounces", type=int, default=4)
    ap.add_argument("--out", default="docs/fidelity.json")
    args = ap.parse_args()

    from bendy_tpu.native import oracle_render_scene
    from bendy_tpu.scene import load_scene

    W = H = args.res
    out = {}
    scenes = ["cornell", "cornell2", "scene", "volume", "cloud", "blackhole"]
    for name in scenes:
        scene = load_scene(f"scenes/{name}.json.gz")
        cam_ref = scene.find_by_tag("camera")
        cam = scene.get_object(cam_ref).inner
        cam.aspect_ratio = 1.0
        cam.focus = None  # defocus noise would swamp low-spp MSE
        geodesic = name == "blackhole"
        mb = 2 if geodesic else args.max_bounces
        ref_spp = args.ref_spp_geodesic if geodesic else args.ref_spp
        t0 = time.time()
        ref = oracle_render_scene(scene, W, H, ref_spp, seed=11, max_bounces=mb)
        print(f"{name}: oracle {ref_spp} spp in {time.time()-t0:.0f}s", file=sys.stderr)
        nonlight = ref.mean(-1) < 3.0  # exclude direct-light pixels
        entry = {}
        for spp in args.spp:
            img = render_ours(scene, cam_ref, W, H, spp, mb)
            diff = img - ref
            entry[str(spp)] = {
                "mse": float((diff**2).mean()),
                "mse_nonlight": float((diff**2).mean(-1)[nonlight].mean()),
                "bias_nonlight": float(diff.mean(-1)[nonlight].mean()),
            }
            print(f"{name} spp={spp}: {entry[str(spp)]}", file=sys.stderr)
        out[name] = entry

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
