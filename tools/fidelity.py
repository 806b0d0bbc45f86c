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

# Every bundled scene: flat, volumetric, dense-grid, geodesic, and the
# geodesic x media showcases (multi-mass incl.). tests/test_scene.py
# cross-checks this table against scenes/*.json.gz and docs/fidelity.json
# so a new bundled scene cannot ship without a fidelity entry.
FIDELITY_SCENES = {
    "cornell": {},
    "cornell2": {},
    "scene": {},
    "volume": {},
    "cloud": {},
    "dense_cloud": {},
    "cuboid_light": {},  # F>1 face-CDF light sampling (VERDICT r3 #3)
    "blackhole": {"geodesic": True},
    "binary_blackhole": {"geodesic": True},
    "blackhole_cloud": {"geodesic": True, "volume_step": 0.6},
    # 256 volume puffs through the looped primitive sweep's march path.
    # Reduced ref/spot spp: the O(prims)-per-march-step oracle costs
    # ~30x cornell per sample on this 1-core host; 4096 keeps ref noise
    # ~16x below the largest compared spp point (256).
    "cloud_field": {"ref_spp": 4096, "spot_ref_spp": 1024,
                    "spp": [16, 64, 256]},
    # 64 looped masses; emissive-only, so paths are deterministic per
    # (pixel, sample) — only camera jitter is random. The oracle
    # recomputes h per RK4 stage, the SAME discretization as the looped
    # mass sweep (see tests/test_looped_masses.py), so modest ref spp
    # suffices; near-caustic pixels are chaos-limited and the spot
    # corr_noise_ceiling is the honest yardstick there.
    "mass_cluster": {"geodesic": True, "ref_spp": 256},
}


def render_ours(scene, cam_ref, width, height, spp, max_bounces, seed=5,
                volume_step=None):
    import jax.numpy as jnp

    from bendy_tpu.ops.wavefront import trace
    from bendy_tpu.render import Config, Renderer
    from bendy_tpu.utils.rng import render_key

    kw = {"max_bounces": max_bounces}
    if volume_step is not None:
        kw["volume_step"] = volume_step
    r = Renderer(scene, Config(**kw))
    pix = jnp.arange(width * height, dtype=jnp.uint32)
    sub = jnp.zeros(width * height, jnp.uint32)
    res = trace(
        r.arrays, r.camera_params(cam_ref), render_key(jnp.uint32(seed), jnp.uint32(0)),
        pix, sub, width, height, spp, 1, r.trace_config(r.config, cam_ref),
    )
    return np.stack(
        [np.asarray(c).reshape(height, width) for c in res.radiance], -1
    ) / spp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=24)
    ap.add_argument("--spot-res", type=int, default=48,
                    help="higher-res structural spot check (fine features "
                    "like caustics/lensing rings are invisible at 24²)")
    ap.add_argument("--spot-spp", type=int, default=512)
    ap.add_argument("--spot-ref-spp", type=int, default=2048,
                    help="oracle spp for the spot check (a structural "
                    "correlation gate needs far less than the MSE curve)")
    ap.add_argument("--ref-spp", type=int, default=8192)
    ap.add_argument("--ref-spp-geodesic", type=int, default=2048)
    ap.add_argument("--spp", type=int, nargs="*", default=[16, 64, 256, 1024])
    ap.add_argument("--max-bounces", type=int, default=4)
    ap.add_argument("--out", default="docs/fidelity.json")
    ap.add_argument("--scenes", nargs="*", default=None)
    args = ap.parse_args()

    from bendy_tpu.native import oracle_render_scene
    from bendy_tpu.render import Config, Renderer
    from bendy_tpu.scene import load_scene

    W = H = args.res
    out = {}
    scenes = dict(FIDELITY_SCENES)
    if args.scenes:
        scenes = {k: scenes[k] for k in args.scenes}
    for name, opts in scenes.items():
        scene = load_scene(f"scenes/{name}.json.gz")
        cam_ref = scene.find_by_tag("camera")
        cam = scene.get_object(cam_ref).inner
        cam.aspect_ratio = 1.0
        cam.focus = None  # defocus noise would swamp low-spp MSE
        geodesic = opts.get("geodesic", False)
        vstep = opts.get("volume_step")
        mb = 2 if geodesic else args.max_bounces
        ref_spp = args.ref_spp_geodesic if geodesic else args.ref_spp
        ref_spp = opts.get("ref_spp", ref_spp)
        okw = {"max_bounces": mb}
        if vstep is not None:
            okw["volume_step"] = vstep
        if geodesic:
            okw["geo"] = Renderer(
                scene, Config(max_bounces=mb)
            ).trace_config(Config(max_bounces=mb), cam_ref).geo
        entry = {}
        spot_ref = opts.get("spot_ref_spp", args.spot_ref_spp)
        for res_px, spps, tag in (
            (args.res, opts.get("spp", args.spp), ""),
            (args.spot_res, [args.spot_spp], "spot"),
        ):
            rspp = min(ref_spp, spot_ref) if tag else ref_spp
            t0 = time.time()
            ref = oracle_render_scene(scene, res_px, res_px, rspp, seed=11,
                                      **okw)
            print(f"{name}@{res_px}: oracle {rspp} spp in "
                  f"{time.time()-t0:.0f}s", file=sys.stderr)
            nonlight = ref.mean(-1) < 3.0  # exclude direct-light pixels
            for spp in spps:
                img = render_ours(scene, cam_ref, res_px, res_px, spp, mb,
                                  volume_step=vstep)
                diff = img - ref
                key = f"spot{res_px}_{spp}" if tag else str(spp)
                entry[key] = {
                    "mse": float((diff**2).mean()),
                    "mse_nonlight": float((diff**2).mean(-1)[nonlight].mean()),
                    "bias_nonlight": float(diff.mean(-1)[nonlight].mean()),
                }
                if tag:  # structural check: correlation of fine features
                    entry[key]["corr"] = float(np.corrcoef(
                        img.mean(-1).ravel(), ref.mean(-1).ravel())[0, 1])
                    # corr is noise-limited for near-uniform images (a
                    # homogeneous fog ball has little spatial signal):
                    # the honest yardstick is an ORACLE render at the
                    # same spp vs the reference, not 1.0
                    ceil = oracle_render_scene(scene, res_px, res_px, spp,
                                               seed=12, **okw)
                    entry[key]["corr_noise_ceiling"] = float(np.corrcoef(
                        ceil.mean(-1).ravel(), ref.mean(-1).ravel())[0, 1])
                print(f"{name}@{res_px} spp={spp}: {entry[key]}",
                      file=sys.stderr)
        out[name] = entry

    if args.scenes and os.path.exists(args.out):
        # partial regeneration merges into the existing table
        with open(args.out) as f:
            merged = json.load(f)
        merged.update(out)
        out = merged
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
