"""Headline benchmark: Mrays/sec/chip on cornell.json.gz.

BASELINE.md target: >= 50 Mrays/sec/chip at 256x256 @ 64 spp (the
reference app's default adds a 2x2 subpixel grid, ``src/main.rs:64-65``,
so 256 camera rays/pixel). A "ray" is one alive-lane wavefront iteration:
one full scene intersection + shade, the unit the reference's recursive
``sample`` performs per call.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

from bendy_tpu.film import Film
from bendy_tpu.render import Config, Renderer, RenderConfig, Subsample
from bendy_tpu.scene import load_scene

TARGET = 50.0  # Mrays/sec/chip (BASELINE.json)


def timed_render(scene, width, height, samples, subsample, config=Config(), repeats=5):
    """(best Mrays/s, best seconds) over ``repeats`` fresh-seed passes.

    Warmup shares the measured statics (different statics would time a
    recompile); repeats absorb the remote-dispatch latency jitter that
    dominates sub-second measurements on tunneled devices.
    """
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = width / height
    r = Renderer(scene, config)
    rc = RenderConfig(samples=samples, subsample=Subsample(subsample))
    r.render(cam_ref, rc, Film(width, height), seed=1)  # warmup: compile
    best = (0.0, float("inf"))
    for i in range(repeats):
        film = Film(width, height)
        r.rays_traced = 0.0
        t0 = time.time()
        r.render(cam_ref, rc, film, seed=100 + i)
        dt = time.time() - t0
        if dt < best[1]:
            best = (r.rays_traced / dt / 1e6, dt)
    return best


def main() -> None:
    scene = load_scene("scenes/cornell.json.gz")
    mrays, dt = timed_render(scene, 256, 256, 64, 2)
    print(
        json.dumps(
            {
                "metric": "Mrays/sec/chip cornell 256x256@64spp(x4 subpixels)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / TARGET, 3),
            }
        )
    )

    if "--full" in sys.argv:
        results = {"cornell": {"mrays": round(mrays, 2), "seconds": round(dt, 3)}}
        for name, spp, sub in [
            ("cornell2", 64, 2),
            ("scene", 64, 2),
            ("volume", 64, 2),
            ("cloud", 64, 2),
        ]:
            m, d = timed_render(load_scene(f"scenes/{name}.json.gz"), 256, 256, spp, sub)
            results[name] = {"mrays": round(m, 2), "seconds": round(d, 3)}
            print(f"{name}: {m:.1f} Mrays/s ({d:.2f}s)", file=sys.stderr)
        m, d = timed_render(
            load_scene("scenes/blackhole.json.gz"), 512, 512, 32, 1,
            Config(max_bounces=2),
        )
        # the lensed north-star config, linearly projected to a v5e-8 pod
        proj = d * (1920 * 1080 * 256) / (512 * 512 * 32) / 8
        results["blackhole_geodesic"] = {
            "mrays": round(m, 2),
            "seconds": round(d, 3),
            "projected_1080p_256spp_v5e8_s": round(proj, 1),
        }
        print(
            f"blackhole: {m:.1f} Mrays/s ({d:.2f}s); projected 1080p@256spp "
            f"on v5e-8: {proj:.1f}s",
            file=sys.stderr,
        )
        with open("benches_results.json", "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
