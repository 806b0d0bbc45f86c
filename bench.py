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
import time

from bendy_tpu.film import Film
from bendy_tpu.render import Renderer, RenderConfig, Subsample
from bendy_tpu.scene import load_scene

TARGET = 50.0  # Mrays/sec/chip (BASELINE.json)


def main() -> None:
    scene = load_scene("scenes/cornell.json.gz")
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene)

    film = Film(256, 256)
    # warmup pass: compiles the (scene-shape, batch, config) program
    r.render(cam_ref, RenderConfig(samples=8, subsample=Subsample(2)), film, seed=1)

    film = Film(256, 256)
    r.rays_traced = 0.0
    t0 = time.time()
    r.render(cam_ref, RenderConfig(samples=64, subsample=Subsample(2)), film, seed=0)
    dt = time.time() - t0

    mrays = r.rays_traced / dt / 1e6
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


if __name__ == "__main__":
    main()
