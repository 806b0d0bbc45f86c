"""Command-line renderer, mirroring the reference binary's interface.

The reference app (``src/main.rs:49-72``) opens a minifb window and
progressively renders one sample per frame (``main.rs:245-254``), with
Ctrl+P screenshots, Ctrl+K/L scene save/reload, and title-bar telemetry
(``main.rs:352-388``). This is a TPU render node, so the equivalent is
headless: same flags and defaults, progressive passes with per-sample
telemetry on stderr, the tonemapped PNG written to ``--screenshot``.

Additions over the reference CLI (marked [+]):
- ``depth`` output channel (the tracer supports it, the reference CLI
  forgot it — ``src/main.rs:23-29`` vs ``src/tracer/mod.rs:108-115``),
- ``--checkpoint``: persist/resume the raw film (sum + spp + pass
  counter) for exact restarts — the reference only saved tonemapped PNGs,
- ``--save-scene``: round-trip the scene back to (gzipped) JSON,
- ``--seed``: deterministic renders (the reference is entropy-seeded),
- ``--preview-every N``: write intermediate PNGs during long renders,
- ``--turntable N``: orbit animation (camera pose is a traced input, so
  the N frames share one compiled kernel),
- ``POST /camera`` on the preview server: move/aim the live camera.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from bendy_tpu.film import Film
from bendy_tpu.render import Config, Output, Renderer, RenderConfig, Subsample
from bendy_tpu.scene import load_scene, save_scene
from bendy_tpu.scene.graph import Scene, Update, UpdateQueue


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bendy-tpu", description=__doc__.split("\n")[0])
    # reference flags + defaults (``src/main.rs:49-72``)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--height", type=int, default=512)
    p.add_argument(
        "--output",
        choices=["full", "albedo", "normal", "depth"],
        default="full",
    )
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--subsample", type=int, default=2)
    p.add_argument("--screenshot", default="screenshots/render.png")
    p.add_argument("--scene", default="scene.json")
    # [+] extensions
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", default=None, help="film checkpoint (.npz) to resume/save")
    p.add_argument("--checkpoint-every", type=int, default=0, metavar="N",
                   help="also checkpoint every N passes (default: only at "
                        "exit and on POST /checkpoint — each save fetches "
                        "the full film from device, ~24 MB at 1080p over a "
                        "~10 MB/s remote link, so a per-pass cadence would "
                        "dominate a DeviceFilm render)")
    p.add_argument("--save-scene", default=None, help="write the loaded scene back out")
    p.add_argument("--preview-every", type=int, default=0, help="write PNG every N samples")
    p.add_argument("--spp-per-pass", type=int, default=1,
                   help="samples per progressive pass (1 = reference cadence)")
    p.add_argument("--serve", type=int, default=0,
                   help="serve a live preview + control API on this port")
    p.add_argument("--serve-host", default="127.0.0.1",
                   help="preview bind address (control endpoints mutate the "
                        "render — exposing beyond loopback is opt-in)")
    p.add_argument("--max-bounces", type=int, default=None)
    p.add_argument("--volume-step", type=float, default=None)
    p.add_argument("--vol-sampling", choices=["trilinear", "nearest"],
                   default="trilinear",
                   help="density lookup mode (SamplingMode, volume.rs:12-18)")
    # geodesic integration knobs (scenes with mass:<rs> objects)
    p.add_argument("--geo-eta", type=float, default=None,
                   help="geodesic step fraction of distance-to-mass")
    p.add_argument("--geo-max-steps", type=int, default=None,
                   help="RK4 step budget per path")
    p.add_argument("--geo-far", type=float, default=None,
                   help="flat-space switchover radius in units of rs")
    p.add_argument("--turntable", type=int, default=0, metavar="N",
                   help="render N frames orbiting the camera around the scene "
                        "origin (one compiled kernel; camera pose is traced, "
                        "so frames never recompile); writes <screenshot>_###.png")
    p.add_argument("--mesh", default=None, metavar="TILESxSAMPLES",
                   help="render across a device mesh, e.g. 4x2 (shard_map)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a JAX profiler trace of the render into DIR")
    p.add_argument("--compile-cache", default="~/.cache/bendy_tpu/xla",
                   metavar="DIR",
                   help="persistent XLA compilation cache: the first render "
                        "of a (scene-shape, config) pays the 20-40s jit "
                        "compile once per machine, not once per process "
                        "(pass an empty string to disable)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (the TPU answer to debug-glam-assert)")
    return p


def default_scene() -> Scene:
    """The built-in Cornell box (``src/main.rs:108-214``)."""
    from bendy_tpu.models.cornell import build_cornell

    return build_cornell()


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if os.path.exists(args.scene):
        scene = load_scene(args.scene)
        print(f"loaded scene from {args.scene}", file=sys.stderr)
    else:
        scene = default_scene()
        print("scene file missing; using built-in cornell box", file=sys.stderr)

    if args.save_scene:
        save_scene(args.save_scene, scene)
        print(f"saved scene to {args.save_scene}", file=sys.stderr)

    camera = scene.find_by_tag("camera")
    if camera is None:
        print("error: scene has no object tagged 'camera'", file=sys.stderr)
        return 2

    # aspect-ratio sync through the update queue, like the app
    # (``src/main.rs:216-223``)
    queue = UpdateQueue()
    aspect = args.width / args.height

    def set_aspect(obj, _q, _d):
        obj.as_camera().aspect_ratio = aspect

    queue.push(Update.object(camera, set_aspect))
    queue.commit(scene)

    output = Output(args.output)
    geo = None
    if any(v is not None for v in (args.geo_eta, args.geo_max_steps, args.geo_far)):
        from bendy_tpu.geodesic import geo_from_dict

        # flags overlay the scene file's "geodesic" block (which overlays
        # the GeoParams defaults); untouched fields keep the scene's values
        defaults = geo_from_dict(getattr(scene, "geodesic", None))
        geo = defaults._replace(
            **{
                k: v
                for k, v in [
                    ("eta", args.geo_eta),
                    ("max_steps", args.geo_max_steps),
                    ("far", args.geo_far),
                ]
                if v is not None
            }
        )
    renderer = Renderer(
        scene, Config(output=output, vol_sampling=args.vol_sampling, geo=geo)
    )
    subsample = Subsample(0 if args.subsample in (0, 1) else args.subsample)

    # the film lives on device: passes chain with zero host traffic; PNGs,
    # checkpoints and the preview server fetch on their own cadence
    from bendy_tpu.film import DeviceFilm, to_device

    if args.checkpoint and os.path.exists(args.checkpoint):
        film, seed = Film.load_checkpoint(args.checkpoint)
        if (film.width, film.height) != (args.width, args.height):
            print("checkpoint resolution mismatch; starting fresh", file=sys.stderr)
            film = DeviceFilm(args.width, args.height, output.color_space())
        else:
            print(
                f"resumed checkpoint at {film.samples} samples ({film.passes} passes)",
                file=sys.stderr,
            )
            film = to_device(film)
    else:
        film = DeviceFilm(args.width, args.height, output.color_space())

    max_samples = args.samples * max(subsample.n, 1) ** 2
    rc = RenderConfig(
        samples=args.spp_per_pass,
        subsample=subsample,
        max_bounces=args.max_bounces,
        volume_step=args.volume_step,
    )

    if args.compile_cache:
        import jax

        # populated lazily by XLA on every compile >= 1s (so the cornell
        # megakernel caches but per-pass reshapes don't); safe to share
        # between processes — entries are keyed on the serialized program
        # + platform, and a backend that can't serialize just skips it
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser(args.compile_cache)
        )

    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    if args.mesh:
        return render_sharded_oneshot(args, scene, camera, output, subsample)

    if args.turntable:
        return render_turntable(args, scene, renderer, camera, film, rc, max_samples)

    server = None
    if args.serve:
        from bendy_tpu.preview import PreviewServer

        server = PreviewServer(args.serve, host=args.serve_host)
        print(f"live preview at http://{args.serve_host}:{args.serve}/", file=sys.stderr)

    profiler = None
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
        profiler = args.profile

    start = time.time()
    sum_delta = 0.0
    stopped = False
    while film.samples < max_samples and not stopped:
        t0 = time.time()
        renderer.render(camera, rc, film, seed=args.seed)
        delta = time.time() - t0
        sum_delta += delta
        # telemetry cadence mirrors the title bar (``src/main.rs:352-388``)
        print(
            f"samples: {film.samples}/{max_samples}; delta t: {delta*1000:.0f}ms; "
            f"avg t per sample: {sum_delta/max(film.samples,1)*1000:.1f}ms",
            file=sys.stderr,
        )
        if server is not None:
            # rays_traced drains device-pending counters (~1 RTT): lazy,
            # so it syncs only when a /stats client is actually polling
            server.publish(film, lazy=lambda: {"mrays": round(
                renderer.rays_traced / max(sum_delta, 1e-9) / 1e6, 1)})
            for name, cargs in server.drain_commands():
                # a bad command (unwritable path, corrupt scene file, junk
                # resize args) must not take down a multi-hour render
                try:
                    scene, renderer, camera, stop_now = handle_command(
                        name, cargs, args, scene, renderer, camera, film
                    )
                    stopped = stopped or stop_now
                except Exception as e:
                    print(f"command {name!r} failed: {e}", file=sys.stderr)
        if args.preview_every and film.passes % args.preview_every == 0:
            _write_png(args.screenshot, film)
        if (args.checkpoint and args.checkpoint_every
                and film.passes % args.checkpoint_every == 0):
            film.save_checkpoint(args.checkpoint, seed=args.seed)

    if args.checkpoint:  # final state always persists (exact resume)
        film.save_checkpoint(args.checkpoint, seed=args.seed)

    if profiler:
        import jax

        jax.profiler.stop_trace()
        print(f"profiler trace written to {profiler}", file=sys.stderr)

    total = time.time() - start
    print(f"total t: {total:.2f}s; rays traced: {renderer.rays_traced:.0f}; "
          f"{renderer.rays_traced/max(total,1e-9)/1e6:.1f} Mrays/s", file=sys.stderr)
    _write_png(args.screenshot, film)
    if server is not None:
        server.close()
    return 0


def handle_command(name, cargs, args, scene, renderer, camera, film):
    """Apply one runtime control command (the reference's live-loop hotkeys,
    ``src/main.rs:275-348``, received over HTTP between passes).

    Returns the possibly-replaced (scene, renderer, camera, stopped).
    """
    stopped = False
    if name == "screenshot":  # Ctrl+P (main.rs:275-298)
        _write_png(args.screenshot, film)
    elif name == "save-scene":  # Ctrl+K (main.rs:299-313)
        # divergence from the reference: Ctrl+K overwrites the loaded scene
        # file in place; a remote-triggered default should not destroy the
        # input, so the fallback writes alongside it
        path = cargs.get("path") or args.save_scene or args.scene + ".saved.json.gz"
        save_scene(path, scene)
        print(f"saved scene to {path}", file=sys.stderr)
    elif name == "reload-scene":  # Ctrl+L: reload + clear film (main.rs:314-335)
        if not os.path.exists(args.scene):
            print(f"reload failed: {args.scene} missing", file=sys.stderr)
            return scene, renderer, camera, stopped
        scene = load_scene(args.scene)
        camera = scene.find_by_tag("camera")
        scene.get_object(camera).as_camera().aspect_ratio = film.width / film.height
        renderer = Renderer(scene, renderer.config)
        film.clear()
        print(f"reloaded scene from {args.scene}; film cleared", file=sys.stderr)
    elif name == "resize":  # window resize (main.rs:337-348)
        w = int(cargs.get("width", film.width))
        h = int(cargs.get("height", film.height))
        film.resize(w, h)
        scene.get_object(camera).as_camera().aspect_ratio = w / h
        print(f"resized film to {w}x{h}; film cleared", file=sys.stderr)
    elif name == "checkpoint":
        path = cargs.get("path") or args.checkpoint or "film_checkpoint.npz"
        film.save_checkpoint(path, seed=args.seed)
        print(f"checkpoint written to {path}", file=sys.stderr)
    elif name == "camera":  # [+] move/aim the live camera; film restarts
        obj = scene.get_object(camera)
        world = obj.transform.world
        eye = [float(cargs.get(k, world[i, 3])) for i, k in enumerate("xyz")]
        if any(k in cargs for k in ("tx", "ty", "tz")):
            from bendy_tpu.scene.graph import affine_look_at

            target = [float(cargs.get("t" + k, 0.0)) for k in "xyz"]
            obj.transform.set_world(affine_look_at(eye, target))
        else:
            world = world.copy()
            world[:, 3] = eye
            obj.transform.set_world(world)
        film.clear()
        # camera pose is a traced input: the next pass reuses the compiled
        # kernel (Renderer.camera_params re-packs the [1,32] buffer)
        print(f"camera moved to {eye}; film cleared", file=sys.stderr)
    elif name == "stop":
        stopped = True
        print("stop requested; finishing up", file=sys.stderr)
    return scene, renderer, camera, stopped


def render_turntable(args, scene, renderer, camera, film, rc, max_samples) -> int:
    """[+] N-frame orbit animation around the scene origin.

    The orbit keeps the camera's initial height and distance and aims at
    the origin each frame. Camera pose is a *traced* kernel input (the
    packed [1,32] buffer, ops/pallas_trace.pack_camera), so all frames
    after the first reuse the compiled kernel — per-frame cost is pure
    render time. Frames go to <screenshot>_###.png.
    """
    import math

    import numpy as np

    from bendy_tpu.scene.graph import affine_look_at

    obj = scene.get_object(camera)
    eye0 = np.asarray(obj.transform.world[:, 3], np.float64)
    radius = math.hypot(eye0[0], eye0[2])
    if radius < 1e-9:
        print("error: camera sits on the orbit axis (y); move it first",
              file=sys.stderr)
        return 2
    phase = math.atan2(eye0[0], eye0[2])
    base, ext = os.path.splitext(args.screenshot)
    start = time.time()
    for i in range(args.turntable):
        a = phase + 2.0 * math.pi * i / args.turntable
        eye = (radius * math.sin(a), eye0[1], radius * math.cos(a))
        obj.transform.set_world(affine_look_at(eye, (0.0, 0.0, 0.0)))
        film.clear()
        t0 = time.time()
        while film.samples < max_samples:
            renderer.render(camera, rc, film, seed=args.seed + i)
        _write_png(f"{base}_{i:03d}{ext}", film)
        print(f"frame {i + 1}/{args.turntable}: {time.time() - t0:.2f}s",
              file=sys.stderr)
    total = time.time() - start
    print(f"turntable: {args.turntable} frames in {total:.2f}s "
          f"({total / args.turntable:.2f}s/frame)", file=sys.stderr)
    return 0


def render_sharded_oneshot(args, scene, camera, output, subsample) -> int:
    """One-shot multi-device render over a ('tiles','samples') mesh."""
    import time

    from bendy_tpu.parallel.mesh import make_mesh, render_film_sharded

    tiles, samples = (int(v) for v in args.mesh.lower().split("x"))
    mesh = make_mesh(tiles, samples)
    renderer = Renderer(scene, Config(output=output))
    cam = renderer.camera_params(camera)
    cfg = renderer.trace_config(renderer.config)
    spp_local = max(1, args.samples // samples)
    t0 = time.time()
    sums, spp, rays = render_film_sharded(
        renderer.arrays, cam, mesh, args.width, args.height,
        spp_local, subsample.n, cfg, output.value, seed=args.seed,
    )
    film = Film(args.width, args.height, output.color_space())
    import numpy as np

    film.add_pass(np.asarray(sums), spp)
    dt = time.time() - t0
    print(f"mesh {tiles}x{samples}: {film.samples} spp in {dt:.2f}s; "
          f"{rays/dt/1e6:.1f} Mrays/s", file=sys.stderr)
    _write_png(args.screenshot, film)
    return 0


def _write_png(path: str, film: Film) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    film.save_png(path)
    print(f"saved screenshot to {path}", file=sys.stderr)


if __name__ == "__main__":
    raise SystemExit(main())
