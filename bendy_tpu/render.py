"""Renderer front-end: configs, pass scheduling, channel selection.

API mirrors the reference's tracer layer (``src/tracer/mod.rs:16-230``):
``Config`` (static knobs), ``RenderConfig`` (per-call overrides),
``Subsample``, ``Output``, ``Status`` — with the same defaults.

Divergence note: ``ChunkConfig::with_configs`` in the reference assigns
``render.max_bounces`` to ``max_volume_bounces`` (``src/tracer/mod.rs:224``),
a latent bug that only bites when a caller overrides ``max_bounces``. We
implement the evident intent (each override maps to its own field) and keep
``replicate_merge_bug=True`` available for bit-parity experiments.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bendy_tpu.film import Film
from bendy_tpu.geodesic import GeoParams
from bendy_tpu.ops.camera import CameraParams
from bendy_tpu.ops.wavefront import TraceConfig, trace
from bendy_tpu.scene.compiler import SceneArrays, compile_scene
from bendy_tpu.scene.graph import Scene, Sphere
from bendy_tpu.utils.rng import render_key
from bendy_tpu.utils.v3 import V3


class Output(enum.Enum):
    FULL = "full"
    ALBEDO = "albedo"
    NORMAL = "normal"
    DEPTH = "depth"

    def color_space(self) -> str:
        """Default preview conversion per channel (``src/main.rs:40-47``)."""
        return "normal" if self is Output.NORMAL else "srgb"


class Status(enum.Enum):
    DONE = "done"
    IN_PROGRESS = "in_progress"


@dataclass(frozen=True)
class Subsample:
    """n×n subpixel grid; n<=1 means none (``tracer/mod.rs:47-106``)."""

    n: int = 1

    @property
    def subpixel_count(self) -> int:
        return max(self.n, 1) ** 2


@dataclass(frozen=True)
class Config:
    """Defaults = ``Config::DEFAULT`` (``src/tracer/mod.rs:29-38``).

    ``geo`` configures the geodesic propagator (new capability); it only
    takes effect when the scene contains ``mass:<rs>``-tagged objects.
    """

    max_bounces: int = 8
    max_volume_bounces: int = 32
    clip_min: float = 0.01
    clip_max: float = 1000.0
    volume_step: float = 0.1
    vol_sampling: str = "trilinear"  # 'trilinear' | 'nearest'
    #   (``SamplingMode``, volume.rs:12-18; the reference tracer always
    #   passes Trilinear, volume.rs:36)
    output: Output = Output.FULL
    geo: "GeoParams" = None  # type: ignore[assignment]


@dataclass(frozen=True)
class RenderConfig:
    """Per-call overrides (``src/tracer/mod.rs:117-157``)."""

    samples: int = 64
    subsample: Subsample = Subsample(1)
    output: Optional[Output] = None
    max_bounces: Optional[int] = None
    max_volume_bounces: Optional[int] = None
    volume_step: Optional[float] = None


def merged_config(main: Config, render: RenderConfig, replicate_merge_bug: bool = False) -> Config:
    """Overlay per-call overrides (``ChunkConfig::with_configs``)."""
    max_vb = render.max_volume_bounces
    if replicate_merge_bug:
        max_vb = render.max_bounces  # the ``:224`` quirk, opt-in only
    return replace(
        main,
        output=render.output or main.output,
        max_bounces=main.max_bounces if render.max_bounces is None else render.max_bounces,
        max_volume_bounces=main.max_volume_bounces if max_vb is None else max_vb,
        volume_step=main.volume_step if render.volume_step is None else render.volume_step,
    )


LOOP_SWEEP_THRESHOLD = 192  # primitives (spheres + traced rects + boxes)
#   above which the renderer swaps the statically-unrolled primitive sweep
#   for the fori_loop row sweep (ops/intersect.nearest_hit_looped). The
#   unrolled sweep's compile time grows superlinearly with the count
#   (docs/prim_scaling.json, on-chip: 17.6 s at 32 prims, 37.5 at 64,
#   49 at 128) while the looped sweep compiles in constant ~13 s. Both
#   paths were measured head-to-head on hardware (tools/prim_scaling.py,
#   64-512 prims, both in the megakernel): the looped sweep holds
#   ~73-77% of the unrolled throughput at equal count, so there is NO
#   throughput crossover — the threshold trades compile latency for
#   steady-state speed. 192 keeps every bundled scene and any
#   interactive-scale scene on the fast unroll (<~1 min compile) and
#   moves scenes whose unrolled compile would exceed minutes (and
#   XLA-CPU's ~20 min at 66 prims) onto the flat-compile loop. Raise it
#   if long renders dominate; lower it for edit-compile-render loops.
#   The megakernel stays on:
#   cfg.looped_sweep makes it ship the primitive-row tables as SMEM
#   operands and read them with scalar loads (ops/pallas_trace.py) —
#   baked constants cannot be indexed by a traced row id, scalar memory
#   can. Mosaic rejections fall back to the XLA path at run time.


LIGHT_LOOP_THRESHOLD = 64  # LIGHT-flagged objects above which the light
#   sweeps (next-event point sampling + light pdf, run EVERY diffuse
#   shade) switch from the per-light unroll to fori_loops. Decoupled
#   from LOOP_SWEEP_THRESHOLD (r4): a large scene with few lights keeps
#   the unrolled light sweeps — under the baked megakernel scene they
#   fold axis-aligned face terms at trace time (~44 -> ~17 ops per rect
#   face), which SMEM row loads cannot. Bit-identical either way
#   (tests/test_looped_sweep.py::test_looped_lights_bit_identical); the
#   threshold only trades the light unroll's compile cost (~100 ops per
#   light) against the loop's lost const folding.


MASS_LOOP_THRESHOLD = 8  # geodesic point masses above which the mass
#   sweep (capture/far/step + 4 RK4-stage accelerations, run EVERY
#   geodesic iteration) switches from the static per-mass unroll to
#   fori_loops over a [M_pad, 5] mass table (geodesic.mass_table) — the
#   cluster-lensing scale path. The unrolled form carries one frozen-h²
#   [B] array per mass across the whole loop body (exactly the [M,B]
#   residency the hot-path rules forbid) and its compile time grows with
#   the mass count like any unroll; the looped form recomputes h² per
#   stage (same ODE; physics + parity gates in
#   tests/test_looped_masses.py) and compiles O(1) in M. Every bundled
#   1-2-mass scene keeps the tuned unroll; the megakernel ships the
#   table as an SMEM operand like the primitive tables.


def derive_regen_every(has_masses: bool, backend: str | None = None) -> int:
    """Regen (finalize+camera) cadence for the current backend.

    The cadence is a pure scheduling static — output is bit-identical for
    any k (gated by tests/test_cadence.py) — so it is tuned per backend:

    - TPU: swept under tile-major lane ordering, every scene class
      amortizes the regen block. Flat/volume scenes derive 2 (cornell
      1664 -> 1842 Mrays/s; 4 loses — deaths are frequent, idle
      iterations overtake the saved camera math). Geodesic paths are
      100s of iterations with rare deaths: 8 wins (blackhole
      2655 -> 2987, disk showcase 2230 -> 2408; 16 over-delays).
    - CPU (tests/dev): 1. XLA-CPU compile time grows superlinearly with
      the k-unrolled loop body (blackhole config: 5.6 s at k=1, 11.7 at
      2, 102 at 8) and a CPU backend has no VPU issue slots to save.
    """
    backend = jax.default_backend() if backend is None else backend
    if backend == "cpu":
        return 1
    return 8 if has_masses else 2


@partial(
    jax.jit,
    static_argnames=("width", "height", "rows", "spp", "subsample", "cfg", "output"),
)
def render_pass(
    scn: SceneArrays,
    cam: CameraParams,
    seed,
    pass_idx,
    y_offset,
    width: int,
    height: int,
    rows: int,
    spp: int,
    subsample: int,
    cfg: TraceConfig,
    output: str,
):
    """One pass over image rows [y_offset, y_offset+rows): each lane is a
    (pixel, subpixel) and traces its spp samples sequentially inside the
    wavefront loop (ray regeneration).

    Returns (per-pixel channel sums [rows,W,3], traced-ray count). Sample
    ids are global, so any row chunking produces bit-identical images.
    """
    n = max(subsample, 1)
    nn = n * n
    B = rows * width * nn
    local = jnp.arange(B, dtype=jnp.uint32)
    sub = local % jnp.uint32(nn)
    pix = jnp.asarray(y_offset, jnp.uint32) * jnp.uint32(width) + local // jnp.uint32(nn)
    key = render_key(jnp.asarray(seed, jnp.uint32), jnp.asarray(pass_idx, jnp.uint32))
    res = trace(scn, cam, key, pix, sub, width, height, spp, n, cfg)

    if output == "full":
        ch = res.radiance
    elif output == "albedo":
        ch = res.aov_albedo
    elif output == "normal":
        ch = res.aov_normal
    elif output == "depth":
        d = res.aov_depth  # already normalized+clamped per sample
        ch = V3(d, d, d)
    else:
        raise ValueError(f"unknown output {output!r}")

    sums = jnp.stack(
        [c.reshape(rows, width, nn).sum(axis=2) for c in (ch.x, ch.y, ch.z)], axis=-1
    )
    return sums, res.rays


class Renderer:
    """Progressive scene renderer (the reference's ``Tracer``).

    ``max_lanes`` bounds the megabatch per device dispatch; larger renders
    are chunked by samples and image rows. Chunking is invisible: lane ids
    (hence RNG keys) are global, so any chunking yields the same image.
    """

    def __init__(
        self,
        scene: Scene,
        config: Config = Config(),
        max_lanes: int = 1 << 21,
        use_pallas: Optional[bool] = None,
    ) -> None:
        self.config = config
        self.scene = scene
        self.arrays = compile_scene(scene)
        self.max_lanes = max_lanes
        self._rays_host = 0.0
        self._rays_pending: list = []
        # Pallas megakernel path: one kernel launch per pass vs ~60 XLA
        # kernels per loop iteration (measured ~2.2x on cornell). Default:
        # on for TPU devices, off elsewhere (Mosaic is TPU-only).
        if use_pallas is None:
            import jax

            use_pallas = jax.devices()[0].platform != "cpu"
        self.use_pallas = use_pallas
        self._pallas_cache: dict = {}
        self.has_volumes = any(
            isinstance(o.inner, Sphere) and o.inner.volume is not None for o in scene.iter()
        )
        self.has_masses = any(
            o.tag is not None and o.tag.startswith("mass:") for o in scene.iter()
        )
        # static material facts: branches for kinds no primitive carries are
        # dead code in every lane, so the integrator drops them (exact)
        host = self.arrays.host_copy()
        mtypes = set(host.sph_mtype.tolist()) | set(host.rct_mtype.tolist())
        from bendy_tpu.scene.compiler import MAT_DIFFUSE, MAT_GLASS, MAT_METALLIC

        self.has_diffuse = MAT_DIFFUSE in mtypes
        self.has_metallic = MAT_METALLIC in mtypes
        self.has_glass = MAT_GLASS in mtypes
        self.prim_count = (
            self.arrays.n_spheres + self.arrays.n_trace_rects + self.arrays.n_boxes
        )

    @property
    def rays_traced(self) -> float:
        """Total traced rays; fetches any device-pending pass counters.

        Pass counters accumulate as unsynchronized device scalars so a
        DeviceFilm render never blocks on the host; reading this property
        settles them in one batched fetch.
        """
        if self._rays_pending:
            import jax

            vals = jax.device_get(self._rays_pending)
            self._rays_host += float(np.sum(vals))
            self._rays_pending = []
        return self._rays_host

    @rays_traced.setter
    def rays_traced(self, value: float) -> None:
        self._rays_host = float(value)
        self._rays_pending = []

    def camera_params(self, camera_ref: int, aspect_override: Optional[float] = None) -> CameraParams:
        """Device camera params, cached until the camera actually changes.

        All 18 scalars ship in ONE packed [1,32] transfer (the megakernel's
        pack_camera layout) and the CameraParams views are built once per
        camera change — a progressive render with a static camera costs
        zero host->device traffic per pass (each eager put is a full RTT
        on remote devices).
        """
        obj = self.scene.get_object(camera_ref)
        cam = obj.as_camera()
        if cam is None:
            raise ValueError("expected a camera object")
        world = obj.transform.world
        aspect = cam.aspect_ratio if aspect_override is None else aspect_override
        from bendy_tpu.ops.pallas_trace import pack_camera_host, unpack_camera

        vec = pack_camera_host(
            cam.sensor_size, cam.focal_length, aspect, cam.fstop,
            -1.0 if cam.focus is None else cam.focus,
            2.0 * np.arctan2(cam.sensor_size, 2.0 * cam.focal_length),
            world[:, :3], world[:, 3],
        )
        key = vec.tobytes()
        if getattr(self, "_cam_key", None) != key:
            self._cam_packed = jnp.asarray(vec)  # the one transfer
            self._cam_params = unpack_camera(self._cam_packed)
            self._cam_key = key
        return self._cam_params

    def trace_config(self, cfg: Config, camera_ref: Optional[int] = None) -> TraceConfig:
        if cfg.vol_sampling not in ("trilinear", "nearest"):
            raise ValueError(f"unknown vol_sampling {cfg.vol_sampling!r}")
        frustum_poly = False
        has_dof = True
        if camera_ref is not None:
            cam = self.scene.get_object(camera_ref).as_camera()
            if cam is not None:
                yfov = 2.0 * np.arctan2(cam.sensor_size, 2.0 * cam.focal_length)
                # frustum angles are bounded by max(yfov, xfov)/2 (+jitter);
                # below ~1.2 rad the polynomial sin/cos is exact to f32
                frustum_poly = 0.5 * yfov * max(1.0, cam.aspect_ratio) * 1.05 < 1.2
                # focus=None is a static camera fact: the thin-lens block
                # drops out of the loop body (changing it rebuilds, as any
                # TraceConfig change does)
                has_dof = cam.focus is not None and cam.focus > 0.0
        return TraceConfig(
            max_bounces=cfg.max_bounces,
            max_volume_bounces=cfg.max_volume_bounces,
            clip_min=cfg.clip_min,
            clip_max=cfg.clip_max,
            volume_step=cfg.volume_step,
            vol_nearest=cfg.vol_sampling == "nearest",
            frustum_poly=frustum_poly,
            has_volumes=self.has_volumes,
            geodesic=self.has_masses,
            # precedence: explicit Config.geo (API/CLI) > scene-file
            # "geodesic" block > GeoParams defaults
            geo=cfg.geo if cfg.geo is not None else self._scene_geo(),
            has_diffuse=self.has_diffuse,
            has_metallic=self.has_metallic,
            has_glass=self.has_glass,
            has_dof=has_dof,
            regen_every=derive_regen_every(self.has_masses),
            looped_sweep=self.prim_count > LOOP_SWEEP_THRESHOLD,
            looped_lights=self.arrays.n_lights > LIGHT_LOOP_THRESHOLD,
            looped_masses=self.arrays.n_masses > MASS_LOOP_THRESHOLD,
            # the AOV pipeline (13 extra loop-carry arrays) compiles only
            # when an AOV channel is actually requested
            want_aovs=cfg.output is not Output.FULL,
        )

    def _scene_geo(self):
        """GeoParams from the scene file's 'geodesic' block, or None."""
        block = getattr(self.scene, "geodesic", None)
        if not block:
            return None
        from bendy_tpu.geodesic import geo_from_dict

        return geo_from_dict(block)

    def render(
        self,
        camera_ref: int,
        render_config: RenderConfig,
        film: Film,
        seed: int = 0,
    ) -> Status:
        """Render ``render_config.samples`` spp into the film, one pass.

        Early-outs on samples == 0 and otherwise reports IN_PROGRESS,
        exactly like ``Tracer::render`` (``tracer/mod.rs:186,201``).
        """
        if render_config.samples == 0:
            return Status.DONE
        cfg = merged_config(self.config, render_config)
        cam = self.camera_params(camera_ref)
        tcfg = self.trace_config(cfg, camera_ref)
        W, H = film.width, film.height
        nn = render_config.subsample.subpixel_count
        n = max(render_config.subsample.n, 1)

        # one lane per (pixel, subpixel); spp runs inside the wavefront via
        # ray regeneration. Rows are chunked so a dispatch stays <= max_lanes.
        # Pass sums stay device arrays end to end: a host Film converts in
        # add_pass; a DeviceFilm chains the accumulation with no transfer
        # and no sync (remote links are ~40 ms RTT / ~10 MB/s).
        rows_chunk = min(H, max(1, self.max_lanes // max(W * nn, 1)))
        parts = []
        for y0 in range(0, H, rows_chunk):
            rows = min(rows_chunk, H - y0)
            entry = (
                self._pallas_render_pass(W, H, rows, render_config.samples, n, tcfg, cfg)
                if self.use_pallas
                else None
            )
            sums = None
            if entry is not None:
                try:
                    sums, rays = entry["fn"](
                        self._cam_packed, jnp.uint32(seed), jnp.uint32(film.passes),
                        jnp.uint32(y0),
                    )
                    if not entry["validated"]:
                        # force one synchronous execution: Mosaic rejections
                        # surface at run time, not at build time
                        import jax

                        jax.block_until_ready(sums)
                        entry["validated"] = True
                except Exception as e:  # pragma: no cover - device-dependent
                    import sys

                    print(f"pallas path rejected ({type(e).__name__}); "
                          "falling back to XLA", file=sys.stderr)
                    self.use_pallas = False
                    sums = None
            if sums is None:
                sums, rays = render_pass(
                    self.arrays,
                    cam,
                    jnp.uint32(seed),
                    jnp.int32(film.passes),
                    jnp.int32(y0),
                    W,
                    H,
                    rows,
                    render_config.samples,
                    n,
                    tcfg,
                    cfg.output.value,
                )
            parts.append(sums)
            self._rays_pending.append(rays)
        film.add_pass(
            jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0],
            render_config.samples * nn,
        )
        return Status.IN_PROGRESS

    def vol_operand(self) -> bool:
        """Dense-grid megakernel policy: grid as a kernel operand?

        The kernel has two trilinear-lookup strategies (ops/volume.py):
        the baked scalar unroll costs ~3 VPU ops per NONZERO cell per
        iteration, the MXU brick-table contraction a fixed cost per
        iteration scaling with the brick count D·H·W/64 regardless of
        sparsity (both measured on v5e). The unroll also
        bloats compile time with the cell count, so it is capped at 4096
        cells outright. Bundled sparse scenes (volume 240, cloud 523,
        blackhole_cloud 712 nnz) keep the cheaper unroll; dense or large
        grids now stay in the megakernel instead of falling back to the
        launch-bound XLA path (the old >1024-nnz bail-out).
        """
        if not self.has_volumes:
            return False
        grid = self.arrays.host_copy().vol_grid
        _, D, H, _ = grid.shape
        nnz = int((grid != 0).sum())
        return nnz > min(4096, 10 * D * H)

    def _pallas_render_pass(self, W, H, rows, spp, n, tcfg, cfg):
        """Cached megakernel pass entry {fn, validated}; None if Mosaic
        rejects this config (falls back to the XLA path for the config)."""
        key = (W, H, rows, spp, n, tcfg, cfg.output.value)
        if key not in self._pallas_cache:
            try:
                from bendy_tpu.ops.pallas_trace import make_pallas_render_pass

                self._pallas_cache[key] = {
                    "fn": make_pallas_render_pass(
                        self.arrays, W, H, rows, spp, n, tcfg, cfg.output.value,
                        vol_operand=self.vol_operand(),
                    ),
                    "validated": False,
                }
            except Exception:
                self._pallas_cache[key] = None
        return self._pallas_cache[key]
