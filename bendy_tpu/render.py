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
from bendy_tpu.ops.camera import CameraParams, camera_rays
from bendy_tpu.ops.wavefront import TraceConfig, trace
from bendy_tpu.scene.compiler import SceneArrays, compile_scene
from bendy_tpu.scene.graph import Scene, Sphere
from bendy_tpu.utils.rng import lane_keys


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
    """Defaults = ``Config::DEFAULT`` (``src/tracer/mod.rs:29-38``)."""

    max_bounces: int = 8
    max_volume_bounces: int = 32
    clip_min: float = 0.01
    clip_max: float = 1000.0
    volume_step: float = 0.1
    output: Output = Output.FULL


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


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "subsample", "cfg", "output"),
)
def render_pass(
    scn: SceneArrays,
    cam: CameraParams,
    seed,
    pass_idx,
    width: int,
    height: int,
    spp: int,
    subsample: int,
    cfg: TraceConfig,
    output: str,
):
    """One progressive pass: spp samples/pixel × subsample² subpixels.

    Returns (per-pixel channel sums [H,W,3], traced-ray count). Lanes are
    pixel-major so the per-pixel reduction is a reshape-sum, never a
    scatter.
    """
    n = max(subsample, 1)
    B = width * height * spp * n * n
    keys = lane_keys(seed, pass_idx, jnp.arange(B))
    org, direction = camera_rays(cam, width, height, spp, n, keys)
    res = trace(scn, org, direction, keys, cfg)

    if output == "full":
        ch = res.radiance
    elif output == "albedo":
        ch = res.aov_albedo
    elif output == "normal":
        ch = res.aov_normal
    elif output == "depth":
        # normalized + clamped depth (``tracer/mod.rs:306-308``)
        d = (res.aov_depth - cfg.clip_min) / (cfg.clip_max - cfg.clip_min)
        d = jnp.clip(d, 0.0, 1.0)
        ch = jnp.broadcast_to(d[:, None], (B, 3))
    else:
        raise ValueError(f"unknown output {output!r}")

    sums = ch.reshape(height, width, spp * n * n, 3).sum(axis=2)
    return sums, res.rays


class Renderer:
    """Progressive scene renderer (the reference's ``Tracer``)."""

    def __init__(self, scene: Scene, config: Config = Config()) -> None:
        self.config = config
        self.scene = scene
        self.arrays = compile_scene(scene)
        self.has_volumes = any(
            isinstance(o.inner, Sphere) and o.inner.volume is not None for o in scene.iter()
        )

    def camera_params(self, camera_ref: int, aspect_override: Optional[float] = None) -> CameraParams:
        obj = self.scene.get_object(camera_ref)
        cam = obj.as_camera()
        if cam is None:
            raise ValueError("expected a camera object")
        world = obj.transform.world
        f32 = lambda v: jnp.float32(v)  # noqa: E731
        return CameraParams(
            sensor_size=f32(cam.sensor_size),
            focal_length=f32(cam.focal_length),
            aspect_ratio=f32(cam.aspect_ratio if aspect_override is None else aspect_override),
            fstop=f32(cam.fstop),
            focus=f32(-1.0 if cam.focus is None else cam.focus),
            rotation=jnp.asarray(world[:, :3], jnp.float32),
            translation=jnp.asarray(world[:, 3], jnp.float32),
        )

    def trace_config(self, cfg: Config) -> TraceConfig:
        return TraceConfig(
            max_bounces=cfg.max_bounces,
            max_volume_bounces=cfg.max_volume_bounces,
            clip_min=cfg.clip_min,
            clip_max=cfg.clip_max,
            volume_step=cfg.volume_step,
            has_volumes=self.has_volumes,
        )

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
        sums, _rays = render_pass(
            self.arrays,
            cam,
            jnp.uint32(seed),
            jnp.int32(film.passes),
            film.width,
            film.height,
            render_config.samples,
            render_config.subsample.n,
            self.trace_config(cfg),
            cfg.output.value,
        )
        film.add_pass(
            np.asarray(sums), render_config.samples * render_config.subsample.subpixel_count
        )
        return Status.IN_PROGRESS
