"""Multi-chip rendering: shard_map over a 2-D device mesh.

The reference's only parallelism is a rayon thread pool over screen tiles
(``src/tracer/mod.rs:194``) writing a shared film through an unsafe
aliased pointer (``src/tracer/buffer.rs:311-313``). The TPU-native
equivalent:

    mesh axes ('tiles', 'samples')
    - 'tiles':   image rows sharded across chips — zero communication
                 during tracing (rays are independent),
    - 'samples': samples-per-pixel sharded across chips — partial films
                 reduced with one ``psum`` over ICI at pass end.

Because RNG streams are keyed by *global* lane ids (pixel, sample), any
mesh shape produces the same per-lane radiance values as a single chip;
only the f32 film-summation order differs. No unsafe aliasing, no
nondeterministic chunk seeding.

Scene arrays and camera params are small (KBs) and fully replicated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bendy_tpu.ops.camera import CameraParams
from bendy_tpu.ops.wavefront import TraceConfig, trace
from bendy_tpu.scene.compiler import SceneArrays
from bendy_tpu.utils.rng import render_key
from bendy_tpu.utils.v3 import V3


def make_mesh(tiles: int, samples: int = 1, devices=None) -> Mesh:
    """A ('tiles', 'samples') mesh over the first tiles*samples devices."""
    devices = jax.devices() if devices is None else devices
    n = tiles * samples
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    import numpy as np

    return Mesh(np.asarray(devices[:n]).reshape(tiles, samples), ("tiles", "samples"))


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "spp_local", "subsample", "cfg", "output"),
)
def render_pass_sharded(
    scn: SceneArrays,
    cam: CameraParams,
    seed,
    pass_idx,
    mesh: Mesh,
    width: int,
    height: int,
    spp_local: int,
    subsample: int,
    cfg: TraceConfig,
    output: str,
):
    """One progressive pass across the mesh.

    Each device renders rows [ti·rows_local, ...) × samples
    [si·spp_local, ...). Returns (film channel sums [H, W, 3] — rows
    sharded over 'tiles', already psum-reduced over 'samples' — and the
    per-pass traced-ray count, summed over the mesh).
    """
    n = max(subsample, 1)
    nn = n * n
    n_tiles = mesh.shape["tiles"]
    n_samp = mesh.shape["samples"]
    if height % n_tiles:
        raise ValueError(f"height {height} not divisible by tile axis {n_tiles}")
    rows_local = height // n_tiles
    spp_total = spp_local * n_samp
    key = render_key(jnp.asarray(seed, jnp.uint32), jnp.asarray(pass_idx, jnp.uint32))

    def shard_body(scn, cam):
        ti = jax.lax.axis_index("tiles")
        si = jax.lax.axis_index("samples")
        B = rows_local * width * nn
        local = jnp.arange(B, dtype=jnp.uint32)
        sub = local % jnp.uint32(nn)
        y0 = jnp.asarray(ti, jnp.uint32) * jnp.uint32(rows_local)
        pix = y0 * jnp.uint32(width) + local // jnp.uint32(nn)
        sample0 = jnp.asarray(si, jnp.uint32) * jnp.uint32(spp_local)

        res = trace(
            scn, cam, key, pix, sub, width, height, spp_local, n, cfg,
            spp_total=spp_total, sample0=sample0,
        )

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
            [c.reshape(rows_local, width, nn).sum(axis=2) for c in (ch.x, ch.y, ch.z)],
            axis=-1,
        )
        # the only collectives of the whole renderer: film + ray-count
        # reduction over the sample axis (ICI)
        sums = jax.lax.psum(sums, "samples")
        rays = jax.lax.psum(jax.lax.psum(res.rays, "samples"), "tiles")
        return sums, rays

    body = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P("tiles", None, None), P()),
        check_vma=False,
    )
    return body(scn, cam)


def render_film_sharded(
    scn, cam, mesh, width, height, spp_local, subsample, cfg, output, seed=0, passes=1
):
    """Progressive multi-pass sharded render; returns (sums [H,W,3], spp, rays)."""
    n = max(subsample, 1)
    total = None
    rays = 0.0
    for p in range(passes):
        sums, r = render_pass_sharded(
            scn, cam, seed, p, mesh, width, height, spp_local, subsample, cfg, output
        )
        total = sums if total is None else total + sums
        rays += float(r)
    spp = passes * spp_local * mesh.shape["samples"] * n * n
    return total, spp, rays


def make_pallas_pass_sharded(
    scn, mesh: Mesh, width: int, height: int, spp_local: int, subsample: int,
    cfg: TraceConfig, output: str, block_rows: int | None = None, interpret: bool = False,
    vol_operand: bool = False, tile: bool = True,
):
    """Sharded render pass running the Pallas megakernel per device.

    Built outside jit (the kernel bakes the scene's host copy); returns
    ``fn(cam_packed [1,32], seed, pass_idx) -> (sums [H,W,3] sharded over
    'tiles', rays)``. Validated against the unsharded megakernel on a
    (1,1) mesh; multi-chip runs use the same SPMD program.

    ``tile=True`` feeds each device's lanes in tile-major order (see
    ``ops.pallas_trace.tile_perm``) — bit-identical film, higher
    per-block occupancy, same win as the unsharded megakernel pass.
    """
    from bendy_tpu.ops.pallas_trace import LANE, lane_order, make_pallas_tracer, rows_for

    n = max(subsample, 1)
    nn = n * n
    n_tiles = mesh.shape["tiles"]
    n_samp = mesh.shape["samples"]
    if height % n_tiles:
        raise ValueError(f"height {height} not divisible by tile axis {n_tiles}")
    rows_local = height // n_tiles
    spp_total = spp_local * n_samp
    tracer = make_pallas_tracer(
        scn, width, height, spp_local, subsample, cfg,
        spp_total=spp_total, block_rows=block_rows, interpret=interpret,
        vol_operand=vol_operand,
    )
    eff_rows = block_rows if block_rows is not None else rows_for(cfg, vol_operand)
    order = lane_order(width, rows_local, nn, eff_rows * LANE) if tile else None

    def shard_body(cam_packed, seed, pass_idx):
        ti = jax.lax.axis_index("tiles")
        si = jax.lax.axis_index("samples")
        B = rows_local * width * nn
        y0 = jnp.asarray(ti, jnp.uint32) * jnp.uint32(rows_local)
        if order is None:
            local = jnp.arange(B, dtype=jnp.uint32)
            sub = local % jnp.uint32(nn)
            pix = y0 * jnp.uint32(width) + local // jnp.uint32(nn)
        else:
            pix_tiled, sub, _ = order
            pix = y0 * jnp.uint32(width) + pix_tiled
        sample0 = jnp.asarray(si, jnp.uint32) * jnp.uint32(spp_local)
        res = tracer(cam_packed, seed, pass_idx, pix, sub, sample0=sample0)

        if output == "full":
            ch = res.radiance
        elif output == "albedo":
            ch = res.aov_albedo
        elif output == "normal":
            ch = res.aov_normal
        elif output == "depth":
            d = res.aov_depth
            ch = V3(d, d, d)
        else:
            raise ValueError(f"unknown output {output!r}")
        if order is None:
            sums = jnp.stack(
                [c.reshape(rows_local, width, nn).sum(axis=2)
                 for c in (ch.x, ch.y, ch.z)],
                axis=-1,
            )
        else:
            untile = order[2]
            sums = jnp.stack([untile(c) for c in (ch.x, ch.y, ch.z)], axis=-1)
        sums = jax.lax.psum(sums, "samples")
        rays = jax.lax.psum(jax.lax.psum(res.rays, "samples"), "tiles")
        return sums, rays

    body = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P("tiles", None, None), P()),
        check_vma=False,
    )
    return jax.jit(body)
