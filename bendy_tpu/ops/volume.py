"""Participating media: trilinear density lookup + probabilistic scattering.

Reproduces ``Volume::shade`` and ``DensityMap::sample``
(``src/scene/data/volume.rs:26-67,140-166``):

- normalized coordinate from the hit object's AABB      (volume.rs:32-34)
- scatter probability = step · trilinear(coord), no exponential
  attenuation                                            (volume.rs:36-38)
- on scatter: isotropic new direction, origin jittered up to one step
  backwards for *interior* events, hardcoded albedo 0.8  (volume.rs:38-53)
- otherwise the ray passes through unattenuated          (volume.rs:54-59)

The eight grid-corner reads are the one true gather in the whole
integrator (dynamic (grid, z, y, x) indices); everything else is fused
[B] elementwise work.

Uniform layout (shares the iteration block with surface shading):
    u0 scatter bernoulli · u1 back jitter · u2,u3 isotropic direction
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from bendy_tpu.ops import distr
from bendy_tpu.ops.intersect import FACE_VOLUME, Hit
from bendy_tpu.scene.compiler import SceneArrays
from bendy_tpu.utils.v3 import V3


def density_sample(
    scn: SceneArrays, hit: Hit, coord: V3, nearest: bool = False,
    grid_t: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Density at normalized coord (``volume.rs:140-166``).

    coord is clamped to [0,1]; grid coordinates scale by (w-1,h-1,d-1).
    ``nearest=True`` selects ``SamplingMode::Nearest`` (``volume.rs:146-150``:
    Rust ``f32::round`` = half away from zero, here floor(c+0.5) since
    coords are non-negative); default is Trilinear, the mode the
    reference tracer always passes (``volume.rs:36``).

    TPU-native formulation: instead of eight dynamic gathers (XLA
    serializes TPU gathers — measured 3.4 Mrays/s on the volume scenes),
    trilinear interpolation is expressed as three chained contractions
    with per-axis one-hot lerp-weight matrices (<=2 nonzeros per row) —
    pure MXU work:

        v[b] = wz[b,:] · (wy[b,:] · (wx[b,:] ⊗ grid))

    Exactly equals the reference's nested-lerp result (a boundary-clamped
    far corner receives weight (1-f)+f = 1).

    ``grid_t`` (megakernel dense-grid path): the grid as a *kernel
    operand*, pre-transposed to [G, W, D·H]. Selected by the renderer for
    grids too dense for the scalar unroll below; see
    :func:`_density_operand`.
    """
    G, D, H, W = scn.vol_grid.shape
    size = hit.vol_size  # (w-1, h-1, d-1) of the hit sphere's grid
    cx = jnp.clip(coord.x, 0.0, 1.0) * size.x
    cy = jnp.clip(coord.y, 0.0, 1.0) * size.y
    cz = jnp.clip(coord.z, 0.0, 1.0) * size.z

    if grid_t is not None:
        return _density_operand(scn, hit, grid_t, cx, cy, cz, nearest)

    import numpy as _np

    if isinstance(scn.vol_grid, _np.ndarray):
        # Pallas megakernel path: the grid arrives as a host constant that
        # the kernel may not capture as an array. Unroll the contraction to
        # *scalar* grid values, skipping zero cells (density grids are
        # sparse) — the same math as the einsum form below, as pure fused
        # [B] multiply-adds with no array constants and no gathers.
        def axis_w_list(c, hi, n):
            if nearest:
                i_n = jnp.floor(c + 0.5).astype(jnp.int32)
                return [(i == i_n) * 1.0 for i in range(n)]
            c0 = jnp.floor(c)
            f = c - c0
            i0 = c0.astype(jnp.int32)
            i1 = jnp.minimum(i0 + 1, hi.astype(jnp.int32))
            return [(i == i0) * (1.0 - f) + (i == i1) * f for i in range(n)]

        wx = axis_w_list(cx, size.x, W)
        wy = axis_w_list(cy, size.y, H)
        wz = axis_w_list(cz, size.z, D)
        out = jnp.zeros_like(cx)
        gidx = jnp.maximum(hit.vol_grid, 0)
        for g in range(G):
            acc = jnp.zeros_like(cx)
            for d in range(D):
                for h in range(H):
                    row = None
                    for w in range(W):
                        a = float(scn.vol_grid[g, d, h, w])
                        if a != 0.0:
                            term = wx[w] * a
                            row = term if row is None else row + term
                    if row is not None:
                        acc = acc + wz[d] * wy[h] * row
            out = acc if G == 1 else jnp.where(gidx == g, acc, out)
        return out

    grid = jnp.asarray(scn.vol_grid)

    def axis_weights(c, hi, n):
        ids = jnp.arange(n, dtype=jnp.int32)
        if nearest:
            i_n = jnp.floor(c + 0.5).astype(jnp.int32)
            return (ids == i_n[:, None]) * 1.0
        c0 = jnp.floor(c)
        f = c - c0
        i0 = c0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, hi.astype(jnp.int32))
        return (
            (ids == i0[:, None]) * (1.0 - f[:, None])
            + (ids == i1[:, None]) * f[:, None]
        )

    wx = axis_weights(cx, size.x, W)  # [B,W]
    wy = axis_weights(cy, size.y, H)  # [B,H]
    wz = axis_weights(cz, size.z, D)  # [B,D]

    out = jnp.zeros_like(cx)
    gidx = jnp.maximum(hit.vol_grid, 0)
    for g in range(G):  # static unroll; scenes have 1-2 grids
        t1 = jnp.einsum("bw,dhw->bdh", wx, grid[g])  # [B,D,H] on the MXU
        t2 = jnp.einsum("bh,bdh->bd", wy, t1)
        vg = jnp.einsum("bd,bd->b", wz, t2)
        out = jnp.where(gidx == g, vg, out)
    return out


def _density_operand(scn, hit, grid_t, cx, cy, cz, nearest):
    """Trilinear lookup with the grid as a Pallas kernel operand.

    The megakernel's baked-constant path above scalar-unrolls nonzero
    cells (~3 VPU ops each) — ideal for the sparse bundled grids but
    quadratic pain for dense ones (a full 32³ grid would be ~100K ops per
    iteration, and the unroll's compile time grows with it). This path
    instead ships the grid to VMEM and evaluates trilinear interpolation
    as ONE MXU contraction per grid (formulation chosen by measurement —
    see ROUND3_NOTES.md):

        t1[w, b]  = Σ_{dh}  gT[w, dh] · (wz ⊗ wy)[dh, b]    (MXU)
        v[b]      = Σ_w     wx[w, b] · t1[w, b]             (VPU)

    The (z,y) outer-product one-hot carries ≤4 nonzeros per lane; the
    post-matmul intermediate is only [W, lanes]. Lane arrays keep the
    kernel's native (rows, 128) tiling end to end — the contraction is a
    rank-3 ``dot_general`` and the only reshape collapses *leading* dims
    (free tile reindexing; collapsing into the lane dim measured ~7%
    slower from the relayout). The outer product is chunked over z-slabs
    so its [S·H, lanes] buffer stays within a fixed VMEM budget for large
    grids.

    Precision: DEFAULT (bf16 inputs, f32 accumulation) — the same MXU
    precision class the XLA path's ``jnp.einsum`` uses for every grid.
    Mosaic offers only DEFAULT and HIGHEST; HIGHEST (6-pass f32) measured
    1.7× the per-iteration lookup cost and lost to the XLA fallback it is
    meant to replace. The sparse scalar-unroll path above stays exact
    f32; comparisons between the two lookup paths are therefore
    statistical (knife-edge Bernoulli scatter decisions can flip).

    ``grid_t`` is the padded grid stack pre-transposed to [G, W, D·H]
    (host-side, once per tracer build). Index one-hots use per-lane true
    grid extents (``hit.vol_size``), so padding cells never receive
    weight — identical semantics to the einsum path.
    """
    G, D, H, W = scn.vol_grid.shape
    shape = cx.shape

    def onehot(c, n, hi):
        ids = jax.lax.broadcasted_iota(jnp.int32, (n,) + shape, 0)
        if nearest:
            i_n = jnp.floor(c + 0.5).astype(jnp.int32)[None]
            return (ids == i_n) * 1.0
        c0 = jnp.floor(c)
        f = (c - c0)[None]
        i0 = c0.astype(jnp.int32)[None]
        i1 = jnp.minimum(i0 + 1, hi.astype(jnp.int32)[None])
        return (ids == i0) * (1.0 - f) + (ids == i1) * f

    size = hit.vol_size
    wx = onehot(cx, W, size.x)  # [W, *lanes]
    wy = onehot(cy, H, size.y)  # [H, *lanes]
    wz = onehot(cz, D, size.z)  # [D, *lanes]

    import numpy as _np

    B = int(_np.prod(shape))
    # z-slab chunking bounds the outer-product buffer at ~8 MB of VMEM
    slab = max(1, min(D, (8 << 20) // max(H * B * 4, 1)))
    out = jnp.zeros_like(cx)
    gidx = jnp.maximum(hit.vol_grid, 0)
    for g in range(G):
        t1 = None  # [W, *lanes]
        for d0 in range(0, D, slab):
            s = min(slab, D - d0)
            wzy = (wz[d0 : d0 + s][:, None] * wy[None]).reshape((s * H,) + shape)
            part = jax.lax.dot_general(
                grid_t[g][:, d0 * H : (d0 + s) * H], wzy,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [W, *lanes]
            t1 = part if t1 is None else t1 + part
        vg = jnp.sum(t1 * wx, axis=0)
        out = vg if G == 1 else jnp.where(gidx == g, vg, out)
    return out


class VolumeShade(NamedTuple):
    scattered: jnp.ndarray  # [B] bool: a scattering event happened
    origin: V3  # next ray origin
    direction: V3  # next ray direction
    weight: jnp.ndarray  # [B] throughput multiplier (0.8 on scatter, 1 otherwise)


def volume_shade(
    dir_in: V3,
    hit: Hit,
    scn: SceneArrays,
    u: Sequence[jnp.ndarray],
    step: float,
    nearest: bool = False,
    grid_t: jnp.ndarray | None = None,
) -> VolumeShade:
    """One probabilistic scattering decision at a volume event."""
    coord = (hit.position - hit.bbox_min) / hit.bbox_size
    density = step * density_sample(scn, hit, coord, nearest=nearest, grid_t=grid_t)
    scattered = u[0] < density  # covers density >= 1 too (``volume.rs:38``)

    # interior events jitter the origin up to one step backwards (``volume.rs:40-42``)
    back = V3.where(hit.face == FACE_VOLUME, dir_in * (step * u[1]), V3.zeros(u[0].shape))
    scatter_org = hit.position - back
    scatter_dir = distr.unit_sphere(u[2], u[3])

    origin = V3.where(scattered, scatter_org, hit.position)
    direction = V3.where(scattered, scatter_dir, dir_in)
    weight = jnp.where(scattered, 0.8, 1.0)
    return VolumeShade(scattered=scattered, origin=origin, direction=direction, weight=weight)
