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


VOL_BRICK = 4  # brick edge for the dense-grid kernel operand (see pack_vol_operand)

# Dense-grid fetch formulation knobs (hardware-swept by
# tools/dense_grid_sweep.py; defaults = measured winners on v5e).
#
# VOL_FETCH_DTYPE: operand dtype fed to the MXU. The contraction runs in
# DEFAULT precision either way (bf16 inputs, f32 accumulation), so
# pre-converting the table and building the one-hot directly in bf16
# yields BIT-identical products while halving the VMEM traffic of the
# [S, lanes] one-hot buffer (4 MB/iteration at 32^3) and of the resident
# table — the fetch's memory side, not its FLOPs, is what the bf16 knob
# attacks. f32 restores the round-3 formulation.
#
# Measured (tools/dense_grid_sweep.py, v5e, dense_cloud 256x256@64spp,
# all four variants mean-rel-err 9.2e-06 vs the XLA einsum path):
#   f32+outer 377 | f32+direct 385 | bf16+outer 489 | bf16+direct 508
# bf16+direct is the shipped default: +34% over the round-3 form.
VOL_FETCH_DTYPE = jnp.bfloat16
# VOL_ONEHOT_DIRECT: build the brick one-hot as ONE iota-compare against
# the flattened brick id instead of the (z ⊗ (y ⊗ x)) outer product —
# drops the [nby*nbx, lanes] intermediate and its multiplies.
VOL_ONEHOT_DIRECT = True
# VOL_PROBE_NO_DOT: perf probe ONLY (tools/dense_grid_sweep.py
# --probe-serial): replace the MXU contraction with a cheap slice of the
# one-hot so the fetch's VPU side (one-hot build + trilinear apply) can
# be timed without the dot. Produces WRONG densities — never production.
VOL_PROBE_NO_DOT = False
# VOL_LANE_CHUNKS: split the fetch over leading lane rows into this many
# sequential chunks (one-hot build -> dot -> trilinear per chunk). The
# hypothesis was that chunk k+1's one-hot build (VPU) could hide behind
# chunk k's dot (MXU) — the only overlap the march's step->decision
# serialization leaves schedulable. Measured on hardware
# (tools/dense_grid_sweep.py --lane-chunks[-deep], v5e dense_cloud,
# interleaved): at a 16-row block, sub-tile chunks pad the bf16 minimum
# tile (16, 128) and lose exactly the padding factor (1x 509/510 |
# 2x 255 | 4x 224 — 8-row chunks stream 2x, 4-row 4x = 509/224 = 2.27x).
# At TILE-ALIGNED chunks the overlap is real: a 32-row block split into
# two 16-row chunks ran 514-518 Mrays/s vs 508-512 for every 16-row
# control and 488 for the same block unsplit; 64r/4c (495) loses to
# occupancy decay. Production: 2, paired with the 32-row dense-operand
# block (ops/pallas_trace.rows_for); the tile guard below keeps any
# block whose chunks would drop under 16 rows unchunked, so the knob is
# inert for every non-dense configuration.
VOL_LANE_CHUNKS = 2
_CHUNK_TILE_ROWS = 16  # bf16 sublane tile: chunks must stay multiples
# VOL_FETCH_OVERLAP: issue the brick-table dots BEFORE the surface-shade
# block and defer the trilinear apply until after it (wavefront.py calls
# density_fetch_begin right after the intersection sweep and hands the
# pending fetch to volume_shade). The shade block is the one sizable
# VPU phase with no data dependence on the fetch, so the hypothesis was
# it could hide under the ~2.5 us dot. Per-lane math and op set are
# unchanged — bit-identical to the inline fetch by construction
# (tests/test_pallas.py::test_deferred_fetch_bit_identical).
# MEASURED NEUTRAL (tools/dense_grid_sweep.py --overlap, v5e 2026-08-19,
# interleaved on/off at the production 32r/2c config): off 517.5/513.9
# vs on 517.1/516.2 Mrays/s — within link jitter. Together with
# tools/mxu_shape_probe.py (the isolated dot runs at ~100% of the bf16
# peak), this pins the 55%-during-dot production figure on operand
# STAGING — the cost of feeding a freshly-VPU-built vreg one-hot into
# the MXU each iteration — which program position cannot move. Default
# False: production keeps the long-validated inline order; the knob and
# its bit-identity gate stay as the documented refutation.
VOL_FETCH_OVERLAP = False


def pack_vol_operand(vol) -> "np.ndarray":
    """Pack a density-grid stack [G,D,H,W] into the megakernel's dense-grid
    operand: a brick table ``[G, (bs+1)^3, NB]`` of 4^3 bricks with a
    one-cell apron.

    Why bricks: the kernel evaluates trilinear lookups as a one-hot MXU
    contraction. The flat formulation ``[W, D*H] x [D*H, B]`` puts the
    grid's shortest axis (W=32) on the systolic array's 128-row M dim —
    4x padding waste, and measured MXU-bound on dense 32^3 grids
    (sustained VPU 11-23% of peak while the iteration crawls). Bricking
    re-shapes the same contraction to ``[125, NB] x [NB, B]``: M=125→128
    is fully utilized, K=NB=512 for 32^3, so effective (padded) MXU work
    halves. The apron duplicates one boundary layer per brick so any
    trilinear stencil (base cell + 1) lives inside a single brick.

    Layout: ``table[g, (lz*ap + ly)*ap + lx, (bz*nby + by)*nbx + bx] =
    grid[g, bz*bs+lz, by*bs+ly, bx*bs+lx]`` (zero beyond the grid edge;
    per-lane index clamps keep weights off those cells).
    """
    import numpy as np

    vol = np.asarray(vol, np.float32)
    G, D, H, W = vol.shape
    bs = VOL_BRICK
    ap = bs + 1
    nbx, nby, nbz = -(-W // bs), -(-H // bs), -(-D // bs)
    padded = np.zeros((G, nbz * bs + 1, nby * bs + 1, nbx * bs + 1), np.float32)
    padded[:, :D, :H, :W] = vol
    tab = np.empty((G, ap * ap * ap, nbz * nby * nbx), np.float32)
    for bz in range(nbz):
        for by in range(nby):
            for bx in range(nbx):
                blk = padded[
                    :, bz * bs : bz * bs + ap, by * bs : by * bs + ap,
                    bx * bs : bx * bs + ap,
                ]
                tab[:, :, (bz * nby + by) * nbx + bx] = blk.reshape(G, -1)
    # f32 here; the REAL kernel build converts to VOL_FETCH_DTYPE
    # (ops/pallas_trace.py) while interpret-mode CI keeps f32 so the
    # exact-parity gates vs the XLA einsum path stay exact on CPU.
    return np.ascontiguousarray(tab)


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
    operand*, packed into a brick table by :func:`pack_vol_operand`.
    Selected by the renderer for
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
    instead ships the grid to VMEM as a BRICK TABLE (``pack_vol_operand``:
    4³ bricks with a one-cell apron, ``[G, 125, NB]``) and evaluates the
    lookup as one MXU brick fetch plus an in-register trilinear:

        t[a, b] = Σ_nb table[a, nb] · brick_onehot[nb, b]     (MXU)
        v[b]    = Σ_lz wlz Σ_ly wly Σ_lx wlx · t[(lz,ly,lx), b]  (VPU)

    Formulation history (each measured on v5e, dense_cloud 32³): a flat
    ``[W, D·H] × [D·H, B]`` contraction with a (z,y) one-hot outer
    product was MXU-BOUND — the grid's short axis (W=32) lands on the
    systolic array's 128-row M dim, so 3/4 of the MXU ran padding
    (sustained VPU only 11-23% of peak). The brick table makes M=125→128
    fully utilized and halves effective MXU work; the brick one-hot
    (1 nonzero) is also cheaper to build than the (z,y) outer product
    (≤4 nonzeros), cutting ~500 VPU ops/lane/iteration.

    Lane arrays keep the kernel's native (rows, 128) tiling end to end:
    the contraction is a rank-3 ``dot_general`` and every reshape touches
    *leading* dims only (free tile reindexing; collapsing into the lane
    dim measured ~7% slower from the relayout). The one-hot build is
    chunked over brick-z groups so its [S, lanes] buffer stays within a
    fixed VMEM budget for large grids (lanes of one chunk sum exact
    zeros from the others).

    Precision: DEFAULT (bf16 inputs, f32 accumulation) on the MXU — the
    same class the XLA path's ``jnp.einsum`` uses for every grid. The
    brick one-hot is exactly representable in bf16 (entries 0/1), so the
    fetched corner values are just bf16-rounded grid cells and the
    trilinear weights apply in f32 — tighter than the flat formulation,
    which rounded the weights too. Mosaic offers only DEFAULT and
    HIGHEST; HIGHEST (6-pass f32) measured 1.7× the per-iteration lookup
    cost and lost to the XLA fallback it is meant to replace. The sparse
    scalar-unroll path above stays exact f32; comparisons between lookup
    paths are therefore statistical (knife-edge Bernoulli scatter
    decisions can flip).

    Index one-hots use per-lane true grid extents (``hit.vol_size``), so
    padding/apron cells beyond a grid's edge never receive weight —
    identical semantics to the einsum path.
    """
    G, D, H, W = scn.vol_grid.shape
    bs = VOL_BRICK
    ap = bs + 1
    nbx, nby, nbz = -(-W // bs), -(-H // bs), -(-D // bs)
    NB = nbx * nby * nbz
    assert grid_t.shape == (G, ap * ap * ap, NB), grid_t.shape

    size = hit.vol_size
    gidx = jnp.maximum(hit.vol_grid, 0)
    # lane-row chunking (VOL_LANE_CHUNKS): run the whole fetch per slice
    # of the leading lane dim so chunk k+1's VPU one-hot build can issue
    # behind chunk k's MXU dot. Leading-dim slices/concat keep the
    # kernel's native (rows, 128) tiling (middle/trailing dims untouched).
    nc = VOL_LANE_CHUNKS
    if (nc > 1 and len(cx.shape) == 2 and cx.shape[0] % nc == 0
            and (cx.shape[0] // nc) % _CHUNK_TILE_ROWS == 0):
        step_r = cx.shape[0] // nc
        parts = []
        for c0 in range(0, cx.shape[0], step_r):
            sl = slice(c0, c0 + step_r)
            parts.append(_fetch_operand(
                scn, grid_t, cx[sl], cy[sl], cz[sl],
                V3(size.x[sl], size.y[sl], size.z[sl]), gidx[sl], nearest,
            ))
        return jnp.concatenate(parts, axis=0)
    return _fetch_operand(scn, grid_t, cx, cy, cz, size, gidx, nearest)


def _fetch_operand(scn, grid_t, cx, cy, cz, size, gidx, nearest):
    """One brick-table fetch over (a lane-row slice of) the batch."""
    return _fetch_apply(_fetch_begin(scn, grid_t, cx, cy, cz, size, gidx, nearest))


def _fetch_begin(scn, grid_t, cx, cy, cz, size, gidx, nearest):
    """Issue the MXU corner fetch; defer the trilinear apply.

    Returns everything :func:`_fetch_apply` needs: the per-grid fetched
    corner stacks ``t`` ([ap³, *lanes], f32, straight off the dot), the
    three lerp one-hots, and the per-lane grid select. Splitting here
    lets the caller (ops/wavefront via :func:`volume_fetch_begin`) put
    fetch-independent VPU work between the dot issue and its first use
    so in-order Mosaic issue hides it under the systolic array
    (VOL_FETCH_OVERLAP).
    """
    G, D, H, W = scn.vol_grid.shape
    bs = VOL_BRICK
    ap = bs + 1
    nbx, nby, nbz = -(-W // bs), -(-H // bs), -(-D // bs)
    shape = cx.shape

    def axis(c, hi):
        if nearest:
            i0 = jnp.floor(c + 0.5).astype(jnp.int32)
            return i0, i0, jnp.zeros_like(c)
        c0 = jnp.floor(c)
        i0 = c0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, hi.astype(jnp.int32))
        return i0, i1, c - c0

    ix0, ix1, fx = axis(cx, size.x)
    iy0, iy1, fy = axis(cy, size.y)
    iz0, iz1, fz = axis(cz, size.z)
    bx, by, bz = ix0 // bs, iy0 // bs, iz0 // bs

    # the one-hot dtype follows the shipped operand (bf16 on the real
    # kernel, f32 under interpret/XLA — see pack note + VOL_FETCH_DTYPE)
    dtype = grid_t.dtype

    def bhot(b, n):  # exact brick one-hot rows (1 nonzero per lane)
        ids = jax.lax.broadcasted_iota(jnp.int32, (n,) + shape, 0)
        return ((ids == b[None]) * 1).astype(dtype)

    def lhot(i0, i1, f, base):  # local (apron) lerp one-hot, ≤2 nonzeros
        ids = jax.lax.broadcasted_iota(jnp.int32, (ap,) + shape, 0)
        l0 = (i0 - base * bs)[None]
        l1 = (i1 - base * bs)[None]
        return (ids == l0) * (1.0 - f[None]) + (ids == l1) * f[None]

    if VOL_ONEHOT_DIRECT:
        nb_flat = (bz * nby + by) * nbx + bx  # [lanes] flat brick id
    else:
        wbx, wby, wbz = bhot(bx, nbx), bhot(by, nby), bhot(bz, nbz)
        wby_x = (wby[:, None] * wbx[None]).reshape((nby * nbx,) + shape)
    wlx = lhot(ix0, ix1, fx, bx)  # [ap, *lanes]
    wly = lhot(iy0, iy1, fy, by)
    wlz = lhot(iz0, iz1, fz, bz)

    import numpy as _np

    B = int(_np.prod(shape))
    # brick-z chunking bounds the one-hot buffer at ~8 MB of VMEM
    # (dtype-aware: bf16 halves bytes/row, so 32^3 fits in ONE dot call)
    itemsize = jnp.dtype(dtype).itemsize
    zgrp = max(1, min(nbz, (8 << 20) // max(nby * nbx * B * itemsize, 1)))
    tab = grid_t
    ts = []
    for g in range(G):
        t = None  # [ap³, *lanes]
        for z0 in range(0, nbz, zgrp):
            s = min(zgrp, nbz - z0)
            if VOL_ONEHOT_DIRECT:
                ids = jax.lax.broadcasted_iota(
                    jnp.int32, (s * nby * nbx,) + shape, 0
                )
                whot = ((ids == (nb_flat - z0 * nby * nbx)[None]) * 1).astype(
                    dtype
                )
            else:
                whot = (wbz[z0 : z0 + s][:, None] * wby_x[None]).reshape(
                    (s * nby * nbx,) + shape
                )
            if VOL_PROBE_NO_DOT:  # perf probe: keep build, skip the MXU
                part = (
                    whot[: ap * ap * ap].astype(jnp.float32)
                    if s * nby * nbx >= ap * ap * ap
                    else jnp.concatenate(
                        [whot] * (-(-(ap * ap * ap) // (s * nby * nbx)))
                    )[: ap * ap * ap].astype(jnp.float32)
                )
            else:
                part = jax.lax.dot_general(
                    tab[g][:, z0 * nby * nbx : (z0 + s) * nby * nbx], whot,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [ap³, *lanes]
            t = part if t is None else t + part
        ts.append(t)
    return tuple(ts), wlx, wly, wlz, gidx, ap, shape


def _fetch_apply(pending):
    """Trilinear apply on fetched corner stacks (the deferred VPU half)."""
    ts, wlx, wly, wlz, gidx, ap, shape = pending
    G = len(ts)
    out = jnp.zeros(shape, jnp.float32)  # == zeros_like(cx): coords are f32
    for g, t in enumerate(ts):
        t3 = t.reshape((ap, ap, ap) + shape)
        r = jnp.sum(t3 * wlx[None, None], axis=2)  # [ap, ap, *lanes]
        r = jnp.sum(r * wly[None], axis=1)  # [ap, *lanes]
        vg = jnp.sum(r * wlz, axis=0)
        out = vg if G == 1 else jnp.where(gidx == g, vg, out)
    return out


def density_fetch_begin(scn, hit, nearest: bool = False, grid_t=None):
    """Issue the dense-grid corner fetch for a volume event; defer the apply.

    The ops/wavefront body calls this right after the intersection sweep
    (VOL_FETCH_OVERLAP) so the MXU dots are in flight while the
    fetch-independent surface-shade VPU block runs; the pending value
    then feeds :func:`volume_shade` (``pending=``), whose
    :func:`density_fetch_finish` does the trilinear apply at first use.
    Per-lane math is IDENTICAL to the inline
    ``density_sample(..., grid_t=...)`` path — same clamp/scale, same
    lane-chunk slicing, same op set — only the program position of the
    apply moves. Returns None when there is no operand grid (the caller
    falls back to the inline paths).
    """
    if grid_t is None:
        return None
    coord = (hit.position - hit.bbox_min) / hit.bbox_size
    size = hit.vol_size
    cx = jnp.clip(coord.x, 0.0, 1.0) * size.x
    cy = jnp.clip(coord.y, 0.0, 1.0) * size.y
    cz = jnp.clip(coord.z, 0.0, 1.0) * size.z
    gidx = jnp.maximum(hit.vol_grid, 0)
    nc = VOL_LANE_CHUNKS
    if (nc > 1 and len(cx.shape) == 2 and cx.shape[0] % nc == 0
            and (cx.shape[0] // nc) % _CHUNK_TILE_ROWS == 0):
        step_r = cx.shape[0] // nc
        parts = []
        for c0 in range(0, cx.shape[0], step_r):
            sl = slice(c0, c0 + step_r)
            parts.append(_fetch_begin(
                scn, grid_t, cx[sl], cy[sl], cz[sl],
                V3(size.x[sl], size.y[sl], size.z[sl]), gidx[sl], nearest,
            ))
        return parts
    return [_fetch_begin(scn, grid_t, cx, cy, cz, size, gidx, nearest)]


def density_fetch_finish(parts):
    """Deferred trilinear apply over the lane-row chunks of a pending fetch."""
    outs = [_fetch_apply(p) for p in parts]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


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
    pending=None,
) -> VolumeShade:
    """One probabilistic scattering decision at a volume event.

    ``pending``: a fetch already issued by :func:`density_fetch_begin`
    (VOL_FETCH_OVERLAP); only the deferred trilinear apply runs here.
    """
    if pending is not None:
        density = step * density_fetch_finish(pending)
    else:
        coord = (hit.position - hit.bbox_min) / hit.bbox_size
        density = step * density_sample(
            scn, hit, coord, nearest=nearest, grid_t=grid_t)
    scattered = u[0] < density  # covers density >= 1 too (``volume.rs:38``)

    # interior events jitter the origin up to one step backwards (``volume.rs:40-42``)
    back = V3.where(hit.face == FACE_VOLUME, dir_in * (step * u[1]), V3.zeros(u[0].shape))
    scatter_org = hit.position - back
    scatter_dir = distr.unit_sphere(u[2], u[3])

    origin = V3.where(scattered, scatter_org, hit.position)
    direction = V3.where(scattered, scatter_dir, dir_in)
    weight = jnp.where(scattered, 0.8, 1.0)
    return VolumeShade(scattered=scattered, origin=origin, direction=direction, weight=weight)
