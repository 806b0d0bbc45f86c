"""Pallas megakernel: the whole wavefront loop in ONE TPU kernel.

The XLA path compiles the loop body into ~60 fused kernels; at ~300 loop
iterations the per-kernel launch overhead dominates the render (measured:
compute is <10% of wall). This kernel keeps every lane's state in VMEM
and runs the complete regeneration loop per block — one launch per
render pass.

Structure:
- lanes reshape to [G·R, 128] (TPU-native 2-D tiles); the grid iterates
  over G blocks of shape (R, 128),
- the compiled scene is KBs and changes rarely: its numpy host copy bakes
  into the kernel as constants (the tracer is rebuilt if scene values
  change — camera pose stays a traced input, so camera motion does NOT
  recompile),
- the kernel calls the SAME shape-agnostic ``trace_core`` body as the XLA
  path,
- each block's loop exits when *its* lanes finish — spatially coherent
  blocks (sky vs. black-hole core) stop early for free.

``make_pallas_tracer`` returns a jitted (cam, key+sample0, pix, sub) -> TraceSums
function; the renderer caches one per (scene, statics) and falls back to
the XLA path if Mosaic rejects the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bendy_tpu.ops.camera import CameraParams
from bendy_tpu.ops.wavefront import TraceConfig, TraceSums, trace_core
from bendy_tpu.scene.compiler import SceneArrays
from bendy_tpu.utils.v3 import V3

LANE = 128  # TPU lane width
DEFAULT_ROWS = 16  # sublane rows per block -> 2048 lanes/block. Re-swept
#   under tile-major lane ordering (tools/block_sweep.py): 16 wins for
#   every scene class — coherent square tiles make finer early exit pay
#   even on flat scenes (cornell 1805 @ 16 vs 1719 @ 32 vs 1563 @ 64
#   Mrays/s; blackhole 2695 @ 16; cloud 1233 @ 16; 8 over-fragments all).
#   Pre-tiling, flat scenes preferred 32 (strip blocks were incoherent
#   anyway, so amortization won).
DENSE_OPERAND_ROWS = 32  # dense-grid operand scenes: 32 rows as two
#   16-row fetch chunks (see rows_for / ops.volume.VOL_LANE_CHUNKS)


def rows_for(cfg, vol_operand: bool = False) -> int:
    """Swept block height (see DEFAULT_ROWS; tools/block_sweep.py).

    Dense-grid operand scenes run 32 rows split into two 16-row fetch
    chunks (ops/volume.VOL_LANE_CHUNKS): the second chunk's one-hot
    build issues behind the first chunk's MXU dot, hiding VPU build time
    the march's step->decision serialization otherwise exposes. Measured
    interleaved on v5e dense_cloud (tools/dense_grid_sweep.py
    --lane-chunks[-deep]): 16r/1c 508-512, 32r/1c 488, 32r/2c 514-518,
    64r/4c 495 Mrays/s — the 32r/2c combination is the only variant that
    beats every 16-row control; deeper blocks lose to occupancy decay.
    """
    return DENSE_OPERAND_ROWS if vol_operand else DEFAULT_ROWS

N_OUT = 10  # rx ry rz ax ay az nx ny nz dep
FLAT_TABLES = True  # ship looped-sweep tables 1D (hoisted row addressing);
#   False restores 2D refs — hardware A/B knob, tools/looped_hw_check.py


def pack_camera(cam: CameraParams) -> jnp.ndarray:
    """CameraParams -> [1,32] f32 (scalars + row-major rotation + translation)."""
    flat = jnp.concatenate(
        [
            jnp.stack(
                [cam.sensor_size, cam.focal_length, cam.aspect_ratio, cam.fstop,
                 cam.focus, cam.yfov]
            ).astype(jnp.float32),
            cam.rotation.reshape(-1).astype(jnp.float32),
            cam.translation.astype(jnp.float32),
        ]
    )
    return jnp.pad(flat, (0, 32 - flat.shape[0])).reshape(1, 32)


def pack_camera_host(sensor, focal, aspect, fstop, focus, yfov,
                     rotation, translation):
    """Host-side (numpy) twin of :func:`pack_camera` — the single layout
    definition for the packed camera buffer; keep in lockstep with
    :func:`unpack_camera`."""
    import numpy as np

    vec = np.zeros((1, 32), np.float32)
    vec[0, :6] = [sensor, focal, aspect, fstop, focus, yfov]
    vec[0, 6:15] = np.asarray(rotation, np.float32).reshape(-1)
    vec[0, 15:18] = np.asarray(translation, np.float32)
    return vec


def unpack_camera(v: jnp.ndarray) -> CameraParams:
    return CameraParams(
        sensor_size=v[0, 0],
        focal_length=v[0, 1],
        aspect_ratio=v[0, 2],
        fstop=v[0, 3],
        focus=v[0, 4],
        rotation=v[0, 6:15].reshape(3, 3),
        translation=v[0, 15:18],
        yfov=v[0, 5],
    )


def make_pallas_tracer(
    scn: SceneArrays,
    width: int,
    height: int,
    spp: int,
    subsample: int,
    cfg: TraceConfig,
    spp_total: int | None = None,
    block_rows: int | None = None,
    interpret: bool = False,
    vol_operand: bool = False,
):
    """Build the megakernel tracer for one compiled scene.

    Returns ``fn(cam_packed [1,32] f32, aux [1,8] u32, pix [B], sub [B])
    -> TraceSums``; aux = (key0, key1, sample0, ...).

    ``interpret=True`` runs the kernel through the Pallas interpreter
    (plain XLA ops, any backend) — how CI covers this code path on the
    CPU mesh without Mosaic.

    ``vol_operand=True`` ships the density-grid stack into the kernel as
    a VMEM operand (a brick table, see ops.volume.pack_vol_operand) and
    evaluates trilinear lookups as in-kernel MXU contractions instead of
    the baked scalar unroll — the dense-grid path (see
    ops.volume._density_operand). The renderer selects it by
    nonzero-cell count.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if block_rows is None:
        block_rows = rows_for(cfg, vol_operand)
    scn_host = scn.host_copy()  # numpy leaves -> kernel constants

    grid_t_host = None
    if vol_operand:
        from bendy_tpu.ops.volume import VOL_FETCH_DTYPE, pack_vol_operand

        grid_t_host = pack_vol_operand(scn_host.vol_grid)  # brick table
        if not interpret:
            # real kernel: ship the operand in the fetch dtype (bf16 by
            # default: measured +34% on dense_cloud, tools/dense_grid_sweep;
            # DEFAULT MXU precision rounds to bf16 anyway so products are
            # unchanged). Interpret-mode CI keeps f32 — CPU dots don't
            # round, and the exact-parity gates vs XLA must stay exact.
            grid_t_host = grid_t_host.astype(jnp.dtype(VOL_FETCH_DTYPE))

    # looped sweep (large scenes): the primitive-row matrices ship as
    # SMEM operands — scalar memory is the one space Mosaic lets a traced
    # row id index, so the kernel keeps its launch amortization at
    # primitive counts the baked unroll cannot compile
    table_keys: list = []
    tables_host: list = []
    if cfg.looped_sweep or cfg.looped_lights or cfg.looped_masses:
        import numpy as np

        from bendy_tpu.ops.intersect import block_bounds, prim_tables

        kinds = (
            (("sph", "rct", "box") if cfg.looped_sweep else ())
            + (("light",) if cfg.looped_lights else ())
            + (("mass",) if cfg.looped_masses else ())
        )
        tabs = prim_tables(scn_host, np, kinds=kinds)
        if cfg.looped_sweep and cfg.block_cull:
            # per-fori-block bounding spheres: the sweep skips whole
            # primitive blocks no alive lane's segment can reach
            # (intersect.nearest_hit_looped cull_wrap; bit-identical)
            tabs.update(block_bounds(tabs))
        table_keys = sorted(tabs)
        # sweep tables ship FLATTENED: 1D refs let nearest_hit_looped hoist
        # each block's flat base address so every SMEM load is base+CONST
        # (scalar-unit address arithmetic is real throughput at 512 prims).
        # The light table stays 2D — its per-face span depends on F.
        tables_host = [
            tabs[k].reshape(-1) if FLAT_TABLES and k in ("sph", "rct", "box")
            else tabs[k]
            for k in table_keys
        ]

    def kernel(pix_ref, sub_ref, cam_ref, aux_ref, *rest):
        if vol_operand:
            grid_ref, rest = rest[0], rest[1:]
        else:
            grid_ref = None
        tab_refs = dict(zip(table_keys, rest[: len(table_keys)]))
        outs = rest[len(table_keys):]
        cam_vals = unpack_camera(cam_ref[:])
        key_vals = (aux_ref[0, 0], aux_ref[0, 1])
        # lanes beyond the true batch (block padding) are masked inactive:
        # they must not trace (wasted VPU work) nor count as rays
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 1)
        flat_id = (pl.program_id(0) * block_rows + row_ids) * LANE + lane_ids
        active = flat_id < aux_ref[0, 3].astype(jnp.int32)
        res = trace_core(
            scn_host, cam_vals, key_vals, pix_ref[:], sub_ref[:],
            width, height, spp, subsample, cfg,
            spp_total=spp_total, sample0=aux_ref[0, 2], active=active,
            vol_grid_t=None if grid_ref is None else grid_ref[:],
            prim_tables=tab_refs if table_keys else None,
        )
        vals = [
            res.radiance.x, res.radiance.y, res.radiance.z,
            res.aov_albedo.x, res.aov_albedo.y, res.aov_albedo.z,
            res.aov_normal.x, res.aov_normal.y, res.aov_normal.z,
            res.aov_depth,
        ]
        for ref, v in zip(outs[:N_OUT], vals):
            ref[:] = v
        # per-block stats in row 0 of an (8,128) tile: [0,0] traced-ray
        # count, [0,1] loop iterations (feeds tools/perf_report.py)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
        outs[N_OUT][:] = jnp.where(
            (row_ids == 0) & (lane_ids == 0), res.rays, 0.0
        ) + jnp.where((row_ids == 0) & (lane_ids == 1), res.iters, 0.0)

    lane_spec = pl.BlockSpec((block_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    small = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    @jax.jit
    def run(cam_packed, seed, pass_idx, pix, sub, sample0=0):
        from bendy_tpu.utils.rng import render_key

        key = render_key(jnp.asarray(seed, jnp.uint32), jnp.asarray(pass_idx, jnp.uint32))
        B = pix.shape[0]
        aux = pack_aux(key, sample0, n_valid=B)
        block = block_rows * LANE
        pad = (-B) % block
        if pad:
            pix = jnp.concatenate([pix, jnp.zeros(pad, jnp.uint32)])
            sub = jnp.concatenate([sub, jnp.zeros(pad, jnp.uint32)])
        rows_total = (B + pad) // LANE
        grid = rows_total // block_rows

        inputs = [pix.reshape(rows_total, LANE), sub.reshape(rows_total, LANE),
                  cam_packed, aux]
        in_specs = [lane_spec, lane_spec, small(), small()]
        if vol_operand:
            inputs.append(jnp.asarray(grid_t_host))
            in_specs.append(small())
        for tab in tables_host:
            inputs.append(jnp.asarray(tab))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=[lane_spec] * N_OUT
            + [pl.BlockSpec((8, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((rows_total, LANE), jnp.float32)] * N_OUT
            + [jax.ShapeDtypeStruct((grid * 8, LANE), jnp.float32)],
            interpret=interpret,
        )(*inputs)

        flat = [o.reshape(-1)[:B] for o in outs[:N_OUT]]
        return TraceSums(
            radiance=V3(flat[0], flat[1], flat[2]),
            aov_albedo=V3(flat[3], flat[4], flat[5]),
            aov_normal=V3(flat[6], flat[7], flat[8]),
            aov_depth=flat[9],
            rays=jnp.sum(outs[N_OUT][:, 0]),
            iters=jnp.sum(outs[N_OUT][:, 1]),  # Σ over blocks
        )

    return run


def tile_perm(width: int, rows: int, nn: int, lanes_per_block: int):
    """Tile-major pixel ordering for block-coherent early exit.

    Each kernel block runs until its *slowest* lane finishes, so block
    throughput is set by the within-block spread of path lengths. In
    row-major order a block spans a full-width image strip (at 1080p,
    half a row) — mixing e.g. sky lanes with dark-corner lanes. This
    permutation assigns each block a square-ish image tile instead;
    expected path length varies smoothly in image space, so tiles are far
    more homogeneous than strips (measured occupancy: see PERF.md).

    Bit-identity: the RNG stream id is a pure function of the (pixel,
    sample, subpixel) VALUES (``wavefront.sample_id``), so any lane
    ordering renders the exact same image once outputs are restored to
    row-major; per-pixel subpixel sums add the same floats in the same
    order.

    The permutation is deliberately reshape/transpose-expressible — a
    per-lane gather to undo it measured 25% of the whole cornell pass on
    the axon link, wiping out the occupancy win. Full tile-rows over the
    full tile-columns come first, so the inverse on per-pixel sums is
    reshapes + one transpose per segment (see ``lane_order``); a ragged
    right edge (``width`` not a multiple of the tile width) and trailing
    rows not filling a tile-row stay row-major, appended after the tiled
    head — they lose tile coherence but keep the bulk's occupancy win
    instead of declining the whole geometry.

    Returns ``(perm, (tile_w, tile_h, rows_full, cols_full))`` over the
    chunk's ``rows*width`` pixels — numpy int64 — or ``(None, None)``
    when tiling would not change the order (blocks already narrower than
    the image).
    """
    import numpy as np

    pix_per_block = lanes_per_block // max(nn, 1)
    if pix_per_block <= 0:
        return None, None
    tile_w = 1 << max(0, int(round(np.log2(max(1.0, np.sqrt(pix_per_block))))))
    tile_w = min(tile_w, width)
    tile_h = max(1, pix_per_block // tile_w)
    rows_full = (rows // tile_h) * tile_h
    cols_full = (width // tile_w) * tile_w
    if tile_w >= width or tile_h <= 1 or rows_full == 0:
        return None, None
    full = np.arange(rows * width).reshape(rows, width)
    head = full[:rows_full, :cols_full].reshape(
        rows_full // tile_h, tile_h, cols_full // tile_w, tile_w
    ).transpose(0, 2, 1, 3).ravel()
    edge = full[:rows_full, cols_full:].ravel()  # ragged right edge
    tail = full[rows_full:, :].ravel()  # ragged trailing rows
    return np.concatenate([head, edge, tail]), (tile_w, tile_h, rows_full,
                                                cols_full)


def lane_order(width: int, rows: int, nn: int, lanes_per_block: int):
    """Static lane tables + inverse for tile-major ordering.

    Returns ``(pix_tiled [rows·width·nn] u32, sub_tiled, untile)`` where
    ``untile(c)`` reduces a [rows·width·nn] per-lane channel to row-major
    [rows, width] per-pixel sums via reshapes + one transpose; or ``None``
    when :func:`tile_perm` declines the geometry.
    """
    import numpy as np

    perm, tiling = tile_perm(width, rows, nn, lanes_per_block)
    if perm is None:
        _log_tile_decline(width, rows, nn, lanes_per_block)
        return None
    pix_tiled = jnp.asarray(np.repeat(perm, nn).astype(np.uint32))
    sub_tiled = jnp.asarray(np.tile(np.arange(nn, dtype=np.uint32), rows * width))
    tile_w, tile_h, rows_full, cols_full = tiling

    def untile(c):
        # per-pixel subpixel sums in tile order (nn lanes stay contiguous
        # under the perm), then undo the tiling with pure reshapes + one
        # transpose per segment — NOT a gather (a per-lane gather here
        # measured 25% of a whole cornell pass). Segments follow the perm:
        # tiled head, ragged right edge (row-major), trailing rows.
        pp = c.reshape(rows * width, nn).sum(axis=1)
        n_head = rows_full * cols_full
        head = pp[:n_head].reshape(
            rows_full // tile_h, cols_full // tile_w, tile_h, tile_w
        ).transpose(0, 2, 1, 3).reshape(rows_full, cols_full)
        if cols_full != width:
            edge = pp[n_head : rows_full * width].reshape(
                rows_full, width - cols_full
            )
            head = jnp.concatenate([head, edge], axis=1)
        if rows_full == rows:
            return head
        tail = pp[rows_full * width:].reshape(rows - rows_full, width)
        return jnp.concatenate([head, tail])

    return pix_tiled, sub_tiled, untile


_tile_declines: set = set()


def _log_tile_decline(width, rows, nn, lanes_per_block):
    """One stderr note per geometry when tile-major ordering is off: the
    fallback silently costs measured occupancy (0.67 -> 0.74 on volume
    scenes), so say it is happening (VERDICT r3 weak #5)."""
    key = (width, rows, nn, lanes_per_block)
    if key in _tile_declines:
        return
    _tile_declines.add(key)
    import sys

    print(
        f"bendy_tpu: tile-major lane order inactive for width={width} "
        f"rows={rows} nn={nn} lanes/block={lanes_per_block} (blocks not "
        "wider than the image); using row-major strips",
        file=sys.stderr,
    )


def pack_aux(key: tuple, sample0=0, n_valid=0) -> jnp.ndarray:
    k0, k1 = key
    return jnp.stack(
        [
            jnp.asarray(k0, jnp.uint32),
            jnp.asarray(k1, jnp.uint32),
            jnp.asarray(sample0, jnp.uint32),
            jnp.asarray(n_valid, jnp.uint32),
        ]
        + [jnp.uint32(0)] * 4
    ).reshape(1, 8)


def make_pallas_render_pass(
    scn: SceneArrays,
    width: int,
    height: int,
    rows: int,
    spp: int,
    subsample: int,
    cfg: TraceConfig,
    output: str,
    block_rows: int | None = None,
    interpret: bool = False,
    vol_operand: bool = False,
    tile: bool = True,
):
    """Megakernel equivalent of ``render.render_pass``: returns
    ``fn(cam_packed, seed, pass_idx, y_offset) -> (sums [rows,W,3], rays)``.

    ``tile=True`` (default) feeds lanes to the kernel in tile-major order
    (:func:`tile_perm`) — bit-identical output, higher block occupancy."""
    n = max(subsample, 1)
    nn = n * n
    tracer = make_pallas_tracer(scn, width, height, spp, subsample, cfg,
                                block_rows=block_rows, interpret=interpret,
                                vol_operand=vol_operand)
    eff_rows = block_rows if block_rows is not None else rows_for(cfg, vol_operand)
    order = lane_order(width, rows, nn, eff_rows * LANE) if tile else None
    if order is not None:
        pix_tiled, sub_tiled, untile = order

    @jax.jit
    def run(cam_packed, seed, pass_idx, y_offset):
        B = rows * width * nn
        if order is None:
            local = jnp.arange(B, dtype=jnp.uint32)
            sub = local % jnp.uint32(nn)
            pix = jnp.asarray(y_offset, jnp.uint32) * jnp.uint32(width) + local // jnp.uint32(nn)
        else:
            sub = sub_tiled
            pix = jnp.asarray(y_offset, jnp.uint32) * jnp.uint32(width) + pix_tiled
        res = tracer(cam_packed, seed, pass_idx, pix, sub)
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
                [c.reshape(rows, width, nn).sum(axis=2)
                 for c in (ch.x, ch.y, ch.z)], axis=-1
            )
        else:
            sums = jnp.stack([untile(c) for c in (ch.x, ch.y, ch.z)], axis=-1)
        return sums, res.rays

    return run
