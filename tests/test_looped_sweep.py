"""Looped primitive sweep (ops/intersect.nearest_hit_looped).

The fori_loop row sweep must be a pure compile-time trade: identical
float arithmetic in identical order to the statically-unrolled sweep, so
every gate is exact bit-identity. Correctness at scale is gated against
the C++ oracle at 256+ primitives — a count the unrolled path cannot
even compile in reasonable time on XLA-CPU (docs/prim_scaling.json).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bendy_tpu.film import Film
from bendy_tpu.models.prim_grid import build_prim_grid
from bendy_tpu.ops.intersect import nearest_hit, nearest_hit_looped
from bendy_tpu.render import (
    LOOP_SWEEP_THRESHOLD,
    Config,
    Renderer,
    RenderConfig,
    Subsample,
)
from bendy_tpu.scene import load_scene
from bendy_tpu.scene.compiler import compile_scene
from bendy_tpu.utils.v3 import V3


def _leaves_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        x, y = np.asarray(x), np.asarray(y)
        if x.dtype.kind == "f":
            x = np.nan_to_num(x, posinf=1e30)  # +inf == +inf
            y = np.nan_to_num(y, posinf=1e30)
        if not np.array_equal(x, y):
            return False
    return True


@pytest.mark.parametrize("name,march", [("cornell", False), ("cloud", True),
                                        ("scene", False)])
def test_nearest_hit_looped_bit_identical(name, march):
    """Random rays over every primitive-kind mix (rects+boxes, volume
    spheres with march lanes, plain spheres): all Hit fields bit-equal."""
    scn = compile_scene(load_scene(f"scenes/{name}.json.gz"))
    rng = np.random.default_rng(0)
    B = 512
    org = V3(*(jnp.asarray(rng.normal(0, 3, B), jnp.float32) for _ in range(3)))
    d = rng.normal(size=(3, B))
    d /= np.linalg.norm(d, axis=0)
    dirv = V3(*(jnp.asarray(d[i], jnp.float32) for i in range(3)))
    cmin, cmax = 0.01, 1000.0
    kw = {}
    if march:
        kw = dict(
            march=jnp.asarray(rng.random(B) < 0.3),
            last_sphere=jnp.asarray(
                rng.integers(-1, scn.n_spheres, B), jnp.int32
            ),
        )
        cmin = jnp.where(kw["march"], 0.0, cmin)
        cmax = jnp.where(kw["march"], 0.1, cmax)
    a = jax.jit(lambda o, dd: nearest_hit(o, dd, cmin, cmax, scn, **kw))(org, dirv)
    b = jax.jit(lambda o, dd: nearest_hit_looped(o, dd, cmin, cmax, scn, **kw))(
        org, dirv
    )
    for f in a._fields:
        assert _leaves_equal(getattr(a, f), getattr(b, f)), f


def _render(scene, force_looped=None, spp=4, wh=24, config=None):
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, config or Config(), use_pallas=False)
    if force_looped is not None:
        orig = r.trace_config

        def tc(cfg, camera_ref=None):
            # force BOTH loops: the bit-identity gates compare the fully
            # looped machinery (prim + light fori sweeps) vs the fully
            # unrolled one (the production derives them independently:
            # LOOP_SWEEP_THRESHOLD prims / LIGHT_LOOP_THRESHOLD lights)
            return orig(cfg, camera_ref)._replace(
                looped_sweep=force_looped, looped_lights=force_looped
            )

        r.trace_config = tc
    film = Film(wh, wh)
    r.render(cam_ref, RenderConfig(samples=spp, subsample=Subsample(1)), film, seed=5)
    return film.mean(), r


def test_looped_render_bit_identical():
    """Full render of a mixed sphere/box/rect scene: looped == unrolled."""
    img_u, _ = _render(build_prim_grid(8), force_looped=False)
    img_l, _ = _render(build_prim_grid(8), force_looped=True)
    assert np.array_equal(img_u, img_l)


@pytest.mark.parametrize("channel", ["albedo", "normal", "depth"])
def test_looped_render_bit_identical_aovs(channel):
    """AOV channels through the looped sweep (the claim pipeline reads
    Hit fields the sweep carries): looped == unrolled, bit for bit."""
    from bendy_tpu.render import Output

    cfgo = Config(output=Output(channel))
    img_u, _ = _render(build_prim_grid(8), force_looped=False, config=cfgo)
    img_l, _ = _render(build_prim_grid(8), force_looped=True, config=cfgo)
    assert np.array_equal(img_u, img_l)


@pytest.mark.parametrize("name", ["volume", "blackhole"])
def test_looped_render_bit_identical_modes(name):
    """Looped sweep under the other mode machines: the volume march
    (last_sphere re-test rides the sphere loop's traced row ids) and the
    geodesic chord stepping (clip interplay) — full renders bit-equal."""
    img_u, _ = _render(load_scene(f"scenes/{name}.json.gz"), force_looped=False)
    img_l, _ = _render(load_scene(f"scenes/{name}.json.gz"), force_looped=True)
    assert np.array_equal(img_u, img_l)


def test_looped_render_bit_identical_carries_off():
    """Diffuse-only mix: the derived config compiles the rough/ior
    attribute carries OFF, which skips their column loads and
    scalar-collapses the dead _Sweep fori carries (ops/intersect.py).
    The render must stay bit-identical to the unrolled sweep, and the
    CARRY_PROBE="force_on" arm (the --carry-ab A/B's old behavior:
    loads + [B] carries) must produce the identical film as well."""
    import bendy_tpu.ops.intersect as intersect

    img_u, r = _render(build_prim_grid(8, mix="diffuse"), force_looped=False)
    cfg = r.trace_config(r.config)
    assert not cfg.has_metallic and not cfg.has_glass and not cfg.has_volumes
    img_l, _ = _render(build_prim_grid(8, mix="diffuse"), force_looped=True)
    assert np.array_equal(img_u, img_l)

    # force_on at a fresh static shape (wh=20): the jitted trace caches
    # on statics, so reusing wh=24 would silently return the cached
    # carries-off executable instead of compiling the probe arm
    img_u2, _ = _render(build_prim_grid(8, mix="diffuse"),
                        force_looped=False, wh=20)
    old = intersect.CARRY_PROBE
    intersect.CARRY_PROBE = "force_on"
    try:
        img_f, _ = _render(build_prim_grid(8, mix="diffuse"),
                           force_looped=True, wh=20)
    finally:
        intersect.CARRY_PROBE = old
    assert np.array_equal(img_u2, img_f)


def test_loop_policy_derivation():
    """Renderer derives looped_sweep above the threshold, never below, and
    keeps the megakernel off the looped path."""
    r_small = Renderer(load_scene("scenes/cornell.json.gz"), Config())
    assert r_small.prim_count <= LOOP_SWEEP_THRESHOLD
    assert not r_small.trace_config(r_small.config).looped_sweep

    big = build_prim_grid(LOOP_SWEEP_THRESHOLD + 8)
    r_big = Renderer(big, Config())
    assert r_big.prim_count > LOOP_SWEEP_THRESHOLD
    assert r_big.trace_config(r_big.config).looped_sweep


def test_looped_sweep_sharded_equals_single_device():
    """The fori_loop sweep under shard_map: a (4, 2) tiles×samples mesh
    renders the same film as one device (global RNG stream ids make the
    per-lane values identical; only f32 summation order differs)."""
    from bendy_tpu.parallel.mesh import make_mesh, render_pass_sharded
    from bendy_tpu.render import render_pass

    scene = build_prim_grid(LOOP_SWEEP_THRESHOLD + 8)
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=2))
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)
    assert cfg.looped_sweep
    W = H = 16
    spp_total = 4

    single, rays1 = render_pass(
        r.arrays, cam, jnp.uint32(3), jnp.uint32(0), jnp.int32(0),
        W, H, H, spp_total, 1, cfg, "full",
    )
    mesh = make_mesh(4, 2)
    sharded, rays2 = render_pass_sharded(
        r.arrays, cam, jnp.uint32(3), jnp.uint32(0), mesh,
        W, H, spp_total // 2, 1, cfg, "full",
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), rtol=2e-5, atol=2e-5
    )
    assert float(rays1) == pytest.approx(float(rays2))


def test_looped_lights_bit_identical():
    """Looped light sweeps (sample_light_point_looped / light_pdf_looped)
    against the unrolled ones on a 12-light mixed sphere/rect-light
    scene: full renders bit-equal."""
    from bendy_tpu.models.prim_grid import build_light_field

    img_u, _ = _render(build_light_field(12), force_looped=False)
    img_l, _ = _render(build_light_field(12), force_looped=True)
    assert np.array_equal(img_u, img_l)


def test_many_lights_render():
    """A 200-light scene renders through the auto-selected looped path
    (the reference handles any light count at zero compile cost,
    ``material.rs:106-122``; the unrolled light sweeps would hit the
    same superlinear-compile wall the primitive unroll did)."""
    from bendy_tpu.models.prim_grid import build_light_field

    scene = build_light_field(200)
    img, r = _render(scene, wh=16, spp=2)
    assert r.trace_config(r.config).looped_sweep  # 201 prims: auto looped
    assert r.trace_config(r.config).looped_lights  # 200 > LIGHT_LOOP_THRESHOLD
    assert np.isfinite(img).all()
    assert img.mean() > 0.0  # lights actually illuminate the ground


def test_looped_megakernel_with_dense_grid_operand():
    """vol_operand (density grid as a VMEM operand) and looped tables
    (SMEM operands) shipped into the SAME kernel: exercises the input
    ordering in make_pallas_tracer's rest-parsing. Interpret mode vs the
    XLA looped trace."""
    from bendy_tpu.models.dense_cloud import blob_density
    from bendy_tpu.ops.pallas_trace import make_pallas_tracer, pack_camera
    from bendy_tpu.ops.wavefront import trace
    from bendy_tpu.scene.graph import Data, Material, Object, Sphere
    from bendy_tpu.utils.rng import render_key

    scene = build_prim_grid(LOOP_SWEEP_THRESHOLD + 8)
    vol = scene.add_data(Data(blob_density(8)))
    mat = scene.add_data(Data(Material.diffuse((0.7, 0.7, 0.7), 0.8)))
    scene.add_object(
        Object(Sphere(material=mat, radius=1.2, volume=vol))
        .with_translation([0.0, 2.5, 0.0])
    )
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=2), use_pallas=False)
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)
    assert cfg.looped_sweep and cfg.has_volumes

    W = H = 16
    spp = 2
    B = W * H
    pix = jnp.arange(B, dtype=jnp.uint32)
    sub = jnp.zeros(B, jnp.uint32)
    xla = trace(r.arrays, cam, render_key(jnp.uint32(3), jnp.uint32(0)),
                pix, sub, W, H, spp, 1, cfg)
    kern = make_pallas_tracer(
        r.arrays, W, H, spp, 1, cfg, block_rows=B // 128, interpret=True,
        vol_operand=True,
    )
    pal = kern(pack_camera(cam), jnp.uint32(3), jnp.uint32(0), pix, sub)
    for ch in ("x", "y", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(pal.radiance, ch)),
            np.asarray(getattr(xla.radiance, ch)),
            rtol=5e-4, atol=1e-5,
        )
    assert float(pal.rays) == pytest.approx(float(xla.rays))


def test_multi_light_matches_native_oracle():
    """16 LIGHT-flagged emitters (mixed spheres and rects): the uniform
    light pick + per-light mixture pdf (``material.rs:106-137``) against
    the C++ oracle. Every bundled scene has exactly one light, so this is
    the only gate on the L>1 estimator — it runs the normal unrolled
    path (17 prims), and the looped path is pinned bit-identical to it
    by test_looped_lights_bit_identical."""
    from bendy_tpu.models.prim_grid import build_light_field
    from bendy_tpu.native import available, oracle_render_scene
    from bendy_tpu.ops.wavefront import trace
    from bendy_tpu.utils.rng import render_key

    if not available():
        pytest.skip("native oracle not built")

    scene = build_light_field(16)
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    W = H = 24
    spp = 192
    r = Renderer(scene, Config(max_bounces=3))
    cfg = r.trace_config(r.config, cam_ref)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sub = jnp.zeros(W * H, jnp.uint32)
    res = trace(
        r.arrays, r.camera_params(cam_ref),
        render_key(jnp.uint32(5), jnp.uint32(0)),
        pix, sub, W, H, spp, 1, cfg,
    )
    ours = np.stack([np.asarray(c).reshape(H, W) for c in res.radiance], -1) / spp
    ref = oracle_render_scene(scene, W, H, 192, seed=21, max_bounces=3)
    ref2 = oracle_render_scene(scene, W, H, 192, seed=77, max_bounces=3)

    def metrics(a, b):
        return (
            np.abs((a - b).mean(axis=(1, 2))).max(),
            np.abs((a - b).mean(axis=(0, 2))).max(),
            np.corrcoef(a.mean(-1).ravel(), b.mean(-1).ravel())[0, 1],
        )

    row, col, corr = metrics(ours, ref)
    row_c, col_c, corr_c = metrics(ref2, ref)
    assert row < 1.5 * row_c + 0.01, (row, row_c)
    assert col < 1.5 * col_c + 0.01, (col, col_c)
    assert corr > corr_c - 0.01, (corr, corr_c)
    assert abs(ours.mean() - ref.mean()) < 0.03


def test_looped_megakernel_matches_xla_interpret():
    """The looped megakernel (primitive-row tables as SMEM operands,
    scalar loads per row) through the Pallas interpreter == the XLA
    looped path, lane for lane. This is the CI stand-in for the Mosaic
    build; bench.py's hardware rows cover the real chip."""
    from bendy_tpu.ops.pallas_trace import make_pallas_tracer, pack_camera
    from bendy_tpu.ops.wavefront import trace
    from bendy_tpu.utils.rng import render_key

    W = H = 16
    spp = 4
    scene = build_prim_grid(LOOP_SWEEP_THRESHOLD + 8)
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=3), use_pallas=False)
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)
    assert cfg.looped_sweep
    B = W * H
    pix = jnp.arange(B, dtype=jnp.uint32)
    sub = jnp.zeros(B, jnp.uint32)
    key = render_key(jnp.uint32(7), jnp.uint32(0))

    xla = trace(r.arrays, cam, key, pix, sub, W, H, spp, 1, cfg)
    kern = make_pallas_tracer(
        r.arrays, W, H, spp, 1, cfg, block_rows=B // 128, interpret=True
    )
    pal = kern(pack_camera(cam), jnp.uint32(7), jnp.uint32(0), pix, sub)
    for ch in ("x", "y", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(pal.radiance, ch)),
            np.asarray(getattr(xla.radiance, ch)),
            rtol=5e-4, atol=1e-5,
        )
    assert float(pal.rays) == pytest.approx(float(xla.rays))


def test_looped_prim_grid_256_matches_native_oracle():
    """256-primitive scene through the auto-selected looped sweep vs the
    C++ oracle's linear scan (``src/tracer/mod.rs:389-402`` semantics) —
    a scale the unrolled sweep cannot compile in reasonable time on
    XLA-CPU (the 66-prim unrolled body alone takes ~10-20 min there)."""
    from bendy_tpu.native import available, oracle_render_scene
    from bendy_tpu.ops.wavefront import trace
    from bendy_tpu.utils.rng import render_key

    if not available():
        pytest.skip("native oracle not built")

    scene = build_prim_grid(256)
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0

    W = H = 24
    spp = 256
    r = Renderer(scene, Config(max_bounces=3))
    cfg = r.trace_config(r.config, cam_ref)
    assert cfg.looped_sweep  # 258 prims: auto policy must pick the loop
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sub = jnp.zeros(W * H, jnp.uint32)
    res = trace(
        r.arrays, r.camera_params(cam_ref),
        render_key(jnp.uint32(31), jnp.uint32(0)),
        pix, sub, W, H, spp, 1, cfg,
    )
    ours = np.stack([np.asarray(c).reshape(H, W) for c in res.radiance], -1) / spp
    ref = oracle_render_scene(scene, W, H, 256, seed=8, max_bounces=3)
    # gates are relative to the oracle's OWN seed-to-seed spread at the
    # same spp (glass/metal variance at 24x24 dominates any structural
    # error; measured ceiling: rowmax 0.041, colmax 0.070, corr 0.979)
    ref2 = oracle_render_scene(scene, W, H, 256, seed=99, max_bounces=3)

    def metrics(a, b):
        return (
            np.abs((a - b).mean(axis=(1, 2))).max(),
            np.abs((a - b).mean(axis=(0, 2))).max(),
            np.corrcoef(a.mean(-1).ravel(), b.mean(-1).ravel())[0, 1],
        )

    row, col, corr = metrics(ours, ref)
    row_c, col_c, corr_c = metrics(ref2, ref)
    assert row < 1.5 * row_c + 0.01, (row, row_c)
    assert col < 1.5 * col_c + 0.01, (col, col_c)
    assert corr > corr_c - 0.01, (corr, corr_c)
    assert abs(ours.mean() - ref.mean()) < 0.03


def test_cuboid_light_looped_bit_identical():
    """The F>1 face-CDF branch through BOTH sweep paths: a LIGHT-flagged
    cuboid (6-face area CDF) + rect light, looped == unrolled renders
    bit for bit (``cuboid.rs:48-81`` semantics in each)."""
    from bendy_tpu.models.prim_grid import build_cuboid_light

    img_u, _ = _render(build_cuboid_light(), force_looped=False)
    img_l, _ = _render(build_cuboid_light(), force_looped=True)
    assert np.array_equal(img_u, img_l)


def test_cuboid_light_matches_native_oracle():
    """End-to-end oracle gate on a LIGHT-flagged cuboid: the area-weighted
    face pick + nearest-face pdf (``src/scene/object/cuboid.rs:48-81``,
    ``material.rs:106-122``). Closes VERDICT r3 missing #3: the F>1 CDF
    branch previously had unit pdf tests but zero image-level coverage.

    Gates are held to the oracle's OWN seed-to-seed spread at matched
    spp (cornell-class tightness; the scene's high-contrast small
    emitters carry ~2x cornell's per-sample variance, so absolute
    cornell numbers would just gate noise — measured at 1024 spp: ours
    row-max 0.0154 / bias 0.0183 vs oracle self-noise 0.0094 / 0.0167,
    global mean diff 0.0007)."""
    from bendy_tpu.models.prim_grid import build_cuboid_light
    from bendy_tpu.native import available, oracle_render_scene
    from bendy_tpu.ops.wavefront import trace
    from bendy_tpu.utils.rng import render_key

    if not available():
        pytest.skip("native oracle not built")

    scene = build_cuboid_light()
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    W = H = 16
    spp = 256
    r = Renderer(scene, Config(max_bounces=3))
    cfg = r.trace_config(r.config, cam_ref)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sub = jnp.zeros(W * H, jnp.uint32)
    res = trace(
        r.arrays, r.camera_params(cam_ref),
        render_key(jnp.uint32(5), jnp.uint32(0)),
        pix, sub, W, H, spp, 1, cfg,
    )
    ours = np.stack([np.asarray(c).reshape(H, W) for c in res.radiance], -1) / spp
    ref = oracle_render_scene(scene, W, H, 1024, seed=11, max_bounces=3)
    ceil = oracle_render_scene(scene, W, H, spp, seed=77, max_bounces=3)

    def metrics(a):
        d = a - ref
        rows = np.abs(d.mean(axis=(1, 2)))
        bright = ref.mean(axis=(1, 2)) > 1.0
        mask = ref.mean(-1) < 3.0  # exclude direct-light pixels
        return (rows[~bright].max(), np.abs(d.mean(-1)[mask]).mean(),
                abs(float(a.mean() - ref.mean())))

    row, bias, mean_d = metrics(ours)
    row_c, bias_c, _ = metrics(ceil)
    assert row < 1.5 * row_c + 0.01, (row, row_c)
    assert bias < 1.5 * bias_c + 0.005, (bias, bias_c)
    assert mean_d < 0.02, mean_d  # no global estimator bias
    # the cuboid light must actually contribute (not a black render)
    assert ref.mean() > 0.02 and ours.mean() > 0.02
