"""Looped geodesic mass sweep (geodesic.geo_step_begin_looped / rk4_step_looped).

Like the looped primitive sweep, looping the mass sweep is a
compile-time/state trade: capture, far-field and step size run the exact
unrolled arithmetic in the exact order (bit-identity gates), while the
RK4 acceleration RECOMPUTES h² per stage instead of carrying M frozen
per-mass [B] arrays — a different (equally valid) discretization of the
same ODE, so the physics gates re-run on this path and the image gates
are statistical against the frozen-h² unroll.

No reference counterpart: the reference advertises lensing but traces
straight rays (``src/tracer/ray.rs:84-117``, SURVEY.md §0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bendy_tpu.geodesic import (
    MASS_BLOCK,
    MASS_NCOLS,
    GeoParams,
    geo_step_begin,
    geo_step_begin_looped,
    mass_table,
    rk4_step,
    rk4_step_looped,
)
from bendy_tpu.models.mass_cluster import build_mass_cluster
from bendy_tpu.render import MASS_LOOP_THRESHOLD, Config, Renderer
from bendy_tpu.scene import load_scene
from bendy_tpu.scene.compiler import compile_scene
from bendy_tpu.scene.graph import (
    Data,
    Material,
    Object,
    ObjectFlags,
    Scene,
    Sphere,
)
from bendy_tpu.utils.v3 import V3


def multi_mass_scene(n_masses: int = 5) -> Scene:
    """Lean n-mass scene: a mass ring + a few emitters behind it."""
    scene = Scene()
    env = scene.add_data(Data(Material.emissive((0.2, 0.22, 0.3), 0.05)))
    scene.set_root_material(env)
    from bendy_tpu.scene.graph import Camera

    scene.add_object(
        Object(Camera(focal_length=0.05, sensor_size=0.024, focus=None))
        .with_tag("camera")
        .with_translation([0.0, 0.0, 18.0])
    )
    for k in range(n_masses):
        ang = 2.0 * np.pi * k / n_masses
        rs = 0.05 * (1 + k % 3)
        scene.add_object(
            Object()
            .with_tag(f"mass:{rs}")
            .with_translation([1.8 * np.cos(ang), 1.4 * np.sin(ang), 0.3 * (k % 2)])
        )
    for i, (px, py) in enumerate([(-4.0, 2.5), (3.5, -2.0), (0.2, 0.1), (5.0, 4.0)]):
        mat = scene.add_data(Data(Material.emissive((1.0, 0.8, 0.6), 1.5 + 0.3 * i)))
        scene.add_object(
            Object(Sphere(material=mat, radius=0.8))
            .with_translation([px, py, -25.0])
            .with_flags(ObjectFlags.LIGHT)
        )
    return scene


def _rand_state(scn_seed=0, B=256):
    rng = np.random.default_rng(scn_seed)
    x = V3(*(jnp.asarray(rng.normal(0, 6, B), jnp.float32) for _ in range(3)))
    d = rng.normal(size=(3, B))
    d /= np.linalg.norm(d, axis=0)
    dv = V3(*(jnp.asarray(d[i], jnp.float32) for i in range(3)))
    return x, dv


def test_mass_table_layout_and_padding():
    scn = compile_scene(multi_mass_scene(5))
    tab = np.asarray(mass_table(scn, jnp))
    assert tab.shape == (((5 + MASS_BLOCK - 1) // MASS_BLOCK) * MASS_BLOCK, MASS_NCOLS)
    assert (tab[:5, 4] == 1.0).all() and (tab[5:] == 0.0).all()
    np.testing.assert_array_equal(tab[:5, :3], np.asarray(scn.mass_center))
    np.testing.assert_array_equal(tab[:5, 3], np.asarray(scn.mass_rs))


def test_begin_looped_matches_unrolled():
    """captured / far / ds from the looped sweep match the unrolled
    geo_step_begin: identical expressions in identical order, BUT XLA
    fuses the fori body and the flat unroll differently (FMA
    reassociation), so ds lands within 1 ulp rather than bit-equal
    (observed: 1.9e-7 max rel on 9% of random states) — the same class
    of graph-shape rounding the megakernel parity gates document. The
    capture/far masks are pure compares and gate exact on these seeds;
    pad rows (5 -> 8) must be neutral."""
    scn = compile_scene(multi_mass_scene(5))  # pads 5 -> 8: exercises valid
    geo = GeoParams()
    x, d = _rand_state(1)
    steps = jnp.asarray(np.random.default_rng(2).integers(0, 200, x.x.shape[0]),
                        jnp.int32)
    cap_u, far_u, ds_u, _ = jax.jit(
        lambda xx, dd: geo_step_begin(scn, xx, dd, geo, steps=steps)
    )(x, d)
    cap_l, far_l, ds_l = jax.jit(
        lambda xx, dd: geo_step_begin_looped(scn, xx, dd, geo, steps=steps)
    )(x, d)
    np.testing.assert_array_equal(np.asarray(cap_u), np.asarray(cap_l))
    np.testing.assert_array_equal(np.asarray(far_u), np.asarray(far_l))
    np.testing.assert_allclose(np.asarray(ds_u), np.asarray(ds_l), rtol=3e-7)


def test_rk4_looped_matches_recompute_unrolled():
    """One looped RK4 step == the generic per-stage-h² unrolled step to
    float tolerance (cross-product vs Lagrange h²: same value up to
    rounding)."""
    scn = compile_scene(multi_mass_scene(6))
    x, d = _rand_state(3)
    ds = jnp.full(x.x.shape, 0.05, jnp.float32)
    xu, du = jax.jit(lambda xx, dd: rk4_step(scn, xx, dd, ds))(x, d)
    xl, dl = jax.jit(lambda xx, dd: rk4_step_looped(scn, xx, dd, ds))(x, d)
    for a, b in [(xu, xl), (du, dl)]:
        for ch in ("x", "y", "z"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, ch)), np.asarray(getattr(b, ch)),
                rtol=2e-5, atol=1e-6,
            )


def test_weak_field_angle_looped():
    """alpha = 2·rs/b on the looped path (the physics gate re-run)."""
    from bendy_tpu.scene.graph import Camera

    scene = Scene()
    scene.add_object(Object().with_tag("mass:0.01"))
    mat = scene.add_data(Data(Material.emissive((1, 1, 1), 1.0)))
    scene.add_object(
        Object(Sphere(material=mat, radius=0.1))
        .with_translation([0, 0, 500.0])
        .with_flags(ObjectFlags.LIGHT)
    )
    scene.add_object(Object(Camera()).with_tag("camera"))
    scn = compile_scene(scene)
    rs = 0.01

    @jax.jit
    def fly(b):
        def step(_, xd):
            x, d = xd
            h = jnp.full_like(x.x, 0.05)
            return rk4_step_looped(scn, x, d, h)

        x0 = V3(jnp.full(1, -60.0), jnp.full(1, b), jnp.zeros(1))
        d0 = V3(jnp.ones(1), jnp.zeros(1), jnp.zeros(1))
        x, d = jax.lax.fori_loop(0, 2600, step, (x0, d0))
        return x.x[0], jnp.arctan2(-d.y[0], d.x[0])

    for b in [1.0, 2.0]:
        xf, alpha = fly(b)
        assert float(xf) > 50.0
        assert float(alpha) == pytest.approx(2.0 * rs / b, rel=0.05)


def test_renderer_derives_looped_masses():
    big = build_mass_cluster(MASS_LOOP_THRESHOLD + 4)
    r = Renderer(big, Config(), use_pallas=False)
    assert r.arrays.n_masses == MASS_LOOP_THRESHOLD + 4
    assert r.trace_config(r.config).looped_masses

    small = Renderer(load_scene("scenes/blackhole.json.gz"), Config(),
                     use_pallas=False)
    assert not small.trace_config(small.config).looped_masses


def test_mass_cluster_matches_native_oracle():
    """End-to-end image gate for the looped mass path: a 12-mass scene
    rendered with looped_masses=True vs the C++ oracle, whose geo_accel
    recomputes h per stage (``native/oracle.cpp``) — the SAME
    discretization the looped path uses, so this is the direct oracle
    for it (the frozen-h² unroll is gated by the blackhole /
    binary_blackhole image tests). Thresholds follow
    test_binary_blackhole_matches_native_oracle.

    Note the deliberate asymmetry with the image-statistical gates of
    the scattering scenes: emissive-only lensing paths are DETERMINISTIC
    per (pixel, sample) — only camera jitter is random — so a
    looped-vs-frozen image comparison measures trajectory chaos near
    caustics, not estimator agreement (whole bright pixels flip on
    1e-6-level step differences). Equivalence of the two discretizations
    is instead established stepwise: test_rk4_looped_matches_recompute_
    unrolled here (looped == per-stage unroll, 2e-5) composed with
    test_geodesic.py::test_frozen_h2_matches_generic_rk4 (per-stage ==
    frozen, 1e-3 on a full flyby)."""
    from bendy_tpu.native import available, oracle_render_scene
    from bendy_tpu.ops.wavefront import trace
    from bendy_tpu.utils.rng import render_key

    if not available():
        pytest.skip("native oracle not built")

    geo = GeoParams(max_steps=96)
    scene = multi_mass_scene(12)
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0

    r = Renderer(scene, Config(max_bounces=2, geo=geo), use_pallas=False)
    cfg = r.trace_config(r.config, cam_ref)._replace(looped_masses=True)
    assert cfg.geodesic and r.arrays.n_masses == 12
    W = H = 24
    spp = 32
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sub = jnp.zeros(W * H, jnp.uint32)
    res = trace(
        r.arrays, r.camera_params(cam_ref),
        render_key(jnp.uint32(6), jnp.uint32(0)),
        pix, sub, W, H, spp, 1, cfg,
    )
    ours = np.stack(
        [np.asarray(c).reshape(H, W) for c in res.radiance], -1
    ) / spp
    ref = oracle_render_scene(scene, W, H, 64, seed=3, max_bounces=2,
                              geo=cfg.geo)

    d = np.abs((ours - ref).mean(axis=(1, 2)))
    assert d.max() < 0.1, d
    assert abs(ours.mean() - ref.mean()) < 0.03
    corr = np.corrcoef(ours.mean(-1).ravel(), ref.mean(-1).ravel())[0, 1]
    assert corr > 0.92, corr


def test_megakernel_looped_masses_with_volume_march():
    """Mode combination: looped masses x volume march. Capture must apply
    to marching lanes through the LOOPED begin sweep too (a medium
    enclosing a mass must not let straight march segments tunnel through
    the horizon — the blackhole_cloud semantic), and the megakernel must
    run the mass fori and the baked scalar-unroll density lookup in one
    body. Gate: interpret kernel == XLA, volume-knife-edge tolerant."""
    from bendy_tpu.ops.pallas_trace import make_pallas_tracer, pack_camera
    from bendy_tpu.ops.wavefront import trace
    from bendy_tpu.scene.graph import DensityMap
    from bendy_tpu.utils.rng import render_key

    scene = multi_mass_scene(12)
    vol = scene.add_data(Data(DensityMap.with_func(
        8, 8, 8, lambda x, y, z: 1.5 if (x + y + z) % 3 == 0 else 0.0)))
    shell = scene.add_data(Data(Material.flat((1.0, 1.0, 1.0))))
    scene.add_object(Object(Sphere(material=shell, radius=2.5, volume=vol)))

    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=2, max_volume_bounces=8,
                               geo=GeoParams(max_steps=64)),
                 use_pallas=False)
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)._replace(looped_masses=True)
    assert cfg.geodesic and cfg.has_volumes

    W = H = 16
    spp = 1
    B = W * H
    pix = jnp.arange(B, dtype=jnp.uint32)
    sub = jnp.zeros(B, jnp.uint32)
    key = render_key(jnp.uint32(21), jnp.uint32(0))

    xla = trace(r.arrays, cam, key, pix, sub, W, H, spp, 1, cfg)
    kern = make_pallas_tracer(r.arrays, W, H, spp, 1, cfg,
                              block_rows=B // 128, interpret=True)
    pal = kern(pack_camera(cam), jnp.uint32(21), jnp.uint32(0), pix, sub)
    # volume scatter decisions are Bernoulli knife-edges: different
    # rounding between the block-shaped kernel and the flat XLA graph can
    # flip isolated lanes (same tolerance as test_pallas._volume_parity)
    for ch in ("x", "y", "z"):
        a = np.asarray(getattr(pal.radiance, ch))
        b = np.asarray(getattr(xla.radiance, ch))
        off = np.abs(a - b) > (5e-4 * np.abs(b) + 1e-5)
        assert off.mean() <= 1 / 128, f"{ch}: {off.sum()} lanes diverged"
        assert abs(a.mean() - b.mean()) < 5e-3


def test_megakernel_all_tables_together():
    """Every SMEM table at once: looped primitives (sph/rct/box) +
    looped lights + looped masses in ONE kernel — gates the table-key
    ordering and ref plumbing end to end. Interpret kernel == XLA."""
    from bendy_tpu.models.prim_grid import build_prim_grid
    from bendy_tpu.ops.pallas_trace import make_pallas_tracer, pack_camera
    from bendy_tpu.ops.wavefront import trace
    from bendy_tpu.utils.rng import render_key

    scene = build_prim_grid(24)
    for k in range(10):
        scene.add_object(
            Object()
            .with_tag(f"mass:{0.01 * (1 + k % 2)}")
            .with_translation([0.5 * k - 2.2, 0.3 * (k % 3), -2.0])
        )
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=2, geo=GeoParams(max_steps=48)),
                 use_pallas=False)
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)._replace(
        looped_sweep=True, looped_lights=True, looped_masses=True)
    assert cfg.geodesic

    W = H = 16
    spp = 1
    B = W * H
    pix = jnp.arange(B, dtype=jnp.uint32)
    sub = jnp.zeros(B, jnp.uint32)
    key = render_key(jnp.uint32(33), jnp.uint32(0))

    xla = trace(r.arrays, cam, key, pix, sub, W, H, spp, 1, cfg)
    kern = make_pallas_tracer(r.arrays, W, H, spp, 1, cfg,
                              block_rows=B // 128, interpret=True)
    pal = kern(pack_camera(cam), jnp.uint32(33), jnp.uint32(0), pix, sub)
    for ch in ("x", "y", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(pal.radiance, ch)),
            np.asarray(getattr(xla.radiance, ch)),
            rtol=5e-4, atol=1e-5,
        )
    assert float(pal.rays) == pytest.approx(float(xla.rays))


def test_megakernel_interpret_matches_xla_looped_masses():
    """The SMEM mass-table plumbing: megakernel (interpret) == XLA path
    with looped_masses, same tolerance as the other kernel parity gates."""
    from bendy_tpu.ops.pallas_trace import make_pallas_tracer, pack_camera
    from bendy_tpu.ops.wavefront import trace
    from bendy_tpu.utils.rng import render_key

    W = H = 16
    spp = 1
    scene = multi_mass_scene(5)
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=2,
                               geo=GeoParams(max_steps=96)),
                 use_pallas=False)
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config)._replace(looped_masses=True)
    assert cfg.geodesic

    B = W * H
    pix = jnp.arange(B, dtype=jnp.uint32)
    sub = jnp.zeros(B, jnp.uint32)
    key = render_key(jnp.uint32(13), jnp.uint32(0))

    xla = trace(r.arrays, cam, key, pix, sub, W, H, spp, 1, cfg)
    kern = make_pallas_tracer(r.arrays, W, H, spp, 1, cfg,
                              block_rows=B // 128, interpret=True)
    pal = kern(pack_camera(cam), jnp.uint32(13), jnp.uint32(0), pix, sub)
    for ch in ("x", "y", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(pal.radiance, ch)),
            np.asarray(getattr(xla.radiance, ch)),
            rtol=5e-4, atol=1e-5,
        )
    assert float(pal.rays) == pytest.approx(float(xla.rays))
