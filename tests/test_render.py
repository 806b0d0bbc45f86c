"""End-to-end renderer tests: MSE gate vs the native oracle, channels,
film semantics, determinism. Runs on the CPU backend (conftest)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bendy_tpu.film import Film
from bendy_tpu.render import Config, Output, Renderer, RenderConfig, Subsample
from bendy_tpu.scene import load_scene
from bendy_tpu.utils.rng import render_key


@pytest.fixture(scope="module")
def cornell_nodof():
    scene = load_scene("scenes/cornell.json.gz")
    cam_ref = scene.find_by_tag("camera")
    cam = scene.get_object(cam_ref).inner
    cam.aspect_ratio = 1.0
    cam.focus = None  # kill defocus noise for tight statistical gates
    return scene, cam_ref


@pytest.fixture(scope="module")
def traced(cornell_nodof):
    """One 16x16 trace (mb=2, 192 spp) shared across channel tests."""
    from bendy_tpu.ops.wavefront import trace

    scene, cam_ref = cornell_nodof
    r = Renderer(scene, Config(max_bounces=2))
    W = H = 16
    spp = 192
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sub = jnp.zeros(W * H, jnp.uint32)
    key = render_key(jnp.uint32(5), jnp.uint32(0))
    # want_aovs: FULL output drops the AOV pipeline by default
    cfg = r.trace_config(r.config)._replace(want_aovs=True)
    res = trace(
        r.arrays, r.camera_params(cam_ref), key, pix, sub, W, H, spp, 1, cfg,
    )
    return r, res, W, H, spp


def test_mse_gate_vs_native_oracle(cornell_nodof, traced):
    """The BASELINE.md fidelity gate, with the C++ oracle as ground truth."""
    from bendy_tpu.native import available, oracle_render_scene

    if not available():
        pytest.skip("native oracle not built")
    scene, _ = cornell_nodof
    r, res, W, H, spp = traced
    ours = np.stack(
        [np.asarray(c).reshape(H, W) for c in res.radiance], axis=-1
    ) / spp
    ref = oracle_render_scene(scene, W, H, 1024, seed=11, max_bounces=2)
    diff = ours - ref
    # per-row means must agree within MC noise. The light row's 20-valued
    # edge pixels carry binomial noise sigma ~ 0.7/px at this spp, so it
    # only gets a coarse gate.
    row_diff = np.abs(diff.mean(axis=(1, 2)))
    bright_row = ref.mean(axis=(1, 2)) > 1.0
    assert row_diff[~bright_row].max() < 0.03, row_diff
    assert row_diff.max() < 0.5, row_diff
    mask = ref.mean(-1) < 3.0  # exclude direct-light pixels
    assert np.abs(diff.mean(-1)[mask]).mean() < 0.02


def test_channels(traced):
    r, res, W, H, spp = traced
    alb = np.stack([np.asarray(c).reshape(H, W) for c in res.aov_albedo], -1) / spp
    nrm = np.stack([np.asarray(c).reshape(H, W) for c in res.aov_normal], -1) / spp
    dep = np.asarray(res.aov_depth).reshape(H, W) / spp

    # center pixels see the white back wall: albedo 0.73, normal +z,
    # depth (15 - 0.01)/(1000 - 0.01) ~ 0.015
    assert alb[8, 8] == pytest.approx([0.73, 0.73, 0.73], abs=0.02)
    assert nrm[8, 8, 2] == pytest.approx(1.0, abs=0.05)
    assert dep[8, 8] == pytest.approx(15.0 / 1000.0, abs=0.002)
    # left/right thirds see green/red walls
    assert alb[8, 1, 1] > alb[8, 1, 0]  # green wall: G > R
    assert alb[8, 14, 0] > alb[8, 14, 1]  # red wall: R > G
    assert ((dep >= 0) & (dep <= 1)).all()


def test_film_sample_accounting(cornell_nodof):
    """--subsample 2 means 4 subpixels: film gains samples*n^2 per pass
    (``src/main.rs:64-65``, ``tracer/mod.rs:199`` — SURVEY quirk #12)."""
    scene, cam_ref = cornell_nodof
    r = Renderer(scene, Config(max_bounces=1))
    film = Film(8, 8)
    r.render(cam_ref, RenderConfig(samples=3, subsample=Subsample(2)), film)
    assert film.samples == 12
    assert film.passes == 1


def test_deterministic_by_seed(cornell_nodof):
    scene, cam_ref = cornell_nodof
    r = Renderer(scene, Config(max_bounces=1))
    imgs = []
    for seed in (1, 1, 2):
        film = Film(8, 8)
        r.render(cam_ref, RenderConfig(samples=2), film, seed=seed)
        imgs.append(film.mean().copy())
    np.testing.assert_array_equal(imgs[0], imgs[1])
    assert not np.array_equal(imgs[0], imgs[2])


def test_output_enum_color_spaces():
    assert Output.NORMAL.color_space() == "normal"
    assert Output.FULL.color_space() == "srgb"


def test_native_matches_numpy_oracle_moments(cornell_nodof):
    """The two independent oracles agree on a low-res render."""
    from bendy_tpu.native import available, oracle_render_scene

    if not available():
        pytest.skip("native oracle not built")
    scene, _ = cornell_nodof
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from oracle import Oracle

    from bendy_tpu.scene.compiler import find_camera

    cam, world = find_camera(scene)
    native = oracle_render_scene(scene, 8, 8, 512, seed=2, max_bounces=2)
    o = Oracle(scene, max_bounces=2, seed=4)
    pynum = o.render(cam, world, 8, 8, spp=48)
    assert np.abs(native.mean() - pynum.mean()) < 0.03
    d = np.abs((native - pynum).mean(axis=(1, 2)))
    assert d.max() < 0.12  # 48-spp python oracle is noisy


def test_dense_grid_matches_native_oracle():
    """Dense 32³ grid (every cell nonzero): the integrator's einsum
    lookup path gates against the C++ oracle's exact nested-lerp
    trilinear. Covers the workload class behind the megakernel's
    grid-as-operand path (tests/test_pallas.py pins kernel == einsum)."""
    from bendy_tpu.models.dense_cloud import build_dense_cloud
    from bendy_tpu.native import available, oracle_render_scene

    if not available():
        pytest.skip("native oracle not built")

    scene = build_dense_cloud()
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0

    W = H = 16
    spp = 48
    r = Renderer(scene, Config(max_bounces=2))
    from bendy_tpu.ops.wavefront import trace

    cfg = r.trace_config(r.config, cam_ref)
    assert cfg.has_volumes
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sub = jnp.zeros(W * H, jnp.uint32)
    res = trace(
        r.arrays, r.camera_params(cam_ref), render_key(jnp.uint32(21), jnp.uint32(0)),
        pix, sub, W, H, spp, 1, cfg,
    )
    ours = np.stack([np.asarray(c).reshape(H, W) for c in res.radiance], -1) / spp
    ref = oracle_render_scene(scene, W, H, 96, seed=14, max_bounces=2)

    # deep multi-scatter fog is high-variance and low-contrast: per-pixel
    # correlation is noise-dominated even at CI-affordable spp (measured:
    # two ORACLE seeds correlate at only ~0.18 here), so the gates are on
    # smoothed statistics — rows, columns, and 4x4 blocks. A grid axis
    # swap or lobe displacement shifts all three.
    assert np.abs((ours - ref).mean(axis=(1, 2))).max() < 0.1
    assert np.abs((ours - ref).mean(axis=(0, 2))).max() < 0.1
    assert abs(ours.mean() - ref.mean()) < 0.04
    blk = lambda im: im.mean(-1).reshape(H // 4, 4, W // 4, 4).mean(axis=(1, 3))
    assert np.abs(blk(ours) - blk(ref)).max() < 0.08


@pytest.mark.slow
def test_prim_grid_64_matches_native_oracle():
    """64-primitive generated scene (32 spheres + 32 boxes, all four
    material kinds): the statically-unrolled sweep must stay correct well
    beyond the bundled scenes' ~14 primitives. Ground truth: C++ oracle
    (linear scan, like the reference's ``tracer/mod.rs:389-402``).

    Cost note: this is the slowest compile in the suite (the 66-primitive
    unrolled body takes ~10-20 min in XLA's CPU backend; ~12 s on TPU —
    docs/prim_scaling.json). spp is set high enough that the glass/metal
    variance sits well inside the gates (at 256/512 spp the row-mean diff
    converges to 0.032, corr 0.988)."""
    from bendy_tpu.models.prim_grid import build_prim_grid
    from bendy_tpu.native import available, oracle_render_scene

    if not available():
        pytest.skip("native oracle not built")

    scene = build_prim_grid(64)
    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0

    W = H = 24
    spp = 128
    r = Renderer(scene, Config(max_bounces=3))
    from bendy_tpu.ops.wavefront import trace

    cfg = r.trace_config(r.config, cam_ref)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sub = jnp.zeros(W * H, jnp.uint32)
    res = trace(
        r.arrays, r.camera_params(cam_ref), render_key(jnp.uint32(31), jnp.uint32(0)),
        pix, sub, W, H, spp, 1, cfg,
    )
    ours = np.stack([np.asarray(c).reshape(H, W) for c in res.radiance], -1) / spp
    ref = oracle_render_scene(scene, W, H, 256, seed=8, max_bounces=3)

    assert np.abs((ours - ref).mean(axis=(1, 2))).max() < 0.08
    assert np.abs((ours - ref).mean(axis=(0, 2))).max() < 0.08
    assert abs(ours.mean() - ref.mean()) < 0.03
    corr = np.corrcoef(ours.mean(-1).ravel(), ref.mean(-1).ravel())[0, 1]
    assert corr > 0.97, corr


def test_device_film_matches_host_film(cornell_nodof):
    """DeviceFilm (device-resident sums, lazy rays) == host Film."""
    from bendy_tpu.film import DeviceFilm, to_device

    scene, cam_ref = cornell_nodof
    r = Renderer(scene, Config(max_bounces=2))
    imgs, rays = {}, {}
    for cls in (Film, DeviceFilm):
        film = cls(8, 8)
        r.rays_traced = 0.0
        for _ in range(2):  # two passes: device-side chaining
            r.render(cam_ref, RenderConfig(samples=2), film, seed=3)
        imgs[cls] = film.mean().copy()
        rays[cls] = float(r.rays_traced)
        assert film.samples == 4 and film.passes == 2
    np.testing.assert_array_equal(imgs[Film], imgs[DeviceFilm])
    assert rays[Film] == rays[DeviceFilm]


def test_device_film_checkpoint_and_to_device(tmp_path, cornell_nodof):
    from bendy_tpu.film import DeviceFilm, to_device

    scene, cam_ref = cornell_nodof
    r = Renderer(scene, Config(max_bounces=1))
    film = DeviceFilm(8, 8)
    r.render(cam_ref, RenderConfig(samples=2), film, seed=5)
    path = str(tmp_path / "f.npz")
    film.save_checkpoint(path, seed=5)
    loaded, seed = Film.load_checkpoint(path)
    assert seed == 5 and loaded.samples == film.samples
    np.testing.assert_allclose(loaded.mean(), film.mean())
    dev = to_device(loaded)
    assert dev.passes == film.passes
    np.testing.assert_allclose(dev.mean(), film.mean())


def test_rng_stream_id_overflow_refused(cornell_nodof):
    """u32 stream-id aliasing must be a loud trace-time error, not silent
    image correlation (id = (pix*spp_total + s)*nn + sub must fit u32)."""
    from bendy_tpu.ops.wavefront import trace

    scene, cam_ref = cornell_nodof
    r = Renderer(scene, Config(max_bounces=1))
    W = H = 8
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sub = jnp.zeros(W * H, jnp.uint32)
    key = render_key(jnp.uint32(5), jnp.uint32(0))
    cfg = r.trace_config(r.config)
    # 8x8 image but a sharded-mesh spp_total huge enough to overflow:
    # 64 * 2^28 * 4 = 2^36 > 2^32.
    with pytest.raises(ValueError, match="stream-id space"):
        trace(
            r.arrays, r.camera_params(cam_ref), key, pix, sub, W, H,
            4, 2, cfg, spp_total=1 << 28,
        )
