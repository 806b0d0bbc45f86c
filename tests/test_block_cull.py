"""Block-culled looped sweep (ops/intersect.block_bounds + cull_wrap).

The cull skips a whole fori block of primitives when no lane's feasible
segment [cmin, min(cmax, t_best)] can reach the block's bounding sphere.
Skipping must be CONSERVATIVE — a too-small bound silently drops true
hits — so every gate here is exact equality against the unculled sweep:

- Hit-level bit identity over random rays (no alive mask: every field of
  every lane must match, including never-read ones),
- film-level bit identity through the interpret megakernel with the
  integrator's alive mask voting (dead lanes' Hit outputs are never
  read, so blocks only dead lanes could reach are skipped — outputs
  still match bit for bit),
- geometric containment of member primitives in their block bounds.

The reference's linear scan has no acceleration structure
(``src/tracer/mod.rs:389-402``); this is a capability on top, so the
parity bar is "changes nothing", not "matches the reference". It ships
DEFAULT OFF: interleaved hardware A/B measured a net loss on every
workload (see the nearest_hit_looped docstring for the decomposition);
the gates here keep the refutation reproducible and exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bendy_tpu.models.prim_grid import build_prim_grid
from bendy_tpu.ops.intersect import (
    LOOP_BLOCK,
    SWEEP_NCOLS,
    block_bounds,
    nearest_hit_looped,
    prim_tables,
)
from bendy_tpu.render import Config, Renderer
from bendy_tpu.scene import load_scene
from bendy_tpu.scene.compiler import compile_scene
from bendy_tpu.utils.v3 import V3


def _hit_equal(a, b):
    for f in a._fields:
        for x, y in zip(
            jax.tree_util.tree_leaves(getattr(a, f)),
            jax.tree_util.tree_leaves(getattr(b, f)),
        ):
            x, y = np.asarray(x), np.asarray(y)
            if x.dtype.kind == "f":
                x = np.nan_to_num(x, posinf=1e30)
                y = np.nan_to_num(y, posinf=1e30)
            if not np.array_equal(x, y):
                return False, f
    return True, None


def _rays(seed, B, spread=6.0):
    rng = np.random.default_rng(seed)
    org = V3(*(jnp.asarray(rng.normal(0, spread, B), jnp.float32) for _ in range(3)))
    d = rng.normal(size=(3, B))
    d /= np.linalg.norm(d, axis=0)
    return org, V3(*(jnp.asarray(d[i], jnp.float32) for i in range(3))), rng


@pytest.mark.parametrize("seed", [0, 1])
def test_culled_sweep_bit_identical_fuzz(seed):
    """Random rays over a mixed sphere/box/rect scene: every Hit field of
    every lane bit-equal with culling on (no alive mask — the strongest
    form: even never-read lanes must agree, since none can be a winner
    the cull dropped)."""
    scn = compile_scene(build_prim_grid(40))
    tabs = {k: jnp.asarray(v) for k, v in prim_tables(scn.host_copy(), np).items()}
    tabs_c = dict(tabs)
    tabs_c.update(
        {k: jnp.asarray(v) for k, v in block_bounds(prim_tables(scn.host_copy(), np)).items()}
    )
    org, dirv, _ = _rays(seed, 2048)
    cmin, cmax = 0.01, 1000.0
    a = jax.jit(lambda o, d: nearest_hit_looped(o, d, cmin, cmax, scn, tables=tabs))(
        org, dirv
    )
    b = jax.jit(
        lambda o, d: nearest_hit_looped(
            o, d, cmin, cmax, scn, tables=tabs_c, cull_slack=1e-2
        )
    )(org, dirv)
    ok, field = _hit_equal(a, b)
    assert ok, field
    assert int(np.asarray(a.valid).sum()) > 0  # the fuzz actually hits things


def test_culled_sweep_bit_identical_march():
    """March lanes (short per-lane cmax windows + the interior pseudo-hit
    at t=cmax): culled == unculled bit for bit. The pseudo-hit's end
    point lies inside its member sphere, so the segment test must keep
    those blocks — this is the subtlest conservativeness case."""
    scn = compile_scene(load_scene("scenes/cloud.json.gz"))
    tabs = {k: jnp.asarray(v) for k, v in prim_tables(scn.host_copy(), np).items()}
    tabs_c = dict(tabs)
    tabs_c.update(
        {k: jnp.asarray(v) for k, v in block_bounds(prim_tables(scn.host_copy(), np)).items()}
    )
    org, dirv, rng = _rays(7, 2048, spread=3.0)
    march = jnp.asarray(rng.random(2048) < 0.5)
    last = jnp.asarray(rng.integers(-1, scn.n_spheres, 2048), jnp.int32)
    cmin = jnp.where(march, 0.0, 0.01)
    cmax = jnp.where(march, 0.1, 1000.0)
    kw = dict(march=march, last_sphere=last)
    a = jax.jit(
        lambda o, d: nearest_hit_looped(o, d, cmin, cmax, scn, tables=tabs, **kw)
    )(org, dirv)
    b = jax.jit(
        lambda o, d: nearest_hit_looped(
            o, d, cmin, cmax, scn, tables=tabs_c, cull_slack=1e-2, **kw
        )
    )(org, dirv)
    ok, field = _hit_equal(a, b)
    assert ok, field


def test_block_bounds_contain_primitives():
    """Geometric containment: points on every member primitive lie inside
    the block's bound (catches row-grouping/column-layout mistakes); pad
    blocks get the always-skip sentinel."""
    tabs = prim_tables(compile_scene(build_prim_grid(19)).host_copy(), np)
    bnds = block_bounds(tabs)
    rng = np.random.default_rng(0)

    def check(kind, pts_of_row):
        t = np.asarray(tabs[kind], np.float64)
        b = np.asarray(bnds[kind + "b"], np.float64).reshape(-1, 4)
        vcol = {"sph": 14, "rct": 20, "box": 27}[kind]
        for i in range(len(t)):
            bi = i // LOOP_BLOCK
            if t[i, vcol] <= 0.0:  # pad row: no containment requirement
                continue
            for p in pts_of_row(t[i]):
                d = np.linalg.norm(p - b[bi, :3])
                assert d <= b[bi, 3] + 1e-6, (kind, i, d, b[bi, 3])
        # pad-only blocks must be always-skip sentinels
        for bi in range(len(b)):
            rows = t[bi * LOOP_BLOCK : (bi + 1) * LOOP_BLOCK]
            if (rows[:, vcol] <= 0.0).all():
                assert b[bi, 3] == 0.0 and b[bi, 0] > 1e29

    def sph_pts(row):
        for _ in range(8):
            u = rng.normal(size=3)
            u /= np.linalg.norm(u)
            yield row[0:3] + row[3] * u

    def rct_pts(row):
        m = np.stack([row[3:6], row[6:9], row[9:12]])
        for _ in range(8):
            s, q = rng.uniform(-1, 1, 2)
            yield row[0:3] + np.linalg.solve(m, [s * row[12], q * row[13], 0.0])

    def box_pts(row):
        n3 = row[0:9].reshape(3, 3)
        for _ in range(8):
            f = rng.uniform(0, 1, 3)
            yield np.linalg.solve(n3, row[9:12] + f * (row[12:15] - row[9:12]))

    check("sph", sph_pts)
    check("rct", rct_pts)
    check("box", box_pts)
    assert set(bnds) == {"sphb", "rctb", "boxb"}
    for k in ("sph", "rct", "box"):
        assert len(bnds[k + "b"]) == 4 * (len(tabs[k]) // LOOP_BLOCK)


def test_block_bounds_flat_input():
    """block_bounds accepts the flattened-1D table form the megakernel
    ships (it reshapes via SWEEP_NCOLS)."""
    tabs = prim_tables(compile_scene(build_prim_grid(19)).host_copy(), np)
    flat = {k: v.reshape(-1) for k, v in tabs.items() if k in SWEEP_NCOLS}
    a = block_bounds(tabs)
    b = block_bounds(flat)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def _mega_sums(scene, block_cull, W=16, spp=2, vol=False):
    """TraceSums through the interpret megakernel with looped sweep forced
    and block culling on/off."""
    from bendy_tpu.ops.pallas_trace import make_pallas_tracer, pack_camera

    cam_ref = scene.find_by_tag("camera")
    scene.get_object(cam_ref).inner.aspect_ratio = 1.0
    r = Renderer(scene, Config(max_bounces=3), use_pallas=False)
    cam = r.camera_params(cam_ref)
    cfg = r.trace_config(r.config, cam_ref)._replace(
        looped_sweep=True, block_cull=block_cull
    )
    B = W * W
    pix = jnp.arange(B, dtype=jnp.uint32)
    sub = jnp.zeros(B, jnp.uint32)
    kern = make_pallas_tracer(
        r.arrays, W, W, spp, 1, cfg, block_rows=B // 128, interpret=True,
        vol_operand=vol,
    )
    return kern(pack_camera(cam), jnp.uint32(3), jnp.uint32(0), pix, sub)


@pytest.mark.parametrize("name", ["prim_grid", "cloud"])
def test_culled_megakernel_bit_identical(name):
    """Full interpret-megakernel render, culled vs unculled: radiance,
    AOVs, ray and iteration counts all bit-equal. With the integrator's
    alive mask voting, blocks whose only feasible lanes are dead are
    skipped — their Hit values differ but nothing reads them, so the
    film is still exactly equal (the production bit-identity contract).
    The cloud case adds the volume march (per-lane cmax=volume_step
    windows — the cull's best case — and the interior pseudo-hit)."""
    mk = (lambda: build_prim_grid(24)) if name == "prim_grid" else (
        lambda: load_scene("scenes/cloud.json.gz")
    )
    a = _mega_sums(mk(), block_cull=False)
    b = _mega_sums(mk(), block_cull=True)
    for ch in ("x", "y", "z"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a.radiance, ch)), np.asarray(getattr(b.radiance, ch))
        )
    assert float(a.rays) == float(b.rays)
    assert float(a.iters) == float(b.iters)  # culling never changes trip counts


def test_culled_megakernel_geodesic_bit_identical():
    """Geodesic chords (per-lane cmax=chord_len on near-field lanes)
    through the culled sweep: interpret megakernel, culled == unculled."""
    a = _mega_sums(load_scene("scenes/blackhole.json.gz"), block_cull=False)
    b = _mega_sums(load_scene("scenes/blackhole.json.gz"), block_cull=True)
    for ch in ("x", "y", "z"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a.radiance, ch)), np.asarray(getattr(b.radiance, ch))
        )
    assert float(a.rays) == float(b.rays)


def test_cull_default_off():
    """block_cull ships OFF: interleaved hardware A/B measured a 17-28%
    net loss on every workload (the per-block feasibility test + cross-
    lane any-reduce outweighs the 17-28% skippable block work — see the
    nearest_hit_looped docstring and docs/looped_hw.json). The capability
    stays gated for reproduction, not production."""
    r = Renderer(build_prim_grid(8), Config(), use_pallas=False)
    assert not r.trace_config(r.config).block_cull
