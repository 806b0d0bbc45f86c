"""Keep the perf tooling from rotting: the probes monkeypatch module
attributes and walk jaxprs of the production loop body, so a rename in
bendy_tpu would silently break them long after the fact. These tests
run the host-side halves on the CPU mesh (no TPU, no timing).
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.mark.smoke
def test_loop_body_ops_cornell():
    """The jaxpr walk finds exactly one while + one scan and returns a
    sane per-lane op count for the production cornell config."""
    from perf_report import loop_body_ops

    info = loop_body_ops("cornell")
    # cornell r4: ~1055 ops/lane/iter; a 2x move in either direction
    # means the loop body or the counting conventions changed — PERF.md
    # needs regenerating either way
    assert 400 < info["vpu_ops_per_lane_iter"] < 4000
    assert info["mxu_flops_per_iter"] == 0  # surface-only scene
    cfg = info["cfg"]
    assert not cfg.has_volumes and not cfg.geodesic
    assert not cfg.want_aovs  # FULL output drops the AOV pipeline


@pytest.mark.smoke
def test_mxu_shape_probe_builds():
    """The MXU shape probe's kernel must keep tracing against the
    production fetch shape (M=128, K=512) for both operand dtypes — the
    probe only ever runs on hardware, so shape/dtype rot would surface
    mid-benchmark otherwise. eval_shape traces the pallas_call without
    compiling it (no TPU, no interpret run)."""
    import jax
    import jax.numpy as jnp

    from mxu_shape_probe import M, K, _build

    for dtype_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        fn, tab, oh, got_dt = _build(256, 3, dtype_name)
        assert got_dt == dt
        assert tab.shape == (M, K) and tab.dtype == dt
        assert oh.shape == (K, 256) and oh.dtype == dt
        out = jax.eval_shape(fn, tab, oh)
        assert out.shape == (M, 256) and out.dtype == jnp.float32


@pytest.mark.smoke
def test_phase_probe_stubs_bind():
    """Every (module, attr) the phase probe patches must still exist and
    be callable — a rename in wavefront/materials would otherwise only
    surface the next time someone runs the probe on hardware."""
    from phase_probe import _stubs

    tables = _stubs()
    assert set(tables) == {"light", "shade", "sweep", "rng", "camera",
                           "volume", "marchspec", "floor"}
    for phase, patches in tables.items():
        for mod, attr, repl in patches:
            assert callable(getattr(mod, attr)), (phase, attr)
            assert callable(repl)


@pytest.mark.smoke
def test_phase_probe_stub_shapes():
    """The stubs' return structures must match the real contracts (Hit /
    Shade fields, uniform list length) or the traced kernel would break
    in ways that look like perf signal."""
    import jax.numpy as jnp

    from phase_probe import _stubs
    from bendy_tpu.ops.intersect import Hit
    from bendy_tpu.ops.materials import Shade
    from bendy_tpu.utils.v3 import V3

    tables = _stubs()
    B = (8,)
    org = V3(jnp.zeros(B), jnp.zeros(B), jnp.zeros(B))
    dirv = V3(jnp.ones(B), jnp.zeros(B), -jnp.ones(B))
    stub_hit = dict((a, r) for _, a, r in tables["sweep"])["nearest_hit"]
    hit = stub_hit(org, dirv, 0.01, 1000.0, None)
    assert isinstance(hit, Hit) and hit.position.x.shape == B

    stub_uniform = tables["rng"][0][2]
    u = stub_uniform((jnp.uint32(1), jnp.uint32(2)), jnp.arange(8, dtype=jnp.uint32), 0, 6)
    assert len(u) == 6 and all(x.shape == B for x in u)

    stub_shade = tables["shade"][0][2]
    sh = stub_shade(dirv, hit, None, u, 0.01, 1000.0)
    assert isinstance(sh, Shade) and sh.weight.x.shape == B
