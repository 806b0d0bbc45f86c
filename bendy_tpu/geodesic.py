"""Null-geodesic ray propagation: gravitational lensing around point masses.

The reference *advertises* gravitational lensing ("a pathtracer that can
simulate gravitational lensing", ``README.md:1-2``) but its snapshot
contains only straight rays (``src/tracer/ray.rs:84-117``, SURVEY.md §0).
This module supplies the missing capability, designed TPU-first.

Physics: photons around a Schwarzschild mass follow the orbit equation
d²u/dφ² = -u + (3/2)·rs·u² (u = 1/r, rs = Schwarzschild radius). In
3-vector form this is the well-known effective acceleration

    a(x, d) = -(3/2) · rs · h² · x / |x|⁵,   h = |x × d|

(the exact Schwarzschild null geodesic in these coordinates; see e.g.
the classic "starless" formulation). Multiple masses superpose their
accelerations — exact per mass, approximate in combination (no exact
multi-body metric exists in closed form).

Integration: classical RK4 on (x, d) with an adaptive step
ds = clip(eta·r_min, min_step, max_step), statically unrolled over the
compiled mass list — pure [B] elementwise work that fuses into the
wavefront loop. Termination:
- capture: r < rs for any mass -> the lane is swallowed (black),
- far field: r > far·rs for all masses and receding -> space is flat,
  the wavefront switches the lane to an ordinary straight full-clip trace.

Scene binding: any object tagged ``mass:<rs>`` contributes a mass at its
world translation (compiler: ``scene/compiler.py``). Scenes without
masses compile the ordinary straight-ray integrator — the flat limit is
exact by construction, and rs -> 0 gives zero deflection analytically.

Validation (tests/test_geodesic.py): weak-field deflection angle
alpha ~= 2·rs/b, photon-sphere capture threshold b_crit = (3√3/2)·rs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bendy_tpu.scene.compiler import SceneArrays
from bendy_tpu.utils.v3 import V3, csub


class GeoParams(NamedTuple):
    """Static geodesic integration knobs (part of TraceConfig)."""

    eta: float = 0.2  # step = eta · distance-to-nearest-mass
    min_step: float = 0.02  # in scene units
    max_step: float = 30.0  # only binds at r > max_step/eta; there the
    #   chord sagitta is ~1.5·rs·ds²/(8r²) < 1e-3 scene units, so a large
    #   cap just stops outbound rays from burning ~20 clamped steps on the
    #   way to the far boundary (measured: 33 -> ~20 mean segments/path on
    #   the blackhole scene, the whole straggler tail)
    far: float = 80.0  # flat-space radius (in units of rs) per mass:
    #   residual deflection for a ray receding at r is <= ~2rs/r (0.025 rad
    #   worst-case grazing at 80, far less for typical impact parameters);
    #   each halving of `far` saves ~log(2)/log(1+eta) ~ 4 chord steps per
    #   escaping leg
    max_steps: int = 256  # RK4 step budget per path before capture
    growth: float = 0.02  # progressive step coarsening: eta·(1 + growth·k)
    #   at step k. Photon-sphere orbiters are the wavefront's stragglers
    #   (~10x the mean path length); growing the step makes them resolve
    #   (fall in or escape) in ~4x fewer steps, degrading only the faint
    #   high-order ring images.


def geo_from_dict(d: dict | None) -> GeoParams:
    """GeoParams from a scene file's optional ``"geodesic"`` block.

    The block is a plain mapping of GeoParams field overrides, e.g.
    ``{"eta": 0.1, "max_steps": 512}`` — scene authors tune the
    accuracy/speed trade per scene without touching code (the reference
    schema is unaffected: serde ignores unknown top-level fields, so
    scenes carrying the block still load in the Rust binary).
    """
    if not d:
        return GeoParams()
    bad = sorted(set(d) - set(GeoParams._fields))
    if bad:
        raise ValueError(
            f"unknown geodesic parameter(s) {bad}; valid: {list(GeoParams._fields)}"
        )
    conv = {k: (int(v) if k == "max_steps" else float(v)) for k, v in d.items()}
    return GeoParams()._replace(**conv)


def mass_row(scn: SceneArrays, k: int) -> tuple[V3, jnp.ndarray]:
    c = scn.mass_center
    return V3(c[k, 0], c[k, 1], c[k, 2]), scn.mass_rs[k]


def acceleration(scn: SceneArrays, x: V3, d: V3) -> V3:
    """Sum of per-mass geodesic accelerations (static unroll)."""
    B = x.x.shape
    a = V3.zeros(B)
    for k in range(scn.n_masses):
        center, rs = mass_row(scn, k)
        rel = csub(x, center)  # origin-centered masses: 3 subs fold away
        r2 = rel.length_squared()
        h = rel.cross(d)
        h2 = h.length_squared()
        inv_r = jnp.where(r2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(r2, 1e-20)), 0.0)
        inv_r5 = inv_r * inv_r * inv_r * inv_r * inv_r
        a = a + rel * (-1.5 * rs * h2 * inv_r5)
    return a


def step_size(scn: SceneArrays, x: V3, p: GeoParams, steps=None) -> jnp.ndarray:
    """Adaptive ds: a fraction of the distance to the nearest mass,
    progressively coarsened for long-running paths (``growth``)."""
    B = x.x.shape
    r2_min = jnp.full(B, jnp.inf, x.x.dtype)
    for k in range(scn.n_masses):
        center, _ = mass_row(scn, k)
        r2_min = jnp.minimum(r2_min, csub(x, center).length_squared())
    eta = p.eta
    if steps is not None and p.growth:
        eta = eta * (1.0 + p.growth * steps.astype(x.x.dtype))
    return jnp.clip(eta * jnp.sqrt(r2_min), p.min_step, p.max_step)


def _acc_frozen(scn: SceneArrays, x: V3, h2s: list) -> V3:
    """Acceleration with per-mass h² frozen at the step start.

    h = |(x-c)×d| is a conserved quantity of the exact Schwarzschild null
    geodesic (angular momentum), so along the true trajectory every RK4
    stage sees the same value — evaluating it once per step is an equally
    valid discretization of the same ODE (local error stays O(ds⁵)) and
    saves the cross product + norm in three of the four stages.
    """
    B = x.x.shape
    a = V3.zeros(B)
    for k in range(scn.n_masses):
        center, rs = mass_row(scn, k)
        rel = csub(x, center)
        r2 = rel.length_squared()
        inv_r = jnp.where(r2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(r2, 1e-20)), 0.0)
        inv_r5 = inv_r * inv_r * inv_r * inv_r * inv_r
        a = a + rel * (-1.5 * rs * h2s[k] * inv_r5)
    return a


def geo_step_begin(scn: SceneArrays, x: V3, d: V3, p: GeoParams, steps=None):
    """Fused once-per-iteration mass sweep: (captured, far, ds, h2s).

    Combines :func:`capture_and_far`, :func:`step_size` and the h²
    evaluation for :func:`rk4_step` so every per-mass quantity (rel, r²,
    rel·d) is computed once. h² uses the Lagrange identity
    |rel×d|² = r²·|d|² − (rel·d)², reusing r² and the receding test's
    rel·d — cheaper than the cross product, exact up to rounding (the
    cancellation case rel ∥ d means a radial ray, whose deflection is 0).
    """
    B = x.x.shape
    captured = jnp.zeros(B, bool)
    far = jnp.ones(B, bool)
    r2_min = jnp.full(B, jnp.inf, x.x.dtype)
    d2 = d.length_squared()
    h2s = []
    for k in range(scn.n_masses):
        center, rs = mass_row(scn, k)
        rel = csub(x, center)
        r2 = rel.length_squared()
        rd = rel.dot(d)
        captured = captured | (r2 < rs * rs)
        far = far & ((r2 > (p.far * rs) ** 2) & (rd > 0.0))
        r2_min = jnp.minimum(r2_min, r2)
        h2s.append(jnp.maximum(r2 * d2 - rd * rd, 0.0))
    eta = p.eta
    if steps is not None and p.growth:
        eta = eta * (1.0 + p.growth * steps.astype(x.x.dtype))
    ds = jnp.clip(eta * jnp.sqrt(r2_min), p.min_step, p.max_step)
    return captured, far, ds, h2s


def rk4_step(scn: SceneArrays, x: V3, d: V3, ds: jnp.ndarray,
             h2s: list | None = None) -> tuple[V3, V3]:
    """One RK4 step of the coupled system dx/dλ = d, dd/dλ = a(x, d).

    ``h2s`` (from :func:`geo_step_begin`) freezes the conserved per-mass
    angular momenta for the whole step; without it they are recomputed
    per stage from the stage state (the original, equivalent form).
    """
    if h2s is None:
        acc = lambda xs, dstage: acceleration(scn, xs, dstage)  # noqa: E731
    else:
        acc = lambda xs, dstage: _acc_frozen(scn, xs, h2s)  # noqa: E731
    return _rk4(acc, x, d, ds)


MASS_BLOCK = 4  # masses unrolled per fori step in the looped mass sweep
MASS_NCOLS = 5  # cx cy cz rs valid


def mass_table(scn: SceneArrays, xp=jnp, block: int | None = None):
    """Stacked ``[M_padded, 5]`` mass-row matrix for the looped mass sweep.

    Same dual-build convention as ``ops.intersect.prim_tables``: ``xp=jnp``
    stacks from the traced scene leaves (the XLA path), ``xp=numpy`` on a
    ``host_copy()`` builds the megakernel's SMEM operand. Rows pad up to a
    multiple of ``block`` with zeros; a pad row's ``rs == 0`` makes its
    acceleration and capture test exactly neutral, and the ``valid``
    column masks it out of the far-field AND and the step-size min.
    """
    if block is None:
        block = MASS_BLOCK
    f32 = xp.float32
    M = scn.n_masses
    rows = xp.concatenate(
        [
            scn.mass_center.astype(f32),  # 0:3
            scn.mass_rs.astype(f32).reshape(M, 1),  # 3
            xp.ones((M, 1), f32),  # 4 valid
        ],
        axis=1,
    )
    pad = (-M) % block
    if pad:
        rows = xp.concatenate([rows, xp.zeros((pad, MASS_NCOLS), f32)])
    assert rows.shape[1] == MASS_NCOLS, rows.shape
    return rows


def _mass_row_getter(tab, base, is_ref: bool, block: int):
    """Row loader: SMEM scalar loads inside the megakernel
    (``is_ref=True``), a ``dynamic_slice`` block under plain XLA."""
    if is_ref:
        return lambda j, c: tab[base + j, c]
    import jax

    r = jax.lax.dynamic_slice_in_dim(tab, base, block, axis=0)
    return lambda j, c: r[j, c]


def geo_step_begin_looped(
    scn: SceneArrays,
    x: V3,
    d: V3,
    p: GeoParams,
    table=None,
    steps=None,
    table_is_ref: bool = False,
    block: int | None = None,
):
    """Looped-mass twin of :func:`geo_step_begin`: ``(captured, far, ds)``.

    A ``lax.fori_loop`` over :func:`mass_table` rows replaces the static
    mass unroll, so compile time is O(1) in the mass count — the same
    trade the looped primitive sweep makes (``ops.intersect.
    nearest_hit_looped``), extended to the geodesic propagator for
    cluster-lensing scenes with tens-to-hundreds of masses. The per-mass
    compares and the step-size min run in the exact order of the unroll
    (gated by tests/test_looped_masses.py: masks exact, ds within 1 ulp —
    XLA reassociates FMA differently across the fori/unroll graph
    boundary, the same rounding class the megakernel parity gates
    document).

    What does NOT survive the looping is the per-mass frozen-h² list:
    h2s is M loop-carried [B] arrays — exactly the [M,B] residency the
    hot-path rules forbid. The looped path instead RECOMPUTES h² per RK4
    stage (:func:`rk4_step_looped`), the ``acceleration()`` form: h is
    conserved along the exact trajectory, so both discretizations
    integrate the same ODE with O(ds⁵) local error; they differ at
    rounding level, not in physics (deflection/capture gates re-run on
    this path).

    Loop carries are int32 masks (Mosaic carries no i1) and the fori
    body is pure mask arithmetic; ``valid`` keeps pad rows out of the
    far-field AND and the step-size min (their rs=0 already neutralizes
    capture).
    """
    import jax

    if block is None:
        block = MASS_BLOCK
    if table is None:
        table = mass_table(scn, jnp, block)
    B = x.x.shape
    f32 = x.x.dtype
    i0 = jnp.zeros(B, jnp.int32)
    n_blocks = table.shape[0] // block

    def blk(bi, carry):
        cap, far, r2m = carry
        g = _mass_row_getter(table, bi * block, table_is_ref, block)
        for j in range(block):
            cx, cy, cz, rs, valid = (g(j, c) for c in range(MASS_NCOLS))
            vb = valid > 0.0
            rel = csub(x, V3(cx, cy, cz))
            r2 = rel.length_squared()
            rd = rel.dot(d)
            cap = jnp.maximum(cap, (r2 < rs * rs).astype(jnp.int32))
            far_k = ((r2 > (p.far * rs) ** 2) & (rd > 0.0)).astype(jnp.int32)
            far = far * jnp.maximum(far_k, 1 - vb.astype(jnp.int32))
            r2m = jnp.minimum(r2m, jnp.where(vb, r2, jnp.inf))
        return cap, far, r2m

    cap, far, r2m = jax.lax.fori_loop(
        0, n_blocks, blk, (i0, i0 + 1, jnp.full(B, jnp.inf, f32))
    )
    eta = p.eta
    if steps is not None and p.growth:
        eta = eta * (1.0 + p.growth * steps.astype(f32))
    ds = jnp.clip(eta * jnp.sqrt(r2m), p.min_step, p.max_step)
    return cap != 0, far != 0, ds


def _acc_looped(x: V3, d: V3, table, table_is_ref: bool, block: int) -> V3:
    """Acceleration summed over a mass table with a ``fori_loop``.

    h² is recomputed from the stage state via the Lagrange identity
    |rel×d|² = r²·|d|² − (rel·d)² — the same expression
    :func:`geo_step_begin` uses, term-for-term, so the looped and
    unrolled forms of this sweep are bit-identical at equal mass order.
    Pad rows have rs = 0, making their contribution an exact zero — no
    validity multiply needed on this, the hottest geodesic loop
    (4 stages × M masses per iteration).
    """
    import jax

    B = x.x.shape
    f32 = x.x.dtype
    d2 = d.length_squared()
    n_blocks = table.shape[0] // block

    def blk(bi, a):
        ax, ay, az = a
        g = _mass_row_getter(table, bi * block, table_is_ref, block)
        for j in range(block):
            cx, cy, cz, rs = (g(j, c) for c in range(4))
            rel = csub(x, V3(cx, cy, cz))
            r2 = rel.length_squared()
            rd = rel.dot(d)
            h2 = jnp.maximum(r2 * d2 - rd * rd, 0.0)
            inv_r = jnp.where(r2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(r2, 1e-20)), 0.0)
            inv_r5 = inv_r * inv_r * inv_r * inv_r * inv_r
            s = (-1.5 * rs) * (h2 * inv_r5)
            ax = ax + rel.x * s
            ay = ay + rel.y * s
            az = az + rel.z * s
        return ax, ay, az

    z = jnp.zeros(B, f32)
    ax, ay, az = jax.lax.fori_loop(0, n_blocks, blk, (z, z, z))
    return V3(ax, ay, az)


def rk4_step_looped(
    scn: SceneArrays,
    x: V3,
    d: V3,
    ds: jnp.ndarray,
    table=None,
    table_is_ref: bool = False,
    block: int | None = None,
) -> tuple[V3, V3]:
    """Looped-mass RK4 step: per-mass h² recomputed per stage.

    The frozen-h² production step (:func:`rk4_step` with ``h2s``) would
    need M loop-carried [B] angular momenta; this variant trades the
    three saved Lagrange evaluations for O(1)-in-M compile and state —
    see :func:`geo_step_begin_looped`.
    """
    if block is None:
        block = MASS_BLOCK
    if table is None:
        table = mass_table(scn, jnp, block)
    acc = lambda xs, dstage: _acc_looped(xs, dstage, table, table_is_ref, block)  # noqa: E731
    return _rk4(acc, x, d, ds)


def _rk4(acc, x: V3, d: V3, ds: jnp.ndarray) -> tuple[V3, V3]:
    """The shared four-stage RK4 body (one ``acc(x, d)`` callable)."""
    half = ds * 0.5
    k1x, k1d = d, acc(x, d)
    k2x = d + k1d * half
    k2d = acc(x + k1x * half, k2x)
    k3x = d + k2d * half
    k3d = acc(x + k2x * half, k3x)
    k4x = d + k3d * ds
    k4d = acc(x + k3x * ds, k4x)
    sixth = ds * (1.0 / 6.0)
    x_new = x + (k1x + (k2x + k3x) * 2.0 + k4x) * sixth
    d_new = d + (k1d + (k2d + k3d) * 2.0 + k4d) * sixth
    return x_new, d_new


def capture_and_far(scn: SceneArrays, x: V3, d: V3, p: GeoParams):
    """(captured, far_field): horizon capture and flat-space tests."""
    B = x.x.shape
    captured = jnp.zeros(B, bool)
    far = jnp.ones(B, bool)
    for k in range(scn.n_masses):
        center, rs = mass_row(scn, k)
        rel = csub(x, center)
        r2 = rel.length_squared()
        captured = captured | (r2 < rs * rs)
        receding = rel.dot(d) > 0.0
        far = far & ((r2 > (p.far * rs) ** 2) & receding)
    return captured, far
