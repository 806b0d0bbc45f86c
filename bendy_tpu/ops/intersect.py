"""Batched, branchless primitive intersection — statically unrolled.

The reference finds the nearest hit with a linear object scan that shrinks
``clip.max`` (``src/tracer/mod.rs:389-402``). Here the scan is unrolled at
trace time over the compiled primitive list: each primitive contributes a
short chain of fused [B] VPU ops, and the running winner's attributes
(geometry + inline material) are carried through ``where`` selects of
traced *scalars*. No gathers, no [B, N] intermediates — both measured to
destroy TPU layouts/fusion (20-40x slowdowns).

Face codes (``src/tracer/ray.rs:8-15``):
    0 FRONT, 1 BACK, 2 VOLUME (interior march event),
    3 VOLUME_FRONT, 4 VOLUME_BACK.  MISS = -1.

Formulas:
- sphere: half-b quadratic, near root preferred, far root fallback within
  clip (``src/scene/object/sphere.rs:121-148``),
- rect: plane hit t = ((c-o)·n)/(d·n) with |d·n| <= 1e-5 parallel reject
  and in-plane containment via basis projection
  (``src/scene/object/rect.rs:110-142``); front when (c-o)·n < 0,
- volume march step: the lane's current volume sphere gets an *interior*
  pseudo-hit at t = clip_max whenever the point at clip_max is still
  inside, replacing its surface test (``src/scene/object/sphere.rs:150-166``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from bendy_tpu.scene.compiler import MAT_EMISSIVE, MAT_FLAT, SceneArrays
from bendy_tpu.utils.v3 import V3, cdot, cdot_get, csub, host_const

INF = jnp.inf

FACE_FRONT = 0
FACE_BACK = 1
FACE_VOLUME = 2
FACE_VOLUME_FRONT = 3
FACE_VOLUME_BACK = 4
FACE_MISS = -1


def row3(a: jnp.ndarray, k: int) -> V3:
    """Static row slice of an [N,3] array as a V3 of traced scalars."""
    return V3(a[k, 0], a[k, 1], a[k, 2])


class Hit(NamedTuple):
    """Nearest-hit record for a batch of lanes (the SoA ``Manifold``),
    with the winning primitive's material baked in."""

    t: jnp.ndarray  # [B] distance, +inf on miss
    valid: jnp.ndarray  # [B] bool
    position: V3
    normal: V3  # zero for interior volume events
    face: jnp.ndarray  # [B] face code
    mtype: jnp.ndarray  # [B] material code
    albedo: V3  # INVARIANT: valid only on scattering-kind lanes
    #   (diffuse/metallic/glass). Flat/Emissive winners store their
    #   *emitted* (intensity-scaled) color here — the sweep carries one
    #   merged color per primitive (shade_surface reads albedo only when
    #   scattering and emitted only when terminating, so the merge is
    #   unobservable there); a new consumer reading albedo on a
    #   terminating lane would get the emitted color.
    rough: jnp.ndarray  # [B]
    ior: jnp.ndarray  # [B]
    emitted: V3
    vol_grid: jnp.ndarray  # [B] density grid index, -1 = none
    vol_size: V3  # grid (w-1,h-1,d-1)
    sphere_row: jnp.ndarray  # [B] sphere row when hit is a sphere, else -1
    bbox_min: V3  # hit sphere's AABB (volume coord lookup)
    bbox_size: V3


def sphere_t(org: V3, dir: V3, cmin, cmax, center: V3, radius) -> jnp.ndarray:
    """Hit distance against one sphere (scalar center/radius), +inf on miss.

    ``center``/``radius`` may be host constants (the Pallas path bakes the
    scene as numpy scalars): zero center components then drop their
    subtraction at trace time — exact, see utils.v3 const helpers.
    """
    oc = csub(org, center)
    half_b = oc.dot(dir)
    c = oc.length_squared() - radius * radius
    disc = half_b * half_b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = -half_b - sq
    t_far = -half_b + sq
    near_ok = (t_near >= cmin) & (t_near <= cmax)
    far_ok = (t_far >= cmin) & (t_far <= cmax)
    t = jnp.where(near_ok, t_near, jnp.where(far_ok, t_far, INF))
    return jnp.where(disc >= 0.0, t, INF)


def rect_t(org: V3, dir: V3, cmin, cmax, center: V3, xb: V3, yb: V3, zb: V3,
           hw, hh) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(t, p) against one rect; t=+inf on miss, p = (c-o)·n plane-side sign.

    Geometry may be host constants (Pallas-baked scene): every dot against
    a basis with exact-zero components skips those terms at trace time, and
    the in-plane point is built lazily — only the components a nonzero
    basis entry reads are ever computed. Axis-aligned rects (cornell walls,
    light faces) drop from ~44 to ~17 VPU ops this way; traced scenes take
    the generic path unchanged.
    """
    q = cdot(dir, zb)

    def c_minus_o(i):
        o = (org.x, org.y, org.z)[i]
        c = center[i]
        return -o if host_const(c) == 0.0 else c - o

    p = cdot_get(c_minus_o, zb)
    q_safe = jnp.where(jnp.abs(q) <= 1e-5, 1.0, q)
    t = p / q_safe
    # lazy local components: org + dir*t - center, built per needed axis
    cache: dict = {}

    def local(i):
        if i not in cache:
            o = (org.x, org.y, org.z)[i]
            d = (dir.x, dir.y, dir.z)[i]
            c = center[i]
            v = o + d * t
            cache[i] = v if host_const(c) == 0.0 else v - c
        return cache[i]

    lx = cdot_get(local, xb)
    ly = cdot_get(local, yb)
    ok = (
        (jnp.abs(q) > 1e-5)
        & (t >= cmin)
        & (t <= cmax)
        & (lx * lx <= hw * hw)
        & (ly * ly <= hh * hh)
    )
    return jnp.where(ok, t, INF), p


def box_t(org: V3, dir: V3, cmin, cmax, bn, bdlo, bdhi, bslo, bshi):
    """(t, p_sign, zb_like) against one three-slab box; t=+inf on miss.

    Equivalent to min-t over the box's six rect faces (the reference's
    cuboid, ``src/scene/object/cuboid.rs:83-105``) but ~3 plane tests
    instead of 6 rect tests: slab i admits n_i·(o + t·d) ∈ [dlo_i, dhi_i];
    the box interval is the intersection. The winner is the entry plane
    (t = tnear in clip) or else the exit plane (ray starting inside or
    within clip_min of the surface). Parallel slabs (|d·n| <= 1e-5, the
    per-face reject of ``rect.rs:110-142``) pass freely when the origin
    lies between the planes and kill the box otherwise.

    Face-code parity: the reference reports FRONT iff dir·m < 0 for the
    winning face's own STORED normal m = ±n_slab — its constructor mixes
    conventions per pair (``cuboid.rs:19-30``), hence the baked
    ``bslo``/``bshi`` signs. The reported normal is always the
    ray-opposing -sign(d·n)·n of the winning slab. p_sign (<0 = front)
    and zb_like feed the rect manifold carries unchanged: the manifold
    negates c_zb on back faces, so zb_like pre-multiplies by -p_sign.

    Geometry rows may be host constants (Pallas-baked): axis-aligned
    slabs then fold their dot products at trace time.
    """
    B = org.x.shape
    tnear = jnp.full(B, -INF, org.x.dtype)
    tfar = jnp.full(B, INF, org.x.dtype)
    near_n = V3.zeros(B)
    far_n = V3.zeros(B)
    fr_near = jnp.ones(B, org.x.dtype)
    fr_far = jnp.ones(B, org.x.dtype)
    for i in range(3):
        n_i = V3(bn[i, 0], bn[i, 1], bn[i, 2])
        q = cdot(dir, n_i)
        p = cdot(org, n_i)
        par = jnp.abs(q) <= 1e-5
        inv = 1.0 / jnp.where(par, 1.0, q)
        t1 = (bdlo[i] - p) * inv
        t2 = (bdhi[i] - p) * inv
        tno = jnp.minimum(t1, t2)
        tfo = jnp.maximum(t1, t2)
        inside = (p >= bdlo[i]) & (p <= bdhi[i])
        # parallel: between the planes -> slab is unbounded, else empty
        tno = jnp.where(par, jnp.where(inside, -INF, INF), tno)
        tfo = jnp.where(par, jnp.where(inside, INF, -INF), tfo)
        pos_q = q > 0.0
        oriented = n_i * jnp.where(pos_q, -1.0, 1.0)
        # front iff sign(q)·sigma_winning_plane == -1 (m = sigma·n):
        # q>0 enters through the lo plane and exits through hi
        sgn_entry = jnp.where(pos_q, bslo[i], -bshi[i])
        sgn_exit = jnp.where(pos_q, bshi[i], -bslo[i])
        upd_n = tno > tnear
        upd_f = tfo < tfar
        tnear = jnp.where(upd_n, tno, tnear)
        near_n = V3.where(upd_n, oriented, near_n)
        fr_near = jnp.where(upd_n, sgn_entry, fr_near)
        tfar = jnp.where(upd_f, tfo, tfar)
        far_n = V3.where(upd_f, oriented, far_n)
        fr_far = jnp.where(upd_f, sgn_exit, fr_far)
    nonempty = tnear <= tfar
    near_ok = nonempty & (tnear >= cmin) & (tnear <= cmax)
    far_ok = nonempty & (tfar >= cmin) & (tfar <= cmax)
    t = jnp.where(near_ok, tnear, jnp.where(far_ok, tfar, INF))
    p_sign = jnp.where(near_ok, fr_near, fr_far)  # <0 = front
    winning_n = V3.where(near_ok, near_n, far_n)
    zb_like = winning_n * (-p_sign)
    return t, p_sign, zb_like


def _prim_color(mtype, albedo: V3, emitted: V3) -> V3:
    """The one rgb a primitive's shading can ever read: ``emitted`` for
    terminating kinds (Flat emits its albedo, ``material.rs:76``; Emissive
    its albedo·intensity), ``albedo`` for scattering kinds (whose emitted
    is identically zero, ``material.rs:78``). Selecting between them at
    *scalar* level (free: folds per primitive) halves the rgb selects the
    sweep carries per primitive; the Hit record reconstitutes both fields
    exactly with one [B] mask after the sweep."""
    is_em = (mtype == MAT_FLAT) | (mtype == MAT_EMISSIVE)
    return V3.where(is_em, emitted, albedo)


def nearest_hit(
    org: V3,
    dir: V3,
    cmin: jnp.ndarray,
    cmax: jnp.ndarray,
    scn: SceneArrays,
    march: Optional[jnp.ndarray] = None,
    last_sphere: Optional[jnp.ndarray] = None,
    propagate=None,
    carry_rough: bool = True,
    carry_ior: bool = True,
    carry_volumes: bool = True,
) -> Hit:
    """Nearest hit across all primitives for each lane.

    When ``march`` lanes are given, the lane's ``last_sphere`` gets the
    volumetric treatment (``sphere.rs:150-166``): if the point at t=cmax is
    still inside, an interior VOLUME event at t=cmax replaces that sphere's
    surface test.

    ``carry_rough`` / ``carry_ior`` / ``carry_volumes`` are static scene
    facts: when no primitive is Metallic/Glass (rough), Glass (ior), resp.
    carries a volume, the attribute is never read, so its per-primitive
    winner selects are dropped and the Hit field returns a placeholder.
    """
    B = org.x.shape
    zero = jnp.zeros(B, org.x.dtype)
    i0 = jnp.zeros(B, jnp.int32)

    # static scene facts (n_spheres/n_trace_rects/n_boxes are Python ints on
    # both paths): a kind with zero primitives contributes no sweep work,
    # no winner carries, and no manifold branch — cross-kind selects fold
    # away. Boxes reuse the rect manifold carries (oriented normal in c_zb,
    # face sign in c_p), so "rect-like" covers both.
    has_sph = scn.n_spheres > 0
    has_rct = scn.n_trace_rects > 0 or scn.n_boxes > 0

    t_best = jnp.full(B, INF, org.x.dtype)
    # int32 masks, not bool: Mosaic cannot lower bool selects against
    # broadcast constants (i8->i1 truncation)
    is_sph = i0
    srow = i0 - 1
    interior = i0
    # carried winner attributes (selected as scalars, broadcast-free)
    c_center = V3(zero, zero, zero)
    c_radius = zero + 1.0
    c_zb = V3(zero, zero, zero)
    c_p = zero
    c_mtype = i0
    c_color = V3(zero, zero, zero)
    c_rough = zero
    c_ior = zero + 1.0
    c_vgrid = i0 - 1
    c_vsize = V3(zero, zero, zero)

    end = org + dir * cmax if march is not None else None

    for k in range(scn.n_spheres):
        center = row3(scn.sph_center, k)
        radius = scn.sph_radius[k]
        t_k = sphere_t(org, dir, cmin, cmax, center, radius)
        int_k = i0
        if march is not None:
            is_last = march & (last_sphere == k)
            inside = (end - center).length_squared() <= radius * radius
            int_k = (is_last & inside).astype(jnp.int32)
            t_k = jnp.where(is_last, jnp.where(inside, cmax, t_k), t_k)
        better = t_k < t_best
        better_i = better.astype(jnp.int32)
        keep_i = 1 - better_i
        t_best = jnp.where(better, t_k, t_best)
        if has_rct:  # without rects the winner is a sphere whenever valid
            is_sph = jnp.maximum(is_sph, better_i)
        srow = srow * keep_i + k * better_i
        interior = interior * keep_i + int_k * better_i
        c_center = V3.where(better, center, c_center)
        c_radius = jnp.where(better, radius, c_radius)
        c_mtype = jnp.where(better, scn.sph_mtype[k], c_mtype)
        c_color = V3.where(
            better,
            _prim_color(scn.sph_mtype[k], row3(scn.sph_albedo, k),
                        row3(scn.sph_emitted, k)),
            c_color,
        )
        if carry_rough:
            c_rough = jnp.where(better, scn.sph_rough[k], c_rough)
        if carry_ior:
            c_ior = jnp.where(better, scn.sph_ior[k], c_ior)
        if carry_volumes:
            c_vgrid = jnp.where(better, scn.sph_vol_grid[k], c_vgrid)
            c_vsize = V3.where(better, row3(scn.sph_vol_size, k), c_vsize)

    for k in range(scn.n_trace_rects):
        center = row3(scn.rct_center, k)
        zb = row3(scn.rct_z, k)
        t_k, p_k = rect_t(
            org, dir, cmin, cmax, center,
            row3(scn.rct_x, k), row3(scn.rct_y, k), zb,
            scn.rct_hw[k], scn.rct_hh[k],
        )
        better = t_k < t_best
        better_i = better.astype(jnp.int32)
        keep_i = 1 - better_i
        t_best = jnp.where(better, t_k, t_best)
        if has_sph:  # without spheres these carries are statically 0
            is_sph = is_sph * keep_i
            interior = interior * keep_i
        c_zb = V3.where(better, zb, c_zb)
        c_p = jnp.where(better, p_k, c_p)
        c_mtype = jnp.where(better, scn.rct_mtype[k], c_mtype)
        c_color = V3.where(
            better,
            _prim_color(scn.rct_mtype[k], row3(scn.rct_albedo, k),
                        row3(scn.rct_emitted, k)),
            c_color,
        )
        if carry_rough:
            c_rough = jnp.where(better, scn.rct_rough[k], c_rough)
        if carry_ior:
            c_ior = jnp.where(better, scn.rct_ior[k], c_ior)
        if carry_volumes:
            c_vgrid = c_vgrid * keep_i - better_i

    for k in range(scn.n_boxes):
        t_k, p_k, zb_k = box_t(
            org, dir, cmin, cmax, scn.box_n[k], scn.box_dlo[k], scn.box_dhi[k],
            scn.box_sgn_lo[k], scn.box_sgn_hi[k],
        )
        better = t_k < t_best
        better_i = better.astype(jnp.int32)
        keep_i = 1 - better_i
        t_best = jnp.where(better, t_k, t_best)
        if has_sph:
            is_sph = is_sph * keep_i
            interior = interior * keep_i
        c_zb = V3.where(better, zb_k, c_zb)
        c_p = jnp.where(better, p_k, c_p)
        c_mtype = jnp.where(better, scn.box_mtype[k], c_mtype)
        c_color = V3.where(
            better,
            _prim_color(scn.box_mtype[k], row3(scn.box_albedo, k),
                        row3(scn.box_emitted, k)),
            c_color,
        )
        if carry_rough:
            c_rough = jnp.where(better, scn.box_rough[k], c_rough)
        if carry_ior:
            c_ior = jnp.where(better, scn.box_ior[k], c_ior)
        if carry_volumes:
            c_vgrid = c_vgrid * keep_i - better_i

    return _manifold(
        org, dir, t_best, is_sph, srow, interior, c_center, c_radius,
        c_zb, c_p, c_mtype, c_color, c_rough, c_ior, c_vgrid, c_vsize,
        has_sph, has_rct, B,
    )


def _manifold(
    org: V3, dir: V3, t_best, is_sph, srow, interior, c_center, c_radius,
    c_zb, c_p, c_mtype, c_color, c_rough, c_ior, c_vgrid, c_vsize,
    has_sph: bool, has_rct: bool, B,
) -> Hit:
    """Winner carries -> Hit record (shared by the unrolled and looped
    sweeps): face codes, oriented normals, the interior pseudo-hit, and
    the (albedo, emitted) reconstruction from the merged color carry."""
    i0 = jnp.zeros(B, jnp.int32)
    valid = jnp.isfinite(t_best)
    position = org + dir * t_best

    if has_sph:
        # sphere manifold (``sphere.rs:85-119``)
        s_normal = (position - c_center) / c_radius
        s_front = dir.dot(s_normal) < 0.0
        s_normal = V3.where(s_front, s_normal, -s_normal)
        s_has_vol = c_vgrid >= 0
        s_face = jnp.where(
            s_has_vol,
            jnp.where(s_front, FACE_VOLUME_FRONT, FACE_VOLUME_BACK),
            jnp.where(s_front, FACE_FRONT, FACE_BACK),
        )
        # interior pseudo-hit: zero normal, VOLUME face (``sphere.rs:71-83``)
        interior_b = interior != 0
        s_normal = V3.where(interior_b, V3.zeros(B), s_normal)
        s_face = jnp.where(interior_b, FACE_VOLUME, s_face)

    if has_rct:
        # rect manifold (``rect.rs:138-142``)
        r_front = c_p < 0.0
        r_normal = V3.where(r_front, c_zb, -c_zb)
        r_face = jnp.where(r_front, FACE_FRONT, FACE_BACK)

    if has_sph and has_rct:
        is_sph_b = is_sph != 0
        normal = V3.where(is_sph_b, s_normal, r_normal)
        face = jnp.where(valid, jnp.where(is_sph_b, s_face, r_face), FACE_MISS)
    elif has_sph:
        is_sph_b = valid
        normal = s_normal
        face = jnp.where(valid, s_face, FACE_MISS)
    elif has_rct:
        is_sph_b = jnp.zeros(B, bool)
        normal = r_normal
        face = jnp.where(valid, r_face, FACE_MISS)
    else:  # no hit-testable primitives (mass-and-environment-only scenes)
        is_sph_b = jnp.zeros(B, bool)
        normal = V3.zeros(B)
        face = jnp.full(B, FACE_MISS, jnp.int32)

    # reconstitute (albedo, emitted) from the merged color carry: emitted
    # is the color for terminating kinds and zero for scattering kinds
    # (exactly ``_emitted_of``); albedo is only ever read on scattering
    # lanes, where color == albedo
    emitting = ((c_mtype == MAT_FLAT) | (c_mtype == MAT_EMISSIVE)).astype(
        org.x.dtype
    )
    c_emit = c_color * emitting

    if has_sph:
        vol_grid = jnp.where(is_sph_b, c_vgrid, -1)
        sphere_row = jnp.where(is_sph_b & valid, srow, -1)
    else:  # fold the all-False selects away (and keep them off Mosaic)
        vol_grid = i0 - 1
        sphere_row = i0 - 1

    return Hit(
        t=t_best,
        valid=valid,
        position=position,
        normal=normal,
        face=face,
        mtype=c_mtype,
        albedo=c_color,
        rough=c_rough,
        ior=c_ior,
        emitted=c_emit,
        vol_grid=vol_grid,
        vol_size=c_vsize,
        sphere_row=sphere_row,
        bbox_min=c_center - V3.splat(c_radius),
        bbox_size=V3.splat(2.0 * c_radius),
    )


LOOP_BLOCK = 8  # primitives unrolled per fori_loop step in the looped sweep.
#   Hardware-swept (tools/looped_hw_check.py --sweep, docs/looped_hw.json,
#   258-prim scene): 8 wins (48.0 Mrays/s) over 4 (45.1 — under-amortizes
#   the dynamic_slice loads), 16 (46.4) and 32 (45.8 — vreg pressure).


CULL_PROBE = None  # perf-probe knob for the block cull (tools only):
#   "truepred" replaces the feasibility test with a scalar SMEM compare
#   that is always true — isolating the while-as-cond BOUNDARY cost from
#   the test + cross-lane-reduce cost (docs/looped_hw.json cull rows).

CARRY_PROBE = None  # perf-probe knob (tools/looped_hw_check.py --carry-ab):
#   "force_on" makes nearest_hit_looped behave as if every attribute
#   carry were needed — the cold columns are loaded and c_rough/c_ior/
#   c_vgrid/c_vsize ride the fori carry as [B] arrays. On a scene whose
#   static config has the carries OFF the film is identical (the loaded
#   values feed only compile-time-pruned shade branches), so an
#   interleaved A/B measures exactly what dead column loads + dead [B]
#   loop carries cost (VERDICT r4 item 4).

LIGHT_FACE_COLS = 23  # per-face column span in the light table

# sweep-table column counts (the prim_tables layouts below). The
# megakernel ships these three tables to SMEM flattened 1D so the looped
# sweep can hoist row base addresses (see nearest_hit_looped.row_getter);
# 1D refs recover their geometry from these.
SWEEP_NCOLS = {"sph": 15, "rct": 21, "box": 28}


def prim_tables(scn: SceneArrays, xp=jnp, block: int | None = None,
                kinds: tuple = ("sph", "rct", "box", "light")) -> dict:
    """Stacked [N_padded, C] primitive-row matrices for the looped sweep.

    One layout definition for both builds: ``xp=jnp`` on traced scene
    leaves (the XLA path stacks at trace time), ``xp=numpy`` on a
    ``host_copy()`` (the megakernel ships the tables as SMEM operands —
    scalar memory is the one space Mosaic lets a traced row id index).
    Row counts pad up to a multiple of ``block``; column -1 is a validity
    flag that masks pad rows' t to +inf (degenerate pad geometry could
    otherwise produce real hits, e.g. a zero-radius sphere on an
    exact-center ray).

    Layouts (all f32; int fields are exact small ints):
      sph: center xyz, radius, mtype, merged color rgb, rough, ior,
           vol_grid, vol_size xyz, valid                     (15 cols)
      rct: center xyz, x-basis xyz, y-basis xyz, z-basis xyz, hw, hh,
           mtype, merged color rgb, rough, ior, valid        (21 cols)
      box: slab normals (3x3 row-major), dlo xyz, dhi xyz, sgn_lo xyz,
           sgn_hi xyz, mtype, merged color rgb, rough, ior, valid (28)
      light: kind, sphere center xyz, sphere radius, then per face f:
           center xyz, fx xyz, fy xyz, ux xyz, uy xyz, z xyz, hw, hh,
           area, cdf, valid (23 each)        (5 + 23·F cols, unpadded —
           the light loops run one light per fori step)
    """
    if block is None:
        block = LOOP_BLOCK  # late-bound: tools can tune the module knob
    f32 = xp.float32

    def merged_color(mtype, albedo, emitted):
        is_em = (mtype == MAT_FLAT) | (mtype == MAT_EMISSIVE)
        return xp.where(is_em[:, None], emitted, albedo)

    def padded(rows_mat):
        n = rows_mat.shape[0]
        pad = (-n) % block
        if pad:
            rows_mat = xp.concatenate(
                [rows_mat, xp.zeros((pad, rows_mat.shape[1]), f32)]
            )
        return rows_mat

    col = lambda a: a.astype(f32)[:, None]  # noqa: E731
    out = {}
    if "sph" in kinds and scn.n_spheres:
        out["sph"] = padded(
            xp.concatenate(
                [
                    scn.sph_center.astype(f32),  # 0:3
                    col(scn.sph_radius),  # 3
                    col(scn.sph_mtype),  # 4
                    merged_color(scn.sph_mtype, scn.sph_albedo,
                                 scn.sph_emitted).astype(f32),  # 5:8
                    col(scn.sph_rough),  # 8
                    col(scn.sph_ior),  # 9
                    col(scn.sph_vol_grid),  # 10
                    scn.sph_vol_size.astype(f32),  # 11:14
                    xp.ones((scn.n_spheres, 1), f32),  # 14 valid
                ],
                axis=1,
            )
        )
    if "rct" in kinds and scn.n_trace_rects:
        nt = scn.n_trace_rects
        out["rct"] = padded(
            xp.concatenate(
                [
                    scn.rct_center[:nt].astype(f32),  # 0:3
                    scn.rct_x[:nt].astype(f32),  # 3:6
                    scn.rct_y[:nt].astype(f32),  # 6:9
                    scn.rct_z[:nt].astype(f32),  # 9:12
                    col(scn.rct_hw[:nt]),  # 12
                    col(scn.rct_hh[:nt]),  # 13
                    col(scn.rct_mtype[:nt]),  # 14
                    merged_color(scn.rct_mtype[:nt], scn.rct_albedo[:nt],
                                 scn.rct_emitted[:nt]).astype(f32),  # 15:18
                    col(scn.rct_rough[:nt]),  # 18
                    col(scn.rct_ior[:nt]),  # 19
                    xp.ones((nt, 1), f32),  # 20 valid
                ],
                axis=1,
            )
        )
    if "box" in kinds and scn.n_boxes:
        nb = scn.n_boxes
        out["box"] = padded(
            xp.concatenate(
                [
                    scn.box_n.reshape(nb, 9).astype(f32),  # 0:9
                    scn.box_dlo.astype(f32),  # 9:12
                    scn.box_dhi.astype(f32),  # 12:15
                    scn.box_sgn_lo.astype(f32),  # 15:18
                    scn.box_sgn_hi.astype(f32),  # 18:21
                    col(scn.box_mtype),  # 21
                    merged_color(scn.box_mtype, scn.box_albedo,
                                 scn.box_emitted).astype(f32),  # 22:25
                    col(scn.box_rough),  # 25
                    col(scn.box_ior),  # 26
                    xp.ones((nb, 1), f32),  # 27 valid
                ],
                axis=1,
            )
        )
    if "mass" in kinds and scn.n_masses:
        # geodesic point masses for the looped mass sweep ([M_pad, 5]:
        # cx cy cz rs valid; layout + padding owned by bendy_tpu.geodesic)
        from bendy_tpu.geodesic import mass_table

        out["mass"] = mass_table(scn, xp)
    if "light" in kinds and scn.n_lights:
        L = scn.n_lights
        F = scn.light_face_cdf.shape[1]
        cols = [
            col(scn.light_kind),  # 0
            scn.light_sph_center.astype(f32),  # 1:4
            col(scn.light_sph_radius),  # 4
        ]
        for fidx in range(F):  # base = 5 + 23*f
            cols += [
                scn.light_face_center[:, fidx].astype(f32),  # +0:3
                scn.light_face_x[:, fidx].astype(f32),  # +3:6
                scn.light_face_y[:, fidx].astype(f32),  # +6:9
                scn.light_face_ux[:, fidx].astype(f32),  # +9:12
                scn.light_face_uy[:, fidx].astype(f32),  # +12:15
                scn.light_face_z[:, fidx].astype(f32),  # +15:18
                col(scn.light_face_hw[:, fidx]),  # +18
                col(scn.light_face_hh[:, fidx]),  # +19
                col(scn.light_face_area[:, fidx]),  # +20
                col(scn.light_face_cdf[:, fidx]),  # +21
                col(scn.light_face_valid[:, fidx]),  # +22
            ]
        out["light"] = xp.concatenate(cols, axis=1)  # [L, 5+23F], unpadded
    for k, ncols in SWEEP_NCOLS.items():
        # the flat-1D SMEM indexing recovers geometry from SWEEP_NCOLS:
        # a layout edit here without updating it must fail loudly
        assert k not in out or out[k].shape[1] == ncols, (k, out[k].shape)
    return out


def block_bounds(tabs: dict, block: int | None = None) -> dict:
    """Per-fori-block bounding spheres for the culled looped sweep.

    For each ``block``-row group of a prim_tables() matrix, computes one
    conservative bounding sphere (cx, cy, cz, r) enclosing every valid
    member primitive; returns numpy f32 arrays keyed ``sphb``/``rctb``/
    ``boxb`` of shape [n_blocks*4] (flat — shipped to SMEM like the sweep
    tables). Host-side only (needs 3x3 solves for rect/box extents).

    Conservativeness is the correctness contract (a too-small bound would
    silently skip true hits): member extents are computed in float64,
    the block radius is inflated by a relative margin plus an absolute
    term scaled by the scene magnitude (covers every f32 rounding in the
    runtime segment-distance test, including the cancellation when the
    ray passes far from a small bound), and degenerate geometry
    (singular bases) falls back to an infinite radius — the block is
    then simply never skipped. All-pad blocks get a far-away zero-radius
    bound: always skipped, which is exact (pad rows' validity column
    masks their t to +inf anyway).
    """
    import numpy as np

    if block is None:
        block = LOOP_BLOCK

    def sph_members(t):
        return t[:, 0:3].copy(), t[:, 3].copy(), t[:, 14] > 0.0

    def rct_members(t):
        # rect = {x : ((x-c)·ux)² <= hw², ((x-c)·uy)² <= hh², (x-c)·zb = 0}
        # (rect_t's containment bases are the inverse-transposed ones, so
        # corner offsets solve M @ v = (±hw, ±hh, 0) with M = [ux; uy; zb])
        c = t[:, 0:3].copy()
        r = np.empty(len(t))
        for i in range(len(t)):
            m = np.stack([t[i, 3:6], t[i, 6:9], t[i, 9:12]])
            rhs = np.array(
                [[t[i, 12], t[i, 12]], [t[i, 13], -t[i, 13]], [0.0, 0.0]]
            )
            try:
                corners = np.linalg.solve(m, rhs)
                r[i] = float(np.linalg.norm(corners, axis=0).max())
            except np.linalg.LinAlgError:
                r[i] = np.inf
        return c, r, t[:, 20] > 0.0

    def box_members(t):
        # box = {x : n_i·x in [dlo_i, dhi_i]}; vertices solve N @ x = b
        c = np.zeros((len(t), 3))
        r = np.empty(len(t))
        signs = np.array(
            [[1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1]], np.float64
        ).T
        for i in range(len(t)):
            n3 = t[i, 0:9].reshape(3, 3)
            dlo, dhi = t[i, 9:12], t[i, 12:15]
            try:
                c[i] = np.linalg.solve(n3, (dlo + dhi) / 2.0)
                ext = np.linalg.solve(n3, signs * ((dhi - dlo) / 2.0)[:, None])
                r[i] = float(np.linalg.norm(ext, axis=0).max())
            except np.linalg.LinAlgError:
                r[i] = np.inf
        return c, r, t[:, 27] > 0.0

    out = {}
    # scene magnitude for the absolute rounding margin (f32 cancellation
    # in the runtime test is ~ulps of the ray-to-center distance)
    scale = 1.0
    kind_fns = {"sph": sph_members, "rct": rct_members, "box": box_members}
    members = {}
    for kind, fn in kind_fns.items():
        if kind not in tabs:
            continue
        t = np.asarray(tabs[kind], np.float64)
        if t.ndim == 1:  # flattened table
            t = t.reshape(-1, SWEEP_NCOLS[kind])
        c, r, valid = fn(t)
        members[kind] = (c, r, valid)
        if valid.any():
            finite = valid & np.isfinite(r)
            if finite.any():
                scale = max(
                    scale,
                    float((np.abs(c[finite]).max(axis=1) + r[finite]).max()),
                )
    slack = 1e-3 + 3e-5 * scale
    for kind, (c, r, valid) in members.items():
        n = len(r)
        assert n % block == 0, (kind, n, block)
        nb = n // block
        b = np.zeros((nb, 4), np.float64)
        for bi in range(nb):
            sl = slice(bi * block, (bi + 1) * block)
            v = valid[sl]
            if not v.any():
                b[bi] = (3e30, 0.0, 0.0, 0.0)  # always-skip (pad block)
                continue
            cc, rr = c[sl][v], r[sl][v]
            ctr = cc.mean(axis=0)
            rad = float((np.linalg.norm(cc - ctr, axis=1) + rr).max())
            b[bi, :3] = ctr
            b[bi, 3] = rad * (1.0 + 2e-3) + slack
        out[kind + "b"] = b.astype(np.float32).reshape(-1)
    return out


def nearest_hit_looped(
    org: V3,
    dir: V3,
    cmin: jnp.ndarray,
    cmax: jnp.ndarray,
    scn: SceneArrays,
    march: Optional[jnp.ndarray] = None,
    last_sphere: Optional[jnp.ndarray] = None,
    carry_rough: bool = True,
    carry_ior: bool = True,
    carry_volumes: bool = True,
    block: int | None = None,
    tables: Optional[dict] = None,
    tables_are_refs: bool = False,
    cull_mask: Optional[jnp.ndarray] = None,
    cull_slack: float = 0.0,
) -> Hit:
    """Compile-time-flat nearest hit: ``lax.fori_loop`` over primitive rows.

    Same semantics (and the same float arithmetic, in the same order) as
    :func:`nearest_hit`, but the sweep loops over [N, C] row matrices with
    ``dynamic_slice`` loads instead of statically unrolling — compile time
    is O(block), not O(N). The unrolled sweep's per-primitive code bloats
    XLA superlinearly (measured: 4 s at 16 prims -> 33 s at 128, see
    docs/prim_scaling.json), which walls off large scenes; the reference's
    linear scan (``src/tracer/mod.rs:389-402``) handles any count at zero
    compile cost, and this is its TPU equivalent. The renderer selects it
    automatically above ``LOOP_SWEEP_THRESHOLD`` primitives.

    ``block`` primitives are unrolled per loop iteration to amortize loop
    overhead; row counts pad up to a multiple with rows whose validity
    column masks their t to +inf (degenerate pad geometry may otherwise
    produce real hits, e.g. a zero-radius sphere on an exact-center ray).

    Inside the Pallas megakernel the ``tables`` arrive as SMEM operands
    (``tables_are_refs=True``) and every column access is a scalar load —
    the baked-constant scene cannot be indexed by a traced row id, but
    scalar memory can (ops/pallas_trace.py ships them).

    Block culling (a measured REFUTATION, shipped off by default): when
    ``tables`` carries :func:`block_bounds` entries (``sphb``/``rctb``/
    ``boxb``), each fori step first tests its block's bounding sphere
    against every lane's feasible ray segment ``[cmin, min(cmax,
    t_best)]`` (~20 VPU ops + one any-reduce) and SKIPS the full
    ``block``-primitive body when no lane can possibly produce a winner —
    via a while-loop-as-conditional, the one scalar-predicated control
    flow Mosaic legalizes with vector carries (``lax.cond`` with vector
    results does not lower; see the note in ops/wavefront.py). Skipping
    is conservative, so results are bit-identical (gated:
    tests/test_block_cull.py; hardware Mosaic vs XLA max abs 0.0).
    ``cull_mask`` (the integrator's ``alive``) drops dead lanes from the
    feasibility vote — their Hit outputs are never read, so film-level
    identity still holds. ``cull_slack`` absorbs the box parallel-slab
    drift (a freely-passing near-parallel slab's hit can sit ``t·1e-5``
    outside the true box): pass ``clip_max * 1e-5``.

    Why it ships DEFAULT OFF — the v5e numbers (interleaved A/B,
    tools/looped_hw_check.py --cull-ab, docs/looped_hw.json): the cull
    LOSES 17-28% net on every workload tried, including its best case
    (256-puff cloud_field, march segments only volume_step long).
    Decomposition at 258 prims: all-skip bounds 52 vs off 45-47 vs
    always-true-predicate 45.7 vs culled 39.4 Mrays/s → the while
    boundary is ~3%, the per-block test + CROSS-LANE ANY-REDUCE ~68% of
    the 8-prim body it guards, and only 17-28% of block work is
    skippable: a 2048-lane block nearly always contains some
    surface-mode lane whose [clip_min, clip_max] segment reaches every
    primitive block (bounce divergence; march/surface lanes mix in one
    block). With non-sweep glue at 58% of iteration cost, even a
    zero-overhead cull at these skip rates cannot reach the 50 Mrays/s
    floor at 512 prims — the O(N) scaling law in API.md stands as the
    honest architecture bound, same epistemic status as the dense-grid
    serialized roofline.
    """
    import jax

    if block is None:
        block = LOOP_BLOCK  # late-bound: tools can tune the module knob
    if CARRY_PROBE == "force_on":
        carry_rough = carry_ior = carry_volumes = True
    B = org.x.shape
    f32 = org.x.dtype
    zero = jnp.zeros(B, f32)
    i0 = jnp.zeros(B, jnp.int32)

    has_sph = scn.n_spheres > 0
    has_rct = scn.n_trace_rects > 0 or scn.n_boxes > 0

    class _Sweep(NamedTuple):
        t_best: jnp.ndarray
        is_sph: jnp.ndarray
        srow: jnp.ndarray
        interior: jnp.ndarray
        c_center: V3
        c_radius: jnp.ndarray
        c_zb: V3
        c_p: jnp.ndarray
        c_mtype: jnp.ndarray
        c_color: V3
        c_rough: jnp.ndarray
        c_ior: jnp.ndarray
        c_vgrid: jnp.ndarray
        c_vsize: V3

    # Statically-dead attribute carries collapse to SCALARS (the same
    # rule the wavefront's while carries follow — a fori carry is live
    # across the whole looped sweep, so a never-updated [B] array costs
    # vreg/VMEM residency every block-iteration for nothing). The body
    # only _replace()s these under the matching carry_* flag, so the
    # scalar rides through untouched; placeholder values match the
    # unrolled sweep's (rough 0, ior 1, vgrid -1, vsize 0) and their
    # consumers are compile-time pruned under the same static flags.
    zs = jnp.zeros((), f32)
    st = _Sweep(
        t_best=jnp.full(B, INF, f32),
        is_sph=i0,
        srow=i0 - 1,
        interior=i0,
        c_center=V3(zero, zero, zero),
        c_radius=zero + 1.0,
        c_zb=V3(zero, zero, zero),
        c_p=zero,
        c_mtype=i0,
        c_color=V3(zero, zero, zero),
        c_rough=zero if carry_rough else zs,
        c_ior=(zero + 1.0) if carry_ior else (zs + 1.0),
        c_vgrid=(i0 - 1) if carry_volumes else (jnp.zeros((), jnp.int32) - 1),
        c_vsize=V3(zero, zero, zero) if carry_volumes else V3(zs, zs, zs),
    )

    end = org + dir * cmax if march is not None else None

    # tables=None: stack from the traced scene leaves (XLA path).
    # tables_are_refs: SMEM refs inside the megakernel — each column
    # access is one scalar load (scalar memory is the one space Mosaic
    # lets a traced row id index; a dynamic VMEM row slice does not
    # legalize).
    is_ref = tables_are_refs
    if tables is None:
        tables = prim_tables(scn, jnp, block)

    def row_getter(tab, base, ncols):
        if is_ref:
            if tab.ndim == 1:
                # Flattened SMEM table (ops/pallas_trace ships the sweep
                # tables 1D): hoist the block's flat base ONCE so every
                # load's address is base_flat + CONSTANT (j*ncols+c folds
                # to a Python int) — one scalar add per load instead of
                # the 2D form's per-load (base+j)*C+c mul/add chain. At
                # 512 prims the sweep issues thousands of SMEM loads per
                # block-iteration, so scalar-unit address arithmetic is
                # real throughput. Load order and values are unchanged
                # (bit-identity gates vs the unrolled sweep still hold).
                base_flat = base * ncols
                return lambda j, c: tab[base_flat + (j * ncols + c)]
            return lambda j, c: tab[base + j, c]
        r = jax.lax.dynamic_slice_in_dim(tab, base, block, axis=0)
        return lambda j, c: r[j, c]

    class _Cols1D:
        """Static-index view over columns [start, start+n) of one row."""

        def __init__(self, get, j, start):
            self._g, self._j, self._s = get, j, start

        def __getitem__(self, i):
            return self._g(self._j, self._s + i)

    class _Cols2D:
        """Static-(i, m)-index view over a row-major [3,3] column span."""

        def __init__(self, get, j, start):
            self._g, self._j, self._s = get, j, start

        def __getitem__(self, idx):
            i, m = idx
            return self._g(self._j, self._s + 3 * i + m)

    def n_rows(tab, ncols):
        return tab.shape[0] // ncols if tab.ndim == 1 else tab.shape[0]

    def cull_wrap(kind, raw_body):
        """Wrap a per-block sweep body in the bounding-sphere skip.

        The predicate asks: can ANY (alive) lane's feasible segment
        [cmin, min(cmax, t_best)] reach this block's bound? A true hit at
        t_k needs t_k ∈ [cmin, cmax] and t_k < t_best, and its point lies
        on a member primitive ⊂ bound, so the segment's closest approach
        to the bound center is <= r there — the test passing is implied
        by any possible winner (including the march interior pseudo-hit:
        its end point at t=cmax is inside the member sphere). dir must be
        unit (the same invariant sphere_t's t semantics already assume).
        Skipped updates are therefore identities. The body runs 0/1 times
        via while_loop (Mosaic-legal scalar-predicated control flow).
        """
        bnd = tables.get(kind + "b")
        if bnd is None:
            return raw_body

        def blk_fn(blk, st):
            if CULL_PROBE == "truepred":
                # overhead probe: while-boundary cost alone (no test, no
                # cross-lane reduce; the body always runs — bit-identical)
                pred = bnd[blk * 4 + 3] < jnp.inf
            else:
                b4 = blk * 4
                bc = V3(bnd[b4], bnd[b4 + 1], bnd[b4 + 2])
                br = bnd[b4 + 3] + cull_slack
                ub = jnp.minimum(cmax, st.t_best)
                oc = org - bc
                tc = jnp.clip(0.0 - oc.dot(dir), cmin, ub)
                cl = oc + dir * tc
                feas = cl.length_squared() <= br * br
                if cull_mask is not None:
                    feas = feas & cull_mask
                pred = jnp.any(feas)

            def once(c):
                return jnp.zeros((), jnp.bool_), raw_body(blk, c[1])

            return jax.lax.while_loop(lambda c: c[0], once, (pred, st))[1]

        return blk_fn

    if has_sph:
        tab = tables["sph"]
        n_blocks = n_rows(tab, SWEEP_NCOLS["sph"]) // block

        def sph_block(blk, st: _Sweep) -> _Sweep:
            base = blk * block
            g = row_getter(tab, base, SWEEP_NCOLS["sph"])
            for j in range(block):
                center = V3(g(j, 0), g(j, 1), g(j, 2))
                radius = g(j, 3)
                k = base + j
                t_k = sphere_t(org, dir, cmin, cmax, center, radius)
                int_k = i0
                if march is not None:
                    is_last = march & (last_sphere == k)
                    inside = (end - center).length_squared() <= radius * radius
                    int_k = (is_last & inside).astype(jnp.int32)
                    t_k = jnp.where(is_last, jnp.where(inside, cmax, t_k), t_k)
                t_k = jnp.where(g(j, 14) > 0.0, t_k, INF)
                better = t_k < st.t_best
                better_i = better.astype(jnp.int32)
                keep_i = 1 - better_i
                st = st._replace(
                    t_best=jnp.where(better, t_k, st.t_best),
                    is_sph=jnp.maximum(st.is_sph, better_i) if has_rct else st.is_sph,
                    srow=st.srow * keep_i + k * better_i,
                    interior=st.interior * keep_i + int_k * better_i,
                    c_center=V3.where(better, center, st.c_center),
                    c_radius=jnp.where(better, radius, st.c_radius),
                    c_mtype=jnp.where(better, g(j, 4).astype(jnp.int32), st.c_mtype),
                    c_color=V3.where(better, V3(g(j, 5), g(j, 6), g(j, 7)), st.c_color),
                )
                if carry_rough:
                    st = st._replace(c_rough=jnp.where(better, g(j, 8), st.c_rough))
                if carry_ior:
                    st = st._replace(c_ior=jnp.where(better, g(j, 9), st.c_ior))
                if carry_volumes:
                    st = st._replace(
                        c_vgrid=jnp.where(better, g(j, 10).astype(jnp.int32), st.c_vgrid),
                        c_vsize=V3.where(
                            better, V3(g(j, 11), g(j, 12), g(j, 13)), st.c_vsize
                        ),
                    )
            return st

        st = jax.lax.fori_loop(0, n_blocks, cull_wrap("sph", sph_block), st)

    if scn.n_trace_rects > 0:
        tab = tables["rct"]
        n_blocks = n_rows(tab, SWEEP_NCOLS["rct"]) // block

        def rct_block(blk, st: _Sweep) -> _Sweep:
            base = blk * block
            g = row_getter(tab, base, SWEEP_NCOLS["rct"])
            for j in range(block):
                zb = V3(g(j, 9), g(j, 10), g(j, 11))
                t_k, p_k = rect_t(
                    org, dir, cmin, cmax, V3(g(j, 0), g(j, 1), g(j, 2)),
                    V3(g(j, 3), g(j, 4), g(j, 5)), V3(g(j, 6), g(j, 7), g(j, 8)),
                    zb, g(j, 12), g(j, 13),
                )
                t_k = jnp.where(g(j, 20) > 0.0, t_k, INF)
                better = t_k < st.t_best
                better_i = better.astype(jnp.int32)
                keep_i = 1 - better_i
                st = st._replace(
                    t_best=jnp.where(better, t_k, st.t_best),
                    is_sph=st.is_sph * keep_i if has_sph else st.is_sph,
                    interior=st.interior * keep_i if has_sph else st.interior,
                    c_zb=V3.where(better, zb, st.c_zb),
                    c_p=jnp.where(better, p_k, st.c_p),
                    c_mtype=jnp.where(better, g(j, 14).astype(jnp.int32), st.c_mtype),
                    c_color=V3.where(
                        better, V3(g(j, 15), g(j, 16), g(j, 17)), st.c_color
                    ),
                )
                if carry_rough:
                    st = st._replace(c_rough=jnp.where(better, g(j, 18), st.c_rough))
                if carry_ior:
                    st = st._replace(c_ior=jnp.where(better, g(j, 19), st.c_ior))
                if carry_volumes:
                    st = st._replace(c_vgrid=st.c_vgrid * keep_i - better_i)
            return st

        st = jax.lax.fori_loop(0, n_blocks, cull_wrap("rct", rct_block), st)

    if scn.n_boxes > 0:
        tab = tables["box"]
        n_blocks = n_rows(tab, SWEEP_NCOLS["box"]) // block

        def box_block(blk, st: _Sweep) -> _Sweep:
            base = blk * block
            g = row_getter(tab, base, SWEEP_NCOLS["box"])
            for j in range(block):
                t_k, p_k, zb_k = box_t(
                    org, dir, cmin, cmax, _Cols2D(g, j, 0),
                    _Cols1D(g, j, 9), _Cols1D(g, j, 12),
                    _Cols1D(g, j, 15), _Cols1D(g, j, 18),
                )
                t_k = jnp.where(g(j, 27) > 0.0, t_k, INF)
                better = t_k < st.t_best
                better_i = better.astype(jnp.int32)
                keep_i = 1 - better_i
                st = st._replace(
                    t_best=jnp.where(better, t_k, st.t_best),
                    is_sph=st.is_sph * keep_i if has_sph else st.is_sph,
                    interior=st.interior * keep_i if has_sph else st.interior,
                    c_zb=V3.where(better, zb_k, st.c_zb),
                    c_p=jnp.where(better, p_k, st.c_p),
                    c_mtype=jnp.where(better, g(j, 21).astype(jnp.int32), st.c_mtype),
                    c_color=V3.where(
                        better, V3(g(j, 22), g(j, 23), g(j, 24)), st.c_color
                    ),
                )
                if carry_rough:
                    st = st._replace(c_rough=jnp.where(better, g(j, 25), st.c_rough))
                if carry_ior:
                    st = st._replace(c_ior=jnp.where(better, g(j, 26), st.c_ior))
                if carry_volumes:
                    st = st._replace(c_vgrid=st.c_vgrid * keep_i - better_i)
            return st

        st = jax.lax.fori_loop(0, n_blocks, cull_wrap("box", box_block), st)

    return _manifold(
        org, dir, st.t_best, st.is_sph, st.srow, st.interior, st.c_center,
        st.c_radius, st.c_zb, st.c_p, st.c_mtype, st.c_color, st.c_rough,
        st.c_ior, st.c_vgrid, st.c_vsize, has_sph, has_rct, B,
    )


def static_int(arr, idx):
    """Concrete value when ``arr`` is a host constant, else None.

    The Pallas megakernel bakes the compiled scene as numpy constants
    (ops/pallas_trace.py), so per-light discrete facts (kind, face
    validity) are known at trace time there and wrong-kind branches can
    be pruned in Python — the selected values are unchanged, only the
    never-selected computation disappears. Under jit (traced arrays)
    this returns None and the generic masked form runs.
    """
    import numpy as np

    if isinstance(arr, np.ndarray):
        return arr[idx].item()
    return None


def light_pdf(
    org: V3,
    dir: V3,
    cmin: jnp.ndarray,
    cmax: jnp.ndarray,
    scn: SceneArrays,
    light_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Area-form pdf of direction ``dir`` toward light ``light_idx``.

    Matches ``light_pdf`` (``src/scene/data/material.rs:313-316``) +
    per-shape pdfs: sphere t²/(πr²) (``sphere.rs:44-61``), rect
    t²/(area·|d·n|) (``rect.rs:92-108``), cuboid = nearest face's pdf
    (``cuboid.rs:56-81``). 0.0 when the ray misses the light
    (``unwrap_or_default``). Static loop over lights and their faces.
    """
    B = org.x.shape
    pdf = jnp.zeros(B, org.x.dtype)
    for li in range(scn.n_lights):
        sel = light_idx == li
        kind = scn.light_kind[li]
        kind_c = static_int(scn.light_kind, li)

        if kind_c != 1:  # sphere pdf needed (or kind unknown at trace time)
            t_s = sphere_t(org, dir, cmin, cmax,
                           row3(scn.light_sph_center, li), scn.light_sph_radius[li])
            r = scn.light_sph_radius[li]
            pdf_sphere = jnp.where(jnp.isfinite(t_s), t_s * t_s / (jnp.pi * r * r), 0.0)
        if kind_c == 0:
            pdf = jnp.where(sel, pdf_sphere, pdf)
            continue

        t_b = jnp.full(B, INF, org.x.dtype)
        q_b = jnp.ones(B, org.x.dtype)
        area_b = jnp.ones(B, org.x.dtype)
        for f in range(scn.light_face_cdf.shape[1]):
            if static_int(scn.light_face_valid, (li, f)) is False:
                continue
            zb = V3(scn.light_face_z[li, f, 0], scn.light_face_z[li, f, 1],
                    scn.light_face_z[li, f, 2])
            t_f, _ = rect_t(
                org, dir, cmin, cmax,
                V3(scn.light_face_center[li, f, 0], scn.light_face_center[li, f, 1],
                   scn.light_face_center[li, f, 2]),
                # containment bases are the inverse-transposed ones (exact
                # under any affine; equal to the forward bases when rigid)
                V3(scn.light_face_ux[li, f, 0], scn.light_face_ux[li, f, 1],
                   scn.light_face_ux[li, f, 2]),
                V3(scn.light_face_uy[li, f, 0], scn.light_face_uy[li, f, 1],
                   scn.light_face_uy[li, f, 2]),
                zb,
                scn.light_face_hw[li, f],
                scn.light_face_hh[li, f],
            )
            t_f = jnp.where(scn.light_face_valid[li, f], t_f, INF)
            better = t_f < t_b
            t_b = jnp.where(better, t_f, t_b)
            q_b = jnp.where(better, dir.dot(zb), q_b)
            # world-space face area: the correct density for random_point
            # under any affine (equals 4·hw·hh when the transform is rigid)
            area_b = jnp.where(better, scn.light_face_area[li, f], area_b)
        # shadow = area·|d·n| with the *oriented* normal; |.| makes the
        # orientation irrelevant (``rect.rs:101``)
        pdf_rect = jnp.where(jnp.isfinite(t_b), t_b * t_b / (area_b * jnp.abs(q_b)), 0.0)

        if kind_c == 1:
            pdf = jnp.where(sel, pdf_rect, pdf)
        else:  # kind unknown at trace time: generic masked select
            pdf = jnp.where(sel, jnp.where(kind == 0, pdf_sphere, pdf_rect), pdf)
    return pdf


def light_pdf_looped(
    org: V3,
    dir: V3,
    cmin: jnp.ndarray,
    cmax: jnp.ndarray,
    scn: SceneArrays,
    light_idx: jnp.ndarray,
    table=None,
    table_is_ref: bool = False,
) -> jnp.ndarray:
    """Compile-time-flat :func:`light_pdf`: ``fori_loop`` over light rows.

    Same float arithmetic in the same order as the traced (non-pruned)
    branch of the unrolled sweep, so forcing ``looped_lights`` on a small
    scene is bit-identical. ``table`` is a prim_tables()["light"] matrix
    (XLA path, built here when None) or an SMEM ref (megakernel). Active
    only with ``TraceConfig.looped_lights`` (derived from the light count
    alone, render.LIGHT_LOOP_THRESHOLD) — a scene with hundreds of
    LIGHT-flagged objects otherwise hits the same superlinear-compile
    wall the primitive unroll did.
    """
    import jax

    B = org.x.shape
    is_ref = table_is_ref
    if table is None:
        table = prim_tables(scn, jnp, kinds=("light",))["light"]
    F = scn.light_face_cdf.shape[1]

    def body(li, pdf):
        if is_ref:
            g = lambda c: table[li, c]  # noqa: E731
        else:
            row = jax.lax.dynamic_slice_in_dim(table, li, 1, axis=0)
            g = lambda c: row[0, c]  # noqa: E731
        sel = light_idx == li
        kind = g(0)
        r = g(4)
        t_s = sphere_t(org, dir, cmin, cmax, V3(g(1), g(2), g(3)), r)
        pdf_sphere = jnp.where(jnp.isfinite(t_s), t_s * t_s / (jnp.pi * r * r), 0.0)

        t_b = jnp.full(B, INF, org.x.dtype)
        q_b = jnp.ones(B, org.x.dtype)
        area_b = jnp.ones(B, org.x.dtype)
        for f in range(F):
            base = 5 + LIGHT_FACE_COLS * f
            zb = V3(g(base + 15), g(base + 16), g(base + 17))
            t_f, _ = rect_t(
                org, dir, cmin, cmax,
                V3(g(base + 0), g(base + 1), g(base + 2)),
                V3(g(base + 9), g(base + 10), g(base + 11)),  # ux
                V3(g(base + 12), g(base + 13), g(base + 14)),  # uy
                zb, g(base + 18), g(base + 19),
            )
            t_f = jnp.where(g(base + 22) > 0.0, t_f, INF)
            better = t_f < t_b
            t_b = jnp.where(better, t_f, t_b)
            q_b = jnp.where(better, dir.dot(zb), q_b)
            area_b = jnp.where(better, g(base + 20), area_b)
        pdf_rect = jnp.where(
            jnp.isfinite(t_b), t_b * t_b / (area_b * jnp.abs(q_b)), 0.0
        )
        return jnp.where(sel, jnp.where(kind == 0, pdf_sphere, pdf_rect), pdf)

    return jax.lax.fori_loop(0, scn.n_lights, body, jnp.zeros(B, org.x.dtype))
