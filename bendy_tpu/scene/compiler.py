"""Scene compiler: host scene graph -> flat SoA device arrays.

The reference hit-tests objects by walking a HashMap and dynamic-dispatching
per shape (``src/tracer/mod.rs:394-399``, ``src/scene/object/mod.rs:168-198``).
On TPU we compile the scene once into struct-of-arrays form so the wavefront
integrator can intersect *every* primitive against *every* ray lane as one
fused, branchless batch:

- cuboids are decomposed into their six world-space rect faces at compile
  time, exactly mirroring the reference's own representation
  (``src/scene/object/cuboid.rs:19-30`` — a cuboid *is* six rects there too;
  we just bake the per-face offset transforms in),
- rect bases are rotated into world space (the reference rotates at hit
  time, ``src/scene/object/rect.rs:119``; scenes use rigid transforms so
  pre-rotating is exact),
- materials/volumes are re-keyed to dense indices,
- LIGHT-flagged objects get a sampling table (uniform light pick +
  area-weighted cuboid face pick, ``src/scene/data/material.rs:106-122``,
  ``src/scene/object/cuboid.rs:48-54``),
- density grids are zero-padded to a common shape so they stack into one
  [G, D, H, W] array.

Arrays are padded to multiples of 8 rows with ``valid`` masks so scene
edits of similar size hit the jit cache.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bendy_tpu.scene.graph import (
    Camera,
    Cuboid,
    ObjectFlags,
    Rect,
    Scene,
    Sphere,
    transform_point,
    transform_vector,
)

MAX_LIGHT_FACES = 6  # a cuboid light contributes 6 faces

_MATERIAL_CODES = {"flat": 0, "diffuse": 1, "metallic": 2, "glass": 3, "emissive": 4}


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


def _round8(n: int) -> int:
    return max(8, -(-n // 8) * 8)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SceneArrays:
    """Device-resident scene: every field is a jnp array (pytree leaves)."""

    # spheres
    sph_center: jnp.ndarray  # [Ns,3]
    sph_radius: jnp.ndarray  # [Ns]
    sph_mat: jnp.ndarray  # [Ns] dense material idx
    sph_vol: jnp.ndarray  # [Ns] dense volume idx, -1 = none
    sph_valid: jnp.ndarray  # [Ns] bool

    # rects (stand-alone + baked cuboid faces)
    rct_center: jnp.ndarray  # [Nr,3] world face center
    rct_x: jnp.ndarray  # [Nr,3] world unit basis
    rct_y: jnp.ndarray  # [Nr,3]
    rct_z: jnp.ndarray  # [Nr,3] world unit normal
    rct_hw: jnp.ndarray  # [Nr]
    rct_hh: jnp.ndarray  # [Nr]
    rct_mat: jnp.ndarray  # [Nr]
    rct_valid: jnp.ndarray  # [Nr] bool

    # materials (dense)
    mat_type: jnp.ndarray  # [K] codes: flat=0 diffuse=1 metallic=2 glass=3 emissive=4
    mat_albedo: jnp.ndarray  # [K,3]
    mat_rough: jnp.ndarray  # [K]
    mat_ior: jnp.ndarray  # [K]
    mat_emitted: jnp.ndarray  # [K,3] flat->albedo, emissive->albedo*intensity, else 0

    # environment (root material, ``src/scene/mod.rs:92-104``)
    root_mat: jnp.ndarray  # [] int32 dense material idx

    # lights (``ObjectFlags::LIGHT`` objects)
    light_kind: jnp.ndarray  # [L] 0=sphere 1=rect(s)
    light_sphere: jnp.ndarray  # [L] sphere row or -1
    light_faces: jnp.ndarray  # [L, MAX_LIGHT_FACES] rect rows, -1 padded
    light_face_cdf: jnp.ndarray  # [L, MAX_LIGHT_FACES] area-weighted cumulative probs
    num_lights: jnp.ndarray  # [] int32

    # volumes
    vol_grid: jnp.ndarray  # [G, D, H, W] densities (zero-padded)
    vol_size: jnp.ndarray  # [G,3] (w-1, h-1, d-1) as f32

    # geodesic masses (optional extension; zero rows in flat scenes)
    mass_center: jnp.ndarray  # [M,3]
    mass_rs: jnp.ndarray  # [M] Schwarzschild radius

    def tree_flatten(self):
        from dataclasses import fields

        return tuple(getattr(self, f.name) for f in fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def n_spheres(self) -> int:
        return self.sph_radius.shape[0]

    @property
    def n_rects(self) -> int:
        return self.rct_hw.shape[0]


def compile_scene(scene: Scene, dtype=jnp.float32) -> SceneArrays:
    """Flatten a committed scene graph into SoA device arrays."""
    # dense material / volume keying
    mat_keys = [k for k, d in scene.data.items() if d.as_material() is not None]
    vol_keys = [k for k, d in scene.data.items() if d.as_volume() is not None]
    mat_index = {k: i for i, k in enumerate(sorted(mat_keys))}
    vol_index = {k: i for i, k in enumerate(sorted(vol_keys))}

    K = max(1, len(mat_keys))
    mat_type = np.zeros(K, np.int32)
    mat_albedo = np.zeros((K, 3), np.float32)
    mat_rough = np.zeros(K, np.float32)
    mat_ior = np.ones(K, np.float32)
    mat_emitted = np.zeros((K, 3), np.float32)
    for key, idx in mat_index.items():
        m = scene.data[key].as_material()
        mat_type[idx] = _MATERIAL_CODES[m.kind]
        mat_albedo[idx] = m.albedo
        mat_rough[idx] = m.roughness
        mat_ior[idx] = m.ior
        if m.kind == "flat":
            # Flat emits its albedo (``src/scene/data/material.rs:76``)
            mat_emitted[idx] = m.albedo
        elif m.kind == "emissive":
            mat_emitted[idx] = np.asarray(m.albedo) * m.intensity

    # primitives
    sph_center, sph_radius, sph_mat, sph_vol, sph_obj = [], [], [], [], []
    rct_center, rct_x, rct_y, rct_z, rct_hw, rct_hh, rct_mat = [], [], [], [], [], [], []
    sphere_row_of_obj: dict[int, int] = {}
    rect_rows_of_obj: dict[int, list[int]] = {}

    for ref, obj in scene.pairs():
        world = obj.transform.world
        inner = obj.inner
        if isinstance(inner, Sphere):
            sphere_row_of_obj[ref] = len(sph_radius)
            sph_center.append(world[:, 3])
            sph_radius.append(inner.radius)
            sph_mat.append(mat_index[inner.material])
            sph_vol.append(-1 if inner.volume is None else vol_index[inner.volume])
            sph_obj.append(ref)
        elif isinstance(inner, Rect):
            rect_rows_of_obj[ref] = [len(rct_hw)]
            _append_rect(world, np.zeros(3), inner,
                         rct_center, rct_x, rct_y, rct_z, rct_hw, rct_hh, rct_mat, mat_index)
        elif isinstance(inner, Cuboid):
            rows = []
            for offset, rect in inner.faces:
                rows.append(len(rct_hw))
                _append_rect(world, offset, rect,
                             rct_center, rct_x, rct_y, rct_z, rct_hw, rct_hh, rct_mat, mat_index)
            rect_rows_of_obj[ref] = rows
        # Camera / Empty objects are not hit-testable (``object/mod.rs:178``)

    Ns = _round8(len(sph_radius))
    Nr = _round8(len(rct_hw))
    sph_valid = np.zeros(Ns, bool)
    sph_valid[: len(sph_radius)] = True
    rct_valid = np.zeros(Nr, bool)
    rct_valid[: len(rct_hw)] = True

    # lights
    lights = [(ref, obj) for ref, obj in scene.pairs() if obj.has_flags(ObjectFlags.LIGHT)]
    L = max(1, len(lights))
    light_kind = np.zeros(L, np.int32)
    light_sphere = np.full(L, -1, np.int32)
    light_faces = np.full((L, MAX_LIGHT_FACES), -1, np.int32)
    light_face_cdf = np.ones((L, MAX_LIGHT_FACES), np.float32)
    for i, (ref, obj) in enumerate(lights):
        if isinstance(obj.inner, Sphere):
            light_kind[i] = 0
            light_sphere[i] = sphere_row_of_obj[ref]
        else:
            light_kind[i] = 1
            rows = rect_rows_of_obj[ref]
            light_faces[i, : len(rows)] = rows
            if isinstance(obj.inner, Cuboid):
                areas = np.array([rect.area for _, rect in obj.inner.faces], np.float32)
            else:
                areas = np.array([obj.inner.area], np.float32)
            cdf = np.cumsum(areas / areas.sum())
            light_face_cdf[i, : len(rows)] = cdf
            light_face_cdf[i, len(rows):] = 1.0

    # volumes: pad all grids to a common [D,H,W]
    if vol_keys:
        grids = [scene.data[k].as_volume() for k in sorted(vol_keys)]
        D = max(g.depth for g in grids)
        H = max(g.height for g in grids)
        W = max(g.width for g in grids)
        vol_grid = np.zeros((len(grids), D, H, W), np.float32)
        vol_size = np.zeros((len(grids), 3), np.float32)
        for i, g in enumerate(grids):
            vol_grid[i, : g.depth, : g.height, : g.width] = g.grid()
            vol_size[i] = g.size
    else:
        vol_grid = np.zeros((1, 1, 1, 1), np.float32)
        vol_size = np.zeros((1, 3), np.float32)

    # geodesic masses: objects tagged "mass:<schwarzschild_radius>"
    mass_center, mass_rs = [], []
    for ref, obj in scene.pairs():
        if obj.tag and obj.tag.startswith("mass:"):
            mass_center.append(obj.transform.world[:, 3])
            mass_rs.append(float(obj.tag.split(":", 1)[1]))

    f = lambda x: jnp.asarray(np.asarray(x, np.float32), dtype=dtype)  # noqa: E731
    i32 = lambda x: jnp.asarray(np.asarray(x, np.int32))  # noqa: E731

    return SceneArrays(
        sph_center=f(_pad_rows(np.asarray(sph_center, np.float32).reshape(-1, 3), Ns)),
        sph_radius=f(_pad_rows(np.asarray(sph_radius, np.float32), Ns)),
        sph_mat=i32(_pad_rows(np.asarray(sph_mat, np.int32), Ns)),
        sph_vol=i32(_pad_rows(np.asarray(sph_vol, np.int32) + 1, Ns) - 1),
        sph_valid=jnp.asarray(sph_valid),
        rct_center=f(_pad_rows(np.asarray(rct_center, np.float32).reshape(-1, 3), Nr)),
        rct_x=f(_pad_rows(np.asarray(rct_x, np.float32).reshape(-1, 3), Nr)),
        rct_y=f(_pad_rows(np.asarray(rct_y, np.float32).reshape(-1, 3), Nr)),
        rct_z=f(_pad_rows(np.asarray(rct_z, np.float32).reshape(-1, 3), Nr)),
        rct_hw=f(_pad_rows(np.asarray(rct_hw, np.float32), Nr)),
        rct_hh=f(_pad_rows(np.asarray(rct_hh, np.float32), Nr)),
        rct_mat=i32(_pad_rows(np.asarray(rct_mat, np.int32), Nr)),
        rct_valid=jnp.asarray(rct_valid),
        mat_type=i32(mat_type),
        mat_albedo=f(mat_albedo),
        mat_rough=f(mat_rough),
        mat_ior=f(mat_ior),
        mat_emitted=f(mat_emitted),
        root_mat=i32(mat_index[scene.root_material]),
        light_kind=i32(light_kind),
        light_sphere=i32(light_sphere),
        light_faces=i32(light_faces),
        light_face_cdf=f(light_face_cdf),
        num_lights=i32(len(lights)),
        vol_grid=f(vol_grid),
        vol_size=f(vol_size),
        mass_center=f(np.asarray(mass_center, np.float32).reshape(-1, 3)),
        mass_rs=f(np.asarray(mass_rs, np.float32)),
    )


def _append_rect(world, offset, rect: Rect,
                 centers, xs, ys, zs, hws, hhs, mats, mat_index) -> None:
    """Bake one rect row: world-space center + rotated basis.

    For cuboid faces, the reference uses ``transform * translation(offset)``
    (``src/scene/object/cuboid.rs:95``); its translation column is
    ``transform_point(world, offset)`` and the rotation is the object's.
    """
    centers.append(transform_point(world, offset))
    xs.append(transform_vector(world, rect.x))
    ys.append(transform_vector(world, rect.y))
    zs.append(transform_vector(world, rect.z))
    hws.append(rect.half_width)
    hhs.append(rect.half_height)
    mats.append(mat_index[rect.material])


def find_camera(scene: Scene, tag: str = "camera") -> tuple[Camera, np.ndarray]:
    """Camera data + its world transform, by tag (``src/main.rs:216``)."""
    ref = scene.find_by_tag(tag)
    if ref is None:
        raise ValueError(f"no object tagged {tag!r}")
    obj = scene.get_object(ref)
    cam = obj.as_camera()
    if cam is None:
        raise ValueError(f"object {tag!r} is not a camera")
    return cam, obj.transform.world
