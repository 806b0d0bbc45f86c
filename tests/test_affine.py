"""Non-rigid (scaled / sheared) transforms, scene validation, and the
Nearest volume-sampling mode.

The reference applies the full affine at hit time (``rect.rs:110-142``);
the compiler bakes the equivalent world-space geometry (forward bases,
inverse-transposed containment bases, true plane normal). These tests
cover the algebra analytically and gate a scaled-cornell render against
the independent numpy oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bendy_tpu.ops.intersect import FACE_BACK, FACE_FRONT, nearest_hit
from bendy_tpu.scene import (
    Data,
    DensityMap,
    Material,
    Object,
    ObjectFlags,
    Scene,
    Sphere,
    compile_scene,
)
from bendy_tpu.scene.graph import Cuboid, Rect, affine_identity
from bendy_tpu.utils.v3 import V3


def v3(x, y, z, n=1):
    return V3(jnp.full(n, float(x)), jnp.full(n, float(y)), jnp.full(n, float(z)))


def affine_linear(m, t=(0, 0, 0)):
    a = affine_identity()
    a[:, :3] = np.asarray(m, np.float64)
    a[:, 3] = np.asarray(t, np.float64)
    return a


def rect_scene(linear, t=(0, 0, 0)):
    scene = Scene()
    mat = scene.add_data(Data(Material.flat((1.0, 0.0, 0.0))))
    rect = Rect.from_edges(mat, [1, 0, 0], [0, 1, 0])  # hw=hh=1, n=+z
    scene.add_object(Object(rect).with_transform(affine_linear(linear, t)))
    return scene


def hit_at(scene, org, dir):
    arr = compile_scene(scene)
    return nearest_hit(v3(*org), v3(*dir), jnp.full(1, 0.01), jnp.full(1, 1000.0), arr)


class TestScaledRect:
    def test_scale_extends_the_face(self):
        scene = rect_scene(np.diag([3.0, 2.0, 1.0]))
        # x=2.5 is outside the unit rect but inside the 3x-scaled one
        h = hit_at(scene, [2.5, 0, 5], [0, 0, -1])
        assert bool(h.valid[0])
        assert float(h.t[0]) == pytest.approx(5.0)
        assert int(h.face[0]) == FACE_FRONT
        np.testing.assert_allclose(
            [h.normal.x[0], h.normal.y[0], h.normal.z[0]], [0, 0, 1], atol=1e-6
        )

    def test_scale_boundary_misses(self):
        scene = rect_scene(np.diag([3.0, 2.0, 1.0]))
        assert not bool(hit_at(scene, [3.1, 0, 5], [0, 0, -1]).valid[0])
        assert not bool(hit_at(scene, [0, 2.1, 5], [0, 0, -1]).valid[0])
        # back face code from behind
        h = hit_at(scene, [2.5, 0, -5], [0, 0, 1])
        assert int(h.face[0]) == FACE_BACK

    def test_shear_containment_is_exact(self):
        # shear: world x-edge (1,0,0), y-edge (0.5,1,0); point p = u·fx + v·fy
        scene = rect_scene([[1, 0.5, 0], [0, 1, 0], [0, 0, 1]])
        # u=0.95, v=0.9 -> world (1.4, 0.9): inside
        assert bool(hit_at(scene, [1.4, 0.9, 5], [0, 0, -1]).valid[0])
        # u=1.15, v=0.9 -> world (1.6, 0.9): outside (an axis-aligned test
        # would wrongly accept x=1.6 < 1+0.5·1)
        assert not bool(hit_at(scene, [1.6, 0.9, 5], [0, 0, -1]).valid[0])

    def test_sheared_plane_normal_is_perpendicular(self):
        # shear in z: the face plane tilts; the normal must follow fx x fy
        scene = rect_scene([[1, 0, 0], [0, 1, 0], [0.5, 0, 1]])
        h = hit_at(scene, [0, 0, 5], [0, 0, -1])
        assert bool(h.valid[0])
        fx = np.array([1.0, 0.0, 0.5])
        fy = np.array([0.0, 1.0, 0.0])
        n = np.cross(fx, fy)
        n /= np.linalg.norm(n)
        np.testing.assert_allclose(
            [h.normal.x[0], h.normal.y[0], h.normal.z[0]], n, atol=1e-6
        )

    def test_rigid_transform_unchanged(self):
        """Sanity: a pure rotation reproduces the pre-affine behavior."""
        th = 0.3
        rot = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
        )
        scene = rect_scene(rot)
        arr = compile_scene(scene)
        np.testing.assert_allclose(
            np.asarray(arr.rct_x), np.asarray(arr.rct_fx), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(arr.rct_z)[0], rot @ [0, 0, 1], atol=1e-6)


class TestScaledSphereParity:
    def test_sphere_ignores_linear_part(self):
        """The reference passes only transform.translation to sphere hits
        (``sphere.rs:121-148``) — a scaled sphere stays radius-r."""
        scene = Scene()
        mat = scene.add_data(Data(Material.flat((1.0, 1.0, 1.0))))
        obj = Object(Sphere(material=mat, radius=1.0))
        obj.with_transform(affine_linear(np.diag([5.0, 5.0, 5.0]), (0, 0, -5)))
        scene.add_object(obj)
        arr = compile_scene(scene)
        assert float(np.asarray(arr.sph_radius)[0]) == pytest.approx(1.0)
        h = nearest_hit(v3(0, 0, 0), v3(0, 0, -1),
                        jnp.full(1, 0.01), jnp.full(1, 1000.0), arr)
        assert float(h.t[0]) == pytest.approx(4.0)


class TestValidation:
    def test_diffuse_without_light_raises(self):
        scene = Scene()
        mat = scene.add_data(Data(Material.diffuse((0.5, 0.5, 0.5), 1.0)))
        scene.add_object(Object(Sphere(material=mat, radius=1.0)).with_tag("ball"))
        with pytest.raises(ValueError, match="LIGHT"):
            compile_scene(scene)

    def test_diffuse_with_light_ok(self):
        scene = Scene()
        mat = scene.add_data(Data(Material.diffuse((0.5, 0.5, 0.5), 1.0)))
        em = scene.add_data(Data(Material.emissive((1, 1, 1), 5.0)))
        scene.add_object(Object(Sphere(material=mat, radius=1.0)))
        scene.add_object(
            Object(Sphere(material=em, radius=0.5)).with_flags(ObjectFlags.LIGHT)
        )
        compile_scene(scene)

    def test_flat_only_scene_needs_no_light(self):
        scene = rect_scene(np.eye(3))
        compile_scene(scene)

    def test_singular_transform_raises(self):
        scene = rect_scene(np.diag([1.0, 1.0, 0.0]))
        with pytest.raises(ValueError, match="singular|degenerate"):
            compile_scene(scene)

    def test_bundled_scenes_still_validate(self):
        from bendy_tpu.scene import load_scene

        for name in ("cornell", "scene", "volume"):
            compile_scene(load_scene(f"scenes/{name}.json.gz"))


class TestScaledCornellRegression:
    def test_matches_numpy_oracle(self):
        """Scale the tall cuboid: our render must track the independent
        numpy oracle (which derives face geometry from the graph on its
        own), proving the compiler's affine algebra end to end."""
        import os
        import sys

        from bendy_tpu.render import Config, Renderer
        from bendy_tpu.scene import load_scene
        from bendy_tpu.scene.compiler import find_camera
        from bendy_tpu.ops.wavefront import trace
        from bendy_tpu.utils.rng import render_key

        scene = load_scene("scenes/cornell.json.gz")
        cam_ref = scene.find_by_tag("camera")
        cam_obj = scene.get_object(cam_ref)
        cam_obj.inner.aspect_ratio = 1.0
        cam_obj.inner.focus = None
        cuboids = [o for o in scene.iter() if isinstance(o.inner, Cuboid)]
        assert cuboids
        big = max(
            cuboids,
            key=lambda o: max(r.half_height for _, r in o.inner.faces),
        )
        w = big.transform.world.copy()
        w[:, :3] = w[:, :3] @ np.diag([1.6, 0.7, 1.3])
        big.transform.set_world(w)

        r = Renderer(scene, Config(max_bounces=2))
        W = H = 8
        spp = 192
        pix = jnp.arange(W * H, dtype=jnp.uint32)
        sub = jnp.zeros(W * H, jnp.uint32)
        key = render_key(jnp.uint32(5), jnp.uint32(0))
        res = trace(
            r.arrays, r.camera_params(cam_ref), key, pix, sub, W, H, spp, 1,
            r.trace_config(r.config),
        )
        ours = np.stack(
            [np.asarray(c).reshape(H, W) for c in res.radiance], -1
        ) / spp

        sys.path.insert(0, os.path.dirname(__file__))
        from oracle import Oracle

        cam, world = find_camera(scene)
        o = Oracle(scene, max_bounces=2, seed=4)
        ref = o.render(cam, world, W, H, spp=48)
        d = np.abs((ours - ref).mean(axis=(1, 2)))
        # rows containing the intensity-20 light carry binomial noise from
        # partial-coverage pixels (ref varies ~1.0 between oracle seeds);
        # they only get the coarse gate (same idea as test_render's gate)
        bright = ref.max(axis=(1, 2)) > 3.0
        assert d[~bright].max() < 0.12, d
        assert d.max() < 0.5, d
        mask = ref.mean(-1) < 3.0
        assert abs((ours - ref).mean(-1)[mask].mean()) < 0.03


class TestNearestSampling:
    def test_device_nearest_matches_host(self):
        """density_sample(nearest=True) == DensityMap.sample('nearest')."""
        from bendy_tpu.ops.volume import density_sample
        from bendy_tpu.ops.intersect import nearest_hit

        rng = np.random.default_rng(3)
        grid = DensityMap(4, 3, 5, rng.uniform(0, 2, 4 * 3 * 5).astype(np.float32))
        scene = Scene()
        mat = scene.add_data(Data(Material.flat((1, 1, 1))))
        vol = scene.add_data(Data(grid))
        scene.add_object(
            Object(Sphere(material=mat, radius=1.0, volume=vol)).with_translation(
                (0, 0, -5)
            )
        )
        arr = compile_scene(scene)
        # a real hit gives vol_grid/vol_size wiring for free
        h = nearest_hit(
            v3(0, 0, 0, n=8), v3(0, 0, -1, n=8),
            jnp.full(8, 0.01), jnp.full(8, 1000.0), arr,
        )
        coords = rng.uniform(0, 1, (8, 3)).astype(np.float32)
        coords[0] = [0.5, 0.5, 0.5]  # exercise ties
        cv = V3(jnp.asarray(coords[:, 0]), jnp.asarray(coords[:, 1]),
                jnp.asarray(coords[:, 2]))
        for nearest in (False, True):
            dev = np.asarray(density_sample(arr, h, cv, nearest=nearest))
            host = np.array(
                [grid.sample(c, "nearest" if nearest else "trilinear") for c in coords]
            )
            np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)

    def test_render_with_nearest_mode(self):
        from bendy_tpu.film import Film
        from bendy_tpu.render import Config, Renderer, RenderConfig
        from bendy_tpu.scene import load_scene

        imgs = {}
        for mode in ("trilinear", "nearest"):
            scene = load_scene("scenes/volume.json.gz")
            cam_ref = scene.find_by_tag("camera")
            scene.get_object(cam_ref).inner.aspect_ratio = 1.0
            r = Renderer(scene, Config(max_bounces=2, vol_sampling=mode))
            film = Film(8, 8)
            r.render(cam_ref, RenderConfig(samples=8), film, seed=3)
            imgs[mode] = film.mean().copy()
        assert np.isfinite(list(imgs.values())[0]).all()
        assert not np.array_equal(imgs["trilinear"], imgs["nearest"])

    def test_bad_mode_raises(self):
        from bendy_tpu.render import Config, Renderer
        from bendy_tpu.scene import load_scene

        scene = load_scene("scenes/volume.json.gz")
        r = Renderer(scene, Config(vol_sampling="cubic"))
        with pytest.raises(ValueError, match="vol_sampling"):
            r.trace_config(r.config)
