"""Analytic intersection tests: sphere, rect, cuboid faces, light pdfs."""

import jax.numpy as jnp
import numpy as np
import pytest

from bendy_tpu.ops.intersect import (
    FACE_BACK,
    FACE_FRONT,
    FACE_VOLUME,
    FACE_VOLUME_BACK,
    FACE_VOLUME_FRONT,
    light_pdf,
    nearest_hit,
)
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
from bendy_tpu.scene.graph import Cuboid, Rect
from bendy_tpu.utils.v3 import V3


def v3(x, y, z, n=1):
    return V3(jnp.full(n, float(x)), jnp.full(n, float(y)), jnp.full(n, float(z)))


def single_sphere_scene(radius=1.0, center=(0, 0, -5), volume=False):
    scene = Scene()
    mat = scene.add_data(Data(Material.diffuse((0.5, 0.5, 0.5), 1.0)))
    vol = scene.add_data(Data(DensityMap.with_value(4, 4, 4, 1.0))) if volume else None
    scene.add_object(
        Object(Sphere(material=mat, radius=radius, volume=vol)).with_translation(center).with_flags(
            ObjectFlags.LIGHT
        )
    )
    return scene


def trace_one(scene, org, dir, cmin=0.01, cmax=1000.0, **kw):
    arr = compile_scene(scene)
    o = v3(*org)
    d = v3(*dir)
    return nearest_hit(o, d, jnp.full(1, cmin), jnp.full(1, cmax), arr, **kw), arr


class TestSphere:
    def test_head_on(self):
        hit, _ = trace_one(single_sphere_scene(), [0, 0, 0], [0, 0, -1])
        assert bool(hit.valid[0])
        assert float(hit.t[0]) == pytest.approx(4.0)
        np.testing.assert_allclose(
            [hit.normal.x[0], hit.normal.y[0], hit.normal.z[0]], [0, 0, 1], atol=1e-6
        )
        assert int(hit.face[0]) == FACE_FRONT
        # inline material carried by the hit
        assert int(hit.mtype[0]) == 1  # diffuse
        assert float(hit.albedo.x[0]) == pytest.approx(0.5)

    def test_from_inside_far_root(self):
        """Near root behind: reference falls back to the far root
        (``sphere.rs:139-145``)."""
        hit, _ = trace_one(single_sphere_scene(), [0, 0, -5], [0, 0, -1])
        assert float(hit.t[0]) == pytest.approx(1.0)
        assert int(hit.face[0]) == FACE_BACK
        np.testing.assert_allclose(hit.normal.z[0], 1.0, atol=1e-6)

    def test_miss(self):
        hit, _ = trace_one(single_sphere_scene(), [0, 0, 0], [0, 1, 0])
        assert not bool(hit.valid[0])
        assert int(hit.face[0]) == -1

    def test_clip_min_excludes(self):
        hit, _ = trace_one(single_sphere_scene(), [0, 0, -3.9999], [0, 0, -1], cmin=0.01)
        # near surface 1e-4 away is inside clip_min: far root at ~2 wins
        assert float(hit.t[0]) == pytest.approx(2.0, abs=1e-3)

    def test_volume_faces(self):
        hit, _ = trace_one(single_sphere_scene(volume=True), [0, 0, 0], [0, 0, -1])
        assert int(hit.face[0]) == FACE_VOLUME_FRONT
        assert int(hit.vol_grid[0]) == 0
        hit, _ = trace_one(single_sphere_scene(volume=True), [0, 0, -5], [0, 0, -1])
        assert int(hit.face[0]) == FACE_VOLUME_BACK

    def test_interior_march_pseudo_hit(self):
        """Inside test at t = clip.max (``sphere.rs:150-166``)."""
        scene = single_sphere_scene(volume=True)
        arr = compile_scene(scene)
        hit = nearest_hit(
            v3(0, 0, -5), v3(0, 0, -1), jnp.zeros(1), jnp.full(1, 0.1), arr,
            march=jnp.array([True]), last_sphere=jnp.array([0]),
        )
        assert bool(hit.valid[0])
        assert int(hit.face[0]) == FACE_VOLUME
        assert float(hit.t[0]) == pytest.approx(0.1)
        np.testing.assert_allclose(
            [hit.normal.x[0], hit.normal.y[0], hit.normal.z[0]], 0.0
        )
        # bbox for density coords = sphere AABB (``sphere.rs:35-38``)
        np.testing.assert_allclose(hit.bbox_min.z[0], -6.0, atol=1e-6)
        np.testing.assert_allclose(hit.bbox_size.x[0], 2.0, atol=1e-6)

    def test_interior_march_exit(self):
        """Point at t=step outside: falls back to the surface hit."""
        scene = single_sphere_scene(volume=True)
        arr = compile_scene(scene)
        hit = nearest_hit(
            v3(0, 0, -5.95), v3(0, 0, -1), jnp.zeros(1), jnp.full(1, 0.1), arr,
            march=jnp.array([True]), last_sphere=jnp.array([0]),
        )
        assert bool(hit.valid[0])
        assert int(hit.face[0]) == FACE_VOLUME_BACK
        assert float(hit.t[0]) == pytest.approx(0.05, abs=1e-5)


class TestRect:
    def scene(self):
        scene = Scene()
        mat = scene.add_data(Data(Material.diffuse((0.5, 0.5, 0.5), 1.0)))
        scene.add_object(
            Object(Rect.from_edges(mat, [1.0, 0, 0], [0, 1.0, 0])).with_translation([0, 0, -3])
            .with_flags(ObjectFlags.LIGHT)
        )
        return scene

    def test_hit_and_face(self):
        hit, _ = trace_one(self.scene(), [0, 0, 0], [0, 0, -1])
        assert float(hit.t[0]) == pytest.approx(3.0)
        assert int(hit.face[0]) == FACE_FRONT
        np.testing.assert_allclose(hit.normal.z[0], 1.0, atol=1e-6)

    def test_back_face(self):
        hit, _ = trace_one(self.scene(), [0, 0, -6], [0, 0, 1])
        assert int(hit.face[0]) == FACE_BACK
        np.testing.assert_allclose(hit.normal.z[0], -1.0, atol=1e-6)

    def test_containment(self):
        hit, _ = trace_one(self.scene(), [1.01, 0, 0], [0, 0, -1])
        assert not bool(hit.valid[0])
        hit, _ = trace_one(self.scene(), [0.99, 0.99, 0], [0, 0, -1])
        assert bool(hit.valid[0])

    def test_parallel_reject(self):
        hit, _ = trace_one(self.scene(), [0, 0, -3.0], [1, 0, 0])
        assert not bool(hit.valid[0])


class TestCuboid:
    def test_nearest_face(self):
        scene = Scene()
        mat = scene.add_data(Data(Material.diffuse((0.5, 0.5, 0.5), 1.0)))
        scene.add_object(
            Object(Cuboid.from_axes(mat, [1, 0, 0], [0, 1, 0], [0, 0, 1]))
            .with_translation([0, 0, -5])
            .with_flags(ObjectFlags.LIGHT)
        )
        hit, _ = trace_one(scene, [0, 0, 0], [0, 0, -1])
        assert float(hit.t[0]) == pytest.approx(4.0)  # nearest face at z=-4
        # reference quirk: cuboid face bases point inward (the +z face is
        # built from (-x, y), ``cuboid.rs:19-30``), so an outside hit is a
        # BACK face whose normal gets flipped toward the ray
        np.testing.assert_allclose(hit.normal.z[0], 1.0, atol=1e-6)
        assert int(hit.face[0]) == FACE_BACK
        # from the inside, the far face at z=-6 reports FRONT
        hit, _ = trace_one(scene, [0, 0, -5], [0, 0, -1])
        assert float(hit.t[0]) == pytest.approx(1.0)
        assert int(hit.face[0]) == FACE_FRONT
        np.testing.assert_allclose(hit.normal.z[0], 1.0, atol=1e-6)


class TestLightPdf:
    def test_sphere_pdf(self):
        """pdf = t² / (π r²) (``sphere.rs:44-61``)."""
        scene = single_sphere_scene(radius=1.0, center=(0, 0, -5))
        arr = compile_scene(scene)
        pdf = light_pdf(
            v3(0, 0, 0), v3(0, 0, -1), jnp.full(1, 0.01), jnp.full(1, 1000.0), arr,
            jnp.array([0]),
        )
        assert float(pdf[0]) == pytest.approx(16.0 / np.pi, rel=1e-5)

    def test_sphere_pdf_miss_is_zero(self):
        scene = single_sphere_scene()
        arr = compile_scene(scene)
        pdf = light_pdf(
            v3(0, 0, 0), v3(0, 1, 0), jnp.full(1, 0.01), jnp.full(1, 1000.0), arr,
            jnp.array([0]),
        )
        assert float(pdf[0]) == 0.0

    def test_rect_pdf(self):
        """pdf = t² / (area · |d·n|) (``rect.rs:92-108``)."""
        scene = Scene()
        mat = scene.add_data(Data(Material.emissive((1, 1, 1), 5.0)))
        scene.add_object(
            Object(Rect.from_edges(mat, [1.0, 0, 0], [0, 2.0, 0]))
            .with_translation([0, 0, -4])
            .with_flags(ObjectFlags.LIGHT)
        )
        arr = compile_scene(scene)
        pdf = light_pdf(
            v3(0, 0, 0), v3(0, 0, -1), jnp.full(1, 0.01), jnp.full(1, 1000.0), arr,
            jnp.array([0]),
        )
        assert float(pdf[0]) == pytest.approx(16.0 / (4 * 1.0 * 2.0 * 1.0), rel=1e-5)

    def test_cuboid_pdf_uses_nearest_face(self):
        """Nearest face's pdf (``cuboid.rs:56-81``)."""
        scene = Scene()
        mat = scene.add_data(Data(Material.emissive((1, 1, 1), 5.0)))
        scene.add_object(
            Object(Cuboid.from_axes(mat, [1, 0, 0], [0, 1, 0], [0, 0, 1]))
            .with_translation([0, 0, -5])
            .with_flags(ObjectFlags.LIGHT)
        )
        arr = compile_scene(scene)
        pdf = light_pdf(
            v3(0, 0, 0), v3(0, 0, -1), jnp.full(1, 0.01), jnp.full(1, 1000.0), arr,
            jnp.array([0]),
        )
        # nearest face at z=-4 (t=4), area 4 (2x2 face), |d·n| = 1
        assert float(pdf[0]) == pytest.approx(16.0 / 4.0, rel=1e-5)


def test_nearest_hit_picks_closest():
    scene = Scene()
    mat = scene.add_data(Data(Material.diffuse((0.5, 0.5, 0.5), 1.0)))
    scene.add_object(Object(Sphere(material=mat, radius=1.0)).with_translation([0, 0, -10]))
    scene.add_object(Object(Rect.from_edges(mat, [5, 0, 0], [0, 5, 0])).with_translation([0, 0, -6]))
    scene.add_object(
        Object(Sphere(material=mat, radius=1.0)).with_translation([0, 0, -3]).with_flags(
            ObjectFlags.LIGHT
        )
    )
    hit, _ = trace_one(scene, [0, 0, 0], [0, 0, -1])
    assert float(hit.t[0]) == pytest.approx(2.0)
    assert int(hit.sphere_row[0]) >= 0


class TestBoxCompile:
    """Cuboids compile to three-slab boxes; geometry must match the
    per-face rect sweep (the two formulas differ only in rounding)."""

    def test_cornell_box_counts(self):
        from bendy_tpu.scene import load_scene

        arr = compile_scene(load_scene("scenes/cornell.json.gz"))
        assert arr.n_boxes == 2
        assert arr.n_trace_rects == 6  # 5 walls + light
        assert arr.n_rects == 18  # oracle table keeps the 12 face rects

    def test_box_equals_rect_fallback(self):
        import bendy_tpu.scene.compiler as C
        from bendy_tpu.film import Film
        from bendy_tpu.render import Config, Renderer, RenderConfig, Subsample
        from bendy_tpu.scene import load_scene

        def render(scene):
            cam = scene.find_by_tag("camera")
            scene.get_object(cam).inner.aspect_ratio = 1.0
            film = Film(24, 24)
            Renderer(scene, Config(max_bounces=4)).render(
                cam, RenderConfig(samples=4, subsample=Subsample(1)), film, seed=11
            )
            return film.mean()

        img_box = render(load_scene("scenes/cornell.json.gz"))
        assert compile_scene(load_scene("scenes/cornell.json.gz")).n_boxes == 2
        old = C.BOX_COMPILE
        C.BOX_COMPILE = False
        try:
            scene = load_scene("scenes/cornell.json.gz")
            assert compile_scene(scene).n_boxes == 0
            img_rect = render(scene)
        finally:
            C.BOX_COMPILE = old
        # identical geometry, different fp formula: ulp-level t noise can
        # flip a rare sample at a box edge, so compare statistically
        np.testing.assert_allclose(img_box.mean(), img_rect.mean(), rtol=2e-3)
        np.testing.assert_allclose(img_box, img_rect, atol=0.05)
