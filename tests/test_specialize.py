"""Static scene specialization is exact.

The renderer derives static facts from the compiled scene (which material
kinds exist, whether the camera has a focus distance) and drops the
integrator branches that are dead code for every lane
(``TraceConfig.has_diffuse/has_metallic/has_glass/has_dof``). These tests render
with the derived (specialized) config and with the fully generic config
and require bit-identical images — the specialization must be a pure
compile-time strength reduction, never an approximation.
"""

import numpy as np

from bendy_tpu.render import Config, Renderer, RenderConfig, Subsample, render_pass
from bendy_tpu.scene import Data, Material, Object, ObjectFlags, Scene, Sphere
from bendy_tpu.scene.graph import Camera


def emissive_metal_scene() -> Scene:
    """No diffuse anywhere, no camera focus — the lensed-showcase material
    profile (emissive lights + a specular probe) without the mass."""
    scene = Scene()
    env = scene.add_data(Data(Material.emissive((0.4, 0.4, 0.5), 0.05)))
    scene.set_root_material(env)
    scene.add_object(
        Object(Camera(focus=None)).with_tag("camera").with_translation([0, 0, 8.0])
    )
    star = scene.add_data(Data(Material.emissive((1.0, 0.8, 0.5), 2.0)))
    scene.add_object(
        Object(Sphere(material=star, radius=1.0)).with_translation([-2, 0, -6]).with_flags(
            ObjectFlags.LIGHT
        )
    )
    probe = scene.add_data(Data(Material.metallic((0.7, 0.7, 0.75), 0.1)))
    scene.add_object(Object(Sphere(material=probe, radius=1.2)).with_translation([1.5, 0, -2]))
    glass = scene.add_data(Data(Material.glass((0.9, 0.9, 1.0), 0.0, 1.4)))
    scene.add_object(Object(Sphere(material=glass, radius=0.8)).with_translation([-1.0, 0.5, 1.0]))
    return scene


def _render_with_cfg(renderer, cam_ref, tcfg, W=16, H=16, spp=8):
    cam = renderer.camera_params(cam_ref)
    sums, rays = render_pass(
        renderer.arrays, cam, np.uint32(7), np.int32(0), np.int32(0),
        W, H, H, spp, 1, tcfg, "full",
    )
    return np.asarray(sums), float(rays)


def assert_specialized_exact(scene, **expect):
    r = Renderer(scene, Config(), use_pallas=False)
    for attr, val in expect.items():
        assert getattr(r, attr) == val, (attr, val)
    cam_ref = scene.find_by_tag("camera")
    spec = r.trace_config(r.config, cam_ref)
    generic = spec._replace(has_diffuse=True, has_metallic=True, has_glass=True,
                            has_dof=True)
    assert spec != generic  # the test must actually exercise a dropped branch
    img_s, rays_s = _render_with_cfg(r, cam_ref, spec)
    img_g, rays_g = _render_with_cfg(r, cam_ref, generic)
    np.testing.assert_array_equal(img_s, img_g)
    assert rays_s == rays_g


def test_no_diffuse_no_dof_specialization_exact():
    assert_specialized_exact(
        emissive_metal_scene(), has_diffuse=False, has_metallic=True,
        has_glass=True
    )


def test_metallic_only_specialization_exact():
    # glass replaced by metal: the fresnel/refract branch and the ior
    # carry drop out entirely
    scene = emissive_metal_scene()
    for _, d in scene.data.items():
        m = d.as_material()
        if m is not None and m.kind == "glass":
            d.inner = Material.metallic(m.albedo, 0.2)
    assert_specialized_exact(
        scene, has_diffuse=False, has_metallic=True, has_glass=False
    )


def test_glass_only_specialization_exact():
    scene = emissive_metal_scene()
    for _, d in scene.data.items():
        m = d.as_material()
        if m is not None and m.kind == "metallic":
            d.inner = Material.glass(m.albedo, 0.05, 1.5)
    assert_specialized_exact(
        scene, has_diffuse=False, has_metallic=False, has_glass=True
    )


def test_diffuse_only_specialization_exact():
    # bundled cornell: diffuse + emissive only, camera focus set -> the
    # specialized config drops only the metallic/glass branch
    from bendy_tpu.scene import load_scene

    assert_specialized_exact(
        load_scene("scenes/cornell.json.gz"), has_diffuse=True,
        has_metallic=False, has_glass=False
    )


def test_flat_emissive_only_scene_renders():
    """No scattering kind at all: every path terminates at its first event."""
    scene = emissive_metal_scene()
    # replace the specular materials with flat ones
    for _, d in scene.data.items():
        m = d.as_material()
        if m is not None and m.kind in ("metallic", "glass"):
            d.inner = Material.flat(m.albedo)
    r = Renderer(scene, Config(), use_pallas=False)
    assert not r.has_diffuse and not r.has_metallic and not r.has_glass
    from bendy_tpu.film import Film

    cam = scene.find_by_tag("camera")
    film = Film(12, 12)
    r.render(cam, RenderConfig(samples=8, subsample=Subsample(1)), film, seed=3)
    m = film.mean()
    assert np.isfinite(m).all() and m.max() > 0.1
