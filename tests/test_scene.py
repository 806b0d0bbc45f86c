"""Scene graph, (de)serialization, and compiler tests.

The five bundled assets are the contract: they must load, round-trip
through our writer byte-compatibly at the JSON-value level, and compile to
the expected SoA shapes.
"""

import glob
import json

import numpy as np
import pytest

from bendy_tpu.scene import (
    Camera,
    Cuboid,
    Data,
    Material,
    Object,
    ObjectFlags,
    Rect,
    Scene,
    Sphere,
    Update,
    UpdateQueue,
    compile_scene,
    load_scene,
)
from bendy_tpu.scene.graph import affine_from_translation
from bendy_tpu.scene.io import dumps_scene, loads_scene, scene_to_dict

SCENES = sorted(glob.glob("scenes/*.json.gz"))


@pytest.mark.parametrize("path", SCENES)
def test_load_bundled(path):
    scene = load_scene(path)
    assert scene.find_by_tag("camera") is not None
    assert len(scene.objects) >= 4
    # Scenes that shade any Diffuse material need >= 1 LIGHT-flagged
    # object (the reference panics otherwise, material.rs:106-119; our
    # compiler raises the same way, scene/compiler.py). Pure
    # emissive/flat scenes (e.g. mass_cluster) legitimately have none —
    # the reference's panic path is unreachable for them.
    diffuse_users = [
        d for d in scene.data.values()
        if d.as_material() is not None and d.as_material().kind == "diffuse"
    ]
    if diffuse_users:
        lights = [o for o in scene.iter() if o.has_flags(ObjectFlags.LIGHT)]
        assert lights
    # and every bundled scene must compile (the compiler re-checks the
    # diffuse/light invariant itself)
    compile_scene(scene)


def test_bundled_scene_hygiene():
    """A scene committed to scenes/ must be wired end to end: present in
    tools/fidelity.py's FIDELITY_SCENES table AND carrying an entry in
    docs/fidelity.json (VERDICT r4 item 7 — a showcase scene must not
    ship half-wired again). Fails fast in the smoke tier."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "fidelity_tool", os.path.join(root, "tools", "fidelity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    bundled = {
        os.path.basename(p)[: -len(".json.gz")] for p in SCENES
    }
    assert bundled == set(mod.FIDELITY_SCENES), (
        "scenes/ and tools/fidelity.py FIDELITY_SCENES disagree: "
        f"only in scenes/: {bundled - set(mod.FIDELITY_SCENES)}, "
        f"only in the table: {set(mod.FIDELITY_SCENES) - bundled}"
    )

    with open(os.path.join(root, "docs", "fidelity.json")) as f:
        fid = json.load(f)
    missing = bundled - set(fid)
    assert not missing, (
        f"bundled scenes missing a docs/fidelity.json entry: {missing} "
        "(run: python3 tools/fidelity.py --scenes <name>)"
    )
    for name in bundled:
        entry = fid[name]
        assert entry, f"{name}: empty fidelity entry"
        import math

        for k, v in entry.items():
            assert math.isfinite(v["mse"]), (name, k, v)


def test_bundled_scene_bench_rows():
    """Every bundled scene must map to a committed benches_results.json
    row (its perf class), and that row must carry a finite median — the
    round-4 drift was exactly two scenes shipping without bench rows.
    The mapping is explicit: cuboid_light is cornell-class (flat
    surfaces + area lights) and binary_blackhole is blackhole-class
    (unrolled geodesic); every other scene has its own row."""
    import math
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "benches_results.json")) as f:
        rows = json.load(f)

    scene_to_row = {
        "cornell": "cornell",
        "cornell2": "cornell2",
        "scene": "scene",
        "volume": "volume",
        "cloud": "cloud",
        "dense_cloud": "dense_cloud",
        "cuboid_light": "cornell",  # flat surface + area-light class
        "blackhole": "blackhole_geodesic",
        "binary_blackhole": "blackhole_geodesic",  # unrolled geodesic class
        "blackhole_cloud": "blackhole_cloud",
        "cloud_field": "cloud_field_256_looped",
        "mass_cluster": "mass_cluster_64_looped",
    }
    bundled = {os.path.basename(p)[: -len(".json.gz")] for p in SCENES}
    unmapped = bundled - set(scene_to_row)
    assert not unmapped, (
        f"bundled scenes with no bench-row mapping: {unmapped} — add the "
        "scene's perf class here and a row in bench.py --full"
    )
    for name, row_key in scene_to_row.items():
        assert row_key in rows, (name, row_key, sorted(rows))
        med = rows[row_key].get("mrays")
        assert med is not None and math.isfinite(med) and med > 0, (
            name, row_key, rows[row_key],
        )


@pytest.mark.parametrize("path", SCENES)
def test_roundtrip_bundled(path):
    """load -> dump -> load preserves the full graph (value-level)."""
    import gzip

    scene = load_scene(path)
    text = dumps_scene(scene)
    scene2 = loads_scene(text)
    d1 = scene_to_dict(scene)
    d2 = scene_to_dict(scene2)
    assert json.dumps(d1, sort_keys=True) == json.dumps(d2, sort_keys=True)

    # and our dump carries exactly the reference's top-level schema
    with gzip.open(path, "rt") as f:
        ref = json.load(f)
    assert set(d1.keys()) == set(ref.keys())
    assert d1["objects"]["next_key"] == ref["objects"]["next_key"]
    assert set(d1["objects"]["collection"]) == set(ref["objects"]["collection"])


def test_cornell_contents():
    """Known inventory of cornell.json.gz (SURVEY.md §6)."""
    scene = load_scene("scenes/cornell.json.gz")
    kinds = {}
    for o in scene.iter():
        kinds[type(o.inner).__name__] = kinds.get(type(o.inner).__name__, 0) + 1
    assert kinds == {"Camera": 1, "Rect": 6, "Cuboid": 2}
    cam = scene.get_object(scene.find_by_tag("camera")).as_camera()
    assert cam.focal_length == pytest.approx(0.05)
    assert cam.fstop == pytest.approx(1.4)
    assert cam.focus == pytest.approx(12.5)


def test_compile_cornell():
    scene = load_scene("scenes/cornell.json.gz")
    arr = compile_scene(scene)
    assert arr.n_rects == 6 + 2 * 6  # 6 rects + 2 cuboids×6 faces
    assert arr.n_spheres == 0
    assert arr.n_lights == 1
    # light is the 0.5-half-extent ceiling rect with intensity 20
    assert int(np.asarray(arr.light_face_valid)[0].sum()) == 1
    assert float(np.asarray(arr.light_face_hw)[0, 0]) == pytest.approx(0.5)
    assert float(np.asarray(arr.rct_emitted).max()) == pytest.approx(20.0)
    # cuboid faces inherit the inline material of their rects
    assert set(np.asarray(arr.rct_mtype)) <= {0, 1, 2, 3, 4}


def test_compile_volume_scene():
    scene = load_scene("scenes/volume.json.gz")
    arr = compile_scene(scene)
    assert arr.vol_grid.shape == (1, 8, 8, 8)
    assert arr.n_spheres == 4
    assert (np.asarray(arr.sph_vol_grid) >= 0).sum() == 1
    # the volume sphere's grid dims ride on the sphere row
    row = int(np.argmax(np.asarray(arr.sph_vol_grid) >= 0))
    np.testing.assert_allclose(np.asarray(arr.sph_vol_size)[row], [7.0, 7.0, 7.0])


def test_rect_basis_orthonormal():
    r = Rect.from_edges(0, [0.0, 0.0, -2.5], [0.0, 2.5, 0.0])
    assert r.half_width == pytest.approx(2.5)
    assert r.half_height == pytest.approx(2.5)
    np.testing.assert_allclose(np.dot(r.x, r.y), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.cross(r.x, r.y), r.z, atol=1e-12)


def test_cuboid_six_faces():
    c = Cuboid.from_axes(0, [0.5, 0, 0], [0, 1.0, 0], [0, 0, 0.4])
    assert len(c.faces) == 6
    areas = sorted(rect.area for _, rect in c.faces)
    # area = 4·hw·hh per face (``rect.rs:88-90``): ±z faces 4·0.5·1.0,
    # ±x faces 4·0.4·1.0, ±y faces 4·0.5·0.4
    assert areas == pytest.approx([0.8, 0.8, 1.6, 1.6, 2.0, 2.0])


def test_update_queue_propagates_to_children():
    """Deferred transform propagation (``src/scene/mod.rs:154-212``,
    ``src/scene/object/mod.rs:200-244``)."""
    scene = Scene()
    parent = scene.add_object(Object())
    child = scene.add_object(Object())
    q = UpdateQueue()
    scene.get_object(parent).add(q, child)
    q.commit(scene)

    q.push(
        Update.object(
            parent, lambda o, qq, _d: o.apply_transform(qq, affine_from_translation([1, 2, 3]))
        )
    )
    q.commit(scene)
    np.testing.assert_allclose(scene.get_object(parent).transform.world[:, 3], [1, 2, 3])
    np.testing.assert_allclose(scene.get_object(child).transform.world[:, 3], [1, 2, 3])


def test_default_root_material_flat_black():
    scene = Scene()
    m = scene.root_material_data()
    assert m.kind == "flat" and m.albedo == (0.0, 0.0, 0.0)


def test_save_load_file(tmp_path):
    scene = Scene()
    mat = scene.add_data(Data(Material.emissive((1.0, 0.5, 0.2), 5.0)))
    scene.add_object(Object(Sphere(material=mat, radius=2.0)).with_translation([0, 1, 0]).with_tag("ball").with_flags(ObjectFlags.LIGHT))
    scene.add_object(Object(Camera()).with_tag("camera"))
    for name in ["s.json", "s.json.gz"]:
        from bendy_tpu.scene import save_scene

        p = str(tmp_path / name)
        save_scene(p, scene)
        back = load_scene(p)
        ball = back.get_object(back.find_by_tag("ball"))
        assert ball.inner.radius == pytest.approx(2.0)
        assert ball.has_flags(ObjectFlags.LIGHT)
        np.testing.assert_allclose(ball.transform.world[:, 3], [0, 1, 0])


# -- per-scene geodesic overrides (extension block) ---------------------------


def _mass_scene() -> Scene:
    scene = Scene()
    env = scene.add_data(Data(Material.emissive((1, 1, 1), 0.1)))
    scene.set_root_material(env)
    scene.add_object(Object().with_tag("mass:1.0"))
    scene.add_object(
        Object(Camera(focus=None)).with_tag("camera").with_translation([0, 0, 10.0])
    )
    return scene


def test_geodesic_block_round_trips():
    scene = _mass_scene()
    scene.geodesic = {"eta": 0.1, "max_steps": 64}
    again = loads_scene(dumps_scene(scene))
    assert again.geodesic == {"eta": 0.1, "max_steps": 64}
    # absent block stays absent (and out of the serialized doc)
    plain = Scene()
    assert "geodesic" not in scene_to_dict(plain)
    assert loads_scene(dumps_scene(plain)).geodesic is None


def test_geodesic_block_rejects_unknown_keys():
    scene = _mass_scene()
    scene.geodesic = {"etaa": 0.1}
    with pytest.raises(ValueError, match="etaa"):
        loads_scene(dumps_scene(scene))


def test_geodesic_block_configures_renderer():
    from bendy_tpu.geodesic import GeoParams
    from bendy_tpu.render import Config, Renderer

    scene = _mass_scene()
    scene.geodesic = {"eta": 0.11, "max_steps": 48}
    r = Renderer(scene, Config(), use_pallas=False)
    geo = r.trace_config(r.config, scene.find_by_tag("camera")).geo
    assert geo == GeoParams()._replace(eta=0.11, max_steps=48)
    # an explicit Config.geo wins wholesale
    override = GeoParams(eta=0.5)
    r2 = Renderer(scene, Config(geo=override), use_pallas=False)
    assert r2.trace_config(r2.config).geo == override


def test_geodesic_cli_flags_overlay_scene_block(tmp_path):
    from bendy_tpu import cli

    scene = _mass_scene()
    scene.geodesic = {"eta": 0.12, "max_steps": 40, "far": 50.0}
    path = str(tmp_path / "mass_scene.json")
    from bendy_tpu.scene import save_scene

    save_scene(path, scene)
    shot = str(tmp_path / "out.png")
    rc = cli.main([
        "--scene", path, "--screenshot", shot, "--width", "8", "--height", "8",
        "--samples", "2", "--subsample", "1", "--geo-eta", "0.3",
    ])
    assert rc == 0
