"""Material shading unit tests against closed forms.

Each test constructs a controlled hit and checks the sampled scatter
directions / weights against the reference's formulas
(``src/scene/data/material.rs``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bendy_tpu.ops.intersect import nearest_hit
from bendy_tpu.ops.materials import shade_surface
from bendy_tpu.scene import Data, Material, Object, ObjectFlags, Scene, Sphere, compile_scene
from bendy_tpu.scene.graph import Rect
from bendy_tpu.utils.rng import lane_uniforms, render_key
from bendy_tpu.utils.v3 import V3


def floor_scene(mat: Material):
    """A big floor rect of the given material + a small ceiling light."""
    scene = Scene()
    m = scene.add_data(Data(mat))
    light = scene.add_data(Data(Material.emissive((1, 1, 1), 10.0)))
    scene.add_object(Object(Rect.from_edges(m, [50, 0, 0], [0, 0, -50])).with_translation([0, 0, 0]))
    scene.add_object(
        Object(Rect.from_edges(light, [0.5, 0, 0], [0, 0, 0.5]))
        .with_translation([0, 5.0, 0])
        .with_flags(ObjectFlags.LIGHT)
    )
    return compile_scene(scene)


def shade_at(scn, mat_kind_check=None, B=4096, seed=3):
    """Shade B lanes hitting the floor straight down from (0.3, 1, -0.2)."""
    org = V3(jnp.full(B, 0.3), jnp.full(B, 1.0), jnp.full(B, -0.2))
    d = V3(jnp.zeros(B), jnp.full(B, -1.0), jnp.zeros(B))
    hit = nearest_hit(org, d, jnp.full(B, 0.01), jnp.full(B, 1000.0), scn)
    assert bool(hit.valid[0])
    key = render_key(jnp.uint32(seed), jnp.uint32(0))
    u = lane_uniforms(key, jnp.arange(B, dtype=jnp.uint32), 0, 8)
    return hit, d, shade_surface(d, hit, scn, u, 0.01, 1000.0)


class TestMetallic:
    def test_perfect_mirror(self):
        """roughness 0: exact reflection, weight = albedo (pdf == 1,
        ``material.rs:231-239,305``)."""
        scn = floor_scene(Material.metallic((0.7, 0.6, 0.5), 0.0))
        hit, d, sh = shade_at(scn)
        assert bool(sh.scatter.all())
        np.testing.assert_allclose(np.asarray(sh.direction.y), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sh.weight.x), 0.7, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sh.weight.z), 0.5, atol=1e-6)

    def test_fuzz_spread_scales_with_roughness(self):
        a = floor_scene(Material.metallic((1, 1, 1), 0.05))
        b = floor_scene(Material.metallic((1, 1, 1), 0.5))
        _, _, sa = shade_at(a)
        _, _, sb = shade_at(b)
        spread_a = float(np.std(np.asarray(sa.direction.x)))
        spread_b = float(np.std(np.asarray(sb.direction.x)))
        assert spread_b > 3 * spread_a > 0


class TestGlass:
    def test_normal_incidence_split(self):
        """At normal incidence, reflect with prob r0 = ((1-ior)/(1+ior))²
        (``material.rs:253``, Schlick)."""
        scn = floor_scene(Material.glass((1, 1, 1), 0.0, 1.5))
        hit, d, sh = shade_at(scn, B=1 << 16)
        dy = np.asarray(sh.direction.y)
        frac_reflected = (dy > 0).mean()
        ior = 1 / 1.5
        r0 = ((1 - ior) / (1 + ior)) ** 2  # = 0.04
        assert frac_reflected == pytest.approx(r0, abs=0.005)
        # refracted rays continue straight at normal incidence
        np.testing.assert_allclose(dy[dy < 0], -1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sh.weight.x), 1.0, atol=1e-6)

    def test_total_internal_reflection(self):
        """From inside glass beyond the critical angle every lane reflects."""
        scene = Scene()
        m = scene.add_data(Data(Material.glass((1, 1, 1), 0.0, 1.5)))
        light = scene.add_data(Data(Material.emissive((1, 1, 1), 1.0)))
        scene.add_object(Object(Sphere(material=m, radius=1.0)).with_translation([0, 0, 0]))
        scene.add_object(
            Object(Sphere(material=light, radius=0.1)).with_translation([0, 50, 0]).with_flags(
                ObjectFlags.LIGHT
            )
        )
        scn = compile_scene(scene)
        B = 1024
        # chord ray from (0.8, 0, 0) going +y: incidence sine = impact
        # parameter 0.8 -> ~53 deg > critical angle asin(1/1.5) ~ 41.8 deg
        d = V3(jnp.zeros(B), jnp.full(B, 1.0), jnp.zeros(B))
        org = V3(jnp.full(B, 0.8), jnp.zeros(B), jnp.zeros(B))
        hit = nearest_hit(org, d, jnp.full(B, 0.01), jnp.full(B, 1000.0), scn)
        key = render_key(jnp.uint32(1), jnp.uint32(0))
        u = lane_uniforms(key, jnp.arange(B, dtype=jnp.uint32), 0, 8)
        sh = shade_surface(d, hit, scn, u, 0.01, 1000.0)
        # all reflected back inside: direction has negative component along
        # the outward surface normal (= hit position direction)
        ndot = np.asarray(sh.direction.dot(hit.position))
        assert (ndot < 0).all()


class TestEmissiveFlat:
    def test_emissive_terminates_with_intensity(self):
        scn = floor_scene(Material.emissive((0.5, 1.0, 0.25), 4.0))
        # overwrite: the floor itself is the emissive here; trace to it
        hit, d, sh = shade_at(scn)
        assert not bool(np.asarray(sh.scatter)[np.asarray(hit.mtype) == 4].any())
        np.testing.assert_allclose(np.asarray(sh.emitted.x), 2.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sh.emitted.y), 4.0, atol=1e-6)

    def test_flat_terminates_with_albedo(self):
        scn = floor_scene(Material.flat((0.2, 0.3, 0.4)))
        hit, d, sh = shade_at(scn)
        assert not bool(np.asarray(sh.scatter).any())
        np.testing.assert_allclose(np.asarray(sh.emitted.z), 0.4, atol=1e-6)


class TestDiffuse:
    def test_energy_conservation_mean(self):
        """E[weight] over the mixture equals albedo·E[pdf_cos/pdf_mix];
        with a small far light the mixture is near-cosine and the mean
        weight approaches the albedo."""
        scn = floor_scene(Material.diffuse((0.6, 0.6, 0.6), 1.0))
        hit, d, sh = shade_at(scn, B=1 << 16)
        w = np.asarray(sh.weight.x)[np.asarray(sh.scatter)]
        assert w.mean() == pytest.approx(0.6, abs=0.02)

    def test_scatter_directions_above_surface_for_cosine_branch(self):
        scn = floor_scene(Material.diffuse((0.6, 0.6, 0.6), 1.0))
        hit, d, sh = shade_at(scn, B=1 << 14)
        # every cosine-branch direction has d·n > 0; light-branch ones point
        # at the ceiling light (also up). All up, within fp noise.
        dy = np.asarray(sh.direction.y)[np.asarray(sh.scatter)]
        assert (dy > -1e-4).all()
