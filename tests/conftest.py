"""Test harness: force an 8-virtual-device CPU mesh.

Tests validate multi-chip sharding without TPU hardware; the driver
separately compile-checks the TPU path via ``__graft_entry__``.

The environment preloads the axon TPU plugin via sitecustomize (jax is
imported before any user code), so env vars alone are too late — we
switch the platform through jax.config after import. XLA_FLAGS still
must be set before the CPU client is instantiated, which happens on
first device use, so setting it here works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# ---------------------------------------------------------------------------
# Test tiers (VERDICT r3 weak #7: the fast suite costs 30+ min on this
# 1-core host; iteration needs a ~5-min smoke tier).
#
#   -m smoke             ~5 min: every module's cheap gates
#   -m "not slow"        ~30 min: everything but the multi-minute compiles
#   (default)            adds test_prim_grid_64's ~27-min XLA-CPU compile
#
# HEAVY lists tests measured >= ~9 s on this host (pytest --durations,
# r4 run: /tmp/pytest_full.log pattern — regenerate after adding big
# tests). Entries are (module, test-name prefix); "*" = whole module.
# Everything not slow/heavy gets the smoke marker automatically, so new
# fast tests join the smoke tier without bookkeeping.

HEAVY = {
    ("test_cadence", "test_regen_every_exact"),
    ("test_looped_sweep", "*"),
    ("test_multihost", "*"),
    ("test_geodesic", "TestDeflection"),
    ("test_geodesic", "TestImageOracle"),
    ("test_looped_masses", "test_weak_field_angle_looped"),
    ("test_looped_masses", "test_mass_cluster_matches_native_oracle"),
    ("test_looped_masses", "test_megakernel"),
    ("test_pallas", "test_megakernel"),
    ("test_parallel", "test_row_chunking_bit_identical"),
    ("test_parallel", "test_sharded_equals_single_device"),
    ("test_parallel", "test_sharded_modes_equal_single_device"),
    ("test_specialize", "test_diffuse_only_specialization_exact"),
    ("test_specialize", "test_no_diffuse_no_dof_specialization_exact"),
    ("test_render", "test_device_film_matches_host_film"),
    ("test_render", "test_deterministic_by_seed"),
    ("test_render", "test_film_sample_accounting"),
    ("test_render", "test_dense_grid_matches_native_oracle"),
    ("test_materials", "TestMetallic"),
    ("test_materials", "TestGlass"),
    ("test_materials", "TestDiffuse"),
    ("test_intersect", "TestBoxCompile"),
    ("test_wavefront_combos", "test_blackhole_cloud_matches_native_oracle"),
    ("test_wavefront_combos", "test_geodesic_plus_volume_renders"),
    ("test_affine", "TestNearestSampling"),
}

# smoke keeps at least one END-TO-END gate per subsystem even when its
# module is otherwise heavy: list exceptions here.
SMOKE_ANYWAY = {
    ("test_looped_sweep", "test_nearest_hit_looped_bit_identical"),
    ("test_looped_sweep", "test_loop_policy_derivation"),
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        cls = item.cls.__name__ if item.cls else ""

        def matches(entries):
            return any(
                m == mod and (p == "*" or item.name.startswith(p)
                              or (cls and cls.startswith(p)))
                for m, p in entries
            )

        if matches(HEAVY) and not matches(SMOKE_ANYWAY):
            item.add_marker(pytest.mark.heavy)
        elif "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
