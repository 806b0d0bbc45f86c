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
