"""Test harness: force an 8-virtual-device CPU mesh before JAX imports.

Tests validate multi-chip sharding without TPU hardware; the driver
separately compile-checks the TPU path via ``__graft_entry__``.
"""

import os

# force (the environment may preset JAX_PLATFORMS=axon for the real TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
