"""Test configuration.

Tests run on CPU with 8 virtual XLA devices (to exercise the multi-chip
sharding path without TPU hardware) and with float64 enabled so the
math kernels can be validated against scipy at full precision.
"""

import os

# must be set before jax is imported anywhere
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
