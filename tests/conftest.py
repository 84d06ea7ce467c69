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

# The axon TPU PJRT plugin registers itself even when JAX_PLATFORMS=cpu
# is set, and becomes the default backend — which would silently run the
# "float64" conformance tests at TPU f32 precision.  Pin dispatch to the
# host CPU explicitly.
jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices():
    return jax.devices("cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "realdata: published-catalog acceptance tests; need the .mat "
        "artifacts and SDSS spectra (see tests/test_realdata.py)",
    )
    config.addinivalue_line(
        "markers",
        "slow: survey-scale accuracy gates (minutes on the CPU suite; "
        "scripts/accuracy_gates.py runs the full-scale version)",
    )
