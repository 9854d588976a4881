"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Tests never touch the real TPU; multi-chip sharding is validated on virtual
CPU devices (the driver separately dry-run-compiles the multichip path).
"""
import os

# Force-override: the session environment pins JAX_PLATFORMS to the TPU
# platform; tests must run on virtual CPU devices regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
# Keep test processes off the TPU relay entirely (sitecustomize registers the
# TPU plugin whenever PALLAS_AXON_POOL_IPS is set, which can disturb a
# concurrently running TPU job).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start; pin it back to CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, "expected the 8-device virtual CPU mesh"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
