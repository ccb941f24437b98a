"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

This is the TPU-native analog of the reference's fake-backend testing: all
multi-chip sharding tests run against 8 virtual CPU devices
(xla_force_host_platform_device_count), so `tests/` is green without TPU
hardware while exercising the same pjit/Mesh code paths the driver dry-runs.
"""

import os

# CPU-backend runs skip the persistent XLA compilation cache: XLA's CPU AOT
# loader warns (and may SIGILL) when reloading executables whose recorded
# machine features don't match the executing host. Must precede livae_tpu
# import; a user-exported LIVAE_JAX_CACHE still wins.
os.environ.setdefault("LIVAE_JAX_CACHE", "0")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox pre-pins jax_platforms to "axon,cpu"; the env var alone is
# ignored, so force the CPU backend through the config API before any
# backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
