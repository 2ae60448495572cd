"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip code paths (pjit/shard_map over a Mesh) are exercised in CI without
TPU hardware via XLA's host-platform device-count flag. Must be set before the
first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() >= 8, f"expected 8 virtual CPU devices, got {jax.device_count()}"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
