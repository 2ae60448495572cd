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

# tests/isolated/ holds the modules that very rarely segfault the pytest
# process (jaxlib CPU-executable (de)serialization in the persistent compile
# cache / StreamPool HTTP-thread compiles; 5 observed crashes through r03,
# all in test_serving.py / test_server.py). They are excluded from normal
# collection and run in a subprocess by tests/test_isolated_modules.py so a
# crash fails ONE wrapper test (with a retry on signal-kill) instead of
# killing the whole run. Set ARTALK_ISOLATED=1 (the wrapper does) to collect
# them directly.
if os.environ.get("ARTALK_ISOLATED") != "1":
    collect_ignore = ["isolated"]


def no_persistent_compile_cache_fixture():
    """Factory for the module-scoped cache-opt-out fixture used by the
    isolated modules (use as ``_fixture = no_persistent_compile_cache_fixture()``
    at module top level).

    jaxlib's CPU-executable (de)serialization very rarely segfaults inside
    the persistent compile cache (observed in both ``get_executable_and_time``
    and ``put_executable_and_time``, twice from an HTTP handler thread).
    Setting the cache dir to None is NOT enough: jax's
    ``compilation_cache._get_cache`` initializes its module-global ``_cache``
    at most once, so once any earlier test module compiled with the cache
    enabled the dir update is ignored -- ``reset_cache()`` (private API,
    guarded below) drops the initialized object so the None dir takes effect.
    """

    def _impl():
        try:
            from jax._src import compilation_cache as cc
            reset = cc.reset_cache
        except (ImportError, AttributeError):  # private API moved/removed
            import warnings
            warnings.warn("jax._src.compilation_cache.reset_cache unavailable;"
                          " persistent-cache opt-out is a no-op")
            yield
            return
        old = jax.config.jax_compilation_cache_dir
        reset()
        jax.config.update("jax_compilation_cache_dir", None)
        yield
        jax.config.update("jax_compilation_cache_dir", old)
        reset()  # re-init lazily with the restored dir

    return pytest.fixture(autouse=True, scope="module")(_impl)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
