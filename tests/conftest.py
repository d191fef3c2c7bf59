"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the TPU-native analog of multi-node tests
without a cluster — SURVEY.md §4).  Env vars must be set before jax imports.
"""

import os

# force CPU even when the session env pins a TPU platform (e.g.
# JAX_PLATFORMS=axon); set LOCALDIFF_TEST_TPU=1 to run the suite on a chip.
if not os.environ.get("LOCALDIFF_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment's TPU plugin programmatically prepends itself to
# jax_platforms, overriding the env var — force CPU at config level too.
if not os.environ.get("LOCALDIFF_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: recompiles across test runs are the dominant
# cost on small hosts; cache everything, however small.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "patch"))


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
