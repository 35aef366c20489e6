"""Test config: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere in the test process.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin on this machine ignores JAX_PLATFORMS, so pin the
# default device to CPU explicitly — tests must not ride the TPU tunnel.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

# persistent compile cache so repeated test runs skip CPU recompiles
_cache = os.path.join(os.path.dirname(__file__), ".jax_test_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
