"""Test config: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere in the test process.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin on this machine ignores the JAX_PLATFORMS env var (and
# touching jax.devices() initializes EVERY backend, dialing the TPU tunnel —
# which hangs the whole suite when the tunnel is down). Restricting the
# platform via jax.config before any backend init keeps tests CPU-only and
# tunnel-independent.
jax.config.update("jax_platforms", "cpu")

# persistent compile cache so repeated test runs skip CPU recompiles —
# keyed by the CPU feature set (XLA:CPU AOT executables are feature-exact;
# reusing another machine's entries warns and risks SIGILL)
import hashlib
import platform

_feats = ""
try:
    with open("/proc/cpuinfo") as _f:
        for _line in _f:
            if _line.startswith("flags"):
                _feats = " ".join(sorted(_line.split(":", 1)[1].split()))
                break
except OSError:
    pass
_cache = os.path.join(
    os.path.dirname(__file__), ".jax_test_cache",
    f"cpu-{platform.machine()}-{hashlib.sha1(_feats.encode()).hexdigest()[:12]}")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

# Slow tier: torch-oracle goldens, subprocess CLI drives, end-to-end sweeps,
# and the heavy train-step compiles. The fast parity core (`-m "not slow"`)
# is the cheap regression gate; run the full suite before committing
# kernel/meta-arch changes.
SLOW_MODULES = {
    "test_cli",
    "test_convergence",
    "test_e2e",
    "test_e2e_media",
    "test_emotion2vec_block",
    "test_emotion2vec_full",
    "test_frontends",
    "test_frontends_external",
    "test_fused_block",
    "test_multihost",
    "test_mvit_golden",
    "test_online_inference",
    "test_online_train",
    "test_parity_e2e",
    "test_service",
    "test_train",
    "test_varlen_eval",
    "test_video_frontend",
}


# Individually-slow tests inside otherwise-fast modules (each is a >80 s
# train-step-sized compile on this CPU; their coverage is duplicated in the
# slow tier by test_train / test_preempt's other cases). Demoting them keeps
# the fast gate reliably under ~10 min even on a cold compile cache.
SLOW_ITEMS = {
    "test_preempt_resume_matches_uninterrupted_run",
    "test_losses_finite_and_grad",
    "test_masked_positions_produce_masked_outputs",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in SLOW_MODULES
                or item.originalname in SLOW_ITEMS):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
