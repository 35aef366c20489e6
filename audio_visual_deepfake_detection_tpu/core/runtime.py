"""Process-level runtime setup: persistent compilation cache, dtype policy."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (first TPU compile of the full
    localizer is expensive; the cache makes reruns near-instant)."""
    import jax

    cache = cache_dir or os.environ.get(
        "AVDD_JAX_CACHE", os.path.join(os.path.expanduser("~"), ".avdd_jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # AVDD_FORCE_CPU=1 pins everything to host CPU (the axon TPU plugin
    # ignores JAX_PLATFORMS, so an explicit escape hatch is needed)
    if os.environ.get("AVDD_FORCE_CPU") == "1":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        return

    # fused Pallas banded attention on TPU (AVDD_USE_PALLAS=0 to disable)
    if jax.default_backend() == "tpu" and os.environ.get("AVDD_USE_PALLAS", "1") == "1":
        from ..ops import attention

        attention.USE_PALLAS = True
