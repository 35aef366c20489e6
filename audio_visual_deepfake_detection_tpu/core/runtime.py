"""Process-level runtime setup: persistent compilation cache, dtype policy."""

from __future__ import annotations

import os


def init_distributed() -> tuple[int, int]:
    """Multi-host (DCN) wiring: initialize the JAX distributed runtime and
    return (process_index, process_count).

    The reference has NO distributed backend (SURVEY §2.3 — its only
    scale-out is manual shard files merged by a notebook); here multi-host is
    the same SPMD mesh extended over DCN. Three modes:

    - ``AVDD_COORDINATOR=host:port`` + ``AVDD_NUM_PROCESSES`` +
      ``AVDD_PROCESS_ID``: explicit wiring (works on CPU too — jaxlib's Gloo
      collectives — which is how tests/test_multihost.py drives the real
      CLIs as 2 host processes),
    - ``AVDD_AUTO_DISTRIBUTED=1``: ``jax.distributed.initialize()`` with
      TPU-pod auto-detection,
    - neither set: single-process, returns (0, 1) without touching the
      distributed runtime.
    """
    import jax

    coord = os.environ.get("AVDD_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["AVDD_NUM_PROCESSES"]),
            process_id=int(os.environ["AVDD_PROCESS_ID"]))
    elif os.environ.get("AVDD_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()
    else:
        return 0, 1
    return jax.process_index(), jax.process_count()


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (first TPU compile of the full
    localizer is expensive; the cache makes reruns near-instant)."""
    import jax

    cache = cache_dir or os.environ.get(
        "AVDD_JAX_CACHE", os.path.join(os.path.expanduser("~"), ".avdd_jax_cache"))
    # scope CPU-backend runs to a per-machine subdir: XLA:CPU AOT executables
    # encode the build host's CPU features, and loading them on a different
    # host spews machine-feature warnings (and risks SIGILL) — seen when a
    # cache written by one runner is reused by another. TPU entries stay in
    # the base dir (device-keyed already; keeps the warm cache warm).
    if (os.environ.get("AVDD_FORCE_CPU") == "1"
            or os.environ.get("JAX_PLATFORMS", "").startswith("cpu")):
        import hashlib
        import platform

        # key by the actual CPU feature set: machines can share an arch and
        # kernel release yet differ in ISA extensions, and XLA:CPU AOT
        # executables are feature-exact (mismatches spew loader warnings and
        # risk SIGILL)
        feats = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        feats = " ".join(sorted(line.split(":", 1)[1].split()))
                        break
        except OSError:
            pass
        key = hashlib.sha1(feats.encode()).hexdigest()[:12]
        cache = os.path.join(cache, f"cpu-{platform.machine()}-{key}")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # numerics tripwire (debug runs): AVDD_DEBUG_NANS=1 makes every jit
    # re-run in eager on a NaN/Inf output and raise at the producing op —
    # the TPU-side analogue of the reference's
    # torch.use_deterministic_algorithms diagnosis posture
    # (train_utils.py:22-40). Costs a device sync per op; never default-on.
    if os.environ.get("AVDD_DEBUG_NANS") == "1":
        jax.config.update("jax_debug_nans", True)

    # AVDD_FORCE_CPU=1 pins everything to host CPU (the axon TPU plugin
    # ignores the JAX_PLATFORMS env var, so an explicit escape hatch is
    # needed). Restrict the platform via jax.config BEFORE any backend
    # initializes: touching jax.devices() would initialize every backend,
    # including the TPU plugin — which dials the tunnel and HANGS the
    # process whenever the tunnel is down or the chip is claimed.
    if os.environ.get("AVDD_FORCE_CPU") == "1":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            # backends already initialized (caller used jax first);
            # fall back to pinning the default device
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
        return

    # Pallas banded attention (AVDD_USE_PALLAS=1 to enable). Off by default:
    # measured SLOWER than the XLA shift formulation on v5e (B=256 forward
    # 215 ms vs 179 ms) — the (B*H,)-grid programs run sequentially on the
    # single tensor core and their per-program work is tiny, so grid overhead
    # dominates. Kept as an opt-in for future multi-row tiling work.
    if jax.default_backend() == "tpu" and os.environ.get("AVDD_USE_PALLAS", "0") == "1":
        from ..ops import attention

        attention.USE_PALLAS = True

    # Fused transformer-block kernel (ops/pallas/fused_block.py) — default ON
    # for TPU eval paths (AVDD_FUSED_BLOCK=0 to disable): one VMEM residency
    # per block instead of ~2.7 GB of HBM fusion traffic per full-T block.
    if jax.default_backend() == "tpu" and os.environ.get("AVDD_FUSED_BLOCK", "1") == "1":
        from ..ops.pallas import fused_block

        fused_block.ENABLED = True
        # training-path dispatch is opt-in: measured slower than the
        # standard remat path at production shapes (see fused_block.py)
        if os.environ.get("AVDD_FUSED_TRAIN", "0") == "1":
            fused_block.TRAIN_ENABLED = True

    # Fused MViT pooled-attention core (ops/pallas/mvit_attention.py) —
    # default ON (AVDD_FUSED_MVIT=0 disables): scores + rel-pos band +
    # softmax + P@V + residual in one VMEM residency per q-tile. Round 4
    # measured it a WASH when it covered every stage (24 kernel shapes,
    # ~10 min cold compile); with the whole-block kernel
    # (ops/pallas/mvit_block.py) owning stages 3/4, this one now applies
    # only to the wide-grid stages 1/2 where it WINS: hybrid 16-chunk
    # forward 16.25 -> 15.48 ms/chunk (round 5), at 2 kernel shapes.
    if jax.default_backend() == "tpu" and os.environ.get("AVDD_FUSED_MVIT", "1") == "1":
        from ..ops.pallas import mvit_attention

        mvit_attention.ENABLED = True

    # Whole-MultiscaleBlock fused kernel for the MViT stages 3/4
    # (ops/pallas/mvit_block.py) — default ON for TPU
    # (AVDD_FUSED_MVIT_BLOCK=0 disables): one VMEM residency per chunk per
    # block instead of ~15 small XLA fusions. Measured round 5 (mvit_v2_b,
    # bf16, v5e): full forward 23.3 -> 16.3 ms/chunk (hybrid, 16 chunks);
    # driver e2e 38.8 -> 51.8 videos/s. Two kernel shapes cover all 17
    # eligible stage-3/4 blocks; stage 2 is gated off (MAX_SPATIAL).
    if jax.default_backend() == "tpu" and os.environ.get(
            "AVDD_FUSED_MVIT_BLOCK", "1") == "1":
        from ..ops.pallas import mvit_block

        mvit_block.ENABLED = True

    # Fused MViT patch-embed kernel (ops/pallas/patch_embed.py) — default
    # ON for TPU (AVDD_FUSED_PATCH=0 disables): the stride-12 unfolds
    # become VMEM-resident matmuls, removing the ~2.45 GB of HBM unfold
    # temps the XLA path pays per 512-frame chunk (round-5 bisection).
    if jax.default_backend() == "tpu" and os.environ.get(
            "AVDD_FUSED_PATCH", "1") == "1":
        from ..ops.pallas import patch_embed

        patch_embed.ENABLED = True

    # Fused Emotion2Vec conv feature extractor
    # (ops/pallas/conv_extractor.py) — default ON for TPU
    # (AVDD_FUSED_EMO_CONV=0 disables): the whole 7-layer Conv1d+LN+GELU
    # stack in one VMEM residency per time tile. Measured round 5 at the
    # production workload (48 x 10 s wav, bf16): extractor 45.2 -> 33.3 ms,
    # full Emotion2Vec 115.9 -> 105.5 ms (all XLA-level rewrites had
    # measured negative — round-4 BENCH_NOTES).
    if jax.default_backend() == "tpu" and os.environ.get(
            "AVDD_FUSED_EMO_CONV", "1") == "1":
        from ..ops.pallas import conv_extractor

        conv_extractor.ENABLED = True

    # Fused full-MHA kernel for the Emotion2Vec trunk
    # (ops/pallas/full_attention.py) — OPT-IN (AVDD_FUSED_MHA=1): measured
    # SLOWER than XLA at production geometry (12-block trunk 70.2 ms fused
    # vs 64.8 XLA, any head packing — BENCH_NOTES round 4). The trunk is
    # bound by the f32 softmax/exp VPU passes over the (B, H, T, T) scores,
    # which the kernel pays identically; removing the score HBM round-trip
    # bought nothing because XLA's fusion already kept it off the critical
    # path. Note the kernel is non-flash — it holds the full (T, T) f32
    # score tile in VMEM per head step, so it has its own T ceiling
    # (~2-3k rows under the scoped-VMEM budget); k-dimension tiling would be
    # needed before it could serve genuinely long-T geometries.
    if jax.default_backend() == "tpu" and os.environ.get("AVDD_FUSED_MHA", "0") == "1":
        from ..ops.pallas import full_attention

        full_attention.ENABLED = True
