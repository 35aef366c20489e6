#!/usr/bin/env python
"""A/B: whole-MultiscaleBlock Pallas kernel (ops/pallas/mvit_block.py) vs
the XLA path on the production video-encoder geometry (mvit_v2_b, one
512-frame 96x96 chunk, bf16) — the round-4 bisection's standing target
(stage 3/4: ~11.5 ms/chunk vs a ~1.5 ms floor).

Run on the TPU; uses the hoist-proof chained-K harness of bench_frontends.
"""

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends import mvit
from audio_visual_deepfake_detection_tpu.ops.pallas import mvit_block
from bench_frontends import time_fwd


def main(args):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.random((args.chunks, args.chunk, 96, 96, 3)), jnp.float32)
    d = jnp.dtype(args.dtype)
    model = getattr(mvit, args.model)(
        out_dim=256, temporal_size=args.chunk, dtype=d)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), frames[:1, :4])

    def hybrid(p, x):
        return mvit.hybrid_apply(model, p, x,
                                 sequential_patch=args.seq_patch,
                                 batched_back=args.batched_back)

    apply_fn = hybrid if args.hybrid else model.apply
    for enabled in ([True, False] if args.ab else [mvit_block.ENABLED]):
        mvit_block.ENABLED = enabled
        sec = time_fwd(apply_fn, params, frames, k=args.k)
        per_chunk = sec / args.chunks
        print(f"kernel={'ON ' if enabled else 'OFF'} chunks={args.chunks} "
              f"hybrid={args.hybrid} seq_patch={args.seq_patch} "
              f"batched_back={args.batched_back}: "
              f"{per_chunk * 1e3:8.2f} ms/chunk "
              f"({args.chunk / per_chunk:8.0f} frames/s)", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="mvit_v2_b")
    p.add_argument("--chunk", type=int, default=512)
    p.add_argument("--chunks", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--ab", action="store_true", help="run kernel ON then OFF")
    p.add_argument("--hybrid", action="store_true",
                   help="use hybrid_apply instead of the plain batched apply")
    p.add_argument("--seq-patch", action="store_true")
    p.add_argument("--batched-back", action="store_true")
    main(p.parse_args())
