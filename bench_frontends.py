#!/usr/bin/env python
"""Honest device-compute throughput for the four feature frontends.

Methodology: the round-1 BENCH_NOTES frontend table used a scalar-reduced
``lax.scan`` over a loop-INVARIANT forward ("K=8 forwards per jit").
XLA hoists loop-invariant computation out of the while loop, so the K
iterations computed ONE forward and those numbers were ~K x optimistic
(verified: total time is constant in K). Here every iteration's input is
perturbed by the previous iteration's (tiny) output carry, so the chain can
neither be hoisted nor parallelized; per-forward time = total/K, a slight
UPPER bound (it still amortizes one dispatch RTT across K forwards).

Usage: python bench_frontends.py [--dtype float32|bfloat16|both] [--k 8]
"""

from __future__ import annotations

import argparse
import time

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

import numpy as np
import jax
import jax.numpy as jnp


def chained(apply_fn, k: int):
    """jit: run apply_fn k times, each input perturbed by the last carry."""

    @jax.jit
    def run(p, x):
        def body(c, _):
            o = apply_fn(p, x * (1.0 + c).astype(x.dtype))
            return jnp.sum(o[..., :1], dtype=jnp.float32) * jnp.float32(1e-30), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return c

    return run


def time_fwd(apply_fn, params, x, k: int, iters: int = 3) -> float:
    """Median seconds per forward (chained-K, includes RTT/k)."""
    run = chained(apply_fn, k)
    np.asarray(run(params, x))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(params, x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / k


def bench_one(name, model, example, unit_count, unit, k):
    params = jax.jit(model.init)(jax.random.PRNGKey(0), example)
    sec = time_fwd(model.apply, params, example, k)
    rate = unit_count / sec
    print(f"{name:<22} {sec * 1000:8.1f} ms/fwd   {rate:10.0f} {unit}")
    return {"name": name, "ms_per_fwd": sec * 1000, "rate": rate, "unit": unit}


def main(args):
    from audio_visual_deepfake_detection_tpu.frontends import mvit
    from audio_visual_deepfake_detection_tpu.frontends.byola import AudioNTT2020
    from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
        Emotion2Vec, Emotion2VecConfig)
    from audio_visual_deepfake_detection_tpu.frontends.mel import byola_log_mel
    from audio_visual_deepfake_detection_tpu.frontends.video import C3DVideoEncoder

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((48, 160000)) * 0.1, jnp.float32)
    frames = jnp.asarray(rng.random((4, 128, 96, 96, 3)), jnp.float32)

    dtypes = (["float32", "bfloat16"] if args.dtype == "both"
              else [args.dtype])
    for dt in dtypes:
        d = jnp.dtype(dt)
        print(f"--- compute dtype {dt} (48 x 10 s wav / 512 frames) ---")

        class _ByolaWav:
            """wav -> log-mel (always f32) -> encoder, as one jit."""

            def __init__(self):
                self.m = AudioNTT2020(dtype=d)

            def init(self, key, x):
                lms = jnp.swapaxes(byola_log_mel(x[:1]), -1, -2)
                return self.m.init(key, lms)

            def apply(self, p, x):
                lms = jnp.swapaxes(byola_log_mel(x), -1, -2)
                return self.m.apply(p, lms)

        bench_one("BYOL-A (wav->feat)", _ByolaWav(), wav, 480, "audio-sec/s",
                  args.k)
        bench_one("Emotion2Vec (8+4)",
                  Emotion2Vec(Emotion2VecConfig(), dtype=d), wav, 480,
                  "audio-sec/s", args.k)
        bench_one("C3D", C3DVideoEncoder(dtype=d), frames, 512, "frames/s",
                  args.k)
        bench_one("MViT-v2-t (T=128)",
                  mvit.mvit_v2_t(out_dim=256, temporal_size=128, dtype=d),
                  frames, 512, "frames/s", args.k)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="both",
                   choices=["float32", "bfloat16", "both"])
    p.add_argument("--k", type=int, default=8)
    main(p.parse_args())
