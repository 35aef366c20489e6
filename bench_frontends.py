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

``--roofline`` additionally prints the XLA cost analysis of each compiled
forward (FLOPs + HBM bytes accessed) against v5e light-speed (394 TFLOP/s
bf16 / 197 f32, 819 GB/s HBM), locating each encoder on the roofline the way
the round-1 localizer analysis did.

Usage: python bench_frontends.py [--dtype float32|bfloat16|both] [--k 8]
           [--encoders byola,emotion2vec,c3d,mvit_v2_t,mvit_v2_s,mvit_v2_b]
           [--chunk 512] [--batch-frames 512] [--roofline]
"""

from __future__ import annotations

import argparse
import time

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

import numpy as np
import jax
import jax.numpy as jnp

# v5e light-speed constants (per chip)
V5E_BF16_FLOPS = 394e12
V5E_F32_FLOPS = 197e12
V5E_HBM_BPS = 819e9


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


def roofline(apply_fn, params, x, dtype: str, measured_sec: float):
    """XLA cost analysis of ONE forward -> light-speed bounds vs measured."""
    cost = jax.jit(apply_fn).lower(params, x).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = cost.get("flops", 0.0)
    bytes_acc = cost.get("bytes accessed", 0.0)
    peak = V5E_BF16_FLOPS if dtype == "bfloat16" else V5E_F32_FLOPS
    t_flops = flops / peak
    t_mem = bytes_acc / V5E_HBM_BPS
    bound = "compute" if t_flops > t_mem else "memory"
    ls = max(t_flops, t_mem)
    print(f"    roofline: {flops / 1e9:8.1f} GFLOP  {bytes_acc / 1e9:7.2f} GB"
          f"  light-speed {t_flops * 1e3:6.1f} ms compute /"
          f" {t_mem * 1e3:6.1f} ms memory -> {bound}-bound,"
          f" {100 * ls / measured_sec:5.1f}% of roofline"
          f" ({measured_sec * 1e3:.1f} ms measured)")
    return {"gflop": flops / 1e9, "gb": bytes_acc / 1e9, "bound": bound,
            "roofline_frac": ls / measured_sec}


def bench_one(name, model, example, unit_count, unit, k, args=None,
              dtype="float32"):
    params = jax.jit(model.init)(jax.random.PRNGKey(0), example)
    sec = time_fwd(model.apply, params, example, k)
    rate = unit_count / sec
    print(f"{name:<22} {sec * 1000:8.1f} ms/fwd   {rate:10.0f} {unit}")
    out = {"name": name, "ms_per_fwd": sec * 1000, "rate": rate, "unit": unit}
    if args is not None and args.roofline:
        out["roofline"] = roofline(model.apply, params, example, dtype, sec)
    return out


def main(args):
    from audio_visual_deepfake_detection_tpu.frontends import mvit
    from audio_visual_deepfake_detection_tpu.frontends.byola import AudioNTT2020
    from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
        Emotion2Vec, Emotion2VecConfig)
    from audio_visual_deepfake_detection_tpu.frontends.mel import byola_log_mel
    from audio_visual_deepfake_detection_tpu.frontends.video import C3DVideoEncoder

    which = [e.strip() for e in args.encoders.split(",") if e.strip()]
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((48, 160000)) * 0.1, jnp.float32)
    # video workload: --batch-frames total frames in --chunk-frame chunks
    # (production extraction = 512-frame chunks, extract_video_features.py:57)
    n_chunks = max(1, args.batch_frames // args.chunk)
    frames = jnp.asarray(
        rng.random((n_chunks, args.chunk, 96, 96, 3)), jnp.float32)
    n_frames = n_chunks * args.chunk

    dtypes = (["float32", "bfloat16"] if args.dtype == "both"
              else [args.dtype])
    for dt in dtypes:
        d = jnp.dtype(dt)
        print(f"--- compute dtype {dt} (48 x 10 s wav / "
              f"{n_chunks} x {args.chunk} frames) ---")

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

        if "byola" in which:
            bench_one("BYOL-A (wav->feat)", _ByolaWav(), wav, 480,
                      "audio-sec/s", args.k, args, dt)
        if "emotion2vec" in which:
            bench_one("Emotion2Vec (8+4)",
                      Emotion2Vec(Emotion2VecConfig(), dtype=d), wav, 480,
                      "audio-sec/s", args.k, args, dt)
        if "c3d" in which:
            bench_one("C3D", C3DVideoEncoder(dtype=d), frames, n_frames,
                      "frames/s", args.k, args, dt)
        for name in ("mvit_v2_t", "mvit_v2_s", "mvit_v2_b"):
            if name in which:
                model = getattr(mvit, name)(
                    out_dim=256, temporal_size=args.chunk, dtype=d)
                bench_one(f"{name} (T={args.chunk})", model, frames,
                          n_frames, "frames/s", args.k, args, dt)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="both",
                   choices=["float32", "bfloat16", "both"])
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--encoders",
                   default="byola,emotion2vec,c3d,mvit_v2_t",
                   help="comma list: byola,emotion2vec,c3d,mvit_v2_{t,s,b}")
    p.add_argument("--chunk", type=int, default=128,
                   help="frames per video chunk (production: 512)")
    p.add_argument("--batch-frames", type=int, default=512,
                   help="total frames per forward (n_chunks = total/chunk)")
    p.add_argument("--roofline", action="store_true",
                   help="print XLA cost-analysis roofline per encoder")
    main(p.parse_args())
