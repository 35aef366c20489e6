#!/usr/bin/env python
"""Per-stage wall-time bisection of the MViT-v2 encoder at production
geometry (one 512-frame 96x96 chunk), on the real chip.

Times jit'd prefixes of the block chain (patch embed only, through stage 1,
2, 3, full) with the chained-K hoist-proof harness from bench_frontends, and
prints the wall-time DELTA attributable to each stage plus its XLA cost
analysis. Used for the round-3/4 frontend roofline work (BENCH_NOTES).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from audio_visual_deepfake_detection_tpu.frontends import mvit as M


class Prefix(nn.Module):
    """Patch embed + the first `n_blocks` MultiscaleBlocks of an encoder."""

    enc: M.MViTVideoEncoder
    n_blocks: int

    @nn.compact
    def __call__(self, video):
        e = self.enc
        c0 = e.block_setting[0].input_channels
        x = M.PatchEmbed(c0, e.patch_kernel, e.patch_stride, e.patch_padding,
                         dtype=e.dtype, name="conv_proj")(video)
        b, t, hs, ws, ch = x.shape
        thw = (t, hs, ws)
        x = x.reshape(b, t * hs * ws, ch)
        cls_tok = self.param("class_token", nn.initializers.zeros, (1, 1, ch))
        x = M._prepend_token(x, cls_tok)
        cfg_thw = e._config_grid()
        for i, cfg in enumerate(e.block_setting[: self.n_blocks]):
            x, thw = M.MultiscaleBlock(cfg, cfg_thw, dtype=e.dtype,
                                       name=f"block_{i}")(x, thw)
            cfg_thw = tuple(s // st for s, st in zip(cfg_thw, cfg.stride_q))
        # tiny reduction so the carry chain stays cheap
        return jnp.sum(x[..., :1], dtype=jnp.float32, keepdims=True)


def timed(apply_fn, params, x, k=8, iters=3):
    @jax.jit
    def run(p, xx):
        def body(c, _):
            o = apply_fn(p, xx * (1.0 + c).astype(xx.dtype))
            return jnp.sum(o) * jnp.float32(1e-30), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return c

    np.asarray(run(params, x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(params, x))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2] / k
    cost = jax.jit(apply_fn).lower(params, x).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return med, cost.get("flops", 0.0), cost.get("bytes accessed", 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--variant", default="mvit_v2_b")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--cuts", default="")
    args = ap.parse_args()

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    enc = getattr(M, args.variant)(dtype=dt)
    blocks = [c for c in enc.block_setting]
    # stage boundaries: block index where stride_q > 1, plus 0 and end
    bounds = [0]
    for i, c in enumerate(blocks):
        if i and M._prod(c.stride_q) > 1:
            bounds.append(i)
    bounds.append(len(blocks))
    cuts = ([int(c) for c in args.cuts.split(",") if c]
            or [0] + bounds[1:])
    print(f"{args.variant} {args.dtype}: stage boundaries {bounds}, cuts {cuts}")

    rng = jax.random.PRNGKey(0)
    video = jnp.asarray(np.random.RandomState(0).rand(1, 512, 96, 96, 3),
                        jnp.float32)
    prev_t, prev_gb = 0.0, 0.0
    for n in cuts:
        mod = Prefix(enc, n)
        params = jax.jit(mod.init)(rng, video)
        t, fl, by = timed(mod.apply, params, video, k=args.k)
        print(f"  prefix n={n:2d}: {t*1e3:7.2f} ms  {fl/1e9:7.1f} GFLOP "
              f"{by/1e9:6.2f} GB   delta {1e3*(t-prev_t):7.2f} ms "
              f"{by/1e9 - prev_gb:6.2f} GB")
        prev_t, prev_gb = t, by / 1e9


if __name__ == "__main__":
    main()
