#!/usr/bin/env python
"""In-model cumulative stage bisection for MViT-v2-b at production geometry.

Truncated encoders (first n blocks + final LN/head) measured chained-K at
chunk batch 1 and 16 — cumulative diffs give the TRUE in-model per-stage
cost (isolated-block benches over-count what XLA cross-block fusion absorbs,
round-4 notes). Stage boundaries for mvit_v2_b [2, 3, 16, 3]: n=2, 5, 21, 24.
"""
from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

import time
import numpy as np
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.mvit import (
    MViTVideoEncoder, generate_config)

K = 16
CHUNK = 512


def chained(apply_fn, k):
    @jax.jit
    def run(p, x):
        def body(c, _):
            o = apply_fn(p, x * (1.0 + c).astype(x.dtype))
            return jnp.sum(o[..., :1], dtype=jnp.float32) * jnp.float32(1e-30), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return c
    return run


def bench(name, model, x):
    p = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1, :4])
    run = chained(model.apply, K)
    np.asarray(run(p, x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(p, x))
        ts.append(time.perf_counter() - t0)
    ms = sorted(ts)[1] / K * 1000
    print(f"{name:32s} {ms:8.2f} ms", flush=True)
    return ms


full = generate_config([2, 3, 16, 3], [1, 2, 4, 8], [96, 192, 384, 768], 256)
rng = np.random.default_rng(0)
x1 = jnp.asarray(rng.random((1, CHUNK, 96, 96, 3)), jnp.float32)
x16 = jnp.asarray(rng.random((16, CHUNK, 96, 96, 3)), jnp.float32)

for b, x in (("B=1", x1), ("B=16", x16)):
    prev = 0.0
    for n, label in ((2, "stage1"), (5, "stage2"), (21, "stage3"),
                     (24, "stage4=full")):
        m = MViTVideoEncoder(tuple(full[:n]), dtype=jnp.bfloat16)
        ms = bench(f"{b} blocks[:{n}] ({label})", m, x)
        print(f"    delta vs prev: {ms - prev:8.2f} ms", flush=True)
        prev = ms
