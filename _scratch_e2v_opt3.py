#!/usr/bin/env python
"""Round-3 A/B with temp-memory guard: trunk fused/pad, conv hybrid forms."""
from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

import time
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
    AltBlock, ConvFeatureExtractor, CONV_SPEC)
from audio_visual_deepfake_detection_tpu.ops.pallas import (
    full_attention as fmha)

K = 16
B, L = 48, 160000
DT = jnp.bfloat16


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
    try:
        return _bench(name, model, x)
    except Exception as e:
        print(f"{name:36s} FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def _bench(name, model, x):
    p = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    run = chained(model.apply, K)
    comp = run.lower(p, x).compile()
    temp = comp.memory_analysis().temp_size_in_bytes / 1e9
    if temp > 11.0:
        print(f"{name:36s} SKIP (temp {temp:.1f} GB)", flush=True)
        return None
    np.asarray(comp(p, x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(comp(p, x))
        ts.append(time.perf_counter() - t0)
    ms = sorted(ts)[1] / K * 1000
    print(f"{name:36s} {ms:8.2f} ms   (temp {temp:.1f} GB)", flush=True)
    return ms


def lngelu(x, name):
    x = nn.LayerNorm(epsilon=1e-5, dtype=DT, name=name)(x)
    return jax.nn.gelu(x, approximate=False)


class HybridExtractor(nn.Module):
    """L0 as nn.Conv; layers 1-6 pair-folded into big-contraction matmuls."""
    @nn.compact
    def __call__(self, wav):
        x = wav[..., None]
        x = nn.Conv(512, (10,), strides=(5,), padding="VALID", use_bias=False,
                    dtype=DT, name="conv_0")(x)
        x = lngelu(x, "ln_0")
        for i, (dim, k, s) in enumerate(CONV_SPEC[1:], start=1):
            cin = x.shape[-1]
            kern = self.param(f"k_{i}", nn.initializers.lecun_normal(),
                              (k, cin, dim)).astype(DT)
            b, t, _ = x.shape
            t_out = (t - k) // 2 + 1
            x2 = x[:, :t // 2 * 2].reshape(b, t // 2, 2 * cin)
            wa = kern[:2].reshape(2 * cin, dim)
            f32 = dict(preferred_element_type=jnp.float32)
            dn = (((2,), (0,)), ((), ()))
            y = jax.lax.dot_general(x2[:, :t_out], wa, dn, **f32)
            if k == 3:
                xb = x2[:, 1:t_out + 1, :cin]
                if xb.shape[1] < t_out:
                    xb = jnp.pad(xb, ((0, 0), (0, t_out - xb.shape[1]), (0, 0)))
                y = y + jax.lax.dot_general(xb, kern[2], dn, **f32)
            x = lngelu(y.astype(DT), f"ln_{i}")
        return x


class Trunk(nn.Module):
    n: int = 12
    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            x = AltBlock(768, 12, 4.0, 1e-6, dtype=DT, name=f"b_{i}")(x)
        return x


rng = np.random.default_rng(0)
wav = jnp.asarray(rng.standard_normal((B, L)) * 0.1, jnp.float32)
tok499 = jnp.asarray(rng.standard_normal((B, 499, 768)), jnp.float32)
tok512 = jnp.asarray(rng.standard_normal((B, 512, 768)), jnp.float32)

fmha.ENABLED = True
bench("trunk12 fused T=499 packed12", Trunk(), tok499)
fmha.HEADS_PER_STEP = 6
bench("trunk12 fused T=499 hs=6", Trunk(), tok499)
fmha.HEADS_PER_STEP = 1
bench("trunk12 fused T=499 hs=1", Trunk(), tok499)
fmha.HEADS_PER_STEP = 0
fmha.ENABLED = False
bench("trunk12 XLA T=499", Trunk(), tok499)
bench("trunk12 XLA T=512", Trunk(), tok512)
bench("extractor hybrid pair-fold", HybridExtractor(), wav)
bench("extractor orig nn.Conv", ConvFeatureExtractor(dtype=DT), wav)
