"""Fused full (non-banded) multi-head attention (Pallas/TPU) — one VMEM
residency for scores + key bias + softmax + P@V.

Built for the Emotion2Vec trunk (frontends/emotion2vec.py::AltAttention,
mirroring the reference's fairseq AltBlock attention,
audio_feature/emotion_audio/upstream/models/modules.py:240-247): 12+4 blocks
of dense self-attention over T'≈500 tokens (10 s of 50 Hz audio frames),
12 heads, d=64. The XLA lowering materializes the (B, H, T, T) f32 score
matrix in HBM per block — at the production extraction batch (48×10 s wav)
that is ~0.57 GB written + re-read per block, ~27 GB over the 12-block trunk,
which the round-4 roofline measured as the bulk of Emotion2Vec's 41 GB HBM
traffic (115 ms vs 50 ms memory light-speed). Here one (batch, head) grid
step holds q, k, v and the (T, T) scores entirely in VMEM (~2 MB at T=512)
and writes only the (T, d) attention output.

Numerics match the XLA path: q arrives pre-scaled in the compute dtype,
scores and softmax statistics in f32, the exponentials downcast to the
compute dtype for the value contraction, f32 accumulation on every matmul.
(The softmax denominator divides the (T, d) output instead of the (T, T)
probabilities — fewer f32 divisions, same value up to rounding.)

Padding contract: the wrapper pads T to a multiple of 128 (lane tiling for
the score matrix) and folds both that pad AND the caller's key padding mask
into one additive f32 key-bias row (0 = attend, -1e30 = masked). Pad QUERY
rows compute ordinary attention over the valid keys (finite outputs — no
NaN to leak into later blocks) and the caller slices them away, exactly like
the XLA path's behavior for masked keys (emotion2vec.py::AltAttention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# OPT-IN: core.runtime.setup_jax flips this on only under AVDD_FUSED_MHA=1.
# The kernel measured SLOWER than XLA at the production Emotion2Vec geometry
# (trunk 70.2 ms fused vs 64.8 — the trunk is bound by the f32 softmax VPU
# passes, which the kernel pays identically; BENCH_NOTES round 4), so the
# XLA path stays the default. frontends/emotion2vec.py consults this at
# trace time.
ENABLED = False
# Tests set this to route the same dispatch through the pallas interpreter
# on CPU (kernel semantics without TPU hardware).
INTERPRET = False
# Heads packed per grid step (0 = all): per-head work is tiny, so packing
# amortizes the per-step grid overhead; benches can override for A/Bs.
HEADS_PER_STEP = 0

_NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, hs: int):
    bias = bias_ref[0]                # (1, T)  f32 additive key bias
    # hs heads share one grid step (unrolled): per-head work is tiny
    # (~0.07 GFLOP at T=512), so one head per step would be dominated by
    # the per-step grid overhead across B*H steps
    for i in range(hs):
        q = q_ref[0, i]               # (T, d)  compute dtype, pre-scaled
        k = k_ref[0, i]               # (T, d)
        v = v_ref[0, i]               # (T, d)
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (T, T) f32
        scores = scores + bias                         # broadcast over rows
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m).astype(q.dtype)
        z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)  # >= 1
        out = jax.lax.dot_general(
            e, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (T, d) f32
        out_ref[0, i] = (out / z).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "heads_per_step"))
def _dispatch(q, k, v, bias, *, interpret: bool, heads_per_step: int = 0):
    b, h, t, d = q.shape
    hs = heads_per_step or h
    while h % hs:                     # hs must divide h
        hs -= 1
    grid_spec = pl.GridSpec(
        grid=(b, h // hs),
        in_specs=[
            pl.BlockSpec((1, hs, t, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hs, t, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hs, t, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            # per-batch key bias; head-step-invariant, so the pallas pipeline
            # skips its re-fetch between consecutive head steps
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hs, t, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, hs=hs),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        grid_spec=grid_spec,
        # head-packed blocks exceed the default 16 MiB scoped-vmem budget at
        # production geometry (hs=12, T=512: ~18 MiB with double-buffered
        # pipeline blocks); v5e VMEM is 128 MiB — give the kernel headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, bias)


def full_mha(q, k, v, padding_mask=None, *, interpret: bool = False,
             heads_per_step: int = 0):
    """softmax(q @ k^T + key_bias) @ v with everything per-(batch, head)
    VMEM-resident.

    q, k, v: (B, H, T, d), q already scaled by d**-0.5 (the caller's
    convention, matching the reference's ``q * self.scale``).
    padding_mask: optional (B, T) bool, True = masked key (fairseq
    convention). Returns (B, H, T, d) in q.dtype.
    """
    b, h, t, d = q.shape
    tp = -(-t // 128) * 128
    if padding_mask is not None:
        bias = jnp.where(padding_mask, _NEG, 0.0).astype(jnp.float32)
    else:
        bias = jnp.zeros((b, t), jnp.float32)
    if tp != t:
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        bias = jnp.pad(bias, ((0, 0), (0, tp - t)), constant_values=_NEG)
    out = _dispatch(q, k, v, bias[:, None, :], interpret=interpret,
                    heads_per_step=heads_per_step or HEADS_PER_STEP)
    return out[:, :, :t]
