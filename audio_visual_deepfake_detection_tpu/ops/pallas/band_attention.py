"""Fused banded sliding-window attention kernel (Pallas/TPU).

One program per (batch x head): q/k/v tiles live in VMEM, the 2w+1 relative
offsets are unrolled as shifted VPU multiply-reduces, and softmax runs as a
streaming max/exp/sum over the offsets — no (T, 2w+1) score tensor ever
round-trips to HBM and no (T, T) matrix exists. Matches the semantics of
ops.attention.band_attention (reference LocalMaskedMHCA, blocks.py:883-1225):

- -inf outside the band / sequence (edge windows renormalize),
- finite -1e4 penalty on masked kv positions,
- post-softmax zeroing of rows whose query-aligned kv slot is masked.

At the production shape (T=768, D=64, w=3) the arithmetic is tiny; the win
over the XLA lowering is fusion: one HBM read of q/k/v, one write of out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..attention import NEG_PENALTY


def _shift_rows(x, d):
    """y[..., i, :] = x[..., i+d, :] with zero fill, along axis -2."""
    if d == 0:
        return x
    t = x.shape[-2]
    pad = [(0, 0)] * x.ndim
    if d > 0:
        pad[-2] = (0, d)
        return jnp.pad(x[..., d:, :], pad)
    pad[-2] = (-d, 0)
    return jnp.pad(x[..., :t + d, :], pad)


def _band_kernel(w_overlap, q_ref, k_ref, v_ref, pen_ref, qvalid_ref, out_ref):
    q = q_ref[...]        # (G, T, D): G batch*head rows per grid step
    k = k_ref[...]
    v = v_ref[...]
    pen = pen_ref[...]    # (G, T, 1): 0 valid, NEG_PENALTY masked
    t = q.shape[-2]

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (1, t, 1), 1)

    scores = []
    for d in range(-w_overlap, w_overlap + 1):
        k_shift = _shift_rows(k, d)
        s = jnp.sum(q * k_shift, axis=-1, keepdims=True)       # (G, T, 1)
        p = _shift_rows(pen, d)
        in_range = (row_idx + d >= 0) & (row_idx + d < t)
        scores.append(jnp.where(in_range, s + p, -jnp.inf))

    m = scores[0]
    for s in scores[1:]:
        m = jnp.maximum(m, s)
    exps = [jnp.exp(s - m) for s in scores]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e

    acc = jnp.zeros_like(q)
    for idx, d in enumerate(range(-w_overlap, w_overlap + 1)):
        acc = acc + (exps[idx] / denom) * _shift_rows(v, d)

    # NaN guard: zero rows whose query-aligned kv slot is masked
    acc = acc * qvalid_ref[...]
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("w_overlap", "interpret"))
def band_attention_pallas(
    q: jnp.ndarray,        # (B, H, T, D), pre-scaled q
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: jnp.ndarray,  # (B, T) bool
    w_overlap: int,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t, d = q.shape
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)
    pen = jnp.where(kv_valid, 0.0, NEG_PENALTY).astype(q.dtype)
    pen = jnp.repeat(pen, h, axis=0)[..., None]                # (B*H, T, 1)
    qvalid = jnp.repeat(kv_valid.astype(q.dtype), h, axis=0)[..., None]

    # grid steps run SEQUENTIALLY on the (single) tensor core, so each step
    # should carry as many rows as fit to amortize grid overhead. VMEM is
    # ~16 MB/core and the unrolled shifted copies live on the VMEM stack too:
    # per step ~4 I/O buffers + ~2(2w+1) shifted k/v copies + softmax
    # temporaries, all (G, T, D) with lanes padded to 128.
    per_row = t * max(d, 128) * q.dtype.itemsize
    footprint = per_row * (4 + 2 * (2 * w_overlap + 1) + 4)
    g = max(1, min(b * h, (12 << 20) // max(footprint, 1)))
    while (b * h) % g:
        g -= 1

    kernel = functools.partial(_band_kernel, w_overlap)
    out = pl.pallas_call(
        kernel,
        grid=((b * h) // g,),
        in_specs=[
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, pen, qvalid)
    return out.reshape(b, h, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def band_attention_fused(q, k, v, kv_valid, w_overlap):
    """Pallas forward with an XLA-path backward (the kernel itself has no
    autodiff rule; gradients come from differentiating the mathematically
    identical banded formulation in ops.attention)."""
    return band_attention_pallas(q, k, v, kv_valid, w_overlap)


def _fused_fwd(q, k, v, kv_valid, w_overlap):
    out = band_attention_pallas(q, k, v, kv_valid, w_overlap)
    return out, (q, k, v, kv_valid)


def _fused_bwd(w_overlap, residuals, g):
    from .. import attention as attn_mod

    q, k, v, kv_valid = residuals
    # the pure-XLA banded formulation (same math as the kernel); calling it
    # directly sidesteps band_attention's Pallas dispatch without touching
    # the module-global flag (which would race under concurrent tracing)
    def ref_fn(q_, k_, v_):
        return attn_mod.band_attention_xla(q_, k_, v_, kv_valid, w_overlap)

    _, vjp = jax.vjp(ref_fn, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


band_attention_fused.defvjp(_fused_fwd, _fused_bwd)
