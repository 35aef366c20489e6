"""Attention primitives: banded sliding-window and dense masked attention.

The reference implements Longformer-style sliding-chunk attention with
``as_strided`` tricks (libs/modeling/blocks.py:441-781 cross-modal,
:883-1225 self). The effective math is a *banded* attention: query ``i``
attends to keys ``j`` with ``|i - j| <= w`` (w = window_size // 2), with

- ``-inf`` outside the band / outside the sequence
  (``_mask_invalid_locations``, blocks.py:564-576),
- a finite ``-1e4`` penalty on masked (padded) key positions
  (blocks.py:749-761) — NOT ``-inf``; this matters when a window contains
  only padded keys,
- after softmax, rows whose *query-aligned* kv-mask entry is invalid are
  zeroed (the NaN guard at blocks.py:766-767).

TPU design: instead of strided chunk algebra we compute one score per relative
offset ``d in [-w, w]`` with a shifted elementwise reduce. For w=3 this is 7
fused VPU multiply-reduces over the head dim; no (T, T) materialization, no
gathers, static shapes throughout. The 1x1 q/k/v projections around it are the
MXU work. A fused Pallas kernel with identical semantics lives in
``ops/pallas/band_attention.py`` for the hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_PENALTY = -1e4  # finite penalty used by the reference for masked kv

# set True (core.runtime.setup_jax does this on TPU) to route plain banded
# attention through the fused Pallas kernel in ops/pallas/band_attention.py
USE_PALLAS = False


def shift_time(x: jnp.ndarray, d: int, axis: int = -2) -> jnp.ndarray:
    """Return y with y[..., i, :] = x[..., i+d, :], zero-filled out of range."""
    if d == 0:
        return x
    t = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    ax = axis % x.ndim
    if d > 0:
        sliced = jax.lax.slice_in_dim(x, d, t, axis=ax)
        pad[ax] = (0, d)
    else:
        sliced = jax.lax.slice_in_dim(x, 0, t + d, axis=ax)
        pad[ax] = (-d, 0)
    return jnp.pad(sliced, pad)


def band_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: jnp.ndarray,
    w_overlap: int,
    rel_pe: Optional[jnp.ndarray] = None,
    time_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Banded attention with reference masking semantics.

    Args:
      q, k, v: (B, H, T, D). q must already include the 1/sqrt(D) scale.
      kv_valid: (B, T) bool — validity of key/value positions.
      w_overlap: half window (window_size // 2).
      rel_pe: optional (H, 2w+1) additive relative position bias.
      time_weight: optional (H, 2w+1) multiplicative post-softmax weight.

    Returns: (B, H, T, D) context.
    """
    if USE_PALLAS and rel_pe is None and time_weight is None:
        from .pallas.band_attention import band_attention_fused

        return band_attention_fused(q, k, v, kv_valid, w_overlap)
    return band_attention_xla(q, k, v, kv_valid, w_overlap, rel_pe, time_weight)


def band_attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: jnp.ndarray,
    w_overlap: int,
    rel_pe: Optional[jnp.ndarray] = None,
    time_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The pure-XLA banded formulation, never dispatched to Pallas. The fused
    kernel's custom_vjp differentiates this directly (same math, no global
    flag involved)."""
    b, h, t, d_head = q.shape
    band = 2 * w_overlap + 1
    kv_pen = jnp.where(kv_valid, 0.0, NEG_PENALTY).astype(q.dtype)  # (B, T)

    scores = []
    for d in range(-w_overlap, w_overlap + 1):
        k_shift = shift_time(k, d)
        s = jnp.sum(q * k_shift, axis=-1)  # (B, H, T)
        pen = shift_time(kv_pen[..., None], d)[..., 0]  # (B, T)
        # band edges / sequence boundaries: -inf
        lo, hi = max(0, -d), t - max(0, d)
        in_range = (jnp.arange(t) >= lo) & (jnp.arange(t) < hi)
        s = s + pen[:, None, :]
        s = jnp.where(in_range[None, None, :], s, -jnp.inf)
        scores.append(s)
    att = jnp.stack(scores, axis=-1)  # (B, H, T, 2w+1)

    if rel_pe is not None:
        att = att + rel_pe[None, :, None, :]
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
    # NaN guard: zero rows whose query-aligned kv slot is masked
    att = jnp.where(kv_valid[:, None, :, None], att, 0.0)
    if time_weight is not None:
        att = att * time_weight[None, :, None, :]

    out = jnp.zeros_like(q)
    for idx, d in enumerate(range(-w_overlap, w_overlap + 1)):
        v_shift = shift_time(v, d)
        out = out + att[..., idx : idx + 1] * v_shift
    return out


def full_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Dense masked attention (MaskedMHCA / MaskedMMHCA semantics,
    blocks.py:274-313): masked keys get -inf scores, values are multiplied by
    the kv mask before aggregation.

    q: (B, H, Tq, D) pre-scaled; k, v: (B, H, Tk, D); kv_valid: (B, Tk).
    """
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    # -1e30, not -inf: for any row with >=1 valid key, exp(-1e30 - max)
    # underflows to exactly 0.0 so the result is bit-identical to the
    # reference's -inf fill; for a FULLY-masked row (a pad_batch_to pad row —
    # the reference never produces one) -inf would make both softmax and its
    # vjp NaN, poisoning the backward of every upstream parameter even though
    # the forward output is masked away. With the finite fill the row
    # softmaxes to uniform and the v-mask multiply below zeroes it.
    att = jnp.where(kv_valid[:, None, None, :], att, -1e30)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
    v = v * kv_valid[:, None, :, None].astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)
