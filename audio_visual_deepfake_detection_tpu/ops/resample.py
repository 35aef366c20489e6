"""Temporal resampling primitives.

The reference pipeline aligns every feature stream (visual 256-d, BYOL-A
2048-d, Emotion2Vec 768-d) to a fixed temporal length of 768 via
``torch.nn.functional.interpolate(mode='linear', align_corners=False)``
(reference: libs/datasets/deepfake_video_audio.py:996-1018) and downsamples
boolean masks / upsamples pyramid features with ``mode='nearest'``
(reference: libs/modeling/blocks.py:51-55, backbones.py:487-490,
necks.py:78-79).

Exact coordinate conventions matter: segment boundaries flow through this
resample three times per sample, and an off-by-half-pixel shifts the AP.

TPU design note: both resamples are expressed as a static gather + lerp along
the *time* axis of a ``(..., T, C)`` tensor. Time indices are trace-time
constants whenever both lengths are static, so XLA lowers this to two
``dynamic-gather``-free takes plus fused VPU arithmetic; for the hot data path
we also provide a matmul form (``linear_resample_matrix``) that rides the MXU
and fuses with the adjacent projection.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _linear_coords(in_len: int, out_len: int):
    """Source coordinates for align_corners=False linear interpolation.

    For output index j the source coordinate is ``(j + 0.5) * scale - 0.5``
    with ``scale = in_len / out_len``, clamped to ``[0, in_len - 1]``.
    """
    # float32 throughout: torch's CPU kernel computes the source index in
    # float32, and matching its rounding keeps feature values bit-close.
    scale = np.float32(in_len) / np.float32(out_len)
    coords = (np.arange(out_len, dtype=np.float32) + np.float32(0.5)) * scale - np.float32(0.5)
    coords = np.clip(coords, 0.0, in_len - 1)
    idx0 = np.floor(coords).astype(np.int32)
    idx1 = np.minimum(idx0 + 1, in_len - 1).astype(np.int32)
    frac = (coords - idx0).astype(np.float32)
    return idx0, idx1, frac


@functools.lru_cache(maxsize=256)
def _linear_coords_cached(in_len: int, out_len: int):
    idx0, idx1, frac = _linear_coords(in_len, out_len)
    return idx0, idx1, frac


def linear_resample_time(x: jnp.ndarray, out_len: int, axis: int = -2) -> jnp.ndarray:
    """Resample ``x`` along ``axis`` to ``out_len`` samples.

    Bit-matches ``F.interpolate(x, size=out_len, mode='linear',
    align_corners=False)`` from the reference data path for float32 inputs.
    """
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    idx0, idx1, frac = _linear_coords_cached(in_len, out_len)
    x0 = jnp.take(x, jnp.asarray(idx0), axis=axis)
    x1 = jnp.take(x, jnp.asarray(idx1), axis=axis)
    frac_arr = jnp.asarray(frac, dtype=x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_len
    frac_arr = frac_arr.reshape(shape)
    # torch accumulates w0*x0 + w1*x1 — keep the same form
    return x0 * (1.0 - frac_arr) + x1 * frac_arr


@functools.lru_cache(maxsize=64)
def _linear_matrix_cached(in_len: int, out_len: int):
    idx0, idx1, frac = _linear_coords(in_len, out_len)
    mat = np.zeros((in_len, out_len), dtype=np.float32)
    rows = np.arange(out_len)
    # accumulate: idx0 and idx1 may coincide at the clamped edges
    np.add.at(mat, (idx0, rows), 1.0 - frac)
    np.add.at(mat, (idx1, rows), frac)
    return mat


def linear_resample_matrix(in_len: int, out_len: int) -> jnp.ndarray:
    """Dense ``(in_len, out_len)`` resample matrix (MXU-friendly form).

    ``einsum('...tc,to->...oc', x, M.T)`` equals :func:`linear_resample_time`.
    Used when the resample can fuse into an adjacent matmul.
    """
    return jnp.asarray(_linear_matrix_cached(in_len, out_len))


def linear_resample_dynamic(x: jnp.ndarray, in_len: jnp.ndarray,
                            out_len: int, use_matmul: bool = True,
                            resample_len: int | None = None,
                            start=None, out_valid=None) -> jnp.ndarray:
    """Per-sample dynamic-length linear resample on device.

    ``x``: (B, T_max, C) zero-padded streams; ``in_len``: (B,) valid row
    counts. Returns (B, out_len, C), matching :func:`linear_resample_time`
    (and torch ``F.interpolate(linear, align_corners=False)``) row-for-row on
    the valid prefix of each sample. Coordinate math runs in float32 exactly
    like the trace-time path, so host- and device-resampled features agree to
    float rounding.

    This moves the reference's per-sample CPU resample
    (deepfake_video_audio.py:996-1018) into the inference program. Two
    lowerings:
    - ``use_matmul=True`` (default): build the per-sample (out, T_max) lerp
      weight matrix from two one-hot comparisons and contract on the MXU —
      per-sample dynamic gathers lower terribly on TPU (measured 2.4x
      slower end-to-end), while this form costs one batched matmul.
    - ``use_matmul=False``: gather + lerp (better on CPU / tiny shapes).

    Fused crop (the training random-window truncation): with
    ``resample_len=R``, ``start`` (B,) int and ``out_valid`` (B,) int, output
    row ``j`` is row ``start+j`` of the length-``R`` resampled grid — the
    coordinate math is evaluated directly at the shifted indices, so it is
    bit-identical to resampling to ``R`` and slicing ``[start, start+out_len)``
    on the host — and rows ``>= out_valid`` are zeroed (the caller masks them).
    """
    in_len_f = in_len.astype(jnp.float32)
    r = out_len if resample_len is None else resample_len
    scale = in_len_f[:, None] / jnp.float32(r)                  # (B, 1)
    j = jnp.arange(out_len, dtype=jnp.float32)[None, :]
    if start is not None:
        j = j + start.astype(jnp.float32)[:, None]
    coords = (j + jnp.float32(0.5)) * scale - jnp.float32(0.5)  # (B, out)
    coords = jnp.clip(coords, 0.0, in_len_f[:, None] - 1.0)
    idx0 = jnp.floor(coords).astype(jnp.int32)
    idx1 = jnp.minimum(idx0 + 1, in_len[:, None].astype(jnp.int32) - 1)
    frac = (coords - idx0.astype(jnp.float32)).astype(x.dtype)

    valid = None
    if out_valid is not None:
        valid = (jnp.arange(out_len)[None, :]
                 < out_valid[:, None]).astype(x.dtype)           # (B, out)

    if use_matmul:
        iota = jnp.arange(x.shape[1], dtype=jnp.int32)
        w0 = (iota[None, None, :] == idx0[..., None]).astype(x.dtype)
        w1 = (iota[None, None, :] == idx1[..., None]).astype(x.dtype)
        w = w0 * (1.0 - frac)[..., None] + w1 * frac[..., None]
        if valid is not None:
            w = w * valid[..., None]
        return jnp.einsum("boi,bic->boc", w, x,
                          preferred_element_type=x.dtype)

    frac = frac[..., None]
    x0 = jnp.take_along_axis(x, idx0[..., None], axis=1)
    x1 = jnp.take_along_axis(x, idx1[..., None], axis=1)
    y = x0 * (1.0 - frac) + x1 * frac
    if valid is not None:
        y = y * valid[..., None]
    return y


def nearest_resample_time(x: jnp.ndarray, out_len: int, axis: int = -2) -> jnp.ndarray:
    """``F.interpolate(mode='nearest')`` parity along ``axis``.

    Torch nearest picks source index ``floor(j * in_len / out_len)``.
    Used for mask down/upsampling and FPN top-down upsampling.
    """
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    ax = axis % x.ndim
    if out_len % in_len == 0:
        # integer upsample: idx[j] = floor(j*in/out) = j // r — a pure
        # broadcast+reshape, no gather (gathers lower poorly on TPU)
        r = out_len // in_len
        y = jnp.expand_dims(x, ax + 1)
        y = jnp.broadcast_to(y, y.shape[:ax + 1] + (r,) + y.shape[ax + 2:])
        return y.reshape(x.shape[:ax] + (out_len,) + x.shape[ax + 1:])
    if in_len % out_len == 0:
        # integer downsample: idx[j] = j * r — a strided slice
        r = in_len // out_len
        idx = [slice(None)] * x.ndim
        idx[ax] = slice(0, in_len, r)
        return x[tuple(idx)]
    idx = np.floor(np.arange(out_len, dtype=np.float64) * in_len / out_len)
    idx = np.minimum(idx, in_len - 1).astype(np.int32)
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def downsample_mask(mask: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Nearest-neighbour mask resize, matching MaskedConv1D's mask propagation
    (reference: libs/modeling/blocks.py:51-55). mask: (B, T) bool."""
    return nearest_resample_time(mask, out_len, axis=-1)
