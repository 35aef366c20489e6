"""Random-window feature truncation (reference: libs/datasets/data_utils.py:45-134).

Training-time augmentation: sample a window of length max_seq_len (or a random
crop_ratio fraction of the sequence) such that at least one action survives
with intersection ratio >= trunc_thresh. Determinism: takes a
``numpy.random.Generator`` instead of global random state.

Split into a pure window draw (:func:`draw_truncate_window` — segments + rng
only, no feature array) and the array crop, so the device-resample train path
can draw the exact same windows (same rng call order -> bit-identical to the
host path) while the feature crop itself runs on the TPU fused with the
resample (ops/resample.py::linear_resample_dynamic ``start``/``out_valid``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def draw_truncate_window(
    feat_len: int,
    segments: np.ndarray,       # (N, 2) feature-grid coords
    labels: np.ndarray,         # (N,)
    max_seq_len: int,
    trunc_thresh: float,
    offset: float,
    rng: np.random.Generator,
    crop_ratio: Optional[Tuple[float, float]] = None,
    max_num_trials: int = 200,
    has_action: bool = True,
    no_trunc: bool = False,
):
    """Draw the random crop window and transform the GT into it.

    Returns ``(st, win_len, segments, labels)`` where rows ``[st, st+win_len)``
    of the feature grid survive. ``win_len == feat_len`` and ``st == 0`` mean
    no crop. RNG call order matches the reference exactly
    (data_utils.py:58-107).
    """
    if feat_len <= max_seq_len:
        if crop_ratio is None:
            return 0, feat_len, segments, labels
        max_seq_len = int(rng.integers(
            max(round(crop_ratio[0] * feat_len), 1),
            min(round(crop_ratio[1] * feat_len), feat_len) + 1,
        ))
        if feat_len == max_seq_len:
            return 0, feat_len, segments, labels

    st = 0
    left = right = keep = None
    for _ in range(max_num_trials):
        st = int(rng.integers(0, feat_len - max_seq_len + 1))
        ed = st + max_seq_len
        left = np.maximum(st - offset, segments[:, 0])
        right = np.minimum(ed + offset, segments[:, 1])
        inter = np.clip(right - left, 0.0, None)
        area = np.abs(segments[:, 1] - segments[:, 0])
        ratio = inter / area
        keep = ratio >= trunc_thresh
        if no_trunc:
            trunc_any = (ratio > 0.0) & (ratio < 1.0)
            if keep.sum() > 0 and trunc_any.sum() == 0:
                break
        elif has_action:
            if keep.sum() > 0:
                break
        else:
            break

    new_segments = np.stack([left[keep], right[keep]], axis=1) - st
    return st, max_seq_len, new_segments.astype(np.float32), labels[keep]


def truncate_feats(
    feats: np.ndarray,          # (T, C)
    segments: np.ndarray,       # (N, 2) feature-grid coords
    labels: np.ndarray,         # (N,)
    max_seq_len: int,
    trunc_thresh: float,
    offset: float,
    rng: np.random.Generator,
    crop_ratio: Optional[Tuple[float, float]] = None,
    max_num_trials: int = 200,
    has_action: bool = True,
    no_trunc: bool = False,
):
    """Returns (feats, segments, labels) after the random window crop."""
    st, win_len, segments, labels = draw_truncate_window(
        feats.shape[0], segments, labels, max_seq_len, trunc_thresh, offset,
        rng, crop_ratio, max_num_trials, has_action, no_trunc)
    return feats[st:st + win_len], segments, labels
