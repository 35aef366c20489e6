"""Random-window feature truncation (reference: libs/datasets/data_utils.py:45-134).

Training-time augmentation: sample a window of length max_seq_len (or a random
crop_ratio fraction of the sequence) such that at least one action survives
with intersection ratio >= trunc_thresh. Determinism: takes a
``numpy.random.Generator`` instead of global random state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


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
    feat_len = feats.shape[0]

    if feat_len <= max_seq_len:
        if crop_ratio is None:
            return feats, segments, labels
        max_seq_len = int(rng.integers(
            max(round(crop_ratio[0] * feat_len), 1),
            min(round(crop_ratio[1] * feat_len), feat_len) + 1,
        ))
        if feat_len == max_seq_len:
            return feats, segments, labels

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

    new_feats = feats[st:st + max_seq_len]
    new_segments = np.stack([left[keep], right[keep]], axis=1) - st
    new_labels = labels[keep]
    return new_feats, new_segments.astype(np.float32), new_labels
