"""On-device 1-D NMS / soft-NMS / segment voting with static shapes.

The reference runs NMS on the host in C++ (libs/utils/csrc/nms_cpu.cpp) with a
data-dependent selection-sort + swap-with-last elimination, called per video
(batch size 1). TPU-native redesign: a fixed-trip ``lax.fori_loop`` over the
``max_seg_num`` output slots — each step picks the argmax among alive
candidates, records it, suppresses/decays the rest, and eliminates candidates
whose decayed score drops below ``min_score``. This reproduces the C++
ordering exactly for the first ``max_seg_num`` outputs (the only ones the
pipeline keeps, nms.py:103-190) and runs batched under ``vmap`` on device —
no host round-trip between the network and the decoder.

A bit-parity C++ oracle for tests lives in ``runtime/csrc/nms.cpp``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

AREA_EPS = 1e-6  # reference adds 1e-6 to segment areas (nms_cpu.cpp:26,77)


def _iou_1d(seg: jnp.ndarray, segs: jnp.ndarray) -> jnp.ndarray:
    """IoU of one (2,) segment vs (N, 2) segments with the reference's
    area epsilon: area = x2 - x1 + 1e-6, inter without epsilon."""
    x1 = jnp.maximum(seg[0], segs[:, 0])
    x2 = jnp.minimum(seg[1], segs[:, 1])
    inter = jnp.maximum(0.0, x2 - x1)
    area_i = seg[1] - seg[0] + AREA_EPS
    areas = segs[:, 1] - segs[:, 0] + AREA_EPS
    return inter / (area_i + areas - inter)


def soft_nms(
    segs: jnp.ndarray,        # (N, 2) float32
    scores: jnp.ndarray,      # (N,)
    valid: jnp.ndarray,       # (N,) bool — pre-filtered candidates
    max_out: int,
    iou_threshold: float = 0.1,
    sigma: float = 0.5,
    min_score: float = 0.001,
    method: str = "gaussian",  # 'gaussian' | 'linear' | 'hard'
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy (soft-)NMS. Returns (segs (K,2), scores (K,), valid (K,)) in
    selection order (scores non-increasing). Semantics match
    nms_cpu.cpp:67-160 for the first K outputs.
    """
    n = segs.shape[0]
    scores = jnp.where(valid, scores, -1.0)

    def cond(carry):
        s, _, alive, *_ = carry
        # early exit once no candidate survives — data-dependent trip count
        # (identical outputs to running all max_out slots; dead slots stay
        # zero/invalid). Under vmap each lane masks off independently.
        return (s < max_out) & jnp.any(alive)

    def body(carry):
        s, cur_scores, alive, out_segs, out_scores, out_valid = carry
        masked = jnp.where(alive, cur_scores, -1.0)
        j = jnp.argmax(masked)
        picked_ok = alive[j]
        out_segs = out_segs.at[s].set(jnp.where(picked_ok, segs[j], 0.0))
        out_scores = out_scores.at[s].set(jnp.where(picked_ok, cur_scores[j], 0.0))
        out_valid = out_valid.at[s].set(picked_ok)
        alive = alive.at[j].set(False)

        ovr = _iou_1d(segs[j], segs)
        if method == "gaussian":
            weight = jnp.exp(-(ovr * ovr) / sigma)
        elif method == "linear":
            weight = jnp.where(ovr >= iou_threshold, 1.0 - ovr, 1.0)
        else:  # hard
            weight = jnp.where(ovr >= iou_threshold, 0.0, 1.0)
        new_scores = jnp.where(alive & picked_ok, cur_scores * weight, cur_scores)
        if method == "hard":
            # vanilla NMS: suppression removes, scores stay untouched
            new_alive = alive & jnp.where(picked_ok, ovr < iou_threshold, True)
            new_scores = cur_scores
        else:
            new_alive = alive & (new_scores >= min_score)
        return s + 1, new_scores, new_alive, out_segs, out_scores, out_valid

    init = (
        jnp.zeros((), jnp.int32),
        scores,
        valid,
        jnp.zeros((max_out, 2), segs.dtype),
        jnp.zeros((max_out,), scores.dtype),
        jnp.zeros((max_out,), jnp.bool_),
    )
    _, _, _, out_segs, out_scores, out_valid = jax.lax.while_loop(cond, body, init)
    return out_segs, out_scores, out_valid


def seg_voting(
    nms_segs: jnp.ndarray,    # (K, 2) NMS survivors
    nms_valid: jnp.ndarray,   # (K,) bool
    all_segs: jnp.ndarray,    # (N, 2) all pre-NMS candidates
    all_scores: jnp.ndarray,  # (N,) original scores (0 for invalid)
    iou_threshold: float,
) -> jnp.ndarray:
    """Box-voting refinement (libs/utils/nms.py:67-101): each survivor is
    replaced by the score*iou-weighted average of all candidates with
    IoU >= threshold. (The reference computes an offset score but then uses
    the raw scores — we keep that behavior.)"""
    left = jnp.maximum(nms_segs[:, None, 0], all_segs[None, :, 0])
    right = jnp.minimum(nms_segs[:, None, 1], all_segs[None, :, 1])
    inter = jnp.maximum(right - left, 0.0)
    len_n = nms_segs[:, 1] - nms_segs[:, 0]
    len_a = all_segs[:, 1] - all_segs[:, 0]
    iou = inter / (len_n[:, None] + len_a[None, :] - inter)
    w = (iou >= iou_threshold).astype(all_scores.dtype) * all_scores[None, :] * iou
    denom = jnp.sum(w, axis=1, keepdims=True)
    refined = (w @ all_segs) / jnp.maximum(denom, 1e-12)
    return jnp.where(nms_valid[:, None], refined, nms_segs)


def batched_nms(
    segs: jnp.ndarray,       # (N, 2)
    scores: jnp.ndarray,     # (N,)
    cls_idxs: jnp.ndarray,   # (N,) int
    valid: jnp.ndarray,      # (N,) bool
    *,
    num_classes: int,
    iou_threshold: float,
    min_score: float,
    max_seg_num: int,
    use_soft_nms: bool = True,
    multiclass: bool = True,
    sigma: float = 0.5,
    voting_thresh: float = 0.75,
):
    """Fixed-shape equivalent of libs/utils/nms.py:103-190.

    Returns (segs (K,2), scores (K,), cls (K,), valid (K,)) sorted by score.
    """
    method = "gaussian" if use_soft_nms else "hard"

    def run_one(sel_valid):
        s = segs
        sc = scores
        v = sel_valid
        if not use_soft_nms:
            # NMSop pre-filters scores > min_score (nms.py:15-21)
            v = v & (sc > min_score)
        return soft_nms(s, sc, v, max_seg_num, iou_threshold, sigma, min_score, method)

    if multiclass and num_classes > 1:
        per_cls = []
        for c in range(num_classes):
            out = run_one(valid & (cls_idxs == c))
            per_cls.append(out + (jnp.full((max_seg_num,), c, cls_idxs.dtype),))
        o_segs = jnp.concatenate([p[0] for p in per_cls])
        o_scores = jnp.concatenate([p[1] for p in per_cls])
        o_valid = jnp.concatenate([p[2] for p in per_cls])
        o_cls = jnp.concatenate([p[3] for p in per_cls])
    else:
        o_segs, o_scores, o_valid = run_one(valid)
        # class-agnostic: recover the class of each pick by nearest match is
        # unnecessary — the production model has a single class
        o_cls = jnp.zeros((max_seg_num,), cls_idxs.dtype)
        if voting_thresh > 0:
            o_segs = seg_voting(o_segs, o_valid, segs,
                                jnp.where(valid, scores, 0.0), voting_thresh)

    # final sort by score desc, truncate to max_seg_num (nms.py:182-190)
    order = jnp.argsort(jnp.where(o_valid, o_scores, -1.0))[::-1][:max_seg_num]
    return o_segs[order], o_scores[order], o_cls[order], o_valid[order]
