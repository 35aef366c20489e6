"""On-device prediction decode + postprocess.

Reference flow (av_fd_no_recon.py:709-876): per FPN level sigmoid -> pre-NMS
threshold -> top-k -> offsets*stride decode -> duration filter; host C++
soft-NMS + segment voting; grid->seconds conversion; [0, duration] clamp.

TPU-native redesign: all stages are static-shaped and batched. Thresholds
become validity flags instead of gathers, per-level top-k uses ``lax.top_k``,
and NMS/voting run on device (ops/nms.py). One jit handles a whole batch of
videos; per-video metadata (fps, duration, feat_stride) rides along as (B,)
vectors. Inference is no longer locked to batch_size=1 like the reference
(av_fd_no_recon.py:456).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..ops.nms import batched_nms


@dataclasses.dataclass(frozen=True)
class TestConfig:
    """test_cfg knobs (reference DEFAULTS libs/core/config.py:104-116)."""

    __test__ = False  # not a pytest class

    pre_nms_thresh: float = 0.001
    pre_nms_topk: int = 5000
    # 0 = off (reference behavior). >0 keeps only the K best-scored
    # candidates across all levels before the sequential soft-NMS loop —
    # a small-batch serving-latency knob (see postprocess_batch).
    nms_pre_topk: int = 0
    iou_threshold: float = 0.1
    min_score: float = 0.01
    max_seg_num: int = 1000
    nms_method: str = "soft"      # soft | hard | none
    nms_sigma: float = 0.5
    duration_thresh: float = 0.05
    multiclass_nms: bool = True
    voting_thresh: float = 0.75
    ext_score_file: str | None = None


def decode_candidates(
    out_cls: Sequence[jnp.ndarray],      # list of (B, T_i, C)
    out_offsets: Sequence[jnp.ndarray],  # list of (B, T_i, 2)
    fpn_masks: Sequence[jnp.ndarray],    # list of (B, T_i) bool
    points: Sequence[jnp.ndarray],       # list of (T_i, 4)
    cfg: TestConfig,
    num_classes: int,
):
    """Flatten per-level candidates with validity flags.

    Returns (segs (B, N, 2) in feature grid, scores (B, N), cls (B, N),
    valid (B, N)) with N = sum_i T_i * C.
    """
    segs_all, scores_all, cls_all, valid_all = [], [], [], []
    for logits, offsets, mask, pts in zip(out_cls, out_offsets, fpn_masks, points):
        b, t_i, c = logits.shape
        prob = jax.nn.sigmoid(logits) * mask[..., None].astype(logits.dtype)
        flat = prob.reshape(b, t_i * c)
        keep = flat > cfg.pre_nms_thresh
        if t_i * c > cfg.pre_nms_topk:
            # keep only the top-k by score within the level (detectron2-style)
            kth = jax.lax.top_k(flat, cfg.pre_nms_topk)[0][:, -1]
            keep = keep & (flat >= kth[:, None])

        left = pts[None, :, 0] - offsets[..., 0] * pts[None, :, 3]    # (B, T_i)
        right = pts[None, :, 0] + offsets[..., 1] * pts[None, :, 3]
        keep = keep & jnp.repeat(right - left > cfg.duration_thresh, c, axis=1)

        segs = jnp.stack([left, right], axis=-1)                       # (B, T_i, 2)
        segs_all.append(jnp.repeat(segs, c, axis=1))
        scores_all.append(flat)
        cls_all.append(jnp.tile(jnp.arange(c, dtype=jnp.int32), (b, t_i)))
        valid_all.append(keep)

    return (
        jnp.concatenate(segs_all, axis=1),
        jnp.concatenate(scores_all, axis=1),
        jnp.concatenate(cls_all, axis=1),
        jnp.concatenate(valid_all, axis=1),
    )


def postprocess_batch(
    segs: jnp.ndarray,     # (B, N, 2) feature grid
    scores: jnp.ndarray,   # (B, N)
    cls_idxs: jnp.ndarray, # (B, N)
    valid: jnp.ndarray,    # (B, N)
    fps: jnp.ndarray,          # (B,)
    duration: jnp.ndarray,     # (B,)
    feat_stride: jnp.ndarray,  # (B,)
    feat_num_frames: jnp.ndarray,  # (B,)
    cfg: TestConfig,
    num_classes: int,
):
    """NMS + voting + grid->seconds (av_fd_no_recon.py:827-876), vmapped."""

    def one(s, sc, ci, v, f, dur, stride, nframes):
        if 0 < cfg.nms_pre_topk < s.shape[0]:
            # serving-latency knob: restrict the sequential suppression loop
            # to the K best-scored candidates. Exact whenever every pick the
            # full run would make is inside the initial top-K (soft-NMS only
            # ever lowers scores, so in practice K >= ~5x max_seg_num is
            # indistinguishable); OFF by default for bit-parity with the
            # reference, which hands every candidate to the C++ NMS.
            idx = jax.lax.top_k(jnp.where(v, sc, -jnp.inf),
                                cfg.nms_pre_topk)[1]
            s, sc, ci, v = s[idx], sc[idx], ci[idx], v[idx]
        if cfg.nms_method != "none":
            s, sc, ci, v = batched_nms(
                s, sc, ci, v,
                num_classes=num_classes,
                iou_threshold=cfg.iou_threshold,
                min_score=cfg.min_score,
                max_seg_num=cfg.max_seg_num,
                use_soft_nms=(cfg.nms_method == "soft"),
                multiclass=cfg.multiclass_nms,
                sigma=cfg.nms_sigma,
                voting_thresh=cfg.voting_thresh,
            )
        else:
            k = cfg.max_seg_num
            order = jnp.argsort(jnp.where(v, sc, -1.0))[::-1][:k]
            s, sc, ci, v = s[order], sc[order], ci[order], v[order]
        # grid -> seconds, clamp to [0, duration]
        s = (s * stride + 0.5 * nframes) / f
        s = jnp.where(s <= 0.0, 0.0, s)
        s = jnp.where(s >= dur, dur, s)
        return s, sc, ci, v

    return jax.vmap(one)(segs, scores, cls_idxs, valid,
                         fps, duration, feat_stride, feat_num_frames)


def decode_and_postprocess(outputs: Dict, points, fps, duration, feat_stride,
                           feat_num_frames, cfg: TestConfig, num_classes: int):
    """Full decode pipeline from raw model outputs to final detections."""
    segs, scores, cls_idxs, valid = decode_candidates(
        outputs["out_cls"], outputs["out_offsets"], outputs["fpn_masks"],
        points, cfg, num_classes)
    return postprocess_batch(segs, scores, cls_idxs, valid, fps, duration,
                             feat_stride, feat_num_frames, cfg, num_classes)
