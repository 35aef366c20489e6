"""Learning smoke: overfit a fixed tiny batch and recover the GT segments
through the full decode + NMS + evaluator chain (AP -> 1.0)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.eval import ANETdetection
from audio_visual_deepfake_detection_tpu.infer.decode import TestConfig
from audio_visual_deepfake_detection_tpu.infer.runner import build_inference_fn
from audio_visual_deepfake_detection_tpu.train import (
    TrainState, build_train_step, init_model, make_optimizer)

from test_train import TRAIN_CFG, tiny_cfg

OPT_CFG = {
    "type": "AdamW", "learning_rate": 2e-3, "weight_decay": 0.0,
    "epochs": 10, "warmup": True, "warmup_epochs": 1, "schedule_type": "cosine",
    "momentum": 0.9, "schedule_steps": [], "schedule_gamma": 0.1,
}


import dataclasses


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_overfit_recovers_segments(rng, dtype):
    cfg = dataclasses.replace(tiny_cfg(), compute_dtype=dtype)
    b, t = 2, cfg.max_seq_len
    feats = rng.standard_normal((b, t, cfg.input_dim)).astype(np.float32)
    # distinct GT windows per sample (feature-grid coords)
    gt = np.asarray([[[16.0, 40.0]], [[56.0, 88.0]]], np.float32)
    # plant a strong signal inside the fake windows so the task is learnable
    for i in range(b):
        s, e = int(gt[i, 0, 0]), int(gt[i, 0, 1])
        feats[i, s:e, :8] += 3.0

    batch = {
        "feats": feats,
        "mask": np.ones((b, t), bool),
        "gt_segments": gt,
        "gt_labels": np.zeros((b, 1), np.int64),
        "gt_valid": np.ones((b, 1), bool),
        "has_gt": np.ones((b,), bool),
    }

    params, prng = init_model(cfg, b, 0)
    tx, _ = make_optimizer(params, OPT_CFG, num_iters_per_epoch=10,
                           clip_grad_l2norm=1.0)
    state = TrainState.create(params, tx, TRAIN_CFG["init_loss_norm"], prng)
    step = jax.jit(build_train_step(cfg, TRAIN_CFG))
    for _ in range(60):
        state, losses = step(state, batch)
    assert np.isfinite(float(losses["final_loss"]))

    test_cfg = TestConfig(pre_nms_thresh=0.001, pre_nms_topk=2000,
                          iou_threshold=0.1, min_score=0.1, max_seg_num=5,
                          nms_method="soft", nms_sigma=0.75,
                          duration_thresh=0.001, multiclass_nms=False,
                          voting_thresh=0.9)
    infer_fn = build_inference_fn(cfg, test_cfg)
    fps, dur, stride = 25.0, 3.84, 1.0  # 96 grid steps @ 1.0 stride / 25 fps
    # use raw params: EMA (decay 0.999) barely moves in 60 steps
    segs, scores, cls_idxs, valid, _ = infer_fn(
        state.params, jnp.asarray(feats), jnp.asarray(batch["mask"]),
        jnp.full((b,), fps), jnp.full((b,), dur),
        jnp.full((b,), stride), jnp.full((b,), stride))
    segs, scores, valid = map(np.asarray, (segs, scores, valid))

    preds = {"video-id": [], "t-start": [], "t-end": [], "label": [], "score": []}
    gt_records = []
    for i in range(b):
        vid = f"v{i}.mp4"
        gt_sec = (gt[i] * stride + 0.5 * stride) / fps
        gt_records.append({"video_id": vid, "n_fakes": 1, "segments_time": gt_sec})
        k = valid[i]
        preds["video-id"].extend([vid] * int(k.sum()))
        preds["t-start"].extend(segs[i][k][:, 0].tolist())
        preds["t-end"].extend(segs[i][k][:, 1].tolist())
        preds["label"].extend([0] * int(k.sum()))
        preds["score"].extend(scores[i][k].tolist())
    preds = {key: np.asarray(val) for key, val in preds.items()}

    assert len(preds["score"]) >= b, "no detections after overfitting"
    ev = ANETdetection(gt_records, tiou_thresholds=np.asarray([0.5]))
    _, mAP, _ = ev.evaluate(preds)
    assert mAP[0] > 0.99, f"overfit AP@0.5 = {mAP[0]}"
