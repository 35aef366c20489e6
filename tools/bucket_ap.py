#!/usr/bin/env python
"""Bucketed-TRAINED bucketed-eval mAP vs parity-trained parity-eval
(VERDICT r4 item 4): does `--video-chunk-bucketing`'s 1.8x e2e speedup cost
anything when the localizer is trained on bucketed features?

Round 4 measured bucketed features through a PARITY-trained localizer at
-2.8 avg mAP (a real feature-distribution shift: MViT's global attention
integrates the pad-token mass). The open claim was that the delta vanishes
when training features come from the SAME extraction mode. This script
settles it at full production geometry on the 12 real tinydataset mp4s:
for each mode, extract features (mvit_v2_b bf16 + BYOL-A 2048 +
Emotion2Vec 768), overfit the production localizer 600 steps on them, and
evaluate through the same-mode raw-media pipeline (decode -> frontends ->
localizer -> soft-NMS -> challenge mAP).

Run from the repo root, on the TPU, with the chip otherwise idle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

import argparse
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.data.dataset import (
    resample_concat_np)
from audio_visual_deepfake_detection_tpu.frontends import mvit
from audio_visual_deepfake_detection_tpu.frontends.pipeline import (
    FeatureExtractor)
from audio_visual_deepfake_detection_tpu.infer.decode import TestConfig
from audio_visual_deepfake_detection_tpu.models import ArchConfig
from audio_visual_deepfake_detection_tpu.pipeline import (
    MediaItem, MediaPipeline, discover_media, run_media_pipeline)
from audio_visual_deepfake_detection_tpu.train import make_optimizer
from audio_visual_deepfake_detection_tpu.train.state import (
    TrainState, build_train_step, init_model)

TINY_ROOT = "/root/reference/tinydataset"
BUCKETS = (128, 256, 384, 512)


def _cfg():
    return ArchConfig(
        variant="av_recovery_norecon", input_dim=3072, num_classes=1,
        max_seq_len=768, embd_dim=256, fpn_dim=256, head_dim=256, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.1,
        compute_dtype="bfloat16")


def _test_cfg():
    return TestConfig(
        pre_nms_thresh=0.001, pre_nms_topk=2000, iou_threshold=0.1,
        min_score=0.2, max_seg_num=100, nms_method="soft", nms_sigma=0.75,
        duration_thresh=0.001, multiclass_nms=False, voting_thresh=0.9)


def run_mode(bucketed: bool, items, gt_records, steps: int, seed: int):
    cfg = _cfg()
    extractor = FeatureExtractor(
        video_model=mvit.mvit_v2_b(out_dim=256, dtype=jnp.bfloat16),
        compute_dtype="bfloat16",
        chunk_buckets=BUCKETS if bucketed else None)
    params0, rng = init_model(cfg, 2, seed=seed)
    pipe = MediaPipeline(extractor, cfg, _test_cfg(), params0, batch_size=4)

    decoded = [pipe._decode(it) for it in items]
    samples = []
    for i in range(0, len(decoded), 4):
        samples += pipe._extract_batch(decoded[i:i + 4])

    T = cfg.max_seq_len
    max_gt = 4
    feats = np.stack([resample_concat_np(
        [np.asarray(st, np.float32) for st in s["streams"]], T)
        for s in samples])
    gt_segments = np.zeros((len(samples), max_gt, 2), np.float32)
    gt_valid = np.zeros((len(samples), max_gt), bool)
    has_gt = np.zeros((len(samples),), bool)
    for i, (s, rec) in enumerate(zip(samples, gt_records)):
        assert s["video_id"] == rec["video_id"]
        segs = rec["segments_time"]
        if segs:
            video_rows = s["streams"][0].shape[0]
            fs = float(video_rows) / T
            fps = video_rows / s["duration"]
            arr = (np.asarray(segs, np.float32) * fps - 0.5) / fs
            gt_segments[i, :len(arr)] = arr[:max_gt]
            gt_valid[i, :len(arr)] = True
            has_gt[i] = True
    batch = {k: jnp.asarray(v) for k, v in {
        "feats": feats, "mask": np.ones((len(samples), T), bool),
        "gt_segments": gt_segments,
        "gt_labels": np.zeros((len(samples), max_gt), np.int32),
        "gt_valid": gt_valid, "has_gt": has_gt,
    }.items()}

    train_cfg = {"loss_weight": 2.0, "label_smoothing": 0.0,
                 "center_sample": "radius", "center_sample_radius": 1.5,
                 "init_loss_norm": 20}
    tx, _ = make_optimizer(
        params0, {"learning_rate": 2e-3, "weight_decay": 0.0,
                  "epochs": steps, "warmup": True, "warmup_epochs": 20,
                  "schedule_type": "cosine"},
        num_iters_per_epoch=1, clip_grad_l2norm=1.0)
    state = TrainState.create(params0, tx, 20.0, rng)
    step = jax.jit(build_train_step(cfg, train_cfg), donate_argnums=0)
    for i in range(steps):
        state, losses = step(state, batch)
    final_loss = float(losses["final_loss"])

    trained = jax.device_get(state.params)
    pipe_t = MediaPipeline(extractor, cfg, _test_cfg(), trained,
                           batch_size=4)
    in_memory = [MediaItem(video_id=it.video_id, duration=it.duration,
                           frames=it.frames, wav=it.wav) for it in decoded]
    with tempfile.TemporaryDirectory() as td:
        summary, _ = run_media_pipeline(in_memory, pipe_t, td,
                                        gt_records=gt_records, verbose=False)
    return final_loss, summary


def main(args):
    items, gt_records = discover_media(
        os.path.join(TINY_ROOT, "metadata"), os.path.join(TINY_ROOT, "data"))
    for bucketed in ((False, True) if args.mode == "both"
                     else (args.mode == "bucketed",)):
        loss, summary = run_mode(bucketed, items, gt_records, args.steps,
                                 args.seed)
        name = "bucketed" if bucketed else "parity"
        print(f"{name}-trained {name}-eval: final_loss={loss:.4f} "
              f"avg_mAP={summary['average_mAP']:.2f}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="both",
                   choices=("both", "parity", "bucketed"))
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
