#!/usr/bin/env python
"""Train-step throughput bench (production model, device-resident batch).

Measures the fused train program (forward + losses + backward + AdamW + EMA,
train/state.py::build_train_step) at production shapes, isolating device
compute from the tunnel by keeping the batch resident. Knobs:

  AVDD_TRAIN_BENCH_BATCH   batch size        (default 256)
  AVDD_COMPUTE_DTYPE       float32|bfloat16  (default bfloat16)
  AVDD_REMAT               1|0               (default 1)
  AVDD_REMAT_POLICY        ""|dots|dots_no_batch (default "")
  AVDD_ONLINE              1 = ragged-stream device-resample infeed

Prints one JSON line per run: {"batch", "ms_per_step", "videos_per_s", ...}.
Reference hot loop being replaced: train_utils.py:296-316.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.models import ArchConfig
from audio_visual_deepfake_detection_tpu.train import make_optimizer
from audio_visual_deepfake_detection_tpu.train.state import (
    TrainState, build_train_step, init_model)

BATCH = int(os.environ.get("AVDD_TRAIN_BENCH_BATCH", "256"))
SEQ = 768
DIM = 3072
ONLINE = os.environ.get("AVDD_ONLINE", "0") == "1"
CAPS = (960, 400, 1520)
STREAM_DIMS = (256, 2048, 768)
WARMUP = int(os.environ.get("AVDD_BENCH_WARMUP", "2"))
ITERS = int(os.environ.get("AVDD_BENCH_ITERS", "5"))


def make_batch(rng, dtype):
    n_gt = 32
    segs = np.sort(rng.uniform(0, SEQ, (BATCH, n_gt, 2)).astype(np.float32), -1)
    batch = {
        "gt_segments": segs,
        "gt_labels": np.zeros((BATCH, n_gt), np.int32),
        "gt_valid": np.arange(n_gt)[None] < rng.integers(1, 5, (BATCH, 1)),
        "has_gt": rng.random(BATCH) < 0.7,
    }
    if ONLINE:
        batch["streams"] = tuple(
            rng.standard_normal((BATCH, c, d), dtype=np.float32).astype(dtype)
            for c, d in zip(CAPS, STREAM_DIMS))
        batch["rows"] = tuple(
            np.full((BATCH,), int(c * 0.8), np.int32) for c in CAPS)
        batch["win_st"] = np.zeros((BATCH,), np.float32)
        batch["win_len"] = np.full((BATCH,), SEQ, np.int32)
    else:
        batch["feats"] = rng.standard_normal(
            (BATCH, SEQ, DIM), dtype=np.float32).astype(dtype)
        batch["mask"] = np.ones((BATCH, SEQ), bool)
    return batch


def main():
    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=DIM, num_classes=1,
        max_seq_len=SEQ, embd_dim=256, fpn_dim=256, head_dim=256, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.1,
        compute_dtype=os.environ.get("AVDD_COMPUTE_DTYPE", "bfloat16"),
        remat=os.environ.get("AVDD_REMAT", "1") == "1",
        remat_policy=os.environ.get("AVDD_REMAT_POLICY", ""),
    )
    train_cfg = {"loss_weight": 2.0, "label_smoothing": 0.1,
                 "center_sample": "radius", "center_sample_radius": 1.5,
                 "init_loss_norm": 200, "clip_grad_l2norm": 1.0}

    params, rng = init_model(cfg, BATCH, seed=0)
    tx, _ = make_optimizer(
        params, {"learning_rate": 1e-3, "weight_decay": 0.05, "epochs": 15,
                 "warmup": True, "warmup_epochs": 5, "schedule_type": "cosine"},
        num_iters_per_epoch=100, clip_grad_l2norm=1.0)
    state = TrainState.create(params, tx, 200.0, rng)
    step = jax.jit(build_train_step(cfg, train_cfg, online_resample=ONLINE),
                   donate_argnums=0)

    dtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype == "bfloat16" \
        else np.float32
    batch = make_batch(np.random.default_rng(0), dtype)
    batch = {k: (tuple(jnp.asarray(x) for x in v) if isinstance(v, tuple)
                 else jnp.asarray(v)) for k, v in batch.items()}

    t0 = time.perf_counter()
    for _ in range(WARMUP):
        state, losses = step(state, batch)
    jax.block_until_ready(losses["final_loss"])
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, losses = step(state, batch)
        float(losses["final_loss"])  # host sync
        times.append((time.perf_counter() - t0) / ITERS)
    ms = sorted(times)[1] * 1000.0

    print(json.dumps({
        "batch": BATCH, "dtype": cfg.compute_dtype, "remat": cfg.remat,
        "remat_policy": cfg.remat_policy, "online": ONLINE,
        "ms_per_step": round(ms, 1),
        "videos_per_s": round(BATCH / (ms / 1000.0), 1),
        "warmup_s": round(compile_s, 1),
        "final_loss": float(losses["final_loss"]),
    }))


if __name__ == "__main__":
    main()
