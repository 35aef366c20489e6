#!/usr/bin/env python
"""Sharded test inference entry point (CLI-compatible with the reference
inference.py; batches videos instead of the reference's batch_size=1)."""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

from audio_visual_deepfake_detection_tpu.core import (
    arch_config_from, load_config, test_config_from)
from audio_visual_deepfake_detection_tpu.data import DeepfakeInferenceDataset, DataLoader
from audio_visual_deepfake_detection_tpu.infer.runner import (
    build_inference_fn, inference_one_epoch)
from audio_visual_deepfake_detection_tpu.parallel import pad_batch_to
from audio_visual_deepfake_detection_tpu.train import (
    init_model, latest_epoch_path, restore_params)


def collate_infer(samples, transfer_dtype=np.float32):
    b = len(samples)
    c = samples[0]["feats"].shape[1]
    t = samples[0]["feats"].shape[0]
    batch = {
        "feats": np.stack([s["feats"] for s in samples]).astype(transfer_dtype),
        "mask": np.ones((b, t), bool),
        "fps": np.asarray([s["fps"] for s in samples], np.float32),
        "duration": np.asarray([s["duration"] for s in samples], np.float32),
        "feat_stride": np.asarray([s["feat_stride"] for s in samples], np.float32),
        "feat_num_frames": np.asarray([s["feat_num_frames"] for s in samples], np.float32),
        "video_ids": [s["video_id"] for s in samples],
    }
    return batch


def main(args):
    config = load_config(args.config)
    cfg = arch_config_from(config)
    test_cfg = test_config_from(config)
    if args.topk > 0:
        test_cfg = test_cfg.__class__(**{**test_cfg.__dict__, "max_seg_num": args.topk})

    ckpt = args.ckpt
    if os.path.isdir(ckpt) and not os.path.exists(os.path.join(ckpt, "_METADATA")):
        if args.epoch > 0:
            ckpt = os.path.join(ckpt, f"epoch_{args.epoch:03d}")
        else:
            ckpt = latest_epoch_path(ckpt) or ckpt

    dataset = DeepfakeInferenceDataset(
        config["dataset_name"], config["test_split"], args.sub_index,
        config["dataset"])
    # bf16 compute: ship features over the wire at half width too
    if config["tpu"]["compute_dtype"] == "bfloat16":
        import ml_dtypes
        transfer_dtype = np.dtype(ml_dtypes.bfloat16)
    else:
        transfer_dtype = np.float32

    def collate(samples):
        return collate_infer(samples, transfer_dtype)

    loader = DataLoader(dataset, args.batch_size, collate,
                        shuffle=False, drop_last=False,
                        num_workers=config["loader"]["num_workers"])

    params, _ = init_model(cfg, 1, config["init_rand_seed"])
    params = restore_params(ckpt, params, use_ema=True)  # EMA weights (inference.py:74-76)
    infer_fn = build_inference_fn(cfg, test_cfg)

    out_folder = os.path.join(config["output_folder"], str(args.sub_index))
    os.makedirs(out_folder, exist_ok=True)

    def batches():
        for batch in loader:
            yield pad_batch_to(batch, args.batch_size) \
                if batch["feats"].shape[0] < args.batch_size else batch

    start = time.time()
    results, _ = inference_one_epoch(
        batches(), infer_fn, params, output_folder=out_folder,
        flush_every=args.flush_every, print_freq=args.print_freq)
    total = time.time() - start
    print(f"Shard {args.sub_index}: {len(dataset)} videos in {total:.1f}s "
          f"({len(dataset)/max(total,1e-9):.1f} videos/s) -> {out_folder}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Sharded inference")
    parser.add_argument("config", type=str)
    parser.add_argument("sub_index", type=int, help="test shard index (1..7)")
    parser.add_argument("--ckpt", type=str, required=True,
                        help="checkpoint path or run folder")
    parser.add_argument("--epoch", type=int, default=-1)
    parser.add_argument("--topk", type=int, default=-1,
                        help="override max_seg_num")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--flush-every", type=int, default=5000)
    parser.add_argument("-p", "--print-freq", type=int, default=20)
    main(parser.parse_args())
