#!/usr/bin/env python
"""Sharded test inference entry point (CLI-compatible with the reference
inference.py; batches videos instead of the reference's batch_size=1)."""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from audio_visual_deepfake_detection_tpu.core.runtime import (
    init_distributed, setup_jax)
PROC_ID, NUM_PROCS = init_distributed()
setup_jax()

from audio_visual_deepfake_detection_tpu.core import (
    arch_config_from, load_config, test_config_from)
from audio_visual_deepfake_detection_tpu.data import DeepfakeInferenceDataset, DataLoader
from audio_visual_deepfake_detection_tpu.infer.resume import plan_host_share
from audio_visual_deepfake_detection_tpu.infer.runner import (
    build_inference_fn, build_online_inference_fn, collate_infer_varlen,
    collate_streams, inference_one_epoch)
from audio_visual_deepfake_detection_tpu.parallel import pad_batch_to
from audio_visual_deepfake_detection_tpu.train import (
    PreemptionGuard, init_model, latest_epoch_path, restore_params)


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

    dataset_cfg = dict(config["dataset"])
    if args.device_resample:
        dataset_cfg["device_resample"] = True
    dataset = DeepfakeInferenceDataset(
        config["dataset_name"], config["test_split"], args.sub_index,
        dataset_cfg)
    # bf16 compute: ship features over the wire at half width too
    if config["tpu"]["compute_dtype"] == "bfloat16":
        import ml_dtypes
        transfer_dtype = np.dtype(ml_dtypes.bfloat16)
    else:
        transfer_dtype = np.float32

    if args.device_resample:
        # raw ragged streams in, resample fused into the device program;
        # caps bound the zero-padded infeed (assertion fires if exceeded)
        caps = [int(c) for c in args.stream_caps.split(",")]
        assert len(caps) == len(dataset.streams), \
            f"--stream-caps needs {len(dataset.streams)} values " \
            f"(streams: {dataset.streams})"

        def collate(samples):
            streams, rows, duration, video_ids = collate_streams(samples, caps)
            return {
                "streams": tuple(s.astype(transfer_dtype) for s in streams),
                "rows": rows, "duration": duration, "video_ids": video_ids,
            }
    elif not dataset.force_upsampling:
        def collate(samples):
            return collate_infer_varlen(samples, cfg.max_div_factor,
                                        cfg.max_seq_len, transfer_dtype)
    else:
        def collate(samples):
            return collate_infer(samples, transfer_dtype)

    # Multi-host: inference is embarrassingly parallel — each host takes a
    # strided slice of the shard list (applied to dataset.data_list below,
    # so --resume composes correctly) and runs independently on its local
    # devices (no collectives); outputs land in per-host subfolders that
    # generate_results merges (the reference's manual 7-shard split,
    # automated one level further down).
    loader = DataLoader(dataset, args.batch_size, collate,
                        shuffle=False, drop_last=False,
                        num_workers=config["loader"]["num_workers"])

    params, _ = init_model(cfg, 1, config["init_rand_seed"])
    params = restore_params(ckpt, params, use_ema=True)  # EMA weights (inference.py:74-76)
    if args.device_resample:
        infer_fn = build_online_inference_fn(
            cfg, test_cfg, float(config["dataset"]["feat_stride"]),
            float(config["dataset"]["num_frames"]))
    else:
        infer_fn = build_inference_fn(cfg, test_cfg)

    out_folder = os.path.join(config["output_folder"], str(args.sub_index))
    if NUM_PROCS > 1:
        out_folder = os.path.join(out_folder, f"host{PROC_ID}")
    os.makedirs(out_folder, exist_ok=True)

    # Host sharding + --resume: each host takes its strided share of the
    # shard FIRST, then (when resuming) drops the videos its own folder
    # already flushed — filter-then-stride would reassign videos across
    # hosts (duplicates + silently missing videos in the merged submission).
    # A shard killed mid-sweep restarts from its periodic flushes instead of
    # redoing everything (the reference rides this exact manual loop across
    # 343k videos / 7 shards with no recovery at all).
    before = (len(dataset) + NUM_PROCS - 1 - PROC_ID) // NUM_PROCS
    dataset.data_list, done = plan_host_share(
        dataset.data_list, PROC_ID, NUM_PROCS, out_folder, args.resume)
    if args.resume:
        print(f"Resume: {before - len(dataset)}/{before} of this host's "
              f"videos already flushed, {len(dataset)} to go")

    def batches():
        for batch in loader:
            yield pad_batch_to(batch, args.batch_size) \
                if len(batch["video_ids"]) < args.batch_size else batch

    # SIGTERM -> flush pending results after the current batch, exit 0;
    # restart with --resume to finish the shard with zero redone videos
    guard = PreemptionGuard()

    start = time.time()
    # collect_items=False: results stream to the JSON flushes only — holding
    # a whole ~49k-video shard's items in memory would grow unboundedly
    inference_one_epoch(
        batches(), infer_fn, params, output_folder=out_folder,
        flush_every=args.flush_every, print_freq=args.print_freq,
        seen_offset=len(done), preempt=guard, collect_items=False)
    total = time.time() - start
    if guard.triggered:
        print(f"Shard {args.sub_index}: preempted after {total:.1f}s "
              f"-> {out_folder} (restart with --resume)")
    else:
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
    parser.add_argument("--device-resample", action="store_true",
                        help="ship raw ragged streams and fuse the per-stream "
                             "linear resample + concat into the device program "
                             "(smaller infeed, no host resample)")
    parser.add_argument("--stream-caps", type=str, default="960,400,1520",
                        help="comma-separated per-stream row caps for "
                             "--device-resample (video,byola,emotion order "
                             "per the dataset's stream tuple)")
    parser.add_argument("--flush-every", type=int, default=5000)
    parser.add_argument("--resume", action="store_true",
                        help="skip videos already present in this shard's "
                             "data*.json flushes (restart after a crash or "
                             "preemption without redoing the shard)")
    parser.add_argument("-p", "--print-freq", type=int, default=20)
    main(parser.parse_args())
