#!/usr/bin/env python
"""Validation / dev-split evaluation (reference: valid_one_epoch,
libs/utils/train_utils.py:403-508): run inference over a labeled split and
compute the challenge mAP at tIoU {0.5, 0.75, 0.9, 0.95}."""

from __future__ import annotations

import argparse
import os

import numpy as np

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

from audio_visual_deepfake_detection_tpu.core import (
    arch_config_from, load_config, test_config_from)
from audio_visual_deepfake_detection_tpu.data import DeepfakeDataset, DataLoader
from audio_visual_deepfake_detection_tpu.eval import run_evaluation
from audio_visual_deepfake_detection_tpu.infer.runner import (
    build_inference_fn, inference_one_epoch)
from audio_visual_deepfake_detection_tpu.parallel import pad_batch_to
from audio_visual_deepfake_detection_tpu.train import (
    init_model, latest_epoch_path, restore_params)


def collate_eval(samples):
    b = len(samples)
    t = samples[0]["feats"].shape[0]
    return {
        "feats": np.stack([s["feats"] for s in samples]).astype(np.float32),
        "mask": np.ones((b, t), bool),
        "fps": np.asarray([s["fps"] for s in samples], np.float32),
        "duration": np.asarray([s["duration"] for s in samples], np.float32),
        "feat_stride": np.asarray([s["feat_stride"] for s in samples], np.float32),
        "feat_num_frames": np.asarray([s["feat_num_frames"] for s in samples], np.float32),
        "video_ids": [s["video_id"] for s in samples],
        "_gt": [{"video_id": s["video_id"], "n_fakes": s["n_fakes"],
                 "segments_time": s["segments_time"]} for s in samples],
    }


def main(args):
    config = load_config(args.config)
    cfg = arch_config_from(config)
    test_cfg = test_config_from(config)

    ckpt = args.ckpt
    if os.path.isdir(ckpt):
        ckpt = latest_epoch_path(ckpt) or ckpt

    dataset = DeepfakeDataset(
        config["dataset_name"], False, config["val_split"], config["dataset"])
    loader = DataLoader(dataset, args.batch_size, collate_eval,
                        shuffle=False, drop_last=False,
                        num_workers=config["loader"]["num_workers"])

    params, _ = init_model(cfg, 1, config["init_rand_seed"])
    params = restore_params(ckpt, params, use_ema=not args.no_ema)
    infer_fn = build_inference_fn(cfg, test_cfg)

    gt_records = []

    def batches():
        for batch in loader:
            gt_records.extend(batch.pop("_gt"))
            if batch["feats"].shape[0] < args.batch_size:
                batch = pad_batch_to(batch, args.batch_size)
            yield batch

    results, _ = inference_one_epoch(batches(), infer_fn, params,
                                     output_folder=None,
                                     print_freq=args.print_freq)

    if args.saveonly:
        # pickle branch of valid_one_epoch (train_utils.py:499-502): dump the
        # flat prediction table for offline evaluation, no mAP computed
        import pickle

        out_pkl = args.output or "eval_results.pkl"
        with open(out_pkl, "wb") as f:
            pickle.dump(results, f)
        print(f"saved raw results to {out_pkl} (saveonly: no evaluation)")
        return

    if test_cfg.ext_score_file and args.fusion == "topk":
        # evaluator branch of valid_one_epoch (train_utils.py:487-491):
        # sqrt(topk_cls x seg_score) fusion (postprocessing.py:97-155)
        # before EPIC-style mAP
        import json

        from audio_visual_deepfake_detection_tpu.eval.detection import (
            ANETdetection, postprocess_results_with_cls, results_to_array)

        with open(test_cfg.ext_score_file) as f:
            cls_scores = json.load(f)
        if "results" in cls_scores:
            cls_scores = cls_scores["results"]
        fused = postprocess_results_with_cls(
            results_to_array(results, num_pred=args.ext_num_pred),
            cls_scores, num_pred=args.ext_num_pred, topk=args.ext_topk)
        evaluator = ANETdetection(gt_records)
        _, mAP_arr, avg = evaluator.evaluate(fused, verbose=True)
        print(f"challenge mAP (topk-fused): {float(np.mean(mAP_arr)) * 100:.3f}")
        return

    out_json = args.output or "eval_proposals.json"
    mAP, _ = run_evaluation(results, gt_records, out_json,
                            cls_score_file=test_cfg.ext_score_file)
    print(f"challenge mAP: {mAP:.3f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--no-ema", action="store_true")
    parser.add_argument("--saveonly", action="store_true",
                        help="dump the raw prediction table to a pickle and "
                             "skip evaluation (train_utils.py:499-502)")
    parser.add_argument("--fusion", choices=["challenge", "topk"],
                        default="challenge",
                        help="how to use test_cfg.ext_score_file: 'challenge' "
                             "= best-score proposal multiply (eval.py:103-145)"
                             ", 'topk' = sqrt(topk cls x seg) duplication "
                             "(postprocessing.py:97-155)")
    parser.add_argument("--ext-topk", type=int, default=2)
    parser.add_argument("--ext-num-pred", type=int, default=200)
    parser.add_argument("--output", type=str, default="")
    parser.add_argument("-p", "--print-freq", type=int, default=20)
    main(parser.parse_args())
