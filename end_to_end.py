#!/usr/bin/env python
"""Raw media -> submission + mAP in ONE command.

Replaces the reference's four disconnected programs (three feature
extractors + inference.py + generate_results.ipynb) with a single
host-decode / device-compute pipelined driver
(audio_visual_deepfake_detection_tpu/pipeline/e2e.py).

Example (tinydataset smoke, random weights):
  python end_to_end.py configs_test/deepfake_exp12_test.yaml \
      --metadata-root /root/reference/tinydataset/metadata \
      --data-root /root/reference/tinydataset/data \
      --output runs/e2e
"""

from __future__ import annotations

import argparse
import json
import os

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

from audio_visual_deepfake_detection_tpu.core import (
    arch_config_from, load_config, test_config_from)
from audio_visual_deepfake_detection_tpu.frontends.pipeline import FeatureExtractor
from audio_visual_deepfake_detection_tpu.pipeline import (
    MediaPipeline, discover_media, run_media_pipeline)
from audio_visual_deepfake_detection_tpu.train import (
    PreemptionGuard, init_model, latest_epoch_path, restore_params)


def main(args):
    config = load_config(args.config)
    cfg = arch_config_from(config)
    test_cfg = test_config_from(config)

    items, gt_records = discover_media(
        args.metadata_root, args.data_root, args.wav_root or None,
        limit=args.limit or None)
    print(f"{len(items)} videos discovered")

    import jax.numpy as jnp

    # frontends share the localizer's compute dtype (tpu.compute_dtype or
    # --frontend-dtype); params/norm stats/softmax stay f32, outputs f32
    fdtype = args.frontend_dtype or config.get("tpu", {}).get(
        "compute_dtype", "float32")
    video_model = None
    if args.video_encoder != "c3d":
        from audio_visual_deepfake_detection_tpu.frontends import mvit
        video_model = getattr(mvit, args.video_encoder)(
            out_dim=256, temporal_size=args.video_chunk,
            dtype=jnp.dtype(fdtype))
    buckets = None
    if args.video_chunk_bucketing:
        q = max(args.video_chunk // 4, 1)
        buckets = (q, 2 * q, 3 * q, args.video_chunk)
    extractor = FeatureExtractor(seed=args.seed, video_model=video_model,
                                 video_chunk=args.video_chunk,
                                 compute_dtype=fdtype,
                                 chunk_buckets=buckets)

    if args.ckpt:
        path = args.ckpt if os.path.isfile(args.ckpt) or \
            os.path.isdir(os.path.join(args.ckpt, "params")) \
            else latest_epoch_path(args.ckpt)
        params = restore_params(path)
    else:
        params, _ = init_model(cfg, 2, seed=args.seed)

    ds = config["dataset"]
    pipeline = MediaPipeline(
        extractor, cfg, test_cfg, params,
        ds_feat_stride=float(ds.get("feat_stride", 1)),
        ds_num_frames=float(ds.get("num_frames", 1)),
        batch_size=args.batch_size,
        decode_workers=args.decode_workers)
    # SIGTERM -> finish the in-flight batch, flush, exit 0; restart with
    # --resume to finish the sweep with no video redone
    guard = PreemptionGuard()
    summary, _ = run_media_pipeline(items, pipeline, args.output,
                                    gt_records=gt_records, resume=args.resume,
                                    preempt=guard,
                                    flush_every=args.flush_every)
    print(json.dumps(summary))
    if summary.get("preempted"):
        print(f"Preempted after {summary['videos_done']} videos "
              f"(restart with --resume)")
        return
    with open(os.path.join(args.output, "e2e_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--metadata-root", required=True)
    parser.add_argument("--data-root", required=True)
    parser.add_argument("--wav-root", default="",
                        help="pre-extracted 16 kHz wavs (synthetic audio is "
                             "substituted when absent — no AAC decoder in "
                             "this image)")
    parser.add_argument("--ckpt", default="",
                        help="orbax checkpoint (dir or epoch folder); random "
                             "weights when omitted")
    parser.add_argument("--output", default="runs/e2e")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--flush-every", type=int, default=5000)
    parser.add_argument("--resume", action="store_true",
                        help="skip videos already present in the output "
                             "folder's data*.json flushes")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--video-encoder", default="mvit_v2_b",
                        choices=["c3d", "mvit_v2_t", "mvit_v2_s", "mvit_v2_b"],
                        help="default matches the reference checkpoint's "
                             "production encoder (video_encoder.py:192 "
                             "mvit_b); it is also the fastest on v5e after "
                             "the round-3 kernel work")
    parser.add_argument("--video-chunk-bucketing", action="store_true",
                        help="run tail video chunks at the smallest quarter-"
                             "of---video-chunk bucket >= their length "
                             "(512 -> 128/256/384/512) instead of "
                             "zero-padding to --video-chunk. ~2x encoder "
                             "throughput on short videos; C3D features are "
                             "bit-identical, MViT features differ slightly "
                             "from the reference's padded-512 quirk (its "
                             "attention sees fewer pad tokens) — off by "
                             "default for parity")
    parser.add_argument("--video-chunk", type=int, default=512)
    parser.add_argument("--decode-workers", type=int, default=4,
                        help="host video/audio decode threads (each issues "
                             "one GIL-released native decode call); raise "
                             "until the device stops waiting on the host — "
                             "the reference used DataLoader workers + "
                             "Pool(16) for the same stage")
    parser.add_argument("--frontend-dtype", default="",
                        choices=["", "float32", "bfloat16"],
                        help="frontend compute dtype (default: the config's "
                             "tpu.compute_dtype)")
    main(parser.parse_args())
