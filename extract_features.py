#!/usr/bin/env python
"""Offline feature-cache driver (replaces the reference's three extraction
programs under audio_feature/ and video_feature/): decode media on the host,
run the frontends on device, write .npy caches the dataset layer consumes.

Weights: pass reference checkpoints to convert, or run with random weights
for smoke/perf testing.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

from audio_visual_deepfake_detection_tpu.frontends.pipeline import (
    CACHE_DIR_NAMES, FeatureExtractor)


def main(args):
    with open(args.file_list) as f:
        rels = [line.strip() for line in f if line.strip()]

    video_model = None
    if args.video_encoder != "c3d":
        import jax.numpy as jnp

        from audio_visual_deepfake_detection_tpu.frontends import mvit
        video_model = getattr(mvit, args.video_encoder)(
            out_dim=256, temporal_size=args.video_chunk,
            dtype=jnp.dtype(args.dtype))
    buckets = None
    if args.video_chunk_bucketing:
        q = max(args.video_chunk // 4, 1)
        buckets = (q, 2 * q, 3 * q, args.video_chunk)
    extractor = FeatureExtractor(seed=args.seed, video_model=video_model,
                                 video_chunk=args.video_chunk,
                                 compute_dtype=args.dtype,
                                 chunk_buckets=buckets)
    errors = []
    skipped = 0
    cache_names = tuple(CACHE_DIR_NAMES.values())
    for i, rel in enumerate(rels):
        mp4 = os.path.join(args.video_root, rel)
        wav = os.path.join(args.wav_root, rel.replace(".mp4", ".wav")) \
            if args.wav_root else None
        rel_npy = rel.replace(".mp4", ".npy")
        # restartability: a killed sweep re-run picks up where it left off
        # (all three stream caches present => nothing to redo for this clip)
        if not args.no_skip_existing and all(
                os.path.exists(os.path.join(args.output_root, n, rel_npy))
                for n in cache_names):
            skipped += 1
            continue
        try:
            extractor.extract_to_cache(mp4, wav, args.output_root, rel_npy)
        except Exception as e:  # keep going on corrupt media, log errors
            errors.append((rel, str(e)))
        if i % 50 == 0:
            print(f"{i}/{len(rels)} done ({len(errors)} errors, {skipped} skipped)")
    if errors:
        with open(os.path.join(args.output_root, "extract_errors.txt"), "a") as f:
            for rel, err in errors:
                f.write(f"{rel}\t{err}\n")
    print(f"done: {len(rels) - len(errors) - skipped} ok, {skipped} skipped, "
          f"{len(errors)} errors")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("file_list", help="txt of relative mp4 paths")
    parser.add_argument("--video-root", required=True)
    parser.add_argument("--wav-root", default="")
    parser.add_argument("--output-root", required=True)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-skip-existing", action="store_true",
                        help="re-extract even when all three stream caches "
                             "already exist for a clip")
    parser.add_argument("--video-encoder", default="mvit_v2_b",
                        choices=["c3d", "mvit_v2_t", "mvit_v2_s", "mvit_v2_b"],
                        help="visual backbone; the reference's production "
                             "extractor is MViT-v2 (video_encoder.py:65-170)")
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
    parser.add_argument("--video-chunk", type=int, default=512,
                        help="frames per chunk (reference uses 512)")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="frontend compute dtype (bf16 matmuls/convs, "
                             "f32 params/norm stats/softmax, f32 outputs)")
    main(parser.parse_args())
