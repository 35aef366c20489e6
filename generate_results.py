#!/usr/bin/env python
"""Merge shard outputs into submission files (replaces the reference's
generate_results.ipynb): prediction.txt (video level) and prediction.json
(segment level with the >0.2 filter and [[0,0,0]] sentinel)."""

import argparse

from audio_visual_deepfake_detection_tpu.infer.results import generate_results

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("base_folder", help="folder containing shard subdirs 1..N")
    parser.add_argument("--num-shards", type=int, default=7)
    args = parser.parse_args()
    n_txt, n_json = generate_results(args.base_folder, args.num_shards)
    print(f"prediction.txt: {n_txt} videos, prediction.json: {n_json} videos")
