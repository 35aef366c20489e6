#!/usr/bin/env python
"""Precompile the standard programs into the persistent compilation cache.

First TPU compiles of the full localizer are minutes; running this once per
machine/config makes every later train/inference/bench start near-instant.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.core import (
    arch_config_from, load_config, test_config_from)
from audio_visual_deepfake_detection_tpu.infer.runner import build_inference_fn
from audio_visual_deepfake_detection_tpu.train import (
    TrainState, build_train_step, init_model, make_optimizer)


def main(args):
    config = load_config(args.config)
    cfg = arch_config_from(config)
    test_cfg = test_config_from(config)

    for batch in args.infer_batch:
        t = time.time()
        params, _ = init_model(cfg, batch, config["init_rand_seed"])
        fn = build_inference_fn(cfg, test_cfg)
        feats = jnp.zeros((batch, cfg.max_seq_len, cfg.input_dim), jnp.float32)
        mask = jnp.ones((batch, cfg.max_seq_len), bool)
        ones = jnp.ones((batch,))
        out = fn(params, feats, mask, ones * 25.0, ones * 9.6, ones * 0.3, ones * 0.3)
        np.asarray(out[1])
        print(f"inference B={batch} compiled in {time.time() - t:.1f}s")

    for batch in args.train_batch:
        t = time.time()
        params, rng = init_model(cfg, batch, config["init_rand_seed"])
        tx, _ = make_optimizer(params, config["opt"], 1000,
                               config["train_cfg"]["clip_grad_l2norm"])
        state = TrainState.create(params, tx,
                                  config["train_cfg"]["init_loss_norm"], rng)
        step = jax.jit(build_train_step(cfg, config["train_cfg"]),
                       donate_argnums=0)
        b = {
            "feats": jnp.zeros((batch, cfg.max_seq_len, cfg.input_dim), jnp.float32),
            "mask": jnp.ones((batch, cfg.max_seq_len), bool),
            "gt_segments": jnp.tile(jnp.asarray([[[10.0, 30.0]]]), (batch, 1, 1)),
            "gt_labels": jnp.zeros((batch, 1), jnp.int32),
            "gt_valid": jnp.ones((batch, 1), bool),
            "has_gt": jnp.ones((batch,), bool),
        }
        state, losses = step(state, b)
        float(losses["final_loss"])
        print(f"train B={batch} compiled in {time.time() - t:.1f}s")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--infer-batch", type=int, nargs="*",
                        default=[64, 512])  # 512 = bench.py default
    parser.add_argument("--train-batch", type=int, nargs="*", default=[])
    main(parser.parse_args())
