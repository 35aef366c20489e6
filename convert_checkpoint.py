#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (epoch_NNN.pth.tar) into an orbax
checkpoint loadable by inference.py / validate.py.

Example:
    python convert_checkpoint.py configs_test/deepfake_exp12_test.yaml \
        epoch_010.pth.tar --output converted_ckpt/
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax

os.environ.setdefault("AVDD_FORCE_CPU", "1")  # conversion is host-side
setup_jax()

import jax
import orbax.checkpoint as ocp

from audio_visual_deepfake_detection_tpu.core import arch_config_from, load_config
from audio_visual_deepfake_detection_tpu.tools.convert_torch import (
    load_reference_checkpoint)
from audio_visual_deepfake_detection_tpu.train.state import init_model


def main(args):
    config = load_config(args.config)
    cfg = arch_config_from(config)
    template, _ = init_model(cfg, 1, config["init_rand_seed"])

    payload = {"epoch": args.epoch}
    for key, use_ema in (("params", False), ("ema_params", True)):
        converted = load_reference_checkpoint(args.torch_ckpt, template["params"],
                                              use_ema=use_ema)
        payload[key] = {"params": converted}
    payload["step"] = np.zeros((), np.int32)
    payload["loss_normalizer"] = np.asarray(
        float(config["train_cfg"]["init_loss_norm"]))
    payload["rng"] = jax.random.PRNGKey(0)

    out = os.path.abspath(os.path.join(args.output, f"epoch_{args.epoch:03d}"))
    ocp.PyTreeCheckpointer().save(out, payload, force=True)
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(payload["params"]))
    print(f"converted {n/1e6:.2f}M params -> {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="our config yaml describing the model")
    parser.add_argument("torch_ckpt", help="reference .pth.tar checkpoint")
    parser.add_argument("--output", default="converted_ckpt")
    parser.add_argument("--epoch", type=int, default=0)
    main(parser.parse_args())
