#!/usr/bin/env python
"""Training entry point (CLI-compatible with the reference train.py).

Usage: python train.py configs_train/deepfake_exp13.yaml --output exp13
"""

from __future__ import annotations

import argparse
import os
import time
from pprint import pformat

import jax
import numpy as np

from audio_visual_deepfake_detection_tpu.core.runtime import (
    init_distributed, setup_jax)
PROC_ID, NUM_PROCS = init_distributed()
setup_jax()

from audio_visual_deepfake_detection_tpu.core import (
    arch_config_from, load_config)
from audio_visual_deepfake_detection_tpu.data import (
    DeepfakeDataset, DataLoader, collate_batch, collate_train_streams)
from audio_visual_deepfake_detection_tpu.parallel import (
    make_mesh, replicate_tree, warmup_collectives)
from audio_visual_deepfake_detection_tpu.train import (
    MetricsLogger, PreemptionGuard, TrainState, build_train_step, init_model,
    make_optimizer, restore_checkpoint, save_checkpoint, train_one_epoch)


def main(args):
    config = load_config(args.config)
    seed = config["init_rand_seed"]
    np.random.seed(seed & 0x7FFFFFFF)

    # output folder, timestamped like the reference (train.py:41-51).
    # Multi-host: only process 0 writes run artifacts; all processes must
    # agree on the folder name, so the timestamp excludes seconds drift by
    # being taken once and broadcast via the (identical) CLI args + config —
    # hosts launched within the same minute agree.
    ts = time.strftime("%Y_%m_%d_%H_%M") if NUM_PROCS > 1 \
        else time.strftime("%Y_%m_%d_%H_%M_%S")
    run_name = args.output or ts
    out_folder = os.path.join(config["output_folder"], f"{run_name}_{ts}")
    if PROC_ID == 0:
        os.makedirs(out_folder, exist_ok=True)
        with open(os.path.join(out_folder, "config.txt"), "w") as f:
            f.write(pformat(config))

    if args.device_resample:
        config["dataset"]["device_resample"] = True
    dataset = DeepfakeDataset(
        config["dataset_name"], True, config["train_split"], config["dataset"])
    with_frame = config["dataset_name"].endswith("_THE")
    max_gt = config["dataset"].get("max_gt_segments", 32)
    max_seq_len = config["dataset"]["max_seq_len"]

    if config["tpu"]["compute_dtype"] == "bfloat16":
        import ml_dtypes
        transfer_dtype = np.dtype(ml_dtypes.bfloat16)
    else:
        transfer_dtype = np.float32

    if args.device_resample:
        caps = [int(c) for c in args.stream_caps.split(",")]
        assert len(caps) == len(dataset.streams), \
            f"--stream-caps needs {len(dataset.streams)} values"

        def collate(samples):
            batch = collate_train_streams(samples, caps, max_seq_len, max_gt,
                                          with_frame)
            # half-width ragged-stream infeed when computing in bf16
            batch["streams"] = tuple(
                s.astype(transfer_dtype) for s in batch["streams"])
            return batch
    else:
        def collate(samples):
            batch = collate_batch(samples, max_seq_len, max_gt, with_frame)
            # half-width infeed when computing in bf16 (model casts anyway)
            batch["feats"] = batch["feats"].astype(transfer_dtype)
            return batch

    mesh = make_mesh(config["tpu"]["dp_size"])
    warmup_collectives(mesh)  # multi-host: pin the communicator clique now
    n_dev = mesh.devices.size  # GLOBAL device count (all hosts)
    batch_size = config["loader"]["batch_size"]
    # scale LR by global device count like the reference scales by #GPUs
    # (train.py:60-61)
    config["opt"]["learning_rate"] *= n_dev
    batch_size *= n_dev
    assert batch_size % NUM_PROCS == 0, \
        f"global batch {batch_size} must divide across {NUM_PROCS} hosts"
    local_batch = batch_size // NUM_PROCS

    # per-host loader: every host draws the same seeded permutation and keeps
    # its strided slice (DCN data path of SURVEY §2.3's DP row)
    loader = DataLoader(
        dataset, local_batch, collate, shuffle=True, drop_last=True,
        num_workers=config["loader"]["num_workers"] * n_dev, seed=seed,
        prefetch=config["tpu"]["prefetch"],
        shard_rank=PROC_ID, num_shards=NUM_PROCS, equal_shards=True)

    cfg = arch_config_from(config)
    params, rng = init_model(cfg, batch_size, seed)
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print(f"Model: {cfg.variant}, {n_params/1e6:.2f}M params, "
          f"mesh={n_dev} device(s) / {NUM_PROCS} host(s), "
          f"global batch={batch_size}")

    tx, schedule = make_optimizer(
        params, config["opt"], num_iters_per_epoch=len(loader),
        clip_grad_l2norm=config["train_cfg"]["clip_grad_l2norm"])
    state = TrainState.create(params, tx, config["train_cfg"]["init_loss_norm"], rng)

    start_epoch = 0
    start_iter = 0
    if args.resume:
        state, start_epoch, start_iter = restore_checkpoint(args.resume, state)
        print(f"Resumed from {args.resume} at epoch {start_epoch}"
              + (f" iter {start_iter}" if start_iter else ""))

    state = replicate_tree(mesh, state)
    train_step = jax.jit(
        build_train_step(cfg, config["train_cfg"],
                         online_resample=args.device_resample),
        donate_argnums=0)
    logger = MetricsLogger(out_folder) if PROC_ID == 0 else None

    # SIGTERM (TPU-VM eviction notice) -> finish the current step, write a
    # mid-epoch checkpoint, exit 0; resume with --resume <.../iters_ckpt/preempt_*>
    guard = PreemptionGuard()

    max_epochs = config["opt"].get(
        "early_stop_epochs",
        config["opt"]["epochs"] + (config["opt"]["warmup_epochs"]
                                   if config["opt"]["warmup"] else 0))
    for epoch in range(start_epoch, max_epochs):
        state = train_one_epoch(
            loader, state, train_step, epoch, mesh=mesh, schedule=schedule,
            logger=logger, print_freq=args.print_freq,
            ckpt_every_iters=args.ckpt_iter_freq if PROC_ID == 0 else 0,
            ckpt_folder=os.path.join(out_folder, "iters_ckpt"),
            batch_size=local_batch,
            preempt=guard, preempt_check_every=args.print_freq,
            start_iter=start_iter if epoch == start_epoch else 0)
        if guard.triggered:
            break
        if PROC_ID == 0 and ((epoch == max_epochs - 1)
                             or ((epoch + 1) % args.ckpt_freq == 0)):
            save_checkpoint(out_folder, epoch + 1, jax.device_get(state), is_best=True)
    if logger is not None:
        logger.close()
    if guard.triggered:
        print(f"Training preempted -> {out_folder} (resume from iters_ckpt/preempt_*)")
    else:
        print(f"Training done -> {out_folder}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Train the TPU AV deepfake localizer")
    parser.add_argument("config", type=str, help="path to a config yaml")
    parser.add_argument("-p", "--print-freq", type=int, default=20)
    parser.add_argument("-c", "--ckpt-freq", type=int, default=1,
                        help="checkpoint every N epochs")
    parser.add_argument("--ckpt-iter-freq", type=int, default=1000,
                        help="mid-epoch checkpoint every N iters (0=off)")
    parser.add_argument("--output", type=str, default="")
    parser.add_argument("--resume", type=str, default="")
    parser.add_argument("--device-resample", action="store_true",
                        help="ship raw ragged streams; resample + random-"
                             "window crop run fused inside the train program")
    parser.add_argument("--stream-caps", type=str, default="960,400,1520",
                        help="comma-separated per-stream row caps for "
                             "--device-resample (video,byola,emotion order "
                             "for the EmoBYOLA datasets)")
    main(parser.parse_args())
