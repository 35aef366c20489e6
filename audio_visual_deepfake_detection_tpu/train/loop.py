"""Epoch loops (reference: train_utils.py:273-601).

``train_one_epoch`` drives the jit-compiled train step over the loader with
loss meters, periodic console/tb logging, and mid-epoch checkpoints (the
reference hard-codes every 1000 iters to an absolute path,
train_utils.py:381-396 — here it's configurable and lands in the run folder).

Resume semantics: mid-epoch checkpoints store (epoch-in-progress,
next_iter); ``start_iter`` skips exactly that many leading iterations of the
same deterministic loader order (seeded by epoch), so a resumed run
continues with the precise batch the stopped run would have trained next —
nothing skipped, nothing redone.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax

from ..parallel.mesh import device_prefetch, pad_batch_to
from .checkpoint import save_checkpoint
from .meters import AverageMeter, MetricsLogger


def train_one_epoch(
    loader,
    state,
    train_step: Callable,
    curr_epoch: int,
    mesh=None,
    schedule=None,
    logger: Optional[MetricsLogger] = None,
    print_freq: int = 20,
    ckpt_every_iters: int = 0,
    ckpt_folder: Optional[str] = None,
    batch_size: Optional[int] = None,
    preempt=None,
    preempt_check_every: int = 20,
    start_iter: int = 0,
):
    loader.set_epoch(curr_epoch)
    num_iters = len(loader)
    batch_time = AverageMeter()
    trackers: Dict[str, AverageMeter] = {}
    print(f"\n[Train]: Epoch {curr_epoch:d} started"
          + (f" at iter {start_iter:d}" if start_iter else ""))
    start = time.time()

    # resume skip: prefer the loader's index-level skip (no feature IO for
    # the skipped batches); fall back to consuming and discarding
    skip = start_iter
    if start_iter and hasattr(loader, "set_skip"):
        loader.set_skip(start_iter)
        skip = 0

    def host_batches():
        for i, batch in enumerate(loader):
            if i < skip:
                continue
            if batch_size is not None:
                batch = pad_batch_to(batch, batch_size)
            batch.pop("_real_rows", None)
            batch.pop("video_ids", None)
            yield batch

    def save_preempt(next_iter: int):
        if jax.process_index() == 0 and ckpt_folder:
            save_checkpoint(
                ckpt_folder,
                curr_epoch + 1 if next_iter >= num_iters else curr_epoch,
                state,
                tag=f"preempt_epoch_{curr_epoch:03d}_iter{next_iter}",
                next_iter=0 if next_iter >= num_iters else next_iter)
        preempt.triggered = True
        print(f"[Train]: preemption requested — stopped at epoch "
              f"{curr_epoch:d} after iter {next_iter - 1:d}"
              + (f", checkpoint in {ckpt_folder}" if ckpt_folder else ""))

    # transfers overlap compute: up to 2 batches in flight on the device
    for iter_idx, batch in enumerate(device_prefetch(host_batches(), mesh),
                                     start=start_iter):
        state, losses = train_step(state, batch)

        if iter_idx != 0 and iter_idx % print_freq == 0:
            jax.block_until_ready(losses["final_loss"])
            batch_time.update((time.time() - start) / print_freq)
            start = time.time()
            scalars = {}
            for key, value in losses.items():
                trackers.setdefault(key, AverageMeter()).update(float(value))
                scalars[f"train/{key}"] = float(value)
            if schedule is not None:
                scalars["train/learning_rate"] = float(schedule(int(state.step)))
            if logger is not None:
                logger.log(int(state.step), scalars)
            fl = trackers["final_loss"]
            parts = [
                f"Epoch: [{curr_epoch:03d}][{iter_idx:05d}/{num_iters:05d}]",
                f"Time {batch_time.val:.2f} ({batch_time.avg:.2f})",
                f"Loss {fl.val:.2f} ({fl.avg:.2f})",
            ]
            parts += [f"{k} {m.val:.2f} ({m.avg:.2f})"
                      for k, m in trackers.items() if k != "final_loss"]
            print("\t".join(parts))

        if ckpt_every_iters > 0 and iter_idx > 0 and iter_idx % ckpt_every_iters == 0 \
                and ckpt_folder:
            # tag names the epoch IN PROGRESS + the next iteration, matching
            # the payload (and the preempt_* tags) exactly
            save_checkpoint(ckpt_folder, curr_epoch, state,
                            tag=f"epoch_{curr_epoch:03d}_iter{iter_idx + 1}",
                            next_iter=iter_idx + 1)

        # preemption poll on a fixed cadence — every host hits the SAME
        # iteration index, which agreed() requires (it is a collective when
        # multi-host; see train/preempt.py)
        if preempt is not None and (iter_idx + 1) % preempt_check_every == 0 \
                and preempt.agreed():
            save_preempt(iter_idx + 1)
            return state

    # end-of-epoch poll: catches a signal that landed when the cadence never
    # fired again (e.g. fewer iterations than preempt_check_every) — without
    # it the flag would be ignored until the grace window expires
    if preempt is not None and not preempt.triggered and preempt.agreed():
        save_preempt(num_iters)
        return state

    if schedule is not None:
        print(f"[Train]: Epoch {curr_epoch:d} finished with "
              f"lr={float(schedule(int(state.step))):.8f}\n")
    return state
