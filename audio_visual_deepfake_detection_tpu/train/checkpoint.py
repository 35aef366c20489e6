"""Checkpoint / resume via orbax.

Mirrors the reference contract (train_utils.py:43-56, train.py:115-133,
inference.py:74-76): each checkpoint holds {params, ema_params, opt_state,
step, loss_normalizer, epoch}; inference loads the EMA weights; resume
restores everything. Layout: <folder>/epoch_<N> orbax directories plus a
'best' copy.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    if jax.process_count() > 1:
        # Multi-host runs checkpoint from process 0 only (train.py gates the
        # call; the state is fully replicated so one host has everything, and
        # restores are local file reads on every host). Scope orbax's
        # process-sync barriers to the calling process — the default spans
        # ALL processes and would deadlock against the hosts that never call.
        opts = ocp.options.MultiprocessingOptions(
            primary_host=jax.process_index(),
            active_processes={jax.process_index()},
            barrier_sync_key_prefix=f"proc{jax.process_index()}")
        return ocp.Checkpointer(ocp.PyTreeCheckpointHandler(),
                                multiprocessing_options=opts)
    return ocp.PyTreeCheckpointer()


def save_checkpoint(folder: str, epoch: int, state, is_best: bool = False,
                    tag: Optional[str] = None, next_iter: int = 0):
    """``epoch``/``next_iter``: where training resumes — the epoch to run
    next and the first iteration index within it (0 = epoch start; a
    preemption checkpoint saves the epoch in progress + the next iteration,
    so no data is skipped or redone on resume)."""
    os.makedirs(folder, exist_ok=True)
    payload = {
        "epoch": epoch,
        "next_iter": next_iter,
        "step": state.step,
        "params": state.params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
        "loss_normalizer": state.loss_normalizer,
        "rng": state.rng,
    }
    name = tag or f"epoch_{epoch:03d}"
    path = os.path.abspath(os.path.join(folder, name))
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    if is_best:
        ckptr.save(os.path.abspath(os.path.join(folder, "model_best")), payload, force=True)


def restore_checkpoint(path: str, state):
    """Restore into an existing TrainState template (shapes must match).
    Returns (state, epoch, next_iter) — resume at that epoch, skipping its
    first ``next_iter`` iterations (0 for epoch-boundary checkpoints and for
    checkpoints written before the field existed)."""
    template = {
        "epoch": 0,
        "next_iter": 0,
        "step": state.step,
        "params": state.params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
        "loss_normalizer": state.loss_normalizer,
        "rng": state.rng,
    }
    try:
        restored = _checkpointer().restore(os.path.abspath(path), item=template)
    except Exception as e:
        # retry against the pre-next_iter layout ONLY when that field is the
        # problem — anything else (shape mismatch, missing path, half-written
        # dir) must surface as the real error, not a misleading second one
        if "next_iter" not in str(e):
            raise
        del template["next_iter"]
        restored = _checkpointer().restore(os.path.abspath(path), item=template)
    new_state = state.replace(
        step=restored["step"],
        params=restored["params"],
        ema_params=restored["ema_params"],
        opt_state=restored["opt_state"],
        loss_normalizer=restored["loss_normalizer"],
        rng=restored["rng"],
    )
    return new_state, int(restored["epoch"]), int(restored.get("next_iter", 0))


def restore_params(path: str, params_template, use_ema: bool = True):
    """Load only (EMA) params for inference (inference.py:74-76)."""
    restored = _checkpointer().restore(os.path.abspath(path))
    key = "ema_params" if use_ema and "ema_params" in restored else "params"
    loaded = restored[key]
    # coerce to the template's structure
    flat_t = jax.tree_util.tree_leaves(params_template)
    flat_l = jax.tree_util.tree_leaves(loaded)
    assert len(flat_t) == len(flat_l), "checkpoint/model structure mismatch"
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params_template),
        [np.asarray(l) for l in flat_l])


def latest_epoch_path(folder: str) -> Optional[str]:
    """Auto-pick the newest epoch checkpoint in a folder (inference.py:39-41)."""
    if not os.path.isdir(folder):
        return None
    best = None
    best_epoch = -1
    for name in os.listdir(folder):
        m = re.fullmatch(r"epoch_(\d+)", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(folder, name)
    return best
