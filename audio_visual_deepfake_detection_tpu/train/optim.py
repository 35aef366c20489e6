"""Optimizer + LR schedule (reference: libs/utils/train_utils.py:65-213).

- AdamW (or SGD+momentum) with the minGPT-style decay split: weight decay
  applies only to conv/linear kernels; biases, norm affines, layer-scales,
  rel-PE and time-weighting tensors are excluded (train_utils.py:71-122).
  In our flax tree this is simply "path leaf named 'kernel'" — LN affines are
  named 'weight', everything else that decays is a kernel.
- Linear warmup (from 0) to base LR, then cosine annealing to eta_min,
  stepped per *iteration* (lr_schedulers.py:10-125); total steps include the
  warmup epochs (train_utils.py:157-173).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import optax
from flax import traverse_util


def decay_mask(params) -> Dict:
    """Weight-decay mask: kernels decay, everything else doesn't — EXCEPT the
    last hh_branch block. The reference backbone discards that block's output
    (backbones.py:485-492 appends x to out_feats BEFORE overwriting it on the
    final level), so its params never receive a torch gradient; torch AdamW
    skips grad-None params entirely, weight decay included — they stay frozen
    at init for the whole run (verified in test_parity_train). Decaying them
    here would silently walk them away from any converted checkpoint."""
    flat = traverse_util.flatten_dict(params)
    hh_ids = [int(name.split("_")[-1]) for path in flat for name in path
              if isinstance(name, str) and name.startswith("hh_branch_")]
    last_hh = f"hh_branch_{max(hh_ids)}" if hh_ids else None
    mask = {path: path[-1] == "kernel" and (last_hh is None
                                            or last_hh not in path)
            for path in flat}
    return traverse_util.unflatten_dict(mask)


def make_schedule(opt_cfg: Dict, num_iters_per_epoch: int) -> optax.Schedule:
    base_lr = opt_cfg["learning_rate"]
    if opt_cfg.get("warmup", True):
        warmup_steps = opt_cfg["warmup_epochs"] * num_iters_per_epoch
        max_steps = (opt_cfg["epochs"] + opt_cfg["warmup_epochs"]) * num_iters_per_epoch
        eta_min = opt_cfg.get("eta_min", 1e-8)
        # the reference warmup reaches base_lr at step W-1, not W — the
        # divisor is (warmup_epochs - 1) (lr_schedulers.py:72-125); optax's
        # warmup_cosine_decay divides by W, a 1/W relative lr error over the
        # whole warmup, so spell out the reference's closed form instead
        wdiv = float(max(warmup_steps - 1, 1))

        if opt_cfg.get("schedule_type", "cosine") == "cosine":
            cos_div = float(max(max_steps - warmup_steps, 1))

            def sched(count):
                c = jnp.asarray(count, jnp.float32)
                warm = c * (base_lr / wdiv)
                prog = (c - warmup_steps) / cos_div
                cos = eta_min + 0.5 * (base_lr - eta_min) * (
                    1.0 + jnp.cos(jnp.pi * prog))
                return jnp.where(c < warmup_steps, jnp.minimum(warm, base_lr),
                                 cos)

            return sched
        # multistep with warmup (LinearWarmupMultiStepLR): milestones are in
        # post-warmup steps (lr_schedulers.py:203-211 compares
        # last_epoch - warmup_steps against the milestones)
        steps = [num_iters_per_epoch * s for s in opt_cfg["schedule_steps"]]
        gamma = opt_cfg.get("schedule_gamma", 0.1)

        def sched(count):
            c = jnp.asarray(count, jnp.float32)
            warm = c * (base_lr / wdiv)
            n_decay = sum(jnp.asarray((c - warmup_steps) >= s, jnp.float32)
                          for s in steps)
            return jnp.where(c < warmup_steps, jnp.minimum(warm, base_lr),
                             base_lr * gamma ** n_decay)

        return sched
    max_steps = opt_cfg["epochs"] * num_iters_per_epoch
    if opt_cfg.get("schedule_type", "cosine") == "cosine":
        # same eta_min floor as the warmup branch (reference CosineAnnealing
        # default 1e-8, lr_schedulers.py:52) — alpha is the fraction of base
        return optax.cosine_decay_schedule(
            base_lr, max_steps,
            alpha=opt_cfg.get("eta_min", 1e-8) / base_lr)
    steps = [num_iters_per_epoch * s for s in opt_cfg["schedule_steps"]]
    return optax.piecewise_constant_schedule(
        base_lr, {s: opt_cfg.get("schedule_gamma", 0.1) for s in steps})


def make_optimizer(params, opt_cfg: Dict, num_iters_per_epoch: int,
                   clip_grad_l2norm: float = -1.0):
    """Returns an optax.GradientTransformation and the schedule."""
    schedule = make_schedule(opt_cfg, num_iters_per_epoch)
    wd = opt_cfg.get("weight_decay", 0.0)
    if opt_cfg.get("type", "AdamW") == "SGD":
        tx = optax.chain(
            optax.add_decayed_weights(wd, mask=decay_mask(params)) if wd > 0
            else optax.identity(),
            optax.sgd(schedule, momentum=opt_cfg.get("momentum", 0.9)),
        )
    else:
        tx = optax.adamw(
            schedule,
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=wd,
            mask=decay_mask(params),
        )
    if clip_grad_l2norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_l2norm), tx)
    return tx, schedule
