"""Train state + jit-compiled train/eval steps.

The reference's per-iteration loop (train_utils.py:296-316: zero_grad ->
forward -> backward -> clip -> step -> sched.step -> EMA update) becomes ONE
jit-compiled function: loss+grad, optax update, EMA tree update, and the EMA
loss-normalizer update all fuse into a single device program. The EMA of
parameters (ModelEma, decay 0.999, train_utils.py:247-269) is a parallel
param pytree inside the state.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.meta_arch import (
    ArchConfig, AVLocalizer, compute_losses, label_points, model_points,
    update_loss_normalizer,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    loss_normalizer: jnp.ndarray
    rng: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx, init_loss_norm: float, rng):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=tx.init(params),
            loss_normalizer=jnp.asarray(float(init_loss_norm)),
            rng=rng,
            tx=tx,
        )


def build_train_step(
    cfg: ArchConfig,
    train_cfg: Dict,
    ema_decay: float = 0.999,
    online_resample: bool = False,
    deterministic_forward: bool = False,
) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    """Returns train_step(state, batch) -> (state, losses).

    ``online_resample``: the batch carries raw ragged ``streams``/``rows``
    plus the host-drawn crop window (``win_st``/``win_len``) instead of
    resampled ``feats``/``mask``; the per-stream linear resample and the
    window crop run fused inside the train program
    (ops/resample.py::linear_resample_dynamic). Bit-matches the host path
    when streams are shipped in float32; with a bfloat16 infeed
    (train.py --device-resample + compute_dtype bfloat16) the lerp runs in
    bf16 while the host path resamples in f32 before the downcast, so
    results agree only to bf16 rounding.

    ``deterministic_forward``: run the forward with train=False (no dropout /
    droppath) while keeping the full optimizer/EMA/normalizer chain — used by
    the torch trajectory-parity test, where the stochastic interpolator
    dropout (blocks.py:1615 in the reference) would make cross-framework
    step-for-step comparison impossible.
    """
    model = AVLocalizer(cfg)
    points = model_points(cfg)
    loss_weight = train_cfg["loss_weight"]
    label_smoothing = train_cfg["label_smoothing"]
    center_sample = train_cfg["center_sample"]
    radius = train_cfg["center_sample_radius"]

    def batch_feats(batch):
        if not online_resample:
            return batch["feats"], batch["mask"]
        from ..ops.resample import linear_resample_dynamic
        parts = [
            linear_resample_dynamic(
                s, r, cfg.max_seq_len, resample_len=cfg.max_seq_len,
                start=batch["win_st"], out_valid=batch["win_len"])
            for s, r in zip(batch["streams"], batch["rows"])
        ]
        feats = jnp.concatenate(parts, axis=-1)
        mask = jnp.arange(cfg.max_seq_len)[None, :] < batch["win_len"][:, None]
        return feats, mask

    def train_step(state: TrainState, batch: Dict):
        rng, step_rng = jax.random.split(state.rng)

        gt_cls, gt_off = label_points(
            points, batch["gt_segments"], batch["gt_labels"], batch["gt_valid"],
            cfg.num_classes, center_sample, radius)
        feats, mask = batch_feats(batch)

        def loss_fn(params):
            out = model.apply(params, feats, mask,
                              train=not deterministic_forward,
                              rngs={"dropout": step_rng})
            losses, num_pos = compute_losses(
                out, gt_cls, gt_off, batch["has_gt"], state.loss_normalizer,
                num_classes=cfg.num_classes, loss_weight=loss_weight,
                label_smoothing=label_smoothing, variant=cfg.variant,
                frame_gt=batch.get("frame_labels"),
                row_valid=batch.get("row_valid"))
            return losses["final_loss"], (losses, num_pos)

        (final, (losses, num_pos)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params, new_params)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            ema_params=new_ema,
            opt_state=new_opt_state,
            loss_normalizer=update_loss_normalizer(state.loss_normalizer, num_pos),
            rng=rng,
        )
        losses = dict(losses)
        losses["num_pos"] = num_pos
        losses["grad_norm"] = optax.global_norm(grads)
        return new_state, losses

    return train_step


def build_eval_forward(cfg: ArchConfig):
    """Returns forward(params, feats, mask) -> model outputs (eval mode).
    Pass EMA or raw params explicitly — selecting them is the caller's job
    (restore_params(use_ema=...))."""
    model = AVLocalizer(cfg)

    def forward(params, feats, mask):
        return model.apply(params, feats, mask, train=False)

    return forward


def init_model(cfg: ArchConfig, batch_size: int, seed: int):
    """Initialize params with the focal-prior classifier bias."""
    from ..models.heads import init_cls_prior

    model = AVLocalizer(cfg)
    rng = jax.random.PRNGKey(seed)
    p_rng, d_rng, s_rng = jax.random.split(rng, 3)
    feats = jnp.zeros((batch_size, cfg.max_seq_len, cfg.input_dim), jnp.float32)
    mask = jnp.ones((batch_size, cfg.max_seq_len), bool)
    # jit the init: un-jitted flax init dispatches op-by-op, which is
    # pathologically slow over a remote-TPU tunnel
    init_fn = jax.jit(lambda rngs, f, m: model.init(rngs, f, m, train=True))
    params = init_fn({"params": p_rng, "dropout": d_rng}, feats, mask)
    params = init_cls_prior(params, cfg.cls_prior_prob, cfg.head_empty_cls)
    return params, s_rng
