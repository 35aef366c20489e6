"""Train-step integration: jit, EMA, normalizer EMA, determinism, sharding.

Uses a reduced pyramid (arch (1,1,2), 3 FPN levels) so the CPU jit compiles
fast; full-size shapes are covered by tests/test_model.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.models import ArchConfig
from audio_visual_deepfake_detection_tpu.train import (
    TrainState, build_train_step, init_model, make_optimizer,
)
from audio_visual_deepfake_detection_tpu.parallel import make_mesh, replicate_tree, shard_batch


def tiny_cfg():
    return ArchConfig(
        variant="av_recovery_norecon", input_dim=24, num_classes=1,
        max_seq_len=96, embd_dim=32, fpn_dim=32, head_dim=32, n_head=2,
        arch=(1, 1, 2), mha_win_size=(5, 5, -1),
        regression_range=((0, 4), (4, 8), (8, 10000)), droppath=0.1,
    )


TRAIN_CFG = {
    "center_sample": "radius", "center_sample_radius": 1.5,
    "loss_weight": 2.0, "label_smoothing": 0.1,
    "init_loss_norm": 200, "clip_grad_l2norm": 1.0,
    "cls_prior_prob": 0.01, "dropout": 0.0, "droppath": 0.1,
    "head_empty_cls": [],
}

OPT_CFG = {
    "type": "AdamW", "learning_rate": 1e-3, "weight_decay": 0.05,
    "epochs": 2, "warmup": True, "warmup_epochs": 1, "schedule_type": "cosine",
    "momentum": 0.9, "schedule_steps": [], "schedule_gamma": 0.1,
}


def make_batch(rng, b, cfg):
    t = cfg.max_seq_len
    return {
        "feats": rng.standard_normal((b, t, cfg.input_dim)).astype(np.float32),
        "mask": np.ones((b, t), bool),
        "gt_segments": np.tile(np.asarray([[[10.0, 30.0]]], np.float32), (b, 1, 1)),
        "gt_labels": np.zeros((b, 1), np.int64),
        "gt_valid": np.ones((b, 1), bool),
        "has_gt": np.ones((b,), bool),
    }


def make_state(cfg, seed=0):
    params, rng = init_model(cfg, 2, seed)
    tx, sched = make_optimizer(params, OPT_CFG, num_iters_per_epoch=10,
                               clip_grad_l2norm=TRAIN_CFG["clip_grad_l2norm"])
    return TrainState.create(params, tx, TRAIN_CFG["init_loss_norm"], rng), sched


def test_cls_prior_bias_applied():
    cfg = tiny_cfg()
    params, _ = init_model(cfg, 1, 0)
    bias = np.asarray(params["params"]["cls_head"]["cls_head"]["bias"])
    np.testing.assert_allclose(bias, -np.log(99.0), rtol=1e-5)


def test_train_step_end_to_end(rng):
    """One compiled step exercised for updates, EMA, determinism, descent."""
    cfg = tiny_cfg()
    step = jax.jit(build_train_step(cfg, TRAIN_CFG))
    batch = make_batch(rng, 2, cfg)

    state, _ = make_state(cfg)
    s1, l1 = step(state, batch)
    s2, l2 = step(s1, batch)
    assert np.isfinite(float(l1["final_loss"]))
    assert int(s2.step) == 2
    for key in ("cls_loss", "reg_loss", "reco_cls_loss"):
        assert np.isfinite(float(l1[key]))

    # params moved; EMA moved less
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               state.params, s2.params)
    de = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                state.ema_params, s2.ema_params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
    assert 0 < max(jax.tree_util.tree_leaves(de)) < max(jax.tree_util.tree_leaves(d))

    # loss-normalizer EMA (av_fd_no_recon.py:644-648)
    expected = 0.9 * 200 + 0.1 * max(float(l1["num_pos"]), 1)
    np.testing.assert_allclose(float(s1.loss_normalizer), expected, rtol=1e-6)

    # determinism: same seed, same first-step loss
    sa, _ = make_state(cfg, seed=7)
    sb, _ = make_state(cfg, seed=7)
    _, la = step(sa, batch)
    _, lb = step(sb, batch)
    assert float(la["final_loss"]) == float(lb["final_loss"])

    # descent on a fixed batch — compare the UNnormalized focal sum, because
    # the loss-normalizer EMA decays 200 -> ~num_pos and inflates the
    # normalized loss early in training (matching reference dynamics)
    s = sa
    first = last = None
    for _ in range(12):
        s, losses = step(s, batch)
        # losses are divided by the post-update normalizer == new state value
        raw = float(losses["cls_loss"]) * float(s.loss_normalizer)
        if first is None:
            first = raw
        last = raw
    assert last < first


def test_train_step_sharded_8dev(rng):
    cfg = tiny_cfg()
    mesh = make_mesh(devices=jax.devices("cpu"))
    assert mesh.devices.size == 8
    state, _ = make_state(cfg)
    state = replicate_tree(mesh, state)
    step = jax.jit(build_train_step(cfg, TRAIN_CFG))
    batch = shard_batch(mesh, make_batch(rng, 8, cfg))
    s1, losses = step(state, batch)
    assert np.isfinite(float(losses["final_loss"]))


def test_remat_grads_match(rng):
    """Activation checkpointing changes memory, not math: identical grads."""
    import dataclasses
    from audio_visual_deepfake_detection_tpu.models import (
        AVLocalizer, compute_losses, label_points, model_points)

    cfg = tiny_cfg()
    cfg_r = dataclasses.replace(cfg, remat=True)
    batch = make_batch(rng, 2, cfg)
    params, _ = init_model(cfg, 2, 0)
    pts = model_points(cfg)
    gt_cls, gt_off = label_points(
        pts, jnp.asarray(batch["gt_segments"]), jnp.asarray(batch["gt_labels"]),
        jnp.asarray(batch["gt_valid"]), 1)

    def loss_for(c):
        model = AVLocalizer(c)

        def fn(p):
            out = model.apply(p, jnp.asarray(batch["feats"]),
                              jnp.asarray(batch["mask"]), train=True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
            losses, _ = compute_losses(
                out, gt_cls, gt_off, jnp.asarray(batch["has_gt"]),
                jnp.asarray(200.0), num_classes=1, loss_weight=2.0,
                label_smoothing=0.1)
            return losses["final_loss"]

        return jax.value_and_grad(fn)(params)

    (l0, g0), (l1, g1) = loss_for(cfg), loss_for(cfg_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
