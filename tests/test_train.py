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


def test_padded_batch_losses(rng):
    """pad_batch_to invariant: a partial batch padded to a larger static
    shape produces EXACTLY the same losses (incl. the batch-summed video
    reco_cls focal, which needs the row_valid mask) and the same parameter
    update as the unpadded batch."""
    from audio_visual_deepfake_detection_tpu.parallel import pad_batch_to

    cfg = tiny_cfg()
    step = jax.jit(build_train_step(cfg, TRAIN_CFG))
    batch = make_batch(rng, 3, cfg)
    padded = pad_batch_to(dict(batch), 5)
    assert padded["feats"].shape[0] == 5
    assert padded["row_valid"].tolist() == [True] * 3 + [False] * 2
    padded.pop("_real_rows")

    state, _ = make_state(cfg)
    s_a, l_a = step(state, batch)
    s_b, l_b = step(state, padded)

    for key in ("cls_loss", "reg_loss", "reco_cls_loss", "final_loss", "num_pos"):
        np.testing.assert_allclose(float(l_a[key]), float(l_b[key]), rtol=1e-6,
                                   err_msg=f"padded-batch mismatch in {key}")
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pad_batch_metadata_finite_and_composes(rng):
    """Eval-path pad rows fill fps/duration/feat_stride/feat_num_frames with
    1 (not 0), keeping the grid->seconds decode finite for discarded rows
    (0/0 = NaN would trip AVDD_DEBUG_NANS at the final partial batch); and
    shard_batch(pad_batch_to(...)) composes — underscore metadata passes
    through instead of crashing device_put."""
    from audio_visual_deepfake_detection_tpu.parallel import (
        make_mesh, pad_batch_to, shard_batch)

    batch = {
        "feats": rng.standard_normal((3, 16, 8)).astype(np.float32),
        "mask": np.ones((3, 16), bool),
        "fps": np.full((3,), 25.0, np.float32),
        "duration": np.full((3,), 4.0, np.float32),
        "feat_stride": np.full((3,), 0.3, np.float32),
        "feat_num_frames": np.full((3,), 0.3, np.float32),
        "video_ids": ["a", "b", "c"],
    }
    padded = pad_batch_to(dict(batch), 8)
    for key in ("fps", "duration", "feat_stride", "feat_num_frames"):
        assert padded[key][3:].tolist() == [1.0] * 5, key
        # grid->seconds on pad rows stays finite
        assert np.isfinite((0.0 * padded[key] + 0.5 * padded[key])
                           / padded[key]).all()
    assert padded["mask"][3:].sum() == 0

    mesh = make_mesh()
    sharded = shard_batch(mesh, padded)  # must not raise on _real_rows
    assert sharded["_real_rows"] == 3
    assert sharded["video_ids"] == ["a", "b", "c"]
    assert sharded["feats"].shape == (8, 16, 8)


def test_padded_batch_losses_the_variant(rng):
    """Same invariant for the THE variant's frame-seg focal (batch-summed)."""
    import dataclasses
    from audio_visual_deepfake_detection_tpu.parallel import pad_batch_to

    cfg = dataclasses.replace(tiny_cfg(), variant="av_recovery_the")
    step = jax.jit(build_train_step(cfg, TRAIN_CFG))
    batch = make_batch(rng, 2, cfg)
    batch["frame_labels"] = np.zeros((2, cfg.max_seq_len), np.float32)
    batch["frame_labels"][:, 20:40] = 1.0
    padded = pad_batch_to(dict(batch), 4)
    padded.pop("_real_rows")

    state, _ = make_state(cfg)
    _, l_a = step(state, batch)
    _, l_b = step(state, padded)
    for key in ("reco_seg_loss", "final_loss"):
        np.testing.assert_allclose(float(l_a[key]), float(l_b[key]), rtol=1e-6,
                                   err_msg=f"padded-batch mismatch in {key}")


def test_auto_loss_weight(rng):
    """loss_weight <= 0 => dynamic cls/reg ratio (av_fd_no_recon.py:692-695):
    weight = stop_grad(cls_loss / max(reg_loss, 0.01)); the weight carries no
    gradient of its own."""
    from audio_visual_deepfake_detection_tpu.models import (
        AVLocalizer, compute_losses, label_points, model_points)

    cfg = tiny_cfg()
    batch = make_batch(rng, 2, cfg)
    params, _ = init_model(cfg, 2, 0)
    pts = model_points(cfg)
    gt_cls, gt_off = label_points(
        pts, jnp.asarray(batch["gt_segments"]), jnp.asarray(batch["gt_labels"]),
        jnp.asarray(batch["gt_valid"]), 1)
    model = AVLocalizer(cfg)
    out = model.apply(params, jnp.asarray(batch["feats"]),
                      jnp.asarray(batch["mask"]), train=False)

    def losses_for(w):
        losses, _ = compute_losses(
            out, gt_cls, gt_off, jnp.asarray(batch["has_gt"]),
            jnp.asarray(200.0), num_classes=1, loss_weight=w,
            label_smoothing=0.1)
        return losses

    auto = losses_for(-1.0)
    cls_l, reg_l = float(auto["cls_loss"]), float(auto["reg_loss"])
    expect_w = cls_l / max(reg_l, 0.01)
    np.testing.assert_allclose(float(auto["final_loss"]) - float(auto["reco_cls_loss"]) * 0.1,
                               cls_l + reg_l * expect_w, rtol=1e-5)

    # the auto weight is stop_gradded: d(final)/d(logits) must equal the
    # fixed-weight gradient evaluated at the same weight value
    logits = jnp.concatenate(out["out_cls"], axis=1)

    def final_with(w, off_scale):
        shifted = dict(out)
        shifted["out_offsets"] = [o * off_scale for o in out["out_offsets"]]
        losses, _ = compute_losses(
            shifted, gt_cls, gt_off, jnp.asarray(batch["has_gt"]),
            jnp.asarray(200.0), num_classes=1, loss_weight=w,
            label_smoothing=0.1)
        return losses["final_loss"]

    g_auto = jax.grad(lambda s: final_with(-1.0, s))(1.0)
    g_fixed = jax.grad(lambda s: final_with(expect_w, s))(1.0)
    np.testing.assert_allclose(float(g_auto), float(g_fixed), rtol=1e-5)


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


def test_cosine_no_warmup_honors_eta_min():
    """The no-warmup cosine branch must end at eta_min like the warmup one
    (reference CosineAnnealingLR eta_min, lr_schedulers.py:52)."""
    from audio_visual_deepfake_detection_tpu.train.optim import make_schedule

    cfg = {**OPT_CFG, "warmup": False, "eta_min": 1e-6, "epochs": 2}
    sched = make_schedule(cfg, num_iters_per_epoch=10)
    assert float(sched(20)) == pytest.approx(1e-6, rel=1e-3)
    assert float(sched(0)) == pytest.approx(cfg["learning_rate"])


def test_missing_video_folder_fails_fast():
    """The legacy audio_feat_folder fallback must not silently stand in for
    the VIDEO stream's folder."""
    from audio_visual_deepfake_detection_tpu.data.dataset import (
        _stream_folders)

    with pytest.raises(KeyError, match="video_feat_folder"):
        _stream_folders(("video", "byola"), {"audio_feat_folder": "/x"})
    # audio streams do fall back
    folders = _stream_folders(("byola",), {"audio_feat_folder": "/x"})
    assert folders["byola"] == "/x"
