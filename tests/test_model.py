"""Meta-arch shape/invariant tests and label-assignment semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.models import (
    ArchConfig, AVLocalizer, compute_losses, label_points, model_points,
    update_loss_normalizer,
)
from audio_visual_deepfake_detection_tpu.infer import TestConfig, decode_and_postprocess
from audio_visual_deepfake_detection_tpu.models.points import generate_points


def tiny_cfg(variant="av_recovery_norecon"):
    return ArchConfig(
        variant=variant, input_dim=24, num_classes=1, max_seq_len=96,
        embd_dim=32, fpn_dim=32, head_dim=32, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1),
    )


@pytest.mark.parametrize("variant", ["av_recovery_norecon", "av_recovery_the", "plain"])
def test_forward_shapes(rng, variant):
    cfg = tiny_cfg(variant)
    model = AVLocalizer(cfg)
    b, t = 2, cfg.max_seq_len
    feats = jnp.asarray(rng.standard_normal((b, t, cfg.input_dim), dtype=np.float32))
    mask = jnp.ones((b, t), bool)
    params = model.init(jax.random.PRNGKey(0), feats, mask, train=False)
    out = model.apply(params, feats, mask, train=False)

    lens = cfg.fpn_lens
    assert len(out["out_cls"]) == 6
    for i, l in enumerate(lens):
        assert out["out_cls"][i].shape == (b, l, cfg.num_classes)
        assert out["out_offsets"][i].shape == (b, l, 2)
        assert out["fpn_masks"][i].shape == (b, l)
        assert np.all(np.asarray(out["out_offsets"][i]) >= 0)
    if variant != "plain":
        assert out["cls_scores"].shape == (b, 1)
    if variant == "av_recovery_the":
        assert out["seg_scores"].shape == (b, t)


def test_masked_positions_produce_masked_outputs(rng):
    """Padded frames must not leak into valid positions."""
    cfg = tiny_cfg()
    model = AVLocalizer(cfg)
    b, t = 1, cfg.max_seq_len
    x1 = rng.standard_normal((b, t, cfg.input_dim)).astype(np.float32)
    valid_len = 48
    mask = jnp.asarray(np.arange(t)[None] < valid_len)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x1), mask, train=False)

    x2 = x1.copy()
    x2[:, valid_len:] = 123.0  # perturb only padded frames
    o1 = model.apply(params, jnp.asarray(x1 * np.asarray(mask)[..., None]), mask, train=False)
    o2 = model.apply(params, jnp.asarray(x2 * np.asarray(mask)[..., None]), mask, train=False)
    for a, b_ in zip(o1["out_cls"], o2["out_cls"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_label_points_single_segment():
    cfg = tiny_cfg()
    pts = model_points(cfg)  # (P, 4)
    # one GT segment [10, 20] on the feature grid, class 0
    gt_segs = jnp.asarray([[[10.0, 20.0]]])
    gt_labels = jnp.asarray([[0]])
    gt_valid = jnp.asarray([[True]])
    gt_cls, gt_off = label_points(pts, gt_segs, gt_labels, gt_valid, 1)
    gt_cls, gt_off = np.asarray(gt_cls)[0], np.asarray(gt_off)[0]
    pts_np = np.asarray(pts)

    pos = gt_cls[:, 0] > 0
    assert pos.sum() > 0
    for p in np.where(pos)[0]:
        t, lo, hi, stride = pts_np[p]
        # center sampling: point within radius*stride of the center, clipped
        center = 15.0
        assert t - max(center - 1.5 * stride, 10.0) > 0
        assert min(center + 1.5 * stride, 20.0) - t > 0
        # regression range gating on the max offset
        left, right = gt_off[p] * stride
        assert lo <= max(left, right) <= hi
        np.testing.assert_allclose(left, t - 10.0, atol=1e-4)
        np.testing.assert_allclose(right, 20.0 - t, atol=1e-4)


def test_label_points_empty_gt():
    cfg = tiny_cfg()
    pts = model_points(cfg)
    gt_cls, gt_off = label_points(
        pts, jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, 1), bool), 1)
    assert np.asarray(gt_cls).sum() == 0


def test_losses_finite_and_grad(rng):
    cfg = tiny_cfg()
    model = AVLocalizer(cfg)
    b, t = 2, cfg.max_seq_len
    feats = jnp.asarray(rng.standard_normal((b, t, cfg.input_dim), dtype=np.float32))
    mask = jnp.ones((b, t), bool)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, mask, train=True)
    pts = model_points(cfg)
    gt_segs = jnp.asarray([[[10.0, 20.0]], [[0.0, 0.0]]])
    gt_labels = jnp.zeros((b, 1), jnp.int32)
    gt_valid = jnp.asarray([[True], [False]])
    has_gt = jnp.asarray([True, False])
    gt_cls, gt_off = label_points(pts, gt_segs, gt_labels, gt_valid, 1)

    def loss_fn(p):
        out = model.apply(p, feats, mask, train=True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        losses, num_pos = compute_losses(
            out, gt_cls, gt_off, has_gt, jnp.asarray(200.0),
            num_classes=1, loss_weight=2.0, label_smoothing=0.1)
        return losses["final_loss"], (losses, num_pos)

    (final, (losses, num_pos)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(final))
    assert int(num_pos) > 0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # at least some gradient is nonzero
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)
    new_norm = update_loss_normalizer(jnp.asarray(200.0), num_pos)
    assert float(new_norm) == pytest.approx(0.9 * 200.0 + 0.1 * max(int(num_pos), 1))


def test_decode_and_postprocess_runs(rng):
    cfg = tiny_cfg()
    model = AVLocalizer(cfg)
    b, t = 2, cfg.max_seq_len
    feats = jnp.asarray(rng.standard_normal((b, t, cfg.input_dim), dtype=np.float32))
    mask = jnp.ones((b, t), bool)
    params = model.init(jax.random.PRNGKey(0), feats, mask, train=False)
    out = model.apply(params, feats, mask, train=False)

    pts = generate_points(cfg.fpn_lens, cfg.fpn_strides, cfg.regression_range)
    tcfg = TestConfig(pre_nms_thresh=0.001, pre_nms_topk=2000, min_score=0.001,
                      max_seg_num=10, nms_method="soft", nms_sigma=0.75,
                      duration_thresh=0.001, multiclass_nms=False, voting_thresh=0.9)
    fps = jnp.asarray([25.0, 30.0])
    dur = jnp.asarray([9.0, 6.0])
    stride = jnp.asarray([0.15, 0.2])
    nframes = stride
    segs, scores, cls_idxs, valid = decode_and_postprocess(
        out, pts, fps, dur, stride, nframes, tcfg, 1)
    segs, scores, valid = map(np.asarray, (segs, scores, valid))
    assert segs.shape == (b, 10, 2)
    # all outputs clamped to [0, duration]
    for i in range(b):
        v = valid[i]
        assert np.all(segs[i][v] >= 0)
        assert np.all(segs[i][v] <= float(dur[i]) + 1e-5)


def test_bf16_compute_path(rng):
    """bf16 activations with f32 params: outputs close to the f32 path."""
    import dataclasses
    import jax.tree_util as jtu

    cfg32 = tiny_cfg()
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    b, t = 1, cfg32.max_seq_len
    feats = jnp.asarray(rng.standard_normal((b, t, cfg32.input_dim), dtype=np.float32))
    mask = jnp.ones((b, t), bool)

    model32 = AVLocalizer(cfg32)
    params = model32.init(jax.random.PRNGKey(0), feats, mask, train=False)
    # all params stay f32 regardless of compute dtype
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(params))

    out32 = model32.apply(params, feats, mask, train=False)
    out16 = AVLocalizer(cfg16).apply(params, feats, mask, train=False)
    assert out16["out_cls"][0].dtype == jnp.float32  # heads re-cast to f32
    a = np.concatenate([np.asarray(x).ravel() for x in out32["out_cls"]])
    b_ = np.concatenate([np.asarray(x).ravel() for x in out16["out_cls"]])
    # bf16 has ~3 decimal digits; logits should agree coarsely
    assert np.median(np.abs(a - b_)) < 0.05
    assert np.corrcoef(a, b_)[0, 1] > 0.99
