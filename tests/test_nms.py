"""Device soft-NMS vs the native C++ oracle, and segment voting."""

import numpy as np
import pytest
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.ops import nms as dev_nms
from audio_visual_deepfake_detection_tpu.runtime import host_softnms, host_nms


def _random_candidates(rng, n=60, t=100.0):
    start = rng.uniform(0, t, n).astype(np.float32)
    length = rng.uniform(0.5, 20, n).astype(np.float32)
    segs = np.stack([start, start + length], axis=1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return segs, scores


@pytest.mark.parametrize("method,min_score", [("gaussian", 0.2), ("gaussian", 0.001), ("linear", 0.1)])
def test_device_softnms_matches_host(rng, method, min_score):
    segs, scores = _random_candidates(rng)
    sigma, iou_t, max_out = 0.75, 0.1, 20
    m_id = {"hard": 0, "linear": 1, "gaussian": 2}[method]
    h_segs, h_scores, _ = host_softnms(segs, scores, iou_t, sigma, min_score, m_id, max_out)

    d_segs, d_scores, d_valid = dev_nms.soft_nms(
        jnp.asarray(segs), jnp.asarray(scores), jnp.ones(len(segs), bool),
        max_out, iou_t, sigma, min_score, method)
    k = int(np.sum(np.asarray(d_valid)))
    assert k == len(h_scores)
    np.testing.assert_allclose(np.asarray(d_segs)[:k], h_segs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_scores)[:k], h_scores, atol=1e-5)


def test_device_hard_nms_matches_host(rng):
    segs, scores = _random_candidates(rng, n=40)
    inds = host_nms(segs, scores, 0.3, 15)
    d_segs, d_scores, d_valid = dev_nms.soft_nms(
        jnp.asarray(segs), jnp.asarray(scores), jnp.ones(len(segs), bool),
        15, 0.3, 0.5, 0.0, "hard")
    k = int(np.sum(np.asarray(d_valid)))
    assert k == len(inds)
    np.testing.assert_allclose(np.asarray(d_segs)[:k], segs[inds], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_scores)[:k], scores[inds], atol=1e-6)


def test_seg_voting_matches_reference_semantics(rng):
    import torch

    segs, scores = _random_candidates(rng, n=30)
    nms_segs = segs[:5]
    thresh = 0.5

    refined = np.asarray(dev_nms.seg_voting(
        jnp.asarray(nms_segs), jnp.ones(5, bool), jnp.asarray(segs),
        jnp.asarray(scores), thresh))

    # independent torch oracle following libs/utils/nms.py:67-101
    ns, als, asc = map(torch.from_numpy, (nms_segs, segs, scores))
    left = torch.maximum(ns[:, None, 0], als[None, :, 0])
    right = torch.minimum(ns[:, None, 1], als[None, :, 1])
    inter = (right - left).clamp(min=0)
    iou = inter / ((ns[:, 1] - ns[:, 0])[:, None] + (als[:, 1] - als[:, 0])[None, :] - inter)
    w = (iou >= thresh).float() * asc[None, :] * iou
    w = w / w.sum(dim=1, keepdim=True)
    ref = (w @ als).numpy()
    np.testing.assert_allclose(refined, ref, atol=1e-5)


def test_batched_nms_sorted_and_capped(rng):
    segs, scores = _random_candidates(rng, n=200)
    out_segs, out_scores, out_cls, out_valid = dev_nms.batched_nms(
        jnp.asarray(segs), jnp.asarray(scores),
        jnp.zeros(len(segs), jnp.int32), jnp.ones(len(segs), bool),
        num_classes=1, iou_threshold=0.1, min_score=0.001, max_seg_num=100,
        use_soft_nms=True, multiclass=False, sigma=0.75, voting_thresh=0.9)
    sc = np.asarray(out_scores)[np.asarray(out_valid)]
    assert len(sc) <= 100
    assert np.all(np.diff(sc) <= 1e-6)


def test_multiclass_nms_matches_per_class_host(rng):
    """Multiclass path == host soft-NMS run independently per class."""
    segs, scores = _random_candidates(rng, n=80)
    cls_idxs = rng.integers(0, 3, 80).astype(np.int32)
    iou_t, sigma, min_score, max_out = 0.1, 0.75, 0.2, 10

    o_segs, o_scores, o_cls, o_valid = dev_nms.batched_nms(
        jnp.asarray(segs), jnp.asarray(scores), jnp.asarray(cls_idxs),
        jnp.ones(80, bool), num_classes=3, iou_threshold=iou_t,
        min_score=min_score, max_seg_num=max_out, use_soft_nms=True,
        multiclass=True, sigma=sigma, voting_thresh=0.9)
    o_segs, o_scores, o_cls, o_valid = map(np.asarray,
                                           (o_segs, o_scores, o_cls, o_valid))

    expect = []
    for c in range(3):
        sel = cls_idxs == c
        h_segs, h_scores, _ = host_softnms(
            segs[sel], scores[sel], iou_t, sigma, min_score, 2, max_out)
        expect.extend((s, sc, c) for s, sc in zip(h_segs, h_scores))
    expect.sort(key=lambda x: -x[1])
    expect = expect[:max_out]

    k = int(o_valid.sum())
    assert k == len(expect)
    np.testing.assert_allclose(o_scores[:k], [e[1] for e in expect], atol=1e-5)
    np.testing.assert_array_equal(o_cls[:k], [e[2] for e in expect])


def _postprocess(segs, scores, valid, cfg):
    from audio_visual_deepfake_detection_tpu.infer.decode import (
        postprocess_batch)

    n = segs.shape[0]
    one = jnp.ones((1,), jnp.float32)
    return tuple(map(np.asarray, postprocess_batch(
        jnp.asarray(segs)[None], jnp.asarray(scores)[None],
        jnp.zeros((1, n), jnp.int32), jnp.asarray(valid)[None],
        one * 25.0, one * 100.0, one, one, cfg, num_classes=1)))


def test_nms_pre_topk_exact_when_covering(rng):
    """The serving preselect (nms_pre_topk) makes the same picks as the full
    run whenever K covers every valid candidate (scores/validity identical;
    voting coordinates may differ at float-epsilon because the gather
    reorders seg_voting's weighted accumulation)."""
    from audio_visual_deepfake_detection_tpu.infer.decode import TestConfig

    segs, scores = _random_candidates(rng, n=120)
    valid = scores > 0.1
    base = dict(pre_nms_thresh=0.001, pre_nms_topk=2000, iou_threshold=0.1,
                min_score=0.01, max_seg_num=15, nms_method="soft",
                nms_sigma=0.75, duration_thresh=0.001, multiclass_nms=False,
                voting_thresh=0.9)
    full = _postprocess(segs, scores, valid, TestConfig(**base))
    pre = _postprocess(segs, scores, valid,
                       TestConfig(**base, nms_pre_topk=int(valid.sum())))
    np.testing.assert_array_equal(full[1], pre[1])   # scores: same picks
    np.testing.assert_array_equal(full[3], pre[3])   # validity
    np.testing.assert_allclose(full[0], pre[0], atol=1e-5)  # voted segments


def test_nms_pre_topk_small_k_keeps_top_picks(rng):
    """With K = 4x max_seg_num on well-separated segments, the preselected
    run returns the same detections as the full run."""
    from audio_visual_deepfake_detection_tpu.infer.decode import TestConfig

    n = 200
    start = (rng.permutation(n) * 30.0).astype(np.float32)
    segs = np.stack([start, start + rng.uniform(2, 10, n).astype(np.float32)],
                    axis=1)
    scores = rng.uniform(0.2, 1.0, n).astype(np.float32)
    valid = np.ones(n, bool)
    base = dict(pre_nms_thresh=0.001, pre_nms_topk=2000, iou_threshold=0.1,
                min_score=0.01, max_seg_num=10, nms_method="soft",
                nms_sigma=0.75, duration_thresh=0.001, multiclass_nms=False,
                voting_thresh=0.9)
    full = _postprocess(segs, scores, valid, TestConfig(**base))
    pre = _postprocess(segs, scores, valid, TestConfig(**base, nms_pre_topk=40))
    k = int(full[3].sum())
    assert k == 10
    np.testing.assert_allclose(pre[0][0, :k], full[0][0, :k], atol=1e-5)
    np.testing.assert_allclose(pre[1][0, :k], full[1][0, :k], atol=1e-6)
