"""Dynamic-batching localizer service: results match the direct batched call."""

import numpy as np
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.infer import TestConfig
from audio_visual_deepfake_detection_tpu.infer.runner import build_inference_fn
from audio_visual_deepfake_detection_tpu.infer.service import LocalizerService
from audio_visual_deepfake_detection_tpu.models import ArchConfig
from audio_visual_deepfake_detection_tpu.train.state import init_model


def test_service_matches_direct_call(rng):
    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=24, num_classes=1,
        max_seq_len=96, embd_dim=32, fpn_dim=32, head_dim=32, n_head=2,
        arch=(1, 1, 2), mha_win_size=(5, 5, -1),
        regression_range=((0, 4), (4, 8), (8, 10000)), droppath=0.1,
    )
    tcfg = TestConfig(pre_nms_thresh=0.001, pre_nms_topk=2000, min_score=0.001,
                      max_seg_num=10, nms_method="soft", nms_sigma=0.75,
                      duration_thresh=0.001, multiclass_nms=False,
                      voting_thresh=0.9)
    params, _ = init_model(cfg, 4, 0)

    n = 6
    feats = [rng.standard_normal((96, 24)).astype(np.float32) for _ in range(n)]
    metas = [(25.0, 3.8, 0.3) for _ in range(n)]

    service = LocalizerService(cfg, tcfg, params, batch_size=4, max_wait_ms=20)
    futures = [service.submit(f, fps, dur, stride)
               for f, (fps, dur, stride) in zip(feats, metas)]
    results = [f.result(timeout=300) for f in futures]
    service.stop()

    # direct batched reference (shape 4, padded)
    infer_fn = build_inference_fn(cfg, tcfg)
    direct = []
    for start in range(0, n, 4):
        chunk = feats[start:start + 4]
        b = 4
        fb = np.zeros((b, 96, 24), np.float32)
        for i, f in enumerate(chunk):
            fb[i] = f
        segs, scores, cls_idxs, valid, video_cls = map(np.asarray, infer_fn(
            params, jnp.asarray(fb), jnp.ones((b, 96), bool),
            jnp.full((b,), 25.0), jnp.full((b,), 3.8),
            jnp.full((b,), 0.3), jnp.full((b,), 0.3)))
        for i in range(len(chunk)):
            k = valid[i]
            direct.append((segs[i][k], scores[i][k], float(video_cls[i, 0])))

    for res, (d_segs, d_scores, d_cls) in zip(results, direct):
        np.testing.assert_allclose(res.segments, d_segs, atol=1e-5)
        np.testing.assert_allclose(res.scores, d_scores, atol=1e-5)
        np.testing.assert_allclose(res.video_cls, d_cls, atol=1e-5)


def test_service_streams_entry_matches_host_pipeline(rng):
    """submit_streams resamples raw ragged streams like the dataset layer and
    yields the same detections as submitting the resampled features."""
    from audio_visual_deepfake_detection_tpu.data.dataset import resample_concat_np

    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=24, num_classes=1,
        max_seq_len=96, embd_dim=32, fpn_dim=32, head_dim=32, n_head=2,
        arch=(1, 1, 2), mha_win_size=(5, 5, -1),
        regression_range=((0, 4), (4, 8), (8, 10000)), droppath=0.1,
    )
    tcfg = TestConfig(pre_nms_thresh=0.001, pre_nms_topk=2000, min_score=0.001,
                      max_seg_num=10, nms_method="soft", nms_sigma=0.75,
                      duration_thresh=0.001, multiclass_nms=False,
                      voting_thresh=0.9)
    params, _ = init_model(cfg, 2, 0)
    service = LocalizerService(cfg, tcfg, params, batch_size=2, max_wait_ms=5,
                               ds_feat_stride=4.0, ds_num_frames=16.0)
    try:
        streams = [rng.standard_normal((53, 16)).astype(np.float32),
                   rng.standard_normal((29, 8)).astype(np.float32)]
        dur = 53 / 25.0
        via_streams = service.localize_streams(streams, dur)

        feats = resample_concat_np(streams, cfg.max_seq_len)
        v_rows = streams[0].shape[0]
        stride = ((v_rows - 1) * 4.0 + 16.0) / cfg.max_seq_len
        via_feats = service.localize(feats, v_rows / dur, dur, stride, stride)

        np.testing.assert_allclose(via_streams.segments, via_feats.segments,
                                   atol=1e-5)
        np.testing.assert_allclose(via_streams.scores, via_feats.scores,
                                   atol=1e-6)
        assert via_streams.video_cls == via_feats.video_cls
    finally:
        service.stop()


def test_service_buckets_match_full_batch(rng):
    """Bucketed flushes (pad to the smallest tier >= n) give the same
    detections as the full-batch service."""
    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=24, num_classes=1,
        max_seq_len=96, embd_dim=32, fpn_dim=32, head_dim=32, n_head=2,
        arch=(1, 1, 2), mha_win_size=(5, 5, -1),
        regression_range=((0, 4), (4, 8), (8, 10000)), droppath=0.1,
    )
    tcfg = TestConfig(pre_nms_thresh=0.001, pre_nms_topk=2000, min_score=0.001,
                      max_seg_num=10, nms_method="soft", nms_sigma=0.75,
                      duration_thresh=0.001, multiclass_nms=False,
                      voting_thresh=0.9)
    params, _ = init_model(cfg, 4, 0)
    feats = rng.standard_normal((96, 24)).astype(np.float32)

    svc_full = LocalizerService(cfg, tcfg, params, batch_size=4, max_wait_ms=1)
    a = svc_full.localize(feats, 25.0, 3.8, 0.3)
    svc_full.stop()

    svc_bkt = LocalizerService(cfg, tcfg, params, batch_size=4, max_wait_ms=1,
                               batch_buckets=[1, 4], warmup=True)
    b = svc_bkt.localize(feats, 25.0, 3.8, 0.3)
    svc_bkt.stop()

    np.testing.assert_allclose(b.segments, a.segments, atol=1e-5)
    np.testing.assert_allclose(b.scores, a.scores, atol=1e-5)
    # different batch tiers compile different programs; XLA fusion ordering
    # differs at float-rounding level
    np.testing.assert_allclose(b.video_cls, a.video_cls, atol=1e-5)


def test_service_rejects_malformed_submit_and_survives(rng):
    """Shape validation happens in submit() (caller's thread): malformed
    requests raise immediately instead of poisoning the shared batch, and the
    worker keeps serving well-formed requests afterwards."""
    import pytest

    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=24, num_classes=1,
        max_seq_len=96, embd_dim=32, fpn_dim=32, head_dim=32, n_head=2,
        arch=(1, 1, 2), mha_win_size=(5, 5, -1),
        regression_range=((0, 4), (4, 8), (8, 10000)), droppath=0.1,
    )
    tcfg = TestConfig(pre_nms_thresh=0.001, pre_nms_topk=2000, min_score=0.001,
                      max_seg_num=10, nms_method="soft", nms_sigma=0.75,
                      duration_thresh=0.001, multiclass_nms=False,
                      voting_thresh=0.9)
    params, _ = init_model(cfg, 2, 0)
    service = LocalizerService(cfg, tcfg, params, batch_size=2, max_wait_ms=5)
    try:
        with pytest.raises(ValueError, match="feats"):   # wrong channel dim
            service.submit(np.zeros((96, 23), np.float32), 25.0, 3.8, 0.3)
        with pytest.raises(ValueError, match="max_seq_len"):  # too long
            service.submit(np.zeros((97, 24), np.float32), 25.0, 3.8, 0.3)
        with pytest.raises(ValueError, match="mask"):    # mask/feats mismatch
            service.submit(np.zeros((40, 24), np.float32), 25.0, 3.8, 0.3,
                           mask=np.ones(17, bool))
        # short mask matching the unpadded length is padded like feats
        short = service.submit(
            rng.standard_normal((40, 24)).astype(np.float32),
            25.0, 3.8, 0.3, mask=np.ones(40, bool))
        assert short.result(timeout=300).segments.ndim == 2
        # the worker is alive and still answers
        ok = service.submit(rng.standard_normal((96, 24)).astype(np.float32),
                            25.0, 3.8, 0.3)
        assert ok.result(timeout=300).segments.ndim == 2
    finally:
        assert service.stop() is True  # drained within the test


def test_service_stop_drains_and_rejects(rng):
    """stop() answers everything already queued, is idempotent, and a submit
    after stop raises instead of hanging forever."""
    import pytest

    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=24, num_classes=1,
        max_seq_len=96, embd_dim=32, fpn_dim=32, head_dim=32, n_head=2,
        arch=(1, 1, 2), mha_win_size=(5, 5, -1),
        regression_range=((0, 4), (4, 8), (8, 10000)), droppath=0.1,
    )
    tcfg = TestConfig(pre_nms_thresh=0.001, pre_nms_topk=2000, min_score=0.001,
                      max_seg_num=10, nms_method="soft", nms_sigma=0.75,
                      duration_thresh=0.001, multiclass_nms=False,
                      voting_thresh=0.9)
    params, _ = init_model(cfg, 2, 0)
    service = LocalizerService(cfg, tcfg, params, batch_size=2, max_wait_ms=5)
    futs = [service.submit(rng.standard_normal((96, 24)).astype(np.float32),
                           25.0, 3.8, 0.3) for _ in range(3)]
    service.stop()
    for f in futs:  # queued before stop -> still answered
        assert f.result(timeout=300).segments.ndim == 2
    service.stop()  # idempotent
    with pytest.raises(RuntimeError, match="stopped"):
        service.submit(np.zeros((96, 24), np.float32), 25.0, 3.8, 0.3)
