"""Device-resample (online) inference path.

The reference resamples every stream to T=768 per-sample on the CPU
dataloader (deepfake_video_audio.py:996-1018). The online path moves that
resample + concat + per-video stride math (:461, :970-987) into the
inference jit; these tests check it is equivalent to the host-resample path.
"""

import numpy as np
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.data.dataset import linear_resample_np
from audio_visual_deepfake_detection_tpu.infer.decode import TestConfig
from audio_visual_deepfake_detection_tpu.infer.runner import (
    build_inference_fn, build_online_inference_fn, collate_streams)
from audio_visual_deepfake_detection_tpu.models import ArchConfig
from audio_visual_deepfake_detection_tpu.ops.resample import (
    linear_resample_dynamic, linear_resample_time)
from audio_visual_deepfake_detection_tpu.train.state import init_model


def test_dynamic_resample_matches_host(rng):
    out_len = 96
    for in_len in (1, 5, 37, 96, 121, 400):
        x = rng.standard_normal((3, 400, 8)).astype(np.float32)
        x[:, in_len:] = 0.0
        got = np.asarray(linear_resample_dynamic(
            jnp.asarray(x), jnp.full((3,), in_len, np.int32), out_len))
        want = np.stack([linear_resample_np(x[i, :in_len], out_len)
                         for i in range(3)])
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=str(in_len))


def test_dynamic_resample_ragged_batch(rng):
    lens = np.asarray([7, 50, 200], np.int32)
    x = rng.standard_normal((3, 200, 4)).astype(np.float32)
    for i, l in enumerate(lens):
        x[i, l:] = 0.0
    got = np.asarray(linear_resample_dynamic(jnp.asarray(x), jnp.asarray(lens), 96))
    for i, l in enumerate(lens):
        want = linear_resample_np(x[i, :l], 96)
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_dynamic_matches_static_resampler(rng):
    x = rng.standard_normal((2, 50, 6)).astype(np.float32)
    got = np.asarray(linear_resample_dynamic(
        jnp.asarray(x), jnp.full((2,), 50, np.int32), 96))
    want = np.asarray(linear_resample_time(jnp.asarray(x), 96, axis=1))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_online_inference_matches_host_path(rng):
    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=24, num_classes=1,
        max_seq_len=96, embd_dim=32, fpn_dim=32, head_dim=32, n_head=2,
        arch=(1, 1, 2), mha_win_size=(5, 5, -1),
        regression_range=((0, 4), (4, 8), (8, 10000)),
    )
    test_cfg = TestConfig(
        pre_nms_thresh=0.001, pre_nms_topk=50, iou_threshold=0.1,
        min_score=0.01, max_seg_num=10, nms_method="soft", nms_sigma=0.75,
        duration_thresh=0.001, multiclass_nms=False, voting_thresh=0.9)
    ds_feat_stride, ds_num_frames = 4.0, 16.0

    B = 4
    params, _ = init_model(cfg, B, seed=0)

    # raw ragged streams: "video" 16-d and "audio" 8-d at different rates
    samples = []
    for i in range(B):
        v_rows = 40 + 13 * i
        a_rows = 25 + 7 * i
        dur = v_rows / 25.0
        samples.append({
            "video_id": f"v{i}.mp4",
            "streams": [
                rng.standard_normal((v_rows, 16)).astype(np.float32),
                rng.standard_normal((a_rows, 8)).astype(np.float32),
            ],
            "duration": dur,
        })

    # host path: per-sample resample + concat (what DeepfakeInferenceDataset
    # does with device_resample=False)
    feats = np.zeros((B, cfg.max_seq_len, 24), np.float32)
    fps = np.zeros((B,), np.float32)
    dur = np.zeros((B,), np.float32)
    stride = np.zeros((B,), np.float32)
    for i, s in enumerate(samples):
        parts = [linear_resample_np(x, cfg.max_seq_len) for x in s["streams"]]
        feats[i] = np.concatenate(parts, axis=1)
        v_rows = s["streams"][0].shape[0]
        fps[i] = v_rows / s["duration"]
        dur[i] = s["duration"]
        stride[i] = ((v_rows - 1) * ds_feat_stride + ds_num_frames) / cfg.max_seq_len
    mask = np.ones((B, cfg.max_seq_len), bool)
    host_fn = build_inference_fn(cfg, test_cfg)
    ref = host_fn(params, jnp.asarray(feats), jnp.asarray(mask),
                  jnp.asarray(fps), jnp.asarray(dur), jnp.asarray(stride),
                  jnp.asarray(stride))
    ref = [np.asarray(x) for x in ref]

    # online path: raw streams in, resample on device
    streams, rows, duration, video_ids = collate_streams(
        samples, caps=[128, 64])
    online_fn = build_online_inference_fn(cfg, test_cfg,
                                          ds_feat_stride, ds_num_frames)
    got = online_fn(params, tuple(map(jnp.asarray, streams)),
                    tuple(map(jnp.asarray, rows)), jnp.asarray(duration))
    got = [np.asarray(x) for x in got]

    assert video_ids == [f"v{i}.mp4" for i in range(B)]
    for g, r, name in zip(got, ref, ("segs", "scores", "cls", "valid", "video_cls")):
        np.testing.assert_allclose(g, r, atol=1e-4, err_msg=name)


def test_collate_streams_cap_guard(rng):
    samples = [{"video_id": "a.mp4", "duration": 1.0,
                "streams": [rng.standard_normal((30, 4)).astype(np.float32)]}]
    try:
        collate_streams(samples, caps=[16])
        assert False, "expected cap assertion"
    except AssertionError as e:
        assert "cap" in str(e)
