"""End-to-end smoke: raw tinydataset media -> features -> localizer ->
submission files."""

import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.byola import AudioNTT2020
from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
    Emotion2Vec, Emotion2VecConfig)
from audio_visual_deepfake_detection_tpu.frontends.pipeline import FeatureExtractor
from audio_visual_deepfake_detection_tpu.frontends.video import C3DVideoEncoder
from audio_visual_deepfake_detection_tpu.infer import TestConfig
from audio_visual_deepfake_detection_tpu.infer.results import generate_results
from audio_visual_deepfake_detection_tpu.infer.runner import (
    build_inference_fn, inference_one_epoch)
from audio_visual_deepfake_detection_tpu.models import ArchConfig
from audio_visual_deepfake_detection_tpu.train.state import init_model

TINY_DATA = "/root/reference/tinydataset/data"


@pytest.mark.skipif(not os.path.isdir(TINY_DATA), reason="tinydataset absent")
def test_feature_extraction_on_real_video(tmp_path):
    mp4 = sorted(glob.glob(os.path.join(TINY_DATA, "*", "*", "*", "*.mp4")))[0]
    extractor = FeatureExtractor(
        video_chunk=8,
        video_model=C3DVideoEncoder(n_features=(4, 6, 8, 8), out_dim=16),
        byola_model=AudioNTT2020(n_mels=64, d=32),
        emotion_model=Emotion2Vec(Emotion2VecConfig(
            embed_dim=32, depth=1, prenet_depth=1, num_heads=2)),
    )

    from audio_visual_deepfake_detection_tpu.preprocess.video_io import read_video_frames

    frames, fps = read_video_frames(mp4, max_frames=16)
    assert frames.ndim == 4 and frames.shape[-1] == 3 and fps > 0
    vfeat = extractor.video_features(frames)
    assert vfeat.shape == (frames.shape[0], 16)

    wav = np.random.default_rng(0).standard_normal(32000).astype(np.float32)
    bfeat = extractor.byola_features(wav)
    efeat = extractor.emotion_features(wav)
    assert bfeat.shape[1] == 32 and abs(bfeat.shape[0] - 25) <= 1   # 12.5 Hz
    assert efeat.shape[1] == 32 and abs(efeat.shape[0] - 100) <= 2  # 50 Hz


def test_inference_to_submission_files(tmp_path, rng):
    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=24, num_classes=1,
        max_seq_len=96, embd_dim=32, fpn_dim=32, head_dim=32, n_head=2,
        arch=(1, 1, 2), mha_win_size=(5, 5, -1),
        regression_range=((0, 4), (4, 8), (8, 10000)), droppath=0.1,
    )
    tcfg = TestConfig(pre_nms_thresh=0.001, pre_nms_topk=2000, min_score=0.001,
                      max_seg_num=20, nms_method="soft", nms_sigma=0.75,
                      duration_thresh=0.001, multiclass_nms=False,
                      voting_thresh=0.9)
    params, _ = init_model(cfg, 2, 0)
    infer_fn = build_inference_fn(cfg, tcfg)

    def batches():
        for i in range(2):
            yield {
                "feats": rng.standard_normal((2, 96, 24)).astype(np.float32),
                "mask": np.ones((2, 96), bool),
                "fps": np.full((2,), 25.0, np.float32),
                "duration": np.full((2,), 9.6, np.float32),
                "feat_stride": np.full((2,), 0.3, np.float32),
                "feat_num_frames": np.full((2,), 0.3, np.float32),
                "video_ids": [f"vid{i}_{j}.mp4" for j in range(2)],
            }

    shard_dir = tmp_path / "1"
    results, items = inference_one_epoch(
        batches(), infer_fn, params, output_folder=str(shard_dir), flush_every=3)
    assert len(items) == 4
    # streamed flush produced at least one data*.json
    assert glob.glob(str(shard_dir / "data*.json"))

    # collect_items=False (the sharded-sweep CLI mode): nothing retained in
    # memory, identical flush files on disk
    shard_dir2 = tmp_path / "nocollect"
    r2, i2 = inference_one_epoch(
        batches(), infer_fn, params, output_folder=str(shard_dir2),
        flush_every=3, collect_items=False)
    assert r2 is None and i2 is None
    flushed = []
    for f in sorted(glob.glob(str(shard_dir2 / "data*.json"))):
        flushed.extend(json.load(open(f)))
    assert len(flushed) == 4
    assert sorted(it["video_id"] for it in flushed) == \
        sorted(it["video_id"] for it in items)

    n_txt, n_json = generate_results(str(tmp_path), num_shards=1)
    assert n_txt == 4 and n_json == 4
    blob = json.load(open(tmp_path / "prediction.json"))
    for vid, segs in blob.items():
        assert isinstance(segs, list) and len(segs) >= 1
        for score, s, e in segs:
            if [score, s, e] != [0, 0, 0]:
                assert score > 0.2 and 0 <= s <= e <= 9.6 + 1e-5
    txt = (tmp_path / "prediction.txt").read_text().splitlines()
    assert len(txt) == 4
    for line in txt:
        vid, prob = line.split(";")
        assert 0.0 <= float(prob) <= 1.0


@pytest.mark.skipif(not os.path.isdir(TINY_DATA), reason="tinydataset absent")
def test_extract_all_uses_mp4_audio_track(tmp_path):
    """Without a wav farm, extract_all pulls audio straight from the mp4
    (native decoder) — all three streams come back at their true rates."""
    from audio_visual_deepfake_detection_tpu.runtime import host_media

    if not host_media.available():
        pytest.skip("native media decoder unavailable")
    mp4 = sorted(glob.glob(os.path.join(TINY_DATA, "*", "*", "*", "real.mp4")))[0]
    extractor = FeatureExtractor(
        video_chunk=8,
        video_model=C3DVideoEncoder(n_features=(4, 6, 8, 8), out_dim=16),
        byola_model=AudioNTT2020(n_mels=64, d=32),
        emotion_model=Emotion2Vec(Emotion2VecConfig(
            embed_dim=32, depth=1, prenet_depth=1, num_heads=2)),
    )
    feats = extractor.extract_all(mp4, wav_path=None)
    assert set(feats) == {"video", "byola", "emotion"}
    meta = json.load(open(mp4.replace("/data/", "/metadata/")
                          .replace(".mp4", ".json")))
    dur = meta["audio_frames"] / 16000.0
    assert feats["video"].shape[0] == meta["video_frames"]
    # ~12.5 Hz and 50 Hz rows for the real decoded duration
    assert abs(feats["byola"].shape[0] - 12.5 * dur) <= 2
    assert abs(feats["emotion"].shape[0] - 50 * dur) <= 2
