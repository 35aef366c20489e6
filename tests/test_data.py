"""Data layer tests on the reference tinydataset metadata + synthetic features."""

import json
import os
import glob

import numpy as np
import pytest

from audio_visual_deepfake_detection_tpu.data import (
    DeepfakeDataset, DeepfakeInferenceDataset, DataLoader, collate_batch,
    linear_resample_np)
from audio_visual_deepfake_detection_tpu.data import metadata as md

TINY_META = "/root/reference/tinydataset/metadata"


def _tiny_rel_jsons():
    out = []
    for path in sorted(glob.glob(os.path.join(TINY_META, "*", "*", "*", "*.json"))):
        out.append(os.path.relpath(path, TINY_META))
    return out


@pytest.fixture(scope="module")
def feature_root(tmp_path_factory):
    """Synthetic .npy features with realistic row counts for every tiny video."""
    root = tmp_path_factory.mktemp("feats")
    rng = np.random.default_rng(0)
    rels = _tiny_rel_jsons()
    for rel in rels:
        meta = md.load_video_meta(TINY_META, rel)
        rel_npy = rel.replace(".json", ".npy")
        for sub, rows, dim in [
            ("video", max(int(round(meta.fps * meta.duration)), 8), 256),
            ("byola", int(np.ceil(12.5 * meta.duration)) + 2, 2048),
            ("emotion", int(np.ceil(50 * meta.duration)) + 2, 768),
        ]:
            path = root / sub / rel_npy
            path.parent.mkdir(parents=True, exist_ok=True)
            np.save(path, rng.standard_normal((rows, dim)).astype(np.float32))
    (root / "train.txt").write_text("\n".join(rels))
    return root


def dataset_cfg(root):
    return {
        "video_feat_folder": str(root / "video"),
        "audio_byola_feat_folder": str(root / "byola"),
        "audio_emo_feat_folder": str(root / "emotion"),
        "train_txt": str(root / "train.txt"),
        "json_folder": TINY_META,
        "feat_stride": 1, "num_frames": 1, "default_fps": None,
        "downsample_rate": 0, "max_seq_len": 768, "trunc_thresh": 0.5,
        "crop_ratio": [0.9, 1.0], "num_classes": 1, "force_upsampling": True,
    }


def test_metadata_parsing():
    rels = _tiny_rel_jsons()
    assert len(rels) == 12
    meta = md.load_video_meta(TINY_META, rels[0])
    assert meta.duration > 0 and meta.fps > 0
    # filename-based AV labels
    assert md.av_labels_from_name("a/b/real.json") == (1, 1)
    assert md.av_labels_from_name("a/b/fake_video_fake_audio.json") == (0, 0)
    assert md.av_labels_from_name("a/b/unknown.json") == (-1, -1)


def test_train_dataset_sample(feature_root):
    ds = DeepfakeDataset("deepfake_video_audioEmoBYOLA_THE", True, ["train"],
                         dataset_cfg(feature_root))
    rng = np.random.default_rng(3)
    n_with_segments = 0
    for i in range(len(ds)):
        s = ds.__getitem__(i, rng)
        t, c = s["feats"].shape
        assert c == 256 + 2048 + 768
        assert t <= 768
        if s["segments"] is not None:
            n_with_segments += 1
            assert s["segments"].shape[1] == 2
            assert s["gt_frame_labels"] is not None
            assert s["gt_frame_labels"].shape == (768,)
        # segment grid math: seg_sec * fps / stride - 0.5
        assert 0 < s["feat_stride"] < 2
        np.testing.assert_allclose(s["feat_num_frames"], s["feat_stride"])
    # 9 of 12 tiny videos are fakes with segments
    assert n_with_segments == 9


def test_resample_row_truncation(feature_root):
    cfg = dataset_cfg(feature_root)
    ds = DeepfakeDataset("deepfake_video_audioEmoBYOLA", False, ["train"], cfg)
    s = ds.__getitem__(0, np.random.default_rng(0))
    assert s["feats"].shape == (768, 3072)


def test_collate_and_loader(feature_root):
    ds = DeepfakeDataset("deepfake_video_audioEmoBYOLA", True, ["train"],
                         dataset_cfg(feature_root))

    def collate(samples):
        return collate_batch(samples, 768, max_gt=8)

    loader = DataLoader(ds, batch_size=4, collate=collate, shuffle=True,
                        drop_last=True, num_workers=2, seed=5)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["feats"].shape == (4, 768, 3072)
    assert b["mask"].shape == (4, 768)
    assert b["gt_segments"].shape == (4, 8, 2)
    assert b["has_gt"].dtype == bool
    # mask covers the (possibly cropped) features
    assert b["mask"].sum() > 0

    # determinism: same seed+epoch -> same order
    loader2 = DataLoader(ds, batch_size=4, collate=collate, shuffle=True,
                         drop_last=True, num_workers=2, seed=5)
    b2 = next(iter(loader2))
    assert b2["video_ids"] == b["video_ids"]
    np.testing.assert_allclose(b2["feats"], b["feats"])


def test_inference_dataset(feature_root, tmp_path):
    rels = _tiny_rel_jsons()
    lines = []
    for rel in rels[:5]:
        meta = md.load_video_meta(TINY_META, rel)
        lines.append(f"{rel.replace('.json', '.mp4')},{meta.duration}")
    shard_dir = tmp_path / "test_folder"
    shard_dir.mkdir()
    (shard_dir / "deepfake_test_sub1.txt").write_text("\n".join(lines))

    cfg = dataset_cfg(feature_root)
    cfg["test_folder"] = str(shard_dir)
    ds = DeepfakeInferenceDataset("deepfake_video_audioEmoBYOLA_inference",
                                  ["test"], 1, cfg)
    assert len(ds) == 5
    s = ds[0]
    assert s["feats"].shape == (768, 3072)
    assert s["fps"] > 0 and s["feat_stride"] > 0


def test_error_item_fallback(feature_root):
    """A corrupt npy must fall back to the neighboring sample."""
    ds = DeepfakeDataset("deepfake_video_audioEmoBYOLA", True, ["train"],
                         dataset_cfg(feature_root))
    bad = os.path.join(str(feature_root / "video"),
                       ds.data_list[0].replace(".json", ".npy"))
    backup = open(bad, "rb").read()
    try:
        with open(bad, "wb") as f:
            f.write(b"not-an-npy")
        s = ds.__getitem__(0, np.random.default_rng(0))
        assert s["video_id"] == ds.data_list[1].replace(".json", ".mp4")
    finally:
        with open(bad, "wb") as f:
            f.write(backup)


def test_other_inference_dataset_variants(feature_root, tmp_path):
    """deepfake_video_audio_inference / *_BYOLA_inference stream selection."""
    rels = _tiny_rel_jsons()[:2]
    lines = []
    for rel in rels:
        meta = md.load_video_meta(TINY_META, rel)
        lines.append(f"{rel.replace('.json', '.mp4')},{meta.duration}")
    shard_dir = tmp_path / "test_folder"
    shard_dir.mkdir()
    (shard_dir / "deepfake_test_sub1.txt").write_text("\n".join(lines))
    cfg = dataset_cfg(feature_root)
    cfg["test_folder"] = str(shard_dir)

    ds = DeepfakeInferenceDataset("deepfake_video_audio_inference", ["test"], 1, cfg)
    assert ds[0]["feats"].shape == (768, 256 + 768)   # video + emotion
    ds = DeepfakeInferenceDataset("deepfake_video_audioBYOLA_inference", ["test"], 1, cfg)
    assert ds[0]["feats"].shape == (768, 256 + 2048)  # video + byola


def test_loader_multihost_sharding(feature_root):
    """Two shard ranks cover the dataset disjointly with the same seed."""
    ds = DeepfakeDataset("deepfake_video_audioEmoBYOLA", True, ["train"],
                         dataset_cfg(feature_root))

    def collate(samples):
        return collate_batch(samples, 768, max_gt=8)

    seen = []
    for rank in (0, 1):
        loader = DataLoader(ds, batch_size=2, collate=collate, shuffle=True,
                            num_workers=2, seed=5, shard_rank=rank, num_shards=2)
        ids = []
        for b in loader:
            ids.extend(b["video_ids"])
        seen.append(set(ids))
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == len(ds)


def test_config_system(tmp_path):
    """YAML over defaults: YAML wins, dims propagate into model cfg."""
    import yaml
    from audio_visual_deepfake_detection_tpu.core import (
        arch_config_from, load_config, test_config_from)

    cfg_yaml = {
        "dataset_name": "deepfake_video_audioEmoBYOLA",
        "model_name": "AVLocPointTransformerRecoveryNoNormNorecon",
        "dataset": {"video_input_dim": 256, "audio_input_dim": 2816,
                    "max_seq_len": 768, "num_classes": 1},
        "model": {"embd_dim": 256, "n_mha_win_size": [7, 7, 7, 7, 7, -1]},
        "test_cfg": {"min_score": 0.2, "nms_sigma": 0.75},
        "opt": {"learning_rate": 0.001},
    }
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg_yaml))
    config = load_config(str(path))
    # defaults filled in
    assert config["train_cfg"]["center_sample"] == "radius"
    assert config["opt"]["warmup_epochs"] == 5
    # propagation into model (reference _update_config, config.py:149-157)
    assert config["model"]["video_input_dim"] == 256
    assert config["model"]["test_cfg"]["min_score"] == 0.2

    arch = arch_config_from(config)
    assert arch.input_dim == 3072 and arch.variant == "av_recovery_norecon"
    tcfg = test_config_from(config)
    assert tcfg.min_score == 0.2 and tcfg.nms_sigma == 0.75


def test_config_empty_and_non_mapping_files(tmp_path):
    """Empty / comments-only YAML -> pure defaults; a non-mapping file raises
    a clear error instead of an opaque TypeError inside the merge."""
    import pytest
    from audio_visual_deepfake_detection_tpu.core import load_config
    from audio_visual_deepfake_detection_tpu.core.config import default_config

    empty = tmp_path / "empty.yaml"
    empty.write_text("# just a comment\n")
    config = load_config(str(empty))
    assert config["test_cfg"]["pre_nms_topk"] == \
        default_config()["test_cfg"]["pre_nms_topk"]

    bad = tmp_path / "bad.yaml"
    bad.write_text("- a\n- b\n")
    with pytest.raises(ValueError, match="mapping"):
        load_config(str(bad))


def test_test_config_defaults_match_config_defaults():
    """A directly-constructed TestConfig must prune identically to a
    config-loaded one (both mirror reference libs/core/config.py:104-116)."""
    from audio_visual_deepfake_detection_tpu.core.config import default_config
    from audio_visual_deepfake_detection_tpu.infer import TestConfig

    t = default_config()["test_cfg"]
    tc = TestConfig()
    assert tc.pre_nms_thresh == t["pre_nms_thresh"]
    assert tc.pre_nms_topk == t["pre_nms_topk"]
    assert tc.iou_threshold == t["iou_threshold"]
    assert tc.min_score == t["min_score"]
    assert tc.max_seg_num == t["max_seg_num"]
    assert tc.nms_sigma == t["nms_sigma"]
    assert tc.duration_thresh == t["duration_thresh"]
    assert tc.multiclass_nms == t["multiclass_nms"]
    assert tc.voting_thresh == t["voting_thresh"]


def test_loader_propagates_collate_errors():
    """A collate/getitem exception must surface to the consumer, not hang the
    prefetch queue (found by driving inference.py with too-small stream caps)."""
    from audio_visual_deepfake_detection_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i, rng=None):
            return {"x": i}

    def bad_collate(samples):
        raise ValueError("collate boom")

    loader = DataLoader(DS(), 4, bad_collate, num_workers=2)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="collate boom"):
        list(loader)

    class BadDS(DS):
        def __getitem__(self, i, rng=None):
            raise OSError("corrupt npy")

    loader = DataLoader(BadDS(), 4, lambda s: s, num_workers=2)
    with _pytest.raises(OSError, match="corrupt npy"):
        list(loader)
