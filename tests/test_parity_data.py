"""Data-layer + loss parity against the actual reference implementation.

Runs the reference Dataset class (torch) and our DeepfakeDataset over the SAME
synthetic feature files + tinydataset metadata and compares every field, then
compares loss values through both meta-arch implementations.
"""

import glob
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.data import DeepfakeDataset
from audio_visual_deepfake_detection_tpu.models import (
    ArchConfig, AVLocalizer, compute_losses, label_points, model_points)
from audio_visual_deepfake_detection_tpu.tools.convert_torch import convert_state_dict
from reference_oracle import load_reference_modeling, reference_model_kwargs

TINY_META = "/root/reference/tinydataset/metadata"


def _load_reference_datasets():
    """Import libs.datasets.deepfake_video_audio (needs libs.datasets pkg)."""
    load_reference_modeling()  # installs stubs + sys.path
    import importlib

    return importlib.import_module("libs.datasets.deepfake_video_audio")


def _tiny_rel_jsons():
    return [os.path.relpath(p, TINY_META) for p in sorted(
        glob.glob(os.path.join(TINY_META, "*", "*", "*", "*.json")))]


@pytest.fixture(scope="module")
def feature_root(tmp_path_factory):
    from audio_visual_deepfake_detection_tpu.data import metadata as md

    root = tmp_path_factory.mktemp("parity_feats")
    rng = np.random.default_rng(11)
    rels = _tiny_rel_jsons()
    for rel in rels:
        meta = md.load_video_meta(TINY_META, rel)
        rel_npy = rel.replace(".json", ".npy")
        for sub, rows, dim in [
            ("video", max(int(round(meta.fps * meta.duration)), 8), 16),
            ("byola", int(np.ceil(12.5 * meta.duration)) + 2, 32),
            ("emotion", int(np.ceil(50 * meta.duration)) + 2, 16),
        ]:
            path = root / sub / rel_npy
            path.parent.mkdir(parents=True, exist_ok=True)
            np.save(path, rng.standard_normal((rows, dim)).astype(np.float32))
    (root / "train.txt").write_text("\n".join(rels))
    return root


def test_dataset_output_parity(feature_root):
    ds_mod = _load_reference_datasets()
    common = dict(
        is_training=True, split=["train"],
        video_feat_folder=str(feature_root / "video"),
        audio_feat_folder=None,
        audio_byola_feat_folder=str(feature_root / "byola"),
        audio_emo_feat_folder=str(feature_root / "emotion"),
        train_txt=str(feature_root / "train.txt"),
        json_folder=TINY_META,
        feat_stride=1, num_frames=1, default_fps=None, downsample_rate=0,
        max_seq_len=768, trunc_thresh=0.5, crop_ratio=None,  # deterministic
        video_input_dim=16, audio_input_dim=48, num_classes=1,
        file_prefix=None, file_ext=".npy", audio_file_ext=".npy",
        force_upsampling=True,
    )
    # the THE dataset class is registered last under this name
    ref_ds = ds_mod.DeepFakeVideoAudioDataset(**common)

    our_cfg = {
        "video_feat_folder": str(feature_root / "video"),
        "audio_byola_feat_folder": str(feature_root / "byola"),
        "audio_emo_feat_folder": str(feature_root / "emotion"),
        "train_txt": str(feature_root / "train.txt"),
        "json_folder": TINY_META,
        "feat_stride": 1, "num_frames": 1, "default_fps": None,
        "downsample_rate": 0, "max_seq_len": 768, "trunc_thresh": 0.5,
        "crop_ratio": None, "num_classes": 1, "force_upsampling": True,
    }
    ours = DeepfakeDataset("deepfake_video_audioEmoBYOLA_THE", True, ["train"],
                           our_cfg)

    assert len(ref_ds) == len(ours) == 12
    rng = np.random.default_rng(0)
    for i in range(len(ours)):
        ref = ref_ds[i]
        mine = ours.__getitem__(i, rng)
        assert mine["video_id"] == ref["video_id"]
        np.testing.assert_allclose(
            mine["feats"], ref["feats"].numpy().T, atol=2e-4,
            err_msg=f"feats mismatch for {mine['video_id']}")
        np.testing.assert_allclose(mine["fps"], ref["fps"], rtol=1e-6)
        np.testing.assert_allclose(mine["duration"], ref["duration"], rtol=1e-6)
        np.testing.assert_allclose(mine["feat_stride"], ref["feat_stride"], rtol=1e-6)
        if ref["segments"] is None:
            assert mine["segments"] is None
        else:
            np.testing.assert_allclose(mine["segments"], ref["segments"].numpy(),
                                       atol=1e-4)
            np.testing.assert_array_equal(mine["labels"], ref["labels"].numpy())
            np.testing.assert_allclose(mine["gt_frame_labels"],
                                       ref["gt_frame_labels"].numpy(), atol=0)
        np.testing.assert_array_equal(mine["av_labels"], np.asarray(ref["av_labels"]))


def test_loss_parity():
    """label_points + losses: same inputs -> same loss values as the
    reference meta-arch (av_fd_no_recon.py:481-707)."""
    modeling = load_reference_modeling()
    kwargs = reference_model_kwargs(max_seq_len=192)
    torch.manual_seed(3)
    ref = modeling.make_meta_arch("AVLocPointTransformerRecoveryNoNormNorecon",
                                  **kwargs)
    ref.eval()
    ref.train_label_smoothing = 0.1
    ref.train_loss_weight = 2.0
    ref.loss_normalizer = 200.0

    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=64, num_classes=1,
        max_seq_len=192, embd_dim=32, fpn_dim=32, head_dim=32, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.1,
    )
    ours = AVLocalizer(cfg)
    feats0 = jnp.zeros((2, 192, 64))
    mask0 = jnp.ones((2, 192), bool)
    template = ours.init(jax.random.PRNGKey(0), feats0, mask0, train=False)
    params = {"params": convert_state_dict(ref.state_dict(), template["params"])}

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 192, 64)).astype(np.float32)
    # sample 0: one fake segment on the grid; sample 1: real (no segments)
    seg_np = np.asarray([[20.0, 60.0]], np.float32)

    # ---- reference loss path (forward pieces + label_points + losses)
    x_t = torch.from_numpy(x).permute(0, 2, 1)
    mask_t = torch.ones(2, 1, 192, dtype=torch.bool)
    with torch.no_grad():
        norm_inputs, _, cls_scores = ref.interpolator(x_t, mask_t)
        bfeats, bmasks = ref.backbone(x_t, norm_inputs, x_t, mask_t)
        fpn_feats, fpn_masks = ref.neck(bfeats, bmasks)
        points = ref.point_generator(fpn_feats)
        out_cls = [t.permute(0, 2, 1) for t in ref.cls_head(fpn_feats, fpn_masks)]
        out_off = [t.permute(0, 2, 1) for t in ref.reg_head(fpn_feats, fpn_masks)]
        fpn_masks_sq = [m.squeeze(1) for m in fpn_masks]

        gt_segments = [torch.from_numpy(seg_np)]
        gt_labels = [torch.zeros(1, dtype=torch.long)]
        gt_cls_t, gt_off_t = ref.label_points(points, gt_segments, gt_labels)
        gt_video_labels = [torch.ones(1), torch.zeros(1)]
        ref_losses = ref.losses(
            fpn_masks_sq, out_cls, out_off, norm_inputs, None, cls_scores,
            gt_cls_t, gt_off_t, gt_video_labels, vaild_idx=[0])

    # ---- ours
    out = ours.apply(params, jnp.asarray(x), jnp.asarray(np.ones((2, 192), bool)),
                     train=False)
    pts = model_points(cfg)
    gt_segs = jnp.asarray(np.stack([seg_np, np.zeros_like(seg_np)]))
    gt_labels_j = jnp.zeros((2, 1), jnp.int32)
    gt_valid = jnp.asarray([[True], [False]])
    has_gt = jnp.asarray([True, False])
    gt_cls, gt_off = label_points(pts, gt_segs, gt_labels_j, gt_valid, 1)

    # label assignment parity (positive sample)
    np.testing.assert_allclose(np.asarray(gt_cls[0]), gt_cls_t[0].numpy(), atol=1e-5)
    pos = np.asarray(gt_cls[0])[:, 0] > 0
    np.testing.assert_allclose(np.asarray(gt_off[0])[pos],
                               gt_off_t[0].numpy()[pos], atol=1e-4)

    losses, num_pos = compute_losses(
        out, gt_cls, gt_off, has_gt, jnp.asarray(200.0),
        num_classes=1, loss_weight=2.0, label_smoothing=0.1)

    np.testing.assert_allclose(float(losses["cls_loss"]),
                               float(ref_losses["cls_loss"]), rtol=1e-3)
    np.testing.assert_allclose(float(losses["reg_loss"]),
                               float(ref_losses["reg_loss"]), rtol=1e-3)
    np.testing.assert_allclose(float(losses["reco_cls_loss"]),
                               float(ref_losses["reco_cls_loss"]), rtol=1e-3)
    np.testing.assert_allclose(float(losses["final_loss"]),
                               float(ref_losses["final_loss"]), rtol=1e-3)
