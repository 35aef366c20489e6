"""Non-upsampled / over-length eval path (VERDICT r1 missing #4).

The reference pads eval inputs to the next multiple of ``max_div_factor``
and re-interpolates the abs-PE for over-length sequences
(av_fd_no_recon.py:456-463, backbones.py:137-152). These tests exercise:
- the lifted ``force_upsampling`` assert in DeepfakeInferenceDataset,
- ``collate_infer_varlen`` padding math,
- the shape-polymorphic inference fn at T > max_seq_len, including full
  torch parity of the abs-PE re-interpolation branch.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.data import DeepfakeInferenceDataset
from audio_visual_deepfake_detection_tpu.infer.decode import TestConfig
from audio_visual_deepfake_detection_tpu.infer.runner import (
    build_inference_fn, collate_infer_varlen)
from audio_visual_deepfake_detection_tpu.models import ArchConfig
from audio_visual_deepfake_detection_tpu.train.state import init_model

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _tiny_cfg():
    return ArchConfig(
        variant="av_recovery_norecon", input_dim=24, num_classes=1,
        max_seq_len=96, embd_dim=32, fpn_dim=32, head_dim=32, n_head=2,
        arch=(1, 1, 2), mha_win_size=(5, 5, -1),
        regression_range=((0, 4), (4, 8), (8, 10000)),
    )


def _sample(rng, n_rows, c=24, fps=25.0):
    return {
        "video_id": f"v{n_rows}.mp4",
        "feats": rng.standard_normal((n_rows, c)).astype(np.float32),
        "fps": fps,
        "duration": n_rows / fps,
        "feat_stride": 1.0,
        "feat_num_frames": 1.0,
    }


def test_collate_infer_varlen_padding(rng):
    cfg = _tiny_cfg()
    mdf = cfg.max_div_factor
    samples = [_sample(rng, 50), _sample(rng, 100)]
    batch = collate_infer_varlen(samples, mdf, cfg.max_seq_len)
    t = batch["feats"].shape[1]
    # padded to the max length, rounded up to a multiple of max_div_factor,
    # at least max_seq_len (av_fd_no_recon.py:456-463)
    assert t >= cfg.max_seq_len and t % mdf == 0
    assert t == int(np.ceil(100 / mdf)) * mdf
    assert batch["mask"][0].sum() == 50 and batch["mask"][1].sum() == 100
    np.testing.assert_allclose(batch["feats"][0, :50], samples[0]["feats"])
    assert not batch["feats"][0, 50:].any()

    # all-short batch pads up to max_seq_len exactly
    batch = collate_infer_varlen([_sample(rng, 30)], mdf, cfg.max_seq_len)
    assert batch["feats"].shape[1] == cfg.max_seq_len


def test_overlength_inference_runs(rng):
    """T > max_seq_len specializes the jit (new point table + re-interp PE)
    and produces clamped finite detections."""
    cfg = _tiny_cfg()
    test_cfg = TestConfig(
        pre_nms_thresh=0.001, pre_nms_topk=50, iou_threshold=0.1,
        min_score=0.01, max_seg_num=10, nms_method="soft", nms_sigma=0.75,
        duration_thresh=0.001, multiclass_nms=False, voting_thresh=0.9)
    params, _ = init_model(cfg, 2, seed=0)
    infer_fn = build_inference_fn(cfg, test_cfg)

    samples = [_sample(rng, 150), _sample(rng, 130)]
    batch = collate_infer_varlen(samples, cfg.max_div_factor, cfg.max_seq_len)
    t = batch["feats"].shape[1]
    assert t > cfg.max_seq_len

    segs, scores, cls_idxs, valid, video_cls = infer_fn(
        params, jnp.asarray(batch["feats"]), jnp.asarray(batch["mask"]),
        jnp.asarray(batch["fps"]), jnp.asarray(batch["duration"]),
        jnp.asarray(batch["feat_stride"]), jnp.asarray(batch["feat_num_frames"]))
    segs, scores, valid = map(np.asarray, (segs, scores, valid))
    assert np.isfinite(segs[valid]).all() and np.isfinite(scores[valid]).all()
    for i in range(2):
        v = valid[i]
        assert np.all(segs[i][v] >= 0)
        assert np.all(segs[i][v] <= batch["duration"][i] + 1e-4)


def test_overlength_backbone_parity_vs_torch(rng):
    """The abs-PE re-interpolation branch at eval T > max_seq_len matches the
    reference bit-for-bit (backbones.py:137-152)."""
    torch = pytest.importorskip("torch")
    from audio_visual_deepfake_detection_tpu.models import AVLocalizer
    from audio_visual_deepfake_detection_tpu.tools.convert_torch import convert_state_dict
    from reference_oracle import load_reference_modeling, reference_model_kwargs

    modeling = load_reference_modeling()
    kwargs = reference_model_kwargs(max_seq_len=192)
    torch.manual_seed(3)
    ref = modeling.make_meta_arch(
        "AVLocPointTransformerRecoveryNoNormNorecon", **kwargs)
    ref.eval()

    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=64, num_classes=1,
        max_seq_len=192, embd_dim=32, fpn_dim=32, head_dim=32, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.1,
    )
    ours = AVLocalizer(cfg)
    # 2x max_div_factor: the reference also needs T % 64 == 0, because its
    # DeepInterpolator always runs the Expansion decoder (blocks.py:1638) and
    # the first ConvTranspose there asserts (T/32) % 2 == 0 — we elide that
    # dead decoder for the norecon variant so 32-multiples suffice for us,
    # but the oracle must be run at a T it supports
    t_over = cfg.max_seq_len + 2 * cfg.max_div_factor  # 192 + 192 = 384
    feats0 = jnp.zeros((1, t_over, 64))
    mask0 = jnp.ones((1, t_over), bool)
    template = ours.init(jax.random.PRNGKey(0), feats0, mask0, train=False)
    params = {"params": convert_state_dict(ref.state_dict(), template["params"])}

    x = rng.standard_normal((1, t_over, 64)).astype(np.float32)
    valid_len = cfg.max_seq_len + 40  # genuine over-length content
    mask_np = (np.arange(t_over) < valid_len)[None, :]
    x = x * mask_np[..., None]

    x_t = torch.from_numpy(x).permute(0, 2, 1)
    mask_t = torch.from_numpy(mask_np)[:, None, :]
    with torch.no_grad():
        norm_inputs, _, cls_scores_t = ref.interpolator(x_t, mask_t)
        feats, masks = ref.backbone(x_t, norm_inputs, x_t, mask_t)
        fpn_feats, fpn_masks = ref.neck(feats, masks)
        out_cls_t = ref.cls_head(fpn_feats, fpn_masks)
        out_off_t = ref.reg_head(fpn_feats, fpn_masks)

    out = ours.apply(params, jnp.asarray(x), jnp.asarray(mask_np), train=False)
    np.testing.assert_allclose(np.asarray(out["cls_scores"]),
                               cls_scores_t.numpy(), atol=2e-4)
    for lvl, (a, b) in enumerate(zip(out["out_cls"], out_cls_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 1).numpy(), atol=2e-4,
            err_msg=f"over-length cls mismatch at level {lvl}")
    for lvl, (a, b) in enumerate(zip(out["out_offsets"], out_off_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 1).numpy(), atol=2e-4,
            err_msg=f"over-length offsets mismatch at level {lvl}")


def test_non_upsampled_inference_dataset(rng, tmp_path):
    """force_upsampling: false keeps the leading stream's native grid and the
    config stride/num_frames (deepfake_audio.py:356-361)."""
    meta_root = "/root/reference/tinydataset/metadata"
    import glob
    from audio_visual_deepfake_detection_tpu.data import metadata as md

    rels = []
    for path in sorted(glob.glob(os.path.join(meta_root, "*", "*", "*", "*.json")))[:3]:
        rels.append(os.path.relpath(path, meta_root))
    lines = []
    for rel in rels:
        meta = md.load_video_meta(meta_root, rel)
        lines.append(f"{rel.replace('.json', '.mp4')},{meta.duration}")
    shard_dir = tmp_path / "test_folder"
    shard_dir.mkdir()
    (shard_dir / "deepfake_test_sub1.txt").write_text("\n".join(lines))

    n_rows = []
    for rel in rels:
        meta = md.load_video_meta(meta_root, rel)
        rows = max(int(round(meta.fps * meta.duration)), 8)
        n_rows.append(rows)
        for sub, r, dim in [("video", rows, 16),
                            ("emotion", int(np.ceil(50 * meta.duration)) + 2, 8)]:
            p = tmp_path / sub / rel.replace(".json", ".npy")
            p.parent.mkdir(parents=True, exist_ok=True)
            np.save(p, rng.standard_normal((r, dim)).astype(np.float32))

    cfg = {
        "video_feat_folder": str(tmp_path / "video"),
        "audio_emo_feat_folder": str(tmp_path / "emotion"),
        "test_folder": str(shard_dir),
        "feat_stride": 2, "num_frames": 4, "default_fps": None,
        "downsample_rate": 0, "max_seq_len": 768, "trunc_thresh": 0.5,
        "crop_ratio": None, "num_classes": 1, "force_upsampling": False,
    }
    ds = DeepfakeInferenceDataset("deepfake_video_audio_inference", ["test"], 1, cfg)
    for i in range(len(ds)):
        s = ds[i]
        # native grid of the leading (video) stream, config stride values
        assert s["feats"].shape == (n_rows[i], 16 + 8)
        assert s["feat_stride"] == 2.0 and s["feat_num_frames"] == 4.0
