"""Full-model numerical parity against the reference torch implementation.

Builds the reference production meta-arch (reduced dims for CPU speed),
converts its weights with tools/convert_torch, and compares every head output
stage by stage. This is the strongest correctness signal we have without the
released challenge checkpoints.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.models import ArchConfig, AVLocalizer
from audio_visual_deepfake_detection_tpu.tools.convert_torch import convert_state_dict
from reference_oracle import load_reference_modeling, reference_model_kwargs


@pytest.fixture(scope="module")
def parity_pair():
    modeling = load_reference_modeling()
    kwargs = reference_model_kwargs(max_seq_len=192)
    torch.manual_seed(0)
    ref = modeling.make_meta_arch("AVLocPointTransformerRecoveryNoNormNorecon", **kwargs)
    ref.eval()

    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=64, num_classes=1,
        max_seq_len=192, embd_dim=32, fpn_dim=32, head_dim=32, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.1,
    )
    ours = AVLocalizer(cfg)
    feats0 = jnp.zeros((1, 192, 64))
    mask0 = jnp.ones((1, 192), bool)
    template = ours.init(jax.random.PRNGKey(0), feats0, mask0, train=False)
    params = {"params": convert_state_dict(ref.state_dict(), template["params"])}
    return ref, ours, params


def _ref_forward(ref, x_t, mask_t):
    """Replicates the eval data path of av_fd_no_recon.py:334-361 without the
    list-of-dicts plumbing."""
    with torch.no_grad():
        norm_inputs, _, cls_scores = ref.interpolator(x_t, mask_t)
        feats, masks = ref.backbone(x_t, norm_inputs, x_t, mask_t)
        fpn_feats, fpn_masks = ref.neck(feats, masks)
        out_cls = ref.cls_head(fpn_feats, fpn_masks)
        out_off = ref.reg_head(fpn_feats, fpn_masks)
    return cls_scores, out_cls, out_off, fpn_masks


@pytest.mark.parametrize("valid_len", [192, 130])
def test_full_model_parity(parity_pair, valid_len):
    ref, ours, params = parity_pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 192, 64)).astype(np.float32)
    mask_np = (np.arange(192) < valid_len)[None, :]
    x = x * mask_np[..., None]

    x_t = torch.from_numpy(x).permute(0, 2, 1)
    mask_t = torch.from_numpy(mask_np)[:, None, :]
    cls_scores_t, out_cls_t, out_off_t, fpn_masks_t = _ref_forward(ref, x_t, mask_t)

    out = ours.apply(params, jnp.asarray(x), jnp.asarray(mask_np), train=False)

    np.testing.assert_allclose(
        np.asarray(out["cls_scores"]), cls_scores_t.numpy(), atol=2e-4,
        err_msg="video-cls head mismatch")
    for lvl, (a, b) in enumerate(zip(out["out_cls"], out_cls_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 1).numpy(), atol=2e-4,
            err_msg=f"cls logits mismatch at level {lvl}")
    for lvl, (a, b) in enumerate(zip(out["out_offsets"], out_off_t)):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 1).numpy(), atol=2e-4,
            err_msg=f"offsets mismatch at level {lvl}")
    for lvl, (a, b) in enumerate(zip(out["fpn_masks"], fpn_masks_t)):
        np.testing.assert_array_equal(
            np.asarray(a), b.squeeze(1).numpy(),
            err_msg=f"mask mismatch at level {lvl}")


def test_the_variant_parity():
    """SegmentandCls + THE meta-arch parity (av_fd_no_recon2.py)."""
    modeling = load_reference_modeling()
    kwargs = reference_model_kwargs(max_seq_len=192)
    torch.manual_seed(1)
    ref = modeling.make_meta_arch(
        "AVLocPointTransformerRecoveryNoNormNoreconTHE", **kwargs)
    ref.eval()

    cfg = ArchConfig(
        variant="av_recovery_the", input_dim=64, num_classes=1,
        max_seq_len=192, embd_dim=32, fpn_dim=32, head_dim=32, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.1,
    )
    ours = AVLocalizer(cfg)
    feats0 = jnp.zeros((1, 192, 64))
    mask0 = jnp.ones((1, 192), bool)
    template = ours.init(jax.random.PRNGKey(0), feats0, mask0, train=False)
    params = {"params": convert_state_dict(ref.state_dict(), template["params"])}

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 192, 64)).astype(np.float32)
    x_t = torch.from_numpy(x).permute(0, 2, 1)
    mask_t = torch.ones(1, 1, 192, dtype=torch.bool)
    with torch.no_grad():
        norm_inputs, seg_scores_t, cls_scores_t = ref.segmentandCls(x_t, mask_t)
        feats, masks = ref.backbone(x_t, norm_inputs, x_t, mask_t)
        fpn_feats, fpn_masks = ref.neck(feats, masks)
        out_cls_t = ref.cls_head(fpn_feats, fpn_masks)

    out = ours.apply(params, jnp.asarray(x), jnp.ones((1, 192), bool), train=False)
    np.testing.assert_allclose(np.asarray(out["cls_scores"]),
                               cls_scores_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["seg_scores"]),
                               seg_scores_t[None].numpy() if seg_scores_t.ndim == 1
                               else seg_scores_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["out_cls"][0]),
                               out_cls_t[0].permute(0, 2, 1).numpy(), atol=2e-4)


def test_recovery_recon_variant_parity():
    """Full-recon meta-arch (av_fd_meta_arch.py): reconstruction feeds the
    backbone k-stream and is returned for the L1 loss."""
    modeling = load_reference_modeling()
    kwargs = reference_model_kwargs(max_seq_len=192)
    torch.manual_seed(2)
    ref = modeling.make_meta_arch("AVLocPointTransformerRecoveryNoNorm", **kwargs)
    ref.eval()

    cfg = ArchConfig(
        variant="av_recovery", input_dim=64, num_classes=1,
        max_seq_len=192, embd_dim=32, fpn_dim=32, head_dim=32, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.1,
    )
    ours = AVLocalizer(cfg)
    feats0 = jnp.zeros((1, 192, 64))
    mask0 = jnp.ones((1, 192), bool)
    template = ours.init(jax.random.PRNGKey(0), feats0, mask0, train=False)
    params = {"params": convert_state_dict(ref.state_dict(), template["params"])}

    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 192, 64)).astype(np.float32)
    x_t = torch.from_numpy(x).permute(0, 2, 1)
    mask_t = torch.ones(1, 1, 192, dtype=torch.bool)
    with torch.no_grad():
        norm_inputs, reco_t, cls_scores_t = ref.interpolator(x_t, mask_t)
        feats, masks = ref.backbone(x_t, norm_inputs, reco_t, mask_t)
        fpn_feats, fpn_masks = ref.neck(feats, masks)
        out_cls_t = ref.cls_head(fpn_feats, fpn_masks)

    out = ours.apply(params, jnp.asarray(x), jnp.ones((1, 192), bool), train=False)
    np.testing.assert_allclose(np.asarray(out["reco"]),
                               reco_t.permute(0, 2, 1).numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["out_cls"][0]),
                               out_cls_t[0].permute(0, 2, 1).numpy(), atol=2e-4)


def test_plain_convtransformer_parity():
    """Legacy ActionFormer family (meta_archs.py / av_meta_arch.py):
    convTransformer backbone + fpn + heads."""
    modeling = load_reference_modeling()
    kwargs = reference_model_kwargs(max_seq_len=192)
    kwargs["backbone_type"] = "convTransformer"
    # the legacy meta-arch names the video dim 'input_dim' (av_meta_arch.py:168)
    kwargs["input_dim"] = kwargs.pop("video_input_dim")
    torch.manual_seed(8)
    ref = modeling.make_meta_arch("AVLocPointTransformer", **kwargs)
    ref.eval()

    cfg = ArchConfig(
        variant="plain", backbone_type="convTransformer", input_dim=64,
        num_classes=1, max_seq_len=192, embd_dim=32, fpn_dim=32, head_dim=32,
        n_head=4, mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True,
        droppath=0.1,
    )
    ours = AVLocalizer(cfg)
    template = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 64)),
                         jnp.ones((1, 192), bool), train=False)
    params = {"params": convert_state_dict(ref.state_dict(), template["params"])}

    rng = np.random.default_rng(12)
    x = rng.standard_normal((1, 192, 64)).astype(np.float32)
    x_t = torch.from_numpy(x).permute(0, 2, 1)
    mask_t = torch.ones(1, 1, 192, dtype=torch.bool)
    with torch.no_grad():
        bf, bm = ref.backbone(x_t, mask_t)
        ff, fm = ref.neck(bf, bm)
        out_cls_t = ref.cls_head(ff, fm)
        out_off_t = ref.reg_head(ff, fm)

    out = ours.apply(params, jnp.asarray(x), jnp.ones((1, 192), bool), train=False)
    for lvl, (a, b) in enumerate(zip(out["out_cls"], out_cls_t)):
        np.testing.assert_allclose(np.asarray(a), b.permute(0, 2, 1).numpy(),
                                   atol=2e-4, err_msg=f"level {lvl}")
    for lvl, (a, b) in enumerate(zip(out["out_offsets"], out_off_t)):
        np.testing.assert_allclose(np.asarray(a), b.permute(0, 2, 1).numpy(),
                                   atol=2e-4, err_msg=f"level {lvl}")


def test_plain_conv_backbone_parity():
    """Pure-conv legacy backbone (backbones.py:171-270)."""
    modeling = load_reference_modeling()
    kwargs = reference_model_kwargs(max_seq_len=192)
    kwargs["backbone_type"] = "conv"
    kwargs["input_dim"] = kwargs.pop("video_input_dim")
    torch.manual_seed(9)
    ref = modeling.make_meta_arch("AVLocPointTransformer", **kwargs)
    ref.eval()

    cfg = ArchConfig(
        variant="plain", backbone_type="conv", input_dim=64,
        num_classes=1, max_seq_len=192, embd_dim=32, fpn_dim=32, head_dim=32,
        n_head=4, mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=False,
        droppath=0.1,
    )
    ours = AVLocalizer(cfg)
    template = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 64)),
                         jnp.ones((1, 192), bool), train=False)
    params = {"params": convert_state_dict(ref.state_dict(), template["params"])}

    rng = np.random.default_rng(13)
    x = rng.standard_normal((1, 192, 64)).astype(np.float32)
    x_t = torch.from_numpy(x).permute(0, 2, 1)
    mask_t = torch.ones(1, 1, 192, dtype=torch.bool)
    with torch.no_grad():
        bf, bm = ref.backbone(x_t, mask_t)
        ff, fm = ref.neck(bf, bm)
        out_cls_t = ref.cls_head(ff, fm)

    out = ours.apply(params, jnp.asarray(x), jnp.ones((1, 192), bool), train=False)
    for lvl, (a, b) in enumerate(zip(out["out_cls"], out_cls_t)):
        np.testing.assert_allclose(np.asarray(a), b.permute(0, 2, 1).numpy(),
                                   atol=2e-4, err_msg=f"level {lvl}")
