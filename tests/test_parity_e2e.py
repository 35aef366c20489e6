"""End-to-end inference parity: identical features + converted weights ->
identical final detections (segments in seconds, scores) as the reference
pipeline (forward -> decode -> soft-NMS -> segment voting -> grid->seconds).

The reference side uses its own inference_single_video (av_fd_no_recon.py:
760-825) + its seg_voting (libs/utils/nms.py:67-101) + our native C++
soft-NMS oracle standing in for the reference's compiled extension (bit-equal
semantics, tests/test_nms.py)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.infer.decode import TestConfig
from audio_visual_deepfake_detection_tpu.infer.runner import build_inference_fn
from audio_visual_deepfake_detection_tpu.models import ArchConfig, AVLocalizer
from audio_visual_deepfake_detection_tpu.runtime import host_softnms
from audio_visual_deepfake_detection_tpu.tools.convert_torch import convert_state_dict
from reference_oracle import load_reference_modeling, reference_model_kwargs


def test_full_inference_parity():
    modeling = load_reference_modeling()
    kwargs = reference_model_kwargs(max_seq_len=192)
    torch.manual_seed(4)
    ref = modeling.make_meta_arch("AVLocPointTransformerRecoveryNoNormNorecon",
                                  **kwargs)
    ref.eval()

    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=64, num_classes=1,
        max_seq_len=192, embd_dim=32, fpn_dim=32, head_dim=32, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.1,
    )
    test_cfg = TestConfig(
        pre_nms_thresh=0.001, pre_nms_topk=2000, iou_threshold=0.1,
        min_score=0.2, max_seg_num=100, nms_method="soft", nms_sigma=0.75,
        duration_thresh=0.001, multiclass_nms=False, voting_thresh=0.9)

    ours_model = AVLocalizer(cfg)
    template = ours_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 64)),
                               jnp.ones((1, 192), bool), train=False)
    params = {"params": convert_state_dict(ref.state_dict(), template["params"])}

    rng = np.random.default_rng(42)
    x = rng.standard_normal((1, 192, 64)).astype(np.float32)
    fps, duration, stride = 25.0, 7.7, 0.25
    nframes = stride

    # ---------- reference pipeline ----------
    x_t = torch.from_numpy(x).permute(0, 2, 1)
    mask_t = torch.ones(1, 1, 192, dtype=torch.bool)
    with torch.no_grad():
        norm_inputs, _, cls_scores_t = ref.interpolator(x_t, mask_t)
        bf, bm = ref.backbone(x_t, norm_inputs, x_t, mask_t)
        ff, fm = ref.neck(bf, bm)
        points = ref.point_generator(ff)
        out_cls = [t.permute(0, 2, 1) for t in ref.cls_head(ff, fm)]
        out_off = [t.permute(0, 2, 1) for t in ref.reg_head(ff, fm)]
        res = ref.inference_single_video(
            points, [m.squeeze(1)[0] for m in fm],
            [c[0] for c in out_cls], [o[0] for o in out_off])
    segs_all = res["segments"].numpy()
    scores_all = res["scores"].numpy()
    # soft-NMS via the native oracle (== reference C++ semantics)
    nms_segs, nms_scores, _ = host_softnms(
        segs_all, scores_all, test_cfg.iou_threshold, test_cfg.nms_sigma,
        test_cfg.min_score, method=2, max_out=test_cfg.max_seg_num)
    # segment voting (reference libs/utils/nms.py:67-101)
    from libs.utils.nms import seg_voting

    voted = seg_voting(torch.from_numpy(nms_segs),
                       torch.from_numpy(segs_all),
                       torch.from_numpy(scores_all),
                       test_cfg.voting_thresh).numpy()
    # grid -> seconds + clamp (av_fd_no_recon.py:860-865)
    ref_segs = (voted * stride + 0.5 * nframes) / fps
    ref_segs = np.where(ref_segs <= 0, 0.0, ref_segs)
    ref_segs = np.where(ref_segs >= duration, duration, ref_segs)
    order = np.argsort(nms_scores)[::-1]
    ref_segs, ref_scores = ref_segs[order], nms_scores[order]

    # ---------- our pipeline (one jit) ----------
    infer_fn = build_inference_fn(cfg, test_cfg)
    segs, scores, cls_idxs, valid, video_cls = infer_fn(
        params, jnp.asarray(x), jnp.ones((1, 192), bool),
        jnp.asarray([fps]), jnp.asarray([duration]),
        jnp.asarray([stride]), jnp.asarray([nframes]))
    segs, scores, valid = map(np.asarray, (segs, scores, valid))
    k = int(valid[0].sum())

    assert k == len(ref_scores), (k, len(ref_scores))
    np.testing.assert_allclose(scores[0][:k], ref_scores, atol=1e-4)
    np.testing.assert_allclose(segs[0][:k], ref_segs, atol=1e-3)
    np.testing.assert_allclose(np.asarray(video_cls), cls_scores_t.numpy(),
                               atol=2e-4)
