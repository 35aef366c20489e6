"""The localization meta-architecture, unified across the reference's four
variants (SURVEY.md section 2 rows 34-38):

- ``av_recovery_norecon`` — AVLocPointTransformerRecoveryNoNormNorecon
  (libs/modeling/av_fd_no_recon.py:162-876), the production model (exp10/12),
- ``av_recovery`` — ...RecoveryNoNorm (av_fd_meta_arch.py): DeepInterpolator
  reconstruction feeds the backbone k-stream, plus an L1 recon loss on real
  samples,
- ``av_recovery_the`` — ...NoreconTHE (av_fd_no_recon2.py): SegmentandCls
  replaces the DeepInterpolator and adds a frame-level focal loss (computed
  but excluded from final_loss in the reference, :734 — we keep that),
- ``plain`` — LocPointTransformer / AVLocPointTransformer (meta_archs.py /
  av_meta_arch.py): vanilla ActionFormer over (concatenated) features.

Everything is batched and static-shaped: GT segments are padded to a fixed
``max_gt`` with validity flags, the per-sample ``valid_idx`` list of the
reference becomes a ``has_gt`` weight, and label assignment / losses are
vectorized over (B, P, N) instead of per-video python loops.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .backbones import ConvBackbone, ConvTransformerBackbone, HRLRBackbone
from .blocks import DeepInterpolator, SegmentAndCls
from .heads import ClsHead, RegHead
from .losses import ctr_diou_loss_1d, sigmoid_focal_loss
from .necks import FPN1D, FPNIdentity
from .points import concat_points


@dataclasses.dataclass(frozen=True)
class ArchConfig:
    """Static architecture config (hashable; safe as a flax static field)."""

    variant: str = "av_recovery_norecon"
    backbone_type: str = "hrlr"            # hrlr | convTransformer | conv
    fpn_type: str = "fpn"                  # fpn | identity
    input_dim: int = 3072                  # video_input_dim + audio_input_dim
    num_classes: int = 1
    max_seq_len: int = 768
    arch: Tuple[int, int, int] = (2, 2, 5)
    scale_factor: int = 2
    regression_range: Tuple[Tuple[float, float], ...] = (
        (0, 4), (4, 8), (8, 16), (16, 32), (32, 64), (64, 10000))
    n_head: int = 4
    mha_win_size: Tuple[int, ...] = (7, 7, 7, 7, 7, -1)
    embd_kernel_size: int = 3
    embd_dim: int = 256
    embd_with_ln: bool = True
    fpn_dim: int = 256
    fpn_with_ln: bool = True
    fpn_start_level: int = 0
    head_dim: int = 256
    head_kernel_size: int = 3
    head_num_layers: int = 3
    head_with_ln: bool = True
    max_buffer_len_factor: float = 1.0
    use_abs_pe: bool = True
    use_rel_pe: bool = False
    use_time_weight: bool = False
    dropout: float = 0.0
    droppath: float = 0.1
    cls_prior_prob: float = 0.01
    head_empty_cls: Tuple[int, ...] = ()
    # 'float32' (parity default) or 'bfloat16' (MXU-native mixed precision:
    # params/losses stay f32, activations run bf16, norms/softmax compute f32)
    compute_dtype: str = "float32"
    # rematerialize backbone blocks in the backward pass (memory for FLOPs)
    remat: bool = False
    # jax.checkpoint policy name for remat'd blocks (backbones._remat_policy)
    remat_policy: str = ""

    @property
    def fpn_strides(self) -> Tuple[int, ...]:
        return tuple(self.scale_factor ** i
                     for i in range(self.fpn_start_level, self.arch[-1] + 1))

    @property
    def fpn_lens(self) -> Tuple[int, ...]:
        return tuple(self.max_seq_len // s for s in self.fpn_strides)

    @property
    def max_div_factor(self) -> int:
        """Padding granularity for over-length inference inputs
        (av_fd_no_recon.py:217-224). Additionally lifted to a multiple of the
        DeepInterpolator Contraction's total downsampling (5 stride-2 stages,
        blocks.py:1544-1565) for the recovery variants — the reference omits
        this and merely happens to work because its production value (96) is
        a multiple of 32; smaller configs would crash its stride-divisibility
        assert (blocks.py:13-63) inside the interpolator at eval."""
        import math

        m = 1
        for s, w in zip(self.fpn_strides, self.mha_win_size):
            stride = s * (w // 2) * 2 if w > 1 else s
            assert self.max_seq_len % stride == 0, \
                "max_seq_len must be divisible by fpn stride * window size"
            m = max(m, stride)
        if self.variant in ("av_recovery", "av_recovery_norecon"):
            m = m * 32 // math.gcd(m, 32)
        return m


class AVLocalizer(nn.Module):
    """Backbone -> neck -> cls/reg heads (+ recovery module)."""

    cfg: ArchConfig

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray, train: bool = False):
        cfg = self.cfg
        det = not train
        outputs: Dict[str, Any] = {}
        feats = feats.astype(jnp.dtype(cfg.compute_dtype))

        bb_kw = dict(
            n_in=cfg.input_dim, n_embd=cfg.embd_dim, n_embd_ks=cfg.embd_kernel_size,
            max_len=cfg.max_seq_len, arch=cfg.arch, scale_factor=cfg.scale_factor,
            with_ln=cfg.embd_with_ln,
        )
        tr_kw = dict(
            n_head=cfg.n_head, mha_win_size=cfg.mha_win_size,
            attn_pdrop=0.0, proj_pdrop=cfg.dropout, path_pdrop=cfg.droppath,
            use_abs_pe=cfg.use_abs_pe, use_rel_pe=cfg.use_rel_pe,
            use_time_weight=cfg.use_time_weight,
        )
        hrlr_kw = dict(remat=cfg.remat, remat_policy=cfg.remat_policy)

        if cfg.variant in ("av_recovery_norecon", "av_recovery"):
            norm_x, reco, cls_scores = DeepInterpolator(
                hidden=cfg.embd_dim, num_classes=cfg.num_classes, normalize=False,
                with_reconstruction=(cfg.variant == "av_recovery"),
                name="interpolator",
            )(feats, mask, deterministic=det)
            outputs["cls_scores"] = cls_scores
            outputs["norm_inputs"] = norm_x
            outputs["reco"] = reco
            k_stream = reco if cfg.variant == "av_recovery" else feats
            bb_feats, bb_masks = HRLRBackbone(name="backbone", **bb_kw, **tr_kw,
                                              **hrlr_kw)(
                feats, norm_x, k_stream, mask, train=train,
                reco_is_x=(cfg.variant != "av_recovery"))
        elif cfg.variant == "av_recovery_the":
            norm_x, seg_scores, cls_scores = SegmentAndCls(
                num_classes=cfg.num_classes, normalize=False, name="interpolator",
            )(feats, mask, deterministic=det)
            outputs["cls_scores"] = cls_scores
            outputs["seg_scores"] = seg_scores
            bb_feats, bb_masks = HRLRBackbone(name="backbone", **bb_kw, **tr_kw,
                                              **hrlr_kw)(
                feats, norm_x, feats, mask, train=train, reco_is_x=True)
        elif cfg.variant == "plain":
            if cfg.backbone_type == "conv":
                conv_kw = {k: v for k, v in bb_kw.items() if k != "max_len"}
                bb_feats, bb_masks = ConvBackbone(name="backbone", **conv_kw)(
                    feats, mask, train=train)
            else:
                bb_feats, bb_masks = ConvTransformerBackbone(name="backbone",
                                                             **bb_kw, **tr_kw)(
                    feats, mask, train=train)
        else:
            raise ValueError(f"unknown variant {cfg.variant}")

        if cfg.fpn_type == "fpn":
            neck = FPN1D(cfg.fpn_dim, with_ln=cfg.fpn_with_ln,
                         start_level=cfg.fpn_start_level, name="neck")
        else:
            neck = FPNIdentity(cfg.fpn_dim, with_ln=cfg.fpn_with_ln,
                               start_level=cfg.fpn_start_level, name="neck")
        fpn_feats, fpn_masks = neck(bb_feats, bb_masks)

        out_cls = ClsHead(cfg.num_classes, cfg.head_dim,
                          num_layers=cfg.head_num_layers,
                          kernel_size=cfg.head_kernel_size,
                          with_ln=cfg.head_with_ln,
                          prior_prob=cfg.cls_prior_prob,
                          empty_cls=cfg.head_empty_cls, name="cls_head")(
            fpn_feats, fpn_masks)
        out_offsets = RegHead(len(cfg.fpn_strides), cfg.head_dim,
                              num_layers=cfg.head_num_layers,
                              kernel_size=cfg.head_kernel_size,
                              with_ln=cfg.head_with_ln, name="reg_head")(
            fpn_feats, fpn_masks)

        # heads/losses/decode consume float32 regardless of compute dtype
        outputs["out_cls"] = [o.astype(jnp.float32) for o in out_cls]
        outputs["out_offsets"] = [o.astype(jnp.float32) for o in out_offsets]
        outputs["fpn_masks"] = fpn_masks        # list of (B, T_i) bool
        if "cls_scores" in outputs:
            outputs["cls_scores"] = outputs["cls_scores"].astype(jnp.float32)
        if outputs.get("seg_scores") is not None:
            outputs["seg_scores"] = outputs["seg_scores"].astype(jnp.float32)
        if outputs.get("reco") is not None:
            outputs["reco"] = outputs["reco"].astype(jnp.float32)
            outputs["norm_inputs"] = outputs["norm_inputs"].astype(jnp.float32)
        return outputs


# ---------------------------------------------------------------------------
# Label assignment (av_fd_no_recon.py:481-600), batched & static-shaped.
# ---------------------------------------------------------------------------

def label_points(
    points: jnp.ndarray,       # (P, 4): t, reg_min, reg_max, stride
    gt_segments: jnp.ndarray,  # (B, N, 2) feature-grid segments, padded
    gt_labels: jnp.ndarray,    # (B, N) int class ids
    gt_valid: jnp.ndarray,     # (B, N) bool
    num_classes: int,
    center_sample: str = "radius",
    center_sample_radius: float = 1.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (gt_cls (B, P, C), gt_offsets (B, P, 2))."""

    def one(seg, lab, val):
        t = points[:, 0:1]                       # (P, 1)
        stride = points[:, 3:4]
        lens = seg[:, 1] - seg[:, 0]             # (N,)
        left = t - seg[None, :, 0]               # (P, N)
        right = seg[None, :, 1] - t

        if center_sample == "radius":
            center = 0.5 * (seg[None, :, 0] + seg[None, :, 1])
            t_min = center - stride * center_sample_radius
            t_max = center + stride * center_sample_radius
            cb_l = t - jnp.maximum(t_min, seg[None, :, 0])
            cb_r = jnp.minimum(t_max, seg[None, :, 1]) - t
            inside = jnp.minimum(cb_l, cb_r) > 0
        else:
            inside = jnp.minimum(left, right) > 0

        max_dist = jnp.maximum(left, right)
        in_range = (max_dist >= points[:, 1:2]) & (max_dist <= points[:, 2:3])

        lens_g = jnp.where(inside & in_range & val[None, :], lens[None, :], jnp.inf)
        min_len = jnp.min(lens_g, axis=1)        # (P,)
        min_idx = jnp.argmin(lens_g, axis=1)
        min_mask = ((lens_g <= (min_len[:, None] + 1e-3)) &
                    jnp.isfinite(lens_g)).astype(jnp.float32)

        onehot = jax.nn.one_hot(lab, num_classes, dtype=jnp.float32)  # (N, C)
        cls = jnp.clip(min_mask @ onehot, 0.0, 1.0)                    # (P, C)
        reg = jnp.stack(
            [jnp.take_along_axis(left, min_idx[:, None], axis=1)[:, 0],
             jnp.take_along_axis(right, min_idx[:, None], axis=1)[:, 0]],
            axis=-1,
        ) / stride
        return cls, reg

    return jax.vmap(one)(gt_segments, gt_labels, gt_valid)


# ---------------------------------------------------------------------------
# Losses (av_fd_no_recon.py:602-707), batched.
# ---------------------------------------------------------------------------

def compute_losses(
    outputs: Dict[str, Any],
    gt_cls: jnp.ndarray,          # (B, P, C)
    gt_offsets: jnp.ndarray,      # (B, P, 2)
    has_gt: jnp.ndarray,          # (B,) bool — sample has >=1 segment
    loss_normalizer: jnp.ndarray,  # scalar (EMA state, updated by caller)
    *,
    num_classes: int,
    loss_weight: float = 2.0,
    label_smoothing: float = 0.1,
    variant: str = "av_recovery_norecon",
    frame_gt: Optional[jnp.ndarray] = None,  # (B, T) for the THE variant
    row_valid: Optional[jnp.ndarray] = None,  # (B,) bool — False on pad rows
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Returns (loss dict incl. final_loss, num_pos). NOTE the reference
    updates the EMA loss normalizer BEFORE dividing (av_fd_no_recon.py:644-667)
    — so the losses here are normalized by the *updated* value; the train step
    must store ``update_loss_normalizer(loss_normalizer, num_pos)`` as the new
    state (identical math).

    ``row_valid`` masks rows appended by ``parallel.mesh.pad_batch_to`` out of
    the batch-summed losses (video-level reco_cls focal, recon L1, frame-seg
    focal); point-level losses are already excluded via the all-False fpn
    masks of padded rows. With ``row_valid=None`` every row is real."""
    valid_mask = jnp.concatenate(outputs["fpn_masks"], axis=1)       # (B, P)
    logits = jnp.concatenate(outputs["out_cls"], axis=1)             # (B, P, C)
    pred_off = jnp.concatenate(outputs["out_offsets"], axis=1)       # (B, P, 2)

    if row_valid is None:
        row_valid = jnp.ones(logits.shape[0], bool)
    row_f32 = row_valid.astype(jnp.float32)

    include = valid_mask & has_gt[:, None]                            # (B, P)
    pos_mask = (jnp.sum(gt_cls, axis=-1) > 0) & include               # (B, P)
    num_pos = jnp.sum(pos_mask)
    normalizer = update_loss_normalizer(loss_normalizer, num_pos)

    gt_target = gt_cls * (1.0 - label_smoothing) + label_smoothing / (num_classes + 1)
    cls_elem = sigmoid_focal_loss(logits, gt_target)                  # (B, P, C)
    cls_loss = jnp.sum(cls_elem * include[..., None]) / normalizer

    reg_elem = ctr_diou_loss_1d(pred_off, gt_offsets)                 # (B, P)
    reg_loss = jnp.sum(reg_elem * pos_mask) / normalizer

    losses = {"cls_loss": cls_loss, "reg_loss": reg_loss}
    if loss_weight > 0:
        weight = loss_weight
    else:
        # auto-balancing (av_fd_no_recon.py:692-695): detached cls/reg ratio;
        # .detach() / .item() in the reference => stop_gradient on both sides
        weight = jax.lax.stop_gradient(
            cls_loss / jnp.maximum(reg_loss, 0.01))
    final = cls_loss + reg_loss * weight

    if "cls_scores" in outputs:
        video_gt = has_gt.astype(jnp.float32)[:, None]                # (B, 1)
        reco_cls = jnp.sum(
            sigmoid_focal_loss(outputs["cls_scores"], video_gt) * row_f32[:, None])
        losses["reco_cls_loss"] = reco_cls
        final = final + 0.1 * reco_cls

    if variant == "av_recovery" and outputs.get("reco") is not None:
        # L1 reconstruction on real (no-gt) samples only (av_fd_meta_arch.py)
        real = (~has_gt).astype(jnp.float32) * row_f32
        diff = jnp.abs(outputs["reco"] - outputs["norm_inputs"])
        per_sample = jnp.mean(diff, axis=(1, 2))
        reco_loss = jnp.sum(per_sample * real) / jnp.maximum(jnp.sum(real), 1.0)
        losses["reco_loss"] = reco_loss
        final = final + reco_loss

    if variant == "av_recovery_the" and frame_gt is not None:
        # frame-level focal loss: computed but EXCLUDED from final_loss,
        # matching the reference (av_fd_no_recon2.py:718-734)
        seg_elem = sigmoid_focal_loss(outputs["seg_scores"], frame_gt)
        losses["reco_seg_loss"] = (jnp.sum(seg_elem * row_f32[:, None])
                                   / (normalizer * 10.0))

    losses["final_loss"] = final
    return losses, num_pos


def update_loss_normalizer(normalizer: jnp.ndarray, num_pos: jnp.ndarray,
                           momentum: float = 0.9) -> jnp.ndarray:
    return momentum * normalizer + (1.0 - momentum) * jnp.maximum(num_pos, 1.0)


def model_points(cfg: ArchConfig) -> jnp.ndarray:
    """(P, 4) concatenated point table for cfg's pyramid at max_seq_len."""
    return concat_points(cfg.fpn_lens, cfg.fpn_strides, cfg.regression_range)
