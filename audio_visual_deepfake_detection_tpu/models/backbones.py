"""Backbones: the HR/LR dual-branch pyramid plus the two legacy variants.

Reference: libs/modeling/backbones.py —
- ``convHRLRFullResSelfAttTransformerRevised`` (:272-495), the production
  UMMAFormer-style backbone (asserted the only allowed type by the production
  meta-arch, av_fd_no_recon.py:253),
- ``convTransformer`` (:10-168), the ActionFormer baseline,
- ``conv`` (:171-270), the pure-conv baseline.

All operate on (B, T, C) tensors with (B, T) bool masks and emit a 6-level
pyramid (T, T/2, ..., T/32).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.conv import MaskedConv1D
from ..ops.norm import ChannelLayerNorm
from ..ops.pe import sinusoid_encoding
from ..ops.resample import linear_resample_time, nearest_resample_time
from .blocks import TransformerBlock, fused_train_eligible


def _remat_policy(name: str):
    """Named jax.checkpoint policies for the remat'd blocks (None = save
    nothing, i.e. classic full rematerialization)."""
    if not name:
        return None
    return {
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }[name]


class ConvBlock(nn.Module):
    """ResNet-style masked basic block (blocks.py:1320-1370)."""

    n_embd: int
    kernel_size: int = 3
    ds_stride: int = 1
    expansion_factor: int = 2

    @nn.compact
    def __call__(self, x, mask):
        width = self.n_embd * self.expansion_factor
        out, out_mask = MaskedConv1D(width, self.kernel_size, stride=self.ds_stride,
                                     name="conv1")(x, mask)
        out = jax.nn.relu(out)
        out, out_mask = MaskedConv1D(self.n_embd, self.kernel_size, name="conv2")(out, out_mask)
        if self.ds_stride > 1:
            identity, _ = MaskedConv1D(self.n_embd, 1, stride=self.ds_stride,
                                       name="downsample")(x, mask)
        else:
            identity = x
        return jax.nn.relu(out + identity), out_mask


class _EmbedStack(nn.Module):
    """Shared projection + embedding convs applied to one stream."""

    n_in: Union[int, Tuple[int, ...]]
    n_embd: Union[int, Tuple[int, ...]]
    n_embd_ks: int
    n_convs: int
    with_ln: bool

    @nn.compact
    def __call__(self, x, mask):
        if isinstance(self.n_in, (tuple, list)):
            # per-stream 1x1 projections then channel concat (backbones.py:48-55)
            parts = []
            off = 0
            for i, (cin, cout) in enumerate(zip(self.n_in, self.n_embd)):
                part, _ = MaskedConv1D(cout, 1, name=f"proj_{i}")(x[..., off:off + cin], mask)
                parts.append(part)
                off += cin
            x = jnp.concatenate(parts, axis=-1)
            n_embd = sum(self.n_embd)
        else:
            n_embd = self.n_embd
        for i in range(self.n_convs):
            x, mask = MaskedConv1D(n_embd, self.n_embd_ks, use_bias=not self.with_ln,
                                   name=f"embd_{i}")(x, mask)
            if self.with_ln:
                x = ChannelLayerNorm(name=f"embd_norm_{i}")(x)
            x = jax.nn.relu(x)
        return x, mask


def _abs_pe(max_len: int, n_embd: int, t: int, train: bool) -> jnp.ndarray:
    """(1, T, C) absolute PE with the reference's over-length handling
    (backbones.py:446-465): fixed table in training, linearly re-interpolated
    when an eval sequence exceeds max_len."""
    table = sinusoid_encoding(max_len, n_embd) / (n_embd ** 0.5)  # (max_len, C)
    if train:
        assert t <= max_len, "sequence longer than max_len at train time"
        return table[None, :t]
    if t >= max_len:
        return linear_resample_time(table[None], t, axis=1)
    return table[None, :t]


class HRLRBackbone(nn.Module):
    """HR/LR dual-branch pyramid (backbones.py:272-495).

    Streams: ``x`` (input), ``norm_x`` (stop-grad input), ``reco_x``
    (reconstruction or input) share the projection/embedding convs; an initial
    cross-attention refines x against reco_x (q=x, k=reco_x, v=x,
    backbones.py:467); each pyramid level i downsamples x 2x, cross-attends
    the full-res stream against nearest-upsampled x (lh), and x against
    nearest-downsampled full-res (hh); the level-0 output is the refined
    full-res stream (backbones.py:492-493).
    """

    n_in: Union[int, Tuple[int, ...]]
    n_embd: Union[int, Tuple[int, ...]] = 256
    n_head: int = 4
    n_embd_ks: int = 3
    max_len: int = 768
    arch: Tuple[int, int, int] = (2, 2, 5)
    mha_win_size: Sequence[int] = (-1,) * 6
    scale_factor: int = 2
    with_ln: bool = True
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    use_abs_pe: bool = False
    use_rel_pe: bool = False
    use_time_weight: bool = False
    remat: bool = False
    # jax.checkpoint policy for remat'd blocks: "" = save nothing (full
    # recompute), "dots" = dots_saveable, "dots_no_batch" =
    # dots_with_no_batch_dims_saveable — memory for backward-recompute FLOPs
    remat_policy: str = ""

    @nn.compact
    def __call__(self, x, norm_x, reco_x, mask, train: bool = False,
                 reco_is_x: bool = False):
        """``reco_is_x``: static hint that ``reco_x`` is the same tensor as
        ``x`` (true for the no-recon/THE variants, av_fd_no_recon.py:358 passes
        the raw input as the k-stream) — the shared embed stack then runs once
        instead of twice, exactly (same function of the same input, values AND
        gradients). The reference also embeds ``norm_x`` (backbones.py:441-443)
        but never consumes it afterwards — dead compute we skip entirely.
        """
        assert len(self.mha_win_size) == 1 + self.arch[2]
        n_embd = sum(self.n_embd) if isinstance(self.n_embd, (tuple, list)) else self.n_embd
        det = not train

        embed = _EmbedStack(self.n_in, self.n_embd, self.n_embd_ks, self.arch[0],
                            self.with_ln, name="embed")
        x, mask = embed(x, mask)
        if reco_is_x:
            reco_x = x
        else:
            reco_x, _ = embed(reco_x, mask)

        t = x.shape[1]
        if self.use_abs_pe:
            pe = _abs_pe(self.max_len, n_embd, t, train).astype(x.dtype)
            mf = mask.astype(x.dtype)[..., None]
            x = x + pe * mf
            if reco_is_x:
                reco_x = x
            else:
                reco_x = reco_x + pe * mf

        block_kw = dict(
            n_embd=n_embd, n_head=self.n_head,
            attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
            path_pdrop=self.path_pdrop, use_rel_pe=self.use_rel_pe,
            use_time_weight=self.use_time_weight, deterministic=det,
        )
        # activation checkpointing: recompute block activations in the
        # backward pass instead of keeping them (enables much larger train
        # batches; the block call signature is array-only for this reason).
        # Blocks the fused-kernel train path covers already save only their
        # inputs (its custom_vjp backward recomputes via the jnp mirror), so
        # wrapping them in nn.remat would just re-run the pallas forward in
        # the backward — skip remat for those. Eligibility is the shared
        # predicate from blocks.py; expect_fused makes the block raise if the
        # dynamic dispatch half ever fails (so remat is never lost silently).
        def pick_block(window_size, ds_stride=1, even_t=True):
            eligible = train and fused_train_eligible(
                window_size, ds_stride, even_t, self.attn_pdrop,
                self.proj_pdrop, self.use_rel_pe, self.use_time_weight)
            if self.remat and train and not eligible:
                return nn.remat(TransformerBlock,
                                policy=_remat_policy(self.remat_policy))
            if eligible and self.remat:
                return functools.partial(TransformerBlock, expect_fused=True)
            return TransformerBlock

        Block = pick_block(self.mha_win_size[0])
        x, _ = Block(window_size=self.mha_win_size[0], cross=True,
                     name="res_self_attn", **block_kw)(
            x, mask, x_k=reco_x, mask_k=mask, x_v=x, mask_v=mask)

        for i in range(self.arch[1]):
            x, mask = Block(window_size=self.mha_win_size[0],
                            name=f"stem_{i}", **block_kw)(x, mask)

        lh_feat, lh_mask = x, mask
        out_feats = [lh_feat]
        out_masks = [lh_mask]
        full_t = x.shape[1]
        for i in range(self.arch[2]):
            DsBlock = pick_block(self.mha_win_size[1 + i],
                                 ds_stride=self.scale_factor,
                                 even_t=x.shape[1] % self.scale_factor == 0)
            x, mask = DsBlock(ds_stride=self.scale_factor,
                              window_size=self.mha_win_size[1 + i],
                              name=f"branch_{i}", **block_kw)(x, mask)
            up = nearest_resample_time(x, full_t, axis=1)
            lh_feat, lh_mask = Block(window_size=self.mha_win_size[0],
                                     cross=True, name=f"lh_branch_{i}",
                                     **block_kw)(
                lh_feat, lh_mask, x_k=up, mask_k=lh_mask, x_v=up, mask_v=lh_mask)
            out_feats.append(x)
            out_masks.append(mask)
            down = nearest_resample_time(lh_feat, x.shape[1], axis=1)
            x, mask = Block(window_size=self.mha_win_size[0], cross=True,
                            name=f"hh_branch_{i}", **block_kw)(
                x, mask, x_k=down, mask_k=mask, x_v=down, mask_v=mask)
        out_feats[0] = lh_feat
        out_masks[0] = lh_mask
        return out_feats, out_masks


class ConvTransformerBackbone(nn.Module):
    """ActionFormer baseline backbone (backbones.py:10-168)."""

    n_in: Union[int, Tuple[int, ...]]
    n_embd: Union[int, Tuple[int, ...]] = 512
    n_head: int = 4
    n_embd_ks: int = 3
    max_len: int = 2304
    arch: Tuple[int, int, int] = (2, 2, 5)
    mha_win_size: Sequence[int] = (-1,) * 6
    scale_factor: int = 2
    with_ln: bool = True
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    use_abs_pe: bool = False
    use_rel_pe: bool = False
    use_time_weight: bool = False

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        n_embd = sum(self.n_embd) if isinstance(self.n_embd, (tuple, list)) else self.n_embd
        det = not train
        x, mask = _EmbedStack(self.n_in, self.n_embd, self.n_embd_ks, self.arch[0],
                              self.with_ln, name="embed")(x, mask)
        if self.use_abs_pe:
            pe = _abs_pe(self.max_len, n_embd, x.shape[1], train).astype(x.dtype)
            x = x + pe * mask.astype(x.dtype)[..., None]

        block_kw = dict(
            n_embd=n_embd, n_head=self.n_head,
            attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
            path_pdrop=self.path_pdrop, use_rel_pe=self.use_rel_pe,
            use_time_weight=self.use_time_weight, deterministic=det,
        )
        for i in range(self.arch[1]):
            x, mask = TransformerBlock(window_size=self.mha_win_size[0],
                                       name=f"stem_{i}", **block_kw)(x, mask)
        out_feats, out_masks = [x], [mask]
        for i in range(self.arch[2]):
            x, mask = TransformerBlock(ds_stride=self.scale_factor,
                                       window_size=self.mha_win_size[1 + i],
                                       name=f"branch_{i}", **block_kw)(x, mask)
            out_feats.append(x)
            out_masks.append(mask)
        return out_feats, out_masks


class ConvBackbone(nn.Module):
    """Pure-conv backbone (backbones.py:171-270)."""

    n_in: Union[int, Tuple[int, ...]]
    n_embd: Union[int, Tuple[int, ...]] = 512
    n_embd_ks: int = 3
    arch: Tuple[int, int, int] = (2, 2, 5)
    scale_factor: int = 2
    with_ln: bool = True

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        n_embd = sum(self.n_embd) if isinstance(self.n_embd, (tuple, list)) else self.n_embd
        x, mask = _EmbedStack(self.n_in, self.n_embd, self.n_embd_ks, self.arch[0],
                              self.with_ln, name="embed")(x, mask)
        for i in range(self.arch[1]):
            x, mask = ConvBlock(n_embd, 3, name=f"stem_{i}")(x, mask)
        out_feats, out_masks = [x], [mask]
        for i in range(self.arch[2]):
            x, mask = ConvBlock(n_embd, 3, ds_stride=self.scale_factor,
                                name=f"branch_{i}")(x, mask)
            out_feats.append(x)
            out_masks.append(mask)
        return out_feats, out_masks
