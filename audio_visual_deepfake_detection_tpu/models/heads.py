"""Classification / regression heads over the FPN pyramid.

Reference: PtTransformerClsHead / PtTransformerRegHead
(libs/modeling/av_fd_no_recon.py:13-159). Shared convs across levels; the
final classifier bias is initialized to the focal prior -log((1-p)/p); the
regression head applies a per-level learnable scale then ReLU.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.conv import MaskedConv1D
from ..ops.norm import ChannelLayerNorm
from .blocks import Scale


class ClsHead(nn.Module):
    num_classes: int
    feat_dim: int = 256
    num_layers: int = 3
    kernel_size: int = 3
    with_ln: bool = True
    prior_prob: float = 0.01
    empty_cls: Sequence[int] = ()

    @nn.compact
    def __call__(self, fpn_feats, fpn_masks):
        convs = [MaskedConv1D(self.feat_dim, self.kernel_size,
                              use_bias=not self.with_ln, name=f"head_{i}")
                 for i in range(self.num_layers - 1)]
        norms = [ChannelLayerNorm(name=f"norm_{i}") if self.with_ln else None
                 for i in range(self.num_layers - 1)]
        cls_conv = MaskedConv1D(self.num_classes, self.kernel_size, name="cls_head")

        out_logits = []
        for feat, mask in zip(fpn_feats, fpn_masks):
            h = feat
            for i, conv in enumerate(convs):
                h, _ = conv(h, mask)
                if norms[i] is not None:
                    h = norms[i](h)
                h = jax.nn.relu(h)
            logits, _ = cls_conv(h, mask)
            out_logits.append(logits)  # (B, T_i, num_classes)
        # NOTE: the focal-prior bias (av_fd_no_recon.py:63-73) is applied by
        # init_cls_prior() below after module init.
        return out_logits


def init_cls_prior(params: dict, prior_prob: float, empty_cls: Sequence[int] = ()) -> dict:
    """Set the classifier bias to the focal prior after module init
    (reference av_fd_no_recon.py:63-73). Works on the cls head subtree."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    new = {}
    for path, value in flat.items():
        if len(path) >= 2 and path[-2] == "cls_head" and path[-1] == "bias":
            bias = jnp.full_like(value, -math.log((1 - prior_prob) / prior_prob))
            for idx in empty_cls:
                bias = bias.at[idx].set(-math.log((1 - 1e-6) / 1e-6))
            new[path] = bias
        else:
            new[path] = value
    return flax.traverse_util.unflatten_dict(new)


class RegHead(nn.Module):
    fpn_levels: int
    feat_dim: int = 256
    num_layers: int = 3
    kernel_size: int = 3
    with_ln: bool = True

    @nn.compact
    def __call__(self, fpn_feats, fpn_masks):
        assert len(fpn_feats) == self.fpn_levels
        convs = [MaskedConv1D(self.feat_dim, self.kernel_size,
                              use_bias=not self.with_ln, name=f"head_{i}")
                 for i in range(self.num_layers - 1)]
        norms = [ChannelLayerNorm(name=f"norm_{i}") if self.with_ln else None
                 for i in range(self.num_layers - 1)]
        offset_conv = MaskedConv1D(2, self.kernel_size, name="offset_head")
        scales = [Scale(name=f"scale_{l}") for l in range(self.fpn_levels)]

        out_offsets = []
        for l, (feat, mask) in enumerate(zip(fpn_feats, fpn_masks)):
            h = feat
            for i, conv in enumerate(convs):
                h, _ = conv(h, mask)
                if norms[i] is not None:
                    h = norms[i](h)
                h = jax.nn.relu(h)
            offsets, _ = offset_conv(h, mask)
            out_offsets.append(jax.nn.relu(scales[l](offsets)))  # (B, T_i, 2)
        return out_offsets
