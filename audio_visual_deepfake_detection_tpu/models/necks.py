"""FPN necks (reference: libs/modeling/necks.py)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..ops.conv import MaskedConv1D
from ..ops.norm import ChannelLayerNorm
from ..ops.resample import nearest_resample_time


class FPN1D(nn.Module):
    """1-D feature pyramid (necks.py:10-93): 1x1 laterals, nearest x2 top-down
    adds, depthwise 3-conv + LN per level."""

    out_channel: int
    with_ln: bool = True
    start_level: int = 0

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], masks: Sequence[jnp.ndarray]):
        n = len(inputs) - self.start_level
        laterals = []
        for i in range(n):
            x, _ = MaskedConv1D(self.out_channel, 1, use_bias=not self.with_ln,
                                name=f"lateral_{i}")(
                inputs[i + self.start_level], masks[i + self.start_level])
            laterals.append(x)
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + nearest_resample_time(
                laterals[i], laterals[i - 1].shape[1], axis=1)
        fpn_feats, fpn_masks = [], []
        for i in range(n):
            x, m = MaskedConv1D(self.out_channel, 3, groups=self.out_channel,
                                use_bias=not self.with_ln, name=f"fpn_conv_{i}")(
                laterals[i], masks[i + self.start_level])
            if self.with_ln:
                x = ChannelLayerNorm(name=f"fpn_norm_{i}")(x)
            fpn_feats.append(x)
            fpn_masks.append(m)
        return fpn_feats, fpn_masks


class FPNIdentity(nn.Module):
    """Per-level LayerNorm only (necks.py:96-145)."""

    out_channel: int
    with_ln: bool = True
    start_level: int = 0

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], masks: Sequence[jnp.ndarray]):
        fpn_feats, fpn_masks = [], []
        for i in range(len(inputs) - self.start_level):
            x = inputs[i + self.start_level]
            assert x.shape[-1] == self.out_channel
            if self.with_ln:
                x = ChannelLayerNorm(name=f"fpn_norm_{i}")(x)
            fpn_feats.append(x)
            fpn_masks.append(masks[i + self.start_level])
        return fpn_feats, fpn_masks
