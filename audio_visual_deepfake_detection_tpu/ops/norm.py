"""Normalization layers, (B, T, C) layout.

The reference normalizes over the *channel* axis of (B, C, T) tensors with a
hand-rolled LayerNorm using biased variance (libs/modeling/blocks.py:70-112).
In our (B, T, C) layout that is a plain last-axis LayerNorm; we keep the
biased-variance semantics for checkpoint/numerics parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def channel_layer_norm(x: jnp.ndarray, weight=None, bias=None, eps: float = 1e-5):
    """Normalize over the last (channel) axis with biased variance.
    Statistics are computed in float32 for bf16 inputs."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    res = xf - mu
    sigma = jnp.mean(res * res, axis=-1, keepdims=True)
    out = res * jax.lax.rsqrt(sigma + eps)
    if weight is not None:
        out = out * weight
    if bias is not None:
        out = out + bias
    return out.astype(dtype)


class ChannelLayerNorm(nn.Module):
    """Affine LayerNorm over channels (reference blocks.py:70-112)."""

    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        else:
            weight = bias = None
        return channel_layer_norm(x, weight, bias, self.eps)


def instance_norm_time(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch ``InstanceNorm1d`` default (no affine): normalize each (batch,
    channel) series over the time axis with biased variance. Used by the
    DeepInterpolator / SegmentandCls conv stacks (blocks.py:1508,1532)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-2, keepdims=True)
    res = xf - mu
    sigma = jnp.mean(res * res, axis=-2, keepdims=True)
    return (res * jax.lax.rsqrt(sigma + eps)).astype(dtype)
