"""Masked 1-D convolution primitives, (B, T, C) layout.

Every temporal op in the localizer carries a boolean validity mask so padded
frames never leak into features (reference semantics:
libs/modeling/blocks.py:13-63 ``MaskedConv1D`` and :1443-1491
``MaskedConvTranspose1D``). Invariants preserved:

- odd kernel, padding = kernel//2 (shape-preserving at stride 1),
- stride > 1 downsamples the mask by nearest-neighbour interpolation,
- the conv output is multiplied by the (stop-gradient) mask,
- bias is zero-initialised.

TPU design: tensors are ``(B, T, C)`` (`NWC`); kernels are ``(K, Cin, Cout)``
(`WIO`). XLA lowers 1x1 convs to plain MXU matmuls and k=3 convs to an
im2col-style matmul, so the channel dimension stays on the 128-lane axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .resample import downsample_mask


# Uniform(-1/sqrt(fan_in), +1/sqrt(fan_in)) — the torch Conv1d default, kept
# so converted reference checkpoints and fresh inits share scale. fan_in is
# derived from the kernel shape by variance_scaling itself.
_TORCH_CONV_KERNEL_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


class MaskedConv1D(nn.Module):
    """Shape-preserving (or strided) masked conv over time.

    Args mirror the reference module; ``x`` is (B, T, C), ``mask`` is (B, T)
    bool. Returns ``(y, out_mask)`` with y already mask-multiplied.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray):
        assert self.kernel_size % 2 == 1, "kernel must be odd"
        b, t, c = x.shape
        assert t % self.stride == 0, "input length must be divisible by stride"
        pad = self.kernel_size // 2

        kernel = self.param(
            "kernel",
            _TORCH_CONV_KERNEL_INIT,
            (self.kernel_size, c // self.groups, self.features),
            jnp.float32,
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)

        if self.stride > 1:
            out_mask = downsample_mask(mask, y.shape[1])
        else:
            out_mask = mask
        y = y * jax.lax.stop_gradient(out_mask.astype(y.dtype))[..., None]
        return y, out_mask


class MaskedConvTranspose1D(nn.Module):
    """Masked transposed conv (used by the DeepInterpolator decoder).

    Matches torch ``ConvTranspose1d(k, stride, padding=k//2, output_padding)``:
    ``out[o] += x[i] * w[:, :, j]`` for ``o = i*stride - padding + j``
    (reference: libs/modeling/blocks.py:1443-1491). Mask is resized to the new
    length by nearest interpolation.
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    output_padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray):
        assert self.kernel_size % 2 == 1
        b, t, c = x.shape
        pad = self.kernel_size // 2
        kernel = self.param(
            "kernel",
            _TORCH_CONV_KERNEL_INIT,
            (self.kernel_size, c, self.features),
            jnp.float32,
        )
        # torch ConvTranspose via lhs-dilated conv: dilate input by stride,
        # pad with (k-1-pad) on the left and (k-1-pad+output_padding) on the
        # right, then correlate with the *flipped* kernel.
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel.astype(x.dtype), axis=0),
            window_strides=(1,),
            padding=[(self.kernel_size - 1 - pad,
                      self.kernel_size - 1 - pad + self.output_padding)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)

        out_len = y.shape[1]
        if out_len != t:
            out_mask = downsample_mask(mask, out_len)
        else:
            out_mask = mask
        y = y * jax.lax.stop_gradient(out_mask.astype(y.dtype))[..., None]
        return y, out_mask


class Dense(nn.Module):
    """Linear layer with torch-default init and zero bias (reference zero-inits
    all linear biases via __init_weights__, backbones.py:407-411)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def max_pool_skip(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """MaxPool1d(kernel=stride+1, stride=stride, padding=(stride+1)//2) — the
    skip path of downsampling transformer blocks (blocks.py:1277-1283).

    torch pads with -inf for max pooling; output length floor((T+2p-k)/s)+1.
    """
    k = stride + 1
    p = (stride + 1) // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, k, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (p, p), (0, 0)),
    )
