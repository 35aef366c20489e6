"""Transformer / conv building blocks for the localizer, (B, T, C) layout.

Functional JAX/flax re-design of the reference block zoo
(libs/modeling/blocks.py). One ``ConvAttention`` module covers the four
reference attention variants (MaskedMHCA :199-313, MaskedMMHCA :317-437,
LocalMaskedMHCA :883-1225, LocalMaskedMMHCA :441-781): self vs cross is just
which tensors feed k/v, and local vs dense is the ``window_size`` flag.

Reference quirks preserved on purpose:
- the query depthwise conv uses the *kv* stride (blocks.py:240),
- masked kv positions get a finite -1e4 penalty, not -inf (blocks.py:753),
- the post-softmax NaN guard zeroes rows by the query-aligned kv mask
  (blocks.py:766-767),
- AffineDropPath layer-scale is initialized to 1e-4 (blocks.py:1430).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import band_attention, full_attention
from ..ops.conv import Dense, MaskedConv1D, MaskedConvTranspose1D, max_pool_skip
from ..ops.norm import ChannelLayerNorm, instance_norm_time
from ..ops.pallas import fused_block as _fused


def drop_path(x: jnp.ndarray, rng, drop_prob: float, deterministic: bool) -> jnp.ndarray:
    """Stochastic depth per sample (blocks.py:1397-1410)."""
    if deterministic or drop_prob == 0.0:
        return x
    keep = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=x.dtype))
    return x / keep * mask


class AffineDropPath(nn.Module):
    """LayerScale (init 1e-4) + stochastic depth (blocks.py:1424-1439)."""

    drop_prob: float = 0.0
    init_scale: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        scale = self.param(
            "scale",
            lambda key, shape, dtype: jnp.full(shape, self.init_scale, dtype),
            (x.shape[-1],),
            jnp.float32,
        )
        y = x * scale.astype(x.dtype)
        if not deterministic and self.drop_prob > 0.0:
            y = drop_path(y, self.make_rng("dropout"), self.drop_prob, deterministic=False)
        return y


class Scale(nn.Module):
    """Learnable scalar multiplier for the regression head (blocks.py:1374-1392)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        scale = self.param(
            "scale",
            lambda key, shape, dtype: jnp.asarray(self.init_value, dtype),
            (),
            jnp.float32,
        )
        return x * scale.astype(x.dtype)


class ConvAttention(nn.Module):
    """Depthwise-conv + multi-head attention with masking.

    Covers the reference's {Masked,LocalMasked}{MHCA,MMHCA}. ``window_size>1``
    selects banded attention (odd window); otherwise dense attention.
    Cross-attention is expressed by passing separate k/v streams.
    """

    n_embd: int
    n_head: int
    window_size: int = -1
    q_stride: int = 1
    kv_stride: int = 1
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    use_rel_pe: bool = False
    use_time_weight: bool = False

    @nn.compact
    def __call__(
        self,
        x_q: jnp.ndarray,
        mask_q: jnp.ndarray,
        x_k: Optional[jnp.ndarray] = None,
        mask_k: Optional[jnp.ndarray] = None,
        x_v: Optional[jnp.ndarray] = None,
        mask_v: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        c = self.n_embd
        d_head = c // self.n_head
        if x_k is None:
            x_k, mask_k = x_q, mask_q
        if x_v is None:
            x_v, mask_v = x_q, mask_q

        q_kernel = self.q_stride + 1 if self.q_stride > 1 else 3
        kv_kernel = self.kv_stride + 1 if self.kv_stride > 1 else 3

        # depthwise convs (query conv uses kv stride — reference quirk)
        q, qx_mask = MaskedConv1D(c, q_kernel, stride=self.kv_stride, groups=c,
                                  use_bias=False, name="query_conv")(x_q, mask_q)
        q = ChannelLayerNorm(name="query_norm")(q)
        k, kv_mask = MaskedConv1D(c, kv_kernel, stride=self.kv_stride, groups=c,
                                  use_bias=False, name="key_conv")(x_k, mask_k)
        k = ChannelLayerNorm(name="key_norm")(k)
        v, _ = MaskedConv1D(c, kv_kernel, stride=self.kv_stride, groups=c,
                            use_bias=False, name="value_conv")(x_v, mask_v)
        v = ChannelLayerNorm(name="value_norm")(v)

        # 1x1 projections (MXU matmuls)
        q = Dense(c, name="query")(q)
        k = Dense(c, name="key")(k)
        v = Dense(c, name="value")(v)

        def to_heads(t):
            b, tt, _ = t.shape
            return t.reshape(b, tt, self.n_head, d_head).transpose(0, 2, 1, 3)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        q = q * (1.0 / math.sqrt(d_head))

        if self.window_size > 1:
            w = self.window_size // 2
            rel_pe = None
            if self.use_rel_pe:
                rel_pe = self.param(
                    "rel_pe",
                    nn.initializers.truncated_normal(stddev=(2.0 / c) ** 0.5),
                    (self.n_head, self.window_size),
                    jnp.float32,
                ).astype(q.dtype)
            time_weight = None
            if self.use_time_weight:
                time_weight = self.param(
                    "time_weighting", nn.initializers.ones,
                    (self.n_head, self.window_size), jnp.float32,
                ).astype(q.dtype)
            out = band_attention(q, k, v, kv_mask, w, rel_pe, time_weight)
        else:
            out = full_attention(q, k, v, kv_mask)

        b, _, t_out, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t_out, c)
        out = Dense(c, name="proj")(out)
        out = nn.Dropout(self.proj_pdrop)(out, deterministic=deterministic)
        out = out * qx_mask.astype(out.dtype)[..., None]
        return out, qx_mask


def fused_train_eligible(window_size: int, ds_stride: int = 1,
                         even_t: bool = True, attn_pdrop: float = 0.0,
                         proj_pdrop: float = 0.0, use_rel_pe: bool = False,
                         use_time_weight: bool = False) -> bool:
    """Static half of the fused-kernel TRAIN dispatch predicate — the single
    source of truth shared by TransformerBlock's dispatch below and the
    backbone's remat selection (backbones.py::pick_block). The dynamic half
    (k/v/mask tensor identity, pos_embd is None) can only be checked at call
    time; a caller that relied on this predicate (e.g. to skip nn.remat) sets
    ``expect_fused=True`` and the block raises if the dynamic half fails."""
    return (_fused.ENABLED and _fused.TRAIN_ENABLED
            and (window_size > 1 or window_size == -1)
            and ds_stride in (1, 2)
            and (ds_stride == 1 or even_t)
            and attn_pdrop == 0.0 and proj_pdrop == 0.0
            and not use_rel_pe and not use_time_weight)


class TransformerBlock(nn.Module):
    """Pre-LN transformer block with optional 2x downsampling
    (reference TransformerBlock, blocks.py:1227-1317; the cross-modal
    MutilModelTransformerBlock :783-877 is the same with separate q/k/v LNs)."""

    n_embd: int
    n_head: int
    ds_stride: int = 1
    window_size: int = -1
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    use_rel_pe: bool = False
    use_time_weight: bool = False
    cross: bool = False
    deterministic: bool = True
    # caller skipped nn.remat expecting the fused train path; raise loudly if
    # the dynamic dispatch conditions fail instead of silently losing remat
    expect_fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        x_k: Optional[jnp.ndarray] = None,
        mask_k: Optional[jnp.ndarray] = None,
        x_v: Optional[jnp.ndarray] = None,
        mask_v: Optional[jnp.ndarray] = None,
        pos_embd: Optional[jnp.ndarray] = None,
    ):
        deterministic = self.deterministic
        c = self.n_embd

        # fused-kernel fast path (TPU): whole block in one VMEM residency —
        # see ops/pallas/fused_block.py. Covers every stride-1 banded block
        # of the HRLR backbone (and the stride-2 branch blocks). At eval the
        # kernel runs alone; in training (custom_vjp) the backward is the
        # XLA vjp of the jnp mirror with droppath folded in as per-sample
        # coefficients — only attn/proj dropout (0 in every production
        # config) forces the standard path. Init uses the standard path.
        train_ok = (_fused.TRAIN_ENABLED
                    and self.attn_pdrop == 0.0 and self.proj_pdrop == 0.0)
        fused_mode = xo = None
        if (_fused.ENABLED and (deterministic or train_ok)
                and (self.window_size > 1 or self.window_size == -1)
                and self.ds_stride in (1, 2) and not self.use_rel_pe
                and not self.use_time_weight and pos_embd is None
                and not self.is_initializing()):
            if self.ds_stride == 2:
                if not self.cross and x.shape[1] % 2 == 0:
                    fused_mode = "ds_self"
            elif not self.cross:
                fused_mode = "self"
            elif x_v is x and mask_k is mask and mask_v is mask:
                fused_mode, xo = "qv_k", x_k
            elif x_k is x_v and mask_k is mask and mask_v is mask:
                fused_mode, xo = "kv", x_k
        if (self.expect_fused and fused_mode is None
                and not deterministic and not self.is_initializing()):
            raise AssertionError(
                "TransformerBlock was constructed with expect_fused=True "
                "(caller skipped nn.remat for it) but the fused train "
                "dispatch conditions were not met at call time — check "
                "k/v/mask tensor identity and pos_embd")
        if fused_mode is not None:
            packed = _fused.pack_block_params(
                self.variables["params"], c, self.cross, x.dtype)
            if fused_mode == "ds_self":
                # the kernel consumes the full-res stream pre-split into
                # even/odd rows (Mosaic has no strided slice)
                x_in, xo_in = x[:, 0::2], x[:, 1::2]
                out_mask = mask[:, 0::2]
            else:
                x_in, xo_in, out_mask = x, xo, mask
            if deterministic:
                y = _fused.fused_transformer_block(
                    x_in, xo_in, out_mask, *packed, n_head=self.n_head,
                    w_overlap=self.window_size // 2, mode=fused_mode)
            else:
                b = x_in.shape[0]
                if self.path_pdrop > 0.0:
                    keep = 1.0 - self.path_pdrop
                    u = jax.random.uniform(self.make_rng("dropout"), (b, 2),
                                           x_in.dtype)
                    coefs = (jnp.floor(keep + u) / keep).astype(jnp.float32)
                else:
                    coefs = jnp.ones((b, 2), jnp.float32)
                y = _fused.fused_transformer_block_train(
                    x_in, xo_in, out_mask, coefs, *packed,
                    n_head=self.n_head, w_overlap=self.window_size // 2,
                    mode=fused_mode)
            return y, out_mask

        attn = ConvAttention(
            c, self.n_head,
            window_size=self.window_size,
            q_stride=self.ds_stride, kv_stride=self.ds_stride,
            attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
            use_rel_pe=self.use_rel_pe, use_time_weight=self.use_time_weight,
            name="attn",
        )
        if self.cross:
            q_in = ChannelLayerNorm(name="lnq")(x)
            k_in = ChannelLayerNorm(name="lnk")(x_k)
            v_in = ChannelLayerNorm(name="lnv")(x_v)
            out, out_mask = attn(q_in, mask, k_in, mask_k, v_in, mask_v,
                                 deterministic=deterministic)
        else:
            q_in = ChannelLayerNorm(name="ln1")(x)
            out, out_mask = attn(q_in, mask, deterministic=deterministic)

        out_mask_f = out_mask.astype(out.dtype)[..., None]
        if self.ds_stride > 1:
            skip = max_pool_skip(x, self.ds_stride)
        else:
            skip = x
        out = skip * out_mask_f + AffineDropPath(self.path_pdrop, name="drop_path_attn")(
            out, deterministic=deterministic
        )

        # conv-MLP (1x1 convs == dense layers), hidden = 4x
        h = ChannelLayerNorm(name="ln2")(out)
        h = Dense(4 * c, name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(self.proj_pdrop)(h, deterministic=deterministic)
        h = Dense(c, name="mlp_fc2")(h)
        h = nn.Dropout(self.proj_pdrop)(h, deterministic=deterministic)
        out = out + AffineDropPath(self.path_pdrop, name="drop_path_mlp")(
            h * out_mask_f, deterministic=deterministic
        )
        if pos_embd is not None:
            out = out + pos_embd * out_mask_f
        return out, out_mask


class DownBlock(nn.Module):
    """MaskedConv(k3) + InstanceNorm + LeakyReLU(0.2) (blocks.py:1495-1516)."""

    features: int
    stride: int = 2
    norm: bool = True

    @nn.compact
    def __call__(self, x, mask):
        x, mask = MaskedConv1D(self.features, 3, stride=self.stride, name="conv")(x, mask)
        if self.norm:
            x = instance_norm_time(x)
        return nn.leaky_relu(x, 0.2), mask


class UpBlock(nn.Module):
    """MaskedConvTranspose + InstanceNorm + LeakyReLU/Tanh (blocks.py:1519-1541)."""

    features: int
    last: bool = False
    norm: bool = True

    @nn.compact
    def __call__(self, x, mask):
        x, mask = MaskedConvTranspose1D(self.features, 3, stride=2, output_padding=1,
                                        name="conv")(x, mask)
        if self.norm:
            x = instance_norm_time(x)
        x = jnp.tanh(x) if self.last else nn.leaky_relu(x, 0.2)
        return x, mask


class DeepInterpolator(nn.Module):
    """Feature-recovery module (blocks.py:1593-1638).

    Returns (stop_gradient(inputs), reconstruction | None, video logits).
    The production no-recon arch discards the reconstruction, so we only
    compute the Expansion decoder when ``with_reconstruction`` — the reference
    wastes those FLOPs (av_fd_no_recon.py:346 ignores the second output).
    """

    hidden: int = 256
    num_classes: int = 1
    normalize: bool = False
    with_reconstruction: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        in_ch = x.shape[-1]
        if self.normalize:
            mu, sigma = jnp.mean(x), jnp.std(x, ddof=1)
            x = (x - mu) / sigma * mask.astype(x.dtype)[..., None]

        # Contraction: 768 -> 24, channels in->256->512->1024->2048->hidden
        feat, m = DownBlock(256, name="down_1")(x, mask)
        feat, m = DownBlock(512, name="down_2")(feat, m)
        feat, m = DownBlock(1024, name="down_3")(feat, m)
        feat, m = DownBlock(2048, name="down_4")(feat, m)
        feat, m = DownBlock(self.hidden, name="down_5")(feat, m)

        # video-level classifier (blocks.py:1608-1618)
        h = Dense(self.hidden, use_bias=False, name="cls_conv0")(feat)
        h = instance_norm_time(h)
        h = nn.leaky_relu(h, 0.2)
        h_max = jnp.max(h, axis=1)
        h_avg = jnp.mean(h, axis=1)
        h = jnp.concatenate([h_max, h_avg], axis=-1)
        h = Dense(self.hidden, use_bias=False, name="cls_fc1")(h)
        h = ChannelLayerNorm(name="cls_ln")(h[:, None, :])[:, 0]
        h = jax.nn.relu(h)
        h = nn.Dropout(0.5)(h, deterministic=deterministic)
        cls_scores = Dense(self.num_classes, name="cls_fc2")(h)

        reco = None
        if self.with_reconstruction:
            r, rm = UpBlock(2048, name="up_1")(feat, m)
            r, rm = UpBlock(1024, name="up_2")(r, rm)
            r, rm = UpBlock(512, name="up_3")(r, rm)
            r, rm = UpBlock(256, name="up_4")(r, rm)
            reco, _ = UpBlock(in_ch, last=False, name="up_5")(r, rm)

        return jax.lax.stop_gradient(x), reco, cls_scores


class SegmentAndCls(nn.Module):
    """Frame-level segmentation + video head of the THE variant
    (blocks.py:1640-1721): 5 stride-1 conv blocks in->1024->512->256->128->64,
    per-frame linear seg logits, video logit from max+avg of the seg map."""

    hidden: int = 1024
    num_classes: int = 1
    normalize: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        if self.normalize:
            mu, sigma = jnp.mean(x), jnp.std(x, ddof=1)
            x = (x - mu) / sigma * mask.astype(x.dtype)[..., None]
        feat, m = DownBlock(self.hidden, stride=1, name="down_1")(x, mask)
        feat, m = DownBlock(self.hidden // 2, stride=1, name="down_2")(feat, m)
        feat, m = DownBlock(self.hidden // 4, stride=1, name="down_3")(feat, m)
        feat, m = DownBlock(self.hidden // 8, stride=1, name="down_4")(feat, m)
        feat, m = DownBlock(self.hidden // 16, stride=1, name="down_5")(feat, m)

        h = Dense(self.hidden // 16, use_bias=False, name="seg_conv0")(feat)
        h = instance_norm_time(h)
        h = nn.leaky_relu(h, 0.2)
        seg_map = Dense(self.num_classes, name="seg_linear")(h)  # (B, T, ncls)
        s_max = jnp.max(seg_map, axis=1)
        s_avg = jnp.mean(seg_map, axis=1)
        cls_scores = Dense(self.num_classes, name="cls_linear1")(
            jnp.concatenate([s_max, s_avg], axis=-1)
        )
        return jax.lax.stop_gradient(x), seg_map[..., 0], cls_scores
