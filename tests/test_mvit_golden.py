"""MViT-v2 golden test against a plain-torch mirror of torchvision's video
MViT (torchvision/models/video/mvit.py), in the exact configuration the
reference builds (video_feature/aligned_video/model/video_encoder.py:65-201:
residual_pool=True, residual_with_cls_embed=False, rel_pos_embed=True,
proj_after_attn=True, patch kernel (3,15,15) stride (1,12,12) padding
(1,3,3), kernel_q=kernel_kv=(3,3,3)).

torchvision is not installed in this image, so the oracle re-creates its
module graph with plain torch, using torchvision's parameter naming so the
same weights also flow through ``convert_mvit_torch`` (the converter used for
the AlignVideo checkpoint). Mirrored semantics:

- Pool: depthwise Conv3d (bias=False) / MaxPool3d over the token grid with
  the class token split off, then LayerNorm applied AFTER re-attaching the
  class token (Pool.forward),
- attention: qkv at output dim (proj_after_attn), q scaled post-pooling,
  decomposed rel-pos bias added to attn[:, :, 1:, 1:] with ratio-corrected
  index tables (_add_rel_pos), residual pooling adds pooled q excluding the
  class token (residual_with_cls_embed=False),
- block: channel projection applied to norm1(x) when dims change, skip path
  max-pooled with kernel (s+1 if s>1), MLP = Linear/GELU/Linear at indices
  mlp.{0,3}, final LayerNorm, eps 1e-6 everywhere.
"""

import math

import numpy as np
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.mvit import (
    MSBlockConfig, MViTVideoEncoder, convert_mvit_torch, generate_config)


def _prod(xs):
    out = 1
    for x in xs:
        out *= x
    return out


class TorchPool(tnn.Module):
    def __init__(self, pool, norm_dim=None):
        super().__init__()
        self.pool = pool
        if norm_dim is not None:
            self.norm_act = tnn.Sequential(tnn.LayerNorm(norm_dim, eps=1e-6))
        else:
            self.norm_act = None

    def forward(self, x, thw):
        # x: (B, H, N, d) with class token at index 0
        b, h, n, d = x.shape
        cls_tok, tokens = x[:, :, :1], x[:, :, 1:]
        grid = tokens.reshape(b * h, *thw, d).permute(0, 4, 1, 2, 3)
        grid = self.pool(grid)
        new_thw = tuple(grid.shape[2:])
        grid = grid.permute(0, 2, 3, 4, 1).reshape(b, h, _prod(new_thw), d)
        x = torch.cat((cls_tok, grid), dim=2)
        if self.norm_act is not None:
            x = self.norm_act(x)
        return x, new_thw


def _rel_index(q_size, k_size):
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    dist = (torch.arange(q_size)[:, None] * q_ratio
            - torch.arange(k_size)[None, :] * k_ratio)
    return (dist + (k_size - 1) * k_ratio).long()


class TorchMSAttention(tnn.Module):
    def __init__(self, cfg: MSBlockConfig, input_thw):
        super().__init__()
        self.cfg = cfg
        out = cfg.output_channels
        self.num_heads = cfg.num_heads
        self.head_dim = out // cfg.num_heads
        self.scaler = self.head_dim ** -0.5
        self.qkv = tnn.Linear(cfg.input_channels, 3 * out)
        self.project = tnn.Linear(out, out)

        d = self.head_dim
        self.pool_q = TorchPool(
            tnn.Conv3d(d, d, cfg.kernel_q, stride=cfg.stride_q,
                       padding=tuple(k // 2 for k in cfg.kernel_q),
                       groups=d, bias=False), d)
        self.pool_k = TorchPool(
            tnn.Conv3d(d, d, cfg.kernel_kv, stride=cfg.stride_kv,
                       padding=tuple(k // 2 for k in cfg.kernel_kv),
                       groups=d, bias=False), d)
        self.pool_v = TorchPool(
            tnn.Conv3d(d, d, cfg.kernel_kv, stride=cfg.stride_kv,
                       padding=tuple(k // 2 for k in cfg.kernel_kv),
                       groups=d, bias=False), d)

        size = max(input_thw[1:])
        q_size = size // cfg.stride_q[1]
        kv_size = size // cfg.stride_kv[1]
        rel_sp_dim = 2 * max(q_size, kv_size) - 1
        self.rel_pos_h = tnn.Parameter(torch.zeros(rel_sp_dim, d))
        self.rel_pos_w = tnn.Parameter(torch.zeros(rel_sp_dim, d))
        self.rel_pos_t = tnn.Parameter(torch.zeros(2 * input_thw[0] - 1, d))

    def _add_rel_pos(self, attn, q, q_thw, k_thw):
        qt, qh, qw = q_thw
        kt, kh, kw = k_thw
        rel_h = self.rel_pos_h[_rel_index(qh, kh)]
        rel_w = self.rel_pos_w[_rel_index(qw, kw)]
        rel_t = self.rel_pos_t[_rel_index(qt, kt)]
        b, n_head = q.shape[:2]
        r_q = q[:, :, 1:].reshape(b, n_head, qt, qh, qw, self.head_dim)
        rel_h_q = torch.einsum("bythwc,hkc->bythwk", r_q, rel_h)
        rel_w_q = torch.einsum("bythwc,wkc->bythwk", r_q, rel_w)
        rel_t_q = torch.einsum("bythwc,tkc->bythwk", r_q, rel_t)
        bias = (rel_t_q[..., :, None, None] + rel_h_q[..., None, :, None]
                + rel_w_q[..., None, None, :])
        attn[:, :, 1:, 1:] += bias.reshape(b, n_head, qt * qh * qw,
                                           kt * kh * kw)
        return attn

    def forward(self, x, thw):
        b, n, _ = x.shape
        qkv = (self.qkv(x)
               .reshape(b, n, 3, self.num_heads, self.head_dim)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        q, q_thw = self.pool_q(q, thw)
        k, k_thw = self.pool_k(k, thw)
        v, _ = self.pool_v(v, thw)
        attn = torch.matmul(self.scaler * q, k.transpose(2, 3))
        attn = self._add_rel_pos(attn, q, q_thw, k_thw)
        attn = attn.softmax(dim=-1)
        x = torch.matmul(attn, v)
        # residual_with_cls_embed=False: skip the class token in the shortcut
        x[:, :, 1:] += q[:, :, 1:]
        x = x.transpose(1, 2).reshape(b, -1, self.cfg.output_channels)
        return self.project(x), q_thw


class TorchMSBlock(tnn.Module):
    def __init__(self, cfg: MSBlockConfig, input_thw):
        super().__init__()
        self.cfg = cfg
        self.norm1 = tnn.LayerNorm(cfg.input_channels, eps=1e-6)
        self.norm2 = tnn.LayerNorm(cfg.output_channels, eps=1e-6)
        self.attn = TorchMSAttention(cfg, input_thw)
        if cfg.input_channels != cfg.output_channels:
            self.project = tnn.Linear(cfg.input_channels, cfg.output_channels)
        else:
            self.project = None
        if _prod(cfg.stride_q) > 1:
            kernel_skip = tuple(s + 1 if s > 1 else s for s in cfg.stride_q)
            self.pool_skip = TorchPool(
                tnn.MaxPool3d(kernel_skip, stride=cfg.stride_q,
                              padding=tuple(k // 2 for k in kernel_skip)),
                None)
        else:
            self.pool_skip = None
        hidden = 4 * cfg.output_channels
        self.mlp = tnn.Sequential(
            tnn.Linear(cfg.output_channels, hidden), tnn.GELU(),
            tnn.Dropout(0.0), tnn.Linear(hidden, cfg.output_channels),
            tnn.Dropout(0.0))

    def forward(self, x, thw):
        x_norm1 = self.norm1(x)
        x_attn, thw_new = self.attn(x_norm1, thw)
        # proj_after_attn=True: the channel projection reads norm1 output
        if self.project is not None:
            x = self.project(x_norm1)
        if self.pool_skip is not None:
            x = self.pool_skip(x.unsqueeze(1), thw)[0].squeeze(1)
        x = x + x_attn
        x_norm2 = self.norm2(x)
        return x + self.mlp(x_norm2), thw_new


class TorchMViT(tnn.Module):
    """State-dict-compatible mirror of torchvision video MViT (feature path
    of MvitVideoEncoder.forward: conv_proj -> class token -> blocks -> norm
    -> drop class token)."""

    def __init__(self, block_setting, patch_kernel=(3, 15, 15),
                 patch_stride=(1, 12, 12), patch_padding=(1, 3, 3),
                 input_thw=(4, 4, 4)):
        super().__init__()
        c0 = block_setting[0].input_channels
        self.conv_proj = tnn.Conv3d(3, c0, patch_kernel, stride=patch_stride,
                                    padding=patch_padding)
        pe = tnn.Module()
        pe.class_token = tnn.Parameter(torch.zeros(c0))
        self.pos_encoding = pe
        blocks = []
        thw = input_thw
        for cfg in block_setting:
            blocks.append(TorchMSBlock(cfg, thw))
            thw = tuple(
                int(math.ceil(s / st)) for s, st in zip(thw, cfg.stride_q))
        self.blocks = tnn.ModuleList(blocks)
        self.norm = tnn.LayerNorm(block_setting[-1].output_channels, eps=1e-6)

    def forward(self, video):
        # video: (B, 3, T, H, W)
        x = self.conv_proj(video)
        thw = tuple(x.shape[2:])
        x = x.flatten(2).transpose(1, 2)
        cls_tok = self.pos_encoding.class_token.expand(
            x.size(0), -1).unsqueeze(1)
        x = torch.cat((cls_tok, x), dim=1)
        for blk in self.blocks:
            x, thw = blk(x, thw)
        x = self.norm(x)
        return x[:, 1:], thw


def _randomize(model):
    """Give every parameter (incl. zero-init rel-pos tables and class token)
    a nonzero value so the test exercises all paths."""
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def test_mvit_matches_torch_mirror(rng):
    # two stages with a channel change + q-stride transition; 48x48 input
    # -> 4x4 patch tokens, T=4; kv pooled 2x in stage 1
    block_setting = generate_config([1, 2], [1, 2], [16, 32], 24)
    ours = MViTVideoEncoder(tuple(block_setting), temporal_size=4,
                            spatial_size=(48, 48))
    ref = TorchMViT(block_setting, input_thw=(4, 4, 4)).eval()
    _randomize(ref)

    video = rng.standard_normal((2, 4, 48, 48, 3)).astype(np.float32)
    template = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.asarray(video)))
    params = convert_mvit_torch(ref.state_dict(), template)

    got = np.asarray(ours.apply(params, jnp.asarray(video)))
    with torch.no_grad():
        tokens, thw = ref(torch.from_numpy(video).permute(0, 4, 1, 2, 3))
    # our encoder averages the spatial tokens per frame
    want = tokens.reshape(2, *thw, tokens.shape[-1]).mean(dim=(2, 3)).numpy()
    assert got.shape == want.shape == (2, 4, 24)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_mvit_production_geometry():
    """The reference's mvit_v2 config on 96x96 inputs collapses the spatial
    grid to 1x1 so token count == frame count (video_encoder.py:81-95)."""
    from audio_visual_deepfake_detection_tpu.frontends.mvit import mvit_v2_t

    enc = mvit_v2_t(out_dim=8)
    video = jnp.zeros((1, 4, 96, 96, 3))
    params = enc.init(jax.random.PRNGKey(0), video)
    out = enc.apply(params, video)
    assert out.shape == (1, 4, 8)


def test_mvit_v2_s_matches_torchvision_published_param_count():
    """Independent STRUCTURAL anchor (torchvision itself is not installable
    in this image, so the numerical golden above uses a hand-built mirror —
    a correlated oracle). torchvision's docs publish num_params for
    MViT_V2_S_Weights.KINETICS400_V1 = 34,537,744 (stock geometry: spatial
    224, temporal 16, patch kernel (3,7,7) stride (2,4,4) pad (1,3,3),
    blocks [1,2,11,2], heads [1,2,4,8], channels [96,192,384,768], head
    Linear(768, 400)). Building that exact geometry with OUR modules must
    reproduce the published count to the parameter — this pins every
    parameter shape in the model (rel-pos table sizing from input sizes,
    per-head pool convs, qkv/proj/MLP dims, class token) against an
    artifact that was not produced by this repo."""
    import jax

    bs = generate_config([1, 2, 11, 2], [1, 2, 4, 8], [96, 192, 384, 768],
                         768)  # stock: last stage keeps 768 (no out proj)
    enc = MViTVideoEncoder(tuple(bs), patch_kernel=(3, 7, 7),
                           patch_stride=(2, 4, 4), patch_padding=(1, 3, 3),
                           temporal_size=16, spatial_size=(224, 224))
    shapes = jax.eval_shape(lambda: enc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 224, 224, 3))))
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes))
    head = 768 * 400 + 400  # torchvision's head: Linear(768, 400)
    assert n + head == 34_537_744


def test_rel_pos_index_matches_torchvision():
    from audio_visual_deepfake_detection_tpu.frontends.mvit import (
        _rel_pos_index)

    for q, k in [(8, 8), (4, 8), (8, 4), (2, 8), (8, 2), (1, 1)]:
        got = _rel_pos_index(q, k)
        want = _rel_index(q, k).numpy()
        np.testing.assert_array_equal(got, want)
        assert got.max() <= 2 * max(q, k) - 2 and got.min() >= 0
