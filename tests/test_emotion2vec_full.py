"""Full Emotion2Vec golden test.

Builds a plain-torch mirror of the reference's complete fairseq
``extract_features`` path (emotion2vec.py:97-188 with mask=False /
features_only=True; audio.py:52-182; base.py:188-275; modules.py:184-320)
with a state_dict whose keys match fairseq naming exactly, then feeds those
weights through our ``convert_emotion2vec_torch`` converter and checks the
JAX module reproduces the torch mirror bit-for-bit (to float tolerance),
including the conv frontend, feature projection, relative positional
encoder, prenet/context encoder, main blocks, padding-mask conversion
(audio.py:140-182) and the extra-tokens path (base.py:102-109, 301-309).

The reference file itself needs fairseq/timm, absent here, so the oracle
re-creates the same math with plain torch modules whose parameter names
match the checkpoint layout (verified against the fairseq sources mirrored
in the reference tree).
"""

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
    CONV_SPEC, Emotion2Vec, Emotion2VecConfig, conv_output_length,
    convert_emotion2vec_torch)


class TransposeLast(tnn.Module):
    def forward(self, x):
        return x.transpose(-2, -1)


class TorchAltAttention(tnn.Module):
    """modules.py:252-320 (qkv_bias=True, no cosine attention)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x, padding_mask=None, alibi_bias=None):
        b, n, c = x.shape
        qkv = (self.qkv(x).reshape(b, n, 3, self.num_heads, c // self.num_heads)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        if alibi_bias is not None:
            attn = attn.type_as(alibi_bias)
            attn[:, : alibi_bias.size(1)] += alibi_bias
        if padding_mask is not None and padding_mask.any():
            attn = attn.masked_fill(
                padding_mask.unsqueeze(1).unsqueeze(2).to(torch.bool),
                float("-inf"))
        attn = attn.softmax(dim=-1, dtype=torch.float32).to(dtype=q.dtype)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class TorchMlp(tnn.Module):
    """timm Mlp: fc1 -> GELU -> fc2 (dropouts are 0 at inference)."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(tnn.functional.gelu(self.fc1(x)))


class TorchAltBlock(tnn.Module):
    """Post-norm path of modules.py:233-249 (layer_norm_first=False)."""

    def __init__(self, dim, num_heads, mlp_ratio, eps):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=eps)
        self.norm2 = tnn.LayerNorm(dim, eps=eps)
        self.attn = TorchAltAttention(dim, num_heads)
        self.mlp = TorchMlp(dim, int(dim * mlp_ratio))

    def forward(self, x, padding_mask=None, alibi_bias=None):
        x = x + self.attn(x, padding_mask, alibi_bias)
        r = self.norm1(x)
        x = self.mlp(r)
        return self.norm2(r + x)


def _make_local_encoder():
    """fairseq ConvFeatureExtractionModel, mode='layer_norm', conv_bias=False.

    Block layout (and therefore state_dict indices) is
    Sequential(conv, dropout, Sequential(TransposeLast, LN, TransposeLast),
    GELU) -> keys conv_layers.{i}.0.weight and conv_layers.{i}.2.1.{w,b}.
    """
    m = tnn.Module()
    layers = tnn.ModuleList()
    in_d = 1
    for dim, k, s in CONV_SPEC:
        layers.append(tnn.Sequential(
            tnn.Conv1d(in_d, dim, k, stride=s, bias=False),
            tnn.Dropout(0.0),
            tnn.Sequential(TransposeLast(), tnn.LayerNorm(dim), TransposeLast()),
            tnn.GELU()))
        in_d = dim
    m.conv_layers = layers
    m.forward = lambda x: _run_seq(layers, x.unsqueeze(1))
    return m


def _run_seq(layers, x):
    for l in layers:
        x = l(x)
    return x


def _torch_alibi(heads: int, t: int) -> torch.Tensor:
    """base.py:get_alibi (dims=1): slopes * -|i - j|, (H, T, T) float32."""
    import math

    def slopes_pow2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start ** i for i in range(n)]

    def slopes(n):
        if math.log2(n).is_integer():
            return slopes_pow2(n)
        c = 2 ** math.floor(math.log2(n))
        return slopes_pow2(c) + slopes(2 * c)[0::2][: n - c]

    pos = torch.arange(t)
    bias = (pos[None, :] - pos[:, None]).abs().float() * -1
    return torch.tensor(slopes(heads))[:, None, None] * bias[None]


class TorchEmotion2Vec(tnn.Module):
    """State-dict-compatible mirror of Data2VecMultiModel (AUDIO only)."""

    def __init__(self, cfg: Emotion2VecConfig):
        super().__init__()
        self.cfg = cfg
        e = cfg.embed_dim
        enc = tnn.Module()
        enc.local_encoder = _make_local_encoder()
        enc.project_features = tnn.Sequential(
            TransposeLast(), tnn.LayerNorm(CONV_SPEC[-1][0]), tnn.Linear(CONV_SPEC[-1][0], e))
        k = max(3, cfg.conv_pos_width // cfg.conv_pos_depth)
        assert k % 2 == 1, "SamePad(k) is identity only for odd k"
        enc.relative_positional_encoder = tnn.Sequential(
            TransposeLast(),
            *[tnn.Sequential(
                tnn.Conv1d(e, e, k, padding=k // 2, groups=cfg.conv_pos_groups),
                tnn.Identity(),  # SamePad(k), no-op for odd k
                TransposeLast(),
                tnn.LayerNorm(e, elementwise_affine=False),
                TransposeLast(),
                tnn.GELU())
              for _ in range(cfg.conv_pos_depth)],
            TransposeLast())
        ctx = tnn.Module()
        ctx.norm = tnn.LayerNorm(e, eps=cfg.norm_eps)
        ctx.blocks = tnn.ModuleList(
            [TorchAltBlock(e, cfg.num_heads, cfg.mlp_ratio, cfg.norm_eps)
             for _ in range(cfg.prenet_depth)])
        enc.context_encoder = ctx
        if cfg.num_extra_tokens:
            enc.extra_tokens = tnn.Parameter(
                torch.randn(1, cfg.num_extra_tokens, e) * 0.02)
        if cfg.use_alibi:
            # fairseq shape (1, 1, heads-or-1, 1, 1) (base.py:111-121)
            enc.alibi_scale = tnn.Parameter(torch.full((1, 1, 1, 1, 1), 0.7))
        self.modality_encoders = tnn.ModuleDict({"AUDIO": enc})
        self.blocks = tnn.ModuleList(
            [TorchAltBlock(e, cfg.num_heads, cfg.mlp_ratio, cfg.norm_eps)
             for _ in range(cfg.depth)])

    def convert_padding_mask(self, x, padding_mask):
        # audio.py:140-182
        input_lengths = (1 - padding_mask.long()).sum(-1)
        out = input_lengths
        for _, kk, ss in CONV_SPEC:
            out = torch.div(out - kk, ss, rounding_mode="floor") + 1
        if padding_mask.any():
            pm = torch.zeros(x.shape[:2], dtype=x.dtype)
            pm[(torch.arange(pm.shape[0]), out - 1)] = 1
            return (1 - pm.flip([-1]).cumsum(-1).flip([-1])).bool()
        return torch.zeros(x.shape[:2], dtype=torch.bool)

    def forward(self, source, padding_mask=None):
        cfg = self.cfg
        enc = self.modality_encoders["AUDIO"]
        x = enc.local_encoder(source)          # (B, C, T')
        x = enc.project_features(x)            # (B, T', E)
        if padding_mask is not None:
            padding_mask = self.convert_padding_mask(x, padding_mask)
        x = x + enc.relative_positional_encoder(x)
        ab = None
        if cfg.use_alibi:
            # single-scale path of base.py:276-292: bias * clamp_min(0)(scale)
            ab = _torch_alibi(cfg.num_heads, x.size(1))[None]
            ab = ab * enc.alibi_scale.clamp_min(0).squeeze(0).type_as(ab)
        if cfg.num_extra_tokens:
            extra = enc.extra_tokens.expand(x.size(0), -1, -1)
            x = torch.cat([extra, x], dim=1)
            if padding_mask is not None:
                pad = torch.zeros(x.size(0), cfg.num_extra_tokens, dtype=torch.bool)
                padding_mask = torch.cat([pad, padding_mask], dim=1)
            if ab is not None:
                num = cfg.num_extra_tokens
                ab = tnn.functional.pad(ab, (num, 0, num, 0))
        x = enc.context_encoder.norm(x)
        for blk in enc.context_encoder.blocks:
            x = blk(x, padding_mask, ab)
        for blk in self.blocks:
            x = blk(x, padding_mask, ab)
        return x[:, cfg.num_extra_tokens:]


def _run_pair(cfg, wav, pad=None):
    torch.manual_seed(0)
    ref = TorchEmotion2Vec(cfg).eval()
    ours = Emotion2Vec(cfg)
    args = (jnp.asarray(wav),) + ((jnp.asarray(pad),) if pad is not None else ())
    template = jax.eval_shape(lambda: ours.init(jax.random.PRNGKey(0), *args))
    params = convert_emotion2vec_torch(ref.state_dict(), template, cfg)
    got = np.asarray(ours.apply(params, *args))
    with torch.no_grad():
        t_args = (torch.from_numpy(wav),) + (
            (torch.from_numpy(pad),) if pad is not None else ())
        want = ref(*t_args).numpy()
    return got, want


def test_full_model_matches_torch_mirror(rng):
    # small depth keeps CPU time sane; full 768-d/12-head geometry
    cfg = Emotion2VecConfig(depth=2, prenet_depth=1)
    wav = rng.standard_normal((2, 6400)).astype(np.float32)
    got, want = _run_pair(cfg, wav)
    assert got.shape == (2, conv_output_length(6400), cfg.embed_dim)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_full_model_padding_mask_and_extra_tokens(rng):
    cfg = Emotion2VecConfig(depth=1, prenet_depth=1, num_extra_tokens=10)
    wav = rng.standard_normal((2, 6400)).astype(np.float32)
    lens = np.asarray([6400, 4000])
    pad = (np.arange(6400)[None, :] >= lens[:, None])  # True on padding
    wav = wav * ~pad
    got, want = _run_pair(cfg, wav, pad)
    # compare only valid frames: padded-query rows see garbage keys equally,
    # but the extractor truncates them downstream anyway
    valid = conv_output_length(4000)
    np.testing.assert_allclose(got[0], want[0], atol=2e-4)
    np.testing.assert_allclose(got[1, :valid], want[1, :valid], atol=2e-4)


def test_full_model_alibi_path(rng):
    """use_alibi=True: symmetric ALiBi bias scaled by clamp_min(0) of the
    learned alibi_scale, padded around extra tokens (base.py:276-308)."""
    cfg = Emotion2VecConfig(depth=1, prenet_depth=1, use_alibi=True,
                            num_extra_tokens=4)
    wav = rng.standard_normal((2, 4800)).astype(np.float32)
    got, want = _run_pair(cfg, wav)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_frame_rate_is_50hz():
    # 320x downsample (audio.py:26-32): one second of 16 kHz -> ~50 frames
    assert conv_output_length(16000) == 49
    assert conv_output_length(32000) == 99


@pytest.mark.parametrize("n_heads", [12, 16])
def test_alibi_even_heads_slopes(n_heads):
    from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
        alibi_slopes)
    s = alibi_slopes(n_heads)
    assert s.shape == (n_heads,)
    assert np.all(s > 0) and np.all(np.diff(s[: n_heads // 2]) < 0)
