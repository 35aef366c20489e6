"""Emotion2Vec (data2vec-multi) audio emotion encoder — inference path.

Faithful JAX re-implementation of the reference's fairseq model
(audio_feature/emotion_audio/upstream/models/{emotion2vec,audio,base,modules}.py),
``extract_features`` path only (mask=False, features_only=True):

1. conv feature extractor, spec [(512,10,5)] + [(512,3,2)]*4 + [(512,2,2)]*2
   (320x downsample -> 50 Hz), mode 'layer_norm': Conv1d(no bias) + LN + GELU
   (audio.py:26-32, fairseq ConvFeatureExtractionModel),
2. feature projection LN(512) -> Linear(512, 768) (audio.py:74-78),
3. depthwise-group conv relative positional encoder, 5 x [Conv1d(k=19,
   groups=16) + LN(no affine) + GELU], added residually (audio.py:80-102,
   base.py:258-275),
4. optional learned extra tokens prepended (base.py:301-309),
5. prenet ("context encoder") AltBlocks with a pre-LN over the stack
   (post-norm config: BlockEncoder applies norm before blocks,
   modules.py:72-76), then the main AltBlocks (emotion2vec.py:135-160),
6. post-norm AltBlock: x = x + attn(x); r = norm1(x); x = norm2(r + mlp(r))
   (modules.py:240-247), attention softmax in float32, qkv_bias=True,
7. optional ALiBi attention bias (disabled by default, matching
   D2vModalityConfig.use_alibi_encoder = False),
8. strip extra tokens -> (B, T', 768) frame features.

Defaults follow Data2VecMultiConfig: depth 8, prenet_depth 4, 12 heads,
embed 768, norm_eps 1e-6. The exact values for a given checkpoint come from
its saved config; ``convert_emotion2vec_torch`` maps fairseq weights in.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pallas import full_attention as _fmha

# Mixed-precision policy (matching the localizer's): params live in f32;
# ``dtype=bfloat16`` runs the matmuls/convs on the MXU in bf16 while flax
# normalization layers still compute their statistics in f32 and the
# attention softmax is cast to f32 explicitly. dtype=float32 is bit-identical
# to the pre-dtype module (flax dtype=None on f32 inputs).

CONV_SPEC: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    (512, 2, 2), (512, 2, 2))


@dataclasses.dataclass(frozen=True)
class Emotion2VecConfig:
    embed_dim: int = 768
    depth: int = 8
    prenet_depth: int = 4
    num_heads: int = 12
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-6
    conv_pos_depth: int = 5
    conv_pos_width: int = 95
    conv_pos_groups: int = 16
    num_extra_tokens: int = 0
    use_alibi: bool = False


def conv_output_length(length: int, spec=CONV_SPEC) -> int:
    for _, k, s in spec:
        length = (length - k) // s + 1
    return length


class ConvFeatureExtractor(nn.Module):
    """fairseq ConvFeatureExtractionModel, mode='layer_norm', no conv bias.

    Kept as lax.conv (nn.Conv): two rounds of explicit tap-matmul / im2col
    rewrites (strided-slice + small-K dot_general forms) measured 5x SLOWER
    and OOM-prone on v5e — XLA lowers contraction-dim-10 dots through a
    broadcast temp that blew the chained-bench to 15 GB of scratch
    (round-4 BENCH_NOTES, "conv extractor forms"). The conv lowering's
    measured 45 ms (48x10 s, bf16) vs a 13 ms HBM light-speed stands as the
    known gap; closing it needs a fused Pallas conv+LN+GELU, not an XLA
    reshuffle.
    """

    spec: Tuple[Tuple[int, int, int], ...] = CONV_SPEC
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas import conv_extractor as _fce

        if ((_fce.ENABLED or _fce.INTERPRET) and self.spec == CONV_SPEC
                and not self.is_initializing()):
            # fused Pallas path: the whole 7-layer stack in one VMEM
            # residency per time tile — wav read once, features written
            # once (the XLA conv path measured 45.3 ms vs a 13.2 ms HBM
            # floor at the production workload; see conv_extractor.py)
            return _fce.fused_conv_extractor(
                wav, self.variables["params"],
                out_len=conv_output_length(int(wav.shape[-1])),
                interpret=_fce.INTERPRET,
                compute_dtype=jnp.dtype(self.dtype)
                if self.dtype is not None else jnp.float32)
        x = wav[..., None]  # (B, L, 1)
        for i, (dim, k, s) in enumerate(self.spec):
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ln_{i}")(x)
            x = jax.nn.gelu(x, approximate=False)
        return x  # (B, T', 512)


class AltAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, alibi_bias=None):
        b, n, c = x.shape
        d = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (d ** -0.5), qkv[1], qkv[2]
        if (_fmha.ENABLED or _fmha.INTERPRET) and alibi_bias is None:
            # fused path: scores + key bias + softmax + P@V in one VMEM
            # residency per (batch, head) — no (B, H, T, T) HBM round-trip
            out = _fmha.full_mha(q, k, v, padding_mask,
                                 interpret=_fmha.INTERPRET)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                         preferred_element_type=jnp.float32)
        if alibi_bias is not None:
            att = att + alibi_bias
        if padding_mask is not None:
            att = jnp.where(padding_mask[:, None, None, :], -jnp.inf, att)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class AltBlock(nn.Module):
    """Post-norm variant (layer_norm_first=False), modules.py:240-247."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, alibi_bias=None):
        x = x + AltAttention(self.dim, self.num_heads, dtype=self.dtype,
                             name="attn")(x, padding_mask, alibi_bias)
        r = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(r)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                            name="norm2")(r + h)


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Standard ALiBi head slopes (base.py:get_alibi)."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(np.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if np.log2(n_heads).is_integer():
        return np.asarray(pow2_slopes(n_heads))
    closest = 2 ** int(np.floor(np.log2(n_heads)))
    return np.asarray(
        pow2_slopes(closest) + pow2_slopes(2 * closest)[0::2][: n_heads - closest])


def alibi_bias(n_heads: int, t: int) -> np.ndarray:
    """(H, T, T) symmetric ALiBi bias: -slope * |i - j|."""
    pos = np.arange(t)
    rel = -np.abs(pos[None, :] - pos[:, None]).astype(np.float32)
    return alibi_slopes(n_heads)[:, None, None].astype(np.float32) * rel[None]


class Emotion2Vec(nn.Module):
    cfg: Emotion2VecConfig = Emotion2VecConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray,
                 padding_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(B, L) 16 kHz waveform -> (B, T', 768) @ 50 Hz (f32 out)."""
        c = self.cfg
        x = ConvFeatureExtractor(dtype=self.dtype, name="local_encoder")(wav)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="proj_ln")(x)
        x = nn.Dense(c.embed_dim, dtype=self.dtype, name="proj")(x)

        if padding_mask is not None:
            # recompute the frame-level padding mask (audio.py:140-175)
            lens = jnp.sum(~padding_mask, axis=-1)
            out_lens = lens
            for _, k, s in CONV_SPEC:
                out_lens = (out_lens - k) // s + 1
            frame_idx = jnp.arange(x.shape[1])
            padding_mask = frame_idx[None, :] >= out_lens[:, None]

        # relative positional encoder
        pos = x
        kk = max(3, c.conv_pos_width // c.conv_pos_depth)
        for i in range(c.conv_pos_depth):
            pos = nn.Conv(c.embed_dim, (kk,), padding=kk // 2,
                          feature_group_count=c.conv_pos_groups,
                          dtype=self.dtype, name=f"pos_conv_{i}")(pos)
            pos = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False,
                               dtype=self.dtype)(pos)
            pos = jax.nn.gelu(pos, approximate=False)
        x = x + pos

        ab = None
        if c.use_alibi:
            scale = self.param("alibi_scale", nn.initializers.ones, (1, 1, 1, 1))
            ab = jnp.asarray(alibi_bias(c.num_heads, x.shape[1]))[None] * \
                jnp.clip(scale, 0.0, None)

        if c.num_extra_tokens > 0:
            extra = self.param("extra_tokens", nn.initializers.zeros,
                               (1, c.num_extra_tokens, c.embed_dim))
            x = jnp.concatenate(
                [jnp.tile(extra, (x.shape[0], 1, 1)).astype(x.dtype), x],
                axis=1)
            if padding_mask is not None:
                pad = jnp.zeros((x.shape[0], c.num_extra_tokens), bool)
                padding_mask = jnp.concatenate([pad, padding_mask], axis=1)
            if ab is not None:
                num = c.num_extra_tokens
                ab = jnp.pad(ab, ((0, 0), (0, 0), (num, 0), (num, 0)))

        # prenet ("context encoder"): post-norm config applies LN first
        x = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype,
                         name="prenet_norm")(x)
        for i in range(c.prenet_depth):
            x = AltBlock(c.embed_dim, c.num_heads, c.mlp_ratio, c.norm_eps,
                         dtype=self.dtype, name=f"prenet_{i}")(
                             x, padding_mask, ab)
        for i in range(c.depth):
            x = AltBlock(c.embed_dim, c.num_heads, c.mlp_ratio, c.norm_eps,
                         dtype=self.dtype, name=f"block_{i}")(
                             x, padding_mask, ab)

        return x[:, c.num_extra_tokens:].astype(jnp.float32)


def convert_emotion2vec_torch(state_dict, template, cfg: Emotion2VecConfig = None):
    """Map fairseq data2vec-multi weights into our tree."""
    from flax import traverse_util

    cfg = cfg or Emotion2VecConfig()
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    AUD = "modality_encoders.AUDIO"
    out = {}

    def put(path, value, shape):
        assert value.shape == tuple(shape), (path, value.shape, shape)
        out[path] = value

    flat = traverse_util.flatten_dict(template)
    for path, tmpl in flat.items():
        core = path[1:] if path[0] == "params" else path
        name = core[0]
        leaf = core[-1]
        if name == "local_encoder":
            sub = core[1]
            if sub.startswith("conv_"):
                i = int(sub.split("_")[1])
                w = sd[f"{AUD}.local_encoder.conv_layers.{i}.0.weight"]
                put(path, np.transpose(w, (2, 1, 0)), tmpl.shape)  # (k, in, out)
            else:
                i = int(sub.split("_")[1])
                key = "weight" if leaf == "scale" else "bias"
                put(path, sd[f"{AUD}.local_encoder.conv_layers.{i}.2.1.{key}"], tmpl.shape)
        elif name == "proj_ln":
            key = "weight" if leaf == "scale" else "bias"
            put(path, sd[f"{AUD}.project_features.1.{key}"], tmpl.shape)
        elif name == "proj":
            w = sd[f"{AUD}.project_features.2.{'weight' if leaf == 'kernel' else 'bias'}"]
            put(path, np.transpose(w) if leaf == "kernel" else w, tmpl.shape)
        elif name.startswith("pos_conv_"):
            i = int(name.split("_")[2])
            w = sd[f"{AUD}.relative_positional_encoder.{i + 1}.0."
                   f"{'weight' if leaf == 'kernel' else 'bias'}"]
            put(path, np.transpose(w, (2, 1, 0)) if leaf == "kernel" else w, tmpl.shape)
        elif name == "prenet_norm":
            key = "weight" if leaf == "scale" else "bias"
            put(path, sd[f"{AUD}.context_encoder.norm.{key}"], tmpl.shape)
        elif name == "extra_tokens":
            put(path, sd[f"{AUD}.extra_tokens"], tmpl.shape)
        elif name == "alibi_scale":
            put(path, sd[f"{AUD}.alibi_scale"].reshape(tmpl.shape), tmpl.shape)
        elif name.startswith("prenet_") or name.startswith("block_"):
            i = int(name.split("_")[1])
            ref = (f"{AUD}.context_encoder.blocks.{i}" if name.startswith("prenet_")
                   else f"blocks.{i}")
            sub = core[1]
            if sub == "attn":
                mod = {"qkv": "attn.qkv", "proj": "attn.proj"}[core[2]]
                w = sd[f"{ref}.{mod}.{'weight' if leaf == 'kernel' else 'bias'}"]
                put(path, np.transpose(w) if leaf == "kernel" else w, tmpl.shape)
            elif sub in ("norm1", "norm2"):
                key = "weight" if leaf == "scale" else "bias"
                put(path, sd[f"{ref}.{sub}.{key}"], tmpl.shape)
            elif sub in ("mlp_fc1", "mlp_fc2"):
                mod = "mlp.fc1" if sub == "mlp_fc1" else "mlp.fc2"
                w = sd[f"{ref}.{mod}.{'weight' if leaf == 'kernel' else 'bias'}"]
                put(path, np.transpose(w) if leaf == "kernel" else w, tmpl.shape)
            else:
                raise KeyError(path)
        else:
            raise KeyError(path)
    return traverse_util.unflatten_dict(out)
