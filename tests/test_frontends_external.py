"""Independent-oracle goldens for the Emotion2Vec front end.

The round-1 emotion2vec goldens compare against a torch mirror written by the
same author (a shared misreading would pass). The released fairseq weights
and fairseq itself are absent here, but HuggingFace ``transformers`` ships an
independent reimplementation of the data2vec-audio FRONT — feature encoder
(layer-norm conv stack), feature projection (LN + Linear) and the 5x19
grouped positional conv stack — that is architecturally identical to
emotion2vec's modality front (upstream audio.py: ConvFeatureExtractionModel
mode=layer_norm, project_features, relative_positional_encoder). Same
geometry: channels 512, kernels (10,3,3,3,3,2,2), strides (5,2,2,2,2,2,2),
pos conv depth 5 / kernel 19 / groups 16.

These tests push HF-initialized weights through our converter-free param
trees and require equality with the HF modules — author-independent
verification for everything upstream of the transformer trunk.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
    CONV_SPEC, Emotion2Vec, Emotion2VecConfig, conv_output_length)


@pytest.fixture(scope="module")
def hf_modules():
    from transformers import Data2VecAudioConfig
    from transformers.models.data2vec.modeling_data2vec_audio import (
        Data2VecAudioFeatureEncoder, Data2VecAudioFeatureProjection,
        Data2VecAudioPositionalConvEmbedding)

    cfg = Data2VecAudioConfig(feat_proj_dropout=0.0)
    assert cfg.conv_dim == [d for d, _, _ in CONV_SPEC]
    assert cfg.conv_kernel == [k for _, k, _ in CONV_SPEC]
    assert cfg.conv_stride == [s for _, _, s in CONV_SPEC]
    torch.manual_seed(0)
    enc = Data2VecAudioFeatureEncoder(cfg).eval()
    proj = Data2VecAudioFeatureProjection(cfg).eval()
    pos = Data2VecAudioPositionalConvEmbedding(cfg).eval()
    # random nonzero weights everywhere (HF zero-inits some)
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in (enc, proj, pos):
            for p in mod.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return cfg, enc, proj, pos


def _our_params_from_hf(model, enc, proj, pos, wav):
    """Build our Emotion2Vec param tree directly from the HF state dicts."""
    params = jax.device_get(model.init(jax.random.PRNGKey(0), jnp.asarray(wav)))
    p = params["params"]
    esd = {k: v.numpy() for k, v in enc.state_dict().items()}
    for i in range(len(CONV_SPEC)):
        p["local_encoder"][f"conv_{i}"]["kernel"] = np.transpose(
            esd[f"conv_layers.{i}.conv.weight"], (2, 1, 0))
        p["local_encoder"][f"ln_{i}"]["scale"] = \
            esd[f"conv_layers.{i}.layer_norm.weight"]
        p["local_encoder"][f"ln_{i}"]["bias"] = \
            esd[f"conv_layers.{i}.layer_norm.bias"]
    psd = {k: v.numpy() for k, v in proj.state_dict().items()}
    p["proj_ln"]["scale"] = psd["layer_norm.weight"]
    p["proj_ln"]["bias"] = psd["layer_norm.bias"]
    p["proj"]["kernel"] = np.transpose(psd["projection.weight"])
    p["proj"]["bias"] = psd["projection.bias"]
    osd = {k: v.numpy() for k, v in pos.state_dict().items()}
    for i in range(5):
        p[f"pos_conv_{i}"]["kernel"] = np.transpose(
            osd[f"layers.{i}.conv.weight"], (2, 1, 0))
        p[f"pos_conv_{i}"]["bias"] = osd[f"layers.{i}.conv.bias"]
    # neutral prenet_norm so the output IS the front's output
    p["prenet_norm"]["scale"] = np.ones_like(p["prenet_norm"]["scale"])
    p["prenet_norm"]["bias"] = np.zeros_like(p["prenet_norm"]["bias"])
    return {"params": p}


def test_emotion2vec_front_matches_transformers(rng, hf_modules):
    """wav -> conv stack -> LN+proj -> +pos conv, vs the HF modules chained
    the way Data2VecAudioModel.forward does."""
    _, enc, proj, pos = hf_modules
    cfg = Emotion2VecConfig(depth=0, prenet_depth=0, num_extra_tokens=0)
    model = Emotion2Vec(cfg)
    wav = rng.standard_normal((2, 8000)).astype(np.float32)

    params = _our_params_from_hf(model, enc, proj, pos, wav)
    # our model applies prenet_norm (identity params) AFTER x+pos; the HF
    # encoder applies its own LN at that point too, so compare pre-norm sums
    got = np.asarray(model.apply(params, jnp.asarray(wav)))

    with torch.no_grad():
        feats = enc(torch.from_numpy(wav))            # (B, C, T)
        hidden, _ = proj(feats.transpose(1, 2))       # (B, T, E)
        summed = hidden + pos(hidden)
        # our depth-0 model still applies prenet_norm (unit affine) — mirror
        # it with a plain LayerNorm so the comparison covers the front only
        want = torch.nn.functional.layer_norm(
            summed, (summed.shape[-1],), eps=1e-5).numpy()

    assert got.shape == want.shape == (2, conv_output_length(8000), 768)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv_output_length_matches_torch(hf_modules):
    _, enc, _, _ = hf_modules
    for n in (1600, 4000, 6400, 16000, 16001, 15999):
        with torch.no_grad():
            t = enc(torch.zeros(1, n)).shape[-1]
        assert conv_output_length(n) == t, n


# ---------------------------------------------------------------------------
# AltBlock trunk vs torch.nn.MultiheadAttention (author-independent oracle)
# ---------------------------------------------------------------------------

def _alt_block_oracle(x, qkv_w, qkv_b, proj_w, proj_b, fc1_w, fc1_b,
                      fc2_w, fc2_b, n1_w, n1_b, n2_w, n2_b, n_heads,
                      key_padding=None, alibi=None):
    """Reference AltBlock (post-norm branch, upstream modules.py:240-247)
    rebuilt from torch's OWN attention implementation: the scaled-dot
    attention, padding-mask and float-bias semantics all come from
    torch.nn.MultiheadAttention (independent authorship), leaving only the
    8-line block composition transcribed from the reference."""
    import torch.nn as tnn

    C = x.shape[-1]
    mha = tnn.MultiheadAttention(C, n_heads, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(qkv_w)
        mha.in_proj_bias.copy_(qkv_b)
        mha.out_proj.weight.copy_(proj_w)
        mha.out_proj.bias.copy_(proj_b)
    mha.eval()
    attn_mask = None
    if alibi is not None:
        # torch MHA accepts a float (B*H, L, S) additive score bias
        B, H, L, S = alibi.shape
        attn_mask = alibi.reshape(B * H, L, S)
    with torch.no_grad():
        att, _ = mha(x, x, x, key_padding_mask=key_padding,
                     attn_mask=attn_mask, need_weights=False)
    # modules.py:240-247 (layer_norm_first=False):
    #   x = x + drop_path(attn(x, ...)); r = x = norm1(x)
    #   x = mlp(x); x = norm2(r + drop_path(post_mlp_dropout(x)))
    x = x + att
    r = torch.nn.functional.layer_norm(x, (C,), n1_w, n1_b, eps=1e-6)
    h = torch.nn.functional.linear(r, fc1_w, fc1_b)
    h = torch.nn.functional.gelu(h)
    h = torch.nn.functional.linear(h, fc2_w, fc2_b)
    return torch.nn.functional.layer_norm(r + h, (C,), n2_w, n2_b, eps=1e-6)


@pytest.mark.parametrize("use_alibi,use_pad", [(False, False), (True, False),
                                               (False, True), (True, True)])
def test_alt_block_matches_torch_mha(rng, use_alibi, use_pad):
    from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
        AltBlock, alibi_bias)

    B, T, C, H = 2, 23, 64, 4
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    block = AltBlock(C, H)
    pad = None
    if use_pad:
        pad = np.zeros((B, T), bool)
        pad[0, -5:] = True
        pad[1, -1:] = True
    bias = None
    if use_alibi:
        bias = np.broadcast_to(alibi_bias(H, T)[None], (B, H, T, T)).copy()

    params = block.init(jax.random.PRNGKey(3), jnp.asarray(x),
                        None if pad is None else jnp.asarray(pad),
                        None if bias is None else jnp.asarray(bias))
    # randomize every param (flax zero-inits biases)
    leaves, treedef = jax.tree.flatten(params)
    leaves = [np.asarray(rng.standard_normal(l.shape), np.float32) * 0.05
              for l in leaves]
    params = jax.tree.unflatten(treedef, leaves)
    got = np.asarray(block.apply(
        params, jnp.asarray(x),
        None if pad is None else jnp.asarray(pad),
        None if bias is None else jnp.asarray(bias)))

    p = params["params"]
    t = lambda a: torch.from_numpy(np.asarray(a))
    want = _alt_block_oracle(
        t(x),
        t(p["attn"]["qkv"]["kernel"]).T, t(p["attn"]["qkv"]["bias"]),
        t(p["attn"]["proj"]["kernel"]).T, t(p["attn"]["proj"]["bias"]),
        t(p["mlp_fc1"]["kernel"]).T, t(p["mlp_fc1"]["bias"]),
        t(p["mlp_fc2"]["kernel"]).T, t(p["mlp_fc2"]["bias"]),
        t(p["norm1"]["scale"]), t(p["norm1"]["bias"]),
        t(p["norm2"]["scale"]), t(p["norm2"]["bias"]),
        H,
        key_padding=None if pad is None else t(pad),
        alibi=None if bias is None else t(bias),
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
