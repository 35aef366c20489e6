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
