"""Parity: fused Emotion2Vec conv-extractor Pallas kernel (interpret mode)
== the XLA lax.conv path, including through the full Emotion2Vec model.

The kernel (ops/pallas/conv_extractor.py) tiles the 7-layer Conv1d+LN+GELU
stack over output frames with right-halo recomputation; VALID convolutions
are translation invariant, so tile boundaries must be value-exact up to f32
reassociation. Lengths are chosen to cover one tile, several tiles, and a
non-multiple-of-tile tail.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
    ConvFeatureExtractor, Emotion2Vec, Emotion2VecConfig, conv_output_length)
from audio_visual_deepfake_detection_tpu.ops.pallas import conv_extractor


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _noisy(params, rng):
    leaves, tree = jax.tree_util.tree_flatten(params)
    out = [jnp.asarray(rng.standard_normal(l.shape) * 0.2, l.dtype)
           for l in leaves]
    return jax.tree_util.tree_unflatten(tree, out)


@pytest.mark.parametrize("length", [
    16000,            # 49 frames: single tile, heavy zero tail
    161 * 320 + 400,  # > 2 tiles with a non-multiple-of-64 tail
])
def test_fused_extractor_matches_xla(rng, monkeypatch, length):
    model = ConvFeatureExtractor()
    wav = jnp.asarray(rng.standard_normal((2, length)) * 0.5, jnp.float32)
    params = _noisy(model.init(jax.random.PRNGKey(0), wav), rng)

    monkeypatch.setattr(conv_extractor, "INTERPRET", False)
    monkeypatch.setattr(conv_extractor, "ENABLED", False)
    want = np.asarray(model.apply(params, wav))
    monkeypatch.setattr(conv_extractor, "INTERPRET", True)
    got = np.asarray(model.apply(params, wav))
    assert got.shape == want.shape == (2, conv_output_length(length), 512)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=5e-4)


def test_fused_extractor_bf16(rng, monkeypatch):
    model = ConvFeatureExtractor(dtype=jnp.bfloat16)
    wav = jnp.asarray(rng.standard_normal((1, 16000)) * 0.5, jnp.float32)
    params = _noisy(model.init(jax.random.PRNGKey(0), wav), rng)
    monkeypatch.setattr(conv_extractor, "INTERPRET", False)
    monkeypatch.setattr(conv_extractor, "ENABLED", False)
    want = np.asarray(model.apply(params, wav)).astype(np.float32)
    monkeypatch.setattr(conv_extractor, "INTERPRET", True)
    got = np.asarray(model.apply(params, wav)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.08, rtol=0.08)


def test_full_emotion2vec_with_fused_extractor(rng, monkeypatch):
    """End to end through the full model (extractor -> proj -> pos-conv ->
    trunk): the fused extractor slots in transparently."""
    cfg = Emotion2VecConfig(embed_dim=64, depth=1, prenet_depth=1,
                            num_heads=2, conv_pos_groups=2)
    model = Emotion2Vec(cfg)
    wav = jnp.asarray(rng.standard_normal((1, 16000)) * 0.5, jnp.float32)
    params = _noisy(model.init(jax.random.PRNGKey(0), wav), rng)
    monkeypatch.setattr(conv_extractor, "INTERPRET", False)
    monkeypatch.setattr(conv_extractor, "ENABLED", False)
    want = np.asarray(model.apply(params, wav))
    monkeypatch.setattr(conv_extractor, "INTERPRET", True)
    got = np.asarray(model.apply(params, wav))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
