"""Parity: fused MViT patch-embed Pallas kernel (interpret mode) == the XLA
PatchEmbed at the production geometry (kernel (3,15,15), stride (1,12,12),
pad (1,3,3), 96x96x3 inputs). Clip lengths cover a sub-tile clip (pad to
the 32-frame step grid) and a multi-step clip with the 2-frame halo view.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.mvit import PatchEmbed
from audio_visual_deepfake_detection_tpu.ops.pallas import patch_embed


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _run_both(video, dtype, rng, monkeypatch):
    mod = PatchEmbed(96, (3, 15, 15), (1, 12, 12), (1, 3, 3), dtype=dtype)
    params = mod.init(jax.random.PRNGKey(0), video)
    params = jax.tree_util.tree_map(
        lambda l: jnp.asarray(rng.standard_normal(l.shape) * 0.2, l.dtype),
        params)
    monkeypatch.setattr(patch_embed, "INTERPRET", False)
    monkeypatch.setattr(patch_embed, "ENABLED", False)
    want = np.asarray(mod.apply(params, video))
    monkeypatch.setattr(patch_embed, "INTERPRET", True)
    got = np.asarray(mod.apply(params, video))
    assert got.shape == want.shape
    return want, got


@pytest.mark.parametrize("t", [5, 33])
def test_fused_patch_embed_matches_xla(rng, monkeypatch, t):
    video = jnp.asarray(rng.standard_normal((2, t, 96, 96, 3)), jnp.float32)
    want, got = _run_both(video, jnp.float32, rng, monkeypatch)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=5e-4)


def test_fused_patch_embed_bf16(rng, monkeypatch):
    """CPU XLA cannot run the bf16 einsum path (no bf16 DotThunk), so the
    bf16 kernel is compared against the f32 XLA reference within bf16
    rounding (params are f32 in both — flax dtype only changes compute)."""
    video = jnp.asarray(rng.standard_normal((1, 5, 96, 96, 3)), jnp.float32)
    mod32 = PatchEmbed(96, (3, 15, 15), (1, 12, 12), (1, 3, 3),
                       dtype=jnp.float32)
    params = mod32.init(jax.random.PRNGKey(0), video)
    params = jax.tree_util.tree_map(
        lambda l: jnp.asarray(rng.standard_normal(l.shape) * 0.2, l.dtype),
        params)
    monkeypatch.setattr(patch_embed, "INTERPRET", False)
    monkeypatch.setattr(patch_embed, "ENABLED", False)
    want = np.asarray(mod32.apply(params, video))
    monkeypatch.setattr(patch_embed, "INTERPRET", True)
    mod16 = PatchEmbed(96, (3, 15, 15), (1, 12, 12), (1, 3, 3),
                       dtype=jnp.bfloat16)
    got = np.asarray(mod16.apply(params, video)).astype(np.float32)
    d = np.abs(got - want)
    scale = float(np.std(want))
    assert np.median(d) < 0.01 * scale, (np.median(d), scale)
    assert d.max() < 0.1 * scale, (d.max(), scale)


def test_fused_patch_embed_in_encoder(rng, monkeypatch):
    """Through a tiny 96x96 encoder: the fused patch embed slots into the
    full forward (dispatch requires the production patch geometry)."""
    from audio_visual_deepfake_detection_tpu.frontends.mvit import (
        MViTVideoEncoder, generate_config)

    model = MViTVideoEncoder(
        tuple(generate_config([1, 1], [1, 2], [16, 32], 16)),
        temporal_size=8, spatial_size=(96, 96))
    video = jnp.asarray(rng.standard_normal((1, 8, 96, 96, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video)
    monkeypatch.setattr(patch_embed, "INTERPRET", False)
    monkeypatch.setattr(patch_embed, "ENABLED", False)
    want = np.asarray(model.apply(params, video))
    monkeypatch.setattr(patch_embed, "INTERPRET", True)
    got = np.asarray(model.apply(params, video))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=5e-4)
