"""Fused MViT pooled-attention kernel (ops/pallas/mvit_attention.py) vs the
XLA path, in pallas interpret mode on CPU — semantics-exact for the kernel
math, near-exact (f32 reassociation only) through the full encoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends import mvit
from audio_visual_deepfake_detection_tpu.ops.pallas import mvit_attention


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _reference(q_grid, k_perm, v_perm, band, scale):
    """Pure-jnp restatement of the kernel contract."""
    scores = jnp.einsum("hqd,hkd->hqk", q_grid, k_perm).astype(np.float32)
    scores = scores * scale
    scores = scores + np.pad(np.asarray(band, np.float32),
                             ((0, 0), (0, 0), (0, 1)))
    m = scores.max(-1, keepdims=True)
    e = jnp.exp(scores - m).astype(q_grid.dtype)
    z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    out = jnp.einsum("hqk,hkd->hqd", e, v_perm).astype(jnp.float32) / z
    return out.astype(q_grid.dtype) + q_grid


@pytest.mark.parametrize("ng,nk,nh,d", [(256, 17, 2, 24), (1024, 9, 1, 16)])
def test_kernel_matches_reference(rng, ng, nk, nh, d):
    q = jnp.asarray(rng.standard_normal((nh, ng, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((nh, nk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((nh, nk, d)), jnp.float32)
    band = jnp.asarray(rng.standard_normal((nh, ng, nk - 1)) * 0.3,
                       jnp.float32)
    got = mvit_attention.fused_pooled_attention(
        q, k, v, band, scale=d ** -0.5, interpret=True)
    want = _reference(q, k, v, band, d ** -0.5)
    assert got.shape == want.shape == (nh, ng, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_encoder_fused_path_matches_xla(rng, monkeypatch):
    """Full mvit_v2_t forward with the fused dispatch (interpret mode) ==
    the plain XLA path on the same params; every production block has
    khw == 1 (k/v pooled to a (T, 1, 1) grid), so every block dispatches."""
    x = jnp.asarray(rng.standard_normal((1, 4, 96, 96, 3)) * 0.3, jnp.float32)
    model = mvit.mvit_v2_t(out_dim=32, temporal_size=4)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map_with_path(
        lambda p, a: (jnp.asarray(rng.standard_normal(a.shape) * 0.02,
                                  a.dtype)
                      if "rel_pos" in jax.tree_util.keystr(p) else a),
        params)
    ref = jax.jit(model.apply)(params, x)

    monkeypatch.setattr(mvit_attention, "INTERPRET", True)
    got = jax.jit(model.apply)(params, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-5)


def test_dispatch_gate():
    # CPU test env: the TPU-only flag stays off, so the XLA path is taken
    assert not mvit_attention.ENABLED
    assert not mvit._use_fused_attention(512)
