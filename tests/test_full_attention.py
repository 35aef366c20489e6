"""Parity: fused full-MHA Pallas kernel (interpret mode) == the XLA path.

The kernel (ops/pallas/full_attention.py) is OPT-IN on TPU (AVDD_FUSED_MHA=1;
it measured slower than XLA at the production geometry, BENCH_NOTES round 4);
these tests pin its semantics on CPU via the pallas interpreter — the same
dispatch a TPU run with the flag takes, minus Mosaic codegen.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
    Emotion2Vec, Emotion2VecConfig)
from audio_visual_deepfake_detection_tpu.ops.pallas import (
    full_attention as fmha)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _xla_mha(q, k, v, padding_mask=None):
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32)
    if padding_mask is not None:
        att = jnp.where(padding_mask[:, None, None, :], -jnp.inf, att)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)


@pytest.mark.parametrize("t", [128, 130, 499])
@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 5e-2)])
def test_kernel_matches_xla(rng, t, dtype, tol):
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), dtype)
    got = fmha.full_mha(q, k, v, interpret=True)
    want = _xla_mha(q, k, v)
    # rtol=0: the kernel divides by the softmax denominator AFTER the value
    # contraction (one f32 divide per output element instead of per
    # probability) — same value up to reassociation rounding
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=0)


def test_kernel_padding_mask(rng):
    b, h, t, d = 2, 2, 200, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    lens = np.array([t, 137])
    mask = jnp.asarray(np.arange(t)[None, :] >= lens[:, None])
    got = fmha.full_mha(q, k, v, mask, interpret=True)
    want = _xla_mha(q, k, v, mask)
    # valid-key rows must match; pad-QUERY rows are sliced away by callers
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=0)
    assert np.isfinite(np.asarray(got)).all()


def test_emotion2vec_fused_matches_xla(rng):
    """Module-level: the trunk with the fused dispatch == the plain path."""
    cfg = Emotion2VecConfig(depth=2, prenet_depth=1)
    model = Emotion2Vec(cfg)
    wav = jnp.asarray(rng.standard_normal((2, 32000)) * 0.1, jnp.float32)
    pad = jnp.asarray(np.arange(32000)[None, :] >= np.array([32000, 24000])[:, None])
    params = model.init(jax.random.PRNGKey(0), wav[:1])
    want = model.apply(params, wav, pad)
    old = fmha.INTERPRET
    fmha.INTERPRET = True
    try:
        got = model.apply(params, wav, pad)
    finally:
        fmha.INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_emotion2vec_alibi_falls_back(rng):
    """use_alibi bypasses the kernel (bias shape not supported) — outputs
    must still be produced and finite with INTERPRET forced on."""
    cfg = Emotion2VecConfig(depth=1, prenet_depth=1, use_alibi=True)
    model = Emotion2Vec(cfg)
    wav = jnp.asarray(rng.standard_normal((1, 16000)) * 0.1, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), wav)
    old = fmha.INTERPRET
    fmha.INTERPRET = True
    try:
        got = model.apply(params, wav)
    finally:
        fmha.INTERPRET = old
    assert np.isfinite(np.asarray(got)).all()
