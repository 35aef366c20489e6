"""bf16 compute-dtype path of the frontends: same params, outputs within
bf16 accumulation tolerance of the f32 path, and the f32 path is unchanged
by the dtype plumbing (dtype=float32 explicitly == default).

The policy under test (matching the localizer's): params stay f32,
convs/matmuls run in the compute dtype, flax norm statistics stay f32,
attention softmax is cast to f32, outputs are always f32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.byola import AudioNTT2020, byola_features
from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
    Emotion2Vec, Emotion2VecConfig)
from audio_visual_deepfake_detection_tpu.frontends.video import C3DVideoEncoder
from audio_visual_deepfake_detection_tpu.frontends import mvit


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _assert_bf16_close(a: np.ndarray, b: np.ndarray, rel: float = 0.08):
    """a = f32 reference, b = bf16-path output (f32 dtype). bf16 rounding is
    ~4e-3/op; across a deep stack we allow a few % of the output scale and
    require near-perfect correlation."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert b.dtype == np.float64 and np.isfinite(b).all()
    scale = max(float(np.std(a)), 1e-6)
    err = np.abs(a - b)
    assert float(np.median(err)) <= rel * 0.25 * scale, (
        np.median(err), scale)
    assert float(err.max()) <= rel * 4 * scale, (err.max(), scale)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.999, corr


def test_c3d_bf16_close_and_f32_unchanged(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 96, 96, 3)) * 0.3, jnp.float32)
    m32 = C3DVideoEncoder()
    params = jax.jit(m32.init)(jax.random.PRNGKey(0), x)
    ref = m32.apply(params, x)
    assert ref.dtype == jnp.float32
    m32e = C3DVideoEncoder(dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(m32e.apply(params, x)),
                                  np.asarray(ref))
    got = C3DVideoEncoder(dtype=jnp.bfloat16).apply(params, x)
    assert got.dtype == jnp.float32
    _assert_bf16_close(ref, got)


def test_byola_bf16_close(rng):
    wav = jnp.asarray(rng.standard_normal((2, 16000)) * 0.1, jnp.float32)
    m32 = AudioNTT2020()
    lms_shape = jnp.zeros((1, 96, 64))
    params = jax.jit(m32.init)(jax.random.PRNGKey(0), lms_shape)
    ref = byola_features(params, wav, m32)
    got = byola_features(params, wav, AudioNTT2020(dtype=jnp.bfloat16))
    assert got.dtype == jnp.float32
    _assert_bf16_close(ref, got)


def test_emotion2vec_bf16_close(rng):
    cfg = Emotion2VecConfig(depth=2, prenet_depth=1, num_extra_tokens=1,
                            use_alibi=True)
    wav = jnp.asarray(rng.standard_normal((2, 16000)) * 0.1, jnp.float32)
    m32 = Emotion2Vec(cfg)
    params = jax.jit(m32.init)(jax.random.PRNGKey(0), wav)
    lens = jnp.asarray([16000, 12000])
    pad = jnp.arange(16000)[None, :] >= lens[:, None]
    ref = m32.apply(params, wav, pad)
    assert ref.dtype == jnp.float32
    got = Emotion2Vec(cfg, dtype=jnp.bfloat16).apply(params, wav, pad)
    assert got.dtype == jnp.float32
    _assert_bf16_close(ref, got)


@pytest.mark.slow
def test_mvit_bf16_close(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 96, 96, 3)) * 0.3, jnp.float32)
    m32 = mvit.mvit_v2_t(out_dim=32, temporal_size=4)
    params = jax.jit(m32.init)(jax.random.PRNGKey(0), x)
    # rel-pos tables init to zeros -> give them real values so the bf16
    # rel-pos einsums are exercised
    params = jax.tree_util.tree_map_with_path(
        lambda p, a: (jnp.asarray(rng.standard_normal(a.shape) * 0.02,
                                  a.dtype)
                      if "rel_pos" in jax.tree_util.keystr(p) else a),
        params)
    # jit both paths: it's the production configuration, and this machine's
    # XLA:CPU rejects eagerly-dispatched bf16 x bf16 -> f32 dots at runtime
    # ("Unsupported element type for DotThunk") that the jitted pipeline
    # rewrites away
    ref = jax.jit(m32.apply)(params, x)
    assert ref.dtype == jnp.float32
    got = jax.jit(mvit.mvit_v2_t(out_dim=32, temporal_size=4,
                                 dtype=jnp.bfloat16).apply)(params, x)
    assert got.dtype == jnp.float32
    # rel=0.1: the 10-block stack measures median err ~0.021x scale under
    # jit (0.018 eager — XLA fusion reassociates a few bf16 roundings)
    _assert_bf16_close(ref, got, rel=0.1)


def test_feature_extractor_bf16_outputs_f32(rng):
    from audio_visual_deepfake_detection_tpu.frontends.pipeline import FeatureExtractor

    ex = FeatureExtractor(
        compute_dtype="bfloat16", video_chunk=4,
        emotion_model=Emotion2Vec(Emotion2VecConfig(depth=1, prenet_depth=1),
                                  dtype=jnp.bfloat16))
    frames = (rng.random((4, 96, 96, 3)) * 255).astype(np.uint8)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    v = ex.video_features(frames)
    b = ex.byola_features(wav)
    e = ex.emotion_features(wav)
    for arr in (v, b, e):
        assert arr.dtype == np.float32 and np.isfinite(arr).all()
