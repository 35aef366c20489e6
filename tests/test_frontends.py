"""Frontend tests: STFT/mel vs torch.stft, BYOL-A encoder vs the reference."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends import mel as melmod
from audio_visual_deepfake_detection_tpu.frontends.byola import (
    AudioNTT2020, byola_features, convert_byola_torch)


def test_power_spectrogram_matches_torch_stft(rng):
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    frames = melmod.frame_signal(jnp.asarray(wav))
    cos_m, sin_m, _ = melmod._dft_mel_matrices(1024, 64, 16000, 60.0, 7800.0)
    re = np.asarray(frames @ jnp.asarray(cos_m))
    im = np.asarray(frames @ jnp.asarray(sin_m))
    power = re ** 2 + im ** 2  # (T, 513)

    spec = torch.stft(
        torch.from_numpy(wav), n_fft=1024, hop_length=160, win_length=1024,
        window=torch.hann_window(1024, periodic=True), center=True,
        pad_mode="reflect", return_complex=True, normalized=False)
    ref = spec.abs().pow(2).numpy().T  # (T, 513)
    assert power.shape == ref.shape
    np.testing.assert_allclose(power, ref, atol=2e-2, rtol=2e-4)


def test_mel_filterbank_properties():
    fb = melmod.mel_filterbank()
    assert fb.shape == (513, 64)
    assert np.all(fb >= 0)
    # each filter is a triangle with a single maximum and nonzero support
    assert np.all(fb.sum(axis=0) > 0)
    # filters cover only [f_min, f_max]
    freqs = np.linspace(0, 8000, 513)
    active = fb.sum(axis=1) > 0
    assert freqs[active].min() >= 60.0 - 20
    assert freqs[active].max() <= 7800.0 + 20


def _load_ref_byola():
    spec = importlib.util.spec_from_file_location(
        "ref_byola_models",
        "/root/reference/audio_feature/content_audio/byol_a/models.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_byola_models"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_byola_encoder_matches_reference(rng):
    ref_mod = _load_ref_byola()
    torch.manual_seed(0)
    ref = ref_mod.AudioNTT2020Task6(n_mels=64, d=128)
    ref.eval()
    # randomize BN stats so the test exercises the running-stat math
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(64) * 0.1)
                m.running_var.copy_(torch.rand(64) + 0.5)

    ours = AudioNTT2020(n_mels=64, d=128)
    lms = rng.standard_normal((2, 96, 64)).astype(np.float32)  # (B, T, M)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(lms))
    params = convert_byola_torch(ref.state_dict(), template)

    out = np.asarray(ours.apply(params, jnp.asarray(lms)))
    with torch.no_grad():
        # reference input layout: (B, 1, mel, time)
        x = torch.from_numpy(lms).permute(0, 2, 1)[:, None]
        ref_out = ref(x).numpy()
    assert out.shape == ref_out.shape == (2, 12, 128)
    np.testing.assert_allclose(out, ref_out, atol=1e-4)


def test_byola_features_rate(rng):
    """10 s of audio -> ~125 feature rows (12.5 Hz)."""
    model = AudioNTT2020(n_mels=64, d=64)
    wav = rng.standard_normal((1, 160000)).astype(np.float32)
    lms = melmod.byola_log_mel(jnp.asarray(wav))
    lms_t = jnp.swapaxes(lms, -1, -2)
    params = model.init(jax.random.PRNGKey(0), lms_t)
    feats = byola_features(params, jnp.asarray(wav), model)
    assert feats.shape[0] == 1 and feats.shape[2] == 64
    assert abs(feats.shape[1] - 125) <= 1


def test_emotion_batch_matches_single(rng):
    """Batched extraction (zero-pad + padding mask) equals per-file runs on
    the valid prefix — the reference batch script's semantics."""
    from audio_visual_deepfake_detection_tpu.frontends.pipeline import FeatureExtractor
    from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
        Emotion2Vec, Emotion2VecConfig, conv_output_length)

    import jax.numpy as jnp

    ex = FeatureExtractor(
        emotion_model=Emotion2Vec(Emotion2VecConfig(depth=1, prenet_depth=1)))
    wavs = [rng.standard_normal(n).astype(np.float32)
            for n in (32000, 28800, 47999)]
    batched = ex.emotion_features_batch(wavs)

    # batch-with-padding features legitimately differ EVERYWHERE from
    # single-file extraction: the conv positional encoder smears the pad
    # boundary (~45-frame halo) and global attention spreads it to every
    # frame — exactly like the reference batch script (base.py:258 runs the
    # positional conv over padded frames; no pre-attention zeroing). So the
    # wiring check is against a direct padded module call, not single-file.
    cap = 48000
    pad = np.zeros((3, cap), np.float32)
    for i, w in enumerate(wavs):
        pad[i, :len(w)] = w
    mask = np.arange(cap)[None, :] >= np.asarray([len(w) for w in wavs])[:, None]
    direct = np.asarray(ex.emotion_model.apply(
        ex._stream_params("emotion"), jnp.asarray(pad), jnp.asarray(mask)))
    for i, (wav, b) in enumerate(zip(wavs, batched)):
        t = conv_output_length(len(wav))
        assert b.shape[0] == t
        np.testing.assert_allclose(b, direct[i, :t], atol=1e-5)

    # a batch of equal-length wavs has no padding at all -> exactly the
    # single-file features
    same = ex.emotion_features_batch([wavs[0], wavs[0]])
    single = ex.emotion_features(wavs[0])
    np.testing.assert_allclose(same[0], single[: same[0].shape[0]], atol=1e-4)
    np.testing.assert_allclose(same[0], same[1], atol=1e-6)


def test_byola_batch_matches_single_except_boundary(rng):
    from audio_visual_deepfake_detection_tpu.frontends.pipeline import FeatureExtractor

    ex = FeatureExtractor()
    wavs = [rng.standard_normal(n).astype(np.float32)
            for n in (16000, 12000)]
    batched = ex.byola_features_batch(wavs)
    for wav, b in zip(wavs, batched):
        single = ex.byola_features(wav)
        t = single.shape[0]
        assert b.shape[0] >= t
        # interior rows match exactly; the final row sits on the pad boundary
        np.testing.assert_allclose(b[: t - 1], single[: t - 1], atol=1e-4)
