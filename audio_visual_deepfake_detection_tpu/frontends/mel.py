"""Log-mel spectrogram frontend, MXU-formulated.

Replicates torchaudio's ``MelSpectrogram(sample_rate=16000, n_fft=1024,
win_length=1024, hop_length=160, n_mels=64, f_min=60, f_max=7800)`` with its
defaults (power=2, center=True, reflect padding, periodic Hann window, HTK mel
scale, no filterbank norm) — the BYOL-A frontend of the reference
(audio_feature/content_audio/extract_audio_feature_batch.py:42-60 +
config.yaml), followed by ``log(x + eps)`` and the PrecomputedNorm
(byol_a/augmentations.py: (x - mean) / std with stats [-2.2800865, 3.5897882]).

TPU design: the STFT is framing + two matmuls against fixed cos/sin DFT
matrices fused with the mel projection — (frames @ [cosW | sinW]) runs on the
MXU; no FFT op needed, power + mel + log fuse into the epilogue.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax.numpy as jnp

SAMPLE_RATE = 16000
N_FFT = 1024
WIN_LENGTH = 1024
HOP_LENGTH = 160
N_MELS = 64
F_MIN = 60.0
F_MAX = 7800.0
EPS = float(np.finfo(np.float32).eps)
BYOLA_NORM_STATS = (-2.2800865, 3.5897882)


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann (torch.hann_window default)."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float32)


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(n_freqs: int = N_FFT // 2 + 1, n_mels: int = N_MELS,
                   sample_rate: int = SAMPLE_RATE, f_min: float = F_MIN,
                   f_max: float = F_MAX) -> np.ndarray:
    """(n_freqs, n_mels) triangular HTK filterbank, no normalization —
    torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk')."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                      # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]         # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _dft_mel_matrices(n_fft: int, n_mels: int, sample_rate: int,
                      f_min: float, f_max: float):
    """cos/sin DFT matrices (n_fft, n_freqs) windowed, + mel filterbank."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    win = hann_window(n_fft)[:, None].astype(np.float64)
    cos_m = (np.cos(angle) * win).astype(np.float32)
    sin_m = (-np.sin(angle) * win).astype(np.float32)
    fb = mel_filterbank(n_freqs, n_mels, sample_rate, f_min, f_max)
    return cos_m, sin_m, fb


def frame_signal(wav: jnp.ndarray, n_fft: int = N_FFT,
                 hop: int = HOP_LENGTH) -> jnp.ndarray:
    """Center-pad (reflect) and frame: (..., L) -> (..., T, n_fft)."""
    pad = n_fft // 2
    if wav.shape[-1] <= pad:
        # reflect padding needs pad < length; a sub-32ms waveform (degenerate
        # audio track) is zero-extended first — torch.stft would error here,
        # but a sweep must survive such files (their features are noise anyway)
        zeros = [(0, 0)] * (wav.ndim - 1) + [(0, pad + 1 - wav.shape[-1])]
        wav = jnp.pad(wav, zeros)
    pad_cfg = [(0, 0)] * (wav.ndim - 1) + [(pad, pad)]
    x = jnp.pad(wav, pad_cfg, mode="reflect")
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :])
    return x[..., idx]


def mel_spectrogram(wav: jnp.ndarray, n_fft: int = N_FFT, hop: int = HOP_LENGTH,
                    n_mels: int = N_MELS, sample_rate: int = SAMPLE_RATE,
                    f_min: float = F_MIN, f_max: float = F_MAX) -> jnp.ndarray:
    """(..., L) waveform -> (..., n_mels, T) power mel spectrogram."""
    cos_m, sin_m, fb = _dft_mel_matrices(n_fft, n_mels, sample_rate, f_min, f_max)
    frames = frame_signal(wav, n_fft, hop)                  # (..., T, n_fft)
    re = frames @ jnp.asarray(cos_m)                        # (..., T, n_freqs)
    im = frames @ jnp.asarray(sin_m)
    power = re * re + im * im
    mel = power @ jnp.asarray(fb)                           # (..., T, n_mels)
    return jnp.swapaxes(mel, -1, -2)                        # (..., n_mels, T)


def byola_log_mel(wav: jnp.ndarray,
                  stats: Tuple[float, float] = BYOLA_NORM_STATS) -> jnp.ndarray:
    """Full BYOL-A frontend: (..., L) -> normalized log-mel (..., n_mels, T)."""
    mel = mel_spectrogram(wav)
    lms = jnp.log(mel + EPS)
    mean, std = stats
    return (lms - mean) / std
