"""BYOL-A content-audio encoder (AudioNTT2020Task6).

Reference: audio_feature/content_audio/byol_a/models.py:48-85 — three
Conv2d(3x3)+BN+ReLU+MaxPool(2) stages over (mel=64, time) followed by a
per-timeframe 2-layer MLP to d=2048. Effective feature rate = 16000/160/8
= 12.5 Hz (the datasets use 12.497).

Layout: (B, T, n_mels) input (time-major); convs run NHWC with H=time, W=mel
so channels ride the lanes. The flatten order before the MLP matches the
reference's (mel-major: index = mel_bin * 64 + channel) so fc weights convert
1:1.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .mel import byola_log_mel


class ConvBNBlock(nn.Module):
    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, M, C)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        # eval-mode BatchNorm with stored statistics (f32 affine math; the
        # result is cast back to the compute dtype for pool/next conv)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        x = ((x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias).astype(
            self.dtype)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class AudioNTT2020(nn.Module):
    """(B, T, n_mels) log-mel -> (B, T//8, d) features (f32 out); the log-mel
    frontend itself stays f32 (DFT + log precision)."""

    n_mels: int = 64
    d: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lms: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = lms[..., None]                        # (B, T, M, 1)
        x = ConvBNBlock(dtype=self.dtype, name="block0")(x)
        x = ConvBNBlock(dtype=self.dtype, name="block1")(x)
        x = ConvBNBlock(dtype=self.dtype, name="block2")(x)  # (B,T/8,M/8,64)
        b, t, m, c = x.shape
        # reference flatten: (B, T, mel, ch) -> (B, T, mel*ch), mel-major
        x = x.reshape(b, t, m * c)
        x = nn.Dense(self.d, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(0.3)(x, deterministic=not train)
        x = nn.Dense(self.d, dtype=self.dtype, name="fc2")(x)
        return jax.nn.relu(x).astype(jnp.float32)


def byola_features(params, wav: jnp.ndarray, model: AudioNTT2020 = None) -> jnp.ndarray:
    """Waveform (B, L) -> (B, T/8, 2048) content features (frozen encoder)."""
    model = model or AudioNTT2020()
    lms = byola_log_mel(wav)                       # (B, M, T)
    lms = jnp.swapaxes(lms, -1, -2)                # (B, T, M)
    return model.apply(params, lms, train=False)


def convert_byola_torch(state_dict, template):
    """Map the reference AudioNTT2020Task6 torch weights into our tree.

    torch names: features.{0,4,8}.* conv, features.{1,5,9}.* bn,
    fc.0 / fc.3 linear.
    """
    import numpy as np
    from flax import traverse_util

    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    conv_idx = {"block0": 0, "block1": 4, "block2": 8}
    bn_idx = {"block0": 1, "block1": 5, "block2": 9}
    out = {}
    flat = traverse_util.flatten_dict(template)
    for path, value in flat.items():
        core = path[1:] if path[0] == "params" else path
        blk = core[0]
        if blk in conv_idx:
            if core[1] == "conv":
                if core[2] == "kernel":
                    # torch (out, in, kh=3, kw=3) with input (B,1,mel,time);
                    # our NHWC input is (B, time, mel, C) so kh<->kw swap
                    w = sd[f"features.{conv_idx[blk]}.weight"]
                    out[path] = np.transpose(w, (3, 2, 1, 0))
                else:
                    out[path] = sd[f"features.{conv_idx[blk]}.bias"]
            else:
                key = {"bn_mean": "running_mean", "bn_var": "running_var",
                       "bn_scale": "weight", "bn_bias": "bias"}[core[1]]
                out[path] = sd[f"features.{bn_idx[blk]}.{key}"]
        elif blk in ("fc1", "fc2"):
            idx = 0 if blk == "fc1" else 3
            if core[1] == "kernel":
                out[path] = np.transpose(sd[f"fc.{idx}.weight"])
            else:
                out[path] = sd[f"fc.{idx}.bias"]
        else:
            raise KeyError(path)
        assert out[path].shape == tuple(value.shape), (path, out[path].shape, value.shape)
    return traverse_util.unflatten_dict(out)
