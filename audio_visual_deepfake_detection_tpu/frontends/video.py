"""LAVDF / BA-TFD+ visual feature encoder.

The reference extracts 256-d per-frame features with the *video encoder* of an
``AlignVideo`` Lightning checkpoint
(video_feature/aligned_video/extract_video_features.py:122-139;
model/video_model.py:136-140). Two encoder families exist
(model/video_encoder.py): the default C3D stack (:12-62) and MViT-v2 variants
(:65-170). This module implements the C3D encoder (exact) — see
``frontends/mvit.py`` for the MViT-v2 family.

Input pipeline parity (extract_video_features.py:53-77): frames / 255, chunked
into 512-frame blocks (zero-padded tail), resized to 96x96, features
re-assembled per video.

Layout: (B, T, H, W, C) NDHWC so channels ride the lanes; Conv3d lowers to
MXU contractions.
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class Conv3dLReLU(nn.Module):
    """Conv3d(k3, pad 1) + LeakyReLU (the LAVDF utils.Conv3d wrapper with
    build_activation=LeakyReLU, negative_slope 0.01)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        return nn.leaky_relu(x, 0.01)


def _max_pool_thw(x, window: Tuple[int, int, int]):
    """MaxPool3d with stride = kernel (torch default)."""
    return nn.max_pool(x, window, strides=window)


class C3DVideoEncoder(nn.Module):
    """(B, T, 96, 96, 3) -> (B, T, 256) per-frame features
    (video_encoder.py:12-62; temporal dim is never pooled)."""

    n_features: Tuple[int, int, int, int] = (64, 96, 128, 128)
    out_dim: int = 256
    # bf16 runs the Conv3d stack on the MXU in bf16 (params stay f32);
    # output is cast back to f32 for the cache/dataset layer
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        d0, d1, d2, d3 = self.n_features
        x = Conv3dLReLU(d0, dtype=self.dtype, name="b0c0")(video)
        x = Conv3dLReLU(d0, dtype=self.dtype, name="b0c1")(x)
        x = _max_pool_thw(x, (1, 3, 3))          # 96 -> 32

        x = Conv3dLReLU(d1, dtype=self.dtype, name="b1c0")(x)
        x = Conv3dLReLU(d1, dtype=self.dtype, name="b1c1")(x)
        x = _max_pool_thw(x, (1, 2, 2))          # 32 -> 16

        x = Conv3dLReLU(d2, dtype=self.dtype, name="b2c0")(x)
        x = Conv3dLReLU(d2, dtype=self.dtype, name="b2c1")(x)
        x = _max_pool_thw(x, (1, 2, 2))          # 16 -> 8

        x = Conv3dLReLU(d3, dtype=self.dtype, name="b3c0")(x)
        x = _max_pool_thw(x, (1, 2, 2))          # 8 -> 4
        x = Conv3dLReLU(d3, dtype=self.dtype, name="b3c1")(x)
        x = _max_pool_thw(x, (1, 2, 2))          # 4 -> 2

        b, t, h, w, c = x.shape
        # reference flatten order: (c, h, w) row-major (Rearrange
        # "b c t h w -> b (c h w) t")
        x = jnp.transpose(x, (0, 1, 4, 2, 3)).reshape(b, t, c * h * w)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)
        return nn.leaky_relu(x, 0.01).astype(jnp.float32)


def convert_c3d_torch(state_dict, template):
    """Map the reference C3D encoder weights (video_encoder.py:12-62, already
    stripped of the ``video_encoder.`` prefix) into our flax tree.

    torch module paths: ``block{0-2}.{0,1}`` are the tensorneko Conv3d
    wrappers (a ``conv`` child holding the raw nn.Conv3d), ``block3.{0,2}``
    the two stage-3 convs and ``block3.5`` the 1x1 Conv1d projection. Bare
    ``block{i}.{j}.weight`` keys (no ``conv`` child) are accepted too.
    """
    from flax import traverse_util

    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    name_map = {
        "b0c0": "block0.0", "b0c1": "block0.1",
        "b1c0": "block1.0", "b1c1": "block1.1",
        "b2c0": "block2.0", "b2c1": "block2.1",
        "b3c0": "block3.0", "b3c1": "block3.2", "proj": "block3.5",
    }

    def get(ref, leaf):
        for key in (f"{ref}.conv.{leaf}", f"{ref}.{leaf}"):
            if key in sd:
                return sd[key]
        raise KeyError(f"{ref}.(conv.){leaf}")

    out = {}
    for path, tmpl in traverse_util.flatten_dict(template).items():
        core = path[1:] if path[0] == "params" else path
        leaf = "weight" if core[-1] == "kernel" else "bias"
        w = get(name_map[core[0]], leaf)
        if core[-1] == "kernel":
            if core[0] == "proj":       # Conv1d (out, in, 1) -> Dense (in, out)
                w = np.transpose(w[:, :, 0])
            else:                        # (out, in, kt, kh, kw) -> (kt,kh,kw,in,out)
                w = np.transpose(w, (2, 3, 4, 1, 0))
        assert w.shape == tuple(tmpl.shape), (path, w.shape, tmpl.shape)
        out[path] = w
    return traverse_util.unflatten_dict(out)


def bilinear_resize_video(frames: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """(T, H, W, C) -> (T, h, w, C) bilinear resize (resize_video parity:
    F.interpolate bilinear, align_corners=False)."""
    t, h, w, c = frames.shape
    return jax.image.resize(frames, (t, size[0], size[1], c), method="bilinear")


def chunk_video(frames: np.ndarray, chunk: int = 512) -> Tuple[np.ndarray, int]:
    """Zero-pad and chunk (T, H, W, C) uint8/float frames into
    (N, chunk, H, W, C) (extract_video_features.py:57-77)."""
    t = frames.shape[0]
    n = max(1, int(np.ceil(t / chunk)))
    pad = n * chunk - t
    if pad:
        frames = np.concatenate(
            [frames, np.zeros((pad,) + frames.shape[1:], frames.dtype)], axis=0)
    return frames.reshape(n, chunk, *frames.shape[1:]), t


def extract_video_features(params, frames: np.ndarray, model: C3DVideoEncoder = None,
                           chunk: int = 512) -> np.ndarray:
    """Full extraction path for one video: raw frames (T, H, W, 3) in [0,255]
    -> (T, 256) features."""
    model = model or C3DVideoEncoder()
    chunks, t = chunk_video(frames.astype(np.float32) / 255.0, chunk)
    resized = jax.vmap(lambda f: bilinear_resize_video(f, (96, 96)))(
        jnp.asarray(chunks))
    feats = model.apply(params, resized)          # (N, chunk, 256)
    feats = np.asarray(feats).reshape(-1, feats.shape[-1])[:t]
    return feats
