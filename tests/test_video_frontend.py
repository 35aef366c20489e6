"""C3D video encoder golden test vs a torch oracle + emotion2vec invariants."""

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.video import (
    C3DVideoEncoder, bilinear_resize_video, chunk_video)
from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
    CONV_SPEC, Emotion2Vec, Emotion2VecConfig, conv_output_length)


class TorchC3D(tnn.Module):
    """Oracle mirroring model/video_encoder.py:12-62 (utils.Conv3d =
    Conv3d + LeakyReLU)."""

    def __init__(self, nf=(8, 12, 16, 16), out_dim=32):
        super().__init__()
        d0, d1, d2, d3 = nf

        def c(i, o):
            return tnn.Sequential(tnn.Conv3d(i, o, 3, 1, 1), tnn.LeakyReLU())

        self.b0 = tnn.Sequential(c(3, d0), c(d0, d0), tnn.MaxPool3d((1, 3, 3)))
        self.b1 = tnn.Sequential(c(d0, d1), c(d1, d1), tnn.MaxPool3d((1, 2, 2)))
        self.b2 = tnn.Sequential(c(d1, d2), c(d2, d2), tnn.MaxPool3d((1, 2, 2)))
        self.b3a = tnn.Sequential(c(d2, d3), tnn.MaxPool3d((1, 2, 2)))
        self.b3b = tnn.Sequential(c(d3, d3), tnn.MaxPool3d((1, 2, 2)))
        self.proj = tnn.Sequential(tnn.Conv1d(d3 * 4, out_dim, 1), tnn.LeakyReLU())

    def forward(self, v):  # (B, 3, T, H, W)
        x = self.b2(self.b1(self.b0(v)))
        x = self.b3b(self.b3a(x))
        b, c_, t, h, w = x.shape
        # einops Rearrange("b c t h w -> b (c h w) t")
        x = x.permute(0, 1, 3, 4, 2).reshape(b, c_ * h * w, t)
        return self.proj(x)  # (B, out, T)


def _convert_c3d(ref: TorchC3D, template):
    from flax import traverse_util

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    name_map = {
        "b0c0": "b0.0.0", "b0c1": "b0.1.0",
        "b1c0": "b1.0.0", "b1c1": "b1.1.0",
        "b2c0": "b2.0.0", "b2c1": "b2.1.0",
        "b3c0": "b3a.0.0", "b3c1": "b3b.0.0",
    }
    out = {}
    for path, tmpl in traverse_util.flatten_dict(template).items():
        core = path[1:]
        if core[0] in name_map:
            w = sd[f"{name_map[core[0]]}.{'weight' if core[-1] == 'kernel' else 'bias'}"]
            if core[-1] == "kernel":
                # torch (out, in, kt, kh, kw) -> flax (kt, kh, kw, in, out)
                w = np.transpose(w, (2, 3, 4, 1, 0))
            out[path] = w
        else:  # proj: torch Conv1d (out, in, 1)
            w = sd[f"proj.0.{'weight' if core[-1] == 'kernel' else 'bias'}"]
            if core[-1] == "kernel":
                w = np.transpose(w[:, :, 0])
            out[path] = w
        assert out[path].shape == tuple(tmpl.shape), (path,)
    return traverse_util.unflatten_dict(out)


def test_c3d_matches_torch_oracle(rng):
    torch.manual_seed(0)
    ref = TorchC3D()
    ref.eval()
    ours = C3DVideoEncoder(n_features=(8, 12, 16, 16), out_dim=32)

    video = rng.standard_normal((1, 4, 96, 96, 3)).astype(np.float32)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(video))
    params = _convert_c3d(ref, template)
    out = np.asarray(ours.apply(params, jnp.asarray(video)))

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(video).permute(0, 4, 1, 2, 3)) \
            .permute(0, 2, 1).numpy()
    assert out.shape == ref_out.shape == (1, 4, 32)
    np.testing.assert_allclose(out, ref_out, atol=1e-4)


def test_chunk_and_resize(rng):
    frames = (rng.uniform(0, 255, (700, 20, 20, 3))).astype(np.uint8)
    chunks, t = chunk_video(frames, 512)
    assert chunks.shape == (2, 512, 20, 20, 3) and t == 700
    resized = bilinear_resize_video(jnp.asarray(chunks[0], jnp.float32), (8, 8))
    assert resized.shape == (512, 8, 8, 3)


def test_emotion2vec_shapes_and_rate(rng):
    cfg = Emotion2VecConfig(embed_dim=64, depth=2, prenet_depth=1, num_heads=4)
    model = Emotion2Vec(cfg)
    wav = rng.standard_normal((1, 16000)).astype(np.float32)  # 1 s
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(wav))
    out = model.apply(params, jnp.asarray(wav))
    # 320x downsample => ~50 frames per second
    assert out.shape == (1, conv_output_length(16000), 64)
    assert abs(out.shape[1] - 50) <= 1
    assert np.all(np.isfinite(np.asarray(out)))


def test_emotion2vec_padding_mask(rng):
    cfg = Emotion2VecConfig(embed_dim=32, depth=1, prenet_depth=1, num_heads=2)
    model = Emotion2Vec(cfg)
    wav = rng.standard_normal((2, 8000)).astype(np.float32)
    pad_mask = np.zeros((2, 8000), bool)
    pad_mask[1, 4000:] = True  # second sample is half padding
    wav2 = wav * ~pad_mask
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(wav2),
                        jnp.asarray(pad_mask))
    out = model.apply(params, jnp.asarray(wav2), jnp.asarray(pad_mask))
    assert np.all(np.isfinite(np.asarray(out)))


def test_mvit_shapes(rng):
    from audio_visual_deepfake_detection_tpu.frontends.mvit import (
        MViTVideoEncoder, generate_config)

    cfgs = tuple(generate_config([1, 1], [1, 2], [8, 16], out_dim=24))
    model = MViTVideoEncoder(cfgs)
    video = rng.standard_normal((1, 4, 24, 24, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(video))
    out = model.apply(params, jnp.asarray(video))
    assert out.shape == (1, 4, 24)
    assert np.all(np.isfinite(np.asarray(out)))


def test_chunk_bucketing_c3d_bit_exact(rng):
    """Tail-chunk bucketing (FeatureExtractor chunk_buckets): C3D features
    match the reference's pad-to-full-chunk semantics — its temporal convs
    are local and 'same'-padded, so rows < T see the same zeros either way.
    (Equality is up to f32 reassociation between the two differently-shaped
    compiled conv programs, ~1e-4.) The bucketed path must also produce
    exactly T rows across a multi-chunk video."""
    from audio_visual_deepfake_detection_tpu.frontends.pipeline import (
        FeatureExtractor)
    from audio_visual_deepfake_detection_tpu.frontends.video import (
        C3DVideoEncoder)

    model = C3DVideoEncoder(n_features=(4, 6, 8, 8), out_dim=16)
    frames = rng.integers(0, 255, (21, 96, 96, 3), dtype=np.uint8)  # 16 + 5

    ex_pad = FeatureExtractor(video_chunk=16, video_model=model)
    ex_buck = FeatureExtractor(video_chunk=16, video_model=model,
                               chunk_buckets=(8, 16))
    # share lazily-initialized params so the comparison is apples-to-apples
    ex_buck.params = ex_pad.params
    a = ex_pad.video_features(frames)
    b = ex_buck.video_features(frames)
    assert a.shape == b.shape == (21, 16)
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


def test_chunk_bucketing_mvit_rows(rng):
    """Bucketed MViT extraction: right row count and finite values (the
    VALUES legitimately differ from pad-to-full-chunk — attention
    normalizes over fewer pad tokens; documented approximation mode)."""
    from audio_visual_deepfake_detection_tpu.frontends.mvit import (
        MViTVideoEncoder, generate_config)
    from audio_visual_deepfake_detection_tpu.frontends.pipeline import (
        FeatureExtractor)

    model = MViTVideoEncoder(
        tuple(generate_config([1, 1], [1, 2], [8, 16], out_dim=12)),
        temporal_size=16, spatial_size=(96, 96))
    frames = rng.integers(0, 255, (19, 96, 96, 3), dtype=np.uint8)
    ex = FeatureExtractor(video_chunk=16, video_model=model,
                          chunk_buckets=(4, 8, 16))
    out = ex.video_features(frames)   # 16 full + tail 3 -> bucket 4
    assert out.shape == (19, 12)
    assert np.isfinite(out).all()


def test_mvit_hybrid_split_matches_full(rng):
    """encode_front/encode_back at any split == the plain full apply, and the
    FeatureExtractor hybrid strategy (front batched over chunks, back via
    lax.map) == per-chunk full applies."""
    from audio_visual_deepfake_detection_tpu.frontends.mvit import (
        MViTVideoEncoder, generate_config)

    cfgs = tuple(generate_config([1, 1], [1, 2], [8, 16], out_dim=24))
    # 96x96 spatial: FeatureExtractor resizes anything else to the encoder's
    # input size, which would defeat the equality check below
    model = MViTVideoEncoder(cfgs, temporal_size=4,
                             batch_front_split=1)
    video = jnp.asarray(rng.standard_normal((3, 4, 96, 96, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video[:1])
    want = model.apply(params, video)
    for split in (0, 1, 2):
        front = model.apply(params, video, split, method="encode_front")
        thw = model.thw_after(model.patch_grid(video.shape), split)
        got = model.apply(params, front, thw, split, method="encode_back")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=0)
    # the pipeline's hybrid dispatch end to end
    from audio_visual_deepfake_detection_tpu.frontends.pipeline import (
        FeatureExtractor, FrontendParams)

    ex = FeatureExtractor(
        params=FrontendParams(video=params, byola=None, emotion=None),
        video_model=model, video_chunk=4)
    got = ex.video_chunks_features(np.asarray(video))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=0)


def test_mvit_hybrid_front_group_tiling(rng, monkeypatch):
    """Chunk counts above FRONT_CHUNK_GROUP run the front in fixed-size
    groups (bounded peak memory for arbitrarily long videos) with features
    identical to the ungrouped batched front."""
    from audio_visual_deepfake_detection_tpu.frontends import pipeline
    from audio_visual_deepfake_detection_tpu.frontends.mvit import (
        MViTVideoEncoder, generate_config)
    from audio_visual_deepfake_detection_tpu.frontends.pipeline import (
        FeatureExtractor, FrontendParams)

    cfgs = tuple(generate_config([1, 1], [1, 2], [8, 16], out_dim=24))
    model = MViTVideoEncoder(cfgs, temporal_size=4, batch_front_split=1)
    video = jnp.asarray(rng.standard_normal((5, 4, 96, 96, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video[:1])
    want = model.apply(params, video)

    monkeypatch.setattr(pipeline, "FRONT_CHUNK_GROUP", 2)  # 5 -> 3 groups
    ex = FeatureExtractor(
        params=FrontendParams(video=params, byola=None, emotion=None),
        video_model=model, video_chunk=4)
    got = ex.video_chunks_features(np.asarray(video))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=0)
