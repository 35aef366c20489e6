"""Online feature-extraction pipeline: raw media -> the three feature streams.

Replaces the reference's three offline extraction programs
(audio_feature/content_audio, audio_feature/emotion_audio,
video_feature/aligned_video) with one host-decode / device-compute driver.
Outputs are row-count compatible with the .npy caches the dataset layer
consumes, so offline caching and online extraction interoperate.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..preprocess.video_io import read_video_frames
from ..preprocess.wav import load_wav
from .byola import AudioNTT2020, byola_features
from .emotion2vec import Emotion2Vec, Emotion2VecConfig
from .video import C3DVideoEncoder, bilinear_resize_video, chunk_video


@dataclasses.dataclass
class FrontendParams:
    """Frozen encoder parameter trees (converted or randomly initialized)."""

    video: Dict
    byola: Dict
    emotion: Dict


# Hybrid-strategy front batching is tiled in groups of this many chunks:
# batching the patch embed + wide-grid early stages across chunks is where
# the win is (saturates by ~16-32 chunks, round-4/5 measurements), but an
# UNBOUNDED batch lets a long video (45+ min => >100 chunks) blow the
# patch-embed im2col temps (measured OOM at 128 chunks in flight; 64 sits
# 64 MB over the 16 GB chip). Groups keep peak device memory independent
# of video length.
FRONT_CHUNK_GROUP = 32

# stream key -> cache subdirectory, the on-disk layout the dataset configs
# point at (align_video/content_audio/emotion_audio, matching the
# reference's three extractor output trees). extract_features.py's
# skip-existing check imports this so the mapping cannot drift.
CACHE_DIR_NAMES = {"video": "align_video", "byola": "content_audio",
                   "emotion": "emotion_audio"}


class FeatureExtractor:
    """Batched jit feature extraction for all three streams.

    ``compute_dtype='bfloat16'`` runs the default encoders' convs/matmuls in
    bf16 on the MXU (params stay f32, norm statistics f32, softmax f32 —
    the localizer's mixed-precision policy); outputs are always f32.
    Explicitly passed models keep whatever dtype they were built with."""

    def __init__(self, params: Optional[FrontendParams] = None,
                 emotion_cfg: Emotion2VecConfig = Emotion2VecConfig(),
                 video_chunk: int = 512, seed: int = 0,
                 video_model: Optional[C3DVideoEncoder] = None,
                 byola_model: Optional[AudioNTT2020] = None,
                 emotion_model: Optional[Emotion2Vec] = None,
                 compute_dtype: str = "float32",
                 chunk_buckets: Optional[tuple] = None):
        dtype = jnp.dtype(compute_dtype)
        self.compute_dtype = dtype
        self.video_model = video_model or C3DVideoEncoder(dtype=dtype)
        self.byola_model = byola_model or AudioNTT2020(dtype=dtype)
        self.emotion_model = emotion_model or Emotion2Vec(emotion_cfg,
                                                          dtype=dtype)
        self.video_chunk = video_chunk
        # Tail-chunk bucketing (opt-in, e.g. (128, 256, 384, 512)): the
        # reference zero-pads EVERY tail chunk to the full 512 frames
        # (extract_video_features.py:57-77), so a 240-frame video pays the
        # encoder for 512. With buckets, the tail runs at the smallest
        # bucket >= its length. C3D features are BIT-IDENTICAL either way
        # (temporal convs are local and 'same'-padded with the same zeros);
        # MViT features differ from the padded-512 quirk (its attention
        # normalizes over however many pad tokens are present). Measured
        # cost (BENCH_NOTES round 5, tools/bucket_ap.py): -2.8 avg mAP
        # through a parity-trained localizer AND 7-10 avg mAP below parity
        # even when the localizer is TRAINED on bucketed features (2 seeds,
        # overfit-bar proxy) — so bucketing stays off by default; use it
        # only when throughput is worth a measured quality cost.
        self.chunk_buckets = tuple(sorted(chunk_buckets)) if chunk_buckets \
            else None
        self._seed = seed
        # lazy per-stream init: random weights are materialized (via a jitted
        # init — un-jitted flax init is op-by-op dispatch and pathologically
        # slow both over the TPU tunnel and on a single host core) only for
        # the streams actually used
        self.params = params if params is not None else FrontendParams(
            video=None, byola=None, emotion=None)
        split = getattr(self.video_model, "batch_front_split", 0)
        if getattr(self.video_model, "prefers_sequential_chunks", False):
            if split:
                # Hybrid chunk strategy (MViT): the wide-grid early stages
                # IMPROVE with chunk batch (stage 1: 7.50 -> 5.31 ms/chunk at
                # 16 chunks) while the narrow-grid later stages DEGRADE
                # (stage 3: 10.3 -> 18.8 — their score fusions spill once
                # batched; round-4 bisection). So: blocks[:split] batched
                # across chunks, blocks[split:] chunk-by-chunk via lax.map.
                m = self.video_model

                from .mvit import hybrid_apply

                def _hybrid(p, x):
                    return hybrid_apply(m, p, x,
                                        front_group=FRONT_CHUNK_GROUP)

                self._video_fn = jax.jit(_hybrid)
            else:
                # HBM-bound encoders process chunks one at a time inside
                # the jit (see MViTVideoEncoder.prefers_sequential_chunks);
                # compute-bound C3D keeps the batched apply
                self._video_fn = jax.jit(lambda p, x: jax.lax.map(
                    lambda c: self.video_model.apply(p, c[None])[0], x))
        else:
            self._video_fn = jax.jit(self.video_model.apply)
        self._byola_fn = jax.jit(
            lambda p, wav: byola_features(p, wav, self.byola_model))
        self._emotion_fn = jax.jit(self.emotion_model.apply)
        self._emotion_mask_fn = jax.jit(
            lambda p, wav, m: self.emotion_model.apply(p, wav, m))
        self._byola_lms_fn = jax.jit(
            lambda p, lms: self.byola_model.apply(p, lms, train=False))

    def _stream_params(self, which: str):
        if getattr(self.params, which) is None:
            rng = jax.random.PRNGKey(self._seed)
            keys = dict(zip(("video", "byola", "emotion"),
                            jax.random.split(rng, 3)))
            init_args = {
                "video": (self.video_model, jnp.zeros((1, 4, 96, 96, 3))),
                "byola": (self.byola_model, jnp.zeros((1, 96, 64))),
                "emotion": (self.emotion_model, jnp.zeros((1, 16000))),
            }
            model, example = init_args[which]
            setattr(self.params, which,
                    jax.jit(model.init)(keys[which], example))
        return getattr(self.params, which)

    def video_features(self, frames: np.ndarray) -> np.ndarray:
        """(T, H, W, 3) -> (T, 256). uint8 frames are normalized /255;
        float frames are assumed already in [0, 1] (same contract as
        :meth:`video_chunks_features`)."""
        t = frames.shape[0]
        norm = (frames.astype(np.float32) / 255.0
                if frames.dtype == np.uint8 else
                np.asarray(frames, np.float32))
        if not self.chunk_buckets:
            chunks, t = chunk_video(norm, self.video_chunk)
            feats = self.video_chunks_features(chunks)
            return feats.reshape(-1, feats.shape[-1])[:t]
        # bucketed: full video_chunk blocks, then the tail at the smallest
        # bucket >= its length (one jit specialization per bucket size)
        out, pos = [], 0
        while pos < t:
            rem = t - pos
            if rem >= self.video_chunk:
                size = self.video_chunk
            else:
                size = next((b for b in self.chunk_buckets if b >= rem),
                            self.video_chunk)
            block = np.zeros((size,) + frames.shape[1:], np.float32)
            n = min(rem, size)
            block[:n] = norm[pos:pos + n]
            out.append(self.video_chunks_features(block[None])[0, :n])
            pos += n
        return np.concatenate(out, axis=0)

    def video_chunks_features(self, chunks: np.ndarray) -> np.ndarray:
        """Pre-chunked (N, chunk, H, W, 3) float [0,1] OR uint8 ->
        (N, chunk, D); chunks from several videos may be stacked into one
        call (the reference batches chunks with a bs=10 DataLoader the same
        way, extract_video_features.py:128-137).

        uint8 chunks are shipped as-is and normalized on device (4x less
        host->device transfer); chunks already at the 96x96 encoder input
        size skip the device resize entirely (the host-resize decode path of
        pipeline/e2e.py)."""
        x = jnp.asarray(chunks)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * np.float32(1.0 / 255.0)
        if x.shape[2:4] != (96, 96):
            x = jax.vmap(lambda f: bilinear_resize_video(f, (96, 96)))(x)
        return np.asarray(self._video_fn(self._stream_params("video"), x))

    def byola_features(self, wav: np.ndarray) -> np.ndarray:
        """(L,) 16 kHz -> (~L/1280, 2048) @ 12.5 Hz."""
        out = self._byola_fn(self._stream_params("byola"), jnp.asarray(wav)[None])
        return np.asarray(out[0])

    def emotion_features(self, wav: np.ndarray) -> np.ndarray:
        """(L,) 16 kHz -> (~L/320, 768) @ 50 Hz."""
        out = self._emotion_fn(self._stream_params("emotion"), jnp.asarray(wav)[None])
        return np.asarray(out[0])

    @staticmethod
    def _pad_bucket(wavs, bucket: int = 16000):
        """Zero-pad a list of 1-D wavs to a shared bucketed length (few jit
        shapes instead of one per file length)."""
        lens = np.asarray([len(w) for w in wavs], np.int32)
        cap = int(np.ceil(lens.max() / bucket) * bucket)
        out = np.zeros((len(wavs), cap), np.float32)
        for i, w in enumerate(wavs):
            out[i, :len(w)] = w
        return out, lens

    def emotion_features_batch(self, wavs) -> list:
        """Batched Emotion2Vec extraction, exact reference-batch semantics:
        zero-padded wav batch + padding mask into the model, per-file slice
        to the true frame count (emotion_audio/scripts/
        extract_audio_feature_batch.py:57-98)."""
        from .emotion2vec import conv_output_length

        batch, lens = self._pad_bucket(wavs)
        mask = np.arange(batch.shape[1])[None, :] >= lens[:, None]  # True=pad
        out = np.asarray(self._emotion_mask_fn(
            self._stream_params("emotion"), jnp.asarray(batch),
            jnp.asarray(mask)))
        return [out[i, :conv_output_length(int(l))] for i, l in enumerate(lens)]

    def byola_features_batch(self, wavs) -> list:
        """Batched BYOL-A extraction. The reference pads the NORMALIZED
        log-mel with zeros (content_audio/extract_audio_feature_batch.py:
        65-81) and saves the full padded-length features (truncation happens
        downstream in the dataset). Mirrored here by zeroing mel frames past
        each file's true frame count; the last valid encoder row can differ
        at the CNN boundary vs single-file extraction (true in the reference
        too — its tail depends on batch composition)."""
        from .mel import byola_log_mel

        batch, lens = self._pad_bucket(wavs)
        lms = np.asarray(byola_log_mel(jnp.asarray(batch)))   # (B, M, T)
        frames = 1 + lens // 160                              # hop=160, center
        valid = np.arange(lms.shape[-1])[None, :] < frames[:, None]
        lms = lms * valid[:, None, :]
        out = np.asarray(self._byola_lms_fn(
            self._stream_params("byola"), jnp.asarray(np.swapaxes(lms, -1, -2))))
        return list(out)

    def extract_all(self, mp4_path: str, wav_path: Optional[str] = None
                    ) -> Dict[str, np.ndarray]:
        """All three streams for one mp4. Audio comes from ``wav_path`` when
        given (the reference's pre-extracted wav farm), otherwise straight
        from the mp4's own track via the native decoder — the separate wav
        extraction stage (preprocess/extract_wav.py) becomes optional."""
        frames, fps = read_video_frames(mp4_path)
        out = {"video": self.video_features(frames)}
        wav = None
        if wav_path and os.path.exists(wav_path):
            wav = load_wav(wav_path)
        else:
            from ..runtime import host_media

            if host_media.available():
                wav = host_media.decode_audio(mp4_path)
        if wav is not None:
            out["byola"] = self.byola_features(wav)
            out["emotion"] = self.emotion_features(wav)
        return out

    def extract_to_cache(self, mp4_path: str, wav_path: Optional[str],
                         cache_root: str, rel_npy: str) -> None:
        feats = self.extract_all(mp4_path, wav_path)
        for key, arr in feats.items():
            path = os.path.join(cache_root, CACHE_DIR_NAMES[key], rel_npy)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            # tmp + rename: a kill mid-write must never leave a truncated
            # .npy that skip-existing would then trust forever
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                np.save(f, arr.astype(np.float32))
            os.replace(tmp, path)
