"""Serving wrapper: dynamic-batching localizer service.

The reference has no serving story (343k test videos went through a
batch-size-1 script across 7 manual shards). For production deployment this
wraps the jit inference function with a request queue + background batcher:
callers submit single videos, the worker coalesces up to ``batch_size``
requests (waiting at most ``max_wait_ms`` for stragglers), pads the batch to
the compiled shape, and resolves per-request futures with the final
detections. One compiled program serves every request shape.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..models.meta_arch import ArchConfig
from .decode import TestConfig
from .runner import build_inference_fn


@dataclass
class _Request:
    feats: np.ndarray         # (T, C)
    mask: np.ndarray          # (T,)
    fps: float
    duration: float
    feat_stride: float
    feat_num_frames: float
    future: Future


@dataclass
class Detections:
    segments: np.ndarray      # (K, 2) seconds
    scores: np.ndarray        # (K,)
    labels: np.ndarray        # (K,)
    video_cls: float          # video-level logit


class LocalizerService:
    def __init__(self, cfg: ArchConfig, test_cfg: TestConfig, params,
                 batch_size: int = 16, max_wait_ms: float = 5.0,
                 ds_feat_stride: float = 1.0, ds_num_frames: float = 1.0,
                 batch_buckets: Optional[List[int]] = None,
                 warmup: bool = False):
        """``batch_buckets``: ascending batch tiers (e.g. [1, 4, 16]); a
        flush pads to the smallest tier >= the coalesced request count, so a
        lone request ships a (1, T, C) array instead of the full batch (the
        jit caches one program per tier). Default: [batch_size] only."""
        self.cfg = cfg
        self.batch_size = batch_size
        self.buckets = sorted(batch_buckets or [batch_size])
        assert self.buckets[-1] >= batch_size
        self.max_wait = max_wait_ms / 1000.0
        self.params = params
        self.ds_feat_stride = ds_feat_stride
        self.ds_num_frames = ds_num_frames
        self._infer_fn = build_inference_fn(cfg, test_cfg)
        # half-width infeed when the model computes in bf16 (like the CLIs);
        # jnp.dtype returns an ml_dtypes-backed np.dtype np.zeros accepts
        import jax.numpy as jnp
        self._transfer_dtype = jnp.dtype(cfg.compute_dtype)
        if warmup:
            # compile every bucket tier up front so no live request pays a
            # first-use compile
            t, c = cfg.max_seq_len, cfg.input_dim
            for bk in self.buckets:
                self._infer_fn(params,
                               np.zeros((bk, t, c), self._transfer_dtype),
                               np.ones((bk, t), bool), np.ones((bk,), np.float32),
                               np.ones((bk,), np.float32), np.ones((bk,), np.float32),
                               np.ones((bk,), np.float32))
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._closed = False
        # serializes the closed-check+enqueue in submit against stop()'s
        # set-closed+sentinel — without it a racing submit can land behind
        # the sentinel and its future never resolves
        self._close_lock = threading.Lock()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, feats: np.ndarray, fps: float, duration: float,
               feat_stride: float, feat_num_frames: Optional[float] = None,
               mask: Optional[np.ndarray] = None) -> Future:
        """Queue one video's (T, C) features; returns a Future[Detections].

        Shapes are validated here, in the caller's thread: a malformed
        request raises at submit() instead of poisoning the shared batch
        (which would kill the worker and hang every other waiter).
        """
        t = self.cfg.max_seq_len
        feats = np.asarray(feats)
        if feats.ndim != 2 or feats.shape[1] != self.cfg.input_dim:
            raise ValueError(
                f"feats must be (T, {self.cfg.input_dim}); got {feats.shape}")
        if feats.shape[0] > t:
            raise ValueError(
                f"sequence length {feats.shape[0]} > max_seq_len {t}")
        if mask is None:
            mask = np.arange(t) < feats.shape[0]
        else:
            mask = np.asarray(mask, bool)
            if mask.shape not in ((feats.shape[0],), (t,)):
                raise ValueError(
                    f"mask must be ({feats.shape[0]},) or ({t},); "
                    f"got {mask.shape}")
            if mask.shape[0] < t:  # pad to compiled length: padding is invalid
                mask = np.concatenate([mask, np.zeros(t - mask.shape[0], bool)])
        if feats.shape[0] < t:
            feats = np.concatenate(
                [feats, np.zeros((t - feats.shape[0],) + feats.shape[1:],
                                 feats.dtype)])
        fut: Future = Future()
        with self._close_lock:
            if self._closed:
                raise RuntimeError("LocalizerService is stopped")
            self._queue.put(_Request(feats, mask, fps, duration, feat_stride,
                                     feat_num_frames or feat_stride, fut))
        return fut

    def submit_streams(self, streams: List[np.ndarray],
                       duration: float) -> Future:
        """Queue one video as raw per-stream features (video stream first,
        each (rows_s, C_s) at its native rate). Resamples to max_seq_len on
        the host (native fused kernel when available) and derives fps /
        feat_stride exactly like the dataset layer
        (deepfake_video_audio.py:461, 970-987)."""
        from ..data.dataset import resample_concat_np

        feats = resample_concat_np(
            [np.ascontiguousarray(s, np.float32) for s in streams],
            self.cfg.max_seq_len)
        video_rows = streams[0].shape[0]
        fps = video_rows / duration
        stride = ((video_rows - 1) * self.ds_feat_stride
                  + self.ds_num_frames) / self.cfg.max_seq_len
        return self.submit(feats, fps, duration, stride, stride)

    def localize(self, *args, **kwargs) -> Detections:
        return self.submit(*args, **kwargs).result()

    def localize_streams(self, *args, **kwargs) -> Detections:
        return self.submit_streams(*args, **kwargs).result()

    def _worker(self):
        while True:
            req = self._queue.get()
            if req is None:
                return
            batch: List[_Request] = [req]
            while len(batch) < self.batch_size:
                try:
                    nxt = self._queue.get(timeout=self.max_wait)
                except queue.Empty:
                    break
                if nxt is None:
                    self._flush(batch)
                    return
                batch.append(nxt)
            self._flush(batch)

    def _flush(self, batch: List[_Request]):
        n = len(batch)
        try:  # any failure resolves the waiters; the worker thread survives
            b = next(bk for bk in self.buckets if bk >= n)
            t = self.cfg.max_seq_len
            c = self.cfg.input_dim
            feats = np.zeros((b, t, c), self._transfer_dtype)
            mask = np.zeros((b, t), bool)
            fps = np.ones((b,), np.float32)
            dur = np.ones((b,), np.float32)
            stride = np.ones((b,), np.float32)
            nframes = np.ones((b,), np.float32)
            for i, r in enumerate(batch):
                feats[i], mask[i] = r.feats, r.mask
                fps[i], dur[i] = r.fps, r.duration
                stride[i], nframes[i] = r.feat_stride, r.feat_num_frames
            segs, scores, cls_idxs, valid, video_cls = self._infer_fn(
                self.params, feats, mask, fps, dur, stride, nframes)
            segs, scores, cls_idxs, valid, video_cls = map(
                np.asarray, (segs, scores, cls_idxs, valid, video_cls))
            for i, r in enumerate(batch[:n]):
                k = valid[i]
                r.future.set_result(Detections(
                    segments=segs[i][k], scores=scores[i][k],
                    labels=cls_idxs[i][k], video_cls=float(video_cls[i, 0])))
        except Exception as e:  # propagate failures to every waiter
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)

    def stop(self, timeout: Optional[float] = None) -> bool:
        """Graceful drain: requests already queued are still answered; new
        submits raise. Blocks until the queue drains (or ``timeout`` seconds
        if given). Returns True once drained; False means the timeout hit
        with work still in flight — the daemon worker keeps draining, but a
        process exit at that point abandons the remaining futures. Idempotent
        (a repeat call just re-joins)."""
        with self._close_lock:
            if not self._closed:
                self._closed = True
                # FIFO: the sentinel lands after every accepted request
                self._queue.put(None)
        self._thread.join(timeout=timeout)
        return not self._thread.is_alive()
