"""Batched sharded inference (reference: inference.py + train_utils.py:510-601).

Key TPU changes vs the reference:
- batch > 1: the reference asserts batch_size = 1 at eval
  (av_fd_no_recon.py:456); here videos are padded to max_seq_len uniformly by
  the data pipeline, so the whole forward + decode + soft-NMS runs batched
  under one jit,
- decode + NMS + grid->seconds happen on device; only the final (max 100,
  score>pre_nms) detections come back to the host,
- the shard-file CLI (``sub_index``) and the per-5000-video JSON flush
  (train_utils.py:546-551) are preserved for output-format parity.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.meta_arch import ArchConfig, AVLocalizer
from ..models.points import generate_points
from .decode import TestConfig, decode_and_postprocess
from .resume import atomic_write_json


def build_inference_fn(cfg: ArchConfig, test_cfg: TestConfig):
    """Returns jit fn(params, feats, mask, fps, dur, stride, nframes) ->
    (segs, scores, cls, valid, video_cls).

    Shape-polymorphic over T: the point table is regenerated at trace time
    from ``feats.shape[1]``, so non-upsampled / over-length eval inputs
    (padded on the host to a multiple of ``cfg.max_div_factor``, at least
    ``max_seq_len`` — av_fd_no_recon.py:456-463) just trigger a new jit
    specialization; the abs-PE re-interpolates for T > max_seq_len
    (backbones.py:137-152 -> models/backbones.py::_abs_pe)."""
    model = AVLocalizer(cfg)

    @jax.jit
    def fn(params, feats, mask, fps, duration, feat_stride, feat_num_frames):
        t = feats.shape[1]
        assert t % cfg.max_div_factor == 0 and t >= cfg.max_seq_len, (
            f"eval T={t} must be >= max_seq_len and divisible by "
            f"max_div_factor={cfg.max_div_factor}")
        points = generate_points([t // s for s in cfg.fpn_strides],
                                 cfg.fpn_strides, cfg.regression_range)
        out = model.apply(params, feats, mask, train=False)
        segs, scores, cls_idxs, valid = decode_and_postprocess(
            out, points, fps, duration, feat_stride, feat_num_frames,
            test_cfg, cfg.num_classes)
        video_cls = out.get("cls_scores")
        if video_cls is None:
            video_cls = jnp.zeros((feats.shape[0], 1), jnp.float32)
        return segs, scores, cls_idxs, valid, video_cls

    return fn


def build_online_inference_fn(cfg: ArchConfig, test_cfg: TestConfig,
                              ds_feat_stride: float, ds_num_frames: float):
    """Inference with the per-stream linear resample fused INTO the device
    program (the reference resamples per sample on the CPU dataloader,
    deepfake_video_audio.py:996-1018; the host path mirrors that in
    data/dataset.py). The infeed carries raw ragged streams zero-padded to a
    static cap — smaller than the resampled (max_seq_len, C) grids — plus row
    counts; resample + concat + stride math (deepfake_video_audio.py:461,
    970-987) all run on device.

    Returns jit fn(params, streams, rows, duration) -> (segs, scores, cls,
    valid, video_cls) where ``streams`` is a tuple of (B, T_cap_s, C_s)
    arrays and ``rows`` a matching tuple of (B,) valid row counts; stream 0
    must be the video stream (fps = video_rows / duration).
    """
    from ..ops.resample import linear_resample_dynamic

    model = AVLocalizer(cfg)
    points = generate_points(cfg.fpn_lens, cfg.fpn_strides, cfg.regression_range)

    @jax.jit
    def fn(params, streams, rows, duration):
        parts = [linear_resample_dynamic(s, r, cfg.max_seq_len)
                 for s, r in zip(streams, rows)]
        feats = jnp.concatenate(parts, axis=-1)
        mask = jnp.ones(feats.shape[:2], bool)
        video_rows = rows[0].astype(jnp.float32)
        fps = video_rows / duration
        feat_stride = ((video_rows - 1.0) * ds_feat_stride + ds_num_frames) \
            / cfg.max_seq_len
        out = model.apply(params, feats, mask, train=False)
        segs, scores, cls_idxs, valid = decode_and_postprocess(
            out, points, fps, duration, feat_stride, feat_stride,
            test_cfg, cfg.num_classes)
        video_cls = out.get("cls_scores")
        if video_cls is None:
            video_cls = jnp.zeros((feats.shape[0], 1), jnp.float32)
        return segs, scores, cls_idxs, valid, video_cls

    return fn


def collate_infer_varlen(samples: List[dict], max_div_factor: int, min_len: int,
                         transfer_dtype=np.float32):
    """Batch the non-upsampled (force_upsampling: false) eval path: pad
    variable-length features to the batch max rounded up to a multiple of
    ``max_div_factor`` and at least ``min_len`` (= max_seq_len), with
    per-sample validity masks — the batched analogue of the reference's
    bs=1 eval padding (av_fd_no_recon.py:456-463)."""
    lens = [s["feats"].shape[0] for s in samples]
    t = max(max(lens), min_len)
    t = (t + max_div_factor - 1) // max_div_factor * max_div_factor
    b, c = len(samples), samples[0]["feats"].shape[1]
    feats = np.zeros((b, t, c), transfer_dtype)
    mask = np.zeros((b, t), bool)
    for i, (s, n) in enumerate(zip(samples, lens)):
        feats[i, :n] = s["feats"]
        mask[i, :n] = True
    return {
        "feats": feats,
        "mask": mask,
        "fps": np.asarray([s["fps"] for s in samples], np.float32),
        "duration": np.asarray([s["duration"] for s in samples], np.float32),
        "feat_stride": np.asarray([s["feat_stride"] for s in samples], np.float32),
        "feat_num_frames": np.asarray([s["feat_num_frames"] for s in samples],
                                      np.float32),
        "video_ids": [s["video_id"] for s in samples],
    }


def collate_streams(samples: List[dict], caps: List[int]):
    """Batch raw per-stream arrays into zero-padded fixed-cap arrays + row
    counts for :func:`build_online_inference_fn`."""
    b = len(samples)
    n_streams = len(samples[0]["streams"])
    streams, rows = [], []
    for s in range(n_streams):
        c = samples[0]["streams"][s].shape[1]
        arr = np.zeros((b, caps[s], c), np.float32)
        cnt = np.zeros((b,), np.int32)
        for i, item in enumerate(samples):
            x = item["streams"][s]
            assert x.shape[0] <= caps[s], \
                f"stream {s}: {x.shape[0]} rows > cap {caps[s]}"
            arr[i, :x.shape[0]] = x
            cnt[i] = x.shape[0]
        streams.append(arr)
        rows.append(cnt)
    duration = np.asarray([s["duration"] for s in samples], np.float32)
    video_ids = [s["video_id"] for s in samples]
    return tuple(streams), tuple(rows), duration, video_ids


def results_to_items(video_ids: List[str], segs, scores, valid, video_cls,
                     n_real: Optional[int] = None) -> List[dict]:
    """Convert device outputs to the reference JSON item schema
    (train_utils.py:577-591)."""
    segs, scores, valid, video_cls = map(np.asarray, (segs, scores, valid, video_cls))
    items = []
    n = n_real if n_real is not None else len(video_ids)
    for i in range(n):
        v = valid[i]
        items.append({
            "video_id": video_ids[i],
            "video_cls": video_cls[i].tolist(),
            "scores": scores[i][v].tolist(),
            "segments": segs[i][v].tolist(),
        })
    return items


def items_to_table(result_items: List[dict]) -> Dict[str, np.ndarray]:
    """Result items -> the flat prediction table the evaluators consume
    ({'video-id','t-start','t-end','label','score'} of parallel arrays)."""
    results = {"video-id": [], "t-start": [], "t-end": [], "label": [],
               "score": []}
    for it in result_items:
        scores = np.asarray(it["scores"], np.float64)
        if len(scores) == 0:
            continue
        segs = np.asarray(it["segments"], np.float64).reshape(-1, 2)
        results["video-id"].extend([it["video_id"]] * len(scores))
        results["t-start"].append(segs[:, 0])
        results["t-end"].append(segs[:, 1])
        results["label"].append(np.zeros(len(scores), np.int64))
        results["score"].append(scores)
    for key in ("t-start", "t-end", "label", "score"):
        results[key] = (np.concatenate(results[key])
                        if results[key] else np.zeros((0,)))
    return results


def inference_one_epoch(
    loader_batches,
    infer_fn,
    params,
    output_folder: Optional[str] = None,
    flush_every: int = 5000,
    print_freq: int = 20,
    seen_offset: int = 0,
    preempt=None,
    collect_items: bool = True,
    prefetch_depth: int = 2,
    mesh=None,
):
    """Stream detection results; returns the flat prediction table for
    evaluation plus all result items. ``loader_batches`` yields collated
    numpy batches with video_ids. ``seen_offset`` shifts the numbered flush
    file names so a resumed shard (inference.py --resume) never collides
    with the flushes an earlier run already wrote. ``preempt`` (a
    train.preempt.PreemptionGuard) makes SIGTERM flush the pending results
    and stop after the current batch — combined with --resume, a preempted
    shard loses zero videos instead of up to ``flush_every``.

    ``collect_items=False`` returns ``(None, None)`` and retains nothing
    between flushes — required for flush-to-disk sweeps (inference.py) where
    holding every shard item (up to max_seg_num segments/scores per video,
    ~49k videos per shard) would grow host memory unboundedly.

    ``prefetch_depth`` double-buffers the infeed: up to that many batches
    are device_put ahead of consumption (``parallel.mesh.device_prefetch``),
    so the host->device transfer of batch N+1 overlaps the device compute of
    batch N — the TPU analogue of the reference's persistent DataLoader
    workers (libs/datasets/datasets.py:35), which only overlapped host IO
    while the CUDA transfer stayed synchronous inside each forward
    (av_fd_no_recon.py:476-477). ``mesh`` shards each prefetched batch over
    its data axis instead of a plain device_put. 0 disables (batches go to
    infer_fn untouched, e.g. when the caller already device_put them)."""
    if output_folder:
        os.makedirs(output_folder, exist_ok=True)
    if prefetch_depth > 0:
        from ..parallel.mesh import device_prefetch
        loader_batches = device_prefetch(loader_batches, mesh=mesh,
                                         depth=prefetch_depth)
    batch_results: List[dict] = []
    all_items: List[dict] = []
    seen = 0
    flushed = 0
    start = time.time()

    for bidx, batch in enumerate(loader_batches):
        video_ids = batch["video_ids"]
        if "streams" in batch:  # online path (build_online_inference_fn)
            segs, scores, cls_idxs, valid, video_cls = infer_fn(
                params, batch["streams"], batch["rows"], batch["duration"])
        else:
            segs, scores, cls_idxs, valid, video_cls = infer_fn(
                params, batch["feats"], batch["mask"], batch["fps"],
                batch["duration"], batch["feat_stride"], batch["feat_num_frames"])
        items = results_to_items(video_ids, segs, scores, valid, video_cls,
                                 n_real=len(video_ids))
        batch_results.extend(items)
        if collect_items:
            all_items.extend(items)
        seen += len(items)

        if output_folder and seen - flushed >= flush_every:
            atomic_write_json(
                os.path.join(output_folder,
                             f"data_left{seen_offset + seen}.json"),
                batch_results)
            batch_results = []
            flushed = seen
        if bidx % print_freq == 0:
            rate = seen / max(time.time() - start, 1e-6)
            print(f"Infer: {seen} videos, {rate:.1f} videos/s")

        # preemption: flush whatever is pending as a NUMBERED file (a later
        # --resume counts numbered flushes) and stop. No cross-host agreement
        # needed — inference hosts are independent (no collectives).
        if preempt is not None and preempt.requested():
            if output_folder and batch_results:
                atomic_write_json(
                    os.path.join(output_folder,
                                 f"data_left{seen_offset + seen}.json"),
                    batch_results)
                batch_results = []
            preempt.triggered = True
            print(f"Infer: preemption requested — stopped after {seen} "
                  f"videos (resume with --resume)")
            break

    if output_folder and batch_results:
        atomic_write_json(os.path.join(output_folder, "data_left.json"),
                          batch_results)

    if not collect_items:
        return None, None
    return items_to_table(all_items), all_items
