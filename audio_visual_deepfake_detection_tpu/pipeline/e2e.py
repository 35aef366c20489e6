"""Raw media -> submission, as ONE pipeline (SURVEY §7 stage 9).

The reference runs this as four disconnected programs communicating through
.npy farms and manual notebook steps:
  video_feature/aligned_video/extract_video_features.py:99-167 (mp4 -> 256-d),
  audio_feature/{content,emotion}_audio extract scripts (wav -> 2048/768-d),
  inference.py:22-136 (features -> per-shard detection JSON),
  generate_results.ipynb (merge -> prediction.txt / prediction.json).

Here it is one driver with host-decode / device-compute pipelining:

  decode (native libav* frames + AAC audio on background threads,
          resize fused into the decode loop; cv2/ffmpeg fallbacks)
    -> frontends, batched on device (video encoder over stacked chunks of the
       whole batch, BYOL-A + Emotion2Vec over the padded wav batch)
    -> row truncation (deepfake_video_audio.py:2077-2078 formulas)
    -> localizer with the per-stream linear resample fused into the same
       device program (build_online_inference_fn), soft-NMS + decode on device
    -> reference-schema result items -> prediction.txt / prediction.json
    -> challenge mAP (Evaluation/eval.py:147-164) when GT metadata is given.

Only the final (<=100 per video) detections ever leave the device between the
feature and localization stages.
"""

from __future__ import annotations

import dataclasses
import glob
import hashlib
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.metadata import (byola_trunc_rows, emotion_trunc_rows,
                             load_video_meta)
from ..frontends.pipeline import FeatureExtractor
from ..infer.decode import TestConfig
from ..infer.runner import (build_online_inference_fn, inference_one_epoch,
                            items_to_table)
from ..models.meta_arch import ArchConfig


@dataclasses.dataclass
class MediaItem:
    """One video to run. Exactly one of (mp4_path, frames) must be set; wav
    comes from the mp4's own audio track (native decoder), a wav file, an
    array, or — only when the host has no audio decoder at all — a
    deterministic synthetic signal."""

    video_id: str
    duration: float
    mp4_path: Optional[str] = None
    wav_path: Optional[str] = None
    frames: Optional[np.ndarray] = None   # (T, H, W, 3) uint8
    wav: Optional[np.ndarray] = None      # (L,) float32 @ 16 kHz


def synth_wav(video_id: str, duration: float, sample_rate: int = 16000) -> np.ndarray:
    """Deterministic per-video pseudo-audio for hosts with NO audio decoder
    at all (no libav*, no ffmpeg): seeded by the video id so runs are
    reproducible. With the native decoder present (runtime/host_media.py)
    the pipeline decodes the mp4's real AAC track instead."""
    seed = int.from_bytes(hashlib.sha1(video_id.encode()).digest()[:4], "little")
    n = int(round(duration * sample_rate))
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32) * 0.1


def _have_audio_decode() -> bool:
    from ..preprocess.wav import have_audio_decode

    return have_audio_decode()  # native libav* OR ffmpeg CLI


def discover_media(metadata_root: str, data_root: Optional[str] = None,
                   wav_root: Optional[str] = None, limit: Optional[int] = None,
                   ) -> Tuple[List[MediaItem], List[dict]]:
    """Walk a tinydataset-layout tree: metadata/<spk>/<clip>/<n>/<type>.json
    (+ matching data/...mp4). Returns (media items, challenge GT records)."""
    items, gt_records = [], []
    rels = sorted(
        os.path.relpath(p, metadata_root)
        for p in glob.glob(os.path.join(metadata_root, "**", "*.json"),
                           recursive=True))
    if limit:
        rels = rels[:limit]
    for rel in rels:
        meta = load_video_meta(metadata_root, rel)
        rel_mp4 = rel.replace(".json", ".mp4")
        mp4 = os.path.join(data_root, rel_mp4) if data_root else None
        wav = os.path.join(wav_root, rel.replace(".json", ".wav")) \
            if wav_root else None
        items.append(MediaItem(
            video_id=rel_mp4, duration=meta.duration, mp4_path=mp4,
            wav_path=wav if wav and os.path.exists(wav) else None))
        gt_records.append({
            "video_id": rel_mp4,
            "segments_time": None if meta.segments is None
            else meta.segments.tolist(),
            "n_fakes": 0 if meta.segments is None else len(meta.segments),
        })
    return items, gt_records


class MediaPipeline:
    """Host-decode / device-compute media pipeline.

    ``caps`` are the static per-stream row caps of the localizer infeed
    (video, byola, emotion); by default they are sized from the longest
    duration in the run so every batch shares one jit specialization.
    """

    def __init__(
        self,
        extractor: FeatureExtractor,
        cfg: ArchConfig,
        test_cfg: TestConfig,
        localizer_params,
        ds_feat_stride: float = 1.0,
        ds_num_frames: float = 1.0,
        batch_size: int = 4,
        prefetch_batches: int = 2,
        caps: Optional[Sequence[int]] = None,
        max_fps: float = 31.0,
        use_audio: bool = True,
        host_resize: Optional[Tuple[int, int]] = (96, 96),
        decode_workers: int = 4,
    ):
        self.extractor = extractor
        self.cfg = cfg
        self.localizer_params = localizer_params
        self.batch_size = batch_size
        self.prefetch_batches = prefetch_batches
        self.caps = tuple(caps) if caps is not None else None
        self.max_fps = max_fps
        self.use_audio = use_audio
        self.host_resize = host_resize
        # host decode fan-out (the reference's DataLoader(bs=10) extraction
        # workers + Pool(16) wav extraction, extract_video_features.py:128-137
        # / preprocess/extract_wav.py:43): N threads each issuing one
        # GIL-released native decode call. Results keep item order (pool.map),
        # so the worker count cannot change any output.
        self.decode_workers = max(1, int(decode_workers))
        self._infer_fn = build_online_inference_fn(
            cfg, test_cfg, ds_feat_stride, ds_num_frames)
        self.stats: Dict[str, float] = {}

    _warned_synth = False  # one loud warning per process, not per video

    # ---------------- host side ----------------

    def _decode(self, item: MediaItem) -> MediaItem:
        frames, wav = item.frames, item.wav
        if frames is None:
            from ..preprocess.video_io import read_video_frames

            try:
                # resize to the encoder input size on the host and ship uint8:
                # ~20x less host->device transfer than full-res f32 (decisive
                # behind slow infeed links; harmless elsewhere). The native
                # backend fuses the bilinear resize into the decode loop.
                frames, _ = read_video_frames(item.mp4_path, size=self.host_resize)
            except Exception as e:  # corrupt container / truncated stream
                # the sweep must still emit a prediction row for this video id
                # (the submission format covers every video; reference
                # tolerates per-file failures the same way,
                # extract_wav.py:23-26 / deepfake_video_audio.py:908-917)
                h, w = self.host_resize or (96, 96)
                n = max(1, int(round(item.duration * 25.0)))
                print(f"video decode failed for {item.video_id}: {e}; "
                      "substituting blank frames")
                frames = np.zeros((n, h, w, 3), np.uint8)
        if wav is None and self.use_audio:
            if item.wav_path is not None:
                from ..preprocess.wav import load_wav

                try:
                    wav = load_wav(item.wav_path)
                except Exception as e:  # truncated/wrong-rate wav in the farm
                    # every decode path substitutes rather than killing the
                    # sweep (reference logs per-file errors and moves on,
                    # extract_wav.py:23-26)
                    print(f"wav load failed for {item.video_id}: {e}; "
                          "substituting synthetic audio")
                    wav = synth_wav(item.video_id, item.duration)
            elif item.mp4_path is not None and _have_audio_decode():
                from ..preprocess.wav import decode_audio

                try:
                    # real audio track; trim trailing encoder padding to the
                    # metadata duration (= audio_frames/16000, the count the
                    # offline .npy pipeline saw)
                    wav = decode_audio(item.mp4_path)
                    n = int(round(item.duration * 16000))
                    if 0 < n < len(wav):
                        wav = wav[:n]
                except Exception as e:
                    # corrupt/audio-less file: don't kill a 343k-video sweep
                    print(f"audio decode failed for {item.video_id}: {e}; "
                          "substituting synthetic audio")
                    wav = synth_wav(item.video_id, item.duration)
            else:
                # no decoder at all on this host — loudly, once, not 343k times
                if not MediaPipeline._warned_synth:
                    MediaPipeline._warned_synth = True
                    print("WARNING: no audio decoder on this host (no libav*, "
                          "no ffmpeg) — substituting synthetic audio for "
                          "EVERY video; audio-stream features will be garbage")
                wav = synth_wav(item.video_id, item.duration)
        return dataclasses.replace(item, frames=frames, wav=wav)

    def _default_caps(self, items: Sequence[MediaItem]) -> Tuple[int, ...]:
        def up8(n):
            return int(np.ceil(n / 8)) * 8

        dur = max(it.duration for it in items)
        return (up8(dur * self.max_fps + 1),
                up8(byola_trunc_rows(dur) + 2),
                up8(emotion_trunc_rows(dur) + 2))

    # ---------------- device side ----------------

    def _extract_batch(self, decoded: List[MediaItem]) -> List[dict]:
        """Three frontends over one batch of videos; returns per-video
        localizer samples {video_id, streams, duration}."""
        from ..frontends.video import chunk_video

        if getattr(self.extractor, "chunk_buckets", None):
            # bucketed tail chunks (opt-in): per-video extraction so each
            # tail runs at its own bucket size (FeatureExtractor docs)
            video_rows = [self.extractor.video_features(it.frames)
                          for it in decoded]
            return self._assemble_samples(decoded, video_rows)

        # video: stack every video's chunks into one device call (the
        # reference batches chunks via a bs=10 DataLoader the same way,
        # extract_video_features.py:128-137)
        chunk = self.extractor.video_chunk
        all_chunks, counts, true_t = [], [], []
        for it in decoded:
            # uint8 frames ship as-is; the extractor normalizes on device
            frames = it.frames if it.frames.dtype == np.uint8 \
                else it.frames.astype(np.float32) / 255.0
            chunks, t = chunk_video(frames, chunk)
            all_chunks.append(chunks)
            counts.append(chunks.shape[0])
            true_t.append(t)
        shapes = {c.shape[1:] for c in all_chunks}
        if len(shapes) > 1:
            # only reachable with host_resize=None over mixed-resolution media
            raise ValueError(
                f"mixed frame shapes in one batch {sorted(shapes)} "
                f"(videos {[it.video_id for it in decoded]}); set host_resize "
                "so every video decodes to one size")
        vfeats = self.extractor.video_chunks_features(
            np.concatenate(all_chunks, axis=0))
        video_rows, ofs = [], 0
        for n, t in zip(counts, true_t):
            video_rows.append(vfeats[ofs:ofs + n].reshape(-1, vfeats.shape[-1])[:t])
            ofs += n
        return self._assemble_samples(decoded, video_rows)

    def _assemble_samples(self, decoded: List[MediaItem],
                          video_rows: List[np.ndarray]) -> List[dict]:
        if self.use_audio:
            wavs = [it.wav for it in decoded]
            byola = self.extractor.byola_features_batch(wavs)
            emo = self.extractor.emotion_features_batch(wavs)

        samples = []
        for i, it in enumerate(decoded):
            streams = [video_rows[i]]
            if self.use_audio:
                # row truncation exactly as the dataset layer applies to the
                # offline .npy caches (deepfake_video_audio.py:2077-2078)
                streams.append(byola[i][:byola_trunc_rows(it.duration)])
                streams.append(emo[i][:emotion_trunc_rows(it.duration)])
            samples.append({"video_id": it.video_id,
                            "streams": streams, "duration": it.duration})
        return samples

    def _collate(self, samples: List[dict], caps: Sequence[int]) -> dict:
        from ..infer.runner import collate_streams

        # a video track outlasting its audio-derived duration (or > max_fps)
        # can exceed the static cap; trim with a log instead of letting the
        # collate assert kill a 343k-video sweep over one odd file
        for smp in samples:
            for s, arr in enumerate(smp["streams"]):
                if arr.shape[0] > caps[s]:
                    print(f"{smp['video_id']}: stream {s} rows "
                          f"{arr.shape[0]} > cap {caps[s]}; truncating")
                    smp["streams"][s] = arr[:caps[s]]
        streams, rows, duration, video_ids = collate_streams(samples, list(caps))
        return {"streams": streams, "rows": rows, "duration": duration,
                "video_ids": video_ids}

    # ---------------- the pipeline ----------------

    def batches(self, items: Sequence[MediaItem]):
        """Yield collated localizer batches with decode running ahead on
        background threads (host-decode/device-compute overlap)."""
        if not items:  # e.g. a resumed sweep with nothing left to do
            return
        caps = self.caps or self._default_caps(items)
        groups = [list(items[i:i + self.batch_size])
                  for i in range(0, len(items), self.batch_size)]
        with ThreadPoolExecutor(max_workers=self.decode_workers) as pool:
            pending = []
            gi = 0
            while gi < len(groups) or pending:
                while gi < len(groups) and len(pending) <= self.prefetch_batches:
                    pending.append(pool.map(self._decode, groups[gi]))
                    gi += 1
                decoded = list(pending.pop(0))
                yield self._collate(self._extract_batch(decoded), caps)

    def run(self, items: Sequence[MediaItem], output_folder: Optional[str] = None,
            print_freq: int = 50, flush_every: int = 5000,
            seen_offset: int = 0, preempt=None):
        """Full sweep. Returns (flat prediction table, result items)."""
        start = time.time()
        results, all_items = inference_one_epoch(
            self.batches(items), self._infer_fn, self.localizer_params,
            output_folder=output_folder, print_freq=print_freq,
            flush_every=flush_every, seen_offset=seen_offset, preempt=preempt)
        self.stats["wall_s"] = time.time() - start
        # rate over videos actually processed (a preempted run stops early)
        self.stats["videos_per_s"] = len(all_items) / self.stats["wall_s"]
        return results, all_items


def run_media_pipeline(
    items: Sequence[MediaItem],
    pipeline: MediaPipeline,
    out_dir: str,
    gt_records: Optional[Sequence[dict]] = None,
    verbose: bool = True,
    resume: bool = False,
    preempt=None,
    flush_every: int = 5000,
):
    """items -> submission files (+ mAP when GT is provided).

    Writes ``prediction.txt`` / ``prediction.json`` (generate_results.ipynb
    cells 1-2 semantics incl. the 0.9 prob clamp, 0.2 score filter and
    [[0,0,0]] sentinel) and, with GT, ``eval_proposals.json`` + challenge
    average mAP at tIoU {0.5, 0.75, 0.9, 0.95}.

    Restartability: detections flush to ``out_dir`` every ``flush_every``
    videos; ``resume=True`` skips videos already flushed and merges their
    items back into the submission. ``preempt`` (train.preempt
    PreemptionGuard) stops cleanly after the in-flight batch — a preempted
    sweep writes no (incomplete) submission, just its flushes.
    """
    import json as jsonlib

    from ..eval.challenge import run_evaluation
    from ..infer.resume import collect_done, flush_files
    from ..infer.results import (write_segment_predictions,
                                 write_video_predictions)

    os.makedirs(out_dir, exist_ok=True)
    done_items: List[dict] = []
    if resume:
        done_ids = collect_done(out_dir)
        if done_ids:
            done_items = [
                it
                for path in flush_files(out_dir)  # write order, not lexicographic
                for it in jsonlib.load(open(path, encoding="utf-8"))]
            items = [it for it in items if it.video_id not in done_ids]
            if verbose:
                print(f"Resume: {len(done_items)} videos already flushed, "
                      f"{len(items)} to go")

    results, new_items = pipeline.run(
        items, output_folder=out_dir, flush_every=flush_every,
        seen_offset=len(done_items), preempt=preempt)
    result_items = done_items + new_items

    summary = {"num_videos": len(items) + len(done_items), **pipeline.stats}
    if preempt is not None and preempt.triggered:
        # incomplete sweep: progress lives in the flushes; no partial
        # submission that could be mistaken for a full one
        summary["preempted"] = True
        summary["videos_done"] = len(result_items)
        return summary, result_items

    write_video_predictions(result_items, os.path.join(out_dir, "prediction.txt"))
    write_segment_predictions(result_items, os.path.join(out_dir, "prediction.json"))

    if done_items:
        results = items_to_table(result_items)
    if gt_records is not None and len(results["video-id"]) > 0:
        flat = {k: np.asarray(v) for k, v in results.items()}
        mAP, _ = run_evaluation(
            flat, gt_records, os.path.join(out_dir, "eval_proposals.json"),
            verbose=verbose)
        summary["average_mAP"] = mAP
    return summary, result_items
