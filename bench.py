#!/usr/bin/env python
"""Benchmark: end-to-end videos/s — device-resident raw inputs (uint8 frames
+ 16 kHz wav) -> three feature frontends (MViT-v2-b bf16 video, BYOL-A,
Emotion2Vec) -> row truncation -> linear resample to 768 -> localizer forward
-> on-device decode + soft-NMS + voting -> final detections. This is
BASELINE.json's north-star metric ("Videos/sec end-to-end
(feature-extract+localize)"); a frontend regression moves this number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}
where extra carries the localizer-only rate (the round-1/2 headline).

Baseline: the reference PyTorch pipeline run locally on CPU (the reference
publishes no throughput numbers, BASELINE.md), batch=1 as the reference
enforces (av_fd_no_recon.py:456), with host soft-NMS. The reference's
end-to-end rate is STRICTLY BELOW its localizer-only rate (e2e = localizer +
three GPU/CPU feature extractors), so vs_baseline computed against the
measured localizer-only rate is a LOWER bound on the true e2e speedup.
Measured baselines are cached in BASELINE_MEASURED.json so repeat runs don't
re-time torch.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")

BATCH = int(os.environ.get("AVDD_BENCH_BATCH", "512"))
SEQ = 768
DIM = 3072
WARMUP = 2
ITERS = 8


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp
    from audio_visual_deepfake_detection_tpu.infer.decode import TestConfig
    from audio_visual_deepfake_detection_tpu.infer.runner import build_inference_fn
    from audio_visual_deepfake_detection_tpu.models import ArchConfig
    from audio_visual_deepfake_detection_tpu.train.state import init_model

    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=DIM, num_classes=1,
        max_seq_len=SEQ, embd_dim=256, fpn_dim=256, head_dim=256, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.1,
        compute_dtype=os.environ.get("AVDD_COMPUTE_DTYPE", "bfloat16"),
    )
    test_cfg = TestConfig(
        pre_nms_thresh=0.001, pre_nms_topk=2000, iou_threshold=0.1,
        min_score=0.2, max_seg_num=100, nms_method="soft", nms_sigma=0.75,
        duration_thresh=0.001, multiclass_nms=False, voting_thresh=0.9)

    params, _ = init_model(cfg, BATCH, seed=0)
    infer_fn = build_inference_fn(cfg, test_cfg)

    rng = np.random.default_rng(0)
    # features arrive on device in the transfer dtype, exactly like the CLI
    # (inference.py ships bf16 over the wire when compute_dtype=bfloat16)
    feats = jnp.asarray(rng.standard_normal((BATCH, SEQ, DIM), dtype=np.float32),
                        jnp.dtype(cfg.compute_dtype))
    mask = jnp.ones((BATCH, SEQ), bool)
    fps = jnp.full((BATCH,), 25.0)
    dur = jnp.full((BATCH,), 9.6)
    stride = jnp.full((BATCH,), 0.3125)
    nframes = stride

    def run():
        out = infer_fn(params, feats, mask, fps, dur, stride, nframes)
        # force a host fetch: on the tunneled axon backend block_until_ready
        # can return before execution completes
        np.asarray(out[1])
        return out

    for _ in range(WARMUP):
        run()
    # median-of-blocks: robust to occasional multi-10ms tunnel stalls without
    # absorbing ordinary run-to-run variance the way best-of-blocks would
    rates = []
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(ITERS):
            run()
        elapsed = time.perf_counter() - start
        rates.append(BATCH * ITERS / elapsed)
    return sorted(rates)[len(rates) // 2]


def measure_e2e() -> float:
    """Device-resident raw media -> detections, the production configuration:
    MViT-v2-b video encoder (the AlignVideo checkpoint's encoder,
    video_encoder.py:192) on 512-frame zero-padded chunks of 96x96 uint8
    frames (extract_video_features.py:57-77), BYOL-A + Emotion2Vec audio from
    the 16 kHz wav, dataset row truncation (deepfake_video_audio.py:1683-1684),
    f32 linear resample to 768 + concat (:996-1018), then the same
    forward+decode+soft-NMS program as measure_ours. One jit; only the final
    detections leave the device.

    Workload: 9.6 s videos @ 25 fps (240 frames, 153,600 wav samples) — the
    shapes the localizer bench always used.
    """
    import jax
    import jax.numpy as jnp
    from audio_visual_deepfake_detection_tpu.frontends import mvit
    from audio_visual_deepfake_detection_tpu.frontends.byola import AudioNTT2020
    from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
        Emotion2Vec, Emotion2VecConfig)
    from audio_visual_deepfake_detection_tpu.frontends.mel import byola_log_mel
    from audio_visual_deepfake_detection_tpu.infer.decode import TestConfig
    from audio_visual_deepfake_detection_tpu.infer.runner import build_inference_fn
    from audio_visual_deepfake_detection_tpu.models import ArchConfig
    from audio_visual_deepfake_detection_tpu.ops.resample import (
        linear_resample_time)
    from audio_visual_deepfake_detection_tpu.train.state import init_model

    # Round-5 sweep with the whole-MultiscaleBlock kernel + hybrid strategy
    # (videos/s): B=32: 50.4 | 48: 51.1 | 64 + front_group=32: 51.8 (the
    # default) | 64 ungrouped: OOM by 64 MB | 128: OOM. The 32-chunk front
    # groups bound the patch-embed im2col temps (the round-4 OOM) while
    # keeping the audio/localizer batch at 64.
    B = int(os.environ.get("AVDD_BENCH_E2E_BATCH", "64"))
    CHUNK = 512
    DUR, FPS = 9.6, 25.0
    N_FRAMES = int(DUR * FPS)                      # 240
    WAV_LEN = int(DUR * 16000)                     # 153600
    BYOLA_ROWS = int(12.497 * DUR - 0.3657)        # 119 (dataset :1683)
    EMO_ROWS = int(50 * DUR - 0.817)               # 479 (dataset :1684)

    dt = jnp.dtype(os.environ.get("AVDD_COMPUTE_DTYPE", "bfloat16"))
    video_model = mvit.mvit_v2_b(out_dim=256, temporal_size=CHUNK, dtype=dt)
    byola_model = AudioNTT2020(dtype=dt)
    emotion_model = Emotion2Vec(Emotion2VecConfig(), dtype=dt)

    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=DIM, num_classes=1,
        max_seq_len=SEQ, embd_dim=256, fpn_dim=256, head_dim=256, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.1,
        compute_dtype=str(dt))
    test_cfg = TestConfig(
        pre_nms_thresh=0.001, pre_nms_topk=2000, iou_threshold=0.1,
        min_score=0.2, max_seg_num=100, nms_method="soft", nms_sigma=0.75,
        duration_thresh=0.001, multiclass_nms=False, voting_thresh=0.9)
    localizer_fn = build_inference_fn(cfg, test_cfg)

    lparams, _ = init_model(cfg, B, seed=0)
    key = jax.random.PRNGKey(0)
    fparams = {
        "video": jax.jit(video_model.init)(
            key, jnp.zeros((1, 4, 96, 96, 3))),
        "byola": jax.jit(byola_model.init)(key, jnp.zeros((1, 96, 64))),
        "emotion": jax.jit(emotion_model.init)(key, jnp.zeros((1, 16000))),
    }

    # strategy knobs for A/B runs on the chip; defaults = the shipped
    # FeatureExtractor configuration (frontends/mvit.py::hybrid_apply)
    seq_patch = os.environ.get("AVDD_BENCH_SEQ_PATCH", "0") == "1"
    batched_back = os.environ.get("AVDD_BENCH_BATCHED_BACK", "0") == "1"
    front_group = int(os.environ.get("AVDD_BENCH_FRONT_GROUP", "32"))

    @jax.jit
    def e2e(lp, fp, frames_u8, wav):
        # video: uint8 -> [0,1] f32 -> MViT-v2-b -> (B, CHUNK, 256) f32,
        # valid rows = true frame count (chunk tail is zero-pad).
        # Hybrid chunk strategy (mirrors FeatureExtractor; see
        # frontends/mvit.py::hybrid_apply for the measured rationale).
        x = frames_u8.astype(jnp.float32) / 255.0
        v = mvit.hybrid_apply(video_model, fp["video"], x,
                              sequential_patch=seq_patch,
                              batched_back=batched_back,
                              front_group=front_group)
        v = v[:, :N_FRAMES]
        lms = jnp.swapaxes(byola_log_mel(wav), -1, -2)
        by = byola_model.apply(fp["byola"], lms)[:, :BYOLA_ROWS]
        emo = emotion_model.apply(fp["emotion"], wav)[:, :EMO_ROWS]
        # dataset path: f32 linear resample to 768 per stream, then concat
        feats = jnp.concatenate(
            [linear_resample_time(v, SEQ), linear_resample_time(by, SEQ),
             linear_resample_time(emo, SEQ)], axis=-1)
        feats = feats.astype(jnp.dtype(cfg.compute_dtype))
        mask = jnp.ones((feats.shape[0], SEQ), bool)
        fps = jnp.full((feats.shape[0],), FPS)
        dur = jnp.full((feats.shape[0],), DUR)
        stride = jnp.full((feats.shape[0],), N_FRAMES / SEQ)
        return localizer_fn(lp, feats, mask, fps, dur, stride, stride)

    rng = np.random.default_rng(0)
    frames = np.zeros((B, CHUNK, 96, 96, 3), np.uint8)
    frames[:, :N_FRAMES] = rng.integers(0, 256, (B, N_FRAMES, 96, 96, 3),
                                        np.uint8)
    frames = jnp.asarray(frames)
    wav = jnp.asarray(
        rng.standard_normal((B, WAV_LEN)).astype(np.float32) * 0.1)

    def run():
        out = e2e(lparams, fparams, frames, wav)
        np.asarray(out[1])  # force a host fetch (see measure_ours)
        return out

    for _ in range(WARMUP):
        run()
    iters = max(2, ITERS // 2)
    rates = []
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(iters):
            run()
        rates.append(B * iters / (time.perf_counter() - start))
    return sorted(rates)[len(rates) // 2]


def measure_raw_media():
    """Secondary metric: the 12 tinydataset mp4s through the production
    MediaPipeline — native libav* decode -> MViT-v2-b bf16 + BYOL-A +
    Emotion2Vec -> truncation/resample -> localizer + soft-NMS ->
    submission files. On this 1-core host the chain is host-decode- and
    tunnel-transfer-bound (decode alone runs ~11 videos/s/core, round-4
    table; the ~20 MB/s tunnel adds per-video frame-upload time real
    hardware infeed would not), so this number tracks the host-side path: a decode or pipeline regression moves it while the
    device-resident headline metric would hide it. Returns None when the
    tinydataset media is absent."""
    import tempfile

    meta = "/root/reference/tinydataset/metadata"
    data = "/root/reference/tinydataset/data"
    if not os.path.isdir(meta) or not os.path.isdir(data):
        return None
    import jax.numpy as jnp
    from audio_visual_deepfake_detection_tpu.frontends import mvit
    from audio_visual_deepfake_detection_tpu.frontends.pipeline import (
        FeatureExtractor)
    from audio_visual_deepfake_detection_tpu.infer.decode import TestConfig
    from audio_visual_deepfake_detection_tpu.models import ArchConfig
    from audio_visual_deepfake_detection_tpu.pipeline import (
        MediaPipeline, discover_media, run_media_pipeline)
    from audio_visual_deepfake_detection_tpu.train.state import init_model

    dt = os.environ.get("AVDD_COMPUTE_DTYPE", "bfloat16")
    items, _ = discover_media(meta, data)
    extractor = FeatureExtractor(
        video_model=mvit.mvit_v2_b(out_dim=256, dtype=jnp.dtype(dt)),
        compute_dtype=dt)
    cfg = ArchConfig(
        variant="av_recovery_norecon", input_dim=DIM, num_classes=1,
        max_seq_len=SEQ, embd_dim=256, fpn_dim=256, head_dim=256, n_head=4,
        mha_win_size=(7, 7, 7, 7, 7, -1), use_abs_pe=True, droppath=0.1,
        compute_dtype=dt)
    test_cfg = TestConfig(
        pre_nms_thresh=0.001, pre_nms_topk=2000, iou_threshold=0.1,
        min_score=0.2, max_seg_num=100, nms_method="soft", nms_sigma=0.75,
        duration_thresh=0.001, multiclass_nms=False, voting_thresh=0.9)
    params, _ = init_model(cfg, 4, seed=0)
    pipe = MediaPipeline(extractor, cfg, test_cfg, params, batch_size=4)
    with tempfile.TemporaryDirectory() as td:
        # first pass pays every jit compile; the timed pass is steady-state
        run_media_pipeline(items, pipe, os.path.join(td, "warm"),
                           verbose=False)
        start = time.perf_counter()
        run_media_pipeline(items, pipe, os.path.join(td, "timed"),
                           verbose=False)
        return len(items) / (time.perf_counter() - start)


def measure_reference_cpu() -> float:
    """Time the reference torch model (CPU, batch=1) through the same
    feats->detections path. Cached across runs."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["videos_per_sec"]

    sys.path.insert(0, os.path.join(REPO, "tests"))
    import torch
    from reference_oracle import load_reference_modeling, reference_model_kwargs
    from audio_visual_deepfake_detection_tpu.runtime import host_softnms

    modeling = load_reference_modeling()
    kwargs = reference_model_kwargs(video_dim=256, audio_dim=2816, embd=256,
                                    n_head=4, max_seq_len=SEQ)
    torch.manual_seed(0)
    ref = modeling.make_meta_arch("AVLocPointTransformerRecoveryNoNormNorecon",
                                  **kwargs)
    ref.eval()

    rng = np.random.default_rng(0)
    n_videos = 4

    def run_one(x):
        with torch.no_grad():
            mask = torch.ones(1, 1, SEQ, dtype=torch.bool)
            norm_inputs, _, cls_scores = ref.interpolator(x, mask)
            feats, masks = ref.backbone(x, norm_inputs, x, mask)
            fpn_feats, fpn_masks = ref.neck(feats, masks)
            points = ref.point_generator(fpn_feats)
            out_cls = [t.permute(0, 2, 1) for t in ref.cls_head(fpn_feats, fpn_masks)]
            out_off = [t.permute(0, 2, 1) for t in ref.reg_head(fpn_feats, fpn_masks)]
            res = ref.inference_single_video(
                points, [m.squeeze(1)[0] for m in fpn_masks],
                [c[0] for c in out_cls], [o[0] for o in out_off])
        segs = res["segments"].numpy()
        scores = res["scores"].numpy()
        if len(scores):
            host_softnms(segs, scores, 0.1, 0.75, 0.2, 2, 100)

    xs = [torch.from_numpy(
        rng.standard_normal((1, DIM, SEQ)).astype(np.float32)) for _ in range(n_videos)]
    run_one(xs[0])  # warmup
    start = time.perf_counter()
    for x in xs:
        run_one(x)
    vps = n_videos / (time.perf_counter() - start)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"videos_per_sec": vps,
                   "note": "reference torch model, CPU, batch=1, "
                           "feats->detections incl. host soft-NMS"}, f)
    return vps


def main():
    localizer = measure_ours()
    e2e = measure_e2e()
    try:
        raw_media = measure_raw_media()
    except Exception as e:  # secondary metric must never break the bench
        print(f"raw-media measurement failed: {e}", file=sys.stderr)
        raw_media = None
    try:
        base = measure_reference_cpu()
        # base is the reference's localizer-only CPU rate — an UPPER bound on
        # its e2e rate (e2e adds three feature extractors), so this ratio is
        # a LOWER bound on the true e2e speedup
        vs = e2e / base
    except Exception as e:  # baseline measurement must never break the bench
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        vs = None
    print(json.dumps({
        "metric": "e2e_videos_per_sec",
        "value": round(e2e, 2),
        "unit": "videos/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "extra": {
            "localizer_inference_videos_per_sec": round(localizer, 2),
            "raw_media_videos_per_sec": round(raw_media, 2)
            if raw_media else None,
            "raw_media_note": "12 tinydataset mp4s, native decode ->"
                              " frontends -> localizer -> submission;"
                              " decode/transfer-bound on this 1-core tunneled host",
            "note": "e2e = device-resident uint8 frames + wav -> MViT-v2-b"
                    " bf16 + BYOL-A + Emotion2Vec -> resample(768) ->"
                    " localizer + soft-NMS; vs_baseline is vs the reference's"
                    " measured localizer-only CPU rate (an upper bound on its"
                    " e2e rate), so the true e2e speedup is >= this",
        },
    }))


if __name__ == "__main__":
    main()
