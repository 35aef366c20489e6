"""TPU-native audio-visual deepfake temporal localization framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``audio-visual/Audio_Visual_Deepfake_Detection`` (3rd place, 2024 1M-Deepfakes
Detection Challenge, temporal localization track). The reference pipeline is a
PyTorch research codebase; this package re-designs it TPU-first:

- all tensors are laid out ``(B, T, C)`` so channels ride the TPU lane
  dimension and every projection is an MXU matmul,
- sliding-window ("Longformer") attention is computed with a banded
  shift-and-reduce formulation (optionally a fused Pallas kernel) instead of
  ``as_strided`` chunk tricks,
- soft-NMS / segment voting / decode run on device with static shapes,
- training and inference are single jit-compiled step functions, data-parallel
  over a ``jax.sharding.Mesh``.

Layer map (mirrors SURVEY.md section 1 of the reference analysis):
    core/       config system (reference: libs/core/config.py)
    ops/        masked kernels and primitives (reference: libs/modeling/blocks.py)
    models/     backbone / neck / heads / meta-arch (reference: libs/modeling/)
    data/       dataset + metadata + batching (reference: libs/datasets/)
    train/      optimizer, schedule, EMA, train loop (reference: libs/utils/train_utils.py)
    infer/      batched inference + results pipeline (reference: inference.py + notebook)
    eval/       AP/AR evaluators (reference: libs/utils/metrics.py + Evaluation/)
    frontends/  BYOL-A, Emotion2Vec, video encoder feature extractors
                (reference: audio_feature/, video_feature/)
    parallel/   mesh + sharding helpers (reference has only nn.DataParallel)
    runtime/    native (C++) host-side components: soft-NMS parity oracle
"""

__version__ = "0.1.0"
