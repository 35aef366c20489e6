#!/usr/bin/env python
"""A/B: fused Emotion2Vec conv extractor (ops/pallas/conv_extractor.py) vs
the XLA lax.conv path, EXTRACTOR ONLY, at the production workload
(48 x 10 s wav, bf16). Set AVDD_EMO_F_TILE to sweep the tile size."""

from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax
setup_jax()

import numpy as np
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
    ConvFeatureExtractor)
from audio_visual_deepfake_detection_tpu.ops.pallas import conv_extractor
from bench_frontends import time_fwd

rng = np.random.default_rng(0)
wav = jnp.asarray(rng.standard_normal((48, 160000)) * 0.1, jnp.float32)
model = ConvFeatureExtractor(dtype=jnp.bfloat16)
params = jax.jit(model.init)(jax.random.PRNGKey(0), wav[:1])
for enabled in (True, False):
    conv_extractor.ENABLED = enabled
    sec = time_fwd(model.apply, params, wav, k=16)
    print(f"extractor kernel={'ON ' if enabled else 'OFF'} "
          f"F_TILE={conv_extractor.F_TILE}: {sec * 1e3:7.1f} ms "
          f"({480 / sec:8.0f} audio-sec/s)", flush=True)
