"""Orbax checkpoint save/restore round trip + EMA-at-eval contract."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.models import ArchConfig
from audio_visual_deepfake_detection_tpu.train import (
    TrainState, build_train_step, init_model, make_optimizer,
    latest_epoch_path, restore_checkpoint, restore_params, save_checkpoint)

from test_train import OPT_CFG, TRAIN_CFG, make_batch, tiny_cfg


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = tiny_cfg()
    params, prng = init_model(cfg, 2, 0)
    tx, _ = make_optimizer(params, OPT_CFG, 10, clip_grad_l2norm=1.0)
    state = TrainState.create(params, tx, 200, prng)
    step = jax.jit(build_train_step(cfg, TRAIN_CFG))
    batch = make_batch(rng, 2, cfg)
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    folder = str(tmp_path / "run")
    save_checkpoint(folder, epoch=2, state=jax.device_get(state), is_best=True)
    assert latest_epoch_path(folder).endswith("epoch_002")

    # full state restore resumes exactly
    fresh = TrainState.create(params, tx, 200, prng)
    restored, epoch, next_iter = restore_checkpoint(latest_epoch_path(folder), fresh)
    assert epoch == 2 and next_iter == 0
    assert int(restored.step) == 2
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_allclose(float(restored.loss_normalizer),
                               float(state.loss_normalizer))

    # the same next step from restored state reproduces the original
    s1, l1 = step(state, batch)
    s2, l2 = step(restored, batch)
    np.testing.assert_allclose(float(l1["final_loss"]), float(l2["final_loss"]),
                               rtol=1e-6)

    # inference restores the EMA weights (inference.py:74-76 contract)
    ema_loaded = restore_params(latest_epoch_path(folder), params, use_ema=True)
    for x, y in zip(jax.tree_util.tree_leaves(ema_loaded),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    raw_loaded = restore_params(latest_epoch_path(folder), params, use_ema=False)
    diffs = [float(jnp.abs(jnp.asarray(x) - jnp.asarray(y)).max())
             for x, y in zip(jax.tree_util.tree_leaves(raw_loaded),
                             jax.tree_util.tree_leaves(ema_loaded))]
    assert max(diffs) > 0  # EMA differs from raw after 2 steps
