"""Preemption-safe shutdown: the guard + loop hook (fast, in-process) and the
real SIGTERM path through train.py (slow, subprocess).

No reference analogue — the reference's only recovery is the fixed
every-1000-iters checkpoint (train_utils.py:381-396)."""

import glob
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from audio_visual_deepfake_detection_tpu.train import (
    PreemptionGuard, build_train_step, restore_checkpoint, train_one_epoch,
)

from test_train import TRAIN_CFG, make_batch, make_state, tiny_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class FakeLoader:
    def __init__(self, batches):
        self.batches = batches

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def test_guard_loop_checkpoint_and_resume(rng, tmp_path):
    """A request mid-epoch stops the loop at the next poll boundary, writes a
    preempt checkpoint, and that checkpoint resumes bit-exact."""
    import jax

    cfg = tiny_cfg()
    step_fn = jax.jit(build_train_step(cfg, TRAIN_CFG))
    batches = [make_batch(rng, 2, cfg) for _ in range(8)]
    state, _ = make_state(cfg)

    guard = PreemptionGuard(signals=())  # no handler install needed in-process
    calls = []

    def counting_step(s, b):
        calls.append(1)
        if len(calls) == 3:
            guard.request()  # "signal" lands mid-epoch
        return step_fn(s, b)

    folder = str(tmp_path / "ck")
    out = train_one_epoch(
        FakeLoader(batches), state, counting_step, curr_epoch=0,
        print_freq=100, ckpt_folder=folder, preempt=guard,
        preempt_check_every=2)
    assert guard.triggered
    # polled every 2 iters; request at step 3 (iter_idx 2) -> exits after
    # iter_idx 3, i.e. 4 of 8 steps ran
    assert len(calls) == 4
    ckpts = glob.glob(os.path.join(folder, "preempt_epoch_000_iter*"))
    assert len(ckpts) == 1

    # resume restores the exact stopped state AND the exact position:
    # epoch 0 is still in progress, next iteration is 4
    fresh, _ = make_state(cfg)
    restored, epoch, next_iter = restore_checkpoint(ckpts[0], fresh)
    assert epoch == 0 and next_iter == 4
    assert int(restored.step) == int(out.step) == 4
    a = jax.tree_util.tree_leaves(jax.device_get(out.params))
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_guard_signal_handler():
    """The installed handler sets the flag without killing the process, and
    restore() puts the previous handler back."""
    guard = PreemptionGuard(signals=(signal.SIGUSR1,))
    try:
        assert not guard.requested()
        os.kill(os.getpid(), signal.SIGUSR1)
        deadline = time.time() + 5
        while not guard.requested() and time.time() < deadline:
            time.sleep(0.01)
        assert guard.requested()
        assert guard.agreed()  # single-process: local flag
    finally:
        guard.restore()


@pytest.mark.slow
def test_sigterm_through_train_cli(tmp_path):
    """Real delivery: SIGTERM a running train.py, expect exit 0, a preempt
    checkpoint on disk, and a --resume run that completes."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import yaml

    # build the tiny workspace inline (test_cli's fixture is module-scoped
    # there; reusing it via pytest would couple collection orders)
    import test_cli as tc
    ENV = tc.ENV

    class _F:
        def mktemp(self, name):
            p = tmp_path / name
            p.mkdir()
            return p

    root, cfg_path = tc.workspace.__wrapped__(_F())
    # many epochs so the run is still alive when the signal lands
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["opt"]["epochs"] = 2000
    cfg_path.write_text(yaml.safe_dump(cfg))

    proc = subprocess.Popen(
        [sys.executable, "train.py", str(cfg_path), "--output", "pre",
         "--ckpt-iter-freq", "0", "-p", "1"],
        cwd=REPO, env=ENV, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        # wait until steps are actually flowing (first metrics flush)
        run_dir = None
        deadline = time.time() + 420
        while time.time() < deadline:
            runs = glob.glob(str(root / "runs" / "pre_*"))
            if runs and os.path.exists(os.path.join(runs[0], "metrics.jsonl")) \
                    and os.path.getsize(os.path.join(runs[0], "metrics.jsonl")):
                run_dir = runs[0]
                break
            if proc.poll() is not None:
                raise AssertionError("train.py died early:\n" + proc.stdout.read()[-3000:])
            time.sleep(1)
        assert run_dir, "training never reached its first logged step"

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0, out[-3000:]
        assert "preemption requested" in out
        ckpts = glob.glob(os.path.join(run_dir, "iters_ckpt", "preempt_*"))
        assert len(ckpts) == 1, out[-3000:]

        # the preempt checkpoint resumes through the real CLI
        cfg["opt"]["epochs"] = 1
        cfg_path.write_text(yaml.safe_dump(cfg))
        res = subprocess.run(
            [sys.executable, "train.py", str(cfg_path), "--output", "res",
             "--ckpt-iter-freq", "0", "-p", "2", "--resume", ckpts[0]],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=480)
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
        assert f"Resumed from {ckpts[0]}" in res.stdout
    finally:
        if proc.poll() is None:
            proc.kill()


def test_inference_preempt_flush(tmp_path):
    """A preempted inference loop flushes pending items as a NUMBERED file
    (so --resume counts them) and stops after the current batch."""
    from audio_visual_deepfake_detection_tpu.infer.runner import (
        inference_one_epoch)

    guard = PreemptionGuard(signals=())
    ran = []

    def fake_infer(params, feats, mask, fps, dur, stride, nframes):
        ran.append(1)
        if len(ran) == 2:
            guard.request()
        b = feats.shape[0]
        segs = np.tile(np.asarray([[1.0, 2.0]], np.float32), (b, 1, 1))
        scores = np.full((b, 1), 0.9, np.float32)
        cls_idx = np.zeros((b, 1), np.int64)
        valid = np.ones((b, 1), bool)
        video_cls = np.full((b, 1), 0.5, np.float32)
        return segs, scores, cls_idx, valid, video_cls

    def batches():
        for k in range(5):
            yield {
                "feats": np.zeros((2, 8, 4), np.float32),
                "mask": np.ones((2, 8), bool),
                "fps": np.ones(2, np.float32),
                "duration": np.ones(2, np.float32),
                "feat_stride": np.ones(2, np.float32),
                "feat_num_frames": np.ones(2, np.float32),
                "video_ids": [f"v{2 * k}", f"v{2 * k + 1}"],
            }

    out = str(tmp_path / "shard")
    _, items = inference_one_epoch(
        batches(), fake_infer, None, output_folder=out, flush_every=1000,
        seen_offset=7, preempt=guard)
    assert guard.triggered
    assert len(ran) == 2 and len(items) == 4  # stopped after batch 2 of 5
    flushes = sorted(os.listdir(out))
    assert flushes == ["data_left11.json"]  # numbered: offset 7 + 4 seen
    import json as jsonlib
    with open(os.path.join(out, flushes[0])) as f:
        saved = jsonlib.load(f)
    assert [it["video_id"] for it in saved] == ["v0", "v1", "v2", "v3"]


def test_preempt_resume_matches_uninterrupted_run(rng, tmp_path):
    """Exact-iteration resume: preempt mid-epoch, restore, finish the epoch
    with start_iter — final state is bit-identical to an uninterrupted run
    (nothing skipped, nothing redone)."""
    import jax

    cfg = tiny_cfg()
    step_fn = jax.jit(build_train_step(cfg, TRAIN_CFG))
    batches = [make_batch(rng, 2, cfg) for _ in range(6)]

    # reference: one uninterrupted epoch
    state0, _ = make_state(cfg)
    ref = train_one_epoch(FakeLoader(batches), state0, step_fn, curr_epoch=0,
                          print_freq=100)

    # preempted run: request lands during step 3, poll every 2 -> stops after
    # iter 3 (4 steps), checkpoint says (epoch 0, next_iter 4)
    guard = PreemptionGuard(signals=())
    calls = []

    def counting_step(s, b):
        calls.append(1)
        if len(calls) == 3:
            guard.request()
        return step_fn(s, b)

    state1, _ = make_state(cfg)
    folder = str(tmp_path / "ck")
    train_one_epoch(FakeLoader(batches), state1, counting_step, curr_epoch=0,
                    print_freq=100, ckpt_folder=folder, preempt=guard,
                    preempt_check_every=2)
    ckpt = glob.glob(os.path.join(folder, "preempt_epoch_000_iter*"))[0]

    fresh, _ = make_state(cfg)
    restored, epoch, next_iter = restore_checkpoint(ckpt, fresh)
    assert (epoch, next_iter) == (0, 4)
    resumed = train_one_epoch(FakeLoader(batches), restored, step_fn,
                              curr_epoch=epoch, print_freq=100,
                              start_iter=next_iter)
    assert int(resumed.step) == int(ref.step) == 6
    a = jax.tree_util.tree_leaves(jax.device_get(ref.params))
    b = jax.tree_util.tree_leaves(jax.device_get(resumed.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_preempt_end_of_epoch_poll(rng, tmp_path):
    """A signal that lands when the cadence never fires again (fewer iters
    than preempt_check_every) is still honored at the epoch boundary."""
    import jax

    cfg = tiny_cfg()
    step_fn = jax.jit(build_train_step(cfg, TRAIN_CFG))
    batches = [make_batch(rng, 2, cfg) for _ in range(3)]
    state, _ = make_state(cfg)

    guard = PreemptionGuard(signals=())
    guard.request()  # lands before/early in the epoch
    folder = str(tmp_path / "ck")
    train_one_epoch(FakeLoader(batches), state, step_fn, curr_epoch=0,
                    print_freq=100, ckpt_folder=folder, preempt=guard,
                    preempt_check_every=100)  # cadence never fires (3 iters)
    assert guard.triggered
    ckpts = glob.glob(os.path.join(folder, "preempt_epoch_000_iter3"))
    assert len(ckpts) == 1
    fresh, _ = make_state(cfg)
    _, epoch, next_iter = restore_checkpoint(ckpts[0], fresh)
    assert (epoch, next_iter) == (1, 0)  # epoch completed -> resume at next
