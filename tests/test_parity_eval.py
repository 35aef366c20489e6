"""Evaluator parity: our AP matcher vs the reference's
compute_average_precision_detection (Evaluation/eval_detection.py:229-318)
on randomized prediction/GT tables."""

import numpy as np
import pandas as pd
import pytest

from audio_visual_deepfake_detection_tpu.eval.detection import (
    average_precision, CHALLENGE_TIOUS)
from reference_oracle import load_reference_modeling


def _random_tables(rng, n_videos=8, max_gt=3, n_pred=60):
    vids, gs, ge = [], [], []
    for v in range(n_videos):
        for _ in range(int(rng.integers(1, max_gt + 1))):
            start = rng.uniform(0, 8)
            vids.append(f"v{v}")
            gs.append(start)
            ge.append(start + rng.uniform(0.2, 2.0))
    gt = {"video-id": np.asarray(vids), "t-start": np.asarray(gs),
          "t-end": np.asarray(ge)}

    pvids, ps, pe, sc = [], [], [], []
    for _ in range(n_pred):
        v = int(rng.integers(0, n_videos))
        # half the predictions perturb a GT, half are random
        if rng.uniform() < 0.5:
            idx = rng.integers(0, len(gs))
            start = gs[idx] + rng.normal(0, 0.2)
            end = ge[idx] + rng.normal(0, 0.2)
            v = int(vids[idx][1:])
        else:
            start = rng.uniform(0, 8)
            end = start + rng.uniform(0.1, 2.0)
        if end <= start:
            end = start + 0.05
        pvids.append(f"v{v}")
        ps.append(start)
        pe.append(end)
        sc.append(float(rng.uniform()))
    pred = {"video-id": np.asarray(pvids), "t-start": np.asarray(ps),
            "t-end": np.asarray(pe), "score": np.asarray(sc)}
    return gt, pred


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_matches_reference(seed):
    load_reference_modeling()  # sys.path + stubs
    import importlib

    # silence the reference's np.float usage on modern numpy
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    ref_mod = importlib.import_module("libs.utils.Evaluation.eval_detection")

    rng = np.random.default_rng(seed)
    gt, pred = _random_tables(rng)

    ours = average_precision(gt, pred, CHALLENGE_TIOUS)

    gt_df = pd.DataFrame({"video-id": gt["video-id"], "t-start": gt["t-start"],
                          "t-end": gt["t-end"]})
    pred_df = pd.DataFrame({"video-id": pred["video-id"],
                            "t-start": pred["t-start"],
                            "t-end": pred["t-end"], "score": pred["score"]})
    ref = ref_mod.compute_average_precision_detection(
        gt_df, pred_df, CHALLENGE_TIOUS)
    np.testing.assert_allclose(ours, np.asarray(ref), atol=1e-9)


@pytest.mark.parametrize("seed", [0, 3])
def test_topkx_recall_matches_reference(seed):
    load_reference_modeling()
    import importlib

    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    metrics = importlib.import_module("libs.utils.metrics")

    rng = np.random.default_rng(seed)
    gt, pred = _random_tables(rng)
    from audio_visual_deepfake_detection_tpu.eval.detection import topkx_recall

    tious = np.linspace(0.1, 0.5, 5)
    ours = topkx_recall(gt, pred, tious, top_k=(1, 5))

    gt_df = pd.DataFrame({"video-id": gt["video-id"], "t-start": gt["t-start"],
                          "t-end": gt["t-end"]})
    pred_df = pd.DataFrame({"video-id": pred["video-id"],
                            "t-start": pred["t-start"],
                            "t-end": pred["t-end"], "score": pred["score"]})
    ref = metrics.compute_topkx_recall_detection(gt_df, pred_df, tious, (1, 5))
    np.testing.assert_allclose(ours, np.asarray(ref), atol=1e-9)


def test_parallel_ap_equals_serial():
    rng = np.random.default_rng(9)
    gt, pred = _random_tables(rng, n_videos=20, n_pred=200)
    a = average_precision(gt, pred, CHALLENGE_TIOUS, n_jobs=0)
    b = average_precision(gt, pred, CHALLENGE_TIOUS, n_jobs=4)
    np.testing.assert_allclose(a, b, atol=0)


def test_native_matcher_equals_python():
    """The OpenMP C++ matcher (runtime/csrc/match.cpp) reproduces the Python
    greedy matcher exactly — including duplicate segments/scores, videos with
    predictions but no GT, and GT-only videos."""
    rng = np.random.default_rng(11)
    gt, pred = _random_tables(rng, n_videos=40, n_pred=600)
    # inject exact ties: duplicated GTs and duplicated predictions
    for k in gt:
        gt[k] = np.concatenate([gt[k], gt[k][:7]])
    for k in pred:
        pred[k] = np.concatenate([pred[k], pred[k][:31]])
    a = average_precision(gt, pred, CHALLENGE_TIOUS, n_jobs=0)
    b = average_precision(gt, pred, CHALLENGE_TIOUS, n_jobs=-1)
    np.testing.assert_allclose(a, b, atol=0)


def test_factorize_ids_consistent():
    from audio_visual_deepfake_detection_tpu.eval.detection import _factorize_ids

    ids = np.asarray(["b.mp4", "a.mp4", "b.mp4", "zz", "a.mp4", "c", "zz"])
    codes = _factorize_ids(ids)
    # same id -> same code, different id -> different code
    for i in range(len(ids)):
        for j in range(len(ids)):
            assert (codes[i] == codes[j]) == (ids[i] == ids[j])
    # object-dtype fallback agrees with itself
    codes_obj = _factorize_ids(ids.astype(object))
    for i in range(len(ids)):
        for j in range(len(ids)):
            assert (codes_obj[i] == codes_obj[j]) == (ids[i] == ids[j])
