"""Evaluator + submission-pipeline tests."""

import json
import os

import numpy as np
import pytest

from audio_visual_deepfake_detection_tpu.eval import (
    ANETdetection, CHALLENGE_TIOUS, average_recall_vs_nr_proposals,
    postprocess_results_with_cls, remove_duplicate_annotations,
    results_to_array, run_evaluation)
from audio_visual_deepfake_detection_tpu.infer.results import (
    write_segment_predictions, write_video_predictions)


def _gt_records():
    return [
        {"video_id": "v1.mp4", "n_fakes": 2,
         "segments_time": np.asarray([[1.0, 2.0], [5.0, 6.0]])},
        {"video_id": "v2.mp4", "n_fakes": 1,
         "segments_time": np.asarray([[0.5, 1.5]])},
        {"video_id": "v3.mp4", "n_fakes": 0, "segments_time": None},
    ]


def test_perfect_predictions_map_one():
    ev = ANETdetection(_gt_records())
    preds = {
        "video-id": np.asarray(["v1.mp4", "v1.mp4", "v2.mp4"]),
        "t-start": np.asarray([1.0, 5.0, 0.5]),
        "t-end": np.asarray([2.0, 6.0, 1.5]),
        "label": np.zeros(3, np.int64),
        "score": np.asarray([0.9, 0.8, 0.7]),
    }
    _, mAP, avg = ev.evaluate(preds)
    np.testing.assert_allclose(mAP, 1.0)
    assert avg == pytest.approx(1.0)


def test_wrong_predictions_map_zero():
    ev = ANETdetection(_gt_records())
    preds = {
        "video-id": np.asarray(["v1.mp4"]),
        "t-start": np.asarray([8.0]),
        "t-end": np.asarray([9.0]),
        "label": np.zeros(1, np.int64),
        "score": np.asarray([0.9]),
    }
    _, mAP, _ = ev.evaluate(preds)
    np.testing.assert_allclose(mAP, 0.0)


def test_partial_overlap_threshold_behavior():
    """A prediction with IoU 0.8 counts at tIoU 0.5/0.75 but not 0.9/0.95."""
    ev = ANETdetection([{"video_id": "v.mp4", "n_fakes": 1,
                         "segments_time": np.asarray([[0.0, 1.0]])}])
    preds = {
        "video-id": np.asarray(["v.mp4"]),
        "t-start": np.asarray([0.0]),
        "t-end": np.asarray([0.8]),  # IoU = 0.8
        "label": np.zeros(1, np.int64),
        "score": np.asarray([0.9]),
    }
    _, mAP, _ = ev.evaluate(preds)
    np.testing.assert_allclose(mAP, [1.0, 1.0, 0.0, 0.0])


def test_run_evaluation_end_to_end(tmp_path):
    preds = {
        "video-id": np.asarray(["v1.mp4", "v2.mp4"]),
        "t-start": np.asarray([1.0, 0.5]),
        "t-end": np.asarray([2.0, 1.5]),
        "label": np.zeros(2, np.int64),
        "score": np.asarray([0.9, 0.8]),
    }
    out = tmp_path / "proposal.json"
    mAP, _ = run_evaluation(preds, _gt_records(), str(out), verbose=False)
    assert 0 <= mAP <= 100
    blob = json.load(open(out))
    assert set(blob.keys()) == {"version", "results", "external_data"}
    assert blob["results"]["v1.mp4"][0]["label"] == "Fake"
    assert os.path.exists(str(out).replace(".json", ".txt"))


def test_ar_at_n():
    gt = {
        "video-id": np.asarray(["v1", "v1"]),
        "t-start": np.asarray([1.0, 5.0]),
        "t-end": np.asarray([2.0, 6.0]),
    }
    props = {
        "video-id": np.asarray(["v1", "v1", "v1"]),
        "t-start": np.asarray([1.0, 8.0, 5.0]),
        "t-end": np.asarray([2.0, 9.0, 6.0]),
        "score": np.asarray([0.9, 0.8, 0.7]),
    }
    recall, avg_recall, budgets = average_recall_vs_nr_proposals(gt, props)
    # with all 3 proposals both GTs are found at every tIoU
    np.testing.assert_allclose(recall[:, -1], 1.0)
    # with only the top-1 proposal only one GT is matched
    np.testing.assert_allclose(recall[:, 0], 0.5)


def test_remove_duplicate_annotations():
    ants = [
        {"segment": [1.0, 2.0], "label_id": 0},
        {"segment": [1.0, 2.0], "label_id": 0},      # duplicate
        {"segment": [1.0, 1.0005], "label_id": 0},   # too short
        {"segment": [3.0, 4.0], "label_id": 0},
    ]
    assert len(remove_duplicate_annotations(ants)) == 2


def test_results_to_array_fusion_vs_reference(tmp_path):
    """Flat table -> per-video arrays -> topk cls fusion matches the
    reference postprocess_results (libs/utils/postprocessing.py:56-155)
    end to end."""
    import importlib.util
    import json
    import sys
    import types

    pytest.importorskip("torch")
    pytest.importorskip("pandas")
    ref_root = "/root/reference/libs/utils"
    if "refutils.postprocessing" not in sys.modules:
        pkg = types.ModuleType("refutils")
        pkg.__path__ = [ref_root]
        sys.modules["refutils"] = pkg
        for name in ("metrics", "postprocessing"):
            spec = importlib.util.spec_from_file_location(
                f"refutils.{name}", f"{ref_root}/{name}.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"refutils.{name}"] = mod
            spec.loader.exec_module(mod)
    ref_pp = sys.modules["refutils.postprocessing"]

    rng = np.random.default_rng(5)
    flat = {"video-id": [], "t-start": [], "t-end": [], "label": [], "score": []}
    cls_scores = {}
    for vid in ("a.mp4", "b.mp4", "c.mp4"):
        n = int(rng.integers(3, 8))
        starts = rng.uniform(0, 10, n)
        flat["video-id"].extend([vid] * n)
        flat["t-start"].extend(starts.tolist())
        flat["t-end"].extend((starts + rng.uniform(0.1, 2, n)).tolist())
        flat["label"].extend([0] * n)
        flat["score"].extend(rng.uniform(0, 1, n).tolist())
        cls_scores[vid] = rng.uniform(0, 1, 4).tolist()
    flat = {k: np.asarray(v) for k, v in flat.items()}
    cls_file = tmp_path / "cls.json"
    cls_file.write_text(json.dumps(cls_scores))

    ref_out = ref_pp.postprocess_results(
        dict(flat), str(cls_file), num_pred=5, topk=2)
    ours = postprocess_results_with_cls(
        results_to_array(flat, num_pred=5), cls_scores, num_pred=5, topk=2)

    assert list(ours["video-id"]) == list(ref_out["video-id"])
    for key in ("t-start", "t-end", "score"):
        np.testing.assert_allclose(ours[key], ref_out[key], atol=1e-12,
                                   err_msg=key)
    np.testing.assert_array_equal(ours["label"], ref_out["label"])


def test_postprocess_results_with_cls():
    results = {"v1": {"score": np.asarray([0.5, 0.4]),
                      "segment": np.asarray([[0, 1], [2, 3]]),
                      "label": np.asarray([0, 0])}}
    cls_scores = {"v1": [0.9, 0.2, 0.6]}
    out = postprocess_results_with_cls(results, cls_scores, topk=2)
    assert len(out["score"]) == 4
    np.testing.assert_allclose(out["score"][0], np.sqrt(0.9 * 0.5))
    assert set(out["label"]) == {0, 2}


def test_submission_files(tmp_path):
    items = [
        {"video_id": "b.mp4", "video_cls": [3.0],
         "scores": [0.95, 0.1], "segments": [[1.0, 2.0], [4.0, 5.0]]},
        {"video_id": "a.mp4", "video_cls": [-2.0], "scores": [], "segments": []},
        {"video_id": "b.mp4", "video_cls": [0.0], "scores": [0.5],
         "segments": [[9.0, 9.5]]},  # duplicate id: ignored
    ]
    txt = tmp_path / "prediction.txt"
    n = write_video_predictions(items, str(txt))
    assert n == 2
    lines = txt.read_text().splitlines()
    assert lines[0].startswith("a.mp4;")
    # sigmoid(3.0)=0.9526 > 0.9 -> clamped to 1.0
    assert lines[1] == "b.mp4;1.0"

    out = tmp_path / "prediction.json"
    write_segment_predictions(items, str(out))
    blob = json.load(open(out))
    assert blob["b.mp4"] == [[0.95, 1.0, 2.0]]       # 0.1 filtered at 0.2
    assert blob["a.mp4"] == [[0, 0, 0]]               # empty sentinel


def test_json_io_round_trip(tmp_path):
    from audio_visual_deepfake_detection_tpu.eval import (
        load_gt_seg_from_json, load_pred_seg_from_json)

    gt_blob = {"database": {
        "v1.mp4": {"subset": "test", "annotations": [
            {"segment": [1.0, 2.0], "label_id": 0},
            {"segment": [1.0, 2.0], "label_id": 0},  # duplicate -> dropped
        ]},
        "v2.mp4": {"subset": "train", "annotations": [
            {"segment": [0.5, 1.5], "label_id": 0}]},
    }}
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt_blob))
    gt = load_gt_seg_from_json(str(gt_path), split="test")
    assert len(gt["t-start"]) == 1 and gt["video-id"][0] == "v1.mp4"

    pred_blob = {"results": {"v1.mp4": [
        {"segment": [1.0, 2.1], "label": "Fake", "score": 0.9}]}}
    pred_path = tmp_path / "pred.json"
    pred_path.write_text(json.dumps(pred_blob))
    pred = load_pred_seg_from_json(str(pred_path))
    assert len(pred["score"]) == 1 and pred["score"][0] == 0.9


def test_cls_fusion_handles_fewer_classes_than_topk():
    """A video with fewer external classes than topk must not desync the
    parallel arrays of the fused table."""
    from audio_visual_deepfake_detection_tpu.eval.detection import (
        postprocess_results_with_cls)

    results = {
        "a": {"score": [0.9, 0.8], "segment": [[0.0, 1.0], [2.0, 3.0]]},
        "b": {"score": [0.7], "segment": [[1.0, 2.0]]},
    }
    cls_scores = {"a": [0.5], "b": [0.6, 0.4]}  # a has 1 class, topk=2
    out = postprocess_results_with_cls(results, cls_scores, topk=2)
    n = len(out["video-id"])
    assert all(len(out[k]) == n
               for k in ("t-start", "t-end", "label", "score"))
    assert n == 2 * 1 + 1 * 2  # a: 2 segs x 1 class, b: 1 seg x 2 classes
    # rows for b carry b's segment, not a's
    b_rows = out["video-id"] == "b"
    assert np.allclose(out["t-start"][b_rows], 1.0)
    assert np.allclose(out["t-end"][b_rows], 2.0)
