"""Challenge-format evaluation driver (reference: Evaluation/eval.py:100-164).

``run_evaluation`` takes the flat prediction table + in-memory GT records,
builds the ANet-style proposal JSON (per-video top-100, score multiplied by
the best external video-cls score when provided), evaluates mAP at the pinned
tIoU thresholds {0.5, 0.75, 0.9, 0.95}, and writes the JSON + a .txt summary.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .detection import ANETdetection, CHALLENGE_TIOUS


def build_proposal_json(
    preds: Dict[str, np.ndarray],
    cls_scores: Optional[Dict[str, Sequence[float]]] = None,
    top_per_video: int = 100,
) -> Dict:
    """Per-video proposal lists (eval.py:103-145)."""
    by_vid: Dict[str, List] = {}
    vids = np.asarray(preds["video-id"])
    for i, vid in enumerate(vids):
        by_vid.setdefault(vid, []).append(i)

    results = {}
    for vid, idxs in by_vid.items():
        best = 1.0
        if cls_scores is not None and vid in cls_scores:
            best = float(np.max(np.asarray(cls_scores[vid])))
        props = []
        for i in idxs[:top_per_video]:
            props.append({
                "label": "Fake",
                "score": float(preds["score"][i]) * best,
                "segment": [max(0.0, float(preds["t-start"][i])),
                            float(preds["t-end"][i])],
            })
        results[vid] = props
    return {"version": "ANET v1.3, Lavdf", "results": results, "external_data": {}}


def run_evaluation(
    preds: Dict[str, np.ndarray],
    gt_records: Sequence[dict],
    proposal_file: str,
    tiou_thre: np.ndarray = CHALLENGE_TIOUS,
    cls_score_file: Optional[str] = None,
    verbose: bool = True,
):
    """Returns (mAP*100, 0.1) like the reference (eval.py:147-164)."""
    cls_scores = None
    if cls_score_file is not None:
        with open(cls_score_file) as f:
            cls_scores = json.load(f)

    proposal = build_proposal_json(preds, cls_scores)
    os.makedirs(os.path.dirname(os.path.abspath(proposal_file)), exist_ok=True)
    with open(proposal_file, "w") as f:
        json.dump(proposal, f)

    evaluator = ANETdetection(gt_records, tiou_thresholds=tiou_thre)
    flat = {"video-id": [], "t-start": [], "t-end": [], "label": [], "score": []}
    for vid, props in proposal["results"].items():
        for p in props:
            flat["video-id"].append(vid)
            flat["t-start"].append(p["segment"][0])
            flat["t-end"].append(p["segment"][1])
            flat["label"].append(0)
            flat["score"].append(p["score"])
    flat = {k: np.asarray(v) for k, v in flat.items()}
    _, mAP, avg = evaluator.evaluate(flat, verbose=verbose)

    summary = (f"Detection: average-mAP {avg * 100:.3f} " +
               " ".join(f"mAP@{t:.2f} {m * 100:.3f}"
                        for t, m in zip(evaluator.tiou_thresholds, mAP)))
    with open(proposal_file.replace(".json", ".txt"), "a") as f:
        f.write(summary + "\n")
    return float(np.mean(mAP)) * 100, 0.1
