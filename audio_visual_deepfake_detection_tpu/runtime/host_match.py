"""ctypes binding for the native greedy AP matcher (runtime/csrc/match.cpp).

The challenge test set is 343,233 videos and the reference caps predictions
at 100/video (Evaluation/eval.py:100-144) — ~34M rows per evaluation. The
reference spreads the evaluator over a 16-process joblib pool
(Evaluation/eval.py:135); here the per-video greedy matching (the only
non-vectorizable part) runs as one OpenMP C++ pass and everything around it
is vectorized numpy.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).parent / "csrc"
_LIB_PATH = _CSRC / "libmatch.so"
_lib = None


def ensure_built() -> Path:
    src = _CSRC / "match.cpp"
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-fopenmp",
             "-o", str(_LIB_PATH), str(src)]
        )
    return _LIB_PATH


def _load():
    global _lib
    if _lib is None:
        try:
            lib = ctypes.CDLL(str(ensure_built()))
        except OSError:
            _LIB_PATH.unlink(missing_ok=True)
            lib = ctypes.CDLL(str(ensure_built()))
        lib.match_tp.restype = ctypes.c_int
        lib.match_tp.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    return _lib


def host_match_tp(p_seg: np.ndarray, p_off: np.ndarray,
                  g_seg: np.ndarray, g_off: np.ndarray,
                  thresholds: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """Greedy TP flags for grouped, score-ordered predictions.

    p_seg (npred, 2) and g_seg (ngt, 2) are grouped by video via the
    (nvid+1,) offset arrays; within each prediction group rows must be in
    descending score order. Returns (nthr, npred) uint8 TP flags in the same
    grouped order.
    """
    lib = _load()
    p_seg = np.ascontiguousarray(p_seg, np.float64)
    g_seg = np.ascontiguousarray(g_seg, np.float64)
    p_off = np.ascontiguousarray(p_off, np.int64)
    g_off = np.ascontiguousarray(g_off, np.int64)
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    nvid = len(p_off) - 1
    npred = p_seg.shape[0]
    assert len(g_off) - 1 == nvid, (len(g_off), nvid)
    tp = np.zeros((len(thresholds), npred), np.uint8)
    rc = lib.match_tp(
        p_seg.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        p_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        g_seg.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        g_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nvid, npred,
        thresholds.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(thresholds), n_threads,
        tp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f"match_tp failed with rc={rc}")
    return tp
