"""ctypes bindings for the native host soft-NMS (runtime/csrc/nms.cpp).

Used as (a) a bit-parity oracle for the on-device implementation in tests,
(b) a CPU fallback path mirroring the reference's C++ extension
(libs/utils/csrc/nms_cpu.cpp + libs/utils/setup.py).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Tuple

import numpy as np

_CSRC = Path(__file__).parent / "csrc"
_LIB_PATH = _CSRC / "libnms.so"
_lib = None

METHOD_HARD, METHOD_LINEAR, METHOD_GAUSSIAN = 0, 1, 2


def ensure_built() -> Path:
    """Compile the shared library if missing or stale."""
    src = _CSRC / "nms.cpp"
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(src)]
        )
    return _LIB_PATH


def _load():
    global _lib
    if _lib is None:
        try:
            lib = ctypes.CDLL(str(ensure_built()))
        except OSError:
            # stale/foreign .so (different glibc/arch): rebuild once
            _LIB_PATH.unlink(missing_ok=True)
            lib = ctypes.CDLL(str(ensure_built()))
        lib.softnms_1d.restype = ctypes.c_int
        lib.softnms_1d.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.nms_1d.restype = ctypes.c_int
        lib.nms_1d.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    return _lib


def host_softnms(
    segs: np.ndarray,
    scores: np.ndarray,
    iou_threshold: float,
    sigma: float,
    min_score: float,
    method: int = METHOD_GAUSSIAN,
    max_out: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (segs (K,2), scores (K,), original indices (K,))."""
    lib = _load()
    segs = np.ascontiguousarray(segs, dtype=np.float32)
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    n = segs.shape[0]
    cap = max_out if max_out > 0 else n
    out_segs = np.zeros((cap, 2), np.float32)
    out_scores = np.zeros((cap,), np.float32)
    out_inds = np.zeros((cap,), np.int64)
    count = lib.softnms_1d(
        segs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, iou_threshold, sigma, min_score, method, cap,
        out_segs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out_segs[:count], out_scores[:count], out_inds[:count]


def host_nms(
    segs: np.ndarray, scores: np.ndarray, iou_threshold: float, max_out: int = 0
) -> np.ndarray:
    """Vanilla NMS: returns kept indices sorted by descending score."""
    lib = _load()
    segs = np.ascontiguousarray(segs, dtype=np.float32)
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    n = segs.shape[0]
    cap = max_out if max_out > 0 else n
    out_inds = np.zeros((cap,), np.int64)
    count = lib.nms_1d(
        segs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, iou_threshold, cap,
        out_inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out_inds[:count]
