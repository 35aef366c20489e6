"""ctypes bindings for the native host resample+concat kernel
(runtime/csrc/resample.cpp).

The per-sample linear resample to max_seq_len is the data path's host hot
loop (the reference runs it inside torch's C++ DataLoader workers,
deepfake_video_audio.py:996-1018). The native kernel fuses resample + concat
across streams, releases the GIL for the duration of the call (so the
threaded loader scales across host cores), and bit-matches the numpy path
(``-ffp-contract=off`` keeps the lerp un-fused, like numpy).

Falls back transparently if g++ is unavailable: callers should catch
``OSError``/``subprocess.CalledProcessError`` from :func:`ensure_built`.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_CSRC = Path(__file__).parent / "csrc"
_LIB_PATH = _CSRC / "libresample.so"
_lib = None


def ensure_built() -> Path:
    src = _CSRC / "resample.cpp"
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        subprocess.check_call(
            ["g++", "-O3", "-fopenmp", "-ffp-contract=off", "-shared", "-fPIC",
             "-o", str(_LIB_PATH), str(src)])
    return _LIB_PATH


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(ensure_built()))
        lib.resample_concat.restype = ctypes.c_int
        lib.resample_concat.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def resample_concat(streams: List[np.ndarray], out_len: int,
                    out: Optional[np.ndarray] = None,
                    threads: int = 1) -> np.ndarray:
    """Resample each (rows_s, C_s) float32 stream to ``out_len`` rows and
    concatenate channels -> (out_len, sum(C_s)). Bit-equal to
    ``np.concatenate([linear_resample_np(s, out_len) for s in streams], 1)``.

    ``threads``: OpenMP team size. Default 1 (serial) because the usual
    caller is a loader WORKER thread — the outer pool provides the
    parallelism, and a full team per worker oversubscribes the host. Pass 0
    for the library default team when calling from a single thread.
    """
    lib = _load()
    streams = [np.ascontiguousarray(s, dtype=np.float32) for s in streams]
    n = len(streams)
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for s in streams])
    rows = (ctypes.c_int * n)(*[s.shape[0] for s in streams])
    chans = (ctypes.c_int * n)(*[s.shape[1] for s in streams])
    total_c = int(sum(s.shape[1] for s in streams))
    if out is None:
        out = np.empty((out_len, total_c), np.float32)
    # real checks (asserts vanish under -O): the kernel writes raw row-major
    # memory, so a wrong-shaped or noncontiguous buffer would be corrupted
    if (out.shape != (out_len, total_c) or out.dtype != np.float32
            or not out.flags["C_CONTIGUOUS"]):
        raise ValueError(
            f"out must be C-contiguous float32 of shape {(out_len, total_c)}, "
            f"got {out.dtype} {out.shape} contiguous={out.flags['C_CONTIGUOUS']}")
    rc = lib.resample_concat(
        ptrs, rows, chans, n, out_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads)
    if rc != 0:
        raise ValueError(f"resample_concat failed (rc={rc}): empty stream?")
    return out
