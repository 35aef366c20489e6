"""ctypes bindings for the native media decoder (runtime/csrc/media.cpp).

Gives the raw-media pipeline real audio/video decode without the ffmpeg CLI
(absent in this image): the system libav* libraries are linked directly.
Replaces the subprocess path of the reference's preprocess/extract_wav.py
and the cv2 frame read in pipeline/e2e.py when available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_CSRC = Path(__file__).parent / "csrc"
_LIB_PATH = _CSRC / "libmedia.so"
_lib = None
_build_error: Optional[str] = None

_LIBAV_FLAGS = ["-lavformat", "-lavcodec", "-lavutil", "-lswresample", "-lswscale"]

_ERR = {
    -1: "cannot open container",
    -2: "no stream info",
    -3: "no matching stream / decoder",
    -4: "codec context alloc failed",
    -5: "codec parameters rejected",
    -6: "decoder open failed",
    -7: "converter init failed",
    -8: "resampler init failed",
    -9: "resample failed",
    -10: "decode error",
    -11: "no frames decoded",
    -12: "out of memory",
    -13: "mid-file read/demux error (corrupt or truncated media)",
}


def ensure_built() -> Path:
    src = _CSRC / "media.cpp"
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(src)]
            + _LIBAV_FLAGS
        )
    return _LIB_PATH


def available() -> bool:
    """True when the native decoder can be built/loaded on this machine."""
    try:
        return _load() is not None
    except Exception:
        return False


def _load():
    global _lib, _build_error
    if _lib is None and _build_error is None:
        try:
            try:
                lib = ctypes.CDLL(str(ensure_built()))
            except OSError:
                # a stale/foreign .so (different glibc/arch, or built from an
                # older ABI) can exist yet fail to load — rebuild once
                _LIB_PATH.unlink(missing_ok=True)
                lib = ctypes.CDLL(str(ensure_built()))
        except (OSError, subprocess.CalledProcessError) as e:  # no libav* on host
            _build_error = str(e)
            return None
        lib.avdd_decode_audio.restype = ctypes.c_int
        lib.avdd_decode_audio.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.avdd_decode_video.restype = ctypes.c_int
        lib.avdd_decode_video.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.avdd_media_info.restype = ctypes.c_int
        lib.avdd_media_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.avdd_media_free.restype = None
        lib.avdd_media_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def decode_audio(path: str, sample_rate: int = 16000) -> np.ndarray:
    """mp4/any container -> mono float32 PCM at `sample_rate`.

    Matches the reference extraction semantics (`ffmpeg -map 0:a` to 16 kHz
    mono wav, preprocess/extract_wav.py:19) in one in-process call; AAC
    priming samples are trimmed by libavcodec so the length lines up with
    the metadata's `audio_frames` count.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native media decoder unavailable: {_build_error}")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.avdd_decode_audio(path.encode(), sample_rate,
                               ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        raise RuntimeError(f"audio decode failed for {path}: "
                           f"{_ERR.get(rc, rc)}")
    try:
        pcm = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.avdd_media_free(out)
    return pcm


def decode_video(path: str, out_w: int = 0, out_h: int = 0,
                 max_frames: int = 0) -> Tuple[np.ndarray, float]:
    """Decode frames as RGB uint8; optional bilinear resize on the fly.

    Returns ((T, H, W, 3) uint8, fps). out_w/out_h <= 0 keeps native size;
    max_frames <= 0 decodes all (the cap stops the decode loop itself, so a
    16-frame probe of a long clip never materializes the whole video).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native media decoder unavailable: {_build_error}")
    frames = ctypes.POINTER(ctypes.c_uint8)()
    n = ctypes.c_int64()
    w = ctypes.c_int()
    h = ctypes.c_int()
    fps = ctypes.c_double()
    rc = lib.avdd_decode_video(path.encode(), out_w, out_h, max_frames,
                               ctypes.byref(frames), ctypes.byref(n),
                               ctypes.byref(w), ctypes.byref(h),
                               ctypes.byref(fps))
    if rc != 0:
        raise RuntimeError(f"video decode failed for {path}: "
                           f"{_ERR.get(rc, rc)}")
    try:
        arr = np.ctypeslib.as_array(
            frames, shape=(n.value, h.value, w.value, 3)).copy()
    finally:
        lib.avdd_media_free(frames)
    return arr, fps.value


def media_info(path: str) -> dict:
    """Container-level info: duration (s), audio_rate, video_frames, fps."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native media decoder unavailable: {_build_error}")
    duration = ctypes.c_double()
    rate = ctypes.c_int()
    vframes = ctypes.c_int64()
    fps = ctypes.c_double()
    rc = lib.avdd_media_info(path.encode(), ctypes.byref(duration),
                             ctypes.byref(rate), ctypes.byref(vframes),
                             ctypes.byref(fps))
    if rc != 0:
        raise RuntimeError(f"media info failed for {path}: {_ERR.get(rc, rc)}")
    return {"duration": duration.value, "audio_rate": rate.value,
            "video_frames": vframes.value, "fps": fps.value}
