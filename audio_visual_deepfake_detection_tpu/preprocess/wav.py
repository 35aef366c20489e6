"""WAV extraction from mp4 (reference: preprocess/extract_wav.py).

ffmpeg ``-map 0:a`` mp4 -> 16 kHz mono wav, parallelized across a process
pool, with per-file error logging. Two backends:

- the **native in-process decoder** (runtime/csrc/media.cpp on the system
  libav* libraries) — no subprocess, releases the GIL, preferred;
- the ffmpeg CLI via subprocess, matching the reference command, when the
  binary exists and the native libraries don't.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

SAMPLE_RATE = 16000


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def have_native() -> bool:
    from ..runtime import host_media

    return host_media.available()


def have_audio_decode() -> bool:
    """True when SOME real audio decode path exists (native or ffmpeg CLI)."""
    return have_native() or have_ffmpeg()


def decode_audio(mp4_path: str, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """mp4 -> mono float32 PCM in [-1, 1] without touching disk. Backends:
    native libav* (in-process, preferred), then the ffmpeg CLI piping raw
    f32le — so an ffmpeg-only host still decodes the REAL track instead of
    falling through to synthetic audio."""
    if have_native():
        from ..runtime import host_media

        return host_media.decode_audio(mp4_path, sample_rate)
    if have_ffmpeg():
        cmd = ["ffmpeg", "-i", mp4_path, "-map", "0:a:0", "-ac", "1",
               "-ar", str(sample_rate), "-f", "f32le", "-loglevel", "error",
               "-"]
        try:
            raw = subprocess.run(cmd, check=True, capture_output=True).stdout
        except subprocess.CalledProcessError as e:
            raise RuntimeError(
                f"ffmpeg audio decode failed for {mp4_path}: "
                f"{e.stderr.decode(errors='replace')}")
        if not raw:
            raise RuntimeError(f"no audio decoded from {mp4_path}")
        return np.frombuffer(raw, np.float32).copy()
    raise RuntimeError("no audio decoder (neither native libav* nor ffmpeg CLI)")


def extract_wav(mp4_path: str, wav_path: str, sample_rate: int = SAMPLE_RATE) -> Optional[str]:
    """One mp4 -> 16 kHz mono wav file. Returns an error string or None."""
    os.makedirs(os.path.dirname(wav_path) or ".", exist_ok=True)
    if have_native():
        try:
            pcm = decode_audio(mp4_path, sample_rate)
        except RuntimeError as e:
            return str(e)
        from scipy.io import wavfile

        # round like ffmpeg's s16 conversion (astype alone truncates toward
        # zero -> 1-LSB drift vs the CLI backend on most samples)
        wavfile.write(wav_path, sample_rate,
                      np.round(np.clip(pcm * 32768.0, -32768, 32767))
                      .astype(np.int16))
        return None
    if not have_ffmpeg():
        return "no audio decoder (neither native libav* nor ffmpeg CLI)"
    cmd = ["ffmpeg", "-y", "-i", mp4_path, "-map", "0:a",
           "-ar", str(sample_rate), "-ac", "1", "-loglevel", "error", wav_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return None
    except subprocess.CalledProcessError as e:
        return e.stderr.decode(errors="replace")


def extract_wav_batch(pairs: Sequence[Tuple[str, str]], num_workers: int = 16,
                      error_file: Optional[str] = None) -> List[Tuple[str, str]]:
    """Parallel extraction (Pool(16) in the reference, extract_wav.py:43).
    Returns failing (path, error) pairs; optionally logs them to a file."""
    errors: List[Tuple[str, str]] = []
    if have_native():  # build the shared lib once before the pool forks
        from ..runtime import host_media

        host_media.ensure_built()
    with ProcessPoolExecutor(num_workers) as pool:
        futures = {pool.submit(extract_wav, src, dst): src for src, dst in pairs}
        for fut, src in futures.items():
            err = fut.result()
            if err:
                errors.append((src, err))
    if error_file and errors:
        with open(error_file, "a") as f:
            for path, err in errors:
                f.write(f"{path}\t{err}\n")
    return errors


def load_wav(path: str, expect_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Read a wav file to float32 in [-1, 1] (scipy backend)."""
    from scipy.io import wavfile

    rate, data = wavfile.read(path)
    assert rate == expect_rate, f"{path}: rate {rate} != {expect_rate}"
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    return data
