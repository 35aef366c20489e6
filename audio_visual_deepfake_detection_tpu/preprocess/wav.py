"""WAV extraction from mp4 (reference: preprocess/extract_wav.py).

ffmpeg ``-map 0:a`` mp4 -> 16 kHz mono wav, parallelized across a process
pool, with per-file error logging. ffmpeg is invoked via subprocess when
available; environments without it get a clear error (the downstream feature
pipeline can also consume pre-extracted wavs or .npy caches).
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


def extract_wav(mp4_path: str, wav_path: str, sample_rate: int = SAMPLE_RATE) -> Optional[str]:
    """One mp4 -> wav. Returns an error string or None."""
    if not have_ffmpeg():
        return "ffmpeg not available"
    os.makedirs(os.path.dirname(wav_path) or ".", exist_ok=True)
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
