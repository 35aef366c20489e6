"""Host-side video decode (reference uses torchvision.io.read_video,
video_feature/aligned_video/extract_video_features.py:53-77). Backends, in
order: the native in-process libav* decoder (runtime/csrc/media.cpp — one
GIL-released C call, optional resize fused into the decode loop), OpenCV,
ffmpeg rawvideo pipe."""

from __future__ import annotations

import shutil
import subprocess
from typing import Optional, Tuple

import numpy as np


def read_video_frames(path: str, max_frames: Optional[int] = None,
                      size: Optional[Tuple[int, int]] = None,
                      ) -> Tuple[np.ndarray, float]:
    """Decode to (T, H, W, 3) uint8 RGB + fps.

    ``size=(h, w)`` resizes during decode (bilinear) — on the native backend
    this never materializes the full-resolution frame stack.
    """
    from ..runtime import host_media

    if host_media.available():
        h, w = size if size else (0, 0)
        frames, fps = host_media.decode_video(path, out_w=w, out_h=h,
                                              max_frames=max_frames or 0)
        return frames, fps
    try:
        import cv2  # noqa: F401

        frames, fps = _read_cv2(path, max_frames)
        if size:
            h, w = size
            frames = np.stack([
                cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR)
                for f in frames])
        return frames, fps
    except ImportError:
        if not shutil.which("ffmpeg"):
            raise RuntimeError(
                "no video decoder available (need libav*, cv2 or ffmpeg)")
        # cv2 is absent here, so the resize must ride ffmpeg's scale filter
        return _read_ffmpeg(path, max_frames, size)


def _read_cv2(path: str, max_frames):
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if max_frames and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.stack(frames), float(fps)


def _read_ffmpeg(path: str, max_frames, size=None):
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0",
         "-show_entries", "stream=width,height,r_frame_rate",
         "-of", "csv=p=0", path],
        capture_output=True, text=True, check=True).stdout.strip().split(",")
    w, h = int(probe[0]), int(probe[1])
    num, den = probe[2].split("/")
    fps = float(num) / float(den)
    cmd = ["ffmpeg", "-i", path]
    if size:
        h, w = size
        cmd += ["-vf", f"scale={w}:{h}:flags=bilinear"]
    if max_frames:
        cmd += ["-frames:v", str(max_frames)]
    cmd += ["-f", "rawvideo", "-pix_fmt", "rgb24", "-loglevel", "error", "-"]
    raw = subprocess.run(cmd, capture_output=True, check=True).stdout
    frames = np.frombuffer(raw, np.uint8).reshape(-1, h, w, 3)
    if max_frames:
        frames = frames[:max_frames]
    return frames.copy(), fps
