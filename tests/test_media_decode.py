"""Native media decode (runtime/csrc/media.cpp via runtime/host_media.py).

The decoder replaces the reference's ffmpeg-CLI wav extraction
(preprocess/extract_wav.py:7-44) and the cv2 frame read, using the system
libav* libraries in-process. Oracles: the tinydataset metadata JSONs record
the exact waveform length (`audio_frames` @ 16 kHz) and frame count
(`video_frames`) of every clip, and cv2 (an independent ffmpeg build) gives
pixel-level agreement on the decoded frames.
"""

import glob
import json
import os

import numpy as np
import pytest

from audio_visual_deepfake_detection_tpu.runtime import host_media

TINY = "/root/reference/tinydataset"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(TINY) and host_media.available()),
    reason="tinydataset or native libav* unavailable")


def _clips():
    out = []
    for mp4 in sorted(glob.glob(os.path.join(TINY, "data/**/*.mp4"),
                                recursive=True)):
        meta = mp4.replace("/data/", "/metadata/").replace(".mp4", ".json")
        out.append((mp4, json.load(open(meta))))
    return out


def test_audio_length_matches_metadata():
    """audio_frames in the metadata is the true waveform length; decoded
    PCM must match it exactly for pass-through tracks and may carry at most
    one AAC frame (1024 samples) of trailing encoder padding for the
    re-encoded fake-audio tracks."""
    clips = _clips()
    assert clips, "no tinydataset clips found"
    exact = 0
    for mp4, meta in clips:
        pcm = host_media.decode_audio(mp4, 16000)
        n_meta = meta["audio_frames"]
        assert n_meta <= len(pcm) <= n_meta + 1024, \
            f"{mp4}: {len(pcm)} vs metadata {n_meta}"
        assert pcm.dtype == np.float32
        assert np.isfinite(pcm).all()
        rms = float(np.sqrt(np.mean(pcm ** 2)))
        assert 1e-4 < rms < 1.0, f"{mp4}: implausible rms {rms}"
        exact += int(len(pcm) == n_meta)
    # the real-audio tracks (no re-encode padding) must be sample-exact
    assert exact >= len(clips) // 3


def test_video_frames_match_metadata_and_cv2():
    mp4, meta = _clips()[0]
    frames, fps = host_media.decode_video(mp4)
    assert frames.shape[0] == meta["video_frames"]
    assert fps == pytest.approx(meta["video_frames"] / (meta["audio_frames"] / 16000.0), rel=0.02)
    cv2 = pytest.importorskip("cv2")
    cap = cv2.VideoCapture(mp4)
    ok, first_bgr = cap.read()
    cap.release()
    assert ok
    first_ref = cv2.cvtColor(first_bgr, cv2.COLOR_BGR2RGB).astype(np.int16)
    # independent h264 decoders agree bit-wise on YUV; the YUV->RGB matrix
    # implementations differ by a couple of 8-bit steps
    diff = np.abs(frames[0].astype(np.int16) - first_ref)
    assert diff.mean() < 1.0 and diff.max() <= 6, (diff.mean(), diff.max())


def test_resize_at_decode_matches_post_resize():
    cv2 = pytest.importorskip("cv2")
    mp4, _ = _clips()[0]
    small, _ = host_media.decode_video(mp4, out_w=96, out_h=96)
    full, _ = host_media.decode_video(mp4)
    ref = cv2.resize(full[0], (96, 96), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(small[0].astype(np.int16) - ref.astype(np.int16))
    # swscale bilinear vs cv2 bilinear: same filter, different fixed-point
    # rounding
    assert small.shape[1:] == (96, 96, 3)
    assert diff.mean() < 3.0, diff.mean()


def test_media_info():
    mp4, meta = _clips()[0]
    info = host_media.media_info(mp4)
    assert info["audio_rate"] == 16000
    assert info["video_frames"] == meta["video_frames"]
    assert info["duration"] == pytest.approx(meta["audio_frames"] / 16000.0,
                                             abs=0.25)


def test_extract_wav_roundtrip(tmp_path):
    """extract_wav (native backend) -> load_wav reproduces decode_audio."""
    from audio_visual_deepfake_detection_tpu.preprocess.wav import (
        decode_audio, extract_wav, load_wav)

    mp4, _ = _clips()[0]
    wav_path = str(tmp_path / "out.wav")
    assert extract_wav(mp4, wav_path) is None
    loaded = load_wav(wav_path)
    direct = decode_audio(mp4)
    assert loaded.shape == direct.shape
    np.testing.assert_allclose(loaded, direct, atol=1.0 / 32768.0)


def test_read_video_frames_native_backend():
    from audio_visual_deepfake_detection_tpu.preprocess.video_io import (
        read_video_frames)

    mp4, meta = _clips()[0]
    frames, fps = read_video_frames(mp4, size=(96, 96))
    assert frames.shape == (meta["video_frames"], 96, 96, 3)
    assert frames.dtype == np.uint8
    assert fps == pytest.approx(25.0, rel=0.05)


def test_e2e_decode_uses_real_audio():
    """MediaPipeline._decode must pick the mp4's real AAC track (not the
    synthetic fallback) when the native decoder is present."""
    from audio_visual_deepfake_detection_tpu.pipeline.e2e import (
        MediaItem, MediaPipeline, synth_wav)

    mp4, meta = _clips()[0]
    dur = meta["audio_frames"] / 16000.0
    item = MediaItem(video_id="x.mp4", duration=dur, mp4_path=mp4)
    decoded = MediaPipeline._decode(
        # _decode only touches these attributes; a bare namespace suffices
        type("P", (), {"use_audio": True, "host_resize": (96, 96)})(), item)
    assert decoded.wav is not None
    assert len(decoded.wav) == int(round(dur * 16000))
    assert decoded.frames.shape == (meta["video_frames"], 96, 96, 3)
    synth = synth_wav("x.mp4", dur)
    assert not np.allclose(decoded.wav[:1000], synth[:1000])


def test_e2e_decode_falls_back_on_undecodable_audio(tmp_path, capsys):
    """A video-only (or corrupt-audio) file must not kill the sweep: the
    decode stage logs and substitutes the synthetic signal."""
    from audio_visual_deepfake_detection_tpu.pipeline.e2e import (
        MediaItem, MediaPipeline, synth_wav)

    bad = tmp_path / "noaudio.mp4"
    bad.write_bytes(b"\x00" * 64)  # not a real container
    # frames supplied directly so only the audio path is exercised
    item = MediaItem(video_id="bad.mp4", duration=1.0, mp4_path=str(bad),
                     frames=np.zeros((4, 96, 96, 3), np.uint8))
    decoded = MediaPipeline._decode(
        type("P", (), {"use_audio": True, "host_resize": (96, 96)})(), item)
    np.testing.assert_array_equal(decoded.wav, synth_wav("bad.mp4", 1.0))
    assert "substituting synthetic audio" in capsys.readouterr().out


def test_e2e_decode_falls_back_on_undecodable_video(tmp_path, capsys):
    """A corrupt mp4 must not kill the sweep either: the video stage
    substitutes blank frames so the video id still gets a prediction row."""
    from audio_visual_deepfake_detection_tpu.pipeline.e2e import (
        MediaItem, MediaPipeline)

    bad = tmp_path / "corrupt.mp4"
    bad.write_bytes(b"\x00" * 64)
    item = MediaItem(video_id="corrupt.mp4", duration=2.0, mp4_path=str(bad))
    decoded = MediaPipeline._decode(
        type("P", (), {"use_audio": False, "host_resize": (96, 96)})(), item)
    assert decoded.frames.shape == (50, 96, 96, 3)  # 2 s at nominal 25 fps
    assert decoded.frames.dtype == np.uint8 and not decoded.frames.any()
    assert "substituting blank frames" in capsys.readouterr().out


def test_native_max_frames_cap():
    """max_frames stops the decode loop itself and matches the full decode's
    prefix (presentation order, not decode order)."""
    from audio_visual_deepfake_detection_tpu.runtime import host_media

    if not host_media.available():
        pytest.skip("no native decoder")
    mp4 = _clips()[0][0]
    full, fps = host_media.decode_video(mp4, out_w=64, out_h=64)
    part, fps2 = host_media.decode_video(mp4, out_w=64, out_h=64, max_frames=8)
    assert part.shape[0] == 8 and fps2 == fps
    np.testing.assert_array_equal(part, full[:8])
    # read_video_frames plumbs the cap through
    from audio_visual_deepfake_detection_tpu.preprocess.video_io import (
        read_video_frames)
    frames, _ = read_video_frames(mp4, max_frames=5, size=(64, 64))
    np.testing.assert_array_equal(frames, full[:5])


def test_truncated_file_reports_error(tmp_path):
    """A file cut off mid-stream must fail decode, not return silently
    truncated media as success."""
    from audio_visual_deepfake_detection_tpu.runtime import host_media

    if not host_media.available():
        pytest.skip("no native decoder")
    mp4 = _clips()[0][0]
    data = open(mp4, "rb").read()
    cut = tmp_path / "cut.mp4"
    cut.write_bytes(data[: len(data) // 3])
    with pytest.raises(RuntimeError):
        host_media.decode_video(str(cut), out_w=64, out_h=64)
