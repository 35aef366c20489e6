"""Native host resample+concat kernel (runtime/csrc/resample.cpp) parity."""

import numpy as np
import pytest

from audio_visual_deepfake_detection_tpu.data.dataset import linear_resample_np
from audio_visual_deepfake_detection_tpu.runtime import host_resample


@pytest.fixture(scope="module")
def lib_ok():
    if not host_resample.available():
        pytest.skip("g++ unavailable")
    return True


def test_native_resample_bitwise_parity(lib_ok, rng):
    streams = [
        rng.standard_normal((231, 256)).astype(np.float32),
        rng.standard_normal((120, 2048)).astype(np.float32),
        rng.standard_normal((479, 768)).astype(np.float32),
    ]
    got = host_resample.resample_concat(streams, 768)
    want = np.concatenate([linear_resample_np(s, 768) for s in streams], axis=1)
    assert got.shape == want.shape == (768, 3072)
    np.testing.assert_array_equal(got, want)  # bitwise


def test_native_resample_identity_and_edge(lib_ok, rng):
    # in_len == out_len copies; in_len == 1 broadcasts the single row
    s1 = rng.standard_normal((96, 8)).astype(np.float32)
    s2 = rng.standard_normal((1, 4)).astype(np.float32)
    got = host_resample.resample_concat([s1, s2], 96)
    np.testing.assert_array_equal(got[:, :8], s1)
    np.testing.assert_array_equal(got[:, 8:], np.tile(s2, (96, 1)))


def test_native_resample_rejects_empty(lib_ok, rng):
    with pytest.raises(ValueError):
        host_resample.resample_concat(
            [np.zeros((0, 4), np.float32)], 96)


def test_dataset_uses_native_when_available(lib_ok, rng):
    from audio_visual_deepfake_detection_tpu.data import dataset as ds

    streams = [rng.standard_normal((50, 16)).astype(np.float32),
               rng.standard_normal((33, 8)).astype(np.float32)]
    got = ds.resample_concat_np(streams, 96)
    want = np.concatenate([linear_resample_np(s, 96) for s in streams], axis=1)
    np.testing.assert_array_equal(got, want)
