"""Train-side device resample: the random-window crop folds into the dynamic
resampler (ops/resample.py start/out_valid), the host keeps only the GT math
and the rng draws — outputs match the host pipeline bit-for-bit (same rng
call order, same coordinate arithmetic)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.data.dataset import (
    DeepfakeDataset, collate_batch, collate_train_streams)
from audio_visual_deepfake_detection_tpu.ops.resample import linear_resample_dynamic
from audio_visual_deepfake_detection_tpu.train import build_train_step

from test_train import TRAIN_CFG, tiny_cfg, make_state


@pytest.mark.parametrize("use_matmul", [True, False])
def test_resample_crop_fold_exact(rng, use_matmul):
    """resample(R) then slice [st, st+len) == fused start/out_valid form."""
    B, CAP, C, R = 3, 120, 5, 96
    rows = np.asarray([100, 37, 120], np.int32)
    st = np.asarray([7, 0, 30], np.int32)
    ln = np.asarray([80, 96, 50], np.int32)
    x = np.zeros((B, CAP, C), np.float32)
    for i in range(B):
        x[i, :rows[i]] = rng.standard_normal((rows[i], C))
    xj = jnp.asarray(x)

    full = linear_resample_dynamic(xj, jnp.asarray(rows), R,
                                   use_matmul=use_matmul)
    got = linear_resample_dynamic(
        xj, jnp.asarray(rows), R, use_matmul=use_matmul, resample_len=R,
        start=jnp.asarray(st), out_valid=jnp.asarray(ln))
    for i in range(B):
        ref = np.zeros((R, C), np.float32)
        sl = np.asarray(full)[i][st[i]:st[i] + ln[i]]
        ref[:sl.shape[0]] = sl[:R]
        np.testing.assert_array_equal(np.asarray(got)[i], ref)


def _tiny_dataset_cfg(root):
    return {
        "video_feat_folder": str(root / "video"),
        "audio_byola_feat_folder": str(root / "byola"),
        "audio_emo_feat_folder": str(root / "emotion"),
        "train_txt": str(root / "train.txt"),
        "json_folder": "/root/reference/tinydataset/metadata",
        "feat_stride": 1, "num_frames": 1, "downsample_rate": 0,
        "max_seq_len": 96, "trunc_thresh": 0.5, "crop_ratio": [0.7, 1.0],
        "video_input_dim": 8, "audio_input_dim": 16, "num_classes": 1,
        "force_upsampling": True,
    }


@pytest.fixture()
def tiny_cache(tmp_path):
    import glob, os
    from audio_visual_deepfake_detection_tpu.data import metadata as md
    meta_dir = "/root/reference/tinydataset/metadata"
    rels = [os.path.relpath(p, meta_dir) for p in
            sorted(glob.glob(os.path.join(meta_dir, "*", "*", "*", "*.json")))]
    r = np.random.default_rng(3)
    for rel in rels:
        meta = md.load_video_meta(meta_dir, rel)
        rel_npy = rel.replace(".json", ".npy")
        for sub, rows, dim in [
            ("video", max(int(round(meta.fps * meta.duration)), 8), 8),
            ("byola", int(np.ceil(12.5 * meta.duration)) + 2, 12),
            ("emotion", int(np.ceil(50 * meta.duration)) + 2, 4),
        ]:
            path = tmp_path / sub / rel_npy
            path.parent.mkdir(parents=True, exist_ok=True)
            np.save(path, r.standard_normal((rows, dim)).astype(np.float32))
    (tmp_path / "train.txt").write_text("\n".join(rels))
    return tmp_path


def test_dataset_device_mode_matches_host(rng, tiny_cache):
    """Same rng seed -> identical windows/GT; the device resample+crop of the
    raw streams reproduces the host-path feats exactly."""
    cfg = _tiny_dataset_cfg(tiny_cache)
    host = DeepfakeDataset("deepfake_video_audioEmoBYOLA", True, ["train"], cfg)
    dev = DeepfakeDataset("deepfake_video_audioEmoBYOLA", True, ["train"],
                          {**cfg, "device_resample": True})
    for idx in range(len(host)):
        h = host.__getitem__(idx, np.random.default_rng(100 + idx))
        d = dev.__getitem__(idx, np.random.default_rng(100 + idx))
        assert h["video_id"] == d["video_id"]
        if h["segments"] is None:
            assert d["segments"] is None
            assert d["win_st"] == 0 and d["win_len"] == cfg["max_seq_len"]
        else:
            np.testing.assert_array_equal(h["segments"], d["segments"])
            np.testing.assert_array_equal(h["labels"], d["labels"])
        # device feats: fused resample+crop over the raw streams
        parts = []
        for s in d["streams"]:
            got = linear_resample_dynamic(
                jnp.asarray(s[None]), jnp.asarray([s.shape[0]], np.int32),
                cfg["max_seq_len"], resample_len=cfg["max_seq_len"],
                start=jnp.asarray([d["win_st"]], np.int32),
                out_valid=jnp.asarray([d["win_len"]], np.int32))
            parts.append(np.asarray(got)[0])
        dev_feats = np.concatenate(parts, axis=1)[:h["feats"].shape[0]]
        np.testing.assert_allclose(dev_feats, h["feats"], atol=1e-6, rtol=1e-6)


def test_online_train_step_matches_host(rng, tiny_cache):
    """One f32 train step through the online path.

    The collated feats/mask/GT are bit-identical to the host path (verified
    directly in test_dataset_device_mode_matches_host); inside the full train
    jit, XLA fuses the resample einsum into the surrounding program with a
    different accumulation order, so step losses agree only to float-drift
    tolerance, not bitwise.
    """
    dcfg = _tiny_dataset_cfg(tiny_cache)
    host = DeepfakeDataset("deepfake_video_audioEmoBYOLA", True, ["train"], dcfg)
    dev = DeepfakeDataset("deepfake_video_audioEmoBYOLA", True, ["train"],
                          {**dcfg, "device_resample": True})
    hs = [host.__getitem__(i, np.random.default_rng(7 + i)) for i in range(4)]
    ds = [dev.__getitem__(i, np.random.default_rng(7 + i)) for i in range(4)]
    host_batch = collate_batch(hs, dcfg["max_seq_len"], max_gt=8)
    caps = [400, 150, 600]
    dev_batch = collate_train_streams(ds, caps, dcfg["max_seq_len"], max_gt=8)
    host_batch.pop("video_ids")
    dev_batch.pop("video_ids")

    cfg = tiny_cfg()
    state, _ = make_state(cfg)
    step_host = jax.jit(build_train_step(cfg, TRAIN_CFG))
    step_dev = jax.jit(build_train_step(cfg, TRAIN_CFG, online_resample=True))
    _, losses_h = step_host(state, host_batch)
    _, losses_d = step_dev(state, dev_batch)
    for k in losses_h:
        np.testing.assert_allclose(
            np.asarray(losses_d[k]), np.asarray(losses_h[k]),
            rtol=2e-3, atol=2e-3, err_msg=k)


def test_online_train_step_sharded_8dev(rng, tiny_cache):
    """Online (ragged-stream) train step over an 8-device data mesh: the
    streams tuple shards on the batch axis like any other batch array."""
    from audio_visual_deepfake_detection_tpu.parallel import (
        make_mesh, replicate_tree, shard_batch)
    from audio_visual_deepfake_detection_tpu.parallel.mesh import pad_batch_to

    dcfg = _tiny_dataset_cfg(tiny_cache)
    dev = DeepfakeDataset("deepfake_video_audioEmoBYOLA", True, ["train"],
                          {**dcfg, "device_resample": True})
    ds = [dev.__getitem__(i % len(dev), np.random.default_rng(i))
          for i in range(6)]
    batch = collate_train_streams(ds, [400, 150, 600], dcfg["max_seq_len"],
                                  max_gt=8)
    batch.pop("video_ids")
    batch = pad_batch_to(batch, 8)     # partial batch -> static mesh shape
    batch.pop("_real_rows")

    cfg = tiny_cfg()
    mesh = make_mesh(devices=jax.devices("cpu"))
    assert mesh.devices.size == 8
    state, _ = make_state(cfg)
    state = replicate_tree(mesh, state)
    step = jax.jit(build_train_step(cfg, TRAIN_CFG, online_resample=True))
    batch = shard_batch(mesh, batch)
    _, losses = step(state, batch)
    assert np.isfinite(float(losses["final_loss"]))


@pytest.mark.parametrize("use_matmul", [True, False])
def test_online_resample_bf16_transfer_tolerance(rng, use_matmul):
    """bf16-infeed contract (train/state.py:56-66): with compute_dtype
    bfloat16, train.py --device-resample ships raw streams in bf16, so the
    device lerp sees bf16-rounded inputs while the host path resamples in f32
    before the downcast. Bit-parity holds only for f32 transfer; this pins
    the documented bf16 tolerance so a regression past rounding error fails.
    """
    from audio_visual_deepfake_detection_tpu.ops.resample import (
        linear_resample_time)

    B, CAP, C, R = 4, 300, 16, 96
    rows = np.asarray([300, 123, 77, 256], np.int32)
    x = np.zeros((B, CAP, C), np.float32)
    for i in range(B):
        x[i, :rows[i]] = rng.standard_normal((rows[i], C))

    # host path: f32 resample per sample, downcast afterwards
    host = np.zeros((B, R, C), np.float32)
    for i in range(B):
        h = linear_resample_time(jnp.asarray(x[i, :rows[i]][None]), R)
        host[i] = np.asarray(h)[0]
    host_bf16 = np.asarray(jnp.asarray(host, jnp.bfloat16), np.float32)

    # device path: bf16 transfer, then the fused dynamic resample
    dev = linear_resample_dynamic(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(rows), R,
        use_matmul=use_matmul)
    dev = np.asarray(dev, np.float32)

    # bf16 mantissa is 8 bits -> relative 2^-8 per rounding; the lerp adds
    # one more rounding step, so allow ~2 ulp relative + small absolute slack
    np.testing.assert_allclose(dev, host_bf16, rtol=1.6e-2, atol=1.6e-2)
    # and the error must be rounding-sized, not structural: f32 device path
    # on the same windows stays bit-close to the host
    dev_f32 = np.asarray(linear_resample_dynamic(
        jnp.asarray(x), jnp.asarray(rows), R, use_matmul=use_matmul))
    np.testing.assert_allclose(dev_f32, host, rtol=1e-6, atol=1e-6)
