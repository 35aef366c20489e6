"""Sharded batched inference over a device mesh.

The reference scales test inference by manual file shards merged in a
notebook (inference.py + configs_test/test_folder/deepfake_test_sub{1..7}.txt,
SURVEY §2.3). The TPU-native replacement is ONE jit inference program with
the batch sharded over the mesh's data axis; this test checks the sharded
run is bit-identical to the single-device run on a virtual 8-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.infer.decode import TestConfig
from audio_visual_deepfake_detection_tpu.infer.runner import build_inference_fn
from audio_visual_deepfake_detection_tpu.models import ArchConfig
from audio_visual_deepfake_detection_tpu.parallel import (
    make_mesh, replicate_tree, shard_batch)
from audio_visual_deepfake_detection_tpu.train.state import init_model


def _tiny_cfg():
    return ArchConfig(
        variant="av_recovery_norecon", input_dim=24, num_classes=1,
        max_seq_len=96, embd_dim=32, fpn_dim=32, head_dim=32, n_head=2,
        arch=(1, 1, 2), mha_win_size=(5, 5, -1),
        regression_range=((0, 4), (4, 8), (8, 10000)),
    )


def test_sharded_inference_matches_single_device(rng):
    cfg = _tiny_cfg()
    test_cfg = TestConfig(
        pre_nms_thresh=0.001, pre_nms_topk=50, iou_threshold=0.1,
        min_score=0.01, max_seg_num=10, nms_method="soft", nms_sigma=0.75,
        duration_thresh=0.001, multiclass_nms=False, voting_thresh=0.9)

    B = 8
    params, _ = init_model(cfg, B, seed=0)
    infer_fn = build_inference_fn(cfg, test_cfg)

    feats = rng.standard_normal((B, cfg.max_seq_len, cfg.input_dim)).astype(np.float32)
    mask = np.ones((B, cfg.max_seq_len), bool)
    fps = np.full((B,), 25.0, np.float32)
    dur = np.full((B,), 4.0, np.float32)
    stride = np.full((B,), 1.0, np.float32)
    nframes = np.full((B,), 1.0, np.float32)

    # single device
    ref = infer_fn(params, jnp.asarray(feats), jnp.asarray(mask),
                   jnp.asarray(fps), jnp.asarray(dur), jnp.asarray(stride),
                   jnp.asarray(nframes))
    ref = [np.asarray(x) for x in ref]

    # 8-device data-parallel mesh: params replicated, batch sharded
    mesh = make_mesh(devices=jax.devices("cpu"))
    assert mesh.devices.size == 8
    params_r = replicate_tree(mesh, params)
    batch = shard_batch(mesh, {
        "feats": feats, "mask": mask, "fps": fps, "dur": dur,
        "stride": stride, "nframes": nframes})
    got = infer_fn(params_r, batch["feats"], batch["mask"], batch["fps"],
                   batch["dur"], batch["stride"], batch["nframes"])
    got = [np.asarray(x) for x in got]

    for g, r, name in zip(got, ref, ("segs", "scores", "cls", "valid", "video_cls")):
        np.testing.assert_allclose(g, r, atol=1e-5, err_msg=name)
    # the sharded run actually used all 8 devices
    sharded_out = infer_fn(params_r, batch["feats"], batch["mask"],
                           batch["fps"], batch["dur"], batch["stride"],
                           batch["nframes"])
    assert len(batch["feats"].sharding.device_set) == 8
