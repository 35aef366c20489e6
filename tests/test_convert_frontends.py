"""Real-checkpoint-layout loaders (tools/convert_frontends.py).

The released frontend weights are absent in this image, so these tests build
synthetic state dicts in the documented on-disk layouts — pytorch-lightning
AlignVideo (``{"state_dict": {"video_encoder...."}, "hyper_parameters"}``,
extract_video_features.py:122-124), fairseq emotion2vec
(``{"model": sd, "cfg": {"model": ...}}``,
emotion_audio/scripts/extract_audio_feature_batch.py:71-76) and the BYOL-A
``.pth`` with its key-regex normalization (content_audio/byol_a/models.py:20-35)
— and check the loaders unwrap them to the exact params the plain converters
produce (whose numerics are covered by the golden tests).
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax

from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
    Emotion2VecConfig)
from audio_visual_deepfake_detection_tpu.tools.convert_frontends import (
    emotion2vec_config_from_fairseq, load_alignvideo_checkpoint,
    load_byola_checkpoint, load_emotion2vec_checkpoint, strip_wrapper_prefixes,
    unwrap_lightning)


def _leaves_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb) > 0
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------- wrappers

def test_strip_wrapper_prefixes():
    sd = {"module.model.a.w": 1, "module.model.b.w": 2}
    assert strip_wrapper_prefixes(sd) == {"a.w": 1, "b.w": 2}
    # mixed trees are left alone
    mixed = {"module.a": 1, "b": 2}
    assert strip_wrapper_prefixes(mixed) == mixed
    # a real parameter family named model.* must not loop forever / over-strip
    assert strip_wrapper_prefixes({"model.w": 1}) == {"w": 1}


def test_unwrap_lightning_state_dict_and_ema():
    ckpt = {
        "state_dict": {"module.video_encoder.w": 0.0},
        "state_dict_ema": {"module.video_encoder.w": 1.0},
        "hyper_parameters": {"v_encoder": "c3d"},
    }
    sd, hp = unwrap_lightning(ckpt)
    assert sd == {"video_encoder.w": 0.0} and hp == {"v_encoder": "c3d"}
    sd_ema, _ = unwrap_lightning(ckpt, use_ema=True)
    assert sd_ema == {"video_encoder.w": 1.0}
    # a bare state dict passes through
    sd, hp = unwrap_lightning({"video_encoder.w": 2.0})
    assert sd == {"video_encoder.w": 2.0} and hp is None


# ---------------------------------------------------------------- AlignVideo

def _c3d_state_dict(rng, nf=(4, 6, 8, 8), out_dim=16):
    """Reference C3D layout (video_encoder.py:12-62 with the tensorneko
    Conv3d wrapper: a ``conv`` child under each Sequential index)."""
    sd = {}

    def conv3d(name, i, o):
        sd[f"{name}.conv.weight"] = rng.standard_normal(
            (o, i, 3, 3, 3)).astype(np.float32) * 0.05
        sd[f"{name}.conv.bias"] = rng.standard_normal(o).astype(np.float32)

    d0, d1, d2, d3 = nf
    conv3d("block0.0", 3, d0)
    conv3d("block0.1", d0, d0)
    conv3d("block1.0", d0, d1)
    conv3d("block1.1", d1, d1)
    conv3d("block2.0", d1, d2)
    conv3d("block2.1", d2, d2)
    conv3d("block3.0", d2, d3)
    conv3d("block3.2", d3, d3)
    sd["block3.5.conv.weight"] = rng.standard_normal(
        (out_dim, d3 * 4, 1)).astype(np.float32) * 0.05
    sd["block3.5.conv.bias"] = rng.standard_normal(out_dim).astype(np.float32)
    return sd


def test_load_alignvideo_c3d(rng):
    enc_sd = _c3d_state_dict(rng)
    ckpt = {
        "state_dict": {
            # DataParallel wrapper + non-video submodules the loader must skip
            **{f"module.video_encoder.{k}": v for k, v in enc_sd.items()},
            "module.audio_encoder.block0.conv.weight":
                np.zeros((4, 1, 3), np.float32),
            "module.frame_classifier.fc.weight": np.zeros((1, 16), np.float32),
        },
        "hyper_parameters": {"v_encoder": "c3d", "ve_features": [4, 6, 8, 8],
                             "v_cla_feature_in": 16, "temporal_dim": 512},
    }
    model, params = load_alignvideo_checkpoint(ckpt)

    from audio_visual_deepfake_detection_tpu.frontends.video import (
        C3DVideoEncoder, convert_c3d_torch)

    direct_model = C3DVideoEncoder(n_features=(4, 6, 8, 8), out_dim=16)
    template = jax.eval_shape(
        direct_model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 2, 96, 96, 3), np.float32))
    _leaves_equal(params, convert_c3d_torch(enc_sd, template))

    out = model.apply(params, np.zeros((1, 2, 96, 96, 3), np.float32))
    assert np.asarray(out).shape == (1, 2, 16)


def test_load_alignvideo_c3d_ema_twin(rng):
    enc_sd = _c3d_state_dict(rng)
    ema_sd = {k: v + 1.0 for k, v in enc_sd.items()}
    hp = {"v_encoder": "c3d", "ve_features": [4, 6, 8, 8],
          "v_cla_feature_in": 16}
    ckpt = {
        "state_dict": {f"video_encoder.{k}": v for k, v in enc_sd.items()},
        "state_dict_ema": {f"video_encoder.{k}": v for k, v in ema_sd.items()},
        "hyper_parameters": hp,
    }
    _, p = load_alignvideo_checkpoint(ckpt)
    _, p_ema = load_alignvideo_checkpoint(ckpt, use_ema=True)
    a = jax.tree_util.tree_leaves(p)[0]
    b = jax.tree_util.tree_leaves(p_ema)[0]
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_load_alignvideo_rejects_foreign_checkpoint():
    with pytest.raises(KeyError):
        load_alignvideo_checkpoint(
            {"state_dict": {"encoder.w": np.zeros(1, np.float32)}})


@pytest.mark.slow
def test_load_alignvideo_mvit_matches_direct_converter():
    """MViT branch against the torchvision-layout mirror: the loader must
    (a) pick mvit_v2_t from hparams-absent depth counting, (b) honor the
    hparams temporal_dim, and (c) produce exactly convert_mvit_torch's tree."""
    from test_mvit_golden import TorchMViT, _randomize

    from audio_visual_deepfake_detection_tpu.frontends.mvit import (
        convert_mvit_torch, generate_config, mvit_v2_t)

    temporal = 16
    block_setting = generate_config([1, 2, 5, 2], [1, 2, 4, 8],
                                    [96, 192, 384, 768], 32)
    mirror = TorchMViT(block_setting, input_thw=(temporal, 8, 8)).eval()
    _randomize(mirror)
    enc_sd = {f"mvit.{k}": v.detach().numpy()
              for k, v in mirror.state_dict().items()}

    # v_encoder deliberately missing: the loader counts 10 blocks -> mvit_v2_t
    ckpt = {
        "state_dict": {f"model.video_encoder.{k}": v
                       for k, v in enc_sd.items()},
        "hyper_parameters": {"temporal_dim": temporal, "v_cla_feature_in": 32},
    }
    model, params = load_alignvideo_checkpoint(ckpt)

    ours = mvit_v2_t(out_dim=32, temporal_size=temporal)
    template = jax.eval_shape(
        ours.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, temporal, 96, 96, 3), np.float32))
    _leaves_equal(params, convert_mvit_torch(enc_sd, template, prefix="mvit."))


# ---------------------------------------------------------------- emotion2vec

def _fairseq_cfg(cfg: Emotion2VecConfig) -> dict:
    """Emotion2VecConfig -> the checkpoint's cfg node shape
    (upstream/models/config.py:26-40 + base.py / audio.py fields)."""
    return {"model": {
        "embed_dim": cfg.embed_dim, "depth": cfg.depth,
        "num_heads": cfg.num_heads, "mlp_ratio": cfg.mlp_ratio,
        "norm_eps": cfg.norm_eps,
        "modalities": {"audio": {
            "prenet_depth": cfg.prenet_depth,
            "num_extra_tokens": cfg.num_extra_tokens,
            "use_alibi_encoder": cfg.use_alibi,
            "conv_pos_depth": cfg.conv_pos_depth,
            "conv_pos_width": cfg.conv_pos_width,
            "conv_pos_groups": cfg.conv_pos_groups,
        }},
    }}


def test_emotion2vec_config_from_fairseq_roundtrip():
    cfg = Emotion2VecConfig(depth=3, prenet_depth=2, num_extra_tokens=10,
                            use_alibi=True)
    got = emotion2vec_config_from_fairseq(_fairseq_cfg(cfg))
    assert got == cfg
    # missing fields fall back to defaults; cfg.model accepted directly
    assert emotion2vec_config_from_fairseq({"model": {}}) == Emotion2VecConfig()
    assert emotion2vec_config_from_fairseq(None) == Emotion2VecConfig()


@pytest.mark.slow
def test_load_emotion2vec_fairseq_layout(rng):
    from test_emotion2vec_full import TorchEmotion2Vec

    from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
        Emotion2Vec, convert_emotion2vec_torch)

    cfg = Emotion2VecConfig(depth=2, prenet_depth=1)
    torch.manual_seed(0)
    mirror = TorchEmotion2Vec(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}

    # released-checkpoint extras extract_features never touches
    polluted = dict(sd)
    polluted["_ema.blocks.0.attn.qkv.weight"] = np.zeros((1,), np.float32)
    polluted["decoder.proj.weight"] = np.zeros((1,), np.float32)
    polluted["modality_encoders.AUDIO.decoder.blocks.0.weight"] = \
        np.zeros((1,), np.float32)

    model, params = load_emotion2vec_checkpoint(
        {"model": polluted, "cfg": _fairseq_cfg(cfg)})
    assert model.cfg == cfg

    direct = Emotion2Vec(cfg)
    template = jax.eval_shape(
        direct.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 1600), np.float32))
    _leaves_equal(params, convert_emotion2vec_torch(sd, template, cfg=cfg))


# ---------------------------------------------------------------- BYOL-A

def test_load_byola_real_layout(rng):
    """Key filtering parity with models.py:20-35: nested ``state_dict``,
    re-rooting at the first ``features./fc.`` match, dropping everything
    else (EMA heads, projectors, num_batches_tracked)."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "ref_byola_models",
        "/root/reference/audio_feature/content_audio/byol_a/models.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_byola_models"] = mod
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    ref = mod.AudioNTT2020Task6(n_mels=64, d=128).eval()
    base_sd = ref.state_dict()

    # BYOL training wrapper layout: encoder under a prefix + heads to drop
    wrapped = {f"online_encoder.net.{k}": v for k, v in base_sd.items()}
    wrapped["online_projector.0.weight"] = torch.zeros(1)
    wrapped["target_encoder.momentum"] = torch.zeros(1)

    model, params = load_byola_checkpoint({"state_dict": wrapped},
                                          n_mels=64, d=128)

    from audio_visual_deepfake_detection_tpu.frontends.byola import (
        AudioNTT2020, convert_byola_torch)

    direct = AudioNTT2020(n_mels=64, d=128)
    template = jax.eval_shape(
        direct.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 96, 64), np.float32))
    _leaves_equal(params, convert_byola_torch(
        {k: v.numpy() for k, v in base_sd.items()}, template))

    out = model.apply(params, np.zeros((1, 96, 64), np.float32), train=False)
    assert np.asarray(out).shape[-1] == 128
