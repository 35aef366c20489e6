"""Full-PRODUCTION-geometry converter dress rehearsal (VERDICT r3 item 4).

The released checkpoints are absent from this image, so the main loader
tests (tests/test_convert_frontends.py) rehearse at reduced geometry. These
tests run the conversion at the REAL geometry the shipped weights have:

- AlignVideo ``alignvideo_model.ckpt``: ``mvit_b`` — 24 blocks [2,3,16,3],
  temporal 512, out_dim 256 (video_feature/aligned_video/model/
  video_encoder.py:192 + extract_video_features.py:53-77),
- ``emotion2vec_base.pt``: depth 8 + prenet 4, 768-d, 12 heads
  (audio_feature/emotion_audio/upstream/models/config.py:26-40 — our
  ``Emotion2VecConfig`` defaults),
- BYOL-A ``AudioNTT2020-BYOLA-64x96d2048.pth``: n_mels 64, d 2048
  (content_audio/extract_audio_feature_batch.py:99-101).

Each synthesizes a state dict in the documented on-disk layout, runs it
through the public loader, checks the tree is parameter-exact against the
direct converter, the parameter COUNT matches the torch mirror, and a short
forward matches the mirror numerically — so the real weights become a
drop-in with no untested layout surprises.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import (
    Emotion2Vec, Emotion2VecConfig, conv_output_length,
    convert_emotion2vec_torch)
from audio_visual_deepfake_detection_tpu.frontends.mvit import (
    MViTVideoEncoder, convert_mvit_torch, generate_config)
from audio_visual_deepfake_detection_tpu.tools.convert_frontends import (
    load_alignvideo_checkpoint, load_byola_checkpoint,
    load_emotion2vec_checkpoint)


def _count(tree):
    return sum(int(np.prod(np.shape(x)))
               for x in jax.tree_util.tree_leaves(tree))


def _leaves_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb) > 0
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_alignvideo_mvit_b_production_geometry(rng):
    """mvit_v2_b at the shipped checkpoint's exact geometry through the
    Lightning loader: layout, param count, and forward numerics (a T=16 clip
    — both sides index the low corner of the 512-sized rel-pos tables, the
    same thing torchvision does below its configured temporal_size)."""
    from test_mvit_golden import TorchMViT, _randomize

    temporal, out_dim = 512, 256
    block_setting = generate_config([2, 3, 16, 3], [1, 2, 4, 8],
                                    [96, 192, 384, 768], out_dim)
    assert len(block_setting) == 24
    mirror = TorchMViT(block_setting, input_thw=(temporal, 8, 8)).eval()
    _randomize(mirror)
    enc_sd = {f"mvit.{k}": v.detach().numpy()
              for k, v in mirror.state_dict().items()}

    ckpt = {
        "state_dict": {f"model.video_encoder.{k}": v
                       for k, v in enc_sd.items()},
        "hyper_parameters": {"v_encoder": "mvit_v2_b",
                             "temporal_dim": temporal,
                             "v_cla_feature_in": out_dim},
    }
    model, params = load_alignvideo_checkpoint(ckpt)
    assert isinstance(model, MViTVideoEncoder)
    assert model.temporal_size == temporal
    assert len(model.block_setting) == 24

    # parameter-exact vs the direct converter, and count-exact vs torch
    ours = MViTVideoEncoder(tuple(block_setting), temporal_size=temporal)
    template = jax.eval_shape(
        ours.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, temporal, 96, 96, 3), np.float32))
    _leaves_equal(params, convert_mvit_torch(enc_sd, template,
                                             prefix="mvit."))
    n_torch = sum(p.numel() for p in mirror.parameters())
    assert _count(params) == n_torch

    # forward numerics at a short clip (full 24-block depth, full tables)
    t = 16
    video = rng.standard_normal((1, t, 96, 96, 3)).astype(np.float32) * 0.1
    got = np.asarray(model.apply(params, jnp.asarray(video)))
    with torch.no_grad():
        tokens, thw = mirror(torch.from_numpy(video).permute(0, 4, 1, 2, 3))
    want = tokens.reshape(1, *thw, tokens.shape[-1]).mean(dim=(2, 3)).numpy()
    assert got.shape == want.shape == (1, t, out_dim)
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.slow
def test_emotion2vec_production_geometry(rng):
    """emotion2vec_base at its real geometry (the ``Emotion2VecConfig``
    defaults: depth 8 + prenet 4, 768-d, 12 heads) through the fairseq-layout
    loader, with the released checkpoint's extras present, then forward
    numerics at a 1 s wav."""
    from test_convert_frontends import _fairseq_cfg
    from test_emotion2vec_full import TorchEmotion2Vec

    cfg = Emotion2VecConfig()
    assert (cfg.depth, cfg.prenet_depth, cfg.embed_dim, cfg.num_heads) == \
        (8, 4, 768, 12)
    torch.manual_seed(0)
    mirror = TorchEmotion2Vec(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}

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
        jax.ShapeDtypeStruct((1, 16000), np.float32))
    _leaves_equal(params, convert_emotion2vec_torch(sd, template, cfg=cfg))
    n_torch = sum(p.numel() for p in mirror.parameters())
    assert _count(params) == n_torch

    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    got = np.asarray(model.apply(params, jnp.asarray(wav)))
    with torch.no_grad():
        want = mirror(torch.from_numpy(wav)).numpy()
    assert got.shape == (2, conv_output_length(16000), cfg.embed_dim)
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.slow
def test_byola_production_geometry(rng):
    """BYOL-A at d=2048 (the shipped 64x96d2048 weights) through the .pth
    loader with the training-wrapper layout, vs the reference's own encoder
    module loaded from /root/reference."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "ref_byola_models_fullgeom",
        "/root/reference/audio_feature/content_audio/byol_a/models.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_byola_models_fullgeom"] = mod
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    ref = mod.AudioNTT2020Task6(n_mels=64, d=2048).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(64) * 0.1)
                m.running_var.copy_(torch.rand(64) + 0.5)
    base_sd = ref.state_dict()

    wrapped = {f"online_encoder.net.{k}": v for k, v in base_sd.items()}
    wrapped["online_projector.0.weight"] = torch.zeros(1)
    wrapped["target_encoder.momentum"] = torch.zeros(1)
    model, params = load_byola_checkpoint({"state_dict": wrapped},
                                          n_mels=64, d=2048)

    n_torch = sum(v.numel() for k, v in base_sd.items()
                  if "num_batches_tracked" not in k)
    # flax keeps BN running stats in the tree as well, as the torch
    # state_dict does (minus the int step counters filtered above)
    assert _count(params) == n_torch

    lms = rng.standard_normal((2, 96, 64)).astype(np.float32)
    got = np.asarray(model.apply(params, jnp.asarray(lms)))
    with torch.no_grad():
        want = ref(torch.from_numpy(lms).permute(0, 2, 1)[:, None]).numpy()
    assert got.shape == want.shape == (2, 12, 2048)
    np.testing.assert_allclose(got, want, atol=2e-4)
