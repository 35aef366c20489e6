"""Convert reference PyTorch checkpoints into our flax parameter trees.

Handles the reference's ``epoch_NNN.pth.tar`` layout ({state_dict,
state_dict_ema, ...}, train_utils.py:43-56), including DataParallel
``module.`` prefixes. Layout transforms:

- Conv1d weight (out, in/g, k)            -> flax (k, in/g, out)
- ConvTranspose1d weight (in, out, k)     -> flax (k, in, out)
- 1x1 Conv / Linear weight (out, in[,1])  -> dense kernel (in, out)
- channel-LN affine (1, C, 1)             -> (C,)
- rel_pe (1, 1, H, W) / time_weighting (1, H, W) -> (H, W)

Unused reference parameters (the no-recon model's dead Expansion decoder, the
THE head's unused bn1/dp1) are skipped.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

try:  # torch only needed when actually reading .pth files
    import torch
except ImportError:  # pragma: no cover
    torch = None

from flax import traverse_util


def _strip_module(state_dict: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        out[key] = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach")
                              else value)
    return out


def _conv_w(w):        # (out, in/g, k) -> (k, in/g, out)
    return np.transpose(w, (2, 1, 0))


def _convT_w(w):       # (in, out, k) -> (k, in, out)
    return np.transpose(w, (2, 0, 1))


def _dense_w(w):       # (out, in) or (out, in, 1) -> (in, out)
    if w.ndim == 3:
        w = w[:, :, 0]
    return np.transpose(w)


def _ln(w):            # (1, C, 1) -> (C,)
    return np.reshape(w, (-1,))


def _ref_name(path: Tuple[str, ...]) -> Optional[Tuple[str, str]]:
    """Map our flax param path (without the leading 'params') to
    (reference param name, transform kind). Returns None to skip."""
    p = list(path)
    leaf = p[-1]

    def block_inner(ref_prefix: str, rest):
        """Map TransformerBlock internals."""
        name = rest[0]
        if name in ("ln1", "ln2", "lnq", "lnk", "lnv"):
            return f"{ref_prefix}.{name}.{rest[1]}", "ln"
        if name in ("drop_path_attn", "drop_path_mlp"):
            return f"{ref_prefix}.{name}.scale", "ln"
        if name == "mlp_fc1":
            return f"{ref_prefix}.mlp.0.{'weight' if leaf == 'kernel' else 'bias'}", \
                "dense_w" if leaf == "kernel" else "direct"
        if name == "mlp_fc2":
            return f"{ref_prefix}.mlp.3.{'weight' if leaf == 'kernel' else 'bias'}", \
                "dense_w" if leaf == "kernel" else "direct"
        if name == "attn":
            sub = rest[1]
            if sub in ("query_conv", "key_conv", "value_conv"):
                return f"{ref_prefix}.attn.{sub}.conv.weight", "conv_w"
            if sub in ("query_norm", "key_norm", "value_norm"):
                return f"{ref_prefix}.attn.{sub}.{rest[2]}", "ln"
            if sub in ("query", "key", "value", "proj"):
                return f"{ref_prefix}.attn.{sub}.{'weight' if leaf == 'kernel' else 'bias'}", \
                    "dense_w" if leaf == "kernel" else "direct"
            if sub == "rel_pe":
                return f"{ref_prefix}.attn.rel_pe", "squeeze2"
            if sub == "time_weighting":
                return f"{ref_prefix}.attn.time_weighting", "squeeze1"
        raise KeyError(f"unmapped block param {path}")

    top = p[0]
    if top == "interpolator":
        name = p[1]
        if re.fullmatch(r"down_\d", name):
            return (f"interpolator.contraction.{name}.conv_block.conv."
                    f"{'weight' if leaf == 'kernel' else 'bias'}",
                    "conv_w" if leaf == "kernel" else "direct")
        if re.fullmatch(r"up_\d", name):
            return (f"interpolator.expansion.{name}.conv_transpose.conv."
                    f"{'weight' if leaf == 'kernel' else 'bias'}",
                    "convT_w" if leaf == "kernel" else "direct")
        if name == "cls_conv0" or name == "seg_conv0":
            return "interpolator.conv0.0.weight", "dense_w"
        if name == "cls_fc1":
            return "interpolator.conv1.weight", "dense_w"
        if name == "cls_ln":
            return f"interpolator.bn1.{leaf}", "ln"
        if name == "cls_fc2":
            return (f"interpolator.conv2.{'weight' if leaf == 'kernel' else 'bias'}",
                    "dense_w" if leaf == "kernel" else "direct")
        if name == "seg_linear":
            return (f"interpolator.seg_linear.{'weight' if leaf == 'kernel' else 'bias'}",
                    "dense_w" if leaf == "kernel" else "direct")
        if name == "cls_linear1":
            return (f"interpolator.cls_linear1.{'weight' if leaf == 'kernel' else 'bias'}",
                    "dense_w" if leaf == "kernel" else "direct")
        raise KeyError(f"unmapped interpolator param {path}")

    if top == "backbone":
        name = p[1]
        if name == "embed":
            sub = p[2]
            m = re.fullmatch(r"embd_(\d+)", sub)
            if m:
                return (f"backbone.embd.{m.group(1)}.conv."
                        f"{'weight' if leaf == 'kernel' else 'bias'}",
                        "conv_w" if leaf == "kernel" else "direct")
            m = re.fullmatch(r"embd_norm_(\d+)", sub)
            if m:
                return f"backbone.embd_norm.{m.group(1)}.{leaf}", "ln"
            m = re.fullmatch(r"proj_(\d+)", sub)
            if m:
                return (f"backbone.proj.{m.group(1)}.conv."
                        f"{'weight' if leaf == 'kernel' else 'bias'}",
                        "conv_w" if leaf == "kernel" else "direct")
        if name == "res_self_attn":
            return block_inner("backbone.resselfattention", p[2:])
        m = re.fullmatch(r"(stem|branch|lh_branch|hh_branch)_(\d+)", name)
        if m:
            # pure-conv backbone blocks (ConvBlock, blocks.py:1320-1370)
            if len(p) > 2 and p[2] in ("conv1", "conv2", "downsample"):
                return (f"backbone.{m.group(1)}.{m.group(2)}.{p[2]}.conv."
                        f"{'weight' if leaf == 'kernel' else 'bias'}",
                        "conv_w" if leaf == "kernel" else "direct")
            return block_inner(f"backbone.{m.group(1)}.{m.group(2)}", p[2:])
        raise KeyError(f"unmapped backbone param {path}")

    if top == "neck":
        m = re.fullmatch(r"lateral_(\d+)", p[1])
        if m:
            return (f"neck.lateral_convs.{m.group(1)}.conv."
                    f"{'weight' if leaf == 'kernel' else 'bias'}",
                    "conv_w" if leaf == "kernel" else "direct")
        m = re.fullmatch(r"fpn_conv_(\d+)", p[1])
        if m:
            return (f"neck.fpn_convs.{m.group(1)}.conv."
                    f"{'weight' if leaf == 'kernel' else 'bias'}",
                    "conv_w" if leaf == "kernel" else "direct")
        m = re.fullmatch(r"fpn_norm_(\d+)", p[1])
        if m:
            return f"neck.fpn_norms.{m.group(1)}.{leaf}", "ln"

    if top in ("cls_head", "reg_head"):
        m = re.fullmatch(r"head_(\d+)", p[1])
        if m:
            return (f"{top}.head.{m.group(1)}.conv."
                    f"{'weight' if leaf == 'kernel' else 'bias'}",
                    "conv_w" if leaf == "kernel" else "direct")
        m = re.fullmatch(r"norm_(\d+)", p[1])
        if m:
            return f"{top}.norm.{m.group(1)}.{leaf}", "ln"
        if p[1] == "cls_head":
            return (f"cls_head.cls_head.conv.{'weight' if leaf == 'kernel' else 'bias'}",
                    "conv_w" if leaf == "kernel" else "direct")
        if p[1] == "offset_head":
            return (f"reg_head.offset_head.conv.{'weight' if leaf == 'kernel' else 'bias'}",
                    "conv_w" if leaf == "kernel" else "direct")
        m = re.fullmatch(r"scale_(\d+)", p[1])
        if m:
            return f"reg_head.scale.{m.group(1)}.scale", "scalar"

    raise KeyError(f"unmapped param {path}")


_TRANSFORMS = {
    "conv_w": _conv_w,
    "convT_w": _convT_w,
    "dense_w": _dense_w,
    "ln": _ln,
    "direct": lambda w: w,
    "scalar": lambda w: np.asarray(w).reshape(()),
    "squeeze2": lambda w: np.reshape(w, w.shape[-2:]),
    "squeeze1": lambda w: np.reshape(w, w.shape[-2:]),
}


def convert_state_dict(state_dict: Dict, params_template) -> Dict:
    """Fill our flax template from a reference torch state dict."""
    sd = _strip_module(state_dict)
    flat = traverse_util.flatten_dict(params_template)
    out = {}
    for path, value in flat.items():
        # drop the 'params' collection head if present
        core = path[1:] if path[0] == "params" else path
        ref_name, kind = _ref_name(tuple(core))
        if ref_name not in sd and ref_name.startswith("interpolator."):
            # the THE meta-arch names its recovery module 'segmentandCls'
            # (av_fd_no_recon2.py:318)
            ref_name = ref_name.replace("interpolator.", "segmentandCls.", 1)
        if ref_name not in sd:
            raise KeyError(f"{ref_name} (for {path}) missing from checkpoint")
        w = _TRANSFORMS[kind](sd[ref_name])
        assert w.shape == tuple(value.shape), \
            f"{path}: shape {w.shape} vs template {value.shape} (ref {ref_name})"
        out[path] = w.astype(np.asarray(value).dtype)
    return traverse_util.unflatten_dict(out)


def load_reference_checkpoint(path: str, params_template, use_ema: bool = True):
    """Read an epoch_NNN.pth.tar checkpoint and convert (EMA) weights."""
    assert torch is not None, "torch required to read reference checkpoints"
    blob = torch.load(path, map_location="cpu")
    key = "state_dict_ema" if use_ema and "state_dict_ema" in blob else "state_dict"
    return convert_state_dict(blob[key], params_template)
