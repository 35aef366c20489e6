"""Test-only loader for reference torch modules used as numerical oracles.

Loads ``libs/modeling`` files from the read-only reference checkout WITHOUT
triggering the package __init__ (which would import the compiled NMS
extension). Tests use these as golden implementations; the framework itself
never imports torch or the reference.
"""

import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


def _load(name: str, path: str, package: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_blocks():
    """Import the reference blocks.py as a standalone module tree."""
    if "refmod.blocks" in sys.modules:
        return sys.modules["refmod.blocks"]
    pkg = types.ModuleType("refmod")
    pkg.__path__ = [f"{REF_ROOT}/libs/modeling"]
    sys.modules["refmod"] = pkg
    _load("refmod.weight_init", f"{REF_ROOT}/libs/modeling/weight_init.py", "refmod")
    return _load("refmod.blocks", f"{REF_ROOT}/libs/modeling/blocks.py", "refmod")


def load_reference_modeling():
    """Import the FULL reference libs.modeling package (meta-archs included),
    stubbing the dead torchsort import and the compiled NMS extension."""
    if "libs.modeling" in sys.modules:
        return sys.modules["libs.modeling"]
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    sys.modules.setdefault("torchsort", types.ModuleType("torchsort"))
    nms_stub = types.ModuleType("nms_1d_cpu")
    nms_stub.nms = lambda *a, **k: None
    nms_stub.softnms = lambda *a, **k: None
    sys.modules.setdefault("nms_1d_cpu", nms_stub)
    import importlib

    return importlib.import_module("libs.modeling")


def reference_model_kwargs(video_dim=16, audio_dim=48, embd=32, n_head=4,
                           max_seq_len=96, win=(7, 7, 7, 7, 7, -1)):
    """kwargs for the reference meta-arch constructors, small enough for CPU."""
    train_cfg = {
        "center_sample": "radius", "center_sample_radius": 1.5,
        "loss_weight": 2.0, "cls_prior_prob": 0.01, "init_loss_norm": 200,
        "clip_grad_l2norm": 1.0, "head_empty_cls": [], "dropout": 0.0,
        "droppath": 0.1, "label_smoothing": 0.1,
    }
    test_cfg = {
        "pre_nms_thresh": 0.001, "pre_nms_topk": 2000, "iou_threshold": 0.1,
        "min_score": 0.001, "max_seg_num": 100, "nms_method": "soft",
        "nms_sigma": 0.75, "duration_thresh": 0.001, "multiclass_nms": False,
        "ext_score_file": None, "voting_thresh": 0.9,
    }
    return {
        "backbone_type": "convHRLRFullResSelfAttTransformerRevised",
        "fpn_type": "fpn",
        "backbone_arch": (2, 2, 5),
        "scale_factor": 2,
        "video_input_dim": video_dim,
        "audio_input_dim": audio_dim,
        "max_seq_len": max_seq_len,
        "max_buffer_len_factor": 1.0,
        "n_head": n_head,
        "n_mha_win_size": list(win),
        "embd_kernel_size": 3,
        "embd_dim": embd,
        "embd_with_ln": True,
        "fpn_dim": embd,
        "fpn_with_ln": True,
        "fpn_start_level": 0,
        "head_dim": embd,
        "regression_range": [(0, 4), (4, 8), (8, 16), (16, 32), (32, 64), (64, 10000)],
        "head_num_layers": 3,
        "head_kernel_size": 3,
        "head_with_ln": True,
        "use_abs_pe": True,
        "use_rel_pe": False,
        "num_classes": 1,
        "train_cfg": train_cfg,
        "test_cfg": test_cfg,
    }
