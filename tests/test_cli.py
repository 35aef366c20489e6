"""CLI entry-point smoke tests: train.py / inference.py / generate_results.py
run end to end on a tiny synthetic dataset (subprocess, CPU)."""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY_META = "/root/reference/tinydataset/metadata"

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",  # ignored by axon, but harmless
    "AVDD_USE_PALLAS": "0",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    "AVDD_FORCE_CPU": "1",
}


def _tiny_rel_jsons():
    out = []
    for path in sorted(glob.glob(os.path.join(TINY_META, "*", "*", "*", "*.json"))):
        out.append(os.path.relpath(path, TINY_META))
    return out


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    rels = _tiny_rel_jsons()
    import sys as _s
    _s.path.insert(0, os.path.join(REPO, "tests"))
    from audio_visual_deepfake_detection_tpu.data import metadata as md

    shard_lines = []
    for rel in rels:
        meta = md.load_video_meta(TINY_META, rel)
        rel_npy = rel.replace(".json", ".npy")
        for sub, rows, dim in [
            ("video", max(int(round(meta.fps * meta.duration)), 8), 8),
            ("byola", int(np.ceil(12.5 * meta.duration)) + 2, 12),
            ("emotion", int(np.ceil(50 * meta.duration)) + 2, 4),
        ]:
            path = root / sub / rel_npy
            path.parent.mkdir(parents=True, exist_ok=True)
            np.save(path, rng.standard_normal((rows, dim)).astype(np.float32))
        shard_lines.append(f"{rel.replace('.json', '.mp4')},{meta.duration}")
    (root / "train.txt").write_text("\n".join(rels))
    shard_dir = root / "test_folder"
    shard_dir.mkdir()
    (shard_dir / "deepfake_test_sub1.txt").write_text("\n".join(shard_lines[:6]))

    cfg = {
        "dataset_name": "deepfake_video_audioEmoBYOLA",
        "train_split": ["train"], "val_split": ["train"], "test_split": ["test"],
        "dataset": {
            "video_feat_folder": str(root / "video"),
            "audio_byola_feat_folder": str(root / "byola"),
            "audio_emo_feat_folder": str(root / "emotion"),
            "train_txt": str(root / "train.txt"),
            "json_folder": TINY_META,
            "test_folder": str(shard_dir),
            "feat_stride": 1, "num_frames": 1, "downsample_rate": 0,
            "max_seq_len": 96, "trunc_thresh": 0.5, "crop_ratio": [0.9, 1.0],
            "video_input_dim": 8, "audio_input_dim": 16, "num_classes": 1,
            "force_upsampling": True,
        },
        "model_name": "AVLocPointTransformerRecoveryNoNormNorecon",
        "model": {
            "backbone_type": "convHRLRFullResSelfAttTransformerRevised",
            "fpn_type": "fpn", "backbone_arch": [1, 1, 2],
            "n_mha_win_size": [5, 5, -1],
            "regression_range": [[0, 4], [4, 8], [8, 10000]],
            "n_head": 2, "embd_dim": 16, "fpn_dim": 16, "head_dim": 16,
            "max_buffer_len_factor": 1.0, "use_abs_pe": True,
        },
        "opt": {"learning_rate": 0.001, "epochs": 1, "warmup_epochs": 0,
                "warmup": False, "weight_decay": 0.05},
        "loader": {"batch_size": 4, "num_workers": 2},
        "train_cfg": {"init_loss_norm": 200, "clip_grad_l2norm": 1.0,
                      "label_smoothing": 0.1, "droppath": 0.1, "loss_weight": 2.0},
        "test_cfg": {"voting_thresh": 0.9, "pre_nms_topk": 2000,
                     "max_seg_num": 20, "min_score": 0.001,
                     "multiclass_nms": False, "nms_sigma": 0.75,
                     "duration_thresh": 0.001},
        "output_folder": str(root / "runs"),
        "tpu": {"dp_size": 1},
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root, cfg_path


def _run(args, timeout=480):
    proc = subprocess.run([sys.executable] + args, cwd=REPO, env=ENV,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return proc


@pytest.fixture(scope="module")
def trained(workspace):
    """Train once; downstream CLI tests reuse the checkpoint."""
    root, cfg_path = workspace
    _run(["train.py", str(cfg_path), "--output", "smoke",
          "--ckpt-iter-freq", "0", "-p", "2"])
    runs = glob.glob(str(root / "runs" / "smoke_*"))
    assert runs, "no run folder created"
    return runs[0]


def test_train_and_infer_cli(workspace, trained):
    root, cfg_path = workspace
    run_dir = trained
    ckpts = glob.glob(os.path.join(run_dir, "epoch_*"))
    assert ckpts, "no checkpoint written"
    assert os.path.exists(os.path.join(run_dir, "config.txt"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))

    # inference over shard 1 with the trained checkpoint
    _run(["inference.py", str(cfg_path), "1", "--ckpt", run_dir,
          "--batch-size", "4", "--flush-every", "4"])
    out_dir = str(root / "runs" / "1")
    assert glob.glob(os.path.join(out_dir, "data*.json"))

    # merge shards into submission files
    _run(["generate_results.py", str(root / "runs"), "--num-shards", "1"])
    pred_json = json.load(open(root / "runs" / "prediction.json"))
    assert len(pred_json) == 6
    txt = (root / "runs" / "prediction.txt").read_text().splitlines()
    assert len(txt) == 6

    # device-resample (online) inference must produce the same detections
    host_items = {it["video_id"]: it for path in
                  glob.glob(os.path.join(out_dir, "data*.json"))
                  for it in json.load(open(path))}
    for path in glob.glob(os.path.join(out_dir, "data*.json")):
        os.remove(path)
    _run(["inference.py", str(cfg_path), "1", "--ckpt", run_dir,
          "--batch-size", "4", "--flush-every", "4", "--device-resample",
          "--stream-caps", "400,200,800"])
    online_items = {it["video_id"]: it for path in
                    glob.glob(os.path.join(out_dir, "data*.json"))
                    for it in json.load(open(path))}
    assert set(online_items) == set(host_items)
    for vid, host in host_items.items():
        online = online_items[vid]
        np.testing.assert_allclose(online["video_cls"], host["video_cls"],
                                   atol=1e-4)
        np.testing.assert_allclose(online["scores"], host["scores"], atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(online["segments"], np.float64).reshape(-1, 2),
            np.asarray(host["segments"], np.float64).reshape(-1, 2), atol=1e-3)


def test_validate_cli(workspace, trained):
    """validate.py: dev-split mAP, --saveonly pickle branch, and the topk
    external-cls fusion branch (train_utils.py:403-508 semantics)."""
    import pickle

    root, cfg_path = workspace

    # normal evaluation branch
    out_json = str(root / "val_proposals.json")
    proc = _run(["validate.py", str(cfg_path), "--ckpt", trained,
                 "--batch-size", "4", "--output", out_json])
    assert "challenge mAP:" in proc.stdout
    assert os.path.exists(out_json)

    # --saveonly: raw pickle, no evaluation
    out_pkl = str(root / "val_results.pkl")
    proc = _run(["validate.py", str(cfg_path), "--ckpt", trained,
                 "--batch-size", "4", "--saveonly", "--output", out_pkl])
    assert "saveonly" in proc.stdout
    with open(out_pkl, "rb") as f:
        saved = pickle.load(f)
    assert set(saved) == {"video-id", "t-start", "t-end", "label", "score"}

    # topk external-cls fusion: write a cls-score file + fusion config
    import yaml as _yaml

    vids = sorted(set(saved["video-id"]))
    cls_file = root / "cls_scores.json"
    cls_file.write_text(json.dumps({v: [0.8, 0.3] for v in vids}))
    cfg = _yaml.safe_load(open(cfg_path))
    cfg["test_cfg"]["ext_score_file"] = str(cls_file)
    fusion_cfg = root / "config_fusion.yaml"
    fusion_cfg.write_text(_yaml.safe_dump(cfg))
    proc = _run(["validate.py", str(fusion_cfg), "--ckpt", trained,
                 "--batch-size", "4", "--fusion", "topk"])
    assert "topk-fused" in proc.stdout


def test_train_cli_device_resample(workspace):
    """train.py --device-resample: ragged-stream infeed + on-device
    resample/crop trains end to end."""
    root, cfg_path = workspace
    _run(["train.py", str(cfg_path), "--output", "smoke_dev",
          "--ckpt-iter-freq", "0", "-p", "2", "--device-resample",
          "--stream-caps", "400,150,600"])
    runs = glob.glob(str(root / "runs" / "smoke_dev_*"))
    assert runs, "no run folder created"
    metrics = os.path.join(runs[0], "metrics.jsonl")
    assert os.path.exists(metrics)
    lines = open(metrics).read().strip().splitlines()
    assert lines, "no metrics logged"
    last = json.loads(lines[-1])
    assert np.isfinite(last.get("train/final_loss", np.nan))


def test_inference_resume(workspace, trained):
    """inference.py --resume: videos already present in the shard's data*.json
    flushes are skipped (their fabricated entries survive untouched), the
    stale unnumbered final flush is renumbered instead of overwritten, and a
    second --resume run is a no-op."""
    import yaml as _yaml

    root, cfg_path = workspace
    cfg = _yaml.safe_load(open(cfg_path))
    cfg["output_folder"] = str(root / "runs_resume")
    cfg2 = root / "config_resume.yaml"
    cfg2.write_text(_yaml.safe_dump(cfg))

    shard_ids = [line.split(",")[0] for line in
                 (root / "test_folder" / "deepfake_test_sub1.txt")
                 .read_text().splitlines()]
    out_dir = root / "runs_resume" / "1"
    out_dir.mkdir(parents=True)
    sentinel = {
        vid: {"video_id": vid, "video_cls": [0.5], "scores": [0.123],
              "segments": [[1.0, 2.0]]} for vid in shard_ids[:3]
    }
    # a numbered flush (run died after it) + an unnumbered final flush (from
    # an older completed attempt) — both must count as done
    (out_dir / "data_left2.json").write_text(
        json.dumps([sentinel[v] for v in shard_ids[:2]]))
    (out_dir / "data_left.json").write_text(
        json.dumps([sentinel[shard_ids[2]]]))

    proc = _run(["inference.py", str(cfg2), "1", "--ckpt", trained,
                 "--batch-size", "4", "--flush-every", "4", "--resume"])
    assert f"Resume: 3/{len(shard_ids)} of this host's videos already " \
           f"flushed" in proc.stdout

    files = {os.path.basename(p) for p in glob.glob(str(out_dir / "data*.json"))}
    assert "data_left_part0.json" in files  # renumbered, not overwritten
    items = {it["video_id"]: it for p in glob.glob(str(out_dir / "data*.json"))
             for it in json.load(open(p))}
    assert set(items) == set(shard_ids)  # no video lost, none duplicated
    n_items = sum(len(json.load(open(p)))
                  for p in glob.glob(str(out_dir / "data*.json")))
    assert n_items == len(shard_ids)
    for vid, fab in sentinel.items():
        assert items[vid] == fab  # pre-done entries untouched

    # resumed-from-nothing-left: a second --resume run changes no results
    proc = _run(["inference.py", str(cfg2), "1", "--ckpt", trained,
                 "--batch-size", "4", "--flush-every", "4", "--resume"])
    assert f"Resume: {len(shard_ids)}/{len(shard_ids)}" in proc.stdout
    items2 = {it["video_id"]: it for p in glob.glob(str(out_dir / "data*.json"))
              for it in json.load(open(p))}
    assert items2 == items

    # the merged submission covers the full shard
    _run(["generate_results.py", str(root / "runs_resume"), "--num-shards", "1"])
    pred = json.load(open(root / "runs_resume" / "prediction.json"))
    assert len(pred) == len(shard_ids)


def test_debug_nans_knob():
    """AVDD_DEBUG_NANS=1 turns a NaN produced under jit into an exception at
    the producing op (subprocess: jax config flags are process-global)."""
    code = (
        "from audio_visual_deepfake_detection_tpu.core.runtime import setup_jax\n"
        "setup_jax()\n"
        "import jax, jax.numpy as jnp\n"
        "f = jax.jit(lambda x: jnp.log(x))\n"
        "try:\n"
        "    f(jnp.zeros(4) - 1.0).block_until_ready()\n"
        "    print('NO-RAISE')\n"
        "except FloatingPointError:\n"
        "    print('CAUGHT')\n"
    )
    env = {**ENV, "AVDD_DEBUG_NANS": "1"}
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=240)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "CAUGHT" in proc.stdout
