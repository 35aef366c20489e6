"""Multi-host (DCN) wiring: the REAL train.py / inference.py CLIs driven as
two coordinated host processes on CPU (jaxlib Gloo collectives).

The reference has no distributed runtime at all (SURVEY §2.3); this validates
the jax.distributed path: per-host strided data loading, global-batch
assembly via make_array_from_process_local_data, process-0-only artifacts,
and the per-host inference subfolders that generate_results merges.
"""

import glob
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY_META = "/root/reference/tinydataset/metadata"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _host_env(pid, port, n_local_dev=2):
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update({
        # no axon plugin: these processes must be pure CPU
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_local_dev}",
        "AVDD_COORDINATOR": f"127.0.0.1:{port}",
        "AVDD_NUM_PROCESSES": "2",
        "AVDD_PROCESS_ID": str(pid),
        "AVDD_USE_PALLAS": "0",
        "AVDD_FUSED_BLOCK": "0",
        # per-process compile cache: a shared dir would let one host cache-hit
        # what the other compiles from scratch, skewing their arrival at the
        # first collective beyond the communicator rendezvous window
        "AVDD_JAX_CACHE": f"/tmp/avdd_mh_cache_{pid}",
    })
    return env


def _run_two_hosts(args, port, timeout=600):
    procs = [subprocess.Popen([sys.executable] + args, cwd=REPO,
                              env=_host_env(pid, port),
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"host process failed:\n{out[-3000:]}"
    return outs


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(0)
    rels = sorted(os.path.relpath(p, TINY_META) for p in glob.glob(
        os.path.join(TINY_META, "*", "*", "*", "*.json")))
    sys.path.insert(0, os.path.join(REPO, "tests"))
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
        "loader": {"batch_size": 1, "num_workers": 2},
        "train_cfg": {"init_loss_norm": 200, "clip_grad_l2norm": 1.0,
                      "label_smoothing": 0.1, "droppath": 0.1, "loss_weight": 2.0},
        "test_cfg": {"voting_thresh": 0.9, "pre_nms_topk": 2000,
                     "max_seg_num": 20, "min_score": 0.001,
                     "multiclass_nms": False, "nms_sigma": 0.75,
                     "duration_thresh": 0.001},
        "output_folder": str(root / "runs"),
        "tpu": {"dp_size": -1},  # all 4 global devices (2 hosts x 2)
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root, cfg_path


def test_multihost_train_cli(workspace):
    root, cfg_path = workspace
    _run_two_hosts(["train.py", str(cfg_path), "--output", "mh",
                    "--ckpt-iter-freq", "0", "-p", "2"], _free_port())
    runs = glob.glob(str(root / "runs" / "mh_*"))
    assert len(runs) == 1, "hosts must agree on ONE run folder (process 0 only)"
    run_dir = runs[0]
    assert glob.glob(os.path.join(run_dir, "epoch_*")), "no checkpoint"
    metrics = os.path.join(run_dir, "metrics.jsonl")
    assert os.path.exists(metrics)
    last = json.loads(open(metrics).read().strip().splitlines()[-1])
    assert np.isfinite(last.get("train/final_loss", np.nan))


def test_multihost_inference_cli(workspace):
    root, cfg_path = workspace
    runs = glob.glob(str(root / "runs" / "mh_*"))
    assert runs, "train test must run first (module order)"
    _run_two_hosts(["inference.py", str(cfg_path), "1", "--ckpt", runs[0],
                    "--batch-size", "2", "--flush-every", "2"], _free_port())

    # per-host subfolders, disjoint covers of the 6-video shard
    host_items = {}
    for pid in (0, 1):
        folder = root / "runs" / "1" / f"host{pid}"
        assert folder.is_dir(), f"missing host{pid} output folder"
        items = [it for p in glob.glob(str(folder / "*.json"))
                 for it in json.load(open(p))]
        host_items[pid] = {it["video_id"] for it in items}
    assert host_items[0] and host_items[1]
    assert not host_items[0] & host_items[1], "hosts overlapped"
    assert len(host_items[0] | host_items[1]) == 6

    # generate_results merges the per-host folders (single process: no
    # coordinator env or it would wait for a second process)
    env = _host_env(0, 0)
    for key in ("AVDD_COORDINATOR", "AVDD_NUM_PROCESSES", "AVDD_PROCESS_ID"):
        env.pop(key, None)
    proc = subprocess.run(
        [sys.executable, "generate_results.py", str(root / "runs"),
         "--num-shards", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    pred = json.load(open(root / "runs" / "prediction.json"))
    assert len(pred) == 6
