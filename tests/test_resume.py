"""Shard-resume planning (infer/resume.py): multi-host share/filter ordering,
stale-final renumbering, atomic flush writes."""

import json
import os

from audio_visual_deepfake_detection_tpu.infer.resume import (
    atomic_write_json, collect_done, plan_host_share,
)


def _items(ids):
    return [{"id": v, "duration": 1.0} for v in ids]


def _flush(folder, name, ids):
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, name), "w") as f:
        json.dump([{"video_id": v} for v in ids], f)


def test_multihost_resume_covers_all_videos_once(tmp_path):
    """The review scenario: hosts flushed different subsets before dying; the
    resumed hosts' work lists must union to exactly the missing videos with
    no overlap (stride-then-filter, never filter-then-stride)."""
    ids = ["a", "b", "c", "d", "e", "f"]
    # original assignment: host0 [a,c,e], host1 [b,d,f]
    _flush(str(tmp_path / "h0"), "data_left2.json", ["a", "c"])
    _flush(str(tmp_path / "h1"), "data_left1.json", ["b"])

    w0, d0 = plan_host_share(_items(ids), 0, 2, str(tmp_path / "h0"), True)
    w1, d1 = plan_host_share(_items(ids), 1, 2, str(tmp_path / "h1"), True)
    todo0 = [it["id"] for it in w0]
    todo1 = [it["id"] for it in w1]
    assert todo0 == ["e"]
    assert todo1 == ["d", "f"]
    assert d0 == {"a", "c"} and d1 == {"b"}
    # union(done, todo) covers the shard exactly once
    assert sorted(todo0 + todo1 + sorted(d0 | d1)) == sorted(ids)


def test_plan_matches_loader_stride_without_resume(tmp_path):
    """Host shares must equal the DataLoader's historical strided order so a
    resumed run agrees with what the original (loader-sharded) run did."""
    import numpy as np

    ids = [f"v{i}" for i in range(7)]
    for nprocs in (1, 2, 3):
        shares = []
        for rank in range(nprocs):
            w, _ = plan_host_share(_items(ids), rank, nprocs,
                                   str(tmp_path / f"x{rank}"), False)
            shares.append([it["id"] for it in w])
            order = np.arange(len(ids))[rank::nprocs]  # loader.py:_shard_order
            assert shares[-1] == [ids[i] for i in order]
        assert sorted(sum(shares, [])) == sorted(ids)


def test_collect_done_renumbers_stale_final(tmp_path):
    folder = str(tmp_path / "s")
    _flush(folder, "data_left2.json", ["a", "b"])
    _flush(folder, "data_left.json", ["c"])
    _flush(folder, "data_left_part0.json", ["d"])
    done = collect_done(folder)
    assert done == {"a", "b", "c", "d"}
    names = sorted(os.listdir(folder))
    assert "data_left.json" not in names
    assert "data_left_part1.json" in names  # renumbered past the existing part


def test_atomic_write_json(tmp_path):
    path = str(tmp_path / "out.json")
    atomic_write_json(path, [{"video_id": "a"}])
    atomic_write_json(path, [{"video_id": "b"}])  # overwrite is atomic too
    with open(path) as f:
        assert json.load(f) == [{"video_id": "b"}]
    assert not os.path.exists(path + ".tmp")


def test_loader_set_skip_preserves_stream(tmp_path):
    """set_skip(k) yields exactly the unskipped run's batches k..end,
    including the per-sample rng draws (the seeds of skipped batches are
    consumed, not reassigned)."""
    from audio_visual_deepfake_detection_tpu.data.loader import DataLoader

    class RngDataset:
        def __len__(self):
            return 10

        def __getitem__(self, idx, rng=None):
            return {"idx": idx, "draw": int(rng.integers(0, 2**31))}

    def collate(samples):
        return [(s["idx"], s["draw"]) for s in samples]

    def run(skip):
        loader = DataLoader(RngDataset(), 2, collate, shuffle=True,
                            num_workers=2, seed=7)
        loader.set_epoch(3)
        if skip:
            loader.set_skip(skip)
        return [b for b in loader]

    full = run(0)
    assert len(full) == 5
    assert run(2) == full[2:]
    # one-shot: the next plain iteration is complete again
    loader = DataLoader(RngDataset(), 2, collate, shuffle=True,
                        num_workers=2, seed=7)
    loader.set_epoch(3)
    loader.set_skip(4)
    assert [b for b in loader] == full[4:]
    assert [b for b in loader] == full


def test_loader_equal_shards_aligns_batch_counts():
    """equal_shards trims every host's slice to the shortest so all hosts run
    the SAME number of train batches (a host with one extra batch would
    issue collectives its peers never join). Inference default keeps every
    item."""
    from audio_visual_deepfake_detection_tpu.data.loader import DataLoader

    class Ds:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, idx, rng=None):
            return idx

    collate = list
    # 15 items / 2 hosts / batch 8 with drop_last: host0 gets 8 -> 1 batch,
    # host1 gets 7 -> 0 batches — desynced without equal_shards
    counts = []
    for rank in (0, 1):
        loader = DataLoader(Ds(15), 8, collate, shuffle=True, drop_last=True,
                            num_workers=1, seed=3, shard_rank=rank,
                            num_shards=2)
        counts.append(len(loader))
    assert counts == [1, 0]  # the hazard, preserved for inference semantics

    eq_counts, eq_items = [], []
    for rank in (0, 1):
        loader = DataLoader(Ds(15), 3, collate, shuffle=True, drop_last=True,
                            num_workers=1, seed=3, shard_rank=rank,
                            num_shards=2, equal_shards=True)
        eq_counts.append(len(loader))
        got = []
        for b in loader:
            got.extend(b)
        eq_items.append(got)
    assert eq_counts == [2, 2]  # 7 items each -> 2 batches each
    assert set(eq_items[0]).isdisjoint(eq_items[1])


def test_flush_files_numeric_order(tmp_path):
    """Numbered flushes merge in write order, not lexicographic (data_left
    10000 must come after 5000), then parts, then the unnumbered final."""
    from audio_visual_deepfake_detection_tpu.infer.resume import flush_files

    folder = str(tmp_path)
    for name in ("data_left10000.json", "data_left5000.json",
                 "data_left.json", "data_left_part2.json",
                 "data_left_part10.json"):
        _flush(folder, name, ["x"])
    assert [os.path.basename(p) for p in flush_files(folder)] == [
        "data_left5000.json", "data_left10000.json",
        "data_left_part2.json", "data_left_part10.json", "data_left.json"]


def test_loader_abandoned_iteration_releases_producer():
    """Breaking out of a loader iteration (preemption) must not leave the
    producer blocked on the bounded queue forever."""
    import threading
    import time as _t

    from audio_visual_deepfake_detection_tpu.data.loader import DataLoader

    class Ds:
        def __len__(self):
            return 64

        def __getitem__(self, idx, rng=None):
            return idx

    before = threading.active_count()
    loader = DataLoader(Ds(), 2, list, shuffle=False, num_workers=2,
                        prefetch=1)
    it = iter(loader)
    next(it)  # one batch, then abandon
    it.close()
    deadline = _t.time() + 10
    while threading.active_count() > before and _t.time() < deadline:
        _t.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
