"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(train.py:101) — replica scatter/gather on every forward. TPU-native
replacement: one SPMD program over a ``jax.sharding.Mesh``; the batch is
sharded over the ``data`` axis, parameters are replicated, and gradient
all-reduce is an XLA collective riding ICI. Multi-host extends the same mesh
over DCN with per-host data loading — no NCCL/MPI analogue to port.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(dp_size: int = -1, devices=None) -> Mesh:
    import os

    if devices is None:
        if os.environ.get("AVDD_FORCE_CPU") == "1":
            devices = jax.devices("cpu")
        else:
            devices = jax.devices()
    if dp_size is None or dp_size <= 0:
        dp_size = len(devices)
    devices = np.asarray(devices[:dp_size])
    return Mesh(devices, axis_names=(DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place numpy batch arrays on the mesh, leading axis over data."""
    sharding = batch_sharding(mesh)
    out = {}
    for key, value in batch.items():
        if key == "video_ids":
            out[key] = value
            continue
        out[key] = jax.device_put(value, sharding)
    return out


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def device_prefetch(batch_iter, mesh: Optional[Mesh] = None, depth: int = 2):
    """Overlap host->device transfer with device compute: keep up to ``depth``
    batches in flight on the device ahead of consumption (the reference's
    DataLoader workers only overlap host IO; the transfer itself was
    synchronous inside each forward, av_fd_no_recon.py:476-477)."""
    import collections

    buf = collections.deque()

    def put(batch):
        if mesh is not None:
            return shard_batch(mesh, batch)
        out = {}
        for key, value in batch.items():
            out[key] = value if key == "video_ids" else jax.device_put(value)
        return out

    it = iter(batch_iter)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        nxt = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield nxt


def pad_batch_to(batch: dict, target: int) -> dict:
    """Pad the leading axis to ``target`` (keeps jit shapes static for the
    last partial batch); padded rows get mask=False and has_gt=False so they
    contribute nothing to losses or results."""
    b = (batch["streams"][0] if "streams" in batch else batch["feats"]).shape[0]
    if b == target:
        return batch
    pad = target - b

    def pad_one(value, fill=0):
        filler = np.full((pad,) + value.shape[1:], fill, value.dtype)
        return np.concatenate([value, filler], axis=0)

    out = {}
    for key, value in batch.items():
        if key == "video_ids":
            out[key] = value
        elif key == "streams":  # online path: tuple of (B, T_cap, C)
            out[key] = tuple(pad_one(v) for v in value)
        elif key == "rows":     # pad with 1 row (not 0) so fps/stride math
            out[key] = tuple(pad_one(v, 1) for v in value)  # stays finite
        elif key == "duration" and "streams" in batch:
            out[key] = pad_one(value, 1)
        else:
            out[key] = pad_one(value)
    out["_real_rows"] = b
    return out
