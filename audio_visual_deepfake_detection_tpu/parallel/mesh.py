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
    if jax.process_count() > 1 and dp_size != len(devices):
        # a mesh not spanning every process's devices breaks multi-host
        # global-array assembly with an inscrutable shard error later;
        # fail at setup with the actual fix instead
        raise ValueError(
            f"multi-host run ({jax.process_count()} processes): tpu.dp_size "
            f"must be -1 or the GLOBAL device count {len(devices)}, got "
            f"{dp_size}")
    devices = np.asarray(devices[:dp_size])
    return Mesh(devices, axis_names=(DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def warmup_collectives(mesh: Mesh) -> None:
    """Multi-host only: establish the cross-host communicator clique with a
    trivial all-reduce while the host processes are still in lockstep.

    The backend creates its collective context (Gloo over TCP on CPU, ICI
    rings on TPU pods) lazily at the FIRST collective, with a short peer
    rendezvous timeout (~30 s for Gloo's key-value exchange). The first real
    collective of a training run sits after minutes of compilation whose
    duration can differ per host (cache hits, CPU contention), so hosts would
    reach it tens of seconds apart and flake the rendezvous. This sub-second
    program pins the context while the skew is still milliseconds; later
    collectives reuse it."""
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp

    sharding = batch_sharding(mesh)
    local = np.zeros(mesh.devices.size // jax.process_count(), np.float32)
    arr = jax.make_array_from_process_local_data(
        sharding, local, (mesh.devices.size,))
    out = jax.jit(jnp.sum, out_shardings=replicated(mesh))(arr)
    jax.block_until_ready(out)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place numpy batch arrays on the mesh, leading axis over data.

    Single-host: a plain sharded device_put. Multi-host (the mesh spans
    processes): each process holds only ITS slice of the global batch (the
    loader's ``shard_rank``/``num_shards`` strided slice), and
    ``jax.make_array_from_process_local_data`` assembles the global array —
    the process-local rows land on local devices, no cross-host copy."""
    sharding = batch_sharding(mesh)
    multihost = jax.process_count() > 1
    out = {}
    for key, value in batch.items():
        if key == "video_ids" or key.startswith("_"):
            # host-side metadata (video ids, pad_batch_to's _real_rows):
            # pass through untouched so shard_batch(pad_batch_to(...))
            # composes; jit callers still pop these before the step fn
            out[key] = value
        elif key == "streams" or key == "rows":
            out[key] = tuple(_put_global(v, sharding, multihost) for v in value)
        else:
            out[key] = _put_global(value, sharding, multihost)
    return out


def _put_global(value, sharding: NamedSharding, multihost: bool):
    if not multihost:
        return jax.device_put(value, sharding)
    value = np.asarray(value)
    global_shape = (value.shape[0] * jax.process_count(),) + value.shape[1:]
    return jax.make_array_from_process_local_data(sharding, value, global_shape)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree over the whole mesh. Multi-host: every process must
    hold the SAME host values (guaranteed by seeded init / checkpoint
    restore); each process then donates the full array as its local shards."""
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(sharding, x, x.shape)

        return jax.tree_util.tree_map(put, tree)
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
            out[key] = value if key == "video_ids" or key.startswith("_") \
                else jax.device_put(value)
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
    last partial batch). Padded rows get mask=False and has_gt=False, which
    zeroes the point-level losses; batch-summed losses (video-level reco_cls
    focal etc.) additionally need the emitted ``row_valid`` mask, which
    ``compute_losses`` consumes — with it, a padded batch's losses equal the
    unpadded batch's exactly (tests/test_train.py::test_padded_batch_losses)."""
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
        elif key in ("fps", "duration", "feat_stride", "feat_num_frames"):
            # pad with 1 (not 0): grid->seconds decode divides by these, and
            # 0/0 = NaN on pad rows trips jax_debug_nans (AVDD_DEBUG_NANS=1)
            # even though the rows are discarded
            out[key] = pad_one(value, 1)
        else:
            out[key] = pad_one(value)
    out["row_valid"] = np.arange(target) < b
    out["_real_rows"] = b
    return out
