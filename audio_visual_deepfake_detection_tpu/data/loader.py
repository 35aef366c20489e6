"""Threaded prefetching data loader.

The reference uses torch DataLoader worker *processes* with a no-op collator
(libs/datasets/datasets.py:28-43, data_utils.py:9-22). Feature loading here is
numpy IO + numpy resample, which releases the GIL, so a thread pool with a
bounded prefetch queue feeds the TPU without pickling overhead. Shuffling and
truncation randomness are driven by a seeded ``numpy.random.Generator`` per
epoch (determinism contract of fix_random_seed, train_utils.py:22-40).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate: Callable,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        prefetch: int = 2,
        shard_rank: int = 0,
        num_shards: int = 1,
        equal_shards: bool = False,
    ):
        """``shard_rank``/``num_shards``: multi-host data sharding — every
        host draws the SAME seeded epoch permutation and keeps its strided
        slice, so the global batch is a disjoint cover (the reference's
        manual shard txt files, generalized).

        ``equal_shards``: truncate every host's slice to the shortest one
        (``len(dataset) // num_shards``). REQUIRED for training: per-host
        slices differing by one item can give one host an extra batch, and a
        host still issuing train-step collectives after its peers stopped
        deadlocks the clique. Inference (no collectives, must not drop
        videos) leaves it off."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.shard_rank = shard_rank
        self.num_shards = max(1, num_shards)
        self.equal_shards = equal_shards
        self._epoch = 0
        self._skip = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def set_skip(self, n: int):
        """Skip the first ``n`` batches of the NEXT iteration only (mid-epoch
        resume). Skipped batches are never loaded or collated, but their
        per-sample rng draws ARE still consumed, so the remaining stream is
        bit-identical to the tail of an unskipped run."""
        self._skip = n

    def _shard_order(self):
        order = np.arange(len(self.dataset))
        rng = np.random.default_rng(self.seed + self._epoch)
        if self.shuffle:
            rng.shuffle(order)
        if self.num_shards > 1:
            order = order[self.shard_rank::self.num_shards]
            if self.equal_shards:
                order = order[:len(self.dataset) // self.num_shards]
        return order

    def __len__(self) -> int:
        # arithmetic, not len(self._shard_order()): materializing + shuffling
        # a 343k-element permutation just to count batches is O(N) per call
        n = len(self.dataset)
        if self.num_shards > 1:
            if self.equal_shards:
                n = n // self.num_shards
            else:
                n = (n - self.shard_rank + self.num_shards - 1) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        order = self._shard_order()
        n = len(order)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for i in range(0, end, self.batch_size):
            yield order[i:i + self.batch_size]

    def __iter__(self) -> Iterator:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        rng_root = np.random.default_rng((self.seed + self._epoch) * 7919 + 13)
        skip_batches = self._skip  # one-shot, consumed by this iteration
        self._skip = 0

        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer abandoned the
            iterator (preemption return, break) — otherwise the producer
            would block on the full queue forever, pinning its worker pool
            and several collated batches for the life of the process."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # an exception anywhere in the producer must reach the consumer,
            # otherwise the main thread blocks on out_q.get() forever
            try:
                skip = skip_batches
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in self._batches():
                        seeds = rng_root.integers(0, 2**63, size=len(batch_idx))
                        if skip > 0:
                            skip -= 1
                            continue
                        if stop.is_set():
                            return
                        futures = [
                            pool.submit(self.dataset.__getitem__, int(i),
                                        np.random.default_rng(int(s)))
                            for i, s in zip(batch_idx, seeds)
                        ]
                        samples = [f.result() for f in futures]
                        if not put(self.collate(samples)):
                            return
                put(sentinel)
            except BaseException as exc:  # noqa: BLE001
                put(exc)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    thread.join()
                    raise item
                yield item
            thread.join()
        finally:
            # consumer gone early (break / preemption / GC): release the
            # producer and its pool promptly
            stop.set()
