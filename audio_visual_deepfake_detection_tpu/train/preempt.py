"""Preemption-safe training shutdown.

No reference analogue: the reference's only mid-run recovery is its
every-1000-iters checkpoint to a hard-coded path (train_utils.py:381-396) —
a preempted run loses up to 1000 iterations and exits however CUDA feels
about SIGKILL. TPU VMs (and most managed fleets) deliver a SIGTERM plus a
grace window before eviction; ``PreemptionGuard`` turns that into a clean
stop: the handler only sets a flag, the train loop polls it at iteration
boundaries, writes a mid-epoch checkpoint, and returns.

Multi-host: the flag is per-process (each host gets its own SIGTERM, and not
necessarily in the same instant), but every host must leave the step loop at
the SAME iteration — a host that stops issuing steps while its peers keep
launching collectives deadlocks the clique. ``agreed()`` is therefore a tiny
allgather-max over all processes and must be called at the same iteration
index on every host (the loop polls on a fixed cadence, so it is).
"""

from __future__ import annotations

import signal

import jax
import numpy as np


class PreemptionGuard:
    """Install once near process start (main thread — CPython requirement);
    pass to ``train_one_epoch``. ``triggered`` flips after a loop has acted
    on the request (checkpoint written, loop exited)."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._flag = False
        self.triggered = False
        self._prev = {}
        for sig in signals:
            self._prev[sig] = signal.signal(sig, self._handle)

    def _handle(self, signum, frame):
        self._flag = True

    def request(self):
        """Programmatic trigger (tests, orchestrators)."""
        self._flag = True

    def requested(self) -> bool:
        """This process's local flag — NOT safe as a loop-exit decision under
        multi-host (see module docstring); use ``agreed()``."""
        return self._flag

    def agreed(self) -> bool:
        """Cluster-wide stop decision: true iff ANY process was signalled.
        Collective when ``jax.process_count() > 1`` — every process must call
        it at the same iteration."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return bool(np.max(multihost_utils.process_allgather(
                np.asarray(self._flag, np.int32))))
        return self._flag

    def restore(self):
        """Re-install the previous handlers (tests)."""
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
