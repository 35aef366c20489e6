"""Sinusoid positional encoding (reference: libs/modeling/blocks.py:116-127).

Returns a (T, C) table: angle(pos, j) = pos / 10000^(2*(j//2)/C), even dims
take sin, odd dims cos. The backbone scales it by 1/sqrt(C) and re-interpolates
it linearly for over-length inference sequences (backbones.py:335-338,455-465).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=16)
def _sinusoid_table(n_position: int, d_hid: int):
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    j = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2.0 * np.floor(j / 2.0) / d_hid)
    table = np.where((np.arange(d_hid) % 2)[None, :] == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


def sinusoid_encoding(n_position: int, d_hid: int) -> jnp.ndarray:
    """(T, C) float32 sinusoid table."""
    return jnp.asarray(_sinusoid_table(n_position, d_hid))
