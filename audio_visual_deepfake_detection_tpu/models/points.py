"""Point generator (reference: libs/modeling/loc_generators.py:27-84).

Pure trace-time constant: per pyramid level with stride ``s`` the points are
``arange(0, T_level) * s`` with columns ``(t, reg_min, reg_max, stride)``.
No buffers or modules needed — shapes are static under jit, so the table is a
numpy constant folded into the compiled program.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=16)
def _points_np(feat_lens: Tuple[int, ...], fpn_strides: Tuple[int, ...],
               regression_range: Tuple[Tuple[float, float], ...], use_offset: bool):
    # mirror the reference's sanity check (loc_generators.py:43-44): a length
    # mismatch (e.g. fpn_start_level > 0 with the full 6-entry range table)
    # must fail loudly — zip would silently pair the coarsest level with the
    # wrong range and long segments would get zero positive points
    if not (len(feat_lens) == len(fpn_strides) == len(regression_range)):
        raise ValueError(
            f"fpn levels mismatch: {len(feat_lens)} feat_lens, "
            f"{len(fpn_strides)} fpn_strides, {len(regression_range)} "
            f"regression ranges (must all match; slice regression_range "
            f"when using fpn_start_level > 0)")
    per_level = []
    for t_i, stride, (lo, hi) in zip(feat_lens, fpn_strides, regression_range):
        ts = np.arange(t_i, dtype=np.float32) * stride
        if use_offset:
            ts = ts + 0.5 * stride
        pts = np.stack(
            [ts,
             np.full(t_i, lo, np.float32),
             np.full(t_i, hi, np.float32),
             np.full(t_i, stride, np.float32)],
            axis=1,
        )
        per_level.append(pts)
    return per_level


def generate_points(
    feat_lens: Sequence[int],
    fpn_strides: Sequence[int],
    regression_range: Sequence[Tuple[float, float]],
    use_offset: bool = False,
):
    """Per-level (T_i, 4) point tables as jnp constants."""
    per_level = _points_np(tuple(feat_lens), tuple(fpn_strides),
                           tuple(tuple(r) for r in regression_range), use_offset)
    return [jnp.asarray(p) for p in per_level]


def concat_points(feat_lens, fpn_strides, regression_range, use_offset=False):
    """(sum T_i, 4) concatenated table (the layout label_points expects)."""
    per_level = _points_np(tuple(feat_lens), tuple(fpn_strides),
                           tuple(tuple(r) for r in regression_range), use_offset)
    return jnp.asarray(np.concatenate(per_level, axis=0))
