"""Fused MViT pooled-attention core (Pallas/TPU): one VMEM residency for
scores + rel-pos bias + softmax + P@V + residual pooling.

At the production geometry (video_encoder.py:65-170 settings: 96x96 inputs,
512-frame chunks) every MViT-v2 stage pools k/v to a (T, 1, 1) grid, so
per-head attention is ``(N_q, d) x (513, d)`` with a TEMPORAL-only decomposed
rel-pos bias (the spatial bias terms are constant along the k axis and cancel
in softmax — frontends/mvit.py khw==1 branch). The XLA lowering round-trips
the (N_q, 513) f32 score matrix and the same-sized bias band through HBM
several times per block (~60-100 MB per stage-3 block vs ~15 MB of
irreducible qkv/x/MLP traffic — the round-3/4 roofline). This kernel reads
q, k, v and the precomputed bias band ONCE per block and writes only the
attention output.

Layout contract (caller = frontends/mvit.py::MultiscaleAttention):
- the class-token QUERY row is excluded — computed by the caller in XLA
  (one row per head) and re-attached with the pad+select trick,
- k/v arrive PERMUTED to [grid rows..., cls row] so the bias band adds to
  score columns [0, Nk-1) with no lane shift,
- ``band`` is the (N_grid_q, kt) additive temporal bias
  (q . rel_pos_t[t_q - t_k + kt - 1], frontends/mvit.py::_toeplitz_band),
- out = softmax(scale * q @ k^T + [band | 0]) @ v + q  (residual_pool=True,
  residual_with_cls_embed=False: every grid row gets the +q residual).

Numerics match the XLA path: scores and softmax statistics in f32,
exp downcast to the compute dtype for the value contraction, the softmax
denominator applied to the (N_q, d) output (sum(e) >= 1 — safe), f32
accumulation on every matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flipped on by core.runtime.setup_jax on TPU (AVDD_FUSED_MVIT=0 disables).
# frontends/mvit.py consults this at trace time.
ENABLED = False
# Tests set this to route the same dispatch through the pallas interpreter
# on CPU (kernel semantics without TPU hardware).
INTERPRET = False


def _kernel(q_ref, k_ref, v_ref, band_ref, out_ref, *, scale: float):
    q = q_ref[0]                      # (R, d)   compute dtype
    k = k_ref[0]                      # (Nk, d)  [grid..., cls]
    v = v_ref[0]                      # (Nk, d)
    band = band_ref[0]                # (R, Nk-1)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (R, Nk)
    scores = scores * scale
    # bias covers the grid k columns [0, Nk-1); the trailing cls column
    # stays bias-free (pad on the minor-axis END — no lane shift)
    scores = scores + jnp.pad(band.astype(jnp.float32), ((0, 0), (0, 1)))
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m).astype(q.dtype)
    z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)   # >= 1
    out = jax.lax.dot_general(
        e, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (R, d) f32
    out = out / z
    out_ref[0] = out.astype(out_ref.dtype) + q        # residual_pool


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_pooled_attention(q_grid, k_perm, v_perm, band, *, scale: float,
                           interpret: bool = False):
    """q_grid: (nh, Ng, d) grid-query rows (t-major); k_perm/v_perm:
    (nh, Nk, d) with the cls token LAST; band: (nh, Ng, Nk-1) additive bias.
    Returns (nh, Ng, d) = softmax(scale q k^T + [band|0]) @ v + q_grid."""
    nh, ng, d = q_grid.shape
    nk = k_perm.shape[1]
    # q-tile: 512 rows (or the whole grid when smaller). Ng is t-major
    # (t * qh * qw) and always a multiple of 512 at production geometry;
    # small test grids take the single-tile path.
    r = ng if ng <= 512 else 512
    assert ng % r == 0, (ng, r)
    n_tiles = ng // r

    grid_spec = pl.GridSpec(
        # q-tiles innermost: k/v blocks are grid-step-invariant per head, so
        # the pallas pipeline skips their re-fetch between consecutive tiles
        grid=(nh, n_tiles),
        in_specs=[
            pl.BlockSpec((1, r, d), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, nk - 1), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, d), lambda h, i: (h, i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((nh, ng, d), q_grid.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(q_grid, k_perm, v_perm, band)
