"""Fused MViT patch-embed kernel (Pallas/TPU): frames -> patch tokens with
zero unfold temps.

The XLA patch embed (frontends/mvit.py::PatchEmbed — itself already a 2.2x
round-3 rewrite of the conv lowering) still materializes its W/H-unfold
intermediates in HBM: the round-5 bisection measured 4.78 ms and 2.45 GB of
cost-analysis traffic per 512-frame chunk against a ~0.1 ms input+output
floor, making it the single largest remaining item of the video encoder.
This kernel reads the (lightly re-laid-out) frames once and writes the
token embeddings once; every unfold lives in VMEM as a matmul operand.

The trick is a LAYOUT that turns the stride-12 window geometry into
contiguous sublanes (no strided access — Mosaic has none):

  frames (B, T, 96, 96, 3)  --XLA prep-->  (B, T+2, 9, 4608)

  * T zero-padded by 1 each side (temporal taps become frame offsets 0..2),
  * H zero-padded to 108 = 9 groups of 12 rows (conv pad 3 + 9 dead rows),
  * W*C zero-padded 306 -> 384 lanes, then each 12-row group's rows merge
    into lanes: group g, row-in-group m, (w, c) -> lane m*384 + w*3 + c.

With stride 12 and kernel 15, output row i reads padded rows [12i, 12i+15)
= all of group i (kernel rows 0..11) plus rows 0..2 of group i+1 (kernel
rows 12..14). So for each temporal tap r the whole (t, i) tile is:

  out[(t, i), (j, f)] = FG[t+r, i] @ W3a_r  +  FG[t+r, i+1, :1152] @ W3b_r

where W3a_r (4608, 8*128) / W3b_r (1152, 8*128) are constant re-layouts of
the conv weights (each output column block j holds w[r, kh, w-12j, c, f])
and the (t, i) batching rides one 0/1 row-select matmul per tap. Per
32-frame grid step that is 12 medium matmuls — MXU light-speed ~0.5 ms per
512-frame chunk.

Numerics: selection matmuls are exact (one nonzero per output element, f32
accumulation of single products); the weight matmuls accumulate all three
taps in one f32 accumulator before the output downcast, vs the XLA path's
per-tap bf16 partials — identical in f32 mode up to reassociation, within
rounding in bf16. Output channels are padded 96 -> 128 in-kernel and
sliced by the wrapper.

Reference behavior: the torchvision conv_proj configured at
video_feature/aligned_video/model/video_encoder.py:65-96
(kernel (3,15,15), stride (1,12,12), padding (1,3,3), 96x96 inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flipped on by core.runtime.setup_jax on TPU (AVDD_FUSED_PATCH=0 disables).
ENABLED = False
# Tests route the dispatch through the pallas interpreter on CPU.
INTERPRET = False

TS = 32            # frames per grid step
H_IN, W_IN, C_IN = 96, 96, 3
KT, KH, KW = 3, 15, 15
SH, SW = 12, 12
OH = OW = 8        # output spatial grid
GROUPS = 9         # padded-H groups of 12 rows
LANES_WC = 384     # (W+6)*C = 306 padded to a lane multiple
GL = 12 * LANES_WC  # lanes per group after the row->lane merge (4608)
FPAD = 128         # padded output feature count


@functools.lru_cache(maxsize=4)
def _sel_np():
    """(3, 256, TS+2 * GROUPS) row selects: out row (t, i) <- in row
    ((t + r) * GROUPS + i + gsel) for gsel in {0 (a), 1 (b)}."""
    rows = (TS + 2) * GROUPS
    sela = np.zeros((KT, TS * OH, rows), np.float32)
    selb = np.zeros((KT, TS * OH, rows), np.float32)
    for r in range(KT):
        for t in range(TS):
            for i in range(OH):
                sela[r, t * OH + i, (t + r) * GROUPS + i] = 1.0
                selb[r, t * OH + i, (t + r) * GROUPS + i + 1] = 1.0
    return sela, selb


def _pack_weights(kernel, bias, cdtype):
    """conv kernel (3, 15, 15, 3, F) + bias (F,) -> (w3a (3, GL, OW*FPAD),
    w3b (3, 3*LANES_WC, OW*FPAD), bias row (1, OW*FPAD))."""
    w = jnp.asarray(kernel).astype(cdtype)
    f = w.shape[-1]
    wpad = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 0), (0, FPAD - f)))

    def per_j(tap_rows, r):
        # tap_rows: kernel-row slice (kh count, KW, C, FPAD); output column
        # block j places kw at w-position 12j + kw (never reaches the
        # 306..383 lane pad: 12*7 + 14 = 98 < 102)
        cols = []
        for j in range(OW):
            z = jnp.pad(wpad[r, tap_rows],
                        ((0, 0), (SW * j, 128 - KW - SW * j), (0, 0),
                         (0, 0)))
            cols.append(z.reshape(-1, FPAD))
        return jnp.concatenate(cols, axis=1)

    w3a = jnp.stack([per_j(slice(0, 12), r) for r in range(KT)])
    w3b = jnp.stack([per_j(slice(12, 15), r) for r in range(KT)])
    brow = jnp.tile(jnp.pad(jnp.asarray(bias, jnp.float32), (0, FPAD - f)),
                    OW).reshape(1, OW * FPAD)
    return w3a, w3b, brow


def _kernel(main_ref, halo_ref, w3a_ref, w3b_ref, sela_ref, selb_ref,
            bias_ref, out_ref, *, cdtype, interpret):
    def mm(a, b_):
        # bf16 x bf16 with f32 accumulation; the CPU interpreter has no
        # bf16 dot, so interpret mode multiplies the SAME bf16-rounded
        # values as f32 (bf16 products are exact in f32 — identical result)
        if interpret:
            a, b_ = a.astype(jnp.float32), b_.astype(jnp.float32)
        return jnp.dot(a, b_, preferred_element_type=jnp.float32)

    fg = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)  # (TS+2, 9, GL)
    fg = fg.reshape((TS + 2) * GROUPS, GL).astype(jnp.float32)
    acc = jnp.zeros((TS * OH, OW * FPAD), jnp.float32)
    for r in range(KT):
        # selection matmuls in f32: exact for any input dtype (one nonzero
        # per output element)
        xa = jnp.dot(sela_ref[r], fg,
                     preferred_element_type=jnp.float32).astype(cdtype)
        acc = acc + mm(xa, w3a_ref[r])
        xb = jnp.dot(selb_ref[r], fg[:, :3 * LANES_WC],
                     preferred_element_type=jnp.float32).astype(cdtype)
        acc = acc + mm(xb, w3b_ref[r])
    out = acc.astype(cdtype) + bias_ref[...].astype(cdtype)
    out_ref[0] = out.reshape(TS * OH * OW, FPAD)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_patch_embed(video, kernel, bias, *, interpret: bool = False):
    """video (B, T, 96, 96, 3) float -> (B, T, 8, 8, F) patch embeddings
    (cdtype = kernel dtype), the MViT conv_proj at its production geometry."""
    b, t, h, w_, c = video.shape
    assert (h, w_, c) == (H_IN, W_IN, C_IN), (h, w_, c)
    cdtype = jnp.asarray(kernel).dtype
    f = kernel.shape[-1]

    n_steps = -(-t // TS)
    tp = n_steps * TS + 2
    x = video.astype(cdtype)
    # T pad: 1 front (temporal conv pad) + zero tail to the step grid;
    # H pad: 3 + 96 + 9 = 108 rows (conv pad 3/3 + 6 dead rows for the
    # 9x12 grouping); W pad: 3/3; then W,C merge + 306 -> 384 lane pad +
    # rows-in-group -> lane merge
    x = jnp.pad(x, ((0, 0), (1, tp - t - 1), (3, 9), (3, 3), (0, 0)))
    x = x.reshape(b, tp, GROUPS, 12, (W_IN + 6) * C_IN)
    x = jnp.pad(x, ((0, 0),) * 4 + ((0, LANES_WC - (W_IN + 6) * C_IN),))
    x = x.reshape(b, tp, GROUPS, GL)

    sela_np, selb_np = _sel_np()
    sela = jnp.asarray(sela_np, jnp.float32)
    selb = jnp.asarray(selb_np, jnp.float32)
    w3a, w3b, brow = _pack_weights(kernel, bias, cdtype)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda bb, s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, cdtype=cdtype, interpret=interpret),
        grid=(b, n_steps),
        in_specs=[
            pl.BlockSpec((1, TS, GROUPS, GL), lambda bb, s: (bb, s, 0, 0),
                         memory_space=pltpu.VMEM),
            # 2-frame right halo as a second view (overlapping blocks are
            # not expressible in one BlockSpec); block units of 2 frames
            pl.BlockSpec((1, 2, GROUPS, GL),
                         lambda bb, s: (bb, (TS // 2) * (s + 1), 0, 0),
                         memory_space=pltpu.VMEM),
            wspec((KT, GL, OW * FPAD)),
            wspec((KT, 3 * LANES_WC, OW * FPAD)),
            wspec((KT, TS * OH, (TS + 2) * GROUPS)),
            wspec((KT, TS * OH, (TS + 2) * GROUPS)),
            wspec((1, OW * FPAD)),
        ],
        out_specs=pl.BlockSpec((1, TS * OH * OW, FPAD),
                               lambda bb, s: (bb, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_steps * TS * OH * OW, FPAD),
                                       cdtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, w3a, w3b, sela, selb, brow)
    out = out.reshape(b, n_steps * TS, OH, OW, FPAD)
    return out[:, :t, :, :, :f]
