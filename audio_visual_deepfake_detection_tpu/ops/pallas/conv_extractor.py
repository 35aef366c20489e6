"""Fused Emotion2Vec conv feature extractor (Pallas/TPU): wav -> 50 Hz
features with the whole 7-layer Conv1d+LN+GELU stack in one VMEM residency
per time tile.

The reference extractor (audio_feature/emotion_audio/upstream/models/
audio.py:26-32, fairseq ConvFeatureExtractionModel mode='layer_norm':
spec [(512,10,5)] + [(512,3,2)]*4 + [(512,2,2)]*2, no conv bias) measured
45.3 ms at the production workload (48 x 10 s wav, bf16, v5e) against a
13.2 ms HBM light-speed — XLA's lax.conv lowering round-trips every layer's
(T_l, 512) activation through HBM, and all three XLA-level rewrites measured
NEGATIVE (round-4 BENCH_NOTES: contraction-10 dot_generals lower through
15 GB broadcast temps). This kernel reads the waveform once and writes the
final features once; every intermediate lives in VMEM.

TPU design notes:
- strides are handled by LAYOUT, not strided access (Mosaic has no strided
  slice): the wav arrives pre-reshaped to (rows of 40 samples + 8 halo
  lanes) and layer 0 becomes ONE matmul against a (48, 8*512) unfold matrix
  (output frame j of each row reads lanes [5j, 5j+10)); each k=3/s=2 layer
  reshapes its input to (T/2, 1024) — legal Mosaic reshape, 512 is a lane
  multiple — so the three taps are two lane halves plus a one-row shift,
  concatenated and contracted in ONE (., 1536) x (1536, 512) matmul; k=2
  layers are a single (., 1024) x (1024, 512) matmul.
- the grid tiles (batch, output-frames): VALID convs are left-aligned, so a
  tile needs only RIGHT halo, which arrives as a second 4-row BlockSpec view
  of the same wav array (overlapping slabs are not expressible in one
  BlockSpec). Per 64-frame tile the deepest layer holds ~4.2k rows x 512 ch;
  everything together stays well under the VMEM budget.
- LN statistics in f32 (flax fast-variance clamped at 0, eps 1e-5), matmuls
  in the compute dtype with f32 accumulation, GELU via fused_block._gelu
  (Mosaic has no erf primitive; exact rational in f32, sub-bf16-rounding
  polynomial in bf16).

Numerics: tile boundaries are exact (VALID convolutions are translation
invariant), so the only deltas vs the XLA path are f32 reassociation (f32
mode) / bf16 rounding (bf16 mode); parity pinned by
tests/test_conv_extractor_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .band_attention import _shift_rows
from .fused_block import _gelu

# Flipped on by core.runtime.setup_jax on TPU (AVDD_FUSED_EMO_CONV=0
# disables). frontends/emotion2vec.py consults this at trace time.
ENABLED = False
# Tests route the dispatch through the pallas interpreter on CPU.
INTERPRET = False

import os

LN_EPS = 1e-5
# final output frames per grid step; read once at import for benches
# (participates in jit-cached programs — restart to flip). Measured on v5e
# at the 48 x 10 s workload: 34.7 ms at 64, 33.3 at 128 (XLA path 45.2).
F_TILE = int(os.environ.get("AVDD_EMO_F_TILE", "128"))
CH = 512


def _row_counts(f: int):
    """Provisioned per-layer output rows for a tile of ``f`` final frames.
    Each k=3/s=2 layer consumes 2*O+1 input rows for O outputs; provisioned
    counts are padded up so every reshape-by-pairs sees an even row count."""
    o6 = f
    o5 = 2 * f
    o4 = 4 * f
    o3 = 8 * f + 2
    o2 = 16 * f + 6
    o1 = 32 * f + 14
    o0 = 64 * f + 64          # L0 produces 8 frames per 40-sample row
    r40 = 8 * f + 8           # wav rows of 40 consumed (8-row halo: TPU
    #                           block sublane counts must divide by 8)
    return o0, o1, o2, o3, o4, o5, o6, r40


def _kernel(wmain_ref, whalo_ref, wb0_ref, w1_ref, w2_ref, w3_ref, w4_ref,
            w5_ref, w6_ref, vecs_ref, out_ref, *, f: int, cdtype):
    o0, o1, o2, o3, o4, o5, o6, r40 = _row_counts(f)
    vecs = vecs_ref[...]                     # (14, 512) f32

    def cdot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32
                       ).astype(cdtype)

    def ln_gelu(y, li):
        yf = y.astype(jnp.float32)
        mu = jnp.mean(yf, axis=-1, keepdims=True)
        m2 = jnp.mean(yf * yf, axis=-1, keepdims=True)
        var = jnp.maximum(m2 - mu * mu, 0.0)
        z = (yf - mu) * jax.lax.rsqrt(var + LN_EPS)
        z = z * vecs[2 * li][None] + vecs[2 * li + 1][None]
        return _gelu(z, cdtype).astype(cdtype)

    def down3(x, w_ref, li, o_out):
        # taps 0/1 are the lane halves of the pair view; tap 2 is a one-row
        # shift of the even half. Two matmuls instead of a concat+matmul:
        # Mosaic cannot concatenate a row-offset slice ("offset mismatch on
        # non-concat dimension"), and _shift_rows re-zeros the offset.
        x2 = x[:2 * o_out + 2].reshape(o_out + 1, 2 * CH)
        a = x2[:o_out]                                   # (O, 1024)
        b = _shift_rows(x2[:, :CH], 1)[:o_out]           # (O, 512) tap 2
        w = w_ref[...]
        y = (jnp.dot(a, w[:2 * CH], preferred_element_type=jnp.float32)
             + jnp.dot(b, w[2 * CH:], preferred_element_type=jnp.float32)
             ).astype(cdtype)
        return ln_gelu(y, li)

    def down2(x, w_ref, li, o_out):
        x2 = x[:2 * o_out].reshape(o_out, 2 * CH)
        return ln_gelu(cdot(x2, w_ref[...]), li)

    slab = jnp.concatenate([wmain_ref[0], whalo_ref[0]], axis=0)  # (r40, 48)
    x = cdot(slab.astype(cdtype), wb0_ref[...])    # (r40, 8*512)
    x = x.reshape(r40 * 8, CH)                     # == (o0, CH)
    x = ln_gelu(x, 0)
    x = down3(x, w1_ref, 1, o1)
    x = down3(x, w2_ref, 2, o2)
    x = down3(x, w3_ref, 3, o3)
    x = down3(x, w4_ref, 4, o4)
    x = down2(x, w5_ref, 5, o5)
    x = down2(x, w6_ref, 6, o6)
    out_ref[0] = x[:f].astype(out_ref.dtype)


def _prep_wav(wav: jnp.ndarray, n_tiles: int, f: int):
    """(B, L) f32 -> the (B, rows, 40) main view + 8-lane halo columns,
    padded so every tile's main+halo blocks exist."""
    b, length = wav.shape
    rows_needed = 8 * f * n_tiles + 8 * f      # generous zero tail
    pad = rows_needed * 40 - length
    w = jnp.pad(wav, ((0, 0), (0, max(0, pad))))
    w40 = w.reshape(b, rows_needed, 40)
    halo = jnp.pad(w40[:, 1:, :8], ((0, 0), (0, 1), (0, 0)))
    return jnp.concatenate([w40, halo], axis=-1)   # (B, rows, 48)


def _pack_weights(params, cdtype):
    """flax ConvFeatureExtractor params -> kernel weight arrays (pre-rounded
    to the compute dtype, matching XLA's bf16-weight convs)."""
    def conv_w(i):
        return jnp.asarray(params[f"conv_{i}"]["kernel"]).astype(cdtype)

    w0 = conv_w(0)[:, 0, :]                         # (10, 512)
    zeros = jnp.zeros((CH,), cdtype)
    rows = []
    for lane in range(48):
        blocks = []
        for j in range(8):
            r = lane - 5 * j
            blocks.append(w0[r] if 0 <= r < 10 else zeros)
        rows.append(jnp.concatenate(blocks))
    wb0 = jnp.stack(rows)                           # (48, 4096)

    def stack_taps(i):
        k = conv_w(i)                               # (k, 512, 512)
        return k.reshape(k.shape[0] * CH, CH)

    vec_rows = []
    for i in range(7):
        vec_rows.append(jnp.asarray(params[f"ln_{i}"]["scale"], jnp.float32))
        vec_rows.append(jnp.asarray(params[f"ln_{i}"]["bias"], jnp.float32))
    vecs = jnp.stack(vec_rows)                      # (14, 512)
    return (wb0, stack_taps(1), stack_taps(2), stack_taps(3), stack_taps(4),
            stack_taps(5), stack_taps(6), vecs)


@functools.partial(jax.jit,
                   static_argnames=("out_len", "interpret", "compute_dtype"))
def fused_conv_extractor(wav: jnp.ndarray, params, *, out_len: int,
                         interpret: bool = False,
                         compute_dtype=jnp.float32) -> jnp.ndarray:
    """(B, L) f32 wav + flax ConvFeatureExtractor params -> (B, out_len, 512)
    features (cdtype), out_len = conv_output_length(L)."""
    cdtype = jnp.dtype(compute_dtype)
    b = wav.shape[0]
    f = F_TILE
    n_tiles = -(-out_len // f)
    packed = _pack_weights(params, cdtype)
    wav48 = _prep_wav(wav, n_tiles, f)

    o0, o1, o2, o3, o4, o5, o6, r40 = _row_counts(f)
    main_rows, halo_rows = 8 * f, 8
    # the halo is a second 8-row-block view of the same array: block index
    # f*(i+1) starts at row 8f*(i+1), the tile's right halo
    in_specs = [
        pl.BlockSpec((1, main_rows, 48), lambda bb, i: (bb, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, halo_rows, 48),
                     lambda bb, i, f=f: (bb, f * (i + 1), 0),
                     memory_space=pltpu.VMEM),
    ]

    def wspec(shape):
        return pl.BlockSpec(shape, lambda bb, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs += [wspec((48, 8 * CH))]
    in_specs += [wspec((3 * CH, CH))] * 4
    in_specs += [wspec((2 * CH, CH))] * 2
    in_specs += [wspec((14, CH))]

    out = pl.pallas_call(
        functools.partial(_kernel, f=f, cdtype=cdtype),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, f, CH), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * f, CH), cdtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wav48, wav48, *packed)
    return out[:, :out_len]
