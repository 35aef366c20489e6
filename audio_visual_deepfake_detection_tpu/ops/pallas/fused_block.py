"""Fused transformer-block kernel (Pallas/TPU): one VMEM residency per sample.

The XLA lowering of a localizer block (models/blocks.py::TransformerBlock,
reference blocks.py:1227-1317 + the attention zoo :199-1225) round-trips every
intermediate — LN outputs, depthwise-conv outputs, q/k/v, the 2w+1 shifted
k/v copies of the banded attention, the 4x MLP hidden — through HBM: ~2.7 GB
of fusion traffic per full-length block at B=256. This kernel computes the
whole block (pre-LN -> depthwise convs -> q/k/v dense -> banded attention ->
proj -> residual -> LN -> MLP -> residual) for one sample per grid step with
everything resident in VMEM: HBM traffic is one read of the input stream(s)
and one write of the output.

Design notes (TPU):
- everything stays in 2D ``(T, C)`` layout (lane dim = channels). Mosaic
  cannot reshape ``(T, C) -> (T, H, D)``, so per-head score reduction and
  prob broadcast ride the MXU through one-hot ``(C, 128)`` / ``(128, C)``
  matrices (head h = channels [h*D, (h+1)*D)) — trading a few small matmuls
  for zero relayouts.
- the banded attention is the shift formulation of ops/attention.py: one
  score column per relative offset, finite -1e4 penalty on masked keys,
  -1e30 (≈ -inf) outside the band/sequence, f32 streaming softmax, post-
  softmax zeroing of invalid query rows (the reference NaN guard,
  blocks.py:766-767).
- norms/softmax compute in f32; matmuls run in the compute dtype with f32
  accumulation; probabilities are downcast to the compute dtype before the
  value contraction — matching the XLA mixed-precision path.

Covers stride-1 self/cross blocks with banded attention (all eight full-T
blocks and the five hh blocks of the HRLR backbone) and stride-2
downsampling self blocks (``ds_self``: the caller pre-splits the full-res
stream into even/odd rows, the kernel composes the stride-2 depthwise convs
and the MaxPool(k=3,s=2,p=1) skip path from the halves — four of the five
pyramid branch blocks). Only the dense-attention coarsest level keeps the
XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..attention import NEG_PENALTY  # finite masked-kv penalty (blocks.py:753)
from .band_attention import _shift_rows

# Banded attention via band-masked dense NT contractions instead of the
# per-offset shift formulation: (2w+1) x (2 one-hot matmuls + 2 shifts +
# elementwise) becomes 2 x n_head MXU contractions with a (T, T) band mask.
# Identical semantics (in-band -1e4 kv penalty, -1e30 outside, f32 softmax,
# bf16 value dot). MEASURED SLOWER at production shape — 1890 vs 2250
# videos/s (B=512 bf16): the T/(2w+1) = 40x score-FLOP inflation plus the
# f32 exp over (T, T) instead of (T, 2w+1) outweighs the small-matmul glue
# it removes. Kept as an opt-in for short-T / wide-window geometries where
# the trade reverses. Read once at import (participates in jit-cached
# kernels — restart to flip).
BAND_VIA_DENSE = os.environ.get("AVDD_BAND_DENSE", "0") == "1"

# Packed-lane softmax for the banded attention: all (2w+1) offsets x n_head
# heads live in one (T, 128) lane space (lane = group*n_head + head), so the
# softmax runs ONE f32 exp pass instead of 2w+1, the per-class max is a
# log2(128/n_head) lane-roll butterfly, and the denominator is a single
# (128, 128) one-hot class-sum matmul. Score/value matmul count is unchanged
# (the per-offset one-hot matrices place each offset in its own lane group
# for free). Requires n_head to be a power of two with (2w+1)*n_head <= 128.
# Bit-identical to the per-offset path and MEASURED NEUTRAL at the production
# geometry (w=3, H=4, B=512 bf16: 1.00x — the (T, 128) softmax glue it
# removes is not where the time goes; see BENCH_NOTES round 3). Kept opt-in
# for wide-window geometries where 2w+1 exp passes would actually bite.
PACKED_SOFTMAX = os.environ.get("AVDD_PACKED_SOFTMAX", "0") == "1"

NEG_INF = -1e30      # band/sequence edge: effectively -inf, NaN-safe
LN_EPS = 1e-5

# Flipped on by core.runtime.setup_jax when running on TPU
# (AVDD_FUSED_BLOCK=0 disables). models/blocks.py::TransformerBlock consults
# this to dispatch eligible eval-time blocks to the fused kernel.
ENABLED = False

# Training-path dispatch (custom_vjp: pallas forward + jnp-mirror XLA
# backward). Measured SLOWER than the standard nn.remat path at production
# shapes (B=128 bf16: 429 vs 296 ms/step — the custom-call boundaries block
# XLA's cross-block fusion/scheduling in the backward program) and OOMs at
# B=256, so it is opt-in (AVDD_FUSED_TRAIN=1): correctness is fully tested
# (grad parity + droppath behavior in tests/test_fused_block.py).
TRAIN_ENABLED = False

# packed per-channel vector rows (all f32, shape (NV, C))
ROW_LNQ_W, ROW_LNQ_B = 0, 1
ROW_LNK_W, ROW_LNK_B = 2, 3
ROW_LNV_W, ROW_LNV_B = 4, 5
ROW_QCONV = 6   # 3 rows
ROW_KCONV = 9
ROW_VCONV = 12
# q/k/v bias rows carry the FOLDED biases — pack_block_params folds the
# post-conv LN affines into wq/wk/wv and the ln2 affine into wf1/fc1b, so
# those affine vectors are never shipped as rows of their own
ROW_Q_BIAS, ROW_K_BIAS, ROW_V_BIAS, ROW_P_BIAS = 15, 16, 17, 18
ROW_SCALE_ATTN = 19
ROW_FC2_BIAS = 20
ROW_SCALE_MLP = 21
NUM_VEC_ROWS = 22
# fc1 bias (length 4C) travels as its own (1, 4C) input: building it from
# (4, C) vec rows needs a (4,C)->(1,4C) shape cast Mosaic only supports
# when C is lane-aligned (failed at C=16).


def _erf(x):
    """f32 erf as the Eigen rational approximation x*alpha(x^2)/beta(x^2)
    with x clamped to [-4, 4] (max abs err ~5e-7, validated vs lax.erf) —
    Mosaic has no erf primitive, and this form needs no exp/sign/abs, so it
    is ~2x cheaper on the VPU than the Abramowitz-Stegun form."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    a = jnp.float32(-2.72614225801306e-10)
    for cc in (2.77068142495902e-08, -2.10102402082508e-06,
               -5.69250639462346e-05, -7.34990630326855e-04,
               -2.95459980854025e-03, -1.60960333262415e-02):
        a = a * x2 + jnp.float32(cc)
    b = jnp.float32(-1.45660718464996e-05)
    for cc in (-2.13374055278905e-04, -1.68282697438203e-03,
               -7.37332916720468e-03, -1.42647390514189e-02):
        b = b * x2 + jnp.float32(cc)
    return x * a / b


def _gelu_exact(x):
    """0.5 x (1 + erf(x / sqrt(2))) in f32 (jax.nn.gelu approximate=False)."""
    return 0.5 * x * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


# Division-free gelu for the bf16 compute path. The rational _erf's VPU
# division dominates its cost (measured 2.6 ms/block at B=512; this
# polynomial runs the same site at ~1.2 ms — every extra op on the (T, 4C)
# hidden costs ~0.2 ms/block, so the degree is kept minimal). Minimax deg-7
# polynomial for erf(y)/y in t = y^2/4 - 1 (y = x/sqrt2 clamped to
# [-2.83, 2.83]), weighted by the gelu-space error |0.5 x (approx - erf)|:
# max err 3.8e-5 in range; past the clamp the erf factor saturates at
# erf(2.83) = 0.999937, i.e. 3.2e-5 relative on the positive tail and
# |err| <= 3.2e-5 |x| absolute on the (~zero) negative tail. All of it is
# far below bf16 activation rounding (~4e-3 relative), so bf16 outputs are
# indistinguishable from _gelu_exact. The centered variable keeps f32 Horner
# conditioned (monomials in y^2 lose ~4e-4 to cancellation). f32 mode keeps
# _gelu_exact: its tests assert 2e-5 parity against jax.nn.gelu.
_GELU_T_COEFFS = (
    0.49765539169311523, -0.23859895765781403, 0.1585356444120407,
    -0.10322453081607819, 0.06115540862083435, -0.03750486299395561,
    0.023225031793117523, -0.007718835957348347,
)


def _gelu_cheap(x):
    """f32 in/out; gelu = 0.5x + 0.5 x erf(y) with erf(y) = y * P(t)."""
    xc = jnp.clip(x, -4.0, 4.0)
    t = xc * xc * np.float32(1.0 / 8.0) + np.float32(-1.0)
    p = jnp.float32(_GELU_T_COEFFS[-1])
    for cc in _GELU_T_COEFFS[-2::-1]:
        p = p * t + jnp.float32(cc)
    # 0.5 * x * erf(y) = 0.5 * x * (xc / sqrt2) * P = 0.35355 * x * xc * P
    return np.float32(0.5) * x + np.float32(np.sqrt(2.0) / 4.0) * x * (xc * p)


def _gelu(x, cdtype):
    """Dispatch: cheap polynomial under bf16 rounding, exact rational in f32."""
    if cdtype == jnp.bfloat16:
        return _gelu_cheap(x)
    return _gelu_exact(x)


@functools.lru_cache(maxsize=16)
def _head_mats_np(n_embd: int, n_head: int):
    d_head = n_embd // n_head
    c = np.arange(n_embd)
    red = np.zeros((n_embd, 128), np.float32)
    red[c, c // d_head] = 1.0
    exp = np.zeros((128, n_embd), np.float32)
    exp[c // d_head, c] = 1.0
    return red, exp


def _packed_eligible(n_head: int, w: int) -> bool:
    return (n_head & (n_head - 1)) == 0 and (2 * w + 1) * n_head <= 128


@functools.lru_cache(maxsize=16)
def _packed_mats_np(n_embd: int, n_head: int, w: int):
    """Per-offset one-hot matrices placing offset group g = d + w at lanes
    [g*n_head, (g+1)*n_head): red_all[g] reduces head channels into that
    group's lanes, exp_all[g] broadcasts the group's probabilities back to
    head channels; gmat places the (T, 2w+1) shifted kv penalties; smat sums
    exp values across each lane's head class (lane % n_head)."""
    d_head = n_embd // n_head
    n_off = 2 * w + 1
    c = np.arange(n_embd)
    red_all = np.zeros((n_off, n_embd, 128), np.float32)
    exp_all = np.zeros((n_off, 128, n_embd), np.float32)
    for g in range(n_off):
        red_all[g, c, g * n_head + c // d_head] = 1.0
        exp_all[g, g * n_head + c // d_head, c] = 1.0
    gmat = np.zeros((n_off, 128), np.float32)
    for g in range(n_off):
        gmat[g, g * n_head:(g + 1) * n_head] = 1.0
    lane = np.arange(128)
    smat = (lane[:, None] % n_head == lane[None, :] % n_head).astype(np.float32)
    return red_all, exp_all, gmat, smat


@functools.lru_cache(maxsize=16)
def _packed_ok_np(t: int, n_head: int, w: int):
    """(T, 128) additive validity mask: 0 where lane (group g = lane//n_head,
    offset d = g - w) points at a real key row, NEG_INF outside the band /
    sequence or beyond the (2w+1)*n_head used lanes."""
    lane = np.arange(128)[None, :]
    row = np.arange(t)[:, None]
    d = lane // n_head - w
    ok = (lane < (2 * w + 1) * n_head) & (row + d >= 0) & (row + d < t)
    return np.where(ok, 0.0, NEG_INF).astype(np.float32)


def _make_kernel(t: int, c: int, n_head: int, w: int, mode: str, cdtype,
                 packed: bool):
    """mode: 'self' (k = v = q stream), 'kv' (k = v = other stream),
    'qv_k' (k = other stream, v = q stream), 'ds_self' (stride-2 self block:
    x_ref/xo_ref carry the even/odd rows of the full-res stream, t is the
    downsampled length). ``packed``: packed-lane softmax (see PACKED_SOFTMAX)."""

    if cdtype == jnp.bfloat16:
        # one-pass moments (E[x^2] - mu^2): saves a full (T, C) pass per LN
        # site (6 sites/block, measured ~0.24 ms/block at B=512). The
        # cancellation error (~1.2e-7 * (mu/sigma)^2 relative on the
        # variance) is under bf16 rounding for any plausible activation
        # statistics; f32 mode keeps the two-pass form for 2e-5 parity.
        def ln_plain(x):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
            rs = jax.lax.rsqrt(
                jnp.maximum(m2 - mu * mu, 0.0) + LN_EPS)
            return xf * rs - mu * rs
    else:
        def ln_plain(x):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            r = xf - mu
            s2 = jnp.mean(r * r, axis=-1, keepdims=True)
            return r * jax.lax.rsqrt(s2 + LN_EPS)

    def ln(x, vecs, row_w, row_b):
        # affine LN; the qn/kn/vn and ln2 affines are folded into the
        # adjacent dense weights at pack time (pack_block_params), so those
        # sites call ln_plain instead
        return (ln_plain(x) * vecs[row_w][None, :]
                + vecs[row_b][None, :])

    def dwconv(x, vecs, row0, mvalid):
        """Depthwise conv k=3, stride 1, zero pad; output masked."""
        w0 = vecs[row0][None, :]
        w1 = vecs[row0 + 1][None, :]
        w2 = vecs[row0 + 2][None, :]
        xf = x.astype(jnp.float32)
        y = _shift_rows(xf, -1) * w0 + xf * w1 + _shift_rows(xf, 1) * w2
        return y * mvalid

    def kernel(x_ref, xo_ref, m_ref, mT_ref, coef_ref, vecs_ref, wq_ref,
               wk_ref, wv_ref, wp_ref, wf1_ref, wf2_ref, fc1b_ref, red_ref,
               exp_ref, pen_ref, ok_ref, g_ref, s_ref, out_ref):
        x = x_ref[0]                       # (T, C) cdtype
        vecs = vecs_ref[...]               # (NV, C) f32
        mvalid = m_ref[0].astype(jnp.float32)  # (T, 1)
        pen = (mvalid - 1.0) * (-NEG_PENALTY)  # 0 valid / -1e4 masked
        # per-sample droppath coefficients (whole-array SMEM, indexed by the
        # grid step): 1.0 at eval, {0, 1/keep} per residual branch in training
        i = pl.program_id(0)
        coef_attn = coef_ref[i, 0]
        coef_mlp = coef_ref[i, 1]

        # --- pre-LN + depthwise convs + per-stream LN + dense q/k/v ---
        if mode == "ds_self":
            # stride-2 block: x_ref = even rows, xo_ref = odd rows. Channel LN
            # is per-position, so LN(full)[::2] == LN(even) etc.; the stride-2
            # depthwise conv composes from the halves:
            #   y[i] = w0*x[2i-1] + w1*x[2i] + w2*x[2i+1]
            #        = w0*odd[i-1] + w1*even[i] + w2*odd[i]
            xe, xod = x, xo_ref[0]
            le = ln(xe, vecs, ROW_LNQ_W, ROW_LNQ_B).astype(cdtype)
            lo = ln(xod, vecs, ROW_LNQ_W, ROW_LNQ_B).astype(cdtype)

            def dwconv2(row0):
                w0 = vecs[row0][None, :]
                w1 = vecs[row0 + 1][None, :]
                w2 = vecs[row0 + 2][None, :]
                ef, of = le.astype(jnp.float32), lo.astype(jnp.float32)
                y = _shift_rows(of, -1) * w0 + ef * w1 + of * w2
                return y * mvalid

            q = ln_plain(dwconv2(ROW_QCONV).astype(cdtype)).astype(cdtype)
            k = ln_plain(dwconv2(ROW_KCONV).astype(cdtype)).astype(cdtype)
            v = ln_plain(dwconv2(ROW_VCONV).astype(cdtype)).astype(cdtype)
        else:
            if mode == "self":
                lx = ln(x, vecs, ROW_LNQ_W, ROW_LNQ_B).astype(cdtype)
                lq = lk = lv = lx
            else:
                xo = xo_ref[0]
                lq = ln(x, vecs, ROW_LNQ_W, ROW_LNQ_B).astype(cdtype)
                lk = ln(xo, vecs, ROW_LNK_W, ROW_LNK_B).astype(cdtype)
                lv = (ln(x, vecs, ROW_LNV_W, ROW_LNV_B).astype(cdtype)
                      if mode == "qv_k" else
                      ln(xo, vecs, ROW_LNV_W, ROW_LNV_B).astype(cdtype))

            q = ln_plain(dwconv(lq, vecs, ROW_QCONV, mvalid)
                         .astype(cdtype)).astype(cdtype)
            k = ln_plain(dwconv(lk, vecs, ROW_KCONV, mvalid)
                         .astype(cdtype)).astype(cdtype)
            v = ln_plain(dwconv(lv, vecs, ROW_VCONV, mvalid)
                         .astype(cdtype)).astype(cdtype)

        # dense q/k/v in the compute dtype (matches ops/conv.py::Dense —
        # bf16 out with internal f32 accumulation, bf16 bias add)
        def cdot(a, b):
            # Mosaic requires a 32-bit matmul accumulator; f32-accumulate
            # then downcast == XLA's bf16 dot semantics (ops/conv.py::Dense)
            return jnp.dot(a, b, preferred_element_type=jnp.float32
                           ).astype(cdtype)

        q = cdot(q, wq_ref[...]) + vecs[ROW_Q_BIAS][None, :].astype(cdtype)
        k = cdot(k, wk_ref[...]) + vecs[ROW_K_BIAS][None, :].astype(cdtype)
        v = cdot(v, wv_ref[...]) + vecs[ROW_V_BIAS][None, :].astype(cdtype)
        d_head = c // n_head
        q = q * cdtype.type(1.0 / np.sqrt(d_head))
        mvalid_c = mvalid.astype(cdtype)

        red = red_ref[...]                 # (C, 128) one-hot, cdtype
        exp_m = exp_ref[...]               # (128, C) one-hot, cdtype
        row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
        if w <= 0:
            # --- dense attention (window_size -1): per-head (T, T) scores
            # via head-masked NT contractions (ops/attention.py::
            # full_attention semantics: -1e30 fill on invalid keys — no
            # -1e4 penalty in the dense path — f32 softmax, masked values)
            colok = mT_ref[0] > 0.5        # (1, T) key validity
            vm = v * mvalid_c
            ctx = jnp.zeros((t, c), cdtype)
            for h in range(n_head):
                hm = exp_m[h][None, :]     # (1, C) one-hot over head h lanes
                s = jax.lax.dot_general(
                    q * hm, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cdtype)
                sf = jnp.where(colok, s, cdtype.type(NEG_INF)
                               ).astype(jnp.float32)
                mx = jnp.max(sf, axis=-1, keepdims=True)
                e = jnp.exp(sf - mx)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)
                ctx = ctx + jax.lax.dot_general(
                    p, vm * hm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cdtype)
            ctx = ctx * mvalid_c
        elif BAND_VIA_DENSE:
            # --- banded attention as band-masked dense contractions ---
            penT_c = ((mT_ref[0] - 1.0) * (-NEG_PENALTY)).astype(cdtype)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
            colj = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
            inband = jnp.abs(colj - rowi) <= w
            ctx = jnp.zeros((t, c), cdtype)
            for h in range(n_head):
                hm = exp_m[h][None, :]
                s = jax.lax.dot_general(
                    q * hm, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cdtype)
                sf = jnp.where(inband, (s + penT_c).astype(jnp.float32),
                               NEG_INF)
                mx = jnp.max(sf, axis=-1, keepdims=True)
                e = jnp.exp(sf - mx)
                p = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
                     ).astype(cdtype)
                ctx = ctx + jax.lax.dot_general(
                    p, v * hm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(cdtype)
            ctx = ctx * mvalid_c
        elif packed:
            # --- banded attention, packed-lane softmax ---
            # identical math to the per-offset branch below; lane layout
            # group*n_head + head lets one exp / one class-sum matmul / one
            # roll-butterfly max serve all 2w+1 offsets at once.
            acc = jnp.zeros((t, 128), jnp.float32)
            for g, d in enumerate(range(-w, w + 1)):
                e = q * _shift_rows(k, d)
                acc = acc + jnp.dot(e, red_ref[g],
                                    preferred_element_type=jnp.float32)
            # per-offset downcast == one downcast: lane groups are disjoint
            s_c = acc.astype(cdtype)
            # shifted kv penalties arrive as (T, 2w+1); gmat places group g
            # at its n_head lanes (compute-dtype add like the branch below)
            pen_pk = jnp.dot(pen_ref[0], g_ref[...],
                             preferred_element_type=jnp.float32).astype(cdtype)
            sf = (s_c + pen_pk).astype(jnp.float32) + ok_ref[...]
            # class max: roll-butterfly over lanes == head (mod n_head)
            mx = sf
            st = n_head
            while st < 128:
                mx = jnp.maximum(mx, pltpu.roll(mx, st, axis=1))
                st *= 2
            e_all = jnp.exp(sf - mx)
            den = jnp.dot(e_all, s_ref[...],
                          preferred_element_type=jnp.float32)
            p = (e_all * (1.0 / den)).astype(cdtype)
            ctx = jnp.zeros((t, c), cdtype)
            for g, d in enumerate(range(-w, w + 1)):
                ctx = ctx + cdot(p, exp_ref[g]) * _shift_rows(v, d)
            # NaN guard: zero invalid query rows (blocks.py:766-767)
            ctx = ctx * mvalid_c
        else:
            # --- banded attention: per-offset head-reduced scores ---
            # scores in the compute dtype like ops/attention.py::
            # band_attention (bf16 score + bf16 -1e4 penalty), softmax in f32
            pen_c = pen.astype(cdtype)
            scores = []
            for d in range(-w, w + 1):
                e = q * _shift_rows(k, d)
                s = cdot(e, red) + _shift_rows(pen_c, d)
                ok = (row + d >= 0) & (row + d < t)
                scores.append(jnp.where(ok, s.astype(jnp.float32), NEG_INF))
            m = scores[0]
            for s in scores[1:]:
                m = jnp.maximum(m, s)
            exps = [jnp.exp(s - m) for s in scores]
            den = exps[0]
            for e in exps[1:]:
                den = den + e
            inv = 1.0 / den
            ctx = jnp.zeros((t, c), cdtype)
            for i, d in enumerate(range(-w, w + 1)):
                p = ((exps[i] * inv).astype(cdtype))
                pb = cdot(p, exp_m)
                ctx = ctx + pb * _shift_rows(v, d)
            # NaN guard: zero invalid query rows (blocks.py:766-767)
            ctx = ctx * mvalid_c

        # --- proj + residual (layer-scale) --- compute dtype throughout,
        # like the standard path (blocks.py residual adds run in bf16)
        att = cdot(ctx, wp_ref[...]) + vecs[ROW_P_BIAS][None, :].astype(cdtype)
        att = att * mvalid_c               # masked conv-out semantics
        if mode == "ds_self":
            # skip path = MaxPool1d(k=3, s=2, p=1) over the full-res stream
            # (blocks.py:1277-1283; -inf padding)
            om1 = _shift_rows(xo_ref[0], -1)
            om1 = jnp.where(row == 0, cdtype.type(-jnp.inf), om1)
            skip = jnp.maximum(jnp.maximum(om1, x), xo_ref[0])
        else:
            skip = x
        scale_a = (vecs[ROW_SCALE_ATTN][None, :] * coef_attn).astype(cdtype)
        y1 = skip * mvalid_c + att * scale_a

        # --- conv-MLP ---
        h = ln_plain(y1).astype(cdtype)
        h = cdot(h, wf1_ref[...]) + fc1b_ref[...].astype(cdtype)
        h = _gelu(h.astype(jnp.float32), cdtype).astype(cdtype)
        h = cdot(h, wf2_ref[...]) + vecs[ROW_FC2_BIAS][None, :].astype(cdtype)
        h = h * mvalid_c
        y = y1 + h * (vecs[ROW_SCALE_MLP][None, :] * coef_mlp).astype(cdtype)
        out_ref[0] = y.astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "w_overlap", "mode", "interpret"))
def fused_transformer_block(
    x: jnp.ndarray,            # (B, T, C) compute dtype
    xo,                        # (B, T, C) other stream, or None (self mode)
    mask: jnp.ndarray,         # (B, T) bool
    vecs: jnp.ndarray,         # (NUM_VEC_ROWS, C) f32 packed vectors
    wq, wk, wv, wp,            # (C, C) compute dtype
    wf1, wf2,                  # (C, 4C), (4C, C) compute dtype
    fc1b,                      # (1, 4C) f32 fc1 bias
    *,
    n_head: int,
    w_overlap: int,
    mode: str,
    interpret: bool = False,
    coefs=None,                # (B, 2) f32 droppath coefs, or None (ones)
) -> jnp.ndarray:
    b, t, c = x.shape
    cdtype = x.dtype
    mrow = mask.astype(jnp.float32)[..., None]      # (B, T, 1)
    mrowT = mask.astype(jnp.float32)[:, None, :]    # (B, 1, T) for dense
    if xo is None:
        xo = x[:, :1, :1]                           # 1-element dummy
    if coefs is None:
        coefs = jnp.ones((b, 2), jnp.float32)

    w = w_overlap
    packed = (PACKED_SOFTMAX and w > 0 and not BAND_VIA_DENSE
              and _packed_eligible(n_head, w))
    if packed:
        n_off = 2 * w + 1
        red_np, exp_np, g_np, s_np = _packed_mats_np(c, n_head, w)
        red = jnp.asarray(red_np, cdtype)
        exp_m = jnp.asarray(exp_np, cdtype)
        gmat = jnp.asarray(g_np, cdtype)
        smat = jnp.asarray(s_np, jnp.float32)
        ok_add = jnp.asarray(_packed_ok_np(t, n_head, w), jnp.float32)
        # shifted kv penalties, one lane per offset (cheap fused XLA prologue)
        pen_col = ((mrow - 1.0) * (-NEG_PENALTY)).astype(cdtype)  # (B, T, 1)
        penp = jnp.concatenate(
            [_shift_rows(pen_col, d) for d in range(-w, w + 1)], axis=-1)
        red_spec, exp_spec = ((n_off, c, 128),), ((n_off, 128, c),)
        pen_spec = pl.BlockSpec((1, t, n_off), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        ok_spec, g_spec, s_spec = ((t, 128),), ((n_off, 128),), ((128, 128),)
    else:
        red_np, exp_np = _head_mats_np(c, n_head)
        red = jnp.asarray(red_np, cdtype)
        exp_m = jnp.asarray(exp_np, cdtype)
        gmat = jnp.zeros((1, 1), cdtype)
        smat = jnp.zeros((1, 1), jnp.float32)
        ok_add = jnp.zeros((1, 1), jnp.float32)
        penp = jnp.zeros((1, 1, 1), cdtype)
        red_spec, exp_spec = ((c, 128),), ((128, c),)
        pen_spec = pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        ok_spec, g_spec, s_spec = ((1, 1),), ((1, 1),), ((1, 1),)

    kernel = _make_kernel(t, c, n_head, w_overlap, mode, cdtype, packed)
    xspec = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    xospec = (xspec if mode != "self" else
              pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM))
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            xspec,
            xospec,
            pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            wspec((NUM_VEC_ROWS, c)),
            wspec((c, c)), wspec((c, c)), wspec((c, c)), wspec((c, c)),
            wspec((c, 4 * c)), wspec((4 * c, c)),
            wspec((1, 4 * c)),
            wspec(red_spec[0]), wspec(exp_spec[0]),
            pen_spec, wspec(ok_spec[0]), wspec(g_spec[0]), wspec(s_spec[0]),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), cdtype),
        # the unrolled offsets keep several (T, C) f32 temporaries live at
        # once; the f32 variant needs more than the 16 MB default scoped
        # limit (v5e has 128 MB of physical VMEM per core)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, xo, mrow, mrowT, coefs, vecs, wq, wk, wv, wp, wf1, wf2, fc1b, red,
      exp_m, penp, ok_add, gmat, smat)


def block_math(x, xo, mrow, coefs, vecs, wq, wk, wv, wp, wf1, wf2, fc1b,
               *, n_head: int, w_overlap: int, mode: str) -> jnp.ndarray:
    """Pure-jnp mirror of the kernel math on batched ``(B, T, C)`` inputs —
    op-for-op and dtype-for-dtype the same computation, so its ``jax.vjp`` is
    the correct backward for the kernel. Used as the recompute path of
    ``fused_transformer_block_train`` (remat semantics: only the inputs are
    saved; XLA materializes one block's intermediates during its backward)."""
    w = w_overlap
    cdtype = x.dtype
    b, t, c = x.shape
    red_np, exp_np = _head_mats_np(c, n_head)
    red = jnp.asarray(red_np, cdtype)
    exp_m = jnp.asarray(exp_np, cdtype)
    mvalid = mrow                                    # (B, T, 1) f32
    pen = (mvalid - 1.0) * (-NEG_PENALTY)
    coef_attn = coefs[:, 0][:, None, None]           # (B, 1, 1)
    coef_mlp = coefs[:, 1][:, None, None]

    if cdtype == jnp.bfloat16:
        # one-pass moments, matching the kernel's bf16 ln_plain exactly
        def ln_plain(xx):
            xf = xx.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
            rs = jax.lax.rsqrt(jnp.maximum(m2 - mu * mu, 0.0) + LN_EPS)
            return xf * rs - mu * rs
    else:
        def ln_plain(xx):
            xf = xx.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            r = xf - mu
            s2 = jnp.mean(r * r, axis=-1, keepdims=True)
            return r * jax.lax.rsqrt(s2 + LN_EPS)

    def ln(xx, row_w, row_b):
        y = ln_plain(xx)
        return y * vecs[row_w][None, None, :] + vecs[row_b][None, None, :]

    def dwconv(xx, row0):
        w0 = vecs[row0][None, None, :]
        w1 = vecs[row0 + 1][None, None, :]
        w2 = vecs[row0 + 2][None, None, :]
        xf = xx.astype(jnp.float32)
        y = _shift_rows(xf, -1) * w0 + xf * w1 + _shift_rows(xf, 1) * w2
        return y * mvalid

    if mode == "ds_self":
        le = ln(x, ROW_LNQ_W, ROW_LNQ_B).astype(cdtype)
        lo = ln(xo, ROW_LNQ_W, ROW_LNQ_B).astype(cdtype)

        def dwconv2(row0):
            w0 = vecs[row0][None, None, :]
            w1 = vecs[row0 + 1][None, None, :]
            w2 = vecs[row0 + 2][None, None, :]
            ef, of = le.astype(jnp.float32), lo.astype(jnp.float32)
            y = _shift_rows(of, -1) * w0 + ef * w1 + of * w2
            return y * mvalid

        q = ln_plain(dwconv2(ROW_QCONV).astype(cdtype)).astype(cdtype)
        k = ln_plain(dwconv2(ROW_KCONV).astype(cdtype)).astype(cdtype)
        v = ln_plain(dwconv2(ROW_VCONV).astype(cdtype)).astype(cdtype)
    else:
        if mode == "self":
            lq = lk = lv = ln(x, ROW_LNQ_W, ROW_LNQ_B).astype(cdtype)
        else:
            lq = ln(x, ROW_LNQ_W, ROW_LNQ_B).astype(cdtype)
            lk = ln(xo, ROW_LNK_W, ROW_LNK_B).astype(cdtype)
            lv = (ln(x, ROW_LNV_W, ROW_LNV_B).astype(cdtype)
                  if mode == "qv_k" else
                  ln(xo, ROW_LNV_W, ROW_LNV_B).astype(cdtype))
        q = ln_plain(dwconv(lq, ROW_QCONV).astype(cdtype)).astype(cdtype)
        k = ln_plain(dwconv(lk, ROW_KCONV).astype(cdtype)).astype(cdtype)
        v = ln_plain(dwconv(lv, ROW_VCONV).astype(cdtype)).astype(cdtype)

    def cdot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(cdtype)

    q = cdot(q, wq) + vecs[ROW_Q_BIAS].astype(cdtype)
    k = cdot(k, wk) + vecs[ROW_K_BIAS].astype(cdtype)
    v = cdot(v, wv) + vecs[ROW_V_BIAS].astype(cdtype)
    d_head = c // n_head
    q = q * cdtype.type(1.0 / np.sqrt(d_head))
    mvalid_c = mvalid.astype(cdtype)

    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    if w <= 0:
        # dense attention (window_size -1), kernel-identical math
        colok = mvalid[..., 0][:, None, :] > 0.5        # (B, 1, T)
        vm = v * mvalid_c
        ctx = jnp.zeros((b, t, c), cdtype)
        for h in range(n_head):
            hm = exp_m[h][None, None, :]
            s = jnp.einsum("btc,bsc->bts", q * hm, k,
                           preferred_element_type=jnp.float32).astype(cdtype)
            sf = jnp.where(colok, s, cdtype.type(NEG_INF)).astype(jnp.float32)
            mx = jnp.max(sf, axis=-1, keepdims=True)
            e = jnp.exp(sf - mx)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)
            ctx = ctx + jnp.einsum(
                "bts,bsc->btc", p, vm * hm,
                preferred_element_type=jnp.float32).astype(cdtype)
        ctx = ctx * mvalid_c
    elif BAND_VIA_DENSE:
        penT_c = ((jnp.swapaxes(mvalid, -1, -2) - 1.0)
                  * (-NEG_PENALTY)).astype(cdtype)      # (B, 1, T)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        colj = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        inband = (jnp.abs(colj - rowi) <= w)[None]
        ctx = jnp.zeros((b, t, c), cdtype)
        for h in range(n_head):
            hm = exp_m[h][None, None, :]
            s = jnp.einsum("btc,bsc->bts", q * hm, k,
                           preferred_element_type=jnp.float32).astype(cdtype)
            sf = jnp.where(inband, (s + penT_c).astype(jnp.float32), NEG_INF)
            mx = jnp.max(sf, axis=-1, keepdims=True)
            e = jnp.exp(sf - mx)
            p = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))).astype(cdtype)
            ctx = ctx + jnp.einsum(
                "bts,bsc->btc", p, v * hm,
                preferred_element_type=jnp.float32).astype(cdtype)
        ctx = ctx * mvalid_c
    else:
        pen_c = pen.astype(cdtype)
        scores = []
        for d in range(-w, w + 1):
            e = q * _shift_rows(k, d)
            s = cdot(e, red) + _shift_rows(pen_c, d)
            ok = (row + d >= 0) & (row + d < t)
            scores.append(jnp.where(ok[None], s.astype(jnp.float32), NEG_INF))
        m = scores[0]
        for s in scores[1:]:
            m = jnp.maximum(m, s)
        exps = [jnp.exp(s - m) for s in scores]
        den = exps[0]
        for e in exps[1:]:
            den = den + e
        inv = 1.0 / den
        ctx = jnp.zeros((b, t, c), cdtype)
        for i, d in enumerate(range(-w, w + 1)):
            p = (exps[i] * inv).astype(cdtype)
            pb = cdot(p, exp_m)
            ctx = ctx + pb * _shift_rows(v, d)
        ctx = ctx * mvalid_c

    att = cdot(ctx, wp) + vecs[ROW_P_BIAS].astype(cdtype)
    att = att * mvalid_c
    if mode == "ds_self":
        om1 = _shift_rows(xo, -1)
        om1 = jnp.where(row[None] == 0, cdtype.type(-jnp.inf), om1)
        skip = jnp.maximum(jnp.maximum(om1, x), xo)
    else:
        skip = x
    scale_a = (vecs[ROW_SCALE_ATTN][None, None, :] * coef_attn).astype(cdtype)
    y1 = skip * mvalid_c + att * scale_a

    h = ln_plain(y1).astype(cdtype)
    h = cdot(h, wf1) + fc1b[0].astype(cdtype)
    h = _gelu(h.astype(jnp.float32), cdtype).astype(cdtype)
    h = cdot(h, wf2) + vecs[ROW_FC2_BIAS].astype(cdtype)
    h = h * mvalid_c
    y = y1 + h * (vecs[ROW_SCALE_MLP][None, None, :] * coef_mlp).astype(cdtype)
    return y.astype(cdtype)


@functools.lru_cache(maxsize=64)
def _trainable_block(n_head: int, w_overlap: int, mode: str, interpret: bool):
    """custom_vjp wrapper: forward = the pallas kernel, backward = jax.vjp of
    the jnp mirror (recomputes the forward in XLA — remat semantics, so the
    training memory profile matches activation checkpointing)."""

    @jax.custom_vjp
    def f(x, xo, mrow, coefs, vecs, wq, wk, wv, wp, wf1, wf2, fc1b):
        mask = mrow[..., 0] > 0.5
        return fused_transformer_block(
            x, xo, mask, vecs, wq, wk, wv, wp, wf1, wf2, fc1b,
            n_head=n_head, w_overlap=w_overlap, mode=mode,
            interpret=interpret, coefs=coefs)

    def f_fwd(*args):
        return f(*args), args

    def f_bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: block_math(*a, n_head=n_head, w_overlap=w_overlap,
                                  mode=mode), *res)
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_transformer_block_train(
        x, xo, mask, coefs, vecs, wq, wk, wv, wp, wf1, wf2, fc1b,
        *, n_head: int, w_overlap: int, mode: str, interpret: bool = False):
    """Differentiable fused block: pallas forward + XLA-recompute backward.
    ``coefs`` is the (B, 2) per-sample droppath coefficient pair
    (attn branch, mlp branch): 1.0 deterministic, {0, 1/keep} stochastic."""
    mrow = mask.astype(jnp.float32)[..., None]
    if xo is None:
        xo = x[:, :1, :1]
    return _trainable_block(n_head, w_overlap, mode, interpret)(
        x, xo, mrow, coefs, vecs, wq, wk, wv, wp, wf1, wf2, fc1b)


def pack_block_params(params, n_embd: int, cross: bool, cdtype):
    """Pack a TransformerBlock param subtree (flax dict) into the kernel's
    (vecs, wq, wk, wv, wp, wf1, wf2, fc1b) inputs. Layout must match models/blocks.py
    param names exactly."""
    c = n_embd
    attn = params["attn"]

    def vec(p):
        return jnp.asarray(p, jnp.float32).reshape(c)

    if cross:
        lnq_w, lnq_b = vec(params["lnq"]["weight"]), vec(params["lnq"]["bias"])
        lnk_w, lnk_b = vec(params["lnk"]["weight"]), vec(params["lnk"]["bias"])
        lnv_w, lnv_b = vec(params["lnv"]["weight"]), vec(params["lnv"]["bias"])
    else:
        lnq_w, lnq_b = vec(params["ln1"]["weight"]), vec(params["ln1"]["bias"])
        lnk_w, lnk_b, lnv_w, lnv_b = lnq_w, lnq_b, lnq_w, lnq_b

    def conv_taps(name):
        kern = attn[name]["kernel"]                 # (3, 1, C)
        return jnp.asarray(kern, jnp.float32).reshape(3, c)

    # fold the post-conv LN affines (query_norm/key_norm/value_norm) and the
    # ln2 affine into the adjacent dense weights: LN_aff(y) @ W + b ==
    # LN_plain(y) @ (g*W) + (b_ln @ W + b). Pure reassociation — saves four
    # (T, C) affine passes per block in the kernel; the kernel/mirror call
    # ln_plain at these sites, and the folded biases ride the Q/K/V bias rows
    # (the raw affine vectors are never shipped).
    def fold(norm_w, norm_b, kernel, bias):
        wf = jnp.asarray(kernel, jnp.float32)
        g = jnp.asarray(norm_w, jnp.float32).reshape(-1)
        bl = jnp.asarray(norm_b, jnp.float32).reshape(-1)
        return (g[:, None] * wf).astype(cdtype), bl @ wf + jnp.asarray(
            bias, jnp.float32).reshape(-1)

    wq, q_bias = fold(attn["query_norm"]["weight"], attn["query_norm"]["bias"],
                      attn["query"]["kernel"], attn["query"]["bias"])
    wk, k_bias = fold(attn["key_norm"]["weight"], attn["key_norm"]["bias"],
                      attn["key"]["kernel"], attn["key"]["bias"])
    wv, v_bias = fold(attn["value_norm"]["weight"], attn["value_norm"]["bias"],
                      attn["value"]["kernel"], attn["value"]["bias"])
    wf1, fc1b_row = fold(params["ln2"]["weight"], params["ln2"]["bias"],
                         params["mlp_fc1"]["kernel"], params["mlp_fc1"]["bias"])

    rows = [
        lnq_w, lnq_b, lnk_w, lnk_b, lnv_w, lnv_b,
    ]
    rows += list(conv_taps("query_conv"))
    rows += list(conv_taps("key_conv"))
    rows += list(conv_taps("value_conv"))
    rows += [
        q_bias, k_bias, v_bias, vec(attn["proj"]["bias"]),
        vec(params["drop_path_attn"]["scale"]),
        vec(params["mlp_fc2"]["bias"]),
        vec(params["drop_path_mlp"]["scale"]),
    ]
    vecs = jnp.stack(rows)
    fc1b = fc1b_row.reshape(1, 4 * c)

    wp = jnp.asarray(attn["proj"]["kernel"], cdtype)
    wf2 = jnp.asarray(params["mlp_fc2"]["kernel"], cdtype)
    return vecs, wq, wk, wv, wp, wf1, wf2, fc1b
