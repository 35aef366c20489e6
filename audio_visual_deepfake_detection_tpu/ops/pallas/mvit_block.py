"""Fused whole-MultiscaleBlock kernel (Pallas/TPU) for MViT-v2 stages 2-4.

The round-4 stage-cumulative bisection (BENCH_NOTES) pinned the remaining
MViT-v2-b cost in the narrow-grid stages: 19 stage-3/4 blocks at
~11.5 ms/chunk against a ~1.5 ms floor, with the cost spread over ~15 small
XLA fusions per block (pools, qkv relayouts, score glue, MLP) — no single
op dominates, so no XLA-level rewrite and no attention-only kernel
(ops/pallas/mvit_attention.py, measured a wash) can reclaim it. This kernel
runs ONE grid step per chunk per block with everything resident in VMEM:
pre-LN -> fused qkv dense -> the three TokenPool depthwise conv3d +
group-LN pools -> pooled attention with the decomposed temporal rel-pos
bias -> residual pooling -> output projection -> residual -> LN -> MLP ->
residual. HBM traffic is one read of the (N, C) block input + the weights
and one write of the output. Measured round 5: mvit_v2_b full forward
23.3 -> 16.3 ms/chunk (hybrid, 16 chunks, bf16, v5e).

Eligibility (frontends/mvit.py::MultiscaleBlock dispatch): stride_q =
(1,1,1), kernel_q = kernel_kv = (3,3,3), temporal kv stride 1, k/v pooled to
a (T, 1, 1) grid (so the spatial rel-pos terms are constant along the k axis
and drop — the khw==1 branch of MultiscaleAttention), input_channels ==
output_channels, head_dim <= 128. At the production geometry
(video_encoder.py:65-170: mvit_v2_b on 512-frame 96x96 chunks) that covers
blocks 3-4 (stage 2: C=192, 2 heads, (512,4,4) grid), 6-20 (stage 3: C=384,
4 heads, (512,2,2)) and 22-23 (stage 4: C=768, 8 heads, (512,1,1)) — 19 of
the 22 stage-2/3/4 blocks; the three stride-q transition blocks stay XLA.

TPU design notes:
- tokens stay in the native (N, C) = (1 + T*S, C) layout (t-major, spatial
  minor). Channel counts that are not lane multiples (stage 2's 192) are
  zero-PADDED to the next multiple of 128 by the wrapper; all constants
  (head selects, LN reduce mats, tap vectors, weights) carry zeros on the
  pad lanes, so padded lanes stay exactly zero through the whole block.
- the depthwise pool convs run in a (T, S*C) re-layout (legal Mosaic
  reshape: padded C is a lane multiple): temporal taps are sublane shifts,
  spatial taps are static lane-block rotates weighted by pre-tiled tap
  vectors. Only spatial offsets that carry any weight are visited (9 of 31
  at stage 2's 4x4 grid); the cls row bypasses the conv and rejoins for
  the pool LN, whose per-head statistics ride block-diagonal
  reduce/broadcast matmuls.
- per-head attention runs in a 128-lane head space: q/k/v head columns are
  extracted with constant 0/1 selection matmuls (exact — one nonzero per
  output element), scores/softmax follow the XLA path's dtype contract
  (cdtype scores with f32 statistics, denominator applied to the output),
  and the head result is placed back with the transposed selection.
- the temporal rel-pos bias band[n, k] = q[n] . rel_t[t_n - k + T - 1] is
  built in-kernel: one matmul against the lane-REVERSED table G'[n, l] =
  q[n] . rel_t[2T-2-l], then a log2(T)-step masked-roll shear (row n
  left-rotates by T-1-t_n; rotation never wraps into used lanes because
  k + (T-1-t_n) <= 2T-2). The shear runs in f32 (Mosaic's rotate is
  32-bit-only); a shear is a pure permutation, so downcasting after it is
  bit-identical to the XLA path's shear-of-downcast-G
  (frontends/mvit.py::_toeplitz_band, whose flatten/re-slice form Mosaic
  cannot express).

Numerics match the XLA MultiscaleAttention/MultiscaleBlock path op-for-op
(f32 norm statistics, cdtype matmuls with f32 accumulation, f32 softmax
statistics, exp downcast before the value contraction); f32 mode differs
only by f32 reassociation, bf16 mode by under-rounding noise.

Reference behavior being reimplemented: torchvision MultiscaleBlock as
configured by video_feature/aligned_video/model/video_encoder.py:65-170.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .band_attention import _shift_rows
from .fused_block import _gelu

# Flipped on by core.runtime.setup_jax on TPU (AVDD_FUSED_MVIT_BLOCK=0
# disables). frontends/mvit.py::MultiscaleBlock consults this at trace time.
ENABLED = False
# Tests set this to route the same dispatch through the pallas interpreter
# on CPU (kernel semantics without TPU hardware).
INTERPRET = False
# Largest spatial token count (hs*ws) the dispatch accepts. Stage 3/4
# (s in {1, 4}) are the measured win; stage 2 (s=16, N=8193 rows) drove the
# remote Mosaic compile past an hour on the tunneled v5e, so it is gated
# OUT by default — set 16 to include it (tests exercise it in interpreter
# mode either way).
MAX_SPATIAL = 4

LN_EPS = 1e-6

# packed per-channel vector rows (all f32, shape (NV, Cp))
ROW_LN1_W, ROW_LN1_B = 0, 1
ROW_PLQ_W, ROW_PLQ_B = 2, 3
ROW_PLK_W, ROW_PLK_B = 4, 5
ROW_PLV_W, ROW_PLV_B = 6, 7
ROW_BQ, ROW_BK, ROW_BV = 8, 9, 10
ROW_BP = 11
ROW_LN2_W, ROW_LN2_B = 12, 13
ROW_BFC2 = 14
NUM_VEC_ROWS = 15


def _pad_c(c: int) -> int:
    return -(-c // 128) * 128


@functools.lru_cache(maxsize=16)
def _head_sel_np(cp: int, nh: int, d: int):
    """(nh, Cp, 128) head-column extraction + (nh, 128, Cp) placement 0/1
    matrices: head h's real channels [h*d, (h+1)*d) <-> lanes [0, d)."""
    sel = np.zeros((nh, cp, 128), np.float32)
    exp = np.zeros((nh, 128, cp), np.float32)
    for h in range(nh):
        for dd in range(d):
            sel[h, h * d + dd, dd] = 1.0
            exp[h, dd, h * d + dd] = 1.0
    return sel, exp


@functools.lru_cache(maxsize=16)
def _group_ln_mats_np(cp: int, nh: int, d: int):
    """Block-diagonal reduce/broadcast for per-head (d-channel) LN stats;
    pad lanes reduce to nothing and broadcast nothing (they stay zero)."""
    red = np.zeros((cp, 128), np.float32)
    exp = np.zeros((128, cp), np.float32)
    for h in range(nh):
        for dd in range(d):
            red[h * d + dd, h] = 1.0 / d
            exp[h, h * d + dd] = 1.0
    return red, exp


def _roll_lanes(x: jnp.ndarray, amt: int) -> jnp.ndarray:
    """Left-rotate lanes by ``amt`` (out[:, i] = in[:, (i + amt) % L]).
    Mosaic's rotate only supports 32-bit element types — callers roll f32."""
    ln = x.shape[-1]
    return pltpu.roll(x, (ln - amt) % ln, axis=x.ndim - 1)


def _make_kernel(t: int, s: int, cp: int, c_real: int, nh: int, cdtype,
                 q_plan, kv_plan):
    """q_plan: tuple of (ds, (ti, ...)) spatial-offset groups with their
    temporal taps, matching qtap row order; kv_plan: tuple of
    (ti, (si, ...)) temporal groups with their source spatial cells,
    matching k/vtap row order. Only weight-carrying terms appear."""
    n = 1 + t * s
    d = c_real // nh
    scale = d ** -0.5
    inv_c = 1.0 / c_real
    tbits = max(1, int(t - 1).bit_length())

    def ln_rows(z):
        """Row LN over the REAL channels (pad lanes are zero and excluded
        from the mean via the 1/c_real scaling), f32 stats, fast-variance
        clamped at 0 (flax)."""
        zf = z.astype(jnp.float32)
        mu = jnp.sum(zf, axis=-1, keepdims=True) * inv_c
        m2 = jnp.sum(zf * zf, axis=-1, keepdims=True) * inv_c
        var = jnp.maximum(m2 - mu * mu, 0.0)
        return (zf - mu) * jax.lax.rsqrt(var + LN_EPS)

    def cdot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32
                       ).astype(cdtype)

    def kernel(x_ref, vecs_ref, wqkv_ref, wp_ref, wf1_ref, wf2_ref,
               fc1b_ref, qtap_ref, ktap_ref, vtap_ref, rt_ref, sel_ref,
               exp_ref, red_ref, gexp_ref, out_ref):
        x = x_ref[0]                        # (N, Cp) cdtype
        vecs = vecs_ref[...]                # (NV, Cp) f32
        row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        row_kv = jax.lax.broadcasted_iota(jnp.int32, (t + 1, 1), 0)

        # ln1 affine rows are zero on pad lanes, so xln pad lanes are zero
        # even though ln_rows' normalization is nonzero there
        xln = (ln_rows(x) * vecs[ROW_LN1_W][None]
               + vecs[ROW_LN1_B][None]).astype(cdtype)
        qkv = cdot(xln, wqkv_ref[...])      # (N, 3Cp)
        q0 = qkv[:, :cp] + vecs[ROW_BQ][None].astype(cdtype)
        k0 = qkv[:, cp:2 * cp] + vecs[ROW_BK][None].astype(cdtype)
        v0 = qkv[:, 2 * cp:] + vecs[ROW_BV][None].astype(cdtype)

        def group_ln(z):
            """Per-head LN (no affine) on (M, Cp) — stats via block-diag
            reduce (C->head lanes) + broadcast (head lanes->C) matmuls."""
            zf = z.astype(jnp.float32)
            mu = jnp.dot(jnp.dot(zf, red_ref[...],
                                 preferred_element_type=jnp.float32),
                         gexp_ref[...], preferred_element_type=jnp.float32)
            m2 = jnp.dot(jnp.dot(zf * zf, red_ref[...],
                                 preferred_element_type=jnp.float32),
                         gexp_ref[...], preferred_element_type=jnp.float32)
            var = jnp.maximum(m2 - mu * mu, 0.0)
            return (zf - mu) * jax.lax.rsqrt(var + LN_EPS)

        def pool_q(z, taps, lnw, lnb):
            """Depthwise conv3d k=(3,3,3) s=1 p=1 over the (t, hs, ws) grid
            (cls row bypasses), then per-head LN + affine. Spatial taps are
            lane-block rotates in the (T, S*Cp) layout; sources that would
            wrap or fall outside the 3x3 window carry zero tap weight."""
            cls = z[0:1]
            g = z[1:]
            g2 = g.reshape(t, s * cp) if s > 1 else g
            g2f = g2.astype(jnp.float32)
            acc = jnp.zeros((t, s * cp), jnp.float32)
            ri = 0
            for ds_, tis in q_plan:
                rf = _roll_lanes(g2f, ds_ * cp) if ds_ else g2f
                for ti in tis:
                    acc = acc + _shift_rows(rf, ti - 1) \
                        * taps[ri][None].astype(jnp.float32)
                    ri += 1
            gout = acc.reshape(t * s, cp) if s > 1 else acc
            padded = jnp.pad(gout.astype(cdtype), ((1, 0), (0, 0)))
            full = jnp.where(row == 0, cls, padded)
            y = (group_ln(full) * vecs[lnw][None] + vecs[lnb][None])
            return y.astype(cdtype)

        def pool_kv(z, taps, lnw, lnb):
            """Depthwise conv3d pooling the spatial grid to (t, 1, 1); the
            (T, Cp) output rejoins the cls row as [cls; grid] like
            TokenPool's _prepend_token, then per-head LN + affine."""
            cls = z[0:1]
            g = z[1:]
            g2 = g.reshape(t, s * cp) if s > 1 else g
            acc = jnp.zeros((t, cp), jnp.float32)
            ri = 0
            for ti, sis in kv_plan:
                sh = _shift_rows(g2, ti - 1).astype(jnp.float32)
                for si in sis:
                    acc = acc + sh[:, si * cp:(si + 1) * cp] \
                        * taps[ri][None].astype(jnp.float32)
                    ri += 1
            padded = jnp.pad(acc.astype(cdtype), ((1, 0), (0, 0)))
            full = jnp.where(row_kv == 0, cls, padded)   # (T+1, Cp)
            y = (group_ln(full) * vecs[lnw][None] + vecs[lnb][None])
            return y.astype(cdtype)

        qp = pool_q(q0, qtap_ref[...], ROW_PLQ_W, ROW_PLQ_B)   # (N, Cp)
        kp = pool_kv(k0, ktap_ref[...], ROW_PLK_W, ROW_PLK_B)  # (T+1, Cp)
        vp = pool_kv(v0, vtap_ref[...], ROW_PLV_W, ROW_PLV_B)
        kc, kg = kp[0:1], kp[1:]
        vc, vg = vp[0:1], vp[1:]

        # left-rotate amount for the shear: T-1 - t(row); row 0 (cls) gets
        # an arbitrary in-range amount — its band is masked below
        tq = jnp.clip((row - 1) // s, 0, t - 1)
        a_amt = (t - 1) - tq

        ctx = jnp.zeros((n, cp), cdtype)
        for h in range(nh):
            sel_h = sel_ref[h]              # (Cp, 128) 0/1
            qh = cdot(qp, sel_h)            # (N, 128) head cols at lanes 0:d
            kh = cdot(kg, sel_h)            # (T, 128)
            vh = cdot(vg, sel_h)
            kch = cdot(kc, sel_h)           # (1, 128)
            vch = cdot(vc, sel_h)
            # q pre-scaled in the compute dtype, like the XLA einsum
            qs = qh * cdtype.type(scale)
            sc = jax.lax.dot_general(
                qs, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (N, T) f32
            # rel-pos band: reversed-table matmul + masked-roll shear (f32;
            # downcast-after-shear == the XLA shear-of-downcast-G exactly)
            g_all = jnp.dot(qh, rt_ref[...],
                            preferred_element_type=jnp.float32)  # (N, 2T)
            for b_ in range(tbits):
                amt = 1 << b_
                bit = ((a_amt >> b_) & 1) == 1            # (N, 1)
                g_all = jnp.where(bit, _roll_lanes(g_all, amt), g_all)
            band = g_all[:, :t].astype(cdtype).astype(jnp.float32)
            sc = sc + jnp.where(row == 0, 0.0, band)
            # cls-key column as a broadcast multiply + lane reduce (a
            # (N,128)x(1,128) dot_general trips a Mosaic bf16->f32
            # vector.broadcast verification bug)
            s_cls = jnp.sum(
                qs.astype(jnp.float32) * kch.astype(jnp.float32),
                axis=-1, keepdims=True)                   # (N, 1)
            m = jnp.maximum(jnp.max(sc, axis=-1, keepdims=True), s_cls)
            e = jnp.exp(sc - m).astype(cdtype)
            ec = jnp.exp(s_cls - m).astype(cdtype)
            z = (jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
                 + ec.astype(jnp.float32))
            o = jax.lax.dot_general(
                e, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (N, 128) f32
            o = o + ec.astype(jnp.float32) * vch.astype(jnp.float32)
            o = (o / z).astype(cdtype)
            ctx = ctx + cdot(o, exp_ref[h])               # place head cols
        # residual pooling: grid rows get +q (residual_with_cls_embed=False)
        ctx = jnp.where(row == 0, ctx, ctx + qp)

        att = cdot(ctx, wp_ref[...]) + vecs[ROW_BP][None].astype(cdtype)
        y1 = x + att

        h2 = (ln_rows(y1) * vecs[ROW_LN2_W][None]
              + vecs[ROW_LN2_B][None]).astype(cdtype)
        hh = cdot(h2, wf1_ref[...]) + fc1b_ref[...].astype(cdtype)
        # Mosaic has no erf primitive: exact rational erf in f32 mode, the
        # sub-bf16-rounding minimax polynomial in bf16 (fused_block._gelu)
        hh = _gelu(hh.astype(jnp.float32), cdtype)
        hh = cdot(hh.astype(cdtype), wf2_ref[...]) \
            + vecs[ROW_BFC2][None].astype(cdtype)
        out_ref[0] = (y1 + hh).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("t", "s", "n_head", "q_plan", "kv_plan",
                                    "interpret"))
def fused_multiscale_block(x, vecs, wqkv, wp, wf1, wf2, fc1b, qtap, ktap,
                           vtap, rt, *, t: int, s: int, n_head: int,
                           q_plan, kv_plan, interpret: bool = False):
    """x: (B, 1 + t*s, C) cdtype; returns the block output, same shape.
    One grid step per batch element (chunk) — the whole block in one VMEM
    residency. See pack_msblock_params for the packed-weight layout and
    the static q_plan/kv_plan term lists."""
    b, n, c_real = x.shape
    assert n == 1 + t * s, (n, t, s)
    cdtype = x.dtype
    cp = _pad_c(c_real)
    if cp != c_real:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c_real)))

    d = c_real // n_head
    sel_np, expd_np = _head_sel_np(cp, n_head, d)
    red_np, gexp_np = _group_ln_mats_np(cp, n_head, d)
    sel = jnp.asarray(sel_np, cdtype)
    expd = jnp.asarray(expd_np, cdtype)
    red = jnp.asarray(red_np, jnp.float32)
    gexp = jnp.asarray(gexp_np, jnp.float32)

    kernel = _make_kernel(t, s, cp, c_real, n_head, cdtype, q_plan, kv_plan)
    xspec = pl.BlockSpec((1, n, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            xspec,
            wspec((NUM_VEC_ROWS, cp)),
            wspec((cp, 3 * cp)), wspec((cp, cp)),
            wspec((cp, 4 * c_real)), wspec((4 * c_real, cp)),
            wspec((1, 4 * c_real)),
            wspec(qtap.shape), wspec(ktap.shape), wspec(vtap.shape),
            wspec((128, 2 * t)),
            wspec((n_head, cp, 128)), wspec((n_head, 128, cp)),
            wspec((cp, 128)), wspec((128, cp)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, n, cp), cdtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, vecs, wqkv, wp, wf1, wf2, fc1b, qtap, ktap, vtap, rt, sel, expd,
      red, gexp)
    return out[:, :, :c_real] if cp != c_real else out


def pack_msblock_params(params, c: int, n_head: int, t: int, s: int,
                        grid_hw, cdtype):
    """Pack a MultiscaleBlock param subtree (frontends/mvit.py names) into
    the kernel inputs + the static (q_plan, kv_plan) term lists. ``t``/``s``
    are the RUNTIME temporal/spatial token counts (the rel-pos table is
    sliced to rel_t[:2t-1] exactly like the XLA Toeplitz branch);
    ``grid_hw`` is the (hs, ws) spatial grid shape. Channel vectors and
    matrices are zero-padded to the 128-lane multiple the kernel runs at."""
    hs, ws = grid_hw
    assert hs * ws == s, (grid_hw, s)
    attn = params["attn"]
    d = c // n_head
    cp = _pad_c(c)

    def vec(p):
        v = jnp.asarray(p, jnp.float32).reshape(-1)
        return jnp.pad(v, (0, cp - c)) if cp != c else v

    def tiled(p):
        return vec(jnp.tile(jnp.asarray(p, jnp.float32).reshape(d), n_head))

    def mat(p, pad_cols: bool = True):
        w = jnp.asarray(p, cdtype)
        if cp == c:
            return w
        pr = cp - c if w.shape[0] == c else 0
        pc = cp - c if (pad_cols and w.shape[1] == c) else 0
        return jnp.pad(w, ((0, pr), (0, pc)))

    qkv_b = jnp.asarray(attn["qkv"]["bias"], jnp.float32)
    rows = [
        vec(params["norm1"]["scale"]), vec(params["norm1"]["bias"]),
        tiled(attn["pool_q"]["norm"]["scale"]),
        tiled(attn["pool_q"]["norm"]["bias"]),
        tiled(attn["pool_k"]["norm"]["scale"]),
        tiled(attn["pool_k"]["norm"]["bias"]),
        tiled(attn["pool_v"]["norm"]["scale"]),
        tiled(attn["pool_v"]["norm"]["bias"]),
        vec(qkv_b[:c]), vec(qkv_b[c:2 * c]), vec(qkv_b[2 * c:]),
        vec(attn["proj"]["bias"]),
        vec(params["norm2"]["scale"]), vec(params["norm2"]["bias"]),
        vec(params["mlp_fc2"]["bias"]),
    ]
    vecs = jnp.stack(rows)

    # qkv kernel (C, 3C): q/k/v column blocks move to padded offsets
    wqkv_r = jnp.asarray(attn["qkv"]["kernel"], cdtype)
    if cp == c:
        wqkv = wqkv_r
    else:
        wqkv = jnp.concatenate(
            [jnp.pad(wqkv_r[:, i * c:(i + 1) * c],
                     ((0, cp - c), (0, cp - c))) for i in range(3)], axis=1)
    wp = mat(attn["proj"]["kernel"])
    wf1 = mat(params["mlp_fc1"]["kernel"])      # (Cp, 4C) — hidden unpadded
    wf2 = mat(params["mlp_fc2"]["kernel"])      # (4C, Cp)
    fc1b = jnp.asarray(params["mlp_fc1"]["bias"],
                       jnp.float32).reshape(1, 4 * c)

    def pool_w(name):
        # flax Conv kernel (kt, kh, kw, 1, d), feature_group_count = d;
        # pre-rounded to the compute dtype so tap products match XLA's
        # bf16-weight conv exactly
        k = jnp.asarray(attn[name]["pool"]["kernel"]).reshape(3, 3, 3, d)
        return k.astype(cdtype).astype(jnp.float32)

    def spatial_pos(si):
        return si // ws, si % ws

    # q pool: group terms by spatial offset ds (one lane-rotate each); a
    # (ds, ti) term exists iff ANY output cell has an in-window in-grid
    # source at that offset. Block weights are per-output-cell (zero when
    # that cell's source is invalid), tiled over heads, padded to Cp.
    wq_pool = pool_w("pool_q")
    zero = jnp.zeros((cp,), jnp.float32)

    def q_block(ti, ds_, s_out):
        s_in = s_out + ds_
        if 0 <= s_in < s:
            io, jo = spatial_pos(s_out)
            ii, ji = spatial_pos(s_in)
            if abs(ii - io) <= 1 and abs(ji - jo) <= 1:
                return vec(jnp.tile(wq_pool[ti, ii - io + 1, ji - jo + 1],
                                    n_head))
        return zero

    q_plan, qrows = [], []
    for ds_ in range(-(s - 1), s):
        blocks_by_ti = {}
        for ti in range(3):
            blocks = [q_block(ti, ds_, so) for so in range(s)]
            if any(b is not zero for b in blocks):
                blocks_by_ti[ti] = (jnp.concatenate(blocks)
                                    if s > 1 else blocks[0])
        if blocks_by_ti:
            q_plan.append((ds_, tuple(blocks_by_ti)))
            qrows.extend(blocks_by_ti.values())
    qtap = jnp.stack(qrows)

    # k/v pool: spatial output (0,0) covers source cell (i, j) via kernel
    # index (i+1, j+1) (one output column, pad 1); cells beyond the 3x3
    # window (stage-2's 4x4 grid) carry no weight and are skipped
    def kv_pack(name):
        wk = pool_w(name)
        plan, rows_ = [], []
        for ti in range(3):
            sis = []
            for si in range(s):
                ii, ji = spatial_pos(si)
                if ii + 1 < 3 and ji + 1 < 3:
                    sis.append(si)
                    rows_.append(vec(jnp.tile(wk[ti, ii + 1, ji + 1],
                                              n_head)))
            if sis:
                plan.append((ti, tuple(sis)))
        return tuple(plan), jnp.stack(rows_)

    kv_plan, ktap = kv_pack("pool_k")
    kv_plan_v, vtap = kv_pack("pool_v")
    assert kv_plan == kv_plan_v

    # reversed rel-pos table: rt[dd, l] = rel_t[2t-2-l, dd], zero-padded to
    # (128, 2t); cast to cdtype where the XLA path casts (rel_t.astype(cd))
    rel_t = jnp.asarray(attn["rel_pos_t"])[:2 * t - 1]
    rt = jnp.pad(rel_t[::-1].T.astype(cdtype), ((0, 128 - d), (0, 1)))

    arrays = (vecs, wqkv, wp, wf1, wf2, fc1b, qtap, ktap, vtap, rt)
    return arrays, tuple(q_plan), kv_plan
