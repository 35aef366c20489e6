"""Fused whole-MultiscaleBlock kernel (Pallas/TPU) for MViT-v2 stages 3/4.

The round-4 stage-cumulative bisection (BENCH_NOTES) pinned the remaining
MViT-v2-b cost in the narrow-grid stages: 19 blocks at ~11.5 ms/chunk against
a ~1.5 ms floor, with the cost spread over ~15 small XLA fusions per block
(pools, qkv relayouts, score glue, MLP) — no single op dominates, so no
XLA-level rewrite and no attention-only kernel (ops/pallas/mvit_attention.py,
measured a wash) can reclaim it. This kernel runs ONE grid step per chunk
per block with everything resident in VMEM: pre-LN -> fused qkv dense ->
the three TokenPool depthwise conv3d + group-LN pools -> pooled attention
with the decomposed temporal rel-pos bias -> residual pooling -> output
projection -> residual -> LN -> MLP -> residual. HBM traffic is one read of
the (N, C) block input + the weights and one write of the output.

Eligibility (frontends/mvit.py::MultiscaleBlock dispatch): stride_q =
(1,1,1), kernel_q = kernel_kv = (3,3,3), temporal kv stride 1, k/v pooled to
a (T, 1, 1) grid (so the spatial rel-pos terms are constant along the k axis
and drop — the khw==1 branch of MultiscaleAttention), input_channels ==
output_channels, C a lane multiple (128), head_dim <= 128. At the production
geometry (video_encoder.py:65-170: mvit_v2_b on 512-frame 96x96 chunks) that
covers blocks 6-20 (stage 3: C=384, 4 heads, (512,2,2) grid) and 22-23
(stage 4: C=768, 8 heads, (512,1,1)) — 17 of the 19 stage-3/4 blocks; the
two stride-q transition blocks stay on XLA.

TPU design notes:
- tokens stay in the native (N, C) = (1 + T*S, C) layout (t-major, spatial
  minor). The depthwise pool convs run in a (T, S*C) re-layout (legal
  Mosaic reshape: C is a lane multiple): temporal taps are sublane shifts,
  spatial taps are static lane-block rolls weighted by pre-tiled tap
  vectors; the cls row bypasses the conv and rejoins for the pool LN,
  whose per-head statistics ride block-diagonal reduce/broadcast matmuls.
- per-head attention runs in a 128-lane head space: q/k/v head columns are
  extracted with constant 0/1 selection matmuls (exact — one nonzero per
  output element), scores/softmax follow the XLA path's dtype contract
  (cdtype scores with f32 statistics, denominator applied to the output),
  and the head result is placed back with the transposed selection.
- the temporal rel-pos bias band[n, k] = q[n] . rel_t[t_n - k + T - 1] is
  built in-kernel: one matmul against the lane-REVERSED table G'[n, l] =
  q[n] . rel_t[2T-2-l], then a log2(T)-step masked-roll shear (row n
  left-rotates by T-1-t_n; rotation never wraps into used lanes because
  k + (T-1-t_n) <= 2T-2). This replaces frontends/mvit.py::_toeplitz_band,
  whose flatten/re-slice shear Mosaic cannot express.

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

LN_EPS = 1e-6

# packed per-channel vector rows (all f32, shape (NV, C))
ROW_LN1_W, ROW_LN1_B = 0, 1
ROW_PLQ_W, ROW_PLQ_B = 2, 3
ROW_PLK_W, ROW_PLK_B = 4, 5
ROW_PLV_W, ROW_PLV_B = 6, 7
ROW_BQ, ROW_BK, ROW_BV = 8, 9, 10
ROW_BP = 11
ROW_LN2_W, ROW_LN2_B = 12, 13
ROW_BFC2 = 14
NUM_VEC_ROWS = 15


@functools.lru_cache(maxsize=16)
def _head_sel_np(c: int, nh: int):
    """(nh, C, 128) head-column extraction + (nh, 128, C) placement 0/1
    matrices: head h's channels [h*d, (h+1)*d) <-> lanes [0, d)."""
    d = c // nh
    sel = np.zeros((nh, c, 128), np.float32)
    exp = np.zeros((nh, 128, c), np.float32)
    for h in range(nh):
        for dd in range(d):
            sel[h, h * d + dd, dd] = 1.0
            exp[h, dd, h * d + dd] = 1.0
    return sel, exp


@functools.lru_cache(maxsize=16)
def _group_ln_mats_np(c: int, nh: int):
    """Block-diagonal reduce/broadcast for per-head (d-channel) LN stats."""
    d = c // nh
    cc = np.arange(c)
    red = np.zeros((c, 128), np.float32)
    red[cc, cc // d] = 1.0 / d
    exp = np.zeros((128, c), np.float32)
    exp[cc // d, cc] = 1.0
    return red, exp


def _roll_lanes(x: jnp.ndarray, amt: int) -> jnp.ndarray:
    """Left-rotate lanes by ``amt`` (out[:, i] = in[:, (i + amt) % L]).
    Mosaic's rotate only supports 32-bit element types — callers roll f32."""
    ln = x.shape[-1]
    return pltpu.roll(x, (ln - amt) % ln, axis=x.ndim - 1)


def _make_kernel(t: int, s: int, c: int, nh: int, cdtype):
    n = 1 + t * s
    d = c // nh
    scale = d ** -0.5
    n_ds = 2 * s - 1
    tbits = max(1, int(t - 1).bit_length())

    def ln_rows(z):
        """Row LN over C, f32 stats, fast-variance clamped at 0 (flax)."""
        zf = z.astype(jnp.float32)
        mu = jnp.mean(zf, axis=-1, keepdims=True)
        m2 = jnp.mean(zf * zf, axis=-1, keepdims=True)
        var = jnp.maximum(m2 - mu * mu, 0.0)
        return (zf - mu) * jax.lax.rsqrt(var + LN_EPS)

    def cdot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32
                       ).astype(cdtype)

    def kernel(x_ref, vecs_ref, wqkv_ref, wp_ref, wf1_ref, wf2_ref,
               fc1b_ref, qtap_ref, ktap_ref, vtap_ref, rt_ref, sel_ref,
               exp_ref, red_ref, gexp_ref, out_ref):
        x = x_ref[0]                        # (N, C) cdtype
        vecs = vecs_ref[...]                # (NV, C) f32
        row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        row_kv = jax.lax.broadcasted_iota(jnp.int32, (t + 1, 1), 0)

        xln = (ln_rows(x) * vecs[ROW_LN1_W][None]
               + vecs[ROW_LN1_B][None]).astype(cdtype)
        qkv = cdot(xln, wqkv_ref[...])      # (N, 3C)
        q0 = qkv[:, :c] + vecs[ROW_BQ][None].astype(cdtype)
        k0 = qkv[:, c:2 * c] + vecs[ROW_BK][None].astype(cdtype)
        v0 = qkv[:, 2 * c:] + vecs[ROW_BV][None].astype(cdtype)

        def group_ln(z):
            """Per-head LN (no affine) on (M, C) — stats via block-diag
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
            lane-block rolls in the (T, S*C) layout; invalid (wrapped or
            out-of-window) source blocks carry zero tap weight."""
            cls = z[0:1]
            g = z[1:]
            g2 = g.reshape(t, s * c) if s > 1 else g
            g2f = g2.astype(jnp.float32)
            acc = jnp.zeros((t, s * c), jnp.float32)
            for di, ds_ in enumerate(range(-(s - 1), s)):
                rf = _roll_lanes(g2f, ds_ * c) if ds_ else g2f
                for ti in range(3):
                    w_vec = taps[ti * n_ds + di][None].astype(jnp.float32)
                    acc = acc + _shift_rows(rf, ti - 1) * w_vec
            gout = acc.reshape(t * s, c) if s > 1 else acc
            padded = jnp.pad(gout.astype(cdtype), ((1, 0), (0, 0)))
            full = jnp.where(row == 0, cls, padded)
            y = (group_ln(full) * vecs[lnw][None] + vecs[lnb][None])
            return y.astype(cdtype)

        def pool_kv(z, taps, lnw, lnb):
            """Depthwise conv3d pooling the spatial grid to (t, 1, 1); the
            (T, C) output rejoins the cls row as [cls; grid] like
            TokenPool's _prepend_token, then per-head LN + affine."""
            cls = z[0:1]
            g = z[1:]
            g2 = g.reshape(t, s * c) if s > 1 else g
            acc = jnp.zeros((t, c), jnp.float32)
            for ti in range(3):
                sh = _shift_rows(g2, ti - 1).astype(jnp.float32)
                for si in range(s):
                    w_vec = taps[ti * s + si][None].astype(jnp.float32)
                    acc = acc + sh[:, si * c:(si + 1) * c] * w_vec
            padded = jnp.pad(acc.astype(cdtype), ((1, 0), (0, 0)))
            full = jnp.where(row_kv == 0, cls, padded)   # (T+1, C)
            y = (group_ln(full) * vecs[lnw][None] + vecs[lnb][None])
            return y.astype(cdtype)

        qp = pool_q(q0, qtap_ref[...], ROW_PLQ_W, ROW_PLQ_B)   # (N, C)
        kp = pool_kv(k0, ktap_ref[...], ROW_PLK_W, ROW_PLK_B)  # (T+1, C)
        vp = pool_kv(v0, vtap_ref[...], ROW_PLV_W, ROW_PLV_B)
        kc, kg = kp[0:1], kp[1:]
        vc, vg = vp[0:1], vp[1:]

        # left-rotate amount for the shear: T-1 - t(row); row 0 (cls) gets
        # an arbitrary in-range amount — its band is masked below
        tq = jnp.clip((row - 1) // s, 0, t - 1)
        a_amt = (t - 1) - tq

        ctx = jnp.zeros((n, c), cdtype)
        for h in range(nh):
            sel_h = sel_ref[h]              # (C, 128) 0/1
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
            # rel-pos band: reversed-table matmul + masked-roll shear. The
            # shear runs in f32 (Mosaic rotate is 32-bit-only); since a
            # shear is a pure permutation, rounding commutes with it, so
            # downcasting AFTER the shear equals the XLA path's
            # shear-of-downcast-G bit for bit.
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
                   static_argnames=("t", "s", "n_head", "interpret"))
def fused_multiscale_block(x, vecs, wqkv, wp, wf1, wf2, fc1b, qtap, ktap,
                           vtap, rt, *, t: int, s: int, n_head: int,
                           interpret: bool = False):
    """x: (B, 1 + t*s, C) cdtype; returns the block output, same shape.
    One grid step per batch element (chunk) — the whole block in one VMEM
    residency. See pack_msblock_params for the packed-weight layout."""
    b, n, c = x.shape
    assert n == 1 + t * s, (n, t, s)
    cdtype = x.dtype

    sel_np, expd_np = _head_sel_np(c, n_head)
    red_np, gexp_np = _group_ln_mats_np(c, n_head)
    sel = jnp.asarray(sel_np, cdtype)
    expd = jnp.asarray(expd_np, cdtype)
    red = jnp.asarray(red_np, jnp.float32)
    gexp = jnp.asarray(gexp_np, jnp.float32)

    kernel = _make_kernel(t, s, c, n_head, cdtype)
    xspec = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            xspec,
            wspec((NUM_VEC_ROWS, c)),
            wspec((c, 3 * c)), wspec((c, c)),
            wspec((c, 4 * c)), wspec((4 * c, c)),
            wspec((1, 4 * c)),
            wspec(qtap.shape), wspec(ktap.shape), wspec(vtap.shape),
            wspec((128, 2 * t)),
            wspec((n_head, c, 128)), wspec((n_head, 128, c)),
            wspec((c, 128)), wspec((128, c)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), cdtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, vecs, wqkv, wp, wf1, wf2, fc1b, qtap, ktap, vtap, rt, sel, expd,
      red, gexp)


def pack_msblock_params(params, c: int, n_head: int, t: int, s: int,
                        grid_hw, cdtype):
    """Pack a MultiscaleBlock param subtree (frontends/mvit.py names) into
    the kernel inputs. ``t``/``s`` are the RUNTIME temporal/spatial token
    counts (the rel-pos table is sliced to rel_t[:2t-1] exactly like the
    XLA Toeplitz branch); ``grid_hw`` is the (hs, ws) spatial grid shape."""
    hs, ws = grid_hw
    assert hs * ws == s, (grid_hw, s)
    attn = params["attn"]
    d = c // n_head

    def vec(p):
        return jnp.asarray(p, jnp.float32).reshape(-1)

    def tiled(p):
        return jnp.tile(jnp.asarray(p, jnp.float32).reshape(d), n_head)

    qkv_b = vec(attn["qkv"]["bias"])
    rows = [
        vec(params["norm1"]["scale"]), vec(params["norm1"]["bias"]),
        tiled(attn["pool_q"]["norm"]["scale"]),
        tiled(attn["pool_q"]["norm"]["bias"]),
        tiled(attn["pool_k"]["norm"]["scale"]),
        tiled(attn["pool_k"]["norm"]["bias"]),
        tiled(attn["pool_v"]["norm"]["scale"]),
        tiled(attn["pool_v"]["norm"]["bias"]),
        qkv_b[:c], qkv_b[c:2 * c], qkv_b[2 * c:],
        vec(attn["proj"]["bias"]),
        vec(params["norm2"]["scale"]), vec(params["norm2"]["bias"]),
        vec(params["mlp_fc2"]["bias"]),
    ]
    vecs = jnp.stack(rows)

    wqkv = jnp.asarray(attn["qkv"]["kernel"], cdtype)
    wp = jnp.asarray(attn["proj"]["kernel"], cdtype)
    wf1 = jnp.asarray(params["mlp_fc1"]["kernel"], cdtype)
    wf2 = jnp.asarray(params["mlp_fc2"]["kernel"], cdtype)
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

    # q pool taps: (3 * (2s-1), s*c); row ti*(2s-1) + (ds + s-1): for each
    # output spatial block s_out, the weight for source block s_out + ds
    # (zero when out of grid or outside the 3x3 spatial window)
    wq_pool = pool_w("pool_q")
    zero = jnp.zeros((c,), jnp.float32)
    qrows = []
    for ti in range(3):
        for ds_ in range(-(s - 1), s):
            blocks = []
            for s_out in range(s):
                s_in = s_out + ds_
                if 0 <= s_in < s:
                    io, jo = spatial_pos(s_out)
                    ii, ji = spatial_pos(s_in)
                    if abs(ii - io) <= 1 and abs(ji - jo) <= 1:
                        blocks.append(jnp.tile(
                            wq_pool[ti, ii - io + 1, ji - jo + 1], n_head))
                        continue
                blocks.append(zero)
            qrows.append(jnp.concatenate(blocks) if s > 1 else blocks[0])
    qtap = jnp.stack(qrows)

    # k/v pool taps: (3*s, c); row ti*s + si: spatial output (0,0) covers
    # source (i, j) via kernel index (i+1, j+1) (stride 2 or 1 -> one
    # output column, pad 1)
    def kv_taps(name):
        wk = pool_w(name)
        rows_ = []
        for ti in range(3):
            for si in range(s):
                ii, ji = spatial_pos(si)
                rows_.append(jnp.tile(wk[ti, ii + 1, ji + 1], n_head))
        return jnp.stack(rows_)

    ktap = kv_taps("pool_k")
    vtap = kv_taps("pool_v")

    # reversed rel-pos table: rt[dd, l] = rel_t[2t-2-l, dd], zero-padded to
    # (128, 2t); cast to cdtype where the XLA path casts (rel_t.astype(cd))
    rel_t = jnp.asarray(attn["rel_pos_t"])[:2 * t - 1]
    rt = jnp.pad(rel_t[::-1].T.astype(cdtype), ((0, 128 - d), (0, 1)))

    return vecs, wqkv, wp, wf1, wf2, fc1b, qtap, ktap, vtap, rt
