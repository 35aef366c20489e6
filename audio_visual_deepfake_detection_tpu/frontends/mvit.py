"""MViT-v2 video encoder family (mvit_v2_t / s / b).

The reference's production visual frontend wraps torchvision's ``_mvit`` with
custom settings (video_feature/aligned_video/model/video_encoder.py:65-201):
patch-embed kernel (3,15,15) stride (1,12,12) padding (1,3,3) on 96x96 inputs
(-> 8x8 spatial tokens, temporal stride 1), residual_pool=True,
residual_with_cls_embed=False, rel_pos_embed=True, proj_after_attn=True, and
a per-stage config from ``generate_config`` (:97-127): stage blocks
[2,3,16,3] (b) with heads [1,2,4,8], channels [96,192,384,768], q-stride
[1,2,2] at each stage entry, kv-stride halving per stage, final output dim
256. The feature path drops the classification head, keeps all patch tokens,
and returns (B, C, T') per-frame embeddings (:81-95).

This is a faithful JAX re-implementation of that architecture (MViTv2:
pooled multiscale attention with residual pooling and decomposed relative
position embeddings). Numerical parity with torchvision cannot be verified in
this environment (torchvision is not installed and the AlignVideo checkpoint
is not shipped); structure and shapes follow the sources above.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

# ``dtype=bfloat16`` runs convs/matmuls in bf16 on the MXU (params stay f32,
# flax norm statistics stay f32, attention softmax is cast to f32); measured
# ~2.1x end-to-end on v5e vs f32. dtype=float32 is bit-identical to the
# pre-dtype module.


@dataclasses.dataclass(frozen=True)
class MSBlockConfig:
    num_heads: int
    input_channels: int
    output_channels: int
    kernel_q: Tuple[int, int, int]
    kernel_kv: Tuple[int, int, int]
    stride_q: Tuple[int, int, int]
    stride_kv: Tuple[int, int, int]


def generate_config(blocks: Sequence[int], heads: Sequence[int],
                    channels: Sequence[int], out_dim: int) -> List[MSBlockConfig]:
    """Port of video_encoder.py:generate_config (:97-127)."""
    num_heads, in_ch = [], []
    stride_q = [[1, 1, 1] for _ in range(sum(blocks))]
    cum = np.cumsum(blocks)
    stride_kv = []
    for i, nb in enumerate(blocks):
        num_heads.extend([heads[i]] * nb)
        in_ch.extend([channels[i]] * nb)
        if i != len(blocks) - 1:
            stride_q[cum[i]] = [1, 2, 2]
        skv = 2 ** (len(blocks) - 1 - i)
        stride_kv.extend([[1, skv, skv]] * nb)
    input_channels = [in_ch[0]] + in_ch[:-1]
    output_channels = in_ch[:-1] + [out_dim]
    return [
        MSBlockConfig(
            num_heads=num_heads[i],
            input_channels=input_channels[i],
            output_channels=output_channels[i],
            kernel_q=(3, 3, 3),
            kernel_kv=(3, 3, 3),
            stride_q=tuple(stride_q[i]),
            stride_kv=tuple(stride_kv[i]),
        )
        for i in range(len(num_heads))
    ]


def _prod(xs):
    out = 1
    for x in xs:
        out *= x
    return out


def _use_fused_attention(ng: int) -> bool:
    """Dispatch to the fused Pallas pooled-attention core
    (ops/pallas/mvit_attention.py). ENABLED is set by core.runtime.setup_jax
    on TPU; INTERPRET forces the interpreter path (CPU tests)."""
    from ..ops.pallas import mvit_attention as _fma

    if not (_fma.ENABLED or _fma.INTERPRET):
        return False
    return ng <= 512 or ng % 512 == 0


def _prepend_token(x: jnp.ndarray, tok: jnp.ndarray) -> jnp.ndarray:
    """concatenate([tok, x], axis=-2) written as pad + row-0 select.

    An actual concat of the class token onto the (..., N, C) token tensor
    measured 7.7 ms per 512-frame chunk on v5e (it forces the whole tensor
    through a relayout); jnp.pad and the broadcast select fuse into the
    producers instead. ``tok`` broadcasts against (..., 1, C).
    """
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[-2] = (1, 0)
    padded = jnp.pad(x, pad_cfg)
    row0 = (jnp.arange(padded.shape[-2]) == 0)[:, None]
    return jnp.where(row0, tok.astype(x.dtype), padded)


class PatchEmbed(nn.Module):
    """conv_proj as unfold matmuls over a merged (W, C) minor axis.

    XLA's lowering of the (3,15,15)/stride (1,12,12) patch conv measures
    11.7 ms per 512-frame chunk on v5e; a stacked-strided-slice im2col got
    5.4 ms but every stack it built carried the 3-wide channel axis as the
    MINOR dim — the TPU tiles the minor axis to 128 lanes, so those
    intermediates cost ~42x their logical bytes. Here (W, C) is flattened
    into one wide minor axis up front; the W-unfold (+ channel passthrough)
    and H-unfold then run as 0/1 selection matmuls on the MXU (exact: one
    nonzero per output element), the T-unfold is kt shifted slices, and the
    only narrow-minor tensor left is the final (kt*kh*kw*cin) patch matmul
    input. Parameters keep torchvision's Conv3d layout
    (kernel (kt,kh,kw,cin,cout), bias (cout,)) so ``convert_mvit_torch``
    and existing checkpoints are unaffected.
    """

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        b, t_in, h_in, w_in, cin = v.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kt, kh, kw, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        from ..ops.pallas import patch_embed as _fpe

        if ((_fpe.ENABLED or _fpe.INTERPRET) and not self.is_initializing()
                and self.kernel == (3, 15, 15)
                and self.stride == (1, 12, 12)
                and self.padding == (1, 3, 3)
                and tuple(v.shape[2:]) == (96, 96, 3)
                and self.features <= 128):
            # fused Pallas path: the stride-12 window geometry becomes
            # contiguous sublane groups, the unfolds become VMEM-resident
            # matmuls — no HBM unfold temps (round-5 bisection: 4.78 ms and
            # 2.45 GB of traffic per 512-chunk on the XLA path below)
            return _fpe.fused_patch_embed(
                v, jnp.asarray(w, self.dtype), bias,
                interpret=_fpe.INTERPRET)
        pt, ph, pw = self.padding
        # merge (W, C) BEFORE padding: the W pad becomes a pw*cin pad of the
        # merged axis, and no materialized tensor ever has a minor dim < 128
        x = v.reshape(b, t_in, h_in, w_in * cin)
        x = jnp.pad(x, ((0, 0), (pt, pt), (ph, ph), (pw * cin, pw * cin)))
        x = x.astype(self.dtype)
        tp, hp, mp = x.shape[1:]
        ot = (tp - kt) // st + 1
        oh = (hp - kh) // sh + 1
        ow = (w_in + 2 * pw - kw) // sw + 1
        # W-unfold + channel passthrough: one nonzero per column -> exact
        sw_mat = np.zeros((mp, ow * kw * cin), np.float32)
        for o in range(ow):
            for k in range(kw):
                for c in range(cin):
                    sw_mat[(o * sw + k) * cin + c, (o * kw + k) * cin + c] = 1.0
        x = jnp.einsum("bthm,mj->bthj", x, jnp.asarray(sw_mat, x.dtype),
                       preferred_element_type=jnp.float32).astype(self.dtype)
        # H-unfold
        sh_mat = np.zeros((hp, oh * kh), np.float32)
        for o in range(oh):
            for k in range(kh):
                sh_mat[o * sh + k, o * kh + k] = 1.0
        x = jnp.einsum("bthj,hq->btqj", x, jnp.asarray(sh_mat, x.dtype),
                       preferred_element_type=jnp.float32).astype(self.dtype)
        # T-unfold: kt shifted slices (stride st along T)
        x = jnp.stack([x[:, r:r + st * (ot - 1) + 1:st] for r in range(kt)],
                      axis=2)                      # (B,ot,kt,oh*kh,ow*kw*cin)
        x = x.reshape(b, ot, kt, oh, kh, ow, kw * cin)
        w3 = w.astype(self.dtype).reshape(kt, kh, kw * cin, self.features)
        out = jnp.einsum("bopqhwk,phkf->boqwf", x, w3,
                         preferred_element_type=jnp.float32)
        return out.astype(self.dtype) + bias.astype(self.dtype)


class TokenPool(nn.Module):
    """Depthwise conv pooling of (B, H, N, d) head tokens over a (T, Hs, Ws)
    grid, skipping the class token; conv groups = head_dim, followed by LN.

    Kept as lax.conv: a shifted-tap rewrite (27 strided-slice multiply-adds
    on a zero-padded grid) won in an isolated probe (2.86 vs 3.43 ms for
    stage 3's 48 pools) but REGRESSED the full model 24.3 -> 27.1 ms/chunk —
    in-model, XLA fuses the small depthwise conv into its neighbors better
    than the 27-slice chain (round-4 BENCH_NOTES). Isolated-op wins don't
    transfer at these sizes; wall-clock of the whole forward is the only
    arbiter."""

    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, thw: Tuple[int, int, int]):
        if _prod(self.stride) == 1 and _prod(self.kernel) == 1:
            return x, thw
        b, h, n, d = x.shape
        t, hs, ws = thw
        cls_tok, tokens = x[:, :, :1], x[:, :, 1:]
        grid = tokens.reshape(b * h, t, hs, ws, d)
        pad = tuple(k // 2 for k in self.kernel)
        grid = nn.Conv(d, self.kernel, strides=self.stride,
                       padding=[(p, p) for p in pad],
                       feature_group_count=d, use_bias=False,
                       dtype=self.dtype, name="pool")(grid)
        new_thw = tuple(grid.shape[1:4])
        grid = grid.reshape(b, h, _prod(new_thw), d)
        # torchvision normalizes AFTER re-attaching the class token, so the
        # class token goes through the LN too (torchvision Pool.forward)
        out = _prepend_token(grid, cls_tok)
        out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(out)
        return out, new_thw


def _toeplitz_band(G: jnp.ndarray, kt: int) -> jnp.ndarray:
    """D[..., q, k] = G[..., q, q + kt - 1 - k] for q, k in [0, kt).

    G has last axis of length 2*kt-1 (= q . rel_t[j] for every table row j).
    The anti-diagonal band extraction is a pure shear: reverse, pad one
    column, flatten the last two axes, re-slice at row stride 2*kt-1. All
    reshapes/slices — no gather (gathers at this size measure ~30x slower on
    TPU) and no per-t batched matmul (512 tiny (16,96)@(96,512) matmuls run
    at ~0.1% MXU utilization and materialize a 0.8 GB outer product when
    XLA lowers the shared-t einsum as multiply+reduce)."""
    qt = kt
    Grev = G[..., ::-1]
    pad = jnp.pad(Grev, [(0, 0)] * (Grev.ndim - 1) + [(0, 1)])
    flat = pad.reshape(pad.shape[:-2] + (qt * 2 * kt,))
    flat = flat[..., kt - 1: kt - 1 + qt * (2 * kt - 1)]
    return flat.reshape(flat.shape[:-1] + (qt, 2 * kt - 1))[..., :kt]


def _rel_pos_index(q_size: int, k_size: int) -> np.ndarray:
    """Relative position lookup (MViTv2 decomposed rel-pos with size ratio
    correction, torchvision _add_rel_pos): q coordinates are scaled by
    max(k/q, 1), k coordinates by max(q/k, 1), and the table offset is
    (k-1) * max(q/k, 1), giving indices in [0, 2*max(q,k)-2]."""
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    qi = np.arange(q_size)[:, None] * q_ratio
    ki = np.arange(k_size)[None, :] * k_ratio
    idx = (qi - ki + (k_size - 1) * k_ratio).astype(np.int32)
    assert idx.min() >= 0 and idx.max() <= 2 * max(q_size, k_size) - 2
    return idx


class MultiscaleAttention(nn.Module):
    cfg: MSBlockConfig
    input_thw: Tuple[int, int, int]  # static pre-block grid from the config
    residual_pool: bool = True
    residual_with_cls_embed: bool = False
    rel_pos_embed: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, thw: Tuple[int, int, int]):
        c = self.cfg
        out_dim = c.output_channels  # proj_after_attn: attention at output dim
        nh = c.num_heads
        d = out_dim // nh
        b, n, _ = x.shape

        qkv = nn.Dense(3 * out_dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, nh, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        q, q_thw = TokenPool(c.kernel_q, c.stride_q, dtype=self.dtype,
                             name="pool_q")(q, thw)
        k, k_thw = TokenPool(c.kernel_kv, c.stride_kv, dtype=self.dtype,
                             name="pool_k")(k, thw)
        v, _ = TokenPool(c.kernel_kv, c.stride_kv, dtype=self.dtype,
                         name="pool_v")(v, thw)

        # Scores are stored in the compute dtype (f32 accumulation on the
        # MXU either way); softmax statistics are computed in f32. The big
        # (N_q, N_k) matrix is the whole HBM story of this model at
        # production geometry (58 GB/chunk before this restructuring), so it
        # is touched a minimal number of times: one write (scores + rel-pos
        # bias in one fused pass, zero-PADDED for the class token instead of
        # the fusion-breaking dynamic-update-slice `.at[1:, 1:].add`), one
        # read for the row max, one read for exp (written back at compute
        # dtype), one read by the P@V matmul. The softmax denominator is
        # applied to the (N_q, d) OUTPUT instead of the matrix
        # (sum(e) >= 1 after max subtraction, so the division is safe).
        att = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k,
                         preferred_element_type=jnp.float32)

        if self.rel_pos_embed:
            qt, qh, qw = q_thw
            kt, kh, kw = k_thw
            # table sizes come from the STATIC configured grid (torchvision
            # allocates them from input_size at construction), so parameter
            # shapes do not depend on the runtime clip length; shorter inputs
            # index the low corner, exactly like running torchvision below
            # its configured temporal_size
            cq = [s // st for s, st in zip(self.input_thw, c.stride_q)]
            ck = [s // st for s, st in zip(self.input_thw, c.stride_kv)]
            rel_sp_dim = 2 * max(cq[1], ck[1], cq[2], ck[2]) - 1
            rel_t_dim = 2 * max(cq[0], ck[0]) - 1
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (rel_sp_dim, d))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (rel_sp_dim, d))
            rel_t = self.param("rel_pos_t", nn.initializers.zeros,
                               (rel_t_dim, d))
            q_grid = q[:, :, 1:].reshape(b, nh, qt, qh, qw, d)
            # decomposed bias: attn[q, k] += q . R_h[dh] + q . R_w[dw] + q . R_t[dt]
            cd = q.dtype
            Rh = rel_h[jnp.asarray(_rel_pos_index(qh, kh))].astype(cd)
            Rw = rel_w[jnp.asarray(_rel_pos_index(qw, kw))].astype(cd)
            f32 = dict(preferred_element_type=jnp.float32)
            bias_h = jnp.einsum("bnthwd,hkd->bnthwk", q_grid, Rh, **f32)
            bias_w = jnp.einsum("bnthwd,wkd->bnthwk", q_grid, Rw, **f32)
            if qt == kt and qh * qw <= 4:
                # temporal stride is always 1 in this family, so the t-axis
                # rel-pos is a Toeplitz band of ONE clean MXU matmul against
                # the whole table: G[..., q, j] = q . rel_t[j], then
                # bias_t[q, k] = G[q, q + kt - 1 - k] via _toeplitz_band.
                # Gated to the small-spatial stages (3/4, 16+3 of 24 blocks):
                # there the shared-t einsum's multiply+reduce lowering
                # materializes a qt*qhw*kt*d outer product (~0.7 GB/block,
                # measured); on the wide-spatial stage-1 grid the einsum
                # lowers fine and the shear's G copies cost more instead.
                qg2 = q_grid.transpose(0, 1, 3, 4, 2, 5)   # (b,nh,qh,qw,qt,d)
                # G and its shear copies ride at the compute dtype (f32
                # accumulation inside the matmul either way); in bf16 mode
                # this halves the dominant remaining per-block traffic
                G = jnp.einsum("...qd,ld->...ql", qg2,
                               rel_t[:2 * kt - 1].astype(cd),
                               preferred_element_type=jnp.float32
                               ).astype(self.dtype)
                bias_t = _toeplitz_band(G, kt).transpose(0, 1, 4, 2, 3, 5)
            else:
                Rt = rel_t[jnp.asarray(_rel_pos_index(qt, kt))].astype(cd)
                bias_t = jnp.einsum("bnthwd,tkd->bnthwk", q_grid, Rt, **f32)
            # Assemble bias over the flat (kt*kh*kw) k-axis directly. The
            # naive broadcast sum bias_t[...,:,None,None] + bias_h[...] +
            # bias_w[...] materializes tensors whose MINOR dims are (kh, kw)
            # = (2, 2); the TPU tiles the minor axis to 128 lanes, so those
            # arrays cost ~64x their logical bytes — measured 16.2 GB of the
            # production transition block's 17 GB HBM traffic (repeat/tile
            # lowers the same way and measured no better). Instead the
            # k-expansion runs as matmuls against constant 0/1 kron-structure
            # matrices: every materialized tensor keeps a wide minor axis and
            # the expansion rides the MXU.
            khw = kh * kw
            if khw == 1:
                bias = bias_t
            else:
                bhw = (bias_h[..., :, None] + bias_w[..., None, :]).reshape(
                    b, nh, qt, qh, qw, khw)
                e_t = jnp.asarray(np.kron(np.eye(kt, dtype=np.float32),
                                          np.ones((1, khw), np.float32)))
                e_hw = jnp.asarray(np.kron(np.ones((1, kt), np.float32),
                                           np.eye(khw, dtype=np.float32)))
                f32p = dict(preferred_element_type=jnp.float32)
                bias = (jnp.einsum("...t,tk->...k", bias_t.astype(cd),
                                   e_t.astype(cd), **f32p)
                        + jnp.einsum("...s,sk->...k", bhw.astype(cd),
                                     e_hw.astype(cd), **f32p))
            if khw == 1 and _use_fused_attention(qt * qh * qw):
                # Fused Pallas path (ops/pallas/mvit_attention.py): one VMEM
                # residency for scores + band + softmax + P@V + residual —
                # the (N_q, N_k) score matrix and its exp never touch HBM.
                # The cls-token QUERY row (one row per head) stays in XLA and
                # is re-attached with the pad+select trick; k/v are permuted
                # [grid..., cls] so the band adds with no lane shift.
                from ..ops.pallas import mvit_attention as _fma

                ng = qt * qh * qw
                nk = k.shape[2]
                dh = d
                band = bias_t.reshape(b, nh, ng, kt)
                k_perm = jnp.concatenate([k[:, :, 1:], k[:, :, :1]], axis=2)
                v_perm = jnp.concatenate([v[:, :, 1:], v[:, :, :1]], axis=2)
                out_grid = _fma.fused_pooled_attention(
                    q[:, :, 1:].reshape(b * nh, ng, dh),
                    k_perm.reshape(b * nh, nk, dh),
                    v_perm.reshape(b * nh, nk, dh),
                    band.reshape(b * nh, ng, kt),
                    scale=dh ** -0.5, interpret=_fma.INTERPRET,
                ).reshape(b, nh, ng, dh)
                # cls query row: plain (bias-free) attention, no residual
                # (residual_with_cls_embed=False), computed in XLA
                att_cls = jnp.einsum(
                    "bhqd,bhkd->bhqk", q[:, :, :1] * (dh ** -0.5), k,
                    preferred_element_type=jnp.float32)
                mc = jnp.max(att_cls, axis=-1, keepdims=True)
                ec = jnp.exp(att_cls - mc).astype(self.dtype)
                zc = jnp.sum(ec, axis=-1, dtype=jnp.float32)
                out_cls = jnp.einsum("bhqk,bhkd->bhqd", ec.astype(v.dtype),
                                     v, preferred_element_type=jnp.float32)
                out_cls = (out_cls / zc[..., None]).astype(v.dtype)
                out = _prepend_token(out_grid, out_cls)
                n_q = out.shape[2]
                out = out.transpose(0, 2, 1, 3).reshape(b, n_q, out_dim)
                out = nn.Dense(out_dim, dtype=self.dtype, name="proj")(out)
                return out, q_thw
            bias = bias.reshape(b, nh, qt * qh * qw, kt * kh * kw)
            att = att + jnp.pad(bias, ((0, 0), (0, 0), (1, 0), (1, 0)))

        m = jnp.max(att, axis=-1, keepdims=True)
        e = jnp.exp(att - m).astype(self.dtype)
        z = jnp.sum(e, axis=-1, dtype=jnp.float32)       # >= 1
        out = jnp.einsum("bhqk,bhkd->bhqd", e.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = (out / z[..., None]).astype(v.dtype)
        if self.residual_pool:
            if self.residual_with_cls_embed:
                out = out + q
            else:
                # zero-pad the cls position instead of .at[:, :, 1:].add —
                # a pad fuses, a dynamic-update-slice does not
                out = out + jnp.pad(q[:, :, 1:],
                                    ((0, 0), (0, 0), (1, 0), (0, 0)))
        n_q = out.shape[2]
        out = out.transpose(0, 2, 1, 3).reshape(b, n_q, out_dim)
        out = nn.Dense(out_dim, dtype=self.dtype, name="proj")(out)
        return out, q_thw


class MultiscaleBlock(nn.Module):
    cfg: MSBlockConfig
    input_thw: Tuple[int, int, int]
    dtype: Any = jnp.float32

    def _fused_geometry_ok(self, thw, n_tokens: int) -> bool:
        """Whole-block Pallas kernel geometry (ops/pallas/mvit_block.py):
        the steady-state stage-3/4 shape — stride-1 queries, k/v pooled
        to a (T, 1, 1) grid (khw==1: spatial rel-pos drops), equal in/out
        channels, lane-aligned C. Covers 17 of mvit_v2_b's 19 stage-3/4
        blocks; the stride-q transition blocks stay on XLA."""
        from ..ops.pallas import mvit_block as _fmb

        c = self.cfg
        k_thw = tuple(-(-g // st) for g, st in zip(thw, c.stride_kv))
        return (thw[1] * thw[2] <= _fmb.MAX_SPATIAL
                and c.input_channels == c.output_channels
                and tuple(c.stride_q) == (1, 1, 1)
                and tuple(c.kernel_q) == (3, 3, 3)
                and tuple(c.kernel_kv) == (3, 3, 3)
                and c.stride_kv[0] == 1
                and k_thw[1] == 1 and k_thw[2] == 1
                and c.output_channels % c.num_heads == 0
                and (c.output_channels // c.num_heads) <= 128
                and n_tokens == 1 + thw[0] * thw[1] * thw[2])

    @nn.compact
    def __call__(self, x: jnp.ndarray, thw: Tuple[int, int, int]):
        from ..ops.pallas import mvit_block as _fmb

        c = self.cfg
        if ((_fmb.ENABLED or _fmb.INTERPRET)
                and not self.is_initializing()
                and self._fused_geometry_ok(thw, x.shape[1])):
            arrays, q_plan, kv_plan = _fmb.pack_msblock_params(
                self.variables["params"], c.output_channels, c.num_heads,
                thw[0], thw[1] * thw[2], (thw[1], thw[2]), x.dtype)
            y = _fmb.fused_multiscale_block(
                x, *arrays, t=thw[0], s=thw[1] * thw[2],
                n_head=c.num_heads, q_plan=q_plan, kv_plan=kv_plan,
                interpret=_fmb.INTERPRET)
            return y, thw
        x_norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x_attn, thw_new = MultiscaleAttention(
            c, self.input_thw, dtype=self.dtype, name="attn")(x_norm1, thw)

        # proj_after_attn=True: channel projection happens on norm1 output
        if c.input_channels != c.output_channels:
            x = nn.Dense(c.output_channels, dtype=self.dtype,
                         name="project")(x_norm1)
        if _prod(c.stride_q) > 1:
            b, n, ch = x.shape
            t, hs, ws = thw
            cls_tok, tokens = x[:, :1], x[:, 1:]
            grid = tokens.reshape(b, t, hs, ws, ch)
            kernel = tuple(s + 1 if s > 1 else s for s in c.stride_q)
            pad = tuple(k // 2 for k in kernel)
            grid = nn.max_pool(grid, kernel, strides=c.stride_q,
                               padding=[(p, p) for p in pad])
            x = _prepend_token(grid.reshape(b, -1, ch), cls_tok)
        x = x + x_attn

        x_norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * c.output_channels, dtype=self.dtype,
                     name="mlp_fc1")(x_norm2)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.output_channels, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h, thw_new


class MViTVideoEncoder(nn.Module):
    """(B, T, 96, 96, 3) -> (B, T', out_dim) patch-token features
    (MvitVideoEncoder.forward, video_encoder.py:81-95: conv_proj -> cls token
    -> blocks -> final LN -> drop cls token)."""

    block_setting: Tuple[MSBlockConfig, ...]
    patch_kernel: Tuple[int, int, int] = (3, 15, 15)
    patch_stride: Tuple[int, int, int] = (1, 12, 12)
    patch_padding: Tuple[int, int, int] = (1, 3, 3)
    # static sizes the rel-pos tables are allocated for (torchvision sizes
    # them from spatial_size/temporal_size at construction); the reference
    # extracts on 512-frame zero-padded chunks of 96x96 video
    # (extract_video_features.py:53-77)
    temporal_size: int = 512
    spatial_size: Tuple[int, int] = (96, 96)
    dtype: Any = jnp.float32
    # Batch scaling is stage-dependent (round-4 bisection, v5e, per chunk):
    # stage 1 IMPROVES batched (7.50 -> 5.31 ms at 16 chunks) while stages
    # 2-4 DEGRADE (stage 3: 10.3 -> 18.8 — the small-grid score fusions
    # spill to HBM once batched). FeatureExtractor therefore batches
    # blocks[:batch_front_split] across chunks and lax.maps the rest
    # chunk-by-chunk; C3D is the opposite (45.5 -> 32.7 ms/chunk batched)
    # and keeps the plain batched apply.
    prefers_sequential_chunks: bool = True
    batch_front_split: int = 2

    def _config_grid(self) -> Tuple[int, int, int]:
        """Token grid after the patch-embed conv at the configured sizes."""
        sizes = (self.temporal_size,) + tuple(self.spatial_size)
        return tuple(
            (s + 2 * p - k) // st + 1
            for s, p, k, st in zip(sizes, self.patch_padding,
                                   self.patch_kernel, self.patch_stride))

    def patch_grid(self, video_shape) -> Tuple[int, int, int]:
        """Runtime (T', H', W') token grid for a (B, T, H, W, 3) input."""
        sizes = tuple(video_shape[1:4])
        return tuple(
            (s + 2 * p - k) // st + 1
            for s, p, k, st in zip(sizes, self.patch_padding,
                                   self.patch_kernel, self.patch_stride))

    def thw_after(self, thw: Tuple[int, int, int],
                  split: int) -> Tuple[int, int, int]:
        """Grid after blocks[:split] ('same'-padded strided q pooling)."""
        for cfg in self.block_setting[:split]:
            thw = tuple((s + st - 1) // st
                        for s, st in zip(thw, cfg.stride_q))
        return thw

    def setup(self):
        c0 = self.block_setting[0].input_channels
        self.conv_proj = PatchEmbed(c0, self.patch_kernel, self.patch_stride,
                                    self.patch_padding, dtype=self.dtype)
        self.class_token = self.param("class_token", nn.initializers.zeros,
                                      (1, 1, c0))
        cfg_thw = self._config_grid()
        blocks = []
        for i, cfg in enumerate(self.block_setting):
            blocks.append(MultiscaleBlock(cfg, cfg_thw, dtype=self.dtype,
                                          name=f"block_{i}"))
            cfg_thw = tuple(
                s // st for s, st in zip(cfg_thw, cfg.stride_q))
        self.blocks = blocks
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)

    def embed(self, video: jnp.ndarray) -> jnp.ndarray:
        """Patch embed + cls token -> (B, 1 + T'*H'*W', C) tokens.

        Exposed separately from ``front_blocks`` so callers can lax.map the
        patch embed per chunk: its im2col intermediates are ~130 MB/chunk
        (the B=128 e2e OOM — 4 x ~5.3 GB temps, round-4 batch sweep) and
        the unfold matmuls saturate the MXU without batching, while the
        stage-1 blocks DO want the chunk batch (7.50 -> 5.31 ms/chunk at
        16, round-4 bisection)."""
        x = self.conv_proj(video)
        b, t, hs, ws, ch = x.shape
        x = x.reshape(b, t * hs * ws, ch)
        return _prepend_token(x, self.class_token)

    def front_blocks(self, x: jnp.ndarray, thw: Tuple[int, int, int],
                     split: int) -> jnp.ndarray:
        """blocks[:split] on embedded tokens (grid ``thw`` = patch_grid)."""
        for blk in self.blocks[:split]:
            x, thw = blk(x, thw)
        return x

    def encode_front(self, video: jnp.ndarray, split: int) -> jnp.ndarray:
        """Patch embed + cls token + blocks[:split] -> (B, N+1, C) tokens.

        The split exists so callers can batch the wide-grid early stages
        across chunks while running the narrow-grid later stages chunk-by-
        chunk (or vice versa) — the two regimes measured opposite batch
        scaling on v5e (BENCH_NOTES round 4). Use ``thw_after(patch_grid(
        shape), split)`` for the grid to hand encode_back."""
        x = self.embed(video)
        return self.front_blocks(x, self.patch_grid(video.shape), split)

    def encode_back(self, x: jnp.ndarray, thw: Tuple[int, int, int],
                    split: int) -> jnp.ndarray:
        """blocks[split:] + final LN + per-frame spatial mean."""
        for blk in self.blocks[split:]:
            x, thw = blk(x, thw)
        x = self.norm(x)
        x = x[:, 1:]
        # (B, T'*H'*W', C): average the spatial tokens per frame to per-frame
        # features; with the reference's strides H'=W'=1 at the final stage
        b = x.shape[0]
        x = x.reshape(b, thw[0], thw[1] * thw[2], x.shape[-1])
        return x.mean(axis=2, dtype=jnp.float32)

    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        n = len(self.block_setting)
        x = self.encode_front(video, n)
        return self.encode_back(x, self.thw_after(
            self.patch_grid(video.shape), n), n)


def hybrid_apply(model: "MViTVideoEncoder", params, chunks: jnp.ndarray,
                 *, sequential_patch: bool = False,
                 batched_back: bool = False,
                 front_group: int = 0) -> jnp.ndarray:
    """The production chunk strategy in one place (FeatureExtractor, the e2e
    bench and the multichip dryrun all route through this): per-chunk patch
    embed via lax.map (bounds the ~130 MB/chunk im2col temps — the round-4
    B=128 OOM — while the unfold matmuls already saturate the MXU at one
    chunk), batched blocks[:split] (stage 1 improves with chunk batch),
    then blocks[split:] per chunk via lax.map (the narrow-grid stages
    degrade batched under XLA). ``batched_back=True`` runs the back stages
    batched instead — the right choice when the whole-block kernel
    (ops/pallas/mvit_block.py) is enabled, whose VMEM residency per grid
    step removes the batched-spill pathology. ``front_group`` > 0 tiles the
    patch-embed + front blocks in fixed-size chunk groups via lax.map
    (zero-padding the tail group), bounding peak memory for arbitrarily
    long videos; measured knobs (v5e, 16 chunks): batched patch embed beats
    sequential by ~1 ms/chunk, so sequential_patch stays off and the OOM
    protection comes from grouping instead."""
    split = model.batch_front_split
    thw0 = model.patch_grid(chunks.shape)
    thw = model.thw_after(thw0, split)

    def run_front(x):
        if sequential_patch and x.shape[0] > 1:
            emb = jax.lax.map(
                lambda v: model.apply(params, v[None], method="embed")[0], x)
        else:
            emb = model.apply(params, x, method="embed")
        return model.apply(params, emb, thw0, split, method="front_blocks")

    n = chunks.shape[0]
    if front_group and n > front_group:
        g = front_group
        pad = (-n) % g
        xp = jnp.pad(chunks, ((0, pad),) + ((0, 0),) * (chunks.ndim - 1))
        grouped = xp.reshape((xp.shape[0] // g, g) + xp.shape[1:])
        front = jax.lax.map(run_front, grouped)
        front = front.reshape((-1,) + front.shape[2:])[:n]
    else:
        front = run_front(chunks)
    if batched_back:
        return model.apply(params, front, thw, split, method="encode_back")
    return jax.lax.map(
        lambda tkn: model.apply(params, tkn[None], thw, split,
                                method="encode_back")[0], front)


def convert_mvit_torch(state_dict, template, prefix: str = ""):
    """Map torchvision video-MViT weights (the layout of the reference's
    AlignVideo checkpoint under ``video_encoder.mvit.``; pass that as
    ``prefix``) into our flax tree.

    torchvision module paths (torchvision/models/video/mvit.py):
      conv_proj, pos_encoding.class_token, blocks.{i}.{norm1,norm2},
      blocks.{i}.attn.{qkv,project,pool_q,pool_k,pool_v,rel_pos_h/w/t},
      pool_*.pool (depthwise Conv3d) + pool_*.norm_act.0 (LN),
      blocks.{i}.project, blocks.{i}.mlp.{0,3}, norm.
    """
    from flax import traverse_util

    sd = {}
    for key, v in state_dict.items():
        if prefix and not key.startswith(prefix):
            continue
        sd[key[len(prefix):]] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    out = {}

    def put(path, value, shape):
        assert value.shape == tuple(shape), (path, value.shape, shape)
        out[path] = value

    def linear(ref, leaf):
        w = sd[f"{ref}.{'weight' if leaf == 'kernel' else 'bias'}"]
        return np.transpose(w) if leaf == "kernel" else w

    def ln(ref, leaf):
        return sd[f"{ref}.{'weight' if leaf == 'scale' else 'bias'}"]

    for path, tmpl in traverse_util.flatten_dict(template).items():
        core = path[1:] if path[0] == "params" else path
        name, leaf = core[0], core[-1]
        if name == "conv_proj":
            w = sd[f"conv_proj.{'weight' if leaf == 'kernel' else 'bias'}"]
            val = np.transpose(w, (2, 3, 4, 1, 0)) if leaf == "kernel" else w
            put(path, val, tmpl.shape)
        elif name == "class_token":
            put(path, sd["pos_encoding.class_token"].reshape(tmpl.shape),
                tmpl.shape)
        elif name == "norm":
            put(path, ln("norm", leaf), tmpl.shape)
        elif name.startswith("block_"):
            i = int(name.split("_")[1])
            sub = core[1]
            if sub in ("norm1", "norm2"):
                put(path, ln(f"blocks.{i}.{sub}", leaf), tmpl.shape)
            elif sub == "project":
                put(path, linear(f"blocks.{i}.project", leaf), tmpl.shape)
            elif sub == "attn":
                mod = core[2]
                if mod == "qkv":
                    put(path, linear(f"blocks.{i}.attn.qkv", leaf), tmpl.shape)
                elif mod == "proj":
                    put(path, linear(f"blocks.{i}.attn.project", leaf),
                        tmpl.shape)
                elif mod in ("pool_q", "pool_k", "pool_v"):
                    ref = f"blocks.{i}.attn.{mod}"
                    if core[3] == "pool":
                        w = sd[f"{ref}.pool.weight"]  # (d, 1, kt, kh, kw)
                        put(path, np.transpose(w, (2, 3, 4, 1, 0)), tmpl.shape)
                    else:
                        put(path, ln(f"{ref}.norm_act.0", leaf), tmpl.shape)
                elif mod in ("rel_pos_h", "rel_pos_w", "rel_pos_t"):
                    put(path, sd[f"blocks.{i}.attn.{mod}"], tmpl.shape)
                else:
                    raise KeyError(path)
            elif sub in ("mlp_fc1", "mlp_fc2"):
                idx = 0 if sub == "mlp_fc1" else 3
                put(path, linear(f"blocks.{i}.mlp.{idx}", leaf), tmpl.shape)
            else:
                raise KeyError(path)
        else:
            raise KeyError(path)
    return traverse_util.unflatten_dict(out)


def mvit_v2_t(out_dim: int = 256, temporal_size: int = 512,
              dtype: Any = jnp.float32) -> MViTVideoEncoder:
    return MViTVideoEncoder(tuple(generate_config(
        [1, 2, 5, 2], [1, 2, 4, 8], [96, 192, 384, 768], out_dim)),
        temporal_size=temporal_size, dtype=dtype, batch_front_split=1)


def mvit_v2_s(out_dim: int = 256, temporal_size: int = 512,
              dtype: Any = jnp.float32) -> MViTVideoEncoder:
    return MViTVideoEncoder(tuple(generate_config(
        [1, 2, 11, 2], [1, 2, 4, 8], [96, 192, 384, 768], out_dim)),
        temporal_size=temporal_size, dtype=dtype, batch_front_split=1)


def mvit_v2_b(out_dim: int = 256, temporal_size: int = 512,
              dtype: Any = jnp.float32) -> MViTVideoEncoder:
    return MViTVideoEncoder(tuple(generate_config(
        [2, 3, 16, 3], [1, 2, 4, 8], [96, 192, 384, 768], out_dim)),
        temporal_size=temporal_size, dtype=dtype, batch_front_split=2)
