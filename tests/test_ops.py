"""Golden tests for the ops layer against torch / reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.ops import resample, conv, norm, pe, attention


@pytest.mark.parametrize("t_in,t_out", [(117, 768), (768, 768), (10, 768), (768, 691), (3, 8), (1, 4)])
def test_linear_resample_matches_torch(rng, t_in, t_out):
    x = rng.standard_normal((5, t_in, 7), dtype=np.float32)
    ours = np.asarray(resample.linear_resample_time(jnp.asarray(x), t_out, axis=1))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 2, 1), size=t_out, mode="linear", align_corners=False
    ).permute(0, 2, 1).numpy()
    # torch quantizes source coords to f32; at T~700 that is ~6e-5 ulp,
    # so allow 1e-4 absolute on unit-scale inputs
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("t_in,t_out", [(117, 768), (768, 384), (24, 48), (48, 24)])
def test_nearest_resample_matches_torch(rng, t_in, t_out):
    x = rng.standard_normal((2, t_in, 3), dtype=np.float32)
    ours = np.asarray(resample.nearest_resample_time(jnp.asarray(x), t_out, axis=1))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 2, 1), size=t_out, mode="nearest"
    ).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=0, rtol=0)


def test_linear_resample_matrix_equivalent(rng):
    x = rng.standard_normal((2, 55, 4), dtype=np.float32)
    m = np.asarray(resample.linear_resample_matrix(55, 768))
    via_mat = np.einsum("btc,to->boc", x, m)
    direct = np.asarray(resample.linear_resample_time(jnp.asarray(x), 768, axis=1))
    np.testing.assert_allclose(via_mat, direct, atol=1e-5)


@pytest.mark.parametrize("stride,groups,k", [(1, 1, 3), (2, 1, 3), (1, 16, 3), (2, 16, 3), (1, 1, 1)])
def test_masked_conv1d_matches_torch(rng, stride, groups, k):
    b, t, cin, cout = 2, 24, 16, 16
    x = rng.standard_normal((b, t, cin), dtype=np.float32)
    lens = np.array([24, 17])
    mask = np.arange(t)[None, :] < lens[:, None]

    mod = conv.MaskedConv1D(features=cout, kernel_size=k, stride=stride, groups=groups)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    y, out_mask = mod.apply(params, jnp.asarray(x), jnp.asarray(mask))

    tconv = torch.nn.Conv1d(cin, cout, k, stride=stride, padding=k // 2, groups=groups)
    with torch.no_grad():
        # flax kernel (K, Cin/g, Cout) -> torch (Cout, Cin/g, K)
        tconv.weight.copy_(torch.from_numpy(np.asarray(params["params"]["kernel"])).permute(2, 1, 0))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
    xt = torch.from_numpy(x).permute(0, 2, 1)
    mt = torch.from_numpy(mask)[:, None, :].float()
    yt = tconv(xt)
    if stride > 1:
        mt_out = F.interpolate(mt, size=yt.shape[-1], mode="nearest")
    else:
        mt_out = mt
    yt = (yt * mt_out).permute(0, 2, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_mask), mt_out.squeeze(1).numpy().astype(bool))


def test_masked_conv_transpose_matches_torch(rng):
    b, t, cin, cout = 2, 24, 8, 6
    x = rng.standard_normal((b, t, cin), dtype=np.float32)
    mask = np.ones((b, t), dtype=bool)
    mod = conv.MaskedConvTranspose1D(features=cout, kernel_size=3, stride=2, output_padding=1)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    y, out_mask = mod.apply(params, jnp.asarray(x), jnp.asarray(mask))

    tconv = torch.nn.ConvTranspose1d(cin, cout, 3, stride=2, padding=1, output_padding=1)
    with torch.no_grad():
        # flax kernel (K, Cin, Cout) -> torch transpose conv weight (Cin, Cout, K)
        tconv.weight.copy_(torch.from_numpy(np.asarray(params["params"]["kernel"])).permute(1, 2, 0))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
    yt = tconv(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
    assert y.shape == yt.shape == (b, 2 * t, cout)
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_channel_layer_norm_matches_reference(rng):
    from reference_oracle import load_reference_blocks

    blocks = load_reference_blocks()
    c = 32
    x = rng.standard_normal((2, 10, c), dtype=np.float32) * 3 + 1
    ref_ln = blocks.LayerNorm(c)
    with torch.no_grad():
        ref_ln.weight.copy_(torch.rand(1, c, 1))
        ref_ln.bias.copy_(torch.rand(1, c, 1))
    ref = ref_ln(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
    w = ref_ln.weight.detach().numpy().reshape(c)
    bb = ref_ln.bias.detach().numpy().reshape(c)
    ours = np.asarray(norm.channel_layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bb)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 24, 8), dtype=np.float32)
    ours = np.asarray(norm.instance_norm_time(jnp.asarray(x)))
    ref = torch.nn.InstanceNorm1d(8)(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sinusoid_pe_matches_reference():
    from reference_oracle import load_reference_blocks

    blocks = load_reference_blocks()
    ref = blocks.get_sinusoid_encoding(768, 256).numpy()[0].T  # (T, C)
    ours = np.asarray(pe.sinusoid_encoding(768, 256))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_max_pool_skip_matches_torch(rng):
    x = rng.standard_normal((2, 24, 4), dtype=np.float32)
    ours = np.asarray(conv.max_pool_skip(jnp.asarray(x), 2))
    ref = torch.nn.MaxPool1d(3, stride=2, padding=1)(
        torch.from_numpy(x).permute(0, 2, 1)
    ).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def _naive_band_attention(q, k, v, kv_valid, w):
    """Independent dense-matrix oracle for the banded attention semantics."""
    b, h, t, d = q.shape
    att = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64)
    i = np.arange(t)[:, None]
    j = np.arange(t)[None, :]
    in_band = np.abs(i - j) <= w
    att = np.where(in_band[None, None], att, -np.inf)
    pen = np.where(kv_valid, 0.0, attention.NEG_PENALTY)  # (B, T)
    att = att + np.where(in_band[None, None], pen[:, None, None, :], 0.0)
    att = att - np.max(att, axis=-1, keepdims=True)
    e = np.exp(att)
    att = e / np.sum(e, axis=-1, keepdims=True)
    att = np.where(kv_valid[:, None, :, None], att, 0.0)
    return np.einsum("bhqk,bhkd->bhqd", att, v)


def test_band_attention_matches_naive(rng):
    b, h, t, d, w = 2, 4, 24, 8, 3
    q = rng.standard_normal((b, h, t, d), dtype=np.float32)
    k = rng.standard_normal((b, h, t, d), dtype=np.float32)
    v = rng.standard_normal((b, h, t, d), dtype=np.float32)
    lens = np.array([24, 13])
    kv_valid = np.arange(t)[None, :] < lens[:, None]
    ours = np.asarray(attention.band_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kv_valid), w))
    ref = _naive_band_attention(q, k, v, kv_valid, w)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_full_attention_matches_torch(rng):
    b, h, tq, tk, d = 2, 4, 6, 9, 8
    q = rng.standard_normal((b, h, tq, d), dtype=np.float32)
    k = rng.standard_normal((b, h, tk, d), dtype=np.float32)
    v = rng.standard_normal((b, h, tk, d), dtype=np.float32)
    kv_valid = np.ones((b, tk), dtype=bool)
    kv_valid[1, 5:] = False
    ours = np.asarray(attention.full_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kv_valid)))
    att = torch.einsum("bhqd,bhkd->bhqk", torch.from_numpy(q), torch.from_numpy(k))
    att = att.masked_fill(~torch.from_numpy(kv_valid)[:, None, None, :], float("-inf"))
    att = torch.softmax(att, dim=-1)
    ref = torch.einsum(
        "bhqk,bhkd->bhqd", att, torch.from_numpy(v) * torch.from_numpy(kv_valid)[:, None, :, None]
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pallas_band_attention_matches_xla(rng):
    from audio_visual_deepfake_detection_tpu.ops.pallas.band_attention import (
        band_attention_pallas)

    b, h, t, d, w = 2, 4, 96, 32, 3
    q = rng.standard_normal((b, h, t, d), dtype=np.float32)
    k = rng.standard_normal((b, h, t, d), dtype=np.float32)
    v = rng.standard_normal((b, h, t, d), dtype=np.float32)
    lens = np.array([96, 57])
    kv_valid = np.arange(t)[None, :] < lens[:, None]

    ref = np.asarray(attention.band_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kv_valid), w))
    out = np.asarray(band_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kv_valid), w,
        interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_band_attention_multi_row_tiles(rng):
    """Shapes large enough that the VMEM budget forces G>1 rows per grid step
    AND multiple grid steps (the retiled kernel's blocked path)."""
    from audio_visual_deepfake_detection_tpu.ops.pallas.band_attention import (
        band_attention_pallas)

    b, h, t, d, w = 24, 4, 768, 64, 3
    q = rng.standard_normal((b, h, t, d), dtype=np.float32)
    k = rng.standard_normal((b, h, t, d), dtype=np.float32)
    v = rng.standard_normal((b, h, t, d), dtype=np.float32)
    lens = rng.integers(5, t + 1, size=b)
    kv_valid = np.arange(t)[None, :] < lens[:, None]

    ref = np.asarray(attention.band_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kv_valid), w))
    out = np.asarray(band_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kv_valid), w,
        interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)
