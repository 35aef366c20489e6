"""Parity: whole-MultiscaleBlock Pallas kernel (interpret mode) == XLA path.

ops/pallas/mvit_block.py runs one grid step per chunk with the entire block
(pre-LN -> qkv -> token pools -> pooled attention with the temporal rel-pos
band -> residual pooling -> proj -> MLP) in VMEM. These tests pin its
semantics on CPU via the pallas interpreter against the standard
frontends/mvit.py XLA path, over every geometry knob the dispatch accepts:
spatial grids (t,2,2) and (t,1,1), head_dim < 128 and == 128, a rel-pos
table larger than the runtime clip (the bucketed-tail case), and the full
encoder with transition blocks interleaved.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.mvit import (
    MSBlockConfig, MultiscaleBlock, MViTVideoEncoder, generate_config)
from audio_visual_deepfake_detection_tpu.ops.pallas import mvit_block


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _noisy(params, rng):
    """Random values everywhere — zero-init tables (rel_pos_t) or identity
    affines would hide shear/affine bugs."""
    leaves, tree = jax.tree_util.tree_flatten(params)
    out = [jnp.asarray(rng.standard_normal(l.shape) * 0.2, l.dtype)
           for l in leaves]
    return jax.tree_util.tree_unflatten(tree, out)


def _block_case(rng, *, t, hs, ws, c, nh, cfg_t=None, stride_kv=None,
                dtype=jnp.float32, batch=2):
    cfg_t = cfg_t or t
    stride_kv = stride_kv or (1, hs, ws)
    cfg = MSBlockConfig(
        num_heads=nh, input_channels=c, output_channels=c,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 1, 1), stride_kv=stride_kv)
    block = MultiscaleBlock(cfg, (cfg_t, hs, ws), dtype=dtype)
    thw = (t, hs, ws)
    n = 1 + t * hs * ws
    x = jnp.asarray(rng.standard_normal((batch, n, c)), dtype)
    params = _noisy(block.init(jax.random.PRNGKey(0), x, thw), rng)
    return block, params, x, thw


def _run_both(block, params, x, thw, monkeypatch):
    monkeypatch.setattr(mvit_block, "INTERPRET", False)
    monkeypatch.setattr(mvit_block, "ENABLED", False)
    want, thw_w = block.apply(params, x, thw)
    monkeypatch.setattr(mvit_block, "INTERPRET", True)
    got, thw_g = block.apply(params, x, thw)
    assert thw_w == thw_g == thw
    return np.asarray(want), np.asarray(got)


@pytest.mark.parametrize("case", [
    dict(t=8, hs=2, ws=2, c=128, nh=2),            # stage-3-like, d=64
    dict(t=8, hs=2, ws=2, c=384, nh=4),            # production d=96
    dict(t=8, hs=1, ws=1, c=128, nh=1),            # stage-4-like, d=128
    dict(t=8, hs=1, ws=1, c=256, nh=2, stride_kv=(1, 1, 1)),
    dict(t=5, hs=2, ws=2, c=128, nh=2),            # non-power-of-2 T
    dict(t=8, hs=2, ws=2, c=128, nh=2, cfg_t=16),  # bucketed tail: table > T
    dict(t=4, hs=4, ws=4, c=192, nh=2),            # stage-2: 4x4 grid,
                                                   # lane-padded C=192
])
def test_fused_block_matches_xla(rng, monkeypatch, case):
    block, params, x, thw = _block_case(rng, **case)
    want, got = _run_both(block, params, x, thw, monkeypatch)
    # randomized params push activations to ~1e2, so pure-f32 reassociation
    # (split cls-key softmax term, matmul-based group-LN stats) shows up at
    # ~1e-4 relative; real bugs (shear/tap/order errors) are O(1)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=5e-4)


def test_fused_block_bf16(rng, monkeypatch):
    block, params, x, thw = _block_case(rng, t=8, hs=2, ws=2, c=128, nh=2,
                                        dtype=jnp.bfloat16)
    want, got = _run_both(block, params, x, thw, monkeypatch)
    # bf16 mode reorders bf16 roundings (split cls-key softmax term, f32
    # tap accumulation), so compare distributionally against the
    # activation scale rather than elementwise
    d = np.abs(got.astype(np.float32) - want.astype(np.float32))
    scale = float(np.std(want.astype(np.float32)))
    assert np.median(d) < 0.005 * scale, (np.median(d), scale)
    assert d.max() < 0.1 * scale, (d.max(), scale)


def test_fused_block_dispatch_excludes_transitions(monkeypatch):
    """Transition blocks (stride_q > 1 or channel change) must not dispatch."""
    monkeypatch.setattr(mvit_block, "INTERPRET", True)
    trans = MultiscaleBlock(MSBlockConfig(
        num_heads=2, input_channels=128, output_channels=128,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2), stride_kv=(1, 2, 2)), (8, 2, 2))
    assert not trans._fused_geometry_ok((8, 2, 2), 33)
    proj = MultiscaleBlock(MSBlockConfig(
        num_heads=2, input_channels=128, output_channels=256,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 1, 1), stride_kv=(1, 2, 2)), (8, 2, 2))
    assert not proj._fused_geometry_ok((8, 2, 2), 33)
    wide_head = MultiscaleBlock(MSBlockConfig(
        num_heads=2, input_channels=384, output_channels=384,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 1, 1), stride_kv=(1, 2, 2)), (8, 2, 2))
    assert not wide_head._fused_geometry_ok((8, 2, 2), 33)  # d=192 > 128
    padded_c = MultiscaleBlock(MSBlockConfig(
        num_heads=2, input_channels=192, output_channels=192,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 1, 1), stride_kv=(1, 2, 2)), (8, 2, 2))
    assert padded_c._fused_geometry_ok((8, 2, 2), 33)  # lane-padded C ok
    ok = MultiscaleBlock(MSBlockConfig(
        num_heads=2, input_channels=128, output_channels=128,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 1, 1), stride_kv=(1, 2, 2)), (8, 2, 2))
    assert ok._fused_geometry_ok((8, 2, 2), 33)


def test_fused_encoder_end_to_end(rng, monkeypatch):
    """Full MViT encoder (2-stage tiny geometry): the eligible steady blocks
    dispatch to the kernel, transitions stay XLA, output matches the pure
    XLA encoder. spatial_size=(24,24) -> 2x2 token grid so the stage-1
    steady block pools k/v to (t,1,1)."""
    cfgs = tuple(generate_config([2, 1], [1, 2], [128, 128], out_dim=32))
    model = MViTVideoEncoder(cfgs, temporal_size=8, spatial_size=(24, 24))
    video = jnp.asarray(rng.standard_normal((2, 8, 24, 24, 3)), jnp.float32)
    params = _noisy(model.init(jax.random.PRNGKey(0), video[:1]), rng)

    monkeypatch.setattr(mvit_block, "INTERPRET", False)
    monkeypatch.setattr(mvit_block, "ENABLED", False)
    want = np.asarray(model.apply(params, video))
    monkeypatch.setattr(mvit_block, "INTERPRET", True)
    got = np.asarray(model.apply(params, video))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=5e-4)
