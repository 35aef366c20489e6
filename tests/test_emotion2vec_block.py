"""Emotion2Vec AltBlock golden test against a minimal torch mirror of the
reference block (modules.py:184-249 post-norm path + AltAttention :252-320;
the reference file itself needs timm/fairseq, so the oracle re-creates the
same math with plain torch modules)."""

import numpy as np
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from audio_visual_deepfake_detection_tpu.frontends.emotion2vec import AltBlock


class TorchAltBlock(tnn.Module):
    """Post-norm AltBlock: x = x + attn(x); r = norm1(x);
    x = norm2(r + mlp(r)) — modules.py:240-247, qkv_bias=True."""

    def __init__(self, dim, heads, mlp_ratio=4.0, eps=1e-6):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, 3 * dim, bias=True)
        self.proj = tnn.Linear(dim, dim)
        self.norm1 = tnn.LayerNorm(dim, eps=eps)
        self.norm2 = tnn.LayerNorm(dim, eps=eps)
        self.fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = tnn.Linear(int(dim * mlp_ratio), dim)

    def attn(self, x):
        b, n, c = x.shape
        d = c // self.heads
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        out = (att @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)

    def forward(self, x):
        x = x + self.attn(x)
        r = self.norm1(x)
        h = self.fc2(tnn.functional.gelu(self.fc1(r)))
        return self.norm2(r + h)


def test_altblock_matches_torch(rng):
    dim, heads = 64, 4
    torch.manual_seed(0)
    ref = TorchAltBlock(dim, heads)
    ref.eval()

    ours = AltBlock(dim, heads)
    x = rng.standard_normal((2, 10, dim)).astype(np.float32)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # convert weights using the same layout rules as convert_emotion2vec_torch
    from flax import traverse_util

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    name_map = {
        ("attn", "qkv"): "qkv", ("attn", "proj"): "proj",
        ("norm1",): "norm1", ("norm2",): "norm2",
        ("mlp_fc1",): "fc1", ("mlp_fc2",): "fc2",
    }
    out = {}
    for path, tmpl in traverse_util.flatten_dict(template).items():
        core = path[1:]
        leaf = core[-1]
        key = tuple(core[:-1])
        ref_name = name_map[key]
        if leaf == "kernel":
            out[path] = np.transpose(sd[f"{ref_name}.weight"])
        elif leaf == "scale":
            out[path] = sd[f"{ref_name}.weight"]
        else:
            out[path] = sd[f"{ref_name}.bias"]
        assert out[path].shape == tuple(tmpl.shape), path
    params = traverse_util.unflatten_dict(out)

    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)
