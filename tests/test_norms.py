"""Norm parity vs torch (GroupNorm-64 is inside every fuse conv; reference
gpt4roi/models/layers.py:140-143)."""

import numpy as np
import torch

from gpt4roi_tpu.ops.norms import group_norm, layer_norm, rms_norm


def test_group_norm_matches_torch(rng):
    b, h, w, c, g = 2, 5, 7, 64, 16
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    scale = rng.standard_normal(c, dtype=np.float32)
    bias = rng.standard_normal(c, dtype=np.float32)
    got = np.asarray(group_norm(x, scale, bias, g))
    m = torch.nn.GroupNorm(g, c)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(scale))
        m.bias.copy_(torch.from_numpy(bias))
    want = m(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((3, 11, 256), dtype=np.float32)
    scale = rng.standard_normal(256, dtype=np.float32)
    bias = rng.standard_normal(256, dtype=np.float32)
    got = np.asarray(layer_norm(x, scale, bias))
    m = torch.nn.LayerNorm(256)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(scale))
        m.bias.copy_(torch.from_numpy(bias))
    want = m(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_rms_norm(rng):
    x = rng.standard_normal((2, 9, 128), dtype=np.float32)
    scale = rng.standard_normal(128, dtype=np.float32)
    got = np.asarray(rms_norm(x, scale, eps=1e-6))
    xf = x.astype(np.float64)
    want = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6) * scale
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
