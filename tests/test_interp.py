"""Parity of interpolate_bilinear vs torch.nn.functional.interpolate for both
align_corners conventions (the reference uses both: SURVEY.md §7.2c)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gpt4roi_tpu.ops.interp import interpolate_bilinear


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((16, 16), (128, 128)), ((16, 16), (32, 32)), ((7, 5), (13, 11)), ((32, 32), (16, 16)), ((8, 8), (8, 8))],
)
def test_matches_torch(rng, align_corners, in_hw, out_hw):
    b, c = 2, 6
    x = rng.standard_normal((b, *in_hw, c), dtype=np.float32)
    got = np.asarray(interpolate_bilinear(x, out_hw, align_corners=align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=align_corners)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_identity_passthrough(rng):
    x = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(interpolate_bilinear(x, (8, 8), True)), x)


def test_grad_flows(rng):
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
    g = jax.grad(lambda v: interpolate_bilinear(v, (16, 16), True).sum())(x)
    # Each input pixel's weight column sums to the total pooled mass; just
    # check finiteness and that total mass is conserved (sum of grads = #out).
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(float(g.sum()), 16 * 16 * 4, rtol=1e-4)
