"""Flash attention must be differentiable (TPU training path): VJP vs the
XLA formulation's gradients (interpret-mode kernel on CPU)."""

import functools

import numpy as np
import pytest

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp

from gpt4roi_tpu.ops import attention as A


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


def test_flash_gradients_match_xla(rng, interpret_pallas):
    b, s, n, d = 1, 256, 2, 128
    q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    seg = jnp.asarray((rng.random((b, s)) < 0.9).astype(np.int32))

    def loss_flash(q, k, v):
        return (A.flash_attention(q, k, v, seg, True, 128, 128) ** 2).sum()

    def loss_xla(q, k, v):
        mask = seg[:, None, :, None] == seg[:, None, None, :]
        return (A.mha(q, k, v, mask=mask, causal=True) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3, rtol=2e-3)
