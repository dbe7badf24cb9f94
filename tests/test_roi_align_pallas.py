"""Pallas RoIAlign kernel: interpret-mode parity on CPU (real-TPU execution
is exercised by bench.py) + backward determinism and masking."""

import functools

import numpy as np
import pytest

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp

from gpt4roi_tpu.ops.roi_align import roi_align_batched


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


def _data(rng, b=2, h=32, w=32, c=8, r=5):
    feats = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    boxes = rng.random((b, r, 4)).astype(np.float32)
    boxes = np.concatenate(
        [boxes[..., :2] * 15, boxes[..., :2] * 15 + 2 + boxes[..., 2:] * 15], -1
    ).astype(np.float32)
    mask = np.ones((b, r), bool)
    mask[1, 3:] = False
    return feats, jnp.asarray(boxes), jnp.asarray(mask)


def test_pallas_matches_xla(rng, interpret_pallas):
    from gpt4roi_tpu.ops.roi_align_pallas import roi_align_batched_pallas

    feats, boxes, mask = _data(rng)
    want = np.asarray(roi_align_batched(feats, boxes, mask, 7, 0.5, 2))
    got = np.asarray(roi_align_batched_pallas(feats, boxes, mask, 7, 0.5, 2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # masked slots exact zero
    assert np.abs(got[1, 3:]).max() == 0.0


def test_pallas_backward_matches_xla(rng, interpret_pallas):
    from gpt4roi_tpu.ops.roi_align_pallas import roi_align_batched_pallas

    feats, boxes, mask = _data(rng)

    def loss_p(f):
        return (roi_align_batched_pallas(f, boxes, mask, 7, 0.5, 2) ** 2).sum()

    def loss_x(f):
        return (roi_align_batched(f, boxes, mask, 7, 0.5, 2) ** 2).sum()

    gp = np.asarray(jax.grad(loss_p)(feats))
    gx = np.asarray(jax.grad(loss_x)(feats))
    np.testing.assert_allclose(gp, gx, atol=1e-4, rtol=1e-4)
    # deterministic
    gp2 = np.asarray(jax.grad(loss_p)(feats))
    np.testing.assert_array_equal(gp, gp2)
