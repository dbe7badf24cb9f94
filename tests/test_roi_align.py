"""RoIAlign correctness: from-spec NumPy oracle (mmcv aligned=True avg-mode
semantics, independently re-implemented from the documented algorithm),
golden vectors, finite-difference gradients, and padded-RoI masking."""

import numpy as np
import pytest

from gpt4roi_tpu.ops.roi_align import roi_align


def oracle_roi_align(feats, boxes, batch_idx, out, scale, ratio, aligned=True):
    """Naive loop implementation of aligned RoIAlign (avg mode)."""
    B, H, W, C = feats.shape
    R = boxes.shape[0]
    res = np.zeros((R, out, out, C), np.float64)

    def bilerp(img, y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y0 = int(np.floor(y))
        x0 = int(np.floor(x))
        if y0 >= H - 1:
            y0 = y1 = H - 1
            y = float(y0)
        else:
            y1 = y0 + 1
        if x0 >= W - 1:
            x0 = x1 = W - 1
            x = float(x0)
        else:
            x1 = x0 + 1
        ly, lx = y - y0, x - x0
        hy, hx = 1 - ly, 1 - lx
        return (
            hy * hx * img[y0, x0]
            + hy * lx * img[y0, x1]
            + ly * hx * img[y1, x0]
            + ly * lx * img[y1, x1]
        )

    off = 0.5 if aligned else 0.0
    for r in range(R):
        b = batch_idx[r]
        if b < 0:
            continue
        x1, y1, x2, y2 = boxes[r] * scale - off
        bw, bh = x2 - x1, y2 - y1
        if not aligned:
            bw, bh = max(bw, 1.0), max(bh, 1.0)
        binw, binh = bw / out, bh / out
        for ph in range(out):
            for pw in range(out):
                acc = np.zeros(C)
                for iy in range(ratio):
                    for ix in range(ratio):
                        yy = y1 + ph * binh + (iy + 0.5) * binh / ratio
                        xx = x1 + pw * binw + (ix + 0.5) * binw / ratio
                        acc += bilerp(feats[b], yy, xx)
                res[r, ph, pw] = acc / (ratio * ratio)
    return res.astype(np.float32)


@pytest.mark.parametrize("scale", [1.0, 0.5, 1.75])
def test_matches_oracle(rng, scale):
    feats = rng.standard_normal((2, 16, 16, 8), dtype=np.float32)
    boxes = np.array(
        [
            [0.0, 0.0, 16.0, 16.0],
            [2.0, 3.0, 9.5, 12.25],
            [-2.0, -2.0, 30.0, 30.0],  # partially out of range
            [5.0, 5.0, 5.5, 5.5],  # tiny box
        ],
        np.float32,
    )
    bidx = np.array([0, 1, 0, 1], np.int32)
    got = np.asarray(roi_align(feats, boxes, bidx, 7, scale, 2))
    want = oracle_roi_align(feats, boxes, bidx, 7, scale, 2)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_reference_strides_shapes(rng):
    """The exact call pattern of the SPI extractor: 4 levels, output 14,
    strides [1.75, 3.5, 7, 14] -> spatial_scale 1/stride, boxes in [0,224]
    (reference: gpt4roi/models/layers.py:206-216,295-313)."""
    sizes = [(128, 128), (64, 64), (32, 32), (16, 16)]
    strides = [1.75, 3.5, 7.0, 14.0]
    boxes = (rng.random((6, 4), dtype=np.float32) * 112.0).astype(np.float32)
    boxes = np.concatenate([boxes[:, :2], boxes[:, :2] + boxes[:, 2:] + 1.0], axis=1)
    bidx = np.zeros((6,), np.int32)
    for (h, w), s in zip(sizes, strides):
        feats = rng.standard_normal((1, h, w, 16), dtype=np.float32)
        out = np.asarray(roi_align(feats, boxes, bidx, 14, 1.0 / s, 2))
        assert out.shape == (6, 14, 14, 16)
        want = oracle_roi_align(feats, boxes, bidx, 14, 1.0 / s, 2)
        np.testing.assert_allclose(out, want, atol=1e-4, rtol=1e-4)


def test_padded_rois_zero_and_grad(rng):
    import jax
    import jax.numpy as jnp

    feats = jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32))
    boxes = jnp.asarray(np.array([[1, 1, 6, 6], [0, 0, 0, 0]], np.float32))
    bidx = jnp.asarray(np.array([1, -1], np.int32))
    out = roi_align(feats, boxes, bidx, 4, 1.0, 2)
    assert np.abs(np.asarray(out[1])).max() == 0.0

    # finite-difference gradient check on a few coordinates
    def loss(f):
        o = roi_align(f, boxes, bidx, 4, 1.0, 2)
        return (o * o).sum()

    g = jax.grad(loss)(feats)
    eps = 1e-3
    rng2 = np.random.default_rng(1)
    for _ in range(5):
        b, i, j, c = (
            rng2.integers(2),
            rng2.integers(8),
            rng2.integers(8),
            rng2.integers(4),
        )
        fp = np.asarray(feats).copy()
        fp[b, i, j, c] += eps
        fm = np.asarray(feats).copy()
        fm[b, i, j, c] -= eps
        fd = (loss(jnp.asarray(fp)) - loss(jnp.asarray(fm))) / (2 * eps)
        np.testing.assert_allclose(float(g[b, i, j, c]), float(fd), atol=1e-2, rtol=1e-2)


def test_gradients_deterministic(rng):
    """XLA is deterministic by construction — assert bitwise-identical grads
    across runs (the CUDA reference cannot: atomicAdd backward,
    roi_align_cuda_kernel.cuh:140-207)."""
    import jax
    import jax.numpy as jnp

    feats = jnp.asarray(rng.standard_normal((1, 16, 16, 8), dtype=np.float32))
    boxes = jnp.asarray(np.array([[1, 2, 13, 11]], np.float32))
    bidx = jnp.asarray(np.array([0], np.int32))
    gfn = jax.jit(jax.grad(lambda f: roi_align(f, boxes, bidx, 14, 1.0, 2).sum()))
    g1, g2 = np.asarray(gfn(feats)), np.asarray(gfn(feats))
    np.testing.assert_array_equal(g1, g2)
