"""Bilinear interpolation as separable matrix contractions.

The reference calls ``F.interpolate(mode='bilinear')`` at two kinds of sites
with *different* corner conventions:
  * ``align_corners=True`` — multi-level upsampling + cross-level shuffle
    fusion (reference: gpt4roi/models/layers.py:166-175, 225-232);
  * ``align_corners=False`` — image preprocessing
    (reference: gpt4roi/app.py:131-136, gpt4roi/datasets/vcr.py:185-188).

A 2-D bilinear resize is separable: ``out = Ry @ x @ Rx^T`` with 1-D
interpolation matrices Ry (out_h, in_h) and Rx (out_w, in_w), each row
holding the two adjacent-tap weights. On TPU this runs on the MXU instead of
the gather units, and autodiff gives the exact transpose backward for free —
no scatter/atomics (contrast: CUDA backward atomicAdd in the reference's op
stack).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _source_positions(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Continuous source coordinate for each output index (torch semantics)."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            return np.zeros((1,), np.float64)
        return i * (in_size - 1) / (out_size - 1)
    return (i + 0.5) * (in_size / out_size) - 0.5


def linear_weight_rows(src: np.ndarray, in_size: int) -> np.ndarray:
    """Rows of 1-D linear-interp weights with border clamping.

    src: (N,) continuous positions. Returns (N, in_size) float32 where each
    row has <=2 non-zeros summing to 1 (positions are clamped to the valid
    range, replicating the border — torch's behaviour for interior resize).
    """
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, in_size - 2) if in_size > 1 else lo
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    rows = np.zeros((src.shape[0], in_size), np.float64)
    np.add.at(rows, (np.arange(src.shape[0]), lo), 1.0 - frac)
    np.add.at(rows, (np.arange(src.shape[0]), hi), frac)
    return rows.astype(np.float32)


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) 1-D bilinear resize matrix, cached per shape."""
    src = _source_positions(in_size, out_size, align_corners)
    return linear_weight_rows(src, in_size)


def _hilo(m: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split an fp32 matrix into bf16 hi + lo halves (hi + lo ~ m to ~2^-17
    relative) so a 2-pass bf16 MXU matmul reproduces fp32-weight accuracy."""
    import ml_dtypes

    hi = np.asarray(m, ml_dtypes.bfloat16)
    lo = np.asarray(m - hi.astype(np.float32), ml_dtypes.bfloat16)
    return jnp.asarray(hi, jnp.bfloat16), jnp.asarray(lo, jnp.bfloat16)


def _mm_hilo(m: np.ndarray, x: jax.Array, sub: str) -> jax.Array:
    """einsum(sub, m, x) with bf16 hi/lo weight split, fp32 accumulation,
    bf16 result. ~3x faster than fp32-HIGHEST on the MXU (2 passes vs 6)
    with error far below the bf16 operand quantisation."""
    hi, lo = _hilo(m)
    y = jnp.einsum(sub, hi, x, preferred_element_type=jnp.float32) + jnp.einsum(
        sub, lo, x, preferred_element_type=jnp.float32
    )
    return y.astype(jnp.bfloat16)


def interpolate_bilinear(
    x: jax.Array,
    size: Tuple[int, int],
    align_corners: bool = False,
) -> jax.Array:
    """Bilinear-resize ``x`` (..., H, W, C) to (..., size[0], size[1], C).

    Matches ``torch.nn.functional.interpolate(mode='bilinear')`` numerics for
    both corner conventions. fp32 inputs compute in fp32-HIGHEST on the MXU
    (the reference also upcasts for interp: gpt4roi/models/layers.py:166-169);
    bf16 inputs use a bf16 hi/lo weight split — fp32-equivalent interpolation
    weights at bf16 matmul speed, the operands being bf16-quantised anyway.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    ry = resize_matrix(h, oh, align_corners)
    rx = resize_matrix(w, ow, align_corners)
    orig_dtype = x.dtype
    if orig_dtype == jnp.bfloat16:
        y = _mm_hilo(ry, x, "ih,...hwc->...iwc")
        return _mm_hilo(rx, y, "jw,...iwc->...ijc")
    y = jnp.einsum(
        "ih,...hwc->...iwc",
        jnp.asarray(ry),
        x.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    y = jnp.einsum("jw,...iwc->...ijc", jnp.asarray(rx), y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(orig_dtype)
