"""RoIAlign as separable interpolation-matrix contractions (TPU-native).

Semantics reproduced exactly from the reference CUDA op (mmcv ``RoIAlign``
with ``aligned=True``, avg pool, ``sampling_ratio=2`` — reference:
mmcv-1.4.7/mmcv/ops/roi_align.py:134-224 and
mmcv-1.4.7/mmcv/ops/csrc/common/cuda/roi_align_cuda_kernel.cuh:18-108; called
per level in fp32 at gpt4roi/models/layers.py:307-313):

  * aligned: continuous coords are offset by -0.5 ("pixel centre" model);
  * each output bin averages ``sampling_ratio**2`` bilinear samples;
  * samples with y < -1 or y > H (resp. x) contribute exact zeros;
  * coords <= 0 clamp to 0; floor(y) >= H-1 collapses both taps onto H-1.

TPU-first formulation: a bilinear sample is a rank-1 weight pattern
``wy ⊗ wx`` over the (H, W) grid, so the whole RoIAlign of one RoI is
``out = Ay @ feat @ Ax^T`` with per-RoI matrices Ay (out_h, H), Ax (out_w, W)
that already fold in the sample-grid averaging. This replaces the reference's
one-thread-per-output-element gather kernel with two MXU matmuls, and its
atomicAdd backward with the (automatically derived) transposed matmuls —
bitwise-deterministic gradients, which the CUDA version cannot guarantee.

Layout: feats are NHWC (B, H, W, C) — channels-last rides the TPU lane
dimension. Invalid/padded RoIs are flagged with ``batch_idx < 0`` and produce
exact-zero outputs (static-shape masking; the reference instead carries
variable-length python lists of boxes).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _axis_matrices(
    start: jax.Array,  # (R,) continuous start coord (already scaled, -0.5 applied)
    length: jax.Array,  # (R,) continuous extent
    out_size: int,
    sampling_ratio: int,
    in_size: int,
) -> jax.Array:
    """Per-RoI 1-D pooled interpolation matrix (R, out_size, in_size), fp32."""
    r = start.shape[0]
    g = sampling_ratio
    bin_size = length / out_size  # (R,)
    ph = jnp.arange(out_size, dtype=jnp.float32)[None, :, None]  # (1, out, 1)
    iy = jnp.arange(g, dtype=jnp.float32)[None, None, :]  # (1, 1, g)
    # sample coord: start + ph*bin + (iy+0.5)*bin/g  -> (R, out, g)
    pos = start[:, None, None] + (ph + (iy + 0.5) / g) * bin_size[:, None, None]
    pos = pos.reshape(r, out_size * g)  # (R, S)

    out_of_range = (pos < -1.0) | (pos > float(in_size))
    pc = jnp.clip(pos, 0.0, float(in_size - 1))
    lo = jnp.floor(pc)
    lo = jnp.minimum(lo, float(max(in_size - 2, 0)))
    frac = pc - lo
    lo_i = lo.astype(jnp.int32)

    grid = jnp.arange(in_size, dtype=jnp.int32)[None, None, :]  # (1, 1, in)
    w_lo = jnp.where(grid == lo_i[:, :, None], (1.0 - frac)[:, :, None], 0.0)
    w_hi = jnp.where(grid == (lo_i + 1)[:, :, None], frac[:, :, None], 0.0)
    rows = jnp.where(out_of_range[:, :, None], 0.0, w_lo + w_hi)  # (R, S, in)
    # fold the sample-grid average: A[r, p, h] = (1/g) sum_{s in bin p} rows
    return rows.reshape(r, out_size, g, in_size).sum(axis=2) / float(g)


def roi_align_matrices(
    boxes: jax.Array,  # (R, 4) x1, y1, x2, y2 in input-image coordinates
    in_hw: Tuple[int, int],
    output_size: Tuple[int, int],
    spatial_scale: float,
    sampling_ratio: int,
    aligned: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Build Ay (R, out_h, H) and Ax (R, out_w, W) pooled-interp matrices."""
    assert sampling_ratio > 0, "dynamic (adaptive) sampling grid is not supported on TPU"
    h, w = in_hw
    oh, ow = output_size
    boxes = boxes.astype(jnp.float32)
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] * spatial_scale - offset
    y1 = boxes[:, 1] * spatial_scale - offset
    x2 = boxes[:, 2] * spatial_scale - offset
    y2 = boxes[:, 3] * spatial_scale - offset
    bw = x2 - x1
    bh = y2 - y1
    if not aligned:
        bw = jnp.maximum(bw, 1.0)
        bh = jnp.maximum(bh, 1.0)
    ay = _axis_matrices(y1, bh, oh, sampling_ratio, h)
    ax = _axis_matrices(x1, bw, ow, sampling_ratio, w)
    return ay, ax


def roi_align(
    feats: jax.Array,  # (B, H, W, C)
    boxes: jax.Array,  # (R, 4)
    batch_idx: jax.Array,  # (R,) int; < 0 marks padded RoIs -> zero output
    output_size: int | Tuple[int, int] = 14,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jax.Array:
    """RoIAlign -> (R, out_h, out_w, C) float32.

    Pure-XLA path (works on CPU and TPU, autodiff gives the exact adjoint).
    The contraction folds a RoI->image one-hot into Ay so XLA sees two plain
    matmuls; padded RoIs (batch_idx < 0) yield exact zeros.
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    b, h, w, c = feats.shape
    r = boxes.shape[0]
    ay, ax = roi_align_matrices(
        boxes, (h, w), output_size, spatial_scale, sampling_ratio, aligned
    )
    onehot = (batch_idx[:, None] == jnp.arange(b)[None, :]).astype(jnp.float32)  # (R, B)
    ayb = ay[:, :, None, :] * onehot[:, None, :, None]  # (R, oh, B, H)
    ayb = ayb.reshape(r, output_size[0], b * h)
    f32 = feats.astype(jnp.float32).reshape(b * h, w, c)
    tmp = jnp.einsum("rim,mwc->riwc", ayb, f32, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("rjw,riwc->rijc", ax, tmp, precision=jax.lax.Precision.HIGHEST)
    return out


def roi_align_batched(
    feats: jax.Array,  # (B, H, W, C)
    boxes: jax.Array,  # (B, R, 4) — slot (b, r) belongs to image b
    box_mask: jax.Array,  # (B, R) — False slots yield exact zeros
    output_size: int | Tuple[int, int] = 14,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jax.Array:
    """Structured RoIAlign -> (B, R, oh, ow, C) float32.

    The SPI extractor always has a static roi->image structure (R padded
    slots per image), so instead of the generic one-hot batch fold (which
    costs an extra factor of B in FLOPs) this vmaps the two per-image
    matmuls: out_b = Ay_b @ feat_b @ Ax_b^T. This is the production path
    used by spi_forward.
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    _, h, w, _ = feats.shape

    def one(feat, bxs, msk):
        ay, ax = roi_align_matrices(
            bxs, (h, w), output_size, spatial_scale, sampling_ratio, aligned
        )
        tmp = jnp.einsum(
            "rih,hwc->riwc", ay, feat.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST
        )
        out = jnp.einsum("rjw,riwc->rijc", ax, tmp, precision=jax.lax.Precision.HIGHEST)
        return out * msk[:, None, None, None].astype(jnp.float32)

    return jax.vmap(one)(feats, boxes, box_mask)
