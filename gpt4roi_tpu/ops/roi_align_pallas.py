"""Pallas TPU RoIAlign — the production kernel behind the SPI extractor.

Replaces the reference's CUDA kernel (one thread per output element, gather
+ atomicAdd backward; mmcv csrc/common/cuda/roi_align_cuda_kernel.cuh) with
a TPU-native formulation:

  * separability: each pooled output row/col is a weighted sum of <= 2*g
    feature rows/cols (g = sampling_ratio), so RoIAlign factorises into a
    sparse y-contraction then a sparse x-contraction;
  * the kernel grid is (B, C_blocks, R) with rois innermost: the (H, W, CB)
    feature block index depends only on (B, C_block), so Pallas's pipeline
    fetches each feature tile from HBM ONCE per image and all R rois reuse
    it from VMEM — the op is HBM-bandwidth-bound at B*H*W*C bytes instead
    of compute-bound like a dense interpolation-matrix matmul (factor H/4
    fewer FLOPs) or per-roi streaming (factor R less traffic);
  * tap indices live in SMEM (scalar memory) per roi; weighted dynamic
    row slices run on the VPU;
  * backward: scatter-free — d feat = sum_r Ay_r^T d out_r Ax_r, evaluated
    as XLA einsums per image (bitwise deterministic, unlike atomicAdd).

Numerics match mmcv aligned=True avg mode exactly (same clamp rules; weights
fold the sample-grid average; out-of-range samples contribute 0).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from gpt4roi_tpu.ops.roi_align import roi_align_matrices


def _axis_taps(
    start: jax.Array,  # (N,) scaled continuous start
    length: jax.Array,  # (N,)
    out_size: int,
    g: int,
    in_size: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse tap representation of the pooled interpolation matrix:
    taps (N, out, 2g) int32, weights (N, out, 2g) fp32 with the 1/g pooling
    average folded in. Semantics identical to roi_align._axis_matrices."""
    n = start.shape[0]
    bin_size = length / out_size
    ph = jnp.arange(out_size, dtype=jnp.float32)[None, :, None]
    iy = jnp.arange(g, dtype=jnp.float32)[None, None, :]
    pos = start[:, None, None] + (ph + (iy + 0.5) / g) * bin_size[:, None, None]  # (N, out, g)
    oor = (pos < -1.0) | (pos > float(in_size))
    pc = jnp.clip(pos, 0.0, float(in_size - 1))
    lo = jnp.minimum(jnp.floor(pc), float(max(in_size - 2, 0)))
    frac = pc - lo
    lo_i = lo.astype(jnp.int32)
    w_lo = jnp.where(oor, 0.0, (1.0 - frac) / g)
    w_hi = jnp.where(oor, 0.0, frac / g)
    taps = jnp.concatenate([lo_i, lo_i + 1], axis=-1)  # (N, out, 2g)
    wts = jnp.concatenate([w_lo, w_hi], axis=-1).astype(jnp.float32)
    return taps, wts


def _kernel(ytap_ref, xtap_ref, ywt_ref, xwt_ref, feat_ref, out_ref, tmp_ref, *, oh, ow, ntap):
    """Grid (B, C_blocks, R); feat block (1, H, W, CB) resident across R.

    Dynamic tap indexing must go through refs on TPU, so the y-contraction
    stages pooled rows into a VMEM scratch which the x-contraction then
    tap-slices.
    """
    # y-contraction: pooled rows (OH, W, CB) into scratch
    for i in range(oh):
        acc = None
        for t in range(ntap):
            idx = ytap_ref[0, i, t]
            wt = ywt_ref[0, i, t]
            sl = feat_ref[0, pl.ds(idx, 1), :, :]  # (1, W, CB)
            sl = sl.astype(jnp.float32) * wt
            acc = sl if acc is None else acc + sl
        tmp_ref[pl.ds(i, 1)] = acc
    # x-contraction: (OH, OW, CB)
    cols = []
    for j in range(ow):
        acc = None
        for t in range(ntap):
            idx = xtap_ref[0, j, t]
            wt = xwt_ref[0, j, t]
            sl = tmp_ref[:, pl.ds(idx, 1), :] * wt  # (OH, 1, CB)
            acc = sl if acc is None else acc + sl
        cols.append(acc)
    out_ref[0, 0] = jnp.concatenate(cols, axis=1).astype(out_ref.dtype)  # (OH, OW, CB)


def _vmem_budget_mb(default: int = 24) -> int:
    """Tunable VMEM budget (MB) for feature-tile sizing; the pallas_call
    vmem limit is set ~4 MB above it."""
    return int(os.environ.get("GPT4ROI_ROI_VMEM_MB", default))


def _pick_cblock(
    c: int, h: int, w: int, oh: int, bytes_per_elem: int, budget: int | None = None
) -> int:
    """Largest channel block whose double-buffered feature tile + fp32 row
    scratch fit the VMEM budget."""
    if budget is None:
        budget = _vmem_budget_mb() * 2**20
    cb = min(c, 512)

    def vmem(cb_: int) -> int:
        return 2 * h * w * cb_ * bytes_per_elem + oh * w * cb_ * 4

    while cb > 32 and vmem(cb) > budget:
        cb //= 2
    while c % cb != 0:
        cb //= 2
    return max(cb, 1)


def _kernel_v3(ytap_ref, xtap_ref, ywt_ref, xwt_ref, feat_ref, out_ref, *, oh, ow, ntap, rb):
    """Multi-RoI stacked-matmul variant: RB rois per grid step.

    The y-contraction stacks the RB rois' pooled-interp matrices into one
    (RB*OH, H) operand built in-kernel from VMEM tap tables (one-hot iota
    compares) so the MXU sees ~full rows instead of 14. Unlike the retired
    v2 variant this runs a SINGLE bf16 weight pass (taps quantised to bf16,
    rel err ~2^-9 — the output is emitted in the input dtype anyway, so the
    weight quantisation is the same order as the existing output rounding)
    and emits (OW, OH) spatial order to skip the per-roi in-kernel
    transposes; the caller swaps the two 14-wide axes in XLA where the swap
    fuses into the consumer."""
    h = feat_ref.shape[1]
    w = feat_ref.shape[2]
    cb = feat_ref.shape[3]
    rows = rb * oh
    fdt = feat_ref.dtype

    ytap = ytap_ref[0]  # (RB*OH, ntap) int32 (host pre-stacked)
    ywt = ywt_ref[0]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (rows, h), 1)
    a = jnp.zeros((rows, h), jnp.float32)
    for t in range(ntap):
        a = a + jnp.where(iota_h == ytap[:, t][:, None], ywt[:, t][:, None], 0.0)
    feat2 = feat_ref[0].reshape(h, w * cb)
    # (RB*OH, H) @ (H, W*CB) -> (RB*OH, W*CB) fp32 accumulate on the MXU
    tmp = jax.lax.dot_general(
        a.astype(fdt), feat2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    xtap = xtap_ref[0]  # (RB*OW, ntap)
    xwt = xwt_ref[0]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (rb * ow, w), 1)
    bx = jnp.zeros((rb * ow, w), jnp.float32)
    for t in range(ntap):
        bx = bx + jnp.where(iota_w == xtap[:, t][:, None], xwt[:, t][:, None], 0.0)
    bx = bx.reshape(rb, ow, w).astype(jnp.float32)

    tmp4 = tmp.reshape(rb, oh, w, cb)
    # batched (RB) dot: (OW, W) x (OH, W, CB) contract W -> (RB, OW, OH, CB),
    # written in that order (transpose-free); fp32 lhs x fp32 rhs
    o = jax.lax.dot_general(
        bx, tmp4, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio", "aligned"))
def _roi_align_pallas_fwd(
    feats: jax.Array,  # (B, H, W, C)
    boxes: jax.Array,  # (B, R, 4) input-image coords (pre-scale)
    box_mask: jax.Array,  # (B, R)
    output_size: int = 14,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jax.Array:
    b, h, w, c = feats.shape
    r_orig = boxes.shape[1]
    oh = ow = output_size
    g = sampling_ratio
    ntap = 2 * g

    RB = 8  # rois per grid step in the stacked-matmul variant
    # The stacked-matmul variants (v2 hi/lo, v3 single-bf16-pass) both
    # measured SLOWER than the slice kernel at production scale (v3: 9.5 ms
    # vs 7.6 ms for all 4 levels) — Mosaic lowers the per-roi x-stage dots
    # as many tiny (14, W) matmuls whose fixed cost dominates, and the
    # (h, w*cb) reshape forces a VMEM relayout of the feature tile. The
    # slice kernel's VPU tap-slices pipeline cleanly against the feature
    # DMAs instead. v3 stays selectable for future Mosaic revisions.
    use_v3 = os.environ.get("GPT4ROI_ROI_KERNEL", "slice") == "v3" and feats.dtype == jnp.bfloat16
    r = ((r_orig + RB - 1) // RB) * RB if use_v3 else r_orig
    if r != r_orig:
        boxes = jnp.pad(boxes, ((0, 0), (0, r - r_orig), (0, 0)))
        box_mask = jnp.pad(box_mask, ((0, 0), (0, r - r_orig)))

    flat = boxes.reshape(b * r, 4).astype(jnp.float32)
    offset = 0.5 if aligned else 0.0
    x1 = flat[:, 0] * spatial_scale - offset
    y1 = flat[:, 1] * spatial_scale - offset
    bw = flat[:, 2] * spatial_scale - offset - x1
    bh = flat[:, 3] * spatial_scale - offset - y1
    if not aligned:
        bw = jnp.maximum(bw, 1.0)
        bh = jnp.maximum(bh, 1.0)
    ytap, ywt = _axis_taps(y1, bh, oh, g, h)
    xtap, xwt = _axis_taps(x1, bw, ow, g, w)
    mask = box_mask.reshape(b * r, 1, 1).astype(jnp.float32)
    ywt = ywt * mask  # invalid rois -> all-zero weights -> exact zero output
    xwt = xwt * mask

    if use_v3:
        # the stacked intermediate is (RB*OH, W*CB) fp32 — size the channel
        # block for it
        cb = _pick_cblock(c, h, w, RB * oh, feats.dtype.itemsize)
        grid = (b, c // cb, r // RB)
        # pre-stack tap tables on host: (B*r/RB, RB*oh, ntap) — in-kernel
        # reshapes of tiny-lane int tables are Mosaic-layout hazards
        ytap = ytap.reshape(b * r // RB, RB * oh, ntap)
        ywt = ywt.reshape(b * r // RB, RB * oh, ntap)
        xtap = xtap.reshape(b * r // RB, RB * ow, ntap)
        xwt = xwt.reshape(b * r // RB, RB * ow, ntap)
        kernel = functools.partial(_kernel_v3, oh=oh, ow=ow, ntap=ntap, rb=RB)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, RB * oh, ntap), lambda bi, ci, ri: (bi * (r // RB) + ri, 0, 0)),
                pl.BlockSpec((1, RB * ow, ntap), lambda bi, ci, ri: (bi * (r // RB) + ri, 0, 0)),
                pl.BlockSpec((1, RB * oh, ntap), lambda bi, ci, ri: (bi * (r // RB) + ri, 0, 0)),
                pl.BlockSpec((1, RB * ow, ntap), lambda bi, ci, ri: (bi * (r // RB) + ri, 0, 0)),
                pl.BlockSpec((1, h, w, cb), lambda bi, ci, ri: (bi, 0, 0, ci)),
            ],
            # kernel emits (OW, OH) spatial order (transpose-free x-stage);
            # swapped back below in XLA where it fuses into the consumer
            out_specs=pl.BlockSpec(
                (1, RB, ow, oh, cb), lambda bi, ci, ri: (bi, ri, 0, 0, ci)
            ),
            out_shape=jax.ShapeDtypeStruct((b, r, ow, oh, c), feats.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * r * (oh * h * w * c // 16 + oh * ow * ntap * c),
                bytes_accessed=b * h * w * c * feats.dtype.itemsize
                + b * r * oh * ow * c * feats.dtype.itemsize,
                transcendentals=0,
            ),
        )(ytap, xtap, ywt, xwt, feats)
        return jnp.swapaxes(out, 2, 3)[:, :r_orig]

    cb = _pick_cblock(c, h, w, oh, feats.dtype.itemsize)
    grid = (b, c // cb, r)
    kernel = functools.partial(_kernel, oh=oh, ow=ow, ntap=ntap)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, oh, ntap), lambda bi, ci, ri: (bi * r + ri, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ow, ntap), lambda bi, ci, ri: (bi * r + ri, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, oh, ntap), lambda bi, ci, ri: (bi * r + ri, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ow, ntap), lambda bi, ci, ri: (bi * r + ri, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, cb), lambda bi, ci, ri: (bi, 0, 0, ci)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, oh, ow, cb), lambda bi, ci, ri: (bi, ri, 0, 0, ci)
        ),
        # interpolation math runs in fp32 (mmcv parity) but the result is
        # emitted in the input dtype — the SPI head casts it back anyway
        # (gpt4roi/models/layers.py:313) and it halves the write traffic
        out_shape=jax.ShapeDtypeStruct((b, r, oh, ow, c), feats.dtype),
        scratch_shapes=[pltpu.VMEM((oh, w, cb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(_vmem_budget_mb() + 4) * 2**20
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * (oh * ntap * w * c + oh * ow * ntap * c),
            bytes_accessed=b * h * w * c * feats.dtype.itemsize
            + b * r * oh * ow * c * feats.dtype.itemsize,
            transcendentals=0,
        ),
    )(ytap, xtap, ywt, xwt, feats)
    return out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def roi_align_batched_pallas(
    feats: jax.Array,
    boxes: jax.Array,
    box_mask: jax.Array,
    output_size: int = 14,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jax.Array:
    """(B, H, W, C), (B, R, 4), (B, R) -> (B, R, oh, ow, C) float32."""
    return _roi_align_pallas_fwd(
        feats, boxes, box_mask, output_size, spatial_scale, sampling_ratio, aligned
    )


def _bwd_kernel(ytap_ref, xtap_ref, ywt_ref, xwt_ref, dout_ref, dfeat_ref, tmp_ref, *, oh, ow, ntap, n_rois):
    """Backward: dfeat = sum_r Ay_r^T dOut_r Ax_r, evaluated tap-wise.

    Grid (B, C_blocks, R) with rois innermost: the dfeat output block index
    depends only on (b, c), so Pallas keeps it resident in VMEM across all
    R rois and writes back to HBM once — a deterministic, atomics-free
    scatter-accumulate (the CUDA reference needs atomicAdd here).
    """
    ri = pl.program_id(2)

    @pl.when(ri == 0)
    def _init():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    dout = dout_ref[0, 0].astype(jnp.float32)  # (OH, OW, CB)
    # x-transpose: tmp[w] accumulates columns of dout through the x taps
    tmp_ref[...] = jnp.zeros_like(tmp_ref)
    for j in range(ow):
        col = dout[:, j, :][:, None, :]  # (OH, 1, CB)
        for t in range(ntap):
            idx = xtap_ref[0, j, t]
            wt = xwt_ref[0, j, t]
            cur = tmp_ref[:, pl.ds(idx, 1), :]
            tmp_ref[:, pl.ds(idx, 1), :] = cur + col * wt
    # y-transpose: scatter pooled rows into feature rows through the y taps
    for i in range(oh):
        row = tmp_ref[pl.ds(i, 1)]  # (1, W, CB)
        for t in range(ntap):
            idx = ytap_ref[0, i, t]
            wt = ywt_ref[0, i, t]
            cur = dfeat_ref[0, pl.ds(idx, 1), :, :]
            dfeat_ref[0, pl.ds(idx, 1), :, :] = cur + (row * wt).astype(dfeat_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("in_hw", "output_size", "spatial_scale", "sampling_ratio", "aligned"),
)
def _roi_align_pallas_bwd(
    boxes: jax.Array,
    box_mask: jax.Array,
    g: jax.Array,  # (B, R, oh, ow, C) cotangent
    in_hw: Tuple[int, int] = (16, 16),
    output_size: int = 14,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
):
    b, r, oh, ow, c = g.shape
    h, w = in_hw
    sg = sampling_ratio
    ntap = 2 * sg

    flat = boxes.reshape(b * r, 4).astype(jnp.float32)
    offset = 0.5 if aligned else 0.0
    x1 = flat[:, 0] * spatial_scale - offset
    y1 = flat[:, 1] * spatial_scale - offset
    bw = flat[:, 2] * spatial_scale - offset - x1
    bh = flat[:, 3] * spatial_scale - offset - y1
    if not aligned:
        bw = jnp.maximum(bw, 1.0)
        bh = jnp.maximum(bh, 1.0)
    ytap, ywt = _axis_taps(y1, bh, oh, sg, h)
    xtap, xwt = _axis_taps(x1, bw, ow, sg, w)
    mask = box_mask.reshape(b * r, 1, 1).astype(jnp.float32)
    ywt = ywt * mask
    xwt = xwt * mask

    cb = _pick_cblock(c, h, w, oh, 4)
    grid = (b, c // cb, r)
    kernel = functools.partial(_bwd_kernel, oh=oh, ow=ow, ntap=ntap, n_rois=r)
    dfeat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, oh, ntap), lambda bi, ci, ri: (bi * r + ri, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ow, ntap), lambda bi, ci, ri: (bi * r + ri, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, oh, ntap), lambda bi, ci, ri: (bi * r + ri, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ow, ntap), lambda bi, ci, ri: (bi * r + ri, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, oh, ow, cb), lambda bi, ci, ri: (bi, ri, 0, 0, ci)),
        ],
        out_specs=pl.BlockSpec((1, h, w, cb), lambda bi, ci, ri: (bi, 0, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((oh, w, cb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * (oh * ow * ntap * c + oh * ntap * w * c),
            bytes_accessed=b * h * w * c * 4 + b * r * oh * ow * c * 4,
            transcendentals=0,
        ),
    )(ytap, xtap, ywt, xwt, g.astype(jnp.float32))
    return dfeat


def _fwd(feats, boxes, box_mask, output_size, spatial_scale, sampling_ratio, aligned):
    out = _roi_align_pallas_fwd(
        feats, boxes, box_mask, output_size, spatial_scale, sampling_ratio, aligned
    )
    return out, (feats, boxes, box_mask)


def _bwd(output_size, spatial_scale, sampling_ratio, aligned, res, g):
    feats, boxes, box_mask = res
    dfeats = _roi_align_pallas_bwd(
        boxes,
        box_mask,
        g,
        (feats.shape[1], feats.shape[2]),
        output_size,
        spatial_scale,
        sampling_ratio,
        aligned,
    ).astype(feats.dtype)
    return dfeats, jnp.zeros_like(boxes), None


roi_align_batched_pallas.defvjp(_fwd, _bwd)
