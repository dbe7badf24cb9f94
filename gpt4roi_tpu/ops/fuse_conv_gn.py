"""Pallas int8 fuse-conv epilogue for the SPI shuffle-fuse pyramid.

The static-W8A8 fuse round (models/spi.py::one_round_static) runs ONE int8
3x3 conv per level, then scale -> GroupNorm(64) -> ReLU in XLA.

MEASURED OUTCOME (scripts/micro_fuse_epilogue.py, v5e, 2026-08-19): this
kernel is numerically clean (rel-err <= 4.7e-3, bf16 class) but a WASH vs
the XLA chain — 16.58 ms vs 16.50 ms per round over the 4 production
levels. XLA already fuses the scale/GN-stats epilogue into its int8 conv;
the int32-in-HBM round-trip this kernel was built to remove does not
exist in the lowered HLO. Kept as fuse mode="pallas" (default off) as the
measured closure of PARITY.md's round-3 encode lever.

This kernel computes the conv as 9 shifted int8 MXU dots on a halo'd VMEM
tile (manually DMA'd from a spatially pre-padded int8 map), applies the
combined per-output-channel scale (activation scale x weight scale) in
registers, and emits

  * the SCALED bf16 pre-GN map (2 B/el — the only full-map HBM write), and
  * per-(image, group) GN partial sums/sumsq reduced in-register from the
    f32 accumulator (a (B, 64) pair instead of a full-map stats pass).

GroupNorm-apply + ReLU + the next round's static requantize stay in XLA:
given the (B, 64) stats they are pure elementwise ops that fuse into the
consumers (bilinear interp reads + int8 concat), so no second Pallas pass
is needed.

Grid: (B, cout_tiles, h_tiles), h innermost so the weight block (per
cout_tile) stays resident across the inner h sweep. Each grid step writes
ONE row of the tiny (B*n_ct*n_ht, gt) stats buffers (dynamic-sublane
store; Mosaic rejects lane-offset partial blocks), and the n_ht reduction
+ group concatenation finish in XLA on ~KBs of data.

Reference op being replaced: the fuse ConvModule + GN of
gpt4roi/models/layers.py:128-180 (mmcv/cnn/bricks/conv_module.py:16) — an
inference-only serving path (int8 has no gradient), so no VJP is defined.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GN_GROUPS = 64


def _kernel(x_ref, w_ref, scale_ref, y_ref, ssum_ref, ssq_ref, xs, sem,
            *, th: int, w: int, cin: int, ct: int, gsize: int,
            n_ct: int, n_ht: int):
    b = pl.program_id(0)
    ci = pl.program_id(1)
    ht = pl.program_id(2)

    # halo'd input rows: the map is pre-padded spatially, so the slice is
    # always in-bounds and needs no edge logic
    dma = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(ht * th, th + 2)], xs, sem
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros((th, w, ct), jnp.int32)
    # hoist the dx column shifts: a dx!=0 slice is a misaligned-sublane
    # window that costs a vector shift of the whole tile — 3 shifts
    # (reused across dy) instead of 9
    for dx in range(3):
        xdx = xs[:, dx : dx + w, :]
        for dy in range(3):
            acc = acc + jax.lax.dot_general(
                xdx[dy : dy + th],
                w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    accf = acc.astype(jnp.float32) * scale_ref[0][None, None, :]
    y_ref[0] = accf.astype(jnp.bfloat16)

    gt = ct // gsize  # GN groups covered by this cout tile
    colsum = jnp.sum(accf, axis=(0, 1)).reshape(1, ct)
    colsq = jnp.sum(accf * accf, axis=(0, 1)).reshape(1, ct)
    # channel -> group reduction as a tiny 0/1-matrix dot: Mosaic cannot
    # shape-cast (ct,) -> (gt, gsize) (lane -> sublane split)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ct, gt), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (ct, gt), 1)
    gmat = (rowi // gsize == coli).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    gsum = jax.lax.dot_general(colsum, gmat, dn, preferred_element_type=jnp.float32)
    gsq = jax.lax.dot_general(colsq, gmat, dn, preferred_element_type=jnp.float32)

    # each grid step owns ONE row of the (B*n_ct*n_ht, gt) stats buffers
    # (write-once, reduced over n_ht in XLA): Mosaic allows dynamic
    # SUBLANE stores, not the lane-offset partial blocks a (B, groups)
    # layout would need
    r = (b * n_ct + ci) * n_ht + ht
    ssum_ref[pl.ds(r, 1), :] = gsum
    ssq_ref[pl.ds(r, 1), :] = gsq


@functools.partial(
    jax.jit, static_argnames=("out_w", "h_tile", "c_tile", "groups", "interpret")
)
def fuse_conv_scaled_stats(
    xpad_q: jax.Array,  # (B, H+2, Wp, Cin) int8: spatial zero-pad, Wp =
    # W+2 rounded up to 8 (Mosaic sublane tiling needs 8-aligned DMA
    # slices along the second-minor dim)
    wq: jax.Array,  # (3, 3, Cin, Cout) int8
    scale: jax.Array,  # (Cout,) f32 — combined act x per-channel weight scale
    out_w: int = 0,  # true output width W (0 = Wp - 2)
    h_tile: int = 16,
    c_tile: int = 256,
    groups: int = GN_GROUPS,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (y_scaled bf16 (B,H,W,Cout), gsum f32 (B,G), gsq f32 (B,G)).

    ``y_scaled`` is the conv output times ``scale`` BEFORE GroupNorm;
    ``gsum``/``gsq`` are per-(image, group) sums/sums-of-squares of the f32
    scaled values (finish GN with mean = gsum/(H*W*group_size) etc.).
    """
    b, hp, wp, cin = xpad_q.shape
    h = hp - 2
    w = out_w or (wp - 2)
    cout = wq.shape[-1]
    gsize = cout // groups
    assert cout % c_tile == 0 and c_tile % gsize == 0
    h_tile = min(h_tile, h)
    assert h % h_tile == 0
    n_ct = cout // c_tile
    n_ht = h // h_tile
    gt = c_tile // gsize

    kern = functools.partial(
        _kernel, th=h_tile, w=w, cin=cin, ct=c_tile, gsize=gsize,
        n_ct=n_ct, n_ht=n_ht,
    )
    rows = b * n_ct * n_ht
    y, gsum, gsq = pl.pallas_call(
        kern,
        grid=(b, n_ct, n_ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xpad: manual DMA
            pl.BlockSpec(
                (3, 3, cin, c_tile),
                lambda bi, ci, hi: (0, 0, 0, ci),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c_tile), lambda bi, ci, hi: (0, ci),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, h_tile, w, c_tile),
                lambda bi, ci, hi: (bi, hi, 0, ci),
                memory_space=pltpu.VMEM,
            ),
            # whole stats buffers resident (constant index map): tiny
            # (rows x gt x 4 B), every row written exactly once
            pl.BlockSpec(
                (rows, gt), lambda bi, ci, hi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rows, gt), lambda bi, ci, hi: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, cout), jnp.bfloat16),
            jax.ShapeDtypeStruct((rows, gt), jnp.float32),
            jax.ShapeDtypeStruct((rows, gt), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2, wp, cin), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # 16-row tiles need ~17M of scoped vmem (weights + halo tile +
            # int32/f32 accumulators + double-buffered out); the default
            # 16M cap is conservative on v5e
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xpad_q, wq, scale.reshape(1, -1))
    # rows layout: ((b * n_ct) + ci) * n_ht + hi — reduce over h tiles,
    # then cout tiles concatenate into the contiguous group axis
    gsum = gsum.reshape(b, n_ct, n_ht, gt).sum(axis=2).reshape(b, groups)
    gsq = gsq.reshape(b, n_ct, n_ht, gt).sum(axis=2).reshape(b, groups)
    return y, gsum, gsq


def fuse_round_level_pallas(
    qcat: jax.Array,  # (B, H, W, Cin) int8 — the quantized channel concat
    wq: jax.Array,  # (3, 3, Cin, Cout) int8
    combined_scale: jax.Array,  # (Cout,) f32
    gn_scale: jax.Array,  # (Cout,)
    gn_bias: jax.Array,  # (Cout,)
    out_dtype=jnp.bfloat16,
    eps: float = 1e-5,
    groups: int = GN_GROUPS,
    interpret: bool = False,
) -> jax.Array:
    """One static-W8A8 fuse round at one level: Pallas conv+scale+stats,
    then GN-apply + ReLU as XLA elementwise (fuses into consumers).
    Numerics match models/spi.py::one_round_static exactly up to the f32
    GN-stat reduction order."""
    b, h, w, _ = qcat.shape
    cout = wq.shape[-1]
    # right-pad W+2 to a multiple of 8: Mosaic DMA slices along the
    # second-minor dim must be 8-aligned (extra zero columns are unused)
    wpad = (-(w + 2)) % 8
    xpad = jnp.pad(qcat, ((0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
    h_tile = 16 if h >= 64 else h
    y, gsum, gsq = fuse_conv_scaled_stats(
        xpad, wq, combined_scale, out_w=w, h_tile=h_tile,
        c_tile=min(256, cout), groups=groups, interpret=interpret,
    )
    n = h * w * (cout // groups)
    mean = gsum / n  # (B, 64)
    var = jnp.maximum(gsq / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    # broadcast group stats to channels
    mean_c = jnp.repeat(mean, cout // groups, axis=-1)  # (B, Cout)
    rstd_c = jnp.repeat(rstd, cout // groups, axis=-1)
    yf = y.astype(jnp.float32)
    yn = (yf - mean_c[:, None, None, :]) * rstd_c[:, None, None, :]
    yn = yn * gn_scale.astype(jnp.float32) + gn_bias.astype(jnp.float32)
    return jax.nn.relu(yn).astype(out_dtype)
