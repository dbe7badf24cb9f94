"""Fused Pallas AdamW-8bit update: dequant -> clip -> adam -> bias-correct
-> weight-decay -> lr -> requant, one HBM pass per leaf.

Why: the XLA 8-bit update was measured at ~49 ms/layer at the stage-2 shape
(scripts/micro_layer_bwd.py, grad+adamw8bit slope 89.3 vs grad-only 40.2)
against a ~2.5 ms/layer HBM roofline — the (nblocks, 256) moment storage
forces a full relayout copy of every tensor on each quantize/dequantize,
and the per-layer lax.map (round-4 OOM fix) serialized those copies. Here
the int8 moments are stored PARAM-SHAPED (same tiled layout as the grad, so
no relayout ever happens) with (rows, C/256) f32 block scales — the block
semantics are unchanged: 256 contiguous elements of the row-major flattened
tensor share one scale, exactly the bitsandbytes blockwise scheme
(reference: gpt4roi/train/llava_trainer.py:144-157).

Kernel layout notes (Mosaic): a 1D grid over row tiles; each instance owns
a (tr, C) tile of every tensor plus its (tr, C/256) scale rows. Blockwise
views are LANE-SPLIT reshapes (tr, C) -> (tr, C/256, 256), which Mosaic
supports (probed on this backend) — sublane/lane-mixing reshapes like
(tr, C) -> (tr*C/256, 256) are not. 8-bit <-> f32 casts hop through int32
(no direct 8-bit <-> float cast either).

The kernel emits the FINAL update delta (-lr * (adam_step + wd * p)) plus
re-quantized moments; moment buffers are donated via input_output_aliases
so no second copy of the optimizer state ever exists (this, not the update
cost, was the round-3 L=8 OOM). Transients are tile-sized.

Numerics: identical math to train/optim8bit.py's XLA path (log-domain v via
exp2/log2 with base-10 constants — same stored uint8 codes) up to
transcendental rounding; parity-tested in tests/test_optim8bit.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256
LOG_DECADES = 8.0
_LOG2_10 = 3.321928094887362  # log2(10)
_INV_LOG2_10 = 1.0 / _LOG2_10


def _kernel(svec_ref, g_ref, p_ref, mq_ref, ms_ref, nq_ref, ns_ref,
            upd_ref, mqo_ref, mso_ref, nqo_ref, nso_ref,
            *, nbc: int, wd: float, b1: float, b2: float, eps: float,
            emit_new: bool = False):
    cscale = svec_ref[0]
    bc1 = svec_ref[1]
    bc2 = svec_ref[2]
    lr = svec_ref[3]
    tr, c = g_ref.shape

    def split(x):  # lane-split blockwise view
        return x.reshape(tr, nbc, BLOCK)

    g = split(g_ref[:].astype(jnp.float32)) * cscale
    # Mosaic has no direct 8-bit <-> f32 cast; hop through int32
    m = split(mq_ref[:].astype(jnp.int32).astype(jnp.float32)) * ms_ref[:][..., None]
    iq = split(nq_ref[:].astype(jnp.int32).astype(jnp.float32))
    # v dequant: 10 ** (((i-1)/254 - 1) * LOG_DECADES), index 0 = exact zero
    val = jnp.exp2(((iq - 1.0) / 254.0 - 1.0) * (LOG_DECADES * _LOG2_10))
    v = jnp.where(iq > 0.0, val, 0.0) * ns_ref[:][..., None]

    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g
    step = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    if emit_new:
        # fold optax.apply_updates in: emit p' = p - lr*(step + wd*p)
        # directly (the separate XLA apply pass re-reads p and upd and
        # rewrites p — 6 B/el of HBM that never needs to exist)
        p32 = split(p_ref[:].astype(jnp.float32))
        if wd:
            step = step + wd * p32
        upd_ref[:] = (p32 - lr * step).reshape(tr, c).astype(upd_ref.dtype)
    else:
        if wd:
            step = step + wd * split(p_ref[:].astype(jnp.float32))
        upd_ref[:] = (-lr * step).reshape(tr, c).astype(upd_ref.dtype)

    # requant m: blockwise absmax linear int8
    amax = jnp.max(jnp.abs(m), axis=-1, keepdims=True)
    msc = jnp.where(amax > 0.0, amax / 127.0, 1.0)
    mqo_ref[:] = (
        jnp.clip(jnp.round(m / msc), -127, 127)
        .astype(jnp.int32)
        .astype(jnp.int8)
        .reshape(tr, c)
    )
    mso_ref[:] = msc.reshape(tr, nbc)

    # requant v: log-domain uint8 over LOG_DECADES decades below block max
    vmax = jnp.max(v, axis=-1, keepdims=True)
    vsc = jnp.where(vmax > 0.0, vmax, 1.0)
    norm = v / vsc
    logn = jnp.log2(jnp.maximum(norm, 10.0 ** -LOG_DECADES)) * _INV_LOG2_10
    idx = jnp.round((logn / LOG_DECADES + 1.0) * 254.0) + 1.0
    nqo_ref[:] = (
        jnp.where(norm > 0.0, jnp.clip(idx, 1.0, 255.0), 0.0)
        .astype(jnp.int32)
        .astype(jnp.uint8)
        .reshape(tr, c)
    )
    nso_ref[:] = vsc.reshape(tr, nbc)


def _call(g, p, mq, ms, nq, ns, svec, wd, b1, b2, eps, interpret, emit_new):
    r, c = g.shape
    assert c % BLOCK == 0, c
    nbc = c // BLOCK
    # ~512K elements per tile under a raised scoped-VMEM cap: the tr sweep
    # at the 7B leaf shape (scripts/micro_opt_kernel.py, c=4096) measured
    # tr=128 at 4.71 ms vs 6.4-6.7 ms for tr=32/64/256 — the 128K-element
    # tiles of the old default were grid-step-overhead bound (1,536 steps)
    tr = max(8, min(256, ((1 << 19) // c + 4) // 8 * 8))
    grid = (pl.cdiv(r, tr),)

    kern = functools.partial(
        _kernel, nbc=nbc, wd=wd, b1=b1, b2=b2, eps=eps, emit_new=emit_new
    )
    row = pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    srow = pl.BlockSpec((tr, nbc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # moment buffers always alias their outputs (optimizer state updated
    # in place); in emit_new mode the param buffer additionally aliases
    # output 0 (p' overwrites p)
    aliases = {3: 1, 4: 2, 5: 3, 6: 4}
    if emit_new:
        assert p.dtype == g.dtype, (p.dtype, g.dtype)
        aliases[2] = 0
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # svec, whole (4,)
            row,  # g
            row,  # p
            row,  # mq
            srow,  # ms
            row,  # nq
            srow,  # ns
        ],
        out_specs=[row, row, srow, row, srow],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), g.dtype),
            jax.ShapeDtypeStruct((r, c), jnp.int8),
            jax.ShapeDtypeStruct((r, nbc), jnp.float32),
            jax.ShapeDtypeStruct((r, c), jnp.uint8),
            jax.ShapeDtypeStruct((r, nbc), jnp.float32),
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            # 512K-el tiles: ~7 MB of blocks double-buffered + f32
            # transients; the 16 MB default cap rejects them, v5e has 128
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(svec, g, p, mq, ms, nq, ns)


def fused_adamw8bit_leaf(
    g: jax.Array,  # (R, C) grad view, C % 256 == 0
    p: jax.Array,  # (R, C) param view (read only when wd != 0)
    mq: jax.Array,  # (R, C) int8 first-moment codes
    ms: jax.Array,  # (R, C // 256) f32 block scales
    nq: jax.Array,  # (R, C) uint8 second-moment codes
    ns: jax.Array,  # (R, C // 256) f32
    svec: jax.Array,  # (4,) f32: [clip_scale, bc1, bc2, lr]
    wd: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
):
    """Returns (upd, mq', ms', nq', ns') with upd = -lr*(adam_step + wd*p).
    Moment buffers alias the outputs (pallas input_output_aliases).

    NOT jitted on purpose: call under an enclosing jit (the train step).
    A nested @jax.jit boundary hides the moment buffers' liveness from
    XLA, which then inserts defensive copies of all four — measured
    +1.8 ms at the 7B leaf (scripts/micro_opt_kernel.py: wrapped 6.5 ms
    vs inlined 4.7 ms)."""
    return _call(g, p, mq, ms, nq, ns, svec, wd, b1, b2, eps, interpret, False)


def fused_adamw8bit_leaf_apply(
    g: jax.Array,
    p: jax.Array,  # donated: p' aliases its buffer
    mq: jax.Array,
    ms: jax.Array,
    nq: jax.Array,
    ns: jax.Array,
    svec: jax.Array,
    wd: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
):
    """Returns (p', mq', ms', nq', ns') with optax.apply_updates FOLDED IN:
    p' = p - lr*(adam_step + wd*p), computed in f32 before the cast to
    p.dtype (one rounding instead of the two the separate upd+add pays).
    Saves the apply pass's 6 B/el of HBM traffic; p and moments donated."""
    return _call(g, p, mq, ms, nq, ns, svec, wd, b1, b2, eps, interpret, True)
