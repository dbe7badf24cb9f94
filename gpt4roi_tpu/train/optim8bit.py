"""Blockwise 8-bit AdamW state (the reference's bitsandbytes Adam8bit /
fairscale-OSS low-memory branch, gpt4roi/train/llava_trainer.py:133-157),
as a pure optax transformation.

Both Adam moments are stored int8 with per-block fp32 absmax scales
(block = 256 elements, bitsandbytes' blockwise dynamic quantization
scheme): state bytes drop from 8 B/param (2 fp32 moments) to ~2.03 B/param
(2 int8 + 2/256 fp32 scales) — a ~3.9x reduction. Matching bitsandbytes'
stability rules, embeddings and small tensors (< ``min_quant_size``
elements, e.g. norm scales/biases) keep fp32 moments (llava_trainer.py's
``register_module_override(module, 'weight', {'optim_bits': 32})``).

TPU notes (round 4): the XLA dequant -> adam -> requant chain on the
original (nblocks, 256) storage was measured at ~49 ms/layer at the
stage-2 shape (scripts/micro_layer_bwd.py: grad+adamw8bit slope 89.3 vs
grad-only 40.2 ms/layer) against a ~2.5 ms/layer HBM roofline — every
quantize/dequantize forced a full relayout copy between the tensor's
tiled layout and the block layout. Fix: moments for leaves whose last dim
is a multiple of 256 are stored PARAM-SHAPED (q same shape as the param,
scales (rows, C/256) f32 — identical 256-contiguous-element block
semantics, zero-copy reshapes) and the whole update runs as ONE fused
Pallas pass per leaf (ops/opt8bit_kernel.py) with clip, bias correction,
weight decay and lr folded in and the moment buffers donated. Leaves whose last dim is NOT 256-aligned but
whose SIZE is (lm_head: (4096, 32006)) store moments in a FLAT-2D view
((16003, 8192) — same row-major block semantics, one grad/param relayout
copy) so they run the fused kernel too; only size % 256 != 0 leaves keep
the padded (nblocks, 256) layout and XLA math.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


class _QMoment(NamedTuple):
    """Blockwise 8-bit moment: q (nblocks, BLOCK) int8/uint8, scale
    (nblocks, 1) fp32 block absmax."""

    q: jax.Array
    scale: jax.Array


def _blocks(x: jax.Array, size: int) -> jax.Array:
    flat = x.reshape(-1)
    pad = (-size) % BLOCK
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, BLOCK)


def _quantize_signed(x: jax.Array, size: int) -> _QMoment:
    """First moment: blockwise absmax linear int8 (error is absolute,
    ~blockmax/254 — fine for the roughly zero-centred m)."""
    blocks = _blocks(x, size)
    amax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(blocks / scale), -127, 127).astype(jnp.int8)
    return _QMoment(q=q, scale=scale.astype(jnp.float32))


def _dequantize_signed(qm: _QMoment, shape, size: int) -> jax.Array:
    flat = (qm.q.astype(jnp.float32) * qm.scale).reshape(-1)
    return flat[:size].reshape(shape)


# second moment: LOG-domain uint8 over LOG_DECADES decades below the block
# max. Linear int8 is fatal for v — entries far below the block max round
# to 0 and 1/(sqrt(0)+eps) explodes the step (bitsandbytes solves the same
# problem with its dynamic-tree code). 255 levels / 8 decades keeps the
# relative error ~3.6% in v (~1.8% in sqrt v); index 0 = exact zero.
LOG_DECADES = 8.0


def _quantize_log(x: jax.Array, size: int) -> _QMoment:
    blocks = _blocks(x, size)  # non-negative
    amax = jnp.max(blocks, axis=1, keepdims=True)
    scale = jnp.where(amax > 0, amax, 1.0)
    norm = blocks / scale
    logn = jnp.log10(jnp.maximum(norm, 10.0**-LOG_DECADES))
    idx = jnp.round((logn / LOG_DECADES + 1.0) * 254.0) + 1.0  # [1, 255]
    q = jnp.where(norm > 0, jnp.clip(idx, 1, 255), 0).astype(jnp.uint8)
    return _QMoment(q=q, scale=scale.astype(jnp.float32))


def _dequantize_log(qm: _QMoment, shape, size: int) -> jax.Array:
    i = qm.q.astype(jnp.float32)
    val = 10.0 ** (((i - 1.0) / 254.0 - 1.0) * LOG_DECADES)
    flat = (jnp.where(qm.q > 0, val, 0.0) * qm.scale).reshape(-1)
    return flat[:size].reshape(shape)


# ---- param-shaped (zero-relayout) storage: last dim % 256 == 0 -----------


def _is_shaped(qm: _QMoment, p_shape) -> bool:
    return qm.q.shape == tuple(p_shape)


def _flat2d_cols(size: int) -> Optional[int]:
    """Largest 256-multiple c <= 8192 dividing ``size``: a (size//c, c)
    row-major FLAT-2D view with identical 256-contiguous-element block
    semantics. Lets leaves whose LAST DIM is not 256-aligned but whose
    SIZE is (lm_head: (4096, 32006) -> (16003, 8192)) run the fused Pallas
    update instead of the legacy (nblocks, 256) XLA path, whose relayout
    copies were the measured 49 ms/layer pathology (module docstring).
    Returns None when size % 256 != 0 (those keep the padded flat path)."""
    for c in range(8192, 0, -BLOCK):
        if size % c == 0:
            return c
    return None


def _view_rc(qm: _QMoment, g: jax.Array):
    """(rows, cols) 2D view on which the shaped/fused math can run, or
    None (padded legacy storage). Shaped storage collapses leading dims
    (zero-copy); flat2d storage dictates its own (r, c) — the grad/param
    reshape to it is one relayout copy, vs the legacy path's ~6 f32
    relayout passes."""
    if qm.q.shape == g.shape:
        return _rc_view(g.shape)
    if qm.q.ndim == 2 and qm.q.size == g.size and qm.q.shape[1] % BLOCK == 0:
        return tuple(qm.q.shape)
    return None


def _rc_view(shape):
    r = 1
    for d in shape[:-1]:
        r *= d
    return r, shape[-1]


def _quantize_signed_shaped(x: jax.Array) -> _QMoment:
    r, c = _rc_view(x.shape)
    xr = x.reshape(r, c // BLOCK, BLOCK)
    amax = jnp.max(jnp.abs(xr), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xr / scale), -127, 127).astype(jnp.int8)
    return _QMoment(q=q.reshape(x.shape), scale=scale.reshape(r, c // BLOCK).astype(jnp.float32))


def _dequantize_signed_shaped(qm: _QMoment, shape) -> jax.Array:
    r, c = _rc_view(shape)
    q = qm.q.reshape(r, c // BLOCK, BLOCK).astype(jnp.float32)
    return (q * qm.scale[..., None]).reshape(shape)


def _quantize_log_shaped(x: jax.Array) -> _QMoment:
    r, c = _rc_view(x.shape)
    xr = x.reshape(r, c // BLOCK, BLOCK)
    amax = jnp.max(xr, axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax, 1.0)
    norm = xr / scale
    logn = jnp.log10(jnp.maximum(norm, 10.0**-LOG_DECADES))
    idx = jnp.round((logn / LOG_DECADES + 1.0) * 254.0) + 1.0
    q = jnp.where(norm > 0, jnp.clip(idx, 1, 255), 0).astype(jnp.uint8)
    return _QMoment(q=q.reshape(x.shape), scale=scale.reshape(r, c // BLOCK).astype(jnp.float32))


def _dequantize_log_shaped(qm: _QMoment, shape) -> jax.Array:
    r, c = _rc_view(shape)
    i = qm.q.reshape(r, c // BLOCK, BLOCK).astype(jnp.float32)
    val = 10.0 ** (((i - 1.0) / 254.0 - 1.0) * LOG_DECADES)
    return (jnp.where(i > 0, val, 0.0) * qm.scale[..., None]).reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jax.Array
    mu: Any  # per-leaf: _QMoment or fp32 array
    nu: Any


def _is_embedding_path(path) -> bool:
    for p in path:
        key = getattr(p, "key", getattr(p, "name", None))
        if key is not None and "embed" in str(key):
            return True
    return False


def scale_by_adam_8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    min_quant_size: int = 4096,
    clip_global_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam with int8 blockwise moment storage. Leaves smaller than
    ``min_quant_size`` elements or on an embedding path keep fp32 moments.

    ``clip_global_norm`` folds optax.clip_by_global_norm INTO the update
    (same math: g * clip / max(gnorm, clip), a scalar factor applied
    inside the fused elementwise adam step). A separate clip stage in the
    optax chain materialises a scaled copy of the entire grad tree as the
    lax.map scan input — ~3.2 GB bf16 at 7B/L=8 — whereas the folded
    scalar rides the per-layer update for free."""

    def eligible(path, p) -> bool:
        return p.size >= min_quant_size and p.ndim >= 2 and not _is_embedding_path(path)

    def init_fn(params):
        def init_leaf(quant, quant_shaped):
            def f(path, p):
                z = jnp.zeros_like(p, jnp.float32)
                if not eligible(path, p):
                    return z
                if p.shape[-1] % BLOCK == 0:
                    return quant_shaped(z)
                c = _flat2d_cols(p.size)
                if c is not None:
                    return quant_shaped(z.reshape(p.size // c, c))
                return quant(z, p.size)

            return f

        mu = jax.tree_util.tree_map_with_path(
            init_leaf(_quantize_signed, _quantize_signed_shaped), params
        )
        nu = jax.tree_util.tree_map_with_path(
            init_leaf(_quantize_log, _quantize_log_shaped), params
        )
        return ScaleByAdam8bitState(count=jnp.zeros((), jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        if clip_global_norm is not None:
            gnorm = optax.global_norm(updates).astype(jnp.float32)
            cscale = clip_global_norm / jnp.maximum(gnorm, clip_global_norm)
        else:
            cscale = jnp.float32(1.0)

        def adam_math(m, v, g32):
            g32 = g32 * cscale
            m = b1 * m + (1.0 - b1) * g32
            v = b2 * v + (1.0 - b2) * g32 * g32
            step = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            return m, v, step

        def upd_leaf(path, g, mu, nu):
            if not isinstance(mu, _QMoment):
                m, v, step = adam_math(mu, nu, g.astype(jnp.float32))
                return step.astype(g.dtype), m, v
            view = _view_rc(mu, g)
            if view is not None:
                r, c = view
                g2 = g.reshape(r, c)
                m = _dequantize_signed_shaped(
                    _QMoment(mu.q.reshape(r, c), mu.scale.reshape(r, c // BLOCK)), (r, c)
                )
                v = _dequantize_log_shaped(
                    _QMoment(nu.q.reshape(r, c), nu.scale.reshape(r, c // BLOCK)), (r, c)
                )
                m, v, step = adam_math(m, v, g2.astype(jnp.float32))
                qm, qv = _quantize_signed_shaped(m), _quantize_log_shaped(v)
                return (
                    step.reshape(g.shape).astype(g.dtype),
                    _QMoment(qm.q.reshape(mu.q.shape), qm.scale.reshape(mu.scale.shape)),
                    _QMoment(qv.q.reshape(nu.q.shape), qv.scale.reshape(nu.scale.shape)),
                )
            m = _dequantize_signed(mu, g.shape, g.size)
            v = _dequantize_log(nu, g.shape, g.size)
            m, v, step = adam_math(m, v, g.astype(jnp.float32))
            return step.astype(g.dtype), _quantize_signed(m, g.size), _quantize_log(v, g.size)

        # traversal follows ``updates``; flatten_up_to leaves mu/nu's
        # _QMoment nodes intact at updates' leaf positions
        flat = jax.tree_util.tree_map_with_path(upd_leaf, updates, state.mu, state.nu)
        # unzip the 3-tuples; a 0-length tuple leaf is optax's MaskedNode
        # (multi_transform frozen partition) and passes through untouched
        is3 = lambda x: isinstance(x, tuple) and not isinstance(x, _QMoment) and len(x) == 3
        steps = jax.tree_util.tree_map(lambda t: t[0] if is3(t) else t, flat, is_leaf=is3)
        mu = jax.tree_util.tree_map(lambda t: t[1] if is3(t) else t, flat, is_leaf=is3)
        nu = jax.tree_util.tree_map(lambda t: t[2] if is3(t) else t, flat, is_leaf=is3)
        return steps, ScaleByAdam8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    mask: Optional[Any] = None,
    min_quant_size: int = 4096,
    clip_global_norm: Optional[float] = None,
    emit_new_params: bool = False,
) -> optax.GradientTransformation:
    """Drop-in optax.adamw analog with 8-bit moment storage, as ONE fused
    transformation: clip factor, adam math, bias correction, weight decay
    and the learning rate are all applied in a single pass per leaf — on
    TPU via the Pallas kernel (ops/opt8bit_kernel.py, moment buffers
    donated), elsewhere as fused XLA elementwise. Returned updates are the
    final deltas for optax.apply_updates.

    Chaining optax.add_decayed_weights + scale_by_learning_rate instead
    (the round-3 layout) costs two extra full passes over the update tree,
    and the old (nblocks, 256) moment storage added relayout copies — the
    total measured at ~49 ms/layer vs a 2.5 ms roofline (module
    docstring).

    ``emit_new_params=True`` additionally folds optax.apply_updates INTO
    the update: the returned "updates" tree holds the NEW PARAMS
    (p - lr*(step + wd*p), computed in f32 in the same kernel/fused pass),
    skipping the separate apply pass's read-p/read-upd/write-p HBM
    round-trip. The caller must then MERGE instead of add — see
    train/loop.py::make_train_step (frozen multi_transform partitions
    still return zero updates, so merging needs the stage labels).
    Requires ``params`` to be passed to update()."""
    base = scale_by_adam_8bit(
        b1=b1, b2=b2, eps=eps, min_quant_size=min_quant_size,
        clip_global_norm=clip_global_norm,
    )

    def use_kernel() -> bool:
        mode = os.environ.get("GPT4ROI_OPT8BIT_KERNEL", "auto")
        if mode == "off":
            return False
        return mode == "interpret" or jax.default_backend() == "tpu"

    def init_fn(params):
        return base.init(params)

    def update_fn(updates, state, params=None):
        from gpt4roi_tpu.ops.opt8bit_kernel import (
            fused_adamw8bit_leaf,
            fused_adamw8bit_leaf_apply,
        )

        if emit_new_params and params is None:
            raise ValueError("adamw_8bit(emit_new_params=True) needs params")
        count = state.count + 1
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - b1**cf
        bc2 = 1.0 - b2**cf
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        lr = jnp.asarray(lr, jnp.float32)
        if clip_global_norm is not None:
            gnorm = optax.global_norm(updates).astype(jnp.float32)
            cscale = clip_global_norm / jnp.maximum(gnorm, clip_global_norm)
        else:
            cscale = jnp.float32(1.0)
        svec = jnp.stack([cscale, bc1, bc2, lr])
        interpret = os.environ.get("GPT4ROI_OPT8BIT_KERNEL") == "interpret"
        kernel_ok = use_kernel()

        if weight_decay and params is None:
            raise ValueError("adamw_8bit with weight_decay needs params")

        def adam_math(m, v, g32):
            g32 = g32 * cscale
            m = b1 * m + (1.0 - b1) * g32
            v = b2 * v + (1.0 - b2) * g32 * g32
            step = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            return m, v, step

        def upd_leaf(path, g, mu, nu, p, wd_leaf):
            wd = float(weight_decay) if (weight_decay and wd_leaf) else 0.0
            view = _view_rc(mu, g) if isinstance(mu, _QMoment) else None
            if view is not None and kernel_ok:
                r, c = view
                kern = fused_adamw8bit_leaf_apply if emit_new_params else fused_adamw8bit_leaf
                upd, mq, ms, nq, ns = kern(
                    g.reshape(r, c),
                    p.reshape(r, c),
                    mu.q.reshape(r, c), mu.scale.reshape(r, c // BLOCK),
                    nu.q.reshape(r, c), nu.scale.reshape(r, c // BLOCK),
                    svec, wd=wd, b1=b1, b2=b2, eps=eps, interpret=interpret,
                )
                return (
                    upd.reshape(g.shape),
                    _QMoment(mq.reshape(mu.q.shape), ms.reshape(mu.scale.shape)),
                    _QMoment(nq.reshape(nu.q.shape), ns.reshape(nu.scale.shape)),
                )
            # XLA fallback, same folding
            if not isinstance(mu, _QMoment):
                m, v, step = adam_math(mu, nu, g.astype(jnp.float32))
                new_mu, new_nu = m, v
            elif view is not None:
                r, c = view
                m = _dequantize_signed_shaped(
                    _QMoment(mu.q.reshape(r, c), mu.scale.reshape(r, c // BLOCK)), (r, c)
                )
                v = _dequantize_log_shaped(
                    _QMoment(nu.q.reshape(r, c), nu.scale.reshape(r, c // BLOCK)), (r, c)
                )
                m, v, step = adam_math(m, v, g.reshape(r, c).astype(jnp.float32))
                step = step.reshape(g.shape)
                qm, qv = _quantize_signed_shaped(m), _quantize_log_shaped(v)
                new_mu = _QMoment(qm.q.reshape(mu.q.shape), qm.scale.reshape(mu.scale.shape))
                new_nu = _QMoment(qv.q.reshape(nu.q.shape), qv.scale.reshape(nu.scale.shape))
            else:
                m = _dequantize_signed(mu, g.shape, g.size)
                v = _dequantize_log(nu, g.shape, g.size)
                m, v, step = adam_math(m, v, g.astype(jnp.float32))
                new_mu, new_nu = _quantize_signed(m, g.size), _quantize_log(v, g.size)
            if wd:
                step = step + wd * p.astype(jnp.float32)
            if emit_new_params:
                out = (p.astype(jnp.float32) - lr * step).astype(p.dtype)
            else:
                out = (-lr * step).astype(g.dtype)
            return out, new_mu, new_nu

        # traversal follows ``updates``; params default to the updates tree
        # (same structure; only read when wd != 0, which requires params)
        params_t = params if params is not None else updates
        if weight_decay and mask is not None:
            wd_t = mask(updates) if callable(mask) else mask
        else:
            wd_t = jax.tree_util.tree_map(lambda _: bool(weight_decay), updates)

        flat = jax.tree_util.tree_map_with_path(
            upd_leaf, updates, state.mu, state.nu, params_t, wd_t
        )
        is3 = lambda x: isinstance(x, tuple) and not isinstance(x, _QMoment) and len(x) == 3
        steps = jax.tree_util.tree_map(lambda t: t[0] if is3(t) else t, flat, is_leaf=is3)
        mu = jax.tree_util.tree_map(lambda t: t[1] if is3(t) else t, flat, is_leaf=is3)
        nu = jax.tree_util.tree_map(lambda t: t[2] if is3(t) else t, flat, is_leaf=is3)
        return steps, ScaleByAdam8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def opt_state_bytes(opt_state: Any) -> int:
    """Total bytes across all array leaves of an optimizer state."""
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(opt_state)
        if hasattr(x, "dtype")
    )
