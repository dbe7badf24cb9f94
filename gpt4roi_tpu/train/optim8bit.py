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

TPU notes: the dequant -> adam math -> requant round-trip is pure
elementwise VPU work that XLA fuses into the update; no extra HBM
round-trips beyond reading/writing the int8 moments themselves, so the
memory win is also a bandwidth win on the optimizer step.
"""

from __future__ import annotations

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


# stacked-leaf leading-axis scan: leaves at least this many elements with
# ndim>=3 (scan-over-layers stacking puts the layer axis first) update via
# lax.map over axis 0, shrinking the dequantized f32 moment transients from
# L-layers wide to 1-layer wide. Same math as the flat path: per-slice
# sizes of every stacked matrix are multiples of BLOCK, so block boundaries
# never straddle the layer axis (guarded below); results agree to XLA
# fusion rounding (~1e-5 on the transcendentals — tests/test_optim8bit.py).
SCAN_MIN_SIZE = 2**24


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
        def init_leaf(quant):
            def f(path, p):
                z = jnp.zeros_like(p, jnp.float32)
                return quant(z, p.size) if eligible(path, p) else z

            return f

        mu = jax.tree_util.tree_map_with_path(init_leaf(_quantize_signed), params)
        nu = jax.tree_util.tree_map_with_path(init_leaf(_quantize_log), params)
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
            slice_size = g.size // g.shape[0]
            if (
                g.ndim >= 3
                and g.shape[0] > 1
                and g.size >= SCAN_MIN_SIZE
                and slice_size % BLOCK == 0
            ):
                # per-layer update on a stacked leaf: f32 transients are
                # 1/L the leaf, unlocking L=8..32 on one 16 GB chip
                layers = g.shape[0]
                nb = mu.q.shape[0] // layers

                def body(xs):
                    g_l, mq, ms, nq, ns = xs
                    m = _dequantize_signed(_QMoment(mq, ms), g_l.shape, slice_size)
                    v = _dequantize_log(_QMoment(nq, ns), g_l.shape, slice_size)
                    m, v, step = adam_math(m, v, g_l.astype(jnp.float32))
                    qm = _quantize_signed(m, slice_size)
                    qv = _quantize_log(v, slice_size)
                    return step.astype(g.dtype), qm.q, qm.scale, qv.q, qv.scale

                step, mq, ms, nq, ns = jax.lax.map(
                    body,
                    (
                        g,
                        mu.q.reshape(layers, nb, BLOCK),
                        mu.scale.reshape(layers, nb, 1),
                        nu.q.reshape(layers, nb, BLOCK),
                        nu.scale.reshape(layers, nb, 1),
                    ),
                )
                return (
                    step,
                    _QMoment(mq.reshape(-1, BLOCK), ms.reshape(-1, 1)),
                    _QMoment(nq.reshape(-1, BLOCK), ns.reshape(-1, 1)),
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
) -> optax.GradientTransformation:
    """Drop-in optax.adamw analog with 8-bit moment storage."""
    chain = [
        scale_by_adam_8bit(
            b1=b1, b2=b2, eps=eps, min_quant_size=min_quant_size,
            clip_global_norm=clip_global_norm,
        )
    ]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


def opt_state_bytes(opt_state: Any) -> int:
    """Total bytes across all array leaves of an optimizer state."""
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(opt_state)
        if hasattr(x, "dtype")
    )
