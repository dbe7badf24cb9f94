"""Attention primitives.

The reference gets fast training attention from a flash-attn CUDA monkey
patch over LlamaAttention (reference:
gpt4roi/train/llama_flash_attn_monkey_patch.py:12-98) and plain torch SDPA
elsewhere. TPU-native equivalents:

  * ``mha`` — XLA attention (softmax in fp32) — used for CLIP (257 tokens,
    fusion makes this already near-roofline) and as the universal fallback;
  * ``flash_attention`` — a Pallas blockwise-softmax kernel for the LLaMA
    training path (long causal sequences, memory-linear), selected
    automatically on TPU;
  * ``decode_attention`` — single-query attention against a KV cache for
    autoregressive decoding.

Layouts: q/k/v are (B, S, N, D) — heads folded late so the MXU sees
(S, D) @ (D, S) tiles per head batch.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -2.0e30


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def mha(
    q: jax.Array,  # (B, Sq, N, D)
    k: jax.Array,  # (B, Sk, N, D)
    v: jax.Array,  # (B, Sk, N, D)
    mask: Optional[jax.Array] = None,  # broadcastable to (B, N, Sq, Sk); True = keep
    causal: bool = False,
) -> jax.Array:
    """Reference XLA attention. Softmax in fp32; returns q.dtype."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32) * scale
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        # query i attends to keys <= i + (Sk - Sq) (supports prefill/decode offsets)
        qi = jnp.arange(sq)[:, None] + (sk - sq)
        ki = jnp.arange(sk)[None, :]
        cmask = ki <= qi
        logits = jnp.where(cmask[None, None], logits, _NEG_INF)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (TPU training path)
# ---------------------------------------------------------------------------


def _flash_kernel(seg_q_ref, seg_k_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *, block_k, causal, scale):
    """Grid: (B*N, num_q_blocks, num_k_blocks); k innermost so the fp32
    accumulator in VMEM scratch carries across k blocks. Also emits the
    per-row log-sum-exp used by the backward kernels."""
    import jax.experimental.pallas as pl

    kb = pl.program_id(2)
    qb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    block_q = q_ref.shape[1]
    should_run = True
    if causal:
        # skip blocks strictly above the diagonal
        should_run = kb * block_k <= (qb + 1) * block_q - 1

    @pl.when(should_run)
    def _run():
        # QK^T in the stored dtype (bf16 on TPU) with fp32 accumulation:
        # upcasting the operands first would push the matmul onto the fp32
        # MXU pipe at ~1/8 the bf16 rate (f32 CPU inputs are unaffected —
        # the dot already ran in f32 there)
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk)
        qi = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kj = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if causal:
            s = jnp.where(kj <= qi, s, _NEG_INF)
        # segment mask: tokens only attend within their segment (padding = seg 0
        # attends within padding; outputs there are discarded by the caller).
        # seg_q arrives sublane-oriented (bq, 1), seg_k lane-oriented (1, bk)
        # so the broadcast needs no in-kernel transpose.
        s = jnp.where(seg_q_ref[0] == seg_k_ref[0], s, _NEG_INF)

        m_prev = m_ref[:]  # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(kb == pl.num_programs(2) - 1)
    def _finish():
        l = l_ref[:]
        lsafe = jnp.where(l <= 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / lsafe).astype(o_ref.dtype)
        # fully-masked rows get lse = 0 so exp(-inf - 0) = 0 in the backward
        lse_ref[0] = jnp.where(l <= 0.0, 0.0, m_ref[:] + jnp.log(lsafe))


def _segment_mask(segment_ids: jax.Array) -> jax.Array:
    return segment_ids[:, None, :, None] == segment_ids[:, None, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(
    q: jax.Array,  # (B, Sq, N, D)
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,  # (B, S) int; 0 may be padding
    causal: bool = True,
    block_q: int = 1024,
    block_k: int = 512,
) -> jax.Array:
    """Pallas blockwise (flash) attention for TPU; self-attention Sq == Sk.

    Default blocks are 1024x512: the 256x256 blocking left the kernel
    grid-overhead-bound (measured 11.4 -> 5.9 ms fwd+bwd at b2 s2048 h32
    d128 bf16 on v5e; scripts/micro_flash.py sweep). Blocks shrink
    per-call until they divide S.

    Fully Pallas differentiable: the forward kernel saves per-row
    log-sum-exp; the backward runs two blockwise kernels (dq pass and
    dk/dv pass) with O(S) memory — no S x S materialisation (the reference
    relies on the flash-attn CUDA package for the same property)."""
    out, _ = _flash_attention_impl(q, k, v, segment_ids, causal, block_q, block_k)
    return out


def _flash_fwd(q, k, v, segment_ids, causal, block_q, block_k):
    out, lse = _flash_attention_impl(q, k, v, segment_ids, causal, block_q, block_k)
    return out, (q, k, v, segment_ids, out, lse)


def _flash_bwd(causal, block_q, block_k, res, g):
    q, k, v, segment_ids, out, lse = res
    dq, dk, dv = _flash_attention_bwd_impl(
        q, k, v, segment_ids, out, lse, g, causal, block_q, block_k
    )
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _fit_block(block: int, s: int) -> int:
    """Largest power-of-two block <= ``block`` that divides ``s``
    (callers guarantee s % 256 == 0 or s itself a power of two)."""
    block = min(block, s)
    while s % block:
        block //= 2
    return block


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k")
)
def _flash_attention_impl(
    q: jax.Array,  # (B, Sq, N, D)
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,  # (B, S) int; 0 may be padding
    causal: bool = True,
    block_q: int = 1024,
    block_k: int = 512,
) -> jax.Array:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, n, d = q.shape
    assert k.shape == v.shape == (b, s, n, d)
    block_q = _fit_block(block_q, s)
    block_k = _fit_block(block_k, s)
    if segment_ids is None:
        segment_ids = jnp.zeros((b, s), jnp.int32)

    scale = 1.0 / math.sqrt(d)
    # fold heads into batch: (B*N, S, D)
    qf = q.transpose(0, 2, 1, 3).reshape(b * n, s, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, s, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, s, d)
    seg = jnp.repeat(segment_ids.astype(jnp.int32), n, axis=0)  # (B*N, S)
    seg_q = seg[:, :, None]  # (B*N, S, 1) sublane-oriented
    seg_k = seg[:, None, :]  # (B*N, 1, S) lane-oriented

    grid = (b * n, s // block_q, s // block_k)
    kernel = functools.partial(_flash_kernel, block_k=block_k, causal=causal, scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 1), lambda h, i, j: (h, i, 0)),  # seg_q
            pl.BlockSpec((1, 1, block_k), lambda h, i, j: (h, 0, j)),  # seg_k
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda h, i, j: (h, i, 0)),  # lse
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * n, s, d), q.dtype),
            jax.ShapeDtypeStruct((b * n, s, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(seg_q, seg_k, qf, kf, vf)
    return out.reshape(b, n, s, d).transpose(0, 2, 1, 3), lse


def _flash_dq_kernel(
    seg_q_ref, seg_k_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
    dq_ref, dq_acc, *, block_k, causal, scale
):
    """Grid (B*N, Sq/bq, Sk/bk), k innermost; dq accumulates in scratch."""
    import jax.experimental.pallas as pl

    kb = pl.program_id(2)
    qb = pl.program_id(1)
    block_q = q_ref.shape[1]

    @pl.when(kb == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    should_run = True
    if causal:
        should_run = kb * block_k <= (qb + 1) * block_q - 1

    @pl.when(should_run)
    def _run():
        # all dots run in the stored dtype (bf16 on TPU, f32 in CPU tests)
        # with fp32 accumulation — see the forward-kernel note; ds/p are
        # cast back down for the MXU, the standard flash-bwd precision
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        qi = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kj = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if causal:
            s = jnp.where(kj <= qi, s, _NEG_INF)
        s = jnp.where(seg_q_ref[0] == seg_k_ref[0], s, _NEG_INF)
        p = jnp.exp(s - lse_ref[0])  # (bq, bk)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        ds = p * (dp - dsum_ref[0]) * scale
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kb == pl.num_programs(2) - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_dkv_kernel(
    seg_k_ref, seg_q_ref, k_ref, v_ref, q_ref, do_ref, lse_ref, dsum_ref,
    dk_ref, dv_ref, dk_acc, dv_acc, *, block_q, causal, scale
):
    """Grid (B*N, Sk/bk, Sq/bq), q innermost; dk/dv accumulate in scratch."""
    import jax.experimental.pallas as pl

    qb = pl.program_id(2)
    kb = pl.program_id(1)
    block_k = k_ref.shape[1]

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    should_run = True
    if causal:
        # q blocks entirely before this k block contribute nothing
        should_run = (qb + 1) * block_q - 1 >= kb * block_k

    @pl.when(should_run)
    def _run():
        # stored-dtype dots with fp32 accumulation (see forward-kernel note)
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk)
        qi = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kj = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if causal:
            s = jnp.where(kj <= qi, s, _NEG_INF)
        s = jnp.where(seg_q_ref[0] == seg_k_ref[0], s, _NEG_INF)
        p = jnp.exp(s - lse_ref[0])  # (bq, bk); lse sublane-oriented (bq, 1)
        # dv += p^T do
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        ds = p * (dp - dsum_ref[0]) * scale
        # dk += ds^T q
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qb == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k"))
def _flash_attention_bwd_impl(
    q, k, v, segment_ids, out, lse, g, causal=True, block_q=1024, block_k=512
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, n, d = q.shape
    block_q = _fit_block(block_q, s)
    block_k = _fit_block(block_k, s)
    if segment_ids is None:
        segment_ids = jnp.zeros((b, s), jnp.int32)
    scale = 1.0 / math.sqrt(d)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * n, s, d)

    qf, kf, vf, dof, of = fold(q), fold(k), fold(v), fold(g), fold(out)
    seg = jnp.repeat(segment_ids.astype(jnp.int32), n, axis=0)
    seg_q = seg[:, :, None]
    seg_k = seg[:, None, :]
    # D_i = rowsum(dO * O), fp32
    dsum = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32), axis=-1, keepdims=True)

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, block_k=block_k, causal=causal, scale=scale),
        grid=(b * n, s // block_q, s // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, 1), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, 1, block_k), lambda h, i, j: (h, 0, j)),
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda h, i, j: (h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, s, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )(seg_q, seg_k, qf, kf, vf, dof, lse, dsum)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, block_q=block_q, causal=causal, scale=scale),
        grid=(b * n, s // block_k, s // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda h, j, i: (h, 0, j)),  # seg_k
            pl.BlockSpec((1, block_q, 1), lambda h, j, i: (h, i, 0)),  # seg_q
            pl.BlockSpec((1, block_k, d), lambda h, j, i: (h, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, j, i: (h, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda h, j, i: (h, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda h, j, i: (h, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda h, j, i: (h, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda h, j, i: (h, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda h, j, i: (h, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, j, i: (h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * n, s, d), k.dtype),
            jax.ShapeDtypeStruct((b * n, s, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )(seg_k, seg_q, kf, vf, qf, dof, lse, dsum)

    def unfold(x):
        return x.reshape(b, n, s, d).transpose(0, 2, 1, 3)

    return unfold(dq), unfold(dk), unfold(dv)


def self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    causal: bool = True,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Dispatch: Pallas flash on TPU (when blocks divide), XLA otherwise."""
    b, s, n, d = q.shape
    if use_flash is None:
        use_flash = _on_tpu() and s % 256 == 0 and d % 128 == 0
    if use_flash:
        return flash_attention(q, k, v, segment_ids, causal=causal)
    mask = None
    if segment_ids is not None:
        mask = (segment_ids[:, None, :, None] == segment_ids[:, None, None, :])
    return mha(q, k, v, mask=mask, causal=causal)


def decode_attention_self(
    q: jax.Array,  # (B, 1, N, D)
    k_cache: jax.Array,  # (B, S, N, D) — WITHOUT the current token
    v_cache: jax.Array,
    k_new: jax.Array,  # (B, N, D) current token's key (not yet cached)
    v_new: jax.Array,
    cache_len: jax.Array,  # (B,) strictly-past prefix length
    key_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode attention over past cache + the fresh self row.

    Lets scan-over-layers decode keep the cache READ-ONLY inside the scan
    body (threading the cache through scan ys copies the whole buffer
    every token — measured 3x slower at 7B): the fresh k/v contribute via
    an appended logit column, and the scatter into the cache happens once
    outside the scan. Same math as decode_attention after the cache
    write; softmax is permutation-invariant over key order."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    logits_c = jnp.einsum(
        "bqnd,bknd->bnqk", q, k_cache, preferred_element_type=jnp.float32
    ) * scale
    s = k_cache.shape[1]
    valid = jnp.arange(s)[None, :] < cache_len[:, None]
    if key_mask is not None:
        valid = valid & key_mask.astype(bool)
    logits_c = jnp.where(valid[:, None, None, :], logits_c, _NEG_INF)
    logit_s = jnp.einsum(
        "bqnd,bnd->bnq", q, k_new.astype(q.dtype), preferred_element_type=jnp.float32
    )[..., None] * scale  # (B, N, 1, 1)
    probs = jax.nn.softmax(jnp.concatenate([logits_c, logit_s], axis=-1), axis=-1)
    out = jnp.einsum(
        "bnqk,bknd->bqnd", probs[..., :s].astype(v_cache.dtype), v_cache
    ) + probs[..., s:].astype(v_new.dtype).transpose(0, 2, 1, 3) * v_new[:, None]
    return out.astype(q.dtype)


def decode_attention_window(
    q: jax.Array,  # (B, T, N, D) — T fresh query rows (speculative verify)
    k_cache: jax.Array,  # (B, S, N, D) — WITHOUT the fresh window
    v_cache: jax.Array,
    k_new: jax.Array,  # (B, T, N, D) fresh keys (not yet cached)
    v_new: jax.Array,
    cache_len: jax.Array,  # (B,) strictly-past prefix length
    key_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """T-query generalisation of ``decode_attention_self``: window row i
    (absolute position cache_len+i) attends the valid cache prefix plus
    window keys j <= i (causal within the fresh block). The cache stays
    READ-ONLY inside scan-over-layers (same rationale/math as
    decode_attention_self); with T == 1 this reduces to it exactly.

    Powers speculative-decode verification (serve/speculative.py): one
    weight pass scores T draft positions — on a weight-bandwidth-bound
    decode the marginal cost of T-1 extra rows is near zero. The
    reference decodes strictly one token per forward
    (llava/serve/model_worker.py:182-260)."""
    d = q.shape[-1]
    t = q.shape[1]
    scale = 1.0 / math.sqrt(d)
    logits_c = jnp.einsum(
        "bqnd,bknd->bnqk", q, k_cache, preferred_element_type=jnp.float32
    ) * scale
    s = k_cache.shape[1]
    valid = jnp.arange(s)[None, :] < cache_len[:, None]
    if key_mask is not None:
        valid = valid & key_mask.astype(bool)
    logits_c = jnp.where(valid[:, None, None, :], logits_c, _NEG_INF)
    logits_w = jnp.einsum(
        "bqnd,bknd->bnqk", q, k_new.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale  # (B, N, T, T)
    causal = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]  # key j <= query i
    logits_w = jnp.where(causal[None, None], logits_w, _NEG_INF)
    probs = jax.nn.softmax(jnp.concatenate([logits_c, logits_w], axis=-1), axis=-1)
    out = jnp.einsum(
        "bnqk,bknd->bqnd", probs[..., :s].astype(v_cache.dtype), v_cache
    ) + jnp.einsum(
        "bnqk,bknd->bqnd", probs[..., s:].astype(v_new.dtype), v_new
    )
    return out.astype(q.dtype)


def decode_attention(
    q: jax.Array,  # (B, 1, N, D)
    k_cache: jax.Array,  # (B, S, N, D)
    v_cache: jax.Array,  # (B, S, N, D)
    cache_len: jax.Array,  # (B,) valid prefix length
    key_mask: Optional[jax.Array] = None,  # (B, S) extra validity (left-pad)
) -> jax.Array:
    """Single-step decode attention against a padded KV cache. ``key_mask``
    additionally masks positions inside the prefix (left-padded ragged
    batches keep their pad K/V permanently invisible)."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k_cache, preferred_element_type=jnp.float32)
    logits = logits * scale
    s = k_cache.shape[1]
    valid = jnp.arange(s)[None, :] < cache_len[:, None]  # (B, S)
    if key_mask is not None:
        valid = valid & key_mask.astype(bool)
    logits = jnp.where(valid[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", probs.astype(v_cache.dtype), v_cache)
    return out.astype(q.dtype)
