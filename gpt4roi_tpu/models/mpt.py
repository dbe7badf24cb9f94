"""MPT decoder (ALiBi attention) — the reference's secondary LLM path.

Capability parity with the vendored MPT implementation selected when the
model name contains 'mpt' (reference: llava/model/llava_mpt.py +
llava/model/mpt/*, chosen at gpt4roi/train/train.py:547-551): pre-LayerNorm
blocks, fused Wqkv, no biases, GELU MLP, ALiBi position bias instead of
RoPE, final norm + untied lm_head (HF layout).

ALiBi: bias[h, j] = slope_h * (j - (S-1)) over key positions (HF
``build_mpt_alibi_tensor`` form); equal to the relative form up to a
per-query constant, which softmax cancels.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from gpt4roi_tpu.ops.norms import layer_norm

_NEG_INF = -2.0e30


@dataclasses.dataclass(frozen=True)
class MptConfig:
    vocab_size: int = 50432
    d_model: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    expansion_ratio: int = 4
    max_seq_len: int = 2048
    layer_norm_eps: float = 1e-5
    alibi_bias_max: float = 8.0

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @classmethod
    def mpt_7b(cls, vocab_size: int = 50432) -> "MptConfig":
        return cls(vocab_size=vocab_size)

    @classmethod
    def tiny(cls, vocab_size: int = 128) -> "MptConfig":
        return cls(vocab_size=vocab_size, d_model=64, n_layers=2, n_heads=4, max_seq_len=128)


Params = Dict[str, Any]


def alibi_slopes(n_heads: int, alibi_bias_max: float = 8.0) -> jnp.ndarray:
    """HF build_mpt_alibi_tensor slope schedule."""
    pow2 = 2 ** math.ceil(math.log2(n_heads))
    base = jnp.arange(1, pow2 + 1, dtype=jnp.float32) * (alibi_bias_max / pow2)
    slopes = 1.0 / jnp.power(2.0, base)
    if pow2 != n_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[0::2]])[:n_heads]
    return slopes  # (H,)


def init_mpt_params(key: jax.Array, cfg: MptConfig, dtype=jnp.float32) -> Params:
    d, m = cfg.d_model, cfg.expansion_ratio * cfg.d_model
    keys = jax.random.split(key, 2 + cfg.n_layers)

    def dense(k, i, o):
        return {"kernel": jax.random.normal(k, (i, o), dtype) * (i**-0.5)}

    layers = []
    for li in range(cfg.n_layers):
        ks = jax.random.split(keys[2 + li], 4)
        layers.append(
            {
                "norm_1": {"scale": jnp.ones((d,), dtype)},
                "wqkv": dense(ks[0], d, 3 * d),
                "out_proj": dense(ks[1], d, d),
                "norm_2": {"scale": jnp.ones((d,), dtype)},
                "up": dense(ks[2], d, m),
                "down": dense(ks[3], m, d),
            }
        )
    return {
        "embed": {"embedding": jax.random.normal(keys[0], (cfg.vocab_size, d), dtype) * 0.02},
        "layers": layers,
        "final_norm": {"scale": jnp.ones((d,), dtype)},
        "lm_head": dense(keys[1], d, cfg.vocab_size),
    }


def _ln(p, x, eps):
    return layer_norm(x, p["scale"], jnp.zeros_like(p["scale"]), eps)


def _proj(p, x):
    return x @ p["kernel"].astype(x.dtype)


def _layer_list(params: Params):
    """Per-layer param trees from either layout (stacked slices are views
    under jit — models/llama.py::layer_params_list)."""
    from gpt4roi_tpu.models.llama import layer_params_list

    return layer_params_list(params)


def mpt_forward(
    params: Params,
    cfg: MptConfig,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,  # (B, S) 1 = valid
    return_kv: bool = False,
    remat: bool = False,
    scan_layers: bool = False,
    kv_pad_to: Optional[int] = None,  # scan path: emit kv padded to S_max
    logits_at: Optional[jax.Array] = None,  # lm_head at ONE position (B,1,V)
) -> Tuple[jax.Array, jax.Array, Optional[Any]]:
    if inputs_embeds is None:
        assert input_ids is not None
        inputs_embeds = params["embed"]["embedding"][input_ids]
    b, s, d = inputs_embeds.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(hd)

    slopes = alibi_slopes(nh, cfg.alibi_bias_max)  # (H,)
    kpos = jnp.arange(s, dtype=jnp.float32)
    alibi = slopes[:, None, None] * (kpos - (s - 1))[None, None, :]  # (H, 1, S)

    qi = jnp.arange(s)[:, None]
    ki = jnp.arange(s)[None, :]
    causal = ki <= qi  # (S, S)
    if attention_mask is not None:
        valid = attention_mask.astype(bool)
        pair = valid[:, None, :] & valid[:, :, None]  # (B, Sq, Sk)
        allow = causal[None] & pair
    else:
        allow = jnp.broadcast_to(causal[None], (b, s, s))

    def block(x, lp):
        y = _ln(lp["norm_1"], x, cfg.layer_norm_eps)
        qkv = _proj(lp["wqkv"], y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nh, hd)
        v = v.reshape(b, s, nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32) * scale
        logits = logits + alibi[None]
        logits = jnp.where(allow[:, None], logits, _NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        att = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, d)
        x = x + _proj(lp["out_proj"], att)
        y = _ln(lp["norm_2"], x, cfg.layer_norm_eps)
        y = _proj(lp["down"], jax.nn.gelu(_proj(lp["up"], y), approximate=False))
        if kv_pad_to is not None:
            # cache-ready rows: the stacked scan ys IS the KV cache (see
            # llama_forward's kv_pad_to note — avoids the transient
            # prefill-KV + cache double allocation)
            pad = ((0, 0), (0, kv_pad_to - s), (0, 0), (0, 0))
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        return x + y, (k, v)

    from gpt4roi_tpu.models.llama import apply_remat

    block = apply_remat(block, remat)

    scan_layers = scan_layers or "layers" not in params
    if scan_layers:
        # serving prefill via lax.scan over the stacked layer axis — one
        # compiled layer body (cold-start compile: minutes -> seconds at
        # 7B scale), kv returned stacked (L, B, S, N, D); mirrors
        # models/llama.py::llama_forward's scan path for the MPT decoder
        # (reference: llava/model/llava_mpt.py + llava/model/mpt/*)
        assert "layers_stacked" in params, "scan_layers needs stacked params"
        x, (ks, vs) = jax.lax.scan(block, inputs_embeds, params["layers_stacked"])
        x = _ln(params["final_norm"], x, cfg.layer_norm_eps)
        xh = x
        if logits_at is not None:
            xh = jax.lax.dynamic_slice_in_dim(x, logits_at, 1, axis=1)
        logits = _proj(params["lm_head"], xh)
        return logits, x, ((ks, vs) if return_kv else None)

    x = inputs_embeds
    kv_out: List[Tuple[jax.Array, jax.Array]] = []
    for lp in params["layers"]:
        x, kv = block(x, lp)
        if return_kv:
            kv_out.append(kv)
    x = _ln(params["final_norm"], x, cfg.layer_norm_eps)
    xh = x
    if logits_at is not None:
        xh = jax.lax.dynamic_slice_in_dim(x, logits_at, 1, axis=1)
    logits = _proj(params["lm_head"], xh)
    return logits, x, (kv_out if return_kv else None)


def mpt_decode_step(
    params: Params,
    cfg: MptConfig,
    cache,  # KVCache from models.llama (same structure)
    token_embeds: jax.Array,  # (B, 1, D)
    cache_len: jax.Array,  # (B,)
    key_mask: Optional[jax.Array] = None,  # (B, S_max) False = never attend
):
    from gpt4roi_tpu.models.llama import KVCache

    b, _, d = token_embeds.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(hd)
    s_max = cache.k[0].shape[1]
    slopes = alibi_slopes(nh, cfg.alibi_bias_max)
    batch_ix = jnp.arange(b)
    pos_vec = jnp.broadcast_to(cache_len, (b,))  # scalar or (B,) accepted

    x = token_embeds
    new_k, new_v = [], []
    for li, lp in enumerate(_layer_list(params)):
        y = _ln(lp["norm_1"], x, cfg.layer_norm_eps)
        qkv = _proj(lp["wqkv"], y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, 1, nh, hd)
        k = k.reshape(b, nh, hd)
        v = v.reshape(b, nh, hd)
        ck = cache.k[li].at[batch_ix, pos_vec].set(k.astype(cache.k[li].dtype))
        cv = cache.v[li].at[batch_ix, pos_vec].set(v.astype(cache.v[li].dtype))
        new_k.append(ck)
        new_v.append(cv)
        logits = jnp.einsum(
            "bqnd,bknd->bnqk", q, ck.astype(q.dtype), preferred_element_type=jnp.float32
        ) * scale
        kpos = jnp.arange(s_max, dtype=jnp.float32)
        # relative alibi: slope * (j - q_pos); softmax-equivalent to HF form
        bias = slopes[None, :, None, None] * (
            kpos[None, None, None, :] - pos_vec[:, None, None, None].astype(jnp.float32)
        )
        logits = logits + bias
        valid = jnp.arange(s_max)[None, :] <= pos_vec[:, None]
        if key_mask is not None:
            # left-padded ragged batching: pad slots never become keys.
            # ALiBi is translation-invariant in its relative form, so
            # buffer positions give correct biases under left-padding.
            valid = valid & key_mask
        logits = jnp.where(valid[:, None, None, :], logits, _NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(cv.dtype)
        att = jnp.einsum("bnqk,bknd->bqnd", probs, cv).reshape(b, 1, d).astype(x.dtype)
        x = x + _proj(lp["out_proj"], att)
        y = _ln(lp["norm_2"], x, cfg.layer_norm_eps)
        y = _proj(lp["down"], jax.nn.gelu(_proj(lp["up"], y), approximate=False))
        x = x + y
    x = _ln(params["final_norm"], x, cfg.layer_norm_eps)
    logits = _proj(params["lm_head"], x)[:, 0]
    return logits, KVCache(k=new_k, v=new_v)


def mpt_decode_step_stacked(
    params: Params,  # embed/final_norm/lm_head + 'layers_stacked'
    cfg: MptConfig,
    cache_k: jax.Array,  # (L, B, S_max, H, D)
    cache_v: jax.Array,
    token_embeds: jax.Array,  # (B, 1, D)
    cache_len: jax.Array,  # scalar or (B,)
    positions: Optional[jax.Array] = None,  # (B,) content positions for the
    # ALiBi query offset (left-padded ragged batches)
    key_mask: Optional[jax.Array] = None,  # (B, S_max)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode step with ``lax.scan`` over the layer axis (ALiBi analog of
    models/llama.py::llama_decode_step_stacked; reference decoder:
    llava/model/mpt/attention.py).

    Same cache discipline as the LLaMA kernel — slices enter the scan
    READ-ONLY (xs), fresh k/v rows come back as tiny ys, ONE scatter
    outside the scan (threading the cache through ys copies the whole
    multi-GB buffer per token, measured 3x slower at 7B). The current
    token contributes via an appended self column with zero ALiBi bias
    (slope * (q_pos - q_pos)); relative ALiBi over buffer positions is
    left-pad-correct because the per-query constant cancels in softmax."""
    b, _, d = token_embeds.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(hd)
    s_max = cache_k.shape[2]
    slopes = alibi_slopes(nh, cfg.alibi_bias_max)
    pos_vec = jnp.broadcast_to(cache_len, (b,))
    qpos = (pos_vec if positions is None else positions).astype(jnp.float32)
    kpos = jnp.arange(s_max, dtype=jnp.float32)
    bias = slopes[None, :, None, None] * (
        kpos[None, None, None, :] - qpos[:, None, None, None]
    )  # (B, H, 1, S)
    # strictly-past cache rows only; the fresh token rides the self column
    valid = jnp.arange(s_max)[None, :] < pos_vec[:, None]
    if key_mask is not None:
        valid = valid & key_mask.astype(bool)

    def body(x, per_layer):
        lp, ck_buf, cv_buf = per_layer
        y = _ln(lp["norm_1"], x, cfg.layer_norm_eps)
        qkv = _proj(lp["wqkv"], y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, 1, nh, hd)
        k = k.reshape(b, nh, hd)
        v = v.reshape(b, nh, hd)
        logits_c = jnp.einsum(
            "bqnd,bknd->bnqk", q, ck_buf.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * scale + bias
        logits_c = jnp.where(valid[:, None, None, :], logits_c, _NEG_INF)
        logit_s = jnp.einsum(
            "bqnd,bnd->bnq", q, k.astype(q.dtype), preferred_element_type=jnp.float32
        )[..., None] * scale  # self column, zero ALiBi bias
        probs = jax.nn.softmax(jnp.concatenate([logits_c, logit_s], axis=-1), axis=-1)
        att = jnp.einsum(
            "bnqk,bknd->bqnd", probs[..., :s_max].astype(cv_buf.dtype), cv_buf
        ) + probs[..., s_max:].astype(v.dtype).transpose(0, 2, 1, 3) * v[:, None]
        x = x + _proj(lp["out_proj"], att.astype(x.dtype).reshape(b, 1, d))
        y = _ln(lp["norm_2"], x, cfg.layer_norm_eps)
        y = _proj(lp["down"], jax.nn.gelu(_proj(lp["up"], y), approximate=False))
        return x + y, (k, v)

    x, (new_k, new_v) = jax.lax.scan(
        body, token_embeds, (params["layers_stacked"], cache_k, cache_v)
    )
    bix = jnp.arange(b)
    cache_k = cache_k.at[:, bix, pos_vec].set(new_k.astype(cache_k.dtype))
    cache_v = cache_v.at[:, bix, pos_vec].set(new_v.astype(cache_v.dtype))
    x = _ln(params["final_norm"], x, cfg.layer_norm_eps)
    logits = _proj(params["lm_head"], x)[:, 0]
    return logits, cache_k, cache_v


def mpt_extend_stacked(
    params: Params,
    cfg: MptConfig,
    ck: jax.Array,  # (L, B, S_max, H, D)
    cv: jax.Array,
    new_embeds: jax.Array,
    start: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """mpt_extend over stacked cache buffers (prefix-cache sessions in the
    stacked serving layout; mirror of llama_extend_stacked)."""
    from gpt4roi_tpu.models.llama import KVCache

    num = ck.shape[0]
    cache = KVCache(k=[ck[i] for i in range(num)], v=[cv[i] for i in range(num)])
    logits, new_cache = mpt_extend(params, cfg, cache, new_embeds, start)
    return logits, jnp.stack(new_cache.k), jnp.stack(new_cache.v)


def mpt_extend(
    params: Params,
    cfg: MptConfig,
    cache,  # KVCache
    new_embeds: jax.Array,  # (B, T, D) embeddings of the appended tokens
    start: jax.Array,  # scalar: number of tokens already in the cache
):
    """Incremental prefill for prefix-cache chat sessions (ALiBi analog of
    llama_extend; the reference recomputes the whole prefill every round,
    gpt4roi/app.py:285-300). Biases use absolute buffer positions — ALiBi's
    per-query constant cancels in softmax."""
    from gpt4roi_tpu.models.llama import KVCache

    b, t, d = new_embeds.shape
    s_max = cache.k[0].shape[1]
    nh, hd = cfg.n_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(hd)
    slopes = alibi_slopes(nh, cfg.alibi_bias_max)

    qpos = (start + jnp.arange(t)).astype(jnp.float32)  # (T,)
    kpos = jnp.arange(s_max, dtype=jnp.float32)  # (S,)
    bias = slopes[:, None, None] * (kpos[None, None, :] - qpos[None, :, None])  # (H, T, S)
    allow = jnp.arange(s_max)[None, None, :] <= (start + jnp.arange(t))[None, :, None]

    x = new_embeds
    new_k, new_v = [], []
    for li, lp in enumerate(_layer_list(params)):
        y = _ln(lp["norm_1"], x, cfg.layer_norm_eps)
        qkv = _proj(lp["wqkv"], y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, nh, hd)
        k = k.reshape(b, t, nh, hd)
        v = v.reshape(b, t, nh, hd)
        ck = jax.lax.dynamic_update_slice(
            cache.k[li], k.astype(cache.k[li].dtype), (0, start, 0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cache.v[li], v.astype(cache.v[li].dtype), (0, start, 0, 0)
        )
        new_k.append(ck)
        new_v.append(cv)
        logits = jnp.einsum(
            "bqnd,bknd->bnqk", q, ck.astype(q.dtype), preferred_element_type=jnp.float32
        ) * scale
        logits = logits + bias[None]
        logits = jnp.where(allow[:, None], logits, _NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(cv.dtype)
        att = jnp.einsum("bnqk,bknd->bqnd", probs, cv).reshape(b, t, d).astype(x.dtype)
        x = x + _proj(lp["out_proj"], att)
        y = _ln(lp["norm_2"], x, cfg.layer_norm_eps)
        y = _proj(lp["down"], jax.nn.gelu(_proj(lp["up"], y), approximate=False))
        x = x + y
    x = _ln(params["final_norm"], x, cfg.layer_norm_eps)
    logits = _proj(params["lm_head"], x)
    return logits, KVCache(k=new_k, v=new_v)
