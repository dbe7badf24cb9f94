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


def mpt_forward(
    params: Params,
    cfg: MptConfig,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,  # (B, S) 1 = valid
    return_kv: bool = False,
    remat: bool = False,
) -> Tuple[jax.Array, jax.Array, Optional[List[Tuple[jax.Array, jax.Array]]]]:
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
        return x + y, (k, v)

    if remat:
        block = jax.checkpoint(block)

    x = inputs_embeds
    kv_out: List[Tuple[jax.Array, jax.Array]] = []
    for lp in params["layers"]:
        x, kv = block(x, lp)
        if return_kv:
            kv_out.append(kv)
    x = _ln(params["final_norm"], x, cfg.layer_norm_eps)
    logits = _proj(params["lm_head"], x)
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
    for li, lp in enumerate(params["layers"]):
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
    for li, lp in enumerate(params["layers"]):
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
