"""LLaMA decoder (functional JAX) — RMSNorm, RoPE, SwiGLU, GQA-ready.

Capability parity with the HF ``LlamaForCausalLM`` the reference builds on
(reference: llava/model/llava.py:188-327; transformers pinned @cae78c46),
with the HF weight layout (half-split rotate RoPE) so converted Vicuna-7B
checkpoints reproduce reference numerics.

TPU-first: forward takes ``inputs_embeds`` directly (the GPT4RoI splice
happens upstream as a static-shape masked scatter, not a per-sample python
loop), training attention runs through the Pallas flash kernel on TPU, bf16
activations with fp32 norms/softmax, and decode uses a padded KV cache with
per-sequence lengths (no dynamic shapes anywhere).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gpt4roi_tpu.ops.attention import decode_attention, mha as _mha, self_attention
from gpt4roi_tpu.ops.norms import rms_norm
from gpt4roi_tpu.ops.quant import quant_matmul


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32006  # 32000 + <im_patch>/<bbox>/<point>/<im_start>/<im_end> + pad
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: Optional[int] = None  # None -> MHA
    max_position_embeddings: int = 2048
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    @classmethod
    def llama_7b(cls, vocab_size: int = 32006) -> "LlamaConfig":
        return cls(vocab_size=vocab_size)

    @classmethod
    def tiny(cls, vocab_size: int = 128) -> "LlamaConfig":
        return cls(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            max_position_embeddings=128,
        )


Params = Dict[str, Any]


def init_llama_params(key: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    d, m, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    kvd = cfg.kv_heads * cfg.head_dim
    keys = jax.random.split(key, 2 + cfg.num_layers)

    def dense(k, i, o):
        return {"kernel": jax.random.normal(k, (i, o), dtype) * (i**-0.5)}

    layers = []
    for li in range(cfg.num_layers):
        ks = jax.random.split(keys[2 + li], 7)
        layers.append(
            {
                "attn_norm": {"scale": jnp.ones((d,), dtype)},
                "q": dense(ks[0], d, d),
                "k": dense(ks[1], d, kvd),
                "v": dense(ks[2], d, kvd),
                "o": dense(ks[3], d, d),
                "mlp_norm": {"scale": jnp.ones((d,), dtype)},
                "gate": dense(ks[4], d, m),
                "up": dense(ks[5], d, m),
                "down": dense(ks[6], m, d),
            }
        )
    return {
        "embed": {"embedding": jax.random.normal(keys[0], (v, d), dtype) * 0.02},
        "layers": layers,
        "final_norm": {"scale": jnp.ones((d,), dtype)},
        "lm_head": dense(keys[1], d, v),
    }


def apply_remat(fn, remat):
    """Gradient checkpointing with a selectable policy.

    ``remat`` may be False/None (no remat), True or "full" (the reference's
    --gradient_checkpointing: save only layer inputs, recompute everything —
    costs ~2PD extra FLOPs per token on top of the 6PD fwd+bwd), or "dots"
    (save weight-matmul outputs plus the flash-attention output, recompute
    only elementwise ops — near-zero extra FLOPs for ~2x the
    saved-activation bytes; the right default on HBM-rich sharded meshes
    where the step is MXU-bound). Also saving the flash-attention output
    via a named checkpoint (save_only_these_names("attn_out") union) was
    measured slightly SLOWER at stage-2 shape (576.4 vs 570.7 ms, L=4) —
    the flash-forward recompute is cheaper than the scheduling hit, so the
    policy stays plain dots."""
    if not remat or remat == "none":
        return fn
    policy = (
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        if remat == "dots"
        else None
    )
    return jax.checkpoint(fn, policy=policy)


def rope_tables(cfg: LlamaConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables (..., head_dim) for given positions, HF half-split
    convention (freqs repeated twice along the feature dim)."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., hd/2)
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, N, D); cos/sin: (B, S, D). rotate_half = [-x2, x1]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return x * c + rotated * s


def _proj(p: Params, x: jax.Array) -> jax.Array:
    if "kernel_q" in p:  # int8 weight-only path (ops/quant.py)
        return quant_matmul(x, p)
    return x @ p["kernel"].astype(x.dtype)


def _qkv_proj(lp: Params, y: jax.Array, nh: int, nkv: int, hd: int):
    """q/k/v projections; uses the fused ``qkv`` weight when present (one
    weight stream + one activation quantization instead of three — the
    decode path is weight-bandwidth-bound)."""
    if "qkv" in lp:
        fused = _proj(lp["qkv"], y)
        return jnp.split(fused, [nh * hd, (nh + nkv) * hd], axis=-1)
    return _proj(lp["q"], y), _proj(lp["k"], y), _proj(lp["v"], y)


def _mlp(lp: Params, y: jax.Array) -> jax.Array:
    """SwiGLU MLP; uses the fused ``gate_up`` weight when present."""
    if "gate_up" in lp:
        fused = _proj(lp["gate_up"], y)
        g, u = jnp.split(fused, 2, axis=-1)
    else:
        g, u = _proj(lp["gate"], y), _proj(lp["up"], y)
    return _proj(lp["down"], jax.nn.silu(g) * u)


class KVCache(NamedTuple):
    k: List[jax.Array]  # per layer (B, S_max, N_kv, D)
    v: List[jax.Array]


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (batch, max_len, cfg.kv_heads, cfg.head_dim)
    zeros = [jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)]
    return KVCache(k=list(zeros), v=[jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)])


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return x
    b, s, n, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, n, n_rep, d)).reshape(b, s, n * n_rep, d)


def _cache_write(cache_buf: jax.Array, new: jax.Array, cache_len: jax.Array) -> jax.Array:
    """Write (B, N, D) rows into (B, S, N, D) at position(s) ``cache_len``.

    Uses scatter (.at[].set). Counter-intuitively this is the FASTEST
    variant measured on v5e inside a decode scan: dynamic_update_slice
    (scalar or vmapped) triggers memory-space-assignment copy-start/
    copy-done staging of the whole cache buffer every iteration (measured
    1.4-5x slower at 7B scale); scatter updates in place. Revisit when XLA
    MSA heuristics change."""
    b = cache_buf.shape[0]
    pos = jnp.broadcast_to(cache_len, (b,))
    return cache_buf.at[jnp.arange(b), pos].set(new.astype(cache_buf.dtype))


def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    input_ids: Optional[jax.Array] = None,  # (B, S)
    inputs_embeds: Optional[jax.Array] = None,  # (B, S, D)
    attention_mask: Optional[jax.Array] = None,  # (B, S) 1 = valid
    positions: Optional[jax.Array] = None,  # (B, S)
    segment_ids: Optional[jax.Array] = None,  # (B, S) int; packed sequences
    return_kv: bool = False,
    use_flash: Optional[bool] = None,
    remat: bool = False,
    scan_layers: bool = False,
    kv_pad_to: Optional[int] = None,  # scan path: emit kv padded to S_max
    logits_at: Optional[jax.Array] = None,  # scalar position: lm_head on
    # ONE position only (B, 1, V) — full-seq prefill logits at 7B are
    # S x V x fp32 of pure waste when serving needs the last token
) -> Tuple[jax.Array, jax.Array, Optional[Any]]:
    """Full (prefill/training) forward. Returns (logits, final_hidden, kv).

    ``remat=True`` rematerialises each decoder layer in the backward pass
    (the reference's --gradient_checkpointing; train_stage1.sh:33).
    ``segment_ids`` enables packed-sequence training: attention stays
    within segments and ``positions`` should restart per segment.
    ``scan_layers=True`` (stacked params only) runs lax.scan over the
    layer axis and returns kv as stacked (L, B, S, N, D) arrays."""
    if inputs_embeds is None:
        assert input_ids is not None
        inputs_embeds = params["embed"]["embedding"][input_ids]
    b, s, d = inputs_embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    if segment_ids is None:
        if attention_mask is None:
            segment_ids = jnp.ones((b, s), jnp.int32)
        else:
            segment_ids = attention_mask.astype(jnp.int32)

    cos, sin = rope_tables(cfg, positions)
    nh, nkv, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim

    def layer_fn(x, lp):
        y = rms_norm(x, lp["attn_norm"]["scale"], cfg.rms_eps)
        q, k, v = _qkv_proj(lp, y, nh, nkv, hd)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nkv, hd)
        v = v.reshape(b, s, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kr = _repeat_kv(k, nh // nkv)
        vr = _repeat_kv(v, nh // nkv)
        att = self_attention(q, kr, vr, segment_ids=segment_ids, causal=True, use_flash=use_flash)
        x = x + _proj(lp["o"], att.reshape(b, s, d))
        y = rms_norm(x, lp["mlp_norm"]["scale"], cfg.rms_eps)
        if kv_pad_to is not None:
            # emit the cache-ready row count per layer; the stacked scan ys
            # then IS the (L, B, S_max, N, D) KV cache — avoids holding the
            # unpadded prefill K/V and a separately allocated cache at the
            # same time (the transient doubled KV memory OOMed 7B serving
            # on one 16 GB chip)
            pad = ((0, 0), (0, kv_pad_to - s), (0, 0), (0, 0))
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        return x + _mlp(lp, y), (k, v)

    layer_fn = apply_remat(layer_fn, remat)

    # stacked param trees (serving layout, or training with --scan_layers)
    # take the scan path automatically
    scan_layers = scan_layers or "layers" not in params
    if scan_layers:
        # serving prefill: one compiled layer body instead of an L-times
        # larger unrolled program (cold-start compile: minutes -> seconds
        # at 7B). kv comes back stacked (L, B, S, N, D) — exactly the
        # stacked-cache serving layout.
        assert "layers_stacked" in params, "scan_layers needs stacked params"
        x, (ks, vs) = jax.lax.scan(layer_fn, inputs_embeds, params["layers_stacked"])
        x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
        xh = x
        if logits_at is not None:
            xh = jax.lax.dynamic_slice_in_dim(x, logits_at, 1, axis=1)
        logits = _proj(params["lm_head"], xh)
        return logits, x, ((ks, vs) if return_kv else None)

    x = inputs_embeds
    kv_out: List[Tuple[jax.Array, jax.Array]] = []
    for lp in layer_params_list(params):
        x, kv = layer_fn(x, lp)
        if return_kv:
            kv_out.append(kv)
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
    xh = x
    if logits_at is not None:
        xh = jax.lax.dynamic_slice_in_dim(x, logits_at, 1, axis=1)
    logits = _proj(params["lm_head"], xh)
    return logits, x, (kv_out if return_kv else None)


def llama_decode_step(
    params: Params,
    cfg: LlamaConfig,
    cache: KVCache,
    token_embeds: jax.Array,  # (B, 1, D)
    cache_len: jax.Array,  # scalar (batch-uniform, fast DUS path) or (B,)
    positions: Optional[jax.Array] = None,  # (B,) RoPE positions (ragged
    # left-padded batches: content position, not buffer position)
    key_mask: Optional[jax.Array] = None,  # (B, S_max) pad-prefix mask
) -> Tuple[jax.Array, KVCache]:
    """One autoregressive step: write k/v at ``cache_len``, attend to the
    valid prefix + self, return logits (B, vocab) and the updated cache."""
    b, _, d = token_embeds.shape
    nh, nkv, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim
    pos_vec = jnp.broadcast_to(cache_len, (b,))  # (B,) buffer positions
    rope_pos = pos_vec if positions is None else positions
    cos, sin = rope_tables(cfg, rope_pos[:, None])  # (B, 1, hd)
    x = token_embeds
    new_k, new_v = [], []
    for li, lp in enumerate(layer_params_list(params)):
        y = rms_norm(x, lp["attn_norm"]["scale"], cfg.rms_eps)
        q, k, v = _qkv_proj(lp, y, nh, nkv, hd)
        q = q.reshape(b, 1, nh, hd)
        k = k.reshape(b, 1, nkv, hd)
        v = v.reshape(b, 1, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ck = _cache_write(cache.k[li], k[:, 0], cache_len)
        cv = _cache_write(cache.v[li], v[:, 0], cache_len)
        new_k.append(ck)
        new_v.append(cv)
        kr = _repeat_kv(ck, nh // nkv)
        vr = _repeat_kv(cv, nh // nkv)
        att = decode_attention(
            q, kr.astype(q.dtype), vr.astype(q.dtype), pos_vec + 1, key_mask=key_mask
        )
        x = x + _proj(lp["o"], att.reshape(b, 1, d))
        y = rms_norm(x, lp["mlp_norm"]["scale"], cfg.rms_eps)
        x = x + _mlp(lp, y)
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
    logits = _proj(params["lm_head"], x)[:, 0]
    return logits, KVCache(k=new_k, v=new_v)


def stack_decode_layers(layers: List[Params]) -> Params:
    """Stack per-layer param trees along a new leading L axis (works for
    plain kernels and QuantDense leaves alike — QuantDense is a pytree
    node with identical aux across layers)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def to_stacked_params(params: Params) -> Params:
    """Replace the per-layer list with one stacked tree (serving layout:
    scan-over-layers decode compiles in seconds instead of minutes)."""
    if "layers_stacked" in params:
        return params
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = stack_decode_layers(params["layers"])
    return out


def fuse_stacked_qkv(params: Params) -> Params:
    """Fuse stacked q/k/v kernels into one ``qkv`` weight and gate/up into
    one ``gate_up`` (the serving layout, models/llama.py::_qkv_proj /
    _mlp) — for TRAINING on stacked params: 3 matmuls (fwd + dgrad + wgrad
    each) collapse into 1 per group, one activation read instead of three,
    and the optimizer updates one fused leaf. Gradients/optimizer state
    simply follow the fused tree. Reference equivalent: none — HF
    LlamaAttention keeps separate projections (the monkey-patch packs QKV
    only inside attention, gpt4roi/train/llama_flash_attn_monkey_patch.py)."""
    if "layers_stacked" not in params:
        raise ValueError("fuse_stacked_qkv expects stacked params")
    st = dict(params["layers_stacked"])
    if "qkv" not in st:
        st["qkv"] = {
            "kernel": jnp.concatenate(
                [st.pop("q")["kernel"], st.pop("k")["kernel"], st.pop("v")["kernel"]],
                axis=-1,
            )
        }
    if "gate_up" not in st:
        st["gate_up"] = {
            "kernel": jnp.concatenate(
                [st.pop("gate")["kernel"], st.pop("up")["kernel"]], axis=-1
            )
        }
    out = dict(params)
    out["layers_stacked"] = st
    return out


def layer_params_list(params: Params) -> List[Params]:
    """Per-layer param trees from either layout. Slicing a stacked tree
    under jit is a view, not a copy — the unrolled forward/extend paths
    work unchanged on stacked params."""
    if "layers" in params:
        return params["layers"]
    st = params["layers_stacked"]
    num = jax.tree_util.tree_leaves(st)[0].shape[0]
    return [jax.tree_util.tree_map(lambda a: a[i], st) for i in range(num)]


def llama_decode_step_stacked(
    params: Params,  # embed/final_norm/lm_head + 'layers_stacked'
    cfg: LlamaConfig,
    cache_k: jax.Array,  # (L, B, S_max, N_kv, D)
    cache_v: jax.Array,
    token_embeds: jax.Array,  # (B, 1, D)
    cache_len: jax.Array,
    positions: Optional[jax.Array] = None,
    key_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode step with ``lax.scan`` over the layer axis.

    Numerically equal to ``llama_decode_step`` (fp reassociation only);
    the difference is compile time: the unrolled 32-layer body makes XLA
    compile a ~32x larger program (minutes at 7B — prohibitive for cold
    bench/serving starts), while the scanned body compiles once.

    Cache handling is the critical part: the cache slices enter the scan
    READ-ONLY (xs); the fresh k/v rows come back as ys (tiny) and are
    scattered into the full (L, ...) buffers in ONE in-place update
    outside the scan. Threading the cache through scan ys instead copies
    the entire multi-GB buffer every token (measured 3x slower at 7B).
    Attention over past-cache + fresh-self uses decode_attention_self.
    Returns (logits, new_cache_k, new_cache_v) stacked."""
    from gpt4roi_tpu.ops.attention import decode_attention_self

    b, _, d = token_embeds.shape
    nh, nkv, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim
    pos_vec = jnp.broadcast_to(cache_len, (b,))
    rope_pos = pos_vec if positions is None else positions
    cos, sin = rope_tables(cfg, rope_pos[:, None])

    def body(x, per_layer):
        lp, ck_buf, cv_buf = per_layer
        y = rms_norm(x, lp["attn_norm"]["scale"], cfg.rms_eps)
        q, k, v = _qkv_proj(lp, y, nh, nkv, hd)
        q = apply_rope(q.reshape(b, 1, nh, hd), cos, sin)
        k = apply_rope(k.reshape(b, 1, nkv, hd), cos, sin)[:, 0]  # (B, nkv, hd)
        v = v.reshape(b, nkv, hd)
        kr = _repeat_kv(ck_buf.astype(q.dtype), nh // nkv)
        vr = _repeat_kv(cv_buf.astype(q.dtype), nh // nkv)
        k_rep = jnp.repeat(k, nh // nkv, axis=1) if nh != nkv else k
        v_rep = jnp.repeat(v, nh // nkv, axis=1) if nh != nkv else v
        att = decode_attention_self(
            q, kr, vr, k_rep.astype(q.dtype), v_rep.astype(q.dtype),
            pos_vec, key_mask=key_mask,
        )
        x = x + _proj(lp["o"], att.reshape(b, 1, d))
        y = rms_norm(x, lp["mlp_norm"]["scale"], cfg.rms_eps)
        return x + _mlp(lp, y), (k, v)

    x, (new_k, new_v) = jax.lax.scan(
        body, token_embeds, (params["layers_stacked"], cache_k, cache_v)
    )
    # one in-place scatter of all layers' fresh rows (B batch positions)
    bix = jnp.arange(b)
    cache_k = cache_k.at[:, bix, pos_vec].set(new_k.astype(cache_k.dtype))
    cache_v = cache_v.at[:, bix, pos_vec].set(new_v.astype(cache_v.dtype))
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
    logits = _proj(params["lm_head"], x)[:, 0]
    return logits, cache_k, cache_v


def llama_verify_step_stacked(
    params: Params,  # embed/final_norm/lm_head + 'layers_stacked'
    cfg: LlamaConfig,
    cache_k: jax.Array,  # (L, B, S_max, N_kv, D)
    cache_v: jax.Array,
    token_embeds: jax.Array,  # (B, T, D) — last accepted token + T-1 drafts
    cache_len: jax.Array,  # (B,) valid prefix length (excludes the window)
    key_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Speculative-verify step: score T candidate positions in ONE pass.

    Identical structure to ``llama_decode_step_stacked`` (cache slices are
    read-only scan xs, fresh K/V return as ys, one scatter outside the
    scan) but with a T-row window attending cache + causal-within-window
    (ops/attention.py::decode_attention_window). Decode at 7B W8A8 is
    weight-bandwidth-bound (~88%% of the weight roofline, BASELINE.md), so
    the T-1 extra rows ride the same weight stream nearly free — this is
    the primitive that lets prompt-lookup speculative decoding
    (serve/speculative.py) emit multiple tokens per weight pass where the
    reference emits exactly one (llava/serve/model_worker.py:182-260).

    ALL T rows are written into the cache at positions
    cache_len .. cache_len+T-1; rejected rows are stale but invisible (the
    attention mask only admits keys below the next step's cache_len) and
    are overwritten when accepted tokens advance past them — rollback is
    free. Returns (logits (B, T, V), new_cache_k, new_cache_v)."""
    from gpt4roi_tpu.ops.attention import decode_attention_window

    b, t, d = token_embeds.shape
    nh, nkv, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim
    pos = cache_len[:, None] + jnp.arange(t)[None, :]  # (B, T) absolute
    cos, sin = rope_tables(cfg, pos)

    def body(x, per_layer):
        lp, ck_buf, cv_buf = per_layer
        y = rms_norm(x, lp["attn_norm"]["scale"], cfg.rms_eps)
        q, k, v = _qkv_proj(lp, y, nh, nkv, hd)
        q = apply_rope(q.reshape(b, t, nh, hd), cos, sin)
        k = apply_rope(k.reshape(b, t, nkv, hd), cos, sin)
        v = v.reshape(b, t, nkv, hd)
        kr = _repeat_kv(ck_buf.astype(q.dtype), nh // nkv)
        vr = _repeat_kv(cv_buf.astype(q.dtype), nh // nkv)
        k_rep = _repeat_kv(k, nh // nkv)
        v_rep = _repeat_kv(v, nh // nkv)
        att = decode_attention_window(
            q, kr, vr, k_rep.astype(q.dtype), v_rep.astype(q.dtype),
            cache_len, key_mask=key_mask,
        )
        x = x + _proj(lp["o"], att.reshape(b, t, d))
        y = rms_norm(x, lp["mlp_norm"]["scale"], cfg.rms_eps)
        return x + _mlp(lp, y), (k, v)

    x, (new_k, new_v) = jax.lax.scan(
        body, token_embeds, (params["layers_stacked"], cache_k, cache_v)
    )
    # one scatter of all layers' T fresh rows (same idiom as decode:
    # scatter beats dynamic_update_slice inside decode loops on this
    # backend — models/llama.py::_cache_write)
    bix = jnp.arange(b)[:, None]
    cache_k = cache_k.at[:, bix, pos].set(new_k.astype(cache_k.dtype))
    cache_v = cache_v.at[:, bix, pos].set(new_v.astype(cache_v.dtype))
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
    logits = _proj(params["lm_head"], x)  # (B, T, V)
    return logits, cache_k, cache_v


def llama_extend(
    params: Params,
    cfg: LlamaConfig,
    cache: KVCache,
    new_embeds: jax.Array,  # (B, T, D) embeddings of the appended tokens
    start: jax.Array,  # scalar: number of tokens already in the cache
) -> Tuple[jax.Array, KVCache]:
    """Incremental prefill: run ``T`` new tokens against an existing KV
    cache (prefix-cache serving — the reference recomputes the whole
    prefill every chat round, gpt4roi/app.py:285-300). Returns logits for
    the new positions (B, T, V) and the extended cache."""
    b, t, d = new_embeds.shape
    s_max = cache.k[0].shape[1]
    nh, nkv, hd = cfg.num_heads, cfg.kv_heads, cfg.head_dim
    positions = start + jnp.arange(t)[None, :]  # (1, T) -> broadcast (B, T)
    positions = jnp.broadcast_to(positions, (b, t))
    cos, sin = rope_tables(cfg, positions)

    # key j allowed for query t_i: j <= start + t_i (past prefix + causal block)
    ki = jnp.arange(s_max)[None, None, :]
    allow = ki <= (start + jnp.arange(t))[None, :, None]  # (1, T, S)

    x = new_embeds
    new_k, new_v = [], []
    for li, lp in enumerate(layer_params_list(params)):
        y = rms_norm(x, lp["attn_norm"]["scale"], cfg.rms_eps)
        q, k, v = _qkv_proj(lp, y, nh, nkv, hd)  # fused-int8-layout aware
        q = q.reshape(b, t, nh, hd)
        k = k.reshape(b, t, nkv, hd)
        v = v.reshape(b, t, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ck = jax.lax.dynamic_update_slice(
            cache.k[li], k.astype(cache.k[li].dtype), (0, start, 0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cache.v[li], v.astype(cache.v[li].dtype), (0, start, 0, 0)
        )
        new_k.append(ck)
        new_v.append(cv)
        kr = _repeat_kv(ck.astype(q.dtype), nh // nkv)
        vr = _repeat_kv(cv.astype(q.dtype), nh // nkv)
        att = _mha(q, kr, vr, mask=allow[:, None], causal=False)
        x = x + _proj(lp["o"], att.reshape(b, t, d))
        y = rms_norm(x, lp["mlp_norm"]["scale"], cfg.rms_eps)
        x = x + _mlp(lp, y)
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_eps)
    logits = _proj(params["lm_head"], x)
    return logits, KVCache(k=new_k, v=new_v)


def write_prefill_kv(cache: KVCache, kv: List[Tuple[jax.Array, jax.Array]]) -> KVCache:
    """Write full-prefill K/V (B, S, N, D) into the front of the cache."""
    new_k, new_v = [], []
    for li, (k, v) in enumerate(kv):
        s = k.shape[1]
        new_k.append(cache.k[li].at[:, :s].set(k.astype(cache.k[li].dtype)))
        new_v.append(cache.v[li].at[:, :s].set(v.astype(cache.v[li].dtype)))
    return KVCache(k=new_k, v=new_v)


def init_stacked_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    shape = (cfg.num_layers, batch, max_len, cfg.kv_heads, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def write_prefill_kv_stacked(
    ck: jax.Array, cv: jax.Array, kv
) -> Tuple[jax.Array, jax.Array]:
    """Prefill K/V into stacked (L, B, S_max, N, D) buffers. ``kv`` is
    either a per-layer list of (k, v) or already-stacked (ks, vs) arrays
    (from scan_layers prefill)."""
    if isinstance(kv, tuple) and len(kv) == 2 and hasattr(kv[0], "ndim"):
        ks, vs = kv
    else:
        ks = jnp.stack([k for k, _ in kv])
        vs = jnp.stack([v for _, v in kv])
    s = ks.shape[2]
    return (
        ck.at[:, :, :s].set(ks.astype(ck.dtype)),
        cv.at[:, :, :s].set(vs.astype(cv.dtype)),
    )


def llama_extend_stacked(
    params: Params,
    cfg: LlamaConfig,
    ck: jax.Array,  # (L, B, S_max, N, D)
    cv: jax.Array,
    new_embeds: jax.Array,
    start: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """llama_extend over stacked cache buffers (prefix-cache sessions in
    the stacked serving layout). The per-layer unrolled extend runs on
    sliced views; outputs restack once (one cache-sized copy per chat
    round — negligible against the extend itself)."""
    num = ck.shape[0]
    cache = KVCache(k=[ck[i] for i in range(num)], v=[cv[i] for i in range(num)])
    logits, new_cache = llama_extend(params, cfg, cache, new_embeds, start)
    return logits, jnp.stack(new_cache.k), jnp.stack(new_cache.v)
