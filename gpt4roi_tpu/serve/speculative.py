"""Prompt-lookup speculative decoding — multiple greedy tokens per weight
pass, fully on-device.

Why this lever: single-stream 7B W8A8 decode already runs at 88% of its
weight-bandwidth roofline (BASELINE.md decode table), so further gains
need fewer weight passes per emitted token, not faster passes. The
verify primitive (models/llama.py::llama_verify_step_stacked) scores a
T-token window in one pass at near the 1-token cost (decode is
weight-bound); the drafter proposes the window. The reference serving
path emits strictly one token per forward
(llava/serve/model_worker.py:182-260) and has no speculative mode.

Drafting is PROMPT-LOOKUP (n-gram copy): the draft for the next k tokens
is the continuation of the most recent earlier occurrence of the current
bigram in the sequence so far. Region-dialogue outputs are repetitive
(box coordinates, category names, phrases copied from the prompt), the
drafter costs one vectorized compare over the ids buffer (nothing vs 7B
weights), and — critically for this backend — it runs ON DEVICE inside
the decode scan: a host-side drafter would pay the ~2 s per-dispatch RPC
overhead every speculation step (CLAUDE.md gotchas).

Greedy-exactness: emitted tokens are ALWAYS the model's own greedy
continuation — a draft is only accepted when the verify pass's argmax
agrees with it, so output is bit-identical to vanilla greedy decode for
any acceptance rate (asserted in tests/test_speculative.py). Rejected
cache/ids writes land beyond the valid length, are invisible to the
masks, and are overwritten before the pointer passes them (every step
writes positions [cur, cur+k] and advances cur by at most k+1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gpt4roi_tpu.models.llama import LlamaConfig, llama_verify_step_stacked


def pld_draft(
    ids: jax.Array,  # (B, S) token buffer; positions >= cur are stale
    cur: jax.Array,  # (B,) valid length (ids[cur-1] = last emitted token)
    k: int,
) -> jax.Array:
    """Prompt-lookup draft: (B, k) continuation of the most recent earlier
    occurrence of the current tail bigram (falls back to repeating the
    last token when the bigram is unseen — cheapest always-valid draft).
    Pure vectorized compares/gathers; jit-safe, static shapes."""
    b, s = ids.shape
    bix = jnp.arange(b)
    last1 = ids[bix, cur - 1]  # most recent token
    last0 = ids[bix, jnp.maximum(cur - 2, 0)]
    pos = jnp.arange(s - 1)[None, :]  # candidate bigram start j
    match = (
        (ids[:, :-1] == last0[:, None])
        & (ids[:, 1:] == last1[:, None])
        # exclude the tail bigram itself (j == cur-2) and anything stale
        & (pos <= (cur - 3)[:, None])
        & (cur[:, None] >= 3)
    )
    # most recent match wins (recency beats frequency for dialogue loops)
    score = jnp.where(match, pos, -1)
    j = jnp.max(score, axis=1)  # (B,) start of matched bigram, -1 = none
    found = j >= 0
    # continuation ids[j+2 : j+2+k]; clamped gather (overrun tokens are
    # arbitrary drafts — they simply get rejected)
    gidx = jnp.clip(j[:, None] + 2 + jnp.arange(k)[None, :], 0, s - 1)
    cont = jnp.take_along_axis(ids, gidx, axis=1)
    return jnp.where(found[:, None], cont, last1[:, None])


def spec_decode_chunk(
    params,
    cfg: LlamaConfig,
    ck: jax.Array,  # (L, B, S_max, N_kv, D)
    cv: jax.Array,
    ids: jax.Array,  # (B, S_ids) prompt + generated tokens
    cur: jax.Array,  # (B,) valid length of ids
    n_steps: int,  # speculation steps (each emits 1..window tokens)
    window: int = 4,  # 1 + draft length
    key_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run ``n_steps`` speculative steps inside one ``lax.scan`` (one
    dispatch). Returns (ids, cur, ck, cv, accepted_total) where
    ``accepted_total`` (B,) counts emitted tokens over the chunk
    (n_steps <= accepted_total <= n_steps * window).

    Invariant: cache holds keys for positions 0..cur-2; ids[cur-1] is the
    next input token. Greedy-exact vs vanilla decode by construction."""
    embed = params["embed"]["embedding"]
    kdraft = window - 1
    bix = jnp.arange(ids.shape[0])

    def body(carry, _):
        ids, cur, ck, cv = carry
        last = ids[bix, cur - 1]  # (B,)
        if kdraft:
            drafts = pld_draft(ids, cur, kdraft)  # (B, k)
            win = jnp.concatenate([last[:, None], drafts], axis=1)
        else:
            drafts = None
            win = last[:, None]
        logits, ck, cv = llama_verify_step_stacked(
            params, cfg, ck, cv, embed[win], cur - 1, key_mask=key_mask
        )
        g = jnp.argmax(logits, -1).astype(jnp.int32)  # (B, window)
        if kdraft:
            hit = drafts == g[:, :-1]  # draft i+1 verified by output i
            acc = jnp.cumprod(hit.astype(jnp.int32), axis=1).sum(axis=1)  # (B,)
        else:
            acc = jnp.zeros_like(cur)
        # write ALL window outputs; only cur..cur+acc become valid now,
        # the rest are overwritten before the pointer passes them
        wpos = cur[:, None] + jnp.arange(window)[None, :]
        ids = ids.at[bix[:, None], wpos].set(g)
        cur = cur + acc + 1
        return (ids, cur, ck, cv), acc + 1

    (ids, cur, ck, cv), emitted = jax.lax.scan(
        body, (ids, cur, ck, cv), None, length=n_steps
    )
    return ids, cur, ck, cv, emitted.sum(axis=0)


def make_spec_decode_fn(cfg: LlamaConfig, n_steps: int, window: int = 4):
    """Jitted chunk runner with donated cache/ids buffers (serving layout:
    fresh buffers come back, no transient second copy at 7B scale)."""

    def run(params, ck, cv, ids, cur, key_mask=None):
        return spec_decode_chunk(
            params, cfg, ck, cv, ids, cur, n_steps, window, key_mask
        )

    return jax.jit(run, static_argnames=(), donate_argnums=(1, 2, 3))
