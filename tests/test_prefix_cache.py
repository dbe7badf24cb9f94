"""Prefix-cache serving: llama_extend == full forward, and a multi-round
CachedSession matches from-scratch generation (image encoded once)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, gpt4roi_forward, init_gpt4roi_params
from gpt4roi_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
    init_llama_params,
    llama_extend,
    llama_forward,
)
from tests.test_gpt4roi import make_batch


def test_extend_matches_full_forward(rng):
    cfg = LlamaConfig.tiny()
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    b, s1, s2 = 2, 8, 6
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s1 + s2)))
    full_logits, _, _ = llama_forward(params, cfg, input_ids=ids)

    cache = init_kv_cache(cfg, b, 32, dtype=jnp.float32)
    emb1 = params["embed"]["embedding"][ids[:, :s1]]
    logits1, cache = llama_extend(params, cfg, cache, emb1, jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(logits1), np.asarray(full_logits[:, :s1]), atol=2e-4, rtol=1e-3
    )
    emb2 = params["embed"]["embedding"][ids[:, s1:]]
    logits2, cache = llama_extend(params, cfg, cache, emb2, jnp.int32(s1))
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(full_logits[:, s1:]), atol=2e-4, rtol=1e-3
    )


def test_cached_session_matches_scratch(rng):
    from gpt4roi_tpu.serve.engine import Engine, EngineConfig

    cfg = Gpt4RoiConfig.tiny()
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    ids, images, boxes, mask = make_batch(cfg, rng, b=1, s=24)
    eng = Engine(params, cfg, EngineConfig(max_seq_len=128, prefill_bucket=32))

    sess = eng.cached_session()
    sess.frag_quantum = 8
    sess.set_vision(images, boxes, mask)
    out1 = sess.append_and_generate(list(ids[0]), max_new_tokens=3, temperature=0.0)

    # oracle: iterative full forward (no cache at all)
    cur = ids.copy()
    want = []
    for _ in range(3):
        res = gpt4roi_forward(
            params, cfg, jnp.asarray(cur), images, boxes, mask,
            attention_mask=jnp.ones_like(cur, jnp.float32),
        )
        nxt = int(np.asarray(res["logits"])[0, -1].argmax())
        want.append(nxt)
        cur = np.concatenate([cur, [[nxt]]], axis=1).astype(np.int32)
    assert out1 == want

    # round 2: append more tokens, still consistent with full recompute
    extra = rng.integers(5, 50, (4,)).astype(np.int32)
    out2 = sess.append_and_generate(list(extra), max_new_tokens=2, temperature=0.0)
    cur = np.concatenate([cur, extra[None]], axis=1).astype(np.int32)
    want2 = []
    for _ in range(2):
        res = gpt4roi_forward(
            params, cfg, jnp.asarray(cur), images, boxes, mask,
            attention_mask=jnp.ones_like(cur, jnp.float32),
        )
        nxt = int(np.asarray(res["logits"])[0, -1].argmax())
        want2.append(nxt)
        cur = np.concatenate([cur, [[nxt]]], axis=1).astype(np.int32)
    assert out2 == want2
