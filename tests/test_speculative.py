"""Prompt-lookup speculative decoding: greedy-exactness and window-verify
parity.

The invariant under test is absolute: speculative decode must emit the
IDENTICAL token sequence as vanilla one-by-one greedy decode for any
acceptance rate (serve/speculative.py accepts a draft only when the
verify pass's own argmax agrees). The reference has no speculative mode —
its worker emits one token per forward (llava/serve/model_worker.py:
182-260) — so the oracle here is our own vanilla decode path, which is
itself parity-tested against HF (tests/test_llama.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt4roi_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
    init_llama_params,
    llama_decode_step_stacked,
    llama_forward,
    llama_verify_step_stacked,
    stack_decode_layers,
    write_prefill_kv,
)
from gpt4roi_tpu.serve.speculative import pld_draft, spec_decode_chunk


def _stacked(params):
    sp = dict(params)
    sp["layers_stacked"] = stack_decode_layers(params.pop("layers") if False else params["layers"])
    sp = {k: v for k, v in sp.items() if k != "layers"}
    return sp


def _prefill(params, cfg, ids, s_max):
    b, s = ids.shape
    _, _, kv = llama_forward(params, cfg, input_ids=ids, return_kv=True)
    cache = write_prefill_kv(init_kv_cache(cfg, b, s_max, jnp.float32), kv)
    return jnp.stack(cache.k), jnp.stack(cache.v)


def _vanilla_greedy(params, sp, cfg, ids, n_new, s_max):
    """Oracle: one-token-at-a-time greedy decode via the stacked step."""
    b, s = ids.shape
    ck, cv = _prefill(params, cfg, ids, s_max)
    logits, _, _ = llama_forward(params, cfg, input_ids=ids)
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    out = [np.asarray(tok)]
    clen = jnp.asarray(s)
    for _ in range(n_new - 1):
        emb = sp["embed"]["embedding"][tok][:, None, :]
        logits, ck, cv = llama_decode_step_stacked(sp, cfg, ck, cv, emb, clen)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        out.append(np.asarray(tok))
        clen = clen + 1
    return np.stack(out, axis=1)  # (B, n_new)


def test_verify_step_window1_matches_decode_step(rng):
    """T=1 verify must reduce exactly to the decode step."""
    cfg = LlamaConfig.tiny(vocab_size=64)
    params = init_llama_params(jax.random.PRNGKey(3), cfg)
    sp = _stacked(params)
    ids = jnp.asarray(rng.integers(1, 64, (2, 12)).astype(np.int32))
    ck, cv = _prefill(params, cfg, ids, 32)
    emb = sp["embed"]["embedding"][jnp.asarray([3, 9])][:, None, :]
    clen = jnp.asarray(12)

    want, wk, wv = llama_decode_step_stacked(sp, cfg, ck, cv, emb, clen)
    got, gk, gv = llama_verify_step_stacked(
        sp, cfg, ck, cv, emb, jnp.full((2,), 12, jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(got[:, 0]), np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), rtol=1e-5, atol=1e-5)


def test_verify_step_matches_sequential_decode(rng):
    """A T-token window on the TRUE continuation must produce the same
    logits as T sequential decode steps (positions, rope, causal mask and
    cache writes all line up)."""
    cfg = LlamaConfig.tiny(vocab_size=64)
    params = init_llama_params(jax.random.PRNGKey(5), cfg)
    sp = _stacked(params)
    b, s, t = 2, 10, 4
    ids = jnp.asarray(rng.integers(1, 64, (b, s)).astype(np.int32))
    win = jnp.asarray(rng.integers(1, 64, (b, t)).astype(np.int32))

    # sequential oracle
    ck, cv = _prefill(params, cfg, ids, 32)
    seq_logits = []
    clen = jnp.asarray(s)
    for i in range(t):
        emb = sp["embed"]["embedding"][win[:, i]][:, None, :]
        lg, ck, cv = llama_decode_step_stacked(sp, cfg, ck, cv, emb, clen)
        seq_logits.append(np.asarray(lg))
        clen = clen + 1
    ck_seq, cv_seq = np.asarray(ck), np.asarray(cv)

    ck, cv = _prefill(params, cfg, ids, 32)
    lg, ck, cv = llama_verify_step_stacked(
        sp, cfg, ck, cv, sp["embed"]["embedding"][win],
        jnp.full((b,), s, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(lg), np.stack(seq_logits, axis=1), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(ck), ck_seq, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cv), cv_seq, rtol=1e-5, atol=1e-5)


def test_pld_draft_copies_recent_continuation():
    # history: ... 5 6 7 8 ... 5 6 | tail bigram (5,6) matched at pos 0
    ids = jnp.asarray([[5, 6, 7, 8, 2, 5, 6, 0, 0, 0]], jnp.int32)
    cur = jnp.asarray([7])
    d = np.asarray(pld_draft(ids, cur, 3))
    np.testing.assert_array_equal(d, [[7, 8, 2]])


def test_pld_draft_prefers_most_recent_match():
    # bigram (1,2) occurs twice; most recent continuation (9) must win
    ids = jnp.asarray([[1, 2, 3, 1, 2, 9, 4, 1, 2, 0, 0, 0]], jnp.int32)
    cur = jnp.asarray([9])
    d = np.asarray(pld_draft(ids, cur, 2))
    assert d[0, 0] == 9


def test_pld_draft_fallback_repeats_last():
    ids = jnp.asarray([[4, 7, 11, 0, 0, 0]], jnp.int32)
    cur = jnp.asarray([3])
    d = np.asarray(pld_draft(ids, cur, 3))
    np.testing.assert_array_equal(d, [[11, 11, 11]])


@pytest.mark.parametrize("window", [1, 2, 4])
def test_spec_decode_greedy_exact(rng, window):
    """Speculative output == vanilla greedy output, token for token, for
    several prompts and window sizes (window=1 is the degenerate
    no-drafting case)."""
    cfg = LlamaConfig.tiny(vocab_size=64)
    params = init_llama_params(jax.random.PRNGKey(7), cfg)
    sp = _stacked(params)
    b, s, n_new = 2, 12, 10
    ids_np = rng.integers(1, 64, (b, s)).astype(np.int32)
    ids = jnp.asarray(ids_np)

    want = _vanilla_greedy(params, sp, cfg, ids, n_new, 64)

    # spec path: prefill, seed ids buffer with prompt + first greedy token
    ck, cv = _prefill(params, cfg, ids, 64)
    logits, _, _ = llama_forward(params, cfg, input_ids=ids)
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    buf = jnp.zeros((b, 64), jnp.int32).at[:, :s].set(ids)
    buf = buf.at[:, s].set(first)
    cur = jnp.full((b,), s + 1, jnp.int32)
    # enough steps to emit >= n_new - 1 more tokens even at 0 acceptance
    buf, cur, ck, cv, emitted = spec_decode_chunk(
        sp, cfg, ck, cv, buf, cur, n_steps=n_new - 1, window=window
    )
    buf = np.asarray(buf)
    cur = np.asarray(cur)
    emitted = np.asarray(emitted)
    assert (emitted >= n_new - 1).all()
    for row in range(b):
        got = buf[row, s : s + n_new]
        np.testing.assert_array_equal(got, want[row], err_msg=f"row {row}")


def test_engine_speculative_matches_vanilla(rng):
    """Engine.generate with speculative_window=4 must emit the identical
    greedy tokens as the vanilla engine (full vision+SPI prompt path)."""
    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
    from gpt4roi_tpu.serve.engine import Engine, EngineConfig
    from tests.test_gpt4roi import make_batch

    cfg = Gpt4RoiConfig.tiny()
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    ids, images, boxes, mask = make_batch(cfg, rng, b=2, s=24)

    base = Engine(params, cfg, EngineConfig(max_seq_len=96, prefill_bucket=32))
    want = base.generate(ids, images, boxes, mask, max_new_tokens=12, temperature=0.0)

    spec = Engine(
        params, cfg,
        EngineConfig(max_seq_len=96, prefill_bucket=32, speculative_window=4),
    )
    got = spec.generate(ids, images, boxes, mask, max_new_tokens=12, temperature=0.0)
    assert got == want

    # stop tokens trim identically through the speculative path
    stop = want[0][3] if len(want[0]) > 3 else want[0][-1]
    want_s = base.generate(
        ids, images, boxes, mask, max_new_tokens=12, temperature=0.0,
        stop_token_ids=(int(stop),),
    )
    got_s = spec.generate(
        ids, images, boxes, mask, max_new_tokens=12, temperature=0.0,
        stop_token_ids=(int(stop),),
    )
    assert got_s == want_s


def test_spec_decode_accepts_on_repetitive_sequence(rng):
    """On a looping greedy trajectory the PLD drafter must actually get
    drafts ACCEPTED (acceptance > 0), i.e. fewer verify steps than tokens.
    A tiny random model's greedy decode always enters a cycle quickly at
    vocab 16, making acceptance inevitable once the cycle repeats."""
    cfg = LlamaConfig.tiny(vocab_size=16)
    params = init_llama_params(jax.random.PRNGKey(1), cfg)
    sp = _stacked(params)
    b, s = 1, 8
    ids = jnp.asarray(rng.integers(1, 16, (b, s)).astype(np.int32))

    n_new = 24
    want = _vanilla_greedy(params, sp, cfg, ids, n_new, 128)

    ck, cv = _prefill(params, cfg, ids, 128)
    logits, _, _ = llama_forward(params, cfg, input_ids=ids)
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    buf = jnp.zeros((b, 128), jnp.int32).at[:, :s].set(ids)
    buf = buf.at[:, s].set(first)
    cur = jnp.full((b,), s + 1, jnp.int32)
    n_steps = n_new - 1
    buf, cur, ck, cv, emitted = spec_decode_chunk(
        sp, cfg, ck, cv, buf, cur, n_steps=n_steps, window=4
    )
    assert int(np.asarray(emitted)[0]) > n_steps  # acceptance happened
    got = np.asarray(buf)[0, s : s + n_new]
    np.testing.assert_array_equal(got, want[0])
