"""MPT decoder parity vs HF MptForCausalLM + decode/prefill consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt4roi_tpu.models.llama import init_kv_cache, write_prefill_kv
from gpt4roi_tpu.models.mpt import MptConfig, init_mpt_params, mpt_decode_step, mpt_forward
from gpt4roi_tpu.utils.weights import convert_mpt


@pytest.fixture(scope="module")
def tiny_pair():
    import torch
    from transformers import MptConfig as HFCfg, MptForCausalLM

    cfg = MptConfig.tiny()
    hf_cfg = HFCfg(
        d_model=cfg.d_model,
        n_heads=cfg.n_heads,
        n_layers=cfg.n_layers,
        vocab_size=cfg.vocab_size,
        max_seq_len=cfg.max_seq_len,
    )
    torch.manual_seed(0)
    hf = MptForCausalLM(hf_cfg).eval()
    params = convert_mpt(hf.state_dict(), cfg.n_layers)
    return cfg, hf, params


def test_forward_parity(tiny_pair, rng):
    import torch

    cfg, hf, params = tiny_pair
    ids = rng.integers(0, cfg.vocab_size, (2, 19))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    logits, _, _ = mpt_forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), want, atol=3e-4, rtol=1e-3)


def test_decode_matches_prefill(tiny_pair, rng):
    cfg, _, params = tiny_pair

    class _KVCfg:
        num_layers = cfg.n_layers
        kv_heads = cfg.n_heads
        head_dim = cfg.head_dim

    b, s_total, s_pre = 2, 10, 6
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s_total)))
    full_logits, _, _ = mpt_forward(params, cfg, input_ids=ids)
    logits, _, kv = mpt_forward(params, cfg, input_ids=ids[:, :s_pre], return_kv=True)
    cache = init_kv_cache(_KVCfg, b, s_total, dtype=jnp.float32)
    cache = write_prefill_kv(cache, kv)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :s_pre]), atol=2e-4, rtol=1e-3
    )
    for t in range(s_pre, s_total):
        emb = params["embed"]["embedding"][ids[:, t]][:, None, :]
        step_logits, cache = mpt_decode_step(params, cfg, cache, emb, jnp.full((b,), t, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(full_logits[:, t]), atol=3e-4, rtol=1e-3,
            err_msg=f"step {t}",
        )


def test_stacked_decode_matches_unstacked(rng):
    """mpt_decode_step_stacked (scan-over-layers, read-only cache in scan +
    one scatter outside) reproduces the unrolled mpt_decode_step exactly;
    mpt_forward's scan path matches the unrolled forward (VERDICT r2
    item 9 — MPT serving through the stacked layout)."""
    from gpt4roi_tpu.models.llama import to_stacked_params
    from gpt4roi_tpu.models.mpt import mpt_decode_step_stacked

    cfg = MptConfig.tiny()
    params = init_mpt_params(jax.random.PRNGKey(1), cfg)
    sparams = to_stacked_params(params)
    b, s, smax = 2, 12, 24
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)))

    want_logits, _, kv = mpt_forward(params, cfg, input_ids=ids, return_kv=True)
    got_logits, _, (ks, vs) = mpt_forward(
        sparams, cfg, input_ids=ids, return_kv=True, kv_pad_to=smax
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(want_logits), atol=1e-5, rtol=1e-5
    )
    assert ks.shape == (cfg.n_layers, b, smax, cfg.n_heads, cfg.head_dim)

    # decode one token both ways from the same cache state
    cache = init_kv_cache(
        type("KV", (), {"num_layers": cfg.n_layers, "kv_heads": cfg.n_heads,
                        "head_dim": cfg.head_dim}),
        b, smax, dtype=jnp.float32,
    )
    cache = write_prefill_kv(cache, [(k, v) for k, v in zip(np.asarray(ks)[:, :, :s], np.asarray(vs)[:, :, :s])])
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)))
    emb = params["embed"]["embedding"][tok][:, None, :]
    want_step, _ = mpt_decode_step(params, cfg, cache, emb, jnp.int32(s))
    got_step, ck2, cv2 = mpt_decode_step_stacked(
        sparams, cfg, ks.astype(jnp.float32), vs.astype(jnp.float32), emb, jnp.int32(s)
    )
    np.testing.assert_allclose(
        np.asarray(got_step), np.asarray(want_step), atol=1e-5, rtol=1e-5
    )
    # fresh k/v written at position s
    assert not np.allclose(np.asarray(ck2)[:, :, s], 0.0)
