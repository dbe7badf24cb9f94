"""LLaMA decoder parity vs HF LlamaForCausalLM (tiny config) + decode/prefill
consistency with the KV cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt4roi_tpu.models.llama import (
    LlamaConfig,
    init_kv_cache,
    llama_decode_step,
    llama_forward,
    write_prefill_kv,
)
from gpt4roi_tpu.utils.weights import convert_llama


@pytest.fixture(scope="module")
def tiny_pair():
    import torch
    from transformers import LlamaConfig as HFCfg, LlamaForCausalLM

    cfg = LlamaConfig.tiny()
    hf_cfg = HFCfg(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_eps,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    params = convert_llama(hf.state_dict(), cfg.num_layers)
    return cfg, hf, params


def test_forward_parity(tiny_pair, rng):
    import torch

    cfg, hf, params = tiny_pair
    ids = rng.integers(0, cfg.vocab_size, (2, 17))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    logits, _, _ = llama_forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-4, rtol=1e-3)


def test_forward_parity_with_padding(tiny_pair, rng):
    """Left-padded batch must match per-sequence unpadded runs on the valid
    suffix (padding isolated via segment ids)."""
    import torch

    cfg, hf, params = tiny_pair
    ids = rng.integers(0, cfg.vocab_size, (1, 11))
    pad = np.zeros((1, 5), np.int64)
    padded = np.concatenate([ids, pad], axis=1)
    mask = np.concatenate([np.ones((1, 11)), np.zeros((1, 5))], axis=1)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    logits, _, _ = llama_forward(
        params, cfg, input_ids=jnp.asarray(padded), attention_mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(logits)[:, :11], want, atol=2e-4, rtol=1e-3)


def test_decode_matches_prefill(tiny_pair, rng):
    """Greedy decode via KV cache must equal slicing a full forward."""
    cfg, _, params = tiny_pair
    b, s_total, s_prefill = 2, 12, 8
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s_total)))

    full_logits, _, _ = llama_forward(params, cfg, input_ids=ids)

    # prefill first 8, then decode tokens 8..11 one at a time
    pre = ids[:, :s_prefill]
    logits, _, kv = llama_forward(params, cfg, input_ids=pre, return_kv=True)
    cache = init_kv_cache(cfg, b, s_total, dtype=jnp.float32)
    cache = write_prefill_kv(cache, kv)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :s_prefill]), atol=1e-4, rtol=1e-3
    )
    for t in range(s_prefill, s_total):
        emb = params["embed"]["embedding"][ids[:, t]][:, None, :]
        step_logits, cache = llama_decode_step(
            params, cfg, cache, emb, jnp.full((b,), t, jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(full_logits[:, t]), atol=2e-4, rtol=1e-3,
            err_msg=f"decode step {t}",
        )


def test_flash_vs_xla_attention(rng):
    """Pallas flash kernel (interpret mode on CPU) vs XLA attention."""
    from gpt4roi_tpu.ops import attention as A

    b, s, n, d = 2, 256, 2, 128

    q = jnp.asarray(rng.standard_normal((b, s, n, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, n, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, n, d), dtype=np.float32))
    seg = jnp.asarray((rng.random((b, s)) < 0.8).astype(np.int32))

    want = A.mha(q, k, v, mask=(seg[:, None, :, None] == seg[:, None, None, :]), causal=True)

    import functools
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    with_interpret = functools.partial(orig, interpret=True)
    pl.pallas_call = with_interpret
    try:
        got = A.flash_attention(q, k, v, seg, causal=True, block_q=128, block_k=128)
    finally:
        pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3)


def test_scan_prefill_kv_pad_and_logits_at(rng):
    """Serving-prefill memory features: kv_pad_to emits cache-ready padded
    K/V and logits_at computes the lm_head on one position — both must
    agree exactly with the plain full outputs."""
    import jax
    import jax.numpy as jnp

    from gpt4roi_tpu.models.llama import (
        LlamaConfig,
        init_llama_params,
        llama_forward,
        to_stacked_params,
    )

    cfg = LlamaConfig.tiny(vocab_size=64)
    params = to_stacked_params(init_llama_params(jax.random.PRNGKey(0), cfg))
    ids = jnp.asarray(rng.integers(1, 64, (2, 12)).astype(np.int32))

    full_logits, _, (ks, vs) = llama_forward(params, cfg, input_ids=ids, return_kv=True)
    one_logits, _, (ksp, vsp) = llama_forward(
        params, cfg, input_ids=ids, return_kv=True,
        kv_pad_to=20, logits_at=jnp.int32(7),
    )
    assert one_logits.shape == (2, 1, 64)
    np.testing.assert_allclose(
        np.asarray(one_logits[:, 0]), np.asarray(full_logits[:, 7]), rtol=1e-6
    )
    # padded kv: first 12 rows match, the pad rows are exact zeros
    assert ksp.shape[2] == 20 and vsp.shape[2] == 20
    np.testing.assert_array_equal(np.asarray(ksp[:, :, :12]), np.asarray(ks))
    assert np.asarray(ksp[:, :, 12:]).max() == 0.0
    np.testing.assert_array_equal(np.asarray(vsp[:, :, :12]), np.asarray(vs))
