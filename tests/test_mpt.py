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
