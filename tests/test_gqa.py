"""Grouped-query attention (num_kv_heads < num_heads) parity vs HF."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpt4roi_tpu.models.llama import LlamaConfig, llama_forward
from gpt4roi_tpu.utils.weights import convert_llama


def test_gqa_parity(rng):
    import torch
    from transformers import LlamaConfig as HFCfg, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, max_position_embeddings=128,
    )
    hf_cfg = HFCfg(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=2,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_eps, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    params = convert_llama(hf.state_dict(), cfg.num_layers)
    ids = rng.integers(0, cfg.vocab_size, (2, 13))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    logits, _, _ = llama_forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-4, rtol=1e-3)
