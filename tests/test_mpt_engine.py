"""End-to-end MPT-decoder GPT4RoI: engine generation matches the iterative
full-forward oracle (decoder_type='mpt' path through splice + ALiBi)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, gpt4roi_forward, init_gpt4roi_params
from gpt4roi_tpu.models.mpt import MptConfig, init_mpt_params
from tests.test_gpt4roi import make_batch


def test_mpt_engine_generate(rng):
    from gpt4roi_tpu.serve.engine import Engine, EngineConfig

    base = Gpt4RoiConfig.tiny()
    mpt_cfg = MptConfig.tiny(vocab_size=128)
    cfg = dataclasses.replace(base, decoder_type="mpt", mpt=mpt_cfg)
    params = init_gpt4roi_params(jax.random.PRNGKey(0), base)
    del params["llama"]
    params["mpt"] = init_mpt_params(jax.random.PRNGKey(1), mpt_cfg)
    # mm_projector maps vision width -> decoder width (64 == tiny d_model)
    assert params["mm_projector"]["kernel"].shape[1] == mpt_cfg.d_model

    ids, images, boxes, mask = make_batch(cfg, rng, b=1, s=24)
    eng = Engine(params, cfg, EngineConfig(max_seq_len=64, prefill_bucket=32))
    out = eng.generate(ids, images, boxes, mask, max_new_tokens=3, temperature=0.0)

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
    assert out[0] == want
