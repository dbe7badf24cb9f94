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


def make_mpt_engine(rng, max_seq_len=96, prefill_bucket=32):
    from gpt4roi_tpu.serve.engine import Engine, EngineConfig

    base = Gpt4RoiConfig.tiny()
    mpt_cfg = MptConfig.tiny(vocab_size=128)
    cfg = dataclasses.replace(base, decoder_type="mpt", mpt=mpt_cfg)
    params = init_gpt4roi_params(jax.random.PRNGKey(0), base)
    del params["llama"]
    params["mpt"] = init_mpt_params(jax.random.PRNGKey(1), mpt_cfg)
    return Engine(params, cfg, EngineConfig(max_seq_len=max_seq_len, prefill_bucket=prefill_bucket)), cfg


def test_mpt_ragged_matches_unbatched(rng):
    """MPT through generate_ragged (VERDICT r1 item 5): left-padded ALiBi
    decode must agree exactly with per-sample unbatched generation."""
    eng, cfg = make_mpt_engine(rng)
    ids1, img1, boxes1, mask1 = make_batch(cfg, rng, b=1, s=24)
    ids2, img2, boxes2, mask2 = make_batch(cfg, rng, b=1, s=28)

    want1 = eng.generate(ids1, img1, boxes1, mask1, max_new_tokens=4, temperature=0.0)[0]
    want2 = eng.generate(ids2, img2, boxes2, mask2, max_new_tokens=4, temperature=0.0)[0]

    prompts = [list(ids1[0]), list(ids2[0])]
    images = np.concatenate([img1, img2], axis=0)
    boxes = np.concatenate([boxes1, boxes2], axis=0)
    mask = np.concatenate([mask1, mask2], axis=0)
    got = eng.generate_ragged(prompts, images, boxes, mask, max_new_tokens=4, temperature=0.0)
    assert got[0] == want1
    assert got[1] == want2


def test_mpt_cached_session_matches_generate(rng):
    """MPT prefix-cache chat session (mpt_extend) agrees with the one-shot
    generate path on the same prompt."""
    eng, cfg = make_mpt_engine(rng)
    ids, images, boxes, mask = make_batch(cfg, rng, b=1, s=24)
    want = eng.generate(ids, images, boxes, mask, max_new_tokens=4, temperature=0.0)[0]

    sess = eng.cached_session()
    sess.set_vision(images, boxes, mask)
    got = sess.append_and_generate(list(ids[0]), max_new_tokens=4, temperature=0.0)
    assert got == want
