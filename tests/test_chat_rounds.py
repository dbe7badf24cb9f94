"""Multi-round chat integration: a second round that references a NEWLY
drawn region must keep the SPI bank aligned with the <bbox> occurrences in
the full conversation, with the prefix cache on and off agreeing."""

import numpy as np
import pytest

import jax

from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
from gpt4roi_tpu.serve.chat import ChatSession
from gpt4roi_tpu.serve.engine import Engine, EngineConfig
from tests.toy_tokenizer import ToyTokenizer


def build(use_prefix_cache):
    cfg = Gpt4RoiConfig.tiny(vocab_size=512)
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    eng = Engine(params, cfg, EngineConfig(max_seq_len=768, prefill_bucket=64))
    tok = ToyTokenizer(model_max_length=768)
    for name, tid in [
        ("<im_patch>", cfg.im_patch_token_id),
        ("<bbox>", cfg.bbox_token_id),
        ("<point>", cfg.point_token_id),
        ("<im_start>", cfg.im_start_token_id),
        ("<im_end>", cfg.im_end_token_id),
    ]:
        tok.vocab[name] = tid
    return ChatSession(
        eng, tok, temperature=0.0, max_new_tokens=4, use_prefix_cache=use_prefix_cache
    ), tok


def run_two_rounds(session, img):
    session.reset()
    session.set_image(img)
    session.add_boxes([[4, 4, 30, 30]], img.shape[:2])
    a1 = session.ask("what is <region1> ?")
    # round 2: new region drawn mid-conversation
    session.add_boxes([[10, 10, 40, 44]], img.shape[:2])
    a2 = session.ask("compare <region1> with <region2>")
    return a1, a2


def test_two_rounds_cached_equals_uncached(rng):
    # both sessions share the SAME tokenizer-vocab growth order, so token
    # ids line up across the two runs
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    s_cached, tok1 = build(True)
    a1c, a2c = run_two_rounds(s_cached, img)
    s_plain, tok2 = build(False)
    a1p, a2p = run_two_rounds(s_plain, img)
    assert a1c == a1p
    assert a2c == a2p
    # the second prompt carries two <bbox> tokens in order
    prompt = s_plain.conv.get_prompt()
    assert prompt.count("<bbox>") == 3  # 1 from round1 history + 2 in round2
