"""Streaming chat: ask_stream yields growing text and matches ask()."""

import numpy as np
import pytest

import jax

from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
from gpt4roi_tpu.serve.chat import ChatSession
from gpt4roi_tpu.serve.engine import Engine, EngineConfig
from tests.toy_tokenizer import ToyTokenizer


@pytest.fixture(scope="module")
def session():
    cfg = Gpt4RoiConfig.tiny(vocab_size=512)
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    eng = Engine(params, cfg, EngineConfig(max_seq_len=512, prefill_bucket=64))
    tok = ToyTokenizer(model_max_length=512)
    # seed the vocab with the special tokens at the configured ids
    from gpt4roi_tpu.data.constants import SPECIAL_TOKENS

    for name, tid in [
        ("<im_patch>", cfg.im_patch_token_id),
        ("<bbox>", cfg.bbox_token_id),
        ("<point>", cfg.point_token_id),
        ("<im_start>", cfg.im_start_token_id),
        ("<im_end>", cfg.im_end_token_id),
    ]:
        tok.vocab[name] = tid
    s = ChatSession(eng, tok, temperature=0.0, max_new_tokens=6)
    return s


def test_stream_matches_ask(session, rng):
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    session.reset()
    session.set_image(img)
    session.add_boxes([[4, 4, 30, 30]], img.shape[:2])
    pieces = list(session.ask_stream("describe <region1> please"))
    assert pieces, "stream yielded nothing"
    final_stream = pieces[-1]
    # growing prefix property
    for a, b in zip(pieces, pieces[1:]):
        assert b.startswith(a) or a == b

    session.reset()
    session.set_image(img)
    session.add_boxes([[4, 4, 30, 30]], img.shape[:2])
    direct = session.ask("describe <region1> please")
    assert direct == final_stream
