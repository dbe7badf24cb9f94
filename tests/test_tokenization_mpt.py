"""MPT/ChatML preprocessing parity (reference: gpt4roi/train/train.py:282-353,
llava/conversation.py:244-252).

Oracle: the MPT prompt is a pure concatenation with no BOS, so with a
word-level tokenizer the expected label mask can be computed exactly and
independently from the turn structure — per round, only the assistant
message tokens plus the <|im_end|> that closes it carry labels; system,
user turns, and the '<|im_start|>assistant\\n' role header are IGNORE.
"""

import numpy as np
import pytest

from gpt4roi_tpu.data import conversation as conv_lib
from gpt4roi_tpu.data.constants import IGNORE_INDEX
from gpt4roi_tpu.data.tokenization import preprocess, preprocess_mpt
from tests.toy_tokenizer import ToyTokenizer


def make_source():
    return [
        {"from": "human", "value": "what is in region1 <bbox> ?"},
        {"from": "gpt", "value": "a red apple ."},
        {"from": "human", "value": "and region2 <bbox> ?"},
        {"from": "gpt", "value": "a blue car ."},
    ]


def oracle(source, tok):
    """Independent piece-stream construction of (ids, labels)."""
    conv = conv_lib.conv_mpt
    sep, (role_u, role_a) = conv.sep, conv.roles
    pieces = [(conv.system, False), (sep, False)]
    for turn in source:
        if turn["from"] == "human":
            pieces += [(role_u, False), (turn["value"], False), (sep, False)]
        else:
            # assistant message AND its closing <|im_end|> carry labels
            pieces += [(role_a, False), (turn["value"], True), (sep, True)]
    ids, labels = [], []
    for text, keep in pieces:
        t = tok(text)["input_ids"]
        ids += t
        labels += t if keep else [IGNORE_INDEX] * len(t)
    return np.asarray(ids), np.asarray(labels)


def test_mpt_prompt_format():
    c = conv_lib.conv_mpt.copy()
    c.append_message(c.roles[0], "hello")
    c.append_message(c.roles[1], None)
    p = c.get_prompt()
    assert p.startswith("<|im_start|>system\n")
    # ChatML glue: no ': ' between role header and message
    assert "<|im_end|><|im_start|>user\nhello<|im_end|>" in p
    assert p.endswith("<|im_start|>assistant\n")


def test_mpt_masking_round_for_round():
    tok = ToyTokenizer(model_max_length=4096)
    src = make_source()
    got = preprocess_mpt([src], tok)
    ids, labels = got["input_ids"][0], got["labels"][0]
    want_ids, want_labels = oracle(make_source(), tok)
    np.testing.assert_array_equal(ids, want_ids)
    np.testing.assert_array_equal(labels, want_labels)
    # sanity on the oracle itself: both assistant replies present, both
    # human questions masked
    for word, masked in [("apple", False), ("car", False), ("region1", True), ("region2", True)]:
        pos = np.where(ids == tok.vocab[word])[0]
        assert len(pos) == 1
        assert (labels[pos[0]] == IGNORE_INDEX) == masked


def test_mpt_dispatch_via_default_conversation():
    tok = ToyTokenizer(model_max_length=4096)
    old = conv_lib.default_conversation
    conv_lib.default_conversation = conv_lib.conv_mpt
    try:
        got = preprocess([make_source()], tok)
    finally:
        conv_lib.default_conversation = old
    want_ids, _ = oracle(make_source(), tok)
    np.testing.assert_array_equal(got["input_ids"][0], want_ids)


def test_mpt_mismatch_masks_everything():
    tok = ToyTokenizer(model_max_length=4096)
    # a gpt-first source gets its first turn dropped; a malformed single
    # human turn yields no assistant round -> everything IGNORE
    src = [{"from": "human", "value": "question only"}]
    got = preprocess_mpt([src], tok)
    assert (got["labels"][0] == IGNORE_INDEX).all()
