"""v0 preprocessing semantics: prompt formatting, multimodal token
expansion, and label masking (reference: gpt4roi/train/train.py:126-208,
355-386)."""

import numpy as np

from gpt4roi_tpu.data import conversation as conv_lib
from gpt4roi_tpu.data.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
    IGNORE_INDEX,
)
from gpt4roi_tpu.data.tokenization import preprocess, preprocess_multimodal
from tests.toy_tokenizer import ToyTokenizer


def make_source():
    return [
        {"from": "human", "value": "<image> what is in region1 <bbox> ?"},
        {"from": "gpt", "value": "a red apple ."},
    ]


def test_preprocess_multimodal_expansion():
    src = preprocess_multimodal([make_source()], image_token_len=4, use_im_start_end=True)
    v = src[0][0]["value"]
    expected = DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_PATCH_TOKEN * 4 + DEFAULT_IM_END_TOKEN
    assert expected in v
    assert "<image>" not in v


def test_v0_prompt_format():
    c = conv_lib.conv_v0.copy()
    c.append_message(c.roles[0], "hello")
    c.append_message(c.roles[1], None)
    p = c.get_prompt()
    assert p.startswith(conv_lib.SYSTEM_V1 + "###")
    assert "Human: hello###" in p
    assert p.endswith("Assistant:")


def test_v0_labels_mask_human_keep_gpt():
    tok = ToyTokenizer()
    src = make_source()
    out = preprocess([src], tok)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids.shape == labels.shape

    # assistant answer tokens must be present and unmasked
    apple_id = tok.vocab["apple"]
    pos = np.where(ids == apple_id)[0]
    assert len(pos) == 1
    assert labels[pos[0]] == apple_id

    # tokens of the human question (beyond the 2-token offset) are masked
    q_id = tok.vocab["region1"]
    qpos = np.where(ids == q_id)[0]
    assert len(qpos) == 1
    assert labels[qpos[0]] == IGNORE_INDEX

    # header (system prompt) fully masked
    assert (labels[:5] == IGNORE_INDEX).all()


def test_mask_boundaries_multiturn():
    tok = ToyTokenizer()
    src = make_source() + [
        {"from": "human", "value": "and region2 <bbox> ?"},
        {"from": "gpt", "value": "a blue car ."},
    ]
    out = preprocess([src], tok)
    ids, labels = out["input_ids"][0], out["labels"][0]
    car_id = tok.vocab["car"]
    pos = np.where(ids == car_id)[0]
    assert labels[pos[0]] == car_id
    r2 = tok.vocab["region2"]
    pos = np.where(ids == r2)[0]
    assert labels[pos[0]] == IGNORE_INDEX


def test_collate_static_shapes():
    from gpt4roi_tpu.data.collate import BatchSpec, collate

    tok = ToyTokenizer()
    src = preprocess_multimodal([make_source()], 4)
    out = preprocess(src, tok)
    sample = {
        "input_ids": out["input_ids"][0],
        "labels": out["labels"][0],
        "image": np.zeros((8, 8, 3), np.float32),
        "boxes": np.array([[0.1, 0.1, 0.5, 0.5]], np.float32),
    }
    spec = BatchSpec(seq_len=64, max_regions=4, image_size=8, pad_token_id=tok.pad_token_id)
    batch = collate([sample, dict(sample, boxes=np.zeros((0, 4)))], spec)
    assert batch["input_ids"].shape == (2, 64)
    assert batch["boxes"].shape == (2, 4, 4)
    assert batch["box_mask"].sum() == 1
    n = len(out["input_ids"][0])
    assert batch["attention_mask"][0].sum() == n
    assert (batch["labels"][0][n:] == IGNORE_INDEX).all()
