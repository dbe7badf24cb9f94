"""Conversation -> (input_ids, labels) preprocessing.

Behaviour parity with the reference preprocessors (reference:
gpt4roi/train/train.py:185-386), numpy-native:

  * ``preprocess_multimodal`` — replace ``<image>`` with
    ``<im_start> + N*<im_patch> + <im_end>`` in the text before tokenising
    (train.py:185-208);
  * ``preprocess`` (v0, the GPT4RoI default) — header + '### Role: msg\n'
    turns ending with '### ', labels IGNORE everywhere except assistant
    replies (offset quirks preserved: human turns masked from +2;
    per-piece tokenised lengths include BOS — train.py:126-161, 355-386);
  * ``preprocess_v1`` — vicuna TWO-style round masking (train.py:211-286).

Tokenizer interface: any HF-style tokenizer (callable -> .input_ids,
``model_max_length``, ``pad_token_id``). Tests use a toy vocab tokenizer.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Sequence

import numpy as np

from gpt4roi_tpu.data import conversation as conversation_lib
from gpt4roi_tpu.data.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
    DEFAULT_IMAGE_TOKEN,
    IGNORE_INDEX,
)


def _ids(tokenizer, text: str) -> np.ndarray:
    out = tokenizer(text, max_length=tokenizer.model_max_length, truncation=True)
    ids = out["input_ids"] if isinstance(out, dict) else out.input_ids
    return np.asarray(ids, dtype=np.int64)


def tokenize_pieces(strings: Sequence[str], tokenizer) -> Dict[str, Any]:
    """Per-string tokenisation (each piece gets BOS — the reference's
    _tokenize_fn, train.py:126-149)."""
    input_ids = [_ids(tokenizer, s) for s in strings]
    lens = [int((ids != tokenizer.pad_token_id).sum()) for ids in input_ids]
    return {"input_ids": input_ids, "input_ids_lens": lens}


def add_speaker_and_signal(header: str, source: List[Dict[str, str]]) -> str:
    """'### Role: msg\n' turn formatting, mutating source values in place as
    the reference does (train.py:163-183)."""
    begin, end = "### ", "\n"
    conversation = header
    roles = conversation_lib.default_conversation.roles
    for sentence in source:
        from_str = sentence["from"]
        if from_str.lower() == "human":
            from_str = roles[0]
        elif from_str.lower() == "gpt":
            from_str = roles[1]
        else:
            from_str = "unknown"
        sentence["value"] = begin + from_str + ": " + sentence["value"] + end
        conversation += sentence["value"]
    conversation += begin
    return conversation


def mask_targets(target: np.ndarray, tokenized_lens: List[int], speakers: List[str]) -> None:
    """Label masking for v0 (train.py:152-161): header fully masked; human
    turns masked from +2 (the '###'/'_' BOS-adjacent quirk preserved)."""
    cur_idx = tokenized_lens[0]
    tokenized_lens = tokenized_lens[1:]
    target[:cur_idx] = IGNORE_INDEX
    for tokenized_len, speaker in zip(tokenized_lens, speakers):
        if speaker == "human":
            target[cur_idx + 2 : cur_idx + tokenized_len] = IGNORE_INDEX
        cur_idx += tokenized_len


def preprocess_multimodal(
    sources: List[List[Dict[str, str]]],
    image_token_len: int,
    use_im_start_end: bool = True,
    sep_image_conv_front: bool = False,
) -> List[List[Dict[str, str]]]:
    for source in sources:
        if sep_image_conv_front:
            assert DEFAULT_IMAGE_TOKEN in source[0]["value"]
            source[0]["value"] = source[0]["value"].replace(DEFAULT_IMAGE_TOKEN, "").strip()
            source[0]["value"] = (
                DEFAULT_IMAGE_TOKEN
                + conversation_lib.default_conversation.sep
                + conversation_lib.default_conversation.roles[0]
                + ": "
                + source[0]["value"]
            )
        for sentence in source:
            replace_token = DEFAULT_IMAGE_PATCH_TOKEN * image_token_len
            if use_im_start_end:
                replace_token = DEFAULT_IM_START_TOKEN + replace_token + DEFAULT_IM_END_TOKEN
            sentence["value"] = sentence["value"].replace(DEFAULT_IMAGE_TOKEN, replace_token)
    return sources


def preprocess(sources: List[List[Dict[str, str]]], tokenizer) -> Dict[str, List[np.ndarray]]:
    """v0 path (train.py:355-386). Returns per-sample variable-length
    input_ids/labels (padding happens in the static-shape collator)."""
    if conversation_lib.default_conversation.version == "v1":
        return preprocess_v1(sources, tokenizer)
    if conversation_lib.default_conversation.version == "mpt":
        return preprocess_mpt(sources, tokenizer)
    conversations = []
    headers = []
    for source in sources:
        header = f"{conversation_lib.default_conversation.system}\n\n"
        headers.append(header)
        conversations.append(add_speaker_and_signal(header, source))
    input_ids = [_ids(tokenizer, c) for c in conversations]
    targets = copy.deepcopy(input_ids)
    for target, source, header in zip(targets, sources, headers):
        lens = tokenize_pieces([header] + [s["value"] for s in source], tokenizer)["input_ids_lens"]
        speakers = [s["from"] for s in source]
        mask_targets(target, lens, speakers)
    return {"input_ids": input_ids, "labels": targets}


def preprocess_v1(sources: List[List[Dict[str, str]]], tokenizer) -> Dict[str, List[np.ndarray]]:
    """vicuna_v1_1 TWO-style path (train.py:211-286)."""
    conv = conversation_lib.conv_vicuna_v1_1.copy()
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    conversations = []
    for source in sources:
        if roles[source[0]["from"]] != conv.roles[0]:
            source = source[1:]
        conv.messages = []
        for j, sentence in enumerate(source):
            role = roles[sentence["from"]]
            assert role == conv.roles[j % 2]
            conv.append_message(role, sentence["value"])
        conversations.append(conv.get_prompt())

    input_ids = [_ids(tokenizer, c) for c in conversations]
    targets = copy.deepcopy(input_ids)
    sep = conv.sep + conv.roles[1] + ": "
    for conversation, target in zip(conversations, targets):
        total_len = int((target != tokenizer.pad_token_id).sum())
        rounds = conversation.split(conv.sep2)
        cur_len = 1
        target[:cur_len] = IGNORE_INDEX
        for rou in rounds:
            if rou == "":
                break
            parts = rou.split(sep)
            if len(parts) != 2:
                break
            parts[0] += sep
            round_len = len(_ids(tokenizer, rou))
            instruction_len = len(_ids(tokenizer, parts[0])) - 2
            target[cur_len : cur_len + instruction_len] = IGNORE_INDEX
            cur_len += round_len
        target[cur_len:] = IGNORE_INDEX
        if cur_len < tokenizer.model_max_length and cur_len != total_len:
            target[:] = IGNORE_INDEX
    return {"input_ids": input_ids, "labels": targets}


def preprocess_mpt(sources: List[List[Dict[str, str]]], tokenizer) -> Dict[str, List[np.ndarray]]:
    """ChatML/MPT-style path (train.py:282-353).

    Round structure differs from v1: the prompt splits on ``<|im_end|>`` into
    [system, user, gpt, user, gpt, ...]; the first masked "round" is
    system+user+gpt re-joined (rounds[:3]), later rounds are user+gpt pairs.
    ``cur_len`` starts at 0 (the MPT/GPT-NeoX tokenizer emits no BOS), each
    round's length counts one trailing separator, and the instruction prefix
    up to ``<|im_end|><|im_start|>assistant\\n`` is masked."""
    conv = conversation_lib.conv_mpt.copy()
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    conversations = []
    for source in sources:
        if roles[source[0]["from"]] != conv.roles[0]:
            source = source[1:]
        conv.messages = []
        for j, sentence in enumerate(source):
            role = roles[sentence["from"]]
            assert role == conv.roles[j % 2]
            conv.append_message(role, sentence["value"])
        conversations.append(conv.get_prompt())

    input_ids = [_ids(tokenizer, c) for c in conversations]
    targets = copy.deepcopy(input_ids)
    sep = conv.sep + conv.roles[1]
    for conversation, target in zip(conversations, targets):
        total_len = int((target != tokenizer.pad_token_id).sum())
        rounds = conversation.split(conv.sep)
        re_rounds = [conv.sep.join(rounds[:3])]  # system + user + gpt
        for idx in range(3, len(rounds), 2):
            re_rounds.append(conv.sep.join(rounds[idx : idx + 2]))  # user + gpt
        cur_len = 0
        target[:cur_len] = IGNORE_INDEX
        for rou in re_rounds:
            if rou == "":
                break
            parts = rou.split(sep)
            if len(parts) != 2:
                break
            parts[0] += sep
            round_len = len(_ids(tokenizer, rou)) + len(_ids(tokenizer, conv.sep))
            instruction_len = len(_ids(tokenizer, parts[0]))
            target[cur_len : cur_len + instruction_len] = IGNORE_INDEX
            cur_len += round_len
        target[cur_len:] = IGNORE_INDEX
        if cur_len < tokenizer.model_max_length and cur_len != total_len:
            target[:] = IGNORE_INDEX
    return {"input_ids": input_ids, "labels": targets}
