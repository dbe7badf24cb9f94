"""Conversation-data preparation tools.

Functional ports of the live behaviours in ``llava/data/*`` (reference:
alpaca-converter.py, split_long_conversation.py, optional_clean.py,
pretty_json.py): alpaca -> conversation conversion, max-length conversation
splitting (v0 '### Role: ...\n' accounting), language/blocked-word
filtering, and pretty-print. The ShareGPT html->markdown cleaner is omitted
(needs bs4/markdownify, which are not in the image and are not on the
GPT4RoI train path).
"""

from __future__ import annotations

import json
import re
from typing import Callable, Dict, List, Optional

from gpt4roi_tpu.data import conversation as conversation_lib

BEGIN_SIGNAL = "### "
END_SIGNAL = "\n"

ALPACA_PROMPT_INPUT = (
    "Below is an instruction that describes a task, paired with an input that provides further context. "
    "Write a response that appropriately completes the request.\n\n"
    "### Instruction:\n{instruction}\n\n### Input:\n{input}\n\n### Response:"
)
ALPACA_PROMPT_NO_INPUT = (
    "Below is an instruction that describes a task. "
    "Write a response that appropriately completes the request.\n\n"
    "### Instruction:\n{instruction}\n\n### Response:"
)


def alpaca_to_conversations(data: List[Dict]) -> List[Dict]:
    """Alpaca {instruction, input, output} -> conversation records
    (alpaca-converter.py)."""
    out = []
    for i, ex in enumerate(data, start=1):
        prompt = (
            ALPACA_PROMPT_INPUT.format_map(ex)
            if ex.get("input", "")
            else ALPACA_PROMPT_NO_INPUT.format_map(ex)
        )
        out.append(
            {
                "id": str(i),
                "conversations": [
                    {"from": "human", "value": prompt},
                    {"from": "gpt", "value": ex["output"]},
                ],
            }
        )
    return out


def _turn_length(c: Dict[str, str], count_tokens: Callable[[str], int]) -> int:
    roles = conversation_lib.default_conversation.roles
    from_str = c["from"]
    if from_str.lower() == "human":
        from_str = roles[0]
    elif from_str.lower() == "gpt":
        from_str = roles[1]
    else:
        from_str = "unknown"
    return count_tokens(BEGIN_SIGNAL + from_str + ": " + c["value"] + END_SIGNAL)


def _split_sample(sample: Dict, start_idx: int, end_idx: int) -> Dict:
    # only end on a bot turn — a trailing human turn is useless
    # (split_long_conversation.py:24-30)
    end_speaker = sample["conversations"][end_idx]["from"]
    end_idx = end_idx + 1 if end_speaker != "human" else end_idx
    return {
        "id": f"{sample['id']}_{start_idx}",
        "conversations": sample["conversations"][start_idx:end_idx],
    }


def split_long_conversations(
    content: List[Dict], count_tokens: Callable[[str], int], max_length: int
) -> List[Dict]:
    """Split conversations so each piece stays under max_length tokens
    (split_long_conversation.py:33-70). ``count_tokens`` is any
    str -> token-count callable (tokenizer-agnostic)."""
    new_content = []
    for sample in content:
        lens = [_turn_length(c, count_tokens) for c in sample["conversations"]]
        num_tokens = 0
        start_idx = 0
        for idx, l in enumerate(lens):
            if num_tokens + l > max_length:
                new_content.append(_split_sample(sample, start_idx, idx))
                start_idx = idx
                num_tokens = l
            else:
                num_tokens += l
                if idx == len(lens) - 1:
                    new_content.append(_split_sample(sample, start_idx, idx))
    return new_content


BLOCKED_WORDS = ["openai", "chatgpt"]


def contains_blocked_words(text: str) -> bool:
    low = text.lower()
    return any(w in low for w in BLOCKED_WORDS)


def filter_conversations(
    content: List[Dict],
    drop_blocked: bool = True,
    keep_lang: Optional[str] = None,
    detect_lang: Optional[Callable[[str], str]] = None,
) -> List[Dict]:
    """optional_clean.py behaviours: drop blocked-word samples and/or keep a
    single language (language detector injectable; polyglot is not in the
    image)."""
    out = []
    for sample in content:
        text = " ".join(c["value"] for c in sample["conversations"])
        if drop_blocked and contains_blocked_words(text):
            continue
        if keep_lang and detect_lang and detect_lang(text) != keep_lang:
            continue
        out.append(sample)
    return out


def pretty_json(in_path: str, out_path: str) -> None:
    """pretty_json.py: re-serialise with indentation."""
    with open(in_path) as f:
        data = json.load(f)
    with open(out_path, "w") as f:
        json.dump(data, f, indent=2)
