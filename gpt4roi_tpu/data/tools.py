"""Conversation-data preparation tools.

Functional ports of the live behaviours in ``llava/data/*`` (reference:
alpaca-converter.py, split_long_conversation.py, optional_clean.py,
pretty_json.py): alpaca -> conversation conversion, max-length conversation
splitting (v0 '### Role: ...\n' accounting), language/blocked-word
filtering, pretty-print, and the ShareGPT html->markdown cleaner
(clean_sharegpt.py) — rebuilt on the stdlib html.parser instead of
bs4/markdownify (neither is in the image), covering the tag subset
ShareGPT exports actually use plus the reference's regex cleanups,
role-alternation checks and id/value deduplication.
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


# --- ShareGPT html -> markdown cleaner (clean_sharegpt.py) ---------------

_DIV_RE = re.compile(r"<div.*?>")
_SPAN_RE = re.compile(r"<span.*?>")
_CODE_LANG_RE = re.compile(r"```\s*(.*?)(?:Copy code)+(.+?)\s*?```", re.DOTALL)
_REGEN_RE = re.compile(r"\d+ / \d+")
_COPY_CHARS_RE = re.compile(r"Copy\d+ chars / \d+ words")
_COPY_CODE_RE = re.compile(r"```(.*?)Copy code\s*```")


class _MarkdownHTMLParser:
    """Minimal html -> markdown for the ShareGPT tag subset (p, br, code,
    pre, b/strong, i/em, ul/ol/li, a, h1-h6, table-less). Stdlib-only
    stand-in for markdownify 0.11.6's behaviour on this corpus."""

    def convert(self, html: str) -> str:
        from html.parser import HTMLParser

        out: List[str] = []
        state = {"pre": 0, "li_stack": [], "href": None}

        class P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                if tag in ("p",):
                    out.append("\n\n")
                elif tag == "br":
                    out.append("\n")
                elif tag == "pre":
                    state["pre"] += 1
                    out.append("\n```\n")
                elif tag == "code" and not state["pre"]:
                    out.append("`")
                elif tag in ("b", "strong"):
                    out.append("**")
                elif tag in ("i", "em"):
                    out.append("*")
                elif tag in ("ul", "ol"):
                    state["li_stack"].append(0 if tag == "ol" else None)
                elif tag == "li":
                    out.append("\n")
                    if state["li_stack"] and state["li_stack"][-1] is not None:
                        state["li_stack"][-1] += 1
                        out.append(f"{state['li_stack'][-1]}. ")
                    else:
                        out.append("* ")
                elif tag == "a":
                    state["href"] = dict(attrs).get("href")
                    out.append("[")
                elif tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
                    out.append("\n\n" + "#" * int(tag[1]) + " ")

            def handle_endtag(self, tag):
                if tag == "pre":
                    state["pre"] = max(0, state["pre"] - 1)
                    out.append("\n```\n")
                elif tag == "code" and not state["pre"]:
                    out.append("`")
                elif tag in ("b", "strong"):
                    out.append("**")
                elif tag in ("i", "em"):
                    out.append("*")
                elif tag in ("ul", "ol"):
                    if state["li_stack"]:
                        state["li_stack"].pop()
                    out.append("\n")
                elif tag == "a":
                    href = state.pop("href", None)
                    out.append(f"]({href})" if href else "]")
                elif tag in ("p", "h1", "h2", "h3", "h4", "h5", "h6"):
                    out.append("\n\n")

            def handle_data(self, data):
                out.append(data)

        p = P(convert_charrefs=True)
        p.feed(html)
        p.close()
        return "".join(out)


def html_to_markdown(val: str) -> str:
    """The reference's cleaning sequence (clean_sharegpt.py:41-63):
    strip div/span (keeps code-block indent/underscores), convert to
    markdown, reformat 'Copy code' blocks, drop regenerate/copy noise."""
    val = _DIV_RE.sub("", val)
    val = _SPAN_RE.sub("", val)
    val = _MarkdownHTMLParser().convert(val).strip()
    val = _CODE_LANG_RE.sub("```\\g<1>\n\\g<2>\n```", val)
    noise = _REGEN_RE.search(val)
    if noise and noise.start() == 0:
        val = val[noise.end():]
    val = _COPY_CHARS_RE.sub("", val)
    val = _COPY_CODE_RE.sub("", val)
    while "\n\n\n" in val:
        val = val.replace("\n\n\n", "\n\n")
    return val.strip()


def clean_sharegpt_sample(sample: Dict) -> "tuple[Dict, int]":
    """Per-sample clean (clean_sharegpt.py:74-105). Error codes: 0 ok,
    1 too short, 2 wrong role alternation, 3 blocked words."""
    roles = ["human", "gpt"]
    conv = sample.get("conversations", [])
    if conv and conv[0].get("from") != "human":
        conv = conv[1:]
    if conv and conv[-1].get("from") == "human":
        conv = conv[:-1]
    sample = dict(sample, conversations=conv)
    if len(conv) <= 1:
        return sample, 1
    for i, c in enumerate(conv):
        if c.get("from") != roles[i % 2]:
            return sample, 2
        if contains_blocked_words(c["value"]):
            return sample, 3
        c["value"] = html_to_markdown(c["value"])
    return sample, 0


def clean_sharegpt(content: List[Dict]) -> "tuple[List[Dict], Dict[str, int]]":
    """Full pipeline with id and (second-message, length) deduplication
    (clean_sharegpt.py:108-178). Returns (cleaned, counters)."""
    counters = {"too_short": 0, "wrong_format": 0, "blocked_words": 0,
                "id_dup": 0, "value_dup": 0}
    visited: Dict = {}
    out = []
    for sample in content:
        sample, code = clean_sharegpt_sample(sample)
        if code:
            key = {1: "too_short", 2: "wrong_format", 3: "blocked_words"}[code]
            counters[key] += 1
            continue
        cid = sample.get("id")
        vkey = (sample["conversations"][1]["value"], len(sample["conversations"]))
        if cid is not None and cid in visited:
            counters["id_dup"] += 1
            continue
        if vkey in visited:
            counters["value_dup"] += 1
            continue
        visited[vkey] = cid
        if cid is not None:
            visited[cid] = cid
        out.append(sample)
    return out, counters
