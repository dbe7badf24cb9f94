"""Conversation-prep tools (alpaca conversion, long-split, filtering)."""

from gpt4roi_tpu.data.tools import (
    alpaca_to_conversations,
    filter_conversations,
    split_long_conversations,
)


def count_words(s: str) -> int:
    return len(s.split())


def test_alpaca_conversion():
    data = [
        {"instruction": "Add numbers", "input": "1 2", "output": "3"},
        {"instruction": "Say hi", "input": "", "output": "hi"},
    ]
    out = alpaca_to_conversations(data)
    assert len(out) == 2
    assert "### Input:\n1 2" in out[0]["conversations"][0]["value"]
    assert "### Input" not in out[1]["conversations"][0]["value"]
    assert out[0]["conversations"][1] == {"from": "gpt", "value": "3"}


def test_split_long():
    sample = {
        "id": "s",
        "conversations": [
            {"from": "human", "value": "one two three four"},
            {"from": "gpt", "value": "five six seven eight"},
            {"from": "human", "value": "nine ten eleven twelve"},
            {"from": "gpt", "value": "a b c d"},
        ],
    }
    out = split_long_conversations([sample], count_words, max_length=16)
    assert len(out) >= 2
    # no split starts mid-round leaving a dangling human-only tail
    for piece in out:
        assert piece["conversations"][-1]["from"] == "gpt" or len(piece["conversations"]) > 1


def test_filter_blocked():
    content = [
        {"id": "1", "conversations": [{"from": "human", "value": "tell me about OpenAI"}]},
        {"id": "2", "conversations": [{"from": "human", "value": "tell me about cats"}]},
    ]
    out = filter_conversations(content)
    assert [c["id"] for c in out] == ["2"]


def test_sharegpt_html_to_markdown():
    """Stdlib html->markdown cleaner (clean_sharegpt.py parity on the
    ShareGPT tag subset + regex cleanups)."""
    from gpt4roi_tpu.data.tools import html_to_markdown

    got = html_to_markdown(
        "<div class='x'><p>Hello <b>world</b></p>"
        "<pre><code>pythonCopy codex = 1\ny = 2</code></pre></div>"
    )
    assert "Hello **world**" in got
    # 'Copy code' block reformatted into fenced code with language tag
    assert "```python\nx = 1\ny = 2\n```" in got
    # regenerate noise stripped from the beginning
    assert html_to_markdown("2 / 2Say hi") == "Say hi"
    assert "Copy12 chars" not in html_to_markdown("ok Copy12 chars / 3 words done")


def test_clean_sharegpt_pipeline():
    from gpt4roi_tpu.data.tools import clean_sharegpt

    mk = lambda cid, first, msgs: {"id": cid, "conversations": [
        {"from": ("human" if (i + first) % 2 == 0 else "gpt"), "value": v}
        for i, v in enumerate(msgs)]}
    content = [
        mk("a", 0, ["<p>hi</p>", "<b>hello</b>"]),           # ok
        mk("b", 1, ["leading gpt", "q", "ans"]),             # gpt-first: drop turn -> ok
        mk("c", 0, ["only human"]),                          # too short
        mk("d", 0, ["tell me about chatgpt", "no"]),         # blocked
        mk("a", 0, ["hi again", "x"]),                       # id dup
        mk("e", 0, ["hi", "<b>hello</b>"]),                  # value dup of 'a'
    ]
    cleaned, counters = clean_sharegpt(content)
    assert [s["id"] for s in cleaned] == ["a", "b"]
    assert cleaned[0]["conversations"][1]["value"] == "**hello**"
    assert counters == {"too_short": 1, "wrong_format": 0, "blocked_words": 1,
                        "id_dup": 1, "value_dup": 1}
