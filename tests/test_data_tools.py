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
