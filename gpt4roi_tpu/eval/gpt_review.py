"""LLM-as-judge pairwise answer review (reference:
llava/eval/eval_gpt_review_visual.py, summarize_gpt_review.py).

The judge call is injectable (``judge_fn(content, max_tokens) -> str``) so
the pipeline runs against any scoring backend — the TPU image has no
network egress, so the OpenAI transport (reference's openai+ray) lives
behind ``make_openai_judge`` and is only imported on use.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Iterable, List, Optional, Tuple

JUDGE_SYSTEM = (
    "You are a helpful and precise assistant for checking the quality of the answer."
)


def parse_score(review: str) -> List[float]:
    """First line must hold two numbers: score for assistant 1 and 2
    (eval_gpt_review_visual.py:39-52)."""
    try:
        pair = review.split("\n")[0].replace(",", " ").split()
        if len(pair) == 2:
            return [float(pair[0]), float(pair[1])]
        return [-1.0, -1.0]
    except Exception:
        return [-1.0, -1.0]


def build_review_content(
    question: Dict, answer1: Dict, answer2: Dict, rule: Dict, context: Optional[Dict] = None
) -> str:
    """Prompt assembly mirroring the visual review format: optional image
    caption/box context, question, both answers, then the rule prompt."""
    parts = []
    if context:
        cap = context.get("caption", "")
        boxes = context.get("boxes")
        ctx = f"[Context]\n{cap}"
        if boxes:
            ctx += "\n" + "\n".join(str(b) for b in boxes)
        parts.append(ctx)
    parts.append(f"[Question]\n{question['text']}")
    parts.append(f"[Assistant 1]\n{answer1['text']}\n[End of Assistant 1]")
    parts.append(f"[Assistant 2]\n{answer2['text']}\n[End of Assistant 2]")
    parts.append(f"[System]\n{rule['prompt']}\n")
    return "\n\n".join(parts)


def review_answers(
    questions: Iterable[Dict],
    answers1: Iterable[Dict],
    answers2: Iterable[Dict],
    rules: Dict[str, Dict],
    judge_fn: Callable[[str, int], str],
    contexts: Optional[Dict[str, Dict]] = None,
    max_tokens: int = 1024,
) -> List[Dict]:
    """Run the pairwise review; returns records with scores + review text."""
    out = []
    for q, a1, a2 in zip(questions, answers1, answers2):
        cat = q.get("category", "default")
        rule = rules.get(cat, rules.get("default"))
        assert rule is not None, f"no rule for category {cat}"
        ctx = (contexts or {}).get(str(q.get("image", "")), None)
        content = build_review_content(q, a1, a2, rule, ctx)
        review = judge_fn(content, max_tokens)
        out.append(
            {
                "question_id": q.get("question_id"),
                "category": cat,
                "review": review,
                "tuple": parse_score(review),
            }
        )
    return out


def summarize(reviews: Iterable[Dict]) -> Dict[str, Tuple[float, float]]:
    """Per-category mean score pair (summarize_gpt_review.py)."""
    import collections

    acc: Dict[str, List[List[float]]] = collections.defaultdict(list)
    for r in reviews:
        if r["tuple"][0] >= 0:
            acc[r["category"]].append(r["tuple"])
    result = {}
    for cat, pairs in acc.items():
        s1 = sum(p[0] for p in pairs) / len(pairs)
        s2 = sum(p[1] for p in pairs) / len(pairs)
        result[cat] = (s1, s2)
    return result


def make_openai_judge(model: str = "gpt-4", temperature: float = 0.2):  # pragma: no cover
    """Network transport; requires openai + egress (absent in the TPU image)."""
    import time

    import openai

    def judge(content: str, max_tokens: int) -> str:
        while True:
            try:
                resp = openai.ChatCompletion.create(
                    model=model,
                    messages=[
                        {"role": "system", "content": JUDGE_SYSTEM},
                        {"role": "user", "content": content},
                    ],
                    temperature=temperature,
                    max_tokens=max_tokens,
                )
                return resp["choices"][0]["message"]["content"]
            except Exception:
                time.sleep(1)

    return judge


def default_rules() -> Dict[str, Dict]:
    """Bundled reviewer rule table (reference: llava/eval/table/rule.json +
    prompt.jsonl/reviewer.jsonl — the visual-QA categories conv/detail/
    complex use the visual judge prompt, coding/math their specialist
    prompts, everything else the general prompt)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "table", "rule.json")
    with open(path) as f:
        return json.load(f)


def load_jsonl(path: str) -> List[Dict]:
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def dump_jsonl(path: str, records: Iterable[Dict]) -> None:
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
