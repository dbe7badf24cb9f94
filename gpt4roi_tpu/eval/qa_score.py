"""QA answer scoring (reference: llava/eval/eval_science_qa.py): multiple-
choice option extraction + accuracy."""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional

OPTIONS = ["A", "B", "C", "D", "E"]


def parse_multiple_choice(text: str, choices: List[str]) -> Optional[int]:
    """Extract the predicted option index from free-form model output:
    leading 'The answer is X', bare letter, or exact choice-text match."""
    t = text.strip()
    m = re.search(r"answer is\s*\(?([A-E])\)?", t, re.IGNORECASE)
    if m:
        return OPTIONS.index(m.group(1).upper())
    m = re.match(r"^\(?([A-E])\)?[.,:\s]", t + " ")
    if m:
        return OPTIONS.index(m.group(1).upper())
    low = t.lower()
    for i, c in enumerate(choices):
        if c.lower() in low:
            return i
    return None


def score_answers(
    answers: Iterable[Dict],  # {question_id, text}
    gts: Dict[str, Dict],  # question_id -> {answer: idx, choices: [...]}
) -> Dict[str, float]:
    total = correct = parsed = 0
    for a in answers:
        qid = str(a["question_id"])
        if qid not in gts:
            continue
        total += 1
        gt = gts[qid]
        pred = parse_multiple_choice(a["text"], gt.get("choices", []))
        if pred is not None:
            parsed += 1
            if pred == gt["answer"]:
                correct += 1
    return {
        "total": total,
        "parsed": parsed,
        "accuracy": correct / total if total else 0.0,
    }
