"""Review -> webpage data records (reference:
llava/eval/generate_webpage_data_from_table.py).

Joins question/answer/review jsonl streams by question_id into the record
layout the LLaVA comparison webpage consumes (id, category, question, both
answers, judge scores + explanation). Pure data transformation — the
static HTML/JS shell itself is generic and not model-specific."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional


def read_jsonl(path: str, key: Optional[str] = None):
    data = []
    with open(os.path.expanduser(path)) as f:
        for line in f:
            if line.strip():
                data.append(json.loads(line))
    if key is not None:
        data.sort(key=lambda x: x[key])
        return {item[key]: item for item in data}
    return data


def trim_hanging_lines(s: str, n: int) -> str:
    s = s.strip()
    for _ in range(n):
        s = s.split("\n", 1)[1].strip()
    return s


def build_records(
    questions: Dict, answers1: Dict, answers2: Dict, reviews: Dict,
    model1: str = "model1", model2: str = "model2",
) -> List[Dict]:
    records = []
    for qid in questions:
        if qid not in reviews:
            continue
        r = reviews[qid]
        review_text = r.get("review", r.get("content", ""))
        # drop the score line; keep the explanation
        explanation = review_text.split("\n", 1)[1].strip() if "\n" in review_text else ""
        records.append(
            {
                "id": qid,
                "category": questions[qid].get("category", "default"),
                "question": questions[qid]["text"],
                "answers": {
                    model1: answers1[qid]["text"],
                    model2: answers2[qid]["text"],
                },
                "scores": r.get("tuple", r.get("scores", [-1, -1])),
                "explanation": explanation,
            }
        )
    return records


def write_report(records: List[Dict], out_path: str, models: List[str]) -> None:
    with open(out_path, "w") as f:
        json.dump({"models": models, "records": records}, f, indent=2)
