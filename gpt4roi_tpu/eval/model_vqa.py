"""Batch VQA answer generation (reference: llava/eval/model_vqa.py).

Reads a questions jsonl ({question_id, image, text}), runs box-free or
box-prompted generation through the Engine, writes an answers jsonl
({question_id, prompt, text, model_id}). Chunked for multi-process sharding
(reference's --num-chunks/--chunk-idx)."""

from __future__ import annotations

import argparse
import json
import math
import os
from typing import Dict, List, Optional

import numpy as np


def get_chunk(lst: List, n: int, k: int) -> List:
    size = math.ceil(len(lst) / n)
    return lst[k * size : (k + 1) * size]


def run_vqa(
    session,  # ChatSession
    questions: List[Dict],
    image_root: str,
    answers_path: str,
    model_id: str = "gpt4roi-tpu",
    conv_reset_each: bool = True,
) -> List[Dict]:
    from gpt4roi_tpu.data.transforms import load_image

    out = []
    with open(answers_path, "w") as f:
        for q in questions:
            img = load_image(os.path.join(image_root, q["image"]))
            if img is None:
                continue
            if conv_reset_each:
                session.reset()
            session.set_image(img)
            boxes = q.get("boxes")
            if boxes:
                session.add_boxes(boxes, img.shape[:2])
            text = session.ask(q["text"])
            rec = {
                "question_id": q.get("question_id"),
                "prompt": q["text"],
                "text": text,
                "model_id": model_id,
            }
            out.append(rec)
            f.write(json.dumps(rec) + "\n")
            f.flush()
    return out


def main():  # pragma: no cover - CLI glue
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None)
    p.add_argument("--params_npz", default=None)
    p.add_argument("--question-file", required=True)
    p.add_argument("--image-folder", required=True)
    p.add_argument("--answers-file", required=True)
    p.add_argument("--num-chunks", type=int, default=1)
    p.add_argument("--chunk-idx", type=int, default=0)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    from gpt4roi_tpu.eval.gpt_review import load_jsonl
    from gpt4roi_tpu.serve.app import build_session

    session = build_session(args)
    questions = get_chunk(load_jsonl(args.question_file), args.num_chunks, args.chunk_idx)
    run_vqa(session, questions, args.image_folder, args.answers_file)


if __name__ == "__main__":
    main()
