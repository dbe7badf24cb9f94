"""Region-recognition evaluation: ask the model the category of each GT box
(coco_det's training task) and score top-1 accuracy.

The reference ships NO in-repo region-level eval (SURVEY.md §4 — its
quality numbers live in the paper only); this provides a reproducible one:
for every image, each box is prompted exactly as in training
(category-list preamble + '<bbox>') and the free-form answer is matched
against the class-name list (longest-name-first so 'baseball bat' wins over
'baseball glove' prefixes).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence


def match_category(answer: str, class_names: Sequence[str]) -> Optional[int]:
    """Map a free-form answer to a class index (longest names first)."""
    low = answer.lower().strip()
    order = sorted(range(len(class_names)), key=lambda i: -len(class_names[i]))
    for i in order:
        if class_names[i].lower() in low:
            return i
    return None


def evaluate_region_recognition(
    session,  # ChatSession
    dataset,  # CocoDet-style: [i] -> {'image', 'boxes' (normalised), ...}
    class_names: Sequence[str],
    entries: Optional[Sequence[Dict]] = None,
    max_images: int = 100,
    max_regions_per_image: int = 10,
) -> Dict[str, float]:
    """Run the per-box category QA loop; returns accuracy stats."""
    entries = entries if entries is not None else dataset.entries
    total = correct = parsed = 0
    for idx, entry in enumerate(entries[:max_images]):
        img = dataset.load_image(entry)
        if img is None:
            continue
        boxes = entry["boxes"]
        labels = entry["labels"]
        h, w = img.shape[:2]
        session.reset()
        session.set_image(img)
        for k, (box, label) in enumerate(list(zip(boxes, labels))[:max_regions_per_image]):
            session.add_boxes([list(box)], (h, w))
            q = (
                dataset.begin_str + f"<region{len(session.boxes)}>"
                if k == 0
                else f"<region{len(session.boxes)}>"
            )
            answer = session.ask(q)
            pred = match_category(answer, class_names)
            total += 1
            if pred is not None:
                parsed += 1
                if pred == int(label):
                    correct += 1
    return {
        "total": total,
        "parsed": parsed,
        "accuracy": correct / total if total else 0.0,
        "parse_rate": parsed / total if total else 0.0,
    }


def main():  # pragma: no cover - CLI glue
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None)
    p.add_argument("--params_npz", default=None)
    p.add_argument("--ann_file", required=True)
    p.add_argument("--img_prefix", required=True)
    p.add_argument("--out", default="region_eval.json")
    p.add_argument("--max-images", type=int, default=100)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    from gpt4roi_tpu.data.datasets.coco_det import COCO_CLASSES, CocoDet
    from gpt4roi_tpu.serve.app import build_session

    session = build_session(args)
    dataset = CocoDet(
        tokenizer=session.tokenizer, ann_file=args.ann_file, img_prefix=args.img_prefix,
        test_mode=True,
    )
    stats = evaluate_region_recognition(session, dataset, COCO_CLASSES, max_images=args.max_images)
    with open(args.out, "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
