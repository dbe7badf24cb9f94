"""Static-shape batch collation.

Replaces ``DataCollatorForDetDataset`` (reference:
gpt4roi/datasets/data_modules.py:22-56), which pads ids/labels to the batch
max and passes boxes through as python lists. For TPU/XLA every batch must
have identical shapes, so sequences pad to a fixed ``seq_len``, boxes pad to
``max_regions`` with a validity mask, and samples whose region count exceeds
the budget are truncated (the datasets already cap regions per image:
coco_det 100 / refcoco 15 / flickr 150).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import numpy as np

from gpt4roi_tpu.data.constants import IGNORE_INDEX


@dataclasses.dataclass(frozen=True)
class BatchSpec:
    seq_len: int = 2048
    max_regions: int = 32
    image_size: int = 224
    pad_token_id: int = 0


def collate(samples: List[Dict[str, Any]], spec: BatchSpec) -> Dict[str, np.ndarray]:
    b = len(samples)
    input_ids = np.full((b, spec.seq_len), spec.pad_token_id, np.int32)
    labels = np.full((b, spec.seq_len), IGNORE_INDEX, np.int32)
    attention_mask = np.zeros((b, spec.seq_len), np.float32)
    images = np.zeros((b, spec.image_size, spec.image_size, 3), np.float32)
    boxes = np.zeros((b, spec.max_regions, 4), np.float32)
    box_mask = np.zeros((b, spec.max_regions), bool)

    for i, s in enumerate(samples):
        ids = np.asarray(s["input_ids"])[: spec.seq_len]
        lab = np.asarray(s["labels"])[: spec.seq_len]
        n = len(ids)
        input_ids[i, :n] = ids
        labels[i, :n] = lab
        attention_mask[i, :n] = 1.0
        if s.get("image") is not None:
            images[i] = s["image"]
        bx = np.asarray(s.get("boxes", np.zeros((0, 4), np.float32)), np.float32)
        bx = bx.reshape(-1, 4)[: spec.max_regions]
        boxes[i, : len(bx)] = bx
        box_mask[i, : len(bx)] = True

    return {
        "input_ids": input_ids,
        "labels": labels,
        "attention_mask": attention_mask,
        "images": images,
        "boxes": boxes,
        "box_mask": box_mask,
    }
