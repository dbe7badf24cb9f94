"""COCO detection-as-chat dataset: one <bbox> -> category-name QA round per
GT box, prefixed by the 80-class category list prompt (reference:
gpt4roi/datasets/coco_det.py)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np

from gpt4roi_tpu.core.registry import DATASETS
from gpt4roi_tpu.data.datasets.base import RegionDataset
from gpt4roi_tpu.data.datasets.coco import CocoJson

COCO_CLASSES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
)


@DATASETS.register("CocoDet")
class CocoDet(RegionDataset):
    CLASSES = COCO_CLASSES

    def __init__(self, *args, max_gt_per_img: int = 100, flip_ratio: float = 0.5,
                 shift_ratio: float = 0.5, **kwargs):
        super().__init__(
            *args,
            max_gt_per_img=max_gt_per_img,
            flip_ratio=flip_ratio,
            shift_ratio=shift_ratio,
            **kwargs,
        )
        # reference: coco_det.py:104-108
        begin_str = (
            "<image>\nIn the conversation below, you simply answer the "
            "category name based on what you see in the imagery inside a "
            "particular region.I will give you only one region each time. "
            "Categories Containing "
        )
        self.begin_str = begin_str + ", ".join(self.CLASSES) + ".\n"

    def load_entries(self) -> List[Dict[str, Any]]:
        coco = CocoJson(self.ann_file)
        cat_ids = coco.get_cat_ids(list(self.CLASSES))
        cat2label = {cid: i for i, cid in enumerate(cat_ids)}
        entries = []
        for img_id in coco.get_img_ids():
            info = coco.load_imgs([img_id])[0]
            if min(info["width"], info["height"]) < 32:
                continue
            boxes, labels = [], []
            for ann in coco.img_to_anns[img_id]:
                if ann.get("ignore", False) or ann.get("iscrowd", 0):
                    continue
                if ann["category_id"] not in cat2label:
                    continue
                x1, y1, w, h = ann["bbox"]
                if ann.get("area", w * h) <= 0 or w < 1 or h < 1:
                    continue
                boxes.append([x1, y1, x1 + w, y1 + h])
                labels.append(cat2label[ann["category_id"]])
            if not boxes:
                continue
            entries.append(
                {
                    "img_path": info["file_name"],
                    "boxes": np.asarray(boxes, np.float32),
                    "labels": labels,
                }
            )
        return entries

    def build_conversations(self, labels: Sequence[int]) -> List[Dict[str, str]]:
        convs = []
        for i, label in enumerate(labels):
            q = "<bbox>"
            if i == 0:
                q = self.begin_str + q
            convs.append({"from": "human", "value": q})
            convs.append({"from": "gpt", "value": self.CLASSES[int(label)]})
        return convs
