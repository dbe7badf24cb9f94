"""Minimal COCO-format JSON reader.

Replaces the pycocotools dependency chain (reference:
mmdet/datasets/api_wrappers/coco_api.py:11-47 wrapping pycocotools) with the
tiny live subset GPT4RoI's datasets actually use: image listing, per-image
annotation lookup, and category ids/names.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Any, Dict, List, Optional


class CocoJson:
    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            data = json.load(f)
        self.dataset = data
        self.imgs: Dict[int, Dict[str, Any]] = {img["id"]: img for img in data.get("images", [])}
        self.anns: Dict[int, Dict[str, Any]] = {a["id"]: a for a in data.get("annotations", [])}
        self.cats: Dict[int, Dict[str, Any]] = {c["id"]: c for c in data.get("categories", [])}
        self.img_to_anns: Dict[int, List[Dict[str, Any]]] = defaultdict(list)
        for a in data.get("annotations", []):
            self.img_to_anns[a["image_id"]].append(a)

    def get_img_ids(self) -> List[int]:
        return list(self.imgs.keys())

    def load_imgs(self, ids: List[int]) -> List[Dict[str, Any]]:
        return [self.imgs[i] for i in ids]

    def get_ann_ids(self, img_ids: List[int]) -> List[int]:
        out: List[int] = []
        for i in img_ids:
            out.extend(a["id"] for a in self.img_to_anns[i])
        return out

    def load_anns(self, ids: List[int]) -> List[Dict[str, Any]]:
        return [self.anns[i] for i in ids]

    def get_cat_ids(self, cat_names: Optional[List[str]] = None) -> List[int]:
        if not cat_names:
            return list(self.cats.keys())
        return [cid for cid, c in self.cats.items() if c.get("name") in cat_names]
