"""Visual Genome region-description dataset: ``regionN <bbox>`` detailed
description QA per region (reference: gpt4roi/datasets/vg.py)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np

from gpt4roi_tpu.core.registry import DATASETS
from gpt4roi_tpu.data.datasets.base import RegionDataset
from gpt4roi_tpu.data.datasets.coco import CocoJson
from gpt4roi_tpu.data.datasets.refcoco import REFG_QUESTIONS as FINAL_QUESTIONS


@DATASETS.register("VGDATA")
class VGDATA(RegionDataset):
    # reference: vg.py:112
    begin_str = "The <image> provides an overview of the picture.\n"

    def load_entries(self) -> List[Dict[str, Any]]:
        coco = CocoJson(self.ann_file)
        entries = []
        for img_id in coco.get_img_ids():
            info = coco.load_imgs([img_id])[0]
            boxes, labels = [], []
            for ann in coco.img_to_anns[img_id]:
                if ann.get("ignore", False):
                    continue
                x1, y1, w, h = ann["bbox"]
                iw = max(0, min(x1 + w, info["width"]) - max(x1, 0))
                ih = max(0, min(y1 + h, info["height"]) - max(y1, 0))
                if iw * ih == 0 or ann.get("area", w * h) <= 0 or w < 1 or h < 1:
                    continue
                boxes.append([x1, y1, x1 + w, y1 + h])
                # per-annotation region caption (vg.py:197)
                labels.append(ann.get("caption", ""))
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

    def build_conversations(self, labels: Sequence[str]) -> List[Dict[str, str]]:
        convs = []
        for i, label in enumerate(labels):
            q = str(self.rng.choice(FINAL_QUESTIONS)).strip()
            q = q.replace("<spi_descript>", f"region{i + 1} <bbox>")
            convs.append({"from": "human", "value": q})
            convs.append({"from": "gpt", "value": label})
        convs[0]["value"] = self.begin_str + convs[0]["value"]
        return convs
