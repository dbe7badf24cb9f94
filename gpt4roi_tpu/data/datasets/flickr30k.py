"""Flickr30k-entities dataset: whole-image caption grounded on all regions +
per-region "which part of the caption is this" rounds (reference:
gpt4roi/datasets/flickr30k.py)."""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from gpt4roi_tpu.core.registry import DATASETS
from gpt4roi_tpu.data.datasets.base import RegionDataset
from gpt4roi_tpu.data.datasets.coco import CocoJson

# reference: flickr30k.py:11-22
REGION_QUESTIONS = [
    "Which part of your overall description corresponds to the specific area of the image <spi_descript> you are referring to?",
    "In your initial description, which part corresponds to the particular area of the image <spi_descript> you are indicating?",
    "Can you specify which aspect of your overall description corresponds to the particular section of the image <spi_descript> you are pointing to?",
    "Which specific details from your overall description correspond to the particular area of the image <spi_descript> you are identifying?",
    "From your initial description, which parts specifically match the area of the image <spi_descript> you are referring to?",
    "Could you indicate which elements from your overall description relate to the particular section of the image <spi_descript> you are highlighting?",
    "Which aspects of your description correspond to the specific area of the image <spi_descript> you are referencing?",
    "Can you point out the specific parts of your description that correspond to the area of the image <spi_descript> you are focusing on?",
    "In your description, which details correspond to the specific portion of the image <spi_descript> you are indicating?",
    "Could you identify the specific parts of your description that match the section of the image <spi_descript> you are referring to?",
]

# reference: flickr30k.py:23-55
FINAL_QUESTIONS = [
    "Could you please give me a detailed description of these areas <spi_descript>?",
    "Can you provide a thorough description of the regions <spi_descript> in this image?",
    "Please describe in detail the contents of the boxed areas <spi_descript>.",
    "Could you give a comprehensive explanation of what can be found within <spi_descript> in the picture?",
    "Could you give me an elaborate explanation of the <spi_descript> regions in this picture?",
    "Can you provide a comprehensive description of the areas identified by <spi_descript> in this photo?",
    "Help me understand the specific locations labeled <spi_descript> in this picture in detail, please.",
    "What is the detailed information about the areas marked by <spi_descript> in this image?",
    "Could you provide me with a detailed analysis of the regions designated <spi_descript> in this photo?",
    "What are the specific features of the areas marked <spi_descript> in this picture that you can describe in detail?",
    "Could you elaborate on the regions identified by <spi_descript> in this image?",
    "What can you tell me about the areas labeled <spi_descript> in this picture?",
    "Can you provide a thorough analysis of the specific locations designated <spi_descript> in this photo?",
    "I am interested in learning more about the regions marked <spi_descript> in this image. Can you provide me with more information?",
    "Could you please provide a detailed description of the areas identified by <spi_descript> in this photo?",
    "What is the significance of the regions labeled <spi_descript> in this picture?",
    "I would like to know more about the specific locations designated <spi_descript> in this image. Can you provide me with more information?",
    "Can you provide a detailed breakdown of the regions marked <spi_descript> in this photo?",
    "What specific features can you tell me about the areas identified by <spi_descript> in this picture?",
    "Could you please provide a comprehensive explanation of the locations labeled <spi_descript> in this image?",
    "Can you provide a detailed account of the regions designated <spi_descript> in this photo?",
    "I am curious about the areas marked <spi_descript> in this picture. Can you provide me with a detailed analysis?",
    "What important details can you tell me about the specific locations identified by <spi_descript> in this image?",
    "Could you please provide a detailed description of the regions labeled <spi_descript> in this photo?",
    "What can you tell me about the features of the areas designated <spi_descript> in this picture?",
    "Can you provide a comprehensive overview of the regions marked <spi_descript> in this image?",
    "I would like to know more about the specific locations identified by <spi_descript> in this photo. Can you provide me with more information?",
    "What is the detailed information you have on the areas labeled <spi_descript> in this picture?",
    "Could you provide me with a thorough analysis of the regions designated <spi_descript> in this image?",
    "Can you provide a detailed explanation of the specific locations marked by <spi_descript> in this photo?",
]


@DATASETS.register("flickr30k")
class Flickr30k(RegionDataset):
    # reference: flickr30k.py:133
    begin_str = "The <image> provides an overview of the picture.\n"

    def __init__(self, *args, max_gt_per_img: int = 150, **kwargs):
        super().__init__(*args, max_gt_per_img=max_gt_per_img, **kwargs)

    def load_entries(self) -> List[Dict[str, Any]]:
        coco = CocoJson(self.ann_file)
        entries = []
        for img_id in coco.get_img_ids():
            info = coco.load_imgs([img_id])[0]
            if min(int(info["width"]), int(info["height"])) < 32:
                continue
            caption = info.get("caption", "")
            boxes, labels = [], []
            for ann in coco.img_to_anns[img_id]:
                if ann.get("ignore", False) or ann.get("iscrowd", False):
                    continue
                x1, y1, w, h = ann["bbox"]
                iw = max(0, min(x1 + w, info["width"]) - max(x1, 0))
                ih = max(0, min(y1 + h, info["height"]) - max(y1, 0))
                if iw * ih == 0 or ann.get("area", w * h) <= 0 or w < 1 or h < 1:
                    continue
                boxes.append([x1, y1, x1 + w, y1 + h])
                # phrase = caption span of the first tokens_positive range
                # (flickr30k.py:219-221)
                spans = ann.get("tokens_positive", [])
                labels.append(caption[spans[0][0] : spans[0][1]] if spans else caption)
            if not boxes:
                continue
            entries.append(
                {
                    "img_path": info["file_name"],
                    "boxes": np.asarray(boxes, np.float32),
                    "labels": labels,
                    "caption": caption,
                }
            )
        return entries

    def getitem_once(self, idx: int):
        # custom conversation build needs the image caption -> override
        self._current_caption = self.entries[idx].get("caption", "")
        return super().getitem_once(idx)

    def build_conversations(self, labels) -> List[Dict[str, str]]:
        convs = []
        # round 1: all regions -> full caption (flickr30k.py:262-272)
        q = str(self.rng.choice(FINAL_QUESTIONS)).strip()
        s_bbox = "".join(f"region{i + 1} <bbox>," for i in range(len(labels)))
        convs.append({"from": "human", "value": q.replace("<spi_descript>", s_bbox)})
        convs.append({"from": "gpt", "value": self._current_caption})
        # per-region rounds (flickr30k.py:281-287; note 'region {i+1}' with space)
        for i, label in enumerate(labels):
            q = str(self.rng.choice(REGION_QUESTIONS)).strip()
            q = q.replace("<spi_descript>", f"region {i + 1}")
            convs.append({"from": "human", "value": q})
            convs.append({"from": "gpt", "value": label})
        convs[0]["value"] = self.begin_str + convs[0]["value"]
        return convs
