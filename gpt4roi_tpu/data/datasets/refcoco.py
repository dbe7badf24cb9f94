"""RefCOCO / RefCOCO+ / RefCOCOg region-caption datasets (mdetr-format COCO
json with per-image ``caption``; reference: gpt4roi/datasets/refcoco.py)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np

from gpt4roi_tpu.core.registry import DATASETS
from gpt4roi_tpu.data.datasets.base import RegionDataset
from gpt4roi_tpu.data.datasets.coco import CocoJson

QUESTIONS = [
    "<spi_descript>",
]

# reference: refcoco.py:16-37
REFG_QUESTIONS = [
    "Can you provide me with a detailed description of the region in the picture marked by <spi_descript>?",
    "I'm curious about the region represented by <spi_descript> in the picture. Could you describe it in detail?",
    "What can you tell me about the region indicated by <spi_descript> in the image?",
    "I'd like to know more about the area in the photo labeled <spi_descript>. Can you give me a detailed description?",
    "Could you describe the region shown as <spi_descript> in the picture in great detail?",
    "What details can you give me about the region outlined by <spi_descript> in the photo?",
    "Please provide me with a comprehensive description of the region marked with <spi_descript> in the image.",
    "Can you give me a detailed account of the region labeled as <spi_descript> in the picture?",
    "I'm interested in learning more about the region represented by <spi_descript> in the photo. Can you describe it in detail?",
    "What is the region outlined by <spi_descript> in the picture like? Could you give me a detailed description?",
    "Can you provide me with a detailed description of the region in the picture marked by <spi_descript>, please?",
    "I'm curious about the region represented by <spi_descript> in the picture. Could you describe it in detail, please?",
    "What can you tell me about the region indicated by <spi_descript> in the image, exactly?",
    "I'd like to know more about the area in the photo labeled <spi_descript>, please. Can you give me a detailed description?",
    "Could you describe the region shown as <spi_descript> in the picture in great detail, please?",
    "What details can you give me about the region outlined by <spi_descript> in the photo, please?",
    "Please provide me with a comprehensive description of the region marked with <spi_descript> in the image, please.",
    "Can you give me a detailed account of the region labeled as <spi_descript> in the picture, please?",
    "I'm interested in learning more about the region represented by <spi_descript> in the photo. Can you describe it in detail, please?",
    "What is the region outlined by <spi_descript> in the picture like, please? Could you give me a detailed description?",
]


@DATASETS.register("RefCOCO")
class RefCOCO(RegionDataset):
    # reference: refcoco.py:119-124
    begin_str = (
        "<image>\n I will provide you with only one region "
        "containing only one object, although there may be other "
        "objects present in the image. It is recommended that you "
        "describe the object's relative position with respect to other "
        "objects in the image, as well as its position within "
        "the image and its basic attributes."
    )

    def load_entries(self) -> List[Dict[str, Any]]:
        coco = CocoJson(self.ann_file)
        entries = []
        for img_id in coco.get_img_ids():
            info = coco.load_imgs([img_id])[0]
            caption = info.get("caption", "")
            # short-caption filter (refcoco.py:160-163)
            if len(caption.split(" ")) < 3:
                continue
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
                labels.append(caption)  # every region answers the caption
            if not boxes:
                continue
            entries.append(
                {
                    # mdetr filenames carry split prefixes (refcoco.py:164)
                    "img_path": info["file_name"].split("_")[-1],
                    "boxes": np.asarray(boxes, np.float32),
                    "labels": labels,
                }
            )
        return entries

    def build_conversations(self, labels: Sequence[str]) -> List[Dict[str, str]]:
        convs = []
        for label in labels:
            q = str(self.rng.choice(QUESTIONS)).strip().replace("<spi_descript>", "<bbox>")
            convs.append({"from": "human", "value": q})
            convs.append({"from": "gpt", "value": label})
        convs[0]["value"] = self.begin_str + convs[0]["value"]
        return convs


@DATASETS.register("RefCOCOP")
class RefCOCOP(RefCOCO):
    # reference: refcoco.py:326-331
    begin_str = (
        "<image>\n I will provide you with only one region "
        "containing only one object, although there may be other "
        "objects present in the image. It is recommended that you "
        "describe the object's relative position with respect to other "
        "objects in the image and its basic attibuts, you should not "
        "give its position within the image"
    )


@DATASETS.register("RefCOCOG")
class RefCOCOG(RefCOCO):
    # reference: refcoco.py:341
    begin_str = "The <image> provides an overview of the picture.\n"

    def build_conversations(self, labels: Sequence[str]) -> List[Dict[str, str]]:
        convs = []
        for i, label in enumerate(labels):
            q = str(self.rng.choice(REFG_QUESTIONS)).strip()
            q = q.replace("<spi_descript>", f"region{i + 1} <bbox>")
            convs.append({"from": "human", "value": q})
            convs.append({"from": "gpt", "value": label})
        convs[0]["value"] = self.begin_str + convs[0]["value"]
        return convs
