"""LLaVA-150k instruction data grounded with EVA-02-DET predicted boxes
(reference: gpt4roi/datasets/det_llava.py).

Per sample: LLaVA conversations; detections filtered by score > 0.3 and
normalised wh > 0.02, capped at 100; 50% of samples get a region-hint
preamble ("<bbox> may feature a {cls},"), plus two anti-hallucination yes/no
QA rounds drawn from seen/unseen LVIS classes. Note: the reference appends
the hallucination rounds to the *stored* annotation list (a state-mutation
bug, det_llava.py:424-444); here they are per-sample only.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, List, Optional

import numpy as np

from gpt4roi_tpu.core.registry import DATASETS
from gpt4roi_tpu.data import transforms as T
from gpt4roi_tpu.data.native import resize_normalize as _resize_normalize
from gpt4roi_tpu.data.datasets.base import RegionDataset
from gpt4roi_tpu.data.tokenization import preprocess, preprocess_multimodal

_META = json.load(open(os.path.join(os.path.dirname(__file__), "lvis_meta.json")))
LVIS_CLASSES = tuple(_META["lvis_classes"])
HALLUCINATION_QUESTIONS = _META["hallucination_questions"]
YES_TEMPLATES = _META["yes_templates"]
NO_TEMPLATES = _META["no_templates"]

BEGIN_WITH_BBOX = (
    "The <image> provides an overview of the picture. Here is also some "
    "regional information about the image, such as <spi_descript>.\n"
)
BEGIN_NO_BBOX = "The <image> provides an overview of the picture. \n"


@DATASETS.register("DetLLava")
class DetLLava(RegionDataset):
    def __init__(
        self,
        tokenizer,
        ann_file: str,
        img_prefix: str = "",
        det_pkl_path: Optional[str] = None,
        score_threshold: float = 0.3,
        max_det: int = 100,
        **kwargs,
    ):
        self.det_pkl_path = det_pkl_path
        self.score_threshold = score_threshold
        self.max_det = max_det
        super().__init__(tokenizer, ann_file, img_prefix, **kwargs)

    def load_entries(self) -> List[Dict[str, Any]]:
        with open(self.ann_file) as f:
            data = json.load(f)
        det_results: Dict[str, Any] = {}
        if self.det_pkl_path and os.path.exists(self.det_pkl_path):
            with open(self.det_pkl_path, "rb") as f:
                dets = pickle.load(f)
            det_results = {
                os.path.join(self.img_prefix, d["filename"]): d for d in dets
            }
        entries = []
        for item in data:
            img_path = os.path.join(self.img_prefix, item["image"])
            entries.append(
                {
                    "img_path": img_path,
                    "conversations": item["conversations"],
                    "det": det_results.get(img_path),
                }
            )
        return entries

    def _select_dets(self, det: Optional[Dict[str, Any]]):
        if det is None:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.int64)
        pred = np.asarray(det["pred_bboxes"], np.float32)  # (n, 5) normalised + score
        labels = np.asarray(det["labels"], np.int64)
        keep = pred[:, 4] > self.score_threshold
        boxes, labels2 = pred[keep][:, :4], labels[keep]
        wh = boxes[:, 2:4] - boxes[:, 0:2]
        small = (wh[:, 0] > 0.02) & (wh[:, 1] > 0.02)
        boxes, labels2 = boxes[small][: self.max_det], labels2[small][: self.max_det]
        if len(boxes) == 0:  # fall back to top-10 raw dets (det_llava.py:363-365)
            boxes, labels2 = pred[:10, :4], labels[:10]
        return boxes, labels2

    def getitem_once(self, idx: int) -> Optional[Dict[str, Any]]:
        entry = self.entries[idx]
        img = self.load_image(entry)
        if img is None:
            return None
        s = self.image_size
        image = _resize_normalize(img, (s, s))
        boxes, det_labels = self._select_dets(entry["det"])

        convs = [dict(c) for c in entry["conversations"]]
        no_bbox = bool(self.rng.random() > 0.5) or len(boxes) == 0
        begin = BEGIN_NO_BBOX if no_bbox else BEGIN_WITH_BBOX
        convs[0]["value"] = convs[0]["value"].replace("<image>", begin)
        if not no_bbox:
            spi = "".join(f"<bbox> may feature a {LVIS_CLASSES[l]}," for l in det_labels)
            convs[0]["value"] = convs[0]["value"].replace("<spi_descript>", spi)

        # anti-hallucination yes/no rounds (det_llava.py:411-444)
        seen = set(int(l) for l in det_labels)
        unseen = set(range(len(LVIS_CLASSES))) - seen
        sel = int(self.rng.integers(len(LVIS_CLASSES)))
        q = str(self.rng.choice(HALLUCINATION_QUESTIONS)).replace("<class>", LVIS_CLASSES[sel])
        if sel in seen:
            a = str(self.rng.choice(YES_TEMPLATES)).replace("<class>", LVIS_CLASSES[sel])
            second_pool, second_tmpl = unseen, NO_TEMPLATES
        else:
            a = str(self.rng.choice(NO_TEMPLATES)).replace("<class>", LVIS_CLASSES[sel])
            second_pool, second_tmpl = seen, YES_TEMPLATES
        convs.append({"from": "human", "value": q})
        convs.append({"from": "gpt", "value": a})
        if second_pool:
            sel2 = int(self.rng.choice(sorted(second_pool)))
            q2 = str(self.rng.choice(HALLUCINATION_QUESTIONS)).replace("<class>", LVIS_CLASSES[sel2])
            a2 = str(self.rng.choice(second_tmpl)).replace("<class>", LVIS_CLASSES[sel2])
            convs.append({"from": "human", "value": q2})
            convs.append({"from": "gpt", "value": a2})

        sources = preprocess_multimodal([convs], self.num_image_tokens(), self.use_im_start_end)
        data = preprocess(sources, self.tokenizer)
        return {
            "input_ids": data["input_ids"][0],
            "labels": data["labels"][0],
            "image": image,
            "boxes": np.zeros((0, 4), np.float32) if no_bbox else boxes,
        }
