"""VCR (Visual Commonsense Reasoning) datasets — three variants (reference:
gpt4roi/datasets/vcr.py): full (all objects as regionN preamble + Q->A->why
rounds), single-region, and multi-region digit-rewrite formats. Boxes come
from per-image metadata json; images bypass the det pipeline (CLIP resize,
boxes normalised by original w/h — vcr.py:176-188)."""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional

import numpy as np

from gpt4roi_tpu.core.registry import DATASETS
from gpt4roi_tpu.data import transforms as T
from gpt4roi_tpu.data.native import resize_normalize as _resize_normalize
from gpt4roi_tpu.data.datasets.base import RegionDataset
from gpt4roi_tpu.data.tokenization import preprocess, preprocess_multimodal

# reference: vcr.py:17-58
WHY_QUESTIONS = [
    "why?",
    "why",
    "What's the rationale for your decision?",
    "What led you to that conclusion?",
    "What's the reasoning behind your opinion?",
    "Why do you believe that to be true?",
    "Can you explain the basis for your thinking?",
    "What factors influenced your perspective?",
    "How did you arrive at that perspective?",
    "What evidence supports your viewpoint?",
    "What makes you think that way?",
    "What's the logic behind your argument?",
    "Can you provide some context for your opinion?",
    "What's the basis for your assertion?",
    "Why do you hold that belief?",
    "What experiences have shaped your perspective?",
    "What assumptions underlie your reasoning?",
    "What's the foundation of your assertion?",
    "What's the source of your reasoning?",
    "What's the motivation behind your decision?",
    "What's the impetus for your belief?",
    "What's the driving force behind your conclusion?",
    "Why do you think that?",
    "What's your reasoning?",
    "What makes you say that?",
    "Why do you feel that way?",
    "What's the story behind that?",
    "What's your thought process?",
    "What's the deal with that?",
    "What's the logic behind it?",
    "Why do you believe that?",
    "What's the real deal here?",
    "What's the reason behind it?",
    "What's the thought process behind your decision?",
    "What's the rationale for your opinion?",
    "Why do you have that impression?",
    "What's the background to that?",
    "What's the evidence that supports your view?",
    "What's the explanation for that?",
]

# reference: vcr.py:60-68
REF_WAY = [
    "There are <spi> in the image,",
    "There are <spi>,",
    "Given <spi>,",
    "Given <spi> in the image,",
    "<spi>,",
    "<spi> in the given image,",
]


@DATASETS.register("VCRDataset")
class VCRDataset(RegionDataset):
    begin_str = "The <image> provides an overview of the picture.\n"

    def _read_jsonl(self) -> List[Dict[str, Any]]:
        with open(self.ann_file) as f:
            return [json.loads(line) for line in f]

    def _boxes_for(self, ann: Dict[str, Any]) -> np.ndarray:
        path = os.path.join(self.img_prefix, ann["metadata_fn"])
        with open(path) as f:
            return np.asarray(json.load(f)["boxes"], np.float32)

    @staticmethod
    def _replace_numbers_with_tags(s: str, class_names: List[str]) -> Optional[str]:
        # digit d -> "<class_names[d]> at region<d>" (vcr.py:103-111)
        pattern = r"\b(\d+)\b"
        try:
            return re.sub(
                pattern,
                lambda m: f"{class_names[int(m.group(1))]} at region{m.group(1)}",
                s,
            )
        except (IndexError, ValueError):
            return None

    def load_entries(self) -> List[Dict[str, Any]]:
        entries = []
        for ann in self._read_jsonl():
            class_names = ann["objects"]
            boxes = self._boxes_for(ann)
            ref_string = ",".join(f"region{i + 1} <bbox>" for i in range(len(class_names)))
            ref_prefix = str(self.rng.choice(REF_WAY))
            begin = ref_prefix.replace("<spi>", ref_string)
            q = self._replace_numbers_with_tags(ann["question_orig"], class_names)
            a = self._replace_numbers_with_tags(ann["answer_orig"], class_names)
            why = self._replace_numbers_with_tags(ann["rationale_orig"], class_names)
            if q is None or a is None or why is None:
                continue
            qas = [
                {"from": "human", "value": begin + q},
                {"from": "gpt", "value": a},
                {"from": "human", "value": str(self.rng.choice(WHY_QUESTIONS))},
                {"from": "gpt", "value": why},
            ]
            entries.append(
                {
                    "img_path": ann["img_fn"],
                    "boxes": boxes[:, :4],
                    "labels": class_names,
                    "qas": qas,
                }
            )
        return entries

    def getitem_once(self, idx: int) -> Optional[Dict[str, Any]]:
        entry = self.entries[idx]
        img = self.load_image(entry)
        if img is None:
            return None
        h, w = img.shape[:2]
        s = self.image_size
        image = _resize_normalize(img, (s, s))
        boxes = np.asarray(entry["boxes"], np.float32)[:, :4] / np.array(
            [w, h, w, h], np.float32
        )
        qas = [dict(x) for x in entry["qas"]]
        qas[0]["value"] = self.begin_str + qas[0]["value"]
        sources = preprocess_multimodal([qas], self.num_image_tokens(), self.use_im_start_end)
        data = preprocess(sources, self.tokenizer)
        return {
            "input_ids": data["input_ids"][0],
            "labels": data["labels"][0],
            "image": image,
            "boxes": boxes,
        }


@DATASETS.register("SingleVCRDataset")
class SingleVCRDataset(VCRDataset):
    """Single-region Q->A(->why) variant (vcr.py:215-318)."""

    def _judge_format(self, ann):
        q, a, why = ann["question_orig"], ann["answer_orig"], ann["rationale_orig"]
        q_digits = re.findall(r"\d+", q)
        a_digits = re.findall(r"\d+", a)
        why_digits = re.findall(r"\d+", why)
        format_id = -1
        if set(a_digits).issubset(q_digits):
            format_id = 0
        if set(a_digits).union(why_digits).issubset(set(q_digits)):
            format_id = 1
        single_region = len(q_digits) <= 1
        return format_id, single_region, q_digits, a_digits, why_digits

    def load_entries(self) -> List[Dict[str, Any]]:
        entries = []
        for ann in self._read_jsonl():
            class_names = ann["objects"]
            boxes = self._boxes_for(ann)
            format_id, single_region, q_digits, a_digits, why_digits = self._judge_format(ann)
            if format_id < 0 or len(a_digits) == 0 or not single_region:
                continue
            q_idx = np.asarray(q_digits, np.int64) - 1
            if (q_idx < 0).any() or (q_idx > len(boxes) - 1).any():
                continue
            sel_boxes = boxes[q_idx]
            q = re.sub(r"\d+", "region1 <bbox>", ann["question_orig"])
            if q.count("<bbox>") != len(sel_boxes):
                continue
            qi = int(q_idx[0]) if len(q_idx) else 0
            a = ann["answer_orig"].replace(
                str(a_digits[0]), f"{class_names[qi]} at region1"
            )
            qas = [{"from": "human", "value": q}, {"from": "gpt", "value": a}]
            if format_id == 1:
                why = ann["rationale_orig"]
                if why_digits:
                    wi = int(np.asarray(why_digits, np.int64)[0]) - 1
                    why = why.replace(str(why_digits[0]), f"{class_names[wi]} at region1")
                qas.append({"from": "human", "value": str(self.rng.choice(WHY_QUESTIONS))})
                qas.append({"from": "gpt", "value": why})
            entries.append(
                {
                    "img_path": ann["img_fn"],
                    "boxes": sel_boxes[:, :4],
                    "labels": class_names,
                    "qas": qas,
                }
            )
        return entries


@DATASETS.register("MultiVCRDataset")
class MultiVCRDataset(SingleVCRDataset):
    """Multi-region digit-rewrite variant via unique-string two-phase
    substitution (vcr.py:321-425)."""

    def load_entries(self) -> List[Dict[str, Any]]:
        entries = []
        for ann in self._read_jsonl():
            class_names = ann["objects"]
            boxes = self._boxes_for(ann)
            format_id, single_region, q_digits, a_digits, why_digits = self._judge_format(ann)
            if format_id < 0 or len(a_digits) == 0 or single_region:
                continue
            q_idx = np.asarray(q_digits, np.int64) - 1
            if (q_idx < 0).any() or (q_idx > len(boxes) - 1).any():
                continue
            sel_boxes = boxes[q_idx]
            q, a, why = ann["question_orig"], ann["answer_orig"], ann["rationale_orig"]
            # two-phase: digits -> unique placeholders -> region tags, so a
            # digit is never rewritten twice (vcr.py:376-395)
            placeholders = [f"\x00PH{i}\x00" for i in range(len(q_digits))]
            for i, d in enumerate(q_digits):
                pat = r"(\b" + str(int(d)) + r"\b)"
                q = re.sub(pat, placeholders[i], q)
                a = re.sub(pat, placeholders[i], a)
                if format_id == 1:
                    why = re.sub(pat, placeholders[i], why)
            for i, d in enumerate(q_digits):
                di = int(d)
                q = q.replace(placeholders[i], f"region{i + 1} <bbox>")
                a = a.replace(placeholders[i], f"{class_names[di - 1]} at region{i + 1}")
                if format_id == 1:
                    why = why.replace(placeholders[i], f"{class_names[di - 1]} at region{i + 1}")
            if q.count("<bbox>") != len(sel_boxes):
                continue
            qas = [{"from": "human", "value": q}, {"from": "gpt", "value": a}]
            if format_id == 1:
                qas.append({"from": "human", "value": str(self.rng.choice(WHY_QUESTIONS))})
                qas.append({"from": "gpt", "value": why})
            entries.append(
                {
                    "img_path": ann["img_fn"],
                    "boxes": sel_boxes[:, :4],
                    "labels": class_names,
                    "qas": qas,
                }
            )
        return entries
