"""Region-conversation dataset base class.

Collapses the reference's CustomDataset/CocoDataset + mmcv pipeline stack
(reference: mmdet/datasets/custom.py:204-259 and the per-dataset pipelines in
gpt4roi/datasets/*.py) into one numpy class:

  load image -> resize 224x224 (no keep-ratio) -> [random shift] ->
  filter tiny boxes -> [random flip] -> CLIP normalise -> conversation
  templating -> preprocess_multimodal + v0 preprocess -> boxes /224.

Subclasses implement ``load_entries`` (annotation parsing) and
``build_conversations`` (QA templating). ``__getitem__`` keeps the
resample-on-empty retry loop (custom.py:217-222, refcoco.py:302-320).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from gpt4roi_tpu.data import transforms as T
from gpt4roi_tpu.data.tokenization import preprocess, preprocess_multimodal


class RegionDataset:
    def __init__(
        self,
        tokenizer,
        ann_file: str,
        img_prefix: str = "",
        image_size: int = 224,
        patch_size: int = 14,
        max_gt_per_img: int = 15,
        flip_ratio: float = 0.0,
        shift_ratio: float = 0.0,
        min_box_size: float = 2.0,
        use_im_start_end: bool = True,
        test_mode: bool = False,
        seed: int = 0,
    ):
        self.tokenizer = tokenizer
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.image_size = image_size
        self.patch_size = patch_size
        self.max_gt_per_img = max_gt_per_img
        self.flip_ratio = 0.0 if test_mode else flip_ratio
        self.shift_ratio = 0.0 if test_mode else shift_ratio
        self.min_box_size = min_box_size
        self.use_im_start_end = use_im_start_end
        self.test_mode = test_mode
        self.rng = np.random.default_rng(seed)
        self.entries: List[Dict[str, Any]] = self.load_entries()

    # -- subclass hooks ----------------------------------------------------
    def load_entries(self) -> List[Dict[str, Any]]:
        """Return a list of dicts with at least ``img_path``, ``boxes``
        (n, 4 xyxy abs) and ``labels`` (list, per box or free-form)."""
        raise NotImplementedError

    def build_conversations(self, labels: Sequence[Any]) -> List[Dict[str, str]]:
        """Return [{'from': 'human'/'gpt', 'value': ...}, ...]; the first
        human turn must contain ``<image>``."""
        raise NotImplementedError

    # ---------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.entries)

    def load_image(self, entry: Dict[str, Any]) -> Optional[np.ndarray]:
        path = entry["img_path"]
        if not os.path.isabs(path):
            path = os.path.join(self.img_prefix, path)
        if not os.path.exists(path):
            return None
        return T.load_image(path)

    def run_pipeline(
        self, img: np.ndarray, boxes: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (normalised image, transformed boxes, keep mask)."""
        s = self.image_size
        from_hw = img.shape[:2]
        img = T.resize_image(img, (s, s))
        boxes = T.scale_boxes(boxes.astype(np.float32), from_hw, (s, s))
        if self.shift_ratio > 0 and self.rng.random() < self.shift_ratio:
            img, boxes = T.random_shift(img, boxes, self.rng)
        keep = T.filter_small_boxes(boxes, self.min_box_size)
        if self.flip_ratio > 0 and self.rng.random() < self.flip_ratio:
            img, boxes = T.horizontal_flip(img, boxes)
        boxes = T.clip_boxes(boxes, (s, s))
        return T.normalize_clip(img), boxes, keep

    def select_regions(
        self, boxes: np.ndarray, labels: List[Any], shuffle: bool = True
    ) -> Tuple[np.ndarray, List[Any]]:
        """Shuffle + cap regions (refcoco.py:253-258)."""
        n = len(labels)
        ids = self.rng.permutation(n) if shuffle and not self.test_mode else np.arange(n)
        ids = ids[: self.max_gt_per_img]
        return boxes[ids], [labels[i] for i in ids]

    def num_image_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def getitem_once(self, idx: int) -> Optional[Dict[str, Any]]:
        entry = self.entries[idx]
        img = self.load_image(entry)
        if img is None:
            return None
        boxes = np.asarray(entry["boxes"], np.float32).reshape(-1, 4)
        labels = list(entry["labels"])
        img, boxes, keep = self.run_pipeline(img, boxes)
        boxes = boxes[keep]
        labels = [l for l, k in zip(labels, keep) if k]
        if len(labels) == 0:
            return None
        boxes, labels = self.select_regions(boxes, labels)
        sources = self.build_conversations(labels)
        sources = preprocess_multimodal(
            [sources], self.num_image_tokens(), self.use_im_start_end
        )
        data = preprocess(sources, self.tokenizer)
        return {
            "input_ids": data["input_ids"][0],
            "labels": data["labels"][0],
            "image": img,
            "boxes": boxes / self.image_size,  # normalised (refcoco.py:295)
        }

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        for _ in range(10):
            out = self.getitem_once(idx)
            if out is not None:
                return out
            idx = int(self.rng.integers(len(self)))
        raise ValueError(f"no valid sample found after retries (dataset {type(self).__name__})")
