"""Numpy image/box transforms for the region-dataset pipeline.

Re-implements the live subset of the reference's mmcv/mmdet pipeline
(reference: gpt4roi/datasets/coco_det.py:55-83 — Resize(224,224) without
keep-ratio, RandomShift, FilterAnnotations, RandomFlip(0.5), CLIP-stat
Normalize on 0-255 pixels, Pad) without cv2/mmcv: bilinear resize uses the
same separable matrices as the on-device op (align_corners=False == cv2
semantics).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gpt4roi_tpu.data.constants import CLIP_MEAN, CLIP_STD
from gpt4roi_tpu.ops.interp import resize_matrix


def resize_image(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize (H, W, C) float -> size, align_corners=False."""
    h, w = img.shape[:2]
    oh, ow = size
    if (h, w) == (oh, ow):
        return img.astype(np.float32)
    ry = resize_matrix(h, oh, False)  # (oh, h)
    rx = resize_matrix(w, ow, False)  # (ow, w)
    out = np.einsum("ih,hwc->iwc", ry, img.astype(np.float32))
    return np.einsum("jw,iwc->ijc", rx, out)


def scale_boxes(boxes: np.ndarray, from_hw: Tuple[int, int], to_hw: Tuple[int, int]) -> np.ndarray:
    """Rescale xyxy boxes for a non-keep-ratio resize."""
    sy = to_hw[0] / from_hw[0]
    sx = to_hw[1] / from_hw[1]
    return boxes * np.array([sx, sy, sx, sy], np.float32)


def normalize_clip(img: np.ndarray) -> np.ndarray:
    """CLIP normalisation of a 0-255 RGB image (the datasets use
    mean/std x255 on raw pixels — coco_det.py:55-58)."""
    mean = np.array(CLIP_MEAN, np.float32) * 255.0
    std = np.array(CLIP_STD, np.float32) * 255.0
    return (img.astype(np.float32) - mean) / std


def horizontal_flip(
    img: np.ndarray, boxes: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Flip image + xyxy boxes (mmdet RandomFlip semantics)."""
    w = img.shape[1]
    flipped = img[:, ::-1].copy()
    out = boxes.copy()
    out[:, 0] = w - boxes[:, 2]
    out[:, 2] = w - boxes[:, 0]
    return flipped, out


def random_shift(
    img: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.Generator,
    max_shift_px: int = 32,
) -> Tuple[np.ndarray, np.ndarray]:
    """mmdet RandomShift: translate image (zero pad) and boxes; callers
    filter boxes that left the canvas."""
    h, w = img.shape[:2]
    dx = int(rng.integers(-max_shift_px, max_shift_px + 1))
    dy = int(rng.integers(-max_shift_px, max_shift_px + 1))
    out = np.zeros_like(img)
    src_y = slice(max(0, -dy), min(h, h - dy))
    dst_y = slice(max(0, dy), min(h, h + dy))
    src_x = slice(max(0, -dx), min(w, w - dx))
    dst_x = slice(max(0, dx), min(w, w + dx))
    out[dst_y, dst_x] = img[src_y, src_x]
    nb = boxes + np.array([dx, dy, dx, dy], np.float32)
    nb[:, 0::2] = np.clip(nb[:, 0::2], 0, w)
    nb[:, 1::2] = np.clip(nb[:, 1::2], 0, h)
    return out, nb


def filter_small_boxes(boxes: np.ndarray, min_size: float = 2.0) -> np.ndarray:
    """Keep-mask for boxes with both sides >= min_size (mmdet
    FilterAnnotations; coco_det.py pipeline uses min 2px)."""
    wh = boxes[:, 2:4] - boxes[:, 0:2]
    return (wh[:, 0] >= min_size) & (wh[:, 1] >= min_size)


def clip_boxes(boxes: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    out = boxes.copy()
    out[:, 0::2] = np.clip(out[:, 0::2], 0, hw[1])
    out[:, 1::2] = np.clip(out[:, 1::2], 0, hw[0])
    return out


def load_image(path: str) -> Optional[np.ndarray]:
    """RGB uint8 image via PIL if available (serving/data path)."""
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        return None
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))
