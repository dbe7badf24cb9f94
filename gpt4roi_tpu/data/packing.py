"""Sequence packing for training throughput.

The reference pads every conversation to the batch max (HF Trainer default),
wasting most of the 2048-token budget on padding for short region-QA
samples. Here multiple samples pack into each row with:

  * ``segment_ids`` (1-based per sample, 0 = padding) — attention is
    segment-masked (the Pallas flash kernel and the XLA fallback both
    honour segment ids);
  * ``positions`` restarting at 0 per segment (RoPE correctness);
  * host-precomputed flat bank indices mapping every ``<im_patch>`` /
    ``<bbox>`` position to its (image, patch) / (image, region) feature —
    the device-side splice is then a plain gather + where (no cumsum
    bookkeeping across segment boundaries).

Images are batched separately as (NI, H, W, 3), one per packed sample, with
boxes (NI, R, 4) aligned by image.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence

import numpy as np

from gpt4roi_tpu.data.constants import IGNORE_INDEX


@dataclasses.dataclass(frozen=True)
class PackSpec:
    seq_len: int = 2048
    max_regions: int = 32  # per sample/image
    image_size: int = 224
    pad_token_id: int = 0
    im_patch_token_id: int = -1  # must be set
    bbox_token_id: int = -1
    num_image_tokens: int = 256
    max_images: int = 64  # total images across the packed batch
    rows: int = 0  # fixed row count for static shapes; 0 = as many as packed
    # (bins beyond ``rows`` are dropped — they reappear next epoch under a
    # different shuffle; all-padding rows contribute zero loss)


def first_fit_pack(lengths: Sequence[int], capacity: int) -> List[List[int]]:
    """Greedy first-fit-decreasing bin packing; returns sample-index bins."""
    order = sorted(range(len(lengths)), key=lambda i: -lengths[i])
    bins: List[List[int]] = []
    space: List[int] = []
    for i in order:
        l = min(lengths[i], capacity)
        for b, s in enumerate(space):
            if l <= s:
                bins[b].append(i)
                space[b] -= l
                break
        else:
            bins.append([i])
            space.append(capacity - l)
    return bins


def collate_packed(samples: List[Dict[str, Any]], spec: PackSpec) -> Dict[str, np.ndarray]:
    """Pack samples (same schema as data.collate) into rows.

    Returns input_ids/labels/segment_ids/positions (B, S), images
    (NI, H, W, 3), boxes (NI, R, 4), box_mask (NI, R), and flat bank index
    maps patch_bank_idx / bbox_bank_idx (B, S) into the image-token and
    region-feature banks.
    """
    assert spec.im_patch_token_id >= 0 and spec.bbox_token_id >= 0
    lengths = [len(s["input_ids"]) for s in samples]
    bins = first_fit_pack(lengths, spec.seq_len)
    if spec.rows > 0:
        bins = bins[: spec.rows]
        b = spec.rows
    else:
        b = len(bins)
    ni = len(samples)
    assert ni <= spec.max_images, (ni, spec.max_images)

    input_ids = np.full((b, spec.seq_len), spec.pad_token_id, np.int32)
    labels = np.full((b, spec.seq_len), IGNORE_INDEX, np.int32)
    segment_ids = np.zeros((b, spec.seq_len), np.int32)
    positions = np.zeros((b, spec.seq_len), np.int32)
    patch_bank_idx = np.zeros((b, spec.seq_len), np.int32)
    bbox_bank_idx = np.zeros((b, spec.seq_len), np.int32)
    images = np.zeros((spec.max_images, spec.image_size, spec.image_size, 3), np.float32)
    boxes = np.zeros((spec.max_images, spec.max_regions, 4), np.float32)
    box_mask = np.zeros((spec.max_images, spec.max_regions), bool)
    n_images = 0

    for row, bin_samples in enumerate(bins):
        cursor = 0
        for seg_no, si in enumerate(bin_samples, start=1):
            s = samples[si]
            ids = np.asarray(s["input_ids"], np.int32)
            lab = np.asarray(s["labels"], np.int32)
            n = min(len(ids), spec.seq_len - cursor)
            if n <= 0:
                continue
            sl = slice(cursor, cursor + n)
            input_ids[row, sl] = ids[:n]
            labels[row, sl] = lab[:n]
            segment_ids[row, sl] = seg_no
            positions[row, sl] = np.arange(n)

            img_idx = n_images
            if s.get("image") is not None:
                images[img_idx] = s["image"]
            bx = np.asarray(s.get("boxes", np.zeros((0, 4))), np.float32).reshape(-1, 4)
            bx = bx[: spec.max_regions]
            boxes[img_idx, : len(bx)] = bx
            box_mask[img_idx, : len(bx)] = True
            n_images += 1

            frag = ids[:n]
            patch_pos = np.nonzero(frag == spec.im_patch_token_id)[0]
            patch_bank_idx[row, cursor + patch_pos] = (
                img_idx * spec.num_image_tokens + np.arange(len(patch_pos))
            )
            bbox_pos = np.nonzero(frag == spec.bbox_token_id)[0]
            bbox_bank_idx[row, cursor + bbox_pos] = (
                img_idx * spec.max_regions + np.arange(len(bbox_pos))
            )
            cursor += n

    return {
        "input_ids": input_ids,
        "labels": labels,
        "segment_ids": segment_ids,
        "positions": positions,
        "patch_bank_idx": patch_bank_idx,
        "bbox_bank_idx": bbox_bank_idx,
        "images": images,
        "boxes": boxes,
        "box_mask": box_mask,
        "num_images": np.int32(n_images),
    }
