"""Draw-a-box sketch layer: mask -> box extraction + round accumulation.

Headless core of the box-drawing demo UX (reference: gpt4roi/app.py:365-388
``ImageSketcher`` — a gradio Image with tool='boxes' — and the round
bookkeeping in ConversationBot.check_input/visualize, app.py:191-240,330-363).
The reference's gradio fork hands back explicit box lists; modern gradio
ImageEditor hands back sketch LAYERS (one RGBA stroke layer per drawn
shape) or a single composite mask. Both are supported here, pure-numpy, so
the logic is unit-testable without gradio:

  * ``layer_to_box`` / ``layers_to_boxes`` — per-layer stroke extents, in
    draw order;
  * ``mask_to_boxes`` — connected components of a composite mask (run-based
    union-find), one box per drawn blob, top-left reading order;
  * ``SketchRounds`` — multi-round accumulation: gradio reports ALL boxes
    drawn so far each round; new regions this round are the tail beyond the
    previous count (app.py:204-211), and region indices are global across
    rounds (region1, region2, ... in drawing order).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

Box = Tuple[float, float, float, float]


def _to_mask(layer: np.ndarray, threshold: int = 0) -> np.ndarray:
    """Accept HxW bool/uint8, HxWx3 RGB or HxWx4 RGBA (alpha = stroke)."""
    a = np.asarray(layer)
    if a.ndim == 3:
        if a.shape[2] == 4:
            a = a[..., 3]  # alpha channel carries the stroke
        else:
            a = a.max(axis=2)
    return a > threshold


def layer_to_box(layer: np.ndarray) -> Optional[Box]:
    """Extent of one stroke layer -> (x1, y1, x2, y2) pixel box, or None
    for an empty layer."""
    m = _to_mask(layer)
    ys, xs = np.nonzero(m)
    if ys.size == 0:
        return None
    return (float(xs.min()), float(ys.min()), float(xs.max() + 1), float(ys.max() + 1))


def layers_to_boxes(layers: Sequence[np.ndarray]) -> List[Box]:
    """One box per non-empty layer, preserving draw order."""
    out = []
    for layer in layers:
        b = layer_to_box(layer)
        if b is not None:
            out.append(b)
    return out


def mask_to_boxes(mask: np.ndarray, min_area: int = 16) -> List[Box]:
    """Connected components (8-connectivity) of a composite sketch mask ->
    one box per blob, top-left reading order. Run-based union-find: O(runs)
    instead of per-pixel python, fast enough for UI-sized masks."""
    m = _to_mask(mask)
    h, w = m.shape
    parent: List[int] = []

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # extract [start, end) runs of True per row
    runs_per_row: List[List[Tuple[int, int, int]]] = []  # (start, end, id)
    for y in range(h):
        row = m[y]
        if not row.any():
            runs_per_row.append([])
            continue
        d = np.diff(row.astype(np.int8))
        starts = list(np.nonzero(d == 1)[0] + 1)
        ends = list(np.nonzero(d == -1)[0] + 1)
        if row[0]:
            starts = [0] + starts
        if row[-1]:
            ends = ends + [w]
        runs = []
        for s, e in zip(starts, ends):
            rid = len(parent)
            parent.append(rid)
            runs.append((int(s), int(e), rid))
        runs_per_row.append(runs)

    # union runs that touch between consecutive rows (8-connectivity:
    # overlap OR diagonal adjacency -> expand by 1)
    for y in range(1, h):
        for s, e, rid in runs_per_row[y]:
            for ps, pe, prid in runs_per_row[y - 1]:
                if s < pe + 1 and ps < e + 1:
                    union(rid, prid)

    # accumulate extents per root
    ext = {}
    for y, runs in enumerate(runs_per_row):
        for s, e, rid in runs:
            r = find(rid)
            if r not in ext:
                ext[r] = [s, y, e, y + 1, 0]
            else:
                x1, y1, x2, y2, area = ext[r]
                ext[r] = [min(x1, s), min(y1, y), max(x2, e), max(y2, y + 1), area]
            ext[r][4] += e - s  # area in pixels

    boxes = [
        (float(x1), float(y1), float(x2), float(y2))
        for x1, y1, x2, y2, area in ext.values()
        if area >= min_area
    ]
    # top-left reading order (row-major by y1 then x1)
    boxes.sort(key=lambda b: (b[1], b[0]))
    return boxes


class SketchRounds:
    """Multi-round box bookkeeping (reference check_input, app.py:191-240).

    Each round the UI reports the FULL accumulated box list; ``new_boxes``
    returns only this round's additions and advances the committed count.
    ``validate`` mirrors the reference's <regionN>-vs-drawn-boxes check and
    its re-reference rule: a <regionN> already used in an earlier round is
    a back-reference (needs no new box); a fresh <regionN> must be matched
    by a newly drawn box."""

    def __init__(self) -> None:
        self.committed = 0
        self.seen_regions: set = set()

    def reset(self) -> None:
        self.committed = 0
        self.seen_regions = set()

    def new_boxes(self, all_boxes: Sequence[Box]) -> List[Box]:
        fresh = list(all_boxes[self.committed :])
        return fresh

    def commit(self, all_boxes: Sequence[Box]) -> None:
        self.committed = max(self.committed, len(all_boxes))

    def validate(self, text: str, all_boxes: Sequence[Box]) -> Optional[str]:
        import re

        names = re.findall(r"<region(\d+)>", text)
        # unique fresh names: repeating the same new <regionN> in one
        # message still needs only one drawn box
        fresh_names = list(dict.fromkeys(n for n in names if n not in self.seen_regions))
        n_new = len(self.new_boxes(all_boxes))
        if self.committed == 0 and len(all_boxes) == 0:
            return (
                "Please provide your region of interest by drawing boxes "
                "on your uploaded image."
            )
        if len(fresh_names) != n_new:
            if not names:
                return (
                    f"Your question: {text} doesn't have correct reference "
                    "(in <regionx> format) to your drawing boxes."
                )
            return (
                f"In your question the number of new <regionx> is "
                f"{len(fresh_names)}, which does not match the number of "
                f"newly drawn boxes, {n_new}."
            )
        self.seen_regions.update(names)
        return None
