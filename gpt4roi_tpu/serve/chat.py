"""UI-agnostic box-prompted chat session.

Re-implements the ``ConversationBot`` behaviour of the reference Gradio app
(reference: gpt4roi/app.py:62-328) on top of the jitted Engine: multi-round
history with accumulated regions, ``<regionN>`` -> ``regionN <bbox>`` prompt
rewriting (app.py:150-152), region-count validation (app.py:190-238), CLIP
preprocessing (resize 224, no centre crop — app.py:125-136), v0 ``###``
prompting with temperature sampling and '###' stop (app.py:293-300).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from gpt4roi_tpu.data import conversation as conv_lib
from gpt4roi_tpu.data import transforms as T
from gpt4roi_tpu.data.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
)
from gpt4roi_tpu.serve.engine import Engine

REGION_PAT = re.compile(r"<region(\d+)>")


class ChatSession:
    def __init__(
        self,
        engine: Engine,
        tokenizer,
        max_regions: int = 32,
        temperature: float = 0.2,
        max_new_tokens: int = 1024,
        use_prefix_cache: bool = True,
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.cfg = engine.cfg
        self.max_regions = max_regions
        self.temperature = temperature
        self.max_new_tokens = max_new_tokens
        self.use_prefix_cache = use_prefix_cache
        self.reset()

    def reset(self) -> None:
        self.conv = conv_lib.conv_v0.copy()
        self.image: Optional[np.ndarray] = None
        self.boxes: List[List[float]] = []  # normalised accumulated regions
        self.named_regions: set[str] = set()
        self.first_turn = True
        self._cached = self.engine.cached_session() if self.use_prefix_cache else None
        self._last_boxes_key: Optional[tuple] = None

    def set_image(self, rgb: np.ndarray) -> None:
        """rgb: (H, W, 3) uint8."""
        img = T.resize_image(rgb.astype(np.float32), (self.cfg.clip.image_size,) * 2)
        self.image = T.normalize_clip(img)

    def add_boxes(self, boxes_px: Sequence[Sequence[float]], img_hw: Tuple[int, int]) -> None:
        """Accumulate user-drawn boxes (pixel coords of the original image)."""
        h, w = img_hw
        for x1, y1, x2, y2 in boxes_px:
            self.boxes.append([x1 / w, y1 / h, x2 / w, y2 / h])

    def check_input(self, text: str, num_new_boxes: int) -> Optional[str]:
        """Validation messages (app.py:190-238). Returns error or None."""
        refs = sorted(set(int(m) for m in REGION_PAT.findall(text)))
        n_have = len(self.boxes)
        for r in refs:
            if r > n_have:
                return (
                    f"You referred to <region{r}> but only {n_have} region(s) "
                    "have been drawn. Please draw the region first."
                )
        if num_new_boxes == 0 and not refs and not self.boxes and self.first_turn:
            return None  # pure-image chat is allowed
        return None

    def rewrite_prompt(self, text: str) -> str:
        # <regionN> -> 'regionN <bbox>' (app.py:150-152)
        return REGION_PAT.sub(lambda m: f"region{m.group(1)} <bbox>", text)

    def _boxes_for_prompt(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        """The model receives one box per <bbox> occurrence, in order."""
        order = [int(m) - 1 for m in REGION_PAT.findall(text)]
        chosen = [self.boxes[i] for i in order]
        r = self.max_regions
        boxes = np.zeros((1, r, 4), np.float32)
        mask = np.zeros((1, r), bool)
        for i, b in enumerate(chosen[:r]):
            boxes[0, i] = b
            mask[0, i] = True
        return boxes, mask

    def build_prompt(self, user_text: str) -> Tuple[str, np.ndarray, np.ndarray]:
        assert self.image is not None, "set_image first"
        rewritten = self.rewrite_prompt(user_text)
        if self.first_turn:
            n_img = self.cfg.num_image_tokens
            img_tokens = (
                DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_PATCH_TOKEN * n_img + DEFAULT_IM_END_TOKEN
            )
            rewritten = img_tokens + "\n" + rewritten
            self.first_turn = False
        self.conv.append_message(self.conv.roles[0], rewritten)
        self.conv.append_message(self.conv.roles[1], None)
        prompt = self.conv.get_prompt()
        boxes, mask = self._boxes_for_prompt(prompt)
        return prompt, boxes, mask

    def ask(self, user_text: str, seed: int = 0) -> str:
        prompt, boxes, mask = self.build_prompt(user_text)
        ids = np.asarray(
            self.tokenizer(prompt, truncation=True, max_length=self.engine.ecfg.max_seq_len)[
                "input_ids"
            ],
            np.int32,
        )[None]
        stop_ids = self.tokenizer.convert_tokens_to_ids(["###"]) if hasattr(self.tokenizer, "convert_tokens_to_ids") else []

        def stop_fn(toks: List[int]) -> bool:
            text = self.decode(toks)
            return "###" in text

        if self._cached is not None:
            out0 = self._ask_cached(ids[0], boxes, mask, stop_ids, stop_fn, seed)
        else:
            out0 = self.engine.generate(
                ids,
                self.image[None],
                boxes,
                mask,
                max_new_tokens=self.max_new_tokens,
                temperature=self.temperature,
                stop_token_ids=tuple(t for t in stop_ids if t is not None),
                stop_fn=stop_fn,
                seed=seed,
            )[0]
        text = self.decode(out0).split("###")[0].strip()
        self.conv.messages[-1][1] = text
        return text

    def ask_stream(self, user_text: str, seed: int = 0):
        """Streaming ask: yields the accumulated reply text after every
        decode chunk (true token streaming for the worker fleet; the
        non-streaming ask() remains exact)."""
        prompt, boxes, mask = self.build_prompt(user_text)
        ids = np.asarray(
            self.tokenizer(prompt, truncation=True, max_length=self.engine.ecfg.max_seq_len)[
                "input_ids"
            ],
            np.int32,
        )

        emitted: List[str] = [""]

        def stop_fn(toks: List[int]) -> bool:
            return "###" in self.decode(toks)

        if self._cached is None:
            # no prefix cache: fall back to one-shot generation
            out = self.engine.generate(
                ids[None], self.image[None], boxes, mask,
                max_new_tokens=self.max_new_tokens, temperature=self.temperature,
                stop_fn=stop_fn, seed=seed,
            )[0]
            text = self.decode(out).split("###")[0].strip()
            self.conv.messages[-1][1] = text
            yield text
            return

        sess = self._cached
        boxes_key = (boxes.tobytes(), mask.tobytes())
        if sess.image_feats is None or boxes_key != self._last_boxes_key:
            sess.set_vision(self.image[None], boxes, mask)
            self._last_boxes_key = boxes_key
        common = 0
        limit = min(sess.pos, len(ids))
        while common < limit and sess.ids[0, common] == ids[common]:
            common += 1
        sess.pos = common
        sess.cached_upto = min(sess.cached_upto, common)

        collected: List[int] = []
        for chunk in sess.append_and_generate_stream(
            [int(t) for t in ids[common:]],
            max_new_tokens=self.max_new_tokens,
            temperature=self.temperature,
            stop_fn=stop_fn,
            seed=seed,
        ):
            collected.extend(chunk)
            emitted[0] = self.decode(collected).split("###")[0].strip()
            yield emitted[0]
        self.conv.messages[-1][1] = emitted[0]

    def _ask_cached(self, ids, boxes, mask, stop_ids, stop_fn, seed) -> List[int]:
        """Multi-round generation over the persistent KV/vision cache: the
        image is encoded once, region features re-encoded only when the box
        set changes, and only newly appended tokens are prefilled."""
        sess = self._cached
        boxes_key = (boxes.tobytes(), mask.tobytes())
        if sess.image_feats is None or boxes_key != self._last_boxes_key:
            sess.set_vision(self.image[None], boxes, mask)
            self._last_boxes_key = boxes_key
        # resync: tokenisation must be append-only; roll the session back to
        # the longest common prefix if a boundary re-tokenised
        common = 0
        limit = min(sess.pos, len(ids))
        while common < limit and sess.ids[0, common] == ids[common]:
            common += 1
        sess.pos = common
        sess.cached_upto = min(sess.cached_upto, common)
        new_ids = [int(t) for t in ids[common:]]
        return sess.append_and_generate(
            new_ids,
            max_new_tokens=self.max_new_tokens,
            temperature=self.temperature,
            stop_token_ids=tuple(t for t in stop_ids if t is not None),
            stop_fn=stop_fn,
            seed=seed,
        )

    def decode(self, token_ids: List[int]) -> str:
        if hasattr(self.tokenizer, "decode"):
            return self.tokenizer.decode(token_ids, skip_special_tokens=False)
        return " ".join(self.tokenizer.decode_piece(t) for t in token_ids)


def visualize_regions(rgb: np.ndarray, boxes_px: Sequence[Sequence[float]]) -> np.ndarray:
    """Draw indexed region boxes on an image (app.py:330-363), PIL-based."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(rgb.astype(np.uint8))
    draw = ImageDraw.Draw(im)
    colors = [(255, 64, 64), (64, 160, 255), (64, 220, 120), (255, 180, 40), (200, 100, 255)]
    for i, (x1, y1, x2, y2) in enumerate(boxes_px):
        c = colors[i % len(colors)]
        draw.rectangle([x1, y1, x2, y2], outline=c, width=3)
        draw.text((x1 + 3, max(y1 - 12, 0)), f"region{i + 1}", fill=c)
    return np.asarray(im)


def str2spi(input_str: str):
    """Parse ``<bbox>x1 y1 x2 y2</bbox>`` spans from free text into float
    box lists (reference: gpt4roi/models/layers.py:13-21 — defined there
    but never called; kept for API completeness)."""
    import re

    return [
        [float(a), float(b), float(c), float(d)]
        for a, b, c, d in re.findall(
            r"<bbox>\s*(\d+)\s*(\d+)\s*(\d+)\s*(\d+)\s*</bbox>", input_str
        )
    ]
