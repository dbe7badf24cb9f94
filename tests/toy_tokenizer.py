"""A minimal HF-interface word-level tokenizer for data-path tests."""

from __future__ import annotations

import re
from typing import Dict, List


class ToyTokenizer:
    """``add_bos=False`` (default) gives exact piece lengths so the
    reference's per-piece length bookkeeping aligns perfectly; the real
    LLaMA tokenizer's BOS-per-piece overhead approximately cancels against
    sentencepiece prefix-space behaviour, which a word tokenizer can't
    emulate."""

    def __init__(self, model_max_length: int = 512, add_bos: bool = False):
        self.model_max_length = model_max_length
        self.add_bos = add_bos
        self.pad_token_id = 0
        self.bos_token_id = 1
        self.vocab: Dict[str, int] = {"<pad>": 0, "<s>": 1}

    def _piece_ids(self, text: str) -> List[int]:
        # split on whitespace but keep special <...> tokens intact
        pieces = re.findall(r"<[^<>\s]+>|[^\s<>]+|\n", text)
        out = []
        for p in pieces:
            if p not in self.vocab:
                self.vocab[p] = len(self.vocab)
            out.append(self.vocab[p])
        return out

    def __call__(self, text, max_length=None, truncation=False, **kw):
        ids = ([self.bos_token_id] if self.add_bos else []) + self._piece_ids(text)
        if truncation and max_length:
            ids = ids[:max_length]
        return {"input_ids": ids}

    def convert_tokens_to_ids(self, tokens):
        if isinstance(tokens, str):
            tokens = [tokens]
        return [self.vocab.setdefault(t, len(self.vocab)) for t in tokens]

    def decode_piece(self, idx: int) -> str:
        rev = {v: k for k, v in self.vocab.items()}
        return rev.get(idx, "<unk>")
