"""Delta-weight tooling (LLaMA licence workaround).

Re-implements ``scripts/make_delta.py`` / ``scripts/apply_delta.py``
(reference: scripts/apply_delta.py:16-44) over our param trees: delta =
target - base for shared keys, skipping the GPT4RoI-only modules
(``spi``/``mm_projector``), with vocab-size-mismatch rows handled by
subtracting only the overlapping prefix.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

SKIP_TOP_LEVEL = ("spi", "mm_projector")


def _walk(tree: Any, prefix: Tuple[str, ...] = ()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, prefix + (str(k),))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, prefix + (str(i),))
    else:
        yield prefix, tree


def _tree_map_with_base(target: Any, base_lookup, op, prefix=()):
    if isinstance(target, dict):
        return {k: _tree_map_with_base(v, base_lookup, op, prefix + (str(k),)) for k, v in target.items()}
    if isinstance(target, (list, tuple)):
        return [
            _tree_map_with_base(v, base_lookup, op, prefix + (str(i),))
            for i, v in enumerate(target)
        ]
    return op(prefix, target, base_lookup(prefix))


def _combine(prefix, target, base, sign: float):
    if prefix and prefix[0] in SKIP_TOP_LEVEL:
        return np.asarray(target)
    if base is None:
        return np.asarray(target)
    target = np.asarray(target, np.float32)
    base = np.asarray(base, np.float32)
    if target.shape == base.shape:
        return target + sign * base
    # vocab-size mismatch: combine the overlapping leading rows only
    # (apply_delta.py:33-39)
    if target.shape[1:] == base.shape[1:]:
        n = min(target.shape[0], base.shape[0])
        out = target.copy()
        out[:n] = target[:n] + sign * base[:n]
        return out
    raise ValueError(f"shape mismatch at {'/'.join(prefix)}: {target.shape} vs {base.shape}")


def make_delta(base_params: Any, target_params: Any) -> Any:
    """delta = target - base (skipping SPI/projector; they ship as-is)."""
    base_map = dict(_walk(base_params))
    return _tree_map_with_base(
        target_params, lambda p: base_map.get(p), lambda p, t, b: _combine(p, t, b, -1.0)
    )


def apply_delta(base_params: Any, delta_params: Any) -> Any:
    """target = base + delta."""
    base_map = dict(_walk(base_params))
    return _tree_map_with_base(
        delta_params, lambda p: base_map.get(p), lambda p, t, b: _combine(p, t, b, +1.0)
    )
