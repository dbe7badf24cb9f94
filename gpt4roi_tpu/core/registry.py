"""Tiny string->class registry (replaces mmcv.utils.registry for the live
surface: dataset-type dispatch in the multitask data module; reference:
gpt4roi/datasets/data_modules.py:83-188)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str) -> None:
        self.name = name
        self._items: Dict[str, Any] = {}

    def register(self, name: Optional[str] = None) -> Callable[[Any], Any]:
        def deco(obj: Any) -> Any:
            key = name or obj.__name__
            if key in self._items:
                raise KeyError(f"{key} already registered in {self.name}")
            self._items[key] = obj
            return obj

        return deco

    def get(self, name: str) -> Any:
        if name not in self._items:
            raise KeyError(f"{name} not found in registry {self.name}; have {sorted(self._items)}")
        return self._items[name]

    def build(self, cfg: Dict[str, Any], **extra: Any) -> Any:
        cfg = dict(cfg)
        typ = cfg.pop("type")
        return self.get(typ)(**cfg, **extra)

    def __contains__(self, name: str) -> bool:
        return name in self._items

    def keys(self):
        return self._items.keys()


DATASETS = Registry("datasets")
