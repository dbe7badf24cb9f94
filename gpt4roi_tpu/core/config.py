"""Minimal config system.

The reference drives its dataset mix through executable-python config files
loaded by ``mmcv.utils.config.Config.fromfile`` (reference:
gpt4roi/datasets/data_modules.py:62-63, mmcv-1.4.7/mmcv/utils/config.py).
We reproduce only the live semantics: execute a python file in an isolated
namespace, collect module-level names into an attribute-accessible dict.
"""

from __future__ import annotations

import importlib.util
import json
import os
from typing import Any, Dict


class Config(dict):
    """A dict with attribute access, recursively wrapping nested dicts."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v: Any) -> Any:
        if isinstance(v, dict) and not isinstance(v, Config):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = self._wrap(value)

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(v: Any) -> Any:
            if isinstance(v, Config):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(unwrap(x) for x in v)
            return v

        return {k: unwrap(v) for k, v in self.items()}


def load_config(path: str) -> Config:
    """Load a config from a .py (executed), .json, or dict-literal file."""
    path = os.fspath(path)
    if path.endswith(".py"):
        spec = importlib.util.spec_from_file_location("_gpt4roi_tpu_cfg", path)
        assert spec is not None and spec.loader is not None, path
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ns = {
            k: v
            for k, v in vars(mod).items()
            if not k.startswith("__") and not callable(v) and not isinstance(v, type(os))
        }
        return Config(ns)
    if path.endswith(".json"):
        with open(path) as f:
            return Config(json.load(f))
    raise ValueError(f"unsupported config file: {path}")
