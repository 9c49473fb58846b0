"""Config container with ``_BASE_`` yaml inheritance.

Behavior-compatible with the reference's yacs-based loader
(captioning/utils/config.py:35-95): a yaml file may name a parent via the
``_BASE_`` key (path relative to the child file, or absolute); parents are
loaded recursively and child keys override base keys.  Unlike yacs we keep a
plain attribute-dict: new keys may be set freely, reads of unknown keys raise
AttributeError (use ``cfg.get(k, default)`` for optional keys).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml

BASE_KEY = "_BASE_"


class Config(dict):
    """Attribute-accessible dict."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)

    def get(self, name: str, default: Any = None) -> Any:  # type: ignore[override]
        return dict.get(self, name, default)

    def clone(self) -> "Config":
        return copy.deepcopy(self)

    def merge_from_dict(self, other: Dict[str, Any]) -> "Config":
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), dict):
                sub = self[k]
                if not isinstance(sub, Config):
                    sub = Config(sub)
                    self[k] = sub
                sub.merge_from_dict(v)
            else:
                self[k] = _wrap(v)
        return self

    def merge_from_list(self, kv_list) -> "Config":
        """Merge ``[key1, val1, key2, val2, ...]`` overrides (--set_cfgs parity)."""
        assert len(kv_list) % 2 == 0, f"override list must have even length: {kv_list}"
        for k, v in zip(kv_list[0::2], kv_list[1::2]):
            node = self
            parts = k.split(".")
            for p in parts[:-1]:
                node = node[p]
            old = node.get(parts[-1])
            node[parts[-1]] = _coerce(v, old)
        return self

    def merge_from_file(self, path: str) -> "Config":
        return self.merge_from_dict(load_yaml_with_base(path))


def _wrap(v: Any) -> Any:
    if isinstance(v, dict) and not isinstance(v, Config):
        return Config({k: _wrap(x) for k, x in v.items()})
    return v


def _coerce(v: Any, like: Any) -> Any:
    """Coerce a string override to the type of the existing value."""
    if not isinstance(v, str) or like is None:
        # try literal parse for stand-alone strings
        if isinstance(v, str):
            try:
                return yaml.safe_load(v)
            except Exception:
                return v
        return v
    if isinstance(like, bool):
        return v.lower() in ("1", "true", "yes", "on")
    if isinstance(like, int):
        try:
            return int(v)
        except ValueError:
            return float(v)
    if isinstance(like, float):
        return float(v)
    return v


def load_yaml_with_base(path: str) -> Dict[str, Any]:
    """Load a yaml file, recursively resolving ``_BASE_`` inheritance."""
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    base_path: Optional[str] = cfg.pop(BASE_KEY, None)
    if base_path is None:
        return cfg
    if not os.path.isabs(base_path):
        candidate = os.path.join(os.path.dirname(path), base_path)
        base_path = candidate if os.path.exists(candidate) else base_path
    base = load_yaml_with_base(base_path)
    merged = _rec_merge(base, cfg)
    return merged


def _rec_merge(base: Dict[str, Any], child: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in child.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _rec_merge(out[k], v)
        else:
            out[k] = v
    return out
