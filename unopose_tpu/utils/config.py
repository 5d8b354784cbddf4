"""Minimal attribute-dict config system.

The reference drives everything through a python LazyConfig with nested dicts
(reference: configs/main_cfg.py). We keep the same knob names but use a plain
dict subclass with attribute access so configs stay hashable-free, picklable,
and trivially overridable from the CLI (dotted-path overrides).
"""

from __future__ import annotations

import ast
import copy
from typing import Any, Dict, Iterable


class CN(dict):
    """Config node: a dict with attribute access and recursive wrapping."""

    def __init__(self, d: Dict[str, Any] | None = None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, CN):
            return v
        if isinstance(v, dict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __setattr__(self, k, v):
        self[k] = self._wrap(v)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setitem__(self, k, v):
        super().__setitem__(k, self._wrap(v))

    def clone(self) -> "CN":
        return copy.deepcopy(self)

    def merge(self, other: Dict[str, Any]) -> "CN":
        """Recursive in-place merge of ``other`` into self."""
        for k, v in other.items():
            if k in self and isinstance(self[k], CN) and isinstance(v, dict):
                self[k].merge(v)
            else:
                self[k] = v
        return self

    def apply_overrides(self, overrides: Iterable[str]) -> "CN":
        """Apply dotted-path CLI overrides like ``train.max_iter=100``.

        Values are parsed with ``ast.literal_eval`` when possible, else kept
        as strings (mirrors detectron2 LazyConfig.apply_overrides behavior,
        reference: core/unopose/main_unopose.py:49).
        """
        for ov in overrides:
            key, _, raw = ov.partition("=")
            try:
                val = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                val = raw
            node = self
            parts = key.strip().split(".")
            for p in parts[:-1]:
                if p not in node or not isinstance(node[p], CN):
                    node[p] = CN()
                node = node[p]
            node[parts[-1]] = val
        return self

    def flatten(self, prefix: str = "") -> Dict[str, Any]:
        out = {}
        for k, v in self.items():
            kk = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, CN):
                out.update(v.flatten(kk))
            else:
                out[kk] = v
        return out
