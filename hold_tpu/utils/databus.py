"""Assert-on-overwrite dict: the universal data bus between pipeline stages.

Mirrors the role of the reference's ``common/xdict.py:26`` (search / prefix /
merge / type conversion discipline) but is registered as a JAX pytree so it can
flow through ``jit`` / ``grad`` / ``pjit`` unchanged.  Keys are sorted for a
deterministic flatten order (a requirement for pytree stability under jit).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import jax
import numpy as np


class DataBus(dict):
    """A dict that refuses silent overwrites and supports key-space tooling."""

    def __setitem__(self, key: str, value: Any) -> None:
        if key in self:
            raise KeyError(
                f"DataBus key '{key}' already exists; use overwrite() to replace"
            )
        super().__setitem__(key, value)

    def overwrite(self, key: str, value: Any) -> None:
        super().__setitem__(key, value)

    def merge(self, other: dict) -> "DataBus":
        for k, v in other.items():
            self[k] = v
        return self

    def update(self, other=None, **kw):  # type: ignore[override]
        if other:
            for k, v in dict(other).items():
                super().__setitem__(k, v)
        for k, v in kw.items():
            super().__setitem__(k, v)

    def search(self, pattern: str) -> "DataBus":
        out = DataBus()
        for k, v in self.items():
            if pattern in k:
                out[k] = v
        return out

    def prefix(self, p: str) -> "DataBus":
        out = DataBus()
        for k, v in self.items():
            out[p + k] = v
        return out

    def postfix(self, p: str) -> "DataBus":
        out = DataBus()
        for k, v in self.items():
            out[k + p] = v
        return out

    def rm_prefix(self, p: str) -> "DataBus":
        out = DataBus()
        for k, v in self.items():
            out[k[len(p):] if k.startswith(p) else k] = v
        return out

    def fuzzy_get(self, key: str) -> Any:
        hits = [k for k in self if key in k]
        if len(hits) != 1:
            raise KeyError(f"fuzzy_get('{key}') matched {hits}")
        return self[hits[0]]

    def map(self, fn: Callable[[Any], Any]) -> "DataBus":
        out = DataBus()
        for k, v in self.items():
            out[k] = fn(v)
        return out

    def to_np(self) -> "DataBus":
        return self.map(lambda v: np.asarray(v) if hasattr(v, "shape") else v)

    def to_16_bits(self) -> "DataBus":
        def conv(v):
            a = np.asarray(v)
            if a.dtype == np.float64 or a.dtype == np.float32:
                return a.astype(np.float16)
            if a.dtype == np.int64:
                return a.astype(np.int16)
            return a

        return self.map(conv)

    def subset(self, keys: Iterable[str]) -> "DataBus":
        out = DataBus()
        for k in keys:
            out[k] = self[k]
        return out


def _flatten(bus: DataBus):
    keys = sorted(bus.keys())
    return [bus[k] for k in keys], tuple(keys)


def _unflatten(keys, values) -> DataBus:
    out = DataBus()
    for k, v in zip(keys, values):
        out[k] = v
    return out


jax.tree_util.register_pytree_node(DataBus, _flatten, _unflatten)
