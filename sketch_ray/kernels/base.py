"""Mergeable-sketch protocol shared by every kernel.

Every sketch is a small, bounded-size summary with an associative,
commutative ``merge`` — the property that lets Ray Data build per-partition
partials in an actor pool and tree-reduce them (SURVEY.md §7.0). The linear
sketches (CountMin, CountMinCU partials, HLL, Bloom) merge to *byte-identical*
state regardless of partition order; the order-sensitive summaries (KLL,
t-digest) merge within their published rank/quantile error bounds instead.

Reference analog: the per-length ``int32[N_HASH][2^HASH_BITS]`` sketch array of
HansLehnert/sketch (reference src/Sketch.hpp:5-25) — but held per *partition*
and merged, never shared mutable state (contrast reference src/sketch.cu:145-149
atomics).
"""

from __future__ import annotations

import pickle
import zlib
from typing import Any, Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class MergeableSketch(Protocol):
    """init/update/merge/serialize protocol (SURVEY.md §2.8 plugin point)."""

    kind: str

    def update(self, keys, counts=None) -> None: ...
    def merge(self, other: "MergeableSketch") -> "MergeableSketch": ...
    def to_bytes(self) -> bytes: ...


class SketchBase:
    kind: str = "base"

    # -- config / state ----------------------------------------------------
    def config(self) -> dict[str, Any]:
        raise NotImplementedError

    def state(self) -> dict[str, Any]:
        """All mutable state as a dict of primitives / ndarrays."""
        raise NotImplementedError

    def load_state(self, state: dict[str, Any]) -> None:
        raise NotImplementedError

    # -- serialization (deterministic: fixed pickle protocol over a plain
    # dict of primitives and C-contiguous ndarrays) ------------------------
    def to_bytes(self) -> bytes:
        payload = {
            "kind": self.kind,
            "config": self.config(),
            "state": {
                k: (np.ascontiguousarray(v) if isinstance(v, np.ndarray) else v)
                for k, v in self.state().items()
            },
        }
        # zlib level 1: partial-sketch rows are the merge-shuffle payload
        # and real partials compress 4-85x (sparse counter tables); the
        # b"Z1" frame keeps decoding self-describing and deterministic
        return b"Z1" + zlib.compress(pickle.dumps(payload, protocol=4), 1)

    @classmethod
    def from_bytes(cls, raw: bytes) -> "SketchBase":
        payload = pickle.loads(_unframe(raw))
        obj = cls(**payload["config"])
        obj.load_state(payload["state"])
        return obj

    def copy(self):
        return type(self).from_bytes(self.to_bytes())

    def __eq__(self, other) -> bool:
        if type(self) is not type(other):
            return NotImplemented
        if self.config() != other.config():
            return False
        a, b = self.state(), other.state()
        if a.keys() != b.keys():
            return False
        for k in a:
            va, vb = a[k], b[k]
            if isinstance(va, np.ndarray):
                if not (isinstance(vb, np.ndarray) and va.shape == vb.shape and (va == vb).all()):
                    return False
            elif va != vb:
                return False
        return True


_REGISTRY: dict[str, type] = {}


def register(cls):
    _REGISTRY[cls.kind] = cls
    return cls


def _unframe(raw: bytes) -> bytes:
    return zlib.decompress(raw[2:]) if raw[:2] == b"Z1" else raw


def sketch_from_bytes(raw: bytes) -> SketchBase:
    """Deserialize any registered sketch kind."""
    payload = pickle.loads(_unframe(raw))
    cls = _REGISTRY[payload["kind"]]
    obj = cls(**payload["config"])
    obj.load_state(payload["state"])
    return obj


def make_sketch(kind: str, **config) -> SketchBase:
    return _REGISTRY[kind](**config)


def registry() -> dict[str, type]:
    return dict(_REGISTRY)
