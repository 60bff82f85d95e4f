"""Misra–Gries heavy-hitter summary (a.k.a. frequent items / SpaceSaving kin).

Not present in the reference (its heavy hitters are threshold-selected from a
CM-CU sketch, src/sketch.cpp:160-162); added because a k-counter summary is
the standard mergeable *top-k* sketch of a web-corpus pipeline and it
composes with the CM-CU path (candidates from either can be exact-verified
by the same two-pass pipeline).

Guarantees (Misra–Gries 1982; merge per Agarwal et al. 2013, "Mergeable
Summaries"):
- ``lower(key) >= true(key) − err`` with ``err <= N / (k+1)``
  (stored count never exceeds the true count ⇒ ``count(key)`` is a LOWER
  bound; the summary's global ``err`` bounds the undercount);
- any key with true count > N/(k+1) is guaranteed present;
- merge: combine counters, keep top k, subtract the (k+1)-st count —
  the merged summary obeys the same bound for the combined stream
  (associative in bound; the counter *values* are order-dependent, so tests
  pin bound-correctness, not byte-identity — unlike the sum/max sketches).

Keys are stored as their raw strings (bounded: at most k of them).
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register


@register
class MisraGries(SketchBase):
    kind = "mg"

    def __init__(self, k: int = 256, seed: int = 42):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)  # unused (exact keys) — kept for protocol parity
        self.counters: dict[str, int] = {}
        self.err = 0  # max undercount of any stored/absent key
        self.n_updates = 0

    def config(self):
        return {"k": self.k, "seed": self.seed}

    def state(self):
        keys = sorted(self.counters)
        return {
            "keys": np.array(keys, dtype=object),
            "counts": np.array([self.counters[x] for x in keys], dtype=np.int64),
            "err": self.err,
            "n_updates": self.n_updates,
        }

    def load_state(self, state):
        self.counters = dict(zip([str(x) for x in state["keys"]],
                                 [int(c) for c in state["counts"]]))
        self.err = int(state["err"])
        self.n_updates = int(state["n_updates"])

    # -- update ------------------------------------------------------------
    def update(self, keys, counts=None) -> None:
        """Merge-style batch update: the batch's exact (key, count) pairs are
        themselves a valid error-0 summary, so fold them in and trim to k by
        subtracting the (k+1)-st count — O(n + k log k) per batch instead of
        the textbook per-item eviction's O(n·k); the mergeable-summaries
        theorem keeps err <= N/(k+1) for the whole stream."""
        ks = [str(x) for x in (keys.to_pylist() if hasattr(keys, "to_pylist") else keys)]
        if counts is None:
            cs = np.ones(len(ks), dtype=np.int64)
        else:
            cs = np.asarray(counts, dtype=np.int64)
        self.n_updates += int(cs.sum())
        c = self.counters
        for key, w in zip(ks, cs.tolist()):
            c[key] = c.get(key, 0) + w
        self._trim()

    def _trim(self) -> None:
        c = self.counters
        if len(c) > self.k:
            vals = sorted(c.values(), reverse=True)
            cut = vals[self.k]  # (k+1)-st largest
            self.err += cut
            self.counters = {key: v - cut for key, v in c.items() if v > cut}

    # -- merge -------------------------------------------------------------
    def merge(self, other: "MisraGries") -> "MisraGries":
        assert self.config() == other.config(), "sketch configs differ"
        c = self.counters
        for key, w in other.counters.items():
            c[key] = c.get(key, 0) + w
        self.err += other.err
        self.n_updates += other.n_updates
        self._trim()
        return self

    # -- queries -----------------------------------------------------------
    def query(self, keys) -> np.ndarray:
        """Lower-bound counts (0 for absent keys); true ≤ lower + err."""
        ks = keys.to_pylist() if hasattr(keys, "to_pylist") else keys
        return np.array([self.counters.get(str(x), 0) for x in ks], dtype=np.int64)

    def top(self, n: int | None = None) -> list[tuple[str, int]]:
        """(key, lower_bound) sorted by bound desc, key asc (deterministic)."""
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))
        return items[: (n or self.k)]
