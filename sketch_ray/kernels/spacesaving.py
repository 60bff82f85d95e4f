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

Keys are stored as their raw strings (bounded: at most k of them), in
parallel sorted arrays; the per-batch fold is a hash aggregation
(pandas groupby on a string index), never a per-key Python dict loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .base import SketchBase, register


@register
class MisraGries(SketchBase):
    kind = "mg"

    def __init__(self, k: int = 256, seed: int = 42):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)  # unused (exact keys) — kept for protocol parity
        self._keys = np.empty(0, dtype=object)   # sorted
        self._counts = np.empty(0, dtype=np.int64)
        self.err = 0  # max undercount of any stored/absent key
        self.n_updates = 0

    def config(self):
        return {"k": self.k, "seed": self.seed}

    def state(self):
        return {
            "keys": self._keys,
            "counts": self._counts,
            "err": self.err,
            "n_updates": self.n_updates,
        }

    def load_state(self, state):
        self._keys = np.array([str(x) for x in state["keys"]], dtype=object)
        self._counts = np.asarray(state["counts"], dtype=np.int64).copy()
        order = np.argsort(self._keys)
        self._keys, self._counts = self._keys[order], self._counts[order]
        self.err = int(state["err"])
        self.n_updates = int(state["n_updates"])

    # -- update ------------------------------------------------------------
    def _fold(self, keys: np.ndarray, counts: np.ndarray) -> None:
        """Vectorized: hash-aggregate (stored ⊎ incoming) and re-trim."""
        s = pd.Series(np.concatenate([self._counts, counts]),
                      index=np.concatenate([self._keys, keys]))
        agg = s.groupby(level=0, sort=True).sum()
        self._keys = agg.index.to_numpy(dtype=object)
        self._counts = agg.to_numpy(dtype=np.int64)
        self._trim()

    def update(self, keys, counts=None) -> None:
        """Merge-style batch update: the batch's exact (key, count) pairs are
        themselves a valid error-0 summary, so fold them in and trim to k by
        subtracting the (k+1)-st count — O(n) hash aggregation per batch
        instead of the textbook per-item eviction's O(n·k); the mergeable-
        summaries theorem keeps err <= N/(k+1) for the whole stream."""
        ks = np.array([str(x) for x in (keys.to_pylist() if hasattr(keys, "to_pylist") else keys)],
                      dtype=object)
        if counts is None:
            cs = np.ones(len(ks), dtype=np.int64)
        else:
            cs = np.asarray(counts, dtype=np.int64)
        self.n_updates += int(cs.sum())
        self._fold(ks, cs)

    def _trim(self) -> None:
        n = len(self._counts)
        if n > self.k:
            cut = int(np.partition(self._counts, n - self.k - 1)[n - self.k - 1])
            self.err += cut
            keep = self._counts > cut
            self._keys = self._keys[keep]
            self._counts = self._counts[keep] - cut

    # -- merge -------------------------------------------------------------
    def merge(self, other: "MisraGries") -> "MisraGries":
        assert self.config() == other.config(), "sketch configs differ"
        self.err += other.err
        self.n_updates += other.n_updates
        self._fold(other._keys, other._counts)
        return self

    # -- queries -----------------------------------------------------------
    def query(self, keys) -> np.ndarray:
        """Lower-bound counts (0 for absent keys); true ≤ lower + err."""
        ks = keys.to_pylist() if hasattr(keys, "to_pylist") else keys
        ks = np.array([str(x) for x in ks], dtype=object)
        if len(self._keys) == 0:
            return np.zeros(len(ks), dtype=np.int64)
        pos = np.searchsorted(self._keys, ks)
        pos = np.minimum(pos, len(self._keys) - 1)
        hit = self._keys[pos] == ks
        return np.where(hit, self._counts[pos], 0).astype(np.int64)

    def top(self, n: int | None = None) -> list[tuple[str, int]]:
        """(key, lower_bound) sorted by bound desc, key asc (deterministic)."""
        order = np.lexsort((self._keys, -self._counts))
        return [(str(self._keys[i]), int(self._counts[i]))
                for i in order[: (n or self.k)]]
