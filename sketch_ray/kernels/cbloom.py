"""Counting Bloom filter — TURNSTILE membership (inserts AND deletes).

The plain Bloom filter (bloom.py) cannot retract: clearing a bit would
corrupt every key sharing it. The counting variant (Fan et al., "Summary
Cache", ToN 2000 — public) replaces each bit with a counter: insert adds
+1 at the k positions, delete adds −1, membership = all k counters ≥ 1.
Guarantees, provided every delete retracts a key that was inserted:

- zero false negatives on the MERGED filter (each surviving insert keeps
  all k of its counters ≥ 1);
- false-positive rate identical to a plain Bloom filter with the same
  (m, k) at the same net load;
- ``estimate_counts`` = min over the k counters — a CM-style upper bound
  on a key's net multiplicity (never undercounts when the net stream is
  non-negative per key).

Merge = elementwise counter sum: associative AND commutative even when a
delete lands in a different partition than its insert — partial counters
may dip negative locally, the merged sum is exact. This is the membership
analogue of the KLL± turnstile quantile kernel (kllpm.py) and reuses its
``delete_eq`` stream contract in stages/sketch_build.py.

k positions come from Kirsch–Mitzenmacher double hashing (hashing.py
``row_hashes``), same as bloom.py.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register
from .hashing import hash_strings, row_hashes


@register
class CountingBloom(SketchBase):
    kind = "cbloom"

    def __init__(self, width: int = 1 << 16, n_hashes: int = 4,
                 seed: int = 42):
        self.width = int(width)
        self.n_hashes = int(n_hashes)
        self.seed = int(seed)
        # int32: net per-cell load at 100 TB is bounded by key multiplicity
        # × k/m collisions — far under 2^31; signed so a partial whose
        # delete precedes its insert (different batch) stays well-defined
        self.counters = np.zeros(self.width, dtype=np.int32)
        self.n_net = 0  # net inserted-minus-deleted rows

    def config(self):
        return {"width": self.width, "n_hashes": self.n_hashes,
                "seed": self.seed}

    def state(self):
        return {"counters": self.counters, "n_net": self.n_net}

    def load_state(self, state):
        self.counters = np.asarray(state["counters"], dtype=np.int32)
        self.n_net = int(state["n_net"])

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(n_hashes, n) counter indices."""
        return (row_hashes(np.asarray(hashes, dtype=np.uint64),
                           self.n_hashes)
                % np.uint64(self.width)).astype(np.int64)

    def update(self, keys, counts=None) -> None:
        self.update_hashed(hash_strings(keys, self.seed), counts)

    def update_hashed(self, hashes: np.ndarray, counts=None) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(hashes)
        if counts is None:
            c = np.ones(len(hashes), dtype=np.int64)
        else:
            c = np.asarray(counts, dtype=np.int64)
        # pos.ravel() is row-major (k blocks of n) → tile counts per row
        np.add.at(self.counters, pos.ravel(),
                  np.tile(c, self.n_hashes).astype(np.int32))
        self.n_net += int(c.sum())

    def contains(self, keys) -> np.ndarray:
        return self.contains_hashed(hash_strings(keys, self.seed))

    def contains_hashed(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.empty(0, dtype=bool)
        pos = self._positions(hashes)
        return (self.counters[pos] >= 1).all(axis=0)

    def estimate_counts(self, keys) -> np.ndarray:
        """CM-style upper bound on each key's net multiplicity: min over
        the k counters (exact-or-over when the net stream is ≥0 per
        key)."""
        hashes = hash_strings(keys, self.seed)
        if len(hashes) == 0:
            return np.empty(0, dtype=np.int64)
        pos = self._positions(hashes)
        return self.counters[pos].min(axis=0).astype(np.int64)

    def merge(self, other: "CountingBloom") -> "CountingBloom":
        assert self.config() == other.config(), "sketch configs differ"
        self.counters += other.counters
        self.n_net += other.n_net
        return self
