"""Count-Min sketch: vanilla (CM) and conservative-update (CM-CU).

Semantics match the reference's core algorithm (reference src/sketch.cpp:144-158:
read the d counters at ``h_j(key)``, take the min, increment only the counters
equal to the min; estimate = min + increment), re-expressed as a *batched,
weighted* conservative update over numpy arrays (SURVEY.md §7.0):

- weighted CU: a key contributing count ``c`` in a batch does
  ``counter = max(counter, row_min + c)`` on each of its d counters —
  equivalent to ``c`` consecutive scalar CU increments of that key.
- duplicate keys within one ``update`` call are pre-aggregated first, so the
  update is order-independent within a batch.

Merge is elementwise sum. Sum-merged CU partials are NOT equal to a sequential
CU sketch, but each row of the merged table still upper-bounds the true count
(every partial's row upper-bounds its partition-local count), so point queries
never undercount and stay within the *vanilla-CM* published bound
eps = e/width (error ≤ eps·N with prob ≥ 1 − e^−depth). Merge (sum) is
associative + commutative ⇒ byte-identical merged state for any partition
ordering / tree shape. See SURVEY.md §7.0 for the full argument.

Guarantees tested in tests/test_countmin.py:
- no-undercount: est ≥ true count, always (CM and CM-CU, merged or not);
- CU tightness: est_CU ≤ est_CM pointwise on identical input;
- eps-delta bound vs exact counts;
- merge associativity/commutativity byte-identity.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register
from .hashing import hash_strings, row_hashes


class _CMBase(SketchBase):
    def __init__(self, depth: int = 4, width: int = 16384, seed: int = 42):
        if width & (width - 1):
            raise ValueError("width must be a power of two")
        self.depth = int(depth)
        self.width = int(width)
        self.seed = int(seed)
        self.n_updates = 0  # total weight seen (for eps*N bound checks)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self._mask = np.uint64(self.width - 1)

    def config(self):
        return {"depth": self.depth, "width": self.width, "seed": self.seed}

    def state(self):
        # serialize with the narrowest dtype that holds the max counter:
        # partial-sketch rows are the merge-shuffle payload, and a fresh
        # per-batch partial rarely exceeds uint16 — 4-8x less traffic.
        # Deterministic by value (equal tables -> equal dtype -> equal bytes).
        t = self.table
        m = int(t.max()) if t.size else 0
        for dt in (np.uint8, np.uint16, np.uint32):
            if m <= np.iinfo(dt).max:
                t = t.astype(dt)
                break
        return {"table": t, "n_updates": self.n_updates}

    def load_state(self, state):
        self.table = np.asarray(state["table"], dtype=np.int64).reshape(self.depth, self.width)
        self.n_updates = int(state["n_updates"])

    # -- hashing -----------------------------------------------------------
    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        """uint64[n] key hashes → int64[depth, n] column indices."""
        return (row_hashes(hashes, self.depth) & self._mask).astype(np.int64)

    def _hash_keys(self, keys) -> np.ndarray:
        return hash_strings(keys, self.seed)

    @staticmethod
    def _dedup(hashes: np.ndarray, counts) -> tuple[np.ndarray, np.ndarray]:
        hashes = np.asarray(hashes, dtype=np.uint64)
        if counts is None:
            # unweighted fast path: one sort + run-length counts (unique's
            # return_inverse + add.at costs ~3x more)
            if len(hashes) == 0:
                return hashes, np.zeros(0, dtype=np.int64)
            h_sorted = np.sort(hashes)
            first = np.flatnonzero(np.concatenate([[True], h_sorted[1:] != h_sorted[:-1]]))
            agg = np.diff(np.concatenate([first, [len(h_sorted)]]))
            return h_sorted[first], agg.astype(np.int64)
        counts = np.asarray(counts, dtype=np.int64)
        uniq, inv = np.unique(hashes, return_inverse=True)
        if len(uniq) == len(hashes):
            return hashes, counts
        agg = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(agg, inv, counts)
        return uniq, agg

    # -- queries -----------------------------------------------------------
    def query(self, keys) -> np.ndarray:
        return self.query_hashed(self._hash_keys(keys))

    def query_hashed(self, hashes: np.ndarray) -> np.ndarray:
        idx = self._indices(np.asarray(hashes, dtype=np.uint64))
        gathered = np.take_along_axis(self.table, idx, axis=1)
        return gathered.min(axis=0)

    def update(self, keys, counts=None) -> None:
        self.update_hashed(self._hash_keys(keys), counts)

    def merge(self, other):
        assert self.config() == other.config(), "sketch configs differ"
        self.table += other.table
        self.n_updates += other.n_updates
        return self


@register
class CountMin(_CMBase):
    """Vanilla Count-Min (Cormode & Muthukrishnan 2005): add to all d rows."""

    kind = "cm"

    def update_hashed(self, hashes: np.ndarray, counts=None) -> None:
        hashes, counts = self._dedup(hashes, counts)
        if len(hashes) == 0:
            return
        idx = self._indices(hashes)
        for j in range(self.depth):
            np.add.at(self.table[j], idx[j], counts)
        self.n_updates += int(counts.sum())

    def inner_product(self, other: "CountMin") -> int:
        """Inner-product / equi-join-size estimate (Cormode & Muthukrishnan
        2005 §4.2): ``est = min_j <row_j_A, row_j_B>``. Never undercounts
        the true Σ_k a(k)·b(k) — each row's dot is the true inner product
        plus nonnegative collision cross-terms — and overcounts by
        ≤ ε·N_A·N_B (ε = e/width) with probability ≥ 1 − e^−depth.
        Requires identical (depth, width, seed) so both sketches share the
        hash family.

        Lives on vanilla CM only: CM rows are exact per-cell key-sums,
        which the bound's proof needs; conservative-update cells may hold
        LESS than their cell's key-sum, breaking the no-undercount side."""
        if self.config() != other.config():
            raise ValueError("inner_product needs identical sketch configs")
        # int64 dot: safe while per-cell counts stay < ~2^31 (row sums of
        # squares then fit int64 at any realistic width)
        dots = (self.table * other.table).sum(axis=1)
        return int(dots.min())


@register
class CountMinCU(_CMBase):
    """Count-Min with conservative update (Estan & Varghese 2002).

    Reference: src/sketch.cpp:144-158 (scalar), src/sketch_avx_pipelined.cpp:150-183
    (gather/shuffle-min vector form) — here as one vectorized batched update.
    """

    kind = "cmcu"

    def update_hashed(self, hashes: np.ndarray, counts=None) -> np.ndarray:
        """Weighted conservative update; returns the new estimates (min+count),
        the analog of the reference's ``min_hits + 1`` (src/sketch.cpp:161)."""
        hashes, counts = self._dedup(hashes, counts)
        if len(hashes) == 0:
            return np.empty(0, dtype=np.int64)
        idx = self._indices(hashes)
        gathered = np.take_along_axis(self.table, idx, axis=1)
        est = gathered.min(axis=0)
        target = est + counts
        for j in range(self.depth):
            np.maximum.at(self.table[j], idx[j], target)
        self.n_updates += int(counts.sum())
        return target
