"""CountSketch (AMS) — signed counters: unbiased point estimates and
second-frequency-moment (F2 / self-join size) estimation.

Charikar, Chen & Farach-Colton 2002 (CountSketch) over the Alon, Matias &
Szegedy 1996 tug-of-war estimator. Complements the one-sided CountMin
family: CM never undercounts but always overcounts under collisions;
CountSketch's sign hash makes collisions cancel in expectation, so

- point estimate = MEDIAN over rows of ``sign_j(k) · C_j[h_j(k)]`` —
  unbiased per row, Var ≤ F2 / width;
- F2 estimate = MEDIAN over rows of ``Σ_cell C_j[cell]²`` — unbiased per
  row (the AMS tug-of-war statistic, one estimator per counter bucket),
  Var ≤ 2·F2² / width, so the median over depth rows is within
  ``ε·F2`` for ε ≈ sqrt(8/width) with constant-exponent probability.

Merge = elementwise sum (the sketch is linear): associative, commutative,
byte-identical under any partition ordering — the same mergeable-UDAF
contract as every kernel here (SURVEY.md §7.0). Turnstile-capable: negative
counts are valid updates (deletions), unlike CM/CM-CU.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register
from .hashing import hash_strings, row_hashes, splitmix64

_U64 = np.uint64


@register
class CountSketch(SketchBase):
    kind = "countsketch"

    def __init__(self, depth: int = 5, width: int = 16384, seed: int = 42):
        if width & (width - 1):
            raise ValueError("width must be a power of two")
        self.depth = int(depth)
        self.width = int(width)
        self.seed = int(seed)
        self.n_updates = 0  # total |weight| seen
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self._mask = _U64(self.width - 1)

    def config(self):
        return {"depth": self.depth, "width": self.width, "seed": self.seed}

    def state(self):
        # same narrowed-dtype discipline as CM partials, but SIGNED
        t = self.table
        m = int(np.abs(t).max()) if t.size else 0
        for dt in (np.int8, np.int16, np.int32):
            if m <= np.iinfo(dt).max:
                t = t.astype(dt)
                break
        return {"table": t, "n_updates": self.n_updates}

    def load_state(self, state):
        self.table = np.asarray(state["table"], dtype=np.int64).reshape(
            self.depth, self.width)
        self.n_updates = int(state["n_updates"])

    def _hash_keys(self, keys) -> np.ndarray:
        return hash_strings(keys, self.seed)

    def _index_sign(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """uint64[n] → (int64[depth, n] bucket indices, int64[depth, n] ±1).
        The sign comes from an INDEPENDENT bit of a re-mixed row hash so
        bucket and sign are pairwise independent."""
        rows = row_hashes(np.asarray(hashes, dtype=np.uint64), self.depth)
        idx = (rows & self._mask).astype(np.int64)
        sign = 1 - 2 * ((splitmix64(rows.reshape(-1)).reshape(rows.shape)
                         >> _U64(63)).astype(np.int64))
        return idx, sign

    def update(self, keys, counts=None) -> None:
        self.update_hashed(self._hash_keys(keys), counts)

    def update_hashed(self, hashes: np.ndarray, counts=None) -> None:
        hashes = np.asarray(hashes, dtype=np.uint64)
        if len(hashes) == 0:
            return
        counts = (np.ones(len(hashes), np.int64) if counts is None
                  else np.asarray(counts, dtype=np.int64))
        idx, sign = self._index_sign(hashes)
        for j in range(self.depth):
            np.add.at(self.table[j], idx[j], sign[j] * counts)
        self.n_updates += int(np.abs(counts).sum())

    def query(self, keys) -> np.ndarray:
        return self.query_hashed(self._hash_keys(keys))

    def query_hashed(self, hashes: np.ndarray) -> np.ndarray:
        """Median-of-rows signed estimate: UNBIASED (can be negative on
        noise; callers wanting counts clamp at 0)."""
        idx, sign = self._index_sign(np.asarray(hashes, dtype=np.uint64))
        gathered = np.take_along_axis(self.table, idx, axis=1) * sign
        return np.median(gathered, axis=0).astype(np.int64)

    def f2(self) -> int:
        """Second frequency moment Σ_k f(k)² (self-join size): median over
        rows of the row's sum of squared counters (AMS)."""
        sq = (self.table.astype(np.float64) ** 2).sum(axis=1)
        return int(np.median(sq))

    def inner_product(self, other: "CountSketch") -> int:
        """Unbiased join-size estimate Σ_k a(k)·b(k): median over rows of
        <row_j_A, row_j_B> (the bilinear AMS form; signs cancel cross
        terms in expectation). Two-sided error, unlike CM's one-sided."""
        if self.config() != other.config():
            raise ValueError("inner_product needs identical sketch configs")
        dots = (self.table.astype(np.float64) * other.table).sum(axis=1)
        return int(np.median(dots))

    def merge(self, other: "CountSketch"):
        assert self.config() == other.config(), "sketch configs differ"
        self.table += other.table
        self.n_updates += other.n_updates
        return self
