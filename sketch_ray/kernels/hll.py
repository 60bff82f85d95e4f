"""HyperLogLog (dense registers) for distinct counting.

Not present in the reference (its only distinct-like structure is the exact
``unordered_set`` of candidates, reference src/sketch_avx.cpp:82) — required by
the north_rule for distinct-url/host cardinality. Standard Flajolet et al. 2007
HLL with the small-range linear-counting correction; published relative error
≈ 1.04/sqrt(m) for m = 2^p registers.

Merge = elementwise max of registers: associative, commutative, idempotent ⇒
byte-identical merged state for any partition ordering (tested).
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register
from .hashing import clz64, hash_strings


@register
class HLL(SketchBase):
    kind = "hll"

    def __init__(self, p: int = 14, seed: int = 42):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = int(p)
        self.seed = int(seed)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def config(self):
        return {"p": self.p, "seed": self.seed}

    def state(self):
        return {"registers": self.registers}

    def load_state(self, state):
        self.registers = np.asarray(state["registers"], dtype=np.uint8).reshape(self.m)

    def update(self, keys, counts=None) -> None:
        # counts ignored: distinct counting is insensitive to multiplicity
        self.update_hashed(hash_strings(keys, self.seed))

    def update_hashed(self, hashes: np.ndarray, counts=None) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h) == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        rank = np.minimum(clz64(rest) + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HLL") -> "HLL":
        assert self.config() == other.config(), "sketch configs differ"
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # -- estimate ----------------------------------------------------------
    def _alpha(self) -> float:
        m = self.m
        if m == 16:
            return 0.673
        if m == 32:
            return 0.697
        if m == 64:
            return 0.709
        return 0.7213 / (1 + 1.079 / m)

    def estimate(self) -> float:
        m = self.m
        # the harmonic denominator Σ 2^-reg as an EXACT integer rational:
        # num = Σ 2^(maxr − reg) (Python bigints via a rank bincount, ≤ 52
        # terms), denom = num / 2^maxr — one correctly-rounded float64
        # conversion instead of an order-dependent float sum. Exact,
        # register-order-independent, and renderable in SQL value-for-value
        # (the hll_cardinalities oracle recomputes the identical num)
        maxr = 64 - self.p + 1
        cnt = np.bincount(self.registers, minlength=maxr + 1)
        num = sum(int(c) << (maxr - r)
                  for r, c in enumerate(cnt.tolist()) if c)
        e = self._alpha() * m * m / (float(num) / float(1 << maxr))
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * float(np.log(m / zeros))  # linear counting
        if e > (1 << 62):
            return -(1 << 64) * float(np.log1p(-e / (1 << 64)))
        return float(e)

    def rel_error_bound(self) -> float:
        return 1.04 / np.sqrt(self.m)
