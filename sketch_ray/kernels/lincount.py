"""Linear counting (Whang, Vander-Zanden & Taylor 1990): cardinality
estimation from a bitmap's empty-cell fraction, n̂ = −m·ln(V), V = empty
bits / m.

Not in the reference (its distinct handling is exact, reference
src/sketch.cpp:92-93); complements HLL at the OTHER end of the accuracy
curve: for cardinalities up to ~m·ln(m) the standard error
≈ √m·(e^t − t − 1)^½ / (t·m), t = n/m, beats HLL's 1.04/√m register
budget at equal memory when n ≪ m — the right tool for per-group
distinct counts with small groups.

Merge = bitwise OR of bitmaps: associative, commutative, idempotent ⇒
byte-identical merged state under any partition ordering (the same
guarantee every kernel in this library pins in pytest). Saturated
bitmaps (V = 0) report m·ln(m) — the documented saturation point —
rather than infinity.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register
from .hashing import hash_strings


@register
class LinearCounter(SketchBase):
    kind = "lincount"

    def __init__(self, n_bits: int = 1 << 16, seed: int = 42):
        if int(n_bits) <= 0:
            raise ValueError(f"n_bits must be positive, got {n_bits}")
        self.n_bits = int(n_bits)
        self.seed = int(seed)
        self.bits = np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)

    def config(self):
        return {"n_bits": self.n_bits, "seed": self.seed}

    def state(self):
        return {"bits": self.bits}

    def load_state(self, state):
        self.bits = np.asarray(state["bits"], dtype=np.uint8)

    def update(self, keys, counts=None) -> None:
        self.update_hashed(hash_strings(keys, self.seed))

    def update_hashed(self, hashes: np.ndarray, counts=None) -> None:
        if len(hashes) == 0:
            return
        pos = (np.asarray(hashes, dtype=np.uint64)
               % np.uint64(self.n_bits)).astype(np.int64)
        np.bitwise_or.at(self.bits, pos >> 3,
                         np.uint8(1) << (pos & 7).astype(np.uint8))

    def merge(self, other: "LinearCounter") -> "LinearCounter":
        assert self.config() == other.config(), "sketch configs differ"
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def n_set(self) -> int:
        return int(np.unpackbits(self.bits).sum())

    def estimate(self) -> float:
        m = float(self.n_bits)
        empty = m - self.n_set()
        if empty <= 0:  # saturated: the estimator's domain boundary
            return m * float(np.log(m))
        return -m * float(np.log(empty / m))
