"""Bloom filter (membership), packed-bit numpy implementation.

Not in the reference (its candidate store is an exact hash map, reference
src/sketch.cpp:92-93); required by the north_rule for membership queries.
Classic Bloom 1970 semantics: zero false negatives; false-positive rate
≈ (1 − e^{−k·n/m})^k for n inserted keys, m bits, k hash functions.

k hash functions come from Kirsch–Mitzenmacher double hashing (published:
preserves the asymptotic FP bound). Merge = bitwise OR: associative,
commutative, idempotent ⇒ byte-identical merged state under any ordering.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register
from .hashing import hash_strings, row_hashes


@register
class BloomFilter(SketchBase):
    kind = "bloom"

    def __init__(self, n_bits: int = 1 << 20, n_hashes: int = 7, seed: int = 42):
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.seed = int(seed)
        self.bits = np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)
        self.n_added = 0

    @classmethod
    def for_capacity(cls, n: int, fp_rate: float = 0.01, seed: int = 42) -> "BloomFilter":
        """Size for ``n`` keys at target false-positive rate (standard formulas)."""
        m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2) ** 2)))
        k = max(1, int(round(m / max(n, 1) * np.log(2))))
        return cls(n_bits=m, n_hashes=k, seed=seed)

    def config(self):
        return {"n_bits": self.n_bits, "n_hashes": self.n_hashes, "seed": self.seed}

    def state(self):
        return {"bits": self.bits, "n_added": self.n_added}

    def load_state(self, state):
        self.bits = np.asarray(state["bits"], dtype=np.uint8)
        self.n_added = int(state["n_added"])

    def _positions(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pos = row_hashes(np.asarray(hashes, dtype=np.uint64), self.n_hashes) % np.uint64(self.n_bits)
        pos = pos.astype(np.int64)
        return pos >> 3, (pos & 7).astype(np.uint8)

    def update(self, keys, counts=None) -> None:
        self.update_hashed(hash_strings(keys, self.seed))

    def update_hashed(self, hashes: np.ndarray, counts=None) -> None:
        if len(hashes) == 0:
            return
        byte_idx, bit_idx = self._positions(hashes)
        np.bitwise_or.at(self.bits, byte_idx.ravel(), np.uint8(1) << bit_idx.ravel())
        self.n_added += len(hashes)

    def contains(self, keys) -> np.ndarray:
        return self.contains_hashed(hash_strings(keys, self.seed))

    def contains_hashed(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.empty(0, dtype=bool)
        byte_idx, bit_idx = self._positions(hashes)
        set_ = (self.bits[byte_idx] >> bit_idx) & 1
        return set_.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.config() == other.config(), "sketch configs differ"
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    def fp_rate_estimate(self) -> float:
        """Expected FP rate from the actual bit load."""
        load = np.unpackbits(self.bits).sum() / self.n_bits
        return float(load**self.n_hashes)
