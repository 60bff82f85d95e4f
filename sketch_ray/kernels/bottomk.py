"""Bottom-k (KMV) distinct sample: a mergeable, deterministic uniform sample
over the DISTINCT keys of a stream.

Keep the k keys with the smallest hash values. Union-merge + re-trim is
associative, commutative, and idempotent, so the merged state is
byte-identical for any partition ordering (like HLL/Bloom, unlike KLL) —
and the k-th minimum hash doubles as the KMV distinct-count estimator
(Bar-Yossef et al. 2002): ``D ≈ (k − 1) / h_(k)`` with h mapped to (0, 1).

This is the engine's seeded-sampling primitive: the sample of a 10^12-doc
corpus is computed with one narrow pass + KB-sized merges, no shuffle of
raw keys, and is reproducible across any run/parallelism.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register
from .hashing import hash_strings


@register
class BottomK(SketchBase):
    kind = "bottomk"

    def __init__(self, k: int = 64, seed: int = 42):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        self.hashes = np.empty(0, dtype=np.uint64)   # sorted ascending
        self.keys: list[str] = []                     # aligned with hashes

    def config(self):
        return {"k": self.k, "seed": self.seed}

    def state(self):
        return {"hashes": self.hashes, "keys": np.array(self.keys, dtype=object)}

    def load_state(self, state):
        self.hashes = np.asarray(state["hashes"], dtype=np.uint64)
        self.keys = [str(x) for x in state["keys"]]

    def _absorb(self, h: np.ndarray, ks: list[str]) -> None:
        """Dedup FIRST, then trim: trimming before dedup can evict a distinct
        hash in favor of a duplicate pair (np.unique sorts ascending, which
        is exactly bottom-k order)."""
        if len(h) == 0:
            return
        all_h = np.concatenate([self.hashes, h])
        all_k = self.keys + ks
        uh, idx = np.unique(all_h, return_index=True)
        self.hashes = uh[: self.k]
        self.keys = [all_k[i] for i in idx[: self.k]]

    def update(self, keys, counts=None) -> None:
        ks = [str(x) for x in (keys.to_pylist() if hasattr(keys, "to_pylist") else keys)]
        h = hash_strings(ks, self.seed)
        # pre-dedup within the batch (distinct sample: multiplicity is noise)
        uh, idx = np.unique(h, return_index=True)
        self._absorb(uh, [ks[i] for i in idx])

    def merge(self, other: "BottomK") -> "BottomK":
        assert self.config() == other.config(), "sketch configs differ"
        self._absorb(other.hashes, other.keys)  # union + dedup + trim
        return self

    # -- queries -----------------------------------------------------------
    def sample(self) -> list[str]:
        """The deterministic distinct sample (up to k keys, hash order)."""
        return list(self.keys)

    def estimate(self) -> float:
        """KMV distinct-count estimate; exact when fewer than k distinct."""
        if len(self.hashes) < self.k:
            return float(len(self.hashes))
        hk = float(self.hashes[-1]) / float(1 << 64)
        return (self.k - 1) / hk
