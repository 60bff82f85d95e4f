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


def _theta_retained(sk: BottomK) -> tuple[int, np.ndarray]:
    """(integer threshold T, retained hashes strictly below T).

    Theta-sketch convention (matches ``estimate``): a saturated sketch's
    threshold is its k-th minimum hash, and only the k−1 entries BELOW it
    are a uniform sample of the key space; an unsaturated sketch holds
    every distinct key (T = 2^64, i.e. theta = 1). The threshold stays a
    python int — float64 cannot represent 64-bit hashes exactly, and a
    rounded cut would include/exclude boundary entries inconsistently
    between the two sketches."""
    if len(sk.hashes) < sk.k:
        return 1 << 64, sk.hashes
    return int(sk.hashes[-1]), sk.hashes[:-1]


def theta_set_ops(a: BottomK, b: BottomK) -> dict[str, float]:
    """Theta-sketch set-operation estimates from two bottom-k sketches
    built independently over two key streams (Dasgupta et al., "Theta
    sketch framework", 2016): cut both retained sets at the SMALLER
    threshold theta = min(theta_a, theta_b); below theta each side is a
    uniform hash-sample of its distinct keys, so |S| / theta estimates any
    set expression evaluated on the samples. Exact whenever both sketches
    are unsaturated (theta = 1).

    Requires identical seeds (the hash samples must be coordinated —
    that coordination is the whole trick: the two sketches never exchange
    keys, only their KB-sized states meet).

    Returns est_a / est_b (restricted to theta), est_union, est_intersect,
    est_only_a, est_only_b, jaccard, and theta itself.
    """
    if a.seed != b.seed:
        raise ValueError("theta set ops need coordinated sketches (same seed)")
    ta, ha = _theta_retained(a)
    tb, hb = _theta_retained(b)
    t_int = min(ta, tb)
    theta = t_int / float(1 << 64)
    if t_int < (1 << 64):
        cut = np.uint64(t_int)
        sa = ha[ha < cut]
        sb = hb[hb < cut]
    else:
        sa, sb = ha, hb
    inter = np.intersect1d(sa, sb, assume_unique=True)
    n_union = len(sa) + len(sb) - len(inter)
    return {
        "theta": theta,
        "est_a": len(sa) / theta,
        "est_b": len(sb) / theta,
        "est_union": n_union / theta,
        "est_intersect": len(inter) / theta,
        "est_only_a": (len(sa) - len(inter)) / theta,
        "est_only_b": (len(sb) - len(inter)) / theta,
        "jaccard": (len(inter) / n_union) if n_union else 0.0,
    }
