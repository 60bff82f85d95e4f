"""KLL± — quantile sketch over DYNAMIC datasets (inserts AND deletes).

After "KLL±: Approximate Quantile Sketches over Dynamic Datasets"
(VLDB 2021, see PAPERS.md): a bounded-delete workload is summarized by TWO
KLL sketches — one over inserts, one over deletes — and the corrected rank
of x is ``rank_ins(x) − rank_del(x)``. Quantiles are answered by scanning
the union of both sketches' stored items in value order and selecting the
first candidate whose (monotonized) corrected rank reaches the target.

Guarantees (inherited, not re-derived): each side is a standard KLL with
rank error ~O(n_side / k); the corrected rank's error is the SUM of the two
sides' errors, so accuracy degrades gracefully with the delete fraction
(the paper's α) and is exact while both sides are below compaction size.
Deleting a value never inserted is the caller's contract violation (same as
the paper's turnstile restriction).

Merge = per-side KLL merge — associative/commutative within the same
order-sensitive bounds as KLL itself. None of the reference's kernels
support deletion; this extends the registry along the retrieved-paper axis.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register
from .kll import KLL


@register
class KLLPM(SketchBase):
    kind = "kllpm"

    def __init__(self, k: int = 200, seed: int = 42):
        self.k = int(k)
        self.seed = int(seed)
        self.ins = KLL(k, seed)
        self.dels = KLL(k, seed)

    def config(self):
        return {"k": self.k, "seed": self.seed}

    def state(self):
        return {"ins": self.ins.to_bytes(), "dels": self.dels.to_bytes()}

    def load_state(self, state):
        from .base import sketch_from_bytes

        self.ins = sketch_from_bytes(state["ins"])
        self.dels = sketch_from_bytes(state["dels"])

    @property
    def n(self) -> int:
        """Net live-item count (inserts − deletes)."""
        return self.ins.n - self.dels.n

    def update(self, values, counts=None) -> None:
        """Signed update: positive counts insert, negative counts delete
        (default +1 per value)."""
        v = np.asarray(values, dtype=np.float64)
        if counts is None:
            self.ins.update(v)
            return
        c = np.asarray(counts, dtype=np.int64)
        pos = c > 0
        if pos.any():
            self.ins.update(v[pos], c[pos])
        neg = c < 0
        if neg.any():
            self.dels.update(v[neg], -c[neg])

    def delete(self, values, counts=None) -> None:
        self.dels.update(values, counts)

    def merge(self, other: "KLLPM") -> "KLLPM":
        self.ins.merge(other.ins)
        self.dels.merge(other.dels)
        return self

    # -- queries -------------------------------------------------------------
    def rank(self, x) -> np.ndarray:
        """Estimated number of LIVE items <= x (corrected rank; can be
        slightly negative from two-sided estimation error)."""
        return self.ins.rank(x) - self.dels.rank(x)

    def quantile(self, q) -> np.ndarray | float:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        vi, _ = self.ins._items()
        vd, _ = self.dels._items()
        cand = np.unique(np.concatenate([vi, vd])) if len(vi) + len(vd) \
            else np.empty(0)
        total = self.n
        if len(cand) == 0 or total <= 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        # corrected ranks along the sorted candidates; monotonize (cummax)
        # because the two sides' independent errors can locally invert order
        corrected = np.maximum.accumulate(self.rank(cand))
        targets = np.clip(np.ceil(qs * total), 1, total)
        idx = np.searchsorted(corrected, targets, side="left")
        out = cand[np.minimum(idx, len(cand) - 1)]
        return float(out[0]) if scalar else out

    def cdf(self, x) -> np.ndarray:
        return self.rank(x) / max(self.n, 1)
