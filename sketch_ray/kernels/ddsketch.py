"""DDSketch (Masson, Rim & Lee, VLDB 2019): quantile sketch with a
RELATIVE-error guarantee — every returned quantile x̂ satisfies
|x̂ − x_q| ≤ α·|x_q|, via logarithmic bucketing: value x > 0 lands in bucket
⌈log_γ(x)⌉ with γ = (1+α)/(1−α), and bucket i reports the midpoint
2·γ^i/(γ+1), which is within α of every value in (γ^{i−1}, γ^i].

Not in the reference (no quantiles there — reference src/sketch.cpp is pure
counting); complements KLL/t-digest (kll.py, tdigest.py) on the OTHER error
axis: those bound *rank* error, DDSketch bounds *value* error — the right
tool for long-tailed latency/size columns where p99 of a heavy tail needs
tight relative accuracy.

Unlike KLL and t-digest (merge-order-sensitive bytes, rank-bound preserved),
DDSketch is a LINEAR sketch over bucket space: merge = sparse vector
addition of bucket counts, so merged state is byte-identical under ANY
partition ordering — the same guarantee class as CM/HLL/Bloom, making it
the only quantile kernel eligible for incremental artifacts
(pipelines/continuous.py order-independent-merge contract).

Bounded size: distinct buckets ≤ log_γ(max/min) (~540 for α=0.01 over a
1e1..1e5 range); if a pathological range exceeds ``max_bins``, the
lowest-VALUE buckets collapse pairwise (counts fold into the higher
neighbor), preserving total counts and the α guarantee for every quantile
above the collapsed region — the paper's eviction policy. Collapse is the
one operation that can break merge byte-identity, so ``max_bins`` defaults
high enough that real columns never trigger it (pytest pins both regimes).

Zeros count in a dedicated bucket; negative values mirror into a second
store (bucketed by |x|), so the full real line is supported.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register


@register
class DDSketch(SketchBase):
    kind = "dd"

    def __init__(self, alpha: float = 0.01, max_bins: int = 4096):
        if not (0.0 < float(alpha) < 1.0):
            raise ValueError(f"alpha must be in (0,1), got {alpha}")
        if int(max_bins) < 4:
            raise ValueError(f"max_bins must be >= 4, got {max_bins}")
        self.alpha = float(alpha)
        self.max_bins = int(max_bins)
        self.gamma = (1.0 + self.alpha) / (1.0 - self.alpha)
        self._inv_log_gamma = 1.0 / np.log(self.gamma)
        # sorted sparse stores: bucket index -> count
        self.pos_keys = np.empty(0, np.int64)
        self.pos_cnt = np.empty(0, np.int64)
        self.neg_keys = np.empty(0, np.int64)  # bucket of |x| for x < 0
        self.neg_cnt = np.empty(0, np.int64)
        self.zero_cnt = 0
        self.n = 0

    def config(self):
        return {"alpha": self.alpha, "max_bins": self.max_bins}

    def state(self):
        return {
            "pos_keys": self.pos_keys, "pos_cnt": self.pos_cnt,
            "neg_keys": self.neg_keys, "neg_cnt": self.neg_cnt,
            "zero_cnt": self.zero_cnt, "n": self.n,
        }

    def load_state(self, state):
        self.pos_keys = np.asarray(state["pos_keys"], np.int64)
        self.pos_cnt = np.asarray(state["pos_cnt"], np.int64)
        self.neg_keys = np.asarray(state["neg_keys"], np.int64)
        self.neg_cnt = np.asarray(state["neg_cnt"], np.int64)
        self.zero_cnt = int(state["zero_cnt"])
        self.n = int(state["n"])

    # -- update --------------------------------------------------------------
    def _index(self, mag: np.ndarray) -> np.ndarray:
        return np.ceil(np.log(mag) * self._inv_log_gamma).astype(np.int64)

    @staticmethod
    def _add(keys, cnt, new_keys, new_cnt):
        """Sparse vector addition of two sorted (keys, counts) stores."""
        if len(new_keys) == 0:
            return keys, cnt
        allk = np.concatenate([keys, new_keys])
        allc = np.concatenate([cnt, new_cnt])
        uniq, inv = np.unique(allk, return_inverse=True)
        summed = np.zeros(len(uniq), np.int64)
        np.add.at(summed, inv, allc)
        keep = summed != 0
        return uniq[keep], summed[keep]

    def update(self, values, counts=None) -> None:
        v = np.asarray(values, np.float64)
        if len(v) == 0:
            return
        w = (np.ones(len(v), np.int64) if counts is None
             else np.asarray(counts, np.int64))
        if (w < 0).any():
            raise ValueError("DDSketch supports insertions only (w >= 0)")
        pos, neg, zero = v > 0.0, v < 0.0, v == 0.0
        if pos.any():
            k = self._index(v[pos])
            order = np.argsort(k, kind="stable")
            self.pos_keys, self.pos_cnt = self._add(
                self.pos_keys, self.pos_cnt, k[order], w[pos][order])
        if neg.any():
            k = self._index(-v[neg])
            order = np.argsort(k, kind="stable")
            self.neg_keys, self.neg_cnt = self._add(
                self.neg_keys, self.neg_cnt, k[order], w[neg][order])
        self.zero_cnt += int(w[zero].sum())
        self.n += int(w.sum())
        self._collapse()

    def merge(self, other: "DDSketch") -> "DDSketch":
        assert self.config() == other.config(), "sketch configs differ"
        self.pos_keys, self.pos_cnt = self._add(
            self.pos_keys, self.pos_cnt, other.pos_keys, other.pos_cnt)
        self.neg_keys, self.neg_cnt = self._add(
            self.neg_keys, self.neg_cnt, other.neg_keys, other.neg_cnt)
        self.zero_cnt += other.zero_cnt
        self.n += other.n
        self._collapse()
        return self

    def _collapse(self) -> None:
        """Fold lowest-VALUE buckets pairwise until within ``max_bins``.
        Lowest value overall = most negative = HIGHEST index of the negative
        store; once the negative store is a single bucket, collapse proceeds
        from the positive store's lowest index. Counts are preserved exactly;
        only collapsed buckets lose the α value guarantee (paper §2.3)."""
        while len(self.pos_keys) + len(self.neg_keys) > self.max_bins:
            if len(self.neg_keys) > 1:
                # fold most-negative bucket into its value-wise upper neighbor
                self.neg_cnt[-2] += self.neg_cnt[-1]
                self.neg_keys = self.neg_keys[:-1]
                self.neg_cnt = self.neg_cnt[:-1]
            elif len(self.pos_keys) > 1:
                self.pos_cnt[1] += self.pos_cnt[0]
                self.pos_keys = self.pos_keys[1:]
                self.pos_cnt = self.pos_cnt[1:]
            else:  # max_bins >= 4 makes this unreachable; guard anyway
                break

    # -- query ----------------------------------------------------------------
    def _bucket_value(self, keys: np.ndarray) -> np.ndarray:
        return np.power(self.gamma, keys.astype(np.float64)) * (2.0 / (self.gamma + 1.0))

    def quantile(self, q) -> np.ndarray | float:
        """Value estimate(s) at quantile(s) q ∈ [0,1]: the value of the
        bucket containing the item of rank ⌊q·(n−1)⌋ in the value-sorted
        stream (the paper's rank convention)."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, np.float64))
        if self.n == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        # value-ascending walk: neg store by DESCENDING index, zero, pos store
        neg_vals = -self._bucket_value(self.neg_keys[::-1])
        pos_vals = self._bucket_value(self.pos_keys)
        vals = np.concatenate([neg_vals, [0.0], pos_vals])
        cnts = np.concatenate([self.neg_cnt[::-1], [self.zero_cnt], self.pos_cnt])
        cum = np.cumsum(cnts)
        ranks = np.floor(np.clip(qs, 0.0, 1.0) * (self.n - 1)).astype(np.int64)
        idx = np.searchsorted(cum, ranks, side="right")
        out = vals[np.minimum(idx, len(vals) - 1)]
        return float(out[0]) if scalar else out

    def n_bins(self) -> int:
        return len(self.pos_keys) + len(self.neg_keys) + (self.zero_cnt > 0)
