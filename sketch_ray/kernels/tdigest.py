"""t-digest (Dunning & Ertl), merging variant, for quantile estimation.

Not in the reference; required by the north_rule. Implements the "merging
digest": incoming values are buffered, then sorted together with the existing
centroids and greedily re-clustered under the k1 scale function
``k(q) = (delta / 2π) · asin(2q − 1)`` — centroids may absorb neighbors while
the k-size of the merged centroid stays ≤ 1. Quantile queries interpolate
between centroid means.

Merge appends the other digest's centroids (weighted values) to the buffer and
re-merges. Exact bytes depend on merge order; the preserved guarantee is the
quantile accuracy (relative rank error ~ O(1/delta), tightest at the tails),
asserted in tests/test_quantiles.py.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register


@register
class TDigest(SketchBase):
    kind = "tdigest"

    def __init__(self, delta: int = 200, seed: int = 42, buffer_factor: int = 10):
        self.delta = int(delta)
        self.seed = int(seed)
        self.buffer_factor = int(buffer_factor)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self._buf_n = 0
        self.n = 0.0
        self.min = np.inf
        self.max = -np.inf

    def config(self):
        return {"delta": self.delta, "seed": self.seed, "buffer_factor": self.buffer_factor}

    def state(self):
        self._flush()
        return {"means": self.means, "weights": self.weights, "n": self.n,
                "min": self.min, "max": self.max}

    def load_state(self, state):
        self.means = np.asarray(state["means"], dtype=np.float64)
        self.weights = np.asarray(state["weights"], dtype=np.float64)
        self.n = float(state["n"])
        self.min = float(state["min"])
        self.max = float(state["max"])
        self._buf_v, self._buf_w, self._buf_n = [], [], 0

    # -- update ------------------------------------------------------------
    def update(self, values, counts=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        if counts is None:
            w = np.ones(len(v), dtype=np.float64)
        else:
            w = np.asarray(counts, dtype=np.float64)
        ok = ~np.isnan(v) & (w > 0)
        v, w = v[ok], w[ok]
        if len(v) == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._buf_v.append(v)
        self._buf_w.append(w)
        self._buf_n += len(v)
        self.n += float(w.sum())
        if self._buf_n >= self.buffer_factor * self.delta:
            self._flush()

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _flush(self) -> None:
        if self._buf_n == 0:
            return
        v = np.concatenate([self.means] + self._buf_v)
        w = np.concatenate([self.weights] + self._buf_w)
        self._buf_v, self._buf_w, self._buf_n = [], [], 0
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        total = w.sum()
        # vectorized k-space clustering (replaces the per-centroid Python
        # scan): map each point's cumulative-weight midpoint to the scale
        # function, bucket by floor(k) — the MIDPOINTS of a bucket span
        # <= 1 k-unit (its edges can reach ~half a point's k-width past
        # each floor boundary, so a centroid can span up to ~2 k-units:
        # a constant-factor relaxation of the strict t-digest invariant;
        # the tail accuracy bound weakens by that constant only, pinned
        # by test_tdigest_quantile_accuracy); grouping is one cumsum +
        # one segmented add
        q_mid = (np.cumsum(w) - w / 2.0) / total
        kb = np.floor(self._k(q_mid))
        new_g = np.concatenate([[True], kb[1:] != kb[:-1]])
        gid = np.cumsum(new_g) - 1
        ng = int(gid[-1]) + 1
        wsum = np.zeros(ng, dtype=np.float64)
        msum = np.zeros(ng, dtype=np.float64)
        np.add.at(wsum, gid, w)
        np.add.at(msum, gid, v * w)
        self.means = msum / wsum
        self.weights = wsum

    # -- merge -------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        assert self.delta == other.delta, "sketch configs differ"
        other._flush()
        if len(other.means):
            self._buf_v.append(other.means.copy())
            self._buf_w.append(other.weights.copy())
            self._buf_n += len(other.means)
            self.n += float(other.weights.sum())
            self.min = min(self.min, other.min)
            self.max = max(self.max, other.max)
        self._flush()
        return self

    # -- queries -----------------------------------------------------------
    def quantile(self, q) -> np.ndarray | float:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        self._flush()
        if len(self.means) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        if len(self.means) == 1:
            out = np.full(len(qs), self.means[0])
            return float(out[0]) if scalar else out
        w = self.weights
        # centroid centers in cumulative-weight space
        centers = np.cumsum(w) - w / 2.0
        targets = np.clip(qs, 0, 1) * self.n
        out = np.interp(targets, centers, self.means)
        out = np.where(targets <= centers[0],
                       np.interp(targets, [0.0, centers[0]], [self.min, self.means[0]]), out)
        out = np.where(targets >= centers[-1],
                       np.interp(targets, [centers[-1], self.n], [self.means[-1], self.max]), out)
        return float(out[0]) if scalar else out

    def cdf(self, x) -> np.ndarray:
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        self._flush()
        if len(self.means) == 0:
            return np.full(len(xs), np.nan)
        centers = np.cumsum(self.weights) - self.weights / 2.0
        ranks = np.interp(xs, self.means, centers, left=0.0, right=self.n)
        return ranks / max(self.n, 1.0)
