"""KLL quantile sketch (Karnin–Lang–Liberty 2016).

Not in the reference (no quantiles there); required by the north_rule for
text-length quantiles. Standard compactor-hierarchy KLL over float64 values:
level ``i`` items carry weight ``2^i``; an over-full level is sorted and every
other item (random even/odd offset) is promoted to level ``i+1``.

Determinism: compaction offsets come from a counter-based RNG seeded by
``(seed, #compactions)`` so a fixed input stream in a fixed partition layout
reproduces byte-identical state. Merge (concatenate levels, then compact) is
order-*sensitive* in its exact bytes — the published guarantee preserved under
any merge tree is the rank-error bound (normalized rank error ~ O(1/k)),
which is what tests/test_quantiles.py asserts.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register

_C = 2.0 / 3.0  # geometric capacity decay from the KLL paper


@register
class KLL(SketchBase):
    kind = "kll"

    def __init__(self, k: int = 200, seed: int = 42):
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.compactions = 0

    def config(self):
        return {"k": self.k, "seed": self.seed}

    def state(self):
        return {
            "n": self.n,
            "compactions": self.compactions,
            "num_levels": len(self.levels),
            **{f"level_{i}": lv for i, lv in enumerate(self.levels)},
        }

    def load_state(self, state):
        self.n = int(state["n"])
        self.compactions = int(state["compactions"])
        self.levels = [
            np.asarray(state[f"level_{i}"], dtype=np.float64)
            for i in range(int(state["num_levels"]))
        ]

    # -- capacities --------------------------------------------------------
    def _capacity(self, level: int) -> int:
        # top level has capacity k; lower levels decay geometrically
        depth = len(self.levels) - 1 - level
        return max(2, int(np.ceil(self.k * (_C**depth))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    # -- update ------------------------------------------------------------
    def update(self, values, counts=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        keep = ~np.isnan(v)
        v = v[keep]
        if counts is not None:
            # mask counts with the SAME NaN filter (lengths must stay aligned)
            c = np.asarray(counts, dtype=np.int64)[keep]
            v = np.repeat(v, c)
        if len(v) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._compress()

    def _compress(self) -> None:
        while self._size() > self._total_capacity():
            for i, lv in enumerate(self.levels):
                if len(lv) > self._capacity(i):
                    self._compact_level(i)
                    break
            else:
                break

    def _compact_level(self, i: int) -> None:
        lv = np.sort(self.levels[i])
        if len(lv) < 2:
            return
        rng = np.random.default_rng([self.seed, self.compactions])
        self.compactions += 1
        offset = int(rng.integers(2))
        if len(lv) % 2 == 1:
            # leave one item behind (standard KLL: compact an even count)
            keep, lv = lv[:1], lv[1:]
        else:
            keep = lv[:0]
        promoted = lv[offset::2]
        self.levels[i] = keep
        if i + 1 >= len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    # -- merge -------------------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        assert self.k == other.k, "sketch configs differ"
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            if len(lv):
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self.compactions = max(self.compactions, other.compactions) + 1
        self._compress()
        return self

    # -- queries -----------------------------------------------------------
    def _items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                vals.append(lv)
                weights.append(np.full(len(lv), 1 << i, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        """Value at normalized rank q in [0, 1] (lower/"disc"-style)."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._items()
        if len(v) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        cum = np.cumsum(w)
        total = cum[-1]
        targets = np.clip(np.ceil(qs * total), 1, total)
        idx = np.searchsorted(cum, targets, side="left")
        out = v[np.minimum(idx, len(v) - 1)]
        return float(out[0]) if scalar else out

    def rank(self, x) -> np.ndarray:
        """Estimated number of items ≤ x."""
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        v, w = self._items()
        if len(v) == 0:
            return np.zeros(len(xs), dtype=np.int64)
        cum = np.concatenate([[0], np.cumsum(w)])
        idx = np.searchsorted(v, xs, side="right")
        return cum[idx]

    def cdf(self, x) -> np.ndarray:
        return self.rank(x) / max(self.n, 1)
