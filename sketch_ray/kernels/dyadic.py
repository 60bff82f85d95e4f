"""Dyadic-range Count-Min: range counts and approximate quantiles over a
bounded integer domain (Cormode & Muthukrishnan 2005 §4.2, "range queries
and quantiles").

Structure: ``bits`` stacked Count-Min sketches; level ``l`` counts the key
``value >> l``, so a level-``l`` key ``k`` is the dyadic interval
``[k·2^l, (k+1)·2^l)``. Any query range ``[lo, hi)`` decomposes into at
most ``2·bits`` dyadic nodes (the segment-tree walk), so

- ``range_count(lo, hi)`` = Σ point estimates of the covering nodes —
  NEVER undercounts (every CM point estimate ≥ truth, and the covering
  nodes partition the range exactly), and overcounts by ≤ 2·bits·ε·N
  with probability ≥ 1 − 2·bits·e^−depth (ε = e/width, N = items seen);
- ``quantile(q)`` descends the implicit binary tree top-down, choosing
  left/right by the estimated left-child mass — rank error ≤ bits·ε·N
  with the same confidence (one point query per level).

The reference's core CM/CM-CU update (reference src/sketch.cpp:144-158)
is reused unchanged per level; ``cu=True`` swaps in conservative update
(still never undercounts; tighter point estimates — but as with the
inner-product estimator, sum-merged CU partials stay upper bounds only).

Merge = per-level CM merge (elementwise sum): associative + commutative,
byte-identical state for any partition ordering — the mergeable-UDAF
contract every kernel in this library satisfies.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register
from .countmin import CountMin, CountMinCU
from .hashing import hash_ints


@register
class DyadicCM(SketchBase):
    """Range-count / quantile sketch over ``[0, 2**bits)`` integers."""

    kind = "dyadiccm"

    def __init__(self, bits: int = 20, depth: int = 4, width: int = 2048,
                 seed: int = 42, cu: bool = False):
        if not 1 <= bits <= 62:
            raise ValueError("bits must be in [1, 62]")
        self.bits = int(bits)
        self.depth = int(depth)
        self.width = int(width)
        self.seed = int(seed)
        self.cu = bool(cu)
        cls = CountMinCU if cu else CountMin
        # one independent hash family per level (seed offset); each level's
        # CM carries its own table but shares (depth, width)
        self.levels = [cls(depth=depth, width=width, seed=seed + l)
                       for l in range(self.bits)]
        self.n_updates = 0

    # -- config / state ----------------------------------------------------
    def config(self):
        return {"bits": self.bits, "depth": self.depth, "width": self.width,
                "seed": self.seed, "cu": self.cu}

    def state(self):
        st = {"n_updates": self.n_updates}
        for l, lvl in enumerate(self.levels):
            st[f"t{l}"] = lvl.state()["table"]  # per-level narrowed dtype
        return st

    def load_state(self, state):
        self.n_updates = int(state["n_updates"])
        for l, lvl in enumerate(self.levels):
            # every update touches every level, so per-level n == total n
            lvl.load_state({"table": state[f"t{l}"],
                            "n_updates": self.n_updates})

    # -- updates -----------------------------------------------------------
    def update(self, values, counts=None) -> None:
        v = np.asarray(values)
        if v.dtype.kind == "f":
            # floats FLOOR-bin (histogram semantics) — floor, not the
            # toward-zero astype truncation, so negative fractions land
            # below 0 and are caught by the domain guard instead of
            # silently counting in bucket 0
            v = np.floor(v).astype(np.int64)
        v = v.astype(np.int64, copy=False)
        if len(v) == 0:
            return
        if v.min() < 0 or v.max() >> self.bits:
            raise ValueError(f"values outside [0, 2**{self.bits})")
        if counts is None:
            total = len(v)
        else:
            counts = np.asarray(counts, dtype=np.int64)
            total = int(counts.sum())
        u = v.astype(np.uint64)
        for l, lvl in enumerate(self.levels):
            lvl.update_hashed(hash_ints(u >> np.uint64(l), lvl.seed), counts)
        self.n_updates += total

    def merge(self, other: "DyadicCM") -> "DyadicCM":
        assert self.config() == other.config(), "sketch configs differ"
        for a, b in zip(self.levels, other.levels):
            a.merge(b)
        self.n_updates += other.n_updates
        return self

    # -- queries -----------------------------------------------------------
    def _node(self, level: int, key: int) -> int:
        if level >= self.bits:  # root = whole domain, tracked exactly
            return self.n_updates
        lvl = self.levels[level]
        h = hash_ints(np.array([key], dtype=np.uint64), lvl.seed)
        return int(lvl.query_hashed(h)[0])

    def _decompose(self, lo: int, hi: int) -> list[tuple[int, int]]:
        """[lo, hi) → ≤ 2·bits (level, key) dyadic nodes, exact cover."""
        segs: list[tuple[int, int]] = []
        l = 0
        while lo < hi:
            if lo & 1:
                segs.append((l, lo))
                lo += 1
            if hi & 1:
                hi -= 1
                segs.append((l, hi))
            lo >>= 1
            hi >>= 1
            l += 1
        return segs

    def range_count(self, lo: int, hi: int) -> int:
        """Estimated Σ counts of values in ``[lo, hi)``. Never undercounts;
        over by ≤ 2·bits·(e/width)·N w.p. ≥ 1 − 2·bits·e^−depth."""
        lo = max(int(lo), 0)
        hi = min(int(hi), 1 << self.bits)
        if lo >= hi:
            return 0
        return sum(self._node(l, k) for l, k in self._decompose(lo, hi))

    def rank(self, x: int) -> int:
        """Estimated count of values < ``x`` (prefix count)."""
        return self.range_count(0, x)

    def quantile(self, q: float) -> int:
        """Approximate ``q``-quantile: top-down tree descent, one point
        query per level. Returned value's true rank is within
        ≈ bits·(e/width)·N of ``q·N`` (per-level one-sided errors)."""
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        if self.n_updates == 0:
            return 0
        target = q * self.n_updates
        node = 0  # key at the current level's PARENT scope; start at root
        for l in range(self.bits - 1, -1, -1):
            left = node << 1
            c_left = self._node(l, left)
            if c_left >= target:
                node = left
            else:
                target -= c_left
                node = left + 1
        return node

    def range_error_bound(self) -> float:
        """A-priori additive overcount bound for range_count (w.h.p.)."""
        return 2.0 * self.bits * (np.e / self.width) * self.n_updates
