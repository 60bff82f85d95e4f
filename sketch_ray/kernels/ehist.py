"""Exponential histogram — sliding-window counting (DGIM generalization).

Counts "how many stream elements landed in the trailing window [t-W, t]"
in O(k·log n) space with relative error ≤ 1/(2k), after Datar, Gionis,
Indyk & Motwani, "Maintaining Stream Statistics over Sliding Windows"
(SODA 2002, public) — the arbitrary-bucket-size generalization of their
power-of-two DGIM scheme, which is what makes the summary MERGEABLE over
time-contiguous substreams (Ray Data blocks of a time-sorted dataset).

Structure: buckets in time order, each ``(ts, cnt)`` where ``ts`` is the
newest element the bucket swallowed and ``cnt`` how many it holds; buckets
partition the stream into consecutive runs (only time-ADJACENT buckets
ever merge, so exactly ONE bucket can straddle a window boundary).

Invariant: every bucket satisfies ``cnt_i ≤ S_i/k + 1`` where ``S_i`` is
the total mass in strictly newer buckets. The window estimate counts all
in-window buckets and docks half the oldest (straddling) one; its error is
≤ cnt_straddler/2 ≤ (S/k + 1)/2 ≤ true/(2k) + 1/2 because everything newer
than the straddler lies fully inside the window (requires the stream
sorted by time — the kernel's contract, asserted on update and merge).

Batch update is vectorized: a batch of n new elements pre-buckets into the
tight geometric pattern (k buckets of size 1, k of 2, k of 4, … from the
newest end — each exactly saturating the invariant), then concatenates
onto the running structure and re-compresses newest→oldest. The compress
loop touches O(k·log n) buckets, never elements.

Reference analog: the reference engine has no windowed sketch; this fills
the §2.7 streaming-window surface the way CM/HLL fill §2's counting
surface (same SketchBase merge/serialize protocol, kernels/base.py).
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register


@register
class ExpHistogram(SketchBase):
    kind = "ehist"

    def __init__(self, k: int = 16):
        if k < 1:
            raise ValueError("k >= 1")
        self.k = int(k)
        self.ts = np.empty(0, np.int64)   # bucket newest-element times, ascending
        self.cnt = np.empty(0, np.int64)  # bucket sizes, same order
        self.n_total = 0

    # -- protocol ----------------------------------------------------------
    def config(self):
        return {"k": self.k}

    def state(self):
        return {"ts": self.ts, "cnt": self.cnt, "n_total": self.n_total}

    def load_state(self, state):
        self.ts = np.asarray(state["ts"], np.int64)
        self.cnt = np.asarray(state["cnt"], np.int64)
        self.n_total = int(state["n_total"])

    # -- update ------------------------------------------------------------
    def update(self, keys, counts=None) -> None:
        """Feed element TIMES (int64, non-decreasing, all >= the newest
        time already absorbed). Each element counts once; ``counts`` must
        be None (this is a window-count summary, not a frequency table)."""
        if counts is not None:
            raise ValueError("ExpHistogram counts elements, not weights")
        times = np.asarray(keys, np.int64)
        if len(times) == 0:
            return
        if np.any(np.diff(times) < 0):
            raise ValueError("ExpHistogram.update requires time-sorted input")
        if len(self.ts) and times[0] < self.ts[-1]:
            raise ValueError("ExpHistogram.update: batch precedes absorbed "
                             "stream (time-contiguity contract)")
        bts, bcnt = self._batch_buckets(times)
        self.ts = np.concatenate([self.ts, bts])
        self.cnt = np.concatenate([self.cnt, bcnt])
        self.n_total += len(times)
        self._compress()

    def _batch_buckets(self, times: np.ndarray):
        """Tight geometric bucketing of one sorted batch (vectorized over
        groups, never elements): from the NEWEST end, k buckets of size 1,
        k of size 2, k of 4, …, oldest bucket truncated to the remainder.
        Each full bucket exactly saturates cnt ≤ S_newer/k + 1."""
        n = len(times)
        sizes_newest_first = []
        remaining, size = n, 1
        while remaining > 0:
            take = min(self.k, -(-remaining // size))  # ceil-div caps last
            for _ in range(take):
                s = min(size, remaining)
                sizes_newest_first.append(s)
                remaining -= s
                if remaining == 0:
                    break
            size *= 2
        sizes = np.asarray(sizes_newest_first[::-1], np.int64)  # oldest first
        ends = np.cumsum(sizes)  # element index past each bucket, oldest first
        return times[ends - 1], sizes

    def _compress(self) -> None:
        """Newest→oldest greedy merge of adjacent pairs while the merged
        bucket keeps cnt ≤ S_newer/k + 1. Walks buckets (O(k log n)),
        never elements."""
        m = len(self.cnt)
        if m < 2:
            return
        ts, cnt = self.ts.tolist(), self.cnt.tolist()
        out_ts, out_cnt = [], []  # built newest-first
        suffix = 0  # mass strictly newer than the candidate pair
        i = m - 1
        while i >= 0:
            t, c = ts[i], cnt[i]
            while i > 0 and (c + cnt[i - 1]) * self.k <= suffix + self.k:
                c += cnt[i - 1]  # merged bucket keeps the NEWER ts
                i -= 1
            out_ts.append(t)
            out_cnt.append(c)
            suffix += c
            i -= 1
        self.ts = np.asarray(out_ts[::-1], np.int64)
        self.cnt = np.asarray(out_cnt[::-1], np.int64)

    # -- merge (time-contiguous substreams) ---------------------------------
    def merge(self, other: "ExpHistogram") -> "ExpHistogram":
        """Absorb ``other``, whose ENTIRE stream followed self's (Ray block
        order over a time-sorted dataset). Concatenation preserves global
        time order because only adjacent buckets ever merged in either
        half; one compress restores the size bound."""
        if other.k != self.k:
            raise ValueError("k mismatch")
        if len(self.ts) and len(other.ts) and other.ts[0] < self.ts[-1]:
            raise ValueError("merge requires time-contiguous halves "
                             "(other after self)")
        self.ts = np.concatenate([self.ts, other.ts])
        self.cnt = np.concatenate([self.cnt, other.cnt])
        self.n_total += other.n_total
        self._compress()
        return self

    # -- query ---------------------------------------------------------------
    def estimate(self, t_now: int, window: int) -> int:
        """Estimated count of elements with time in [t_now - window + 1,
        t_now]. Error ≤ true/(2k) + 1/2 (straddler-halving rule)."""
        t_lo = int(t_now) - int(window) + 1
        i = int(np.searchsorted(self.ts, t_lo, side="left"))
        if i >= len(self.ts):
            return 0
        total = int(self.cnt[i:].sum())
        return total - int(self.cnt[i]) // 2

    def max_time(self) -> int | None:
        return int(self.ts[-1]) if len(self.ts) else None


@register
class ExpHistogramSum(SketchBase):
    """Weighted exponential histogram: sliding-window SUM of non-negative
    integer values (Datar et al. §5's bounded-integer extension, with the
    per-atom slack made explicit). Same structure as ExpHistogram, plus a
    per-bucket ``a0`` — the value of the bucket's NEWEST atom — so the
    invariant becomes ``sum_i ≤ S_i/k + a0_i``: a bucket may always hold
    one atom however large, and the window-estimate error is

        |est − true| ≤ true/(2k) + a_max/2

    where a_max is the largest single value near the window boundary.
    Atoms are never split across buckets; only time-adjacent buckets
    merge, so the single-straddler argument carries over unchanged."""

    kind = "ehsum"

    def __init__(self, k: int = 16):
        if k < 1:
            raise ValueError("k >= 1")
        self.k = int(k)
        self.ts = np.empty(0, np.int64)
        self.cnt = np.empty(0, np.int64)   # bucket value mass
        self.a0 = np.empty(0, np.int64)    # newest atom per bucket
        self.n_total = 0                   # atoms
        self.v_total = 0                   # value mass

    def config(self):
        return {"k": self.k}

    def state(self):
        return {"ts": self.ts, "cnt": self.cnt, "a0": self.a0,
                "n_total": self.n_total, "v_total": self.v_total}

    def load_state(self, state):
        self.ts = np.asarray(state["ts"], np.int64)
        self.cnt = np.asarray(state["cnt"], np.int64)
        self.a0 = np.asarray(state["a0"], np.int64)
        self.n_total = int(state["n_total"])
        self.v_total = int(state["v_total"])

    def update(self, keys, counts=None) -> None:
        """keys = element times (sorted, contiguous after the absorbed
        stream); counts = non-negative integer values (required)."""
        times = np.asarray(keys, np.int64)
        if counts is None:
            raise ValueError("ExpHistogramSum needs per-element values")
        vals = np.asarray(counts, np.int64)
        if len(times) == 0:
            return
        if np.any(vals < 0):
            raise ValueError("values must be non-negative")
        if np.any(np.diff(times) < 0):
            raise ValueError("time-sorted input required")
        if len(self.ts) and times[0] < self.ts[-1]:
            raise ValueError("batch precedes absorbed stream")
        bts, bcnt, ba0 = self._batch_buckets(times, vals)
        self.ts = np.concatenate([self.ts, bts])
        self.cnt = np.concatenate([self.cnt, bcnt])
        self.a0 = np.concatenate([self.a0, ba0])
        self.n_total += len(times)
        self.v_total += int(vals.sum())
        self._compress()

    def _batch_buckets(self, times: np.ndarray, vals: np.ndarray):
        """Vectorized: newest-first suffix mass cut at the count-pattern
        thresholds (k buckets of mass 1, k of 2, …). An atom wider than
        its interval just lands in one bucket — exactly the +a0 slack the
        invariant grants. O(k log M) Python, never per-atom."""
        rv = vals[::-1].astype(np.int64)
        rt = times[::-1]
        cums = np.cumsum(rv)
        M = int(cums[-1])
        ths, level, total = [], 1, 0
        while total < M:
            for _ in range(self.k):
                total += level
                ths.append(total)
                if total >= M:
                    break
            level *= 2
        b_idx = np.searchsorted(np.asarray(ths, np.int64), cums,
                                side="left")
        # zero-value atoms at the tail of a group stay with that group
        starts = np.flatnonzero(np.diff(b_idx, prepend=b_idx[0] - 1))
        sums = np.add.reduceat(rv, starts)
        return (rt[starts][::-1].copy(), sums[::-1].copy(),
                rv[starts][::-1].copy())

    def _compress(self) -> None:
        m = len(self.cnt)
        if m < 2:
            return
        ts, cnt, a0 = self.ts.tolist(), self.cnt.tolist(), self.a0.tolist()
        out_ts, out_cnt, out_a0 = [], [], []
        suffix = 0
        i = m - 1
        while i >= 0:
            t, c, a = ts[i], cnt[i], a0[i]
            while i > 0 and (c + cnt[i - 1]) * self.k \
                    <= suffix + self.k * a:
                c += cnt[i - 1]
                i -= 1
            out_ts.append(t)
            out_cnt.append(c)
            out_a0.append(a)
            suffix += c
            i -= 1
        self.ts = np.asarray(out_ts[::-1], np.int64)
        self.cnt = np.asarray(out_cnt[::-1], np.int64)
        self.a0 = np.asarray(out_a0[::-1], np.int64)

    def merge(self, other: "ExpHistogramSum") -> "ExpHistogramSum":
        if other.k != self.k:
            raise ValueError("k mismatch")
        if len(self.ts) and len(other.ts) and other.ts[0] < self.ts[-1]:
            raise ValueError("merge requires time-contiguous halves")
        self.ts = np.concatenate([self.ts, other.ts])
        self.cnt = np.concatenate([self.cnt, other.cnt])
        self.a0 = np.concatenate([self.a0, other.a0])
        self.n_total += other.n_total
        self.v_total += other.v_total
        self._compress()
        return self

    def estimate(self, t_now: int, window: int) -> int:
        t_lo = int(t_now) - int(window) + 1
        i = int(np.searchsorted(self.ts, t_lo, side="left"))
        if i >= len(self.ts):
            return 0
        total = int(self.cnt[i:].sum())
        return total - int(self.cnt[i]) // 2
