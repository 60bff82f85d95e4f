"""Priority sampling (Duffield, Lund & Thorup, JACM 2007): a mergeable
fixed-size WEIGHTED sample supporting unbiased subset-sum estimation.

Each item i (a unique id with weight w_i) gets priority ``q_i = w_i / u_i``
with ``u_i ∈ (0, 1]`` derived from the item's seeded hash. The sketch keeps
the k+1 highest-priority items; with ``tau`` = the (k+1)-th priority, the
estimator ``ŵ_i = max(w_i, tau)`` for the top-k items (0 for the rest) is
unbiased for every item, so ``Σ_{i∈S∩sample} max(w_i, tau)`` is an unbiased
estimate of ANY subset sum w(S) — one KB-sized sample answers arbitrary
post-hoc group-by/filter sums over a 10^12-row stream.

Determinism discipline (the engine's stratified_sample rule): u_i is a pure
function of (item key, seed) through SplitMix64, so every run, partitioning
and merge order produces the IDENTICAL sample — merge is union + dedup +
re-trim and the merged state is byte-identical for any partition ordering
(like bottom-k/HLL/Bloom, unlike KLL). The classic algorithm draws u_i
fresh per run; fixing it per key keeps the same per-item marginals (u_i is
still uniform across keys) and makes the sketch reproducible and
artifact-safe.

Exactness: while fewer than k+1 distinct items have been seen, tau = 0 and
every subset sum is EXACT (ŵ_i = w_i).

Reference analog: the candidate map of the heavy-hitter pipeline
(reference src/sketch.cpp:92-93,160-162) keeps the heaviest items by
estimated count; priority sampling keeps a variance-controlled weighted
sample instead — the same "bounded driver state over an unbounded stream"
role, generalized from top-k to arbitrary subset sums.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import SketchBase, register
from .hashing import hash_strings

_TWO64 = float(1 << 64)


@register
class PrioritySample(SketchBase):
    kind = "prisample"

    def __init__(self, k: int = 256, seed: int = 42):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        # aligned arrays, sorted by (priority DESC, hash ASC); at most k+1
        self.hashes = np.empty(0, np.uint64)
        self.weights = np.empty(0, np.int64)
        self.keys: list[str] = []

    def config(self):
        return {"k": self.k, "seed": self.seed}

    def state(self):
        return {"hashes": self.hashes, "weights": self.weights,
                "keys": np.array(self.keys, dtype=object)}

    def load_state(self, state):
        self.hashes = np.asarray(state["hashes"], np.uint64)
        self.weights = np.asarray(state["weights"], np.int64)
        self.keys = [str(x) for x in state["keys"]]

    # -- internals ----------------------------------------------------------
    @staticmethod
    def _priority(w: np.ndarray, h: np.ndarray) -> np.ndarray:
        """q = w / u with u = (h+1)/2^64 ∈ (0, 1] — evaluated in the one
        fixed float64 op order everywhere (update, merge, tau)."""
        u = (h.astype(np.float64) + 1.0) / _TWO64
        return w.astype(np.float64) / u

    def _absorb(self, h: np.ndarray, w: np.ndarray, ks: list[str]) -> None:
        if len(h) == 0:
            return
        all_h = np.concatenate([self.hashes, h])
        all_w = np.concatenate([self.weights, w])
        all_k = self.keys + ks
        # dedup by item hash, KEEP-MAX-WEIGHT: an item's weight is a fixed
        # attribute, so duplicates normally tie — keep-max makes the
        # resolution ORDER-INDEPENDENT even if they don't (keep-first would
        # let merge order pick the survivor and break byte-identity)
        sort0 = np.lexsort((-all_w, all_h))
        uh, start = np.unique(all_h[sort0], return_index=True)
        idx = sort0[start]
        uw = all_w[idx]
        q = self._priority(uw, uh)
        order = np.lexsort((uh, -q))[: self.k + 1]
        self.hashes = uh[order]
        self.weights = uw[order]
        self.keys = [all_k[idx[i]] for i in order]

    # -- updates -------------------------------------------------------------
    def update(self, keys, counts=None) -> None:
        """keys: unique item ids (np int array / pa string array / python
        sequence — hashed VECTORIZED via hash_strings routing; use ONE key
        type consistently across updates, the mode="column" probe rule);
        counts: their int weights (default 1 — uniform sampling).

        Only the batch's ≤ k+1 winners ever materialize as python strings
        — no per-row stringification in the hot path."""
        h = hash_strings(keys, self.seed)
        n = len(h)
        if counts is None:
            w = np.ones(n, np.int64)
        else:
            w = np.asarray(
                counts.to_numpy(zero_copy_only=False)
                if hasattr(counts, "to_numpy") else counts, np.int64)
        if (w < 0).any():
            raise ValueError("priority sampling needs nonnegative weights")
        sort0 = np.lexsort((-w, h))  # keep-max dedup (see _absorb)
        uh, start = np.unique(h[sort0], return_index=True)
        idx = sort0[start]
        uw = w[idx]
        q = self._priority(uw, uh)
        top = np.lexsort((uh, -q))[: self.k + 1]
        sel = idx[top]  # winner positions in the original batch
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if isinstance(keys, pa.Array):
            ks = [str(x) for x in keys.take(pa.array(sel)).to_pylist()]
        elif isinstance(keys, np.ndarray):
            ks = [str(x) for x in keys[sel].tolist()]
        else:
            ks = [str(keys[int(i)]) for i in sel]
        self._absorb(uh[top], uw[top], ks)

    def merge(self, other: "PrioritySample") -> "PrioritySample":
        assert self.config() == other.config(), "sketch configs differ"
        self._absorb(other.hashes, other.weights, other.keys)
        return self

    # -- queries -------------------------------------------------------------
    def tau(self) -> float:
        """The (k+1)-th priority — 0.0 while the sample is still exact."""
        if len(self.hashes) <= self.k:
            return 0.0
        q = self._priority(self.weights, self.hashes)
        return float(q[self.k])

    def sample(self) -> tuple[list[str], np.ndarray, np.ndarray]:
        """(keys, weights, estimated_weights) for the top-k items:
        ŵ_i = max(w_i, tau). Σ ŵ over any key subset is unbiased for that
        subset's true weight sum."""
        t = self.tau()
        n = min(self.k, len(self.hashes))
        w = self.weights[:n]
        return (self.keys[:n], w.copy(),
                np.maximum(w.astype(np.float64), t))

    def estimate(self) -> float:
        """Unbiased estimate of the TOTAL weight of the stream."""
        _, _, est = self.sample()
        return float(est.sum())

    def subset_sum(self, member: np.ndarray) -> float:
        """Unbiased estimate of Σ w over the subset flagged by ``member``
        (bool mask aligned with ``sample()`` rows)."""
        _, _, est = self.sample()
        m = np.asarray(member, bool)
        return float(est[m[: len(est)]].sum())
