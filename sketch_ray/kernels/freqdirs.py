"""Frequent Directions — the mergeable MATRIX sketch (Liberty 2013;
Ghashami et al. 2016): a deterministic ℓ×d buffer B whose Gram product
BᵀB approximates the data covariance AᵀA of every embedding row seen,
with the worst-case guarantee

    0 ≼ AᵀA − BᵀB   and   ‖AᵀA − BᵀB‖₂ ≤ ‖A‖F² / (ℓ − k)   for all k < ℓ

(the second bound holds simultaneously for every k; pick ℓ ≈ 2k for a
rank-k spectrum). Merge = stack the two buffers and re-shrink — the
bound is additive under merges, so per-partition partials tree-reduce
exactly like every other kernel here. Unlike the counter sketches the
merged STATE is not byte-identical across partition orders; what is
order-invariant is the guarantee, which is what the tests pin
(kernels/base.py module docstring: the KLL/t-digest precedent).

This is the sketch-native answer to "what is the spectrum / covariance
of 10^12 embedding rows": one streaming pass, an ℓ×d float64 state
(KBs for ℓ=128, d=64), no shuffle of any vector.
"""

from __future__ import annotations

import numpy as np

from .base import SketchBase, register


@register
class FrequentDirections(SketchBase):
    kind = "freqdirs"

    def __init__(self, d: int, ell: int = 128, seed: int = 42):
        if ell < 2:
            raise ValueError("ell must be >= 2")
        self.d = int(d)
        self.ell = int(ell)
        self.seed = int(seed)  # unused (deterministic); kept for protocol parity
        self.rows = np.zeros((0, self.d), np.float64)  # current buffer (≤ 2ℓ rows)
        self.sq_frob = 0.0                             # running ‖A‖F² (exact)

    def config(self):
        return {"d": self.d, "ell": self.ell, "seed": self.seed}

    def state(self):
        return {"rows": self.rows, "sq_frob": self.sq_frob}

    def load_state(self, state):
        self.rows = np.asarray(state["rows"], np.float64).reshape(-1, self.d)
        self.sq_frob = float(state["sq_frob"])

    # -- core --------------------------------------------------------------
    def _shrink(self) -> None:
        """SVD the buffer and shrink all singular values by σ_ℓ² — the FD
        step that 'pays' the smallest retained direction to bound every
        deleted one. Keeps ≤ ℓ−1 nonzero rows."""
        if len(self.rows) < self.ell:
            return
        _, s, vt = np.linalg.svd(self.rows, full_matrices=False)
        # svd yields min(rows, d) values; when rank < ℓ (e.g. ℓ > d) the
        # ℓ-th singular value is 0, so δ = 0 and the 'shrink' is a LOSSLESS
        # compression to ≤ d rows of σ·Vᵀ
        delta = s[self.ell - 1] ** 2 if len(s) >= self.ell else 0.0
        r = min(len(s), self.ell - 1)
        s2 = np.maximum(s[:r] ** 2 - delta, 0.0)
        self.rows = np.sqrt(s2)[:, None] * vt[:r]

    def update(self, keys, counts=None) -> None:
        """``keys`` is an (n, d) float array of embedding rows."""
        a = np.asarray(keys, np.float64).reshape(-1, self.d)
        if not len(a):
            return
        self.sq_frob += float((a * a).sum())
        # absorb in ℓ-row gulps so the buffer never exceeds 2ℓ rows
        for lo in range(0, len(a), self.ell):
            self.rows = np.vstack([self.rows, a[lo:lo + self.ell]])
            self._shrink()

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        assert self.config() == other.config(), "sketch configs differ"
        self.sq_frob += other.sq_frob
        for lo in range(0, len(other.rows), self.ell):
            self.rows = np.vstack([self.rows, other.rows[lo:lo + self.ell]])
            self._shrink()
        return self

    # -- queries -----------------------------------------------------------
    def cov_estimate(self) -> np.ndarray:
        """BᵀB ≈ AᵀA (uncentered second-moment / Gram matrix)."""
        return self.rows.T @ self.rows

    def singular_values(self, k: int | None = None) -> np.ndarray:
        """Estimated top singular values of A (descending)."""
        s = np.linalg.svd(self.rows, compute_uv=False)
        return s if k is None else s[:k]

    def spectral_error_bound(self, k: int = 0) -> float:
        """‖AᵀA − BᵀB‖₂ ≤ ‖A‖F² / (ℓ − k) — the a-priori guarantee
        (tighter data-dependent variants exist; this is the published
        worst case the tests pin)."""
        if not 0 <= k < self.ell:
            raise ValueError("need 0 <= k < ell")
        return self.sq_frob / (self.ell - k)
