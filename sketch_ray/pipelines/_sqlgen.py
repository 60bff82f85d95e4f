"""DuckDB SQL rendering of the engine's deterministic hash functions.

Seeded sampling / sharding decisions in this engine are pure functions of
(key, seed) through the SplitMix64 finalizer (kernels/hashing.py:31-39,
public-domain algorithm, Steele et al.). This module renders the SAME
function as DuckDB SQL so the driver's exact value-hash gate can check
those operators value-for-value instead of rows-only.

64-bit wraparound arithmetic in SQL: additions run in HUGEINT then reduce
mod 2**64; multiplies are decomposed into 32-bit halves
(``x*c mod 2**64 = (x_lo*c + ((x_hi*c_lo mod 2**32) << 32)) mod 2**64``)
so no intermediate exceeds HUGEINT range. Parity with the numpy kernel is
pinned over random + boundary inputs in tests/test_properties.py.
"""

from __future__ import annotations

_M = 1 << 64
_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB


def _mul64(col: str, c: int) -> str:
    """SQL for ``(col * c) mod 2**64`` on a UBIGINT column."""
    c_lo = c & 0xFFFFFFFF
    return (
        f"CAST((CAST({col} % 4294967296 AS HUGEINT) * {c} + "
        f"CAST((CAST({col} // 4294967296 AS HUGEINT) * {c_lo}) % 4294967296 AS HUGEINT)"
        f" * 4294967296) % {_M} AS UBIGINT)"
    )


def mul64_sql(col: str, c: int) -> str:
    """Public alias of the decomposed mod-2**64 multiply (for oracle
    builders that hand-roll short Horner folds)."""
    return _mul64(col, c)


def to_bigint_sql(col: str) -> str:
    """Two's-complement reinterpretation UBIGINT -> BIGINT (matches numpy
    ``uint64.astype(int64)``; a plain CAST raises on values >= 2**63)."""
    return (f"CAST(CASE WHEN {col} >= 9223372036854775808 "
            f"THEN CAST({col} AS HUGEINT) - {_M} ELSE CAST({col} AS HUGEINT) END AS BIGINT)")


def splitmix64_ctes(prefix: str, src: str, in_expr: str, out_col: str,
                    carry_cols: list[str]) -> tuple[str, str]:
    """CTE chain computing ``out_col = splitmix64(in_expr)`` over ``src``.

    Returns ``(cte_fragment, final_cte_name)``; the fragment is a
    comma-joined list of CTE definitions (caller splices it into a WITH
    list). A chain (rather than one nested expression) keeps the SQL text
    linear in the number of steps — naive nesting duplicates the operand
    of every xor and grows exponentially.
    """
    carry = ", ".join(carry_cols)
    steps = [
        f"CAST((CAST({in_expr} AS HUGEINT) + {_C1}) % {_M} AS UBIGINT)",
        "xor(v, v >> 30)",
        _mul64("v", _C2),
        "xor(v, v >> 27)",
        _mul64("v", _C3),
    ]
    parts = [f"{prefix}0 AS (SELECT {carry}, {steps[0]} AS v FROM {src})"]
    for i, expr in enumerate(steps[1:], 1):
        parts.append(f"{prefix}{i} AS (SELECT {carry}, {expr} AS v FROM {prefix}{i - 1})")
    final = f"{prefix}f"
    parts.append(
        f"{final} AS (SELECT {carry}, xor(v, v >> 31) AS {out_col} FROM {prefix}{len(steps) - 1})"
    )
    return ",\n".join(parts), final


def string_hash_ctes(prefix: str, src: str, str_col: str, out_col: str,
                     carry_cols: list[str], seed: int) -> tuple[str, str]:
    """CTE chain computing ``out_col = hash_strings(str_col, seed)`` — the
    engine's seeded FNV-polynomial string hash (kernels/hashing.py:46-76:
    Horner fold of the bytes by the FNV prime mod 2**64, xor'd with
    len*C and the seeded basis, splitmix64-finalized).

    ASCII-only: the byte fold is rendered with ``unicode(ch)``, which
    equals the byte value only for ASCII input (true of the testdata
    corpus — parity over arbitrary ASCII strings is hypothesis-pinned in
    tests/test_properties.py). Returns ``(cte_fragment, final_cte_name)``.
    """
    from ..kernels.hashing import _FNV_PRIME, _seed_basis

    p = int(_FNV_PRIME)
    p_lo = p % (1 << 32)
    c3 = 0x94D049BB133111EB
    basis = int(_seed_basis(seed))
    s = str_col
    horner = (
        f"list_reduce(list_prepend(CAST(0 AS UBIGINT), "
        f"list_transform(range(1, strlen({s}) + 1), i -> CAST(unicode({s}[i]) AS UBIGINT))), "
        f"(acc, b) -> CAST((CAST(acc % 4294967296 AS HUGEINT) * {p} + "
        f"CAST((CAST(acc // 4294967296 AS HUGEINT) * {p_lo}) % 4294967296 AS HUGEINT)"
        f" * 4294967296 + b) % {_M} AS UBIGINT))"
    )
    lenterm = f"CAST((CAST(strlen({s}) AS HUGEINT) * {c3}) % {_M} AS UBIGINT)"
    h0 = f"xor(xor({horner}, {lenterm}), {basis})"
    carry = ", ".join(carry_cols)
    pre = f"{prefix}h AS (SELECT {carry}, {h0} AS k FROM {src})"
    ctes, final = splitmix64_ctes(prefix, f"{prefix}h", "k", out_col, carry_cols)
    return f"{pre},\n{ctes}", final


def mix_constant(seed: int) -> int:
    """The Python-side ``splitmix64(seed)`` constant, for inlining into SQL
    (matches stratified_sample / shard_assignments exactly)."""
    import numpy as np

    from ..kernels.hashing import splitmix64

    return int(splitmix64(np.array([seed], np.uint64))[0])


def rate_threshold(rate: float) -> int:
    """The exact uint64 keep-threshold the engine derives from a float rate
    (text_analysis.stratified_sample's float-scale-and-clamp, bit-for-bit)."""
    import numpy as np

    if rate >= 1.0:
        return 0xFFFFFFFFFFFFFFFF
    return int(np.uint64(max(rate, 0.0) * 2.0**64))


# --- forward-decay weights (Cormode, Shkapenyuk, Srivastava & Xu 2009) ---
#
# Time-decayed aggregation quantizes the exponential decay weight to an
# INTEGER so distributed partial sums fold exactly (no float-order drift):
#     w(age) = round(2^30 * 2^(-age_days / half_life_days))
# The SQL oracle does not recompute the exponential (cross-engine pow/exp
# is not bit-stable — the log10 lesson from first_digit_profile); instead
# the weight table is rendered as SHARED LITERALS from the same Python
# function, so both engines sum the identical integers.

DECAY_SCALE = 1 << 30


def decay_weights(half_life_days: int, max_age: int | None = None):
    """int64 weight per integer age 0..max_age (inclusive); 0 beyond
    ~30.5 half-lives where 2^30 * 2^(-age/hl) rounds below 1."""
    import numpy as np

    if max_age is None:
        max_age = int(half_life_days * 31)
    ages = np.arange(max_age + 1, dtype=np.float64)
    return np.rint(np.exp2(-ages / float(half_life_days))
                   * DECAY_SCALE).astype(np.int64)


def decay_weight_values(half_life_days: int) -> str:
    """The nonzero (age, weight) pairs as a SQL VALUES list — join target
    for the oracle; ages beyond the table COALESCE to weight 0."""
    w = decay_weights(half_life_days)
    nz = [i for i, x in enumerate(w.tolist()) if x > 0]
    return ", ".join(f"({i}, {int(w[i])})" for i in nz)
