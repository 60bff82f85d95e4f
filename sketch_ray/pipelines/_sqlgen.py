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


def splitmix64_lateral_chain(prefix: str, in_expr: str, out_col: str) -> str:
    """Chained LATERAL joins computing ``out_col = splitmix64(in_expr)``
    correlated on the preceding FROM items — for contexts where a CTE chain
    can't carry the state (e.g. each step of an unrolled tree descent).
    Returns a join fragment starting with a comma; the result is exposed as
    ``{prefix}f.{out_col}``. Text stays linear in the number of steps (each
    LATERAL references the previous alias, never re-expanding it)."""
    p = prefix
    return (
        f", LATERAL (SELECT CAST((CAST({in_expr} AS HUGEINT) + {_C1}) % {_M}"
        f" AS UBIGINT) AS v) {p}0"
        f", LATERAL (SELECT xor({p}0.v, {p}0.v >> 30) AS v) {p}1"
        f", LATERAL (SELECT {_mul64(f'{p}1.v', _C2)} AS v) {p}2"
        f", LATERAL (SELECT xor({p}2.v, {p}2.v >> 27) AS v) {p}3"
        f", LATERAL (SELECT {_mul64(f'{p}3.v', _C3)} AS v) {p}4"
        f", LATERAL (SELECT xor({p}4.v, {p}4.v >> 31) AS {out_col}) {p}f"
    )


def dyadic_cm_range_sql(table: str, val_col: str, ranges, bits: int,
                        width: int, depth: int, seed: int) -> str:
    """Full SQL rendering of the DyadicCM range-count + median query
    (kernels/dyadic.py): ``bits`` stacked vanilla-CM levels, every estimate
    an integer min over depth cells — value-hash exact.

    - cells are built IN SQL: one splitmix64 chain over ``table`` × levels
      (level l hashes ``val_col >> l`` with seed ``seed+l``), then
      Kirsch–Mitzenmacher buckets ``(h1 + j·(splitmix64(h1)|1)) & (width-1)``;
    - probe-node cell indices are SHARED LITERALS from the very kernel
      (decay-weight discipline): the dyadic decomposition and its hashes are
      pure functions of config constants, computed by DyadicCM itself;
    - the q=0.5 quantile descent is unrolled over ``bits`` CTE steps with an
      INTEGER-DOUBLED target (t2 = 2·target, compare 2·c_left ≥ t2): the
      kernel's float ``target = 0.5·n`` arithmetic is exact below 2^53, so
      the integer mirror is bit-identical.
    """
    import numpy as np

    from ..kernels.dyadic import DyadicCM
    from ..kernels.hashing import _seed_basis, hash_ints, row_hashes

    mask = width - 1
    lv_vals = ", ".join(
        f"({l}, CAST('{int(_seed_basis(seed + l))}' AS UBIGINT))"
        for l in range(bits))
    sk = DyadicCM(bits=bits, depth=depth, width=width, seed=seed)
    probe_rows = []
    for rid, (lo, hi) in enumerate(ranges):
        for nid, (l, k) in enumerate(sk._decompose(max(lo, 0),
                                                   min(hi, 1 << bits))):
            assert l < bits, "range decomposition reached the root node"
            h = hash_ints(np.array([k], dtype=np.uint64), seed + l)
            cells = (row_hashes(h, depth) & np.uint64(mask)).astype(np.int64)
            probe_rows.extend(
                f"({rid}, {nid}, {l}, {j}, {int(cells[j, 0])})"
                for j in range(depth))
    probes = ", ".join(probe_rows)
    rngs = ", ".join(f"({rid}, {lo}, {hi})"
                     for rid, (lo, hi) in enumerate(ranges))

    dya, dyaf = splitmix64_ctes("dya", "dk", "k", "h1", ["l"])
    dyb, dybf = splitmix64_ctes("dyb", dyaf, "h1", "h2", ["l", "h1"])
    cell_expr = (f"CAST(((CAST(h1 AS HUGEINT) + t.j * "
                 f"CAST((h2 | CAST(1 AS UBIGINT)) AS HUGEINT))"
                 f" % {_M}) % {width} AS BIGINT)")

    qsteps = [f"q{bits} AS (SELECT CAST(0 AS HUGEINT) AS node, "
              f"CAST((SELECT count(*) FROM {table}) AS HUGEINT) AS t2)"]
    for l in range(bits - 1, -1, -1):
        basis = int(_seed_basis(seed + l))
        hA = splitmix64_lateral_chain(
            f"a{l}_", f"xor(CAST(2 * p.node AS UBIGINT), "
                      f"CAST('{basis}' AS UBIGINT))", "h1")
        hB = splitmix64_lateral_chain(f"b{l}_", f"a{l}_f.h1", "h2")
        lookups = ", ".join(
            f"coalesce((SELECT c.v FROM cells c WHERE c.l = {l} AND "
            f"c.j = {j} AND c.cell = CAST(((CAST(a{l}_f.h1 AS HUGEINT) + {j} "
            f"* CAST((b{l}_f.h2 | CAST(1 AS UBIGINT)) AS HUGEINT)) % {_M}) "
            f"% {width} AS BIGINT)), 0)"
            for j in range(depth))
        qsteps.append(
            f"q{l} AS (SELECT CASE WHEN 2 * e.cl >= p.t2 THEN 2 * p.node "
            f"ELSE 2 * p.node + 1 END AS node, "
            f"CASE WHEN 2 * e.cl >= p.t2 THEN p.t2 ELSE p.t2 - 2 * e.cl END"
            f" AS t2 FROM q{l + 1} p{hA}{hB}, LATERAL ("
            f"SELECT least({lookups}) AS cl) e)")
    qchain = ",\n".join(qsteps)

    return f"""
        WITH lv(l, basis) AS (VALUES {lv_vals}),
        dk AS (SELECT lv.l, xor(CAST(d.{val_col} >> lv.l AS UBIGINT), lv.basis) AS k
               FROM {table} d, lv),
        {dya}, {dyb},
        cells AS MATERIALIZED (
            SELECT l, t.j, {cell_expr} AS cell, count(*) AS v
            FROM {dybf}, range(0, {depth}) t(j) GROUP BY 1, 2, 3),
        probes(rid, nid, l, j, cell) AS (VALUES {probes}),
        node_est AS (
            SELECT p.rid, p.nid, min(coalesce(c.v, 0)) AS e
            FROM probes p LEFT JOIN cells c
              ON c.l = p.l AND c.j = p.j AND c.cell = p.cell
            GROUP BY 1, 2),
        range_est AS (SELECT rid, sum(e) AS est FROM node_est GROUP BY 1),
        rngs(rid, lo, hi) AS (VALUES {rngs}),
        exact AS (
            SELECT r.rid,
                   (SELECT count(*) FROM {table} d
                     WHERE d.{val_col} >= r.lo AND d.{val_col} < r.hi) AS cnt
            FROM rngs r),
        {qchain}
        SELECT CAST(r.lo AS BIGINT) AS lo, CAST(r.hi AS BIGINT) AS hi,
               CAST(e.est AS BIGINT) AS est_n_docs,
               CAST(x.cnt AS BIGINT) AS exact_n_docs,
               (SELECT CAST(node AS BIGINT) FROM q0) AS est_q50
        FROM rngs r JOIN range_est e ON e.rid = r.rid
        JOIN exact x ON x.rid = r.rid
        ORDER BY lo
    """


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
