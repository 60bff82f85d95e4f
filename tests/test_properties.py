"""Property-based tests (hypothesis) for the mergeable-sketch kernel layer.

These generalize the seeded unit tests: for ARBITRARY streams and ARBITRARY
partitionings, the mergeable-summary contracts must hold (north_rule: merge
associativity over arbitrary partition orderings; published error bounds).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
from hypothesis import given, settings, strategies as st

KEYS = st.lists(st.integers(min_value=0, max_value=200), min_size=0, max_size=400)
SPLITS = st.integers(min_value=1, max_value=7)
SEED = st.integers(min_value=0, max_value=2**31 - 1)


def _partition(keys: list[str], n: int) -> list[list[str]]:
    return [keys[i::n] for i in range(n)]


@settings(max_examples=40, deadline=None)
@given(KEYS, SPLITS, SEED)
def test_cm_sum_merge_order_invariant(raw, n_parts, seed):
    """Sum-merged CM state is byte-identical for any partition ordering,
    and never undercounts any key."""
    from sketch_ray.kernels import CountMin

    keys = [f"k{x}" for x in raw]
    exact = Counter(keys)
    parts = _partition(keys, n_parts)

    def build(order):
        acc = CountMin(depth=3, width=256, seed=seed)
        for i in order:
            p = CountMin(depth=3, width=256, seed=seed)
            if parts[i]:
                p.update(parts[i])
            acc.merge(p)
        return acc

    fwd = build(range(n_parts))
    rev = build(reversed(range(n_parts)))
    assert fwd.to_bytes() == rev.to_bytes()
    if exact:
        est = fwd.query(list(exact))
        assert all(e >= exact[k] for k, e in zip(exact, est))


@settings(max_examples=40, deadline=None)
@given(KEYS, SPLITS, SEED)
def test_cmcu_merged_never_undercounts(raw, n_parts, seed):
    from sketch_ray.kernels import CountMinCU

    keys = [f"k{x}" for x in raw]
    exact = Counter(keys)
    acc = CountMinCU(depth=3, width=256, seed=seed)
    for part in _partition(keys, n_parts):
        p = CountMinCU(depth=3, width=256, seed=seed)
        if part:
            p.update(part)
        acc.merge(p)
    if exact:
        est = acc.query(list(exact))
        assert all(e >= exact[k] for k, e in zip(exact, est))


@settings(max_examples=40, deadline=None)
@given(KEYS, SPLITS)
def test_hll_bloom_bottomk_merge_idempotent_commutative(raw, n_parts):
    """max/or/union-merge sketches: byte-identical under reordering AND
    under double-merging the same partial (idempotence)."""
    from sketch_ray.kernels import HLL, BloomFilter, BottomK

    keys = [f"k{x}" for x in raw]
    parts = _partition(keys, n_parts)
    for factory in (
        lambda: HLL(p=6, seed=1),
        lambda: BloomFilter(n_bits=1 << 10, n_hashes=3, seed=1),
        lambda: BottomK(k=32, seed=1),
    ):
        partials = []
        for part in parts:
            p = factory()
            if part:
                p.update(part)
            partials.append(p)
        a = factory()
        for p in partials:
            a.merge(p)
        b = factory()
        for p in reversed(partials):
            b.merge(p)
        assert a.to_bytes() == b.to_bytes()  # commutativity: byte identity
        # idempotence on the SEMANTIC state (max/or/union structures; the
        # n_added diagnostic counter legitimately double-counts)
        c = factory()
        for p in partials:
            c.merge(p)
            c.merge(p)
        sa, sc = a.state(), c.state()
        for field in ("registers", "bits", "hashes"):
            if field in sa:
                assert (np.asarray(sa[field]) == np.asarray(sc[field])).all()


@settings(max_examples=30, deadline=None)
@given(KEYS, SPLITS)
def test_mg_bound_any_partitioning(raw, n_parts):
    from sketch_ray.kernels import MisraGries

    keys = [f"k{x}" for x in raw]
    exact = Counter(keys)
    acc = MisraGries(k=16)
    for part in _partition(keys, n_parts):
        p = MisraGries(k=16)
        if part:
            p.update(part)
        acc.merge(p)
    assert acc.err <= len(keys) / (16 + 1)
    for k, c in exact.items():
        lo = acc.query([k])[0]
        assert lo <= c and c - lo <= acc.err


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                min_size=1, max_size=300), SPLITS)
def test_kll_merged_quantiles_within_range(vals, n_parts):
    """Merged KLL quantiles always lie within [min, max] of the data and
    the median's rank error respects the summary's epsilon."""
    from sketch_ray.kernels import KLL

    acc = KLL(k=64, seed=1)
    for part in [vals[i::n_parts] for i in range(n_parts)]:
        p = KLL(k=64, seed=1)
        if part:
            p.update(np.array(part))
        acc.merge(p)
    q = float(np.asarray(acc.quantile(np.array([0.5])))[0])
    assert min(vals) <= q <= max(vals)
    # rank of a value with duplicates is an interval [left, right]; the
    # median estimate passes if that interval touches 0.5 ± eps
    s = np.sort(vals)
    lo = np.searchsorted(s, q, side="left") / len(vals)
    hi = np.searchsorted(s, q, side="right") / len(vals)
    eps = 0.35  # loose: tiny k, tiny n
    assert lo - eps <= 0.5 <= hi + eps


@given(
    st.lists(st.tuples(st.integers(0, 100), st.integers(1, 40)), min_size=1, max_size=12),
    st.lists(st.integers(-10, 160), min_size=1, max_size=50),
)
@settings(max_examples=200, deadline=None)
def test_segment_decomposition_equals_direct_containment(ivals, points):
    """For arbitrary (overlapping, nested, duplicated) intervals, bucketing
    a point into its elementary segment and reading the coverage matrix must
    equal direct [lo, hi) containment per interval."""
    from sketch_ray.pipelines.relational import _segment_intervals

    lo = np.array([a for a, _ in ivals], dtype=np.int64)
    hi = lo + np.array([w for _, w in ivals], dtype=np.int64)
    edges, cover = _segment_intervals(lo, hi)
    pts = np.array(points, dtype=np.int64)
    seg = np.searchsorted(edges, pts, side="right") - 1
    in_range = (seg >= 0) & (seg < len(edges) - 1)
    got = np.zeros((len(lo), len(pts)), dtype=bool)
    got[:, in_range] = cover[:, seg[in_range]]
    want = (lo[:, None] <= pts[None, :]) & (pts[None, :] < hi[:, None])
    assert np.array_equal(got, want)


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_cluster_labels_equal_union_find(edges):
    """Vectorized min-label propagation + pointer jumping must equal a
    plain union-find over arbitrary random graphs (self-loops, duplicate
    and bidirectional edges included)."""
    import pandas as pd

    from sketch_ray.pipelines.dedup import _cluster_labels

    pairs = pd.DataFrame({"doc_a": [a for a, _ in edges],
                          "doc_b": [b for _, b in edges]})
    nodes, labels = _cluster_labels(pairs)

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    got = dict(zip(nodes.tolist(), labels.tolist()))
    assert got == {x: want[x] for x in got}
    assert set(got) == set(want)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=64))
def test_splitmix64_sql_matches_numpy_kernel(vals):
    """The DuckDB rendering of splitmix64 (_sqlgen: HUGEINT mod-2^64
    arithmetic, 32-bit-decomposed multiplies) must equal the vectorized
    numpy kernel bit-for-bit on arbitrary uint64 inputs — this is what
    makes the stratified_sample / shard_assignments oracles exact."""
    import duckdb

    from sketch_ray.kernels.hashing import splitmix64
    from sketch_ray.pipelines._sqlgen import splitmix64_ctes

    arr = np.array(vals, dtype=np.uint64)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, v UBIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(map(int, vals))))
    ctes, final = splitmix64_ctes("p", "(SELECT i, v AS k FROM t)", "k", "h", ["i"])
    got = con.execute(f"WITH {ctes} SELECT h FROM {final} ORDER BY i").df()["h"]
    assert np.array_equal(np.array(got, dtype=np.uint64), splitmix64(arr))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                        min_size=0, max_size=40), min_size=1, max_size=32),
       st.integers(min_value=0, max_value=1000))
def test_string_hash_sql_matches_numpy_kernel(strs, seed):
    """The DuckDB rendering of the engine string hash (_sqlgen: FNV-Horner
    byte fold + splitmix finalize) must equal kernels/hashing.hash_strings
    bit-for-bit on arbitrary ASCII strings and seeds — what makes the
    kmv_sample_sources oracle exact."""
    import duckdb

    from sketch_ray.kernels.hashing import hash_strings
    from sketch_ray.pipelines._sqlgen import string_hash_ctes

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(strs)))
    ctes, final = string_hash_ctes("p", "(SELECT i, s FROM t)", "s", "h", ["i"], seed=seed)
    got = con.execute(f"WITH {ctes} SELECT h FROM {final} ORDER BY i").df()["h"]
    assert np.array_equal(np.array(got, dtype=np.uint64), hash_strings(strs, seed))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**64 - 1),
                min_size=1, max_size=64),
       st.lists(st.integers(min_value=1, max_value=10**6),
                min_size=1, max_size=64))
def test_weighted_sample_key_sql_matches_numpy(hs, ws):
    """weighted_sample_n's A-Res key round(ln(h/2^64)/max(w,1), 6) must be
    bit-for-bit equal between the numpy engine path and the DuckDB oracle
    expression on arbitrary (hash, weight) pairs — the float contract the
    exact gate relies on."""
    import duckdb

    n = min(len(hs), len(ws))
    hs, ws = hs[:n], ws[:n]
    h = np.array(hs, dtype=np.uint64)
    w = np.array(ws, dtype=np.float64)
    want = np.round(np.log(h.astype(np.float64) / 2.0**64)
                    / np.maximum(w, 1.0), 6)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, h UBIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)",
                    [(i, int(a), int(b)) for i, (a, b) in enumerate(zip(hs, ws))])
    got = con.execute(
        "SELECT round(ln(CAST(h AS DOUBLE) / 18446744073709551616)"
        " / greatest(CAST(w AS DOUBLE), 1.0), 6) AS k FROM t ORDER BY i"
    ).df()["k"].to_numpy()
    assert np.array_equal(got, want), (got, want)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1023), min_size=0,
                max_size=300),
       st.integers(min_value=0, max_value=1024),
       st.integers(min_value=0, max_value=1024),
       SPLITS, SEED)
def test_dyadic_range_contract(vals, a, b, n_parts, seed):
    """For ARBITRARY streams, ranges and partitionings: dyadic range
    estimates never undercount, stay within the a-priori bound, and the
    sum-merged state is byte-identical to the one-shot build."""
    from sketch_ray.kernels import DyadicCM

    lo, hi = min(a, b), max(a, b)
    arr = np.asarray(vals, np.int64)
    one = DyadicCM(bits=10, depth=4, width=256, seed=seed % 97)
    one.update(arr)
    true = int(((arr >= lo) & (arr < hi)).sum())
    est = one.range_count(lo, hi)
    assert est >= true
    assert est - true <= one.range_error_bound()

    parts = [DyadicCM(bits=10, depth=4, width=256, seed=seed % 97)
             for _ in range(n_parts)]
    for i, p in enumerate(parts):
        p.update(arr[i::n_parts])
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.to_bytes() == one.to_bytes()
