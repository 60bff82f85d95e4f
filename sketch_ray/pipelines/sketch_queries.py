"""Query-layer pipelines: global sketches over the testdata tables and their
point/quantile/cardinality/membership answers (north_star query surface).

Each returns a small Arrow table; estimates are approximate (bounded by the
kernel's published guarantees) so these are rows-only-checked by the driver,
while the *exact* counterparts in pipelines/exact.py carry DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.sketch_build import SketchSpec, build_sketches
from ._util import round_half_away


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def cmcu_token_estimates(sf_dir: str, top: int = 50) -> pa.Table:
    """CM-CU point estimates for the ``top`` most frequent document tokens
    (reference A1 point query, src/sketch.cpp:145-152). Estimates at this
    width are exact with overwhelming probability (verified vs oracle in
    tests), but gated rows-only because the guarantee is a bound."""
    from .exact import top_tokens

    ds = _read(sf_dir, "documents", ["text"])
    spec = SketchSpec("tok", "cmcu", "text", mode="tokens", params={"width": 1 << 14, "seed": 42})
    sk = build_sketches(ds, [spec], batch_size=4096)["tok"]
    keys = top_tokens(sf_dir, k=top).column("token").to_pylist()  # distributed top-k
    est = sk.query(keys)
    return pa.table({"token": pa.array(keys, pa.string()), "est": pa.array(est, pa.int64())})


def _column_sketches(sf_dir: str, kind: str, params: dict,
                     cols_by_table: dict[str, list[str]]) -> dict:
    """One `kind` sketch per column, ONE streaming pass per table. The
    passes run SEQUENTIALLY: each is already fully distributed, and two
    concurrent streaming executions in one driver contend for the same
    CPU pool (measured: warm wall scatters 0.7-5.2 s threaded vs a
    stable 1.0-1.5 s sequential at sf0.1/32 CPUs). Shared scaffolding of
    every per-column cardinality query (hll / lincount)."""
    out: dict = {}
    for table, cols in cols_by_table.items():
        specs = [SketchSpec(f"{table}.{c}", kind, c, mode="column",
                            params=dict(params)) for c in cols]
        out.update(build_sketches(_read(sf_dir, table, list(cols)),
                                  specs, 8192))
    return out


def hll_cardinalities(sf_dir: str) -> pa.Table:
    """Approximate distinct counts across tables (north_star: distinct
    url/host cardinality) — see _column_sketches for the pass shape."""
    all_sk = _column_sketches(
        sf_dir, "hll", {"p": 14, "seed": 42},
        {"documents": ["source", "text"],
         "events": ["user_id", "event_type"]})
    names = sorted(all_sk)
    return pa.table(
        {
            "scope": pa.array(names, pa.string()),
            # half-away rounding (not Python round's half-even): this
            # query is value-hash-gated against the SQL rendering
            "estimate": pa.array(
                [int(round_half_away(all_sk[n].estimate(), 0))
                 for n in names], pa.int64()),
        }
    )


def quantile_sketches(sf_dir: str, kind: str = "kll") -> pa.Table:
    """n_chars quantiles of documents via KLL or t-digest."""
    params = {"k": 200, "seed": 42} if kind == "kll" else {"delta": 200, "seed": 42}
    spec = SketchSpec("len", kind, "n_chars", mode="numeric", params=params)
    sk = build_sketches(_read(sf_dir, "documents", ["n_chars"]), [spec], batch_size=8192)["len"]
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    vals = sk.quantile(np.array(qs))
    return pa.table({"q": pa.array(qs, pa.float64()), "value": pa.array(np.asarray(vals, dtype=np.float64))})


def dynamic_quantiles(sf_dir: str) -> pa.Table:
    """Quantiles over a DYNAMIC value stream via KLL± (kernels/kllpm.py,
    after the retrieved VLDB'21 KLL± paper): every event's value is
    inserted, and 'error' events additionally RETRACT theirs — the
    turnstile workload no plain quantile sketch supports. One streaming
    pass, shuffle-free per-side merge fold; rows-only gated (estimates),
    with exactness/bounds pinned in pytest against the surviving
    (non-error) multiset."""
    spec = SketchSpec("dyn", "kllpm", "value", mode="numeric",
                      params={"k": 200, "seed": 42},
                      delete_eq=("event_type", "error"))
    sk = build_sketches(_read(sf_dir, "events", ["value", "event_type"]),
                        [spec], batch_size=8192)["dyn"]
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    vals = sk.quantile(np.array(qs))
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value": pa.array(np.asarray(vals, np.float64)),
                     "n_live": pa.array([int(sk.n)] * len(qs), pa.int64())})


def kmv_sample_sources(sf_dir: str, k: int = 16) -> pa.Table:
    """Deterministic distinct sample of `source` values via the mergeable
    bottom-k (KMV) sketch — the engine's seeded-sampling primitive. Same
    sample for any run/parallelism (union-merge is order-independent).
    Returns (rank, source) plus the KMV distinct estimate as a column."""
    spec = SketchSpec("kmv", "bottomk", "source", mode="column", params={"k": k, "seed": 42})
    sk = build_sketches(_read(sf_dir, "documents", ["source"]), [spec], batch_size=8192)["kmv"]
    sample = sk.sample()
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(sample) + 1), pa.int64()),
            "source": pa.array(sample, pa.string()),
            "est_distinct": pa.array([round(sk.estimate())] * len(sample), pa.int64()),
        }
    )


def mg_top_tokens(sf_dir: str, k: int = 256, top: int = 20) -> pa.Table:
    """Distributed Misra-Gries top tokens: per-batch MG partials, merged via
    the same shuffle-free fold as every sketch. Lower bounds are exact
    whenever distinct keys <= k (true for this corpus's vocabulary), so the
    query is oracle-gated against the exact top-k; on an open vocabulary the
    same pipeline degrades gracefully to the N/(k+1) bound (pytest)."""
    spec = SketchSpec("mgt", "mg", "text", mode="tokens", params={"k": k, "seed": 42})
    sk = build_sketches(_read(sf_dir, "documents", ["text"]), [spec], batch_size=4096)["mgt"]
    items = sk.top(top)
    return pa.table(
        {
            "token": pa.array([t for t, _ in items], pa.string()),
            "cnt": pa.array([c for _, c in items], pa.int64()),
        }
    )


def grouped_sketch_stats(sf_dir: str) -> pa.Table:
    """Per-language sketches via the native aggregate API
    (``ds.groupby("lang").aggregate(SketchAgg(...))``): HLL distinct-source
    estimate + KLL median n_chars per group, one shuffle, no custom merge
    plumbing. Rows-only gated (estimates); exactness bounds in pytest."""
    from ..stages.agg import SketchAgg

    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    out = ds.groupby("lang").aggregate(
        SketchAgg(SketchSpec("s", "hll", "source", mode="column", params={"p": 12, "seed": 42}),
                  alias_name="est_sources", finalize="estimate"),
        SketchAgg(SketchSpec("q", "kll", "n_chars", mode="numeric", params={"k": 200, "seed": 42}),
                  alias_name="median_chars", finalize=("quantile", 0.5)),
    )
    df = out.to_pandas().sort_values("lang").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def value_quantiles(sf_dir: str) -> pa.Table:
    """KLL and t-digest quantiles of the continuous events.value column
    (doubles — the harder case for digests vs the integer n_chars).
    Rows-only gated; rank-error bounds pinned in pytest."""
    specs = [
        SketchSpec("kll", "kll", "value", mode="numeric", params={"k": 200, "seed": 42}),
        SketchSpec("td", "tdigest", "value", mode="numeric", params={"delta": 200, "seed": 42}),
    ]
    sks = build_sketches(_read(sf_dir, "events", ["value"]), specs, batch_size=16384)
    qs = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    kll_v = np.asarray(sks["kll"].quantile(qs), dtype=np.float64)
    td_v = np.asarray(sks["td"].quantile(qs), dtype=np.float64)
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "kll_value": pa.array(np.round(kll_v, 6), pa.float64()),
            "tdigest_value": pa.array(np.round(td_v, 6), pa.float64()),
        }
    )


def cm_join_size(sf_dir: str, widths: tuple[int, ...] = (1 << 12, 1 << 16)) -> pa.Table:
    """Equi-join-size estimation from two CM sketches that never see each
    other's table (Cormode & Muthukrishnan 2005 §4.2): est |events ⋈ orders
    on user_id = o_custkey| = min_j <row_j(CM_events), row_j(CM_orders)>.

    The sketch-native answer to "how big is this join?" at 10^12-doc scale:
    each side is ONE streaming pass into a width×depth array (the same
    shuffle-free partial fold as every sketch), the estimate is a dot
    product of two tiny tables — no shuffle, no join, no key exchange.
    Never undercounts; over by ≤ (e/width)·N_A·N_B w.p. ≥ 1 − e^−depth
    (pinned in pytest vs the exact join_size_exact oracle query).
    Returns (width, est_pairs) per width — wider sketch, tighter estimate.
    All widths build in ONE streaming pass per side (multi-spec build)."""
    def specs(prefix: str, column: str) -> list[SketchSpec]:
        return [SketchSpec(f"{prefix}{w}", "cm", column, mode="column",
                           params={"width": int(w), "depth": 4, "seed": 42})
                for w in widths]

    a = build_sketches(_read(sf_dir, "events", ["user_id"]),
                       specs("a", "user_id"), batch_size=16384)
    b = build_sketches(_read(sf_dir, "orders", ["o_custkey"]),
                       specs("b", "o_custkey"), batch_size=16384)
    return pa.table({
        "width": pa.array([int(w) for w in widths], pa.int64()),
        "est_pairs": pa.array(
            [a[f"a{w}"].inner_product(b[f"b{w}"]) for w in widths], pa.int64()),
    })


def bloom_membership(sf_dir: str) -> pa.Table:
    """Bloom filter over document texts' tokens; probe a mix of present and
    absent keys. Zero false negatives guaranteed; false positives bounded."""
    ds = _read(sf_dir, "documents", ["text"])
    spec = SketchSpec(
        "tok_bloom", "bloom", "text", mode="tokens",
        params={"n_bits": 1 << 20, "n_hashes": 7, "seed": 42},
    )
    sk = build_sketches(ds, [spec], batch_size=8192)["tok_bloom"]
    probes = ["the", "data", "join", "absent_key_1", "absent_key_2", "zz_never"]
    hits = sk.contains(probes)
    return pa.table(
        {"key": pa.array(probes, pa.string()), "maybe_present": pa.array(hits.tolist(), pa.bool_())}
    )


def cs_moments(sf_dir: str, widths: tuple[int, ...] = (1 << 12, 1 << 14)) -> pa.Table:
    """CountSketch (AMS) moments of events.user_id in one streaming pass per
    width: F2 / self-join-size estimate (median of per-row sums of squared
    SIGNED counters — collisions cancel in expectation, two-sided error
    ≈ sqrt(8/width)·F2) — the turnstile-capable complement to the CM
    family's one-sided estimates. Rows-only gated; the exact ground truth
    is the oracle-gated f2_self_join_exact, and the bound is pinned in
    pytest. Returns (width, f2_est)."""
    out_w, out_est = [], []
    for w in widths:
        spec = SketchSpec("cs", "countsketch", "user_id", mode="column",
                          params={"width": int(w), "depth": 5, "seed": 42})
        sk = build_sketches(_read(sf_dir, "events", ["user_id"]),
                            [spec], batch_size=16384)["cs"]
        out_w.append(int(w))
        out_est.append(sk.f2())
    return pa.table({"width": pa.array(out_w, pa.int64()),
                     "f2_est": pa.array(out_est, pa.int64())})


def kmv_set_ops(sf_dir: str, k: int = 2048) -> pa.Table:
    """Theta-sketch set algebra over two key streams that never meet:
    distinct events.user_id vs distinct orders.o_custkey. Each side is ONE
    streaming pass into a coordinated bottom-k sketch (same seed — the
    hash samples must agree); the union/intersection/difference/Jaccard
    estimates come from cutting both retained sets at the smaller theta
    (kernels/bottomk.theta_set_ops; Dasgupta et al. 2016). At 10^12-key
    scale nothing but two KB-sized sketch states crosses the wire — the
    distinct-set analogue of cm_join_size. Rows-only gated; the exact
    ground truth is the oracle-gated relational.set_op_cardinalities and
    the ~1/sqrt(k) error is pinned in pytest. Exact whenever both sides
    have fewer than k distinct keys (theta = 1)."""
    from ..kernels.bottomk import theta_set_ops

    a = build_sketches(_read(sf_dir, "events", ["user_id"]),
                       [SketchSpec("a", "bottomk", "user_id", mode="column",
                                   params={"k": int(k), "seed": 42})],
                       batch_size=16384)["a"]
    b = build_sketches(_read(sf_dir, "orders", ["o_custkey"]),
                       [SketchSpec("b", "bottomk", "o_custkey", mode="column",
                                   params={"k": int(k), "seed": 42})],
                       batch_size=16384)["b"]
    from ._util import round6

    r = theta_set_ops(a, b)
    cols = ["est_a", "est_b", "est_union", "est_intersect",
            "est_only_a", "est_only_b", "jaccard", "theta"]
    # round6 (half-away), not Python round (half-even): this query is
    # value-hash-gated against a DuckDB rendering of the same theta cut
    return pa.table({c: pa.array([float(round6(float(r[c])))], pa.float64())
                     for c in cols})


def hll_set_ops(sf_dir: str, p: int = 14) -> pa.Table:
    """Inclusion–exclusion set estimates from two independently-built HLLs
    over events.user_id and orders.o_custkey (same seed — register streams
    must be coordinated): |A∪B| comes from the register-wise max merge
    (HLL's native union), |A∩B| = |A| + |B| − |A∪B|, differences follow.
    The classic cheap alternative to the theta sketch (kmv_set_ops): union
    error keeps HLL's ~1.04/sqrt(2^p) bound, but the subtraction means the
    INTERSECTION error scales with |A∪B|, not |A∩B| — tiny overlaps drown
    in union noise, which is precisely why the theta path exists. Both are
    pinned against the oracle-gated set_op_cardinalities in pytest.
    Rows-only gated; one KB-sized state per side crosses the wire."""
    a = build_sketches(_read(sf_dir, "events", ["user_id"]),
                       [SketchSpec("a", "hll", "user_id", mode="column",
                                   params={"p": int(p), "seed": 42})],
                       batch_size=16384)["a"]
    b = build_sketches(_read(sf_dir, "orders", ["o_custkey"]),
                       [SketchSpec("b", "hll", "o_custkey", mode="column",
                                   params={"p": int(p), "seed": 42})],
                       batch_size=16384)["b"]
    from ._util import round6

    est_a, est_b = a.estimate(), b.estimate()
    est_union = a.merge(b).estimate()   # register-wise max; a is consumed
    est_inter = max(0.0, est_a + est_b - est_union)
    # round6 (half-away): value-hash-gated against the SQL HLL rendering
    return pa.table({
        "est_a": pa.array([float(round6(est_a))], pa.float64()),
        "est_b": pa.array([float(round6(est_b))], pa.float64()),
        "est_union": pa.array([float(round6(est_union))], pa.float64()),
        "est_intersect": pa.array([float(round6(est_inter))], pa.float64()),
        "est_only_a": pa.array([float(round6(max(0.0, est_a - est_inter)))],
                               pa.float64()),
        "est_only_b": pa.array([float(round6(max(0.0, est_b - est_inter)))],
                               pa.float64()),
    })


def cm_range_counts(sf_dir: str, bits: int | None = None,
                    width: int = 2048) -> pa.Table:
    """Range counts + quantiles from ONE dyadic Count-Min build (Cormode &
    Muthukrishnan 2005 §4.2): how many documents have n_chars in [lo, hi),
    answered from ``bits`` stacked CM levels — at 10^12-doc scale the
    sketch answers ANY ad-hoc range afterwards without rescanning, where
    the exact len_histogram pins one fixed binning at build time.

    One streaming pass builds the sketch (same shuffle-free partial fold
    as every kernel); each probed range decomposes into ≤ 2·bits dyadic
    nodes. Estimates NEVER undercount and overcount ≤ 2·bits·(e/width)·N
    w.h.p.; the in-row ``exact_n_docs`` (one pyarrow pass, the
    embedding_spectrum discipline) plus est_q50's true-rank pytest pin
    the bound. With ``bits`` pinned (the gate uses 16) the WHOLE query is
    value-hash exact against ``_sqlgen.dyadic_cm_range_sql``: every
    estimate is an integer min over depth cells and the quantile descent
    compares integer-doubled targets, so DuckDB can mirror it bit-for-bit.
    Returns (lo, hi, est_n_docs, exact_n_docs) plus a quantile row."""
    if bits is None:
        # size the domain from parquet statistics (free) with one bit of
        # headroom — a corpus with longer docs must widen the tree, not
        # crash the domain guard
        from ._util import parquet_minmax

        mx = int(parquet_minmax(f"{sf_dir}/documents.parquet", "n_chars")[1])
        bits = max(8, mx.bit_length() + 1)
    ds = _read(sf_dir, "documents", ["n_chars"])
    spec = SketchSpec("dy", "dyadiccm", "n_chars", mode="numeric",
                      params={"bits": int(bits), "width": int(width),
                              "depth": 4, "seed": 42})
    sk = build_sketches(ds, [spec], batch_size=16384)["dy"]

    ranges = [(0, 100), (100, 200), (200, 400), (400, 1 << bits)]

    def exact_partials(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        return pa.table({"cnt": pa.array(
            [int(((v >= lo) & (v < hi)).sum()) for lo, hi in ranges],
            pa.int64())})

    ex = ds.map_batches(exact_partials, batch_format="pyarrow",
                        batch_size=65536).to_pandas()
    exact = (ex["cnt"].to_numpy(np.int64).reshape(-1, len(ranges)).sum(axis=0)
             if len(ex) else np.zeros(len(ranges), np.int64))
    return pa.table({
        "lo": pa.array([r[0] for r in ranges], pa.int64()),
        "hi": pa.array([r[1] for r in ranges], pa.int64()),
        "est_n_docs": pa.array(
            [sk.range_count(lo, hi) for lo, hi in ranges], pa.int64()),
        "exact_n_docs": pa.array(exact, pa.int64()),
        "est_q50": pa.array([sk.quantile(0.5)] * len(ranges), pa.int64()),
    })


def windowed_hll_users(sf_dir: str, window: int = 7, p: int = 12) -> pa.Table:
    """Sliding-window distinct-user estimates from PER-DAY HLL states —
    the mergeable-UDAF answer to rolling windows: ONE
    ``groupby(day).aggregate(SketchAgg(hll))`` pass builds a KB-sized
    state per day, then EVERY trailing-``window`` estimate is a
    register-max union of ≤window states on the driver. At 10^12-event
    scale the exact recount (rolling_distinct_users) re-shuffles the
    window's pairs per day; this path re-reads nothing — day states are
    built once and any window (trailing 7, trailing 30, ad-hoc spans)
    is answered from them. Exact counts ride in-row (the
    embedding_spectrum discipline); the ±1.04/sqrt(2^p) accuracy is
    pinned in pytest. Returns (day, est_users, exact_users)."""
    import pyarrow.compute as _pc

    from ..kernels.base import sketch_from_bytes
    from ..pipelines.relational import rolling_distinct_users
    from ..stages.agg import SketchAgg

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def day_col(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": _pc.floor_temporal(batch["ts"].combine_chunks(),
                                      unit="day"),
            "user_id": batch["user_id"]})

    spec = SketchSpec("u", "hll", "user_id", mode="column",
                      params={"p": int(p), "seed": 42})
    rows = (ds.map_batches(day_col, batch_format="pyarrow", batch_size=32768)
            .groupby("day")
            .aggregate(SketchAgg(spec, alias_name="state", finalize="bytes"))
            ).to_pandas()
    rows = rows.sort_values("day").reset_index(drop=True)
    days = rows["day"].to_numpy("datetime64[us]")
    sketches = [sketch_from_bytes(b) for b in rows["state"]]

    W = int(window)
    day_i = days.astype(np.int64)
    _DAY_US = np.int64(86_400_000_000)
    ests = np.empty(len(days), np.int64)
    for i in range(len(days)):  # day-bounded loop
        lo = int(np.searchsorted(day_i, day_i[i] - (W - 1) * _DAY_US))
        u = sketches[lo].copy()
        for j in range(lo + 1, i + 1):
            u.merge(sketches[j])
        # half-away (matches the SQL rendering's round), not Python round
        ests[i] = int(round_half_away(u.estimate(), 0))

    exact = rolling_distinct_users(sf_dir, window=W).to_pandas()
    out = pd.DataFrame({"day": days, "est_users": ests}).merge(
        exact, on="day", how="inner")
    return pa.table({
        "day": pa.array(out["day"].to_numpy("datetime64[us]"),
                        pa.timestamp("us")),
        "est_users": pa.array(out["est_users"].to_numpy(np.int64), pa.int64()),
        "exact_users": pa.array(out["n_users"].to_numpy(np.int64), pa.int64()),
    })


def windowed_value_quantiles(sf_dir: str, window: int = 7,
                             delta: int = 200) -> pa.Table:
    """Trailing-window VALUE QUANTILES from per-day t-digest states — the
    third windowed-sketch composition (windowed_heavy_users = counts,
    windowed_hll_users = distinct, this = quantiles): ONE
    ``groupby(day).aggregate(SketchAgg(tdigest))`` pass builds a KB
    centroid state per day, then every trailing-``window`` p50/p95/p99
    is a centroid-merge of ≤window states driver-side — ad-hoc window
    spans never rescan events. Rows-only gated (digest estimates are
    not SQL); rank-error vs the exact windowed quantile is pinned in
    pytest. Returns (day, q, est_value) sorted, est 6dp."""
    import pyarrow.compute as _pc

    from ..kernels.base import sketch_from_bytes
    from ..stages.agg import SketchAgg
    from ._util import round6

    ds = _read(sf_dir, "events", ["ts", "value"])

    def day_col(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": _pc.floor_temporal(batch["ts"].combine_chunks(),
                                      unit="day"),
            "value": batch["value"]})

    spec = SketchSpec("v", "tdigest", "value", mode="numeric",
                      params={"delta": int(delta), "seed": 42})
    rows = (ds.map_batches(day_col, batch_format="pyarrow", batch_size=32768)
            .groupby("day")
            .aggregate(SketchAgg(spec, alias_name="state", finalize="bytes"))
            ).to_pandas().sort_values("day").reset_index(drop=True)
    days = rows["day"].to_numpy("datetime64[us]")
    day_i = days.astype(np.int64)
    sketches = [sketch_from_bytes(b) for b in rows["state"]]
    _DAY_US = np.int64(86_400_000_000)
    W = int(window)
    qs = np.array([0.5, 0.95, 0.99])

    out_d, out_q, out_v = [], [], []
    for i in range(len(days)):  # day-bounded loop
        lo = int(np.searchsorted(day_i, day_i[i] - (W - 1) * _DAY_US))
        u = sketches[lo].copy()
        for j in range(lo + 1, i + 1):
            u.merge(sketches[j])
        vals = np.asarray(u.quantile(qs), np.float64)
        out_d.extend([day_i[i]] * len(qs))
        out_q.extend(qs.tolist())
        out_v.extend(np.asarray(round6(vals), np.float64).tolist())
    return pa.table({
        "day": pa.array(np.array(out_d, np.int64).astype("datetime64[us]"),
                        pa.timestamp("us")),
        "q": pa.array(out_q, pa.float64()),
        "est_value": pa.array(out_v, pa.float64()),
    })


def cbloom_turnstile_membership(sf_dir: str, width: int = 1 << 16,
                                n_probe: int = 200) -> pa.Table:
    """TURNSTILE membership (kernels/cbloom.py): every event inserts its
    user_id, 'error' events additionally retract theirs, so a user's net
    multiplicity is their non-error event count — the membership analogue
    of dynamic_quantiles' KLL± workload, which no plain Bloom filter
    supports (clearing bits corrupts shared keys). One streaming pass,
    shuffle-free counter-sum merge. Probes user_ids [0, n_probe) and
    returns (user_id, member, est_count) where est_count is the CM-style
    min-counter upper bound on the net count. Rows-only gated (the
    guarantees are bounds); no-false-negative / never-undercount / merge
    associativity are pinned in pytest."""
    spec = SketchSpec("m", "cbloom", "user_id", mode="numeric",
                      params={"width": width, "n_hashes": 4, "seed": 42},
                      delete_eq=("event_type", "error"))
    sk = build_sketches(_read(sf_dir, "events", ["user_id", "event_type"]),
                        [spec], batch_size=8192)["m"]
    probe = np.arange(n_probe, dtype=np.int64)
    return pa.table({
        "user_id": pa.array(probe, pa.int64()),
        "member": pa.array(sk.contains(probe), pa.bool_()),
        "est_count": pa.array(sk.estimate_counts(probe), pa.int64()),
    })


def window_count_estimates(sf_dir: str, window_days: int = 7,
                           k: int = 32) -> pa.Table:
    """Sliding-window counting per event type via the exponential-histogram
    kernel (kernels/ehist.py, the DGIM generalization): estimated number of
    events in the trailing ``window_days`` ending at the stream's newest
    timestamp, with guaranteed relative error ≤ 1/(2k) in O(k·log n)
    state per type.

    The events table is time-sorted on disk and Ray Data batches are
    contiguous row ranges in block order, so per-batch per-type EH states
    are TIME-CONTIGUOUS substream summaries: the driver sorts the
    (n_blocks × n_types) partial rows by (min_ts, max_ts) and merges in
    stream order — unlike the linear sketches this fold is ordered, which
    is exactly why it can't ride build_sketches' order-free tree reduce.
    t_now comes from parquet row-group statistics (no scan). Rows-only
    gated; the error bound, merge contract and space bound are pinned in
    pytest (test_sketches)."""
    from ..kernels.ehist import ExpHistogram
    from ._util import parquet_minmax

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        et = batch["event_type"].combine_chunks()
        codes = pc.dictionary_encode(et)
        idx = codes.indices.to_numpy(zero_copy_only=False)
        types = codes.dictionary.to_pylist()
        rows_t, rows_lo, rows_hi, rows_st = [], [], [], []
        for ti, name in enumerate(types):
            tt = ts[idx == ti]
            eh = ExpHistogram(k=k)
            eh.update(tt)
            rows_t.append(name)
            rows_lo.append(int(tt[0]))
            rows_hi.append(int(tt[-1]))
            rows_st.append(eh.to_bytes())
        return pa.table({"event_type": pa.array(rows_t, pa.string()),
                         "min_ts": pa.array(rows_lo, pa.int64()),
                         "max_ts": pa.array(rows_hi, pa.int64()),
                         "state": pa.array(rows_st, pa.binary())})

    df = ds.map_batches(partials, batch_format="pyarrow",
                        batch_size=65536).to_pandas()
    _, t_now = parquet_minmax(f"{sf_dir}/events.parquet", "ts")
    t_now_us = int(np.datetime64(t_now, "us").astype(np.int64))
    window_us = int(window_days) * 86_400_000_000
    out_type, out_n, out_est = [], [], []
    for name, sub in df.groupby("event_type"):
        sub = sub.sort_values(["min_ts", "max_ts"])
        merged = None
        for raw in sub["state"]:
            eh = ExpHistogram.from_bytes(raw)
            merged = eh if merged is None else merged.merge(eh)
        out_type.append(name)
        out_n.append(merged.n_total)
        out_est.append(merged.estimate(t_now_us, window_us))
    order = np.argsort(np.asarray(out_type, dtype=object))
    return pa.table({
        "event_type": pa.array(np.asarray(out_type, object)[order],
                               pa.string()),
        "n_events": pa.array(np.asarray(out_n, np.int64)[order],
                             pa.int64()),
        "est_window": pa.array(np.asarray(out_est, np.int64)[order],
                               pa.int64()),
    })


def window_value_sums(sf_dir: str, window_days: int = 7,
                      k: int = 32) -> pa.Table:
    """Sliding-window value SUM per event type via the weighted
    exponential histogram (kernels/ehist.py::ExpHistogramSum): estimated
    trailing-``window_days`` revenue-like mass, error ≤ true/(2k) +
    a_max/2 in O(k·log M) state. Values fold as exact integer CENTS
    (promo_revenue_share precedent). Same ordered time-contiguous merge
    discipline as window_count_estimates; rows-only gated, bound pinned
    in pytest."""
    from ..kernels.ehist import ExpHistogramSum
    from ._util import parquet_minmax

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        codes = pc.dictionary_encode(batch["event_type"].combine_chunks())
        idx = codes.indices.to_numpy(zero_copy_only=False)
        types = codes.dictionary.to_pylist()
        rows_t, rows_lo, rows_hi, rows_st = [], [], [], []
        for ti, name in enumerate(types):
            m = idx == ti
            eh = ExpHistogramSum(k=k)
            eh.update(ts[m], cents[m])
            rows_t.append(name)
            rows_lo.append(int(ts[m][0]))
            rows_hi.append(int(ts[m][-1]))
            rows_st.append(eh.to_bytes())
        return pa.table({"event_type": pa.array(rows_t, pa.string()),
                         "min_ts": pa.array(rows_lo, pa.int64()),
                         "max_ts": pa.array(rows_hi, pa.int64()),
                         "state": pa.array(rows_st, pa.binary())})

    df = ds.map_batches(partials, batch_format="pyarrow",
                        batch_size=65536).to_pandas()
    _, t_now = parquet_minmax(f"{sf_dir}/events.parquet", "ts")
    t_now_us = int(np.datetime64(t_now, "us").astype(np.int64))
    window_us = int(window_days) * 86_400_000_000
    out_type, out_tot, out_est = [], [], []
    for name, sub in df.groupby("event_type"):
        sub = sub.sort_values(["min_ts", "max_ts"])
        merged = None
        for raw in sub["state"]:
            eh = ExpHistogramSum.from_bytes(raw)
            merged = eh if merged is None else merged.merge(eh)
        out_type.append(name)
        out_tot.append(merged.v_total)
        out_est.append(merged.estimate(t_now_us, window_us))
    order = np.argsort(np.asarray(out_type, dtype=object))
    return pa.table({
        "event_type": pa.array(np.asarray(out_type, object)[order],
                               pa.string()),
        "total_cents": pa.array(np.asarray(out_tot, np.int64)[order],
                                pa.int64()),
        "est_window_cents": pa.array(np.asarray(out_est, np.int64)[order],
                                     pa.int64()),
    })


def cs_join_size(sf_dir: str, widths: tuple[int, ...] = (1 << 12, 1 << 16)) -> pa.Table:
    """Equi-join-size estimation from two COUNT-SKETCHES (the bilinear AMS
    form, Alon-Gibbons-Matias-Szegedy 1999): est = median over rows of
    <row_j(CS_events), row_j(CS_orders)>. Signs cancel cross terms in
    expectation, so unlike cm_join_size this estimator is UNBIASED with
    two-sided error ~ sqrt(F2(a)·F2(b))/sqrt(width) — the right tool when
    an over-estimate is as costly as an under-estimate (e.g. join-order
    planning). One streaming pass per side, no key exchange; the exact
    ground truth is the oracle-gated join_size_exact and the error is
    pinned in pytest. Returns (width, est_pairs)."""
    def specs(prefix: str, column: str) -> list[SketchSpec]:
        return [SketchSpec(f"{prefix}{w}", "countsketch", column, mode="column",
                           params={"width": int(w), "depth": 5, "seed": 42})
                for w in widths]

    a = build_sketches(_read(sf_dir, "events", ["user_id"]),
                       specs("a", "user_id"), batch_size=16384)
    b = build_sketches(_read(sf_dir, "orders", ["o_custkey"]),
                       specs("b", "o_custkey"), batch_size=16384)
    return pa.table({
        "width": pa.array([int(w) for w in widths], pa.int64()),
        "est_pairs": pa.array(
            [a[f"a{w}"].inner_product(b[f"b{w}"]) for w in widths], pa.int64()),
    })


def lincount_cardinalities(sf_dir: str, n_bits: int = 1 << 16) -> pa.Table:
    """Linear-counting distinct estimates (Whang et al. 1990) next to the
    HLL estimates for the same columns — the small-cardinality
    complement: below ~m·ln(m) keys the bitmap's empty-cell estimator has
    lower variance than HLL at equal memory. ONE streaming pass per
    table; merge is bitmap OR (order-independent, pytest-pinned).
    Rows-only gated (estimates); exact ground truth is the oracle-gated
    distinct_sources_per_lang / table_profile family, and the error
    envelope is pinned in pytest. Returns (column, est, n_set_bits)."""
    all_sk = _column_sketches(
        sf_dir, "lincount", {"n_bits": int(n_bits), "seed": 42},
        {"documents": ["source"], "events": ["user_id", "event_type"]})
    names = sorted(all_sk)
    return pa.table({
        "column": pa.array(names, pa.string()),
        "est": pa.array([float(round_half_away(all_sk[n].estimate(), 2))
                         for n in names], pa.float64()),
        "n_set_bits": pa.array([all_sk[n].n_set() for n in names], pa.int64()),
    })


def ddsketch_quantiles(sf_dir: str, alpha: float = 0.01) -> pa.Table:
    """events.value quantiles via DDSketch (kernels/ddsketch.py) — the
    RELATIVE-error counterpart of the rank-error KLL/t-digest twins in
    value_quantiles, and the only quantile kernel whose merged state is
    byte-identical under any partition order (linear over bucket space).
    One streaming pass, shuffle-free merge fold. Rows-only gated
    (estimates); the |x̂−x_q| ≤ α·x_q guarantee vs the exact quantiles is
    pinned in pytest. Returns (q, value, n, n_bins)."""
    spec = SketchSpec("dd", "dd", "value", mode="numeric",
                      params={"alpha": float(alpha), "max_bins": 4096})
    sk = build_sketches(_read(sf_dir, "events", ["value"]), [spec],
                        batch_size=16384)["dd"]
    qs = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    vals = np.asarray(sk.quantile(qs), np.float64)
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "value": pa.array(np.round(vals, 6), pa.float64()),
        "n": pa.array([int(sk.n)] * len(qs), pa.int64()),
        "n_bins": pa.array([sk.n_bins()] * len(qs), pa.int64()),
    })


def priority_sample_revenue(sf_dir: str, k: int = 512,
                            seed: int = 42) -> pa.Table:
    """Unbiased per-nation revenue estimates from ONE fixed-size priority
    sample of the orders stream (Duffield–Lund–Thorup; kernels/prisample).
    The sketch answer to "estimate any group's total from a bounded
    sample": one streaming pass folds per-batch k+1-item partials whose
    merge is byte-identical in any order (hash-deterministic priorities),
    then EVERY post-hoc subset sum — here revenue per customer nation —
    comes from the same ≤k-row sample; the twin exact query is the
    oracle-gated revenue_per_nation.

    The sample-bounded decoration reads ONLY the sampled orders back via
    predicate pushdown (knn_label_vote discipline). Estimates are exact
    (tau = 0) while the table holds ≤ k orders — pinned in pytest.

    Per-item estimates are QUANTIZED to integer cents
    (``round_half_away(max(w, tau), 0)``) before the per-nation sum, so
    the fold is exact integers with ONE mirrored division at the end
    (house float discipline) — which makes the whole sampling query
    exact-ORACLE-gatable: the SQL renders the identical hash, priority
    double-arithmetic, (q DESC, h) cut, tau and quantization.
    Returns (nation, n_sampled, est_revenue) ordered by nation."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_mod

    from ..kernels.prisample import PrioritySample

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        sk = PrioritySample(k=k, seed=seed)
        cents = np.round(batch["o_totalprice"]
                         .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        sk.update(batch["o_orderkey"].to_numpy(zero_copy_only=False)
                  .astype(np.int64), cents)
        return pa.table({"partial": pa.array([sk.to_bytes()],
                                             pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    sk = PrioritySample(k=k, seed=seed)
    for raw in parts["partial"]:
        sk.merge(PrioritySample.from_bytes(bytes(raw)))

    keys, _, est_w = sk.sample()
    okeys = np.array([int(x) for x in keys], np.int64)
    if len(okeys) == 0:
        return pa.table({"nation": pa.array([], pa.string()),
                         "n_sampled": pa.array([], pa.int64()),
                         "est_revenue": pa.array([], pa.float64())})

    # sample-bounded decoration: only the ≤k sampled orders leave storage
    ot = pq_mod.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filters=pads.field("o_orderkey").isin(pa.array(okeys)))
    cust = pq_mod.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
    nat = pq_mod.read_table(f"{sf_dir}/nation.parquet")
    ck = cust["c_custkey"].to_numpy()
    cn = np.full(int(ck.max()) + 1 if len(ck) else 1, -1, np.int32)
    cn[ck] = cust["c_nationkey"].to_numpy().astype(np.int32)
    nmap = dict(zip(nat["n_nationkey"].to_numpy().tolist(),
                    nat["n_name"].to_pylist()))

    ok_s = ot["o_orderkey"].to_numpy()
    oc_s = ot["o_custkey"].to_numpy()
    order = np.argsort(ok_s, kind="stable")
    pos = np.searchsorted(ok_s[order], okeys)
    custkey = oc_s[order][pos]
    natkey = cn[custkey]

    est_c = np.asarray(round_half_away(est_w, 0), np.float64) \
        .astype(np.int64)  # integer-cents quantization: exact fold
    df = pd.DataFrame({
        "nation": [nmap.get(int(x), "?") for x in natkey],
        "est_c": est_c})
    g = df.groupby("nation", as_index=False).agg(
        n_sampled=("est_c", "size"), est_cents=("est_c", "sum"))
    g = g.sort_values("nation").reset_index(drop=True)
    return pa.table({
        "nation": pa.array(g["nation"], pa.string()),
        "n_sampled": pa.array(g["n_sampled"].to_numpy(np.int64),
                              pa.int64()),
        "est_revenue": pa.array(
            np.asarray(round_half_away(
                g["est_cents"].to_numpy(np.int64) / 100.0, 2),
                np.float64), pa.float64()),
    })


def decayed_cmcu_user_estimates(sf_dir: str, half_life_days: int = 30,
                                width: int = 1 << 14) -> pa.Table:
    """Time-decayed CM-CU: the reference's core operator (weighted
    conservative-update point estimates, src/sketch.cpp:136-161)
    maintained over FORWARD-DECAYED integer weights instead of raw counts
    — the sketch-native realization of "recent activity matters more"
    (the weight quantization and landmark rule are shared with the exact
    `analytics.decayed_heavy_users`, which is this query's oracle-gated
    twin).

    ONE events pass: each batch pre-aggregates (user, Σ integer decayed
    weight) and feeds a weighted CU partial; partials merge shuffle-free.
    Weighted CU never undercounts, so every estimate ≥ the exact decayed
    weight (pinned in pytest). Probes the exact twin's heavy users plus
    known-absent keys. Returns (user_id, est_decayed, decayed_score)."""
    from ..kernels.countmin import CountMinCU
    from ..pipelines._sqlgen import DECAY_SCALE, decay_weights
    from ..pipelines._util import parquet_minmax
    from ..pipelines.analytics import decayed_heavy_users

    _, tmax = parquet_minmax(f"{sf_dir}/events.parquet", "ts")
    t_day = np.datetime64(tmax, "D")
    weights = decay_weights(half_life_days)
    seed = 42

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        sk = CountMinCU(depth=4, width=width, seed=seed)
        day = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        age = (t_day - day).astype(np.int64)
        w = np.where((age >= 0) & (age < len(weights)),
                     weights[np.clip(age, 0, len(weights) - 1)], 0)
        t = pa.table({"u": batch["user_id"],
                      "w": pa.array(w.astype(np.int64))})
        g = t.group_by("u").aggregate([("w", "sum")]) \
            .rename_columns(["u", "ws"])
        sk.update(g["u"].to_numpy(zero_copy_only=False).astype(np.int64),
                  g["ws"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"partial": pa.array([sk.to_bytes()],
                                             pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    sk = CountMinCU(depth=4, width=width, seed=seed)
    for raw in parts["partial"]:
        sk.merge(CountMinCU.from_bytes(bytes(raw)))

    heavy = decayed_heavy_users(sf_dir, half_life_days).to_pandas()
    probes = heavy["user_id"].to_numpy(np.int64)
    est = sk.query(probes) if len(probes) else np.array([], np.int64)
    return pa.table({
        "user_id": pa.array(probes, pa.int64()),
        "est_decayed": pa.array(
            np.asarray(round_half_away(
                np.asarray(est, np.float64) / float(DECAY_SCALE), 6),
                np.float64), pa.float64()),
        "decayed_score": pa.array(heavy["decayed_score"].to_numpy(np.float64),
                                  pa.float64()),
    })


def lang_overlap_estimates(sf_dir: str, k: int = 4096) -> pa.Table:
    """Per-language vocabulary overlap from GROUPED theta sketches: one
    ``groupby(lang).aggregate(SketchAgg(bottomk))`` pass builds a KB-sized
    coordinated bottom-k state per language; every pairwise
    union/intersection/Jaccard estimate then comes from theta set ops on
    the driver (Dasgupta et al. 2016) — the sketch answer to the exact
    oracle-gated twin `analytics.lang_token_overlap`, which shuffles the
    full distinct (token, lang) relation. At 10^12 docs the exact path's
    vocab-bounded fold still moves the whole vocabulary; this one moves
    L×k hashes. Exact whenever both sides are unsaturated (theta = 1).
    Returns (lang_a, lang_b, est_common, est_union, est_jaccard) ordered
    by the pair."""
    from ..kernels.base import sketch_from_bytes
    from ..kernels.bottomk import theta_set_ops
    from ..stages.agg import SketchAgg
    from ..stages.sketch_build import SketchSpec

    ds = _read(sf_dir, "documents", ["text", "lang"])
    spec = SketchSpec("v", "bottomk", "text", mode="tokens",
                      params={"k": int(k), "seed": 42})
    rows = (ds.groupby("lang")
            .aggregate(SketchAgg(spec, alias_name="state",
                                 finalize="bytes"))).to_pandas()
    rows = rows.sort_values("lang").reset_index(drop=True)
    langs = rows["lang"].astype(str).tolist()
    sks = [sketch_from_bytes(b) for b in rows["state"]]

    la, lb, common, union, jac = [], [], [], [], []
    for i in range(len(langs)):
        for j in range(i + 1, len(langs)):
            ops = theta_set_ops(sks[i], sks[j])
            la.append(langs[i])
            lb.append(langs[j])
            common.append(float(round_half_away(ops["est_intersect"], 2)))
            union.append(float(round_half_away(ops["est_union"], 2)))
            jac.append(float(round_half_away(
                ops["est_intersect"] / ops["est_union"], 6))
                if ops["est_union"] > 0 else 0.0)
    return pa.table({
        "lang_a": pa.array(la, pa.string()),
        "lang_b": pa.array(lb, pa.string()),
        "est_common": pa.array(common, pa.float64()),
        "est_union": pa.array(union, pa.float64()),
        "est_jaccard": pa.array(jac, pa.float64()),
    })
