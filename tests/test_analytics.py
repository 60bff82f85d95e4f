"""Tests for pipelines/analytics.py — EWMA, CUSUM, attribution, language
overlap, percent ranks, NTILE. Every adaptive operator gets a forced
non-default-branch equality test (house invariant, CLAUDE.md)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _daily(con_sql: str = ""):
    return duckdb.sql(
        f"""SELECT event_type, date_trunc('day', ts) AS day,
                   count(*) AS c
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    ).df()


def test_ewma_matches_pandas_recurrence(ray_session):
    from sketch_ray.pipelines.analytics import events_ewma_daily
    from sketch_ray.pipelines._util import round6

    out = events_ewma_daily(SF).to_pandas()
    daily = _daily()
    want = []
    for et, g in daily.groupby("event_type", sort=True):
        e = g["c"].astype(float).ewm(alpha=0.5, adjust=False).mean()
        want.extend(round6(e.to_numpy()).tolist())
    assert np.allclose(out["ewma"].to_numpy(), np.array(want), atol=1.1e-6)
    assert len(out) == len(daily)


def test_cusum_matches_bruteforce(ray_session):
    from sketch_ray.pipelines.analytics import cusum_changepoint
    from sketch_ray.pipelines._util import round6

    out = cusum_changepoint(SF).to_pandas().set_index("event_type")
    daily = _daily()
    for et, g in daily.groupby("event_type", sort=True):
        c = g["c"].to_numpy().astype(object)  # python ints: exact
        n, tot = len(c), int(sum(c))
        best = None
        pre = 0
        for i, ci in enumerate(c):
            pre += int(ci)
            dev = float(round6(abs(pre * n - (i + 1) * tot) / n))
            if best is None or dev > best[0]:
                best = (dev, g["day"].iloc[i])
        assert out.loc[et, "max_dev"] == pytest.approx(best[0], abs=1e-9)
        assert pd.Timestamp(out.loc[et, "change_day"]) == pd.Timestamp(best[1])


def test_attribution_branches_agree_and_conserve(ray_session):
    from sketch_ray.pipelines.analytics import revenue_attribution

    a = revenue_attribution(SF, force="driver").to_pandas()
    b = revenue_attribution(SF, force="partitioned").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # conservation: every order is attributed exactly once
    orders = duckdb.sql(
        f"""SELECT count(*) AS n,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
            FROM read_parquet('{SF}/orders.parquet')"""
    ).fetchone()
    assert int(a["n_orders"].sum()) == orders[0]
    assert float(a["attributed_revenue"].sum()) == pytest.approx(
        orders[1] / 100.0, abs=0.05)


def test_lang_token_overlap_branches_and_bruteforce(ray_session):
    from sketch_ray.pipelines.analytics import lang_token_overlap
    from sketch_ray.pipelines._util import round6

    a = lang_token_overlap(SF, force="driver").to_pandas()
    b = lang_token_overlap(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    docs = duckdb.sql(
        f"SELECT lang, text FROM read_parquet('{SF}/documents.parquet')").df()
    sets: dict[str, set] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        sets.setdefault(lang, set()).update(text.split(" "))
    for _, row in a.iterrows():
        sa, sb = sets[row["lang_a"]], sets[row["lang_b"]]
        inter, union = len(sa & sb), len(sa | sb)
        assert row["n_common"] == inter
        assert row["n_union"] == union
        assert row["jaccard"] == pytest.approx(float(round6(inter / union)))


def test_doc_length_percentiles_branches_and_rank(ray_session):
    from sketch_ray.pipelines.analytics import doc_length_percentiles

    a = doc_length_percentiles(SF, force="driver").to_pandas()
    b = doc_length_percentiles(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    docs = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM read_parquet('{SF}/documents.parquet')"
        " ORDER BY doc_id").df()
    for lang, g in docs.groupby("lang"):
        n = len(g)
        want = (g["n_chars"].rank(method="min") - 1) / max(n - 1, 1)
        got = a.set_index("doc_id").loc[g["doc_id"], "pct_rank"]
        assert np.allclose(got.to_numpy(), want.to_numpy(), atol=1.1e-6)


def test_ntiles_branches_and_duckdb(ray_session):
    from sketch_ray.pipelines.analytics import customer_balance_ntiles

    a = customer_balance_ntiles(SF, force="driver").to_pandas()
    b = customer_balance_ntiles(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    want = duckdb.sql(
        f"""WITH t AS (
                SELECT c_mktsegment,
                       CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
                       ntile(10) OVER (PARTITION BY c_mktsegment
                                       ORDER BY c_acctbal, c_custkey) AS tile
                FROM read_parquet('{SF}/customer.parquet'))
            SELECT c_mktsegment, CAST(tile AS BIGINT) AS tile,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS sum_balance
            FROM t GROUP BY 1, 2 ORDER BY 1, 2""").df()
    got = a[["c_mktsegment", "tile", "n_customers", "sum_balance"]]
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # tile populations differ by at most one within a segment
    for _, g in a.groupby("c_mktsegment"):
        assert g["n_customers"].max() - g["n_customers"].min() <= 1


def test_ntile_formula_matches_sql_semantics():
    from sketch_ray.pipelines.analytics import _ntile_of_rank

    for n in (1, 3, 9, 10, 11, 25, 100):
        got = _ntile_of_rank(np.arange(n), n, 10)
        want = duckdb.sql(
            f"SELECT ntile(10) OVER (ORDER BY i) AS t FROM range({n}) r(i)"
            " ORDER BY i").df()["t"].to_numpy()
        assert (got == want).all()


def test_trigrams_branches_and_duckdb(ray_session):
    from sketch_ray.pipelines.analytics import event_type_trigrams

    a = event_type_trigrams(SF, force="driver").to_pandas()
    b = event_type_trigrams(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    want = duckdb.sql(
        f"""WITH s AS (
                SELECT event_type AS t1,
                       lead(event_type, 1) OVER w AS t2,
                       lead(event_type, 2) OVER w AS t3
                FROM read_parquet('{SF}/events.parquet')
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS cnt
            FROM s WHERE t3 IS NOT NULL GROUP BY 1,2,3 ORDER BY 1,2,3""").df()
    pd.testing.assert_frame_equal(a, want.astype(a.dtypes.to_dict()))


def test_pair_expand_vectorization():
    from sketch_ray.pipelines.analytics import _pair_expand

    ok = np.array([5, 5, 5, 9, 9, 2], np.int64)
    pk = np.array([3, 1, 7, 4, 2, 8], np.int64)
    a, b = _pair_expand(ok, pk)
    got = sorted(zip(a.tolist(), b.tolist()))
    assert got == [(1, 3), (1, 7), (2, 4), (3, 7)]
    a, b = _pair_expand(np.array([], np.int64), np.array([], np.int64))
    assert len(a) == 0 and len(b) == 0


def test_copurchase_branches_agree(ray_session):
    from sketch_ray.pipelines.analytics import copurchase_pairs

    a = copurchase_pairs(SF, force="driver").to_pandas()
    b = copurchase_pairs(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert (a["pk_a"] < a["pk_b"]).all()
    # counts are non-increasing down the ranking
    assert (np.diff(a["cnt"].to_numpy()) <= 0).all()


def test_ship_latency_branches_agree(ray_session):
    from sketch_ray.pipelines.analytics import ship_latency_histogram

    a = ship_latency_histogram(SF, force="driver").to_pandas()
    b = ship_latency_histogram(SF, force="native").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    n_li = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet')").fetchone()[0]
    assert int(a["n_lines"].sum()) == n_li  # inner join loses no lineitem


def test_autocorr_lag0_is_one(ray_session):
    from sketch_ray.pipelines.analytics import daily_autocorrelation

    out = daily_autocorrelation(SF, lags=(0,)).to_pandas()
    assert len(out) > 0
    assert np.allclose(out["autocorr"].to_numpy(), 1.0)


def test_first_digit_profile_sums(ray_session):
    from sketch_ray.pipelines.analytics import first_digit_profile

    out = first_digit_profile(SF).to_pandas()
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/orders.parquet')").fetchone()[0]
    assert int(out["n_orders"].sum()) == n
    assert out["share"].sum() == pytest.approx(1.0, abs=1e-4)
    assert out["benford_p"].sum() == pytest.approx(1.0, abs=1e-4)


def test_regression_matches_numpy_polyfit(ray_session):
    from sketch_ray.pipelines.analytics import length_token_regression

    out = length_token_regression(SF).to_pandas()
    docs = duckdb.sql(
        f"""SELECT lang, n_chars AS x, len(string_split(text, ' ')) AS y
            FROM read_parquet('{SF}/documents.parquet')""").df()
    for _, row in out.iterrows():
        g = docs[docs["lang"] == row["lang"]]
        slope, intercept = np.polyfit(g["x"], g["y"], 1)
        assert row["slope"] == pytest.approx(slope, abs=1e-4)
        assert row["intercept"] == pytest.approx(intercept, abs=1e-2)
        r = np.corrcoef(g["x"], g["y"])[0, 1]
        assert row["r2"] == pytest.approx(r * r, abs=1e-4)


def test_spearman_branches_and_scipy_free_check(ray_session):
    from sketch_ray.pipelines.analytics import length_token_spearman

    a = length_token_spearman(SF, force="driver").to_pandas()
    b = length_token_spearman(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    docs = duckdb.sql(
        f"""SELECT lang, n_chars AS x, len(string_split(text, ' ')) AS y
            FROM read_parquet('{SF}/documents.parquet')""").df()
    for _, row in a.iterrows():
        g = docs[docs["lang"] == row["lang"]]
        rx = g["x"].rank(method="average")
        ry = g["y"].rank(method="average")
        want = np.corrcoef(rx, ry)[0, 1]
        assert row["spearman"] == pytest.approx(want, abs=1e-5)
        assert -1.0 <= row["spearman"] <= 1.0


def test_conversion_branches_agree(ray_session):
    from sketch_ray.pipelines.analytics import event_order_conversion

    a = event_order_conversion(SF, force="driver").to_pandas()
    b = event_order_conversion(SF, force="partitioned").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_converted"] <= a["n_events"]).all()
    assert ((a["conv_rate"] >= 0) & (a["conv_rate"] <= 1)).all()


def test_copurchase_components_branches_and_invariants(ray_session):
    from sketch_ray.pipelines.analytics import copurchase_components

    a = copurchase_components(SF, force="driver").to_pandas()
    b = copurchase_components(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # every label is a member of its own component (min-node semantics)
    reps = set(a["component_rep"])
    assert reps <= set(a["p_partkey"])
    assert (a.set_index("p_partkey").loc[sorted(reps), "component_rep"]
            .to_numpy() == sorted(reps)).all()


def test_holt_matches_bruteforce(ray_session):
    from sketch_ray.pipelines.analytics import holt_linear_forecast

    out = holt_linear_forecast(SF).to_pandas()
    daily = _daily()
    for et, g in daily.groupby("event_type", sort=True):
        c = g["c"].astype(float).to_numpy()
        if len(c) < 2:
            continue
        lev, tr = c[0], c[1] - c[0]
        for i in range(1, len(c)):
            prev = lev
            lev = 0.5 * c[i] + 0.5 * (lev + tr)
            tr = 0.5 * (lev - prev) + 0.5 * tr
        sub = out[out["event_type"] == et].set_index("h")
        for h in range(1, 8):
            assert sub.loc[h, "forecast"] == pytest.approx(lev + h * tr, abs=2e-6)


def test_brand_lift_branches_agree(ray_session):
    from sketch_ray.pipelines.analytics import brand_copurchase_lift

    a = brand_copurchase_lift(SF, force="driver").to_pandas()
    b = brand_copurchase_lift(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert (a["lift"] > 0).all()
    assert (np.diff(a["lift"].to_numpy()) <= 0).all()


def test_ltv_deciles_balanced(ray_session):
    from sketch_ray.pipelines.analytics import user_ltv_deciles

    out = user_ltv_deciles(SF).to_pandas()
    n_cust = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert int(out["n_customers"].sum()) == n_cust
    assert out["n_customers"].max() - out["n_customers"].min() <= 1
    # deciles are revenue-ordered: min of decile d+1 >= max of decile d
    assert (out["min_revenue"].to_numpy()[1:]
            >= out["max_revenue"].to_numpy()[:-1]).all()


def test_skyline_prune_identity_and_dominance(ray_session):
    from sketch_ray.pipelines.analytics import order_skyline

    a = order_skyline(SF).to_pandas()
    b = order_skyline(SF, force="driver").to_pandas()  # no local prune
    pd.testing.assert_frame_equal(a, b)
    allo = duckdb.sql(
        f"""SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
                   o_orderdate FROM read_parquet('{SF}/orders.parquet')""").df()
    # no skyline member is weakly dominated by any order
    for _, row in a.iterrows():
        c = int(round(row["o_totalprice"] * 100))
        d = row["o_orderdate"]
        dom = allo[((allo["cents"] >= c) & (allo["o_orderdate"] >= d))
                   & ((allo["cents"] > c) | (allo["o_orderdate"] > d))]
        assert len(dom) == 0


def test_skyline_kernel_handles_duplicates():
    from sketch_ray.pipelines.analytics import _skyline_2d

    cents = np.array([10, 10, 5, 7], np.int64)
    day = np.array([3, 3, 9, 3], np.int64)
    keys = np.arange(4, dtype=np.int64)
    keep = sorted(keys[_skyline_2d(cents, day, keys)].tolist())
    # the two exact duplicates both survive; (7,3) is dominated by (10,3)
    assert keep == [0, 1, 2]


def test_modal_priority_matches_duckdb(ray_session):
    from sketch_ray.pipelines.analytics import modal_priority_per_nation

    out = modal_priority_per_nation(SF).to_pandas()
    want = duckdb.sql(
        f"""WITH c AS (
                SELECT n.n_name, o.o_orderpriority, count(*) AS cnt
                FROM read_parquet('{SF}/orders.parquet') o
                JOIN read_parquet('{SF}/customer.parquet') cu
                  ON cu.c_custkey = o.o_custkey
                JOIN read_parquet('{SF}/nation.parquet') n
                  ON n.n_nationkey = cu.c_nationkey
                GROUP BY 1, 2)
            SELECT n_name, o_orderpriority AS modal_priority,
                   CAST(cnt AS BIGINT) AS n_orders
            FROM c QUALIFY row_number() OVER (PARTITION BY n_name
                ORDER BY cnt DESC, o_orderpriority) = 1
            ORDER BY n_name""").df()
    pd.testing.assert_frame_equal(out, want.astype(out.dtypes.to_dict()))


def test_pagerank_stationary_and_stochastic(ray_session):
    from sketch_ray.pipelines.analytics import nation_pagerank, _fold_trade_edges

    out = nation_pagerank(SF).to_pandas()
    assert out["pagerank"].sum() == pytest.approx(1.0, abs=1e-4)
    assert (out["pagerank"] > 0).all()
    # fixed point: one more iteration moves nothing (within round6 quantum)
    flows = _fold_trade_edges(SF)
    nations = sorted(set(flows["supp_nation"]) | set(flows["cust_nation"]))
    idx = {n: i for i, n in enumerate(nations)}
    n = len(nations)
    W = np.zeros((n, n))
    for _, r in flows.iterrows():
        W[idx[r["supp_nation"]], idx[r["cust_nation"]]] += float(r["n_items"])
    ow = W.sum(axis=1)
    P = np.divide(W, ow[:, None], out=np.zeros_like(W), where=ow[:, None] > 0)
    dang = ow == 0
    r = out.set_index("nation").loc[nations, "pagerank"].to_numpy()
    r = r / r.sum()
    nxt = 0.15 / n + 0.85 * (P.T @ r + r[dang].sum() / n)
    assert np.abs(nxt - r).max() < 5e-6


def test_attr_match_empty_events_side():
    """Review fix: an empty events side must put every order in '(none)',
    not IndexError (empty partitions are routine at scale)."""
    from sketch_ray.pipelines.analytics import _attr_match

    sums, cnts, none_c, none_n = _attr_match(
        np.array([1, 2], np.int64), np.array([10, 20], np.int64),
        np.array([100, 200], np.int64),
        np.array([], np.int64), np.array([], np.int64),
        np.array([], np.int64), np.array([], np.int64), 3)
    assert sums.sum() == 0 and cnts.sum() == 0
    assert none_c == 300 and none_n == 2


def test_unique_pairs_overflow_fallback():
    """Review fix: huge key products take the structured-unique path and
    still dedup exactly."""
    from sketch_ray.pipelines.analytics import _unique_pairs

    big = np.int64(1) << 60
    a = np.array([big, big, big + 1], np.int64)
    b = np.array([7, 7, 9], np.int64)
    ua, ub = _unique_pairs(a, b)
    assert sorted(zip(ua.tolist(), ub.tolist())) == [(big, 7), (big + 1, 9)]


def test_bounce_rate_branches_and_totals(ray_session):
    from sketch_ray.pipelines.analytics import session_bounce_rate

    a = session_bounce_rate(SF, force="driver").to_pandas()
    b = session_bounce_rate(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    total_sessions = duckdb.sql(
        f"""WITH e AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM read_parquet('{SF}/events.parquet')
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT sum(new_s) FROM e""").fetchone()[0]
    assert int(a["n_sessions"].sum()) == total_sessions
    assert (a["n_bounce"] <= a["n_sessions"]).all()


def test_moving_avg_window_edges(ray_session):
    from sketch_ray.pipelines.analytics import daily_moving_avg
    from sketch_ray.pipelines._util import round6

    out = daily_moving_avg(SF).to_pandas()
    daily = _daily()
    for et, g in daily.groupby("event_type", sort=True):
        c = g["c"].to_numpy()
        sub = out[out["event_type"] == et]["ma"].to_numpy()
        for i in range(len(c)):
            lo = max(i - 6, 0)
            want = float(round6(float(c[lo:i + 1].sum()) / (i + 1 - lo)))
            assert sub[i] == pytest.approx(want, abs=1e-9)


def test_id_gap_audit_branches_and_planted_gap(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.analytics import id_gap_audit

    a = id_gap_audit(SF, force="driver").to_pandas()
    b = id_gap_audit(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # planted corpus: ids 1..10 with 4,7 missing and one duplicate 9
    ids = [1, 2, 3, 5, 6, 8, 9, 9, 10]
    pq.write_table(pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array([0] * len(ids), pa.timestamp("us")),
        "user_id": pa.array([1] * len(ids), pa.int64()),
        "event_type": pa.array(["view"] * len(ids), pa.string()),
        "value": pa.array([0.0] * len(ids), pa.float64()),
        "props": pa.array(["{}"] * len(ids), pa.string()),
    }), tmp_path / "events.parquet")
    out = id_gap_audit(str(tmp_path)).to_pandas().iloc[0]
    assert out["min_id"] == 1 and out["max_id"] == 10
    assert out["n_missing"] == 2 and out["n_duplicate"] == 1


def test_copurchase_rules_branches_and_bounds(ray_session):
    from sketch_ray.pipelines.analytics import copurchase_rules

    a = copurchase_rules(SF, force="driver").to_pandas()
    b = copurchase_rules(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert ((a["confidence"] > 0) & (a["confidence"] <= 1)).all()
    assert ((a["support"] > 0) & (a["support"] <= 1)).all()
    assert (a["support"] <= a["confidence"] + 1e-9).all()  # n_a <= N


def test_monthly_growth_reconciles(ray_session):
    from sketch_ray.pipelines.analytics import monthly_revenue_growth

    out = monthly_revenue_growth(SF).to_pandas()
    total = duckdb.sql(
        f"""SELECT round(sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0, 2),
                   count(DISTINCT date_trunc('month', o_orderdate))
            FROM read_parquet('{SF}/orders.parquet')""").fetchone()
    assert len(out) == total[1] - 1  # first month dropped
    # growth recomputes from the revenue column itself
    rev = out["revenue"].to_numpy()
    g = out["growth"].to_numpy()
    recomputed = (rev[1:] - rev[:-1]) / rev[:-1]
    assert np.allclose(g[1:], recomputed, atol=2e-6)


def test_latency_quantiles_monotone_and_in_range(ray_session):
    from sketch_ray.pipelines.analytics import ship_latency_quantiles

    a = ship_latency_quantiles(SF, force="driver").to_pandas()
    b = ship_latency_quantiles(SF, force="native").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    for _, g in a.groupby("o_orderpriority"):
        v = g.sort_values("q")["latency_days"].to_numpy()
        assert (np.diff(v) >= 0).all()


def test_cohort_curves_branches_and_duckdb(ray_session):
    from sketch_ray.pipelines.analytics import cohort_revenue_curves

    a = cohort_revenue_curves(SF, force="driver").to_pandas()
    b = cohort_revenue_curves(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    want = duckdb.sql(
        f"""WITH f AS (
                SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort
                FROM read_parquet('{SF}/orders.parquet') GROUP BY 1
            ), o AS (
                SELECT o.o_custkey, f.cohort,
                       CAST((year(o.o_orderdate)*12 + month(o.o_orderdate))
                            - (year(f.cohort)*12 + month(f.cohort)) AS BIGINT) AS month_offset,
                       CAST(round(o.o_totalprice*100) AS BIGINT) AS cents
                FROM read_parquet('{SF}/orders.parquet') o
                JOIN f ON f.o_custkey = o.o_custkey)
            SELECT cohort AS cohort_month, month_offset,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   round(CAST(sum(cents) AS DOUBLE)/100.0, 2) AS revenue,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active
            FROM o GROUP BY 1, 2 ORDER BY 1, 2""").df()
    pd.testing.assert_frame_equal(a, want.astype(a.dtypes.to_dict()))
    # offset 0 cell of each cohort has every cohort member active
    first = a[a["month_offset"] == 0]
    assert (first["n_active"] >= 1).all()


def test_wedge_expand_keeps_apex():
    from sketch_ray.pipelines.analytics import _wedge_expand

    src = np.array([1, 1, 1, 4, 4, 9], np.int64)
    dst = np.array([7, 2, 5, 3, 8, 6], np.int64)
    u, v, w = _wedge_expand(src, dst)
    got = sorted(zip(u.tolist(), v.tolist(), w.tolist()))
    assert got == [(1, 2, 5), (1, 2, 7), (1, 5, 7), (4, 3, 8)]
    assert (v < w).all()
    u, v, w = _wedge_expand(np.array([], np.int64), np.array([], np.int64))
    assert len(u) == len(v) == len(w) == 0


def test_copurchase_triangles_branches_and_oracle(ray_session):
    """Both adaptive branches byte-equal, and the degree-oriented count
    matches an independent brute-force triangle enumeration (adjacency
    matrix trace) over the same edge set."""
    from sketch_ray.pipelines.analytics import (_copurchase_pair_counts,
                                                copurchase_triangles)

    a = copurchase_triangles(SF, force="driver").to_pandas()
    b = copurchase_triangles(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert (np.diff(a["tri_cnt"].to_numpy()) <= 0).all()

    edges = _copurchase_pair_counts(SF, force="driver")
    nodes, inv = np.unique(
        np.concatenate([edges["pk_a"].to_numpy(np.int64),
                        edges["pk_b"].to_numpy(np.int64)]),
        return_inverse=True)
    n = len(nodes)
    A = np.zeros((n, n), np.int64)
    ia, ib = inv[:len(edges)], inv[len(edges):]
    A[ia, ib] = 1
    A[ib, ia] = 1
    per_node = np.diag(A @ A @ A) // 2  # closed length-3 walks / 2
    total = int(per_node.sum()) // 3
    assert int(a["total_triangles"].iloc[0]) == total
    truth = dict(zip(nodes.tolist(), per_node.tolist()))
    for _, row in a.iterrows():
        assert truth[int(row["pk"])] == int(row["tri_cnt"])
    # the top-k cut is the true maximum: no excluded node beats the last row
    kth = int(a["tri_cnt"].iloc[-1])
    shown = set(a["pk"].tolist())
    better = [p for p, t in truth.items() if t > kth and p not in shown]
    assert not better


def test_copurchase_clustering_branches_and_truth(ray_session):
    from sketch_ray.pipelines._util import round6
    from sketch_ray.pipelines.analytics import (_copurchase_pair_counts,
                                                _triangle_counts,
                                                copurchase_clustering)

    a = copurchase_clustering(SF, force="driver").to_pandas()
    b = copurchase_clustering(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert ((a["cc"] >= 0) & (a["cc"] <= 1)).all()
    assert (np.diff(a["cc"].to_numpy()) <= 0).all()

    # cc(v) == tri(v) / C(deg,2) recomputed from raw edges, and the global
    # transitivity identity 3*total / sum_wedges
    edges = _copurchase_pair_counts(SF, force="driver")
    ea = edges["pk_a"].to_numpy(np.int64)
    eb = edges["pk_b"].to_numpy(np.int64)
    nodes_, invc = np.unique(np.concatenate([ea, eb]), return_inverse=True)
    degc = np.bincount(invc)
    degree = dict(zip(nodes_.tolist(), degc.tolist()))
    nodes, deg, tri, total = _triangle_counts(SF, force="driver")
    for _, row in a.iterrows():
        d = degree[int(row["pk"])]
        assert d == int(row["degree"])
        i = int(np.searchsorted(nodes, int(row["pk"])))
        expect = round6(tri[i] / (d * (d - 1) // 2))
        assert float(row["cc"]) == expect
    wedges = int((degc.astype(np.int64) * (degc - 1) // 2).sum())
    assert float(a["global_cc"].iloc[0]) == round6(3.0 * total / wedges)


def test_copurchase_bfs_layers_branches_and_truth(ray_session):
    from collections import deque

    from sketch_ray.pipelines.analytics import (_copurchase_pair_counts,
                                                copurchase_bfs_layers)

    a = copurchase_bfs_layers(SF, force="driver").to_pandas()
    b = copurchase_bfs_layers(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)

    # independent queue BFS over an adjacency dict, same source rule
    edges = _copurchase_pair_counts(SF, force="driver")
    adj: dict[int, set[int]] = {}
    for x, y in zip(edges["pk_a"].tolist(), edges["pk_b"].tolist()):
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    src = min(adj, key=lambda v: (-len(adj[v]), v))
    dist = {src: 0}
    q = deque([src])
    while q:
        v = q.popleft()
        if dist[v] >= 6:
            continue
        for w in adj[v]:
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    want: dict[int, int] = {}
    for d in dist.values():
        want[d] = want.get(d, 0) + 1
    unreached = len(adj) - len(dist)
    if unreached:
        want[-1] = unreached
    got = dict(zip(a["layer"].tolist(), a["n_nodes"].tolist()))
    assert got == want
    assert got[0] == 1  # the source is its own layer
    assert sum(got.values()) == len(adj)  # every node accounted for once


def test_copurchase_kcore_branches_and_truth(ray_session):
    from sketch_ray.pipelines.analytics import (_copurchase_pair_counts,
                                                copurchase_kcore_census)

    a = copurchase_kcore_census(SF, force="driver").to_pandas()
    b = copurchase_kcore_census(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    cnt = a["n_surviving"].to_numpy(np.int64)
    assert (np.diff(cnt) <= 0).all()  # peeling only removes
    # once the census plateaus it stays flat (synchronous-peel fixpoint)
    flat = np.flatnonzero(np.diff(cnt) == 0)
    if len(flat):
        assert (np.diff(cnt[flat[0]:]) == 0).all()

    # independent set-based synchronous peel, same k and round bound
    edges = _copurchase_pair_counts(SF, force="driver")
    adj: dict[int, set[int]] = {}
    for x, y in zip(edges["pk_a"].tolist(), edges["pk_b"].tolist()):
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    s = set(adj)
    want = [(0, len(s))]
    for r in range(1, 9):
        s = {v for v in s if len(adj[v] & s) >= 3}
        if not s:
            break
        want.append((r, len(s)))
    assert list(zip(a["iter"].tolist(), a["n_surviving"].tolist())) == want


def test_decay_weights_exact_powers():
    """Forward-decay weight quantization hits exact powers of two at
    whole half-lives (2^30 · 2^-k is integral for k ≤ 30) and decays to
    exactly 0 past ~30.5 half-lives."""
    from sketch_ray.pipelines._sqlgen import DECAY_SCALE, decay_weights

    w = decay_weights(30)
    assert w[0] == DECAY_SCALE
    for k in range(1, 8):
        assert w[30 * k] == DECAY_SCALE >> k
    assert w[-1] == 0 and (w[:-1] > 0).all()
    # monotone nonincreasing
    assert (np.diff(w) <= 0).all()


def test_decayed_type_counts_forced_branches_and_recompute(ray_session):
    """Both adaptive branches agree; decayed counts equal an independent
    pandas recomputation from the same integer weight table; a type's
    decayed count is ≤ its raw count and > 0."""
    from sketch_ray.pipelines._sqlgen import DECAY_SCALE, decay_weights
    from sketch_ray.pipelines._util import round6
    from sketch_ray.pipelines.analytics import decayed_type_counts

    a = decayed_type_counts(SF, force="driver").to_pandas()
    b = decayed_type_counts(SF, force="dist").to_pandas()
    pd.testing.assert_frame_equal(b, a.astype(b.dtypes.to_dict()))

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    t_day = ev["ts"].dt.floor("D").max()
    age = (t_day - ev["ts"].dt.floor("D")).dt.days.to_numpy()
    weights = decay_weights(30)
    w = np.where(age < len(weights),
                 weights[np.minimum(age, len(weights) - 1)], 0)
    want = pd.DataFrame({"event_type": ev["event_type"], "w": w}) \
        .groupby("event_type", sort=True)["w"].sum()
    m = dict(zip(a["event_type"], a["decayed_count"]))
    for et, sw in want.items():
        assert m[et] == float(round6(int(sw) / float(DECAY_SCALE)))
    raw = ev.groupby("event_type").size()
    for _, row in a.iterrows():
        assert 0 < row["decayed_count"] <= raw[row["event_type"]]
        assert int(row["n_events"]) == int(raw[row["event_type"]])


def test_decayed_heavy_users_threshold_partition(ray_session):
    """Both branches agree; every kept user strictly beats 6/5 × mean
    decayed weight and every dropped user doesn't (exact integer rule)."""
    from sketch_ray.pipelines._sqlgen import decay_weights
    from sketch_ray.pipelines.analytics import decayed_heavy_users

    a = decayed_heavy_users(SF, force="driver").to_pandas()
    b = decayed_heavy_users(SF, force="dist").to_pandas()
    pd.testing.assert_frame_equal(b, a.astype(b.dtypes.to_dict()))

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "user_id"])
    t_day = ev["ts"].dt.floor("D").max()
    age = (t_day - ev["ts"].dt.floor("D")).dt.days.to_numpy()
    weights = decay_weights(30)
    w = np.where(age < len(weights),
                 weights[np.minimum(age, len(weights) - 1)], 0)
    per = pd.DataFrame({"user_id": ev["user_id"], "w": w}) \
        .groupby("user_id")["w"].sum()
    nu, tot = len(per), int(per.sum())
    want = {int(u) for u, x in per.items() if int(x) * nu * 5 > 6 * tot}
    assert set(a["user_id"]) == want


def test_assortativity_forced_branches_and_networkx_free_recompute(ray_session):
    """Both adaptive branches agree; r matches an independent float
    Pearson correlation over the directed endpoint degree pairs (to 1e-9
    — the pipeline is exact-integer, the check is reference float); and
    r ∈ [−1, 1]."""
    from sketch_ray.pipelines.analytics import copurchase_assortativity

    a = copurchase_assortativity(SF, force="driver").to_pandas()
    b = copurchase_assortativity(SF, force="dist").to_pandas()
    pd.testing.assert_frame_equal(b, a.astype(b.dtypes.to_dict()))
    r = float(a["assortativity"].iloc[0])
    assert -1.0 <= r <= 1.0

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    lp = li.drop_duplicates()
    j = lp.merge(lp, on="l_orderkey")
    j = j[j["l_partkey_x"] < j["l_partkey_y"]]
    e = j[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
    deg = pd.concat([e["l_partkey_x"], e["l_partkey_y"]]) \
        .value_counts().to_dict()
    x = np.concatenate([e["l_partkey_x"].map(deg).to_numpy(float),
                        e["l_partkey_y"].map(deg).to_numpy(float)])
    y = np.concatenate([e["l_partkey_y"].map(deg).to_numpy(float),
                        e["l_partkey_x"].map(deg).to_numpy(float)])
    want = np.corrcoef(x, y)[0, 1]
    assert abs(r - want) < 1e-6
    assert int(a["n_edges"].iloc[0]) == len(e)
    assert int(a["n_nodes"].iloc[0]) == len(deg)


def test_pagerank_forced_branches_and_float_recompute(ray_session):
    """Both adaptive branches agree exactly (integer fixed-point scores);
    the fixed-point result tracks an independent FLOAT power iteration on
    the same edge set to ~1e-9 relative (1e12 quantization + floor-loss
    envelope); top ranks are deterministic under the (pr_fp DESC, pk)
    tie-break; teleport-only lower bound holds for every node."""
    from sketch_ray.pipelines.analytics import copurchase_pagerank

    a = copurchase_pagerank(SF, force="driver").to_pandas()
    b = copurchase_pagerank(SF, force="dist").to_pandas()
    pd.testing.assert_frame_equal(b, a.astype(b.dtypes.to_dict()))
    assert len(a) == 25
    assert (a["pr_fp"].to_numpy()[:-1] >= a["pr_fp"].to_numpy()[1:]).all()

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    lp = li.drop_duplicates()
    j = lp.merge(lp, on="l_orderkey")
    j = j[j["l_partkey_x"] < j["l_partkey_y"]]
    e = j[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
    nodes, inv = np.unique(
        np.concatenate([e["l_partkey_x"].to_numpy(np.int64),
                        e["l_partkey_y"].to_numpy(np.int64)]),
        return_inverse=True)
    ia, ib = inv[:len(e)], inv[len(e):]
    src = np.concatenate([ia, ib])
    dst = np.concatenate([ib, ia])
    n = len(nodes)
    deg = np.bincount(src, minlength=n).astype(float)
    pr = np.full(n, 1.0 / n)
    for _ in range(8):
        contrib = 0.85 * pr[src] / deg[src]
        acc = np.zeros(n)
        np.add.at(acc, dst, contrib)
        pr = 0.15 / n + acc
    ref = dict(zip(nodes.tolist(), pr.tolist()))
    for pk, fp in zip(a["pk"], a["pr_fp"]):
        # fixed-point floors lose at most iters * (1 ulp per edge fold)
        assert abs(fp / 1e12 - ref[int(pk)]) < 1e-6
        assert fp >= (3 * 10 ** 12) // (20 * n)  # teleport lower bound


def test_random_walks_validity_and_branches(ray_session):
    """Walks are valid paths (every hop is a graph edge), start at the
    top-degree nodes, have exactly length+1 steps each, are identical
    across the two pair-fold branches, and replay the documented hash
    rule hop-for-hop."""
    from sketch_ray.kernels.hashing import splitmix64
    from sketch_ray.pipelines.analytics import copurchase_random_walks

    a = copurchase_random_walks(SF, force="driver").to_pandas()
    b = copurchase_random_walks(SF, force="dist").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 16 * 9

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    lp = li.drop_duplicates()
    j = lp.merge(lp, on="l_orderkey")
    j = j[j["l_partkey_x"] < j["l_partkey_y"]]
    e = j[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
    edges = set(zip(e["l_partkey_x"], e["l_partkey_y"])) \
        | set(zip(e["l_partkey_y"], e["l_partkey_x"]))
    adj: dict = {}
    for x, y in edges:
        adj.setdefault(int(x), []).append(int(y))
    for v in adj.values():
        v.sort()

    starts = sorted(adj, key=lambda v: (-len(adj[v]), v))[:16]
    for wid in range(16):
        w = a[a["walk_id"] == wid].sort_values("step")
        nodes = w["node"].tolist()
        assert nodes[0] == starts[wid]
        for step, (u, v) in enumerate(zip(nodes, nodes[1:])):
            assert (u, v) in edges
            h = int(splitmix64(np.uint64(u * 1000003 + wid * 7919 + step)))
            assert v == adj[u][h % len(adj[u])]


def test_lpa_communities_branches_and_recompute(ray_session):
    """Both pair-fold branches agree; the labeling matches an
    independent per-node Counter-based synchronous LPA with the
    (count DESC, label ASC) tie-break; sizes partition the node set."""
    from collections import Counter

    from sketch_ray.pipelines.analytics import copurchase_communities

    a = copurchase_communities(SF, force="driver").to_pandas()
    b = copurchase_communities(SF, force="dist").to_pandas()
    pd.testing.assert_frame_equal(b, a.astype(b.dtypes.to_dict()))

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    lp = li.drop_duplicates()
    j = lp.merge(lp, on="l_orderkey")
    j = j[j["l_partkey_x"] < j["l_partkey_y"]]
    ec = j.groupby(["l_partkey_x", "l_partkey_y"]).size()
    ec = ec[ec >= 2].reset_index()
    adj: dict = {}
    for x, y in zip(ec["l_partkey_x"], ec["l_partkey_y"]):
        adj.setdefault(int(x), []).append(int(y))
        adj.setdefault(int(y), []).append(int(x))
    lab = {v: v for v in adj}
    for _ in range(4):
        new = {}
        for v in adj:
            cnt = Counter(lab[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    sizes = Counter(lab.values())
    want = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = list(zip(a["community"].astype(int), a["size"].astype(int)))
    assert got == want
    assert int(a["n_communities"].iloc[0]) == len(sizes)
    assert sum(sizes.values()) == len(adj)


def test_pagerank_mass_conservation(ray_session):
    """Total fixed-point mass stays within the floor-loss envelope of the
    initial 1e12: each round loses < 1 unit per directed edge plus the
    teleport floor per node — a global invariant the recompute test
    doesn't pin."""
    from sketch_ray.pipelines.analytics import (_copurchase_pair_counts,
                                                copurchase_pagerank)

    full = copurchase_pagerank(SF, k=10 ** 9).to_pandas()  # all nodes
    agg = _copurchase_pair_counts(SF, None)
    n_edges_directed = 2 * len(agg)
    n = full["pk"].nunique()
    total = int(full["pr_fp"].sum())
    scale = 10 ** 12
    max_floor_loss = 8 * (n_edges_directed + n + 1)
    assert scale - max_floor_loss <= total <= scale


def test_ktruss_census_recompute_and_invariants(ray_session):
    """The census matches an independent per-round recompute using a
    brute-force per-edge triangle-support count (dict-of-sets closure);
    counts are non-increasing; surviving edges after round r all have
    support >= k-2 within the round-(r-1) graph."""
    from sketch_ray.pipelines.analytics import copurchase_ktruss_census

    k = 12
    a = copurchase_ktruss_census(SF, k=k, force="driver").to_pandas()
    b = copurchase_ktruss_census(SF, k=k, force="dist").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    n = a["n_edges"].to_numpy()
    assert (n[:-1] >= n[1:]).all()

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    lp = li.drop_duplicates()
    j = lp.merge(lp, on="l_orderkey")
    j = j[j["l_partkey_x"] < j["l_partkey_y"]]
    e = {(int(x), int(y)) for x, y in
         zip(j["l_partkey_x"], j["l_partkey_y"])}
    want = [len(e)]
    for _ in range(4):
        adj: dict = {}
        for x, y in e:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        e = {(x, y) for (x, y) in e
             if len(adj[x] & adj[y]) >= k - 2}
        want.append(len(e))
    assert a["n_edges"].tolist() == want


def test_weighted_pagerank_branches_and_recompute(ray_session):
    """Both branches agree; the weighted fixed-point result tracks an
    independent float weighted power iteration to the quantization
    envelope; weighting actually changes the ranking vs the unweighted
    query on this corpus."""
    from sketch_ray.pipelines.analytics import (copurchase_pagerank,
                                                copurchase_pagerank_weighted)

    a = copurchase_pagerank_weighted(SF, force="driver").to_pandas()
    b = copurchase_pagerank_weighted(SF, force="dist").to_pandas()
    pd.testing.assert_frame_equal(b, a.astype(b.dtypes.to_dict()))
    u = copurchase_pagerank(SF).to_pandas()
    assert a["pk"].tolist() != u["pk"].tolist()

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    lp = li.drop_duplicates()
    j = lp.merge(lp, on="l_orderkey")
    j = j[j["l_partkey_x"] < j["l_partkey_y"]]
    ec = j.groupby(["l_partkey_x", "l_partkey_y"]).size().reset_index(name="w")
    nodes, inv = np.unique(
        np.concatenate([ec["l_partkey_x"].to_numpy(np.int64),
                        ec["l_partkey_y"].to_numpy(np.int64)]),
        return_inverse=True)
    ia, ib = inv[:len(ec)], inv[len(ec):]
    src = np.concatenate([ia, ib]); dst = np.concatenate([ib, ia])
    w = np.concatenate([ec["w"].to_numpy(float)] * 2)
    n = len(nodes)
    strength = np.zeros(n); np.add.at(strength, src, w)
    pr = np.full(n, 1.0 / n)
    for _ in range(8):
        contrib = 0.85 * pr[src] * w / strength[src]
        acc = np.zeros(n); np.add.at(acc, dst, contrib)
        pr = 0.15 / n + acc
    ref = dict(zip(nodes.tolist(), pr.tolist()))
    for pk, fp in zip(a["pk"], a["pr_fp"]):
        assert abs(fp / 1e12 - ref[int(pk)]) < 1e-6


def test_seed_eccentricity_recompute(ray_session):
    """Matches an independent dict-BFS recompute per seed; seeds are
    exactly the top-degree nodes; eccentricity <= radius; n_reached
    includes the seed itself; branch identity."""
    from collections import deque

    from sketch_ray.pipelines.analytics import copurchase_seed_eccentricity

    a = copurchase_seed_eccentricity(SF, force="driver").to_pandas()
    b = copurchase_seed_eccentricity(SF, force="dist").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert (a["eccentricity"] <= 6).all() and (a["n_reached"] >= 1).all()

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    lp = li.drop_duplicates()
    j = lp.merge(lp, on="l_orderkey")
    j = j[j["l_partkey_x"] < j["l_partkey_y"]]
    e = j[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
    adj: dict = {}
    for x, y in zip(e["l_partkey_x"], e["l_partkey_y"]):
        adj.setdefault(int(x), set()).add(int(y))
        adj.setdefault(int(y), set()).add(int(x))
    seeds = sorted(sorted(adj), key=lambda v: (-len(adj[v]), v))[:16]
    assert sorted(a["seed"]) == sorted(seeds)
    for _, r in a.iterrows():
        dist = {int(r["seed"]): 0}
        q = deque([int(r["seed"])])
        while q:
            u = q.popleft()
            if dist[u] >= 6:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        assert int(r["eccentricity"]) == max(dist.values())
        assert int(r["n_reached"]) == len(dist)
        want_h = sum(60 // d for d in dist.values() if d >= 1)
        assert int(r["harmonic_fp"]) == want_h
        assert abs(r["harmonic"]
                   - want_h / 60.0 / (len(adj) - 1)) < 1e-6
