"""Relational pipeline tests: broadcast join, windows, sessionization."""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def test_revenue_per_nation(ray_session):
    from sketch_ray.pipelines.relational import revenue_per_nation

    got = revenue_per_nation(SF).to_pandas()
    want = _duck().execute("""
        SELECT n.n_name, round(sum(o.o_totalprice),2) AS revenue, count(*) AS n_orders
        FROM orders o JOIN customer c ON c.c_custkey=o.o_custkey
        JOIN nation n ON n.n_nationkey=c.c_nationkey
        GROUP BY n.n_name ORDER BY n.n_name""").df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_sessionize_users(ray_session):
    from sketch_ray.pipelines.relational import sessionize_users

    got = sessionize_users(SF, gap_minutes=30).to_pandas()
    want = _duck().execute("""
        WITH e AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                             ROWS UNBOUNDED PRECEDING) AS sess FROM e
        ), per AS (SELECT user_id, sess, count(*) c FROM s GROUP BY user_id, sess)
        SELECT user_id, count(*) AS n_sessions, max(c) AS max_session_events
        FROM per GROUP BY user_id ORDER BY user_id""").df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_daily_windows(ray_session):
    from sketch_ray.pipelines.relational import events_daily_windows

    got = events_daily_windows(SF).to_pandas()
    want = _duck().execute("""
        SELECT date_trunc('day', ts) AS day, event_type,
               round(sum(value),4) AS value_sum, count(*) AS n_events
        FROM events GROUP BY day, event_type ORDER BY day, event_type""").df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_asof_partitioned_equals_broadcast(ray_session):
    """The two as-of physical plans (broadcast small-side vs hash-partition
    both sides + in-partition sort-merge) must agree row-for-row."""
    from sketch_ray.pipelines.relational import asof_latest_order

    SF = "/root/testdata/sf0.001"
    bc = asof_latest_order(SF, mode="broadcast").to_pandas()
    pt = asof_latest_order(SF, mode="partitioned").to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        bc.reset_index(drop=True), pt.reset_index(drop=True))


def test_revenue_per_priority_join_plans_agree(ray_session, monkeypatch):
    """Adaptive join selection: forcing the hash-shuffle Dataset.join branch
    (broadcast threshold -> 0) must give the same table as the broadcast
    map-side plan."""
    from sketch_ray.pipelines import relational

    small = relational.revenue_per_priority(SF).to_pandas()
    monkeypatch.setattr(relational, "_BCAST_JOIN_BYTES", 0)
    shuffled = relational.revenue_per_priority(SF).to_pandas()
    pd.testing.assert_frame_equal(shuffled, small.astype(shuffled.dtypes.to_dict()))


def test_events_per_type_plans_agree(ray_session, monkeypatch):
    """events_per_type's driver fold (small path) and two-level distributed
    groupby must produce identical tables."""
    from sketch_ray.pipelines import exact

    small = exact.events_per_type(SF).to_pandas()
    monkeypatch.setattr(exact, "_SMALL_ROWS", 0)
    dist = exact.events_per_type(SF).to_pandas()
    pd.testing.assert_frame_equal(dist, small.astype(dist.dtypes.to_dict()))


def test_top_orders_plans_agree(ray_session, monkeypatch):
    """top_orders' partial top-k plan must equal the full sort().limit()
    plan (including the deterministic tie-break)."""
    from sketch_ray.pipelines import relational

    partial = relational.top_orders(SF, k=50).to_pandas()
    monkeypatch.setattr(relational, "_TOPK_PLAN", "sort")
    full_sort = relational.top_orders(SF, k=50).to_pandas()
    pd.testing.assert_frame_equal(partial, full_sort.astype(partial.dtypes.to_dict()))


def test_range_join_events_brute_force(ray_session):
    """Interval join via elementary-segment decomposition must equal the
    brute-force per-interval overlap count (overlapping windows: an event
    inside two campaigns counts in both)."""
    import numpy as np
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import range_join_events

    got = range_join_events(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "value"])
    ts = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    val = ev["value"].to_numpy()
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    rows = []
    for i in range(20):
        lo = base + i * 36 * 3_600_000_000
        hi = lo + 48 * 3_600_000_000
        m = (ts >= lo) & (ts < hi)
        if m.sum():
            rows.append((i, int(m.sum()), round(float(val[m].sum()), 6)))
    want = pd.DataFrame(rows, columns=["campaign_id", "n_events", "total_value"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # overlap sanity: total joined rows exceed the distinct events in range
    n_distinct = int(((ts >= base) & (ts < base + (19 * 36 + 48) * 3_600_000_000)).sum())
    assert got["n_events"].sum() > n_distinct


def test_relational_adaptive_plans_agree(ray_session, monkeypatch):
    """The five group-bounded queries' driver-fold plan (default at test
    scale) must equal the distributed-groupby plan (forced via
    _SMALL_ROWS=0)."""
    from sketch_ray.pipelines import relational

    queries = [
        relational.revenue_per_nation,
        relational.pricing_summary,
        relational.events_daily_windows,
        relational.events_hopping_windows,
        relational.bloom_semi_join,
        lambda sf: relational.sessionize_users(sf, gap_minutes=30),
        lambda sf: relational.rolling_user_stats(sf, k=3),
        relational.funnel_steps,
    ]
    small = [q(SF).to_pandas() for q in queries]
    monkeypatch.setattr(relational, "_SMALL_ROWS", 0)
    for q, s in zip(queries, small):
        d = q(SF).to_pandas()
        pd.testing.assert_frame_equal(d, s.astype(d.dtypes.to_dict()))


def test_range_join_rows_consistent_with_aggregate(ray_session):
    """Counting the row-level interval join per campaign must reproduce the
    aggregating form's n_events exactly."""
    from sketch_ray.pipelines.relational import (range_join_events,
                                                 range_join_events_rows)

    rows = range_join_events_rows(SF).to_pandas()
    agg = range_join_events(SF).to_pandas()
    got = rows.groupby("campaign_id").size()
    want = agg.set_index("campaign_id")["n_events"]
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_props_field_stats_branches_and_malformed(ray_session, tmp_path):
    """Driver fold and distributed groupby agree on the real corpus; a
    synthetic corpus with absent/malformed props counts them as missing
    without contaminating sum/max."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.exact import props_field_stats

    a = props_field_stats(SF, force="driver").to_pandas()
    b = props_field_stats(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_events"] - a["n_missing"] > 0).all()

    sf = str(tmp_path)
    pq.write_table(pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array([0] * 6, pa.timestamp("us")),
        "user_id": pa.array([1] * 6, pa.int64()),
        "event_type": pa.array(["a", "a", "a", "b", "b", "b"]),
        "value": pa.array([0.0] * 6),
        "props": pa.array(['{"k": 5}', '{"k": -2}', '{}',
                           '{"j": 9}', 'not json', '{"k": 7}']),
    }), f"{sf}/events.parquet")
    out = props_field_stats(sf, force="driver").to_pandas().set_index("event_type")
    assert out.loc["a", "sum_k"] == 3 and out.loc["a", "max_k"] == 5
    assert out.loc["a", "n_missing"] == 1
    assert out.loc["b", "sum_k"] == 7 and out.loc["b", "n_missing"] == 2
    out2 = props_field_stats(sf, force="distributed").to_pandas().set_index("event_type")
    pd.testing.assert_frame_equal(out.reset_index(), out2.reset_index())


def test_rolling_user_stats_hand_case(ray_session, tmp_path):
    """Trailing-3 moving average, checked by hand: the window resets at the
    user boundary and grows 1->2->3 rows at the start of each user."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import rolling_user_stats

    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "ts": pa.array([base + np.timedelta64(m, "m") for m in (0, 1, 2, 3, 0)],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 10.0], pa.float64()),
    }), f"{tmp_path}/events.parquet")
    out = rolling_user_stats(str(tmp_path), k=3).to_pandas()
    assert out["rn"].tolist() == [1, 2, 3, 4, 1]
    assert out["mov_avg"].tolist() == [1.0, 1.5, 2.0, 3.0, 10.0]


def test_user_event_gaps_hand_case(ray_session, tmp_path):
    """LAG-gap aggregate, checked by hand: gaps 2s+3s -> mean 2.5 / max 3;
    a single-event user is excluded; fractional-second gaps are exact at
    6dp. Driver and bucketed plans agree on real data."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import user_event_gaps

    base = np.datetime64("2024-01-01T00:00:00", "us")
    off_us = [0, 2_000_000, 5_000_000, 0, 0, 1_500_000]
    pq.write_table(pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([base + np.timedelta64(u, "us") for u in off_us],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
    }), f"{tmp_path}/events.parquet")
    out = user_event_gaps(str(tmp_path)).to_pandas()
    assert out["user_id"].tolist() == [1, 3]
    assert out["n_events"].tolist() == [3, 2]
    assert out["mean_gap_s"].tolist() == [2.5, 1.5]
    assert out["max_gap_s"].tolist() == [3.0, 1.5]

    a = user_event_gaps(SF, force="driver").to_pandas()
    b = user_event_gaps(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_customer_order_profile_left_outer(ray_session):
    """LEFT OUTER semantics: the driver-merge plan and the native
    Dataset.join(left_outer) plan agree; every customer appears exactly
    once; customers without orders exist and are zero-filled."""
    from sketch_ray.pipelines.relational import customer_order_profile

    a = customer_order_profile(SF, force="driver").to_pandas()
    b = customer_order_profile(SF, force="native").to_pandas()
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    want = _duck().execute("""
        SELECT c.c_custkey, coalesce(o.n, 0)::BIGINT AS n_orders,
               round(coalesce(o.s, 0), 2) AS total_spent
        FROM customer c LEFT JOIN (
            SELECT o_custkey, count(*) n, sum(o_totalprice) s
            FROM orders GROUP BY o_custkey) o ON o.o_custkey = c.c_custkey
        ORDER BY c.c_custkey""").df()
    pd.testing.assert_frame_equal(a, want.astype(a.dtypes.to_dict()))
    assert a["c_custkey"].is_unique


def test_customer_order_profile_zero_fill(ray_session, tmp_path):
    """Hand case: a customer with no orders survives the left join with
    n_orders=0 / total_spent=0.0 on both physical plans."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import customer_order_profile

    pq.write_table(pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())}),
                   f"{tmp_path}/customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 3], pa.int64()),
        "o_totalprice": pa.array([10.0, 5.0, 2.5], pa.float64()),
    }), f"{tmp_path}/orders.parquet")
    for force in ("driver", "native"):
        out = customer_order_profile(str(tmp_path), force=force).to_pandas()
        assert out["c_custkey"].tolist() == [1, 2, 3]
        assert out["n_orders"].tolist() == [2, 0, 1]
        assert out["total_spent"].tolist() == [15.0, 0.0, 2.5]


def test_funnel_steps_hand_case(ray_session, tmp_path):
    """Strict-order semantics checked by hand: a click at or before the
    first view does not advance the funnel; same-ts does not count."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import funnel_steps

    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [  # (user, minutes, type)
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),   # full funnel
        (2, 0, "click"), (2, 1, "view"), (2, 2, "purchase"),   # click too early
        (3, 0, "view"), (3, 0, "click"),                        # same-ts tie
    ]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([base + np.timedelta64(m, "m") for _, m, _ in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "event_type": pa.array([t for _, _, t in rows]),
    }), f"{tmp_path}/events.parquet")
    out = funnel_steps(str(tmp_path)).to_pandas()
    assert out["step_name"].tolist() == ["view", "click", "purchase"]
    assert out["n_users"].tolist() == [3, 1, 1]


def test_user_activity_reconcile_full_outer(ray_session, tmp_path):
    """FULL OUTER hand case: an events-only user, a customers-only
    account, and a matched pair all survive with correct flags and
    zero-fills; driver and native plans agree on real data."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import user_activity_reconcile

    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([base] * 3, pa.timestamp("us")),
        "user_id": pa.array([3, 3, 2], pa.int64()),  # 3 events-only (odd)
        "event_type": pa.array(["view"] * 3),
        "value": pa.array([1.5, 2.5, 7.0], pa.float64()),
        "props": pa.array(["{}"] * 3),
    }), f"{tmp_path}/events.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([2, 4, 5], pa.int64()),  # 4 cust-only, 5 odd->filtered
        "c_name": pa.array(["a", "b", "c"]),
        "c_nationkey": pa.array([0, 0, 0], pa.int64()),
        "c_acctbal": pa.array([10.0, 20.0, 30.0], pa.float64()),
        "c_mktsegment": pa.array(["x", "x", "x"]),
    }), f"{tmp_path}/customer.parquet")
    out = user_activity_reconcile(str(tmp_path)).to_pandas()
    assert out["key"].tolist() == [2, 3, 4]
    assert out["in_events"].tolist() == [1, 1, 0]
    assert out["in_customers"].tolist() == [1, 0, 1]
    assert out["n_events"].tolist() == [1, 2, 0]
    assert out["total_value"].tolist() == [7.0, 4.0, 0.0]
    assert out["acctbal"].tolist() == [10.0, 0.0, 20.0]

    a = user_activity_reconcile(SF, force="driver").to_pandas()
    b = user_activity_reconcile(SF, force="native").to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_dau_and_retention_hand_case(ray_session, tmp_path):
    """DAU and cohort retention by hand: user 1 first active day 0 and
    returning day 2, user 2 joins day 2; duplicate events within a day
    count once for DAU/retention but fully for n_events."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import (daily_active_users,
                                                 user_retention_cohorts)

    d0 = np.datetime64("2024-01-01T05:00:00", "us")
    d2 = np.datetime64("2024-01-03T07:00:00", "us")
    ts = [d0, d0 + np.timedelta64(1, "h"), d2, d2, d2 + np.timedelta64(2, "h")]
    users = [1, 1, 1, 2, 2]
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["view"] * 5),
        "value": pa.array([1.0] * 5, pa.float64()),
        "props": pa.array(["{}"] * 5),
    }), f"{tmp_path}/events.parquet")

    dau = daily_active_users(str(tmp_path)).to_pandas()
    assert dau["n_users"].tolist() == [1, 2]
    assert dau["n_events"].tolist() == [2, 3]

    ret = user_retention_cohorts(str(tmp_path)).to_pandas()
    # cohort day0: user 1 at offsets 0 and 2; cohort day2: user 2 at 0
    rows = list(zip(ret["cohort"].dt.day.tolist(),
                    ret["day_offset"].tolist(), ret["n_users"].tolist()))
    assert rows == [(1, 0, 1), (1, 2, 1), (3, 0, 1)]

    for fn in (daily_active_users, user_retention_cohorts):
        a = fn(SF, force="driver").to_pandas()
        b = fn(SF, force="distributed").to_pandas()
        pd.testing.assert_frame_equal(
            a, b.astype(a.dtypes.to_dict()))


def test_event_transitions_hand_case(ray_session, tmp_path):
    """Transition matrix by hand: user boundaries break pairs, counts and
    row-normalized probabilities are exact."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import event_transitions

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # user 1: a -> b -> a ; user 2: a -> c  (no pair across the boundary)
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array([base + np.timedelta64(m, "m") for m in (0, 1, 2, 0, 1)],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "a", "c"]),
        "value": pa.array([1.0] * 5, pa.float64()),
        "props": pa.array(["{}"] * 5),
    }), f"{tmp_path}/events.parquet")
    out = event_transitions(str(tmp_path)).to_pandas()
    rows = list(zip(out["from_type"], out["to_type"], out["n"], out["p"]))
    assert rows == [("a", "b", 1, 0.5), ("a", "c", 1, 0.5), ("b", "a", 1, 1.0)]

    a = event_transitions(SF, force="driver").to_pandas()
    b = event_transitions(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_top_return_customers_plans_and_oracle(ray_session):
    """Q10-shape composed query: adaptive join branches agree and match
    DuckDB exactly (revenue rounding, rank tie-break, decoration joins)."""
    from sketch_ray.pipelines.relational import top_return_customers

    a = top_return_customers(SF, k=10, force="driver").to_pandas()
    b = top_return_customers(SF, k=10, force="native").to_pandas()
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    want = _duck().execute("""
        WITH r AS (
            SELECT o.o_custkey AS c_custkey,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_returnflag = 'R' GROUP BY 1),
        top AS (SELECT * FROM r ORDER BY revenue DESC, c_custkey LIMIT 10)
        SELECT CAST(row_number() OVER (ORDER BY revenue DESC, top.c_custkey)
                    AS BIGINT) AS rank,
               top.c_custkey, c.c_name, n.n_name, revenue,
               CAST(n_items AS BIGINT) AS n_items
        FROM top JOIN customer c ON c.c_custkey = top.c_custkey
                 JOIN nation n ON n.n_nationkey = c.c_nationkey
        ORDER BY rank""").df()
    pd.testing.assert_frame_equal(a, want.astype(a.dtypes.to_dict()))


def test_daily_type_deltas_hand_case(ray_session, tmp_path):
    """Day-over-day LAG semantics: first present day gets prev 0; gaps use
    the previous PRESENT day (LAG over present rows, not calendar days)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import daily_type_deltas

    d = np.datetime64("2024-01-01T10:00:00", "us")
    day3 = d + np.timedelta64(2, "D")
    ts = [d, d, day3, day3, day3]  # type 'a': day1 x2, day3 x3 (day2 gap)
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * 5, pa.int64()),
        "event_type": pa.array(["a"] * 5),
        "value": pa.array([1.0] * 5, pa.float64()),
        "props": pa.array(["{}"] * 5),
    }), f"{tmp_path}/events.parquet")
    out = daily_type_deltas(str(tmp_path)).to_pandas()
    assert out["n_events"].tolist() == [2, 3]
    assert out["prev_events"].tolist() == [0, 2]
    assert out["delta"].tolist() == [2, 1]


def test_event_anomaly_days_hand_case(ray_session, tmp_path):
    """One engineered spike: type 'a' has ten 1-event days and one 20-event
    day (z ≈ +3.01 — the only |z| ≥ 2 row); a single-day type and a
    zero-variance type are excluded; result matches DuckDB's windowed
    z-score on the same parquet."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import event_anomaly_days

    rows = []
    day0 = np.datetime64("2024-01-01T00:00:00", "us")
    for d in range(11):                       # type a: 1/day, day 10 has 20
        n = 20 if d == 10 else 1
        for i in range(n):
            rows.append((day0 + np.timedelta64(d, "D") + np.timedelta64(i, "m"),
                         "a"))
    rows.append((day0, "single_day"))         # nd=1 -> excluded
    for d in range(3):                        # constant type: sd=0 -> excluded
        rows.append((day0 + np.timedelta64(d, "D"), "flat"))
    ts = pa.array([r[0] for r in rows], pa.timestamp("us"))
    et = pa.array([r[1] for r in rows], pa.string())
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()), "ts": ts,
        "user_id": pa.array([1] * n, pa.int64()), "event_type": et,
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), f"{tmp_path}/events.parquet")

    out = event_anomaly_days(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "event_type"] == "a"
    assert out.loc[0, "n_events"] == 20
    assert out.loc[0, "z"] > 3

    ref = duckdb.sql(f"""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day, event_type,
                   count(*) AS n_events
            FROM read_parquet('{tmp_path}/events.parquet')
            GROUP BY day, event_type
        ), stats AS (
            SELECT day, event_type, n_events,
                   avg(n_events) OVER (PARTITION BY event_type) AS mu,
                   stddev_samp(n_events) OVER (PARTITION BY event_type) AS sd,
                   count(*) OVER (PARTITION BY event_type) AS nd
            FROM daily)
        SELECT day, event_type, n_events, round((n_events - mu) / sd, 6) AS z
        FROM stats
        WHERE nd >= 2 AND sd > 0 AND abs(round((n_events - mu) / sd, 6)) >= 2
        ORDER BY day, event_type""").df()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_user_first_seen_curve_branches_and_identity(ray_session):
    """Adaptive branches agree; cum_users is the running sum of new_users
    and ends at the exact distinct-user count."""
    import numpy as np

    from sketch_ray.pipelines.relational import user_first_seen_curve

    a = user_first_seen_curve(SF).to_pandas()
    b = user_first_seen_curve(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert (a["cum_users"].to_numpy() == np.cumsum(a["new_users"].to_numpy())).all()
    want = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert a["cum_users"].iloc[-1] == want


def test_order_rank_in_priority_hand_case_and_branches(ray_session, tmp_path):
    """RANK semantics by hand: tied prices share a rank and the next rank
    skips; percent_rank = (rank-1)/(n-1); single-row group gets 0.
    Adaptive plans agree and match DuckDB at sf0.001."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import order_rank_in_priority

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([1] * 5, pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5),
        "o_totalprice": pa.array([10.0, 10.0, 20.0, 5.0, 7.0], pa.float64()),
        "o_orderdate": pa.array(["1996-01-01"] * 5),
        "o_orderpriority": pa.array(["1-URGENT"] * 4 + ["2-HIGH"]),
    }), f"{tmp_path}/orders.parquet")
    out = order_rank_in_priority(str(tmp_path)).to_pandas()
    urgent = out[out["o_orderpriority"] == "1-URGENT"]
    assert urgent["o_orderkey"].tolist() == [4, 1, 2, 3]
    assert urgent["rnk"].tolist() == [1, 2, 2, 4]          # tie at rank 2, skip 3
    assert urgent["pct_rank"].tolist() == [0.0, round(1/3, 6), round(1/3, 6), 1.0]
    single = out[out["o_orderpriority"] == "2-HIGH"]
    assert single["rnk"].tolist() == [1] and single["pct_rank"].tolist() == [0.0]

    a = order_rank_in_priority(SF, force="driver").to_pandas()
    b = order_rank_in_priority(SF, force="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ref = duckdb.sql(f"""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               rank() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rnk,
               round(percent_rank() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_totalprice), 6) AS pct_rank
        FROM read_parquet('{SF}/orders.parquet')
        ORDER BY o_orderpriority, rnk, o_orderkey""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)


def test_heavy_revenue_customers_threshold_and_branches(ray_session, tmp_path):
    """Weighted threshold by hand in integer cents: total = 100.00 over 4
    customers (mean 25.00); at mult=1.0 only customers with >= 25.00
    qualify — including one at EXACTLY the threshold (the integer-cents
    comparison makes the boundary exact; 24.99 is excluded). Branches
    agree at sf0.001 and the result there is non-empty."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.relational import heavy_revenue_customers

    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5),
        "o_totalprice": pa.array([20.0, 20.0, 25.0, 24.99, 10.01], pa.float64()),
        "o_orderdate": pa.array(["1996-01-01"] * 5),
        "o_orderpriority": pa.array(["1-URGENT"] * 5),
    }), f"{tmp_path}/orders.parquet")
    out = heavy_revenue_customers(str(tmp_path), mult=1.0).to_pandas()
    assert out["o_custkey"].tolist() == [1, 2]      # 40.00, 25.00 (exact edge)
    assert out["revenue"].tolist() == [40.0, 25.0]

    a = heavy_revenue_customers(SF, force="driver").to_pandas()
    b = heavy_revenue_customers(SF, force="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_q6_and_dow_hour_profile_vs_duckdb(ray_session):
    """Q6 predicate-pushdown aggregate and the (dow, hour) seasonality
    profile both match DuckDB at sf0.001; dow follows DuckDB's Sunday=0."""
    from sketch_ray.pipelines.relational import dow_hour_profile, q6_forecast_revenue

    q6 = q6_forecast_revenue(SF).to_pandas()
    ref = duckdb.sql(f"""
        SELECT COALESCE(round(sum(l_extendedprice * l_discount), 2), 0.0) AS revenue,
               count(*) AS n_items
        FROM read_parquet('{SF}/lineitem.parquet')
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24""").df()
    pd.testing.assert_frame_equal(q6, ref, check_dtype=False)
    assert q6.loc[0, "n_items"] > 0   # the predicate actually admits rows

    a = dow_hour_profile(SF).to_pandas()
    b = dow_hour_profile(SF, force="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    refp = duckdb.sql(f"""
        SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hour,
               count(*) AS n_events, round(sum(value), 4) AS value_sum
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1, 2 ORDER BY dow, hour""").df()
    pd.testing.assert_frame_equal(a, refp, check_dtype=False)


def test_promo_share_and_supplier_region_vs_duckdb(ray_session):
    """Q14 promo share (part-dimension broadcast) and the snowflake
    supplier rollup both match DuckDB at sf0.001; the rollup's averages
    use half-away 2dp rounding (integer-cents quotients DO land on exact
    .5 ties)."""
    from sketch_ray.pipelines.relational import (promo_revenue_share,
                                                 supplier_region_balance)

    q14 = promo_revenue_share(SF).to_pandas()
    ref = duckdb.sql(f"""
        WITH x AS (
            SELECT l.l_extendedprice * (1 - l.l_discount) AS rev,
                   (p.p_type = 'PROMO') AS is_promo
            FROM read_parquet('{SF}/lineitem.parquet') l
            JOIN read_parquet('{SF}/part.parquet') p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1996-02-01')
        SELECT round(COALESCE(sum(rev) FILTER (is_promo), 0), 2) AS promo_revenue,
               round(COALESCE(sum(rev), 0), 2) AS total_revenue,
               round(100.0 * COALESCE(sum(rev) FILTER (is_promo), 0) / sum(rev), 6)
                   AS promo_pct
        FROM x""").df()
    pd.testing.assert_frame_equal(q14, ref, check_dtype=False)
    assert 0 < q14.loc[0, "promo_pct"] < 100

    a = supplier_region_balance(SF).to_pandas()
    b = supplier_region_balance(SF, force="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    refs = duckdb.sql(f"""
        WITH s AS (SELECT r.r_name, CAST(round(s_acctbal * 100) AS BIGINT) AS cents
                   FROM read_parquet('{SF}/supplier.parquet')
                   JOIN read_parquet('{SF}/nation.parquet') n ON s_nationkey = n.n_nationkey
                   JOIN read_parquet('{SF}/region.parquet') r ON n.n_regionkey = r.r_regionkey)
        SELECT r_name, count(*) AS n_suppliers,
               round(sum(cents) / 100.0, 2) AS total_bal,
               round(sum(cents) / 100.0 / count(*), 2) AS avg_bal
        FROM s GROUP BY r_name ORDER BY r_name""").df()
    pd.testing.assert_frame_equal(a, refs, check_dtype=False)


def test_events_value_histogram_identity_and_oracle(ray_session):
    """Float equi-width binning matches DuckDB bit-for-bit (same IEEE
    expression order on both sides) and total counts reconcile."""
    from sketch_ray.pipelines.relational import events_value_histogram

    a = events_value_histogram(SF).to_pandas()
    ref = duckdb.sql(f"""
        WITH mm AS (SELECT min(value) AS mn, max(value) AS mx
                    FROM read_parquet('{SF}/events.parquet'))
        SELECT CAST(least(floor((value - mn) * 20 / (mx - mn)), 19) AS BIGINT)
                   AS bin,
               count(*) AS n_events
        FROM read_parquet('{SF}/events.parquet'), mm
        GROUP BY 1 ORDER BY bin""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')").fetchone()[0]
    assert a["n_events"].sum() == n
    assert a["bin"].between(0, 19).all()


def test_ship_lag_days_plans_and_oracle(ray_session):
    """Both join plans (broadcast probe / pre-aggregated shuffle join)
    agree and match DuckDB's datediff histogram; lags are non-negative
    and totals reconcile with the lineitem count."""
    from sketch_ray.pipelines.relational import ship_lag_days

    a = ship_lag_days(SF, force="driver").to_pandas()
    b = ship_lag_days(SF, force="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ref = duckdb.sql(f"""
        SELECT datediff('day', date_trunc('day', o.o_orderdate),
                        date_trunc('day', l.l_shipdate)) AS lag_days,
               count(*) AS n_items
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/orders.parquet') o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1 ORDER BY lag_days""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)
    # synthetic dates are not causally ordered, so lags may be negative;
    # the histogram is still exact
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet')").fetchone()[0]
    assert a["n_items"].sum() == n


def test_local_supplier_revenue_vs_duckdb(ray_session):
    """TPC-H Q5 (6-table join, non-key c_nat=s_nat cross-condition):
    broadcast and native-join plans agree with each other and with
    DuckDB, integer 1e-4-unit revenue math on both sides."""
    from sketch_ray.pipelines.relational import local_supplier_revenue

    a = local_supplier_revenue(SF, force="driver").to_pandas()
    b = local_supplier_revenue(SF, force="native").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ref = duckdb.sql(f"""
        WITH x AS (
            SELECT n.n_name,
                   CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev4
            FROM read_parquet('{SF}/lineitem.parquet') l
            JOIN read_parquet('{SF}/orders.parquet') o ON l.l_orderkey = o.o_orderkey
            JOIN read_parquet('{SF}/customer.parquet') c ON o.o_custkey = c.c_custkey
            JOIN read_parquet('{SF}/supplier.parquet') s ON l.l_suppkey = s.s_suppkey
            JOIN read_parquet('{SF}/nation.parquet') n ON c.c_nationkey = n.n_nationkey
            JOIN read_parquet('{SF}/region.parquet') r ON n.n_regionkey = r.r_regionkey
            WHERE s.s_nationkey = c.c_nationkey AND r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01')
        SELECT n_name, count(*) AS n_items,
               round(sum(rev4) / 10000.0, 2) AS revenue
        FROM x GROUP BY n_name ORDER BY sum(rev4) DESC, n_name""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)
    assert len(a) > 0 and (a["n_items"] > 0).all()


def test_q17_small_quantity_revenue_vs_duckdb(ray_session):
    """Q17 correlated-aggregate filter: adaptive fold branches agree and
    match DuckDB with exact integer qty*5*n < sum(qty) arithmetic."""
    from sketch_ray.pipelines.relational import q17_small_quantity_revenue

    a = q17_small_quantity_revenue(SF, force="driver").to_pandas()
    b = q17_small_quantity_revenue(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ref = duckdb.sql(f"""
        WITH a AS (SELECT l_partkey,
                          sum(CAST(round(l_quantity) AS BIGINT)) AS sq,
                          count(*) AS c
                   FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1)
        SELECT count(*) AS n_items,
               round(COALESCE(sum(CAST(round(l.l_extendedprice * 100)
                                       AS BIGINT)), 0) / 700.0, 2) AS avg_yearly
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN a ON l.l_partkey = a.l_partkey
        WHERE CAST(round(l.l_quantity) AS BIGINT) * 5 * a.c < a.sq""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)
    assert int(a.loc[0, "n_items"]) > 0


def test_rolling_distinct_users_vs_duckdb(ray_session):
    """Sliding-window exact distinct: driver and hopping-expansion plans
    agree and match DuckDB's windowed count(DISTINCT)."""
    from sketch_ray.pipelines.relational import rolling_distinct_users

    a = rolling_distinct_users(SF, force="driver").to_pandas()
    b = rolling_distinct_users(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ref = duckdb.sql(f"""
        WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
                    FROM read_parquet('{SF}/events.parquet')),
             days AS (SELECT DISTINCT day FROM du)
        SELECT d.day AS day, count(DISTINCT u.user_id) AS n_users
        FROM days d JOIN du u
          ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
        GROUP BY 1 ORDER BY day""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)
    # windows only widen coverage: every rolling count >= that day's DAU
    dau = duckdb.sql(f"""
        SELECT date_trunc('day', ts) AS day, count(DISTINCT user_id) AS n
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1 ORDER BY 1""").df()
    m = a.merge(dau, on="day")
    assert (m["n_users"] >= m["n"]).all()


def test_events_pivot_daily_vs_duckdb(ray_session):
    """Long->wide pivot matches conditional aggregation and reconciles
    with the long-form windowed aggregate."""
    from sketch_ray.pipelines.relational import (events_daily_windows,
                                                 events_pivot_daily)

    w = events_pivot_daily(SF).to_pandas()
    ref = duckdb.sql(f"""
        SELECT date_trunc('day', ts) AS day,
               count(*) FILTER (event_type = 'click') AS n_click,
               count(*) FILTER (event_type = 'error') AS n_error,
               count(*) FILTER (event_type = 'purchase') AS n_purchase,
               count(*) FILTER (event_type = 'signup') AS n_signup,
               count(*) FILTER (event_type = 'view') AS n_view
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1 ORDER BY day""").df()
    pd.testing.assert_frame_equal(w, ref, check_dtype=False)
    long = events_daily_windows(SF).to_pandas()
    assert w[[c for c in w.columns if c != "day"]].to_numpy().sum() \
        == long["n_events"].sum()


def test_table_profile_and_fk_orphans(ray_session, tmp_path):
    """ANALYZE profile matches DuckDB per column (both branches); the FK
    audit matches DuckDB and detects a planted orphan."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import shutil

    from sketch_ray.pipelines.exact import table_profile
    from sketch_ray.pipelines.relational import fk_orphan_counts

    a = table_profile(SF, force="driver").to_pandas()
    b = table_profile(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ref = duckdb.sql(f"""
        SELECT * FROM (
          SELECT 'doc_id' AS "column", count(*) AS n_rows,
                 count(*) - count(doc_id) AS n_nulls,
                 count(DISTINCT doc_id) AS n_distinct
          FROM read_parquet('{SF}/documents.parquet')
          UNION ALL SELECT 'text', count(*), count(*) - count(text),
                 count(DISTINCT text) FROM read_parquet('{SF}/documents.parquet')
          UNION ALL SELECT 'lang', count(*), count(*) - count(lang),
                 count(DISTINCT lang) FROM read_parquet('{SF}/documents.parquet')
          UNION ALL SELECT 'source', count(*), count(*) - count(source),
                 count(DISTINCT source) FROM read_parquet('{SF}/documents.parquet')
          UNION ALL SELECT 'n_chars', count(*), count(*) - count(n_chars),
                 count(DISTINCT n_chars) FROM read_parquet('{SF}/documents.parquet'))
        ORDER BY "column" """).df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)

    base = fk_orphan_counts(SF).to_pandas()
    assert (base["n_orphans"] == 0).all() and (base["n_rows"] > 0).all()

    # plant one orphan event (user_id not in customer) in a variant dir
    d = tmp_path / "sf_orphan"
    d.mkdir()
    for t in ["documents", "events", "customer", "lineitem", "orders",
              "part", "supplier", "nation", "region", "embeddings"]:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    ev = pq.read_table(f"{SF}/events.parquet")
    bad = ev.slice(0, 1).set_column(
        ev.schema.get_field_index("user_id"), "user_id",
        pa.array([10**9], pa.int64()))
    pq.write_table(pa.concat_tables([ev, bad]), str(d / "events.parquet"))
    planted = fk_orphan_counts(str(d)).to_pandas()
    row = planted[planted["relation"] == "events.user_id->customer"]
    assert int(row["n_orphans"].iloc[0]) == 1
    assert int(row["n_rows"].iloc[0]) == ev.num_rows + 1


def test_tpch_batch_forced_branches_agree(ray_session):
    """The r4-s4 TPC-H-shape batch: each adaptive query's non-default
    branch (forced distributed/shuffle) must equal the default
    driver-side plan exactly (CLAUDE.md adaptive-plan invariant)."""
    from sketch_ray.pipelines import relational as R

    for fn in (R.q3_shipping_priority, R.q4_late_orders,
               R.q15_top_suppliers, R.q18_large_volume_orders,
               R.q22_idle_rich_customers, R.q21_waiting_suppliers):
        a = fn(SF, force="driver").to_pandas()
        b = fn(SF, force="dist").to_pandas()
        pd.testing.assert_frame_equal(b, a.astype(b.dtypes.to_dict()))


def test_q19_brackets_vs_duckdb(ray_session):
    """q19 bracket revenue matches an independently-written DuckDB
    formulation (per-bracket subqueries rather than the CASE join)."""
    from sketch_ray.pipelines.relational import _Q19_BRACKETS, q19_bracket_revenue

    got = q19_bracket_revenue(SF).to_pandas()
    con = duckdb.connect()
    for brand, slo, shi, qlo, qhi in _Q19_BRACKETS:
        want = con.execute(f"""
            SELECT count(*) AS n,
                   coalesce(round(sum(
                       CAST(round(l.l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                   )/10000.0, 2), 0.0) AS rev
            FROM read_parquet('{SF}/lineitem.parquet') l
            JOIN read_parquet('{SF}/part.parquet') p
              ON l.l_partkey = p.p_partkey
            WHERE p.p_brand = '{brand}' AND p.p_size BETWEEN {slo} AND {shi}
              AND l.l_quantity BETWEEN {qlo} AND {qhi}""").fetchone()
        row = got[got["bracket"] == brand].iloc[0]
        assert int(row["n_items"]) == int(want[0])
        assert float(row["revenue"]) == float(want[1])


def test_cheapest_supplier_forced_branch_and_encoding(ray_session):
    """Grouped argmin: the distributed Min-over-composite branch equals
    the driver fold, and the decoded winner matches a pandas argmin."""
    from sketch_ray.pipelines.relational import cheapest_supplier_per_part

    a = cheapest_supplier_per_part(SF, force="driver").to_pandas()
    b = cheapest_supplier_per_part(SF, force="dist").to_pandas()
    pd.testing.assert_frame_equal(b, a.astype(b.dtypes.to_dict()))

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity",
                                  "l_extendedprice"])
    li["unit"] = li["l_extendedprice"] / li["l_quantity"]
    want = li.sort_values(["l_partkey", "unit", "l_suppkey"]) \
        .groupby("l_partkey", as_index=False).first()
    m = a.merge(want, left_on="p_partkey", right_on="l_partkey")
    assert (m["s_suppkey"] == m["l_suppkey"]).all()


def test_order_count_distribution_forced_branch(ray_session):
    """Q13 counts-of-counts: distributed two-fold branch equals the
    driver fold, and total customer mass is conserved (Σ custdist =
    n_customers — the zero bucket included)."""
    from sketch_ray.pipelines.relational import order_count_distribution

    a = order_count_distribution(SF, force="driver").to_pandas()
    b = order_count_distribution(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(b, a)

    n_cust = len(pd.read_parquet(f"{SF}/customer.parquet",
                                 columns=["c_custkey"]))
    assert int(a["custdist"].sum()) == n_cust


def test_nation_trade_flows_forced_branch(ray_session):
    """Q7 flow matrix: the hash-shuffle-join branch equals the broadcast
    probe, no diagonal (supp==cust) cells survive, and one spot cell
    matches an independent pandas recomputation."""
    from sketch_ray.pipelines.relational import nation_trade_flows

    a = nation_trade_flows(SF, force="driver").to_pandas()
    b = nation_trade_flows(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(b, a)
    assert (a["supp_nation"] != a["cust_nation"]).all()

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    su = pd.read_parquet(f"{SF}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    na = pd.read_parquet(f"{SF}/nation.parquet",
                         columns=["n_nationkey", "n_name"])
    li = li[(li["l_shipdate"] >= "1995-01-01")
            & (li["l_shipdate"] < "1997-01-01")]
    m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey") \
        .merge(cu, left_on="o_custkey", right_on="c_custkey") \
        .merge(su, left_on="l_suppkey", right_on="s_suppkey") \
        .merge(na, left_on="s_nationkey", right_on="n_nationkey") \
        .rename(columns={"n_name": "supp_nation"}) \
        .merge(na, left_on="c_nationkey", right_on="n_nationkey") \
        .rename(columns={"n_name": "cust_nation"})
    m = m[m["supp_nation"] != m["cust_nation"]]
    row = a.iloc[0]
    sub = m[(m["supp_nation"] == row["supp_nation"])
            & (m["cust_nation"] == row["cust_nation"])
            & (m["l_shipdate"].dt.year == row["l_year"])]
    assert len(sub) == int(row["n_items"])


def test_nation_market_share_forced_branch(ray_session):
    """Q8 market share: both hop branches identical; shares in [0, 1]."""
    from sketch_ray.pipelines.relational import nation_market_share

    a = nation_market_share(SF, force="driver").to_pandas()
    b = nation_market_share(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(b, a)
    assert ((a["mkt_share"] >= 0) & (a["mkt_share"] <= 1)).all()


def test_upsert_latest_forced_branch_and_semantics(ray_session):
    """MERGE-INTO latest-wins: both branches identical; updated keys carry
    version 2 with the bumped price, untouched keys keep their base row,
    and the key set is exactly the base key set."""
    from sketch_ray.pipelines.relational import upsert_orders_latest

    a = upsert_orders_latest(SF, force="driver").to_pandas()
    b = upsert_orders_latest(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(b, a.astype(b.dtypes.to_dict()))

    base = pd.read_parquet(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice",
                                    "o_orderstatus"])
    assert set(a["o_orderkey"]) == set(base["o_orderkey"])
    upd = a[a["o_orderkey"] % 7 == 0]
    assert (upd["version"] == 2).all()
    assert (upd["o_orderstatus"] == "U").all()
    rest = a[a["o_orderkey"] % 7 != 0].merge(base, on="o_orderkey",
                                             suffixes=("", "_b"))
    assert (rest["version"] == 1).all()
    assert (rest["o_totalprice"] == rest["o_totalprice_b"]).all()


def test_fuzzy_join_forced_branch_and_recovery(ray_session):
    """FastSS ed<=1 join: broadcast probe equals the distributed variant
    join, every corrupted key recovers its own clean row, and no reported
    pair exceeds distance 1."""
    from sketch_ray.pipelines.relational import fuzzy_join_customers

    a = fuzzy_join_customers(SF, force="driver").to_pandas()
    b = fuzzy_join_customers(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(b, a)
    assert (a["dist"] <= 1).all()

    cust = pd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey"])
    corrupted = cust[cust["c_custkey"] % 3 == 0]["c_custkey"]
    self_pairs = a[(a["d_custkey"] == a["c_custkey"])]
    assert set(corrupted).issubset(set(self_pairs["d_custkey"]))
    # corrupted self-match has distance exactly 1 (one char removed)
    cp = self_pairs[self_pairs["d_custkey"].isin(set(corrupted))]
    assert (cp["dist"] == 1).all()


def test_revenue_gini_forced_branch_and_range(ray_session):
    """Gini: both fold branches identical, value in [0, 1), and an
    independent numpy float recomputation agrees to 1e-9."""
    import numpy as np

    from sketch_ray.pipelines.relational import revenue_gini

    a = revenue_gini(SF, force="driver").to_pandas()
    b = revenue_gini(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(b, a)
    g = float(a["gini"].iloc[0])
    assert 0.0 <= g < 1.0

    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    cents = np.round(od["o_totalprice"].to_numpy() * 100).astype(np.int64)
    per = pd.DataFrame({"k": od["o_custkey"], "c": cents}) \
        .groupby("k")["c"].sum().to_numpy(np.int64)
    x = np.sort(per).astype(np.float64)
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.float64)
    ref = (2 * float(i @ x) - (n + 1) * x.sum()) / (n * x.sum())
    assert abs(g - ref) <= 5.01e-7  # engine value is round6'd


def test_transition_entropy_identities(ray_session):
    import numpy as np

    from sketch_ray.pipelines.relational import (event_transitions,
                                                 transition_entropy)

    a = transition_entropy(SF, force="driver").to_pandas()
    b = transition_entropy(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)

    # 0 <= H(next|x) <= ln(n successors); counts recompose from the
    # transitions table; global = sum_x p(x) H(x) up to rounding
    t = event_transitions(SF, force="driver").to_pandas()
    per = t.groupby("from_type")["n"].sum()
    assert (a["h_next"] >= 0).all()
    assert (a["h_next"].to_numpy()
            <= np.log(a["n_next_types"].to_numpy(np.float64)) + 5.1e-7).all()
    for _, row in a.iterrows():
        assert int(per[row["from_type"]]) == int(row["n_trans"])
    n_total = float(a["n_trans"].sum())
    mix = float((a["n_trans"].to_numpy(np.float64) / n_total
                 * a["h_next"].to_numpy()).sum())
    assert abs(float(a["h_cond_global"].iloc[0]) - mix) <= 1e-5


def test_r5_tpch_completion_forced_branches_agree(ray_session):
    """The r5 TPC-H-completion batch (Q9/Q11/Q12/Q16/Q20 shapes): each
    adaptive query's non-default branch must equal the driver plan
    exactly (CLAUDE.md adaptive-plan invariant)."""
    from sketch_ray.pipelines import relational as R

    for fn in (R.q9_profit_by_nation_year, R.part_value_concentration,
               R.q12_priority_class_counts, R.part_supplier_variety,
               R.bulk_part_suppliers):
        a = fn(SF, force="driver").to_pandas()
        b = fn(SF, force="dist").to_pandas()
        pd.testing.assert_frame_equal(b, a.astype(b.dtypes.to_dict()))


def test_q9_profit_reconciles_with_components(ray_session):
    """Q9 profit must equal revenue − cost recomputed independently with
    pandas over the raw joined frame (one nation×year spot cell plus the
    global total)."""
    from sketch_ray.pipelines.relational import q9_profit_by_nation_year

    got = q9_profit_by_nation_year(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_name", "p_retailprice"])
    sup = pd.read_parquet(f"{SF}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    j = li.merge(pt[pt["p_name"].str.contains("red")], left_on="l_partkey",
                 right_on="p_partkey") \
        .merge(sup, left_on="l_suppkey", right_on="s_suppkey") \
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    amt4 = ((j["l_extendedprice"] * 100).round().astype("int64")
            * (100 - (j["l_discount"] * 100).round().astype("int64"))
            - (j["p_retailprice"] * 100).round().astype("int64") * 60
            * j["l_quantity"].round().astype("int64"))
    assert int(got["n_items"].sum()) == len(j)
    total4 = int(amt4.sum())
    # the per-cell 2dp roundings differ from rounding the total once;
    # compare against the exact integer total via the unrounded cells
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    nmap = dict(zip(nat["n_nationkey"], nat["n_name"]))
    j["nation"] = j["s_nationkey"].map(nmap)
    j["o_year"] = j["o_orderdate"].dt.year
    cell = pd.DataFrame({"nation": j["nation"], "o_year": j["o_year"],
                         "amt4": amt4}) \
        .groupby(["nation", "o_year"], as_index=False)["amt4"].sum()
    assert int(cell["amt4"].sum()) == total4
    m = got.merge(cell, on=["nation", "o_year"])
    assert len(m) == len(got)
    from sketch_ray.pipelines._util import round_half_away
    assert (m["profit"]
            == (m["amt4"] / 10000.0).map(
                lambda x: float(round_half_away(x, 2)))).all()


def test_part_value_concentration_threshold_and_order(ray_session):
    """Q11 shape: every kept part beats mult× the mean share (strict),
    every dropped part doesn't; ranking is on the integer sum."""
    from sketch_ray.pipelines.relational import part_value_concentration

    got = part_value_concentration(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    nk = set(nat[nat["n_name"] == "NATION_3"]["n_nationkey"])
    sks = set(sup[sup["s_nationkey"].isin(nk)]["s_suppkey"])
    sel = li[li["l_suppkey"].isin(sks)].copy()
    v4 = ((sel["l_extendedprice"] * 100).round().astype("int64")
          * (100 - (sel["l_discount"] * 100).round().astype("int64")))
    per = pd.DataFrame({"pk": sel["l_partkey"], "v4": v4}) \
        .groupby("pk")["v4"].sum()
    tot, npts = int(per.sum()), len(per)
    want = {int(k) for k, v in per.items() if int(v) * npts > 2 * tot}
    assert set(got["l_partkey"]) == want
    # descending by the integer value → descending by rounded output too
    vals = got["value"].to_numpy()
    assert (vals[:-1] >= vals[1:]).all()


def test_q12_priority_counts_partition_the_join(ray_session):
    """Q12 shape: high+low per flag == window lineitem⋈orders row count
    per flag (the CASE split partitions the join)."""
    from sketch_ray.pipelines.relational import q12_priority_class_counts

    got = q12_priority_class_counts(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag",
                                  "l_shipdate"])
    li = li[(li["l_shipdate"] >= "1996-01-01")
            & (li["l_shipdate"] < "1998-01-01")]
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    per_flag = j.groupby("l_returnflag").size()
    for _, row in got.iterrows():
        assert (int(row["high_count"]) + int(row["low_count"])
                == int(per_flag[row["l_returnflag"]]))
    high = j[j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])] \
        .groupby("l_returnflag").size()
    for _, row in got.iterrows():
        assert int(row["high_count"]) == int(high.get(row["l_returnflag"], 0))


def test_part_supplier_variety_distinct_semantics(ray_session):
    """Q16 shape: supplier_cnt is DISTINCT suppliers (a supplier shipping
    the same part class twice counts once), exclusions apply."""
    from sketch_ray.pipelines.relational import part_supplier_variety

    got = part_supplier_variety(SF, k=10**9).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    pt = pd.read_parquet(f"{SF}/part.parquet")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    bad_sk = set(sup[sup["s_acctbal"] < 0]["s_suppkey"])
    pt = pt[(pt["p_brand"] != "Brand#1") & (pt["p_type"] != "PROMO")]
    j = li[~li["l_suppkey"].isin(bad_sk)].merge(
        pt, left_on="l_partkey", right_on="p_partkey")
    want = j.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"] \
        .nunique().reset_index(name="supplier_cnt")
    m = got.merge(want, on=["p_brand", "p_type", "p_size"],
                  suffixes=("", "_want"))
    assert len(m) == len(got) == len(want)
    assert (m["supplier_cnt"] == m["supplier_cnt_want"]).all()


def test_bulk_part_suppliers_majority_rule(ray_session):
    """Q20 shape: kept suppliers satisfy matched·8 > total strictly;
    no supplier below the cut is kept; quantities reconcile."""
    from sketch_ray.pipelines.relational import bulk_part_suppliers

    got = bulk_part_suppliers(SF).to_pandas()
    assert (got["matched_qty"] * 8 > got["total_qty"]).all()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_name"])
    sup = pd.read_parquet(f"{SF}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
    red = set(pt[pt["p_name"].str.contains("red")]["p_partkey"])
    li["q"] = li["l_quantity"].round().astype("int64")
    li["qm"] = li["q"].where(li["l_partkey"].isin(red), 0)
    per = li.groupby("l_suppkey", as_index=False)[["qm", "q"]].sum()
    per = per[per["qm"] * 8 > per["q"]].merge(
        sup, left_on="l_suppkey", right_on="s_suppkey")
    assert set(got["s_name"]) == set(per["s_name"])
    m = got.merge(per, on="s_name")
    assert (m["matched_qty"] == m["qm"]).all()
    assert (m["total_qty"] == m["q"]).all()
