"""Relational pipelines over the TPC-H-ish tables: broadcast joins, windowed
aggregation, pricing-summary scan — the wide-operator patterns of the engine.

Join strategy at scale: dimension tables (customer/nation: thousands of
rows) are broadcast ONCE via ``ray.put`` and probed inside ``map_batches``
on the fact side (lineitem/orders) — no all-to-all shuffle ever touches the
fact table; the only shuffle is the final groupby over pre-aggregated
partial rows (bounded by group cardinality × batches, not fact rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Max, Sum

from ..stages.broadcast import cached
from ._util import ensure_columns, n_reducers, round6, round_half_away


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _rev4(batch: pa.Table) -> np.ndarray:
    """Lineitem revenue in integer 1e-4-currency units:
    cents(price) · (100 − discount_pct). Price and discount are both 2dp
    decimals, so this is EXACT — float partial sums would make the
    2dp/6dp-gated roundings order-dependent (heavy_revenue_customers
    precedent). The oracle SQL of every caller renders the identical
    integer expression; keep them in lockstep."""
    return (np.round(batch["l_extendedprice"]
                     .to_numpy(zero_copy_only=False) * 100.0)
            .astype(np.int64)
            * (100 - np.round(batch["l_discount"]
                              .to_numpy(zero_copy_only=False) * 100.0)
               .astype(np.int64)))


def _day_user_counts(batch: pa.Table) -> pa.Table:
    """Per-batch (day, user_id, n_p) pre-aggregation — the ONE day-floor
    definition shared by every windowed-user pipeline (DAU, rolling
    distinct, windowed heavy hitters, per-day sketch states); a bucketing
    change here moves all of them together."""
    day = pc.floor_temporal(batch["ts"].combine_chunks(), unit="day")
    t = pa.table({"day": day, "user_id": batch["user_id"]})
    g = t.group_by(["day", "user_id"]).aggregate([([], "count_all")])
    return g.rename_columns(["day", "user_id", "n_p"])


_SMALL_ROWS = 2_000_000  # below this the final Ray groupby is pure overhead


def _fold_partials(partials_ds, input_rows: int, keys: list[str],
                   sums: dict[str, str]) -> pd.DataFrame:
    """Adaptive final aggregation for group-BOUNDED partial rows (at most
    n_groups rows per batch): below ``_SMALL_ROWS`` input rows the partials
    fold in one driver pandas pass (the Ray sort-shuffle groupby costs
    1-3 s of fixed overhead regardless of data size — the measured
    pathology, CLAUDE.md); above it the distributed groupby runs. ``sums``
    maps output column -> partial column. Same discipline as
    exact.events_per_type; the non-default branch is pinned equal by
    pytest (test_relational_adaptive_plans_agree)."""
    if input_rows < _SMALL_ROWS:
        # zero-block inputs lose their schema on to_pandas(): retype the
        # empty frame so groupby(keys) doesn't KeyError (ADVICE r3)
        df = ensure_columns(
            partials_ds.to_pandas(),
            {**{k: "object" for k in keys},
             **{col: "float64" for col in sums.values()}})
        return df.groupby(keys, as_index=False).agg(
            **{out: (col, "sum") for out, col in sums.items()})
    agg = partials_ds.groupby(keys).aggregate(
        *[Sum(col, alias_name=out) for out, col in sums.items()])
    return agg.to_pandas()


def _broadcast_map(sf_dir: str) -> "ray.ObjectRef":
    """custkey -> nation name lookup (customer ⋈ nation built driver-side:
    both are dimension tables, KBs here / MBs at any realistic scale)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()))
    ck = cust.column("c_custkey").to_numpy()
    cn = cust.column("c_nationkey").to_numpy()
    # dense lookup array keyed by custkey (custkeys are dense-ish ints)
    size = int(ck.max()) + 1
    nation_code = np.full(size, -1, dtype=np.int32)
    codes, names = {}, []
    for nk in sorted(set(nmap)):
        codes[nk] = len(names)
        names.append(nmap[nk])
    nation_code[ck] = np.array([codes[int(x)] for x in cn], dtype=np.int32)
    return ray.put((nation_code, names))


def revenue_per_nation(sf_dir: str) -> pa.Table:
    """Revenue (sum o_totalprice) and order count per customer nation:
    orders (fact) probes the broadcast custkey→nation map per batch, partial
    sums per batch, tiny groupby at the end. The broadcast-join analog of
    the reference's candidate-map probe (src/sketch.cpp:222-227)."""
    ref = _broadcast_map(sf_dir)

    def probe(batch: pa.Table) -> pa.Table:
        # stateless stage; lookup fetched once per worker (stages/broadcast)
        nation_code, names = cached(ref)
        cust = batch["o_custkey"].to_numpy(zero_copy_only=False)
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        # custkeys without a customer row are dropped, not mis-credited:
        # out-of-range would raise, and code -1 would wrap to the last
        # nation under np.add.at (ADVICE r1) — inner-join semantics
        in_range = (cust >= 0) & (cust < len(nation_code))
        code = np.where(in_range, nation_code[np.minimum(cust, len(nation_code) - 1)], -1)
        known = code >= 0
        code, price = code[known], price[known]
        n_codes = len(names)
        sums = np.zeros(n_codes, dtype=np.float64)
        cnts = np.zeros(n_codes, dtype=np.int64)
        np.add.at(sums, code, price)
        np.add.at(cnts, code, 1)
        nz = np.flatnonzero(cnts)
        return pa.table(
            {
                "n_name": pa.array([names[i] for i in nz], pa.string()),
                "rev_partial": pa.array(sums[nz], pa.float64()),
                "cnt_partial": pa.array(cnts[nz], pa.int64()),
            }
        )

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    df = _fold_partials(
        ds.map_batches(probe, batch_format="pyarrow", batch_size=16384),
        ds.count(), ["n_name"],
        {"revenue": "rev_partial", "n_orders": "cnt_partial"})
    df["revenue"] = df["revenue"].round(2)
    df = df[["n_name", "revenue", "n_orders"]].sort_values("n_name").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1-style pricing summary over lineitem (returnflag × linestatus):
    pure per-batch partial aggregation + 4-group groupby — the canonical
    pre-aggregate-then-tiny-shuffle scan. Money folds as INTEGER cents /
    1e-4 units (disc_price = round(price·100)·(100 − round(disc·100))),
    with ONE division + half-away round at the end: float partial sums
    re-associated by the fold crossed 2dp boundaries at the 100× corpus
    (60M rows — the r5 DIST100X find; top_return_customers precedent),
    while integer folds are associativity-exact at any scale."""
    from ._util import round_half_away

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def partials(batch: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"],
                                               pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(batch["l_discount"],
                                              pa.scalar(100.0))), pa.int64())
        disc_price = pc.multiply(price_c,
                                 pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(pc.round(batch["l_quantity"]), pa.int64()),
                "price": price_c,
                "disc_price": disc_price,
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price", "sum"), ("disc_price", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_p", "sum_price_p", "sum_disc_p", "cnt_p"]
        )

    df = _fold_partials(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=32768),
        ds.count(), ["l_returnflag", "l_linestatus"],
        {"sum_qty": "sum_qty_p", "sum_base_price": "sum_price_p",
         "sum_disc_price": "sum_disc_p", "count_order": "cnt_p"})
    df["sum_qty"] = round_half_away(
        df["sum_qty"].to_numpy(np.int64).astype(np.float64), 2)
    df["sum_base_price"] = round_half_away(
        df["sum_base_price"].to_numpy(np.int64).astype(np.float64) / 100.0, 2)
    df["sum_disc_price"] = round_half_away(
        df["sum_disc_price"].to_numpy(np.int64).astype(np.float64) / 10000.0, 2)
    df = df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    cols = ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order"]
    return pa.Table.from_pandas(df[cols], preserve_index=False)


def events_daily_windows(sf_dir: str) -> pa.Table:
    """Tumbling 1-day windowed aggregate over the events stream: per
    (day, event_type) event count + value sum. Window assignment is a
    vectorized timestamp floor inside map_batches; the shuffle carries one
    row per (window, type, batch) — the streaming-window operator expressed
    batch-first (reference's chunked streaming scan, SURVEY.md §2.7)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch["ts"].combine_chunks(), unit="day")
        t = pa.table(
            {
                "day": day,
                "event_type": batch["event_type"],
                "value": batch["value"],
            }
        )
        g = t.group_by(["day", "event_type"]).aggregate([("value", "sum"), ([], "count_all")])
        return g.rename_columns(["day", "event_type", "val_p", "cnt_p"])

    df = _fold_partials(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=32768),
        ds.count(), ["day", "event_type"],
        {"value_sum": "val_p", "n_events": "cnt_p"})
    df["value_sum"] = df["value_sum"].round(4)
    df = df.sort_values(["day", "event_type"]).reset_index(drop=True)
    return pa.Table.from_pandas(df[["day", "event_type", "value_sum", "n_events"]], preserve_index=False)


def top_return_customers(sf_dir: str, k: int = 20,
                         force: str | None = None) -> pa.Table:
    """TPC-H Q10 shape — the classic multi-join composed query: revenue
    lost to returned items (l_returnflag = 'R') per customer, decorated
    with name + nation, top-k by revenue.

    Plan: lineitem filters + pre-aggregates per orderkey INSIDE
    map_batches; the orderkey→custkey hop is adaptive (broadcast
    searchsorted probe when orders is dimension-small, else Ray's native
    hash-shuffle join of the pre-aggregated partials — the
    revenue_per_priority gate); the per-custkey fold is group-bounded
    (_fold_partials discipline applied driver-side on custkey-bounded
    rows); customer/nation decoration is a broadcast dimension lookup; the
    final top-k ranks on the 2dp-rounded revenue with custkey tie-break
    (mirrored in the oracle). ``force``="driver"/"native" pins the join
    branch."""
    import os

    import pyarrow.parquet as pq

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"])

    def li_partials(batch: pa.Table) -> pa.Table:
        flag = pc.equal(batch["l_returnflag"].combine_chunks(), "R") \
            .to_numpy(zero_copy_only=False)
        lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)[flag]
        # EXACT integer 1e-4-unit revenue (price has 2dp, discount 2dp):
        # float partial sums re-associated by the fold crossed 2dp
        # boundaries at the 10x soak scale — integers cannot (the
        # local_supplier_revenue rev4 discipline). Per-batch bincount sums
        # stay < 2^53 (65536 items x ~1e8 units), so the float pathway
        # inside bincount is exact before the int64 cast.
        price100 = np.round(batch["l_extendedprice"]
                            .to_numpy(zero_copy_only=False)[flag]
                            * 100.0).astype(np.int64)
        disc100 = np.round(batch["l_discount"]
                           .to_numpy(zero_copy_only=False)[flag]
                           * 100.0).astype(np.int64)
        rev4 = price100 * (100 - disc100)
        uniq, inv = np.unique(lk, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uniq, pa.int64()),
            "rev_p": pa.array(np.bincount(inv, weights=rev4,
                                          minlength=len(uniq))
                              .astype(np.int64), pa.int64()),
            "cnt_p": pa.array(np.bincount(inv, minlength=len(uniq))
                              .astype(np.int64), pa.int64()),
        })

    parts = li.map_batches(li_partials, batch_format="pyarrow",
                           batch_size=65536)
    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    if small:
        ot = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"])
        ok = ot["o_orderkey"].to_numpy()
        order = np.argsort(ok, kind="stable")
        ref = ray.put((ok[order], ot["o_custkey"].to_numpy()[order]))

        def attach(batch: pa.Table) -> pa.Table:
            ok_s, ck_s = cached(ref)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            if len(ok_s) == 0:
                return pa.table({"c_custkey": pa.array([], pa.int64()),
                                 "rev_p": pa.array([], pa.float64()),
                                 "cnt_p": pa.array([], pa.int64())})
            pos = np.clip(np.searchsorted(ok_s, lk), 0, len(ok_s) - 1)
            hit = ok_s[pos] == lk
            t = pa.table({
                "c_custkey": pa.array(ck_s[pos[hit]], pa.int64()),
                "rev_p": batch["rev_p"].filter(pa.array(hit)),
                "cnt_p": batch["cnt_p"].filter(pa.array(hit)),
            })
            g = t.group_by("c_custkey").aggregate(
                [("rev_p", "sum"), ("cnt_p", "sum")])
            return g.rename_columns(["c_custkey", "rev_p", "cnt_p"])

        per_cust_parts = parts.map_batches(attach, batch_format="pyarrow",
                                           batch_size=65536)
        per_cust = ensure_columns(
            per_cust_parts.to_pandas(),
            {"c_custkey": "int64", "rev_p": "int64", "cnt_p": "int64"}) \
            .groupby("c_custkey", as_index=False) \
            .agg(rev4=("rev_p", "sum"), n_items=("cnt_p", "sum"))
    else:
        # materialize: .count() + .join() are two consumers of this shuffle
        agg = parts.repartition(n_reducers()).groupby("l_orderkey").aggregate(
            Sum("rev_p", alias_name="rev"),
            Sum("cnt_p", alias_name="cnt")).materialize()
        ords = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        n_right = agg.count()
        if n_right == 0:
            per_cust = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                                     "rev4": pd.Series([], dtype="int64"),
                                     "n_items": pd.Series([], dtype="int64")})
        else:
            n_parts = max(1, min(_join_partitions(sf_dir, "lineitem", "orders"),
                                 n_right // 64 + 1))
            joined = ords.join(agg, join_type="inner",
                               num_partitions=n_parts,
                               on=("o_orderkey",), right_on=("l_orderkey",))
            jdf = ensure_columns(joined.to_pandas(),
                                 {"o_custkey": "int64", "rev": "int64",
                                  "cnt": "int64"})
            per_cust = jdf.groupby("o_custkey", as_index=False) \
                .agg(rev4=("rev", "sum"), n_items=("cnt", "sum")) \
                .rename(columns={"o_custkey": "c_custkey"})

    # rank on the exact INTEGER rev4 (2dp display ties cannot disagree);
    # revenue = half-away 2dp of the exact quotient, mirrored in SQL
    from ._util import round_half_away

    per_cust = per_cust.sort_values(["rev4", "c_custkey"],
                                    ascending=[False, True],
                                    kind="stable").head(k).reset_index(drop=True)
    per_cust["revenue"] = round_half_away(
        per_cust["rev4"].to_numpy(np.int64) / 10000.0, 2)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    out = per_cust.merge(cust, on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey")
    out = out.sort_values(["rev4", "c_custkey"], ascending=[False, True],
                          kind="stable").reset_index(drop=True)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    out = out[["rank", "c_custkey", "c_name", "n_name", "revenue", "n_items"]]
    return pa.Table.from_pandas(
        out.astype({"n_items": "int64"}), preserve_index=False)


def daily_active_users(sf_dir: str, force: str | None = None) -> pa.Table:
    """Windowed EXACT distinct — daily active users + event volume (the
    DAU metric): per day, count of distinct users and total events. The
    distinct-inside-a-window shape events_daily_windows (plain sums) and
    hll_cardinalities (approximate) don't cover.

    Per-batch (day, user) pre-aggregation; adaptive fold: driver pandas
    dedup below _SMALL_ROWS, else TWO distributed groupbys — (day, user)
    sum (global dedup) then per-day Count/Sum — with only day-sized rows
    pulled. ``force``="driver"/"distributed" pins the branch."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    parts = ds.map_batches(_day_user_counts, batch_format="pyarrow",
                           batch_size=32768)
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"day": "datetime64[us]", "user_id": "int64",
                              "n_p": "int64"})
        agg = pdf.groupby(["day", "user_id"], as_index=False)["n_p"].sum()
        out = agg.groupby("day", as_index=False).agg(
            n_users=("user_id", "nunique"), n_events=("n_p", "sum"))
    else:
        pairs = parts.repartition(n_reducers()).groupby(["day", "user_id"]) \
            .aggregate(Sum("n_p", alias_name="n"))
        per_day = pairs.groupby("day").aggregate(
            Count(alias_name="n_users"), Sum("n", alias_name="n_events"))
        out = ensure_columns(per_day.to_pandas(),
                             {"day": "datetime64[us]", "n_users": "int64",
                              "n_events": "int64"})
    out = out.sort_values("day").reset_index(drop=True)
    return pa.Table.from_pandas(
        out.astype({"n_users": "int64", "n_events": "int64"}),
        preserve_index=False)


def user_retention_cohorts(sf_dir: str, force: str | None = None) -> pa.Table:
    """Cohort retention — the classic product-analytics triangle: users
    grouped by their FIRST-active day (cohort), counted on each later
    active day as (cohort, day_offset, n_users).

    Adaptive plan: below _SMALL_ROWS one driver pass over the deduped
    (user, day) pairs; above, the distributed (day, user) groupby dedups
    globally, a user-bounded groupby(user).min(day) builds the cohort map
    (broadcast once), and a streaming pass over the deduped pairs emits
    (cohort, offset) partials folded to the cohort-triangle-sized result
    — the corpus never lands on the driver."""
    import ray

    from ..stages.broadcast import cached

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def pair_partials(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch["ts"].combine_chunks(), unit="day")
        t = pa.table({"day": day, "user_id": batch["user_id"]})
        return t.group_by(["day", "user_id"]).aggregate([]) \
            .rename_columns(["day", "user_id"])

    parts = ds.map_batches(pair_partials, batch_format="pyarrow",
                           batch_size=32768)
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    us_per_day = np.int64(86_400_000_000)
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"day": "datetime64[us]", "user_id": "int64"})
        pdf = pdf.drop_duplicates(["day", "user_id"])
        d = pdf["day"].to_numpy("datetime64[us]").astype(np.int64)
        cohort = pdf.assign(_d=d).groupby("user_id")["_d"].transform("min").to_numpy()
        off = (d - cohort) // us_per_day
        tri = pd.DataFrame({"cohort": cohort.astype("datetime64[us]"),
                            "day_offset": off.astype(np.int64)})
        out = tri.groupby(["cohort", "day_offset"], as_index=False) \
            .size().rename(columns={"size": "n_users"})
    else:
        from ray.data.aggregate import Count, Min

        # materialize: the deduped pairs feed TWO consumers (cohort map +
        # offsets pass) and an unmaterialized shuffle re-executes per
        # consumer (house trap)
        pairs = parts.repartition(n_reducers()).groupby(["day", "user_id"]) \
            .aggregate(Count(alias_name="_c")).materialize()
        first = pairs.groupby("user_id").aggregate(Min("day", alias_name="cohort"))
        fdf = ensure_columns(first.to_pandas(),
                             {"user_id": "int64", "cohort": "datetime64[us]"})
        uid = np.sort(fdf["user_id"].to_numpy(np.int64))
        coh = fdf.sort_values("user_id")["cohort"] \
            .to_numpy("datetime64[us]").astype(np.int64)
        ref = ray.put((uid, coh))

        def offsets(batch: pa.Table) -> pa.Table:
            u, c = cached(ref)
            ids = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = batch["day"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64)
            pos = np.searchsorted(u, ids)
            coh_b = c[pos]
            t = pa.table({
                "cohort": pa.array(coh_b.astype("datetime64[us]"),
                                   pa.timestamp("us")),
                "day_offset": pa.array((d - coh_b) // us_per_day, pa.int64()),
            })
            return t.group_by(["cohort", "day_offset"]) \
                .aggregate([([], "count_all")]) \
                .rename_columns(["cohort", "day_offset", "n_p"])

        folded = pairs.map_batches(offsets, batch_format="pyarrow",
                                   batch_size=65536) \
            .groupby(["cohort", "day_offset"]) \
            .aggregate(Sum("n_p", alias_name="n_users"))
        out = ensure_columns(folded.to_pandas(),
                             {"cohort": "datetime64[us]", "day_offset": "int64",
                              "n_users": "int64"})
    out = out.sort_values(["cohort", "day_offset"]).reset_index(drop=True)
    return pa.Table.from_pandas(out.astype({"n_users": "int64"}),
                                preserve_index=False)


def _join_partitions(sf_dir: str, *tables: str, floor: int = 8,
                     bytes_per_partition: int = 256 << 20) -> int:
    """Size ``Dataset.join``'s hash-shuffle partition count from the data.

    Sizing rule (measured on this box, BASELINE.md): each shuffle partition
    costs an aggregator actor (~1.5 s spin-up on first use), so the floor is
    8 — the measured-right count for KB-scale shuffles; beyond that, one
    partition per 256 MB of compressed input parquet keeps every partition's
    build side comfortably inside a worker heap at 100 TB scale (compressed
    bytes under-estimate in-memory bytes ~2-4x, and pre-aggregation upstream
    shrinks the shuffled side further, so 256 MB compressed/partition lands
    well under 2 GB of heap)."""
    import math
    import os

    try:
        total = sum(os.path.getsize(f"{sf_dir}/{t}.parquet") for t in tables)
    except OSError:
        return floor  # remote/opaque paths: keep the measured floor
    return max(floor, math.ceil(total / bytes_per_partition))


# above this compressed size the join side stops being broadcastable and
# the plan switches to the native hash-shuffle join (256 MB compressed ~
# tens of millions of (orderkey, priority) rows — comfortably driver/worker
# heap-sized as a broadcast; a 100 TB orders table is far past it)
_BCAST_JOIN_BYTES = 256 << 20


def revenue_per_priority(sf_dir: str) -> pa.Table:
    """lineitem ⋈ orders on orderkey, then discounted revenue per order
    priority — adaptive join selection:

    - orders side small (compressed < _BCAST_JOIN_BYTES): broadcast
      map-side join. The (orderkey -> priority code) arrays ship once via
      ``ray.put``; each lineitem batch searchsorted-probes them and emits a
      5-row partial (priority, revenue) — ONE streaming pass, no shuffle at
      all (measured 5-8 s -> ~1 s at sf0.1 vs the shuffle join).
    - both sides large: Ray Data's native hash-shuffle ``Dataset.join``
      (the genuinely wide case where neither side broadcasts), lineitem
      pre-projected and pre-aggregated per orderkey inside map_batches
      BEFORE the join so the shuffle carries one row per (orderkey, batch)
      instead of one per lineitem; partitions sized by _join_partitions."""
    import os

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1  # opaque path: shuffle join

    if orders_bytes < _BCAST_JOIN_BYTES:
        import pyarrow.parquet as pq

        ot = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderpriority"])
        okeys = ot["o_orderkey"].to_numpy()
        prio = ot["o_orderpriority"].to_pandas().astype("category")
        labels = [str(x) for x in prio.cat.categories]
        order = np.argsort(okeys, kind="stable")
        ref = ray.put((okeys[order],
                       prio.cat.codes.to_numpy().astype(np.int32)[order],
                       labels))

        def partials(batch: pa.Table) -> pa.Table:
            okeys_s, codes_s, labels_w = cached(ref)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(okeys_s, lk), 0, len(okeys_s) - 1)
            hit = okeys_s[pos] == lk  # inner-join semantics: drop misses
            rev = (batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                   * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)))
            matched = codes_s[pos[hit]]
            sums = np.bincount(matched, weights=rev[hit], minlength=len(labels_w))
            cnts = np.bincount(matched, minlength=len(labels_w))
            return pa.table({
                "o_orderpriority": pa.array(labels_w, pa.string()),
                "rev_p": pa.array(sums, pa.float64()),
                "cnt_p": pa.array(cnts.astype(np.int64), pa.int64()),
            })

        parts = li.map_batches(partials, batch_format="pyarrow",
                               batch_size=65536).to_pandas()
        g = parts.groupby("o_orderpriority", as_index=False).agg(
            revenue=("rev_p", "sum"), n=("cnt_p", "sum"))
        # inner-join semantics: a priority with no matching lineitem rows
        # produces NO output row (not a 0.0 row)
        df = g[g["n"] > 0][["o_orderpriority", "revenue"]]
    else:
        def li_partials(batch: pa.Table) -> pa.Table:
            rev = pc.multiply(batch["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0), batch["l_discount"]))
            t = pa.table({"l_orderkey": batch["l_orderkey"], "rev": rev})
            g = t.group_by("l_orderkey").aggregate([("rev", "sum")])
            return g.rename_columns(["l_orderkey", "rev_p"])

        li_agg = li.map_batches(li_partials, batch_format="pyarrow", batch_size=65536)
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
        joined = li_agg.join(orders, join_type="inner",
                             num_partitions=_join_partitions(sf_dir, "lineitem", "orders"),
                             on=("l_orderkey",), right_on=("o_orderkey",))
        agg = joined.groupby("o_orderpriority").aggregate(Sum("rev_p", alias_name="revenue"))
        df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df = df.sort_values("o_orderpriority").reset_index(drop=True)
    return pa.Table.from_pandas(df[["o_orderpriority", "revenue"]], preserve_index=False)


def _bucket_users(batch: pa.Table) -> pa.Table:
    """Coarse user bucket (a function of user_id alone, so whole users
    co-locate) prepended before groupby(bucket).map_groups stages — each
    partition then resolves MANY users in one vectorized pass. Module-level
    so workers unpickle it by reference (importing the package's allocator
    and log setup) instead of a by-value closure."""
    b = pc.bit_wise_and(batch["user_id"].combine_chunks(), 63)
    return batch.append_column("bucket", b.cast(pa.int64()))


_FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_users(df: pd.DataFrame) -> pd.DataFrame:
    """Greedy earliest-match funnel per user over one frame of whole users:
    step k is reached iff events of types _FUNNEL_STEPS occur at strictly
    increasing ts (the earliest viable prefix is optimal for existence, so
    each level is one vectorized groupby-min + merge + filter). Returns the
    per-user frontier: (user_id, depth)."""
    cur = None  # Series: user_id -> ts of the last matched step
    depth = pd.Series(dtype="int64")
    for i, et in enumerate(_FUNNEL_STEPS):
        ev = df.loc[df["event_type"] == et, ["user_id", "ts"]]
        if cur is None:
            cur = ev.groupby("user_id")["ts"].min()
        else:
            m = ev.merge(cur.rename("prev"), left_on="user_id",
                         right_index=True)
            cur = m.loc[m["ts"] > m["prev"]].groupby("user_id")["ts"].min()
        if cur.empty:
            break
        d = pd.Series(i + 1, index=cur.index, dtype="int64")
        depth = d.combine_first(depth).astype("int64") if len(depth) else d
    out = depth.rename("depth").reset_index()
    out.columns = ["user_id", "depth"]
    return out


def funnel_steps(sf_dir: str) -> pa.Table:
    """Ordered-sequence funnel (the stateful per-key pattern-match shape):
    how many users reached each step of view -> click -> purchase, where a
    step counts only with a strictly-later timestamp than the previous
    matched step. Same adaptive bucketing as sessionize_users: whole users
    co-located by bucket(user_id), each partition resolves MANY users in
    vectorized pandas passes, and only (bucket x 3)-row partials leave the
    tasks. Returns (step, step_name, n_users), cumulative-funnel monotone."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    if ds.count() < _SMALL_ROWS:
        depth = _funnel_users(ensure_columns(
            ds.to_pandas(), {"user_id": "int64", "ts": "datetime64[us]",
                             "event_type": "object"}))
    else:
        depth = (
            ds.map_batches(_bucket_users, batch_format="pyarrow", batch_size=65536)
            .groupby("bucket")
            .map_groups(lambda g: _funnel_users(g.drop(columns=["bucket"])),
                        batch_format="pandas")
        ).to_pandas()
    d = depth["depth"].to_numpy() if len(depth) else np.array([], np.int64)
    n = [int((d >= k).sum()) for k in (1, 2, 3)]
    return pa.table({
        "step": pa.array([1, 2, 3], pa.int64()),
        "step_name": pa.array(list(_FUNNEL_STEPS), pa.string()),
        "n_users": pa.array(n, pa.int64()),
    })


def customer_order_profile(sf_dir: str, force: str | None = None) -> pa.Table:
    """LEFT OUTER join: every customer with its order count and total
    spend, zero-filled when the customer has no orders — the null-
    preserving join shape (``users_without_orders`` is the anti join,
    ``bloom_semi_join`` the semi; this completes the family).

    Orders pre-aggregate per custkey inside map_batches before any
    exchange (the shuffle carries one row per (custkey, batch), not one
    per order). Adaptive join selection, same gate as
    revenue_per_priority: small orders side -> fold the partials and
    left-merge against the customer keys driver-side (dimension read);
    both sides large -> Ray's native hash-shuffle
    ``Dataset.join(join_type="left_outer")`` with partitions sized by
    _join_partitions, nulls coalesced to 0 in a streaming map.
    ``force``="driver"/"native" pins the branch for tests."""
    import os

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def o_partials(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate(
            [("o_totalprice", "sum"), ([], "count_all")])
        return g.rename_columns(["o_custkey", "spent_p", "cnt_p"])

    parts = orders.map_batches(o_partials, batch_format="pyarrow",
                               batch_size=65536)
    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    if small:
        import pyarrow.parquet as pq

        pdf = ensure_columns(parts.to_pandas(),
                             {"o_custkey": "int64", "spent_p": "float64",
                              "cnt_p": "int64"})  # empty orders: typed empty
        agg = pdf.groupby("o_custkey", as_index=False).agg(
            n_orders=("cnt_p", "sum"), total_spent=("spent_p", "sum"))
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey"]).to_pandas()
        df = cust.merge(agg, how="left", left_on="c_custkey",
                        right_on="o_custkey")
    else:
        agg = parts.repartition(n_reducers()).groupby("o_custkey").aggregate(
            Sum("cnt_p", alias_name="n_orders"),
            Sum("spent_p", alias_name="total_spent"))
        cust = _read(sf_dir, "customer", ["c_custkey"])
        # a join partition whose right side gets ZERO rows builds a
        # schema-less empty table and the Arrow join can't resolve
        # o_custkey (Ray hash-shuffle join quirk) — clamp partitions so
        # each expects >= ~64 right rows; n from parquet metadata, no scan
        n_right = orders.count()
        if n_right == 0:
            df = cust.to_pandas()
            df["n_orders"], df["total_spent"] = 0, 0.0
        else:
            n_parts = max(1, min(_join_partitions(sf_dir, "customer", "orders"),
                                 n_right // 64 + 1))
            joined = cust.join(agg, join_type="left_outer",
                               num_partitions=n_parts,
                               on=("c_custkey",), right_on=("o_custkey",))
            df = joined.to_pandas()
    df["n_orders"] = df["n_orders"].fillna(0).astype("int64")
    df["total_spent"] = df["total_spent"].fillna(0.0).round(2)
    df = df[["c_custkey", "n_orders", "total_spent"]] \
        .sort_values("c_custkey").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def user_activity_reconcile(sf_dir: str, force: str | None = None) -> pa.Table:
    """FULL OUTER join — the reconciliation shape that completes the join
    family (semi/anti/inner/left/as-of/range): per-user event activity
    matched against the even-custkey account slice, keeping BOTH unmatched
    sides (users with events but no account row, accounts with no events)
    with zero-fills and membership flags.

    Events pre-aggregate per user inside map_batches before any exchange
    (key-bounded rows move, not events). Adaptive plan: small event side →
    driver outer merge against the pruned customer read; both sides large
    → native ``Dataset.join(join_type="full_outer")`` with the same
    partition clamp as customer_order_profile (empty right partitions
    break the Arrow join). ``force``="driver"/"native" pins the branch.
    Returns (key, n_events, total_value, acctbal, in_events,
    in_customers) sorted by key."""
    import os

    import pyarrow.parquet as pq

    events = _read(sf_dir, "events", ["user_id", "value"])

    def e_partials(batch: pa.Table) -> pa.Table:
        g = batch.group_by("user_id").aggregate(
            [("value", "sum"), ([], "count_all")])
        return g.rename_columns(["user_id", "val_p", "cnt_p"])

    parts = events.map_batches(e_partials, batch_format="pyarrow",
                               batch_size=65536)

    def cust_filter(batch: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(batch["c_custkey"], 1), 0)
        out = batch.filter(keep)
        # explicit membership marker: the native full_outer COALESCES the
        # key into the left column and c_acctbal could legitimately be
        # null, so neither works as a presence indicator
        return out.append_column(
            "in_cust", pa.array(np.ones(out.num_rows, np.int64)))

    try:
        ev_bytes = os.path.getsize(f"{sf_dir}/events.parquet")
    except OSError:
        ev_bytes = _BCAST_JOIN_BYTES + 1
    small = (ev_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"user_id": "int64", "val_p": "float64",
                              "cnt_p": "int64"})
        agg = pdf.groupby("user_id", as_index=False).agg(
            n_events=("cnt_p", "sum"), total_value=("val_p", "sum"))
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_acctbal"]).to_pandas()
        cust = cust[cust["c_custkey"] % 2 == 0].assign(in_cust=1)
        df = agg.merge(cust, how="outer", left_on="user_id",
                       right_on="c_custkey")
    else:
        # materialize both sides: .count() + .join() are two consumers and
        # an unmaterialized shuffle re-executes per consumer (house trap)
        agg = parts.repartition(n_reducers()).groupby("user_id").aggregate(
            Sum("cnt_p", alias_name="n_events"),
            Sum("val_p", alias_name="total_value")).materialize()
        cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]) \
            .map_batches(cust_filter, batch_format="pyarrow",
                         batch_size=65536).materialize()
        n_left, n_right = agg.count(), cust.count()
        if n_left == 0 or n_right == 0:
            df = agg.to_pandas() if n_right == 0 else cust.to_pandas()
            for c in ("user_id", "n_events", "total_value",
                      "c_custkey", "c_acctbal", "in_cust"):
                if c not in df.columns:
                    df[c] = np.nan
        else:
            n_parts = max(1, min(_join_partitions(sf_dir, "events", "customer"),
                                 min(n_left, n_right) // 64 + 1))
            joined = agg.join(cust, join_type="full_outer",
                              num_partitions=n_parts,
                              on=("user_id",), right_on=("c_custkey",))
            df = joined.to_pandas()
    # membership from value-null indicators (the native full_outer COALESCES
    # the key into the left key column, so key nulls can't be used)
    key = df["user_id"]
    if "c_custkey" in df.columns:
        key = key.fillna(df["c_custkey"])
    out = pd.DataFrame({
        "key": key.astype("int64"),
        "n_events": df["n_events"].fillna(0).astype("int64"),
        "total_value": df["total_value"].fillna(0.0).round(2),
        "acctbal": df["c_acctbal"].fillna(0.0).round(2),
        "in_events": df["n_events"].notna().astype("int64"),
        "in_customers": df["in_cust"].notna().astype("int64"),
    })
    out = out.sort_values("key").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# plan selector for top_orders, monkeypatchable in tests: "partial" (default
# — per-batch top-k, no shuffle) or "sort" (full ds.sort().limit(), the
# operator-pair demonstration; an all-to-all at scale)
_TOPK_PLAN = "partial"


def top_orders(sf_dir: str, k: int = 100) -> pa.Table:
    """Exact top-k orders by price, deterministic (price desc, orderkey asc)
    tie-break — the top-k operator (SURVEY.md §2.6).

    Default plan: per-batch PARTIAL top-k inside map_batches (each batch
    emits at most k rows — the only data movement is k rows per batch,
    never an all-to-all), then one exact driver merge over the
    (k x n_batches)-row remainder. A full ``ds.sort(descending).limit(k)``
    plan is kept selectable (_TOPK_PLAN = "sort") and pinned equal by
    pytest: it demonstrates the sort/limit pair but shuffles the entire
    table at scale, which top-k never needs."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    if _TOPK_PLAN == "sort":
        out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)
        df = out.to_pandas().reset_index(drop=True)
        return pa.Table.from_pandas(df[["o_orderkey", "o_totalprice"]], preserve_index=False)

    def partial_topk(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -price))[:k]
        return pa.table({"o_orderkey": pa.array(key[order]),
                         "o_totalprice": pa.array(price[order])})

    parts = ds.map_batches(partial_topk, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    parts = parts.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True]).head(k)
    return pa.Table.from_pandas(parts.reset_index(drop=True), preserve_index=False)


def _asof_match(ock: np.ndarray, odt: np.ndarray, uid: np.ndarray,
                ts_shift: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized as-of core: for each (uid, ts_shift) query, the latest
    odt of the same key with odt <= ts_shift. Composite-rank encoding:
    ``composite = key·(n_ranks+1) + date_rank`` makes the match ONE
    np.searchsorted. Returns (ok mask, matched int64 date)."""
    if len(ock) == 0 or len(uid) == 0:
        return np.zeros(len(uid), bool), np.zeros(len(uid), np.int64)
    date_ranks = np.unique(odt)
    n = np.int64(len(date_ranks))
    comp = np.sort(ock * (n + 1) + np.searchsorted(date_ranks, odt))
    ts_rank = np.searchsorted(date_ranks, ts_shift, side="right") - 1
    comp_q = uid * (n + 1) + np.maximum(ts_rank, 0)
    pos = np.searchsorted(comp, comp_q, side="right") - 1
    cand = comp[np.maximum(pos, 0)]
    ok = (pos >= 0) & (cand // (n + 1) == uid) & (ts_rank >= 0)
    matched = np.where(ok, date_ranks[np.where(ok, cand % (n + 1), 0)], 0)
    return ok, matched


_ASOF_SHIFT_US = np.int64(9131) * 86400 * 1_000_000  # fixed 9131-day shift (~25 y)


def _asof_partitioned(sf_dir: str, n_parts: int = 32) -> pd.DataFrame:
    """Distributed as-of path for TWO LARGE time-keyed tables: hash-partition
    both sides by key (same partition function on both), then sort-merge
    *within* partitions — no side is ever broadcast or driver-held. Expressed
    Ray-Data-first as a tagged union + ``groupby(part).map_groups`` (the
    co-group idiom): the groupby is the one all-to-all, moving each row once,
    keyed so matching keys co-locate. Partitioning assumption: a single key's
    rows fit one partition's group (true for hash partitioning by key)."""
    from ..kernels.hashing import splitmix64

    P = np.int64(n_parts)

    def order_rows(b: pa.Table) -> pa.Table:
        ock = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        odt = b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        part = (splitmix64(ock.astype(np.uint64)) % np.uint64(P)).astype(np.int64)
        return pa.table({
            "part": pa.array(part, pa.int64()),
            "side": pa.array(np.zeros(len(ock), np.int8), pa.int8()),
            "key": pa.array(ock, pa.int64()),
            "t": pa.array(odt, pa.int64()),
            "event_id": pa.array(np.zeros(len(ock), np.int64), pa.int64()),
        })

    def event_rows(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        part = (splitmix64(uid.astype(np.uint64)) % np.uint64(P)).astype(np.int64)
        return pa.table({
            "part": pa.array(part, pa.int64()),
            "side": pa.array(np.ones(len(uid), np.int8), pa.int8()),
            "key": pa.array(uid, pa.int64()),
            "t": pa.array(ts - _ASOF_SHIFT_US, pa.int64()),
            "event_id": pa.array(b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()),
        })

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        order_rows, batch_format="pyarrow", batch_size=32768)
    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        event_rows, batch_format="pyarrow", batch_size=32768)

    def asof_group(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 0]
        e = df[df["side"] == 1]
        if len(e) == 0:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "matched_us": pd.Series([], dtype="int64"),
                                 "ok": pd.Series([], dtype=bool)})
        ok, matched = _asof_match(o["key"].to_numpy(), o["t"].to_numpy(),
                                  e["key"].to_numpy(), e["t"].to_numpy())
        return pd.DataFrame({"event_id": e["event_id"].to_numpy(),
                             "user_id": e["key"].to_numpy(),
                             "matched_us": matched, "ok": ok})

    out = orders.union(events).groupby("part").map_groups(
        asof_group, batch_format="pandas")
    return out.to_pandas()


def asof_latest_order(sf_dir: str, mode: str = "auto") -> pa.Table:
    """As-of join (an operator Ray Data lacks): for every event, the latest
    order of customer ``user_id`` with o_orderdate <= event ts − 9131 days
    (the shift interleaves the two tables' time ranges).

    Two physical plans, same semantics (pytest-pinned equal):

    - ``broadcast`` (right side small): orders broadcast once as composite-
      sorted keys; each event batch resolves in ONE vectorized
      ``np.searchsorted`` — no per-row or per-key Python.
    - ``partitioned`` (both sides large — the 100 TB path): hash-partition
      both sides by key, sort-merge within partitions (see
      _asof_partitioned). This is the driver-gated default path.

    ``mode="auto"`` picks broadcast only when the orders side is small.
    Returns (event_id, user_id, matched_orderdate)."""
    import pyarrow.parquet as pq

    if mode == "auto":
        n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
        mode = "broadcast" if n_orders <= 5_000_000 else "partitioned"
    if mode == "partitioned":
        df = _asof_partitioned(sf_dir)
        dt = df["matched_us"].to_numpy().astype("datetime64[us]")
        arr = pc.if_else(pa.array(df["ok"].to_numpy()),
                         pa.array(dt, pa.timestamp("us")),
                         pa.scalar(None, pa.timestamp("us")))
        out = pa.table({"event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
                        "user_id": pa.array(df["user_id"].to_numpy(), pa.int64()),
                        "matched_orderdate": arr})
        idx = pc.sort_indices(out, sort_keys=[("event_id", "ascending")])
        return out.take(idx)

    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    ock = orders.column("o_custkey").to_numpy()
    odt = orders.column("o_orderdate").to_numpy().astype("datetime64[us]").astype(np.int64)
    date_ranks = np.unique(odt)  # global date→rank table (small)
    n_ranks = len(date_ranks)
    orank = np.searchsorted(date_ranks, odt)
    comp = ock * np.int64(n_ranks + 1) + orank
    order_sorted = np.sort(comp)
    ref = ray.put((order_sorted, date_ranks, n_ranks))

    SHIFT_US = np.int64(9131) * 86400 * 1_000_000  # fixed 9131-day shift (~25 y)

    def asof(batch: pa.Table) -> pa.Table:
        order_sorted, date_ranks, n_ranks = cached(ref)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        ts_shift = ts - SHIFT_US
        # rank of the latest order date <= shifted ts
        ts_rank = np.searchsorted(date_ranks, ts_shift, side="right") - 1
        comp_q = uid * np.int64(n_ranks + 1) + np.maximum(ts_rank, 0)
        pos = np.searchsorted(order_sorted, comp_q, side="right") - 1
        cand = order_sorted[np.maximum(pos, 0)]
        ok = (pos >= 0) & (cand // (n_ranks + 1) == uid) & (ts_rank >= 0)
        matched = np.where(ok, date_ranks[np.where(ok, cand % (n_ranks + 1), 0)], 0)
        out_dt = matched.astype("datetime64[us]")
        dt_arr = pa.array(out_dt, pa.timestamp("us"))
        dt_arr = pc.if_else(pa.array(ok), dt_arr, pa.scalar(None, pa.timestamp("us")))
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "matched_orderdate": dt_arr,
            }
        )

    out = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        asof, batch_format="pyarrow", batch_size=32768,
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def events_hopping_windows(sf_dir: str) -> pa.Table:
    """Hopping-window aggregate (1-day windows, 12-hour hop): every event
    contributes to the two windows covering it, assigned vectorized (flat-map
    ×2 inside the batch), then the same partial-aggregate + tiny groupby as
    the tumbling case. Returns (window_start, event_type, n_events)."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])
    HOP = np.int64(12 * 3600 * 1_000_000)

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks().to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        w1 = (ts // HOP) * HOP            # window starting at the last hop
        w0 = w1 - HOP                     # the previous overlapping window
        starts = np.concatenate([w0, w1]).astype("datetime64[us]")
        etype = pa.concat_arrays([batch["event_type"].combine_chunks()] * 2)
        t = pa.table({"window_start": pa.array(starts, pa.timestamp("us")), "event_type": etype})
        g = t.group_by(["window_start", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["window_start", "event_type", "cnt_p"])

    df = _fold_partials(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=32768),
        ds.count(), ["window_start", "event_type"], {"n_events": "cnt_p"})
    df = df.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    return pa.Table.from_pandas(df[["window_start", "event_type", "n_events"]], preserve_index=False)


def bloom_semi_join(sf_dir: str) -> pa.Table:
    """Semi-join with a Bloom-filter pre-pass (the scale pattern for
    fact-to-fact semi-joins): lineitem rows whose orderkey belongs to an
    URGENT order. A Bloom filter over the urgent orderkeys is broadcast and
    prunes ~FP-rate-close-to-everything before the exact verification
    (broadcast exact set here; at scale a shuffle join over survivors).
    Exactness is unaffected by Bloom false positives — oracle-gated.
    Returns (l_returnflag, n_items, sum_qty)."""
    import pyarrow.dataset as pads

    from ..kernels import BloomFilter

    # predicate-pushdown read: only row groups whose stats admit URGENT rows
    # are decoded, and only the key column materializes on the driver
    urgent = pads.dataset(f"{sf_dir}/orders.parquet").to_table(
        columns=["o_orderkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT")
    keys = urgent.column("o_orderkey").to_numpy()
    bloom = BloomFilter(n_bits=1 << 20, n_hashes=7, seed=42)
    bloom.update(pa.array(keys, pa.int64()).cast(pa.string()))  # vectorized hash
    exact_set = pa.array(keys, pa.int64())
    ref = ray.put((bloom.to_bytes(), exact_set))

    def _build_semi(state):
        from ..kernels import sketch_from_bytes

        raw, exact = state
        return sketch_from_bytes(raw), exact

    def semi(batch: pa.Table) -> pa.Table:
        bloom, exact_set_w = cached(ref, build=_build_semi)
        ok = batch["l_orderkey"].combine_chunks()
        maybe = bloom.contains(ok.cast(pa.string()))    # vectorized
        pruned = batch.filter(pa.array(maybe))          # Bloom pre-pass
        keep = pc.is_in(pruned["l_orderkey"], value_set=exact_set_w)
        sub = pruned.filter(keep)                       # exact verify
        g = sub.group_by("l_returnflag").aggregate([([], "count_all"), ("l_quantity", "sum")])
        return g.rename_columns(["l_returnflag", "cnt_p", "qty_p"])

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"])
    df = _fold_partials(
        ds.map_batches(semi, batch_format="pyarrow", batch_size=32768),
        ds.count(), ["l_returnflag"],
        {"n_items": "cnt_p", "sum_qty": "qty_p"})
    df["sum_qty"] = df["sum_qty"].round(2)
    df = df.sort_values("l_returnflag").reset_index(drop=True)
    return pa.Table.from_pandas(df[["l_returnflag", "n_items", "sum_qty"]], preserve_index=False)


def sessionize_users(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Sessionization (stateful per-key streaming op the Dataset API lacks):
    per user, events sorted by ts split into sessions at gaps > gap_minutes.
    Expressed as repartition-by-key + per-group vectorized session assembly
    (groupby().map_groups would call Python per user; instead whole
    partitions sessionize in one numpy pass). Returns per-user session
    stats: n_sessions, max_session_events."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def per_batch_sessions(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "n_sessions": pd.Series([], dtype="int64"),
                                 "max_session_events": pd.Series([], dtype="int64")})
        b = batch.sort_values(["user_id", "ts"])
        uid = b["user_id"].to_numpy()
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[0], np.diff(ts)]) > gap_minutes * 60_000_000
        new_session = new_user | gap
        sess_id = np.cumsum(new_session) - 1
        df = pd.DataFrame({"user_id": uid, "sess": sess_id})
        per_sess = df.groupby(["user_id", "sess"], as_index=False).size()
        out = per_sess.groupby("user_id", as_index=False).agg(
            n_sessions=("sess", "nunique"), max_session_events=("size", "max"))
        return out.astype({"user_id": "int64", "n_sessions": "int64",
                           "max_session_events": "int64"})

    # adaptive: below _SMALL_ROWS the whole (user_id, ts) projection fits on
    # the driver and one vectorized pass sessionizes everything (the bucket
    # shuffle's sort-groupby costs seconds of fixed overhead); above it,
    # hash-partition by a coarse user bucket so each task sessionizes MANY
    # whole users in one vectorized pass (groupby(user_id).map_groups would
    # pay one Python call per user); per-key completeness still holds
    # because bucket(user) is a function of user_id alone
    if ds.count() < _SMALL_ROWS:
        df = per_batch_sessions(ds.to_pandas())
        df = df.sort_values("user_id").reset_index(drop=True)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        ds.map_batches(_bucket_users, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket")
        .map_groups(lambda g: per_batch_sessions(g.drop(columns=["bucket"])),
                    batch_format="pandas")
    )
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def rolling_user_stats(sf_dir: str, k: int = 3) -> pa.Table:
    """Per-key ordered sliding-window aggregate (the SQL ``ROWS BETWEEN
    k-1 PRECEDING AND CURRENT ROW`` window-function shape): for every
    event, the row number and the moving average of ``value`` over the
    trailing ``k`` events of the same user, ordered by (ts, event_id).

    Same adaptive shape as sessionize_users: below _SMALL_ROWS one
    vectorized driver pass; above, hash-bucket users (bucket is a function
    of user_id alone, so per-key completeness holds) and each partition
    computes MANY whole users in one numpy pass — no per-user Python, no
    global sort. The window sum adds the k shifted value arrays
    oldest-to-newest (not a cumsum difference) so float association
    matches the SQL frame scan exactly."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "rn": pd.Series([], dtype="int64"),
                                 "mov_avg": pd.Series([], dtype="float64")})
        b = batch.sort_values(["user_id", "ts", "event_id"])
        uid = b["user_id"].to_numpy()
        v = b["value"].to_numpy(np.float64)
        n = len(b)
        idx = np.arange(n)
        seg_start = idx[np.concatenate([[True], uid[1:] != uid[:-1]])]
        start_of = np.repeat(seg_start, np.diff(np.append(seg_start, n)))
        rn = idx - start_of + 1
        width = np.minimum(rn, k)
        s = np.zeros(n, np.float64)
        for j in range(k - 1, -1, -1):  # oldest-first: SQL frame-scan order
            src = np.maximum(idx - j, 0)
            s = s + np.where(idx - j >= start_of, v[src], 0.0)
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(np.int64),
            "user_id": uid.astype(np.int64),
            "rn": rn.astype(np.int64),
            "mov_avg": np.round(s / width, 6),
        })

    if ds.count() < _SMALL_ROWS:
        df = per_batch(ds.to_pandas())
    else:
        out = (
            ds.map_batches(_bucket_users, batch_format="pyarrow", batch_size=65536)
            .groupby("bucket")
            .map_groups(lambda g: per_batch(g.drop(columns=["bucket"])),
                        batch_format="pandas")
        )
        df = out.to_pandas()
    df = df.sort_values("event_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def event_transitions(sf_dir: str, force: str | None = None) -> pa.Table:
    """Per-user event-type transition counts — the Markov-chain /
    next-event-prediction statistic (the LEAD window shape): for every
    consecutive pair of events of one user (ordered by ts, event_id),
    count (from_type, to_type) corpus-wide and report the row-normalized
    transition probability.

    Same adaptive shape as user_event_gaps: driver pass below
    _SMALL_ROWS, else user-bucket map_groups emitting (from, to, n)
    partials — (types² × buckets)-bounded rows only. The one float op
    (n / row_total) mirrors the oracle's division. Returns
    (from_type, to_type, n, p) sorted by (from_type, to_type)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"from_type": pd.Series([], dtype="object"),
                                 "to_type": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        b = batch.sort_values(["user_id", "ts", "event_id"])
        uid = b["user_id"].to_numpy(np.int64)
        et = b["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        return pd.DataFrame({"from_type": et[:-1][same],
                             "to_type": et[1:][same]}) \
            .groupby(["from_type", "to_type"], as_index=False) \
            .size().rename(columns={"size": "n"})

    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        df = per_batch(ds.to_pandas())
    else:
        out = (
            ds.map_batches(_bucket_users, batch_format="pyarrow", batch_size=65536)
            .groupby("bucket")
            .map_groups(lambda g: per_batch(g.drop(columns=["bucket"])),
                        batch_format="pandas")
        )
        df = ensure_columns(out.to_pandas(),
                            {"from_type": "object", "to_type": "object",
                             "n": "int64"})
        df = df.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
    totals = df.groupby("from_type")["n"].transform("sum")
    df = df.assign(n=df["n"].astype("int64"),
                   p=round6(df["n"].to_numpy(np.float64)
                            / totals.to_numpy(np.float64)))
    df = df.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def transition_entropy(sf_dir: str, force: str | None = None) -> pa.Table:
    """Conditional entropy of the event-type Markov chain — "how
    predictable is the next event given the current one", the sequence-
    predictability statistic behind session-model feature selection. Per
    from_type: transition count, distinct successor count, successor
    entropy H(next|from=x) = −Σ_y p(y|x)·ln p(y|x); every row also
    carries the global H(next|from) = −Σ_cells (n_xy/N)·ln(n_xy/n_x).

    Reuses the `event_transitions` fold (adaptive driver / user-bucket
    map_groups; types²-bounded partials) — the entropy math runs on the
    contingency table, which IS the sufficient statistic. Float term-sums
    are safe at 6dp (terms O(0.1), |types| ≈ dozens — the lang_source_mi
    precedent); each division mirrors the oracle's int/DOUBLE shape and
    both sides round6 before comparison. Returns (from_type, n_trans,
    n_next_types, h_next, h_cond_global) sorted by from_type."""
    t = event_transitions(sf_dir, force).to_pandas()
    n = t["n"].to_numpy(np.int64).astype(np.float64)
    nx = t.groupby("from_type")["n"].transform("sum") \
        .to_numpy(np.int64).astype(np.float64)
    n_total = float(n.sum())
    if not len(t):
        return pa.table({
            "from_type": pa.array([], pa.string()),
            "n_trans": pa.array([], pa.int64()),
            "n_next_types": pa.array([], pa.int64()),
            "h_next": pa.array([], pa.float64()),
            "h_cond_global": pa.array([], pa.float64())})
    p = n / nx
    logp = np.log(p)
    h_cond_global = float(round6(-((n / n_total) * logp).sum()))
    agg = pd.DataFrame({"from_type": t["from_type"].to_numpy(),
                        "n": n.astype(np.int64), "term": p * logp}) \
        .groupby("from_type", as_index=False) \
        .agg(n_trans=("n", "sum"), n_next_types=("n", "size"),
             h=("term", "sum")) \
        .sort_values("from_type").reset_index(drop=True)
    return pa.table({
        "from_type": pa.array(agg["from_type"].to_numpy(), pa.string()),
        "n_trans": pa.array(agg["n_trans"].to_numpy(np.int64), pa.int64()),
        "n_next_types": pa.array(agg["n_next_types"].to_numpy(np.int64),
                                 pa.int64()),
        "h_next": pa.array(np.asarray(round6(-agg["h"].to_numpy(np.float64)),
                                      np.float64), pa.float64()),
        "h_cond_global": pa.array([h_cond_global] * len(agg), pa.float64()),
    })


def user_event_gaps(sf_dir: str, force: str | None = None) -> pa.Table:
    """Per-user inter-event-time statistics — the SQL LAG window primitive
    (gap = ts − lag(ts) OVER (PARTITION BY user ORDER BY ts, event_id))
    aggregated per user: n_events, mean_gap_s, max_gap_s over users with
    ≥ 2 events. The behavioral-analytics complement of sessionize_users
    (which thresholds these gaps) and rolling_user_stats (value frames).

    Same adaptive shape: below _SMALL_ROWS one vectorized driver pass;
    above, hash-bucket users and each partition resolves MANY whole users
    per numpy pass — per-user output rows only (key-bounded), no global
    sort. Gap math is integer microseconds end-to-end; the one float op
    (sum/n)/1e6 mirrors the oracle's division order exactly.
    ``force`` pins the branch ("driver"/"distributed") for tests."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "mean_gap_s": pd.Series([], dtype="float64"),
                                 "max_gap_s": pd.Series([], dtype="float64")})
        b = batch.sort_values(["user_id", "ts", "event_id"])
        uid = b["user_id"].to_numpy(np.int64)
        ts = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        n = len(b)
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gaps = np.diff(ts)  # valid where NOT new_user[1:]
        valid = ~new_user[1:]
        seg_start = np.flatnonzero(new_user)
        counts = np.diff(np.append(seg_start, n))
        keep = counts >= 2
        # per-user fold over the contiguous gap runs (counts-1 gaps each)
        gap_user = np.repeat(np.arange(len(seg_start)), counts - 1)
        gv = gaps[valid]
        sums = np.bincount(gap_user, weights=gv, minlength=len(seg_start))
        maxs = np.full(len(seg_start), -1, np.int64)
        if len(gv):
            np.maximum.at(maxs, gap_user, gv.astype(np.int64))
        return pd.DataFrame({
            "user_id": uid[seg_start[keep]],
            "n_events": counts[keep].astype(np.int64),
            "mean_gap_s": np.round(
                (sums[keep] / (counts[keep] - 1)) / 1e6, 6),
            "max_gap_s": np.round(maxs[keep] / 1e6, 6),
        })

    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        df = per_batch(ds.to_pandas())
    else:
        out = (
            ds.map_batches(_bucket_users, batch_format="pyarrow", batch_size=65536)
            .groupby("bucket")
            .map_groups(lambda g: per_batch(g.drop(columns=["bucket"])),
                        batch_format="pandas")
        )
        df = out.to_pandas()
    df = df.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _segment_intervals(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Elementary-segment decomposition of (possibly overlapping) intervals
    [lo_i, hi_i): the sorted unique bounds split the line into segments each
    covered by a FIXED set of intervals. Returns (edges int64[m],
    coverage bool[n_intervals, m-1]). The decomposition makes an arbitrary
    interval join a single ``searchsorted`` per probe row: no per-row
    interval scan, no special-casing of uniform widths."""
    edges = np.unique(np.concatenate([lo, hi]))
    cover = (lo[:, None] <= edges[None, :-1]) & (edges[None, 1:] <= hi[:, None])
    return edges, cover


def range_join_events(
    sf_dir: str,
    n_campaigns: int = 20,
    stride_hours: int = 36,
    width_hours: int = 48,
) -> pa.Table:
    """RANGE (interval) JOIN + aggregate: events joined to overlapping
    campaign windows on ``lo <= ts < hi``, aggregated per campaign
    (SURVEY.md §2 extension: the join flavor neither equi- nor as-of joins
    cover; Ray Data has no native operator for it).

    Plan (broadcast small side — the standard shape: the interval table is
    dimension-sized): the driver decomposes the campaign intervals into
    elementary segments once (_segment_intervals) and broadcasts
    (edges, coverage). Each batch buckets its events into segments with ONE
    ``np.searchsorted`` + two ``np.bincount`` calls and emits per-segment
    partial (count, sum) rows — at most (2·n_intervals−1) rows per batch, so
    the only shuffle is segment-partial-sized. The final tiny groupby's
    segment totals scatter to campaigns through the coverage matrix (an
    event in a segment covered by c campaigns counts once per campaign —
    exactly the SQL join semantics). Both-sides-large range joins would
    instead tile the time axis and co-partition (the as-of join's
    partitioned plan, asof_latest_order), documented not needed here.

    Returns (campaign_id, n_events, total_value) for campaigns with >= 1
    event (inner join) — oracle-gated vs a DuckDB interval join."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    lo = (base + np.arange(n_campaigns) * np.timedelta64(stride_hours, "h")).astype(
        "datetime64[us]").astype(np.int64)
    hi = lo + np.timedelta64(width_hours, "h").astype("timedelta64[us]").astype(np.int64)
    edges, cover = _segment_intervals(lo, hi)
    covered_any = cover.any(axis=0)
    n_seg = len(edges) - 1
    ref = ray.put((edges, covered_any))

    def partials(batch: pa.Table) -> pa.Table:
        edges_w, covered_w = cached(ref)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        val = batch["value"].to_numpy(zero_copy_only=False)
        seg = np.searchsorted(edges_w, ts, side="right") - 1
        ok = (seg >= 0) & (seg < n_seg)
        ok[ok] &= covered_w[seg[ok]]
        seg, val = seg[ok], val[ok]
        cnt = np.bincount(seg, minlength=n_seg)
        tot = np.bincount(seg, weights=val, minlength=n_seg)
        nz = np.flatnonzero(cnt)
        return pa.table({"seg": pa.array(nz, pa.int64()),
                         "cnt_p": pa.array(cnt[nz], pa.int64()),
                         "val_p": pa.array(tot[nz], pa.float64())})

    agg = (
        _read(sf_dir, "events", ["ts", "value"])
        .map_batches(partials, batch_format="pyarrow", batch_size=65536)
        .groupby("seg")
        .aggregate(Sum("cnt_p", alias_name="cnt"), Sum("val_p", alias_name="val"))
    )
    df = agg.to_pandas()  # <= n_segments rows
    seg_cnt = np.zeros(n_seg, dtype=np.int64)
    seg_val = np.zeros(n_seg, dtype=np.float64)
    if len(df):
        seg_cnt[df["seg"].to_numpy()] = df["cnt"].to_numpy()
        seg_val[df["seg"].to_numpy()] = df["val"].to_numpy()
    n_events = cover @ seg_cnt
    total_value = cover @ seg_val
    keep = n_events > 0
    return pa.table({
        "campaign_id": pa.array(np.flatnonzero(keep), pa.int64()),
        "n_events": pa.array(n_events[keep], pa.int64()),
        "total_value": pa.array(np.round(total_value[keep], 6), pa.float64()),
    })


def range_join_events_rows(
    sf_dir: str,
    n_campaigns: int = 20,
    stride_hours: int = 36,
    width_hours: int = 48,
) -> pa.Table:
    """ROW-level range (interval) join — the general operator form next to
    the aggregating ``range_join_events``: every (event, covering campaign)
    pair becomes an output row (an event inside two overlapping windows
    emits twice, exactly SQL inner-join semantics).

    Same broadcast elementary-segment plan, but the per-batch kernel
    EXPANDS instead of aggregating: the segment->covering-intervals mapping
    is precomputed once as CSR (offsets + flat interval ids, from the
    coverage matrix), so each batch is one searchsorted + one np.repeat +
    one CSR gather — fully vectorized row expansion, output bounded by the
    join cardinality. Returns (event_id, campaign_id) sorted — oracle-gated."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    lo = (base + np.arange(n_campaigns) * np.timedelta64(stride_hours, "h")).astype(
        "datetime64[us]").astype(np.int64)
    hi = lo + np.timedelta64(width_hours, "h").astype("timedelta64[us]").astype(np.int64)
    edges, cover = _segment_intervals(lo, hi)
    n_seg = len(edges) - 1
    # CSR: for segment j, covering interval ids are flat[offsets[j]:offsets[j+1]]
    ivl_idx, seg_idx = np.nonzero(cover)
    order = np.argsort(seg_idx, kind="stable")
    flat_ivl = ivl_idx[order].astype(np.int64)
    seg_deg = np.bincount(seg_idx, minlength=n_seg)
    offsets = np.concatenate([[0], np.cumsum(seg_deg)])
    ref = ray.put((edges, seg_deg.astype(np.int64), offsets, flat_ivl))

    def expand(batch: pa.Table) -> pa.Table:
        edges_w, deg_w, off_w, flat_w = cached(ref)
        ev = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        seg = np.searchsorted(edges_w, ts, side="right") - 1
        ok = (seg >= 0) & (seg < len(deg_w))
        ev, seg = ev[ok], seg[ok]
        reps = deg_w[seg]
        ev_out = np.repeat(ev, reps)
        # CSR gather: for each event, its segment's covering-interval slice
        starts = np.repeat(off_w[seg], reps)
        within = np.arange(len(ev_out)) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
        camp_out = flat_w[starts + within]
        return pa.table({"event_id": pa.array(ev_out, pa.int64()),
                         "campaign_id": pa.array(camp_out, pa.int64())})

    out = _read(sf_dir, "events", ["event_id", "ts"]).map_batches(
        expand, batch_format="pyarrow", batch_size=65536)
    df = out.to_pandas().sort_values(["event_id", "campaign_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(df.astype("int64"), preserve_index=False)


def daily_type_deltas(sf_dir: str) -> pa.Table:
    """Day-over-day change per event type — the trend/anomaly statistic
    over the tumbling-window aggregate: for every (day, type), the event
    count, previous PRESENT day's count (0 when the type has no earlier
    day), and the delta. Derived driver-side from the group-bounded
    (day, type) table the windowed aggregate already produces — no extra
    corpus pass. Returns (day, event_type, n_events, prev_events, delta)."""
    base = events_daily_windows(sf_dir).to_pandas()
    base = base.sort_values(["event_type", "day"]).reset_index(drop=True)
    prev = base.groupby("event_type")["n_events"].shift(1).fillna(0).astype("int64")
    out = pd.DataFrame({
        "day": base["day"],
        "event_type": base["event_type"],
        "n_events": base["n_events"].astype("int64"),
        "prev_events": prev,
        "delta": (base["n_events"] - prev).astype("int64"),
    })
    out = out.sort_values(["day", "event_type"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def join_size_exact(sf_dir: str, force: str | None = None) -> pa.Table:
    """Exact equi-join cardinality |events ⋈ orders on user_id=o_custkey| —
    the ground truth for the CM inner-product estimator
    (sketch_queries.cm_join_size; Cormode & Muthukrishnan 2005 §4.2).

    Join size = Σ_k cE(k)·cO(k), computed WITHOUT materializing a single
    join row: per-batch ``value_counts`` shrink each side to
    (key, partial-count) rows bounded by distinct keys × batches, then

    - driver fold (default below ``_SMALL_ROWS`` combined input rows,
      ``force="driver"``): two group-bounded pandas sums + one merge + dot;
    - distributed (``force="shuffle"``): tagged-union groupby(key) with
      per-side Sum aggregates, then a streaming partial-product pass —
      every row that moves is 24 bytes, never a join row.

    Returns a single row (n_pairs). Both plans pinned equal by pytest."""
    def side_partials(table: str, col: str, out_col: str):
        def partials(batch: pa.Table) -> pa.Table:
            vc = batch[col].combine_chunks().value_counts()
            keys = vc.field("values").cast(pa.int64())
            cnts = vc.field("counts").cast(pa.int64())
            other = "b" if out_col == "a" else "a"
            z = pa.array(np.zeros(len(keys), np.int64))
            return pa.table({"key": keys, out_col: cnts, other: z})

        return _read(sf_dir, table, [col]).map_batches(
            partials, batch_format="pyarrow", batch_size=16384)

    n_in = _read(sf_dir, "events", ["user_id"]).count() \
        + _read(sf_dir, "orders", ["o_custkey"]).count()
    ev = side_partials("events", "user_id", "a")
    od = side_partials("orders", "o_custkey", "b")
    small = (n_in < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        df = ensure_columns(ev.union(od).to_pandas(),
                            {"key": "int64", "a": "int64", "b": "int64"})
        g = df.groupby("key", as_index=False)[["a", "b"]].sum()
        n_pairs = int((g["a"].to_numpy(np.int64) * g["b"].to_numpy(np.int64)).sum())
    else:
        agg = (ev.union(od).repartition(n_reducers())
               .groupby("key")
               .aggregate(Sum("a", alias_name="ca"), Sum("b", alias_name="cb")))

        def prod(batch: pa.Table) -> pa.Table:
            p = (batch["ca"].to_numpy(zero_copy_only=False)
                 * batch["cb"].to_numpy(zero_copy_only=False))
            return pa.table({"p": pa.array([int(p.sum())], pa.int64())})

        n_pairs = int(agg.map_batches(prod, batch_format="pyarrow",
                                      batch_size=65536).sum("p") or 0)
    return pa.table({"n_pairs": pa.array([n_pairs], pa.int64())})


def f2_self_join_exact(sf_dir: str, force: str | None = None) -> pa.Table:
    """Exact second frequency moment F2 = Σ_k f(k)² of events.user_id —
    the SELF-join size (how many pairs collide on one user), the AMS
    statistic the CountSketch estimator approximates
    (sketch_queries.cs_moments). Same physical shape as join_size_exact:
    per-batch value_counts partials, adaptive driver fold / tagged
    groupby(key) Sum, square-and-sum streamed. Returns a single row (f2)."""
    def partials(batch: pa.Table) -> pa.Table:
        vc = batch["user_id"].combine_chunks().value_counts()
        return pa.table({"key": vc.field("values").cast(pa.int64()),
                         "c": vc.field("counts").cast(pa.int64())})

    ds = _read(sf_dir, "events", ["user_id"])
    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=16384)
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        df = ensure_columns(parts.to_pandas(), {"key": "int64", "c": "int64"})
        g = df.groupby("key")["c"].sum().to_numpy(np.int64)
        f2 = int((g * g).sum())
    else:
        agg = (parts.repartition(n_reducers()).groupby("key")
               .aggregate(Sum("c", alias_name="cnt")))

        def sq(batch: pa.Table) -> pa.Table:
            c = batch["cnt"].to_numpy(zero_copy_only=False)
            return pa.table({"s": pa.array([int((c * c).sum())], pa.int64())})

        f2 = int(agg.map_batches(sq, batch_format="pyarrow",
                                 batch_size=65536).sum("s") or 0)
    return pa.table({"f2": pa.array([f2], pa.int64())})


def set_op_cardinalities(sf_dir: str, force: str | None = None) -> pa.Table:
    """Exact distinct-set algebra between two key streams that never join:
    A = distinct events.user_id, B = distinct orders.o_custkey. Returns one
    row (n_a, n_b, n_union, n_intersect, n_only_a, n_only_b, jaccard) —
    the ground truth for the theta-sketch estimator (sketch_queries
    .kmv_set_ops; Dasgupta et al. 2016), same exact-vs-sketch pairing as
    join_size_exact / cm_join_size.

    Physical shape: per-batch ``np.unique`` shrinks each side to distinct
    keys per batch (a key seen 10^9 times ships once per batch), then

    - driver fold (default below ``_SMALL_ROWS`` combined input rows,
      ``force="driver"``): np.unique + sorted intersect over key-bounded
      arrays;
    - distributed (``force="shuffle"``): tagged-union groupby(key) with
      per-side Max membership flags, then a streaming combo-count pass —
      every row that moves is 24 bytes.

    Both plans pinned equal by pytest (forced-branch invariant)."""
    def side_partials(table: str, col: str, out_col: str):
        def partials(batch: pa.Table) -> pa.Table:
            u = np.unique(batch[col].to_numpy(zero_copy_only=False))
            flags = {c: np.full(len(u), int(c == out_col), np.int64)
                     for c in ("in_a", "in_b")}  # fixed order: union-safe schema
            return pa.table({"key": pa.array(u, pa.int64()),
                             "in_a": pa.array(flags["in_a"]),
                             "in_b": pa.array(flags["in_b"])})

        return _read(sf_dir, table, [col]).map_batches(
            partials, batch_format="pyarrow", batch_size=16384)

    n_in = _read(sf_dir, "events", ["user_id"]).count() \
        + _read(sf_dir, "orders", ["o_custkey"]).count()
    ev = side_partials("events", "user_id", "in_a")
    od = side_partials("orders", "o_custkey", "in_b")
    small = (n_in < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        df = ensure_columns(ev.union(od).to_pandas(),
                            {"key": "int64", "in_a": "int64", "in_b": "int64"})
        a = np.unique(df.loc[df["in_a"] == 1, "key"].to_numpy(np.int64))
        b = np.unique(df.loc[df["in_b"] == 1, "key"].to_numpy(np.int64))
        n_a, n_b = len(a), len(b)
        n_inter = len(np.intersect1d(a, b, assume_unique=True))
    else:
        agg = (ev.union(od).repartition(n_reducers())
               .groupby("key")
               .aggregate(Max("in_a", alias_name="a"), Max("in_b", alias_name="b")))

        def combos(batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            return pa.table({"n_a": pa.array([int(a.sum())], pa.int64()),
                             "n_b": pa.array([int(b.sum())], pa.int64()),
                             "n_inter": pa.array([int((a & b).sum())], pa.int64())})

        t = (agg.map_batches(combos, batch_format="pyarrow", batch_size=65536)
             .to_pandas())
        t = ensure_columns(t, {"n_a": "int64", "n_b": "int64", "n_inter": "int64"})
        n_a, n_b, n_inter = int(t["n_a"].sum()), int(t["n_b"].sum()), int(t["n_inter"].sum())
    n_union = n_a + n_b - n_inter
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "n_union": pa.array([n_union], pa.int64()),
        "n_intersect": pa.array([n_inter], pa.int64()),
        "n_only_a": pa.array([n_a - n_inter], pa.int64()),
        "n_only_b": pa.array([n_b - n_inter], pa.int64()),
        "jaccard": pa.array([float(round6(n_inter / n_union)) if n_union else 0.0],
                            pa.float64()),
    })


def event_anomaly_days(sf_dir: str, z_threshold: float = 2.0) -> pa.Table:
    """Volume-anomaly detection over the event stream: days whose per-type
    event count sits ≥ ``z_threshold`` sample standard deviations from
    that type's cross-day mean — the trend/alerting statistic layered on
    the tumbling-window aggregate (same composition discipline as
    daily_type_deltas: derived driver-side from the group-bounded
    (day, type) table events_daily_windows already produces, no extra
    corpus pass).

    z is computed from exact integer moments (n, Σx, Σx²) in the oracle's
    float order — z = (x − s/n) / sqrt((ss − s·(s/n)) / (n−1)) — and the
    threshold test runs on the 6dp-ROUNDED z on both sides, so the filter
    boundary cannot disagree with the SQL (quality_zscores precedent).
    Types with < 2 days or zero variance are excluded. Returns
    (day, event_type, n_events, z) sorted by (day, event_type)."""
    base = events_daily_windows(sf_dir).to_pandas()
    out_rows = []
    for etype, g in base.groupby("event_type"):
        x = g["n_events"].to_numpy(np.int64)
        nd = len(x)
        if nd < 2:
            continue
        s, ss = int(x.sum()), int((x * x).sum())
        mean = s / nd
        var = (ss - s * mean) / (nd - 1)
        if var <= 0:
            continue
        sd = float(np.sqrt(var))
        z = round6((x - mean) / sd)
        keep = np.abs(z) >= z_threshold
        for day, n_ev, zz in zip(g["day"].to_numpy()[keep],
                                 x[keep], np.asarray(z)[keep]):
            out_rows.append((day, etype, int(n_ev), float(zz)))
    out = pd.DataFrame(out_rows, columns=["day", "event_type", "n_events", "z"])
    if not len(out):
        out = pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                            "event_type": pd.Series([], dtype="object"),
                            "n_events": pd.Series([], dtype="int64"),
                            "z": pd.Series([], dtype="float64")})
    out = out.sort_values(["day", "event_type"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def user_first_seen_curve(sf_dir: str, force: str | None = None) -> pa.Table:
    """Cumulative-unique-users growth curve: per day, how many users made
    their FIRST-ever event that day, plus the running total — audience
    growth from an append-only event stream without re-counting distinct
    users per prefix (which would be quadratic).

    Same physical shape as the vocabulary-novelty fold: per-batch
    (user_id, min day) partials — user-bounded per batch — folded
    adaptively (driver min-fold below _SMALL_ROWS, else distributed
    groupby(user).Min; a Min has no hot-key pile-up to salt), then a tiny
    per-day count + cumsum. Returns (day, new_users, cum_users) sorted by
    day; days where no user is new emit no row (matching SQL GROUP BY)."""
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def firsts(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch["ts"].combine_chunks(), unit="day")
        t = pa.table({"user_id": batch["user_id"], "first_day": day})
        g = t.group_by("user_id").aggregate([("first_day", "min")])
        return g.rename_columns(["user_id", "first_day"])

    parts = ds.map_batches(firsts, batch_format="pyarrow", batch_size=32768)
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"user_id": "int64", "first_day": "datetime64[us]"})
        fd = pdf.groupby("user_id")["first_day"].min()
        per_day = fd.value_counts().sort_index()
    else:
        agg = (parts.repartition(n_reducers()).groupby("user_id")
               .aggregate(Min("first_day", alias_name="first_day")))

        def day_partials(batch: pa.Table) -> pa.Table:
            g = batch.group_by("first_day").aggregate([([], "count_all")])
            return g.rename_columns(["first_day", "partial"])

        t = ensure_columns(
            agg.map_batches(day_partials, batch_format="pyarrow",
                            batch_size=65536).to_pandas(),
            {"first_day": "datetime64[us]", "partial": "int64"})
        per_day = t.groupby("first_day")["partial"].sum().sort_index()
    new = per_day.to_numpy(np.int64)
    return pa.table({
        "day": pa.array(per_day.index.to_numpy(), pa.timestamp("us")),
        "new_users": pa.array(new, pa.int64()),
        "cum_users": pa.array(np.cumsum(new), pa.int64()),
    })


def order_rank_in_priority(sf_dir: str, force: str | None = None) -> pa.Table:
    """RANK / PERCENT_RANK of every order's total price within its
    priority class — the ranking window shape (ties share a rank; percent
    rank = (rank − 1)/(n − 1)) that complements the LAG/LEAD and quantile
    windows already covered.

    Plan: priority classes are few and bounded, so the shuffle is ONE
    groupby(priority) over (orderkey, totalprice) pairs; ranks inside a
    group come from a vectorized double-searchsorted on the sorted price
    array (no per-row loop). Adaptive: below _SMALL_ROWS the pairs fold
    driver-side with the same numpy kernel (forced-branch pytest pins
    equality). Returns (o_orderkey, o_orderpriority, o_totalprice, rnk,
    pct_rank) sorted by (o_orderpriority, rnk, o_orderkey); pct_rank
    rounded 6dp half-away."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def ranked(df: pd.DataFrame) -> pd.DataFrame:
        price = df["o_totalprice"].to_numpy(np.float64)
        order = np.lexsort((df["o_orderkey"].to_numpy(np.int64), price))
        sp = price[order]
        # RANK(): 1 + number of rows strictly cheaper (ties share)
        rnk = np.searchsorted(sp, sp, side="left") + 1
        nn = len(sp)
        pct = round6((rnk - 1) / (nn - 1)) if nn > 1 else np.zeros(nn)
        out = df.iloc[order].reset_index(drop=True)
        out["rnk"] = rnk.astype(np.int64)
        out["pct_rank"] = np.asarray(pct, np.float64)
        return out

    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(ds.to_pandas(),
                             {"o_orderkey": "int64", "o_orderpriority": "object",
                              "o_totalprice": "float64"})
        parts = [ranked(g) for _, g in pdf.groupby("o_orderpriority", sort=True)]
        df = pd.concat(parts, ignore_index=True) if parts else pdf.assign(
            rnk=pd.Series([], dtype="int64"), pct_rank=pd.Series([], dtype="float64"))
    else:
        out = (ds.repartition(n_reducers())
               .groupby("o_orderpriority")
               .map_groups(ranked, batch_format="pandas"))
        df = ensure_columns(out.to_pandas(),
                            {"o_orderkey": "int64", "o_orderpriority": "object",
                             "o_totalprice": "float64", "rnk": "int64",
                             "pct_rank": "float64"})
    df = df.sort_values(["o_orderpriority", "rnk", "o_orderkey"]).reset_index(drop=True)
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice", "rnk", "pct_rank"]
    return pa.Table.from_pandas(df[cols], preserve_index=False)


def heavy_revenue_customers(sf_dir: str, mult: float = 1.5,
                            force: str | None = None) -> pa.Table:
    """WEIGHTED heavy hitters: customers whose summed order value reaches
    ``mult`` × the MEAN customer revenue — the reference's threshold
    predicate (M8, src/sketch.cpp:222-245) generalized from counts to a
    weighted stream (CM-CU weighted updates support the sketch analogue;
    this is the exact side). The threshold is mean-relative rather than
    total-relative: with K customers a total-share cut goes vacuous as K
    grows (every share ~1/K), while mult·mean keeps a stable admitted
    fraction at every scale.

    Money is folded in integer CENTS (round(price·100)) — float sums near
    the threshold boundary would make membership depend on accumulation
    order; integer partials make the comparison exact and mirror the
    oracle's CAST(round(x*100) AS BIGINT). Per-batch (custkey, cents)
    partials fold adaptively (driver below _SMALL_ROWS / distributed
    groupby-Sum). Threshold = ceil(rel · total_cents) — scale-invariant.
    Returns (o_custkey, revenue) with revenue = cents/100, sorted by
    o_custkey."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        t = pa.table({"o_custkey": batch["o_custkey"],
                      "cents": pa.array(cents)})
        g = t.group_by("o_custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["o_custkey", "cents"])

    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=32768)
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"o_custkey": "int64", "cents": "int64"})
        g = pdf.groupby("o_custkey", as_index=False)["cents"].sum()
    else:
        g = (parts.repartition(n_reducers()).groupby("o_custkey")
             .aggregate(Sum("cents", alias_name="cents"))).to_pandas()
        g = ensure_columns(g, {"o_custkey": "int64", "cents": "int64"})
    total = int(g["cents"].sum())
    thr = int(np.ceil(mult * total / max(len(g), 1)))
    g = g[g["cents"] >= thr].sort_values("o_custkey").reset_index(drop=True)
    return pa.table({
        "o_custkey": pa.array(g["o_custkey"].to_numpy(np.int64), pa.int64()),
        "revenue": pa.array(np.round(g["cents"].to_numpy(np.int64) / 100.0, 2),
                            pa.float64()),
    })


def q6_forecast_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q6 shape — the canonical predicate-pushdown aggregate: revenue
    delta from lineitems in one shipdate year with discount in a band and
    quantity under a cap. The date/discount/quantity filters are pushed
    into the PARQUET READ (row-group pruning + late materialization), so
    only admitting row groups leave storage — the "prune at the read"
    pattern stated as a scale rule in SURVEY §4. One streaming
    sum-of-products per batch; revenue rounded 2dp (the
    revenue_per_priority precedent). Returns one row (revenue, n_items)."""
    import pyarrow.dataset as pads

    import ray.data as rd

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))
    flt = (
        (pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi)
        & (pads.field("l_discount") >= 0.03)
        & (pads.field("l_discount") <= 0.05)
        & (pads.field("l_quantity") < 24)
    )
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_discount"],
                         filter=flt)

    def partials(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"rev": pa.array([float((p * d).sum())], pa.float64()),
                         "n": pa.array([len(p)], pa.int64())})

    t = ensure_columns(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=65536)
          .to_pandas(),
        {"rev": "float64", "n": "int64"})
    return pa.table({
        "revenue": pa.array([float(np.round(t["rev"].sum(), 2))], pa.float64()),
        "n_items": pa.array([int(t["n"].sum())], pa.int64()),
    })


def dow_hour_profile(sf_dir: str, force: str | None = None) -> pa.Table:
    """Seasonality profile of the event stream: count + value sum per
    (day-of-week, hour-of-day) cell — the temporal-feature extraction a
    traffic model starts from. Cell count is fixed (≤ 168), so the fold is
    group-bounded: per-batch (dow, hour) partials, adaptive driver /
    distributed Sum fold. Day-of-week follows DuckDB's dayofweek
    (0 = Sunday; Arrow counts from Monday, so the partial shifts by +1
    mod 7 to match the oracle). value_sum rounded 4dp (daily-windows
    precedent). Returns (dow, hour, n_events, value_sum) sorted."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks()
        dow_mon0 = pc.day_of_week(ts).to_numpy(zero_copy_only=False)
        dow = (dow_mon0 + 1) % 7  # Monday=0 -> Sunday=0 convention
        hour = pc.hour(ts).to_numpy(zero_copy_only=False)
        t = pa.table({"dow": pa.array(dow.astype(np.int64)),
                      "hour": pa.array(hour.astype(np.int64)),
                      "value": batch["value"],
                      "one": pa.array(np.ones(len(dow), np.int64))})
        g = t.group_by(["dow", "hour"]).aggregate([("one", "sum"), ("value", "sum")])
        return g.rename_columns(["dow", "hour", "cnt_p", "val_p"])

    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=32768)
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"dow": "int64", "hour": "int64",
                              "cnt_p": "int64", "val_p": "float64"})
        g = pdf.groupby(["dow", "hour"], as_index=False)[["cnt_p", "val_p"]].sum()
    else:
        g = (parts.repartition(n_reducers()).groupby(["dow", "hour"])
             .aggregate(Sum("cnt_p", alias_name="cnt_p"),
                        Sum("val_p", alias_name="val_p"))).to_pandas()
        g = ensure_columns(g, {"dow": "int64", "hour": "int64",
                               "cnt_p": "int64", "val_p": "float64"})
    g = g.sort_values(["dow", "hour"]).reset_index(drop=True)
    return pa.table({
        "dow": pa.array(g["dow"].to_numpy(np.int64), pa.int64()),
        "hour": pa.array(g["hour"].to_numpy(np.int64), pa.int64()),
        "n_events": pa.array(g["cnt_p"].to_numpy(np.int64), pa.int64()),
        "value_sum": pa.array(np.round(g["val_p"].to_numpy(np.float64), 4),
                              pa.float64()),
    })


def promo_revenue_share(sf_dir: str) -> pa.Table:
    """TPC-H Q14 shape — promotion revenue share: of one shipdate month's
    lineitem revenue, what fraction comes from parts whose p_type is
    PROMO? The canonical fact⋈dimension broadcast: the part side reads
    ONLY (p_partkey, p_type == 'PROMO') with predicate pushdown, ships
    once as a sorted partkey array (`ray.put` + per-worker fetch-once),
    and the lineitem scan probes it per batch with a vectorized is_in —
    no shuffle, no join rows (the users_without_orders discipline; for a
    dimension too big to broadcast the engine's partitioned join is the
    revenue_per_priority 256 MB-gated path). Revenue folds in integer
    1e-4-currency units (price and discount are both 2dp decimals, so
    cents·(100−discount_pct) is exact — float partial sums would make
    the 2dp/6dp roundings order-dependent; heavy_revenue_customers
    precedent) and the oracle SQL does the identical integer math.
    Returns one row (promo_revenue, total_revenue, promo_pct): revenues
    2dp, pct = 100·promo/total rounded 6dp half-away, 0.0 on an empty
    month (oracle COALESCEd to agree)."""
    import pyarrow.dataset as pads

    import ray.data as rd

    promo = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey"],
        filter=pads.field("p_type") == "PROMO")
    keys = pa.array(np.unique(promo["p_partkey"].to_numpy()), pa.int64())
    ref = ray.put(keys)

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1996-02-01", "us"), pa.timestamp("us"))
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi))

    def partials(batch: pa.Table) -> pa.Table:
        keys_w = cached(ref)
        rev4 = _rev4(batch)
        is_promo = pc.is_in(batch["l_partkey"], value_set=keys_w) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "promo4": pa.array([int(rev4[is_promo].sum())], pa.int64()),
            "total4": pa.array([int(rev4.sum())], pa.int64()),
        })

    t = ensure_columns(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=65536)
          .to_pandas(), {"promo4": "int64", "total4": "int64"})
    promo4, total4 = int(t["promo4"].sum()), int(t["total4"].sum())
    pct = 100.0 * promo4 / total4 if total4 else 0.0
    return pa.table({
        "promo_revenue": pa.array(
            [float(round_half_away(promo4 / 10000.0, 2))], pa.float64()),
        "total_revenue": pa.array(
            [float(round_half_away(total4 / 10000.0, 2))], pa.float64()),
        "promo_pct": pa.array([float(round6(pct))], pa.float64()),
    })


def supplier_region_balance(sf_dir: str, force: str | None = None) -> pa.Table:
    """Per-region supplier account rollup through the region→nation
    dimension chain — the snowflake-lookup shape. Both dimensions are
    driver-read (region and nation are constant-size), composed into ONE
    nationkey→region-name broadcast map; the supplier scan folds
    (region, n, balance-CENTS) partials per batch (integer cents — the
    heavy_revenue_customers precedent: float partial sums would make 2dp
    rounding order-dependent) and the ≤|regions| rows fold adaptively.
    Returns (r_name, n_suppliers, total_bal, avg_bal) sorted by r_name,
    money 2dp."""
    import pyarrow.parquet as pq_mod

    nation = pq_mod.read_table(f"{sf_dir}/nation.parquet",
                               columns=["n_nationkey", "n_regionkey"])
    region = pq_mod.read_table(f"{sf_dir}/region.parquet",
                               columns=["r_regionkey", "r_name"])
    rmap = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nk = nation["n_nationkey"].to_numpy()
    nmap = np.empty(int(nk.max()) + 1, dtype=object)
    for k, rk in zip(nk, nation["n_regionkey"].to_numpy()):
        nmap[k] = rmap[int(rk)]
    ref = ray.put(nmap)

    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def partials(batch: pa.Table) -> pa.Table:
        names = cached(ref)
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False)
        cents = np.round(batch["s_acctbal"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        t = pa.table({"r_name": pa.array(names[nk], pa.string()),
                      "one": pa.array(np.ones(len(nk), np.int64)),
                      "cents": pa.array(cents)})
        g = t.group_by("r_name").aggregate([("one", "sum"), ("cents", "sum")])
        return g.rename_columns(["r_name", "n", "cents"])

    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=32768)
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"r_name": "object", "n": "int64", "cents": "int64"})
        g = pdf.groupby("r_name", as_index=False)[["n", "cents"]].sum()
    else:
        g = (parts.repartition(n_reducers()).groupby("r_name")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("cents", alias_name="cents"))).to_pandas()
        g = ensure_columns(g, {"r_name": "object", "n": "int64", "cents": "int64"})
    g = g.sort_values("r_name").reset_index(drop=True)
    n = g["n"].to_numpy(np.int64)
    cents = g["cents"].to_numpy(np.int64)
    return pa.table({
        "r_name": pa.array(g["r_name"], pa.string()),
        "n_suppliers": pa.array(n, pa.int64()),
        "total_bal": pa.array(np.round(cents / 100.0, 2), pa.float64()),
        "avg_bal": pa.array(
            np.asarray(round_half_away(cents / 100.0 / np.maximum(n, 1), 2),
                       np.float64), pa.float64()),
    })


def _parquet_minmax(path: str, col: str) -> tuple[float, float]:
    """Column (min, max) for equi-width binning — shared statistics walk
    in ``_util.parquet_minmax`` (one copy to keep in sync)."""
    from ._util import parquet_minmax

    lo, hi = parquet_minmax(path, col)
    return float(lo), float(hi)


def events_value_histogram(sf_dir: str, n_bins: int = 20) -> pa.Table:
    """Equi-width histogram of the continuous events.value column — the
    float counterpart of the integer len_histogram. Bounds come free from
    parquet statistics; bin assignment is
    min(floor((v − mn) · nb / (mx − mn)), nb − 1) evaluated in float64
    with the SAME operation order as the oracle. Oracle exactness rests
    on the invariant that parquet row-group double statistics are the
    UNTRUNCATED column min/max, i.e. bit-identical to the oracle's own
    ``SELECT min(value), max(value)`` subquery (true for pyarrow-written
    double stats; the DuckDB fallback preserves it by construction) —
    both sides then floor the same IEEE value at every boundary. Don't
    swap in approximate bounds here without also changing the oracle.
    Per-batch
    bincount partials (≤ nb rows each) fold driver-side; nothing about
    the fold grows with the corpus. Returns (bin, n_events) sorted;
    empty bins emit no row (matching SQL GROUP BY)."""
    mn, mx = _parquet_minmax(f"{sf_dir}/events.parquet", "value")
    nb = int(n_bins)
    width_inv_num = float(nb)
    span = mx - mn

    def partials(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        b = np.minimum(np.floor((v - mn) * width_inv_num / span), nb - 1) \
            .astype(np.int64)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(ub, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    ds = _read(sf_dir, "events", ["value"])
    t = ensure_columns(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=65536)
          .to_pandas(), {"bin": "int64", "n": "int64"})
    g = t.groupby("bin")["n"].sum().sort_index()
    return pa.table({"bin": pa.array(g.index.to_numpy(np.int64), pa.int64()),
                     "n_events": pa.array(g.to_numpy(np.int64), pa.int64())})


def ship_lag_days(sf_dir: str, force: str | None = None) -> pa.Table:
    """Order-to-ship latency distribution: for every lineitem, the whole
    days between its order's o_orderdate and its l_shipdate, counted per
    lag — the fulfillment-SLA histogram. Lag values are bounded (the
    business rule caps them), so the output is group-bounded regardless
    of corpus size.

    Both sides reduce to UTC day numbers (epoch-us // 86 400e6, equal to
    date_trunc('day') for post-1970 data) so the lag is integer
    arithmetic — no timestamp float anywhere. Adaptive join (the
    revenue_per_priority gate): orders < _BCAST_JOIN_BYTES broadcasts a
    sorted (orderkey → orderday) array probed per lineitem batch
    (searchsorted, one streaming pass, no shuffle); above it, lineitem
    pre-aggregates (orderkey, shipday, n) partials and Ray's hash-shuffle
    Dataset.join carries one row per (orderkey, shipday, batch).
    Returns (lag_days, n_items) sorted by lag_days."""
    import os

    import pyarrow.parquet as pq_mod

    _DAY_US = 86_400_000_000

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    if small:
        ot = pq_mod.read_table(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_orderdate"])
        okeys = ot["o_orderkey"].to_numpy()
        odays = (ot["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US)
        order = np.argsort(okeys, kind="stable")
        ref = ray.put((okeys[order], odays[order].astype(np.int64)))

        def partials(batch: pa.Table) -> pa.Table:
            okeys_s, odays_s = cached(ref)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            sday = (batch["l_shipdate"].combine_chunks().cast(pa.int64())
                    .to_numpy(zero_copy_only=False) // _DAY_US)
            pos = np.clip(np.searchsorted(okeys_s, lk), 0, len(okeys_s) - 1)
            hit = okeys_s[pos] == lk  # inner-join semantics
            lag = sday[hit] - odays_s[pos[hit]]
            ul, cnt = np.unique(lag, return_counts=True)
            return pa.table({"lag_days": pa.array(ul, pa.int64()),
                             "n": pa.array(cnt, pa.int64())})

        t = ensure_columns(
            li.map_batches(partials, batch_format="pyarrow", batch_size=65536)
              .to_pandas(), {"lag_days": "int64", "n": "int64"})
        g = t.groupby("lag_days")["n"].sum().sort_index()
    else:
        def li_partials(batch: pa.Table) -> pa.Table:
            sday = (batch["l_shipdate"].combine_chunks().cast(pa.int64())
                    .to_numpy(zero_copy_only=False) // _DAY_US)
            t = pa.table({"l_orderkey": batch["l_orderkey"],
                          "shipday": pa.array(sday, pa.int64()),
                          "one": pa.array(np.ones(len(sday), np.int64))})
            g = t.group_by(["l_orderkey", "shipday"]).aggregate([("one", "sum")])
            return g.rename_columns(["l_orderkey", "shipday", "n"])

        li_agg = li.map_batches(li_partials, batch_format="pyarrow",
                                batch_size=65536)

        def ord_proj(batch: pa.Table) -> pa.Table:
            oday = (batch["o_orderdate"].combine_chunks().cast(pa.int64())
                    .to_numpy(zero_copy_only=False) // _DAY_US)
            return pa.table({"o_orderkey": batch["o_orderkey"],
                             "orderday": pa.array(oday, pa.int64())})

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
            .map_batches(ord_proj, batch_format="pyarrow", batch_size=65536)
        joined = li_agg.join(
            orders, join_type="inner",
            num_partitions=_join_partitions(sf_dir, "lineitem", "orders"),
            on=("l_orderkey",), right_on=("o_orderkey",))

        def lag_partials(batch: pa.Table) -> pa.Table:
            lag = (batch["shipday"].to_numpy(zero_copy_only=False)
                   - batch["orderday"].to_numpy(zero_copy_only=False))
            n = batch["n"].to_numpy(zero_copy_only=False)
            t = pa.table({"lag_days": pa.array(lag, pa.int64()),
                          "n": pa.array(n, pa.int64())})
            g = t.group_by("lag_days").aggregate([("n", "sum")])
            return g.rename_columns(["lag_days", "n"])

        t = ensure_columns(
            joined.map_batches(lag_partials, batch_format="pyarrow",
                               batch_size=65536).to_pandas(),
            {"lag_days": "int64", "n": "int64"})
        g = t.groupby("lag_days")["n"].sum().sort_index()
    return pa.table({"lag_days": pa.array(g.index.to_numpy(np.int64), pa.int64()),
                     "n_items": pa.array(g.to_numpy(np.int64), pa.int64())})


def local_supplier_revenue(sf_dir: str, region: str = "ASIA",
                           year: int = 1996,
                           force: str | None = None) -> pa.Table:
    """TPC-H Q5 shape — local supplier volume: revenue per nation from
    lineitems where the CUSTOMER's nation equals the SUPPLIER's nation,
    the nation sits in ``region``, and the order falls in ``year``. The
    6-table join (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈
    region) with a non-key cross-condition (c_nationkey = s_nationkey),
    resolved in ONE streaming pass over the fact:

    - customer / supplier / nation / region are true dimensions —
      composed driver-side into dense custkey→nationkey and
      suppkey→nationkey arrays plus the region's nation mask, broadcast
      once (`ray.put` + per-worker fetch-once; revenue_per_nation
      discipline).
    - orders is a FACT: the year slice is pushdown-read, and the
      orderkey hop is adaptive (ship_lag_days gate): small slice →
      broadcast sorted (orderkey → custnat) probed per lineitem batch
      via searchsorted; large → lineitem pre-aggregates
      (orderkey, suppnat, rev4) partials and Ray's hash-shuffle
      ``Dataset.join`` carries pre-filtered ASIA orders only.

    Revenue folds in integer 1e-4-currency units (promo_revenue_share
    precedent, order-independent); the oracle does identical integer
    math. Returns (n_name, n_items, revenue) ordered by the INTEGER
    revenue desc then n_name (deterministic under 2dp ties)."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_mod

    nat = pq_mod.read_table(f"{sf_dir}/nation.parquet")
    reg = pq_mod.read_table(f"{sf_dir}/region.parquet")
    rkeys = {k: v for k, v in zip(reg["r_name"].to_pylist(),
                                  reg["r_regionkey"].to_pylist())}
    want_rk = rkeys[region]
    nk = nat["n_nationkey"].to_numpy()
    size_n = int(nk.max()) + 1
    in_region = np.zeros(size_n, bool)
    in_region[nk] = nat["n_regionkey"].to_numpy() == want_rk
    names = np.empty(size_n, dtype=object)
    names[nk] = np.asarray(nat["n_name"].to_pylist(), dtype=object)

    def _dense(path: str, key: str, val: str) -> np.ndarray:
        t = pq_mod.read_table(path, columns=[key, val])
        k = t[key].to_numpy()
        arr = np.full(int(k.max()) + 1 if len(k) else 1, -1, np.int32)
        arr[k] = t[val].to_numpy().astype(np.int32)
        return arr

    cnat = _dense(f"{sf_dir}/customer.parquet", "c_custkey", "c_nationkey")
    snat = _dense(f"{sf_dir}/supplier.parquet", "s_suppkey", "s_nationkey")

    lo = pa.scalar(np.datetime64(f"{year}-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(f"{year + 1}-01-01", "us"), pa.timestamp("us"))
    date_filter = ((pads.field("o_orderdate") >= lo)
                   & (pads.field("o_orderdate") < hi))
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    if small:
        ot = pads.dataset(f"{sf_dir}/orders.parquet").to_table(
            columns=["o_orderkey", "o_custkey"], filter=date_filter)
        okeys = ot["o_orderkey"].to_numpy()
        ocust = ot["o_custkey"].to_numpy()
        onat = np.where((ocust >= 0) & (ocust < len(cnat)),
                        cnat[np.minimum(ocust, len(cnat) - 1)], -1)
        keep_o = (onat >= 0) & in_region[np.maximum(onat, 0)]
        okeys, onat = okeys[keep_o], onat[keep_o]
        order = np.argsort(okeys, kind="stable")
        ref = ray.put((okeys[order], onat[order].astype(np.int32),
                       snat, size_n))

        def partials(batch: pa.Table) -> pa.Table:
            okeys_s, onat_s, snat_w, size_n_w = cached(ref)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            rev4 = _rev4(batch)
            pos = np.clip(np.searchsorted(okeys_s, lk), 0,
                          max(len(okeys_s) - 1, 0))
            hit = (okeys_s[pos] == lk) if len(okeys_s) else \
                np.zeros(len(lk), bool)
            s_ok = (sk >= 0) & (sk < len(snat_w))
            s_n = np.where(s_ok, snat_w[np.minimum(sk, len(snat_w) - 1)], -1)
            keep = hit & (s_n >= 0) & (onat_s[pos] == s_n) if len(okeys_s) \
                else np.zeros(len(lk), bool)
            natk = s_n[keep]
            sums = np.zeros(size_n_w, np.int64)
            cnts = np.zeros(size_n_w, np.int64)
            np.add.at(sums, natk, rev4[keep])
            np.add.at(cnts, natk, 1)
            nz = np.flatnonzero(cnts)
            return pa.table({"natkey": pa.array(nz, pa.int64()),
                             "rev4": pa.array(sums[nz], pa.int64()),
                             "n": pa.array(cnts[nz], pa.int64())})

        t = ensure_columns(
            li.map_batches(partials, batch_format="pyarrow", batch_size=65536)
              .to_pandas(),
            {"natkey": "int64", "rev4": "int64", "n": "int64"})
    else:
        snat_ref = ray.put(snat)

        def li_partials(batch: pa.Table) -> pa.Table:
            snat_w = cached(snat_ref)
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            rev4 = _rev4(batch)
            s_ok = (sk >= 0) & (sk < len(snat_w))
            s_n = np.where(s_ok, snat_w[np.minimum(sk, len(snat_w) - 1)], -1)
            keep = s_n >= 0
            t = pa.table({"l_orderkey": pc.array_filter(
                              batch["l_orderkey"].combine_chunks(),
                              pa.array(keep)),
                          "suppnat": pa.array(s_n[keep].astype(np.int64)),
                          "rev4": pa.array(rev4[keep]),
                          "one": pa.array(np.ones(int(keep.sum()), np.int64))})
            g = t.group_by(["l_orderkey", "suppnat"]).aggregate(
                [("rev4", "sum"), ("one", "sum")])
            return g.rename_columns(["l_orderkey", "suppnat", "rev4", "n"])

        li_agg = li.map_batches(li_partials, batch_format="pyarrow",
                                batch_size=65536)
        cnat_ref = ray.put((cnat, in_region))

        def ord_proj(batch: pa.Table) -> pa.Table:
            cnat_w, in_region_w = cached(cnat_ref)
            oc = batch["o_custkey"].to_numpy(zero_copy_only=False)
            c_ok = (oc >= 0) & (oc < len(cnat_w))
            c_n = np.where(c_ok, cnat_w[np.minimum(oc, len(cnat_w) - 1)], -1)
            keep = (c_n >= 0) & in_region_w[np.maximum(c_n, 0)]
            return pa.table({"o_orderkey": pc.array_filter(
                                 batch["o_orderkey"].combine_chunks(),
                                 pa.array(keep)),
                             "custnat": pa.array(c_n[keep].astype(np.int64))})

        import ray.data as rd

        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey"],
                                 filter=date_filter) \
            .map_batches(ord_proj, batch_format="pyarrow", batch_size=65536) \
            .materialize()  # feeds BOTH count() and join (CLAUDE.md rule)
        n_right = orders.count()
        if n_right == 0:
            t = pd.DataFrame({"natkey": pd.Series([], dtype="int64"),
                              "rev4": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64")})
        else:
            n_parts = max(1, min(
                _join_partitions(sf_dir, "lineitem", "orders"),
                n_right // 64 + 1))
            joined = li_agg.join(orders, join_type="inner",
                                 num_partitions=n_parts,
                                 on=("l_orderkey",), right_on=("o_orderkey",))

            def nat_partials(batch: pa.Table) -> pa.Table:
                keep = (batch["suppnat"].to_numpy(zero_copy_only=False)
                        == batch["custnat"].to_numpy(zero_copy_only=False))
                t = pa.table({
                    "natkey": pc.array_filter(
                        batch["suppnat"].combine_chunks(), pa.array(keep)),
                    "rev4": pc.array_filter(
                        batch["rev4"].combine_chunks(), pa.array(keep)),
                    "n": pc.array_filter(
                        batch["n"].combine_chunks(), pa.array(keep))})
                g = t.group_by("natkey").aggregate(
                    [("rev4", "sum"), ("n", "sum")])
                return g.rename_columns(["natkey", "rev4", "n"])

            t = ensure_columns(
                joined.map_batches(nat_partials, batch_format="pyarrow",
                                   batch_size=65536).to_pandas(),
                {"natkey": "int64", "rev4": "int64", "n": "int64"})

    g = t.groupby("natkey", as_index=False)[["rev4", "n"]].sum()
    g["n_name"] = names[g["natkey"].to_numpy(np.int64)]
    g = g.sort_values(["rev4", "n_name"],
                      ascending=[False, True]).reset_index(drop=True)
    rev4 = g["rev4"].to_numpy(np.int64)
    return pa.table({
        "n_name": pa.array(g["n_name"], pa.string()),
        "n_items": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        "revenue": pa.array(
            np.asarray(round_half_away(rev4 / 10000.0, 2), np.float64),
            pa.float64()),
    })


def q17_small_quantity_revenue(sf_dir: str,
                               force: str | None = None) -> pa.Table:
    """TPC-H Q17 shape — correlated per-group-aggregate filter: total
    revenue (averaged per year, /7) of lineitems whose quantity is below
    20% of their PART's average quantity. The "aggregate a fact, then
    filter the same fact against its own group's aggregate" pattern —
    two streaming passes, no self-join rows ever materialize:

    1. per-partkey (Σqty, n) partials fold adaptively (partkey
       cardinality is bounded by the part dimension, so the fold is
       group-bounded regardless of corpus size);
    2. the (partkey → threshold) table broadcasts as sorted arrays
       (dimension-sized; at a scale where parts outgrow broadcast the
       pre-aggregated hash-shuffle join is the ship_lag_days path) and
       the second lineitem scan keeps rows with
       ``qty·5·n < Σqty``  —  exact INTEGER arithmetic equivalent to
       ``qty < 0.2·avg`` (quantities are integral; both sides rendered
       identically in the oracle), summing integer cents.

    Returns one row (n_items, avg_yearly), money 2dp half-away."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    n_rows = li.count()

    def qty_partials(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "pk": batch["l_partkey"],
            "q": pa.array(np.round(batch["l_quantity"]
                                   .to_numpy(zero_copy_only=False))
                          .astype(np.int64)),
            "one": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("pk").aggregate([("q", "sum"), ("one", "sum")])
        return g.rename_columns(["pk", "sq", "c"])

    parts = li.map_batches(qty_partials, batch_format="pyarrow",
                           batch_size=65536)
    small = (n_rows < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"pk": "int64", "sq": "int64", "c": "int64"})
        agg = pdf.groupby("pk", as_index=False)[["sq", "c"]].sum()
    else:
        agg = ensure_columns(
            parts.repartition(n_reducers()).groupby("pk")
                 .aggregate(Sum("sq", alias_name="sq"),
                            Sum("c", alias_name="c")).to_pandas(),
            {"pk": "int64", "sq": "int64", "c": "int64"})
    pk = agg["pk"].to_numpy(np.int64)
    order = np.argsort(pk, kind="stable")
    ref = ray.put((pk[order], agg["sq"].to_numpy(np.int64)[order],
                   agg["c"].to_numpy(np.int64)[order]))

    li2 = _read(sf_dir, "lineitem",
                ["l_partkey", "l_quantity", "l_extendedprice"])

    def rev_partials(batch: pa.Table) -> pa.Table:
        pk_s, sq_s, c_s = cached(ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        q = np.round(batch["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        pos = np.clip(np.searchsorted(pk_s, lp), 0, max(len(pk_s) - 1, 0))
        hit = (pk_s[pos] == lp) if len(pk_s) else np.zeros(len(lp), bool)
        keep = hit & (q * 5 * c_s[pos] < sq_s[pos]) if len(pk_s) \
            else np.zeros(len(lp), bool)
        cents = np.round(batch["l_extendedprice"]
                         .to_numpy(zero_copy_only=False)[keep] * 100.0) \
            .astype(np.int64)
        return pa.table({"cents": pa.array([int(cents.sum())], pa.int64()),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    t = ensure_columns(
        li2.map_batches(rev_partials, batch_format="pyarrow",
                        batch_size=65536).to_pandas(),
        {"cents": "int64", "n": "int64"})
    cents, n = int(t["cents"].sum()), int(t["n"].sum())
    return pa.table({
        "n_items": pa.array([n], pa.int64()),
        "avg_yearly": pa.array(
            [float(round_half_away(cents / 700.0, 2))], pa.float64()),
    })


def rolling_distinct_users(sf_dir: str, window: int = 7,
                           force: str | None = None) -> pa.Table:
    """Sliding-window EXACT distinct: for every day present in events, the
    count of distinct users active over the trailing ``window`` days
    [d−(window−1), d]. Completes the windowed-distinct family —
    daily_active_users is the tumbling case; overlap means a user active
    on several window days must still count ONCE per window, so no sum
    over daily results can answer it.

    Per-batch (day, user) pre-aggregation first (events collapse to
    day×user pairs before anything widens). Adaptive: below _SMALL_ROWS
    one driver pass — pairs sorted by day, each window a searchsorted
    slice + np.unique (day-bounded loop, vectorized inner). Above, the
    hopping-window expansion (events_hopping_windows discipline ×
    ``window``): each deduped pair emits (target_day, user) for the
    ≤window present days it serves, a distributed (target_day, user)
    groupby dedups globally, and a per-day Count folds day-sized rows.
    ``force``="driver"/"distributed" pins the branch. Returns
    (day, n_users) sorted by day."""
    from ray.data.aggregate import Count

    _DAY_US = np.int64(86_400_000_000)
    W = int(window)
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    parts = ds.map_batches(
        lambda b: _day_user_counts(b).drop_columns(["n_p"]),
        batch_format="pyarrow", batch_size=32768)
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"day": "datetime64[us]", "user_id": "int64"})
        pdf = pdf.drop_duplicates(["day", "user_id"])
        days_us = pdf["day"].to_numpy("datetime64[us]").astype(np.int64)
        users = pdf["user_id"].to_numpy(np.int64)
        order = np.argsort(days_us, kind="stable")
        days_us, users = days_us[order], users[order]
        uniq_days = np.unique(days_us)
        counts = np.empty(len(uniq_days), np.int64)
        for i, d in enumerate(uniq_days):  # day-bounded loop, not per-row
            lo = np.searchsorted(days_us, d - (W - 1) * _DAY_US)
            hi = np.searchsorted(days_us, d, side="right")
            counts[i] = len(np.unique(users[lo:hi]))
        out = pd.DataFrame({"day": uniq_days.astype("datetime64[us]"),
                            "n_users": counts})
    else:
        pairs = parts.repartition(n_reducers()).groupby(["day", "user_id"]) \
            .aggregate(Count(alias_name="n_p")) \
            .materialize()  # feeds BOTH the day list and expand (house rule)
        # present-day list: day-bounded, safe to pull and broadcast
        day_rows = pairs.groupby("day").aggregate(Count(alias_name="n")) \
            .to_pandas()
        present = np.sort(day_rows["day"].to_numpy("datetime64[us]")
                          .astype(np.int64))
        pref = ray.put(present)

        def expand(batch: pa.Table) -> pa.Table:
            present_w = cached(pref)
            d = batch["day"].combine_chunks().to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64)
            u = batch["user_id"].to_numpy(zero_copy_only=False)
            tgt = (d[:, None] + np.arange(W, dtype=np.int64) * _DAY_US).ravel()
            uu = np.repeat(u, W)
            pos = np.clip(np.searchsorted(present_w, tgt), 0,
                          max(len(present_w) - 1, 0))
            keep = (present_w[pos] == tgt) if len(present_w) else \
                np.zeros(len(tgt), bool)
            t = pa.table({
                "tday": pa.array(tgt[keep].astype("datetime64[us]"),
                                 pa.timestamp("us")),
                "user_id": pa.array(uu[keep], pa.int64())})
            return t.group_by(["tday", "user_id"]).aggregate([([], "count_all")]) \
                .rename_columns(["tday", "user_id", "n_p"]) \
                .drop_columns(["n_p"])

        tagged = pairs.map_batches(expand, batch_format="pyarrow",
                                   batch_size=32768)
        dedup = tagged.repartition(n_reducers()) \
            .groupby(["tday", "user_id"]).aggregate(Count(alias_name="n"))
        per_day = dedup.groupby("tday").aggregate(Count(alias_name="n_users"))
        out = ensure_columns(per_day.to_pandas(),
                             {"tday": "datetime64[us]", "n_users": "int64"}) \
            .rename(columns={"tday": "day"})
    out = out.sort_values("day").reset_index(drop=True)
    return pa.table({
        "day": pa.array(out["day"].to_numpy("datetime64[us]"),
                        pa.timestamp("us")),
        "n_users": pa.array(out["n_users"].to_numpy(np.int64), pa.int64()),
    })


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_daily(sf_dir: str) -> pa.Table:
    """PIVOT — long→wide reshape: per day, one COLUMN of event counts per
    event type (the BI-table shape SQL's PIVOT / conditional aggregation
    produces). Derived driver-side from the group-bounded (day, type)
    windowed aggregate — the reshape itself costs nothing beyond the one
    partial-fold pass events_daily_windows already does; no second scan,
    no wide shuffle (a Ray-native pivot would need a row-to-column
    exchange for NO benefit when the long table is already
    day×type-bounded). Absent (day, type) cells are 0 (matching the SQL
    FILTER semantics). Returns (day, n_click, n_error, n_purchase,
    n_signup, n_view) sorted by day."""
    long = events_daily_windows(sf_dir).to_pandas()
    wide = long.pivot_table(index="day", columns="event_type",
                            values="n_events", aggfunc="sum",
                            fill_value=0)
    days = np.sort(long["day"].unique())
    out = {"day": pa.array(pd.Series(days).to_numpy("datetime64[us]"),
                           pa.timestamp("us"))}
    for t in _PIVOT_TYPES:
        col = (wide[t].reindex(days).fillna(0).to_numpy(np.int64)
               if t in wide.columns else np.zeros(len(days), np.int64))
        out[f"n_{t}"] = pa.array(col, pa.int64())
    return pa.table(out)


def fk_orphan_counts(sf_dir: str) -> pa.Table:
    """Referential-integrity audit — per foreign-key relation, how many
    child rows point at a missing parent (the data-quality check a
    multi-table snapshot runs before joins are trusted; a nonzero
    orphan count explains inner-join row loss). Each parent's key set
    broadcasts ONCE as a sorted array; each CHILD table is scanned
    exactly once, probing ALL of its relations' parents per batch with
    vectorized searchsorted membership (lineitem's three FKs share one
    scan — the users_without_orders anti-join discipline, fused).
    Parents here are dimension- or orders-scale; for a parent too big
    to broadcast the engine's tagged-union shuffle anti-join
    (incremental_dedup_docs) is the documented path. Returns
    (relation, n_rows, n_orphans) sorted by relation."""
    import pyarrow.parquet as pq_mod

    rels = [
        ("events.user_id->customer", "events", "user_id",
         "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
    ]
    parent_keys: dict[str, np.ndarray] = {}
    for _, _, _, ptab, pcol in rels:
        if ptab not in parent_keys:
            k = pq_mod.read_table(f"{sf_dir}/{ptab}.parquet",
                                  columns=[pcol])[pcol].to_numpy()
            parent_keys[ptab] = np.unique(k)

    by_child: dict[str, list[tuple[str, str, str]]] = {}
    for name, ctab, ccol, ptab, _ in rels:
        by_child.setdefault(ctab, []).append((name, ccol, ptab))

    results: dict[str, tuple[int, int]] = {}
    for ctab, probes in by_child.items():
        cols = sorted({c for _, c, _ in probes})
        ref = ray.put({p: parent_keys[p] for _, _, p in probes})

        def probe(batch: pa.Table, _ref=ref, _probes=tuple(probes)) -> pa.Table:
            keysets = cached(_ref)
            ns, orphs = [], []
            for _, ccol, ptab in _probes:
                keys = keysets[ptab]
                v = batch[ccol].to_numpy(zero_copy_only=False)
                pos = np.clip(np.searchsorted(keys, v), 0,
                              max(len(keys) - 1, 0))
                hit = (keys[pos] == v) if len(keys) else \
                    np.zeros(len(v), bool)
                ns.append(len(v))
                orphs.append(int((~hit).sum()))
            return pa.table({
                "ri": pa.array(np.arange(len(_probes)), pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "orph": pa.array(orphs, pa.int64())})

        t = ensure_columns(
            _read(sf_dir, ctab, cols)
            .map_batches(probe, batch_format="pyarrow", batch_size=65536)
            .to_pandas(), {"ri": "int64", "n": "int64", "orph": "int64"})
        g = t.groupby("ri")[["n", "orph"]].sum()
        for ri, (name, _, _) in enumerate(probes):
            results[name] = (int(g["n"].get(ri, 0)),
                             int(g["orph"].get(ri, 0)))

    names = sorted(results)
    return pa.table({
        "relation": pa.array(names, pa.string()),
        "n_rows": pa.array([results[n][0] for n in names], pa.int64()),
        "n_orphans": pa.array([results[n][1] for n in names], pa.int64()),
    })


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cut: str = "1998-06-01", k: int = 10,
                         force: str | None = None) -> pa.Table:
    """TPC-H Q3 shape — shipping priority: the ``k`` highest-revenue
    orders from one market segment that were placed before ``cut`` but
    still have lineitems shipping after it. customer ⋈ orders ⋈ lineitem
    with date filters pushed into both fact reads.

    Plan: the segment membership is a dense bool mask by custkey
    (dimension-table broadcast, local_supplier_revenue discipline). The
    orderkey hop is adaptive on orders' compressed size: small → the
    date+segment-filtered orders pull to the driver, their sorted okeys
    broadcast, and lineitem folds rev4 per HIT orderkey (partials bounded
    by qualifying orders); large → lineitem pre-aggregates (orderkey,
    rev4) through a distributed groupby, hash-joins the filtered orders
    projection, and each post-join batch emits only its LOCAL top-k under
    the total order (-rev4, okey) — valid because the left side is one
    row per orderkey after the fold, so global top-k ⊆ union of per-batch
    top-k. Revenue folds in integer 1e-4 units (_rev4); ORDER BY uses the
    INTEGER sum so 2dp ties cannot disagree with the oracle."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_mod

    import ray.data as rd

    cust = pq_mod.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
    ck = cust["c_custkey"].to_numpy()
    in_seg = np.zeros(int(ck.max()) + 1 if len(ck) else 1, bool)
    in_seg[ck] = np.asarray(cust["c_mktsegment"].to_pylist()) == segment

    cut_ts = pa.scalar(np.datetime64(cut, "us"), pa.timestamp("us"))
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"],
                         filter=pads.field("l_shipdate") > cut_ts)
    o_filter = pads.field("o_orderdate") < cut_ts
    o_cols = ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]

    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    if small:
        ot = pads.dataset(f"{sf_dir}/orders.parquet").to_table(
            columns=o_cols, filter=o_filter)
        oc = ot["o_custkey"].to_numpy()
        keep = (oc >= 0) & (oc < len(in_seg)) \
            & in_seg[np.minimum(oc, len(in_seg) - 1)]
        ot = ot.filter(pa.array(keep))
        okeys = ot["o_orderkey"].to_numpy()
        order = np.argsort(okeys, kind="stable")
        okeys_s = okeys[order]
        ref = ray.put(okeys_s)

        def partials(batch: pa.Table) -> pa.Table:
            keys_w = cached(ref)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            rev4 = _rev4(batch)
            pos = np.clip(np.searchsorted(keys_w, lk), 0,
                          max(len(keys_w) - 1, 0))
            hit = (keys_w[pos] == lk) if len(keys_w) else \
                np.zeros(len(lk), bool)
            t = pa.table({"l_orderkey": pa.array(lk[hit]),
                          "rev4": pa.array(rev4[hit])})
            g = t.group_by("l_orderkey").aggregate([("rev4", "sum")])
            return g.rename_columns(["l_orderkey", "rev4"])

        df = ensure_columns(
            li.map_batches(partials, batch_format="pyarrow",
                           batch_size=65536).to_pandas(),
            {"l_orderkey": "int64", "rev4": "int64"})
        g = df.groupby("l_orderkey", as_index=False)["rev4"].sum()
        odf = ot.select(o_cols).to_pandas()
        g = g.merge(odf, left_on="l_orderkey", right_on="o_orderkey",
                    how="inner")
    else:
        seg_ref = ray.put(in_seg)

        def li_partials(batch: pa.Table) -> pa.Table:
            t = pa.table({"l_orderkey": batch["l_orderkey"],
                          "rev4": pa.array(_rev4(batch))})
            g = t.group_by("l_orderkey").aggregate([("rev4", "sum")])
            return g.rename_columns(["l_orderkey", "rev4"])

        li_agg = (li.map_batches(li_partials, batch_format="pyarrow",
                                 batch_size=65536)
                  .repartition(n_reducers())
                  .groupby("l_orderkey")
                  .aggregate(Sum("rev4", alias_name="rev4")))

        def ord_proj(batch: pa.Table) -> pa.Table:
            seg_w = cached(seg_ref)
            oc = batch["o_custkey"].to_numpy(zero_copy_only=False)
            keep = (oc >= 0) & (oc < len(seg_w)) \
                & seg_w[np.minimum(oc, len(seg_w) - 1)]
            return batch.filter(pa.array(keep)).select(
                ["o_orderkey", "o_orderdate", "o_orderpriority"])

        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=o_cols, filter=o_filter) \
            .map_batches(ord_proj, batch_format="pyarrow",
                         batch_size=65536).materialize()
        if orders.count() == 0:
            g = pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                              "rev4": pd.Series([], dtype="int64"),
                              "o_orderdate":
                                  pd.Series([], dtype="datetime64[us]"),
                              "o_orderpriority":
                                  pd.Series([], dtype="object")})
        else:
            joined = li_agg.join(
                orders, join_type="inner",
                num_partitions=_join_partitions(sf_dir, "lineitem",
                                                "orders"),
                on=("l_orderkey",), right_on=("o_orderkey",))

            def topk_part(batch: pa.Table) -> pa.Table:
                rev4 = batch["rev4"].to_numpy(zero_copy_only=False)
                okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)
                order = np.lexsort((okey, -rev4))[:k]
                return batch.take(pa.array(order))

            g = ensure_columns(
                joined.map_batches(topk_part, batch_format="pyarrow",
                                   batch_size=65536).to_pandas(),
                {"l_orderkey": "int64", "rev4": "int64",
                 "o_orderdate": "datetime64[us]",
                 "o_orderpriority": "object"})
    g = g.sort_values(["rev4", "l_orderkey"],
                      ascending=[False, True]).head(k).reset_index(drop=True)
    rev4 = g["rev4"].to_numpy(np.int64)
    return pa.table({
        "o_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64),
                               pa.int64()),
        "revenue": pa.array(
            np.asarray(round_half_away(rev4 / 10000.0, 2), np.float64),
            pa.float64()),
        "o_orderdate": pa.array(
            g["o_orderdate"].to_numpy("datetime64[us]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(g["o_orderpriority"].astype(str)
                                    if len(g) else [], pa.string()),
    })


def q4_late_orders(sf_dir: str, lo: str = "1997-01-01",
                   hi: str = "1997-04-01", late_days: int = 30,
                   force: str | None = None) -> pa.Table:
    """TPC-H Q4 shape — order-priority checking: per priority, how many
    orders placed in the [lo, hi) quarter had at least one lineitem
    shipping more than ``late_days`` after the order date (EXISTS
    semi-join). ``∃ line: shipdate > orderdate + D`` ⟺
    ``max(shipdate) > orderdate + D``, so the lineitem side reduces to a
    per-orderkey MAX fold — no row-level semi-join ever materializes.

    Adaptive: small orders → the quarter slice pulls to the driver and
    broadcasts (sorted okeys, odate); lineitem batches emit the positions
    of orders they prove late (partials bounded by quarter orders), the
    driver unions them. Large → lineitem folds Max(ship_us) per orderkey
    distributed, hash-joins the quarter projection, and per-batch late
    counts fold over the 5 priority groups."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_mod

    import ray.data as rd

    lo_ts = pa.scalar(np.datetime64(lo, "us"), pa.timestamp("us"))
    hi_ts = pa.scalar(np.datetime64(hi, "us"), pa.timestamp("us"))
    o_filter = ((pads.field("o_orderdate") >= lo_ts)
                & (pads.field("o_orderdate") < hi_ts))
    late_us = np.int64(late_days) * 86400 * 1_000_000
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    ot = pads.dataset(f"{sf_dir}/orders.parquet").to_table(
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=o_filter) if small else None

    if small:
        okeys = ot["o_orderkey"].to_numpy()
        odate = ot["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .view(np.int64)
        order = np.argsort(okeys, kind="stable")
        okeys_s, odate_s = okeys[order], odate[order]
        ref = ray.put((okeys_s, odate_s))

        def late_positions(batch: pa.Table) -> pa.Table:
            okeys_w, odate_w = cached(ref)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            ship = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").view(np.int64)
            pos = np.clip(np.searchsorted(okeys_w, lk), 0,
                          max(len(okeys_w) - 1, 0))
            hit = (okeys_w[pos] == lk) if len(okeys_w) else \
                np.zeros(len(lk), bool)
            late = hit & (ship > odate_w[pos] + late_us)
            return pa.table({"pos": pa.array(np.unique(pos[late]),
                                             pa.int64())})

        parts = ensure_columns(
            li.map_batches(late_positions, batch_format="pyarrow",
                           batch_size=65536).to_pandas(),
            {"pos": "int64"})
        late_pos = np.unique(parts["pos"].to_numpy(np.int64))
        pri = np.asarray(ot["o_orderpriority"].to_pylist(),
                         dtype=object)[order][late_pos] \
            if len(late_pos) else np.array([], object)
        vals, counts = np.unique(pri.astype(str), return_counts=True) \
            if len(pri) else (np.array([], object), np.array([], np.int64))
        df = pd.DataFrame({"o_orderpriority": vals,
                           "order_count": counts.astype(np.int64)})
    else:
        def max_ship(batch: pa.Table) -> pa.Table:
            ship = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").view(np.int64)
            t = pa.table({"l_orderkey": batch["l_orderkey"],
                          "ship_us": pa.array(ship)})
            g = t.group_by("l_orderkey").aggregate([("ship_us", "max")])
            return g.rename_columns(["l_orderkey", "ship_us"])

        li_max = (li.map_batches(max_ship, batch_format="pyarrow",
                                 batch_size=65536)
                  .repartition(n_reducers())
                  .groupby("l_orderkey")
                  .aggregate(Max("ship_us", alias_name="ship_us")))

        def ord_proj(batch: pa.Table) -> pa.Table:
            odate = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").view(np.int64)
            return pa.table({"o_orderkey": batch["o_orderkey"],
                             "odate_us": pa.array(odate),
                             "o_orderpriority": batch["o_orderpriority"]})

        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
            filter=o_filter) \
            .map_batches(ord_proj, batch_format="pyarrow",
                         batch_size=65536).materialize()
        if orders.count() == 0:
            df = pd.DataFrame({"o_orderpriority":
                               pd.Series([], dtype="object"),
                               "order_count":
                               pd.Series([], dtype="int64")})
        else:
            joined = li_max.join(
                orders, join_type="inner",
                num_partitions=_join_partitions(sf_dir, "lineitem",
                                                "orders"),
                on=("l_orderkey",), right_on=("o_orderkey",))

            def late_counts(batch: pa.Table) -> pa.Table:
                late = (batch["ship_us"].to_numpy(zero_copy_only=False)
                        > batch["odate_us"].to_numpy(zero_copy_only=False)
                        + late_us)
                t = pa.table({"o_orderpriority": pc.array_filter(
                    batch["o_orderpriority"].combine_chunks(),
                    pa.array(late))})
                g = t.group_by("o_orderpriority").aggregate(
                    [([], "count_all")])
                return g.rename_columns(["o_orderpriority", "n"])

            parts = joined.map_batches(late_counts, batch_format="pyarrow",
                                       batch_size=65536)
            df = _fold_partials(parts, orders.count(),
                                ["o_orderpriority"],
                                {"order_count": "n"})
            df["order_count"] = df["order_count"].astype(np.int64)
    df = df.sort_values("o_orderpriority").reset_index(drop=True)
    return pa.table({
        "o_orderpriority": pa.array(df["o_orderpriority"].astype(str)
                                    if len(df) else [], pa.string()),
        "order_count": pa.array(df["order_count"].to_numpy(np.int64),
                                pa.int64()),
    })


def q15_top_suppliers(sf_dir: str, lo: str = "1997-01-01",
                      hi: str = "1997-04-01",
                      force: str | None = None) -> pa.Table:
    """TPC-H Q15 shape — top supplier(s): per-supplier revenue over one
    shipdate quarter, returning every supplier tied at the MAXIMUM
    (aggregate-then-filter-on-global-max; ties exact because revenue
    folds in integer 1e-4 units). Supplier cardinality bounds the partial
    rows, so the fold is adaptive (_fold_partials); names attach from the
    dimension table driver-side, pruned to the winning keys."""
    import pyarrow.dataset as pads

    import ray.data as rd

    lo_ts = pa.scalar(np.datetime64(lo, "us"), pa.timestamp("us"))
    hi_ts = pa.scalar(np.datetime64(hi, "us"), pa.timestamp("us"))
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"],
                         filter=((pads.field("l_shipdate") >= lo_ts)
                                 & (pads.field("l_shipdate") < hi_ts)))

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_suppkey": batch["l_suppkey"],
                      "rev4": pa.array(_rev4(batch))})
        g = t.group_by("l_suppkey").aggregate([("rev4", "sum")])
        return g.rename_columns(["l_suppkey", "rev4"])

    parts = li.map_batches(partials, batch_format="pyarrow",
                           batch_size=65536)
    # plan gate from FILE size, not li.count(): count() on a
    # pushdown-filtered read would pay a full extra scan
    import os

    try:
        small = os.path.getsize(f"{sf_dir}/lineitem.parquet") \
            < _BCAST_JOIN_BYTES
    except OSError:
        small = False
    if force is not None:
        small = force == "driver"
    g = _fold_partials(parts, 0 if small else _SMALL_ROWS,
                       ["l_suppkey"], {"rev4": "rev4"})
    if len(g) == 0:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_revenue": pa.array([], pa.float64())})
    g["l_suppkey"] = g["l_suppkey"].astype(np.int64)
    g["rev4"] = g["rev4"].astype(np.int64)
    best = int(g["rev4"].max())
    g = g[g["rev4"] == best].sort_values("l_suppkey").reset_index(drop=True)
    sup = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(
            g["l_suppkey"].to_numpy(np.int64))).to_pandas()
    g = g.merge(sup, left_on="l_suppkey", right_on="s_suppkey",
                how="inner").sort_values("s_suppkey")
    return pa.table({
        "s_suppkey": pa.array(g["s_suppkey"].to_numpy(np.int64),
                              pa.int64()),
        "s_name": pa.array(g["s_name"].astype(str) if len(g) else [],
                           pa.string()),
        "total_revenue": pa.array(
            np.asarray(round_half_away(
                g["rev4"].to_numpy(np.int64) / 10000.0, 2), np.float64),
            pa.float64()),
    })


def q18_large_volume_orders(sf_dir: str, min_qty: int = 200,
                            k: int = 100,
                            force: str | None = None) -> pa.Table:
    """TPC-H Q18 shape — large-volume customers: orders whose total
    lineitem quantity exceeds ``min_qty``, decorated with the order row
    and customer name, top ``k`` by quantity. Quantities are
    integer-valued doubles, folded as int64 so the HAVING boundary is
    exact.

    The per-orderkey quantity fold is adaptive (driver below the size
    gate / distributed groupby-Sum above). The HAVING filter leaves a
    small survivor set by construction, so the orders decoration is a
    broadcast probe of the survivor okeys inside a map_batches over
    orders (rows returned bounded by survivors), and customer names read
    driver-side pruned to the ≤k result custkeys."""
    import os

    import pyarrow.dataset as pads

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_partials(batch: pa.Table) -> pa.Table:
        qty = np.round(batch["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        t = pa.table({"l_orderkey": batch["l_orderkey"],
                      "qty": pa.array(qty)})
        g = t.group_by("l_orderkey").aggregate([("qty", "sum")])
        return g.rename_columns(["l_orderkey", "qty"])

    parts = li.map_batches(qty_partials, batch_format="pyarrow",
                           batch_size=65536)
    try:
        small = os.path.getsize(f"{sf_dir}/lineitem.parquet") \
            < _BCAST_JOIN_BYTES
    except OSError:
        small = False
    if force is not None:
        small = force == "driver"
    if small:
        df = ensure_columns(parts.to_pandas(),
                            {"l_orderkey": "int64", "qty": "int64"})
        g = df.groupby("l_orderkey", as_index=False)["qty"].sum()
    else:
        g = (parts.repartition(n_reducers()).groupby("l_orderkey")
             .aggregate(Sum("qty", alias_name="qty"))).to_pandas()
        g = ensure_columns(g, {"l_orderkey": "int64", "qty": "int64"})
    g = g[g["qty"] > min_qty]
    okeys = np.sort(g["l_orderkey"].to_numpy(np.int64))
    qty_by_okey = dict(zip(g["l_orderkey"].to_numpy(np.int64),
                           g["qty"].to_numpy(np.int64)))
    ref = ray.put(okeys)

    def order_hits(batch: pa.Table) -> pa.Table:
        keys_w = cached(ref)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keys_w, ok), 0,
                      max(len(keys_w) - 1, 0))
        hit = (keys_w[pos] == ok) if len(keys_w) else np.zeros(len(ok), bool)
        return batch.filter(pa.array(hit))

    odf = ensure_columns(
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(order_hits, batch_format="pyarrow", batch_size=65536)
        .to_pandas(),
        {"o_orderkey": "int64", "o_custkey": "int64",
         "o_orderdate": "datetime64[us]", "o_totalprice": "float64"})
    odf["sum_qty"] = odf["o_orderkey"].map(qty_by_okey).astype(np.int64) \
        if len(odf) else pd.Series([], dtype="int64")
    odf = odf.sort_values(["sum_qty", "o_orderkey"],
                          ascending=[False, True]).head(k) \
        .reset_index(drop=True)
    cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
        columns=["c_custkey", "c_name"],
        filter=pads.field("c_custkey").isin(
            odf["o_custkey"].to_numpy(np.int64))).to_pandas()
    odf = odf.merge(cust, left_on="o_custkey", right_on="c_custkey",
                    how="left")
    return pa.table({
        "o_orderkey": pa.array(odf["o_orderkey"].to_numpy(np.int64),
                               pa.int64()),
        "o_custkey": pa.array(odf["o_custkey"].to_numpy(np.int64),
                              pa.int64()),
        "c_name": pa.array(odf["c_name"].astype(str) if len(odf) else [],
                           pa.string()),
        "o_orderdate": pa.array(odf["o_orderdate"]
                                .to_numpy("datetime64[us]"),
                                pa.timestamp("us")),
        "o_totalprice": pa.array(odf["o_totalprice"]
                                 .to_numpy(np.float64), pa.float64()),
        "sum_qty": pa.array(odf["sum_qty"].to_numpy(np.int64), pa.int64()),
    })


_Q19_BRACKETS = (
    ("Brand#11", 1, 15, 1, 20),
    ("Brand#16", 20, 50, 15, 45),
    ("Brand#22", 10, 30, 5, 30),
)


def q19_bracket_revenue(sf_dir: str, brackets=_Q19_BRACKETS,
                        force: str | None = None) -> pa.Table:
    """TPC-H Q19 shape — disjunctive bracket predicate: revenue and item
    count per (brand, size-range, quantity-range) bracket, the OR-of-ANDs
    part ⋈ lineitem filter. Brackets are brand-disjoint, so each lineitem
    matches at most one.

    part is a dimension: each bracket's qualifying partkeys resolve
    driver-side (predicate-pushdown read) into ONE sorted array +
    bracket-id array, broadcast once. The lineitem scan prunes at the
    read to the global quantity envelope, probes partkeys via
    searchsorted, checks the bracket's quantity range, and folds
    (bracket, rev4, n) partials — group-bounded by len(brackets), driver
    fold always."""
    import pyarrow.dataset as pads

    import ray.data as rd

    pk_all, bid_all = [], []
    for bi, (brand, slo, shi, _, _) in enumerate(brackets):
        pt = pads.dataset(f"{sf_dir}/part.parquet").to_table(
            columns=["p_partkey"],
            filter=((pads.field("p_brand") == brand)
                    & (pads.field("p_size") >= slo)
                    & (pads.field("p_size") <= shi)))
        keys = pt["p_partkey"].to_numpy()
        pk_all.append(keys)
        bid_all.append(np.full(len(keys), bi, np.int64))
    pk = np.concatenate(pk_all) if pk_all else np.empty(0, np.int64)
    bid = np.concatenate(bid_all) if bid_all else np.empty(0, np.int64)
    order = np.argsort(pk, kind="stable")
    pk_s, bid_s = pk[order], bid[order]
    qlo = np.array([b[3] for b in brackets], np.float64)
    qhi = np.array([b[4] for b in brackets], np.float64)
    ref = ray.put((pk_s, bid_s, qlo, qhi))

    glo, ghi = float(qlo.min()), float(qhi.max())
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"],
        filter=((pads.field("l_quantity") >= glo)
                & (pads.field("l_quantity") <= ghi)))

    n_brackets = len(brackets)

    def partials(batch: pa.Table) -> pa.Table:
        pk_w, bid_w, qlo_w, qhi_w = cached(ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        rev4 = _rev4(batch)
        pos = np.clip(np.searchsorted(pk_w, lp), 0, max(len(pk_w) - 1, 0))
        hit = (pk_w[pos] == lp) if len(pk_w) else np.zeros(len(lp), bool)
        b = bid_w[pos]
        keep = hit & (qty >= qlo_w[np.minimum(b, len(qlo_w) - 1)]) \
            & (qty <= qhi_w[np.minimum(b, len(qhi_w) - 1)])
        sums = np.zeros(n_brackets, np.int64)
        cnts = np.zeros(n_brackets, np.int64)
        np.add.at(sums, b[keep], rev4[keep])
        np.add.at(cnts, b[keep], 1)
        return pa.table({"bi": pa.array(np.arange(n_brackets), pa.int64()),
                         "rev4": pa.array(sums, pa.int64()),
                         "n": pa.array(cnts, pa.int64())})

    t = ensure_columns(
        li.map_batches(partials, batch_format="pyarrow", batch_size=65536)
          .to_pandas(),
        {"bi": "int64", "rev4": "int64", "n": "int64"})
    g = t.groupby("bi")[["rev4", "n"]].sum()
    brands = [b[0] for b in brackets]
    rev4 = np.array([int(g["rev4"].get(i, 0)) for i in range(n_brackets)],
                    np.int64)
    return pa.table({
        "bracket": pa.array(brands, pa.string()),
        "n_items": pa.array([int(g["n"].get(i, 0))
                             for i in range(n_brackets)], pa.int64()),
        "revenue": pa.array(
            np.asarray(round_half_away(rev4 / 10000.0, 2), np.float64),
            pa.float64()),
    })


def q22_idle_rich_customers(sf_dir: str,
                            force: str | None = None) -> pa.Table:
    """TPC-H Q22 shape — global-sales-opportunity: per nation, the count
    and total balance of customers whose account balance exceeds the
    positive-balance MEAN but who have placed no URGENT order (anti
    semi-join; every customer has *some* order in this data, so the
    urgent slice keeps the predicate meaningful).

    The mean comparison is exact-rational: ``cents·n_pos > total_cents``
    in int64 — no division, so boundary membership cannot disagree with
    the oracle's identically-rendered integer predicate. The anti-join is
    adaptive: small orders → the urgent custkeys pull to the driver
    (pushdown read) and broadcast, customers probe per batch; large →
    tagged-union shuffle (customer rows carry the nation/cents payload,
    urgent-order rows carry has_order=1; groupby custkey keeps groups
    with max(has_order)=0 — the user_activity_reconcile discipline).
    Output is nation-bounded either way."""
    import os

    import pyarrow.dataset as pads

    import ray.data as rd

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey",
                                      "c_acctbal"])

    def bal_partials(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        pos = cents > 0
        return pa.table({"total": pa.array([int(cents[pos].sum())],
                                           pa.int64()),
                         "n_pos": pa.array([int(pos.sum())], pa.int64())})

    bt = ensure_columns(
        cust.map_batches(bal_partials, batch_format="pyarrow",
                         batch_size=65536).to_pandas(),
        {"total": "int64", "n_pos": "int64"})
    total_cents = int(bt["total"].sum())
    n_pos = int(bt["n_pos"].sum())

    urgent = pads.field("o_orderpriority") == "1-URGENT"
    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    if small:
        ok = pads.dataset(f"{sf_dir}/orders.parquet").to_table(
            columns=["o_custkey"], filter=urgent)
        keys = np.unique(ok["o_custkey"].to_numpy())
        ref = ray.put(keys)

        def partials(batch: pa.Table) -> pa.Table:
            keys_w = cached(ref)
            cents = np.round(batch["c_acctbal"]
                             .to_numpy(zero_copy_only=False)
                             * 100.0).astype(np.int64)
            ckey = batch["c_custkey"].to_numpy(zero_copy_only=False)
            nat = batch["c_nationkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(keys_w, ckey), 0,
                          max(len(keys_w) - 1, 0))
            has = (keys_w[pos] == ckey) if len(keys_w) else \
                np.zeros(len(ckey), bool)
            keep = (~has) & (cents * n_pos > total_cents)
            t = pa.table({"c_nationkey": pa.array(nat[keep]),
                          "cents": pa.array(cents[keep]),
                          "one": pa.array(np.ones(int(keep.sum()),
                                                  np.int64))})
            g = t.group_by("c_nationkey").aggregate(
                [("cents", "sum"), ("one", "sum")])
            return g.rename_columns(["c_nationkey", "cents", "n"])

        t = ensure_columns(
            cust.map_batches(partials, batch_format="pyarrow",
                             batch_size=65536).to_pandas(),
            {"c_nationkey": "int64", "cents": "int64", "n": "int64"})
        g = t.groupby("c_nationkey", as_index=False)[["cents", "n"]].sum()
    else:
        def cust_rows(batch: pa.Table) -> pa.Table:
            cents = np.round(batch["c_acctbal"]
                             .to_numpy(zero_copy_only=False)
                             * 100.0).astype(np.int64)
            keep = cents * n_pos > total_cents
            return pa.table({
                "key": pc.array_filter(batch["c_custkey"].combine_chunks(),
                                       pa.array(keep)),
                "nat": pc.array_filter(
                    batch["c_nationkey"].combine_chunks(), pa.array(keep)),
                "cents": pa.array(cents[keep]),
                "has_order": pa.array(np.zeros(int(keep.sum()), np.int64)),
                "is_cust": pa.array(np.ones(int(keep.sum()), np.int64))})

        def order_rows(batch: pa.Table) -> pa.Table:
            keys = np.unique(batch["o_custkey"]
                             .to_numpy(zero_copy_only=False))
            z = np.zeros(len(keys), np.int64)
            return pa.table({"key": pa.array(keys), "nat": pa.array(z),
                             "cents": pa.array(z),
                             "has_order": pa.array(z + 1),
                             "is_cust": pa.array(z)})

        left = cust.map_batches(cust_rows, batch_format="pyarrow",
                                batch_size=65536)
        right = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey"], filter=urgent) \
            .map_batches(order_rows, batch_format="pyarrow",
                         batch_size=65536)
        merged = (left.union(right)
                  .repartition(n_reducers())
                  .groupby("key")
                  .aggregate(Max("has_order", alias_name="has_order"),
                             Sum("nat", alias_name="nat"),
                             Sum("cents", alias_name="cents"),
                             Sum("is_cust", alias_name="is_cust")))

        def nat_partials(batch: pa.Table) -> pa.Table:
            # anti-join predicate fused into the vectorized fold (no
            # row-lambda filter): customer rows whose group saw no
            # urgent-order row
            keep = ((batch["has_order"].to_numpy(zero_copy_only=False)
                     == 0)
                    & (batch["is_cust"].to_numpy(zero_copy_only=False)
                       == 1))
            t = pa.table({
                "c_nationkey": pc.array_filter(
                    batch["nat"].combine_chunks(), pa.array(keep)),
                "cents": pc.array_filter(
                    batch["cents"].combine_chunks(), pa.array(keep)),
                "one": pa.array(np.ones(int(keep.sum()), np.int64))})
            g = t.group_by("c_nationkey").aggregate(
                [("cents", "sum"), ("one", "sum")])
            return g.rename_columns(["c_nationkey", "cents", "n"])

        t = ensure_columns(
            merged.map_batches(nat_partials, batch_format="pyarrow",
                               batch_size=65536).to_pandas(),
            {"c_nationkey": "int64", "cents": "int64", "n": "int64"})
        g = t.groupby("c_nationkey", as_index=False)[["cents", "n"]].sum()
    g = g.sort_values("c_nationkey").reset_index(drop=True)
    return pa.table({
        "c_nationkey": pa.array(g["c_nationkey"].to_numpy(np.int64),
                                pa.int64()),
        "n_custs": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        "total_acctbal": pa.array(
            np.asarray(round_half_away(
                g["cents"].to_numpy(np.int64) / 100.0, 2), np.float64),
            pa.float64()),
    })


def q21_waiting_suppliers(sf_dir: str, late_days: int = 30, k: int = 50,
                          force: str | None = None) -> pa.Table:
    """TPC-H Q21 shape — suppliers who kept orders waiting: per supplier,
    the number of multi-supplier orders in which THEY were the only
    supplier with a late lineitem (shipdate > orderdate + ``late_days``).
    The classic nested EXISTS / NOT-EXISTS self-join on lineitem,
    linearized into two per-key folds:

      pair fold   (okey, skey) → max(ship)   [+ late flag vs orderdate]
      order fold  okey → (n_supp, n_late, late_skey=max(skey·late))

    ``n_supp ≥ 2 ∧ n_late = 1`` picks the qualifying orders; the single
    late supplier's key pops out of the max — no row-level self-join ever
    materializes. Adaptive: small orders → (okey, odate) broadcasts and
    both folds finish on the driver (pair rows are lineitem-bounded but
    2 M-gated); large → distributed groupby([okey, skey]) Max, hash join
    to orders, distributed per-okey aggregate, supplier-bounded final
    fold. Output (s_suppkey, s_name, numwait) top-``k`` by numwait desc,
    suppkey."""
    import os

    import pyarrow.dataset as pads

    import ray.data as rd

    late_us = np.int64(late_days) * 86400 * 1_000_000
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey",
                                    "l_shipdate"])
    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    if small:
        import pyarrow.parquet as pq_mod

        ot = pq_mod.read_table(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_orderdate"])
        okeys = ot["o_orderkey"].to_numpy()
        odate = ot["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .view(np.int64)
        order = np.argsort(okeys, kind="stable")
        ref = ray.put((okeys[order], odate[order]))

        def pair_partials(batch: pa.Table) -> pa.Table:
            okeys_w, odate_w = cached(ref)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            ship = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").view(np.int64)
            pos = np.clip(np.searchsorted(okeys_w, lk), 0,
                          max(len(okeys_w) - 1, 0))
            hit = (okeys_w[pos] == lk) if len(okeys_w) else \
                np.zeros(len(lk), bool)
            late = (hit & (ship > odate_w[pos] + late_us)).astype(np.int64)
            t = pa.table({"okey": pa.array(lk), "skey": pa.array(sk),
                          "late": pa.array(late)})
            g = t.group_by(["okey", "skey"]).aggregate([("late", "max")])
            return g.rename_columns(["okey", "skey", "late"])

        pairs = ensure_columns(
            li.map_batches(pair_partials, batch_format="pyarrow",
                           batch_size=65536).to_pandas(),
            {"okey": "int64", "skey": "int64", "late": "int64"})
        pairs = pairs.groupby(["okey", "skey"], as_index=False)["late"] \
            .max()
        # late supplier key = max(skey·late): 0 when none, the unique key
        # when exactly one (the only case the filter keeps)
        pairs["sl"] = pairs["skey"] * pairs["late"]
        per_o = pairs.groupby("okey").agg(
            n_supp=("skey", "size"), n_late=("late", "sum"),
            late_skey=("sl", "max"))
        q = per_o[(per_o["n_supp"] >= 2) & (per_o["n_late"] == 1)]
        g = q.groupby("late_skey").size().reset_index(name="numwait")
        g = g.rename(columns={"late_skey": "s_suppkey"})
    else:
        def pair_max(batch: pa.Table) -> pa.Table:
            ship = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").view(np.int64)
            t = pa.table({"okey": batch["l_orderkey"],
                          "skey": batch["l_suppkey"],
                          "ship_us": pa.array(ship)})
            g = t.group_by(["okey", "skey"]).aggregate([("ship_us", "max")])
            return g.rename_columns(["okey", "skey", "ship_us"])

        pair_ds = (li.map_batches(pair_max, batch_format="pyarrow",
                                  batch_size=65536)
                   .repartition(n_reducers())
                   .groupby(["okey", "skey"])
                   .aggregate(Max("ship_us", alias_name="ship_us")))

        def ord_proj(batch: pa.Table) -> pa.Table:
            odate = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").view(np.int64)
            return pa.table({"o_orderkey": batch["o_orderkey"],
                             "odate_us": pa.array(odate)})

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
            .map_batches(ord_proj, batch_format="pyarrow",
                         batch_size=65536)
        joined = pair_ds.join(
            orders, join_type="inner",
            num_partitions=_join_partitions(sf_dir, "lineitem", "orders"),
            on=("okey",), right_on=("o_orderkey",))

        def late_flag(batch: pa.Table) -> pa.Table:
            late = (batch["ship_us"].to_numpy(zero_copy_only=False)
                    > batch["odate_us"].to_numpy(zero_copy_only=False)
                    + late_us).astype(np.int64)
            sk = batch["skey"].to_numpy(zero_copy_only=False)
            return pa.table({"okey": batch["okey"],
                             "one": pa.array(np.ones(len(sk), np.int64)),
                             "late": pa.array(late),
                             "sl": pa.array(sk * late)})

        per_o = (joined.map_batches(late_flag, batch_format="pyarrow",
                                    batch_size=65536)
                 .groupby("okey")
                 .aggregate(Sum("one", alias_name="n_supp"),
                            Sum("late", alias_name="n_late"),
                            Max("sl", alias_name="late_skey")))

        def wait_partials(batch: pa.Table) -> pa.Table:
            keep = ((batch["n_supp"].to_numpy(zero_copy_only=False) >= 2)
                    & (batch["n_late"].to_numpy(zero_copy_only=False)
                       == 1))
            t = pa.table({"s_suppkey": pc.array_filter(
                batch["late_skey"].combine_chunks(), pa.array(keep))})
            g = t.group_by("s_suppkey").aggregate([([], "count_all")])
            return g.rename_columns(["s_suppkey", "numwait"])

        g = ensure_columns(
            per_o.map_batches(wait_partials, batch_format="pyarrow",
                              batch_size=65536).to_pandas(),
            {"s_suppkey": "int64", "numwait": "int64"})
        g = g.groupby("s_suppkey", as_index=False)["numwait"].sum()
    g = g.sort_values(["numwait", "s_suppkey"],
                      ascending=[False, True]).head(k).reset_index(drop=True)
    sup = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(
            g["s_suppkey"].to_numpy(np.int64))).to_pandas()
    g = g.merge(sup, on="s_suppkey", how="inner")
    return pa.table({
        "s_suppkey": pa.array(g["s_suppkey"].to_numpy(np.int64),
                              pa.int64()),
        "s_name": pa.array(g["s_name"].astype(str) if len(g) else [],
                           pa.string()),
        "numwait": pa.array(g["numwait"].to_numpy(np.int64), pa.int64()),
    })


def cheapest_supplier_per_part(sf_dir: str,
                               force: str | None = None) -> pa.Table:
    """Grouped ARGMIN at part cardinality (TPC-H Q2's min-cost-supplier
    shape on the available tables): for every part, the supplier offering
    the lowest unit price (extendedprice/quantity), ties by suppkey.

    Ray has no argmin aggregate, and 20k+ groups make map_groups a
    per-group Python loop — instead the (unit, suppkey) lexicographic
    order is ENCODED into one int64 so a single ``Min`` is the argmin:

      num = cents(extendedprice) ≤ ~2²⁴, qty ∈ [1, 50] ⇒ two distinct
      rationals num/qty differ by ≥ 1/2500, so enc = num·5000 // qty is
      order-isomorphic to the exact rational (scaled gap ≥ 2 ⇒ floors
      stay strictly ordered); comp = enc·2²⁴ + suppkey appends the
      tie-break (enc < 2³⁹ and suppkey < 2²⁴ are asserted). The float
      unit the oracle sorts by never collapses distinct rationals here
      (relative gap ≥ 4e-9 ≫ 2⁻⁵³), so float order = rational order.

    The winner's unit price rides along as its order-preserving positive-
    float64 bit pattern (same argmin row ⇒ Min(bits) = winner's bits).
    Per-batch Arrow group-min partials, then adaptive driver/distributed
    fold; output is part-bounded."""
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"])

    def partials(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        qty = np.round(batch["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        num = np.round(price * 100.0).astype(np.int64)
        skey = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        enc = num * 5000 // np.maximum(qty, 1)
        if len(enc) and (int(enc.max()) >= (1 << 39)
                         or int(skey.max()) >= (1 << 24)):
            raise ValueError("composite argmin key overflow")
        comp = enc * (1 << 24) + skey
        bits = (price / batch["l_quantity"]
                .to_numpy(zero_copy_only=False)).view(np.int64)
        t = pa.table({"p_partkey": batch["l_partkey"],
                      "comp": pa.array(comp), "bits": pa.array(bits)})
        g = t.group_by("p_partkey").aggregate(
            [("comp", "min"), ("bits", "min")])
        return g.rename_columns(["p_partkey", "comp", "bits"])

    parts = li.map_batches(partials, batch_format="pyarrow",
                           batch_size=65536)
    small = (li.count() < _SMALL_ROWS) if force is None \
        else (force == "driver")
    if small:
        df = ensure_columns(parts.to_pandas(),
                            {"p_partkey": "int64", "comp": "int64",
                             "bits": "int64"})
        g = df.groupby("p_partkey", as_index=False)[["comp", "bits"]].min()
    else:
        from ray.data.aggregate import Min

        g = (parts.repartition(n_reducers()).groupby("p_partkey")
             .aggregate(Min("comp", alias_name="comp"),
                        Min("bits", alias_name="bits"))).to_pandas()
        g = ensure_columns(g, {"p_partkey": "int64", "comp": "int64",
                               "bits": "int64"})
    g = g.sort_values("p_partkey").reset_index(drop=True)
    comp = g["comp"].to_numpy(np.int64)
    unit = g["bits"].to_numpy(np.int64).view(np.float64)
    return pa.table({
        "p_partkey": pa.array(g["p_partkey"].to_numpy(np.int64),
                              pa.int64()),
        "s_suppkey": pa.array(comp & ((1 << 24) - 1), pa.int64()),
        "unit_price": pa.array(
            np.asarray(round6(unit), np.float64), pa.float64()),
    })


def order_count_distribution(sf_dir: str,
                             force: str | None = None) -> pa.Table:
    """TPC-H Q13 shape — customer distribution: how many customers placed
    exactly ``k`` orders, INCLUDING the zero-order customers the LEFT
    JOIN keeps. The two-level aggregation (count per customer, then a
    histogram of those counts) without any row-level join:

    - customer is a dimension: its key set becomes a dense validity mask
      broadcast once (orphan o_custkey rows — which the LEFT JOIN would
      drop — are filtered exactly, not assumed away), and the zero
      bucket is ``n_customers − n_customers_with_orders`` from parquet
      metadata + the histogram's own mass.
    - orders is the fact: per-batch (custkey, n) partials fold either
      driver-side (small) or through a distributed groupby at custkey
      cardinality followed by a second group-bounded histogram fold
      (counts-of-counts are tiny) — adaptive like every fold here, with
      both branches pinned identical in pytest."""
    import pyarrow.parquet as pq

    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    ck = pq.read_table(f"{sf_dir}/customer.parquet",
                       columns=["c_custkey"])["c_custkey"].to_numpy()
    valid = np.zeros(int(ck.max()) + 1 if len(ck) else 1, bool)
    valid[ck] = True
    ref = ray.put(valid)

    orders = _read(sf_dir, "orders", ["o_custkey"])
    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows

    def partials(batch: pa.Table) -> pa.Table:
        v = cached(ref)
        oc = batch["o_custkey"].to_numpy(zero_copy_only=False)
        ok = (oc >= 0) & (oc < len(v))
        ok &= v[np.minimum(oc, len(v) - 1)]
        oc = oc[ok]
        t = pa.table({"custkey": pa.array(oc, pa.int64()),
                      "n": pa.array(np.ones(len(oc), np.int64))})
        g = t.group_by("custkey").aggregate([("n", "sum")])
        return g.rename_columns(["custkey", "n"])

    small = (n_orders < _SMALL_ROWS) if force is None \
        else (force == "driver")
    if small:
        df = ensure_columns(
            orders.map_batches(partials, batch_format="pyarrow",
                               batch_size=65536).to_pandas(),
            {"custkey": "int64", "n": "int64"})
        per = df.groupby("custkey")["n"].sum()
        cnts, dist = np.unique(per.to_numpy(np.int64), return_counts=True)
    else:
        agg = (orders.map_batches(partials, batch_format="pyarrow",
                                  batch_size=65536)
               .repartition(n_reducers())
               .groupby("custkey")
               .aggregate(Sum("n", alias_name="c_count")))

        def hist_partials(batch: pa.Table) -> pa.Table:
            n = batch["c_count"].to_numpy(zero_copy_only=False)
            u, c = np.unique(n, return_counts=True)
            return pa.table({"c_count": pa.array(u, pa.int64()),
                             "custdist": pa.array(c.astype(np.int64))})

        h = ensure_columns(
            agg.map_batches(hist_partials, batch_format="pyarrow",
                            batch_size=65536).to_pandas(),
            {"c_count": "int64", "custdist": "int64"})
        hg = h.groupby("c_count", as_index=False)["custdist"].sum()
        cnts = hg["c_count"].to_numpy(np.int64)
        dist = hg["custdist"].to_numpy(np.int64)
    n_with = int(dist.sum())
    zero = n_cust - n_with
    if zero > 0:
        cnts = np.append(cnts, 0)
        dist = np.append(dist, zero)
    order = np.lexsort((-cnts, -dist))
    return pa.table({
        "c_count": pa.array(cnts[order].astype(np.int64), pa.int64()),
        "custdist": pa.array(dist[order].astype(np.int64), pa.int64()),
    })


def nation_trade_flows(sf_dir: str, y0: int = 1995, y1: int = 1996,
                       force: str | None = None) -> pa.Table:
    """TPC-H Q7 shape — volume shipping: revenue flowing from each
    supplier nation to each DIFFERENT customer nation per ship year, over
    a two-year window (the reference query fixes one nation pair; the
    full flow matrix is the same plan run for all pairs at once). The
    6-table join resolves in one streaming pass over lineitem:

    - supplier/customer/nation are dimensions → dense suppkey→natkey /
      custkey→natkey arrays broadcast once (Q5 discipline).
    - orders is the fact-sized hop: adaptive — small → broadcast sorted
      (orderkey → custnat) probed per batch via searchsorted; large →
      lineitem pre-aggregates (orderkey, suppnat, year, rev4) and Ray's
      hash-shuffle join carries (orderkey, custnat) only.
    - group keys pack into ONE dense composite code
      ((suppnat·size_n + custnat)·n_years + year-y0, ≈ 25²·2 cells) so
      per-batch partials are a single bincount; revenue folds in integer
      1e-4-currency units (promo_revenue_share precedent).

    The ship-year window is pushdown-read; only matching row groups leave
    storage. Returns (supp_nation, cust_nation, l_year, n_items, revenue)
    ordered by the three keys."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_mod

    nat = pq_mod.read_table(f"{sf_dir}/nation.parquet")
    nk = nat["n_nationkey"].to_numpy()
    size_n = int(nk.max()) + 1
    names = np.empty(size_n, dtype=object)
    names[nk] = np.asarray(nat["n_name"].to_pylist(), dtype=object)

    def _dense(path: str, key: str, val: str) -> np.ndarray:
        t = pq_mod.read_table(path, columns=[key, val])
        k = t[key].to_numpy()
        arr = np.full(int(k.max()) + 1 if len(k) else 1, -1, np.int32)
        arr[k] = t[val].to_numpy().astype(np.int32)
        return arr

    cnat = _dense(f"{sf_dir}/customer.parquet", "c_custkey", "c_nationkey")
    snat = _dense(f"{sf_dir}/supplier.parquet", "s_suppkey", "s_nationkey")
    n_years = y1 - y0 + 1
    n_cells = size_n * size_n * n_years

    lo = pa.scalar(np.datetime64(f"{y0}-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(f"{y1 + 1}-01-01", "us"),
                   pa.timestamp("us"))
    date_filter = ((pads.field("l_shipdate") >= lo)
                   & (pads.field("l_shipdate") < hi))
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
        filter=date_filter)

    def _li_codes(batch: pa.Table, snat_w: np.ndarray):
        """(suppnat, year_idx, rev4, valid-supplier mask) for a batch."""
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        s_ok = (sk >= 0) & (sk < len(snat_w))
        s_n = np.where(s_ok, snat_w[np.minimum(sk, len(snat_w) - 1)], -1)
        yr = pc.year(batch["l_shipdate"].combine_chunks()) \
            .to_numpy(zero_copy_only=False).astype(np.int64) - y0
        return s_n, yr, _rev4(batch), s_n >= 0

    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    if small:
        ot = pq_mod.read_table(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey"])
        okeys = ot["o_orderkey"].to_numpy()
        ocust = ot["o_custkey"].to_numpy()
        onat = np.where((ocust >= 0) & (ocust < len(cnat)),
                        cnat[np.minimum(ocust, len(cnat) - 1)], -1)
        keep_o = onat >= 0
        okeys, onat = okeys[keep_o], onat[keep_o]
        order = np.argsort(okeys, kind="stable")
        ref = ray.put((okeys[order], onat[order].astype(np.int32), snat))

        def partials(batch: pa.Table) -> pa.Table:
            okeys_s, onat_s, snat_w = cached(ref)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            s_n, yr, rev4, s_keep = _li_codes(batch, snat_w)
            pos = np.clip(np.searchsorted(okeys_s, lk), 0,
                          max(len(okeys_s) - 1, 0))
            hit = (okeys_s[pos] == lk) if len(okeys_s) else \
                np.zeros(len(lk), bool)
            c_n = onat_s[pos] if len(okeys_s) else np.zeros(len(lk),
                                                            np.int32)
            keep = hit & s_keep & (s_n != c_n)
            code = ((s_n[keep].astype(np.int64) * size_n + c_n[keep])
                    * n_years + yr[keep])
            sums = np.bincount(code, weights=rev4[keep].astype(np.float64),
                               minlength=n_cells).astype(np.int64)
            cnts = np.bincount(code, minlength=n_cells)
            nz = np.flatnonzero(cnts)
            return pa.table({"code": pa.array(nz, pa.int64()),
                             "rev4": pa.array(sums[nz], pa.int64()),
                             "n": pa.array(cnts[nz], pa.int64())})

        t = ensure_columns(
            li.map_batches(partials, batch_format="pyarrow",
                           batch_size=65536).to_pandas(),
            {"code": "int64", "rev4": "int64", "n": "int64"})
    else:
        snat_ref = ray.put(snat)

        def li_partials(batch: pa.Table) -> pa.Table:
            snat_w = cached(snat_ref)
            s_n, yr, rev4, keep = _li_codes(batch, snat_w)
            t = pa.table({
                "l_orderkey": pc.array_filter(
                    batch["l_orderkey"].combine_chunks(), pa.array(keep)),
                "sy": pa.array(s_n[keep].astype(np.int64) * n_years
                               + yr[keep]),
                "rev4": pa.array(rev4[keep]),
                "one": pa.array(np.ones(int(keep.sum()), np.int64))})
            g = t.group_by(["l_orderkey", "sy"]).aggregate(
                [("rev4", "sum"), ("one", "sum")])
            return g.rename_columns(["l_orderkey", "sy", "rev4", "n"])

        li_agg = li.map_batches(li_partials, batch_format="pyarrow",
                                batch_size=65536)
        cnat_ref = ray.put(cnat)

        def ord_proj(batch: pa.Table) -> pa.Table:
            cnat_w = cached(cnat_ref)
            oc = batch["o_custkey"].to_numpy(zero_copy_only=False)
            c_ok = (oc >= 0) & (oc < len(cnat_w))
            c_n = np.where(c_ok, cnat_w[np.minimum(oc, len(cnat_w) - 1)],
                           -1)
            keep = c_n >= 0
            return pa.table({
                "o_orderkey": pc.array_filter(
                    batch["o_orderkey"].combine_chunks(), pa.array(keep)),
                "custnat": pa.array(c_n[keep].astype(np.int64))})

        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey"]) \
            .map_batches(ord_proj, batch_format="pyarrow",
                         batch_size=65536).materialize()
        n_right = orders.count()
        if n_right == 0:
            t = pd.DataFrame({"code": pd.Series([], dtype="int64"),
                              "rev4": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64")})
        else:
            n_parts = max(1, min(
                _join_partitions(sf_dir, "lineitem", "orders"),
                n_right // 64 + 1))
            joined = li_agg.join(orders, join_type="inner",
                                 num_partitions=n_parts,
                                 on=("l_orderkey",),
                                 right_on=("o_orderkey",))

            def cell_partials(batch: pa.Table) -> pa.Table:
                sy = batch["sy"].to_numpy(zero_copy_only=False)
                c_n = batch["custnat"].to_numpy(zero_copy_only=False)
                s_n = sy // n_years
                keep = s_n != c_n
                code = ((s_n[keep] * size_n + c_n[keep]) * n_years
                        + sy[keep] % n_years)
                rev4 = batch["rev4"].to_numpy(zero_copy_only=False)[keep]
                n = batch["n"].to_numpy(zero_copy_only=False)[keep]
                sums = np.bincount(code, weights=rev4.astype(np.float64),
                                   minlength=n_cells).astype(np.int64)
                cnts = np.bincount(code, weights=n.astype(np.float64),
                                   minlength=n_cells).astype(np.int64)
                nz = np.flatnonzero(cnts)
                return pa.table({"code": pa.array(nz, pa.int64()),
                                 "rev4": pa.array(sums[nz], pa.int64()),
                                 "n": pa.array(cnts[nz], pa.int64())})

            t = ensure_columns(
                joined.map_batches(cell_partials, batch_format="pyarrow",
                                   batch_size=65536).to_pandas(),
                {"code": "int64", "rev4": "int64", "n": "int64"})

    g = t.groupby("code", as_index=False)[["rev4", "n"]].sum()
    code = g["code"].to_numpy(np.int64)
    g["supp_nation"] = names[code // (size_n * n_years)]
    g["cust_nation"] = names[(code // n_years) % size_n]
    g["l_year"] = code % n_years + y0
    # nation KEYS don't sort like nation NAMES — order by the names
    g = g.sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)
    rev4 = g["rev4"].to_numpy(np.int64)
    return pa.table({
        "supp_nation": pa.array(g["supp_nation"], pa.string()),
        "cust_nation": pa.array(g["cust_nation"], pa.string()),
        "l_year": pa.array(g["l_year"].to_numpy(np.int64), pa.int64()),
        "n_items": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        "revenue": pa.array(
            np.asarray(round_half_away(rev4 / 10000.0, 2), np.float64),
            pa.float64()),
    })


def nation_market_share(sf_dir: str, region: str = "ASIA",
                        target_nation: str = "NATION_2",
                        y0: int = 1995, y1: int = 1996,
                        force: str | None = None) -> pa.Table:
    """TPC-H Q8 shape — national market share: within the orders of
    ``region``'s customers, the fraction of lineitem revenue supplied by
    ``target_nation``, per ship year. Same 6-table resolution as
    nation_trade_flows (dense nat-key arrays + adaptive orderkey hop),
    but the fold keys are (suppnat, year) cells restricted to in-region
    customers, and the driver finishes with ONE mirrored division of the
    two integer revenue sums per year (round6 both sides; the DuckDB
    side casts to DOUBLE explicitly — HUGEINT/HUGEINT would integer-
    divide)."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_mod

    nat = pq_mod.read_table(f"{sf_dir}/nation.parquet")
    reg = pq_mod.read_table(f"{sf_dir}/region.parquet")
    want_rk = {k: v for k, v in zip(reg["r_name"].to_pylist(),
                                    reg["r_regionkey"].to_pylist())}[region]
    nk = nat["n_nationkey"].to_numpy()
    size_n = int(nk.max()) + 1
    in_region = np.zeros(size_n, bool)
    in_region[nk] = nat["n_regionkey"].to_numpy() == want_rk
    names = np.empty(size_n, dtype=object)
    names[nk] = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    target_key = int(nk[np.asarray(nat["n_name"].to_pylist(), dtype=object)
                        == target_nation][0])

    def _dense(path: str, key: str, val: str) -> np.ndarray:
        t = pq_mod.read_table(path, columns=[key, val])
        k = t[key].to_numpy()
        arr = np.full(int(k.max()) + 1 if len(k) else 1, -1, np.int32)
        arr[k] = t[val].to_numpy().astype(np.int32)
        return arr

    cnat = _dense(f"{sf_dir}/customer.parquet", "c_custkey", "c_nationkey")
    snat = _dense(f"{sf_dir}/supplier.parquet", "s_suppkey", "s_nationkey")
    n_years = y1 - y0 + 1
    n_cells = size_n * n_years

    lo = pa.scalar(np.datetime64(f"{y0}-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(f"{y1 + 1}-01-01", "us"),
                   pa.timestamp("us"))
    date_filter = ((pads.field("l_shipdate") >= lo)
                   & (pads.field("l_shipdate") < hi))
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
        filter=date_filter)

    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    def _cells(s_n, yr, rev4, keep):
        code = s_n[keep].astype(np.int64) * n_years + yr[keep]
        sums = np.bincount(code, weights=rev4[keep].astype(np.float64),
                           minlength=n_cells).astype(np.int64)
        cnts = np.bincount(code, minlength=n_cells)
        nz = np.flatnonzero(cnts)
        return pa.table({"code": pa.array(nz, pa.int64()),
                         "rev4": pa.array(sums[nz], pa.int64()),
                         "n": pa.array(cnts[nz], pa.int64())})

    if small:
        ot = pq_mod.read_table(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey"])
        okeys = ot["o_orderkey"].to_numpy()
        ocust = ot["o_custkey"].to_numpy()
        onat = np.where((ocust >= 0) & (ocust < len(cnat)),
                        cnat[np.minimum(ocust, len(cnat) - 1)], -1)
        keep_o = (onat >= 0) & in_region[np.maximum(onat, 0)]
        okeys = okeys[keep_o]
        order = np.argsort(okeys, kind="stable")
        ref = ray.put((okeys[order], snat))

        def partials(batch: pa.Table) -> pa.Table:
            okeys_s, snat_w = cached(ref)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            s_ok = (sk >= 0) & (sk < len(snat_w))
            s_n = np.where(s_ok, snat_w[np.minimum(sk, len(snat_w) - 1)],
                           -1)
            yr = pc.year(batch["l_shipdate"].combine_chunks()) \
                .to_numpy(zero_copy_only=False).astype(np.int64) - y0
            pos = np.clip(np.searchsorted(okeys_s, lk), 0,
                          max(len(okeys_s) - 1, 0))
            hit = (okeys_s[pos] == lk) if len(okeys_s) else \
                np.zeros(len(lk), bool)
            return _cells(s_n, yr, _rev4(batch), hit & (s_n >= 0))

        t = ensure_columns(
            li.map_batches(partials, batch_format="pyarrow",
                           batch_size=65536).to_pandas(),
            {"code": "int64", "rev4": "int64", "n": "int64"})
    else:
        snat_ref = ray.put(snat)

        def li_partials(batch: pa.Table) -> pa.Table:
            snat_w = cached(snat_ref)
            sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            s_ok = (sk >= 0) & (sk < len(snat_w))
            s_n = np.where(s_ok, snat_w[np.minimum(sk, len(snat_w) - 1)],
                           -1)
            yr = pc.year(batch["l_shipdate"].combine_chunks()) \
                .to_numpy(zero_copy_only=False).astype(np.int64) - y0
            keep = s_n >= 0
            t = pa.table({
                "l_orderkey": pc.array_filter(
                    batch["l_orderkey"].combine_chunks(), pa.array(keep)),
                "sy": pa.array(s_n[keep].astype(np.int64) * n_years
                               + yr[keep]),
                "rev4": pa.array(_rev4(batch)[keep]),
                "one": pa.array(np.ones(int(keep.sum()), np.int64))})
            g = t.group_by(["l_orderkey", "sy"]).aggregate(
                [("rev4", "sum"), ("one", "sum")])
            return g.rename_columns(["l_orderkey", "sy", "rev4", "n"])

        li_agg = li.map_batches(li_partials, batch_format="pyarrow",
                                batch_size=65536)
        cnat_ref = ray.put((cnat, in_region))

        def ord_proj(batch: pa.Table) -> pa.Table:
            cnat_w, in_region_w = cached(cnat_ref)
            oc = batch["o_custkey"].to_numpy(zero_copy_only=False)
            c_ok = (oc >= 0) & (oc < len(cnat_w))
            c_n = np.where(c_ok, cnat_w[np.minimum(oc, len(cnat_w) - 1)],
                           -1)
            keep = (c_n >= 0) & in_region_w[np.maximum(c_n, 0)]
            return batch.select(["o_orderkey"]) \
                .filter(pa.array(keep))

        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey"]) \
            .map_batches(ord_proj, batch_format="pyarrow",
                         batch_size=65536).materialize()
        n_right = orders.count()
        if n_right == 0:
            t = pd.DataFrame({"code": pd.Series([], dtype="int64"),
                              "rev4": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64")})
        else:
            n_parts = max(1, min(
                _join_partitions(sf_dir, "lineitem", "orders"),
                n_right // 64 + 1))
            joined = li_agg.join(orders, join_type="inner",
                                 num_partitions=n_parts,
                                 on=("l_orderkey",),
                                 right_on=("o_orderkey",))

            def cell_partials(batch: pa.Table) -> pa.Table:
                sy = batch["sy"].to_numpy(zero_copy_only=False)
                rev4 = batch["rev4"].to_numpy(zero_copy_only=False)
                n = batch["n"].to_numpy(zero_copy_only=False)
                sums = np.bincount(sy, weights=rev4.astype(np.float64),
                                   minlength=n_cells).astype(np.int64)
                cnts = np.bincount(sy, weights=n.astype(np.float64),
                                   minlength=n_cells).astype(np.int64)
                nz = np.flatnonzero(cnts)
                return pa.table({"code": pa.array(nz, pa.int64()),
                                 "rev4": pa.array(sums[nz], pa.int64()),
                                 "n": pa.array(cnts[nz], pa.int64())})

            t = ensure_columns(
                joined.map_batches(cell_partials, batch_format="pyarrow",
                                   batch_size=65536).to_pandas(),
                {"code": "int64", "rev4": "int64", "n": "int64"})

    g = t.groupby("code", as_index=False)[["rev4", "n"]].sum()
    code = g["code"].to_numpy(np.int64)
    yr_all = code % n_years
    sn_all = code // n_years
    rev = g["rev4"].to_numpy(np.int64)
    cnt = g["n"].to_numpy(np.int64)
    years, shares, items = [], [], []
    for yi in range(n_years):
        m = yr_all == yi
        den = int(rev[m].sum())
        if den == 0:
            continue
        num = int(rev[m & (sn_all == target_key)].sum())
        years.append(y0 + yi)
        items.append(int(cnt[m].sum()))
        shares.append(float(round6(float(num) / float(den))))
    return pa.table({
        "l_year": pa.array(years, pa.int64()),
        "n_items": pa.array(items, pa.int64()),
        "mkt_share": pa.array(shares, pa.float64()),
    })


def upsert_latest(base, updates, key: str, version_col: str = "version",
                  force: str | None = None):
    """MERGE-INTO (latest-wins upsert): apply an updates Dataset onto a
    base Dataset, keeping per ``key`` the row with the highest
    ``version_col`` — the compaction primitive of an incremental ingest
    (CDC apply / snapshot merge). Returns a Ray Dataset (or driver
    pa.Table on the small branch) of the merged rows.

    Scale shape: ONE union feeds per-batch pre-reduction (each batch
    keeps only its own per-key max-version row — duplicate versions of a
    hot key collapse before the exchange), then a single hash exchange:
    small → driver lexsort; large → groupby(key).map_groups picking the
    winner inside each key partition (pandas is the group container, the
    map_groups house pattern). Ties on version are broken by preferring
    the UPDATE side via a tag column, then input order — deterministic on
    both branches."""
    tagged_u = updates.map_batches(
        lambda b: b.append_column("_src", pa.array(
            np.ones(b.num_rows, np.int8))), batch_format="pyarrow")
    tagged_b = base.map_batches(
        lambda b: b.append_column("_src", pa.array(
            np.zeros(b.num_rows, np.int8))), batch_format="pyarrow")
    ds = tagged_b.union(tagged_u)

    def pre_reduce(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = batch.to_pandas()
        df = df.sort_values([key, version_col, "_src"], kind="stable")
        return pa.Table.from_pandas(df.drop_duplicates(key, keep="last"),
                                    preserve_index=False,
                                    schema=batch.schema)

    # ONE execution: materialize the pre-reduced union, then count() is
    # a metadata read and both branches consume the same blocks (the
    # naive base.count() + updates.count() probe executed the whole
    # input twice before the real pass — measured 2.8 s at sf0.1)
    reduced = ds.map_batches(pre_reduce, batch_format="pyarrow",
                             batch_size=65536).materialize()
    n_rows = reduced.count()
    small = (n_rows < _SMALL_ROWS) if force is None \
        else (force == "driver")
    if small:
        df = reduced.to_pandas()
        if len(df) == 0:
            return pa.Table.from_pandas(df, preserve_index=False)
        df = df.sort_values([key, version_col, "_src"], kind="stable") \
            .drop_duplicates(key, keep="last") \
            .sort_values(key).drop(columns=["_src"])
        return pa.Table.from_pandas(df.reset_index(drop=True),
                                    preserve_index=False)

    def winner(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([version_col, "_src"], kind="stable")
        return g.tail(1).drop(columns=["_src"])

    return reduced.repartition(n_reducers()).groupby(key) \
        .map_groups(winner, batch_format="pandas")


def upsert_orders_latest(sf_dir: str, force: str | None = None) -> pa.Table:
    """Latest-wins upsert demo over orders: every orderkey divisible by 7
    receives a version-2 update (10% price bump, status 'U'; synthesized
    deterministically from the base table — no external data), merged via
    ``upsert_latest``. Exact oracle: the identical derivation + window
    row_number in SQL. Returns (o_orderkey, version, o_totalprice,
    o_orderstatus) ordered by key."""
    cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]
    base = _read(sf_dir, "orders", cols).map_batches(
        lambda b: b.append_column("version", pa.array(
            np.ones(b.num_rows, np.int64))), batch_format="pyarrow")

    def mk_updates(batch: pa.Table) -> pa.Table:
        keep = (batch["o_orderkey"].to_numpy(zero_copy_only=False)
                % 7) == 0
        sub = batch.filter(pa.array(keep))
        price = sub["o_totalprice"].to_numpy(zero_copy_only=False)
        # mirrored: round(o_totalprice * 1.1, 2) half-away (DuckDB ROUND)
        newp = np.asarray(round_half_away(price * 1.1, 2), np.float64)
        return pa.table({
            "o_orderkey": sub["o_orderkey"],
            "o_totalprice": pa.array(newp, pa.float64()),
            "o_orderstatus": pa.array(["U"] * sub.num_rows, pa.string()),
            "version": pa.array(np.full(sub.num_rows, 2, np.int64)),
        })

    updates = _read(sf_dir, "orders", cols).map_batches(
        mk_updates, batch_format="pyarrow")
    out = upsert_latest(base, updates, key="o_orderkey",
                        version_col="version", force=force)
    if not isinstance(out, pa.Table):
        out = pa.Table.from_pandas(
            ensure_columns(out.to_pandas(),
                           {"o_orderkey": "int64", "o_totalprice": "float64",
                            "o_orderstatus": "object", "version": "int64"})
            .sort_values("o_orderkey").reset_index(drop=True),
            preserve_index=False)
    return out.select(["o_orderkey", "version", "o_totalprice",
                       "o_orderstatus"])


def _padded_mat(names: np.ndarray, width: int) -> np.ndarray:
    """(n, width) uint8 matrix of ASCII names NUL-padded to ``width`` —
    one vectorized astype, no per-row Python."""
    return np.ascontiguousarray(
        names.astype(f"S{width}")).view(np.uint8).reshape(len(names), width)


def _del1_key_rows(mat: np.ndarray, width: int):
    """FastSS deletion-neighborhood keys for fixed-width byte rows: the
    row itself plus every single-position deletion, all viewed as
    ``S<width>`` (ASCII never contains NUL, so NUL padding cannot
    collide). Returns (keys S<width>[(W+1)·n], owner_row_idx)."""
    n, W = mat.shape
    dt = f"S{width}"
    keys = [np.ascontiguousarray(mat).view(dt).ravel()]
    owners = [np.arange(n, dtype=np.int64)]
    pad = np.zeros((n, 1), np.uint8)
    for j in range(W):
        sub = np.ascontiguousarray(
            np.hstack([np.delete(mat, j, axis=1), pad])).view(dt).ravel()
        keys.append(sub)
        owners.append(np.arange(n, dtype=np.int64))
    return np.concatenate(keys), np.concatenate(owners)


def _ed1_mask(a_mat: np.ndarray, a_len: np.ndarray,
              b_mat: np.ndarray, b_len: np.ndarray) -> np.ndarray:
    """Vectorized EXACT edit-distance ≤ 1 test over padded byte-matrix
    pairs (NUL padding, ASCII content):

    - equal length → at most one mismatching byte (substitution);
    - length differing by 1 → the longer equals the shorter with one
      char inserted: with p = first mismatch position, check the
      shifted suffix longer[p+1:] == shorter[p:] (padding compares
      equal-to-padding, so the full padded width is safe);
    - otherwise distance ≥ 2.

    No DP: the candidate sets here come from deletion-neighborhood
    blocking where per-pair DP (the dedup._levenshtein path) measured
    ~100 µs/pair and dominated the whole query at sf0.1."""
    m, W = a_mat.shape
    out = np.zeros(m, bool)
    same = a_len == b_len
    if same.any():
        out[same] = (a_mat[same] != b_mat[same]).sum(axis=1) <= 1
    d1 = np.abs(a_len - b_len) == 1
    if d1.any():
        ai, bi = a_mat[d1], b_mat[d1]
        swap = (a_len < b_len)[d1]
        lg = np.where(swap[:, None], bi, ai)
        sh = np.where(swap[:, None], ai, bi)
        neq = lg[:, :W - 1] != sh[:, :W - 1]
        pe = np.where(neq.any(axis=1), neq.argmax(axis=1), W - 1)
        eq_shift = lg[:, 1:] == sh[:, :W - 1]
        sufeq = np.flip(np.cumprod(np.flip(eq_shift, axis=1), axis=1),
                        axis=1).astype(bool)
        ok = np.where(pe >= W - 1, True,
                      np.take_along_axis(
                          sufeq, np.minimum(pe, W - 2)[:, None],
                          axis=1).ravel())
        out[d1] = ok
    return out


def fuzzy_join_customers(sf_dir: str, force: str | None = None) -> pa.Table:
    """Fuzzy key join (edit distance ≤ 1) via FastSS deletion-neighborhood
    blocking (Bocek et al. 2007, public): a deterministically corrupted
    copy of customer names (every third custkey loses the character at
    position ``custkey mod len``) joins back against the clean dimension.
    ed(x,y) ≤ 1 ⟹ ({x} ∪ del1(x)) ∩ ({y} ∪ del1(y)) ≠ ∅, so blocking on
    deletion variants finds every true pair; candidates verify with the
    vectorized exact ed≤1 test (_ed1_mask — variant collisions CAN have
    ed 2, e.g. "ab"/"ba", and are filtered, never reported). All-pairs
    never materializes, and nothing per-pair runs in Python: sequential
    TPC-H names make genuine ed-1 matches DENSE (~45 per key at sf0.1),
    which is exactly the stress that killed the per-pair-DP first cut of
    this operator (116 s → vectorized rewrite).

    Branches (forced-branch pytest): broadcast — the clean side's sorted
    variant keys + owner ids ship once, dirty batches probe via
    searchsorted range lookup; distributed — both variant tables meet in
    Ray's hash-shuffle join on the variant key."""
    import pyarrow.parquet as pq_mod

    ct = pq_mod.read_table(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    ckeys = ct["c_custkey"].to_numpy().astype(np.int64)
    import pyarrow.compute as _pc2

    cnames = np.asarray(ct["c_name"].to_pylist(), dtype=object)
    lens = _pc2.utf8_length(ct["c_name"].combine_chunks()) \
        .cast(pa.int64()).to_numpy(zero_copy_only=False)
    width = int(lens.max()) if len(lens) else 1
    cmat = _padded_mat(cnames, width)
    clean_keys, clean_owner = _del1_key_rows(cmat, width)
    order = np.argsort(clean_keys, kind="stable")
    clean_keys, clean_owner = clean_keys[order], clean_owner[order]
    ref = ray.put((clean_keys, clean_owner, cmat, lens, ckeys))

    def _dirty_mats(batch: pa.Table):
        """Deterministic corruption mirrored in the oracle SQL: custkey%3
        == 0 drops the char at custkey % len. Byte matrices end-to-end,
        no string materialization."""
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        names = np.asarray(batch["c_name"].to_pylist(), dtype=object)
        dlens = pc.utf8_length(batch["c_name"].combine_chunks()) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False).copy()
        m = _padded_mat(names, width)
        corrupt = (keys % 3) == 0
        if corrupt.any():
            pos = (keys[corrupt] % dlens[corrupt]).astype(np.int64)
            cm = m[corrupt]
            grid = np.arange(width)[None, :]
            gathered = cm[np.repeat(np.arange(len(cm)), width - 1)
                          .reshape(len(cm), width - 1),
                          np.where(grid[:, :width - 1] <
                                   pos[:, None], grid[:, :width - 1],
                                   grid[:, :width - 1] + 1)]
            out = np.zeros((len(cm), width), np.uint8)
            out[:, :width - 1] = gathered
            m[corrupt] = out
            dlens[corrupt] -= 1
        return keys, m, dlens

    try:
        import os

        small = (os.path.getsize(f"{sf_dir}/customer.parquet")
                 < _BCAST_JOIN_BYTES) if force is None \
            else (force == "driver")
    except OSError:
        small = force != "distributed"

    def _expand_ranges(starts, counts):
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.int64)
        offs = np.cumsum(counts) - counts
        return (np.arange(total, dtype=np.int64)
                - np.repeat(offs, counts) + np.repeat(starts, counts))

    def probe(batch: pa.Table) -> pa.Table:
        ck, co, cmat_w, clens_w, ckeys_w = cached(ref)
        dkeys, dmat, dlens = _dirty_mats(batch)
        qk, qo = _del1_key_rows(dmat, width)
        lo = np.searchsorted(ck, qk, side="left")
        hi = np.searchsorted(ck, qk, side="right")
        cnt = hi - lo
        nz = cnt > 0
        pos = _expand_ranges(lo[nz], cnt[nz])
        flat_clean = co[pos]
        flat_dirty = np.repeat(qo[nz], cnt[nz])
        if len(flat_dirty) == 0:
            return pa.table({"d_custkey": pa.array([], pa.int64()),
                             "c_custkey": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        comp = np.unique(flat_dirty * len(cmat_w) + flat_clean)
        drow = comp // len(cmat_w)
        crow = comp % len(cmat_w)
        ok = _ed1_mask(dmat[drow], dlens[drow],
                       cmat_w[crow], clens_w[crow])
        drow, crow = drow[ok], crow[ok]
        dist = (dmat[drow] != cmat_w[crow]).any(axis=1).astype(np.int64)
        return pa.table({
            "d_custkey": pa.array(dkeys[drow], pa.int64()),
            "c_custkey": pa.array(ckeys_w[crow], pa.int64()),
            "dist": pa.array(dist, pa.int64())})

    if small:
        df = ensure_columns(
            _read(sf_dir, "customer", ["c_custkey", "c_name"])
            .map_batches(probe, batch_format="pyarrow",
                         batch_size=2048).to_pandas(),
            {"d_custkey": "int64", "c_custkey": "int64", "dist": "int64"})
    else:
        def clean_variants(batch: pa.Table) -> pa.Table:
            names = np.asarray(batch["c_name"].to_pylist(), dtype=object)
            m = _padded_mat(names, width)
            ln = pc.utf8_length(batch["c_name"].combine_chunks()) \
                .cast(pa.int64()).to_numpy(zero_copy_only=False)
            k, o = _del1_key_rows(m, width)
            keys = batch["c_custkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "vh": pa.array(k.tolist(), pa.binary()),
                "c_custkey": pa.array(keys[o]),
                "c_pad": pa.array(
                    np.ascontiguousarray(m[o]).view(f"S{width}")
                    .ravel().tolist(), pa.binary()),
                "c_len": pa.array(ln[o])})

        def dirty_variants(batch: pa.Table) -> pa.Table:
            dkeys, dmat, dlens = _dirty_mats(batch)
            k, o = _del1_key_rows(dmat, width)
            return pa.table({
                "vh": pa.array(k.tolist(), pa.binary()),
                "d_custkey": pa.array(dkeys[o]),
                "d_pad": pa.array(
                    np.ascontiguousarray(dmat[o]).view(f"S{width}")
                    .ravel().tolist(), pa.binary()),
                "d_len": pa.array(dlens[o])})

        left = _read(sf_dir, "customer", ["c_custkey", "c_name"]) \
            .map_batches(dirty_variants, batch_format="pyarrow",
                         batch_size=8192).materialize()
        right = _read(sf_dir, "customer", ["c_custkey", "c_name"]) \
            .map_batches(clean_variants, batch_format="pyarrow",
                         batch_size=8192).materialize()
        n_parts = max(1, min(_join_partitions(sf_dir, "customer",
                                              "customer"),
                             right.count() // 64 + 1))
        joined = left.join(right, join_type="inner",
                           num_partitions=n_parts, on=("vh",))

        def _bin_mat(col, n: int) -> np.ndarray:
            # numpy's .tolist() on S-dtype TRIMS trailing NULs, so the
            # binary column carries variable-length values — re-pad here
            a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            return np.asarray(a.to_pylist(), dtype=object) \
                .astype(f"S{width}").view(np.uint8).reshape(n, width)

        def verify(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if n == 0:
                return pa.table({"d_custkey": pa.array([], pa.int64()),
                                 "c_custkey": pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.int64())})
            dmat = _bin_mat(batch["d_pad"], n)
            cmat_b = _bin_mat(batch["c_pad"], n)
            dl = batch["d_len"].to_numpy(zero_copy_only=False)
            cl = batch["c_len"].to_numpy(zero_copy_only=False)
            dk = batch["d_custkey"].to_numpy(zero_copy_only=False)
            ck2 = batch["c_custkey"].to_numpy(zero_copy_only=False)
            comp = dk * (np.int64(1) << 32) + ck2  # keys < 2^31
            _, first = np.unique(comp, return_index=True)
            dmat, cmat_b = dmat[first], cmat_b[first]
            dl, cl, dk, ck2 = dl[first], cl[first], dk[first], ck2[first]
            ok = _ed1_mask(dmat, dl, cmat_b, cl)
            dist = (dmat[ok] != cmat_b[ok]).any(axis=1).astype(np.int64)
            return pa.table({
                "d_custkey": pa.array(dk[ok], pa.int64()),
                "c_custkey": pa.array(ck2[ok], pa.int64()),
                "dist": pa.array(dist, pa.int64())})

        df = ensure_columns(
            joined.map_batches(verify, batch_format="pyarrow",
                               batch_size=65536).to_pandas(),
            {"d_custkey": "int64", "c_custkey": "int64", "dist": "int64"})
    df = df.drop_duplicates(["d_custkey", "c_custkey"]) \
        .sort_values(["d_custkey", "c_custkey"]).reset_index(drop=True)
    return pa.table({
        "d_custkey": pa.array(df["d_custkey"].to_numpy(np.int64)),
        "c_custkey": pa.array(df["c_custkey"].to_numpy(np.int64)),
        "dist": pa.array(df["dist"].to_numpy(np.int64))})


def revenue_gini(sf_dir: str, force: str | None = None) -> pa.Table:
    """Gini coefficient of per-customer order revenue — the inequality
    diagnostic a pipeline runs before stratifying spend-weighted samples
    (a heavy-tailed customer base needs different salting than a flat
    one). Over customers WITH orders (the LEFT-JOIN zero bucket is
    order_count_distribution's job; the SQL mirrors this choice).

    Exactness: revenue folds as integer cents at customer cardinality
    (adaptive driver/distributed, Q13 discipline); the driver sorts the
    group-bounded array and evaluates gini = (2·Σi·x_(i) − (n+1)·Σx) /
    (n·Σx) in EXACT big-int arithmetic — Σi·x overflows int64 beyond
    ~10⁶ customers, so the dot product accumulates int64 chunks into a
    Python int — with ONE mirrored double division at the end (tie order
    within equal x is irrelevant: equal values contribute the same sum
    under any permutation of their positions)."""
    import pyarrow.parquet as pq_mod

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    n_orders = pq_mod.ParquetFile(f"{sf_dir}/orders.parquet") \
        .metadata.num_rows

    def partials(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        cents = np.round(batch["o_totalprice"]
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"custkey": pa.array(ck.astype(np.int64)),
                      "cents": pa.array(cents)})
        g = t.group_by("custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["custkey", "cents"])

    small = (n_orders < _SMALL_ROWS) if force is None \
        else (force == "driver")
    if small:
        df = ensure_columns(
            orders.map_batches(partials, batch_format="pyarrow",
                               batch_size=65536).to_pandas(),
            {"custkey": "int64", "cents": "int64"})
        per = df.groupby("custkey")["cents"].sum().to_numpy(np.int64)
    else:
        agg = (orders.map_batches(partials, batch_format="pyarrow",
                                  batch_size=65536)
               .repartition(n_reducers())
               .groupby("custkey")
               .aggregate(Sum("cents", alias_name="cents")))
        # gini needs the full sorted vector; the pull is CUSTOMER-bounded
        # (dimension cardinality), never order/lineitem-bounded
        df = ensure_columns(agg.to_pandas(),
                            {"custkey": "int64", "cents": "int64"})
        per = df["cents"].to_numpy(np.int64)
    n = len(per)
    if n == 0:
        return pa.table({"n_customers": pa.array([], pa.int64()),
                         "gini": pa.array([], pa.float64())})
    x = np.sort(per)
    tot = int(x.sum())
    # exact Σ i·x_(i): int64 chunks (each < 2^63) into a Python int;
    # chunk sized from the worst single term so no partial dot overflows
    iwx = 0
    max_term = max(1, n * int(x[-1]))
    chunk = max(1, min(4096, (1 << 62) // max_term))
    for s0 in range(0, n, chunk):
        seg = x[s0:s0 + chunk]
        idx = np.arange(s0 + 1, s0 + 1 + len(seg), dtype=np.int64)
        iwx += int(np.dot(idx, seg))
    num = 2 * iwx - (n + 1) * tot
    den = n * tot
    gini = float(round6(float(num) / float(den))) if den else 0.0
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "gini": pa.array([gini], pa.float64()),
    })


# ---------------------------------------------------------------------------
# r5: the five TPC-H shapes the earlier rounds left out (Q9/Q11/Q12/Q16/Q20),
# adapted to the available columns — the bundled tables carry no partsupp
# and no l_shipmode/l_commitdate, so each query keeps the REFERENCE SHAPE
# (the join/aggregate/filter structure that makes the query hard) and
# substitutes a deterministic stand-in for the missing column, stated in
# the docstring. With these, all 22 TPC-H query structures are covered.
# ---------------------------------------------------------------------------


def q9_profit_by_nation_year(sf_dir: str, like: str = "red",
                             force: str | None = None) -> pa.Table:
    """TPC-H Q9 shape — product-type profit by (supplier nation, order
    year): the one TPC-H query that decorates the fact with BOTH part and
    supplier dimensions simultaneously plus an orders hop. partsupp is
    absent, so supply cost is the deterministic stand-in
    ``0.6 · p_retailprice`` (a pure function of the part row; the oracle
    renders the identical expression), giving

        amount4 = rev4 − round(p_retailprice·100)·60·round(l_quantity)

    in exact 1e-4-currency integer units (`_rev4` discipline — prices and
    retail prices are 2dp, quantities integral).

    Plan (Q7/nation_trade_flows discipline):
    - part (name-filtered) and supplier are dimensions → dense
      partkey→cost-per-unit-4 and suppkey→natkey arrays broadcast once;
    - orders is the fact-sized hop: adaptive — small → broadcast sorted
      (orderkey → year) probed via searchsorted; large → lineitem
      pre-aggregates (orderkey, nation, amount4) and the hash-shuffle
      `Dataset.join` carries (orderkey, year) only;
    - group cells pack into ONE dense ``nat·n_years + year`` code so
      per-batch partials are a single bincount (≤ 25·n_years cells).

    Returns (nation, o_year, n_items, profit) ordered by the two keys."""
    import os

    import pyarrow.parquet as pq_mod
    import ray.data as rd

    from ._util import parquet_minmax

    nat = pq_mod.read_table(f"{sf_dir}/nation.parquet")
    nk = nat["n_nationkey"].to_numpy()
    size_n = int(nk.max()) + 1
    names = np.empty(size_n, dtype=object)
    names[nk] = np.asarray(nat["n_name"].to_pylist(), dtype=object)

    part = pq_mod.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_name",
                                      "p_retailprice"])
    pk = part["p_partkey"].to_numpy()
    is_match = pc.match_substring(part["p_name"], like).to_numpy(
        zero_copy_only=False)
    cost4 = np.full(int(pk.max()) + 1 if len(pk) else 1, -1, np.int64)
    cost4[pk[is_match]] = (
        np.round(part["p_retailprice"].to_numpy()[is_match] * 100.0)
        .astype(np.int64) * 60)

    sup = pq_mod.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy()
    snat = np.full(int(sk.max()) + 1 if len(sk) else 1, -1, np.int32)
    snat[sk] = sup["s_nationkey"].to_numpy().astype(np.int32)

    dmin, dmax = parquet_minmax(f"{sf_dir}/orders.parquet", "o_orderdate")
    y0 = int(np.datetime64(dmin, "Y").astype(int)) + 1970
    y1 = int(np.datetime64(dmax, "Y").astype(int)) + 1970
    n_years = y1 - y0 + 1
    n_cells = size_n * n_years

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"])

    def _li_amounts(batch: pa.Table, cost4_w: np.ndarray,
                    snat_w: np.ndarray):
        """(nation, amount4, keep) for a batch: keep = name-matched part
        AND known supplier."""
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        p_ok = (lp >= 0) & (lp < len(cost4_w))
        c4 = np.where(p_ok, cost4_w[np.minimum(lp, len(cost4_w) - 1)], -1)
        s_ok = (ls >= 0) & (ls < len(snat_w))
        s_n = np.where(s_ok, snat_w[np.minimum(ls, len(snat_w) - 1)], -1)
        keep = (c4 >= 0) & (s_n >= 0)
        qty = np.round(batch["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        amt4 = _rev4(batch) - c4 * qty
        return s_n, amt4, keep

    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    if small:
        ot = pq_mod.read_table(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_orderdate"])
        okeys = ot["o_orderkey"].to_numpy()
        oyr = (ot["o_orderdate"].to_numpy().astype("datetime64[Y]")
               .astype(np.int64) + 1970 - y0)
        order = np.argsort(okeys, kind="stable")
        ref = ray.put((okeys[order], oyr[order].astype(np.int32),
                       cost4, snat))

        def partials(batch: pa.Table) -> pa.Table:
            okeys_s, oyr_s, cost4_w, snat_w = cached(ref)
            s_n, amt4, keep = _li_amounts(batch, cost4_w, snat_w)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(okeys_s, lk), 0,
                          max(len(okeys_s) - 1, 0))
            hit = (okeys_s[pos] == lk) if len(okeys_s) else \
                np.zeros(len(lk), bool)
            keep = keep & hit
            yr = oyr_s[pos] if len(okeys_s) else np.zeros(len(lk), np.int32)
            code = s_n[keep].astype(np.int64) * n_years + yr[keep]
            sums = np.bincount(code, weights=amt4[keep].astype(np.float64),
                               minlength=n_cells).astype(np.int64)
            cnts = np.bincount(code, minlength=n_cells)
            nz = np.flatnonzero(cnts)
            return pa.table({"code": pa.array(nz, pa.int64()),
                             "amt4": pa.array(sums[nz], pa.int64()),
                             "n": pa.array(cnts[nz], pa.int64())})

        t = ensure_columns(
            li.map_batches(partials, batch_format="pyarrow",
                           batch_size=65536).to_pandas(),
            {"code": "int64", "amt4": "int64", "n": "int64"})
    else:
        dims_ref = ray.put((cost4, snat))

        def li_partials(batch: pa.Table) -> pa.Table:
            cost4_w, snat_w = cached(dims_ref)
            s_n, amt4, keep = _li_amounts(batch, cost4_w, snat_w)
            t = pa.table({
                "l_orderkey": pc.array_filter(
                    batch["l_orderkey"].combine_chunks(), pa.array(keep)),
                "nat": pa.array(s_n[keep].astype(np.int64)),
                "amt4": pa.array(amt4[keep]),
                "one": pa.array(np.ones(int(keep.sum()), np.int64))})
            g = t.group_by(["l_orderkey", "nat"]).aggregate(
                [("amt4", "sum"), ("one", "sum")])
            return g.rename_columns(["l_orderkey", "nat", "amt4", "n"])

        li_agg = li.map_batches(li_partials, batch_format="pyarrow",
                                batch_size=65536)

        def ord_proj(batch: pa.Table) -> pa.Table:
            yr = (batch["o_orderdate"].to_numpy(zero_copy_only=False)
                  .astype("datetime64[Y]").astype(np.int64) + 1970 - y0)
            return pa.table({"o_orderkey": batch["o_orderkey"],
                             "yidx": pa.array(yr.astype(np.int64))})

        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_orderdate"]) \
            .map_batches(ord_proj, batch_format="pyarrow",
                         batch_size=65536).materialize()
        n_right = orders.count()
        if n_right == 0:
            t = pd.DataFrame({"code": pd.Series([], dtype="int64"),
                              "amt4": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64")})
        else:
            n_parts = max(1, min(
                _join_partitions(sf_dir, "lineitem", "orders"),
                n_right // 64 + 1))
            joined = li_agg.join(orders, join_type="inner",
                                 num_partitions=n_parts,
                                 on=("l_orderkey",),
                                 right_on=("o_orderkey",))

            def cell_partials(batch: pa.Table) -> pa.Table:
                nat_c = batch["nat"].to_numpy(zero_copy_only=False)
                yidx = batch["yidx"].to_numpy(zero_copy_only=False)
                code = nat_c * n_years + yidx
                amt4 = batch["amt4"].to_numpy(zero_copy_only=False)
                n = batch["n"].to_numpy(zero_copy_only=False)
                sums = np.bincount(code, weights=amt4.astype(np.float64),
                                   minlength=n_cells).astype(np.int64)
                cnts = np.bincount(code, weights=n.astype(np.float64),
                                   minlength=n_cells).astype(np.int64)
                nz = np.flatnonzero(cnts)
                return pa.table({"code": pa.array(nz, pa.int64()),
                                 "amt4": pa.array(sums[nz], pa.int64()),
                                 "n": pa.array(cnts[nz], pa.int64())})

            t = ensure_columns(
                joined.map_batches(cell_partials, batch_format="pyarrow",
                                   batch_size=65536).to_pandas(),
                {"code": "int64", "amt4": "int64", "n": "int64"})

    g = t.groupby("code", as_index=False)[["amt4", "n"]].sum()
    code = g["code"].to_numpy(np.int64)
    g["nation"] = names[code // n_years]
    g["o_year"] = code % n_years + y0
    g = g.sort_values(["nation", "o_year"]).reset_index(drop=True)
    amt4 = g["amt4"].to_numpy(np.int64)
    return pa.table({
        "nation": pa.array(g["nation"], pa.string()),
        "o_year": pa.array(g["o_year"].to_numpy(np.int64), pa.int64()),
        "n_items": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        "profit": pa.array(
            np.asarray(round_half_away(amt4 / 10000.0, 2), np.float64),
            pa.float64()),
    })


def part_value_concentration(sf_dir: str, nation: str = "NATION_3",
                             mult: int = 2,
                             force: str | None = None) -> pa.Table:
    """TPC-H Q11 shape — important-stock identification: per-part value
    restricted to ONE nation's suppliers, keeping parts whose value
    exceeds a threshold derived from the query's own global aggregate
    (`HAVING sum(...) > frac · SUM over everything`). partsupp is absent,
    so "stock value" is the shipped value ``Σ rev4`` per part over
    lineitems supplied by that nation (deterministic; oracle identical).

    Q11's fixed-fraction threshold goes vacuous as the part dimension
    grows (the same failure mode CLAUDE.md records for heavy-hitter
    cuts), so the threshold is MEAN-RELATIVE: keep parts with
    ``value · n_parts > mult · total`` — exact integers, compared with
    Python bigints on the driver (value·n_parts can cross 2^63 at scale).

    Plan: nation+supplier compose into one suppkey→in-nation bool array
    broadcast once; ONE lineitem pass folds per-partkey (rev4, n)
    partials adaptively (part-dimension-bounded); the threshold filter
    and final rank run on the part-bounded driver table. Ordered by
    (value4 DESC, l_partkey) — ranked on the INTEGER sum (float 2dp
    rounding would make near-ties order-ambiguous)."""
    import pyarrow.parquet as pq_mod

    nat = pq_mod.read_table(f"{sf_dir}/nation.parquet")
    sel = pc.equal(nat["n_name"], nation)
    natkeys = set(pc.filter(nat["n_nationkey"], sel).to_pylist())

    sup = pq_mod.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy()
    in_nation = np.zeros(int(sk.max()) + 1 if len(sk) else 1, bool)
    sn = sup["s_nationkey"].to_numpy()
    in_nation[sk[np.isin(sn, list(natkeys))]] = True
    ref = ray.put(in_nation)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
    n_rows = li.count()

    def partials(batch: pa.Table) -> pa.Table:
        mask = cached(ref)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        keep = (ls >= 0) & (ls < len(mask)) & mask[np.minimum(
            ls, len(mask) - 1)]
        t = pa.table({
            "pk": pc.array_filter(batch["l_partkey"].combine_chunks(),
                                  pa.array(keep)),
            "v4": pa.array(_rev4(batch)[keep])})
        g = t.group_by("pk").aggregate([("v4", "sum")])
        return g.rename_columns(["pk", "v4"])

    parts = li.map_batches(partials, batch_format="pyarrow",
                           batch_size=65536)
    small = (n_rows < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(), {"pk": "int64",
                                                 "v4": "int64"})
        agg = pdf.groupby("pk", as_index=False)["v4"].sum()
    else:
        agg = ensure_columns(
            parts.repartition(n_reducers()).groupby("pk")
                 .aggregate(Sum("v4", alias_name="v4")).to_pandas(),
            {"pk": "int64", "v4": "int64"})
    if not len(agg):
        return pa.table({"l_partkey": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    v4 = agg["v4"].to_numpy(np.int64)
    n_parts = len(agg)
    total = int(v4.sum())  # < 2^63 as int64 sum of per-part int64 sums
    keep = np.fromiter((int(v) * n_parts > mult * total for v in v4),
                       bool, count=n_parts)
    g = agg[keep].sort_values(["v4", "pk"],
                              ascending=[False, True]).reset_index(drop=True)
    return pa.table({
        "l_partkey": pa.array(g["pk"].to_numpy(np.int64), pa.int64()),
        "value": pa.array(
            np.asarray(round_half_away(
                g["v4"].to_numpy(np.int64) / 10000.0, 2), np.float64),
            pa.float64()),
    })


_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q12_priority_class_counts(sf_dir: str, y0: int = 1996, y1: int = 1997,
                              force: str | None = None) -> pa.Table:
    """TPC-H Q12 shape — shipping-class × order-priority split: for each
    lineitem class shipped inside a two-year window, how many came from
    high-priority orders (1-URGENT / 2-HIGH) vs everything else.
    l_shipmode is absent, so the class column is ``l_returnflag`` (the
    same ≤3-value lineitem dimension role); the priority CASE split and
    the lineitem⋈orders hop are the query's structure and are kept
    exactly.

    Plan: shipdate window pushed into the parquet read; orders hop
    adaptive (broadcast sorted orderkey→is_high bitmap / pre-aggregated
    hash-shuffle join); per-batch partials are a group_by over ≤3 flag
    values carrying (high, low) integer counts; adaptive flag-bounded
    fold. Returns (l_returnflag, high_count, low_count) ordered by
    flag."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_mod
    import ray.data as rd

    lo = pa.scalar(np.datetime64(f"{y0}-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(f"{y1 + 1}-01-01", "us"),
                   pa.timestamp("us"))
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
        filter=((pads.field("l_shipdate") >= lo)
                & (pads.field("l_shipdate") < hi)))

    try:
        orders_bytes = os.path.getsize(f"{sf_dir}/orders.parquet")
    except OSError:
        orders_bytes = _BCAST_JOIN_BYTES + 1
    small = (orders_bytes < _BCAST_JOIN_BYTES) if force is None \
        else (force == "driver")

    def _flag_partials(flags: pa.ChunkedArray, high: np.ndarray,
                       valid: np.ndarray) -> pa.Table:
        t = pa.table({
            "flag": pc.array_filter(flags.combine_chunks(),
                                    pa.array(valid)),
            "h": pa.array(high[valid].astype(np.int64)),
            "l": pa.array((1 - high[valid]).astype(np.int64))})
        g = t.group_by("flag").aggregate([("h", "sum"), ("l", "sum")])
        return g.rename_columns(["flag", "h", "l"])

    if small:
        ot = pq_mod.read_table(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_orderpriority"])
        okeys = ot["o_orderkey"].to_numpy()
        is_high = pc.is_in(
            ot["o_orderpriority"],
            value_set=pa.array(_HIGH_PRIORITIES)).to_numpy(
                zero_copy_only=False).astype(np.int8)
        order = np.argsort(okeys, kind="stable")
        ref = ray.put((okeys[order], is_high[order]))

        def partials(batch: pa.Table) -> pa.Table:
            okeys_s, high_s = cached(ref)
            lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(okeys_s, lk), 0,
                          max(len(okeys_s) - 1, 0))
            hit = (okeys_s[pos] == lk) if len(okeys_s) else \
                np.zeros(len(lk), bool)
            high = high_s[pos] if len(okeys_s) else np.zeros(len(lk),
                                                             np.int8)
            return _flag_partials(batch["l_returnflag"], high, hit)

        parts = li.map_batches(partials, batch_format="pyarrow",
                               batch_size=65536)
    else:
        def li_proj(batch: pa.Table) -> pa.Table:
            return pa.table({"l_orderkey": batch["l_orderkey"],
                             "flag": batch["l_returnflag"]})

        def ord_proj(batch: pa.Table) -> pa.Table:
            is_high = pc.is_in(
                batch["o_orderpriority"].combine_chunks(),
                value_set=pa.array(_HIGH_PRIORITIES)).to_numpy(
                    zero_copy_only=False).astype(np.int8)
            return pa.table({"o_orderkey": batch["o_orderkey"],
                             "high": pa.array(is_high.astype(np.int64))})

        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_orderpriority"]) \
            .map_batches(ord_proj, batch_format="pyarrow",
                         batch_size=65536).materialize()
        n_right = orders.count()
        n_parts = max(1, min(_join_partitions(sf_dir, "lineitem", "orders"),
                             n_right // 64 + 1))
        joined = li.map_batches(li_proj, batch_format="pyarrow",
                                batch_size=65536) \
            .join(orders, join_type="inner", num_partitions=n_parts,
                  on=("l_orderkey",), right_on=("o_orderkey",))

        def jpartials(batch: pa.Table) -> pa.Table:
            high = batch["high"].to_numpy(zero_copy_only=False) \
                .astype(np.int8)
            return _flag_partials(batch["flag"], high,
                                  np.ones(batch.num_rows, bool))

        parts = joined.map_batches(jpartials, batch_format="pyarrow",
                                   batch_size=65536)

    g = _fold_partials(parts, li.count(), ["flag"],
                       {"high_count": "h", "low_count": "l"})
    g = g.sort_values("flag").reset_index(drop=True)
    return pa.table({
        "l_returnflag": pa.array(g["flag"].astype(str), pa.string()),
        "high_count": pa.array(g["high_count"].to_numpy(np.int64),
                               pa.int64()),
        "low_count": pa.array(g["low_count"].to_numpy(np.int64),
                              pa.int64()),
    })


def part_supplier_variety(sf_dir: str, excl_brand: str = "Brand#1",
                          excl_type: str = "PROMO", k: int = 50,
                          force: str | None = None) -> pa.Table:
    """TPC-H Q16 shape — parts/supplier relationship: how many DISTINCT
    suppliers ship each (brand, type, size) part class, excluding one
    brand, one type, and a supplier blacklist (the reference's
    "complaints" NOT-IN subquery → suppliers with negative account
    balance — a deterministic predicate on the supplier row). partsupp is
    absent, so the (part, supplier) relation is the distinct pairs
    observed in lineitem.

    The core is a DISTINCT over the high-cardinality (partkey, suppkey)
    pair space — exactly the key shape CLAUDE.md forbids handing to a
    native Ray groupby (206 s vs 1.9 s). Both branches pack the pair into
    ONE int64 code; the distributed branch buckets codes by splitmix64
    hash and per-bucket np.unique sizes sum globally (buckets partition
    the code space — the copurchase fold discipline).

    Returns top-k (p_brand, p_type, p_size, supplier_cnt) ordered by
    (supplier_cnt DESC, brand, type, size)."""
    import pyarrow.parquet as pq_mod

    from ..kernels.hashing import splitmix64

    part = pq_mod.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_brand", "p_type",
                                      "p_size"])
    keep_p = pc.and_(pc.not_equal(part["p_brand"], excl_brand),
                     pc.not_equal(part["p_type"], excl_type)) \
        .to_numpy(zero_copy_only=False)
    pk = part["p_partkey"].to_numpy()[keep_p]
    classes = pd.DataFrame({
        "brand": np.asarray(part["p_brand"].to_pylist(),
                            dtype=object)[keep_p],
        "type": np.asarray(part["p_type"].to_pylist(),
                           dtype=object)[keep_p],
        "size": part["p_size"].to_numpy().astype(np.int64)[keep_p]})
    cell_of, cells = pd.factorize(
        classes["brand"].astype(str) + "\x00" + classes["type"].astype(str)
        + "\x00" + classes["size"].astype(str))
    cell_arr = np.full(int(part["p_partkey"].to_numpy().max()) + 1
                       if part.num_rows else 1, -1, np.int64)
    cell_arr[pk] = cell_of
    cell_meta = classes.groupby(cell_of, as_index=True).first()
    n_cells = len(cells)

    sup = pq_mod.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_acctbal"])
    sk = sup["s_suppkey"].to_numpy()
    max_sk = int(sk.max()) if len(sk) else 0
    ok_sup = np.zeros(max_sk + 1, bool)
    ok_sup[sk[sup["s_acctbal"].to_numpy() >= 0]] = True
    ref = ray.put((cell_arr, ok_sup))

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    n_rows = li.count()

    def pair_partials(batch: pa.Table) -> pa.Table:
        """Batch-unique (cell, suppkey) codes — pair-bounded output."""
        cell_w, ok_w = cached(ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        p_ok = (lp >= 0) & (lp < len(cell_w))
        cell = np.where(p_ok, cell_w[np.minimum(lp, len(cell_w) - 1)], -1)
        s_ok = (ls >= 0) & (ls < len(ok_w)) & ok_w[np.minimum(
            ls, len(ok_w) - 1)]
        keep = (cell >= 0) & s_ok
        code = np.unique(cell[keep] * np.int64(max_sk + 1) + ls[keep])
        return pa.table({"code": pa.array(code, pa.int64())})

    parts = li.map_batches(pair_partials, batch_format="pyarrow",
                           batch_size=65536)
    small = (n_rows < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        codes = ensure_columns(parts.to_pandas(), {"code": "int64"})
        uniq = np.unique(codes["code"].to_numpy(np.int64))
        cnt = np.bincount(uniq // np.int64(max_sk + 1), minlength=n_cells)
    else:
        def bucket(batch: pa.Table) -> pa.Table:
            c = batch["code"].to_numpy(zero_copy_only=False)
            b = (splitmix64(c.astype(np.uint64))
                 % np.uint64(n_reducers())).astype(np.int64)
            return batch.append_column("bucket", pa.array(b, pa.int64()))

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            u = np.unique(df["code"].to_numpy(np.int64))
            c = np.bincount(u // np.int64(max_sk + 1), minlength=n_cells)
            nz = np.flatnonzero(c)
            return pd.DataFrame({"cell": nz.astype(np.int64),
                                 "n": c[nz].astype(np.int64)})

        bt = ensure_columns(
            parts.map_batches(bucket, batch_format="pyarrow",
                              batch_size=65536)
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas").to_pandas(),
            {"cell": "int64", "n": "int64"})
        g = bt.groupby("cell")["n"].sum()
        cnt = np.zeros(n_cells, np.int64)
        cnt[g.index.to_numpy(np.int64)] = g.to_numpy(np.int64)

    out = pd.DataFrame({
        "p_brand": cell_meta["brand"].astype(str),
        "p_type": cell_meta["type"].astype(str),
        "p_size": cell_meta["size"].to_numpy(np.int64),
        "supplier_cnt": cnt[cell_meta.index.to_numpy()]})
    out = out[out["supplier_cnt"] > 0].sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).head(k).reset_index(drop=True)
    return pa.table({
        "p_brand": pa.array(out["p_brand"], pa.string()),
        "p_type": pa.array(out["p_type"], pa.string()),
        "p_size": pa.array(out["p_size"].to_numpy(np.int64), pa.int64()),
        "supplier_cnt": pa.array(out["supplier_cnt"].to_numpy(np.int64),
                                 pa.int64()),
    })


def bulk_part_suppliers(sf_dir: str, like: str = "red",
                        num: int = 1, den: int = 8,
                        force: str | None = None) -> pa.Table:
    """TPC-H Q20 shape — potential part promotion: suppliers for whom the
    name-matched parts are a MAJORITY CLASS of their own shipments
    (``matched_qty · den > total_qty · num`` — Q20's "availqty > ½ of
    shipped qty" correlated-threshold structure with the missing partsupp
    availability replaced by the supplier's own total, i.e. a
    two-aggregate self-comparison per supplier; exact integers, both
    sides rendered identically in the oracle).

    ONE lineitem pass folds per-suppkey (matched_qty, total_qty) integer
    partials (supplier-dimension-bounded) adaptively; the threshold and
    the s_name decoration run on the supplier-bounded driver table.
    Returns (s_name, matched_qty, total_qty) ordered by s_name."""
    import pyarrow.parquet as pq_mod

    part = pq_mod.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_name"])
    pk = part["p_partkey"].to_numpy()
    is_match = pc.match_substring(part["p_name"], like).to_numpy(
        zero_copy_only=False)
    match = np.zeros(int(pk.max()) + 1 if len(pk) else 1, bool)
    match[pk[is_match]] = True
    ref = ray.put(match)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity"])
    n_rows = li.count()

    def partials(batch: pa.Table) -> pa.Table:
        match_w = cached(ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        m = (lp >= 0) & (lp < len(match_w)) & match_w[np.minimum(
            lp, len(match_w) - 1)]
        qty = np.round(batch["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        t = pa.table({"sk": batch["l_suppkey"],
                      "qm": pa.array(np.where(m, qty, 0)),
                      "qt": pa.array(qty)})
        g = t.group_by("sk").aggregate([("qm", "sum"), ("qt", "sum")])
        return g.rename_columns(["sk", "qm", "qt"])

    parts = li.map_batches(partials, batch_format="pyarrow",
                           batch_size=65536)
    small = (n_rows < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"sk": "int64", "qm": "int64", "qt": "int64"})
        agg = pdf.groupby("sk", as_index=False)[["qm", "qt"]].sum()
    else:
        agg = ensure_columns(
            parts.repartition(n_reducers()).groupby("sk")
                 .aggregate(Sum("qm", alias_name="qm"),
                            Sum("qt", alias_name="qt")).to_pandas(),
            {"sk": "int64", "qm": "int64", "qt": "int64"})

    qm = agg["qm"].to_numpy(np.int64)
    qt = agg["qt"].to_numpy(np.int64)
    # Python-bigint compare: qty sums × den can cross 2^63 at 100 TB
    keep = np.fromiter(
        (int(a) * den > int(b) * num for a, b in zip(qm, qt)),
        bool, count=len(agg))
    agg = agg[keep]

    sup = pq_mod.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_name"])
    smap = dict(zip(sup["s_suppkey"].to_numpy().tolist(),
                    sup["s_name"].to_pylist()))
    out = pd.DataFrame({
        "s_name": [smap.get(int(s), "") for s in agg["sk"]],
        "matched_qty": agg["qm"].to_numpy(np.int64),
        "total_qty": agg["qt"].to_numpy(np.int64)})
    out = out[out["s_name"] != ""].sort_values("s_name") \
        .reset_index(drop=True)
    return pa.table({
        "s_name": pa.array(out["s_name"], pa.string()),
        "matched_qty": pa.array(out["matched_qty"].to_numpy(np.int64),
                                pa.int64()),
        "total_qty": pa.array(out["total_qty"].to_numpy(np.int64),
                              pa.int64()),
    })
