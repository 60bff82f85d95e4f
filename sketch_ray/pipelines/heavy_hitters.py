"""Heavy-hitter and emerging-heavy-hitter pipelines (the reference's flagship).

Reference semantics (src/sketch.cpp:48-289): scan the test corpus updating a
CM-CU sketch; keys whose estimate crosses a threshold become candidates; scale
candidate estimates by 1/growth (integer division, src/sketch.cpp:179-183);
scan the control corpus decrementing candidates on each hit
(src/sketch.cpp:186-235); drop candidates ≤ 0 (src/sketch.cpp:238-245).

Ray-Data-first re-expression (SURVEY.md §2.4 J1/J2, §7.1 step 4) — distributed,
partition-order-independent, and *exact* in its final output:

  pass 1  build the global CM-CU sketch (streaming partial-sketch build +
          tiny tree-merge shuffle; never undercounts).
  pass 2  re-scan: broadcast the merged sketch once via ``ray.put``; each
          batch pre-aggregates its tokens and keeps only tokens with
          sketch-estimate ≥ threshold  ⇒  candidate superset of the true
          heavy hitters (no-undercount guarantee), with per-batch partial
          counts attached.
  reduce  groupby(token).sum(partial_count) over candidates only — the only
          key shuffle, and it carries just candidate tokens (threshold-
          selected, small by construction), pre-aggregated per batch so a
          hot token contributes one row per batch regardless of frequency
          (skew handling, SURVEY.md §4).
  filter  exact count ≥ threshold  ⇒  exactly the true heavy-hitter set
          (sketch false positives pruned; false negatives impossible).

The emerging variant runs the candidate reduce over BOTH corpora and applies
the reference's prune: ``floor(exact_test / growth) − exact_control > 0``.

At 10^12-document scale this is two streaming scans of the corpus (same scan
count as the reference) plus sketch-sized and candidate-sized shuffles.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..kernels import make_sketch, sketch_from_bytes
from ..stages.sketch_build import SketchSpec, build_sketches
from ..stages.tokenize import ngram_counts, token_counts


def _spec_counts(spec: SketchSpec, batch: pa.Table):
    """(unique keys, counts) for the spec's key mode over one batch."""
    col = batch[spec.column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if spec.mode == "tokens":
        return token_counts(col, spec.lowercase)
    if spec.mode == "ngrams":
        return ngram_counts(col, spec.lengths, lowercase=spec.lowercase)
    if spec.mode == "column":
        vc = pc.value_counts(col)
        return vc.field("values"), vc.field("counts").to_numpy()
    raise ValueError(f"unsupported mode for heavy hitters: {spec.mode}")


def _candidate_counts(batch: pa.Table, sketch_ref, spec: SketchSpec,
                      threshold: int) -> pa.Table:
    """Pass-2 stage (stateless task): batch → (token, partial_count) rows for
    tokens whose broadcast-sketch estimate ≥ threshold. The sketch is fetched
    + deserialized once per WORKER (broadcast pattern, SURVEY.md §2.3 T4,
    via stages/broadcast.cached), never per batch."""
    from ..stages.broadcast import cached

    sketch = cached(sketch_ref, build=sketch_from_bytes)
    keys, counts = _spec_counts(spec, batch)
    if len(keys) == 0:
        return pa.table({"token": pa.array([], pa.large_string()),
                         "partial_count": pa.array([], pa.int64())})
    est = sketch.query(keys)
    mask_np = est >= threshold
    return pa.table(
        {
            "token": keys.filter(pa.array(mask_np)).cast(pa.large_string()),
            "partial_count": pa.array(np.asarray(counts)[mask_np], pa.int64()),
        }
    )


def exact_candidate_counts(
    ds,
    sketch_bytes: bytes,
    spec: SketchSpec,
    threshold: int,
    concurrency: int | None = None,
    batch_size: int = 4096,
):
    """Dataset of (token, cnt) with *exact* counts for every key whose sketch
    estimate ≥ threshold (superset of true heavy hitters).

    ``concurrency`` (optional) caps the stage's concurrent tasks — the
    stage is stateless (broadcast-cached sketch), so None = elastic."""
    ref = ray.put(sketch_bytes)
    kw: dict[str, Any] = dict(batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)
    if concurrency is not None:
        kw["concurrency"] = concurrency
    partials = ds.map_batches(
        lambda b: _candidate_counts(b, ref, spec, threshold), **kw
    )
    from ray.data.aggregate import Sum

    return partials.groupby("token").aggregate(Sum("partial_count", alias_name="cnt"))


def heavy_hitters(
    ds,
    spec: SketchSpec,
    threshold: int,
    concurrency: int | None = None,
    batch_size: int = 4096,
    semantics: str = "baseline",
):
    """Exact heavy hitters (count ≥ threshold) of a key spec over ``ds``.

    Returns a Dataset with columns (token: large_string, cnt: int64), the
    exact analog of the reference's report sink (src/sketch.cpp:266-284).

    ``semantics`` selects the reference's two threshold behaviors
    (SURVEY.md §2.2 M8):

    - ``"baseline"``: ``>=`` — the candidate's reported count keeps
      refreshing, so ``cnt`` is the final exact count (src/sketch.cpp:160-162).
    - ``"first_crossing"``: ``==`` emit-once — a key is emitted the moment
      its count first reaches the threshold and never updated again
      (src/sketch_approx.cu:72, src/sketch_pipelined.cu:118-121), so the
      reported ``cnt`` is the threshold itself. With exact per-occurrence
      counting the emitted key SET is identical to baseline (counts grow by
      1, so any count >= T passed through == T exactly once).
    """
    if semantics not in ("baseline", "first_crossing"):
        raise ValueError(f"unknown threshold semantics: {semantics!r}")
    sketches = build_sketches(ds, [spec], batch_size=batch_size, concurrency=concurrency)
    sk = sketches[spec.name]
    counts = exact_candidate_counts(ds, sk.to_bytes(), spec, threshold, concurrency, batch_size)
    out = counts.filter(expr=f"cnt >= {int(threshold)}")
    if semantics == "first_crossing":
        thr = int(threshold)

        def snapshot(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return batch.set_column(
                batch.schema.get_field_index("cnt"), "cnt",
                pa.array(np.full(n, thr, np.int64), pa.int64()))

        out = out.map_batches(snapshot, batch_format="pyarrow")
    return out


def emerging_heavy_hitters(
    test_ds,
    control_ds,
    spec: SketchSpec,
    threshold: int,
    growth: int = 2,
    concurrency: int | None = None,
    batch_size: int = 4096,
):
    """Emerging heavy hitters: test-count ≥ threshold AND
    floor(test_count / growth) − control_count > 0 (reference semantics:
    scale src/sketch.cpp:179-183, probe-decrement src/sketch.cpp:222-227,
    prune src/sketch.cpp:238-245 — here with exact verified counts).

    Returns (token, test_cnt, control_cnt).

    The test-candidate and control-probe scans both key off the pass-1
    sketch only, so they run as ONE fused streaming execution (tagged
    union) with a single distributed groupby over candidate-only rows —
    same shape as the k-mer pipeline (pipelines/kmers.py)."""
    import pandas as pd

    sketches = build_sketches(test_ds, [spec], batch_size=batch_size, concurrency=concurrency)
    sk_bytes = sketches[spec.name].to_bytes()
    ref = ray.put(sk_bytes)

    def tagged(corpus: int):
        def fn(b: pa.Table) -> pa.Table:
            t = _candidate_counts(b, ref, spec, threshold)
            return t.append_column("corpus", pa.array([corpus] * t.num_rows, pa.int8()))
        return fn

    kw: dict[str, Any] = dict(batch_format="pyarrow", batch_size=batch_size,
                              zero_copy_batch=True)
    if concurrency is not None:
        kw["concurrency"] = concurrency
    test_rows = test_ds.map_batches(tagged(0), **kw)
    # control side: count ONLY candidate keys (same sketch, threshold acts
    # as the candidate filter — anything below can't be a candidate)
    ctrl_rows = control_ds.map_batches(tagged(1), **kw)
    from ray.data.aggregate import Sum

    both = (
        test_rows.union(ctrl_rows)
        .groupby(["token", "corpus"])
        .aggregate(Sum("partial_count", alias_name="cnt"))
        .to_pandas()
    )
    if "token" not in both.columns or not len(both):
        return pd.DataFrame({"token": pd.Series([], dtype=str),
                             "test_cnt": pd.Series([], dtype="int64"),
                             "control_cnt": pd.Series([], dtype="int64")})
    test_t = both[both["corpus"] == 0][["token", "cnt"]].rename(columns={"cnt": "test_cnt"})
    test_t = test_t[test_t["test_cnt"] >= int(threshold)]
    ctrl_t = both[both["corpus"] == 1][["token", "cnt"]].rename(columns={"cnt": "control_cnt"})
    # candidate sets are threshold-selected (small); a driver-side join is the
    # broadcast-join analog of the reference's candidate-map probe (J1)
    merged = test_t.merge(ctrl_t, on="token", how="left")
    merged["control_cnt"] = merged["control_cnt"].fillna(0).astype("int64")
    keep = (merged["test_cnt"] // growth - merged["control_cnt"]) > 0
    out = merged[keep].reset_index(drop=True)
    return out[["token", "test_cnt", "control_cnt"]]


def grouped_heavy_hitter_tokens(sf_dir: str, rel_threshold: float = 0.05,
                                by: str = "lang") -> "pa.Table":
    """Per-GROUP heavy hitters: tokens with count >= ceil(rel_threshold ×
    the group's total token count) within each ``by`` group — the
    reference's threshold operator (M8, src/sketch.cpp:160-162) composed
    with grouping, via per-group sketches riding Ray's native aggregate:

    pass 1: ONE ``groupby(by).aggregate(SketchAgg(cmcu), Sum(n_tok))`` —
        per-group CM-CU sketch + exact group token totals (group-bounded
        rows; the sketches ARE the aggregate state, merged by Ray);
    pass 2: per-batch (group, token, partial) pre-aggregation probes the
        broadcast {group: (sketch, threshold)} map; CM-CU never
        undercounts, so dropping rows whose estimate is below the group
        threshold cannot lose a true heavy hitter; the candidate-bounded
        survivors fold to exact counts and the exact threshold applies.

    Returns (lang, token, cnt) sorted — exact, oracle-gated."""
    import pandas as pd

    from ..stages.agg import SketchAgg
    from ..stages.broadcast import cached
    from ray.data.aggregate import Sum

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=[by, "text"])

    def with_ntok(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        n = pc.list_value_length(toks).cast(pa.int64())
        return batch.append_column("n_tok", n)

    spec = SketchSpec("g", "cmcu", "text", mode="tokens",
                      params={"width": 1 << 14, "seed": 42})
    agg = (
        ds.map_batches(with_ntok, batch_format="pyarrow", batch_size=8192)
        .groupby(by)
        .aggregate(SketchAgg(spec, alias_name="sk", finalize="bytes"),
                   Sum("n_tok", alias_name="total"))
    )
    gdf = agg.to_pandas()  # group-bounded: one row per group
    table = {}
    for _, r in gdf.iterrows():
        thr = max(1, int(np.ceil(rel_threshold * int(r["total"]))))
        table[r[by]] = (sketch_from_bytes(r["sk"]), thr)
    ref = ray.put(table)

    def candidates(batch: pa.Table) -> pa.Table:
        tbl = cached(ref)
        g = batch[by].combine_chunks()
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        g_rep = g.take(pa.array(np.repeat(np.arange(len(g)), ntok)))
        t = pa.table({by: g_rep, "token": flat})
        pre = t.group_by([by, "token"]).aggregate([([], "count_all")]) \
            .rename_columns([by, "token", "partial"])
        keep = np.zeros(pre.num_rows, dtype=bool)
        gv = pre[by].to_numpy(zero_copy_only=False)
        tok_col = pre["token"]
        for grp in pd.unique(gv):
            if grp not in tbl:
                continue
            sk, thr = tbl[grp]
            rows = np.flatnonzero(gv == grp)
            est = sk.query(tok_col.take(pa.array(rows)))
            keep[rows] = est >= thr
        return pre.filter(pa.array(keep))

    cand = ds.map_batches(candidates, batch_format="pyarrow", batch_size=8192)
    df = cand.to_pandas()  # candidate-bounded (threshold-selected × batches)
    if not len(df):
        return pa.table({by: pa.array([], pa.string()),
                         "token": pa.array([], pa.large_string()),
                         "cnt": pa.array([], pa.int64())})
    exact = df.groupby([by, "token"], as_index=False)["partial"].sum() \
        .rename(columns={"partial": "cnt"})
    thr_of = exact[by].map(lambda g: table[g][1])
    out = exact[exact["cnt"] >= thr_of].sort_values([by, "token"]) \
        .reset_index(drop=True)
    out["cnt"] = out["cnt"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def windowed_heavy_users(sf_dir: str, window: int = 7, threshold: int = 24,
                         force: str | None = None) -> pa.Table:
    """Sliding-window heavy hitters — (user, window-end day) pairs whose
    trailing-``window``-day event count reaches ``threshold``. The
    streaming composition the per-corpus heavy_hitters pipeline doesn't
    cover: per-DAY mergeable state + pigeonhole candidate generation +
    exact verification, so EVERY window is answered without rescanning:

    1. one pass folds (day, user, n) partials (adaptive driver /
       distributed groupby — daily_active_users discipline);
    2. per-day CM-CU states build in the SAME pass structure
       (groupby(day) SketchAgg); a window's sketch is the sum-merge of
       ≤window day states — at 10^12-event scale the candidate probe
       runs against these KB states, and merged-CM-estimate ≥ exact is
       pinned in pytest;
    3. pigeonhole: a user reaching ``threshold`` over ``window`` days
       has ≥ ceil(threshold/window) events on SOME day inside it — the
       per-day heavy pairs (exact, from the fold) generate candidate
       (user, window-end) pairs with NO false dismissal;
    4. exact verification: per-user day-sorted cumulative sums answer
       each candidate window in one searchsorted — candidate-bounded,
       never corpus-bounded.

    Returns (day, user_id, n_events) sorted by (day, user_id) — exact,
    oracle-gated. ``force``="driver"/"distributed" pins the fold
    branch."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..pipelines._util import ensure_columns, n_reducers
    from ..pipelines.relational import _SMALL_ROWS, _read
    from ..stages.agg import SketchAgg

    _DAY_US = np.int64(86_400_000_000)
    W, T = int(window), int(threshold)
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    from ..pipelines.relational import _day_user_counts

    parts = ds.map_batches(_day_user_counts, batch_format="pyarrow",
                           batch_size=32768)
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"day": "datetime64[us]", "user_id": "int64",
                              "n_p": "int64"})
        pairs = pdf.groupby(["day", "user_id"], as_index=False)["n_p"].sum() \
            .rename(columns={"n_p": "n"})
    else:
        pairs = ensure_columns(
            parts.repartition(n_reducers()).groupby(["day", "user_id"])
                 .aggregate(Sum("n_p", alias_name="n")).to_pandas(),
            {"day": "datetime64[us]", "user_id": "int64", "n": "int64"})

    # per-day CM-CU states: the window probe. A window's sketch is the
    # sum-merge of its day states; CM-CU never undercounts, so rejecting
    # candidates with est < threshold is SAFE (no false dismissal) and
    # bounds the exact-verification set. Built HERE from the already-
    # resident (day, user, n) pairs via weighted CU updates (equivalent
    # to per-event updates — the weighted-CU contract, countmin.py) so
    # the query costs NO second events scan; at a scale where the pairs
    # are not driver-resident, per_day_user_cm_states is the distributed
    # one-pass build of the same states (pinned >= exact in pytest).
    states: dict[int, bytes] = {}
    for d, grp in pairs.groupby("day"):
        sk = make_sketch("cmcu", width=1 << 12, depth=4, seed=42)
        sk.update(pa.array(grp["user_id"].to_numpy(np.int64), pa.int64()),
                  grp["n"].to_numpy(np.int64))
        states[int(pd.Timestamp(d).value // 1000)] = sk.to_bytes()

    days = np.sort(pairs["day"].unique()).astype("datetime64[us]")
    day_i = days.astype(np.int64)
    pday = pairs["day"].to_numpy("datetime64[us]").astype(np.int64)
    puser = pairs["user_id"].to_numpy(np.int64)
    pn = pairs["n"].to_numpy(np.int64)

    # pigeonhole candidates, fully vectorized: each heavy (user, day)
    # pair serves the <=W present end-days in [day, day+W-1] — expand via
    # repeat + range offsets, dedup on a composite (user-RANK, day-rank)
    # key. Users are dense-ranked first so the composite can never
    # overflow int64 no matter how large (e.g. hashed 64-bit) the raw
    # user ids are — ranks are bounded by the distinct-user count.
    uu = np.unique(puser)
    per_day_min = -(-T // W)  # ceil(T/W)
    heavy = pn >= per_day_min
    hd, hu = pday[heavy], np.searchsorted(uu, puser[heavy])
    D = np.int64(len(day_i))
    lo_i = np.searchsorted(day_i, hd)
    hi_i = np.searchsorted(day_i, hd + (W - 1) * _DAY_US, side="right")
    reps = hi_i - lo_i
    seq = np.arange(int(reps.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(reps) - reps, reps)
    end_rank = np.repeat(lo_i, reps) + seq
    comp = np.unique(np.repeat(hu, reps) * (D + 1) + end_rank)
    cand_u = uu[comp // (D + 1)]  # back to raw ids
    cand_rank = (comp % (D + 1)).astype(np.int64)

    # per-user day-sorted cumsums for exact window sums (composite-rank
    # searchsorted — the _asof_match discipline, no per-candidate loop)
    order = np.lexsort((pday, puser))
    su, sd, sn = puser[order], pday[order], pn[order]
    pair_comp = np.searchsorted(uu, su) * (D + 1) \
        + np.searchsorted(day_i, sd)
    csum = np.concatenate([[0], np.cumsum(sn)])

    out_d, out_u, out_n = [], [], []
    for rank in np.unique(cand_rank):  # day-bounded loop
        d_us = int(day_i[rank])
        lo = int(np.searchsorted(day_i, d_us - (W - 1) * _DAY_US))
        sk = sketch_from_bytes(states[int(day_i[lo])]).copy()
        for di in range(lo + 1, int(rank) + 1):
            sk.merge(sketch_from_bytes(states[int(day_i[di])]))
        users = cand_u[cand_rank == rank]
        # ONE vectorized probe per end-day; the key representation must
        # match the update path (mode="column" ints hash via string cast)
        est = sk.query(pa.array(users, pa.int64()))
        users = users[est >= T]  # no undercount -> safe rejection
        if len(users) == 0:
            continue
        ur = np.searchsorted(uu, users)  # rank space, matching pair_comp
        p_lo = np.searchsorted(pair_comp, ur * (D + 1) + lo)
        p_hi = np.searchsorted(pair_comp, ur * (D + 1) + rank + 1)
        exact = csum[p_hi] - csum[p_lo]
        keep = exact >= T
        out_d.append(np.full(int(keep.sum()), d_us, np.int64))
        out_u.append(users[keep])
        out_n.append(exact[keep])

    if out_d and sum(len(x) for x in out_d):
        arr_d = np.concatenate(out_d)
        arr_u = np.concatenate(out_u)
        arr_n = np.concatenate(out_n)
        o = np.lexsort((arr_u, arr_d))
        out = pd.DataFrame({"day": arr_d[o].astype("datetime64[us]"),
                            "user_id": arr_u[o], "n_events": arr_n[o]})
    else:
        out = pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                            "user_id": pd.Series([], dtype="int64"),
                            "n_events": pd.Series([], dtype="int64")})
    return pa.table({
        "day": pa.array(out["day"].to_numpy("datetime64[us]"),
                        pa.timestamp("us")),
        "user_id": pa.array(out["user_id"].to_numpy(np.int64), pa.int64()),
        "n_events": pa.array(out["n_events"].to_numpy(np.int64), pa.int64()),
    })



def per_day_user_cm_states(sf_dir: str, width: int = 1 << 12,
                           depth: int = 4, seed: int = 42) -> dict[int, bytes]:
    """{day (epoch µs) -> serialized CM-CU over that day's user_id
    stream}: ONE groupby(day).aggregate(SketchAgg) pass. Shared by
    windowed_heavy_users (window probe) and its pytest (est >= exact
    bound)."""
    from ..pipelines.relational import _read
    from ..stages.agg import SketchAgg

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    day_states = (
        ds.map_batches(lambda b: pa.table(
            {"day": pc.floor_temporal(b["ts"].combine_chunks(), unit="day"),
             "user_id": b["user_id"]}),
            batch_format="pyarrow", batch_size=32768)
        .groupby("day")
        .aggregate(SketchAgg(
            SketchSpec("u", "cmcu", "user_id", mode="column",
                       params={"width": int(width), "depth": int(depth),
                               "seed": int(seed)}),
            alias_name="state", finalize="bytes"))
    ).to_pandas()
    return {int(d.astype("datetime64[us]").astype(np.int64)): s
            for d, s in zip(day_states["day"].to_numpy("datetime64[us]"),
                            day_states["state"])}
