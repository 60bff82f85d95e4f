"""Exact distributed pipelines with DuckDB-oracle-checkable outputs.

These are the correctness gate: every query here has a matching ANSI-SQL
string in ``__ray_entry__.oracle_sql`` producing identical rows (names,
schema, values). They double as the exact-verification half of the sketch
pipelines (the reference validates sketches against exact scans the same way
— SURVEY.md §5).

Scale pattern used throughout: per-batch ``value_counts`` pre-aggregation
inside ``map_batches`` (hot keys → one row per batch), then a ``groupby``
over the *partial counts*, never over raw rows (SURVEY.md §4 skew row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Min, Sum

from ..stages.tokenize import flat_tokens, ngram_counts, token_counts
from ._util import ensure_columns, n_reducers, round6


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _token_partials(batch: pa.Table) -> pa.Table:
    keys, counts = token_counts(batch["text"])
    return pa.table(
        {
            "token": keys.cast(pa.large_string()),
            "partial": pa.array(counts, pa.int64()),
        }
    )


def token_counts_ds(sf_dir: str, n_salt: int | None = None):
    """Distributed exact token counts with SALTED two-level aggregation
    (SURVEY.md §7.3 skew handling):

    1. batch-local value_counts → one (token, partial) row per token per
       batch (a token with 10^9 occurrences costs one row per batch);
    2. groupby((token, salt)) where salt is a deterministic per-batch value
       — a hot token's partial rows spread over ≤ n_salt reducers instead
       of landing on one (at 10^12 docs a single hot key would otherwise
       send every batch's row to the same reducer);
    3. groupby(token) over the ≤ n_salt subtotal rows per token.

    ``n_salt`` defaults to ``_util.default_n_salt()`` (the cluster-sized
    rule); the per-batch salt derivation is the shared
    ``_util.batch_salt`` (one source of truth with every other salted
    count pipeline)."""
    from ._util import batch_salt, default_n_salt

    if n_salt is None:
        n_salt = default_n_salt()
    ds = _read(sf_dir, "documents", ["text"])

    def partials_salted(batch: pa.Table) -> pa.Table:
        t = _token_partials(batch)
        total = int(pc.sum(t["partial"]).as_py() or 0)
        salt = batch_salt(total, t.num_rows, n_salt)
        return t.append_column("salt", pa.array(np.full(t.num_rows, salt), pa.int64()))

    partials = ds.map_batches(partials_salted, batch_format="pyarrow", batch_size=8192)
    sub = partials.groupby(["token", "salt"]).aggregate(Sum("partial", alias_name="sub"))
    return sub.groupby("token").aggregate(Sum("sub", alias_name="cnt"))


def top_tokens(sf_dir: str, k: int = 20) -> pa.Table:
    """Exact top-k tokens, deterministic tie-break (cnt desc, token asc)."""
    counts = token_counts_ds(sf_dir)
    df = counts.to_pandas()  # vocab-sized, small by construction
    df = df.sort_values(["cnt", "token"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def vocab_coverage(sf_dir: str, v: int = 500) -> pa.Table:
    """Top-``v`` vocabulary with cumulative corpus coverage — the standard
    tokenizer-prep measurement (what OOV rate does a V-entry vocab leave?).
    One salted distributed count (``token_counts_ds``); the driver sees
    only vocab-sized rows, sorts (cnt desc, token asc), and emits
    (rank, token, cnt, cum_frac) where cum_frac = cumulative count /
    total token occurrences, rounded 6dp. 1 - cum_frac at rank V is the
    OOV mass a V-entry vocabulary leaves uncovered."""
    counts = token_counts_ds(sf_dir)
    df = counts.to_pandas()  # vocab-sized, small by construction
    total = int(df["cnt"].sum())
    df = df.sort_values(["cnt", "token"], ascending=[False, True]).head(v)
    df = df.reset_index(drop=True)
    df.insert(0, "rank", np.arange(1, len(df) + 1, dtype=np.int64))
    df["cum_frac"] = round6(df["cnt"].cumsum().to_numpy(np.int64) / max(total, 1))
    return pa.Table.from_pandas(df, preserve_index=False)


def heavy_hitter_tokens(sf_dir: str, rel_threshold: float = 0.02) -> pa.Table:
    """Exact heavy hitters via the two-pass sketch pipeline
    (pipelines/heavy_hitters.py): CM-CU candidates then exact verification.
    Threshold = rel_threshold × total token count (scale-invariant)."""
    import ray.data as rd

    from ..stages.sketch_build import SketchSpec
    from .heavy_hitters import heavy_hitters

    ds = _read(sf_dir, "documents", ["text"])
    total = ds.map_batches(
        lambda b: pa.table({"n": pa.array([pc.sum(pc.list_value_length(pc.split_pattern(b["text"].combine_chunks(), " "))).as_py()], pa.int64())}),
        batch_format="pyarrow",
        batch_size=8192,
    ).sum("n")
    threshold = int(np.ceil(rel_threshold * total))
    spec = SketchSpec("hh", "cmcu", "text", mode="tokens", params={"width": 1 << 14, "seed": 42})
    out = heavy_hitters(_read(sf_dir, "documents", ["text"]), spec, threshold)
    df = out.to_pandas()
    if "token" not in df.columns:  # empty result drops its schema
        df = pd.DataFrame({"token": pd.Series([], dtype=str), "cnt": pd.Series([], dtype="int64")})
    df = df.sort_values("token").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def emerging_tokens(sf_dir: str, rel_threshold: float = 0.01, growth: int = 2) -> pa.Table:
    """The reference's flagship emerging-heavy-hitter pipeline
    (src/sketch.cpp:48-289) over a deterministic snapshot split: test corpus =
    long documents (n_chars >= 300), control = the rest. A token is *emerging*
    iff its exact test count >= threshold AND
    floor(test_cnt / growth) - control_cnt > 0 (scale src/sketch.cpp:179-183,
    probe src/sketch.cpp:222-227, prune src/sketch.cpp:238-245).
    Returns (token, test_cnt, control_cnt)."""
    from ..stages.sketch_build import SketchSpec
    from .heavy_hitters import emerging_heavy_hitters

    def side(is_test: bool):
        def pick(batch: pa.Table) -> pa.Table:
            long_doc = pc.greater_equal(batch["n_chars"].combine_chunks(), 300)
            keep = long_doc if is_test else pc.invert(long_doc)
            return batch.filter(keep).select(["text"])

        return _read(sf_dir, "documents", ["n_chars", "text"]).map_batches(
            pick, batch_format="pyarrow", batch_size=8192
        )

    total = side(True).map_batches(
        lambda b: pa.table({"n": pa.array([pc.sum(pc.list_value_length(pc.split_pattern(b["text"].combine_chunks(), " "))).as_py() or 0], pa.int64())}),
        batch_format="pyarrow", batch_size=8192,
    ).sum("n")
    threshold = max(1, int(np.ceil(rel_threshold * total)))
    spec = SketchSpec("em", "cmcu", "text", mode="tokens", params={"width": 1 << 14, "seed": 42})
    out = emerging_heavy_hitters(side(True), side(False), spec, threshold, growth=growth)
    out = out.sort_values("token").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def bigram_counts_min(sf_dir: str, min_cnt: int = 25) -> pa.Table:
    """Exact word-bigram counts ≥ min_cnt (multi-length n-gram operator M3)."""
    ds = _read(sf_dir, "documents", ["text"])

    def partials(batch: pa.Table) -> pa.Table:
        keys, counts = ngram_counts(batch["text"], (2,))
        return pa.table(
            {"bigram": keys.cast(pa.large_string()), "partial": pa.array(counts, pa.int64())}
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .groupby("bigram")
        .aggregate(Sum("partial", alias_name="cnt"))
    )
    df = agg.to_pandas()
    df = df[df["cnt"] >= min_cnt].sort_values("bigram").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def tokens_per_lang_over(ds) -> pa.Table:
    """The ``tokens_per_lang`` fold over an already-open Dataset with
    (text, lang) columns — shared by the parquet query and the
    JSONL-round-trip twin (``sources/textio.py``), so the transport
    parity gate exercises the SAME fold, not a copy."""

    def partials(batch: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(pc.split_pattern(batch["text"].combine_chunks(), " "))
        t = pa.table({"lang": batch["lang"], "ntok": ntok.cast(pa.int64())})
        g = t.group_by("lang").aggregate([("ntok", "sum")])
        return g.rename_columns(["lang", "partial"])

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .groupby("lang")
        .aggregate(Sum("partial", alias_name="n_tokens"))
    )
    df = agg.to_pandas().sort_values("lang").reset_index(drop=True)
    return pa.Table.from_pandas(df[["lang", "n_tokens"]], preserve_index=False)


def tokens_per_lang(sf_dir: str) -> pa.Table:
    """Total token count per language (groupby over per-batch partial sums)."""
    return tokens_per_lang_over(_read(sf_dir, "documents", ["text", "lang"]))


def distinct_sources_per_lang(sf_dir: str) -> pa.Table:
    """Exact count(distinct source) per lang: batch-local dedup →
    global dedup groupby → count (A5/A6 distinct operators)."""
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def local_dedup(batch: pa.Table) -> pa.Table:
        return batch.group_by(["lang", "source"]).aggregate([])

    pairs = ds.map_batches(local_dedup, batch_format="pyarrow", batch_size=8192)
    uniq = pairs.groupby(["lang", "source"]).aggregate(Count(alias_name="_c"))
    agg = uniq.groupby("lang").aggregate(Count(alias_name="n_sources"))
    df = agg.to_pandas().sort_values("lang").reset_index(drop=True)
    return pa.Table.from_pandas(df[["lang", "n_sources"]], preserve_index=False)


def doc_token_stats(sf_dir: str) -> pa.Table:
    """Per-document token count + char count (text-analysis: token counting).
    Exact, SQL-checkable; vectorized utf8 kernels only."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        ntok = pc.list_value_length(pc.split_pattern(text, " ")).cast(pa.int64())
        nchr = pc.utf8_length(text).cast(pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": ntok, "n_chars_computed": nchr})

    out = ds.map_batches(stats, batch_format="pyarrow", batch_size=8192)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def len_histogram(sf_dir: str) -> pa.Table:
    """Exact histogram of n_chars (the bounded-cardinality exact-quantile
    base; groupby over a numeric key)."""
    ds = _read(sf_dir, "documents", ["n_chars"])

    def partials(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["n_chars"].combine_chunks())
        return pa.table({"n_chars": vc.field("values"),
                         "partial": vc.field("counts").cast(pa.int64())})

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=65536)
        .groupby("n_chars")
        .aggregate(Sum("partial", alias_name="cnt"))
    )
    df = ensure_columns(agg.to_pandas(), {"n_chars": "int64", "cnt": "int64"})
    df = df.sort_values("n_chars").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def quantiles_exact(sf_dir: str) -> pa.Table:
    """EXACT quantiles of n_chars from the distributed histogram
    (quantile_disc semantics: smallest value with cum_count ≥ ceil(q·n))."""
    hist = len_histogram(sf_dir).to_pandas()
    values = hist["n_chars"].to_numpy()
    cum = hist["cnt"].to_numpy().cumsum()
    n = int(cum[-1])
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    out_v = []
    for q in qs:
        target = int(np.ceil(q * n))
        idx = int(np.searchsorted(cum, max(target, 1)))
        out_v.append(int(values[min(idx, len(values) - 1)]))
    return pa.table({"q": pa.array(qs, pa.float64()), "value": pa.array(out_v, pa.int64())})


def doc_length_deciles(sf_dir: str) -> pa.Table:
    """Global rank-bucketing WITHOUT a global sort: each document's length
    decile, computed from the distributed n_chars histogram (ties share a
    decile: decile = min(10, 10·|{n_chars < v}|/n + 1)). The scale pattern:
    an all-to-all sort would move every row; the histogram moves one row
    per distinct value, and the value→decile map broadcasts once for a
    streaming searchsorted assignment pass."""
    import ray

    from ..stages.broadcast import cached

    hist = len_histogram(sf_dir).to_pandas()  # distributed groupby inside
    values = hist["n_chars"].to_numpy(np.int64)
    cnt = hist["cnt"].to_numpy(np.int64)
    n = int(cnt.sum())
    cum_lt = np.concatenate([[0], cnt.cumsum()[:-1]])
    decile = np.minimum(10, 10 * cum_lt // max(n, 1) + 1).astype(np.int64)
    ref = ray.put((values, decile))

    def assign(batch: pa.Table) -> pa.Table:
        vals_s, dec_s = cached(ref)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(vals_s, nc)  # every value is in the histogram
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars": batch["n_chars"],
            "decile": pa.array(dec_s[np.minimum(pos, len(dec_s) - 1)], pa.int64()),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    df = ensure_columns(
        ds.map_batches(assign, batch_format="pyarrow", batch_size=65536).to_pandas(),
        {"doc_id": "int64", "n_chars": "int64", "decile": "int64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def grouped_quantiles_exact(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9),
                            force: str | None = None) -> pa.Table:
    """EXACT per-language quantiles of n_chars (quantile_disc semantics:
    smallest value with cum_count >= ceil(q*n), the quantiles_exact rule)
    from a distributed (lang, n_chars) histogram — the exact counterpart
    of grouped_sketch_stats' KLL median.

    Scale shape: the histogram is group-BOUNDED (n_langs x distinct
    lengths rows, independent of corpus size), so the cumulative quantile
    selection is one vectorized driver pass; the histogram fold is
    adaptive (driver below _SMALL_ROWS, distributed groupby above —
    ``force``="driver"/"distributed" pins the branch for tests)."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    n = ds.count()  # parquet-metadata count: no scan

    def local(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n_chars", "partial"])

    parts = ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
    small = (n < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"lang": "object", "n_chars": "int64",
                              "partial": "int64"})  # empty corpus: typed empty
        hist = pdf.groupby(["lang", "n_chars"], as_index=False) \
            .agg(cnt=("partial", "sum"))
    else:
        # spread before the sort-shuffle groupby (few-block pathology)
        hist = ensure_columns(
            parts.repartition(n_reducers()).groupby(["lang", "n_chars"])
            .aggregate(Sum("partial", alias_name="cnt")).to_pandas(),
            {"lang": "object", "n_chars": "int64", "cnt": "int64"})
    hist = hist.sort_values(["lang", "n_chars"]).reset_index(drop=True)
    rows = []
    for lang, sub in hist.groupby("lang", sort=True):  # n_langs iterations
        values = sub["n_chars"].to_numpy()
        cum = sub["cnt"].to_numpy().cumsum()
        ntot = int(cum[-1])
        for q in qs:
            target = max(int(np.ceil(q * ntot)), 1)
            idx = int(np.searchsorted(cum, target))
            rows.append((lang, float(q), int(values[min(idx, len(values) - 1)])))
    out = pd.DataFrame(rows, columns=["lang", "q", "value"]).astype(
        {"lang": "object", "q": "float64", "value": "int64"})
    out = out.sort_values(["lang", "q"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def top_token_per_lang(sf_dir: str, k: int = 3) -> pa.Table:
    """Grouped top-k: the k most frequent tokens per language (exact,
    deterministic ties by token). Per-batch (lang, token) pre-aggregation ->
    groupby sum -> per-lang top-k on the driver over the vocab-sized result
    (at open-vocabulary scale the last step becomes
    groupby(lang).map_groups(top-k), same semantics)."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].combine_chunks()
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        lang_rep = lang.take(pa.array(np.repeat(np.arange(len(lang)), ntok)))
        t = pa.table({"lang": lang_rep, "token": flat})
        g = t.group_by(["lang", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "token", "partial"])

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .groupby(["lang", "token"])
        .aggregate(Sum("partial", alias_name="cnt"))
    )
    df = agg.to_pandas()
    df = df.sort_values(["lang", "cnt", "token"], ascending=[True, False, True])
    out = df.groupby("lang", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("lang").cumcount() + 1
    return pa.Table.from_pandas(out[["lang", "rank", "token", "cnt"]], preserve_index=False)


def users_without_orders(sf_dir: str) -> pa.Table:
    """Broadcast ANTI-join: event users with no URGENT customer order
    (user_id not in the urgent-order custkeys). The small side's key set
    broadcasts once; the fact side filters per batch — no shuffle. Returns
    (user_id, n_events)."""
    import pyarrow.dataset as pads
    import ray

    # predicate-pushdown read: only the key column of URGENT-admitting row
    # groups materializes on the driver
    keys = pads.dataset(f"{sf_dir}/orders.parquet").to_table(
        columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT")
    custkeys = pa.array(np.unique(keys.column("o_custkey").to_numpy()), pa.int64())
    ref = ray.put(custkeys)

    def anti(batch: pa.Table) -> pa.Table:
        from ..stages.broadcast import cached

        keys_w = cached(ref)
        keep = pc.invert(pc.is_in(batch["user_id"], value_set=keys_w))
        sub = batch.filter(keep)
        g = sub.group_by("user_id").aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "partial"])

    agg = (
        _read(sf_dir, "events", ["user_id"])
        .map_batches(anti, batch_format="pyarrow", batch_size=32768)
        .groupby("user_id")
        .aggregate(Sum("partial", alias_name="n_events"))
    )
    df = agg.to_pandas()
    if "user_id" not in df.columns:
        df = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                           "n_events": pd.Series([], dtype="int64")})
    df = df.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df[["user_id", "n_events"]], preserve_index=False)


_SMALL_ROWS = 2_000_000  # below this a distributed groupby is pure overhead


def events_per_type(sf_dir: str) -> pa.Table:
    """Event counts + distinct users per event type.

    Adaptive plan (the r2 verdict flagged the two chained Ray groupbys as
    this query's regression): per-batch (type, user) pre-aggregation always
    runs distributed; below _SMALL_ROWS the partial pair rows fold in one
    driver pass (bounded by distinct pairs per batch), above it the original
    two-level distributed groupby runs, spread to 32 blocks first (the
    measured sort-groupby-on-few-blocks pathology)."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return events_per_type_over(ds, ds.count())  # metadata count: no scan


def events_per_type_over(ds, n: int) -> pa.Table:
    """The ``events_per_type`` fold over an already-open Dataset with
    (event_type, user_id) columns and a known row count — shared by the
    parquet query and the CSV-round-trip twin (``sources/textio.py``),
    adaptive branch included."""

    def local(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "user_id", "partial"])

    pairs = ds.map_batches(local, batch_format="pyarrow", batch_size=16384)
    if n < _SMALL_ROWS:
        pdf = pairs.to_pandas()
        per_user = pdf.groupby(["event_type", "user_id"], as_index=False)["partial"].sum()
        df = (per_user.groupby("event_type", as_index=False)
              .agg(n_users=("user_id", "size"), n_events=("partial", "sum")))
    else:
        per_user = (pairs.repartition(n_reducers()).groupby(["event_type", "user_id"])
                    .aggregate(Sum("partial", alias_name="cnt")))
        agg = per_user.groupby("event_type").aggregate(
            Count(alias_name="n_users"), Sum("cnt", alias_name="n_events")
        )
        df = agg.to_pandas()
    df = df.sort_values("event_type").reset_index(drop=True)
    return pa.Table.from_pandas(df[["event_type", "n_users", "n_events"]], preserve_index=False)


def props_field_stats(sf_dir: str, force: str | None = None) -> pa.Table:
    """Semi-structured extraction: pull the integer field ``k`` out of the
    JSON ``props`` column with one vectorized RE2 kernel
    (``pc.extract_regex`` — no per-row JSON parsing) and aggregate per
    event type: event count, sum and max of k, count of rows where the
    field is absent/malformed (extraction misses count as n_missing and
    contribute nothing to sum/max).

    Adaptive plan (house rule, branches pinned equal by pytest): per-batch
    partial aggregation always runs distributed (5-type rows per batch);
    below _SMALL_ROWS input rows the partials fold on the driver, above
    it one distributed groupby(event_type) over the tiny partial rows."""
    ds = _read(sf_dir, "events", ["event_type", "props"])
    n = ds.count()  # parquet-metadata count: no scan

    def local(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.if_else(pc.is_valid(m), pc.struct_field(m, "k"), None)
        k = k.cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"], "k": k})
        g = t.group_by("event_type").aggregate(
            [("k", "count"), ("k", "sum"), ("k", "max"), ([], "count_all")])
        g = g.rename_columns(["event_type", "n_k", "sum_k", "max_k", "n_events"])
        return g

    parts = ds.map_batches(local, batch_format="pyarrow", batch_size=16384)
    small = (n < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = parts.to_pandas()
        df = pdf.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"), sum_k=("sum_k", "sum"),
            max_k=("max_k", "max"), n_k=("n_k", "sum"))
    else:
        from ray.data.aggregate import Max

        agg = parts.groupby("event_type").aggregate(
            Sum("n_events", alias_name="n_events"), Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"), Sum("n_k", alias_name="n_k"))
        df = agg.to_pandas()
    df["n_missing"] = df["n_events"] - df["n_k"]
    df = df.sort_values("event_type").reset_index(drop=True)
    df = df[["event_type", "n_events", "sum_k", "max_k", "n_missing"]]
    return pa.Table.from_pandas(
        df.astype({"n_events": "int64", "sum_k": "int64", "max_k": "int64",
                   "n_missing": "int64"}), preserve_index=False)


def heavy_users(sf_dir: str, rel_threshold: float = 0.002) -> pa.Table:
    """Heavy-hitter user_ids in events via the CM-CU two-pass pipeline over an
    int key column."""
    import ray.data as rd

    from ..stages.sketch_build import SketchSpec
    from .heavy_hitters import heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    n = ds.count()
    threshold = max(2, int(np.ceil(rel_threshold * n)))

    def to_str(batch: pa.Table) -> pa.Table:
        return pa.table({"user_key": batch["user_id"].cast(pa.string())})

    sds = _read(sf_dir, "events", ["user_id"]).map_batches(to_str, batch_format="pyarrow", batch_size=16384)
    spec = SketchSpec("hu", "cmcu", "user_key", mode="column", params={"width": 1 << 14, "seed": 42})
    out = heavy_hitters(sds, spec, threshold)
    df = out.to_pandas()
    if "token" not in df.columns:  # empty result drops its schema
        df = pd.DataFrame({"token": pd.Series([], dtype=str), "cnt": pd.Series([], dtype="int64")})
    df["user_id"] = df["token"].astype("int64")
    df = df[["user_id", "cnt"]].sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def source_profile(sf_dir: str, force: str | None = None) -> pa.Table:
    """Per-source corpus profile — the statistics table mixture weights are
    chosen from (and `upsample_mix` / `stratified_sample` consume): doc
    count, token count, mean chars, distinct languages, and the fraction
    of docs that are exact duplicates of ANY doc corpus-wide.

    Two streaming passes, all state group- or dup-bounded:
    1. hash pass: per-batch (text_hash, count) partials; adaptive fold
       (driver bincount below ``_SMALL_ROWS`` docs, else a distributed
       groupby with only count ≥ 2 survivors pulled); the dup-hash set
       broadcasts once (dedup discipline — sized by duplicated content).
    2. profile pass: per-batch per-source partials — sums + searchsorted
       dup mark + DISTINCT (source, lang) pairs, fused into ONE pass; the
       group-bounded fold is adaptive the same way (per-batch partial
       rows grow with batch count at 100 TB, so the distributed groupby
       takes over above the threshold).
    The single float op (sum_chars/n_docs) mirrors the oracle's division.
    ``force`` pins the fold branch ("driver"/"distributed") for tests."""
    import ray

    from ..kernels.hashing import hash_arrow_strings
    from ..stages.broadcast import cached

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")

    def hash_partials(batch: pa.Table) -> pa.Table:
        h = hash_arrow_strings(batch["text"], seed=1).view(np.int64)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"g": pa.array(uniq, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    partials = ds.map_batches(hash_partials, batch_format="pyarrow", batch_size=8192)
    if small:
        pdf = ensure_columns(partials.to_pandas(), {"g": "int64", "c": "int64"})
        uniq, inv = np.unique(pdf["g"].to_numpy(), return_inverse=True)
        tot = np.bincount(inv, weights=pdf["c"].to_numpy())
        dup = uniq[tot >= 2]
    else:
        counts = (partials.repartition(n_reducers()).groupby("g")
                  .aggregate(Sum("c", alias_name="cnt")))
        dup_df = ensure_columns(counts.filter(expr="cnt >= 2").to_pandas(),
                                {"g": "int64"})
        dup = np.sort(dup_df["g"].to_numpy())
    ref = ray.put(np.ascontiguousarray(dup, dtype=np.int64))

    def profile_partials(batch: pa.Table) -> pa.Table:
        hs = cached(ref)
        h = hash_arrow_strings(batch["text"], seed=1).view(np.int64)
        if len(hs) and len(h):
            pos = np.minimum(np.searchsorted(hs, h), len(hs) - 1)
            is_dup = (hs[pos] == h).astype(np.int64)
        else:
            is_dup = np.zeros(len(h), np.int64)
        ntok = pc.list_value_length(pc.split_pattern(
            batch["text"].combine_chunks(), " ")).cast(pa.int64())
        t = pa.table({
            "source": batch["source"], "lang": batch["lang"],
            "one": pa.array(np.ones(len(h), np.int64)),
            "ntok": ntok,
            "nchr": pc.utf8_length(batch["text"].combine_chunks()).cast(pa.int64()),
            "dup": pa.array(is_dup, pa.int64()),
        })
        g = t.group_by(["source", "lang"]).aggregate(
            [("one", "sum"), ("ntok", "sum"), ("nchr", "sum"), ("dup", "sum")])
        return g.rename_columns(["source", "lang", "n", "ntok", "nchr", "ndup"])

    pair_partials = ds.map_batches(profile_partials, batch_format="pyarrow",
                                   batch_size=8192)
    if small:
        ppdf = ensure_columns(
            pair_partials.to_pandas(),
            {"source": "object", "lang": "object", "n": "int64",
             "ntok": "int64", "nchr": "int64", "ndup": "int64"})
        by_pair = ppdf.groupby(["source", "lang"], as_index=False).sum()
    else:
        by_pair = (
            pair_partials.repartition(n_reducers()).groupby(["source", "lang"])
            .aggregate(Sum("n", alias_name="n"), Sum("ntok", alias_name="ntok"),
                       Sum("nchr", alias_name="nchr"), Sum("ndup", alias_name="ndup"))
        ).to_pandas()
    prof = by_pair.groupby("source", as_index=False).agg(
        n_docs=("n", "sum"), n_tokens=("ntok", "sum"),
        sum_chars=("nchr", "sum"), n_dup=("ndup", "sum"),
        n_langs=("lang", "nunique"))

    df = prof
    df = df.sort_values("source").reset_index(drop=True)
    return pa.table({
        "source": pa.array(df["source"], pa.string()),
        "n_docs": pa.array(df["n_docs"].to_numpy(np.int64), pa.int64()),
        "n_tokens": pa.array(df["n_tokens"].to_numpy(np.int64), pa.int64()),
        "avg_chars": pa.array(
            round6(df["sum_chars"].to_numpy(np.float64)
                   / df["n_docs"].to_numpy(np.float64)), pa.float64()),
        "n_langs": pa.array(df["n_langs"].to_numpy(np.int64), pa.int64()),
        "dup_doc_frac": pa.array(
            round6(df["n_dup"].to_numpy(np.float64)
                   / df["n_docs"].to_numpy(np.float64)), pa.float64()),
    })


def pmi_collocations(sf_dir: str, min_cnt: int = 25, k: int = 20) -> pa.Table:
    """Top-k collocations by pointwise mutual information — the classic
    phrase-mining / tokenizer-merge-candidate measurement:
    pmi(x,y) = ln( (c_xy/N2) / ((c_x/N1)·(c_y/N1)) ) over bigrams with
    c_xy >= min_cnt.

    Two distributed count passes this engine already owns (salted unigram
    counts + bigram groupby); the driver combines only count-bounded
    tables (qualifying bigrams × vocab lookup). N2 = N1 − n_docs (windows
    never cross docs; every doc has ≥ 1 token). Float ops in exactly the
    oracle's order; ranked on the 6dp-rounded pmi, bigram-asc tie-break.
    Returns (rank, bigram, cnt, pmi)."""
    # reuse the oracle-gated bigram count pass verbatim (one implementation)
    big = bigram_counts_min(sf_dir, min_cnt=min_cnt).to_pandas() \
        .reset_index(drop=True)

    uni = token_counts_ds(sf_dir).to_pandas()  # vocab-sized by construction
    cmap = dict(zip(uni["token"], uni["cnt"].astype(np.int64)))
    n1 = float(uni["cnt"].sum())
    n2 = n1 - float(_read(sf_dir, "documents", ["doc_id"]).count())

    parts = big["bigram"].str.split(" ", n=1, expand=True) if len(big) else None
    if len(big):
        cx = parts[0].map(cmap).to_numpy(np.float64)
        cy = parts[1].map(cmap).to_numpy(np.float64)
        cxy = big["cnt"].to_numpy(np.float64)
        big["pmi"] = np.round(np.log((cxy / n2) / ((cx / n1) * (cy / n1))), 6)
    else:
        big["pmi"] = np.array([], np.float64)
    big = big.sort_values(["pmi", "bigram"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
    big.insert(0, "rank", np.arange(1, len(big) + 1, dtype=np.int64))
    return pa.Table.from_pandas(
        big.astype({"cnt": "int64"}), preserve_index=False)


def robust_length_stats(sf_dir: str, force: str | None = None) -> pa.Table:
    """Per-language ROBUST length statistics — median, MAD (median
    absolute deviation) and IQR of n_chars: the outlier-insensitive
    spread measures a quality pipeline thresholds on when means/stddevs
    are skew-poisoned.

    ONE streaming histogram pass (the grouped_quantiles_exact shape —
    group-bounded (lang, n_chars) rows, adaptive fold); median, the
    |v − med| deviation histogram, and IQR are all derived driver-side
    from that single histogram — the MAD needs NO second corpus pass
    because deviations of a histogram are a histogram transform.
    quantile_disc semantics throughout (smallest value with cum_count >=
    ceil(q·n)). Returns (lang, median, mad, iqr)."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    n = ds.count()

    def local(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n_chars", "partial"])

    parts = ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
    small = (n < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"lang": "object", "n_chars": "int64",
                              "partial": "int64"})
        hist = pdf.groupby(["lang", "n_chars"], as_index=False) \
            .agg(cnt=("partial", "sum"))
    else:
        hist = ensure_columns(
            parts.repartition(n_reducers()).groupby(["lang", "n_chars"])
            .aggregate(Sum("partial", alias_name="cnt")).to_pandas(),
            {"lang": "object", "n_chars": "int64", "cnt": "int64"})
    hist = hist.sort_values(["lang", "n_chars"]).reset_index(drop=True)

    def disc(values: np.ndarray, counts: np.ndarray, q: float) -> int:
        cum = counts.cumsum()
        target = max(int(np.ceil(q * int(cum[-1]))), 1)
        return int(values[min(int(np.searchsorted(cum, target)),
                              len(values) - 1)])

    rows = []
    for lang, sub in hist.groupby("lang", sort=True):  # n_langs iterations
        v = sub["n_chars"].to_numpy()
        c = sub["cnt"].to_numpy()
        med = disc(v, c, 0.5)
        dev = np.abs(v - med)
        order = np.argsort(dev, kind="stable")
        dv, dc = dev[order], c[order]
        # merge equal deviations (med±d collapse to one bin)
        uniq, inv = np.unique(dv, return_inverse=True)
        dcounts = np.bincount(inv, weights=dc).astype(np.int64)
        mad = disc(uniq, dcounts, 0.5)
        iqr = disc(v, c, 0.75) - disc(v, c, 0.25)
        rows.append((lang, med, mad, iqr))
    out = pd.DataFrame(rows, columns=["lang", "median", "mad", "iqr"]).astype(
        {"lang": "object", "median": "int64", "mad": "int64", "iqr": "int64"})
    out = out.sort_values("lang").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def rollup_doc_stats(sf_dir: str, force: str | None = None,
                     cube: bool = False) -> pa.Table:
    """GROUP BY ROLLUP(source, lang) — the grouping-sets operator class
    (subtotals + grand total in one result): doc and token counts at
    (source, lang), (source), and () granularity, rolled levels marked
    with the '<all>' sentinel (no NULL keys to hash). ``cube=True`` adds
    the (lang)-only grouping set — the full GROUP BY CUBE lattice.

    Scale shape: ONE streaming pass of (source, lang) partials — the
    FINEST level; every coarser level is a driver-side re-aggregation of
    the group-bounded finest table (n_sources × n_langs rows), so the
    rollup/cube costs nothing beyond the base groupby. Adaptive fold
    (``force``="driver"/"distributed")."""
    ds = _read(sf_dir, "documents", ["source", "lang", "text"])
    n = ds.count()

    def local(batch: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(pc.split_pattern(
            batch["text"].combine_chunks(), " ")).cast(pa.int64())
        t = pa.table({"source": batch["source"], "lang": batch["lang"],
                      "one": pa.array(np.ones(len(ntok), np.int64)),
                      "ntok": ntok})
        g = t.group_by(["source", "lang"]).aggregate(
            [("one", "sum"), ("ntok", "sum")])
        return g.rename_columns(["source", "lang", "n", "ntok"])

    parts = ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
    small = (n < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"source": "object", "lang": "object",
                              "n": "int64", "ntok": "int64"})
        fine = pdf.groupby(["source", "lang"], as_index=False).sum()
    else:
        fine = ensure_columns(
            parts.repartition(n_reducers()).groupby(["source", "lang"])
            .aggregate(Sum("n", alias_name="n"), Sum("ntok", alias_name="ntok"))
            .to_pandas(),
            {"source": "object", "lang": "object", "n": "int64", "ntok": "int64"})
    mid = fine.groupby("source", as_index=False)[["n", "ntok"]].sum() \
        .assign(lang="<all>")
    top = pd.DataFrame({"source": ["<all>"], "lang": ["<all>"],
                        "n": [fine["n"].sum()], "ntok": [fine["ntok"].sum()]})
    levels = [fine, mid, top]
    if cube:
        levels.append(fine.groupby("lang", as_index=False)[["n", "ntok"]]
                      .sum().assign(source="<all>"))
    out = pd.concat(levels, ignore_index=True)
    out = out.rename(columns={"n": "n_docs", "ntok": "n_tokens"})
    out = out[["source", "lang", "n_docs", "n_tokens"]] \
        .astype({"n_docs": "int64", "n_tokens": "int64"}) \
        .sort_values(["source", "lang"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def grouped_quantiles_cont(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9),
                           force: str | None = None) -> pa.Table:
    """EXACT per-language INTERPOLATED quantiles (quantile_cont semantics:
    value at zero-indexed position q·(n−1) of the sorted values, linearly
    interpolated) — completes the quantile-semantics family next to the
    disc form (grouped_quantiles_exact). Same one-histogram-pass scale
    shape; the interpolation v0 + frac·(v1−v0) runs driver-side on the
    group-bounded histogram with the float ops in the oracle's order,
    rounded 6dp."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    n = ds.count()

    def local(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n_chars", "partial"])

    parts = ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
    small = (n < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"lang": "object", "n_chars": "int64",
                              "partial": "int64"})
        hist = pdf.groupby(["lang", "n_chars"], as_index=False) \
            .agg(cnt=("partial", "sum"))
    else:
        hist = ensure_columns(
            parts.repartition(n_reducers()).groupby(["lang", "n_chars"])
            .aggregate(Sum("partial", alias_name="cnt")).to_pandas(),
            {"lang": "object", "n_chars": "int64", "cnt": "int64"})
    hist = hist.sort_values(["lang", "n_chars"]).reset_index(drop=True)

    rows = []
    for lang, sub in hist.groupby("lang", sort=True):
        v = sub["n_chars"].to_numpy().astype(np.float64)
        cum = sub["cnt"].to_numpy().cumsum()
        ntot = int(cum[-1])

        def at(j: int) -> float:  # value at zero-indexed sorted position j
            return float(v[min(int(np.searchsorted(cum, j + 1)), len(v) - 1)])

        for q in qs:
            p = q * (ntot - 1)
            lo = int(np.floor(p))
            frac = p - lo
            val = at(lo) if frac == 0.0 else at(lo) + frac * (at(lo + 1) - at(lo))
            rows.append((lang, float(q), round(val, 6)))
    out = pd.DataFrame(rows, columns=["lang", "q", "value"]).astype(
        {"lang": "object", "q": "float64", "value": "float64"})
    out = out.sort_values(["lang", "q"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def skipgram_counts(sf_dir: str, window: int = 3, min_cnt: int = 60) -> pa.Table:
    """Skip-gram co-occurrence counts — the word2vec / embedding-training
    statistic: ordered (left, right) token pairs within ``window``
    positions in the same document, counted corpus-wide, kept at
    cnt >= min_cnt.

    Per-batch: for each offset 1..window one vectorized slice-pair join
    (``binary_join_element_wise`` of the flat token array against its
    shifted self, doc-boundary pairs masked) + batch-local value_counts;
    one groupby over the pre-aggregated partials (pair-vocabulary-bounded
    rows move, never raw pairs). Returns (pair, cnt) sorted by pair."""
    ds = _read(sf_dir, "documents", ["text"])

    def partials(batch: pa.Table) -> pa.Table:
        flat, offsets = flat_tokens(batch["text"].combine_chunks())
        n = len(flat)
        doc_index = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        out = []
        for off in range(1, window + 1):
            if n <= off:
                continue
            valid = doc_index[:-off] == doc_index[off:]
            left = flat.slice(0, n - off).filter(pa.array(valid))
            right = flat.slice(off, n - off).filter(pa.array(valid))
            pairs = pc.binary_join_element_wise(
                left.cast(pa.large_string()), right.cast(pa.large_string()),
                pa.scalar(" ", pa.large_string()))
            out.append(pairs)
        if not out:
            return pa.table({"pair": pa.array([], pa.large_string()),
                             "partial": pa.array([], pa.int64())})
        vc = pc.value_counts(pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in out]))
        return pa.table({"pair": vc.field("values"),
                         "partial": vc.field("counts").cast(pa.int64())})

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .groupby("pair")
        .aggregate(Sum("partial", alias_name="cnt"))
    )
    df = ensure_columns(agg.to_pandas(), {"pair": "object", "cnt": "int64"})
    df = df[df["cnt"] >= min_cnt].sort_values("pair").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _parquet_column_max(path: str, col: str) -> int:
    """Column max from parquet row-group statistics (shared walk in
    ``_util.parquet_minmax`` — see its docstring for the rationale)."""
    from ._util import parquet_minmax

    return int(parquet_minmax(path, col)[1])

def gram_novelty_curve(sf_dir: str, n: int = 3, n_buckets: int = 10,
                       force: str | None = None) -> pa.Table:
    """Vocabulary-growth (Heaps-law) curve over word ``n``-grams: split the
    corpus into ``n_buckets`` equal doc_id ranges and count, per bucket,
    the grams whose FIRST occurrence (minimum doc_id) falls there — the
    measurement behind "is more data still buying new patterns?" (unigram
    vocabularies saturate almost immediately; higher-order grams keep
    growing, which is exactly what the curve shows).

    One streaming pass emits per-batch (gram-hash, min doc_id) partials —
    gram-vocab-bounded per batch regardless of frequency — folded
    adaptively: driver min-fold below _SMALL_ROWS docs, else a distributed
    groupby(hash).Min (per-batch pre-aggregation leaves ≤ one row per gram
    per batch, and a Min has no hot-key pile-up to salt). The gram key is
    a 64-bit polynomial combine of the per-token hashes (the curve needs
    only COUNTS per bucket, never the gram text — the same hash-keyed-fold
    exactness contract as the dup-span/jaccard folds: exact absent a
    64-bit collision). Gram strings are never materialized, which is what
    makes this a one-narrow-pass operator at 100 TB. Windows never cross
    document boundaries (same mask as stages/tokenize.ngrams; reference
    src/sketch.cpp:103-171 sliding window). Buckets come from the closed
    formula (first_doc · n_buckets) // (max_doc + 1) — no density
    assumption on doc_id. Returns (bucket, new_grams, cum_vocab) sorted
    by bucket; empty buckets emit no row (matching SQL GROUP BY)."""
    from ray.data.aggregate import Min

    from ..kernels.hashing import hash_arrow_strings
    from ..stages.tokenize import flat_tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    max_doc = _parquet_column_max(f"{sf_dir}/documents.parquet", "doc_id")
    B = np.uint64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2^64

    def firsts(batch: pa.Table) -> pa.Table:
        flat, offsets = flat_tokens(batch["text"].combine_chunks())
        row = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        th = hash_arrow_strings(flat, seed=42)
        if n <= 1:
            gh, grow = th, row
        else:
            m = len(th) - n + 1
            if m <= 0:
                return pa.table({"gram": pa.array([], pa.uint64()),
                                 "first_doc": pa.array([], pa.int64())})
            valid = row[:m] == row[n - 1:]
            gh = th[:m].copy()
            for j in range(1, n):  # Horner: h = h*B + th_j (mod 2^64)
                gh = gh * B + th[j:j + m]
            gh, grow = gh[valid], row[:m][valid]
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)[grow]
        # per-batch min-fold in numpy: sort by (hash, doc), keep first per run
        order = np.lexsort((doc, gh))
        gs, ds_ = gh[order], doc[order]
        head = np.ones(len(gs), bool)
        head[1:] = gs[1:] != gs[:-1]
        return pa.table({"gram": pa.array(gs[head], pa.uint64()),
                         "first_doc": pa.array(ds_[head], pa.int64())})

    partials = ds.map_batches(firsts, batch_format="pyarrow", batch_size=4096)
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        gh = np.empty(0, np.uint64)
        fdoc = np.empty(0, np.int64)
        for b in partials.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
            gh = np.concatenate([gh, b["gram"].to_numpy(zero_copy_only=False)])
            fdoc = np.concatenate([fdoc, b["first_doc"].to_numpy(zero_copy_only=False)])
        order = np.lexsort((fdoc, gh))
        gs, ds_ = gh[order], fdoc[order]
        head = np.ones(len(gs), bool)
        head[1:] = gs[1:] != gs[:-1]
        fd = ds_[head]
    else:
        agg = (partials.repartition(n_reducers()).groupby("gram")
               .aggregate(Min("first_doc", alias_name="first_doc")))

        def bucket_partials(batch: pa.Table) -> pa.Table:
            f = batch["first_doc"].to_numpy(zero_copy_only=False)
            b = (f * n_buckets) // (max_doc + 1)
            ub, cnt = np.unique(b, return_counts=True)
            return pa.table({"bucket": pa.array(ub, pa.int64()),
                             "partial": pa.array(cnt, pa.int64())})

        t = ensure_columns(
            agg.map_batches(bucket_partials, batch_format="pyarrow",
                            batch_size=65536).to_pandas(),
            {"bucket": "int64", "partial": "int64"})
        g = t.groupby("bucket")["partial"].sum().sort_index()
        new = g.to_numpy(np.int64)
        return pa.table({"bucket": pa.array(g.index.to_numpy(np.int64), pa.int64()),
                         "new_grams": pa.array(new, pa.int64()),
                         "cum_vocab": pa.array(np.cumsum(new), pa.int64())})
    b = (fd * n_buckets) // (max_doc + 1)
    ub, cnt = np.unique(b, return_counts=True)
    return pa.table({"bucket": pa.array(ub, pa.int64()),
                     "new_grams": pa.array(cnt, pa.int64()),
                     "cum_vocab": pa.array(np.cumsum(cnt), pa.int64())})


def trimmed_mean_lengths(sf_dir: str, lo_q: float = 0.1, hi_q: float = 0.9,
                         force: str | None = None) -> pa.Table:
    """Per-language TRIMMED mean of n_chars — the robust location estimate
    a quality threshold actually wants (the plain mean is dragged by the
    boilerplate tail the filters exist to remove). Keep values between the
    lo_q and hi_q discrete quantiles (inclusive; quantile_disc ceil-rule
    cut points, the grouped_quantiles_exact precedent) and average them.

    Same scale shape as grouped_quantiles_exact: ONE adaptive
    (lang, n_chars) histogram fold — group-bounded, corpus-size
    independent — then a vectorized driver pass computes cut points AND
    the trimmed mean from the same histogram (Σ v·c / Σ c over the kept
    band, integer-exact). Returns (lang, n_kept, trimmed_mean) sorted by
    lang, mean rounded 6dp half-away."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    n = ds.count()

    def local(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n_chars", "partial"])

    parts = ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
    small = (n < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"lang": "object", "n_chars": "int64",
                              "partial": "int64"})
        hist = pdf.groupby(["lang", "n_chars"], as_index=False) \
            .agg(cnt=("partial", "sum"))
    else:
        hist = ensure_columns(
            parts.repartition(n_reducers()).groupby(["lang", "n_chars"])
            .aggregate(Sum("partial", alias_name="cnt")).to_pandas(),
            {"lang": "object", "n_chars": "int64", "cnt": "int64"})
    hist = hist.sort_values(["lang", "n_chars"]).reset_index(drop=True)
    rows = []
    for lang, sub in hist.groupby("lang", sort=True):
        values = sub["n_chars"].to_numpy(np.int64)
        cnt = sub["cnt"].to_numpy(np.int64)
        cum = cnt.cumsum()
        ntot = int(cum[-1])
        def cut(q):
            target = max(int(np.ceil(q * ntot)), 1)
            return values[min(int(np.searchsorted(cum, target)), len(values) - 1)]
        lo, hi = cut(lo_q), cut(hi_q)
        keep = (values >= lo) & (values <= hi)
        n_kept = int(cnt[keep].sum())
        mean = float((values[keep] * cnt[keep]).sum()) / n_kept if n_kept else 0.0
        rows.append((lang, n_kept, float(round6(mean))))
    out = pd.DataFrame(rows, columns=["lang", "n_kept", "trimmed_mean"]).astype(
        {"lang": "object", "n_kept": "int64", "trimmed_mean": "float64"})
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def corpus_checksum(sf_dir: str, seed: int = 42) -> pa.Table:
    """Order-invariant corpus checksum — the integrity primitive a
    resumable 100-TB pipeline runs after every reshard / rewrite /
    restore: mod-2^64 SUM over documents of
    ``string_hash(text, 1) XOR splitmix64(doc_id ^ mix(seed))``.
    Binding the content hash to the doc_id detects row swaps and
    duplications, not just content edits; the commutative sum makes the
    checksum independent of partitioning, block order and parallelism —
    two shardings of the same corpus agree byte-for-byte, any single
    changed/missing/duplicated row changes the value.

    One streaming pass, one uint64 per batch crossing the wire (numpy
    uint64 addition wraps mod 2^64 natively). The oracle renders the
    SAME seeded FNV-Horner + splitmix64 arithmetic in SQL
    (`_sqlgen.string_hash_ctes` — the kmv/doc_fingerprints machinery).
    Returns one row (n_docs, checksum), checksum as two's-complement
    BIGINT."""
    from ..kernels.hashing import hash_arrow_strings, splitmix64
    from ._sqlgen import mix_constant

    mix = np.uint64(mix_constant(seed))
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        h = hash_arrow_strings(text, seed=1)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = h ^ splitmix64(ids ^ mix)
        s = x.sum(dtype=np.uint64)  # wraps mod 2^64 by construction
        return pa.table({
            "chk": pa.array(np.array([s], np.uint64).view(np.int64),
                            pa.int64()),
            "n": pa.array([batch.num_rows], pa.int64())})

    t = ensure_columns(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
          .to_pandas(), {"chk": "int64", "n": "int64"})
    total = t["chk"].to_numpy(np.int64).view(np.uint64).sum(dtype=np.uint64)
    return pa.table({
        "n_docs": pa.array([int(t["n"].sum())], pa.int64()),
        "checksum": pa.array(np.array([total], np.uint64).view(np.int64),
                             pa.int64()),
    })


def token_weighted_quantiles(sf_dir: str,
                             force: str | None = None) -> pa.Table:
    """WEIGHTED quantiles — n_chars quantiles where each document counts
    its TOKEN count, not 1 (the compute-cost view of the length
    distribution: "the median token lives in a doc of length X", which a
    plain doc-count quantile understates whenever long docs carry most
    tokens). quantiles_exact / grouped_quantiles_exact are the
    unweighted family; this completes it.

    Cut rule in EXACT integer arithmetic: value = min v with
    cumweight(v)·den ≥ num·total for q = num/den — no float q·W
    anywhere, so the oracle (same inequality in SQL) cannot disagree at
    a boundary. One adaptive (n_chars, Σtokens) histogram fold
    (value-bounded, corpus-size independent), cumsum + searchsorted on
    the driver. Returns (q, value) for q ∈ {1/4, 1/2, 9/10}."""
    _QS = ((0.25, 1, 4), (0.5, 1, 2), (0.9, 9, 10))
    ds = _read(sf_dir, "documents", ["n_chars", "text"])
    n = ds.count()

    def partials(batch: pa.Table) -> pa.Table:
        wt = pc.list_value_length(
            pc.split_pattern(batch["text"].combine_chunks(), " ")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"v": batch["n_chars"], "wt": pa.array(wt)})
        g = t.group_by("v").aggregate([("wt", "sum")])
        return g.rename_columns(["v", "wt"])

    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
    small = (n < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(), {"v": "int64", "wt": "int64"})
        hist = pdf.groupby("v", as_index=False)["wt"].sum()
    else:
        hist = ensure_columns(
            parts.repartition(n_reducers()).groupby("v")
                 .aggregate(Sum("wt", alias_name="wt")).to_pandas(),
            {"v": "int64", "wt": "int64"})
    hist = hist.sort_values("v").reset_index(drop=True)
    v = hist["v"].to_numpy(np.int64)
    cum = hist["wt"].to_numpy(np.int64).cumsum()
    tot = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    if tot > 0:  # empty corpus -> zero rows (matching SQL GROUP BY)
        for q, num, den in _QS:
            idx = int(np.searchsorted(cum * den, num * tot))
            out_q.append(q)
            out_v.append(int(v[min(idx, len(v) - 1)]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})


def length_ks_distance(sf_dir: str, lang: str = "en",
                       force: str | None = None) -> pa.Table:
    """Two-sample Kolmogorov–Smirnov distance between ``lang``'s n_chars
    distribution and the REST of the corpus — the drift/shift test a
    data pipeline runs to compare a new snapshot's length profile
    against production before mixing. D = max_v |F_a(v) − F_b(v)|,
    maximized in EXACT integer arithmetic (|cumA·n_b − cumB·n_a| over
    the merged value grid; ONE float division at the end, mirrored in
    the oracle) from the same one-pass (lang==?, n_chars) histogram
    fold. Returns one row (ks, n_a, n_b), ks rounded 6dp."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    n = ds.count()

    def partials(batch: pa.Table) -> pa.Table:
        is_a = pc.equal(batch["lang"].combine_chunks(), lang) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"v": batch["n_chars"],
                      "a": pa.array(is_a.astype(np.int64)),
                      "b": pa.array((~is_a).astype(np.int64))})
        g = t.group_by("v").aggregate([("a", "sum"), ("b", "sum")])
        return g.rename_columns(["v", "ca", "cb"])

    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
    small = (n < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"v": "int64", "ca": "int64", "cb": "int64"})
        hist = pdf.groupby("v", as_index=False)[["ca", "cb"]].sum()
    else:
        hist = ensure_columns(
            parts.repartition(n_reducers()).groupby("v")
                 .aggregate(Sum("ca", alias_name="ca"),
                            Sum("cb", alias_name="cb")).to_pandas(),
            {"v": "int64", "ca": "int64", "cb": "int64"})
    hist = hist.sort_values("v").reset_index(drop=True)
    ca = hist["ca"].to_numpy(np.int64).cumsum()
    cb = hist["cb"].to_numpy(np.int64).cumsum()
    n_a = int(ca[-1]) if len(ca) else 0
    n_b = int(cb[-1]) if len(cb) else 0
    if n_a == 0 or n_b == 0:
        ks = 0.0
    else:
        num = np.abs(ca * n_b - cb * n_a).max()
        ks = float(round6(float(num) / (n_a * n_b)))
    return pa.table({"ks": pa.array([ks], pa.float64()),
                     "n_a": pa.array([n_a], pa.int64()),
                     "n_b": pa.array([n_b], pa.int64())})


def token_burstiness(sf_dir: str, rel_threshold: float = 0.005,
                     force: str | None = None) -> pa.Table:
    """Token dispersion / burstiness — for every frequent token, how
    unevenly its occurrences clump into documents: df (docs containing),
    tf (total count), and the variance-to-mean ratio of its per-doc
    counts over the docs that contain it (VMR 1 ≈ Poisson spread, ≫1 =
    bursty topical token, the content/function-word separator stopword
    lists approximate). The nested per-doc→per-token aggregation shape:
    a (doc, token) group FIRST, then token-level moments of those group
    sizes.

    Per batch: (doc, token) counts via one value_counts over
    doc-index-tagged tokens, reduced immediately to per-token moment
    partials (df, Σn, Σn²) — the shuffle carries vocab-bounded moment
    rows, never (doc, token) pairs. Adaptive fold; threshold
    tf ≥ ceil(rel·total) scale-invariant; VMR = (Σn²·df − tf²)/(df·tf)
    in exact integers with ONE mirrored float division, 6dp half-away.
    Returns (token, df, tf, vmr) sorted by token."""
    ds = _read(sf_dir, "documents", ["text"])
    n_rows = ds.count()

    def partials(batch: pa.Table) -> pa.Table:
        flat, offsets = flat_tokens(batch["text"])
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.large_string()),
                             "df": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64()),
                             "s2": pa.array([], pa.int64())})
        doc_idx = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                            np.diff(offsets))
        # (doc, token) counts: dictionary-encode tokens, count int pairs
        # (the type_token_ratio discipline — no string pair group_by)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        tok_codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vocab = enc.dictionary
        pair = doc_idx * (len(vocab) + 1) + tok_codes
        up, cnt = np.unique(pair, return_counts=True)
        tok_of_pair = (up % (len(vocab) + 1)).astype(np.int64)
        # per-token moments of the per-doc counts
        order = np.argsort(tok_of_pair, kind="stable")
        t_sorted, c_sorted = tok_of_pair[order], cnt[order]
        uniq_t, first = np.unique(t_sorted, return_index=True)
        df_p = np.diff(np.concatenate([first, [len(t_sorted)]]))
        tf_p = np.add.reduceat(c_sorted, first)
        s2_p = np.add.reduceat(c_sorted * c_sorted, first)
        return pa.table({
            "token": vocab.take(pa.array(uniq_t)).cast(pa.large_string()),
            "df": pa.array(df_p.astype(np.int64)),
            "tf": pa.array(tf_p.astype(np.int64)),
            "s2": pa.array(s2_p.astype(np.int64))})

    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
    small = (n_rows < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"token": "object", "df": "int64",
                              "tf": "int64", "s2": "int64"})
        agg = pdf.groupby("token", as_index=False)[["df", "tf", "s2"]].sum()
    else:
        agg = ensure_columns(
            parts.repartition(n_reducers()).groupby("token")
                 .aggregate(Sum("df", alias_name="df"),
                            Sum("tf", alias_name="tf"),
                            Sum("s2", alias_name="s2")).to_pandas(),
            {"token": "object", "df": "int64", "tf": "int64", "s2": "int64"})
    total = int(agg["tf"].sum())
    thr = int(np.ceil(rel_threshold * total))
    agg = agg[agg["tf"] >= thr].sort_values("token").reset_index(drop=True)
    df_a = agg["df"].to_numpy(np.int64)
    tf_a = agg["tf"].to_numpy(np.int64)
    s2_a = agg["s2"].to_numpy(np.int64)
    num = s2_a * df_a - tf_a * tf_a
    den = df_a * tf_a
    vmr = round6(num.astype(np.float64) / np.maximum(den, 1))
    return pa.table({
        "token": pa.array(agg["token"], pa.string()),
        "df": pa.array(df_a, pa.int64()),
        "tf": pa.array(tf_a, pa.int64()),
        "vmr": pa.array(np.asarray(vmr, np.float64), pa.float64()),
    })


def table_profile(sf_dir: str, force: str | None = None) -> pa.Table:
    """Column profiling — the ANALYZE shape a pipeline runs on every new
    snapshot: per documents column, row/null/exact-distinct counts. ONE
    streaming pass for ALL columns: each batch emits tagged partial rows
    (per-column unique value HASHES for the distinct count, one meta row
    per column for row/null counts); distinct folds adaptively on the
    64-bit hashes (the exact_dedup_docs discipline — hash equality IS
    the engine's identity; at 10^12 rows the distributed branch replaces
    the driver set with a per-column groupby, and the HLL column profile
    in grouped_sketch_stats is the constant-memory alternative).
    Returns (column, n_rows, n_nulls, n_distinct) in schema order."""
    from ray.data.aggregate import Count

    from ..kernels.hashing import hash_arrow_strings, hash_ints

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = _read(sf_dir, "documents", cols)
    n_rows_total = ds.count()

    def partials(batch: pa.Table) -> pa.Table:
        ci_l, h_l, n_l, nu_l = [], [], [], []
        for ci, c in enumerate(cols):
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            nulls = int(pc.sum(pc.is_null(col)).as_py() or 0)
            valid = col.drop_null()
            if pa.types.is_integer(valid.type):
                h = hash_ints(valid.to_numpy(zero_copy_only=False)
                              .astype(np.int64), seed=ci)
            else:
                h = hash_arrow_strings(valid.cast(pa.string()), seed=ci)
            uh = np.unique(h).view(np.int64)
            # hash rows (n = -1) then ONE meta row (n, nulls) per column
            ci_l.append(np.full(len(uh) + 1, ci, np.int64))
            h_l.append(np.concatenate([uh, [0]]))
            n_l.append(np.concatenate(
                [np.full(len(uh), -1, np.int64), [batch.num_rows]]))
            nu_l.append(np.concatenate(
                [np.zeros(len(uh), np.int64), [nulls]]))
        return pa.table({
            "ci": pa.array(np.concatenate(ci_l)),
            "h": pa.array(np.concatenate(h_l)),
            "n": pa.array(np.concatenate(n_l)),
            "nulls": pa.array(np.concatenate(nu_l))})

    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
    small = (n_rows_total < _SMALL_ROWS) if force is None \
        else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"ci": "int64", "h": "int64", "n": "int64",
                              "nulls": "int64"})
        meta = pdf[pdf["n"] >= 0].groupby("ci")[["n", "nulls"]].sum()
        nd = pdf[pdf["n"] < 0].groupby("ci")["h"].nunique()
    else:
        parts = parts.materialize()  # two consumers (house rule)

        def _take(ge: bool):
            def f(b: pa.Table) -> pa.Table:
                m = pc.greater_equal(b["n"], 0) if ge \
                    else pc.less(b["n"], 0)
                return b.filter(m)
            return f

        meta = ensure_columns(
            parts.map_batches(_take(True), batch_format="pyarrow")
                 .groupby("ci").aggregate(
                     Sum("n", alias_name="n"),
                     Sum("nulls", alias_name="nulls")).to_pandas(),
            {"ci": "int64", "n": "int64", "nulls": "int64"}).set_index("ci")
        uniq = parts.map_batches(_take(False), batch_format="pyarrow") \
            .repartition(n_reducers()).groupby(["ci", "h"]) \
            .aggregate(Count(alias_name="c"))
        nd = ensure_columns(
            uniq.groupby("ci").aggregate(Count(alias_name="nd")).to_pandas(),
            {"ci": "int64", "nd": "int64"}).set_index("ci")["nd"]
    order = sorted(range(len(cols)), key=lambda i: cols[i])  # name order,
    # matching the oracle's ORDER BY column
    return pa.table({
        "column": pa.array([cols[i] for i in order], pa.string()),
        "n_rows": pa.array([int(meta["n"].get(i, 0)) for i in order],
                           pa.int64()),
        "n_nulls": pa.array([int(meta["nulls"].get(i, 0)) for i in order],
                            pa.int64()),
        "n_distinct": pa.array([int(nd.get(i, 0)) for i in order],
                               pa.int64()),
    })


def lang_token_divergence(sf_dir: str, lang: str = "en", k: int = 20,
                          min_cnt: int = 50) -> pa.Table:
    """Which tokens DISTINGUISH one language slice from the rest — the
    per-token Jensen–Shannon divergence contribution between the two
    token distributions (the corpus-mixing diagnostic: JS = Σ of these
    terms; reporting per-token contributions keeps every float rounded
    PER ROW, the pmi_collocations ln discipline, instead of an
    order-dependent global float sum).

    js(t) = ½·p_a·ln(p_a/m) + ½·p_b·ln(p_b/m), m = (p_a+p_b)/2, with
    0·ln0 = 0. ONE salted distributed count pass carrying BOTH sides'
    counts per token (token_counts_ds shape, two sum columns); the
    driver sees vocab-sized rows, computes the ln terms in exactly the
    oracle's operation order, rounds 6dp, and ranks (js desc, token
    asc). Tokens with ca+cb < min_cnt are dropped (noise floor).
    Returns (rank, token, cnt_a, cnt_b, js)."""
    from ._util import batch_salt, default_n_salt

    ds = _read(sf_dir, "documents", ["lang", "text"])
    n_salt = default_n_salt()

    def partials(batch: pa.Table) -> pa.Table:
        is_a = pc.equal(batch["lang"].combine_chunks(), lang)
        rows = []
        for side, mask in (("a", is_a), ("b", pc.invert(is_a))):
            texts = batch.filter(mask)["text"]
            keys, counts = token_counts(texts)
            z = np.zeros(len(counts), np.int64)
            rows.append(pa.table({
                "token": keys.cast(pa.large_string()),
                "ca": pa.array(counts if side == "a" else z, pa.int64()),
                "cb": pa.array(z if side == "a" else counts, pa.int64())}))
        t = pa.concat_tables(rows)
        total = int(pc.sum(t["ca"]).as_py() or 0) \
            + int(pc.sum(t["cb"]).as_py() or 0)
        salt = batch_salt(total, t.num_rows, n_salt)
        return t.append_column(
            "salt", pa.array(np.full(t.num_rows, salt), pa.int64()))

    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
    sub = parts.groupby(["token", "salt"]).aggregate(
        Sum("ca", alias_name="ca"), Sum("cb", alias_name="cb"))
    agg = ensure_columns(
        sub.groupby("token").aggregate(
            Sum("ca", alias_name="ca"), Sum("cb", alias_name="cb"))
        .to_pandas(), {"token": "object", "ca": "int64", "cb": "int64"})
    na = float(agg["ca"].sum())
    nb = float(agg["cb"].sum())
    agg = agg[(agg["ca"] + agg["cb"]) >= min_cnt].reset_index(drop=True)
    ca = agg["ca"].to_numpy(np.float64)
    cb = agg["cb"].to_numpy(np.float64)
    pa_ = ca / max(na, 1.0)
    pb = cb / max(nb, 1.0)
    m = (pa_ + pb) / 2.0
    with np.errstate(divide="ignore", invalid="ignore"):
        ta = np.where(pa_ > 0, 0.5 * (pa_ * np.log(
            np.where(pa_ > 0, pa_, 1.0) / np.where(m > 0, m, 1.0))), 0.0)
        tb = np.where(pb > 0, 0.5 * (pb * np.log(
            np.where(pb > 0, pb, 1.0) / np.where(m > 0, m, 1.0))), 0.0)
    agg["js"] = np.round(ta + tb, 6)
    agg = agg.sort_values(["js", "token"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
    agg.insert(0, "rank", np.arange(1, len(agg) + 1, dtype=np.int64))
    return pa.table({
        "rank": pa.array(agg["rank"].to_numpy(np.int64), pa.int64()),
        "token": pa.array(agg["token"], pa.string()),
        "cnt_a": pa.array(agg["ca"].to_numpy(np.int64), pa.int64()),
        "cnt_b": pa.array(agg["cb"].to_numpy(np.int64), pa.int64()),
        "js": pa.array(agg["js"].to_numpy(np.float64), pa.float64()),
    })


def source_kl_profile(sf_dir: str) -> pa.Table:
    """Per-source KL divergence from the corpus token distribution —
    KL(p_source ‖ p_corpus) = Σ_tok p·ln(p/q) — the domain-shift signal
    mixture tuning reads before reweighting sources (a source whose
    unigram distribution sits far from the blend is under-assimilated).

    Exactly oracle-gated despite the ln float path: each (source, token)
    TERM is a fixed op sequence from integers (p = c/t_s, q = c_g/T,
    term = p·ln(p/q) — ln bit-parity with DuckDB holds on this corpus,
    the tfidf/PMI precedent), then FLOOR-QUANTIZED to 1e-12 units and
    summed as int64 — an order-independent integer fold, so neither
    engine's summation order matters (the money-cents discipline applied
    to information terms). One distributed (source, token) count fold
    (per-batch Arrow pre-agg → vocab×sources-bounded groupby, the
    top_token_per_lang shape); the KL itself runs on the vocab-sized
    driver table. Returns (source, n_tokens, kl_fp, kl), kl = ONE
    mirrored double division round6."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        src = batch["source"].combine_chunks()
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        rep = src.take(pa.array(np.repeat(np.arange(len(src)), ntok)))
        t = pa.table({"source": rep, "token": flat})
        g = t.group_by(["source", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "token", "partial"])

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .groupby(["source", "token"])
        .aggregate(Sum("partial", alias_name="c"))
    ).to_pandas()

    c = agg["c"].to_numpy(np.int64)
    ts = agg.groupby("source")["c"].transform("sum").to_numpy(np.int64)
    cg = agg.groupby("token")["c"].transform("sum").to_numpy(np.int64)
    tt = int(c.sum())
    p = c.astype(np.float64) / ts.astype(np.float64)
    q = cg.astype(np.float64) / np.float64(tt)
    term = p * np.log(p / q)
    qt = np.floor(term * 1e12).astype(np.int64)

    out = pd.DataFrame({"source": agg["source"], "ts": ts, "qt": qt}) \
        .groupby("source", as_index=False).agg(n_tokens=("ts", "first"),
                                               kl_fp=("qt", "sum")) \
        .sort_values("source").reset_index(drop=True)
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        "n_tokens": pa.array(out["n_tokens"].to_numpy(np.int64), pa.int64()),
        "kl_fp": pa.array(out["kl_fp"].to_numpy(np.int64), pa.int64()),
        "kl": pa.array([float(round6(float(v) / 1e12))
                        for v in out["kl_fp"]], pa.float64()),
    })


def zipf_profile(sf_dir: str, v: int = 1000) -> pa.Table:
    """Zipf rank–frequency fit over the top-`v` tokens: the least-squares
    slope of ln(freq) on ln(rank) — the corpus-statistics sanity signal
    (natural text sits near −1; a slope collapsing toward 0 means
    boilerplate/duplication, a cliff means template spam).

    Exactly oracle-gated despite the regression float path: the ranked
    (rank, cnt) pairs are integers, each per-rank moment term
    (x=ln(rank), y=ln(cnt): x, y, x·x, x·y) is a fixed float op sequence
    floor-quantized to 1e-12 units, and the four moment sums fold as
    int64 — order-independent (the source_kl_profile discipline). Slope
    and intercept each take ONE mirrored double path from the integer
    sums (scale-matched: n·Σxy·10^12 − Σx·Σy in exact big-int), round6.
    Counting reuses the salted distributed fold (`token_counts_ds`);
    the regression runs on the v-bounded driver table. Returns one row
    (n_ranks, zipf_slope, intercept)."""
    df = token_counts_ds(sf_dir).to_pandas()
    o = np.lexsort((df["token"].to_numpy(), -df["cnt"].to_numpy()))[:int(v)]
    cnt = df["cnt"].to_numpy(np.int64)[o]
    n = len(cnt)
    rank = np.arange(1, n + 1, dtype=np.int64)
    x = np.log(rank.astype(np.float64))
    y = np.log(cnt.astype(np.float64))
    qx = np.floor(x * 1e12).astype(np.int64)
    qy = np.floor(y * 1e12).astype(np.int64)
    qxx = np.floor(x * x * 1e12).astype(np.int64)
    qxy = np.floor(x * y * 1e12).astype(np.int64)
    sx, sy = int(qx.sum()), int(qy.sum())
    sxx, sxy = int(qxx.sum()), int(qxy.sum())
    num = n * sxy * 10 ** 12 - sx * sy     # exact big-int, 1e24 scale
    den = n * sxx * 10 ** 12 - sx * sx
    slope = float(num) / float(den)
    intercept = (float(sy) / 1e12 - slope * (float(sx) / 1e12)) / float(n)
    return pa.table({
        "n_ranks": pa.array([n], pa.int64()),
        "zipf_slope": pa.array([float(round6(slope))], pa.float64()),
        "intercept": pa.array([float(round6(intercept))], pa.float64()),
    })


def vocab_growth_curve(sf_dir: str, n_cuts: int = 10) -> pa.Table:
    """Heaps'-law vocabulary growth: distinct tokens seen within the
    first i/n_cuts of the doc-id range, per decile — the dedup/diversity
    trajectory signal (a flattening curve means new documents stop
    contributing vocabulary). ONE distributed (token → min doc_id) fold
    (per-batch Arrow pre-agg → vocab-bounded groupby-min, the
    top_token_per_lang shape); the curve is a searchsorted over the
    vocab-sized min-ids on the driver. All-integer, exactly oracle-gated.
    Returns (decile, docs_cutoff, vocab_size)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        rep = pa.array(np.repeat(ids, ntok), pa.int64())
        t = pa.table({"token": flat, "doc_id": rep})
        g = t.group_by("token").aggregate([("doc_id", "min")])
        return g.rename_columns(["token", "m"])

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
        .groupby("token")
        .aggregate(Min("m", alias_name="first_doc"))
    ).to_pandas()
    first = np.sort(agg["first_doc"].to_numpy(np.int64))

    from ._util import parquet_minmax
    _, max_id = parquet_minmax(f"{sf_dir}/documents.parquet", "doc_id")
    n_docs = int(max_id) + 1
    cuts = np.array([(n_docs * i) // int(n_cuts)
                     for i in range(1, int(n_cuts) + 1)], np.int64)
    vocab = np.searchsorted(first, cuts, side="left")
    return pa.table({
        "decile": pa.array(np.arange(1, int(n_cuts) + 1), pa.int64()),
        "docs_cutoff": pa.array(cuts, pa.int64()),
        "vocab_size": pa.array(vocab.astype(np.int64), pa.int64()),
    })
