"""Shared pipeline helpers."""

from __future__ import annotations

import numpy as np
import pandas as pd


def round6(x: "np.ndarray | float") -> "np.ndarray | float":
    """Round to 6dp HALF-AWAY-FROM-ZERO — DuckDB's ROUND semantics, NOT
    numpy's half-to-even. Integer ratios hit exact .5 ties at 6dp whenever
    the denominator is a power of two times a divisor of 10^6 (e.g.
    105/128 = 0.8203125), and every 6dp-gated ratio query must tie-break
    the same way its SQL oracle does (char_class_profile precedent,
    CLAUDE.md house rule)."""
    return round_half_away(x, 6)


def round_half_away(x: "np.ndarray | float", dp: int) -> "np.ndarray | float":
    """DuckDB ROUND semantics at any precision — same tie rule as round6.
    Needed whenever an integer-cents quotient lands on an exact .5 at the
    target precision (e.g. cents/100/n at 2dp: supplier_region_balance's
    ASIA average was 4553.205 exactly — numpy's banker's rounding gave
    .20, DuckDB .21)."""
    s = 10.0 ** dp
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def n_reducers(floor: int = 32) -> int:
    """Reducer-partition count for sort-shuffle groupbys, sized from the
    cluster: ``max(floor, total cluster CPUs)`` — one reducer partition per
    core once the cluster is bigger than the measured floor. The floor of
    32 is the few-block sort-shuffle pathology guard measured on this box
    (CLAUDE.md): Ray's sort-based groupby degrades badly when fed a handful
    of large blocks, and repartitioning below ~32 does not amortize the
    shuffle's fixed cost. On a 256-node cluster the count grows with
    resources instead of bottlenecking at a constant."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return max(floor, cpus)


def default_n_salt() -> int:
    """Salt-bucket count for two-level salted token aggregation:
    max(16, cluster CPUs // 2) — 16 is the measured-right value on this
    32-CPU box; on a big cluster a hot key spreads over ~CPUs/2 reducers
    instead of a constant (the n_reducers sizing rule applied to salting).
    ONE definition shared by every salted count pipeline."""
    return max(16, n_reducers() // 2)


def batch_salt(total: int, num_rows: int, n_salt: int) -> int:
    """Deterministic per-batch salt from batch content (total count varies
    per batch), spreading a hot key's partial rows across reducers. The
    single source of truth for the salt derivation — token_counts_ds and
    lang_token_divergence must agree on it."""
    from ..kernels.hashing import splitmix64

    return int(splitmix64(np.array([total * 1315423911 + num_rows],
                                   np.uint64))[0] % n_salt)


def parquet_minmax(path: str, col: str):
    """Column (min, max) from parquet row-group STATISTICS — no scan, no
    Ray aggregate. ``Dataset.max`` is an AllToAll Aggregate, and on a
    handful of large blocks it pays the measured few-block sort-shuffle
    pathology (seconds for a metadata-answerable question). Falls back to
    a DuckDB scan only when a writer skipped statistics. Returns raw
    statistics values (int for int columns, float for double) — callers
    cast. Shared by exact._parquet_column_max and the relational
    histogram binning (one copy of the stats walk to keep in sync)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index(col)
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            import duckdb

            return duckdb.sql(
                f"SELECT min({col}), max({col}) "
                f"FROM read_parquet('{path}')").fetchone()
        mins.append(st.min)
        maxs.append(st.max)
    return min(mins), max(maxs)


def ensure_columns(df: pd.DataFrame, schema: dict[str, str]) -> pd.DataFrame:
    """A Ray Dataset that produced zero blocks loses its schema on
    ``to_pandas()``; rebuild the typed empty frame so downstream column
    selection keeps working (empty partitions are routine at scale)."""
    if all(c in df.columns for c in schema):
        return df
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in schema.items()})


def tag_hash_bucket(batch, col: str, out: str = "bucket"):
    """Append an int64 ``splitmix64(key) % n_reducers()`` bucket column —
    the house pattern for every distributed fold over a high-cardinality
    key (CLAUDE.md trap: a native Ray groupby over a per-row-cardinality
    key measured 206 s where this bucket + ``map_groups`` fold took 1.9 s).
    Keys are hashed by their int64 bit pattern (negative int64 wraps to the
    same uint64 bits under both ``.view`` and ``.astype``). Two-key folds
    (co-purchase) compose two splitmix64 calls instead of using this."""
    import pyarrow as pa

    from ..kernels.hashing import splitmix64

    keys = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
    b = (splitmix64(keys) % np.uint64(n_reducers())).astype(np.int64)
    return batch.append_column(out, pa.array(b, pa.int64()))


def write_and_digest(per_doc_ds, sf_dir: str, name: str, digest_batch,
                     batch_size: int = 8192) -> tuple[int, int, str]:
    """At-scale output mode for per-document result tables (SURVEY §9 /
    VERDICT r4 item 5): stream the table to partitioned Parquet under /tmp
    (one file per block — a resumable, re-shardable artifact; at 100 TB
    this replaces the gate-protocol driver pull entirely), then fold an
    order-invariant digest over the WRITTEN files: read back, one
    (uint64 checksum, row count) pair per batch to the driver —
    corpus_checksum's mod-2^64 commutative sum, independent of
    partitioning, block order and parallelism.

    ``digest_batch(batch) -> pa.Table{"chk": int64[1], "n": int64[1]}``
    defines the per-row hash; returns (n_rows, digest_int64, out_dir).
    """
    import hashlib
    import os
    import shutil

    import ray.data as rd

    # key the output dir on the FULL corpus path, not just its basename:
    # two same-named corpus dirs (a second checkout, a synthesized fixture)
    # must not rmtree each other's written artifact
    apath = os.path.abspath(sf_dir)
    base = (os.path.basename(apath) + "-"
            + hashlib.sha256(apath.encode()).hexdigest()[:8])
    out = f"/tmp/sketch_ray_outputs/{base}/{name}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    per_doc_ds.write_parquet(out)
    parts = ensure_columns(
        rd.read_parquet(out)
        .map_batches(digest_batch, batch_format="pyarrow",
                     batch_size=batch_size)
        .to_pandas(), {"chk": "int64", "n": "int64"})
    total = parts["chk"].to_numpy(np.int64).view(np.uint64).sum(dtype=np.uint64)
    return (int(parts["n"].sum()),
            int(np.array([total], np.uint64).view(np.int64)[0]), out)
