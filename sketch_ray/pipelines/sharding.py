"""Deterministic global-shuffle sharding — the training-data assembly step.

Before training, a cleaned corpus is (a) globally shuffled (examples must
arrive in an order uncorrelated with crawl/source order) and (b) split
into a fixed number of shard files that data loaders consume round-robin.
Both decisions here are pure functions of (doc_id, seed) through the
SplitMix64 finalizer (kernels/hashing.py:31-39):

    shard    = splitmix64(doc_id ^ splitmix64(seed))     % n_shards
    sort_key = splitmix64(doc_id ^ splitmix64(seed + 1))   (order in shard)

No RNG state, nothing shared: assignment and within-shard order are
identical across runs, parallelism, partitioning, and resume, so a rerun
of a failed job reproduces byte-identical shards (same discipline as
text_analysis.stratified_sample).

Scale shape: the assignment pass is one vectorized map_batches with no
shuffle. Materializing ordered shards is the one genuinely all-to-all
step of training-data assembly — every row must move to its shard —
done as ONE groupby(shard) exchange with each group sorted in worker
memory; n_shards is chosen so a shard fits one worker (the standard
webdataset-style shard-writer contract). Output is partitioned parquet
(one directory per shard, bounded rows per file): a resumable shape.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.hashing import splitmix64
from .exact import _SMALL_ROWS

_U64 = np.uint64


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _mixes(seed: int) -> tuple[np.uint64, np.uint64]:
    return (splitmix64(np.array([seed], _U64))[0],
            splitmix64(np.array([seed + 1], _U64))[0])


def _add_keys(batch: pa.Table, seed: int, n_shards: int) -> pa.Table:
    mix1, mix2 = _mixes(seed)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h1 = splitmix64(ids.astype(_U64) ^ mix1)
    h2 = splitmix64(ids.astype(_U64) ^ mix2)
    shard = (h1 % _U64(n_shards)).astype(np.int64)
    return batch.append_column("shard", pa.array(shard, pa.int64())) \
                .append_column("sort_key", pa.array(h2, pa.uint64()))


def shard_assignments(sf_dir: str, n_shards: int = 16, seed: int = 7,
                      force: str | None = None) -> pa.Table:
    """(doc_id, shard, pos): which shard each document lands in and its
    rank within the shard's deterministic shuffle order.

    Adaptive plan: the key pass always runs distributed (vectorized
    map_batches, no shuffle). Rank-within-shard folds on the driver below
    ``_SMALL_ROWS`` input rows; above it, one distributed groupby(shard)
    ranks each shard in a worker (``force="driver"|"distributed"``
    overrides, pinned equal in pytest).
    """
    ds = _read(sf_dir, "documents", ["doc_id"])
    n = ds.count()  # parquet-metadata count: no scan
    assigned = ds.map_batches(_add_keys, fn_kwargs={"seed": seed, "n_shards": n_shards},
                              batch_format="pyarrow", batch_size=65536)
    small = (n < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        df = assigned.to_pandas()
        df = df.sort_values(["shard", "sort_key", "doc_id"]).reset_index(drop=True)
        df["pos"] = df.groupby("shard").cumcount().astype(np.int64)
    else:
        def rank(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["sort_key", "doc_id"]).reset_index(drop=True)
            g["pos"] = np.arange(len(g), dtype=np.int64)
            return g

        df = assigned.groupby("shard").map_groups(rank, batch_format="pandas").to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.table({
        "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
        "shard": pa.array(df["shard"].to_numpy(np.int64)),
        "pos": pa.array(df["pos"].to_numpy(np.int64)),
    })


def write_training_shards(sf_dir: str, out_dir: str, n_shards: int = 16,
                          seed: int = 7, rows_per_file: int = 100_000) -> dict:
    """Materialize the shuffled training shards: every corpus column moves
    (deliberately unpruned read — the sink carries the documents), one
    groupby(shard) exchange, each shard sorted by its deterministic
    sort_key and streamed to ``out_dir/shard=NNNNN/part-*.parquet`` with
    bounded rows per file (atomic tmp+rename per file, so a rerun can skip
    or safely overwrite finished shards). Returns a manifest dict.

    A shard with zero documents (possible at tiny corpora) writes no
    directory; loaders treat missing shards as empty.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    return write_shards_from(ds, out_dir, n_shards=n_shards, seed=seed,
                             rows_per_file=rows_per_file)


def write_shards_from(ds, out_dir: str, n_shards: int = 16, seed: int = 7,
                      rows_per_file: int = 100_000, resume: bool = False) -> dict:
    """Shard-writer over an ALREADY-BUILT dataset (any schema with a
    ``doc_id`` column) — the tail stage of corpus assembly. Same physical
    plan as ``write_training_shards``.

    ``resume=True`` skips shards whose ``_DONE.json`` marker matches the
    current (row count, config): since every assignment and order is a
    pure function of (doc_id, seed), a finished shard from a crashed run
    is byte-identical to what this run would write. The marker lands
    atomically AFTER the shard's last part file, so a shard interrupted
    mid-write is simply rewritten. Still one full pass over the data —
    the savings is the write + sort work of finished shards; at 100 TB
    the upstream read is re-filtered but nothing is re-shuffled twice.
    """
    assigned = ds.map_batches(_add_keys, fn_kwargs={"seed": seed, "n_shards": n_shards},
                              batch_format="pyarrow", batch_size=65536)

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        import json

        s = int(g["shard"].iloc[0])
        d = os.path.join(out_dir, f"shard={s:05d}")
        marker = os.path.join(d, "_DONE.json")
        want_cfg = {"n_rows": int(len(g)), "rows_per_file": int(rows_per_file),
                    "seed": int(seed), "n_shards": int(n_shards)}
        if resume and os.path.exists(marker):
            try:
                done = json.load(open(marker))
            except (OSError, ValueError):
                done = None
            if done and {k: done.get(k) for k in want_cfg} == want_cfg:
                return pd.DataFrame({"shard": [s], "n_rows": [done["n_rows"]],
                                     "n_files": [done["n_files"]], "skipped": [True]})
        g = g.sort_values(["sort_key", "doc_id"]).drop(columns=["shard", "sort_key"])
        os.makedirs(d, exist_ok=True)
        n_files = 0
        for j, lo in enumerate(range(0, len(g), rows_per_file)):
            part = g.iloc[lo:lo + rows_per_file]
            tmp = os.path.join(d, f".part-{j:05d}.tmp")
            part.to_parquet(tmp, index=False)
            os.replace(tmp, os.path.join(d, f"part-{j:05d}.parquet"))
            n_files = j + 1
        tmp = os.path.join(d, "._DONE.tmp")
        with open(tmp, "w") as f:
            json.dump({**want_cfg, "n_files": n_files}, f)
        os.replace(tmp, marker)
        return pd.DataFrame({"shard": [s], "n_rows": [len(g)],
                             "n_files": [n_files], "skipped": [False]})

    manifest = assigned.groupby("shard").map_groups(emit, batch_format="pandas").to_pandas()
    manifest = manifest.sort_values("shard").reset_index(drop=True)
    return {
        "n_docs": int(manifest["n_rows"].sum()),
        "n_shards_written": int(len(manifest)),
        "n_shards_skipped": int(manifest["skipped"].sum()),
        "out_dir": out_dir,
        "shards": manifest.to_dict("records"),
    }
