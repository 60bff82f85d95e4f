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


def _tok_keys(batch: pa.Table, seed: int) -> pa.Table:
    """(doc_id, sort_key, n_toks): the 24 B/doc statistics row that drives
    packing. Token count = whitespace-split arity (``count(' ') + 1``,
    bit-equal to DuckDB ``len(string_split(text, ' '))`` — the verified
    oracle pair)."""
    import pyarrow.compute as pc

    mix1, _ = _mixes(seed)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = splitmix64(ids.astype(_U64) ^ mix1)
    ntoks = pc.add(pc.count_substring(batch["text"], " "), 1)
    return pa.table({
        "doc_id": pa.array(ids),
        "sort_key": pa.array(h, pa.uint64()),
        "n_toks": ntoks.cast(pa.int64()),
    })


def _expand_spans(ids: np.ndarray, starts: np.ndarray, ntoks: np.ndarray,
                  seq_len: int) -> pd.DataFrame:
    """Chunk the concatenated token stream: doc with global token span
    [s, e) contributes one row per training sequence it overlaps
    (seq_id = floor(offset / seq_len)). Fully vectorized (repeat + arange
    run-offsets, no per-doc loop)."""
    e = starts + ntoks
    first = starts // seq_len
    last = (e - 1) // seq_len
    cnt = (last - first + 1).astype(np.int64)
    ridx = np.repeat(np.arange(len(ids), dtype=np.int64), cnt)
    run0 = np.cumsum(cnt) - cnt
    seq = first[ridx] + (np.arange(cnt.sum(), dtype=np.int64) - run0[ridx])
    lo = np.maximum(starts[ridx], seq * seq_len)
    hi = np.minimum(e[ridx], (seq + 1) * seq_len)
    return pd.DataFrame({
        "seq_id": seq,
        "doc_id": ids[ridx],
        "doc_start": lo - starts[ridx],
        "seq_start": lo - seq * seq_len,
        "n_toks": hi - lo,
    })


def pack_sequences(sf_dir: str, seq_len: int = 512, seed: int = 7,
                   force: str | None = None, n_buckets: int = 32) -> pa.Table:
    """GPT-style sequence packing: concatenate every document's tokens in
    the deterministic shuffle order (splitmix64 of doc_id — the same order
    discipline as ``shard_assignments``) and chunk the stream into
    fixed-length training sequences of ``seq_len`` tokens. Returns the
    packing manifest: one row per (sequence, document-segment) overlap —
    ``(seq_id, doc_id, doc_start, seq_start, n_toks)`` — which is exactly
    what a loader needs to assemble input tensors (docs crossing a
    boundary appear once per sequence they touch; the final partial
    sequence is kept).

    The hard part at scale is the ORDERED GLOBAL PREFIX SUM of token
    counts. Adaptive plan (house rule, both branches pinned equal by
    pytest):

    - below ``_SMALL_ROWS`` input docs (``force="driver"``): pull the
      24 B/doc stats rows, sort + cumsum on the driver.
    - above (``force="distributed"``): two-pass distributed prefix sum —
      bucket docs by the HIGH BITS of sort_key (range-partition that
      preserves global order across buckets), pass 1 folds per-bucket
      token sums from shuffle-free per-batch ``bincount`` partials
      (driver holds ``n_buckets`` numbers, never rows), pass 2 is ONE
      groupby(bucket) exchange where each bucket sorts locally and adds
      its broadcast global start offset. Nothing driver-side scales with
      corpus size except the returned manifest itself (O(docs) rows —
      callers at 100 TB write it partitioned instead of returning it).
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n = ds.count()  # parquet-metadata count: no scan
    stats = ds.map_batches(_tok_keys, fn_kwargs={"seed": seed},
                           batch_format="pyarrow", batch_size=65536)
    small = (n < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        df = stats.to_pandas().sort_values(["sort_key", "doc_id"])
        ntoks = df["n_toks"].to_numpy(np.int64)
        starts = np.cumsum(ntoks) - ntoks
        out = _expand_spans(df["doc_id"].to_numpy(np.int64), starts, ntoks, seq_len)
    else:
        shift = _U64(64 - int(n_buckets - 1).bit_length())
        nb = 1 << (64 - int(shift))

        def add_bucket(b: pa.Table) -> pa.Table:
            k = b["sort_key"].to_numpy(zero_copy_only=False)
            return b.append_column("bucket", pa.array((k >> shift).astype(np.int64)))

        def bucket_partials(b: pa.Table) -> pa.Table:
            k = b["sort_key"].to_numpy(zero_copy_only=False)
            sums = np.bincount((k >> shift).astype(np.int64),
                               weights=b["n_toks"].to_numpy(zero_copy_only=False),
                               minlength=nb)
            return pa.table({"bucket": pa.array(np.arange(nb, dtype=np.int64)),
                             "toks": pa.array(sums.astype(np.int64))})

        keyed = stats.map_batches(add_bucket, batch_format="pyarrow",
                                  batch_size=65536)
        per_bucket = keyed.map_batches(bucket_partials, batch_format="pyarrow") \
                          .to_pandas().groupby("bucket")["toks"].sum()
        totals = np.zeros(nb, dtype=np.int64)
        totals[per_bucket.index.to_numpy()] = per_bucket.to_numpy()
        offsets = np.cumsum(totals) - totals  # exclusive prefix, n_buckets scalars

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["sort_key", "doc_id"])
            ntoks = g["n_toks"].to_numpy(np.int64)
            starts = int(offsets[int(g["bucket"].iloc[0])]) + np.cumsum(ntoks) - ntoks
            return _expand_spans(g["doc_id"].to_numpy(np.int64), starts, ntoks, seq_len)

        out = keyed.groupby("bucket").map_groups(emit, batch_format="pandas").to_pandas()
    out = out.sort_values(["seq_id", "seq_start"], kind="stable").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


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
                      rows_per_file: int = 100_000, resume: bool = False,
                      pack_seq_len: int | None = None,
                      pack_text_col: str = "text") -> dict:
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

    ``pack_seq_len`` additionally writes each shard's ``packing.parquet``
    — the shard-LOCAL concat-and-chunk manifest (seq_id, doc_id,
    doc_start, seq_start, n_toks) over the shard's token stream in its
    deterministic order (how loaders pack in practice: each shard packs
    independently, so no cross-shard coordination is needed and any
    subset of shards is trainable). Tokens come from ``pack_text_col``
    (e.g. ``text_redacted`` for assembled corpora).
    """
    assigned = ds.map_batches(_add_keys, fn_kwargs={"seed": seed, "n_shards": n_shards},
                              batch_format="pyarrow", batch_size=65536)

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        import json

        s = int(g["shard"].iloc[0])
        d = os.path.join(out_dir, f"shard={s:05d}")
        marker = os.path.join(d, "_DONE.json")
        want_cfg = {"n_rows": int(len(g)), "rows_per_file": int(rows_per_file),
                    "seed": int(seed), "n_shards": int(n_shards),
                    "pack_seq_len": pack_seq_len}
        if resume and os.path.exists(marker):
            try:
                done = json.load(open(marker))
            except (OSError, ValueError):
                done = None
            if done and {k: done.get(k) for k in want_cfg} == want_cfg:
                return pd.DataFrame({"shard": [s], "n_rows": [done["n_rows"]],
                                     "n_files": [done["n_files"]],
                                     "n_seqs": [done.get("n_seqs", -1)],
                                     "skipped": [True]})
        g = g.sort_values(["sort_key", "doc_id"]).drop(columns=["shard", "sort_key"])
        os.makedirs(d, exist_ok=True)
        n_files = 0
        for j, lo in enumerate(range(0, len(g), rows_per_file)):
            part = g.iloc[lo:lo + rows_per_file]
            tmp = os.path.join(d, f".part-{j:05d}.tmp")
            part.to_parquet(tmp, index=False)
            os.replace(tmp, os.path.join(d, f"part-{j:05d}.parquet"))
            n_files = j + 1
        n_seqs = -1
        if pack_seq_len is not None:
            ntoks = (g[pack_text_col].str.count(" ") + 1).to_numpy(np.int64)
            starts = np.cumsum(ntoks) - ntoks
            spans = _expand_spans(g["doc_id"].to_numpy(np.int64), starts,
                                  ntoks, pack_seq_len)
            tmp = os.path.join(d, ".packing.tmp")
            spans.to_parquet(tmp, index=False)
            os.replace(tmp, os.path.join(d, "packing.parquet"))
            n_seqs = int(spans["seq_id"].iloc[-1]) + 1 if len(spans) else 0
        tmp = os.path.join(d, "._DONE.tmp")
        with open(tmp, "w") as f:
            json.dump({**want_cfg, "n_files": n_files, "n_seqs": n_seqs}, f)
        os.replace(tmp, marker)
        return pd.DataFrame({"shard": [s], "n_rows": [len(g)],
                             "n_files": [n_files], "n_seqs": [n_seqs],
                             "skipped": [False]})

    manifest = assigned.groupby("shard").map_groups(emit, batch_format="pandas").to_pandas()
    manifest = manifest.sort_values("shard").reset_index(drop=True)
    return {
        "n_docs": int(manifest["n_rows"].sum()),
        "n_shards_written": int(len(manifest)),
        "n_shards_skipped": int(manifest["skipped"].sum()),
        "out_dir": out_dir,
        "shards": manifest.to_dict("records"),
    }


def upsampled_corpus_ds(sf_dir: str, rates: dict[str, float] | None = None,
                        default_rate: float = 1.0, seed: int = 43,
                        max_copies: int = 64):
    """The REPLICATED corpus as a streaming Dataset — `upsample_mix`'s
    decision applied to full document rows so the mixture actually feeds
    the shard writer: each doc appears n_copies times (floor(rate) +
    hash-gated fractional copy, identical decision to upsample_mix at the
    same seed), every copy re-keyed with a fresh unique
    ``doc_id = orig·max_copies + copy`` (original kept as ``orig_doc_id``,
    replica index as ``copy``) so downstream shard/order hashing spreads
    copies across shards instead of stacking them.

    One vectorized map_batches (Arrow ``take`` row expansion), no shuffle,
    nothing driver-side; composes with ``write_shards_from``."""
    from .text_analysis import (DEFAULT_UPSAMPLE_RATES, check_upsample_max_copies,
                                replicate_rekey_batch, upsample_rate_parts)

    rates = DEFAULT_UPSAMPLE_RATES if rates is None else rates
    check_upsample_max_copies(rates, default_rate, max_copies)
    mix = splitmix64(np.array([seed], _U64))[0]
    parts = {src: upsample_rate_parts(r) for src, r in rates.items()}
    default_parts = upsample_rate_parts(default_rate)

    def expand(batch: pa.Table) -> pa.Table:
        return replicate_rekey_batch(batch, parts, default_parts, mix,
                                     max_copies=max_copies)

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    return ds.map_batches(expand, batch_format="pyarrow", batch_size=8192)


def write_upsampled_shards(sf_dir: str, out_dir: str,
                           rates: dict[str, float] | None = None,
                           default_rate: float = 1.0, sample_seed: int = 43,
                           n_shards: int = 16, seed: int = 7,
                           rows_per_file: int = 100_000, **kw) -> dict:
    """Mixture-weighted training shards: the upsampled corpus stream
    (rates > 1 replicate) through the one groupby(shard) exchange of
    ``write_shards_from``. Copies spread deterministically across shards
    (fresh per-copy keys); rerun/resume byte-identity carries over because
    every decision stays a pure function of (doc_id, seeds)."""
    ds = upsampled_corpus_ds(sf_dir, rates=rates, default_rate=default_rate,
                             seed=sample_seed)
    manifest = write_shards_from(ds, out_dir, n_shards=n_shards, seed=seed,
                                 rows_per_file=rows_per_file, **kw)
    manifest["sample_seed"] = sample_seed
    return manifest


def train_val_test_split(sf_dir: str, seed: int = 23,
                         rates: tuple[float, float] = (0.8, 0.1),
                         force: str | None = None) -> pa.Table:
    """Deterministic hash-based train/val/test assignment with per-language
    accounting — the split step every training-corpus build ends with. A
    doc's split is a PURE function of (doc_id, seed): h = splitmix64(
    doc_id ^ mix(seed)); h < rates[0]·2^64 → train, < (rates[0]+rates[1])
    ·2^64 → val, else test — so reruns, resumes, and any parallelism
    assign identically, and a doc can never migrate between splits when
    the corpus grows (the property rate-sampling by row position lacks).
    Thresholds use the exact uint64 scale-and-clamp the samplers share
    (_sqlgen.rate_threshold bit-for-bit, so the oracle renders the same
    integers).

    One streaming pass emits per-batch (lang, split, n) partials — ≤
    3·|langs| rows per batch — folded adaptively (driver below
    _SMALL_ROWS / distributed groupby Sum). Returns (lang, split, n_docs)
    sorted by (lang, split)."""
    from ray.data.aggregate import Sum

    from ._sqlgen import rate_threshold
    from ._util import ensure_columns, n_reducers

    mix = splitmix64(np.array([seed], np.uint64))[0]
    t1 = np.uint64(rate_threshold(rates[0]))
    t2 = np.uint64(rate_threshold(rates[0] + rates[1]))
    labels = np.array(["train", "val", "test"], dtype=object)

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(np.uint64) ^ mix)
        code = np.where(h < t1, 0, np.where(h < t2, 1, 2))
        t = pa.table({"lang": batch["lang"],
                      "split": pa.array(labels[code], pa.string()),
                      "one": pa.array(np.ones(len(ids), np.int64))})
        g = t.group_by(["lang", "split"]).aggregate([("one", "sum")])
        return g.rename_columns(["lang", "split", "n"])

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=32768)
    small = (ds.count() < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"lang": "object", "split": "object", "n": "int64"})
        g = pdf.groupby(["lang", "split"], as_index=False)["n"].sum()
    else:
        g = (parts.repartition(n_reducers()).groupby(["lang", "split"])
             .aggregate(Sum("n", alias_name="n"))).to_pandas()
        g = ensure_columns(g, {"lang": "object", "split": "object", "n": "int64"})
    g = g.sort_values(["lang", "split"]).reset_index(drop=True)
    return pa.table({"lang": pa.array(g["lang"], pa.string()),
                     "split": pa.array(g["split"], pa.string()),
                     "n_docs": pa.array(g["n"].to_numpy(np.int64), pa.int64())})


def compact_parquet_dir(in_dir: str, out_dir: str,
                        rows_per_file: int = 100_000,
                        resume: bool = False) -> dict:
    """Small-files compaction: rewrite a (possibly thousand-file) parquet
    directory into bounded-row output files — the janitor operator every
    long-lived 100 TB corpus needs after incremental appends / per-shard
    writers leave it fragmented. Streaming, content-preserving and
    verifiable:

    - ONE ``read_parquet(dir)`` stream re-batched to ``rows_per_file``
      rows per output file (Ray's streaming executor coalesces the small
      inputs; nothing materializes);
    - files land atomically (tmp + rename) as ``part-NNNNN.parquet`` with
      a ``_DONE.json`` manifest (input fingerprint, row/file counts)
      written LAST — ``resume=True`` returns immediately when the marker
      matches the current input fingerprint (file names + sizes + mtimes:
      a changed input re-compacts);
    - the manifest carries an ORDER-INVARIANT content digest
      (mod-2^64 sum of row hashes over ALL columns via the stable row
      fingerprint of `_row_digest`) computed on the WRITTEN files, and
      `verify_compaction` recomputes the same digest over the input —
      byte-level proof the rewrite lost and changed nothing, independent
      of row order and file boundaries.

    Returns the manifest dict (n_rows, n_files_in, n_files_out, digest).

    Scale shape: the READ is distributed; the bounded-row rewrite loop is
    deliberately driver-side (file numbering needs a total order). At
    100 TB you parallelize ACROSS partition directories — one
    compact_parquet_dir call per `shard=NNNNN/` dir, each with its own
    manifest — not within one; the per-dir manifests make that trivially
    resumable and the digests still verify per dir.
    """
    import glob as _glob
    import json as _json
    import os

    import pyarrow.parquet as _pq
    import ray.data as rd

    files = sorted(_glob.glob(os.path.join(in_dir, "**", "*.parquet"),
                              recursive=True))
    if not files:
        raise ValueError(f"no parquet files under {in_dir}")
    fp = [(os.path.relpath(f, in_dir), os.path.getsize(f),
           os.stat(f).st_mtime_ns) for f in files]
    marker = os.path.join(out_dir, "_DONE.json")
    if resume and os.path.exists(marker):
        with open(marker) as f:
            m = _json.load(f)
        if m.get("input_fingerprint") == [list(x) for x in fp] \
                and m.get("rows_per_file") == rows_per_file:
            return m
    os.makedirs(out_dir, exist_ok=True)
    for old in _glob.glob(os.path.join(out_dir, "part-*.parquet")):
        os.remove(old)

    ds = rd.read_parquet(files)
    n_rows = 0
    n_out = 0
    digest = 0  # python int, reduced mod 2^64 per batch
    # iter_batches streams: one bounded-row file at a time is in memory
    for batch in ds.iter_batches(batch_size=rows_per_file,
                                 batch_format="pyarrow"):
        tmp = os.path.join(out_dir, f".part-{n_out:05d}.tmp")
        dst = os.path.join(out_dir, f"part-{n_out:05d}.parquet")
        _pq.write_table(batch, tmp)
        os.replace(tmp, dst)
        digest = (digest + int(_row_digest(batch))) % (1 << 64)
        n_rows += batch.num_rows
        n_out += 1
    manifest = {
        "n_rows": int(n_rows),
        "n_files_in": len(files),
        "n_files_out": int(n_out),
        "rows_per_file": int(rows_per_file),
        "digest": int(digest),  # unsigned 0..2^64-1; JSON bigint
        "input_fingerprint": [list(x) for x in fp],
    }
    tmp = os.path.join(out_dir, "._DONE.tmp")
    with open(tmp, "w") as f:
        _json.dump(manifest, f, indent=1)
    os.replace(tmp, marker)
    return manifest


def _row_digest(batch: "pa.Table") -> np.uint64:
    """Order-invariant content digest of a batch: mod-2^64 sum of per-row
    fingerprints, each the splitmix64-chained hash of EVERY column's
    string rendering (stable across file boundaries and row order — the
    corpus_checksum discipline generalized to arbitrary schemas)."""
    from ..kernels.hashing import hash_arrow_strings, splitmix64

    acc = np.zeros(batch.num_rows, np.uint64)
    for i, name in enumerate(sorted(batch.column_names)):
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = hash_arrow_strings(col.cast(pa.string()), seed=i + 1)
        acc = splitmix64(acc ^ h)
    return acc.sum(dtype=np.uint64)


def verify_compaction(in_dir: str, out_dir: str) -> bool:
    """Recompute the order-invariant digest over the INPUT directory and
    compare with the compaction manifest — True iff the rewrite preserved
    every row exactly (any dropped/duplicated/altered row changes the
    mod-2^64 sum)."""
    import glob as _glob
    import json as _json
    import os

    import ray.data as rd

    with open(os.path.join(out_dir, "_DONE.json")) as f:
        manifest = _json.load(f)
    files = sorted(_glob.glob(os.path.join(in_dir, "**", "*.parquet"),
                              recursive=True))
    digest = 0
    n = 0
    for batch in rd.read_parquet(files).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        digest = (digest + int(_row_digest(batch))) % (1 << 64)
        n += batch.num_rows
    return bool(n == manifest["n_rows"]
                and int(digest) == int(manifest["digest"]))
