"""JSONL / CSV source-format parity (SURVEY §2.1 source breadth).

The reference streams FASTA (fasta_reader.hpp:15-96); web-scale corpora
arrive as JSONL (WET/WARC derivatives) and CSV exports as often as Parquet.
This module round-trips gate tables through Ray Data's native
``write_json`` / ``read_json`` and ``write_csv`` / ``read_csv`` so the SAME
aggregations run over text-format inputs and are value-hash-gated against
the parquet-reading DuckDB oracle — the gate passes only if the transport
is lossless (string escaping, unicode, int width all survive).

The export is test scaffolding (a distributed Ray write, one file per
block — exactly how a real corpus lands on disk), memoized per
(parquet path, mtime, size); the READERS are the product surface.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa

_EXPORT_BASE = "/tmp/sketch_ray_textio"


def _export(sf_dir: str, table: str, columns: list[str], fmt: str) -> str:
    """Distributed Ray write of ``table``'s ``columns`` as JSONL or CSV
    under /tmp, memoized on the source parquet's file identity (the
    ``dedup._doc_classes_for`` pattern): a manifest pins (path, mtime_ns,
    size, fmt, columns); any mismatch rebuilds."""
    import ray.data as rd

    src = os.path.abspath(os.path.join(sf_dir, f"{table}.parquet"))
    st = os.stat(src)
    key = {"src": src, "mtime_ns": st.st_mtime_ns, "size": st.st_size,
           "fmt": fmt, "columns": columns}
    base = os.path.basename(os.path.abspath(sf_dir))
    out = f"{_EXPORT_BASE}/{base}/{table}.{fmt}"
    manifest = f"{out}/MANIFEST"  # extension-less: invisible to the
    # file_extensions=["json"/"csv"] readers scanning the same directory
    try:
        with open(manifest) as f:
            if json.load(f) == key:
                return out
    except (OSError, ValueError):
        pass
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    ds = rd.read_parquet(src, columns=columns)
    if fmt == "jsonl":
        ds.write_json(out)
    else:
        ds.write_csv(out)
    with open(manifest, "w") as f:
        json.dump(key, f)
    return out


def read_jsonl(path: str, **kwargs):
    """Newline-delimited JSON → Dataset (pyarrow JSON reader per file;
    streaming, no driver materialization)."""
    import ray.data as rd

    return rd.read_json(path, file_extensions=["json"], **kwargs)


def read_csv(path: str, **kwargs):
    """CSV → Dataset (pyarrow CSV reader per file, types inferred)."""
    import ray.data as rd

    return rd.read_csv(path, file_extensions=["csv"], **kwargs)


def jsonl_tokens_per_lang(sf_dir: str) -> pa.Table:
    """``tokens_per_lang`` computed over a JSONL round-trip of the
    documents table: distributed export → ``read_json`` → the SAME shared
    fold as the parquet query (``exact.tokens_per_lang_over``).
    Hash-gated against the parquet-reading oracle, so any JSON escaping
    loss (newlines, quotes, unicode in ``text``) fails the gate."""
    from ..pipelines.exact import tokens_per_lang_over

    path = _export(sf_dir, "documents", ["text", "lang"], "jsonl")
    return tokens_per_lang_over(read_jsonl(path))


def csv_events_per_type(sf_dir: str) -> pa.Table:
    """``events_per_type`` (counts + distinct users) computed over a CSV
    round-trip of the events table: distributed export → ``read_csv`` →
    the SAME shared adaptive fold as the parquet query
    (``exact.events_per_type_over``, driver fold below _SMALL_ROWS).
    Hash-gated against the parquet-reading oracle: int width and string
    quoting must survive the text transport."""
    from ..pipelines.exact import events_per_type_over

    path = _export(sf_dir, "events", ["event_type", "user_id"], "csv")
    ds = read_csv(path)
    return events_per_type_over(ds, ds.count())
