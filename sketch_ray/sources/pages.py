"""Deterministic Common-Crawl-style ``pages`` fixture generator (FIXTURES.md F1/F2).

Everything derives from an explicit seed via counter-based RNG — regeneration is
idempotent, no external data. The generator writes ground-truth ``text`` FIRST
and then wraps it into ``html`` (entities, bold spans, comments, a script
block), so the per-row invariant required by BASELINE.json.input_hint —
``extract_text(html)`` byte-identical to ``text`` — is testable by
construction. Reference analog: the deterministic FASTA parse
(reference src/fasta.cpp:60-116) whose output is identical across all three
CPU implementations.

Schema: url: string, warc_ts: timestamp[us], html: binary, text: large_string,
lang: string  (BASELINE.json.input_hint).
"""

from __future__ import annotations

import html as _html
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["en", "es", "de", "fr"]
# planted hot tokens (analog of the reference's planted 20-bp motif,
# BASELINE.md): emerging ones appear only in the "test" snapshot, persistent
# ones in both — drives the emerging-heavy-hitter pipeline end to end.
HOT_EMERGING = ["zx_emerging_alpha", "zx_emerging_beta", "zx_emerging_gamma"]
HOT_PERSISTENT = ["zx_persistent_one", "zx_persistent_two"]
# a few tokens containing HTML-special chars so escaping is exercised
SPECIAL_TOKENS = ["a&b", "x<y", 'q"z', "m>n"]


def _make_text(rng: np.random.Generator, vocab: int, hot: list[str], hot_rate: float) -> str:
    n_tokens = int(rng.integers(50, 401))
    ranks = rng.zipf(1.2, size=n_tokens)
    ranks = np.minimum(ranks, vocab) - 1
    toks = [f"tok{r:06d}" for r in ranks]
    # sprinkle special-char tokens
    for i in range(0, n_tokens, 37):
        toks[i] = SPECIAL_TOKENS[int(rng.integers(len(SPECIAL_TOKENS)))]
    # plant hot tokens
    if hot and rng.random() < hot_rate:
        k = hot[int(rng.integers(len(hot)))]
        pos = int(rng.integers(len(toks)))
        toks[pos] = k
    return " ".join(toks)


def _wrap_html(rng: np.random.Generator, text: str, title: str) -> bytes:
    """Wrap extracted-ground-truth text into noisy HTML. ``extract_text`` must
    invert this exactly: head/script/comments dropped, tags stripped,
    entities unescaped, whitespace collapsed."""
    words = text.split(" ")
    parts = []
    i = 0
    while i < len(words):
        n = int(rng.integers(8, 24))
        para = words[i : i + n]
        esc = [_html.escape(w) for w in para]
        # bold a random word in the paragraph (tag must strip cleanly)
        if esc and rng.random() < 0.5:
            j = int(rng.integers(len(esc)))
            esc[j] = f"<b>{esc[j]}</b>"
        parts.append("<p>" + " ".join(esc) + "</p>")
        if rng.random() < 0.2:
            parts.append("<!-- comment block -->")
        i += n
    body = "\n".join(parts)
    doc = (
        f"<html><head><title>{_html.escape(title)}</title>"
        f"<script>var t = {int(rng.integers(1 << 30))};</script>"
        f"<style>p {{ margin: 0 }}</style></head>\n"
        f"<body>\n{body}\n</body></html>"
    )
    return doc.encode("utf-8")


def generate_pages(
    n_rows: int,
    seed: int = 42,
    n_hosts: int = 100,
    vocab: int = 5000,
    snapshot: str = "test",
    hot_rate: float = 0.02,
    ts_base: str = "2026-01-01",
) -> pa.Table:
    """Generate a deterministic pages table. ``snapshot="test"`` plants both
    emerging and persistent hot tokens; ``"control"`` plants only persistent
    ones (FIXTURES.md F2)."""
    hot = HOT_EMERGING + HOT_PERSISTENT if snapshot == "test" else HOT_PERSISTENT
    urls, texts, htmls, langs = [], [], [], []
    host_counters: dict[int, int] = {}
    base = np.datetime64(f"{ts_base}T00:00:00", "us")
    ts = np.empty(n_rows, dtype="datetime64[us]")
    lang_p = np.array([0.55, 0.2, 0.15, 0.1])
    for row in range(n_rows):
        rng = np.random.default_rng([seed, 0 if snapshot == "test" else 1, row])
        host = int(np.minimum(rng.zipf(1.1), n_hosts) - 1)
        path = host_counters.get(host, 0)
        host_counters[host] = path + 1
        urls.append(f"https://host{host:05d}.example/{snapshot}/p{path:06d}")
        text = _make_text(rng, vocab, hot, hot_rate)
        texts.append(text)
        htmls.append(_wrap_html(rng, text, title=f"page {row}"))
        langs.append(LANGS[int(rng.choice(len(LANGS), p=lang_p))])
        ts[row] = base + np.timedelta64(row * 137, "s")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages_fixture(
    out_dir: str,
    n_rows: int = 500,
    seed: int = 42,
    n_files: int = 4,
    **kw,
) -> str:
    """Write a partitioned pages fixture (one file per shard — the resumable
    layout). Idempotent: same (seed, n_rows) → byte-identical files."""
    os.makedirs(out_dir, exist_ok=True)
    table = generate_pages(n_rows, seed=seed, **kw)
    bounds = np.linspace(0, n_rows, n_files + 1).astype(int)
    for i in range(n_files):
        part = table.slice(bounds[i], bounds[i + 1] - bounds[i])
        pq.write_table(part, os.path.join(out_dir, f"part-{i:05d}.parquet"))
    return out_dir


def write_pages_jsonl(out_dir: str, n_rows: int = 500, seed: int = 42,
                      n_files: int = 4, **kw) -> str:
    """JSONL flavor of the fixture (html base64-encoded, warc_ts ISO-8601) —
    exercises the non-Parquet ingest path."""
    import base64
    import json

    os.makedirs(out_dir, exist_ok=True)
    table = generate_pages(n_rows, seed=seed, **kw)
    bounds = np.linspace(0, n_rows, n_files + 1).astype(int)
    rows = table.to_pylist()
    for i in range(n_files):
        with open(os.path.join(out_dir, f"part-{i:05d}.jsonl"), "w") as f:
            for r in rows[bounds[i]: bounds[i + 1]]:
                f.write(json.dumps({
                    "url": r["url"],
                    "warc_ts": r["warc_ts"].isoformat(),
                    "html_b64": base64.b64encode(r["html"]).decode("ascii"),
                    "text": r["text"],
                    "lang": r["lang"],
                }) + "\n")
    return out_dir


def read_pages_jsonl(path: str):
    """ray.data.read_json over the JSONL fixture, normalized back to the
    canonical pages schema (url, warc_ts: timestamp[us], html: binary,
    text: large_string, lang) in a vectorized map_batches — the ingest
    adapter pattern for non-Parquet source formats."""
    import base64

    import pyarrow.compute as pc
    import ray.data as rd

    def normalize(batch: pa.Table) -> pa.Table:
        html = pa.array(
            [base64.b64decode(x) for x in batch["html_b64"].to_pylist()],
            pa.binary(),
        )
        ts_col = batch["warc_ts"].combine_chunks()
        if pa.types.is_timestamp(ts_col.type):  # read_json may pre-parse ISO strings
            ts = ts_col.cast(pa.timestamp("us"))
        else:
            ts = pc.strptime(ts_col, format="%Y-%m-%dT%H:%M:%S", unit="us")
        return pa.table(
            {
                "url": batch["url"].combine_chunks().cast(pa.string()),
                "warc_ts": ts,
                "html": html,
                "text": batch["text"].combine_chunks().cast(pa.large_string()),
                "lang": batch["lang"].combine_chunks().cast(pa.string()),
            }
        )

    return rd.read_json(path).map_batches(normalize, batch_format="pyarrow", batch_size=4096)


def write_pages_csv(out_dir: str, n_rows: int = 500, seed: int = 42,
                    n_files: int = 4, **kw) -> str:
    """CSV flavor of the fixture (html base64, ts ISO) — third ingest format."""
    import base64
    import csv as _csv

    os.makedirs(out_dir, exist_ok=True)
    table = generate_pages(n_rows, seed=seed, **kw)
    bounds = np.linspace(0, n_rows, n_files + 1).astype(int)
    rows = table.to_pylist()
    for i in range(n_files):
        with open(os.path.join(out_dir, f"part-{i:05d}.csv"), "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["url", "warc_ts", "html_b64", "text", "lang"])
            for r in rows[bounds[i]: bounds[i + 1]]:
                w.writerow([r["url"], r["warc_ts"].isoformat(),
                            base64.b64encode(r["html"]).decode("ascii"),
                            r["text"], r["lang"]])
    return out_dir


def read_pages_csv(path: str):
    """ray.data.read_csv over the CSV fixture → canonical pages schema."""
    import base64

    import pyarrow.compute as pc
    import ray.data as rd

    def normalize(batch: pa.Table) -> pa.Table:
        html = pa.array(
            [base64.b64decode(x) for x in batch["html_b64"].to_pylist()], pa.binary()
        )
        ts_col = batch["warc_ts"].combine_chunks()
        if pa.types.is_timestamp(ts_col.type):
            ts = ts_col.cast(pa.timestamp("us"))
        else:
            ts = pc.strptime(ts_col, format="%Y-%m-%dT%H:%M:%S", unit="us")
        return pa.table(
            {
                "url": batch["url"].combine_chunks().cast(pa.string()),
                "warc_ts": ts,
                "html": html,
                "text": batch["text"].combine_chunks().cast(pa.large_string()),
                "lang": batch["lang"].combine_chunks().cast(pa.string()),
            }
        )

    return rd.read_csv(path).map_batches(normalize, batch_format="pyarrow", batch_size=4096)
