"""Text-analysis operators over ``documents``: quality scoring, regex token
counting, language ID, document fingerprinting.

All hot paths are vectorized Arrow/numpy kernels inside ``map_batches``
(``pc.split_pattern`` / ``pc.count_substring_regex`` / columnar hashing) —
no per-row Python in any per-token stage. Quality and regex stats are exact
and SQL-oracle-gated; language ID and fingerprints are deterministic
(seeded) and rows-only gated with pytest-pinned behavior.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.hashing import hash_arrow_strings, splitmix64
from ..stages.tokenize import flat_tokens
from ._util import ensure_columns, n_reducers, round6

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
WORD_RE = "[a-z]+|[0-9]+"

_U64 = np.uint64

# tiny deterministic per-language marker profiles (n-gram-heuristic stand-in;
# a real model would load in an actor's __init__ — same plumbing)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _quality_stats_batch(batch: pa.Table) -> pa.Table:
    """Vectorized per-doc quality features for one batch (shared by
    quality_scores and its at-scale digest twin)."""
    stop_set = pa.array(list(STOPWORDS), pa.large_string())
    text = batch["text"].combine_chunks()
    toks = pc.split_pattern(text, " ")
    ntok = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
    nchr = pc.utf8_length(text).cast(pa.int64()).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=stop_set.cast(flat.type)).to_numpy(zero_copy_only=False)
    doc_index = np.repeat(np.arange(len(ntok)), ntok)
    n_stop = np.zeros(len(ntok), dtype=np.int64)
    np.add.at(n_stop, doc_index, is_stop.astype(np.int64))
    denom = np.maximum(ntok, 1)
    stop_ratio = round6(n_stop / denom)
    # tokens are single-space joined => total token chars = n_chars - (n_tokens - 1)
    mean_len = round6((nchr - (ntok - 1)) / denom)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(ntok, pa.int64()),
            "stopword_ratio": pa.array(stop_ratio, pa.float64()),
            "mean_token_len": pa.array(mean_len, pa.float64()),
        }
    )


def quality_scores(sf_dir: str) -> pa.Table:
    """Per-document quality features (exact, oracle-gated):
    n_tokens, stopword_ratio, mean_token_len — the standard cheap quality
    filters of a web-corpus pipeline, all from two vectorized kernels."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    df = ensure_columns(
        ds.map_batches(_quality_stats_batch, batch_format="pyarrow",
                       batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_tokens": "int64", "stopword_ratio": "float64",
         "mean_token_len": "float64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def regex_token_stats(sf_dir: str) -> pa.Table:
    """BPE-ish regex token counting (exact, oracle-gated): number of
    ``[a-z]+|[0-9]+`` matches per document via the vectorized RE2 kernel."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        n = pc.count_substring_regex(text, WORD_RE).cast(pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "n_regex_tokens": n})

    df = ensure_columns(
        ds.map_batches(stats, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_regex_tokens": "int64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _gopher_signal_batch(batch: pa.Table) -> pa.Table:
    """Vectorized per-doc repetition/quality signals for one batch
    (shared by the query and the filter sink)."""
    text = batch["text"].combine_chunks()
    toks = pc.split_pattern(text, " ")
    ntok = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n = len(ntok)
    flat = pc.list_flatten(toks)
    tlen = pc.utf8_length(flat).cast(pa.int64()).to_numpy(zero_copy_only=False)
    doc_index = np.repeat(np.arange(n), ntok)
    max_len = np.zeros(n, dtype=np.int64)
    np.maximum.at(max_len, doc_index, tlen)
    # distinct / modal token counts per doc: one lexsort + run-length pass
    # (no per-doc Python); 64-bit hashes stand in for the strings —
    # collision probability ~(vocab²/2⁶⁴) per doc, negligible
    h = hash_arrow_strings(flat, seed=7)
    order = np.lexsort((h, doc_index))
    hd, hh = doc_index[order], h[order]
    if len(hd):
        new_run = np.concatenate([[True], (hd[1:] != hd[:-1]) | (hh[1:] != hh[:-1])])
        run_doc = hd[new_run]
        run_len = np.diff(np.append(np.flatnonzero(new_run), len(hd)))
        n_unique = np.bincount(run_doc, minlength=n)
        top_cnt = np.zeros(n, dtype=np.int64)
        np.maximum.at(top_cnt, run_doc, run_len)
    else:
        n_unique = np.zeros(n, dtype=np.int64)
        top_cnt = np.zeros(n, dtype=np.int64)
    denom = np.maximum(ntok, 1)
    nchr = pc.utf8_length(text).cast(pa.int64()).to_numpy(zero_copy_only=False)
    nsym = pc.count_substring_regex(text, "[^a-z0-9 ]").cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(ntok, pa.int64()),
            "max_token_len": pa.array(max_len, pa.int64()),
            "frac_unique_tokens": pa.array(round6(n_unique / denom), pa.float64()),
            "top_token_frac": pa.array(round6(top_cnt / denom), pa.float64()),
            "symbol_ratio": pa.array(round6(nsym / np.maximum(nchr, 1)), pa.float64()),
        }
    )


def gopher_quality_signals(sf_dir: str) -> pa.Table:
    """Gopher-style repetition/quality filter signals per document (exact,
    oracle-gated): max token length, fraction of unique tokens, modal-token
    fraction, symbol-to-char ratio — the standard document-level filters of
    a web-corpus cleaning pipeline (Rae et al. 2021 §A1.1 style). One
    lexsort + run-length pass per batch; no per-doc Python."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    df = ensure_columns(
        ds.map_batches(_gopher_signal_batch, batch_format="pyarrow",
                       batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_tokens": "int64", "max_token_len": "int64",
         "frac_unique_tokens": "float64", "top_token_frac": "float64",
         "symbol_ratio": "float64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _horner_grams(h: np.ndarray, doc_index: np.ndarray,
                  n: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling-Horner combine of n consecutive token hashes (FNV prime,
    splitmix64 finalize); a gram is valid iff it does not cross a doc
    boundary. THE single gram-hash construction — _dup_ngram_batch (in-doc
    repetition) and _flat_gram_hashes (corpus-wide dup spans) must stay
    byte-identical. Returns (uint64 gram hash per valid start,
    int64 flat start index)."""
    m = len(h) - n + 1
    if m <= 0:
        return np.array([], np.uint64), np.array([], np.int64)
    prime = np.uint64(0x100000001B3)
    acc = h[:m].copy()
    for j in range(1, n):
        acc = acc * prime + h[j:m + j]  # uint64 wraparound by design
    acc = splitmix64(acc)
    valid = doc_index[:m] == doc_index[n - 1:]
    return acc[valid], np.flatnonzero(valid).astype(np.int64)


def _dup_ngram_batch(batch: pa.Table, ns: tuple[int, ...]) -> pa.Table:
    """Per-doc duplicate n-gram occurrence fractions for one batch: for each
    n, the share of n-gram occurrences whose n-gram appears more than once
    in the document (Rae et al. 2021 §A1.1 dup_ngram filters, token-level).
    Vectorized: one token-hash pass, then per n a rolling Horner combine
    over the flat hash array + one lexsort/run-length — no per-doc Python.
    Grouping is by 64-bit hash (in-doc collision odds ~tokens²/2⁶⁴,
    negligible; the SQL oracle groups the literal n-gram strings)."""
    text = batch["text"].combine_chunks()
    toks = pc.split_pattern(text, " ")
    ntok = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_docs = len(ntok)
    flat = pc.list_flatten(toks)
    h = hash_arrow_strings(flat, seed=7)
    doc_index = np.repeat(np.arange(n_docs), ntok)
    cols = {"doc_id": batch["doc_id"]}
    for n in ns:
        g, start_idx = _horner_grams(h, doc_index, n)
        d = doc_index[start_idx]
        order = np.lexsort((g, d))
        g, d = g[order], d[order]
        dup = np.zeros(n_docs, dtype=np.int64)
        if len(g):
            new_run = np.concatenate([[True], (d[1:] != d[:-1]) | (g[1:] != g[:-1])])
            run_doc = d[new_run]
            run_len = np.diff(np.append(np.flatnonzero(new_run), len(d)))
            dup = np.bincount(run_doc, weights=run_len * (run_len > 1),
                              minlength=n_docs).astype(np.int64)
        tot = np.maximum(ntok - n + 1, 0)
        cols[f"dup_{n}gram_frac"] = pa.array(
            round6(dup / np.maximum(tot, 1)), pa.float64())
    return pa.table(cols)


def dup_ngram_fracs(sf_dir: str, ns: tuple[int, ...] = (2, 3, 4)) -> pa.Table:
    """Gopher-style duplicate n-gram repetition signals per document (exact,
    oracle-gated): for n in ``ns``, the fraction of n-gram occurrences that
    belong to an n-gram repeated within the document — the dup_2gram /
    dup_3gram / dup_4gram filters of a web-corpus cleaning pipeline. A doc
    shorter than n tokens scores 0. Same scale shape as
    ``gopher_quality_signals``: one streaming map_batches, no shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    df = ensure_columns(
        ds.map_batches(_dup_ngram_batch, fn_kwargs={"ns": tuple(ns)},
                       batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", **{f"dup_{n}gram_frac": "float64" for n in ns}})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _flat_gram_hashes(batch: pa.Table, n: int):
    """Rolling-Horner n-gram hashes for one batch: returns (gram hash per
    valid start as int64 view, flat token index of each valid start, token
    doc_index, tokens-per-doc). Valid = the gram does not cross a doc
    boundary. Hash construction shared with _dup_ngram_batch via
    _horner_grams (seed 7, FNV prime Horner, splitmix64 finalize)."""
    text = batch["text"].combine_chunks()
    toks = pc.split_pattern(text, " ")
    ntok = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    h = hash_arrow_strings(flat, seed=7)
    doc_index = np.repeat(np.arange(len(ntok)), ntok)
    g, start_idx = _horner_grams(h, doc_index, n)
    return g.view(np.int64), start_idx, doc_index, ntok


def token_entropy(sf_dir: str) -> pa.Table:
    """Per-document Shannon entropy of the token distribution (nats) — a
    repetition/diversity quality signal (low entropy = chant-like or
    boilerplate text; complements the Gopher dup_ngram filters). One
    streaming pass, fully vectorized: token hashes → per-doc run-length
    counts (lexsort) → entropy = ln(n) − Σc·ln(c)/n via one bincount."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ent(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        toks = pc.split_pattern(text, " ")
        ntok = pc.list_value_length(toks).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n_docs = len(ntok)
        h = hash_arrow_strings(pc.list_flatten(toks), seed=7)
        doc_index = np.repeat(np.arange(n_docs), ntok)
        order = np.lexsort((h, doc_index))
        hs, ds_ = h[order], doc_index[order]
        new_run = np.concatenate([[True], (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])]) \
            if len(hs) else np.array([], bool)
        run_doc = ds_[new_run]
        run_len = np.diff(np.append(np.flatnonzero(new_run), len(ds_)))
        s = np.bincount(run_doc, weights=run_len * np.log(run_len),
                        minlength=n_docs)
        n = np.maximum(ntok, 1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(ntok, pa.int64()),
            "token_entropy": pa.array(np.round(np.log(n) - s / n, 6),
                                      pa.float64()),
        })

    df = ensure_columns(
        ds.map_batches(ent, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_tokens": "int64", "token_entropy": "float64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


_SMALL_DOCS = 2_000_000  # below this the distributed gram-count fold is pure overhead


def _dup_gram_set(ds, n: int, force: str | None) -> np.ndarray:
    """Sorted int64 hashes of every n-gram occurring >= 2 times corpus-wide
    (any doc, including a repeat within one doc) — the shared count pass of
    dup_span_stats / remove_dup_spans. Adaptive fold: driver bincount below
    ``_SMALL_DOCS`` docs, else a distributed groupby(g).sum with only the
    survivors (count >= 2) pulled — dup-set-sized either way."""
    from ray.data.aggregate import Sum

    def gram_partials(batch: pa.Table) -> pa.Table:
        g, _, _, _ = _flat_gram_hashes(batch, n)
        uniq, cnt = np.unique(g, return_counts=True)
        return pa.table({"g": pa.array(uniq, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    partials = ds.map_batches(gram_partials, batch_format="pyarrow",
                              batch_size=8192)
    small = (ds.count() < _SMALL_DOCS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(partials.to_pandas(), {"g": "int64", "c": "int64"})
        uniq, inv = np.unique(pdf["g"].to_numpy(), return_inverse=True)
        tot = np.bincount(inv, weights=pdf["c"].to_numpy())
        dup = uniq[tot >= 2]
    else:
        # few-block sort-shuffle pathology: spread before the groupby
        counts = partials.repartition(n_reducers()).groupby("g") \
            .aggregate(Sum("c", alias_name="cnt"))
        dup_df = ensure_columns(counts.filter(expr="cnt >= 2").to_pandas(),
                                {"g": "int64"})  # dup clusters only
        dup = np.sort(dup_df["g"].to_numpy())
    return np.ascontiguousarray(dup, dtype=np.int64)


def dup_span_stats(sf_dir: str, n: int = 4, force: str | None = None) -> pa.Table:
    """Cross-document duplicate n-gram span coverage — the exact-substring
    dedup statistic of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better") at n-gram granularity: an n-gram is a
    duplicate if it occurs >= 2 times anywhere in the corpus (any doc,
    including a repeat within one doc); per doc we report how many of its
    token positions fall inside at least one duplicate n-gram.

    Scale shape — two streaming passes, dup-set-sized driver state:
    1. count pass: per-batch unique (gram-hash, count) partials; folded on
       the driver below ``_SMALL_DOCS`` docs, else a distributed
       groupby(gram).sum with the survivors (count >= 2) pulled — output
       is sized by DUPLICATED content, not the corpus (same discipline as
       dedup._shared_group_rows).
    2. mark pass: broadcast the sorted dup-hash array once (ray.put +
       per-worker cache), searchsorted membership per batch, position
       coverage via a +1/-1 difference array + cumsum — no per-doc Python.

    Grouping is by 64-bit hash (collision odds ~grams²/2⁶⁴, negligible;
    the SQL oracle groups the literal n-gram strings).

    Broadcast-size honesty: the dup-hash array is 8 B per duplicated
    n-gram. At web scale with SMALL n most n-grams repeat corpus-wide, so
    run this operator in its real regime — Lee et al. use ~50-token
    spans, where duplicated grams are boilerplate/verbatim-copy sized
    (rare), exactly what the statistic exists to find. n=4 here matches
    the short synthetic documents.

    ``force`` pins the count-fold branch for tests: "driver"/"distributed".
    Returns (doc_id, n_tokens, n_dup_grams, dup_span_frac) sorted by doc_id.
    """
    import ray

    from ..stages.broadcast import cached

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ref = ray.put(_dup_gram_set(ds, n, force))

    def mark(batch: pa.Table) -> pa.Table:
        hs = cached(ref)
        g, start_idx, doc_index, ntok = _flat_gram_hashes(batch, n)
        n_docs = len(ntok)
        if len(hs) and len(g):
            pos = np.minimum(np.searchsorted(hs, g), len(hs) - 1)
            dup_starts = start_idx[hs[pos] == g]
        else:
            dup_starts = np.array([], np.int64)
        t_tokens = len(doc_index)
        diff = np.zeros(t_tokens + n + 1, np.int64)
        np.add.at(diff, dup_starts, 1)
        np.add.at(diff, dup_starts + n, -1)
        covered_mask = np.cumsum(diff[:t_tokens]) > 0
        covered = np.bincount(doc_index, weights=covered_mask,
                              minlength=n_docs) if t_tokens else np.zeros(n_docs)
        ndup = np.bincount(doc_index[dup_starts], minlength=n_docs) \
            if len(dup_starts) else np.zeros(n_docs, np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(ntok, pa.int64()),
            "n_dup_grams": pa.array(ndup.astype(np.int64), pa.int64()),
            "dup_span_frac": pa.array(
                round6(covered / np.maximum(ntok, 1)), pa.float64()),
        })

    df = ensure_columns(
        ds.map_batches(mark, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_tokens": "int64", "n_dup_grams": "int64",
         "dup_span_frac": "float64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def quality_zscores(sf_dir: str, force: str | None = None) -> pa.Table:
    """Per-language z-score normalization of document length (n_tokens) —
    the cross-stratum score-calibration step quality filters need before a
    single global threshold makes sense (raw lengths aren't comparable
    across languages).

    Two streaming passes: per-batch per-lang (n, Σx, Σx²) INTEGER partials
    (exact — no float accumulation order to mirror) folded adaptively
    (driver below _SMALL_DOCS, else distributed groupby); the lang →
    moment map broadcasts once, the scoring pass computes
    z = (x − s/n) / sqrt((ss − s·(s/n)) / (n−1)) with the float ops in
    exactly the oracle's order. Languages with n < 2 or zero variance are
    excluded. Returns (doc_id, lang, n_tokens, z) sorted by doc_id."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.broadcast import cached

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def moment_partials(batch: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(pc.split_pattern(
            batch["text"].combine_chunks(), " ")).cast(pa.int64())
        x = ntok.to_numpy(zero_copy_only=False)
        t = pa.table({"lang": batch["lang"],
                      "n": pa.array(np.ones(len(x), np.int64)),
                      "s": ntok, "ss": pa.array(x * x, pa.int64())})
        g = t.group_by("lang").aggregate([("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["lang", "n", "s", "ss"])

    partials = ds.map_batches(moment_partials, batch_format="pyarrow",
                              batch_size=8192)
    small = (ds.count() < _SMALL_DOCS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(partials.to_pandas(),
                             {"lang": "object", "n": "int64", "s": "int64", "ss": "int64"})
        mom = pdf.groupby("lang", as_index=False).sum()
    else:
        mom = (partials.repartition(n_reducers()).groupby("lang")
               .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                          Sum("ss", alias_name="ss"))).to_pandas()
    moments = {r["lang"]: (int(r["n"]), int(r["s"]), int(r["ss"]))
               for _, r in mom.iterrows()}
    ref = ray.put(moments)

    def score(batch: pa.Table) -> pa.Table:
        mo = cached(ref)
        ntok = pc.list_value_length(pc.split_pattern(
            batch["text"].combine_chunks(), " ")).cast(pa.int64())
        x = ntok.to_numpy(zero_copy_only=False).astype(np.float64)
        codes_arr = pc.dictionary_encode(batch["lang"].combine_chunks())
        uniq = codes_arr.dictionary.to_pylist()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False)
        mu = np.empty(len(uniq)); sd = np.empty(len(uniq)); ok = np.empty(len(uniq), bool)
        for i, l in enumerate(uniq):
            n, s, ss = mo.get(l, (0, 0, 0))
            mean = s / n if n else 0.0
            var = (ss - s * mean) / (n - 1) if n >= 2 else 0.0
            mu[i], sd[i] = mean, np.sqrt(var) if var > 0 else 0.0
            ok[i] = n >= 2 and var > 0
        if len(uniq):
            keep = ok[codes]
            z = np.round((x - mu[codes]) / np.where(sd[codes] > 0, sd[codes], 1.0), 6)
        else:
            keep = np.zeros(len(x), bool); z = x
        t = pa.table({
            "doc_id": batch["doc_id"], "lang": batch["lang"],
            "n_tokens": ntok, "z": pa.array(z, pa.float64()),
        })
        return t.filter(pa.array(keep))

    df = ensure_columns(
        ds.map_batches(score, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", "lang": "object", "n_tokens": "int64", "z": "float64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def tfidf_keywords(sf_dir: str, k: int = 3, seed: int = 7,
                   force: str | None = None) -> pa.Table:
    """Per-document top-k tf-idf keywords — the classic keyword-extraction
    feature of a corpus-analysis pipeline: score(doc, token) =
    tf · ln(N / df), tf = occurrences in the doc, df = docs containing the
    token, ranked per doc by (score desc, token asc).

    Scale shape — two streaming passes, vocab-bounded state:
    1. df pass: per-batch distinct-(doc, token-hash) run-length partials;
       adaptive fold (driver bincount below ``_SMALL_DOCS`` docs, else a
       distributed groupby(g).sum) — the dup_span_stats discipline. The
       folded (hash → df) table is vocab-sized, broadcast once as a sorted
       hash array + searchsorted (the bigram-LM scoring pattern).
    2. score pass: per-(doc, token) tf via lexsort run-length, idf gather,
       per-batch pandas top-k head (docs never span batches, so per-batch
       heads are final) — ≤k rows per doc leave any task.

    Grouping is by 64-bit token hash (collision odds ~vocab²/2⁶⁴; the SQL
    oracle groups literal strings). Scores rounded 6dp on both sides and
    RANKED on the rounded value so ordering matches the oracle bit-for-bit.
    ``force`` pins the df-fold branch ("driver"/"distributed") for tests.
    Returns (doc_id, rank, token, score) sorted by (doc_id, rank)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.broadcast import cached

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs_total = ds.count()

    def flat(batch: pa.Table):
        text = batch["text"].combine_chunks()
        lists = pc.split_pattern(text, " ")
        toks = pc.list_flatten(lists)
        ntok = pc.list_value_length(lists).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # int64 view so df-pass vocab (int64) and score-pass searchsorted
        # share one sort order
        h = hash_arrow_strings(toks, seed=seed).view(np.int64)
        doc_index = np.repeat(np.arange(len(ntok)), ntok)
        order = np.lexsort((h, doc_index))
        hs, ds_ = h[order], doc_index[order]
        new_run = np.concatenate([[True], (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])]) \
            if len(hs) else np.array([], bool)
        return toks, order, hs, ds_, new_run

    def df_partials(batch: pa.Table) -> pa.Table:
        _, _, hs, _, new_run = flat(batch)
        uniq, cnt = np.unique(hs[new_run], return_counts=True)
        return pa.table({"g": pa.array(uniq, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    partials = ds.map_batches(df_partials, batch_format="pyarrow", batch_size=8192)
    small = (n_docs_total < _SMALL_DOCS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(partials.to_pandas(), {"g": "int64", "c": "int64"})
        vocab, inv = np.unique(pdf["g"].to_numpy(), return_inverse=True)
        dfreq = np.bincount(inv, weights=pdf["c"].to_numpy()).astype(np.int64)
    else:
        counts = partials.repartition(n_reducers()).groupby("g") \
            .aggregate(Sum("c", alias_name="cnt"))
        cdf = ensure_columns(counts.to_pandas(), {"g": "int64", "cnt": "int64"})
        order = np.argsort(cdf["g"].to_numpy())
        vocab = cdf["g"].to_numpy()[order]
        dfreq = cdf["cnt"].to_numpy()[order]
    idf = np.log(float(n_docs_total) / dfreq.astype(np.float64))
    ref = ray.put((np.ascontiguousarray(vocab), np.ascontiguousarray(idf)))

    def topk(batch: pa.Table) -> pa.Table:
        vocab_b, idf_b = cached(ref)
        toks, order, hs, ds_, new_run = flat(batch)
        if not len(hs):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             "token": pa.array([], pa.large_string()),
                             "score": pa.array([], pa.float64())})
        run_h = hs[new_run]
        run_doc = ds_[new_run]
        run_len = np.diff(np.append(np.flatnonzero(new_run), len(ds_)))
        pos = np.searchsorted(vocab_b, run_h)
        score = np.round(run_len * idf_b[pos], 6)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        run_tok = toks.take(pa.array(order[new_run], pa.int64()))
        pdf = pd.DataFrame({"doc_id": doc_ids[run_doc],
                            "token": run_tok.to_pandas(),
                            "score": score})
        pdf = pdf.sort_values(["doc_id", "score", "token"],
                              ascending=[True, False, True], kind="stable")
        pdf = pdf.groupby("doc_id", group_keys=False).head(k)
        pdf = pdf.assign(rank=pdf.groupby("doc_id").cumcount() + 1)
        return pa.Table.from_pandas(
            pdf[["doc_id", "rank", "token", "score"]], preserve_index=False)

    out = ensure_columns(
        ds.map_batches(topk, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", "rank": "int64", "token": "object", "score": "float64"})
    out = out.sort_values(["doc_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def remove_dup_spans(sf_dir: str, n: int = 4, force: str | None = None) -> pa.Table:
    """Exact-substring dedup REWRITE (Lee et al. 2022's removal step at
    n-gram granularity): delete every token position covered by at least
    one corpus-duplicated n-gram (the exact positions `dup_span_stats`
    counts) and re-join the survivors — turning the statistic into the
    cleaning transform.

    Same two-pass scale shape as dup_span_stats (shared count fold,
    `_dup_gram_set`): broadcast the sorted dup-hash array once, then one
    streaming rewrite pass — per batch, a difference-array coverage mask,
    one Arrow filter of the flat token array, and a vectorized per-doc
    re-join (`ListArray.from_arrays` + ``binary_join``). No per-doc
    Python, no shuffle; output rows stream (driver table here only for
    the gate). Returns (doc_id, n_tokens, n_removed, text_clean)."""
    import ray

    from ..stages.broadcast import cached

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ref = ray.put(_dup_gram_set(ds, n, force))

    def rewrite(batch: pa.Table) -> pa.Table:
        hs = cached(ref)
        g, start_idx, doc_index, ntok = _flat_gram_hashes(batch, n)
        n_docs = len(ntok)
        t_tokens = len(doc_index)
        if len(hs) and len(g):
            pos = np.minimum(np.searchsorted(hs, g), len(hs) - 1)
            dup_starts = start_idx[hs[pos] == g]
        else:
            dup_starts = np.array([], np.int64)
        diff = np.zeros(t_tokens + n + 1, np.int64)
        np.add.at(diff, dup_starts, 1)
        np.add.at(diff, dup_starts + n, -1)
        covered = np.cumsum(diff[:t_tokens]) > 0
        kept = ~covered
        flat = pc.list_flatten(pc.split_pattern(batch["text"].combine_chunks(), " "))
        kept_flat = flat.filter(pa.array(kept))
        kept_per_doc = (np.bincount(doc_index[kept], minlength=n_docs).astype(np.int64)
                        if t_tokens else np.zeros(n_docs, np.int64))
        # int64 offsets + LargeList: a batch can hold > 2^31 kept tokens
        offsets = np.concatenate(([0], np.cumsum(kept_per_doc)))
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), kept_flat.cast(pa.large_string()))
        clean = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
        removed = ntok - kept_per_doc
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(ntok, pa.int64()),
            "n_removed": pa.array(removed, pa.int64()),
            "text_clean": clean,
        })

    df = ensure_columns(
        ds.map_batches(rewrite, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_tokens": "int64", "n_removed": "int64",
         "text_clean": "object"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def quality_filter_corpus(
    sf_dir: str, out_dir: str, max_top_token_frac: float = 0.2,
    min_frac_unique: float = 0.3, max_symbol_ratio: float = 0.1,
    rows_per_file: int = 100_000,
    max_dup_ngram_fracs: dict[int, float] | None = None,
) -> dict:
    """Quality-filter sink: keep documents passing the Gopher-style
    predicates and stream them to partitioned Parquet (bounded rows/file —
    the resumable-output shape, same as dedup.write_clean_corpus). The keep
    decision is computed per batch from _gopher_signal_batch (plus
    _dup_ngram_batch when ``max_dup_ngram_fracs`` gives per-n repetition
    caps, e.g. ``{2: 0.2, 3: 0.18}``) — no shuffle, no driver
    materialization of the corpus. Returns {n_docs, n_kept, out_dir}."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    dup_ns = tuple(sorted(max_dup_ngram_fracs)) if max_dup_ngram_fracs else ()

    def keep(batch: pa.Table) -> pa.Table:
        sig = _gopher_signal_batch(batch)
        ok = (
            (sig["top_token_frac"].to_numpy(zero_copy_only=False) <= max_top_token_frac)
            & (sig["frac_unique_tokens"].to_numpy(zero_copy_only=False) >= min_frac_unique)
            & (sig["symbol_ratio"].to_numpy(zero_copy_only=False) <= max_symbol_ratio)
        )
        if dup_ns:
            dup = _dup_ngram_batch(batch, ns=dup_ns)
            for n in dup_ns:
                ok &= (dup[f"dup_{n}gram_frac"].to_numpy(zero_copy_only=False)
                       <= max_dup_ngram_fracs[n])
        return batch.filter(pa.array(ok))

    out = ds.map_batches(keep, batch_format="pyarrow", batch_size=8192)
    out.write_parquet(out_dir, min_rows_per_file=rows_per_file,
                      max_rows_per_file=rows_per_file)
    import pyarrow.parquet as pq

    n_kept = sum(pq.ParquetFile(f"{out_dir}/{f}").metadata.num_rows
                 for f in __import__("os").listdir(out_dir) if f.endswith(".parquet"))
    return {"n_docs": int(ds.count()), "n_kept": int(n_kept), "out_dir": out_dir}


def bigram_lm_scores(sf_dir: str, alpha: float = 1.0) -> pa.Table:
    """LM-perplexity quality scoring (CCNet-style): score every document by
    the add-α bigram language model of the corpus itself —
    ``P(b|a) = (c(ab)+α) / (c(a)+α·V)`` with corpus-wide counts and vocab
    size V — returning per doc the bigram count, mean ln-probability, and
    perplexity ``exp(-avg_logprob)``. Low-probability (high-ppl) documents
    are the gibberish/boilerplate a perplexity filter drops.

    Two distributed counting passes (salted unigram counts + one bigram
    groupby — both shuffle pre-aggregated vocab-sized rows, never docs),
    then the count tables are broadcast ONCE as sorted hash arrays
    (16 B/entry) and the scoring pass is a streaming map_batches with
    searchsorted lookups — no shuffle, no driver doc pull. At web scale
    the broadcast is bounded by the n-gram vocabulary; prune rare bigrams
    (count < k) before broadcasting if it outgrows worker memory —
    add-α smoothing already accounts for the pruned mass."""
    from .exact import _read as _read_exact

    score = _lm_score_fn(sf_dir, alpha)
    docs = _read_exact(sf_dir, "documents", ["doc_id", "text"])
    df = ensure_columns(
        docs.map_batches(score, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_bigrams": "int64",
         "avg_logprob": "float64", "ppl": "float64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _lm_score_fn(sf_dir: str, alpha: float = 1.0):
    """Build the corpus bigram LM once (two distributed count passes +
    one broadcast of sorted hash arrays) and return the per-batch scoring
    callable shared by ``bigram_lm_scores`` and
    ``perplexity_filter_corpus``."""
    import ray

    from .exact import token_counts_ds, _read as _read_exact
    from ..stages.broadcast import cached
    from ..stages.tokenize import ngrams
    from ray.data.aggregate import Sum

    uni = token_counts_ds(sf_dir).to_pandas()  # vocab-sized by construction
    v_size = len(uni)

    ds = _read_exact(sf_dir, "documents", ["text"])

    def big_partials(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(ngrams(batch["text"], 2))
        return pa.table({"bigram": vc.field("values").cast(pa.large_string()),
                         "partial": vc.field("counts").cast(pa.int64())})

    big = (ds.map_batches(big_partials, batch_format="pyarrow", batch_size=8192)
           .groupby("bigram").aggregate(Sum("partial", alias_name="cnt"))
           .to_pandas())  # bigram-vocab-sized

    def sorted_map(keys: pa.Array, counts: np.ndarray):
        h = hash_arrow_strings(keys, seed=3)
        order = np.argsort(h)
        return h[order], counts[order]

    uh, uc = sorted_map(pa.array(uni["token"], pa.large_string()),
                        uni["cnt"].to_numpy(np.int64))
    bh, bc = sorted_map(pa.array(big["bigram"], pa.large_string()),
                        big["cnt"].to_numpy(np.int64))
    ref = ray.put((uh, uc, bh, bc))

    def lookup(sorted_h, counts, h):
        pos = np.searchsorted(sorted_h, h)
        pos = np.minimum(pos, len(sorted_h) - 1)
        hit = sorted_h[pos] == h
        return np.where(hit, counts[pos], 0)

    a = float(alpha)

    def score(batch: pa.Table) -> pa.Table:
        uh, uc, bh, bc = cached(ref)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        flat, offsets = flat_tokens(batch["text"])
        n_docs = len(doc_ids)
        ntok = np.diff(offsets)
        m = len(flat) - 1
        if m > 0:
            doc_index = np.repeat(np.arange(n_docs), ntok)
            valid = doc_index[:m] == doc_index[1:]
            joined = pc.binary_join_element_wise(
                flat.slice(0, m), flat.slice(1, m), pa.scalar(" ", type=flat.type))
            hb = hash_arrow_strings(joined, seed=3)[valid]
            hw1 = hash_arrow_strings(flat, seed=3)[:m][valid]
            d = doc_index[:m][valid]
            lp = np.log((lookup(bh, bc, hb) + a) / (lookup(uh, uc, hw1) + a * v_size))
            n_big = np.bincount(d, minlength=n_docs).astype(np.int64)
            lp_sum = np.bincount(d, weights=lp, minlength=n_docs)
        else:
            n_big = np.zeros(n_docs, np.int64)
            lp_sum = np.zeros(n_docs)
        alp = np.where(n_big > 0, lp_sum / np.maximum(n_big, 1), 0.0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bigrams": pa.array(n_big, pa.int64()),
            "avg_logprob": pa.array(np.round(alp, 6), pa.float64()),
            "ppl": pa.array(np.round(np.exp(-alp), 6), pa.float64()),
        })

    return score


def perplexity_filter_corpus(sf_dir: str, out_dir: str, max_ppl: float,
                             alpha: float = 1.0,
                             rows_per_file: int = 100_000) -> dict:
    """Perplexity-filter sink (the CCNet cleaning step): keep documents
    whose corpus-bigram-LM perplexity is <= ``max_ppl`` and stream them to
    partitioned Parquet. Model build is the one-time broadcast of
    ``_lm_score_fn``; the keep pass is a streaming map_batches — same
    sink shape as ``quality_filter_corpus``. Docs with no bigrams score
    ppl 1.0 and are kept. Returns {n_docs, n_kept, out_dir}."""
    import ray.data as rd

    score = _lm_score_fn(sf_dir, alpha)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")

    def keep(batch: pa.Table) -> pa.Table:
        s = score(batch)
        ok = s["ppl"].to_numpy(zero_copy_only=False) <= max_ppl
        return batch.filter(pa.array(ok))

    out = ds.map_batches(keep, batch_format="pyarrow", batch_size=8192)
    out.write_parquet(out_dir, min_rows_per_file=rows_per_file,
                      max_rows_per_file=rows_per_file)
    import os

    import pyarrow.parquet as pq

    n_kept = sum(pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
                 for f in os.listdir(out_dir) if f.endswith(".parquet"))
    return {"n_docs": int(ds.count()), "n_kept": int(n_kept), "out_dir": out_dir}


class LangId:
    """Actor-pool language-ID stage: marker tables built once per actor in
    ``__init__`` (the load-model-once pattern, SURVEY.md §2.3 T4), scoring
    vectorized per batch. Deterministic; ties break by language name."""

    def __init__(self):
        self.langs = sorted(LANG_MARKERS)
        self.marker_sets = [
            pa.array(list(LANG_MARKERS[lang]), pa.large_string()) for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        toks = pc.split_pattern(text, " ")
        ntok = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        doc_index = np.repeat(np.arange(len(ntok)), ntok)
        scores = np.zeros((len(ntok), len(self.langs)), dtype=np.int64)
        for j, markers in enumerate(self.marker_sets):
            hit = pc.is_in(flat, value_set=markers.cast(flat.type)).to_numpy(zero_copy_only=False)
            np.add.at(scores[:, j], doc_index, hit.astype(np.int64))
        best = scores.argmax(axis=1)  # argmax takes first max -> ties by lang name order
        conf = round6(scores[np.arange(len(ntok)), best] / np.maximum(ntok, 1))
        pred = np.array(self.langs, dtype=object)[best]
        pred[scores.max(axis=1) == 0] = "und"
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(pred.tolist(), pa.string()),
                "confidence": pa.array(conf, pa.float64()),
            }
        )


def lang_id(sf_dir: str) -> pa.Table:
    """Predicted language per document (rows-only: heuristic output).

    The marker tables are deterministic config-derived state, so the stage
    runs as stateless tasks with a per-worker memoized LangId instance
    (stages/broadcast.cached_by_key) — fetch-once semantics on the warm
    worker pool with no actor-pool spin-up."""
    from ..stages.broadcast import cached_by_key

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    df = ds.map_batches(
        lambda b: cached_by_key("langid_markers", LangId)(b),
        batch_format="pyarrow", batch_size=8192,
    ).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _char_ngram_hashes(text: pa.Array, n: int, seed: int):
    """Rolling char-n-gram hashes per doc: (hashes uint64[m], doc_index)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # byte-level rolling hash over the utf8 buffer, windows clipped per doc
    buffers = text.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(text.type) else np.int32
    offsets = np.frombuffer(buffers[1], dtype=off_dtype, count=len(text) + 1 + text.offset)
    offsets = offsets[text.offset : text.offset + len(text) + 1].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    lens = np.diff(offsets)
    total = int(offsets[-1] - offsets[0])
    if total < n:
        return np.empty(0, _U64), np.empty(0, np.int64)
    vals = data[offsets[0]: offsets[-1]].astype(_U64)
    m = total - n + 1
    acc = vals[:m].copy()
    for j in range(1, n):
        acc = acc * _U64(0x100000001B3) + vals[j : j + m]
    doc_index = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    valid = doc_index[:m] == doc_index[n - 1 :]
    return splitmix64(acc[valid] ^ splitmix64(np.array([seed], _U64))[0]), doc_index[:m][valid]


def doc_fingerprints(sf_dir: str, n: int = 5, seed: int = 42) -> pa.Table:
    """64-bit content fingerprints (rows-only): min-hash of rolling char
    n-grams (winnowing-style robust fingerprint — stable under small edits)
    plus the exact content hash. Deterministic given (n, seed)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        h_exact = hash_arrow_strings(text, seed=1)
        grams, doc_index = _char_ngram_hashes(text, n, seed)
        fp_min = np.full(len(batch), np.iinfo(np.uint64).max, dtype=_U64)
        if len(grams):
            np.minimum.at(fp_min, doc_index, grams)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(fp_min.astype(np.int64), pa.int64()),
                "content_hash": pa.array(h_exact.astype(np.int64), pa.int64()),
            }
        )

    # batch 2048: the rolling-hash temps are ~8B x total chars x n passes —
    # small batches keep each worker's peak heap (and so its one-time
    # first-touch cost) low while staying fully vectorized
    df = ensure_columns(
        ds.map_batches(fp, batch_format="pyarrow", batch_size=2048).to_pandas(),
        {"doc_id": "int64", "fingerprint": "int64", "content_hash": "int64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


DEFAULT_MIX_RATES = {"en": 0.5, "es": 1.0, "de": 1.0, "fr": 0.25, "zh": 0.1}


def stratified_sample(sf_dir: str, rates: dict[str, float] | None = None,
                      default_rate: float = 0.0, seed: int = 42) -> pa.Table:
    """Deterministic per-stratum (language) subsampling — the domain-mixture
    step of training-data assembly: keep each doc with its language's rate,
    decided by ``splitmix64(doc_id ^ mix(seed)) < rate·2⁶⁴``.

    The keep decision is a pure function of (doc_id, seed): identical
    across runs, parallelism, and partitioning (no RNG state, nothing
    shared), so a resumed or re-sharded run samples the exact same docs.
    One vectorized map_batches; no shuffle. Returns (doc_id, lang) of the
    kept sample — rows-only gated; determinism/rate bounds pinned in
    pytest."""
    rates = DEFAULT_MIX_RATES if rates is None else rates
    mix = splitmix64(np.array([seed], _U64))[0]
    # float(2**64-1) rounds UP to 2**64 — scale in float and clamp
    thresholds = {
        lang: (_U64(0xFFFFFFFFFFFFFFFF) if r >= 1.0 else _U64(max(r, 0.0) * 2.0**64))
        for lang, r in rates.items()
    }
    default_thr = (_U64(0xFFFFFFFFFFFFFFFF) if default_rate >= 1.0
                   else _U64(max(default_rate, 0.0) * 2.0**64))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(_U64) ^ mix)
        # dictionary-encode langs so the threshold lookup is per-DISTINCT-
        # value, then one vectorized gather — no per-row Python
        codes_arr = pc.dictionary_encode(batch["lang"].combine_chunks())
        uniq = codes_arr.dictionary.to_pylist()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False)
        thr_by_uniq = np.array([thresholds.get(l, default_thr) for l in uniq], _U64)
        thr = thr_by_uniq[codes] if len(uniq) else np.empty(0, _U64)
        return batch.filter(pa.array(h < thr))

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    df = ensure_columns(
        ds.map_batches(pick, batch_format="pyarrow", batch_size=65536).to_pandas(),
        {"doc_id": "int64", "lang": "object"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# domain-mix upsampling rates: >1 replicates (temperature-style reweighting
# toward high-quality sources, the Pile/Llama mixture pattern), <1 subsamples,
# 0 drops; anything absent keeps default_rate copies
DEFAULT_UPSAMPLE_RATES = {"src0": 2.5, "src1": 3.0, "src2": 0.5, "src3": 0.0}


def upsample_rate_parts(rate: float) -> tuple[int, int]:
    """(base_copies, fractional-copy uint64 threshold) for a mixture rate —
    the exact integers both the engine and the SQL oracle use, so the two
    sides share one float→integer rounding."""
    from ._sqlgen import rate_threshold

    r = max(float(rate), 0.0)
    base = int(np.floor(r))
    return base, rate_threshold(r - base)


def _upsample_expansion(batch: pa.Table, parts: dict, default_parts: tuple,
                        mix: np.uint64, source_col: str = "source"):
    """The mixture-replication decision for one batch, shared by
    upsample_mix / sharding.upsampled_corpus_ds / assemble's replication
    stage (ONE implementation — the decision is provably identical, not
    asserted-identical): returns (row index to take, copy index, orig ids)
    where n_copies = floor(rate) + (splitmix64(doc_id ^ mix) <
    frac(rate)·2⁶⁴)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = splitmix64(ids.astype(_U64) ^ mix)
    codes_arr = pc.dictionary_encode(batch[source_col].combine_chunks())
    uniq = codes_arr.dictionary.to_pylist()
    codes = codes_arr.indices.to_numpy(zero_copy_only=False)
    if len(uniq):
        base = np.array([parts.get(s, default_parts)[0] for s in uniq], np.int64)
        thr = np.array([parts.get(s, default_parts)[1] for s in uniq], _U64)
        n_copies = base[codes] + (h < thr[codes]).astype(np.int64)
    else:
        n_copies = np.empty(0, np.int64)
    idx = np.repeat(np.arange(len(ids)), n_copies)
    starts = np.concatenate(([0], np.cumsum(n_copies)[:-1]))
    copy = np.arange(int(n_copies.sum()), dtype=np.int64) - starts[idx]
    return idx, copy, ids


def check_upsample_max_copies(rates: dict[str, float], default_rate: float,
                              max_copies: int) -> None:
    """Reject any rate whose ceiling exceeds the per-copy re-key capacity
    (doc_id·max_copies + copy must stay collision-free)."""
    for src, r in list(rates.items()) + [("<default>", default_rate)]:
        if int(np.floor(max(float(r), 0.0))) + 1 > max_copies:
            raise ValueError(
                f"rate {r} for {src!r} exceeds max_copies={max_copies}")


def replicate_rekey_batch(batch: pa.Table, parts: dict, default_parts: tuple,
                          mix: np.uint64, max_copies: int = 64) -> pa.Table:
    """Full-row mixture replication with per-copy re-key (doc_id·max_copies
    + copy, original kept as ``orig_doc_id``) — the shard-writer-facing
    form shared by sharding.upsampled_corpus_ds and assemble."""
    idx, copy, ids = _upsample_expansion(batch, parts, default_parts, mix)
    out = batch.take(pa.array(idx, pa.int64()))
    orig = ids[idx]
    out = out.set_column(out.schema.get_field_index("doc_id"), "doc_id",
                         pa.array(orig * max_copies + copy, pa.int64()))
    return out.append_column("orig_doc_id", pa.array(orig, pa.int64())) \
              .append_column("copy", pa.array(copy, pa.int64()))


def upsample_mix(sf_dir: str, rates: dict[str, float] | None = None,
                 default_rate: float = 1.0, seed: int = 43) -> pa.Table:
    """Deterministic domain-mix resampling with rates ABOVE 1 — the
    upsampling half of training-mixture assembly that ``stratified_sample``
    (rates ≤ 1) can't express: a doc from a source with rate r is emitted
    ``floor(r)`` times plus one more iff ``splitmix64(doc_id ^ mix(seed)) <
    frac(r)·2⁶⁴``, so E[copies] = r exactly and the decision is a pure
    function of (doc_id, seed) — identical across runs, parallelism and
    resume (reference analog: the deterministic seed-table discipline of
    sketch.cpp:79-84).

    One vectorized streaming pass, no shuffle: per-batch dictionary-encoded
    rate lookup, ``np.repeat`` row expansion, copy index by arange-minus-
    offsets. Returns (doc_id, source, copy) with copy ∈ [0, n_copies);
    exact-oracle-gated via the splitmix64 SQL rendering + lateral range."""
    rates = DEFAULT_UPSAMPLE_RATES if rates is None else rates
    mix = splitmix64(np.array([seed], _U64))[0]
    parts = {src: upsample_rate_parts(r) for src, r in rates.items()}
    default_parts = upsample_rate_parts(default_rate)

    def expand(batch: pa.Table) -> pa.Table:
        idx, copy, ids = _upsample_expansion(batch, parts, default_parts, mix)
        return pa.table({
            "doc_id": pa.array(ids[idx], pa.int64()),
            "source": batch["source"].combine_chunks().take(pa.array(idx, pa.int64())),
            "copy": pa.array(copy, pa.int64()),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    df = ensure_columns(
        ds.map_batches(expand, batch_format="pyarrow", batch_size=65536).to_pandas(),
        {"doc_id": "int64", "source": "object", "copy": "int64"})
    df = df.sort_values(["doc_id", "copy"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def uniform_sample_n(sf_dir: str, n: int = 64, seed: int = 17) -> pa.Table:
    """EXACT fixed-size uniform sample without replacement: the n docs with
    the smallest ``splitmix64(doc_id ^ mix(seed))`` — rate-free counterpart
    of ``stratified_sample`` (a 100-TB corpus can't pick "0.0000005%" by
    rate and hit a target size exactly; bottom-n by hash does, and stays a
    pure function of (doc_id, seed) so reruns/resumes draw the same docs).

    Distributed partial bottom-n: each batch emits at most n (doc_id, key)
    rows via ``np.argpartition``, the driver merges the O(n × n_batches)
    partials — the bottom-k discipline of kernels/bottomk.py applied to
    row sampling; no shuffle, nothing corpus-sized anywhere. Returns
    (rank, doc_id) ordered by the hash key."""
    mix = splitmix64(np.array([seed], _U64))[0]

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(_U64) ^ mix)
        if len(ids) > n:
            sel = np.argpartition(h, n)[:n]
            ids, h = ids[sel], h[sel]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "h": pa.array(h, pa.uint64())})

    ds = _read(sf_dir, "documents", ["doc_id"])
    df = ensure_columns(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas(),
        {"doc_id": "int64", "h": "uint64"})
    df = df.sort_values(["h", "doc_id"]).head(n).reset_index(drop=True)
    return pa.table({"rank": pa.array(np.arange(1, len(df) + 1), pa.int64()),
                     "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64())})


def weighted_sample_n(sf_dir: str, n: int = 32, seed: int = 19) -> pa.Table:
    """EXACT weighted sample without replacement (Efraimidis–Spirakis
    A-Res): keep the n docs with the LARGEST ``u^(1/w)`` where u =
    splitmix64(doc_id ^ mix)/2⁶⁴ and w = n_chars — longer documents
    proportionally likelier, decision still a pure function of
    (doc_id, seed). The importance-sampling primitive (sample by length /
    quality weight) the uniform samplers can't express.

    Per-batch partial top-n by key (argpartition), n-bounded driver merge
    — the uniform_sample_n scale shape. The float path (u = h/2⁶⁴ then
    ln(u)/w as the sort key — log form avoids pow underflow and is order-
    equivalent) mirrors the oracle exactly; ranked on the 6dp-rounded key
    with doc_id tie-break. Returns (rank, doc_id, n_chars, key)."""
    mix = splitmix64(np.array([seed], _U64))[0]

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = splitmix64(ids.astype(_U64) ^ mix)
        u = h.astype(np.float64) / 2.0**64
        # ln(u)/w: monotone transform of u^(1/w); w >= 1 in this corpus,
        # u in (0,1) so ln(u) < 0 and LARGER key = likelier kept
        key = np.round(np.log(u) / np.maximum(w, 1.0), 6)
        if len(ids) > n:
            # lexsort (not argpartition): ties on the ROUNDED key at the
            # batch boundary must keep the smallest doc_id, matching the
            # oracle's (key DESC, doc_id) order
            sel = np.lexsort((ids, -key))[:n]
            ids, w, key = ids[sel], w[sel], key[sel]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_chars": pa.array(w.astype(np.int64), pa.int64()),
                         "key": pa.array(key, pa.float64())})

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    df = ensure_columns(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas(),
        {"doc_id": "int64", "n_chars": "int64", "key": "float64"})
    df = df.sort_values(["key", "doc_id"], ascending=[False, True],
                        kind="stable").head(n).reset_index(drop=True)
    return pa.table({
        "rank": pa.array(np.arange(1, len(df) + 1), pa.int64()),
        "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
        "n_chars": pa.array(df["n_chars"].to_numpy(), pa.int64()),
        "key": pa.array(df["key"].to_numpy(), pa.float64()),
    })


def group_sample_n(sf_dir: str, n: int = 8, by: str = "lang",
                   seed: int = 17) -> pa.Table:
    """EXACT fixed-size per-group sample: for every group (default: per
    language) the n docs with the smallest ``splitmix64(doc_id ^
    mix(seed))`` — the eval-set / inspection-sample builder (n docs per
    language, per source, per shard...), grouped counterpart of
    ``uniform_sample_n`` with the same purity guarantees.

    Per-batch partial: bottom-n PER GROUP via one lexsort (≤ n ×
    groups-in-batch rows emitted); driver merges the O(n · n_groups ·
    n_batches) partials — group-bounded, never corpus-sized; no shuffle.
    Returns (group, rank, doc_id) ordered by (group, rank)."""
    mix = splitmix64(np.array([seed], _U64))[0]

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(_U64) ^ mix)
        codes_arr = pc.dictionary_encode(batch[by].combine_chunks())
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids):
            order = np.lexsort((ids, h, codes))
            new_grp = np.concatenate([[True], codes[order][1:] != codes[order][:-1]])
            grp_start = np.flatnonzero(new_grp)
            start_of = np.repeat(grp_start, np.diff(np.append(grp_start, len(ids))))
            keep = order[np.arange(len(ids)) - start_of < n]
        else:
            keep = np.empty(0, np.int64)
        return pa.table({
            by: batch[by].combine_chunks().take(pa.array(keep, pa.int64())),
            "doc_id": pa.array(ids[keep], pa.int64()),
            "h": pa.array(h[keep], pa.uint64()),
        })

    ds = _read(sf_dir, "documents", ["doc_id", by])
    df = ensure_columns(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas(),
        {by: "object", "doc_id": "int64", "h": "uint64"})
    df = df.sort_values([by, "h", "doc_id"])
    df = df.groupby(by, group_keys=False).head(n)
    df = df.assign(rank=df.groupby(by).cumcount() + 1)
    df = df[[by, "rank", "doc_id"]].reset_index(drop=True)
    return pa.Table.from_pandas(df.astype({"rank": "int64"}), preserve_index=False)


def _augment_messy(batch: pa.Table) -> pa.Table:
    """Deterministic mixed-case/whitespace noise derived from doc_id (the
    synthetic corpus is already lowercase single-spaced, so the
    normalization oracle would be vacuous on raw text). Same derivation in
    the SQL oracle — the pii_redact augment precedent."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    pre = np.where(ids % 2 == 0, "  The QUICK\t", "NOISE  ")
    post = np.where(ids % 3 == 0, " \t trailing MESS  ", "")
    aug = pc.binary_join_element_wise(
        pa.array(pre, pa.string()),
        batch["text"].combine_chunks().cast(pa.string()),
        pa.array(post, pa.string()), "")
    return batch.set_column(batch.schema.get_field_index("text"), "text", aug)


def normalize_text(sf_dir: str, augment: bool = True) -> pa.Table:
    """Text normalization — the first preprocessing stage of every web
    corpus pipeline: lowercase, collapse whitespace runs to one space,
    trim. Fixed step order; every step is an RE2/scalar kernel that exists
    byte-identically in DuckDB, so the normalized TEXT itself is
    value-hash-gated (the pii_redact discipline). One vectorized
    map_batches, no shuffle, no driver state.

    ``augment`` injects deterministic doc_id-derived case/whitespace noise
    (mirrored in the oracle) because the synthetic corpus is already
    normal-form. Returns (doc_id, n_chars_raw, n_chars_norm, text_norm)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        if augment:
            batch = _augment_messy(batch)
        text = batch["text"].combine_chunks()
        t = pc.utf8_lower(text)
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars_raw": pc.utf8_length(text).cast(pa.int64()),
            "n_chars_norm": pc.utf8_length(t).cast(pa.int64()),
            "text_norm": t,
        })

    df = ensure_columns(
        ds.map_batches(norm, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_chars_raw": "int64", "n_chars_norm": "int64",
         "text_norm": "object"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# PII redaction: (RE2 pattern, replacement token), applied IN THIS ORDER —
# email first, then IP, then phone (order matters where patterns could
# overlap; the DuckDB oracle applies the same order). All three are
# RE2-compatible so pyarrow.compute and DuckDB match byte-for-byte.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def redact_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch PII scrub (vectorized Arrow RE2, no Python per-row):
    counts each PII kind on the ORIGINAL text, then rewrites the text with
    replacement tokens. Adds ``n_<kind>s`` count columns and
    ``text_redacted``; drops the original text column."""
    text = batch[text_col].combine_chunks()
    out = batch.drop_columns([text_col])
    red = text
    for kind, pat, repl in PII_PATTERNS:
        cnt = pc.count_substring_regex(text, pattern=pat).cast(pa.int64())
        out = out.append_column(f"n_{kind}s", cnt)
        red = pc.replace_substring_regex(red, pattern=pat, replacement=repl)
    return out.append_column("text_redacted", red)


def _augment_pii(batch: pa.Table) -> pa.Table:
    """Deterministic PII injection derived from doc_id (the synthetic corpus
    is digit-free, so the redaction oracle would be vacuous on raw text).
    Same derivation lives in the SQL oracle — the generated-campaigns
    range-join precedent. Vectorized: numpy where + one element-wise join."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sid = ids.astype(str)
    em = np.where(ids % 3 == 0,
                  np.char.add(np.char.add(" contact user", sid), "@example.com"), "")
    p1 = np.char.zfill((ids % 1000).astype(str), 3)
    p2 = np.char.zfill((ids * 7 % 10000).astype(str), 4)
    ph = np.where(ids % 4 == 0,
                  np.char.add(np.char.add(np.char.add(" call 555-", p1), "-"), p2), "")
    ip = np.where(ids % 5 == 0,
                  np.char.add(" from 10.", np.char.add(
                      (ids % 256).astype(str), np.char.add(".", np.char.add(
                          (ids // 256 % 256).astype(str), np.char.add(
                              ".", (ids % 100).astype(str)))))), "")
    aug = pc.binary_join_element_wise(
        batch["text"].combine_chunks().cast(pa.string()),
        pa.array(em, pa.string()), pa.array(ph, pa.string()), pa.array(ip, pa.string()), "")
    return batch.set_column(batch.schema.get_field_index("text"), "text", aug)


def pii_redact(sf_dir: str, augment: bool = True) -> pa.Table:
    """PII scrub over the corpus — the privacy pass of a training-data
    pipeline. One streaming map_batches chain (augment → redact), no
    shuffle; per-doc counts + redacted text, oracle-gated against DuckDB's
    RE2 ``regexp_replace`` on the identically-derived text."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    if augment:
        ds = ds.map_batches(_augment_pii, batch_format="pyarrow", batch_size=8192)
    out = ds.map_batches(redact_pii_batch, batch_format="pyarrow", batch_size=8192)
    df = ensure_columns(out.to_pandas(),
                        {"doc_id": "int64", "n_emails": "int64", "n_ips": "int64",
                         "n_phones": "int64", "text_redacted": "object"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["doc_id", "n_emails", "n_ips", "n_phones", "text_redacted"]],
        preserve_index=False)


def grep_corpus(sf_dir: str, pattern: str = r"(fast|slow) (table|query)") -> pa.Table:
    """Corpus regex search — the grep / content-audit primitive (find docs
    matching a pattern, count non-overlapping matches). One vectorized
    RE2 pass (`pc.count_substring_regex`), match-bounded output (only
    docs with ≥ 1 hit leave the tasks), no shuffle. RE2 semantics are
    shared byte-for-byte with the DuckDB oracle (the regex_token_stats
    precedent). Returns (doc_id, n_matches) sorted by doc_id."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def hits(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"].combine_chunks(),
                                     pattern=pattern).cast(pa.int64())
        t = pa.table({"doc_id": batch["doc_id"], "n_matches": n})
        return t.filter(pc.greater(t["n_matches"], 0))

    df = ensure_columns(
        ds.map_batches(hits, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_matches": "int64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def char_class_profile(sf_dir: str) -> pa.Table:
    """Per-document character-class fractions — the charset-sanity quality
    signal (mojibake / code / table-dump detection): fraction of letters,
    digits, spaces, and other characters. One vectorized RE2-count pass,
    no shuffle; divisions mirrored 6dp in the oracle. Returns
    (doc_id, n_chars, letter_frac, digit_frac, space_frac, other_frac)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    # HALF-AWAY rounding (DuckDB's round), not numpy's banker's round:
    # power-of-two lengths make exact .5 ties at 6dp common (105/128)
    r6 = round6

    def profile(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        n = pc.utf8_length(text).cast(pa.int64()).to_numpy(zero_copy_only=False)
        denom = np.maximum(n, 1).astype(np.float64)
        letters = pc.count_substring_regex(text, pattern="[A-Za-z]") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        digits = pc.count_substring_regex(text, pattern="[0-9]") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        spaces = pc.count_substring_regex(text, pattern=" ") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        other = n - letters - digits - spaces
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n, pa.int64()),
            "letter_frac": pa.array(r6(letters / denom), pa.float64()),
            "digit_frac": pa.array(r6(digits / denom), pa.float64()),
            "space_frac": pa.array(r6(spaces / denom), pa.float64()),
            "other_frac": pa.array(r6(other / denom), pa.float64()),
        })

    df = ensure_columns(
        ds.map_batches(profile, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_chars": "int64", "letter_frac": "float64",
         "digit_frac": "float64", "space_frac": "float64", "other_frac": "float64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def per_lang_correlations(sf_dir: str, force: str | None = None) -> pa.Table:
    """Per-language correlation + least-squares fit between document token
    count (x) and character count (y) — the redundancy check a pipeline
    runs before treating two quality signals as independent filters.

    One streaming pass produces per-batch per-lang INTEGER moment partials
    (n, Σx, Σy, Σx², Σy², Σxy) — both inputs are integers, so the partials
    are exact and the fold has no float accumulation order to mirror
    against the oracle (the quality_zscores precedent). Partials fold
    adaptively (driver below _SMALL_DOCS, else distributed groupby
    Sum); the final corr / regr_slope / regr_intercept arithmetic runs in
    arbitrary-precision Python ints, converting to float only at the last
    division. Degenerate groups (n < 2 or zero variance on either axis)
    are excluded on both sides. int64 partial sums bound the per-group
    input at ~2^63/max(y²) rows; past that the partials would need a
    two-level (per-shard, then big-int driver) fold.

    Returns (lang, n, corr_tok_chars, slope, intercept) sorted by lang,
    floats rounded 6dp half-away (round6, the house rule)."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "text", "n_chars"])

    def moment_partials(batch: pa.Table) -> pa.Table:
        x = pc.list_value_length(pc.split_pattern(
            batch["text"].combine_chunks(), " ")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        y = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({
            "lang": batch["lang"],
            "n": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxx": pa.array(x * x), "syy": pa.array(y * y),
            "sxy": pa.array(x * y),
        })
        g = t.group_by("lang").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
        return g.rename_columns(["lang", "n", "sx", "sy", "sxx", "syy", "sxy"])

    partials = ds.map_batches(moment_partials, batch_format="pyarrow",
                              batch_size=8192)
    cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    small = (ds.count() < _SMALL_DOCS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(partials.to_pandas(),
                             {"lang": "object", **{c: "int64" for c in cols}})
        mom = pdf.groupby("lang", as_index=False)[cols].sum()
    else:
        mom = (partials.repartition(n_reducers()).groupby("lang")
               .aggregate(*[Sum(c, alias_name=c) for c in cols])).to_pandas()
        mom = ensure_columns(mom, {"lang": "object", **{c: "int64" for c in cols}})

    rows = []
    for _, r in mom.sort_values("lang").iterrows():
        n, sx, sy, sxx, syy, sxy = (int(r[c]) for c in cols)
        dx = n * sxx - sx * sx      # n²·var_pop(x): exact ints
        dy = n * syy - sy * sy
        cov = n * sxy - sx * sy
        if n < 2 or dx <= 0 or dy <= 0:
            continue
        corr = float(cov) / math.sqrt(float(dx) * float(dy))
        slope = float(cov) / float(dx)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        rows.append((str(r["lang"]), n, float(round6(corr)),
                     float(round6(slope)), float(round6(intercept))))
    return pa.table({
        "lang": pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "corr_tok_chars": pa.array([r[2] for r in rows], pa.float64()),
        "slope": pa.array([r[3] for r in rows], pa.float64()),
        "intercept": pa.array([r[4] for r in rows], pa.float64()),
    })


def lang_source_mi(sf_dir: str, force: str | None = None) -> pa.Table:
    """Mutual information (and the entropies behind it) between the lang
    and source columns — "does source determine language?", the
    redundancy/diversity statistic a mixing plan consults before
    stratifying on both axes.

    One streaming pass emits per-batch (lang, source, n) contingency
    partials — bounded by |langs|·|sources| per batch regardless of rows —
    folded adaptively (driver below _SMALL_DOCS, else distributed
    groupby). Driver-side math on the contingency table (it IS the
    sufficient statistic): MI = Σ (n_ls/N)·ln(n_ls·N / (n_l·n_s)),
    H(·) = −Σ p·ln p, all in nats; the float term-sum is safe at 6dp
    (terms O(1e-2), error O(1e-14) — the bigram_lm_scores ln precedent).
    Returns one row (n_docs, mi_nats, h_lang, h_source, h_joint) with
    MI = H(L) + H(S) − H(L,S) holding exactly up to rounding."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partials(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "source", "n"])

    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=16384)
    small = (ds.count() < _SMALL_DOCS) if force is None else (force == "driver")
    if small:
        pdf = ensure_columns(parts.to_pandas(),
                             {"lang": "object", "source": "object", "n": "int64"})
        c = pdf.groupby(["lang", "source"], as_index=False)["n"].sum()
    else:
        c = (parts.repartition(n_reducers()).groupby(["lang", "source"])
             .aggregate(Sum("n", alias_name="n"))).to_pandas()
        c = ensure_columns(c, {"lang": "object", "source": "object", "n": "int64"})
    n_ls = c["n"].to_numpy(np.int64).astype(np.float64)
    n_tot = float(n_ls.sum())
    if n_tot == 0:
        return pa.table({k: pa.array([v]) for k, v in
                         [("n_docs", 0), ("mi_nats", 0.0), ("h_lang", 0.0),
                          ("h_source", 0.0), ("h_joint", 0.0)]})
    n_l = c.groupby("lang")["n"].transform("sum").to_numpy(np.int64).astype(np.float64)
    n_s = c.groupby("source")["n"].transform("sum").to_numpy(np.int64).astype(np.float64)
    p = n_ls / n_tot
    mi = float((p * np.log((n_ls * n_tot) / (n_l * n_s))).sum())
    lam = c.groupby("lang")["n"].sum().to_numpy(np.int64).astype(np.float64)
    src = c.groupby("source")["n"].sum().to_numpy(np.int64).astype(np.float64)
    h = lambda v: float(-((v / n_tot) * np.log(v / n_tot)).sum())
    return pa.table({
        "n_docs": pa.array([int(n_tot)], pa.int64()),
        "mi_nats": pa.array([float(round6(mi))], pa.float64()),
        "h_lang": pa.array([float(round6(h(lam)))], pa.float64()),
        "h_source": pa.array([float(round6(h(src)))], pa.float64()),
        "h_joint": pa.array([float(round6(h(n_ls)))], pa.float64()),
    })


def type_token_ratio(sf_dir: str) -> pa.Table:
    """Per-document type/token ratio — the lexical-diversity signal used
    alongside length/stopword filters (templated or boilerplate text has
    low TTR). Pure map_batches, no shuffle: each document's distinct-token
    count comes from an EXACT per-batch Arrow group_by over (row, token)
    pairs (string-keyed, no hashing shortcut), so the pipeline streams at
    any corpus size and the gate compares per-doc rows. Returns
    (doc_id, n_tokens, n_types, ttr) sorted by doc_id, ttr rounded 6dp
    half-away."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def per_doc(batch: pa.Table) -> pa.Table:
        flat, offsets = flat_tokens(batch["text"].combine_chunks())
        n_tok = np.diff(offsets)
        row = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        # EXACT distinct count per doc without a string group_by:
        # dictionary-encode the flat tokens (exact string equality, C++
        # hash table), then count unique (row, code) int pairs
        codes = pc.dictionary_encode(flat if isinstance(flat, pa.Array)
                                     else flat.combine_chunks())
        code = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = len(codes.dictionary)
        key = np.unique(row * max(n_dict, 1) + code)
        types = np.bincount(key // max(n_dict, 1),
                            minlength=len(n_tok)).astype(np.int64)
        ttr = round6(types / np.maximum(n_tok, 1))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_types": pa.array(types, pa.int64()),
            "ttr": pa.array(ttr, pa.float64()),
        })

    df = ensure_columns(
        ds.map_batches(per_doc, batch_format="pyarrow", batch_size=2048).to_pandas(),
        {"doc_id": "int64", "n_tokens": "int64", "n_types": "int64", "ttr": "float64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def zipf_slope_per_lang(sf_dir: str, k: int = 200) -> pa.Table:
    """Zipf-law exponent per language: the OLS slope of ln(count) vs
    ln(rank) over each language's top-``k`` tokens — the corpus-health
    diagnostic that flags synthetic/templated text (natural language sits
    near −1; duplicated boilerplate flattens the head). Ranks use the
    deterministic (count DESC, token ASC) total order so ties cannot
    disagree with the oracle's ROW_NUMBER.

    The heavy step is the vocab-bounded (lang, token) count fold
    (per-batch Arrow pre-aggregation → distributed groupby); the
    regression runs driver-side over k·n_langs rows. Float math appears
    only in the final ln/ratio, rounded 6dp on both sides
    (lang_token_divergence precedent)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].combine_chunks()
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        lang_rep = lang.take(pa.array(np.repeat(np.arange(len(lang)),
                                                ntok)))
        t = pa.table({"lang": lang_rep, "token": flat})
        g = t.group_by(["lang", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "token", "partial"])

    agg = (ds.map_batches(partials, batch_format="pyarrow",
                          batch_size=8192)
           .repartition(n_reducers())
           .groupby(["lang", "token"])
           .aggregate(Sum("partial", alias_name="cnt")))
    df = ensure_columns(agg.to_pandas(),
                        {"lang": "object", "token": "object",
                         "cnt": "int64"})
    df = df.sort_values(["lang", "cnt", "token"],
                        ascending=[True, False, True])
    top = df.groupby("lang", as_index=False).head(k)
    top = top.assign(rank=top.groupby("lang").cumcount() + 1)
    rows = []
    for lang, sub in top.groupby("lang"):
        x = np.log(sub["rank"].to_numpy(np.float64))
        y = np.log(sub["cnt"].to_numpy(np.float64))
        n = float(len(sub))
        denom = n * float((x * x).sum()) - float(x.sum()) ** 2
        slope = (n * float((x * y).sum()) - float(x.sum()) * float(y.sum())) \
            / denom if denom != 0.0 else 0.0
        rows.append((lang, float(round6(slope)), int(n)))
    out = pd.DataFrame(rows, columns=["lang", "zipf_slope", "n_tokens"]) \
        .sort_values("lang").reset_index(drop=True)
    return pa.table({
        "lang": pa.array(out["lang"].astype(str) if len(out) else [],
                         pa.string()),
        "zipf_slope": pa.array(out["zipf_slope"].to_numpy(np.float64)
                               if len(out) else [], pa.float64()),
        "n_tokens": pa.array(out["n_tokens"].to_numpy(np.int64)
                             if len(out) else [], pa.int64()),
    })


_SEARCH_TERMS = ("hash", "table", "scan")


def keyword_search_topk(sf_dir: str, terms: tuple[str, ...] = _SEARCH_TERMS,
                        k: int = 20) -> pa.Table:
    """Conjunctive keyword search: top-``k`` documents containing ALL query
    terms, ranked by total term frequency — the integer-exact retrieval
    primitive (a BM25-style weighting would only reorder by a float; the
    scan/fold shape is identical and this one is bit-exact against SQL).

    One streaming pass: per batch the flattened token stream filters to
    the query terms (Arrow ``is_in``), per-(doc, term) counts come from
    one bincount over doc×term codes, AND-semantics keeps docs with all
    terms present, and each batch emits only its local top-k under the
    total order (score DESC, doc_id ASC) — valid because doc rows are
    unique across batches. Driver merges ≤ k·n_batches candidate rows."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = tuple(terms)
    n_terms = len(terms)

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        doc_idx = np.repeat(np.arange(len(ids)), ntok)
        hit = pc.is_in(flat, value_set=pa.array(terms)) \
            .to_numpy(zero_copy_only=False)
        flat_hit = pc.array_filter(flat, pa.array(hit))
        # term index via dictionary over the fixed term list
        tcode = pc.index_in(flat_hit, value_set=pa.array(terms)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        dcode = doc_idx[hit]
        counts = np.bincount(dcode * n_terms + tcode,
                             minlength=len(ids) * n_terms) \
            .reshape(len(ids), n_terms)
        ok = (counts >= 1).all(axis=1)
        score = counts.sum(axis=1)[ok]
        did = ids[ok]
        order = np.lexsort((did, -score))[:k]
        return pa.table({"doc_id": pa.array(did[order], pa.int64()),
                         "score": pa.array(score[order], pa.int64())})

    df = ensure_columns(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=4096).to_pandas(),
        {"doc_id": "int64", "score": "int64"})
    df = df.sort_values(["score", "doc_id"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    return pa.table({
        "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
        "score": pa.array(df["score"].to_numpy(np.int64), pa.int64()),
    })


def bm25_search_topk(sf_dir: str, terms: tuple[str, ...] = _SEARCH_TERMS,
                     k: int = 20, k1: float = 1.2, b: float = 0.75) -> pa.Table:
    """BM25-scored retrieval: top-``k`` documents for an OR-semantics term
    query under the Lucene BM25 variant (idf = ln((N-df+0.5)/(df+0.5)+1),
    always positive). The float companion to the integer-exact
    ``keyword_search_topk`` — same scan/fold shape, real ranking function.

    Two streaming passes, both column-pruned and scale-safe:
    pass 1 folds the global constants (N, Σdl, per-term df) as one tiny
    row per batch; pass 2 broadcasts those scalars in the task closure,
    scores candidates (any-term hit) per batch with one bincount tf
    matrix, and emits only the batch-local top-k under
    (round6(score) DESC, doc_id ASC) — valid because doc rows are unique
    across batches. Nothing corpus-sized ever reaches the driver.

    Oracle exactness: every float expression is mirrored
    operation-for-operation in the SQL (same literals, same left-assoc
    grouping, per-term contributions summed in fixed term order — never a
    SQL SUM over an arbitrary row order), and the score is round6'd on
    both sides before the ORDER BY cut (zipf_slope ln-path precedent)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = tuple(terms)
    n_terms = len(terms)
    term_arr = pa.array(terms)

    def stat_partials(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        doc_idx = np.repeat(np.arange(len(ntok)), ntok)
        hit = pc.is_in(flat, value_set=term_arr).to_numpy(zero_copy_only=False)
        tcode = pc.index_in(pc.array_filter(flat, pa.array(hit)),
                            value_set=term_arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(doc_idx[hit] * n_terms + tcode,
                             minlength=len(ntok) * n_terms) \
            .reshape(len(ntok), n_terms)
        df = (counts >= 1).sum(axis=0).astype(np.int64)
        cols = {"n_docs": pa.array([len(ntok)], pa.int64()),
                "sum_dl": pa.array([int(ntok.sum())], pa.int64())}
        for j in range(n_terms):
            cols[f"df{j}"] = pa.array([int(df[j])], pa.int64())
        return pa.table(cols)

    stats = ensure_columns(
        ds.map_batches(stat_partials, batch_format="pyarrow",
                       batch_size=8192).to_pandas(),
        {"n_docs": "int64", "sum_dl": "int64",
         **{f"df{j}": "int64" for j in range(n_terms)}})
    n = float(stats["n_docs"].sum())
    sumdl = float(stats["sum_dl"].sum())
    dfs = [float(stats[f"df{j}"].sum()) for j in range(n_terms)]
    # idf per term: mirrored as ln((n - df + 0.5) / (df + 0.5) + 1.0)
    idfs = [float(np.log((n - dfj + 0.5) / (dfj + 0.5) + 1.0))
            for dfj in dfs]

    def score_partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        doc_idx = np.repeat(np.arange(len(ids)), ntok)
        hit = pc.is_in(flat, value_set=term_arr).to_numpy(zero_copy_only=False)
        tcode = pc.index_in(pc.array_filter(flat, pa.array(hit)),
                            value_set=term_arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(doc_idx[hit] * n_terms + tcode,
                             minlength=len(ids) * n_terms) \
            .reshape(len(ids), n_terms)
        cand = (counts >= 1).any(axis=1)
        if not cand.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        tf = counts[cand].astype(np.float64)
        dl = ntok[cand].astype(np.float64)
        # mirrored: tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * n / sumdl)
        norm = k1 * (1.0 - b + b * dl * n / sumdl)
        score = np.zeros(len(dl), np.float64)
        for j in range(n_terms):  # fixed term order == SQL c0 + c1 + c2
            score = score + idfs[j] * (tf[:, j] * (k1 + 1.0)) \
                / (tf[:, j] + norm)
        score_r = np.asarray(round6(score), np.float64)
        did = ids[cand]
        order = np.lexsort((did, -score_r))[:k]
        return pa.table({"doc_id": pa.array(did[order], pa.int64()),
                         "score": pa.array(score_r[order], pa.float64())})

    df = ensure_columns(
        ds.map_batches(score_partials, batch_format="pyarrow",
                       batch_size=8192).to_pandas(),
        {"doc_id": "int64", "score": "float64"})
    df = df.sort_values(["score", "doc_id"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    return pa.table({
        "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
        "score": pa.array(df["score"].to_numpy(np.float64), pa.float64()),
    })


def rrf_search_fusion(sf_dir: str, terms: tuple[str, ...] = _SEARCH_TERMS,
                      k: int = 20, c: int = 60) -> pa.Table:
    """Reciprocal-rank fusion of the two retrievers (conjunctive keyword
    AND BM25) — the standard multi-retriever merge for dedup/decontam
    candidate generation: rrf(d) = Σ_lists 1/(c + rank_list(d)) over the
    truncated top-`k` lists, missing-from-a-list contributes nothing.
    Both input rankings are already deterministic total orders
    ((score DESC, doc_id) with BM25 scores round6'd), so ranks are
    cross-engine stable. Contributions are summed in fixed (keyword,
    bm25) order — never an arbitrary-order SQL SUM — and the fused score
    is round6'd on BOTH sides before the final ORDER BY cut (BM25
    discipline). Driver work is ≤ 2k rows; the heavy lifting is the two
    streaming retriever scans."""
    kw = keyword_search_topk(sf_dir, terms, k).to_pandas()
    bm = bm25_search_topk(sf_dir, terms, k).to_pandas()
    contrib: dict[int, float] = {}
    for lst in (kw, bm):  # fixed fold order: keyword first, then bm25
        for r, doc in enumerate(lst["doc_id"].tolist(), start=1):
            doc = int(doc)
            contrib[doc] = contrib.get(doc, 0.0) + 1.0 / (c + r)
    docs = np.array(sorted(contrib), np.int64)
    score = np.asarray(round6(np.array([contrib[d] for d in docs],
                                       np.float64)), np.float64)
    order = np.lexsort((docs, -score))[:k]
    return pa.table({
        "doc_id": pa.array(docs[order], pa.int64()),
        "rrf_score": pa.array(score[order], pa.float64()),
    })


def phrase_search_topk(sf_dir: str, phrase: tuple[str, str] = ("table", "hash"),
                       k: int = 20) -> pa.Table:
    """Exact phrase search: top-``k`` documents by occurrence count of an
    adjacent two-token phrase — the positional-index retrieval primitive
    (conjunctive search can't distinguish "table hash" from "hash ...
    table"; adjacency can). Integer-exact against SQL.

    One streaming pass: per batch the flattened token stream is compared
    against the two phrase words as shifted boolean masks (hit1[:-1] &
    hit2[1:] on the SAME doc), counts fall out of one bincount, and the
    batch emits only its local top-k under (n_hits DESC, doc_id ASC) —
    valid because doc rows are unique across batches. No positions are
    materialized; adjacency is a vectorized mask shift."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    w1, w2 = phrase

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(batch["text"].combine_chunks(), " ")
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        doc_idx = np.repeat(np.arange(len(ids)), ntok)
        h1 = pc.equal(flat, w1).to_numpy(zero_copy_only=False)
        h2 = pc.equal(flat, w2).to_numpy(zero_copy_only=False)
        if len(h1) < 2:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        m = h1[:-1] & h2[1:] & (doc_idx[:-1] == doc_idx[1:])
        cnt = np.bincount(doc_idx[:-1][m], minlength=len(ids))
        nz = np.flatnonzero(cnt)
        did, c = ids[nz], cnt[nz].astype(np.int64)
        order = np.lexsort((did, -c))[:k]
        return pa.table({"doc_id": pa.array(did[order], pa.int64()),
                         "n_hits": pa.array(c[order], pa.int64())})

    df = ensure_columns(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_hits": "int64"})
    df = df.sort_values(["n_hits", "doc_id"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    return pa.table({
        "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
        "n_hits": pa.array(df["n_hits"].to_numpy(np.int64), pa.int64()),
    })


def length_psi_drift(sf_dir: str, n_buckets: int = 16,
                     bucket_width: int = 256) -> pa.Table:
    """Population Stability Index of each source's doc-length distribution
    against the REST of the corpus — the standard drift monitor a
    training-data pipeline runs per ingest source (PSI < 0.1 stable,
    > 0.25 action). Smoothed add-one estimates so empty buckets are
    well-defined: p_i = (c_i+1)/(C+B), q_i over the complement, PSI =
    Σ_i (p_i - q_i)·ln(p_i/q_i).

    The heavy step is a group-bounded (source, bucket) count fold (one
    vectorized pass, ≤ n_sources·B partial rows per batch); the PSI math
    runs driver-side on the tiny grid. Float appears only in the final
    smoothed ratios, mirrored expression-for-expression in the SQL and
    round6'd on both sides (bm25 discipline; the 16-term sum is within
    double noise of the SQL SUM, gate-verified at three scales)."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partials(batch: pa.Table) -> pa.Table:
        src = batch["source"].combine_chunks()
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        bucket = np.minimum(nch // bucket_width, n_buckets - 1)
        t = pa.table({"source": src,
                      "bucket": pa.array(bucket, pa.int64())})
        g = t.group_by(["source", "bucket"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "bucket", "c"])

    df = ensure_columns(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=65536).to_pandas(),
        {"source": "object", "bucket": "int64", "c": "int64"})
    agg = df.groupby(["source", "bucket"], as_index=False)["c"].sum()
    sources = sorted(agg["source"].unique())
    s_idx = {s: i for i, s in enumerate(sources)}
    m = np.zeros((len(sources), n_buckets), np.int64)
    m[agg["source"].map(s_idx).to_numpy(np.int64),
      agg["bucket"].to_numpy(np.int64)] = agg["c"].to_numpy(np.int64)
    cs = m.sum(axis=1).astype(np.float64)
    bc = m.sum(axis=0).astype(np.float64)
    ctot = float(m.sum())
    bw = float(n_buckets)
    mf = m.astype(np.float64)
    # mirrored: p = (c + 1.0) / (cs + 16.0); q over the complement
    p = (mf + 1.0) / (cs[:, None] + bw)
    q = (bc[None, :] - mf + 1.0) / (ctot - cs[:, None] + bw)
    psi = ((p - q) * np.log(p / q)).sum(axis=1)
    psi_r = np.asarray(round6(psi), np.float64)
    return pa.table({
        "source": pa.array(sources, pa.string()),
        "n_docs": pa.array(cs.astype(np.int64), pa.int64()),
        "psi": pa.array(psi_r, pa.float64()),
    })


def quality_scores_digest(sf_dir: str) -> pa.Table:
    """At-scale output mode for quality_scores (VERDICT r4 item 5): the
    per-doc feature table streams to partitioned Parquet under /tmp and
    ONLY an order-invariant digest reaches the driver — one (checksum,
    count) pair per batch, so the driver pull is O(#batches), not O(docs).

    Digest: mod-2^64 sum over docs of the chained splitmix
    ``sm(sm(sm(sm(doc_id^mix(11)) ^ n_tokens) ^ sr6) ^ ml6)`` where
    sr6/ml6 are the 6dp ratios scaled to exact integers (×10⁶) — chaining
    makes the row hash order-sensitive in the COLUMNS (a swap between
    columns changes it) while the sum stays order-invariant in the ROWS.
    The oracle renders the same chain over the same integers
    (splitmix64_ctes), so the digest is value-hash-gated end to end.
    Returns one row (n_docs, digest)."""
    from ._sqlgen import mix_constant
    from ._util import write_and_digest

    mix = np.uint64(mix_constant(11))
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    per_doc = ds.map_batches(_quality_stats_batch, batch_format="pyarrow",
                             batch_size=8192)

    def digest_batch(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ntok = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # the written floats are round6 values: rint(f*1e6) recovers the
        # exact integer each ratio rounded to (|err| < 1e-4 ≪ 0.5)
        sr6 = np.rint(batch["stopword_ratio"].to_numpy(zero_copy_only=False)
                      * 1e6).astype(np.int64).astype(np.uint64)
        ml6 = np.rint(batch["mean_token_len"].to_numpy(zero_copy_only=False)
                      * 1e6).astype(np.int64).astype(np.uint64)
        h = splitmix64(splitmix64(splitmix64(splitmix64(did ^ mix) ^ ntok)
                                  ^ sr6) ^ ml6)
        s = h.sum(dtype=np.uint64)
        return pa.table({
            "chk": pa.array(np.array([s], np.uint64).view(np.int64), pa.int64()),
            "n": pa.array([batch.num_rows], pa.int64())})

    n, digest, _ = write_and_digest(per_doc, sf_dir, "quality_scores",
                                    digest_batch)
    return pa.table({"n_docs": pa.array([n], pa.int64()),
                     "digest": pa.array([digest], pa.int64())})


def normalize_text_digest(sf_dir: str) -> pa.Table:
    """At-scale output mode for normalize_text: the normalized corpus
    streams to partitioned Parquet; the driver receives only the
    corpus_checksum-style digest ``Σ string_hash(text_norm,1) XOR
    splitmix64(doc_id^mix(7)) mod 2^64`` — content bound to doc_id, so a
    swapped/duplicated/missing normalized row changes the value. Oracle:
    the same normalize expression + the same hash CTEs in SQL.
    Returns one row (n_docs, digest)."""
    from ._sqlgen import mix_constant
    from ._util import write_and_digest

    mix = np.uint64(mix_constant(7))
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        batch = _augment_messy(batch)
        text = batch["text"].combine_chunks()
        t = pc.utf8_lower(text)
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({"doc_id": batch["doc_id"], "text_norm": t})

    per_doc = ds.map_batches(norm, batch_format="pyarrow", batch_size=8192)

    def digest_batch(batch: pa.Table) -> pa.Table:
        h = hash_arrow_strings(batch["text_norm"].combine_chunks(), seed=1)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        s = (h ^ splitmix64(ids ^ mix)).sum(dtype=np.uint64)
        return pa.table({
            "chk": pa.array(np.array([s], np.uint64).view(np.int64), pa.int64()),
            "n": pa.array([batch.num_rows], pa.int64())})

    n, digest, _ = write_and_digest(per_doc, sf_dir, "normalize_text",
                                    digest_batch)
    return pa.table({"n_docs": pa.array([n], pa.int64()),
                     "digest": pa.array([digest], pa.int64())})
