"""End-to-end training-corpus assembly — the flagship composition.

Chains every cleaning stage this engine provides into one coherent
pipeline, the way a real LLM-pretraining data job runs them:

    benchmark holdout -> Gopher quality filter -> near-dup removal
    -> benchmark decontamination -> PII redaction
    -> stratified domain-mix sampling -> deterministic shuffle-sharding

Physical plan (two streaming passes over the corpus, no driver
materialization of documents):

1. DECISION SETS (each distributed per its own operator): the near-dup
   DROP set (cluster non-representatives, bounded by pair-touched docs)
   and the CONTAMINATED set (docs sharing a k-shingle with the
   benchmark, bounded by overlap) are computed and broadcast once via
   ``ray.put`` + per-worker fetch-once (`stages/broadcast.cached`).
   Quality, sampling, and PII need no sets — they are pure per-document
   functions applied inline.
2. COUNT PASS (optional, ``with_counts``): one column-pruned pass
   folding a 1-row partial per batch into per-stage drop counts for the
   manifest. Deterministic masks make recomputing them in the write pass
   safe.
3. WRITE PASS: full-column corpus read -> one fused map_batches
   (holdout/quality/dedup/decontam/sample filters + PII rewrite of
   ``text``) -> the one genuinely all-to-all step, a groupby(shard)
   exchange -> per-shard sorted partitioned parquet
   (`sharding.write_shards_from`).

Every stage decision is a pure deterministic function of the inputs, so
a rerun (or a resumed run) reproduces byte-identical shards.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text_analysis import (DEFAULT_MIX_RATES, _gopher_signal_batch, redact_pii_batch,
                            splitmix64, _U64)


def _stage_masks(batch: pa.Table, *, n_bench: int, max_top_token_frac: float,
                 min_frac_unique: float, max_symbol_ratio: float,
                 drop_w, contam_w, thresholds: dict, default_thr, mix) -> dict:
    """The five keep/drop decisions for one batch, each a vectorized bool
    mask over rows STILL ALIVE after the previous stage (so per-stage
    counts are well-defined and order-stable)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    alive = ids >= n_bench
    holdout = ~alive

    sig = _gopher_signal_batch(batch)
    quality_ok = (
        (sig["top_token_frac"].to_numpy(zero_copy_only=False) <= max_top_token_frac)
        & (sig["frac_unique_tokens"].to_numpy(zero_copy_only=False) >= min_frac_unique)
        & (sig["symbol_ratio"].to_numpy(zero_copy_only=False) <= max_symbol_ratio)
    )
    q_drop = alive & ~quality_ok
    alive = alive & quality_ok

    is_dup = pc.is_in(batch["doc_id"], value_set=drop_w).to_numpy(zero_copy_only=False)
    dup_drop = alive & is_dup
    alive = alive & ~is_dup

    is_contam = pc.is_in(batch["doc_id"], value_set=contam_w).to_numpy(zero_copy_only=False)
    contam_drop = alive & is_contam
    alive = alive & ~is_contam

    h = splitmix64(ids.astype(_U64) ^ mix)
    codes_arr = pc.dictionary_encode(batch["lang"].combine_chunks())
    uniq = codes_arr.dictionary.to_pylist()
    codes = codes_arr.indices.to_numpy(zero_copy_only=False)
    thr_by_uniq = np.array([thresholds.get(l, default_thr) for l in uniq], _U64)
    sampled_in = (h < thr_by_uniq[codes]) if len(uniq) else np.zeros(len(ids), bool)
    sample_drop = alive & ~sampled_in
    alive = alive & sampled_in

    return {"holdout": holdout, "quality": q_drop, "dedup": dup_drop,
            "decontam": contam_drop, "sample": sample_drop, "kept": alive}


def assemble_training_corpus(
    sf_dir: str, out_dir: str, *, k: int = 3, tau: float = 0.5, n_bench: int = 0,
    max_top_token_frac: float = 0.2, min_frac_unique: float = 0.3,
    max_symbol_ratio: float = 0.1, rates: dict[str, float] | None = None,
    sample_seed: int = 42, n_shards: int = 16, shard_seed: int = 7,
    rows_per_file: int = 100_000, with_counts: bool = True,
    pack_seq_len: int | None = None,
    upsample_rates: dict[str, float] | None = None,
    upsample_seed: int = 43,
) -> dict:
    """Run the full assembly and write shards; returns the manifest dict
    (per-stage drop counts, kept count, shard records).

    ``upsample_rates`` (optional) adds the mixture-replication stage after
    all filters: kept docs from a source with rate r emit floor(r) +
    hash-gated copies (upsample_mix's exact decision at ``upsample_seed``),
    each copy re-keyed ``doc_id·64 + copy`` (original kept as
    ``orig_doc_id``) so replicas spread across shards. Absent sources keep
    rate 1.0 (identity)."""
    import ray
    import ray.data as rd

    from ..stages.broadcast import cached
    from .dedup import _cluster_labels, jaccard_near_dups, decontaminate_corpus
    from .sharding import write_shards_from

    rates = DEFAULT_MIX_RATES if rates is None else rates
    mix = splitmix64(np.array([sample_seed], _U64))[0]
    thresholds = {
        lang: (_U64(0xFFFFFFFFFFFFFFFF) if r >= 1.0 else _U64(max(r, 0.0) * 2.0**64))
        for lang, r in rates.items()
    }
    default_thr = _U64(0)

    pairs = jaccard_near_dups(sf_dir, k=k, tau=tau).to_pandas()
    if len(pairs):
        nodes, labels = _cluster_labels(pairs)
        drop = nodes[labels != nodes]
    else:
        drop = np.empty(0, np.int64)
    if n_bench > 0:
        dec = decontaminate_corpus(sf_dir, n_bench=n_bench, k=k)
        contam = dec.column("doc_id").to_numpy().astype(np.int64)[
            dec.column("contaminated").to_numpy().astype(bool)]
    else:
        contam = np.empty(0, np.int64)
    drop_ref = ray.put(pa.array(drop, pa.int64()))
    contam_ref = ray.put(pa.array(contam, pa.int64()))

    mask_kw = dict(n_bench=n_bench, max_top_token_frac=max_top_token_frac,
                   min_frac_unique=min_frac_unique, max_symbol_ratio=max_symbol_ratio,
                   thresholds=thresholds, default_thr=default_thr, mix=mix)
    stages = ("holdout", "quality", "dedup", "decontam", "sample", "kept")

    counts = None
    if with_counts:
        def count_batch(batch: pa.Table) -> pa.Table:
            m = _stage_masks(batch, drop_w=cached(drop_ref), contam_w=cached(contam_ref),
                             **mask_kw)
            return pa.table({s: pa.array([int(m[s].sum())], pa.int64()) for s in stages})

        partials = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                                    columns=["doc_id", "text", "lang"])
                    .map_batches(count_batch, batch_format="pyarrow", batch_size=8192)
                    .to_pandas())
        counts = {s: int(partials[s].sum()) for s in stages}

    up_parts = None
    if upsample_rates is not None:
        from .text_analysis import (check_upsample_max_copies,
                                    replicate_rekey_batch, upsample_rate_parts)

        check_upsample_max_copies(upsample_rates, 1.0, 64)
        up_parts = {s: upsample_rate_parts(r) for s, r in upsample_rates.items()}
        up_default = upsample_rate_parts(1.0)
        up_mix = splitmix64(np.array([upsample_seed], _U64))[0]

    def clean_batch(batch: pa.Table) -> pa.Table:
        m = _stage_masks(batch, drop_w=cached(drop_ref), contam_w=cached(contam_ref),
                         **mask_kw)
        kept = batch.filter(pa.array(m["kept"]))
        red = redact_pii_batch(kept)  # counts + text_redacted, original text dropped
        red = red.drop_columns([c for c in ("n_emails", "n_ips", "n_phones")
                                if c in red.column_names])
        if up_parts is None:
            return red
        # mixture replication: upsample_mix's decision on the KEPT rows,
        # per-copy re-key so the shard exchange spreads replicas (shared
        # implementation: text_analysis.replicate_rekey_batch)
        return replicate_rekey_batch(red, up_parts, up_default, up_mix,
                                     max_copies=64)

    # deliberately unpruned read: the sink carries every corpus column
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    clean = ds.map_batches(clean_batch, batch_format="pyarrow", batch_size=8192)
    manifest = write_shards_from(clean, out_dir, n_shards=n_shards, seed=shard_seed,
                                 rows_per_file=rows_per_file,
                                 pack_seq_len=pack_seq_len,
                                 pack_text_col="text_redacted")
    manifest["n_input"] = int(ds.count())
    manifest["n_dup_set"] = int(len(drop))
    manifest["n_contam_set"] = int(len(contam))
    if counts is not None:
        manifest["stage_counts"] = counts
    return manifest
