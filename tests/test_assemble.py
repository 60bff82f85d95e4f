"""Flagship assembly pipeline: manifest consistency + independent
recomposition from the individual operators it chains."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
STAGES = ("holdout", "quality", "dedup", "decontam", "sample", "kept")


def _read_shards(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_dir, "shard=*", "part-*.parquet")))
    return pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)


def test_assemble_manifest_and_recomposition(ray_session, tmp_path):
    from sketch_ray.pipelines.assemble import assemble_training_corpus
    from sketch_ray.pipelines.dedup import (_cluster_labels, decontaminate_corpus,
                                            jaccard_near_dups)
    from sketch_ray.pipelines.text_analysis import (gopher_quality_signals,
                                                    stratified_sample)

    out = str(tmp_path / "corpus")
    man = assemble_training_corpus(SF, out, n_bench=5, n_shards=4, rows_per_file=7)

    # every input document lands in exactly one stage bucket
    assert sum(man["stage_counts"][s] for s in STAGES) == man["n_input"]
    assert man["stage_counts"]["kept"] == man["n_docs"]

    shards = _read_shards(out)
    assert len(shards) == man["n_docs"]
    # PII pass rewrote the text column
    assert "text_redacted" in shards.columns and "text" not in shards.columns

    # independent recomposition from the individual operators
    corpus = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    sig = gopher_quality_signals(SF).to_pandas().set_index("doc_id")
    q_ok = ((sig["top_token_frac"] <= 0.2) & (sig["frac_unique_tokens"] >= 0.3)
            & (sig["symbol_ratio"] <= 0.1))
    pairs = jaccard_near_dups(SF, k=3, tau=0.5).to_pandas()
    nodes, labels = _cluster_labels(pairs)
    dup = set(nodes[labels != nodes].tolist())
    dec = decontaminate_corpus(SF, n_bench=5, k=3).to_pandas()
    contam = set(dec[dec["contaminated"] == 1]["doc_id"].tolist())
    sampled = set(stratified_sample(SF).to_pandas()["doc_id"].tolist())

    want = corpus[
        (corpus["doc_id"] >= 5)
        & corpus["doc_id"].map(lambda d: bool(q_ok.get(d, False)))
        & ~corpus["doc_id"].isin(dup)
        & ~corpus["doc_id"].isin(contam)
        & corpus["doc_id"].isin(sampled)
    ]["doc_id"]
    assert sorted(shards["doc_id"]) == sorted(want)

    # deterministic: a rerun reproduces identical shards byte-for-byte content
    out2 = str(tmp_path / "corpus2")
    man2 = assemble_training_corpus(SF, out2, n_bench=5, n_shards=4, rows_per_file=7)
    assert man2["stage_counts"] == man["stage_counts"]
    pd.testing.assert_frame_equal(_read_shards(out2), shards)


def test_assemble_with_packing_manifests(ray_session, tmp_path):
    """pack_seq_len flows through assembly: every written shard carries a
    packing.parquet over the redacted text, tiling each shard's stream."""
    import glob
    import os

    import pyarrow.parquet as pq

    from sketch_ray.pipelines.assemble import assemble_training_corpus

    out = str(tmp_path / "corpus")
    man = assemble_training_corpus("/root/testdata/sf0.001", out, n_bench=5,
                                   n_shards=4, with_counts=False,
                                   pack_seq_len=64)
    assert man["n_docs"] > 0
    for rec in man["shards"]:
        d = os.path.join(out, f"shard={rec['shard']:05d}")
        spans = pq.read_table(os.path.join(d, "packing.parquet")).to_pandas()
        assert rec["n_seqs"] == spans["seq_id"].max() + 1
        per_seq = spans.groupby("seq_id")["n_toks"].sum()
        assert (per_seq.iloc[:-1] == 64).all() and 0 < per_seq.iloc[-1] <= 64
        docs = pd.concat([pq.read_table(f).to_pandas() for f in
                          sorted(glob.glob(os.path.join(d, "part-*.parquet")))],
                         ignore_index=True)
        want = (docs["text_redacted"].str.count(" ") + 1).sum()
        assert spans["n_toks"].sum() == want


def test_assemble_with_upsampling(ray_session, tmp_path):
    """Assembly with the mixture-replication stage: an integer rate
    exactly multiplies that source's kept docs, other sources pass
    through once, per-copy keys are unique, and a rerun is
    byte-identical."""
    from sketch_ray.pipelines.assemble import assemble_training_corpus

    base_out = str(tmp_path / "plain")
    man0 = assemble_training_corpus(SF, base_out, n_bench=5, n_shards=4,
                                    rows_per_file=7, with_counts=False)
    plain = _read_shards(base_out)

    up_out = str(tmp_path / "upsampled")
    man1 = assemble_training_corpus(SF, up_out, n_bench=5, n_shards=4,
                                    rows_per_file=7, with_counts=False,
                                    upsample_rates={"src0": 3.0})
    up = _read_shards(up_out)

    kept_src0 = int((plain["source"] == "src0").sum())
    assert int((up["source"] == "src0").sum()) == 3 * kept_src0
    assert int((up["source"] != "src0").sum()) == int((plain["source"] != "src0").sum())
    assert man1["n_docs"] == man0["n_docs"] + 2 * kept_src0
    assert up["doc_id"].is_unique
    # kept-doc set identical pre-replication
    assert set(up["orig_doc_id"]) == set(plain["doc_id"])
    # rerun byte-identical
    up2_out = str(tmp_path / "upsampled2")
    assemble_training_corpus(SF, up2_out, n_bench=5, n_shards=4,
                             rows_per_file=7, with_counts=False,
                             upsample_rates={"src0": 3.0})
    f1 = sorted(glob.glob(os.path.join(up_out, "shard=*", "part-*.parquet")))
    f2 = sorted(glob.glob(os.path.join(up2_out, "shard=*", "part-*.parquet")))
    assert [os.path.relpath(f, up_out) for f in f1] == \
           [os.path.relpath(f, up2_out) for f in f2]
    for a, b in zip(f1, f2):
        assert open(a, "rb").read() == open(b, "rb").read()
