"""Deterministic training-shard assembly: assignment, writer, SQL parity."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_shard_assignment_branches_equal(ray_session):
    """Driver fold and distributed groupby(shard) ranking must agree
    row-for-row (the house adaptive-plan invariant)."""
    from sketch_ray.pipelines.sharding import shard_assignments

    a = shard_assignments(SF, n_shards=8, seed=7, force="driver").to_pandas()
    b = shard_assignments(SF, n_shards=8, seed=7, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_shard_assignment_coverage_and_determinism(ray_session):
    from sketch_ray.pipelines.sharding import shard_assignments

    n_shards = 8
    out = shard_assignments(SF, n_shards=n_shards, seed=7).to_pandas()
    corpus = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).to_pandas()
    # every document exactly once
    assert sorted(out["doc_id"]) == sorted(corpus["doc_id"])
    assert out["shard"].between(0, n_shards - 1).all()
    # pos is a 0..k-1 permutation within every shard
    for _, g in out.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    # pure function of (doc_id, seed): identical rerun, different seed differs
    again = shard_assignments(SF, n_shards=n_shards, seed=7).to_pandas()
    pd.testing.assert_frame_equal(out, again)
    other = shard_assignments(SF, n_shards=n_shards, seed=8).to_pandas()
    assert not other.equals(out)


def test_pack_sequences_branches_and_tiling(ray_session):
    """Driver cumsum and distributed bucket prefix-sum must agree row-for-row
    (house adaptive-plan invariant); every full sequence holds exactly
    seq_len tokens; segments tile each document without gap or overlap."""
    import pyarrow.compute as pc

    from sketch_ray.pipelines.sharding import pack_sequences

    a = pack_sequences(SF, seq_len=128, seed=7, force="driver").to_pandas()
    b = pack_sequences(SF, seq_len=128, seed=7, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)

    per_seq = a.groupby("seq_id")["n_toks"].sum()
    assert (per_seq.iloc[:-1] == 128).all() and 0 < per_seq.iloc[-1] <= 128
    assert per_seq.index.tolist() == list(range(len(per_seq)))  # no seq gaps
    # segments of one doc are contiguous from 0 and cover its token count
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = pd.Series(pc.add(pc.count_substring(t["text"], " "), 1).to_numpy(),
                     index=t["doc_id"].to_numpy()).sort_index()
    got = a.groupby("doc_id")["n_toks"].sum().sort_index()
    assert (got.to_numpy() == want.to_numpy()).all()
    for _, g in a.groupby("doc_id"):
        g = g.sort_values("doc_start")
        assert g["doc_start"].iloc[0] == 0
        assert (g["doc_start"].to_numpy()[1:]
                == (g["doc_start"] + g["n_toks"]).to_numpy()[:-1]).all()
    # pure function of seed: different seed -> different packing order
    c = pack_sequences(SF, seq_len=128, seed=8, force="driver").to_pandas()
    assert not c.equals(a)


def test_write_shards_resume_skips_finished(ray_session, tmp_path):
    """resume=True skips shards with a matching _DONE marker and rewrites
    (byte-identically) any shard whose marker is missing or stale."""
    import ray.data as rd

    from sketch_ray.pipelines.sharding import write_shards_from

    out_dir = str(tmp_path / "shards")
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    man1 = write_shards_from(ds, out_dir, n_shards=4, seed=7, rows_per_file=7)
    assert man1["n_shards_skipped"] == 0

    def file_bytes():
        return {f: open(f, "rb").read()
                for f in sorted(glob.glob(os.path.join(out_dir, "**", "part-*.parquet"),
                                          recursive=True))}

    before = file_bytes()
    # full resume: every shard skipped, nothing rewritten
    man2 = write_shards_from(ds, out_dir, n_shards=4, seed=7, rows_per_file=7,
                             resume=True)
    assert man2["n_shards_skipped"] == 4
    assert man2["n_docs"] == man1["n_docs"]
    assert file_bytes() == before

    # simulate a crash: one shard lost its marker mid-write -> only it reruns
    victim = os.path.join(out_dir, "shard=00002", "_DONE.json")
    os.remove(victim)
    man3 = write_shards_from(ds, out_dir, n_shards=4, seed=7, rows_per_file=7,
                             resume=True)
    assert man3["n_shards_skipped"] == 3
    assert os.path.exists(victim)
    assert file_bytes() == before  # rewrite is byte-identical

    # config change invalidates markers (rows_per_file differs)
    man4 = write_shards_from(ds, out_dir, n_shards=4, seed=7, rows_per_file=9,
                             resume=True)
    assert man4["n_shards_skipped"] == 0


def test_write_shards_with_packing_manifest(ray_session, tmp_path):
    """pack_seq_len writes a per-shard packing.parquet whose spans tile the
    shard's token stream in file order; changing it invalidates resume."""
    import pyarrow.compute as pc
    import ray.data as rd

    from sketch_ray.pipelines.sharding import write_shards_from

    out_dir = str(tmp_path / "shards")
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    man = write_shards_from(ds, out_dir, n_shards=4, seed=7, rows_per_file=64,
                            pack_seq_len=100)
    for rec in man["shards"]:
        d = os.path.join(out_dir, f"shard={rec['shard']:05d}")
        spans = pq.read_table(os.path.join(d, "packing.parquet")).to_pandas()
        assert rec["n_seqs"] == spans["seq_id"].max() + 1
        per_seq = spans.groupby("seq_id")["n_toks"].sum()
        assert (per_seq.iloc[:-1] == 100).all() and 0 < per_seq.iloc[-1] <= 100
        # span doc order == shard file order; token counts match the docs
        files = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
        docs = pd.concat([pq.read_table(f).to_pandas() for f in files],
                         ignore_index=True)
        first_spans = spans.drop_duplicates("doc_id", keep="first")
        assert first_spans["doc_id"].tolist() == docs["doc_id"].tolist()
        import pyarrow as pa

        want_toks = pc.add(pc.count_substring(
            pa.array(docs["text"]), " "), 1).to_numpy()
        got_toks = spans.groupby("doc_id", sort=False)["n_toks"].sum().to_numpy()
        assert (got_toks == want_toks).all()

    # resume honors matching pack config, invalidates on change
    man2 = write_shards_from(ds, out_dir, n_shards=4, seed=7, rows_per_file=64,
                             pack_seq_len=100, resume=True)
    assert man2["n_shards_skipped"] == 4
    assert [r["n_seqs"] for r in man2["shards"]] == [r["n_seqs"] for r in man["shards"]]
    man3 = write_shards_from(ds, out_dir, n_shards=4, seed=7, rows_per_file=64,
                             pack_seq_len=128, resume=True)
    assert man3["n_shards_skipped"] == 0


def test_write_training_shards_roundtrip(ray_session, tmp_path):
    """The written shards are exactly the corpus, in the assignment's
    deterministic order, with the per-file row bound respected."""
    from sketch_ray.pipelines.sharding import shard_assignments, write_training_shards

    out_dir = str(tmp_path / "shards")
    man = write_training_shards(SF, out_dir, n_shards=4, seed=7, rows_per_file=7)
    corpus = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert man["n_docs"] == len(corpus)

    want = shard_assignments(SF, n_shards=4, seed=7).to_pandas()
    seen = []
    for rec in man["shards"]:
        s = rec["shard"]
        files = sorted(glob.glob(os.path.join(out_dir, f"shard={s:05d}", "part-*.parquet")))
        assert len(files) == rec["n_files"]
        parts = [pq.read_table(f).to_pandas() for f in files]
        assert all(len(p) <= 7 for p in parts)
        got = pd.concat(parts, ignore_index=True)
        # file order == the assignment's pos order for this shard
        w = want[want["shard"] == s].sort_values("pos")
        assert got["doc_id"].tolist() == w["doc_id"].tolist()
        # full document rows survive (all corpus columns, content intact)
        assert sorted(got.columns) == sorted(corpus.columns)
        seen.append(got)
    allrows = pd.concat(seen, ignore_index=True).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        allrows, corpus.sort_values("doc_id").reset_index(drop=True))


def test_upsampled_shards_roundtrip(ray_session, tmp_path):
    """Mixture-weighted shards: per-doc copy counts match upsample_mix's
    decision exactly, per-copy keys are unique, copies of multi-copy docs
    SPREAD across shards, and a rerun is byte-identical."""
    from sketch_ray.pipelines.sharding import write_upsampled_shards
    from sketch_ray.pipelines.text_analysis import upsample_mix

    rates = {"src0": 3.0, "src1": 2.5}
    out = str(tmp_path / "mix")
    man = write_upsampled_shards(SF, out, rates=rates, default_rate=1.0,
                                 sample_seed=43, n_shards=8, seed=7)
    files = sorted(glob.glob(os.path.join(out, "shard=*", "part-*.parquet")))
    got = pd.concat([pq.read_table(f).to_pandas().assign(
        _shard=int(f.split("shard=")[1][:5])) for f in files])
    want = upsample_mix(SF, rates=rates, default_rate=1.0, seed=43).to_pandas()
    assert man["n_docs"] == len(want) == len(got)
    # per-orig-doc copy multiset matches the gate-checked operator
    got_counts = got.groupby("orig_doc_id").size().sort_index()
    want_counts = want.groupby("doc_id").size().sort_index()
    pd.testing.assert_series_equal(got_counts, want_counts,
                                   check_names=False)
    assert got["doc_id"].is_unique
    # copies spread: at least one replicated doc spans >= 2 shards
    multi = got[got.groupby("orig_doc_id")["copy"].transform("max") > 0]
    spread = multi.groupby("orig_doc_id")["_shard"].nunique()
    assert (spread >= 2).any()
    # rerun byte-identical
    out2 = str(tmp_path / "mix2")
    write_upsampled_shards(SF, out2, rates=rates, default_rate=1.0,
                           sample_seed=43, n_shards=8, seed=7)
    f1 = sorted(glob.glob(os.path.join(out, "shard=*", "part-*.parquet")))
    f2 = sorted(glob.glob(os.path.join(out2, "shard=*", "part-*.parquet")))
    assert [os.path.relpath(f, out) for f in f1] == \
           [os.path.relpath(f, out2) for f in f2]
    for a, b in zip(f1, f2):
        assert open(a, "rb").read() == open(b, "rb").read()


def test_train_val_test_split_determinism_and_branches(ray_session):
    """Split assignment is a pure function of (doc_id, seed): reruns and
    both adaptive plans agree; totals reconcile with the doc count; the
    admitted fractions approximate the requested 80/10/10 mix."""
    import duckdb
    import pandas as pd

    from sketch_ray.pipelines.sharding import train_val_test_split

    sf = "/root/testdata/sf0.001"
    a = train_val_test_split(sf).to_pandas()
    b = train_val_test_split(sf).to_pandas()
    c = train_val_test_split(sf, force="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/documents.parquet')").fetchone()[0]
    assert a["n_docs"].sum() == n
    frac_train = a.loc[a["split"] == "train", "n_docs"].sum() / n
    assert 0.7 < frac_train < 0.9
    # different seed -> different assignment (with overwhelming probability)
    d = train_val_test_split(sf, seed=99).to_pandas()
    assert not a.equals(d)


class TestCompaction:
    """compact_parquet_dir: the small-files janitor — bounded-row rewrite,
    atomic + resumable, digest-verified lossless."""

    def _shards(self, tmp_path, ray_session):
        import glob

        from sketch_ray.pipelines.sharding import write_training_shards

        d = str(tmp_path / "shards")
        write_training_shards(SF, d, n_shards=16, rows_per_file=20)
        return d, sorted(glob.glob(f"{d}/**/*.parquet", recursive=True))

    def test_lossless_bounded_and_verified(self, tmp_path, ray_session):
        import pyarrow.parquet as pq

        from sketch_ray.pipelines.sharding import (compact_parquet_dir,
                                                   verify_compaction)

        d, files = self._shards(tmp_path, ray_session)
        out = str(tmp_path / "out")
        m = compact_parquet_dir(d, out, rows_per_file=200)
        assert m["n_files_in"] == len(files) > m["n_files_out"]
        n_in = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        assert m["n_rows"] == n_in
        import glob

        outs = sorted(glob.glob(f"{out}/part-*.parquet"))
        assert len(outs) == m["n_files_out"]
        assert all(pq.ParquetFile(f).metadata.num_rows <= 200 for f in outs)
        assert verify_compaction(d, out)

    def test_resume_skips_and_tamper_recompacts(self, tmp_path, ray_session):
        import json
        import os

        from sketch_ray.pipelines.sharding import compact_parquet_dir

        d, files = self._shards(tmp_path, ray_session)
        out = str(tmp_path / "out")
        m1 = compact_parquet_dir(d, out, rows_per_file=200)
        mtime = os.stat(f"{out}/_DONE.json").st_mtime_ns
        m2 = compact_parquet_dir(d, out, rows_per_file=200, resume=True)
        assert m2 == m1
        assert os.stat(f"{out}/_DONE.json").st_mtime_ns == mtime
        # touching an input invalidates the fingerprint -> recompaction
        os.utime(files[0])
        m3 = compact_parquet_dir(d, out, rows_per_file=200, resume=True)
        assert os.stat(f"{out}/_DONE.json").st_mtime_ns != mtime
        assert m3["digest"] == m1["digest"]  # content unchanged

    def test_digest_detects_row_change(self, tmp_path, ray_session):
        import pyarrow.parquet as pq

        from sketch_ray.pipelines.sharding import (compact_parquet_dir,
                                                   verify_compaction)

        d, files = self._shards(tmp_path, ray_session)
        out = str(tmp_path / "out")
        compact_parquet_dir(d, out, rows_per_file=200)
        # corrupt one INPUT row after compaction: verification must fail
        t = pq.read_table(files[0])
        col = t.column_names.index("doc_id")
        import pyarrow as pa_

        ids = t["doc_id"].to_pylist()
        ids[0] = ids[0] + 10 ** 9
        t = t.set_column(col, "doc_id", pa_.array(ids, t.schema[col].type))
        pq.write_table(t, files[0])
        assert not verify_compaction(d, out)
