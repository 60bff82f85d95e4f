"""Incremental sketch-artifact maintenance (pipelines/continuous.py):
update-only-scans-new-data lineage, byte-identity vs full rebuild,
estimate correctness of the updated artifact, idempotent re-update."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from sketch_ray.pipelines.continuous import (_artifact_specs,
                                             artifact_dirs,
                                             _snapshot_files,
                                             update_artifact,
                                             update_sketch_artifact)
from sketch_ray.state.checkpoint import CheckpointedBuild

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def artifact_run(ray_session):
    """One full update_sketch_artifact run; individual tests assert on the
    shared result plus the on-disk artifact it leaves behind."""
    out = update_sketch_artifact(SF).to_pandas()
    s0, s1, base = _snapshot_files(SF)
    return out, s0, s1, base


def test_gated_verdicts_true(artifact_run):
    out, *_ = artifact_run
    assert sorted(out["sketch"]) == ["bloom_source", "cm_tokens",
                                     "cmcu_tokens", "dd_chars",
                                     "hll_source", "ps_docs"]
    assert out["matches_rebuild"].all()
    assert out["scanned_incrementally"].all()


def test_update_scans_only_new_snapshot(artifact_run):
    """Snapshot 0's lineage row AND partial file are bit-identical across
    the update — the update's cost is O(new snapshot) by construction."""
    out, s0, s1, base = artifact_run
    with open(os.path.join(artifact_dirs(base)[0], "manifest.json")) as f:
        manifest = json.load(f)
    sid0, sid1 = CheckpointedBuild.shard_id(s0), CheckpointedBuild.shard_id(s1)
    assert manifest["shards"][sid0]["input"] == s0
    assert manifest["shards"][sid1]["input"] == s1
    assert manifest["n_done"] == 2 and manifest["status"] == "done"
    # rows in lineage == rows in the snapshot files (nothing dropped)
    assert (manifest["shards"][sid0]["rows"]
            == pq.ParquetFile(s0).metadata.num_rows)
    assert (manifest["shards"][sid1]["rows"]
            == pq.ParquetFile(s1).metadata.num_rows)


def test_byte_identity_update_vs_rebuild(artifact_run, ray_session):
    """Explicit per-sketch byte comparison (the query folds this into one
    boolean; here each kind is asserted separately so a regression names
    the kernel that broke)."""
    out, s0, s1, base = artifact_run
    upd = update_artifact(artifact_dirs(base)[0], [s0, s1],
                          columns=["doc_id", "text", "source", "n_chars"])
    full = update_artifact(artifact_dirs(base)[1], [s0, s1],
                           columns=["doc_id", "text", "source", "n_chars"])
    for name in sorted(upd):
        assert upd[name].to_bytes() == full[name].to_bytes(), name


def test_updated_artifact_answers_queries(artifact_run, ray_session):
    """The updated artifact's estimates hold over the UNION of snapshots:
    CM/CM-CU never undercount, CU <= CM, HLL within its published bound,
    Bloom has zero false negatives — all without rescanning snapshot 0."""
    out, s0, s1, base = artifact_run
    upd = update_artifact(artifact_dirs(base)[0], [s0, s1],
                          columns=["doc_id", "text", "source", "n_chars"])
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "source", "n_chars"])
    toks = pc.list_flatten(pc.split_pattern(t.column("text"), " "))
    vals, counts = toks.value_counts().flatten()
    true_cnt = dict(zip(vals.to_pylist(), counts.to_pylist()))
    top = sorted(true_cnt, key=true_cnt.get, reverse=True)[:30]
    cm = upd["cm_tokens"].query(np.array(top))
    cu = upd["cmcu_tokens"].query(np.array(top))
    truth = np.array([true_cnt[k] for k in top])
    assert (cm >= truth).all() and (cu >= truth).all()
    assert (cu <= cm).all()
    srcs = pc.unique(t.column("source"))
    n_src = len(srcs)
    est = upd["hll_source"].estimate()
    assert abs(est - n_src) <= 5 * upd["hll_source"].rel_error_bound() * n_src + 1
    assert upd["bloom_source"].contains(srcs.to_numpy(zero_copy_only=False)
                                        .astype(str)).all()
    # DDSketch: relative-error bound over the UNION's n_chars distribution
    nch = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"]) \
        .column("n_chars").to_numpy().astype(np.float64)
    qs = np.array([0.1, 0.5, 0.9, 0.99])
    got = np.asarray(upd["dd_chars"].quantile(qs))
    exact = np.quantile(nch, qs, method="lower")
    assert (np.abs(got - exact) <= 0.01 * np.abs(exact) + 1e-9).all()
    # priority sample: the union holds 500 docs ≤ k=512, so tau = 0 and
    # the total char-volume estimate is EXACT over the updated artifact
    ps = upd["ps_docs"]
    assert ps.tau() == 0.0
    assert abs(ps.estimate() - float(nch.sum())) < 1e-9


def test_reupdate_is_noop(artifact_run, ray_session):
    """Calling update again with the same snapshot list rescans nothing:
    every lineage row (incl. recorded wall seconds) is unchanged."""
    out, s0, s1, base = artifact_run
    mpath = os.path.join(artifact_dirs(base)[0], "manifest.json")
    with open(mpath) as f:
        before = json.load(f)["shards"]
    update_artifact(artifact_dirs(base)[0], [s0, s1],
                    columns=["doc_id", "text", "source", "n_chars"])
    with open(mpath) as f:
        after = json.load(f)["shards"]
    assert before == after


def test_out_of_order_arrival_scans_only_new_file(artifact_run, ray_session,
                                                  tmp_path):
    """A late-arriving file that sorts BEFORE every existing shard must not
    invalidate them: shard ids are path-keyed, not positional, so the
    update scans only the new file (O(new data) even when sort order
    shifts). Regression test for the positional-id rescan bug."""
    out, s0, s1, base = artifact_run
    ckpt = str(tmp_path / "ckpt_ooo")
    update_artifact(ckpt, [s1], columns=["doc_id", "text", "source", "n_chars"])
    mpath = os.path.join(ckpt, "manifest.json")
    with open(mpath) as f:
        row_before = json.load(f)["shards"][CheckpointedBuild.shard_id(s1)]
    # "early.parquet" under tmp_path sorts before /tmp/...: either way the
    # combined sorted([early, s1]) puts the new file at index 0 or 1 —
    # assert lineage survival regardless
    early = str(tmp_path / "aaa_early.parquet")
    pq.write_table(pq.read_table(s0, columns=["doc_id", "text", "source", "n_chars"])
                   .slice(0, 50), early)
    upd = update_artifact(ckpt, [early, s1], columns=["doc_id", "text", "source", "n_chars"])
    with open(mpath) as f:
        manifest = json.load(f)
    # s1's lineage row (incl. recorded wall_s) is bit-identical: not rescanned
    assert manifest["shards"][CheckpointedBuild.shard_id(s1)] == row_before
    assert manifest["n_done"] == 2 and manifest["status"] == "done"
    # and the artifact equals a from-scratch rebuild over both files
    full = update_artifact(str(tmp_path / "ckpt_ooo_full"), [early, s1],
                           columns=["doc_id", "text", "source", "n_chars"])
    for name in sorted(upd):
        assert upd[name].to_bytes() == full[name].to_bytes(), name


def test_snapshots_partition_corpus(artifact_run):
    """The two snapshots are a disjoint cover of documents.parquet."""
    out, s0, s1, base = artifact_run
    n0 = pq.ParquetFile(s0).metadata.num_rows
    n1 = pq.ParquetFile(s1).metadata.num_rows
    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert n0 + n1 == n and n1 > 0 and n0 > 0
    d0 = pq.read_table(s0, columns=["doc_id"]).column("doc_id").to_numpy()
    d1 = pq.read_table(s1, columns=["doc_id"]).column("doc_id").to_numpy()
    assert not np.intersect1d(d0, d1).size
    assert out["n_rows"].iloc[0] == n
