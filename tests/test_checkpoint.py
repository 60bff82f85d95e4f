"""Resumable checkpointed build: crash/resume byte-identity + lineage."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sketch_ray.stages.sketch_build import SketchSpec


@pytest.fixture(scope="module")
def sharded_input(tmp_path_factory):
    """sf0.001 documents split into 4 shard files under /tmp (testdata is
    read-only; boundaries via linspace so no row is dropped)."""
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text", "source", "n_chars"])
    d = tmp_path_factory.mktemp("shards")
    bounds = np.linspace(0, src.num_rows, 5).astype(int)
    files = []
    for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
        p = str(d / f"part-{i}.parquet")
        pq.write_table(src.slice(s, e - s), p)
        files.append(p)
    return files


SPECS = [
    SketchSpec("tok", "cmcu", "text", mode="tokens", params={"width": 1 << 12, "seed": 42}),
    SketchSpec("src", "hll", "source", mode="column", params={"p": 12, "seed": 42}),
    SketchSpec("blm", "bloom", "text", mode="tokens", params={"n_bits": 1 << 16, "n_hashes": 5, "seed": 42}),
]


def test_crash_resume_byte_identical(ray_session, sharded_input, tmp_path):
    from sketch_ray.state.checkpoint import CheckpointedBuild

    # straight-through run
    full = CheckpointedBuild(sharded_input, SPECS, str(tmp_path / "a")).run()

    # crashed run: 2 shards, then a fresh orchestrator resumes the rest
    cb1 = CheckpointedBuild(sharded_input, SPECS, str(tmp_path / "b"))
    partial = cb1.run(max_shards=2)
    manifest = json.load(open(tmp_path / "b" / "manifest.json"))
    assert manifest["status"] == "partial" and manifest["n_done"] == 2

    cb2 = CheckpointedBuild(sharded_input, SPECS, str(tmp_path / "b"))
    resumed = cb2.run()
    manifest = json.load(open(tmp_path / "b" / "manifest.json"))
    assert manifest["status"] == "done" and manifest["n_done"] == 4

    for name in ("tok", "src", "blm"):  # sum/max/or merges -> byte identity
        assert full[name].to_bytes() == resumed[name].to_bytes()


def test_resume_skips_done_shards(ray_session, sharded_input, tmp_path):
    from sketch_ray.state.checkpoint import CheckpointedBuild

    ck = str(tmp_path / "c")
    CheckpointedBuild(sharded_input, SPECS, ck).run()
    m1 = json.load(open(os.path.join(ck, "manifest.json")))
    walls = {s: v["wall_s"] for s, v in m1["shards"].items()}
    # second run must not re-execute anything: manifests identical per shard
    CheckpointedBuild(sharded_input, SPECS, ck).run()
    m2 = json.load(open(os.path.join(ck, "manifest.json")))
    assert {s: v["wall_s"] for s, v in m2["shards"].items()} == walls


def test_lineage_metrics_recorded(ray_session, sharded_input, tmp_path):
    from sketch_ray.state.checkpoint import CheckpointedBuild

    ck = str(tmp_path / "d")
    CheckpointedBuild(sharded_input, SPECS, ck).run()
    m = json.load(open(os.path.join(ck, "manifest.json")))
    assert len(m["specs"]) == 3 and m["specs"][0]["params"]["seed"] == 42
    for sid, info in m["shards"].items():
        assert os.path.exists(info["input"])
        assert info["rows"] > 0 and info["wall_s"] > 0 and info["status"] == "done"
    assert m["totals"]["rows"] == sum(v["rows"] for v in m["shards"].values())


def test_checkpointed_result_matches_unsharded(ray_session, sharded_input, tmp_path):
    """Global sketch from 4 shards answers identically to a single-pass
    build over the unsharded table (sum-merge correctness across shards)."""
    import ray.data as rd

    from sketch_ray.stages.sketch_build import build_sketches
    from sketch_ray.state.checkpoint import CheckpointedBuild

    sharded = CheckpointedBuild(sharded_input, SPECS, str(tmp_path / "e")).run()
    direct = build_sketches(
        rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text", "source", "n_chars"]),
        SPECS, batch_size=100000,
    )
    assert round(sharded["src"].estimate()) == round(direct["src"].estimate())
    probe = ["the", "data", "key", "absent_zz"]
    # CU estimates may differ by partitioning, but both must upper-bound the
    # truth; the Bloom OR must contain every inserted key either way
    assert (sharded["blm"].contains(probe[:3])).all()
    assert (direct["blm"].contains(probe[:3])).all()
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["text"])
    import collections
    true_counts = collections.Counter(
        tok for s in t.column("text").to_pylist() for tok in s.split(" ")
    )
    for k in probe[:3]:
        assert sharded["tok"].query([k])[0] >= true_counts[k]
        assert direct["tok"].query([k])[0] >= true_counts[k]
