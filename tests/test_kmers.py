"""Cross-implementation conformance: our Ray k-mer pipeline vs the COMPILED
reference binary on the same FASTA pair — the reference repo's own de-facto
test strategy (SURVEY.md §5: all implementations must emit identical
heavy-hitter sets)."""

from __future__ import annotations

import random
import shutil
import subprocess
import sys

import pytest

MOTIF = "ACGTACGTTGCAACGTTGCA"  # planted 20-bp motif (BASELINE.md method)


def _write_fasta(path: str, n: int, plant_rate: float, seed: int) -> None:
    rng = random.Random(seed)
    with open(path, "w") as f:
        for i in range(n):
            f.write(f">seq{i}\n")
            s = "".join(rng.choice("ACGT") for _ in range(100))
            if rng.random() < plant_rate:
                pos = rng.randint(0, 80)
                s = s[:pos] + MOTIF + s[pos + 20:]
            f.write(s + "\n")


@pytest.fixture(scope="module")
def fasta_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("fasta")
    test, ctrl = str(d / "test.fasta"), str(d / "control.fasta")
    _write_fasta(test, 2000, 0.03, seed=1)
    _write_fasta(ctrl, 2000, 0.0, seed=2)
    return test, ctrl


@pytest.fixture(scope="module")
def reference_binary(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++ available to build the reference")
    d = tmp_path_factory.mktemp("refbuild")
    src = "/root/reference/src"
    out = str(d / "sketch")
    r = subprocess.run(
        ["g++", "-std=c++11", "-pthread", "-O3",
         f"{src}/sketch.cpp", f"{src}/fasta.cpp", f"{src}/MappedFile.cpp", "-o", out],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"reference build failed: {r.stderr[:300]}")
    return out


def test_kmer_pipeline_matches_reference_binary(ray_session, fasta_pair, reference_binary):
    test, ctrl = fasta_pair
    args = [test, ctrl, "10", "12", "30", "30", "30"]
    ref = subprocess.run([reference_binary, *args], capture_output=True, text=True, check=True)
    ref_set = sorted(line for line in ref.stdout.splitlines() if line.strip())

    from sketch_ray.pipelines.kmers import emerging_kmers
    from sketch_ray.sources.fasta import read_fasta

    out = emerging_kmers(read_fasta(test), read_fasta(ctrl), 10, 12, [30, 30, 30])
    our_set = sorted(f"{r['kmer']} {r['cnt']}" for _, r in out.iterrows())
    assert our_set == ref_set, (
        f"ref={len(ref_set)} ours={len(our_set)}; "
        f"only_ref={set(ref_set) - set(our_set)} only_ours={set(our_set) - set(ref_set)}"
    )


def test_kmer_window_semantics():
    """Windows reset at non-ACGT bytes and never cross rows."""
    import numpy as np
    import pyarrow as pa

    from sketch_ray.pipelines.kmers import _seq_bytes, _window_hashes

    batch = pa.table({"seq": pa.array(["ACGTN" + "ACGT", "TTTT"], pa.large_string())})
    data, row_index = _seq_bytes(batch)
    # length 4: row1 "ACGTNACGT" -> valid windows: ACGT (pos 0), ACGT (pos 5);
    # row2 "TTTT" -> TTTT. Nothing spans the N or the row boundary.
    got = list(_window_hashes(data, row_index, range(4, 5)))
    assert len(got) == 1
    L, starts, hashes = got[0]
    assert starts.tolist() == [0, 5, 9]
    assert hashes[0] == hashes[1]  # both ACGT
    assert hashes[0] != hashes[2]


def test_kmer_multi_length_incremental_consistency():
    """Incremental hash extension equals direct per-length hashing."""
    import numpy as np
    import pyarrow as pa

    from sketch_ray.pipelines.kmers import _seq_bytes, _window_hashes

    batch = pa.table({"seq": pa.array(["ACGTACGTACGTACGT"], pa.large_string())})
    data, row_index = _seq_bytes(batch)
    multi = {L: (s.tolist(), h.tolist()) for L, s, h in _window_hashes(data, row_index, range(3, 7))}
    for L in range(3, 7):
        single = {LL: (s.tolist(), h.tolist()) for LL, s, h in _window_hashes(data, row_index, range(L, L + 1))}
        assert multi[L] == single[L]


def test_first_crossing_semantics(ray_session, fasta_pair):
    """Conformance with the reference's `== threshold` emit-once variant
    (src/sketch_approx.cu:72, src/sketch_pipelined.cu:118-121): a key is
    emitted the first time its count reaches the threshold and its reported
    frequency is that crossing snapshot. Expectation computed by a sequential
    simulation over exact per-occurrence counts (counts grow by 1, the
    reference's update granularity)."""
    import collections

    import pandas as pd

    from sketch_ray.pipelines.kmers import heavy_kmers
    from sketch_ray.sources.fasta import read_fasta

    test, _ = fasta_pair
    TH = [30, 30, 30]

    # sequential emit-once simulation (sketch_approx-style, exact counts)
    counts: collections.Counter = collections.Counter()
    emitted: dict[tuple[int, str], int] = {}
    with open(test) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(">"):
                continue
            for L, th in zip((10, 11, 12), TH):
                for i in range(len(line) - L + 1):
                    w = line[i:i + L]
                    if any(c not in "ACGT" for c in w):
                        continue
                    counts[(L, w)] += 1
                    if counts[(L, w)] == th and (L, w) not in emitted:
                        emitted[(L, w)] = th  # crossing snapshot

    want = sorted((w, L, c) for (L, w), c in emitted.items())

    out = heavy_kmers(read_fasta(test), 10, 12, TH, semantics="first_crossing")
    got = sorted(zip(out["kmer"], out["length"], out["cnt"]))
    assert got == want

    # baseline semantics: same SET, refreshed final counts
    base = heavy_kmers(read_fasta(test), 10, 12, TH)
    assert sorted(zip(base["kmer"], base["length"])) == sorted(
        (w, L) for (w, L, _) in want)
    assert (base["cnt"].to_numpy() >= 30).all()


def test_read_fasta_distributed_path_parity(ray_session, fasta_pair, monkeypatch):
    """The large-corpus path (distributed read_text + parse stage) must
    yield the same rows as the small-file driver-parse fast path."""
    import sketch_ray.sources.fasta as fasta_mod

    test, _ = fasta_pair
    small = fasta_mod.read_fasta(test).to_pandas()
    monkeypatch.setattr(fasta_mod, "_SMALL_BYTES", 0)  # force read_text path
    big = fasta_mod.read_fasta(test).to_pandas()
    assert list(small["seq"]) == list(big["seq"])
