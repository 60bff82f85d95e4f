"""JSONL / CSV source-format parity (sources/textio).

The gate proves transport losslessness by value-hash vs the parquet oracle;
these tests pin the same equivalence in-process (text-format result ==
parquet-format result) plus the memoization contract.
"""

import os

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_matches_parquet(ray_session):
    from sketch_ray.pipelines.exact import tokens_per_lang
    from sketch_ray.sources.textio import jsonl_tokens_per_lang

    got = jsonl_tokens_per_lang(SF).to_pandas()
    want = tokens_per_lang(SF).to_pandas()[["lang", "n_tokens"]]
    assert got.equals(want.reset_index(drop=True))


def test_csv_roundtrip_matches_parquet(ray_session):
    from sketch_ray.pipelines.exact import events_per_type
    from sketch_ray.sources.textio import csv_events_per_type

    got = csv_events_per_type(SF).to_pandas()
    want = events_per_type(SF).to_pandas()
    assert got.equals(want.reset_index(drop=True))


def test_export_memoized_and_lossless(ray_session):
    """Second export call reuses the manifest-pinned directory; the JSONL
    round-trip preserves every text byte (exact string-set equality,
    including any unicode / quotes / escapes in the corpus)."""
    from sketch_ray.sources.textio import _export, read_jsonl

    p1 = _export(SF, "documents", ["text", "lang"], "jsonl")
    m1 = os.path.getmtime(f"{p1}/MANIFEST")
    p2 = _export(SF, "documents", ["text", "lang"], "jsonl")
    assert p1 == p2 and os.path.getmtime(f"{p2}/MANIFEST") == m1

    got = sorted(read_jsonl(p1).to_pandas()["text"].tolist())
    want = sorted(
        pq.read_table(f"{SF}/documents.parquet", columns=["text"])
        .column("text").to_pylist())
    assert got == want
