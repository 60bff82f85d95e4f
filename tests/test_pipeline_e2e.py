"""End-to-end spine: pages fixture → read_parquet → extract → tokenize →
sketch-build actor pool → tree merge → queries vs exact oracle (SURVEY.md §7.1
step 2)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from sketch_ray.sources.pages import HOT_EMERGING, HOT_PERSISTENT, generate_pages, write_pages_fixture
from sketch_ray.stages.extract import extract_text_array
from sketch_ray.stages.sketch_build import SketchSpec, build_sketches
from sketch_ray.stages.tokenize import ngrams, token_counts


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("pages")
    return write_pages_fixture(str(out), n_rows=400, seed=42, n_files=4)


@pytest.fixture(scope="module")
def pages_table(pages_dir):
    import pyarrow.parquet as pq

    return pq.read_table(pages_dir)


def exact_token_counts(table: pa.Table) -> dict[str, int]:
    vc = pc.value_counts(pc.list_flatten(pc.split_pattern(table["text"].combine_chunks(), " ")))
    return dict(zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()))


def test_extractor_invariant(pages_table):
    ext = extract_text_array(pages_table["html"])
    assert ext.to_pylist() == pages_table["text"].to_pylist()


def test_ngrams_within_rows_only():
    t = pa.table({"text": pa.array(["a b c", "d e"], pa.large_string())})
    grams = ngrams(t["text"], 2).to_pylist()
    assert grams == ["a b", "b c", "d e"]
    grams3 = ngrams(t["text"], 3).to_pylist()
    assert grams3 == ["a b c"]


def test_token_counts_match_exact(pages_table):
    keys, counts = token_counts(pages_table["text"])
    exact = exact_token_counts(pages_table)
    got = dict(zip(keys.to_pylist(), counts.tolist()))
    assert got == exact


def test_e2e_sketch_build(ray_session, pages_dir, pages_table):
    import ray.data as rd

    ds = rd.read_parquet(pages_dir)
    specs = [
        SketchSpec("tok_cmcu", "cmcu", "text", mode="tokens", params={"width": 1 << 14, "seed": 42}),
        SketchSpec("url_hll", "hll", "url", mode="column", params={"p": 12, "seed": 42}),
        SketchSpec("len_kll", "kll", "text", mode="numeric_len", params={"k": 200, "seed": 42}),
    ]
    # numeric_len isn't a mode; use n_chars computed upstream instead
    specs[2] = SketchSpec("len_kll", "kll", "n_chars", mode="numeric", params={"k": 200, "seed": 42})
    ds = ds.map_batches(
        lambda b: b.append_column("n_chars", pc.cast(pc.utf8_length(b["text"]), pa.int64())),
        batch_format="pyarrow",
    )
    sketches = build_sketches(ds, specs, batch_size=64, concurrency=2)
    assert set(sketches) == {"tok_cmcu", "url_hll", "len_kll"}

    exact = exact_token_counts(pages_table)
    keys = list(exact)
    est = sketches["tok_cmcu"].query(keys)
    true = np.array([exact[k] for k in keys])
    assert (est >= true).all(), "distributed CM-CU undercounted"
    n = int(true.sum())
    eps_n = np.e / (1 << 14) * n
    assert ((est - true) <= eps_n).mean() > 0.98

    n_urls = len(set(pages_table["url"].to_pylist()))
    hll = sketches["url_hll"]
    assert abs(hll.estimate() - n_urls) <= 4 * hll.rel_error_bound() * n_urls + 3

    lens = pc.utf8_length(pages_table["text"]).to_numpy()
    med = sketches["len_kll"].quantile(0.5)
    sorted_ = np.sort(lens)
    r = np.searchsorted(sorted_, med, side="right") / len(lens)
    assert abs(r - 0.5) <= 0.05


def test_e2e_deterministic_across_parallelism(ray_session, pages_dir):
    """Same global sketch bytes at different batch sizes is NOT required
    (partials differ), but query answers for hot tokens must be stable and
    never undercount; HLL/Bloom global state must be byte-identical since
    max/or-merge is partition-invariant."""
    import ray.data as rd

    def run(batch_size):
        ds = rd.read_parquet(pages_dir)
        specs = [SketchSpec("url_hll", "hll", "url", mode="column", params={"p": 12, "seed": 42})]
        return build_sketches(ds, specs, batch_size=batch_size)["url_hll"]

    a, b = run(50), run(200)
    assert a.to_bytes() == b.to_bytes()


def test_planted_hot_tokens_present():
    t = generate_pages(400, seed=42, snapshot="test")
    exact = exact_token_counts(t)
    for k in HOT_EMERGING + HOT_PERSISTENT:
        assert exact.get(k, 0) > 0
    c = generate_pages(400, seed=43, snapshot="control")
    exact_c = exact_token_counts(c)
    for k in HOT_EMERGING:
        assert exact_c.get(k, 0) == 0


def test_emerging_pipeline_finds_planted_keys(ray_session, tmp_path):
    """North-star conformance: test/control snapshot pair with planted
    emerging + persistent hot tokens -> the emerging-heavy-hitter pipeline
    must report exactly the planted-emerging set (reference analog: the
    planted 20-bp motif recovered identically by all three binaries,
    BASELINE.md)."""
    import ray.data as rd

    from sketch_ray.pipelines.heavy_hitters import emerging_heavy_hitters
    from sketch_ray.sources.pages import write_pages_fixture

    test_dir = write_pages_fixture(str(tmp_path / "test"), n_rows=400, seed=42,
                                   snapshot="test", hot_rate=0.05)
    ctrl_dir = write_pages_fixture(str(tmp_path / "ctrl"), n_rows=400, seed=42,
                                   snapshot="control", hot_rate=0.05)

    spec = SketchSpec("em", "cmcu", "text", mode="tokens", params={"width": 1 << 14, "seed": 42})
    test_ds = rd.read_parquet(test_dir, columns=["text"])
    ctrl_ds = rd.read_parquet(ctrl_dir, columns=["text"])

    # threshold low enough that every planted hot token qualifies
    exact = exact_token_counts(__import__("pyarrow.parquet", fromlist=["pq"]).read_table(test_dir, columns=["text"]))
    threshold = min(exact[t] for t in HOT_EMERGING + HOT_PERSISTENT)
    out = emerging_heavy_hitters(test_ds, ctrl_ds, spec, threshold, growth=2)

    reported = set(out["token"])
    assert set(HOT_EMERGING) <= reported, f"missing emerging keys: {set(HOT_EMERGING) - reported}"
    assert not (set(HOT_PERSISTENT) & reported), "persistent keys must be pruned by the control scan"
    # every reported token really is emerging per the exact rule
    ctrl_exact = exact_token_counts(__import__("pyarrow.parquet", fromlist=["pq"]).read_table(ctrl_dir, columns=["text"]))
    for _, r in out.iterrows():
        assert exact[r["token"]] == r["test_cnt"]
        assert ctrl_exact.get(r["token"], 0) == r["control_cnt"]
        assert r["test_cnt"] // 2 - r["control_cnt"] > 0


def test_jsonl_source_roundtrip(ray_session, tmp_path):
    """JSONL ingest normalizes back to the exact canonical pages schema and
    content (source-format coverage beyond Parquet)."""
    import pyarrow.parquet as pq

    from sketch_ray.sources.pages import read_pages_jsonl, write_pages_jsonl, write_pages_fixture

    jd = write_pages_jsonl(str(tmp_path / "jsonl"), n_rows=60, seed=42)
    pd_dir = write_pages_fixture(str(tmp_path / "parq"), n_rows=60, seed=42)
    got = read_pages_jsonl(jd).to_pandas().sort_values("url").reset_index(drop=True)
    want = pq.read_table(pd_dir).to_pandas().sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    assert [bytes(x) for x in got["html"]] == [bytes(x) for x in want["html"]]
    assert got["warc_ts"].tolist() == want["warc_ts"].tolist()

    # and the extractor invariant holds over the JSONL-ingested corpus too
    from sketch_ray.stages.extract import extract_text_array

    t = read_pages_jsonl(jd).to_pandas()
    ext = extract_text_array(pa.array([bytes(x) for x in t["html"]], pa.binary()))
    assert ext.to_pylist() == t["text"].tolist()


def test_host_hll_cardinality(ray_session, pages_dir, pages_table):
    """north_star: distinct url/host cardinality via HLL with host parsed
    from url in a stateless map — estimates vs exact within HLL bounds."""
    import ray.data as rd

    from sketch_ray.stages.extract import add_host, host_of_url

    ds = rd.read_parquet(pages_dir, columns=["url"]).map_batches(
        add_host, batch_format="pyarrow", batch_size=4096
    )
    specs = [
        SketchSpec("urls", "hll", "url", mode="column", params={"p": 12, "seed": 42}),
        SketchSpec("hosts", "hll", "host", mode="column", params={"p": 12, "seed": 42}),
    ]
    sk = build_sketches(ds, specs, batch_size=4096)
    exact_urls = len(set(pages_table["url"].to_pylist()))
    exact_hosts = len(set(host_of_url(pages_table["url"]).to_pylist()))
    assert abs(sk["urls"].estimate() - exact_urls) <= max(3, 0.05 * exact_urls)
    assert abs(sk["hosts"].estimate() - exact_hosts) <= max(3, 0.05 * exact_hosts)
    # parse sanity
    hosts = host_of_url(pa.array(["https://host00001.example/a/b", "http://x.y:8080/q?z"]))
    assert hosts.to_pylist() == ["host00001.example", "x.y"]


def test_pipelines_tolerate_empty_input(ray_session, tmp_path):
    """Hardening: every documents-driven pipeline must handle a 0-row table
    (empty partitions are routine at scale)."""
    import pyarrow.parquet as pq

    import pyarrow as _pa

    schema = _pa.schema([("doc_id", _pa.int64()), ("text", _pa.string()),
                         ("lang", _pa.string()), ("source", _pa.string()),
                         ("n_chars", _pa.int64())])
    d = tmp_path / "empty"
    d.mkdir()
    pq.write_table(schema.empty_table(), str(d / "documents.parquet"))

    from sketch_ray.pipelines import dedup, text_analysis

    assert dedup.exact_dedup_docs(str(d)).num_rows == 0
    assert dedup.jaccard_near_dups(str(d)).num_rows == 0
    assert dedup.simhash_near_dups(str(d)).num_rows == 0
    assert text_analysis.quality_scores(str(d)).num_rows == 0
    assert text_analysis.doc_fingerprints(str(d)).num_rows == 0
    assert text_analysis.dup_span_stats(str(d)).num_rows == 0

    from sketch_ray.pipelines import exact, relational, similarity

    assert exact.grouped_quantiles_exact(str(d)).num_rows == 0
    assert exact.doc_length_deciles(str(d)).num_rows == 0

    pq.write_table(_pa.schema(
        [("event_id", _pa.int64()), ("ts", _pa.timestamp("us")),
         ("user_id", _pa.int64()), ("event_type", _pa.string()),
         ("value", _pa.float64())]).empty_table(), str(d / "events.parquet"))
    pq.write_table(_pa.schema(
        [("vec_id", _pa.int64()), ("embedding", _pa.list_(_pa.float32())),
         ("label", _pa.int32())]).empty_table(), str(d / "embeddings.parquet"))
    pq.write_table(_pa.table({"c_custkey": _pa.array([1, 2], _pa.int64())}),
                   str(d / "customer.parquet"))
    pq.write_table(_pa.schema(
        [("o_custkey", _pa.int64()), ("o_totalprice", _pa.float64())])
        .empty_table(), str(d / "orders.parquet"))

    funnel = relational.funnel_steps(str(d)).to_pandas()
    assert funnel["n_users"].tolist() == [0, 0, 0]
    assert relational.rolling_user_stats(str(d)).num_rows == 0
    assert similarity.semantic_decontaminate(str(d)).num_rows == 0
    assert similarity.label_centroids(str(d)).num_rows == 0
    for force in ("driver", "native"):
        cop = relational.customer_order_profile(str(d), force=force).to_pandas()
        assert cop["n_orders"].tolist() == [0, 0]
        assert cop["total_spent"].tolist() == [0.0, 0.0]


def test_csv_source_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from sketch_ray.sources.pages import read_pages_csv, write_pages_csv, write_pages_fixture

    cd = write_pages_csv(str(tmp_path / "csv"), n_rows=60, seed=42)
    pd_dir = write_pages_fixture(str(tmp_path / "parq2"), n_rows=60, seed=42)
    got = read_pages_csv(cd).to_pandas().sort_values("url").reset_index(drop=True)
    want = pq.read_table(pd_dir).to_pandas().sort_values("url").reset_index(drop=True)
    assert got["text"].tolist() == want["text"].tolist()
    assert [bytes(x) for x in got["html"]] == [bytes(x) for x in want["html"]]
    assert got["warc_ts"].tolist() == want["warc_ts"].tolist()


def test_gram_novelty_curve_hand_case_and_branches(ray_session, tmp_path):
    """Trigram novelty by hand on a 4-doc corpus with a known first-seen
    bucket per gram; doc-boundary windows excluded; adaptive branches
    agree at sf0.001; cum_vocab is the running total."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.exact import gram_novelty_curve

    # doc 0: grams "a b c","b c d"; doc 1: repeats "a b c" (not new);
    # doc 2: too short for a trigram; doc 3: gram "x y z"
    texts = ["a b c d", "a b c", "a b", "x y z"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    out = gram_novelty_curve(str(tmp_path), n=3, n_buckets=4).to_pandas()
    # buckets: doc_id d -> (d*4)//4 = d; new grams: doc0 -> 2, doc3 -> 1
    assert out["bucket"].tolist() == [0, 3]
    assert out["new_grams"].tolist() == [2, 1]
    assert out["cum_vocab"].tolist() == [2, 3]

    sf = "/root/testdata/sf0.001"
    a = gram_novelty_curve(sf, n=3).to_pandas()
    b = gram_novelty_curve(sf, n=3, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert (np.diff(a["cum_vocab"].to_numpy()) ==
            a["new_grams"].to_numpy()[1:]).all()


def test_trimmed_mean_lengths_hand_case_and_branches(ray_session, tmp_path):
    """Trimmed mean by hand: 10 docs of lengths 1..10 at 10/90 trim keep
    1..9 (ceil-rule cuts: lo=ceil(0.1*10)=1st value=1, hi=ceil(0.9*10)=9th
    value=9) -> mean 5; adaptive branches agree at sf0.001 and match the
    DuckDB quantile_disc band."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.exact import trimmed_mean_lengths

    n = 10
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["w"] * n),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array(list(range(1, n + 1)), pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    out = trimmed_mean_lengths(str(tmp_path)).to_pandas()
    assert out["n_kept"].tolist() == [9]
    assert out["trimmed_mean"].tolist() == [5.0]

    sf = "/root/testdata/sf0.001"
    a = trimmed_mean_lengths(sf).to_pandas()
    b = trimmed_mean_lengths(sf, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ref = duckdb.sql(f"""
        WITH b AS (SELECT lang, quantile_disc(n_chars, 0.1) AS lo,
                          quantile_disc(n_chars, 0.9) AS hi
                   FROM read_parquet('{sf}/documents.parquet') GROUP BY lang)
        SELECT d.lang, count(*) AS n_kept, round(avg(d.n_chars), 6) AS trimmed_mean
        FROM read_parquet('{sf}/documents.parquet') d JOIN b USING (lang)
        WHERE d.n_chars BETWEEN b.lo AND b.hi
        GROUP BY d.lang ORDER BY lang""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)


def test_corpus_checksum_invariance(ray_session, tmp_path):
    """Order-invariant integrity checksum: equals the numpy reference,
    survives row permutation, changes on any edit or duplication."""
    import numpy as np
    import pyarrow.parquet as pq

    from sketch_ray.kernels.hashing import hash_arrow_strings, splitmix64
    from sketch_ray.pipelines._sqlgen import mix_constant
    from sketch_ray.pipelines.exact import corpus_checksum

    sf = "/root/testdata/sf0.001"
    base = corpus_checksum(sf).to_pandas()

    t = pq.read_table(f"{sf}/documents.parquet")
    mix = np.uint64(mix_constant(42))
    h = hash_arrow_strings(t["text"].combine_chunks(), seed=1)
    idh = splitmix64(t["doc_id"].to_numpy().astype(np.uint64) ^ mix)
    ref = (h ^ idh).sum(dtype=np.uint64)
    assert int(base.loc[0, "checksum"]) == int(
        np.array([ref], np.uint64).view(np.int64)[0])
    assert int(base.loc[0, "n_docs"]) == t.num_rows

    def write_variant(tbl, name):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tbl, str(d / "documents.parquet"))
        return str(d)

    rng = np.random.default_rng(3)
    perm = t.take(rng.permutation(t.num_rows))
    assert corpus_checksum(write_variant(perm, "perm")).to_pandas() \
        .loc[0, "checksum"] == base.loc[0, "checksum"]

    texts = t["text"].to_pylist()
    texts[7] = texts[7] + "x"
    edited = t.set_column(t.schema.get_field_index("text"), "text",
                          pa.array(texts, t["text"].type))
    assert corpus_checksum(write_variant(edited, "edit")).to_pandas() \
        .loc[0, "checksum"] != base.loc[0, "checksum"]

    dup = pa.concat_tables([t, t.slice(0, 1)])
    assert corpus_checksum(write_variant(dup, "dup")).to_pandas() \
        .loc[0, "checksum"] != base.loc[0, "checksum"]
