"""Dedup + similarity-search pipeline tests (sf0.001, DuckDB cross-checks)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


# -- kernels (no Ray) --------------------------------------------------------

def test_shingle_hashes_window_semantics():
    from sketch_ray.pipelines.dedup import _shingle_hashes

    th = np.arange(10, dtype=np.uint64)
    offsets = np.array([0, 5, 10], dtype=np.int64)  # two docs of 5 tokens
    sh, di = _shingle_hashes(th, offsets, k=3)
    assert len(sh) == 6  # 3 windows per doc, none across the boundary
    assert (di == np.array([0, 0, 0, 1, 1, 1])).all()


def test_minhash_estimates_jaccard():
    from sketch_ray.pipelines.dedup import _minhash_signatures

    rng = np.random.default_rng(0)
    base = [f"tok{i}" for i in range(60)]
    a = " ".join(base)
    b = " ".join(base[:48] + [f"other{i}" for i in range(12)])  # J ~ 0.48/0.6
    batch = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array([a, b])})
    ids, sig = _minhash_signatures(batch, k=3, num_perm=256, seed=42)
    est = (sig[0] == sig[1]).mean()
    # true jaccard of 3-shingles of these token streams
    sa = {tuple(base[i:i + 3]) for i in range(58)}
    toks_b = base[:48] + [f"other{i}" for i in range(12)]
    sb = {tuple(toks_b[i:i + 3]) for i in range(58)}
    true_j = len(sa & sb) / len(sa | sb)
    assert abs(est - true_j) < 0.12  # 256 perms -> s.e. ~ 0.03


def test_simhash_identical_and_different():
    from sketch_ray.pipelines.dedup import _simhash

    t = "the quick brown fox jumps over the lazy dog"
    batch = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                      "text": pa.array([t, t, "completely different words entirely unrelated"])})
    ids, sigs = _simhash(batch)
    assert sigs[0] == sigs[1]
    assert bin(int(sigs[0] ^ sigs[2])).count("1") > 10


# -- pipelines vs DuckDB (exact semantics) -----------------------------------

def test_exact_dedup_matches_duckdb(ray_session):
    from sketch_ray.pipelines.dedup import exact_dedup_docs

    got = exact_dedup_docs(SF).to_pandas()
    want = _duck().execute(
        "SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents "
        "GROUP BY text ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(got, want.astype({"n_copies": got["n_copies"].dtype}))


def test_jaccard_near_dups_matches_duckdb(ray_session):
    from sketch_ray.pipelines.dedup import jaccard_near_dups

    got = jaccard_near_dups(SF, k=3, tau=0.5).to_pandas()
    want = _duck().execute("""
        WITH sh AS (
            SELECT doc_id, unnest(range(len(string_split(text,' '))-2)) AS i,
                   string_split(text,' ') AS toks FROM documents
        ), shing AS (
            SELECT DISTINCT doc_id, array_to_string(list_slice(toks,i+1,i+3),' ') AS s FROM sh
        ), sizes AS (SELECT doc_id, count(*) n FROM shing GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id da, b.doc_id db, count(*) i FROM shing a JOIN shing b
            ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY da, db)
        SELECT da AS doc_a, db AS doc_b, round(i*1.0/(sa.n+sb.n-i),6) AS jaccard
        FROM inter JOIN sizes sa ON sa.doc_id=da JOIN sizes sb ON sb.doc_id=db
        WHERE round(i*1.0/(sa.n+sb.n-i),6) >= 0.5 ORDER BY doc_a, doc_b
    """).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_minhash_lsh_finds_high_jaccard_pairs(ray_session):
    from sketch_ray.pipelines.dedup import jaccard_near_dups, minhash_lsh_near_dups

    exact = jaccard_near_dups(SF, k=3, tau=0.8).to_pandas()
    lsh = minhash_lsh_near_dups(SF, k=3, tau=0.8).to_pandas()
    pd.testing.assert_frame_equal(lsh, exact.astype(lsh.dtypes.to_dict()))


def test_simhash_near_dups_deterministic(ray_session):
    from sketch_ray.pipelines.dedup import simhash_near_dups

    a = simhash_near_dups(SF).to_pandas()
    b = simhash_near_dups(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # symmetric sanity: doc_a < doc_b everywhere, hamming within bound
    if len(a):
        assert (a["doc_a"] < a["doc_b"]).all()
        assert (a["hamming"] <= 3).all()


def test_embedding_near_dups_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.similarity import embedding_near_dups

    got = embedding_near_dups(SF, tau=0.35).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    ia, ib = np.nonzero(np.triu(sims >= 0.35, 1))
    want = pd.DataFrame({
        "vec_a": ids[ia], "vec_b": ids[ib], "cosine": np.round(sims[ia, ib], 6)
    }).sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_ann_topk_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.similarity import ann_topk

    got = ann_topk(SF, k=3, n_queries=4).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    rows = []
    for q in range(4):
        qi = np.flatnonzero(ids == q)[0]
        sims = m @ m[qi]
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))
        order = [i for i in order if ids[i] != q][:3]
        for rank, i in enumerate(order, 1):
            rows.append((q, rank, int(ids[i]), round(float(sims[i]), 6)))
    want = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "cosine"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_lsh_ann_is_subset_with_exact_scores(ray_session):
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.similarity import lsh_ann_topk

    got = lsh_ann_topk(SF, k=3, n_queries=64).to_pandas()
    # every reported neighbor's cosine must equal the true cosine
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    idx = {int(v): i for i, v in enumerate(ids)}
    for _, r in got.iterrows():
        true = float(m[idx[int(r["query_id"])]] @ m[idx[int(r["vec_id"])]])
        assert abs(round(true, 6) - r["cosine"]) < 1e-9


def test_ivf_ann_recall_vs_bruteforce(ray_session):
    # n_queries=64: a realistic query batch — the stage must stay vectorized
    # (block matmul per probed cell), not loop per query
    from sketch_ray.pipelines.similarity import ann_topk, ivf_ann_topk

    exact = ann_topk(SF, k=5, n_queries=64).to_pandas()
    ivf = ivf_ann_topk(SF, k=5, n_queries=64, n_cells=8, nprobe=4).to_pandas()
    # deterministic across runs
    ivf2 = ivf_ann_topk(SF, k=5, n_queries=64, n_cells=8, nprobe=4).to_pandas()
    pd.testing.assert_frame_equal(ivf, ivf2)
    # recall@5 with half the cells probed should be high on clustered data
    hits = tot = 0
    for q in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == q]["vec_id"])
        g = set(ivf[ivf["query_id"] == q]["vec_id"])
        hits += len(e & g); tot += len(e)
    assert hits / tot >= 0.6, f"IVF recall too low: {hits}/{tot}"
    # scores it does return are exact (same rounding as brute force)
    merged = ivf.merge(exact, on=["query_id", "vec_id"], suffixes=("_ivf", "_bf"))
    assert (merged["cosine_ivf"] == merged["cosine_bf"]).all()


def test_minhash_lsh_sf01_known_pairs(ray_session):
    """sf0.1 carries 256 known Jaccard>=0.5 near-dup pairs (BASELINE.md):
    the LSH path must reproduce the exact inverted-index result there with
    its fully vectorized verification (no per-pair Python loop) —
    timing-insensitive, result-equality only."""
    from sketch_ray.pipelines.dedup import jaccard_near_dups, minhash_lsh_near_dups

    sf = "/root/testdata/sf0.1"
    exact = jaccard_near_dups(sf, k=3, tau=0.5).to_pandas()
    lsh = minhash_lsh_near_dups(sf, k=3, tau=0.5, bands=64, num_perm=128).to_pandas()
    assert len(exact) >= 250  # the corpus's known dup-pair population
    pd.testing.assert_frame_equal(
        lsh.reset_index(drop=True), exact.reset_index(drop=True))


def test_dedup_clusters_consistency(ray_session):
    """Cluster reps must be consistent with the pair relation: both ends of
    every near-dup pair share a rep; reps are cluster minima; docs outside
    any pair are singletons."""
    from sketch_ray.pipelines.dedup import dedup_clusters, jaccard_near_dups

    pairs = jaccard_near_dups(SF, k=3, tau=0.5).to_pandas()
    cl = dedup_clusters(SF, k=3, tau=0.5).to_pandas().set_index("doc_id")["cluster_rep"]
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert cl[a] == cl[b]
    in_pairs = set(pairs["doc_a"]) | set(pairs["doc_b"])
    for doc, rep in cl.items():
        if doc not in in_pairs:
            assert rep == doc
        assert rep <= doc


def test_write_clean_corpus(ray_session, tmp_path):
    """Corpus-cleaning sink: keeps exactly the cluster representatives and
    writes partitioned parquet."""
    import pyarrow.dataset as pads

    from sketch_ray.pipelines.dedup import dedup_clusters, write_clean_corpus

    out = str(tmp_path / "clean")
    res = write_clean_corpus(SF, out, k=3, tau=0.5)
    cl = dedup_clusters(SF, k=3, tau=0.5).to_pandas()
    want = set(cl[cl["doc_id"] == cl["cluster_rep"]]["doc_id"])
    got = set(pads.dataset(out).to_table(columns=["doc_id"])["doc_id"].to_pylist())
    assert got == want
    assert res["n_kept"] == len(want)


def test_pair_counts_driver_and_distributed_paths_agree(ray_session):
    """_pair_counts' two physical plans (driver expansion vs group-aligned
    distributed blocks + groupby) must produce identical (doc_a, doc_b,
    n_inter) tables."""
    import numpy as np

    from sketch_ray.pipelines.dedup import _pair_counts

    rng = np.random.default_rng(5)
    rows = pd.DataFrame({
        "doc_id": rng.integers(0, 40, 4000).astype("int64"),
        "shingle": rng.integers(0, 300, 4000).astype("int64"),
    }).drop_duplicates()
    a = _pair_counts(rows, "shingle")  # small budget -> driver path
    b = _pair_counts(rows, "shingle", driver_budget=0)  # forced distributed
    a = a.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = b.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_dedup_distributed_collapse_agrees(ray_session, monkeypatch):
    """Force the DISTRIBUTED branches (_doc_classes min-per-hash groupby +
    broadcast rep-map, _shared_group_rows groupby, distributed shingle-size
    count) by dropping the adaptive threshold to 0: near-dup output must be
    identical to the driver path (r2 verdict item 1)."""
    from sketch_ray.pipelines import dedup

    base_j = dedup.jaccard_near_dups(SF, k=3, tau=0.5).to_pandas()
    base_s = dedup.simhash_near_dups(SF).to_pandas()
    monkeypatch.setattr(dedup, "_SMALL_ROWS", 0)
    dist_j = dedup.jaccard_near_dups(SF, k=3, tau=0.5).to_pandas()
    dist_s = dedup.simhash_near_dups(SF).to_pandas()
    pd.testing.assert_frame_equal(dist_j, base_j.astype(dist_j.dtypes.to_dict()))
    pd.testing.assert_frame_equal(dist_s, base_s.astype(dist_s.dtypes.to_dict()))


def test_dedup_clusters_matches_union_find(ray_session):
    """Plan equality: the distributed label-attach path must equal an
    independent driver union-find over (pairs, all doc ids)."""
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.dedup import dedup_clusters, jaccard_near_dups

    got = dedup_clusters(SF, k=3, tau=0.5).to_pandas()
    pairs = jaccard_near_dups(SF, k=3, tau=0.5).to_pandas()
    ids = sorted(pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
                 ["doc_id"].to_pylist())
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = pd.DataFrame({"doc_id": ids,
                         "cluster_rep": [find(i) for i in ids]})
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_dedup_clusters_out_dir(ray_session, tmp_path):
    """out_dir= streams (doc_id, cluster_rep) to partitioned parquet with
    the same content as the driver-table return shape."""
    import pyarrow.dataset as pads

    from sketch_ray.pipelines.dedup import dedup_clusters

    out = str(tmp_path / "clusters")
    res = dedup_clusters(SF, k=3, tau=0.5, out_dir=out)
    table = dedup_clusters(SF, k=3, tau=0.5).to_pandas()
    written = (pads.dataset(out).to_table().to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(written, table.astype(written.dtypes.to_dict()))
    assert res["n_docs"] == len(table)


def test_ann_scale_paths_never_read_full_matrix(ray_session, monkeypatch):
    """lsh/ivf are the SCALE paths: they must source query vectors from the
    predicate-pushdown read and train on the distributed sample — never the
    full driver-side matrix (r2 verdict item 3)."""
    from sketch_ray.pipelines import similarity

    def boom(sf_dir):
        raise AssertionError("_full_matrix called from a scale path")

    monkeypatch.setattr(similarity, "_full_matrix", boom)
    lsh = similarity.lsh_ann_topk(SF, k=3, n_queries=8).to_pandas()
    ivf = similarity.ivf_ann_topk(SF, k=3, n_queries=8, n_cells=8, nprobe=4).to_pandas()
    assert len(lsh) and len(ivf)


def test_lsh_multiprobe_recall_monotone(ray_session):
    """Multi-probe LSH must retrieve at least the single-probe recall@k
    (extra probed buckets only ADD candidates), with exact scores."""
    from sketch_ray.pipelines.similarity import ann_topk, lsh_ann_topk

    exact = ann_topk(SF, k=5, n_queries=32).to_pandas()
    one = lsh_ann_topk(SF, k=5, n_queries=32, n_probes=1).to_pandas()
    multi = lsh_ann_topk(SF, k=5, n_queries=32, n_probes=4).to_pandas()

    def recall(got):
        hits = tot = 0
        for q in exact["query_id"].unique():
            e = set(exact[exact["query_id"] == q]["vec_id"])
            g = set(got[got["query_id"] == q]["vec_id"])
            hits += len(e & g); tot += len(e)
        return hits / tot

    r1, r4 = recall(one), recall(multi)
    assert r4 >= r1, f"multi-probe recall {r4} < single-probe {r1}"
    assert len(multi) >= len(one)
    # scores exact for whatever is retrieved (same rounding as brute force)
    merged = multi.merge(exact, on=["query_id", "vec_id"], suffixes=("_m", "_bf"))
    assert (merged["cosine_m"] == merged["cosine_bf"]).all()


def test_embedding_near_dups_lsh_vs_exact(ray_session):
    """Bucketed (multi-table LSH) embedding near-dup: precision must be
    exact (every emitted pair is a true >= tau pair with the exact score),
    recall must be monotone in n_tables, and exact-duplicate vectors
    (cosine 1.0) must ALWAYS be found (identical signatures)."""
    from sketch_ray.pipelines.similarity import (embedding_near_dups,
                                                 embedding_near_dups_lsh)

    exact = embedding_near_dups(SF, tau=0.4).to_pandas()
    ek = {(a, b): c for a, b, c in exact.itertuples(index=False)}

    few = embedding_near_dups_lsh(SF, tau=0.4, n_bits=4, n_tables=4).to_pandas()
    many = embedding_near_dups_lsh(SF, tau=0.4, n_bits=4, n_tables=16).to_pandas()
    for got in (few, many):
        for a, b, c in got.itertuples(index=False):
            assert (a, b) in ek and ek[(a, b)] == c  # exact precision+score
    assert len(many) >= len(few)
    assert len(many) >= 0.8 * len(exact)  # measured 0.93 at these params

    # exact duplicates (cosine == 1.0 pairs) are always retrieved
    dup_pairs = set(map(tuple, exact[exact["cosine"] == 1.0][["vec_a", "vec_b"]].to_numpy()))
    got_pairs = set(map(tuple, many[["vec_a", "vec_b"]].to_numpy()))
    assert dup_pairs <= got_pairs


def test_embedding_dedup_clusters_consistency(ray_session):
    """Cluster invariants: paired vectors share a rep, the rep is the
    component minimum and is itself in the component, singletons are their
    own rep."""
    from sketch_ray.pipelines.similarity import (embedding_dedup_clusters,
                                                 embedding_near_dups)

    clusters = embedding_dedup_clusters(SF, tau=0.4).to_pandas()
    rep = dict(zip(clusters["vec_id"], clusters["cluster_rep"]))
    pairs = embedding_near_dups(SF, tau=0.4).to_pandas()
    touched = set(pairs["vec_a"]) | set(pairs["vec_b"])
    for a, b in pairs[["vec_a", "vec_b"]].itertuples(index=False):
        assert rep[a] == rep[b]
    for v, r in rep.items():
        assert r <= v and rep[r] == r
        if v not in touched:
            assert r == v


def test_decontaminate_corpus_invariants(ray_session):
    """Decontamination flags: benchmark docs excluded, flag == overlap>0,
    and a doc that IS a benchmark duplicate must be contaminated."""
    import duckdb

    from sketch_ray.pipelines.dedup import decontaminate_corpus

    got = decontaminate_corpus(SF, n_bench=20, k=3).to_pandas()
    assert (got["doc_id"] >= 20).all()
    assert ((got["n_overlap"] > 0).astype("int64") == got["contaminated"]).all()
    # exact duplicates of benchmark docs (if any) must be flagged
    dups = duckdb.connect().execute(f"""
        SELECT b.doc_id FROM read_parquet('{SF}/documents.parquet') a
        JOIN read_parquet('{SF}/documents.parquet') b ON a.text = b.text
        WHERE a.doc_id < 20 AND b.doc_id >= 20""").df()
    flagged = set(got[got["contaminated"] == 1]["doc_id"])
    assert set(dups["doc_id"]) <= flagged


def test_stratified_sample_deterministic_and_bounded(ray_session):
    """The hash-gated sample must be identical across runs, a subset of the
    corpus, respect rate 0 and rate 1 exactly, and hit each stratum's rate
    within 5 sigma."""
    import numpy as np
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.text_analysis import stratified_sample

    a = stratified_sample(SF).to_pandas()
    b = stratified_sample(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    n_by = docs.groupby("lang").size()
    k_by = a.groupby("lang").size()
    from sketch_ray.pipelines.text_analysis import DEFAULT_MIX_RATES
    for lang, r in DEFAULT_MIX_RATES.items():
        n, k = int(n_by.get(lang, 0)), int(k_by.get(lang, 0))
        if r == 1.0:
            assert k == n
        elif r == 0.0:
            assert k == 0
        else:
            sigma = max(1.0, np.sqrt(n * r * (1 - r)))
            assert abs(k - n * r) <= 5 * sigma
    # rate-0 default drops unknown strata; all-keep keeps everything
    none = stratified_sample(SF, rates={}, default_rate=0.0).to_pandas()
    assert len(none) == 0
    full = stratified_sample(SF, rates={}, default_rate=1.0).to_pandas()
    assert len(full) == len(docs)


def test_upsample_mix_deterministic_and_exact(ray_session):
    """Rates > 1 replicate deterministically: integer rates give exactly
    floor(r) copies per doc, fractional rates land within 5 sigma of r·n,
    copy indices are dense per doc, and reruns are byte-identical."""
    import numpy as np
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.text_analysis import upsample_mix

    a = upsample_mix(SF).to_pandas()
    b = upsample_mix(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"]).to_pandas()
    n_by = docs.groupby("source").size()

    # integer rates are exact per-doc, not just in expectation
    tripled = upsample_mix(SF, rates={"src5": 3.0}, default_rate=0.0).to_pandas()
    assert len(tripled) == 3 * int(n_by["src5"])
    assert (tripled.groupby("doc_id").size() == 3).all()
    assert (tripled.groupby("doc_id")["copy"].max() == 2).all()
    assert (tripled.groupby("doc_id")["copy"].min() == 0).all()

    # fractional rate: expectation r within 5 sigma of the Bernoulli part
    r = 2.5
    frac = upsample_mix(SF, rates={"src6": r}, default_rate=0.0).to_pandas()
    n = int(n_by["src6"])
    sigma = max(1.0, np.sqrt(n * 0.5 * 0.5))
    assert abs(len(frac) - n * r) <= 5 * sigma
    assert frac.groupby("doc_id").size().isin([2, 3]).all()

    # rate 0 drops; default 1.0 is the identity corpus
    assert len(upsample_mix(SF, rates={}, default_rate=0.0).to_pandas()) == 0
    ident = upsample_mix(SF, rates={}, default_rate=1.0).to_pandas()
    assert len(ident) == len(docs) and (ident["copy"] == 0).all()

    # a different seed resamples the fractional copies
    other = upsample_mix(SF, rates={"src6": r}, default_rate=0.0, seed=99).to_pandas()
    assert not frac.equals(other)


def test_uniform_sample_n_exact_size_and_nested(ray_session):
    """Bottom-n-by-hash sampling: exact size, deterministic, docs are a
    subset of the corpus, samples are NESTED (the n=16 sample is a prefix
    of the n=64 sample — the bottom-k property), and n >= corpus returns
    every doc."""
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.text_analysis import uniform_sample_n

    docs = set(pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
               .column("doc_id").to_pylist())
    big = uniform_sample_n(SF, n=64).to_pandas()
    small = uniform_sample_n(SF, n=16).to_pandas()
    assert len(big) == 64 and len(small) == 16
    assert list(big["rank"]) == list(range(1, 65))
    assert set(big["doc_id"]) <= docs
    pd.testing.assert_frame_equal(small, big.head(16))
    again = uniform_sample_n(SF, n=64).to_pandas()
    pd.testing.assert_frame_equal(big, again)
    # different seed draws a different set; n >= corpus returns everything
    other = uniform_sample_n(SF, n=64, seed=99).to_pandas()
    assert set(other["doc_id"]) != set(big["doc_id"])
    full = uniform_sample_n(SF, n=10 ** 9).to_pandas()
    assert set(full["doc_id"]) == docs


def test_group_sample_n_per_group_exact(ray_session):
    """Per-group bottom-n: every group contributes min(n, group size) docs,
    the per-group sets are nested prefixes across n, doc/group pairing is
    faithful, and reruns are identical."""
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.text_analysis import group_sample_n

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    n_by = docs.groupby("lang").size()
    big = group_sample_n(SF, n=8, by="lang").to_pandas()
    for lang, cnt in big.groupby("lang").size().items():
        assert cnt == min(8, int(n_by[lang]))
    # pairing faithful: each sampled doc really has that group value
    merged = big.merge(docs, on="doc_id", suffixes=("", "_true"))
    assert (merged["lang"] == merged["lang_true"]).all()
    small = group_sample_n(SF, n=3, by="lang").to_pandas()
    pd.testing.assert_frame_equal(
        small, big[big["rank"] <= 3].reset_index(drop=True))
    again = group_sample_n(SF, n=8, by="lang").to_pandas()
    pd.testing.assert_frame_equal(big, again)
    by_src = group_sample_n(SF, n=2, by="source").to_pandas()
    assert (by_src.groupby("source").size() <= 2).all()


def test_incremental_dedup_drops_cross_snapshot_dups(ray_session, tmp_path):
    """Synthetic corpus with known cross-snapshot and in-snapshot duplicate
    structure: docs seen in the prior snapshot are dropped entirely; new
    texts keep min doc_id with the in-snapshot copy count. Broadcast and
    shuffle plans agree; the persisted index path reproduces both."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.dedup import incremental_dedup_docs

    sf = str(tmp_path)
    # old snapshot: ids 0-3 (texts A B C A); new snapshot: ids 4-9
    texts = ["A x", "B y", "C z", "A x",          # old
             "A x",                               # dup of old -> dropped
             "D w", "D w", "D w",                 # new text, 3 copies -> (5, 3)
             "B y",                               # dup of old -> dropped
             "E v"]                               # unique new -> (9, 1)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 10),
        "source": pa.array(["s"] * 10),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{sf}/documents.parquet")

    want = pd.DataFrame({"doc_id": [5, 9], "n_copies": [3, 1]})
    a = incremental_dedup_docs(sf, n_old=4, force="broadcast").to_pandas()
    b = incremental_dedup_docs(sf, n_old=4, force="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, want)
    pd.testing.assert_frame_equal(b, want)

    idx_dir = str(tmp_path / "index")
    c = incremental_dedup_docs(sf, n_old=4, index_dir=idx_dir).to_pandas()
    pd.testing.assert_frame_equal(c, want)
    # second run reuses the persisted snapshot partition
    import glob as g
    files_before = sorted(g.glob(f"{idx_dir}/snapshot=*/*.parquet"))
    d = incremental_dedup_docs(sf, n_old=4, index_dir=idx_dir).to_pandas()
    pd.testing.assert_frame_equal(d, want)
    assert sorted(g.glob(f"{idx_dir}/snapshot=*/*.parquet")) == files_before
    # a call with DIFFERENT n_old must NOT reuse the stale index (the
    # manifest pins build params): old = {A B}, so C becomes a new unique
    e = incremental_dedup_docs(sf, n_old=2, index_dir=idx_dir).to_pandas()
    pd.testing.assert_frame_equal(
        e, pd.DataFrame({"doc_id": [2, 5, 9], "n_copies": [1, 3, 1]}))
    import json
    with open(f"{idx_dir}/snapshot=s0/_MANIFEST.json") as f:
        assert json.load(f)["n_old"] == 2


def test_doc_classes_memoized_per_corpus(ray_session, tmp_path):
    """_doc_classes_for caches the exact-duplicate collapse per corpus
    fingerprint (path, mtime, size): same corpus -> the same cached frame;
    a rewritten corpus invalidates and recomputes."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from sketch_ray.pipelines.dedup import _doc_classes_for

    sf = str(tmp_path)
    path = f"{sf}/documents.parquet"

    def write(texts):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }), path)

    write(["a", "b", "a", "c"])
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    first = _doc_classes_for(sf, ds)
    assert sorted(zip(first["doc_id"], first["rep"])) == [(0, 0), (2, 0)]
    again = _doc_classes_for(sf, rd.read_parquet(path, columns=["doc_id", "text"]))
    assert again is first  # cache hit: no recompute
    import os
    import time
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    write(["a", "b", "b", "b"])
    fresh = _doc_classes_for(sf, rd.read_parquet(path, columns=["doc_id", "text"]))
    assert fresh is not first
    assert sorted(zip(fresh["doc_id"], fresh["rep"])) == [(1, 1), (2, 1), (3, 1)]


def test_round6_half_away_and_n_reducers(ray_session):
    """round6 breaks exact .5 ties at 6dp AWAY from zero (DuckDB ROUND),
    where np.round goes to even; n_reducers floors at 32 on small clusters
    and scales with cluster CPUs."""
    import numpy as np

    from sketch_ray.pipelines._util import n_reducers, round6

    x = np.array([105 / 128, -105 / 128, 0.1234564999, 0.25])
    got = round6(x)
    assert got[0] == 0.820313 and got[1] == -0.820313  # ties away from zero
    assert np.round(x[0], 6) == 0.820312  # the trap this replaces
    assert got[2] == 0.123456 and got[3] == 0.25  # non-ties match np.round
    # the 4-CPU test session sits below the floor; a 256-node cluster
    # (the rule: max(32, cluster CPUs)) would scale linearly
    assert n_reducers() == 32
    assert n_reducers(floor=2) >= 2


def test_label_centroids_match_numpy(ray_session):
    """The two-level shuffle-free fold reproduces the direct numpy per-label
    mean exactly (raw vectors, 1-based dims, labels sorted)."""
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.similarity import label_centroids

    out = label_centroids(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["label", "embedding"])
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat = t["embedding"].combine_chunks().flatten() \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(lab), len(flat) // len(lab))
    rows = []
    for lv in np.unique(lab):
        m = np.round(mat[lab == lv].mean(axis=0), 6)
        rows += [(int(lv), d + 1, m[d]) for d in range(mat.shape[1])]
    want = pd.DataFrame(rows, columns=["label", "dim", "mean_x"])
    pd.testing.assert_frame_equal(out, want.astype(out.dtypes.to_dict()))


def test_semantic_decontaminate_matches_numpy(ray_session):
    """Broadcast-probe max cosine equals the brute-force numpy answer; the
    holdout itself is excluded from the output."""
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.similarity import semantic_decontaminate

    out = semantic_decontaminate(SF, tau=0.4, n_holdout=20).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat = t["embedding"].combine_chunks().flatten() \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(ids), len(flat) // len(ids))
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    hold, corp = mat[ids < 20], mat[ids >= 20]
    mx = (corp @ hold.T).max(axis=1)
    order = np.argsort(ids[ids >= 20])
    assert out["vec_id"].tolist() == sorted(ids[ids >= 20].tolist())
    np.testing.assert_allclose(out["max_cos"].to_numpy(),
                               np.round(mx[order], 6), atol=1e-12)
    assert (out["contaminated"].to_numpy()
            == (mx[order] >= 0.4).astype(np.int64)).all()
    assert (ids < 20).sum() and len(out) == (ids >= 20).sum()


def test_knn_label_vote_hand_case(ray_session, tmp_path):
    """Majority vote checked by hand on planted geometry: clear majority
    wins; an exact 2-2 tie goes to the smaller label id."""
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.similarity import knn_label_vote

    # query 0 at e1; ids 1-2 (label 5) closest, ids 3-4 (label 2) next,
    # id 5 (label 9) nearly orthogonal
    vecs = [
        [1.0, 0.0, 0.0, 0.0],      # 0: query
        [1.0, 0.1, 0.0, 0.0],      # 1: label 5
        [1.0, -0.1, 0.0, 0.0],     # 2: label 5
        [1.0, 0.4, 0.0, 0.0],      # 3: label 2
        [1.0, -0.4, 0.0, 0.0],     # 4: label 2
        [0.1, 1.0, 0.0, 0.0],      # 5: label 9
    ]
    labels = [0, 5, 5, 2, 2, 9]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), f"{tmp_path}/embeddings.parquet")

    # k=5: votes 5->2, 2->2, 9->1 — tie on count, smaller label (2) wins
    out = knn_label_vote(str(tmp_path), k=5, n_queries=1).to_pandas()
    assert out.to_dict("records") == [
        {"query_id": 0, "pred_label": 2, "n_votes": 2}]
    # k=4 drops the orthogonal vector: still 2-2, same tie-break
    out4 = knn_label_vote(str(tmp_path), k=4, n_queries=1).to_pandas()
    assert out4["pred_label"].tolist() == [2]
    # k=2: only the two label-5 neighbors remain -> clear majority
    out2 = knn_label_vote(str(tmp_path), k=2, n_queries=1).to_pandas()
    assert out2.to_dict("records") == [
        {"query_id": 0, "pred_label": 5, "n_votes": 2}]


def test_weighted_sample_n_bias_and_determinism(ray_session, tmp_path):
    """Efraimidis-Spirakis weighted sampling: deterministic across runs;
    over many seeds a doc with 9x the weight is drawn ~9x as often (1-of-2
    draws follow w_a/(w_a+w_b) exactly in E-S)."""
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.text_analysis import weighted_sample_n

    a = weighted_sample_n(SF, n=16).to_pandas()
    b = weighted_sample_n(SF, n=16).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 16 and list(a["rank"]) == list(range(1, 17))

    # two docs, weights 9 : 1 -> doc 0 wins rank 1 with p = 0.9
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["x", "y"]),
        "lang": pa.array(["en"] * 2),
        "source": pa.array(["s"] * 2),
        "n_chars": pa.array([900, 100], pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    wins = sum(
        weighted_sample_n(str(tmp_path), n=1, seed=s).to_pandas()["doc_id"][0] == 0
        for s in range(60))
    # Binomial(60, 0.9): 5 sigma ~ 12
    assert abs(wins - 54) <= 12, wins


def test_decontaminate_bloom_matches_exact(ray_session):
    """Bloom-prefiltered decontamination is an invisible physical
    optimization: identical output to the broadcast-exact-set plan, even
    with a deliberately tiny (false-positive-heavy) filter — verification
    kills every fp, and Bloom's zero-false-negative guarantee means no
    contaminated doc can be missed."""
    from sketch_ray.pipelines.dedup import (decontaminate_corpus,
                                            decontaminate_corpus_bloom)

    sf = "/root/testdata/sf0.001"
    a = decontaminate_corpus(sf, n_bench=20, k=3).to_pandas()
    b = decontaminate_corpus_bloom(sf, n_bench=20, k=3).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    tiny = decontaminate_corpus_bloom(sf, n_bench=20, k=3,
                                      n_bits=1 << 9, n_hashes=2).to_pandas()
    pd.testing.assert_frame_equal(a, tiny)
    assert a["contaminated"].sum() > 0  # the fixture actually exercises hits


def test_decontaminate_out_dir_roundtrip(ray_session, tmp_path):
    """out_dir= streams the per-doc labels to bounded parquet; the files
    reproduce the gate table exactly."""
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.dedup import decontaminate_corpus

    out = str(tmp_path / "decon")
    a = decontaminate_corpus(SF, n_bench=20, k=3, out_dir=out,
                             rows_per_file=100).to_pandas()
    back = pq.read_table(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, back.astype(a.dtypes.to_dict()))
    import glob
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 2  # rows_per_file=100 over 480 docs -> bounded files


def test_embedding_kmeans_lloyd_identity(ray_session):
    """Distributed spherical k-means equals a one-machine numpy Lloyd run
    from the same init; objective is monotone; counts cover the corpus;
    reruns are deterministic."""
    import numpy as np

    from sketch_ray.pipelines.similarity import (_full_matrix,
                                                 _kmeans_centroids,
                                                 _sample_matrix,
                                                 embedding_kmeans)

    sf = "/root/testdata/sf0.001"
    k, iters, seed = 4, 3, 42
    t = embedding_kmeans(sf, n_clusters=k, iters=iters, seed=seed).to_pandas()
    t2 = embedding_kmeans(sf, n_clusters=k, iters=iters, seed=seed).to_pandas()
    assert t.equals(t2)

    ids, X = _full_matrix(sf)
    assert int(t["n_vecs"].sum()) == len(ids)

    C = _kmeans_centroids(_sample_matrix(sf, k * 64, seed), k, seed)
    prev_obj = -np.inf
    for _ in range(iters):
        dots = X @ C.T
        assign = np.argmax(dots, axis=1)
        obj = dots[np.arange(len(X)), assign].sum()
        assert obj >= prev_obj - 1e-9
        prev_obj = obj
        counts = np.bincount(assign, minlength=k)
        sims = np.bincount(assign, weights=dots[np.arange(len(X)), assign],
                           minlength=k)
        vs = np.zeros((k, X.shape[1]))
        np.add.at(vs, assign, X)
        norms = np.linalg.norm(vs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        C = np.where((counts > 0)[:, None], vs / norms, C)
    ref_counts = counts.astype(np.int64)
    ref_mean = np.where(counts > 0, sims / np.maximum(counts, 1), 0.0)
    assert (t["n_vecs"].to_numpy() == ref_counts).all()
    assert np.allclose(t["mean_cos"].to_numpy(), np.round(ref_mean, 6),
                       atol=1e-6)


def test_near_dup_edit_distances(ray_session):
    """Levenshtein DP matches DuckDB's levenshtein on every near-dup
    pair; kernel hand cases pin the prefix-min deletion transform."""
    import duckdb
    import pandas as pd

    from sketch_ray.pipelines.dedup import (_levenshtein,
                                            near_dup_edit_distances)

    for a, b, want in [(b"kitten", b"sitting", 3), (b"abc", b"", 3),
                       (b"", b"", 0), (b"flaw", b"lawn", 2),
                       (b"intention", b"execution", 5),
                       (b"aaaa", b"a", 3), (b"a", b"aaaa", 3)]:
        assert _levenshtein(a, b) == want

    sf = "/root/testdata/sf0.001"
    t = near_dup_edit_distances(sf, k=3, tau=0.5).to_pandas()
    t2 = near_dup_edit_distances(sf, k=3, tau=0.5,
                                 force="distributed").to_pandas()
    pd.testing.assert_frame_equal(t, t2)  # adaptive branches agree
    ref = duckdb.sql(f"""
        WITH sh AS (
            SELECT doc_id, unnest(range(len(string_split(text, ' ')) - 2)) AS i,
                   string_split(text, ' ') AS toks
            FROM read_parquet('{sf}/documents.parquet')
        ), shing AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(toks, i + 1, i + 3), ' ') AS s
            FROM sh
        ), sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
                  FROM shing a JOIN shing b
                    ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY da, db)
        SELECT da AS doc_a, db AS doc_b,
               round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard,
               levenshtein(ta.text, tb.text) AS edit_dist
        FROM inter
        JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
        JOIN read_parquet('{sf}/documents.parquet') ta ON ta.doc_id = da
        JOIN read_parquet('{sf}/documents.parquet') tb ON tb.doc_id = db
        WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.5
        ORDER BY doc_a, doc_b""").df()
    pd.testing.assert_frame_equal(t, ref, check_dtype=False)
    assert len(t) > 0 and (t["edit_dist"] >= 0).all()


def test_pq_ann_recall_vs_bruteforce(ray_session):
    """PQ-ADC with exact reranking: deterministic, high recall@5 on
    clustered data, and every returned cosine is the exact brute-force
    score (the rerank stage rescores candidates exactly)."""
    from sketch_ray.pipelines.similarity import ann_topk, pq_ann_topk

    exact = ann_topk(SF, k=5, n_queries=64).to_pandas()
    got = pq_ann_topk(SF, k=5, n_queries=64).to_pandas()
    got2 = pq_ann_topk(SF, k=5, n_queries=64).to_pandas()
    pd.testing.assert_frame_equal(got, got2)
    hits = tot = 0
    for q in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == q]["vec_id"])
        g = set(got[got["query_id"] == q]["vec_id"])
        hits += len(e & g); tot += len(e)
    assert hits / tot >= 0.7, f"PQ recall too low: {hits}/{tot}"
    merged = got.merge(exact, on=["query_id", "vec_id"],
                       suffixes=("_pq", "_bf"))
    assert (merged["cosine_pq"] == merged["cosine_bf"]).all()


def test_mutual_knn_pairs_branches_and_reciprocity(ray_session):
    """Both adaptive mutual-fold branches agree; every returned pair is
    reciprocal under an independent numpy full-sort kNN with the
    (cosine DESC, vec_id) tie-break; n_mutual equals the recomputed
    reciprocated-pair count; ranking is (round6 cosine DESC, a, b)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.similarity import mutual_knn_pairs

    a = mutual_knn_pairs(SF, k=5, force="driver").to_pandas()
    b = mutual_knn_pairs(SF, k=5, force="dist").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    c6 = a["cosine"].to_numpy()
    assert (c6[:-1] >= c6[1:]).all()
    assert (a["vec_a"] < a["vec_b"]).all()

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas()
    ids = t["vec_id"].to_numpy(np.int64)
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    o = np.argsort(ids, kind="stable")
    ids, mat = ids[o], mat[o]
    sims = mat @ mat.T
    np.fill_diagonal(sims, -2.0)
    top = np.argsort(-sims, axis=1, kind="stable")[:, :5]
    knn = {(int(ids[i]), int(ids[j])) for i in range(len(ids))
           for j in top[i]}
    mutual = {(x, y) for (x, y) in knn if (y, x) in knn and x < y}
    assert int(a["n_mutual"].iloc[0]) == len(mutual)
    for pa_, pb_ in zip(a["vec_a"], a["vec_b"]):
        assert (int(pa_), int(pb_)) in mutual


def test_mutual_knn_tie_fallback_exactness(ray_session, tmp_path):
    """Force the argpartition boundary-tie fallback: 80 byte-identical
    vectors tie at cosine 1.0, which floods past the k+64 slice — the
    per-row full-sort fallback must reproduce the exact (cosine DESC,
    vec_id) ranking, so the mutual set equals a brute-force recompute."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.similarity import mutual_knn_pairs

    rng = np.random.default_rng(7)
    dup = np.tile(rng.normal(size=(1, 16)), (80, 1))
    distinct = rng.normal(size=(40, 16))
    mat = np.vstack([dup, distinct])
    t = pa.table({
        "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
        "embedding": pa.array([row.astype(np.float32).tolist()
                               for row in mat],
                              pa.list_(pa.float32())),
    })
    d = str(tmp_path / "sfdup"); import os; os.makedirs(d)
    pq.write_table(t, f"{d}/embeddings.parquet")

    a = mutual_knn_pairs(d, k=5, force="driver").to_pandas()
    b = mutual_knn_pairs(d, k=5, force="dist").to_pandas()
    pd.testing.assert_frame_equal(a, b)

    m64 = mat.astype(np.float64)
    m64 /= np.linalg.norm(m64, axis=1, keepdims=True)
    sims = m64 @ m64.T
    np.fill_diagonal(sims, -2.0)
    top = np.argsort(-sims, axis=1, kind="stable")[:, :5]
    knn = {(i, int(j)) for i in range(len(m64)) for j in top[i]}
    mutual = {(x, y) for (x, y) in knn if (y, x) in knn and x < y}
    assert int(a["n_mutual"].iloc[0]) == len(mutual)
    # the dup block's mutual pairs are the lowest-id reciprocal cliques:
    # every returned pair must be in the recomputed set
    for x, y in zip(a["vec_a"], a["vec_b"]):
        assert (int(x), int(y)) in mutual


def test_incremental_near_dups_index_and_branches(ray_session, tmp_path):
    """Both candidate branches agree; probing the PERSISTED band index
    gives the identical answer to the inline computation; a manifest
    mismatch (different n_old) rebuilds rather than silently reusing;
    every returned pair crosses the snapshot boundary at jaccard>=tau."""
    import json
    import os

    from sketch_ray.pipelines.dedup import (incremental_near_dups,
                                            write_minhash_index)

    a = incremental_near_dups(SF, n_old=250, force="broadcast").to_pandas()
    b = incremental_near_dups(SF, n_old=250, force="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert (a["doc_a"] < 250).all() and (a["doc_b"] >= 250).all()
    assert (a["jaccard"] >= 0.8).all()
    assert len(a) > 0  # the corpus plants cross-boundary near-dups

    # boilerplate cap fires identically on BOTH branches (a tiny
    # max_bucket forces hot-bucket drops; without the broadcast-side cap
    # the branches diverge on boilerplate-heavy corpora)
    ac = incremental_near_dups(SF, n_old=250, max_bucket=2,
                               force="broadcast").to_pandas()
    bc = incremental_near_dups(SF, n_old=250, max_bucket=2,
                               force="shuffle").to_pandas()
    pd.testing.assert_frame_equal(ac, bc)
    assert len(ac) < len(a)  # the cap actually dropped hot buckets

    idx = str(tmp_path / "mh_index")
    n_rows = write_minhash_index(SF, idx, n_old=250)
    assert n_rows == 250 * 32  # bands rows per indexed doc
    c = incremental_near_dups(SF, n_old=250, index_dir=idx).to_pandas()
    pd.testing.assert_frame_equal(c, a)

    # stale manifest (wrong n_old) must trigger a rebuild, not reuse
    mpath = os.path.join(idx, "snapshot=s0", "_MANIFEST.json")
    with open(mpath) as f:
        m = json.load(f)
    m["n_old"] = 99
    with open(mpath, "w") as f:
        json.dump(m, f)
    d = incremental_near_dups(SF, n_old=250, index_dir=idx).to_pandas()
    pd.testing.assert_frame_equal(d, a)
    with open(mpath) as f:
        assert json.load(f)["n_old"] == 250  # rebuilt


@pytest.mark.parametrize("seed,n_dup,k", [(1, 10, 3), (2, 70, 5), (3, 4, 7)])
def test_mutual_knn_fastpath_matches_fullsort(ray_session, tmp_path,
                                              seed, n_dup, k):
    """The argpartition fast path reproduces the full-argsort ranking on
    structured corpora spanning the boundary cases: dup class smaller
    than k, flooding past the k+64 slice, and k above the class size."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.similarity import mutual_knn_pairs

    rng = np.random.default_rng(seed)
    dup = np.tile(rng.normal(size=(1, 8)), (n_dup, 1))
    rest = rng.normal(size=(90, 8))
    mat = np.vstack([dup, rest])
    perm = rng.permutation(len(mat))  # ids not aligned with structure
    t = pa.table({
        "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
        "embedding": pa.array([row.astype(np.float32).tolist()
                               for row in mat[perm]],
                              pa.list_(pa.float32())),
    })
    d = str(tmp_path / "sfm"); os.makedirs(d)
    pq.write_table(t, f"{d}/embeddings.parquet")

    got = mutual_knn_pairs(d, k=k, topn=10 ** 9).to_pandas()

    m64 = mat[perm].astype(np.float64)
    m64 /= np.linalg.norm(m64, axis=1, keepdims=True)
    sims = m64 @ m64.T
    np.fill_diagonal(sims, -2.0)
    top = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    knn = {(i, int(j)) for i in range(len(m64)) for j in top[i]}
    mutual = sorted({(x, y) for (x, y) in knn
                     if (y, x) in knn and x < y})
    assert sorted(zip(got["vec_a"].astype(int),
                      got["vec_b"].astype(int))) == mutual
