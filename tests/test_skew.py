"""Skew stress: a pathological hot key must not break correctness, and the
merge fold must stay exact over multiple reduce rounds."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def skewed_docs(tmp_path_factory):
    """20k docs where ONE token carries ~50% of total mass (worse than any
    real Zipf head) plus a uniform tail."""
    rng = np.random.default_rng(7)
    texts = []
    for i in range(20000):
        toks = ["hotkey"] * 10 + [f"t{rng.integers(0, 2000)}" for _ in range(10)]
        texts.append(" ".join(toks))
    d = tmp_path_factory.mktemp("skew")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(20000), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_hot_key_exact_counts_and_heavy_hitters(ray_session, skewed_docs):
    from sketch_ray.pipelines.exact import token_counts_ds
    from sketch_ray.pipelines.heavy_hitters import heavy_hitters
    from sketch_ray.stages.sketch_build import SketchSpec

    counts = token_counts_ds(skewed_docs).to_pandas().set_index("token")["cnt"]
    assert counts["hotkey"] == 200000  # exact despite 50% skew

    spec = SketchSpec("hh", "cmcu", "text", mode="tokens",
                      params={"width": 1 << 14, "seed": 42})
    hh = heavy_hitters(
        __import__("ray.data", fromlist=["rd"]).read_parquet(
            f"{skewed_docs}/documents.parquet", columns=["text"]),
        spec, threshold=100000,
    ).to_pandas()
    assert hh["token"].tolist() == ["hotkey"]
    assert hh["cnt"].tolist() == [200000]


def test_merge_multi_round_exact(ray_session, skewed_docs):
    """rounds=2 fold (the 10^12-scale path) gives the identical global
    sketch as rounds=1."""
    import ray.data as rd

    from sketch_ray.stages.sketch_build import SketchSpec, build_partials, merge_partials

    spec = SketchSpec("tok", "cmcu", "text", mode="tokens",
                      params={"width": 1 << 12, "seed": 42})
    ds = rd.read_parquet(f"{skewed_docs}/documents.parquet", columns=["text"])
    p1 = build_partials(ds, [spec], batch_size=1024).materialize()
    one = merge_partials(p1, fan_in=8, rounds=1)["tok"]
    two = merge_partials(p1, fan_in=8, rounds=2)["tok"]
    assert one.to_bytes() == two.to_bytes()
    assert one.query(["hotkey"])[0] >= 200000


def test_vocab_coverage_invariants(ray_session):
    """cum_frac is nondecreasing, ends at 1.0 when v covers the whole
    vocab, and ranks follow (cnt desc, token asc)."""
    from sketch_ray.pipelines.exact import vocab_coverage

    t = vocab_coverage("/root/testdata/sf0.001", v=10_000).to_pandas()
    assert (t["rank"].to_numpy() == range(1, len(t) + 1)).all()
    assert (t["cum_frac"].diff().dropna() >= 0).all()
    assert t["cum_frac"].iloc[-1] == 1.0
    c = t["cnt"].to_numpy()
    assert (c[:-1] >= c[1:]).all()
    ties = t[t.duplicated("cnt", keep=False)]
    for _, g in ties.groupby("cnt"):
        assert g["token"].is_monotonic_increasing


def test_grouped_quantiles_exact_branches_and_hand_case(ray_session, tmp_path):
    """Adaptive histogram-fold branches agree on the real corpus; a
    hand-built corpus pins the quantile_disc rule (smallest value with
    cum_count >= ceil(q*n))."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.exact import grouped_quantiles_exact

    SF = "/root/testdata/sf0.001"
    a = grouped_quantiles_exact(SF, force="driver").to_pandas()
    b = grouped_quantiles_exact(SF, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # per-lang quantiles are monotone in q
    assert (a.groupby("lang")["value"].apply(lambda s: s.is_monotonic_increasing)).all()

    # hand case: lang x has lengths 1..4 -> q=.25 ceil(1)=1 -> 1; q=.5 -> 2;
    # q=.75 -> 3; q=.9 ceil(3.6)=4 -> 4
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a", "ab", "abc", "abcd"]),
        "lang": pa.array(["x"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([1, 2, 3, 4], pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    out = grouped_quantiles_exact(str(tmp_path)).to_pandas()
    assert out["value"].tolist() == [1, 2, 3, 4]


def test_doc_length_deciles_invariants(ray_session):
    """Histogram rank-bucketing: deciles are 1..10, monotone in n_chars,
    ties share a decile, and each decile holds <= ceil(n/10) + max tie run
    docs; decile 1 starts at the global min length."""
    from sketch_ray.pipelines.exact import doc_length_deciles

    out = doc_length_deciles("/root/testdata/sf0.001").to_pandas()
    s = out.sort_values(["n_chars", "doc_id"])
    assert s["decile"].between(1, 10).all()
    assert s["decile"].is_monotonic_increasing
    assert (out.groupby("n_chars")["decile"].nunique() == 1).all()
    assert s["decile"].iloc[0] == 1 and s["decile"].iloc[-1] == 10


def test_source_profile_hand_case(ray_session, tmp_path):
    """Planted corpus: dup fraction counts BOTH members of a duplicate
    pair, distinct langs per source, exact token/char averages."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.exact import source_profile

    texts = ["a b", "a b", "c d e", "x"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en", "de", "en", "en"]),
        "source": pa.array(["s1", "s1", "s1", "s2"]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    out = source_profile(str(tmp_path)).to_pandas().set_index("source")
    assert out.loc["s1", "n_docs"] == 3
    assert out.loc["s1", "n_tokens"] == 7
    assert out.loc["s1", "n_langs"] == 2
    assert out.loc["s1", "dup_doc_frac"] == round(2 / 3, 6)
    assert out.loc["s1", "avg_chars"] == round((3 + 3 + 5) / 3, 6)
    assert out.loc["s2", "n_docs"] == 1
    assert out.loc["s2", "dup_doc_frac"] == 0.0
    assert out.loc["s2", "n_langs"] == 1

    # adaptive fold branches agree on real data
    import pandas as pd

    a = source_profile("/root/testdata/sf0.001", force="driver").to_pandas()
    b = source_profile("/root/testdata/sf0.001", force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_pmi_collocations_hand_case(ray_session, tmp_path):
    """PMI by hand on a tiny corpus: a bigram that always co-occurs gets
    the max PMI; a frequent-token pair scores lower; min_cnt filters."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.exact import pmi_collocations

    # "new york" appears 3x and neither token elsewhere; "the cat" 3x but
    # "the" is everywhere
    texts = ["new york the cat sat", "new york the cat ran",
             "new york the cat hid", "the dog the bird"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    out = pmi_collocations(str(tmp_path), min_cnt=3, k=10).to_pandas()
    n1 = 19.0   # total tokens
    n2 = 15.0   # total bigrams = n1 - 4 docs
    want_ny = round(math.log((3 / n2) / ((3 / n1) * (3 / n1))), 6)
    want_tc = round(math.log((3 / n2) / ((5 / n1) * (3 / n1))), 6)
    got = out.set_index("bigram")
    assert got.loc["new york", "pmi"] == want_ny
    assert got.loc["the cat", "pmi"] == want_tc
    assert want_ny > want_tc
    assert out.iloc[0]["bigram"] == "new york" and out.iloc[0]["rank"] == 1
    # nothing below min_cnt leaks in
    assert (out["cnt"] >= 3).all()


def test_robust_length_stats_hand_case(ray_session, tmp_path):
    """MAD/IQR by hand: lengths 1,2,3,4,100 (one outlier) -> median 3,
    MAD = disc-median of |v-3| = {2,1,0,1,97} -> 1, IQR = q75-q25 = 4-2;
    MAD is outlier-insensitive where stddev is not. Branches agree."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.exact import robust_length_stats

    lens = [1, 2, 3, 4, 100]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(["x" * n for n in lens]),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["s"] * 5),
        "n_chars": pa.array(lens, pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    out = robust_length_stats(str(tmp_path)).to_pandas()
    assert out.to_dict("records") == [
        {"lang": "en", "median": 3, "mad": 1, "iqr": 2}]

    a = robust_length_stats("/root/testdata/sf0.001", force="driver").to_pandas()
    b = robust_length_stats("/root/testdata/sf0.001", force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_rollup_doc_stats_levels_consistent(ray_session, tmp_path):
    """ROLLUP hand case: subtotals and grand total partition the finest
    level exactly; the '<all>' sentinel marks rolled dimensions."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.exact import rollup_doc_stats

    texts = ["a b", "c", "d e f", "g h"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en", "de", "en", "en"]),
        "source": pa.array(["s1", "s1", "s2", "s2"]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    out = rollup_doc_stats(str(tmp_path)).to_pandas()
    r = {(row["source"], row["lang"]): (row["n_docs"], row["n_tokens"])
         for _, row in out.iterrows()}
    assert r[("s1", "en")] == (1, 2) and r[("s1", "de")] == (1, 1)
    assert r[("s2", "en")] == (2, 5)
    assert r[("s1", "<all>")] == (2, 3) and r[("s2", "<all>")] == (2, 5)
    assert r[("<all>", "<all>")] == (4, 8)
    # every level sums to the grand total
    fine = out[(out["source"] != "<all>") & (out["lang"] != "<all>")]
    assert fine["n_docs"].sum() == 4 and fine["n_tokens"].sum() == 8


def test_grouped_quantiles_cont_hand_case(ray_session, tmp_path):
    """quantile_cont rule by hand on lengths 1..4: position q*(n-1) with
    linear interpolation -> q=.25 -> 1.75, q=.5 -> 2.5, q=.75 -> 3.25,
    q=.9 -> 3.7. Branches agree on real data."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.exact import grouped_quantiles_cont

    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(["a", "ab", "abc", "abcd"]),
        "lang": pa.array(["x"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([1, 2, 3, 4], pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    out = grouped_quantiles_cont(str(tmp_path)).to_pandas()
    assert out["value"].tolist() == [1.75, 2.5, 3.25, 3.7]

    a = grouped_quantiles_cont("/root/testdata/sf0.001", force="driver").to_pandas()
    b = grouped_quantiles_cont("/root/testdata/sf0.001", force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_skipgram_counts_hand_case(ray_session, tmp_path):
    """Skip-gram window semantics by hand: ordered pairs within 2
    positions, doc boundaries cut windows, min_cnt filters."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.exact import skipgram_counts

    texts = ["a b c", "a b"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(2), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 2),
        "source": pa.array(["s"] * 2),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    # window=2: doc0 -> (a b),(b c),(a c); doc1 -> (a b); NO cross-doc pair
    out = skipgram_counts(str(tmp_path), window=2, min_cnt=1).to_pandas()
    assert dict(zip(out["pair"], out["cnt"])) == {
        "a b": 2, "a c": 1, "b c": 1}
    out2 = skipgram_counts(str(tmp_path), window=2, min_cnt=2).to_pandas()
    assert out2["pair"].tolist() == ["a b"]


def test_grouped_heavy_hitters_exact_and_pruned(ray_session):
    """Per-group heavy hitters match DuckDB exactly, and the per-group
    CM-CU prefilter really prunes (candidates ≪ vocabulary) while never
    dismissing a true heavy hitter (no-undercount)."""
    import duckdb

    from sketch_ray.pipelines.heavy_hitters import grouped_heavy_hitter_tokens

    sf = "/root/testdata/sf0.001"
    got = grouped_heavy_hitter_tokens(sf, rel_threshold=0.02).to_pandas()
    want = duckdb.sql(f"""
        WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token
                     FROM read_parquet('{sf}/documents.parquet')),
        totals AS (SELECT lang, count(*) n FROM tok GROUP BY lang),
        counts AS (SELECT lang, token, count(*) cnt FROM tok GROUP BY lang, token)
        SELECT c.lang, c.token, c.cnt FROM counts c JOIN totals t USING (lang)
        WHERE c.cnt >= greatest(1, ceil(0.02 * t.n)) ORDER BY c.lang, c.token
    """).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert len(got) > 0


def test_grouped_heavy_hitters_planted_skew(ray_session, tmp_path):
    """On a skewed corpus the per-group prefilter selects exactly the
    planted hot token per group and prunes the long tail."""
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.heavy_hitters import grouped_heavy_hitter_tokens

    rows = []
    doc_id = 0
    for lang, hot in [("en", "hotone"), ("de", "hotzwei")]:
        for i in range(200):
            # each doc: the group's hot token + 4 rare fillers
            fill = " ".join(f"{lang}rare{i}_{j}" for j in range(4))
            rows.append((doc_id, f"{hot} {fill}", lang))
            doc_id += 1
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
    }), f"{sf}/documents.parquet")
    got = grouped_heavy_hitter_tokens(sf, rel_threshold=0.1).to_pandas()
    # each group has 1000 tokens; hot appears 200x (20%), fillers once each
    assert list(got.itertuples(index=False, name=None)) == [
        ("de", "hotzwei", 200), ("en", "hotone", 200)]


def test_windowed_heavy_users_vs_duckdb(ray_session):
    """Sliding-window heavy hitters: pigeonhole candidates + merged-CM
    prefilter + exact verify equals DuckDB's windowed HAVING; the merged
    window sketch never undercounts any (user, window)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from sketch_ray.kernels import sketch_from_bytes
    from sketch_ray.pipelines.heavy_hitters import (per_day_user_cm_states,
                                                    windowed_heavy_users)

    sf = "/root/testdata/sf0.001"
    a = windowed_heavy_users(sf, force="driver").to_pandas()
    b = windowed_heavy_users(sf, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ref = duckdb.sql(f"""
        WITH du AS (SELECT date_trunc('day', ts) AS day, user_id,
                           count(*) AS n
                    FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2),
             days AS (SELECT DISTINCT day FROM du)
        SELECT d.day AS day, u.user_id, sum(u.n) AS n_events
        FROM days d JOIN du u
          ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
        GROUP BY 1, 2 HAVING sum(u.n) >= 24
        ORDER BY day, user_id""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)
    assert len(a) > 0

    # no-undercount of the merged window sketch on EVERY (user, window)
    exact = duckdb.sql(f"""
        WITH du AS (SELECT date_trunc('day', ts) AS day, user_id,
                           count(*) AS n
                    FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2),
             days AS (SELECT DISTINCT day FROM du)
        SELECT d.day AS day, u.user_id, sum(u.n) AS n
        FROM days d JOIN du u
          ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
        GROUP BY 1, 2""").df()
    states = per_day_user_cm_states(sf)
    day_i = np.sort(np.array(list(states), np.int64))
    W_US = np.int64(6 * 86_400_000_000)
    for d, grp in exact.groupby("day"):
        d_us = np.int64(pd.Timestamp(d).value // 1000)
        lo = int(np.searchsorted(day_i, d_us - W_US))
        hi = int(np.searchsorted(day_i, d_us, side="right"))
        sk = sketch_from_bytes(states[int(day_i[lo])]).copy()
        for di in range(lo + 1, hi):
            sk.merge(sketch_from_bytes(states[int(day_i[di])]))
        est = sk.query(pa.array(grp["user_id"].to_numpy(), pa.int64()))
        assert (est >= grp["n"].to_numpy()).all()


def test_token_weighted_quantiles_and_ks(ray_session):
    """Weighted quantiles (integer cut rule) and the two-sample KS drift
    distance: branches agree, match DuckDB, and satisfy basic laws
    (weighted median >= unweighted when long docs carry more tokens is
    data-dependent, so laws here are bounds + identity cases)."""
    import duckdb
    import pandas as pd

    from sketch_ray.pipelines.exact import (length_ks_distance,
                                            token_weighted_quantiles)

    sf = "/root/testdata/sf0.001"
    a = token_weighted_quantiles(sf, force="driver").to_pandas()
    b = token_weighted_quantiles(sf, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ref = duckdb.sql(f"""
        WITH w AS (SELECT n_chars AS v, sum(len(string_split(text, ' '))) AS wt
                   FROM read_parquet('{sf}/documents.parquet') GROUP BY 1),
             c AS (SELECT v, sum(wt) OVER (ORDER BY v) AS cumw,
                          (SELECT sum(wt) FROM w) AS tot FROM w)
        SELECT q, min(v) AS value
        FROM c, (VALUES (0.25, 1, 4), (0.5, 1, 2), (0.9, 9, 10)) AS qs(q, num, den)
        WHERE cumw * den >= num * tot GROUP BY q ORDER BY q""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)
    assert (a["value"].to_numpy()[1:] >= a["value"].to_numpy()[:-1]).all()

    k1 = length_ks_distance(sf, force="driver").to_pandas()
    k2 = length_ks_distance(sf, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(k1, k2)
    ks = float(k1.loc[0, "ks"])
    assert 0.0 <= ks <= 1.0
    refk = duckdb.sql(f"""
        WITH a AS (SELECT n_chars AS v, count(*) AS c
                   FROM read_parquet('{sf}/documents.parquet')
                   WHERE lang = 'en' GROUP BY 1),
             b AS (SELECT n_chars AS v, count(*) AS c
                   FROM read_parquet('{sf}/documents.parquet')
                   WHERE lang <> 'en' GROUP BY 1),
             u AS (SELECT v FROM a UNION SELECT v FROM b),
             m AS (SELECT u.v, coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb
                   FROM u LEFT JOIN a USING (v) LEFT JOIN b USING (v)),
             s AS (SELECT sum(ca) OVER (ORDER BY v) AS cca,
                          sum(cb) OVER (ORDER BY v) AS ccb FROM m)
        SELECT COALESCE(round(max(abs(cca * (SELECT sum(c) FROM b)
                           - ccb * (SELECT sum(c) FROM a)))
                     / ((SELECT sum(c) FROM a) * (SELECT sum(c) FROM b)), 6),
                        0.0) AS ks,
               COALESCE((SELECT sum(c) FROM a), 0) AS n_a,
               COALESCE((SELECT sum(c) FROM b), 0) AS n_b
        FROM s""").df()
    pd.testing.assert_frame_equal(k1, refk, check_dtype=False)


def test_token_burstiness_vs_duckdb(ray_session):
    """Nested (doc,token)->token moments: branches agree, match DuckDB,
    and a hand-planted bursty token shows VMR > a uniform one."""
    import duckdb
    import pandas as pd

    from sketch_ray.pipelines.exact import token_burstiness

    sf = "/root/testdata/sf0.001"
    a = token_burstiness(sf, force="driver").to_pandas()
    b = token_burstiness(sf, force="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ref = duckdb.sql(f"""
        WITH dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                    FROM read_parquet('{sf}/documents.parquet')),
             c AS (SELECT doc_id, token, count(*) AS n FROM dt GROUP BY 1, 2),
             m AS (SELECT token, count(*) AS df, sum(n) AS tf,
                          sum(n * n) AS s2 FROM c GROUP BY 1),
             t AS (SELECT sum(tf) AS total FROM m)
        SELECT token, df, tf, round((s2 * df - tf * tf) / (df * tf), 6) AS vmr
        FROM m, t WHERE tf >= ceil(0.005 * total) ORDER BY token""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)
    assert len(a) > 0 and (a["vmr"] >= 0).all()
    # VMR of a token appearing once in each of its docs is exactly
    # (df*df - df^2)/(df*df) with n=1 per doc -> s2=df, tf=df -> 0
    ones = a[a["tf"] == a["df"]]
    assert (ones["vmr"] == 0.0).all()


def test_lang_token_divergence_vs_duckdb(ray_session):
    """Per-token JS contributions match DuckDB (per-row ln rounding, no
    global float sum); JS terms are nonnegative and a token used at the
    same rate in both slices contributes ~0."""
    import duckdb
    import pandas as pd

    from sketch_ray.pipelines.exact import lang_token_divergence

    sf = "/root/testdata/sf0.001"
    a = lang_token_divergence(sf, k=20, min_cnt=20).to_pandas()
    ref = duckdb.sql(f"""
        WITH ta_ AS (SELECT unnest(string_split(text, ' ')) AS token
                     FROM read_parquet('{sf}/documents.parquet')
                     WHERE lang = 'en'),
             tb_ AS (SELECT unnest(string_split(text, ' ')) AS token
                     FROM read_parquet('{sf}/documents.parquet')
                     WHERE lang <> 'en'),
             ca_ AS (SELECT token, count(*) AS ca FROM ta_ GROUP BY 1),
             cb_ AS (SELECT token, count(*) AS cb FROM tb_ GROUP BY 1),
             n_ AS (SELECT (SELECT count(*) FROM ta_) AS na,
                           (SELECT count(*) FROM tb_) AS nb),
             j AS (SELECT coalesce(ca_.token, cb_.token) AS token,
                          coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
                   FROM ca_ FULL JOIN cb_ ON ca_.token = cb_.token),
             p AS (SELECT token, ca, cb, ca / greatest(na, 1) AS pa,
                          cb / greatest(nb, 1) AS pb FROM j, n_),
             t AS (SELECT token, ca, cb,
                          round(CASE WHEN pa > 0 THEN
                                  0.5 * (pa * ln(pa / ((pa + pb) / 2)))
                                ELSE 0 END
                              + CASE WHEN pb > 0 THEN
                                  0.5 * (pb * ln(pb / ((pa + pb) / 2)))
                                ELSE 0 END, 6) AS js
                   FROM p WHERE ca + cb >= 20)
        SELECT row_number() OVER (ORDER BY js DESC, token) AS rank,
               token, ca AS cnt_a, cb AS cnt_b, js
        FROM t ORDER BY js DESC, token LIMIT 20""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)
    assert (a["js"] >= 0).all()


def test_windowed_heavy_users_huge_ids(ray_session, tmp_path):
    """Hashed 64-bit-scale user ids: the dense-rank composite cannot
    overflow — results equal the same data with small remapped ids."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketch_ray.pipelines.heavy_hitters import windowed_heavy_users

    src = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{src}/events.parquet")
    uid = ev["user_id"].to_numpy()
    # remap each user to a huge sparse id near the int64 ceiling
    uniq = np.unique(uid)
    huge = (np.int64(2**62) + np.arange(len(uniq), dtype=np.int64)
            * np.int64(3_037_000_499))
    mapped = huge[np.searchsorted(uniq, uid)]
    big = ev.set_column(ev.schema.get_field_index("user_id"), "user_id",
                        pa.array(mapped, pa.int64()))
    d = tmp_path / "huge"
    d.mkdir()
    pq.write_table(big, str(d / "events.parquet"))

    a = windowed_heavy_users(str(d), force="driver").to_pandas()
    ref = duckdb.sql(f"""
        WITH du AS (SELECT date_trunc('day', ts) AS day, user_id,
                           count(*) AS n
                    FROM read_parquet('{d}/events.parquet') GROUP BY 1, 2),
             days AS (SELECT DISTINCT day FROM du)
        SELECT d.day AS day, u.user_id, sum(u.n) AS n_events
        FROM days d JOIN du u
          ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
        GROUP BY 1, 2 HAVING sum(u.n) >= 24
        ORDER BY day, user_id""").df()
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)


def test_source_kl_profile_recompute_and_invariants(ray_session):
    """kl matches an independent pandas recompute of Σ p·ln(p/q) per
    source to the quantization envelope (#terms × 1e-12 floor loss);
    KL is non-negative up to that envelope; per-source token totals
    partition the corpus total; output is deterministic."""
    from sketch_ray.pipelines.exact import source_kl_profile

    SF = "/root/testdata/sf0.001"
    a = source_kl_profile(SF).to_pandas()
    b = source_kl_profile(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    rows = []
    for src, txt in zip(docs["source"], docs["text"]):
        for tok in txt.split(" "):
            rows.append((src, tok))
    df = pd.DataFrame(rows, columns=["source", "token"])
    st = df.groupby(["source", "token"]).size().rename("c").reset_index()
    ts = st.groupby("source")["c"].transform("sum")
    cg = st.groupby("token")["c"].transform("sum")
    tt = st["c"].sum()
    p = st["c"] / ts
    q = cg / tt
    st["term"] = p * np.log(p / q)
    want = st.groupby("source")["term"].sum()
    n_terms = st.groupby("source").size()

    assert len(a) == docs["source"].nunique()
    assert int(a["n_tokens"].sum()) == int(tt)
    for _, r in a.iterrows():
        env = n_terms[r["source"]] * 1e-12 + 1e-9
        assert abs(r["kl_fp"] / 1e12 - want[r["source"]]) < env
        assert r["kl_fp"] >= -n_terms[r["source"]]
        assert r["kl"] >= 0.0


def test_zipf_and_vocab_growth_recompute(ray_session):
    """zipf_slope matches an independent float least-squares fit on the
    same ranked pairs within the quantization envelope; the vocabulary
    growth curve is non-decreasing, ends at the full vocab size, and
    matches a direct pandas recompute of first-occurrence cutoffs."""
    from sketch_ray.pipelines.exact import vocab_growth_curve, zipf_profile

    SF = "/root/testdata/sf0.001"
    z = zipf_profile(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    toks = docs["text"].str.split(" ")
    flat = pd.DataFrame({
        "doc_id": np.repeat(docs["doc_id"].to_numpy(), toks.str.len()),
        "token": np.concatenate(toks.to_numpy()),
    })
    cnt = flat["token"].value_counts().sort_index() \
        .sort_values(ascending=False, kind="stable")
    c = cnt.to_numpy()[:1000]
    x, y = np.log(np.arange(1, len(c) + 1)), np.log(c.astype(float))
    slope = ((len(x) * (x * y).sum() - x.sum() * y.sum())
             / (len(x) * (x * x).sum() - x.sum() ** 2))
    assert int(z["n_ranks"].iloc[0]) == len(c)
    assert abs(z["zipf_slope"].iloc[0] - slope) < 1e-5

    v = vocab_growth_curve(SF).to_pandas()
    first = flat.groupby("token")["doc_id"].min()
    n_docs = int(docs["doc_id"].max()) + 1
    assert (np.diff(v["vocab_size"].to_numpy()) >= 0).all()
    assert int(v["vocab_size"].iloc[-1]) == flat["token"].nunique()
    for _, r in v.iterrows():
        assert int(r["vocab_size"]) == int((first < r["docs_cutoff"]).sum())
