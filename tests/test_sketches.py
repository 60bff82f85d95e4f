"""Property tests for HLL, Bloom, KLL, t-digest (SURVEY.md §5)."""

import numpy as np
import pytest

from sketch_ray.kernels import HLL, KLL, BloomFilter, CountingBloom, TDigest, sketch_from_bytes


def keys_range(a, b, prefix="key"):
    return np.array([f"{prefix}{i:08d}" for i in range(a, b)])


# ---------------------------------------------------------------- HLL


@pytest.mark.parametrize("n", [100, 5000, 200000])
def test_hll_relative_error(n):
    sk = HLL(p=14, seed=42)
    sk.update(keys_range(0, n))
    est = sk.estimate()
    bound = 4 * sk.rel_error_bound()  # ~4 sigma
    assert abs(est - n) <= max(bound * n, 3), f"est={est} n={n}"


def test_hll_duplicates_do_not_inflate():
    sk = HLL(p=12, seed=42)
    ks = keys_range(0, 1000)
    for _ in range(5):
        sk.update(ks)
    est = sk.estimate()
    assert abs(est - 1000) <= 4 * sk.rel_error_bound() * 1000 + 3


def test_hll_merge_byte_identical_any_order():
    parts = [keys_range(i * 1000, (i + 1) * 1000) for i in range(6)]
    def build(order):
        acc = HLL(p=12, seed=42)
        for i in order:
            s = HLL(p=12, seed=42)
            s.update(parts[i])
            acc.merge(s)
        return acc
    ref = build(range(6))
    rng = np.random.default_rng(0)
    for _ in range(3):
        assert ref.to_bytes() == build(rng.permutation(6)).to_bytes()
    # merged == single-pass over the union
    single = HLL(p=12, seed=42)
    single.update(np.concatenate(parts))
    assert ref.to_bytes() == single.to_bytes()


# ---------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives():
    sk = BloomFilter.for_capacity(5000, fp_rate=0.01, seed=42)
    present = keys_range(0, 5000)
    sk.update(present)
    assert sk.contains(present).all(), "Bloom false negative"


def test_bloom_fp_rate_within_bound():
    sk = BloomFilter.for_capacity(5000, fp_rate=0.01, seed=42)
    sk.update(keys_range(0, 5000))
    absent = keys_range(100000, 120000)
    fp = sk.contains(absent).mean()
    assert fp <= 0.03, f"observed FP rate {fp}"


def test_bloom_merge_or_byte_identical():
    a = BloomFilter(n_bits=1 << 14, n_hashes=5, seed=1)
    b = BloomFilter(n_bits=1 << 14, n_hashes=5, seed=1)
    a.update(keys_range(0, 500))
    b.update(keys_range(500, 1000))
    ab = a.copy().merge(b)
    ba = b.copy().merge(a)
    assert (ab.bits == ba.bits).all()
    single = BloomFilter(n_bits=1 << 14, n_hashes=5, seed=1)
    single.update(keys_range(0, 1000))
    assert (ab.bits == single.bits).all()
    assert ab.contains(keys_range(0, 1000)).all()


# ---------------------------------------------------------------- KLL


def test_kll_rank_error_bound():
    rng = np.random.default_rng(11)
    data = rng.normal(size=50000)
    sk = KLL(k=200, seed=42)
    for chunk in np.array_split(data, 23):
        sk.update(chunk)
    assert sk.n == len(data)
    qs = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    est = sk.quantile(qs)
    sorted_ = np.sort(data)
    true_ranks = np.searchsorted(sorted_, est, side="right") / len(data)
    # published normalized rank error ~ O(1/k); generous 3.5/k slack
    assert np.abs(true_ranks - qs).max() <= 3.5 / 200


def test_kll_merge_rank_error():
    rng = np.random.default_rng(12)
    data = rng.exponential(size=40000)
    parts = np.array_split(data, 8)
    sks = []
    for p in parts:
        s = KLL(k=200, seed=42)
        s.update(p)
        sks.append(s)
    order = rng.permutation(8)
    acc = sks[order[0]]
    for i in order[1:]:
        acc.merge(sks[i])
    assert acc.n == len(data)
    qs = np.array([0.1, 0.5, 0.9])
    est = acc.quantile(qs)
    sorted_ = np.sort(data)
    true_ranks = np.searchsorted(sorted_, est, side="right") / len(data)
    assert np.abs(true_ranks - qs).max() <= 5.0 / 200


def test_kll_weighted_update():
    sk = KLL(k=100, seed=1)
    sk.update([1.0, 2.0, 3.0], [5, 5, 90])
    assert sk.n == 100
    assert sk.quantile(0.5) == 3.0


# ---------------------------------------------------------------- t-digest


def test_tdigest_quantile_accuracy():
    rng = np.random.default_rng(13)
    data = rng.gamma(2.0, size=60000)
    sk = TDigest(delta=200, seed=42)
    for chunk in np.array_split(data, 31):
        sk.update(chunk)
    qs = np.array([0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999])
    est = sk.quantile(qs)
    sorted_ = np.sort(data)
    true_ranks = np.searchsorted(sorted_, est, side="right") / len(data)
    err = np.abs(true_ranks - qs)
    # t-digest: tight at tails, ~O(1/delta) mid-range
    assert err.max() <= 0.02
    assert err[0] <= 0.002 and err[-1] <= 0.002


def test_tdigest_merge_accuracy():
    rng = np.random.default_rng(14)
    data = rng.normal(size=40000)
    parts = np.array_split(data, 10)
    acc = TDigest(delta=200, seed=42)
    for p in parts:
        s = TDigest(delta=200, seed=42)
        s.update(p)
        acc.merge(s)
    assert abs(acc.n - len(data)) < 1e-9
    sorted_ = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        est = acc.quantile(q)
        tr = np.searchsorted(sorted_, est, side="right") / len(data)
        assert abs(tr - q) <= 0.03


def test_tdigest_bounded_size():
    sk = TDigest(delta=100, seed=42)
    rng = np.random.default_rng(15)
    sk.update(rng.random(100000))
    sk._flush()
    assert len(sk.means) <= 2 * 100  # centroids bounded ~ delta


# ---------------------------------------------------------------- serialization


@pytest.mark.parametrize("factory", [
    lambda: HLL(p=10, seed=3),
    lambda: BloomFilter(n_bits=1 << 12, n_hashes=4, seed=3),
    lambda: CountingBloom(width=1 << 12, n_hashes=4, seed=3),
    lambda: KLL(k=128, seed=3),
    lambda: TDigest(delta=100, seed=3),
])
def test_roundtrip(factory):
    sk = factory()
    if sk.kind in ("kll", "tdigest"):
        sk.update(np.arange(1000, dtype=np.float64))
    else:
        sk.update(keys_range(0, 1000))
    back = sketch_from_bytes(sk.to_bytes())
    assert back == sk
    assert back.to_bytes() == sk.to_bytes()


def test_sketch_agg_grouped(ray_session):
    """SketchAgg rides ds.groupby().aggregate(): per-group HLL/KLL answers
    must sit within the kernels' published bounds vs exact groupby."""
    import duckdb
    import ray.data as rd

    from sketch_ray.stages.agg import SketchAgg
    from sketch_ray.stages.sketch_build import SketchSpec

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["lang", "source", "n_chars"])
    got = ds.groupby("lang").aggregate(
        SketchAgg(SketchSpec("s", "hll", "source", mode="column", params={"p": 12, "seed": 42}),
                  alias_name="est_sources", finalize="estimate"),
        SketchAgg(SketchSpec("q", "kll", "n_chars", mode="numeric", params={"k": 200, "seed": 42}),
                  alias_name="median_chars", finalize=("quantile", 0.5)),
    ).to_pandas().sort_values("lang").reset_index(drop=True)
    want = duckdb.query(
        f"SELECT lang, count(DISTINCT source) d, count(*) n FROM "
        f"read_parquet('{sf}/documents.parquet') GROUP BY lang ORDER BY lang"
    ).df()
    assert got["lang"].tolist() == want["lang"].tolist()
    for _, (g, w) in enumerate(zip(got.itertuples(), want.itertuples())):
        # HLL p=12: sigma ~ 1.04/sqrt(4096) ~ 1.6%; allow 5 sigma + small-n slack
        assert abs(g.est_sources - w.d) <= max(3, 0.09 * w.d)
    # KLL k=200 on n<=few hundred values: rank error ~ 1%; median within
    # the exact value range per group
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf}/documents.parquet", columns=["lang", "n_chars"]).to_pandas()
    for _, r in got.iterrows():
        vals = sorted(t[t["lang"] == r["lang"]]["n_chars"])
        lo, hi = vals[max(0, int(0.4 * len(vals)))], vals[min(len(vals) - 1, int(0.6 * len(vals)))]
        assert lo <= r["median_chars"] <= hi


# -- Misra-Gries -------------------------------------------------------------

def _mg_stream(seed=3, n=20000, vocab=400):
    rng = np.random.default_rng(seed)
    ranks = np.minimum(rng.zipf(1.3, size=n), vocab)
    return [f"k{r}" for r in ranks]


def test_mg_lower_bound_and_error():
    from collections import Counter

    from sketch_ray.kernels import MisraGries

    stream = _mg_stream()
    exact = Counter(stream)
    mg = MisraGries(k=64)
    mg.update(stream)
    n = len(stream)
    assert mg.err <= n / (64 + 1) * (64 + 1)  # err is a tracked quantity
    keys = list(exact)
    lower = mg.query(keys)
    for key, lo in zip(keys, lower):
        assert lo <= exact[key]                     # never overcount
        assert exact[key] - lo <= mg.err            # undercount bounded by err
    assert mg.err <= n // (64 + 1) + 1              # MG bound N/(k+1)
    # guaranteed presence of true heavy keys
    for key, c in exact.items():
        if c > n / (64 + 1):
            assert mg.query([key])[0] > 0


def test_mg_merge_bound_holds():
    from collections import Counter

    from sketch_ray.kernels import MisraGries

    stream = _mg_stream(seed=9, n=30000)
    exact = Counter(stream)
    n = len(stream)
    parts = [stream[i::5] for i in range(5)]
    sketches = []
    for p in parts:
        mg = MisraGries(k=64)
        mg.update(p)
        sketches.append(mg)
    acc = sketches[0]
    for s in sketches[1:]:
        acc.merge(s)
    assert acc.n_updates == n
    for key, c in exact.items():
        lo = acc.query([key])[0]
        assert lo <= c and c - lo <= acc.err
    # mergeable-summaries bound: err <= N/(k+1) for the combined stream
    assert acc.err <= n / (64 + 1)


def test_mg_weighted_updates():
    from sketch_ray.kernels import MisraGries

    mg = MisraGries(k=4)
    mg.update(["a", "b", "c"], np.array([100, 50, 10]))
    mg.update(["d", "e"], np.array([5, 3]))  # forces eviction pressure
    assert mg.query(["a"])[0] >= 100 - mg.err
    top = mg.top(2)
    assert top[0][0] == "a"


# -- BottomK (KMV) -----------------------------------------------------------

def test_bottomk_merge_byte_identical_and_deterministic():
    from sketch_ray.kernels import BottomK

    keys = [f"u{i}" for i in range(5000)]
    whole = BottomK(k=128)
    whole.update(keys)

    import itertools
    parts = [keys[i::7] for i in range(7)]
    for perm in (range(7), reversed(range(7))):
        acc = BottomK(k=128)
        for i in perm:
            p = BottomK(k=128)
            p.update(parts[i])
            acc.merge(p)
        assert acc.to_bytes() == whole.to_bytes()
    # duplicates change nothing (distinct sample)
    dup = BottomK(k=128)
    dup.update(keys * 3)
    assert dup.to_bytes() == whole.to_bytes()


def test_bottomk_kmv_estimate():
    from sketch_ray.kernels import BottomK

    for n in (500, 5000, 50000):
        bk = BottomK(k=256)
        bk.update([f"key{i}" for i in range(n)])
        est = bk.estimate()
        # KMV relative error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
        assert abs(est - n) / n < 0.25, (n, est)


def test_bottomk_exact_below_k():
    from sketch_ray.kernels import BottomK

    bk = BottomK(k=64)
    bk.update([f"x{i}" for i in range(40)] * 5)
    assert bk.estimate() == 40.0
    assert len(bk.sample()) == 40


def test_value_quantiles_rank_error(ray_session):
    """Distributed KLL/t-digest over a continuous double column: every
    reported quantile's true rank must sit within the summary's error."""
    import duckdb

    from sketch_ray.pipelines.sketch_queries import value_quantiles

    sf = "/root/testdata/sf0.001"
    out = value_quantiles(sf).to_pandas()
    vals = duckdb.query(
        f"SELECT value FROM read_parquet('{sf}/events.parquet')"
    ).df()["value"].to_numpy()
    s = np.sort(vals)
    n = len(s)
    for _, r in out.iterrows():
        for col, tol in (("kll_value", 0.03), ("tdigest_value", 0.05)):
            v = r[col]
            lo = np.searchsorted(s, v, side="left") / n
            hi = np.searchsorted(s, v, side="right") / n
            assert lo - tol <= r["q"] <= hi + tol, (col, r["q"], v, lo, hi)


def test_kllpm_exact_small_and_bounded_large():
    """KLL± (kernels/kllpm.py): exact below compaction; bounded rank error
    at scale; merge order-insensitive within bounds; signed-update API and
    serialization roundtrip."""
    import numpy as np

    from sketch_ray.kernels import KLLPM, sketch_from_bytes

    rng = np.random.default_rng(0)

    # exact regime: n small enough that neither side compacts
    sk = KLLPM(k=200, seed=1)
    ins = rng.uniform(0, 100, 120)
    sk.update(ins)
    dels = rng.choice(ins, 40, replace=False)
    sk.delete(dels)
    from collections import Counter

    live = list((Counter(ins.tolist()) - Counter(dels.tolist())).elements())
    live = np.sort(np.array(live))
    for q in (0.1, 0.5, 0.9):
        want = live[min(int(np.ceil(q * len(live))) - 1, len(live) - 1)]
        assert sk.quantile(q) == want
    assert sk.n == len(live)

    # signed-update API equivalence
    sk2 = KLLPM(k=200, seed=1)
    sk2.update(np.concatenate([ins, dels]),
               np.concatenate([np.ones(len(ins), np.int64),
                               np.full(len(dels), -1, np.int64)]))
    assert sk2.quantile(0.5) == sk.quantile(0.5)

    # serialization roundtrip
    rt = sketch_from_bytes(sk.to_bytes())
    assert rt.quantile(0.5) == sk.quantile(0.5) and rt.n == sk.n

    # bounded regime: 20k inserts, 30% deleted
    big = KLLPM(k=200, seed=2)
    vals = rng.uniform(0, 1, 20_000)
    big.update(vals)
    del_mask = rng.random(20_000) < 0.3
    big.delete(vals[del_mask])
    live = np.sort(vals[~del_mask])
    n = len(live)
    for q in (0.1, 0.5, 0.9):
        est = big.quantile(q)
        true_rank = np.searchsorted(live, est, side="right")
        assert abs(true_rank - q * n) <= 0.05 * 20_000, (q, est)

    # merge: 4 partials combined in two different orders, both within bound
    parts = []
    for lo in range(0, 20_000, 5000):
        p = KLLPM(k=200, seed=2)
        p.update(vals[lo:lo + 5000])
        p.delete(vals[lo:lo + 5000][del_mask[lo:lo + 5000]])
        parts.append(p)
    m1 = sketch_from_bytes(parts[0].to_bytes())
    for p in parts[1:]:
        m1.merge(sketch_from_bytes(p.to_bytes()))
    m2 = sketch_from_bytes(parts[3].to_bytes())
    for p in (parts[1], parts[0], parts[2]):
        m2.merge(sketch_from_bytes(p.to_bytes()))
    for m in (m1, m2):
        assert m.n == n
        est = m.quantile(0.5)
        true_rank = np.searchsorted(live, est, side="right")
        assert abs(true_rank - 0.5 * n) <= 0.05 * 20_000


def test_dynamic_quantiles_pipeline_tracks_survivors(ray_session):
    """The KLL± pipeline's net count equals the non-error event count and
    its median lands within rank bounds of the exact surviving multiset."""
    import duckdb
    import numpy as np

    from sketch_ray.pipelines.sketch_queries import dynamic_quantiles

    sf = "/root/testdata/sf0.001"
    out = dynamic_quantiles(sf).to_pandas()
    con = duckdb.connect()
    live = con.execute(
        f"SELECT value FROM read_parquet('{sf}/events.parquet') "
        "WHERE event_type != 'error' ORDER BY value").df()["value"].to_numpy()
    n_ins = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf}/events.parquet')").fetchone()[0]
    assert (out["n_live"] == len(live)).all()
    for q, est in zip(out["q"], out["value"]):
        true_rank = np.searchsorted(live, est, side="right")
        assert abs(true_rank - q * len(live)) <= max(0.05 * n_ins, 2.0), (q, est)


def test_cm_inner_product_bound():
    """CM inner-product (join-size) estimator: never undercounts the true
    Σ a(k)·b(k); over by <= (e/width)·N_A·N_B across seeds; merged partials
    give the identical estimate (sum-merge exactness); config mismatch and
    CU misuse are rejected."""
    import math

    from sketch_ray.kernels import CountMin

    rng = np.random.default_rng(0)
    # Zipf-ish keys: overlapping hot sets on both sides
    ka = rng.zipf(1.3, size=20000) % 500
    kb = rng.zipf(1.3, size=30000) % 700
    ca = np.bincount(ka, minlength=700).astype(np.int64)
    cb = np.bincount(kb, minlength=700).astype(np.int64)
    true = int((ca * cb).sum())
    na, nb = int(ca.sum()), int(cb.sum())
    keys_a = ka.astype(np.uint64)
    keys_b = kb.astype(np.uint64)
    for seed in (1, 7, 42):
        for width in (1 << 10, 1 << 14):
            a = CountMin(depth=4, width=width, seed=seed)
            b = CountMin(depth=4, width=width, seed=seed)
            a.update(keys_a)
            b.update(keys_b)
            est = a.inner_product(b)
            assert est >= true
            assert est <= true + math.e / width * na * nb
            # merged halves == whole (associative sum-merge)
            a1 = CountMin(depth=4, width=width, seed=seed)
            a2 = CountMin(depth=4, width=width, seed=seed)
            a1.update(keys_a[:10000]); a2.update(keys_a[10000:])
            assert a1.merge(a2).inner_product(b) == est

    with pytest.raises(ValueError):
        CountMin(depth=4, width=1024, seed=1).inner_product(
            CountMin(depth=4, width=2048, seed=1))


def test_join_size_exact_and_cm_estimate(ray_session):
    """Pipeline level: both join_size_exact plans agree with DuckDB's
    COUNT(*) join, and the sketch estimate brackets it per the published
    bound (never under; over <= (e/w)·N_A·N_B)."""
    import math

    import duckdb

    from sketch_ray.pipelines.relational import join_size_exact
    from sketch_ray.pipelines.sketch_queries import cm_join_size

    sf = "/root/testdata/sf0.001"
    want = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{sf}/events.parquet') e
            JOIN read_parquet('{sf}/orders.parquet') o
            ON e.user_id = o.o_custkey"""
    ).fetchone()[0]
    a = join_size_exact(sf, force="driver").column("n_pairs")[0].as_py()
    b = join_size_exact(sf, force="shuffle").column("n_pairs")[0].as_py()
    assert a == b == want

    import pyarrow.parquet as pq
    na = pq.ParquetFile(f"{sf}/events.parquet").metadata.num_rows
    nb = pq.ParquetFile(f"{sf}/orders.parquet").metadata.num_rows
    est = cm_join_size(sf).to_pandas()
    assert list(est.columns) == ["width", "est_pairs"]
    for _, r in est.iterrows():
        assert r["est_pairs"] >= want
        assert r["est_pairs"] <= want + math.e / r["width"] * na * nb
    # wider sketch is at least as tight
    assert est.sort_values("width")["est_pairs"].is_monotonic_decreasing or \
        est["est_pairs"].nunique() == 1


def test_countsketch_point_f2_and_merge():
    """CountSketch: exact-ish point estimates on hot keys (unbiased,
    Var <= F2/width), F2 within the AMS bound across seeds, byte-identical
    sum-merge under any order, turnstile deletes retract cleanly."""
    from sketch_ray.kernels import CountSketch

    rng = np.random.default_rng(3)
    keys = (rng.zipf(1.3, 60000) % 3000).astype(np.uint64)
    freq = np.bincount(keys.astype(np.int64), minlength=3000)
    true_f2 = int((freq.astype(np.int64) ** 2).sum())
    for seed in (1, 7, 42, 99):
        cs = CountSketch(depth=5, width=1 << 12, seed=seed)
        cs.update(keys)
        # F2 within eps = sqrt(8/width) of truth (AMS median-of-rows)
        eps = (8 / (1 << 12)) ** 0.5
        assert abs(cs.f2() - true_f2) <= eps * true_f2
        # hot-key point estimates within 3*sqrt(F2/width)
        hot = np.argsort(freq)[-5:].astype(np.uint64)
        est = cs.query(hot)
        tol = 3 * (true_f2 / (1 << 12)) ** 0.5
        assert (np.abs(est - freq[hot.astype(np.int64)]) <= tol).all()

    # merge: any split/order gives byte-identical state
    a = CountSketch(depth=5, width=1 << 10, seed=5)
    b = CountSketch(depth=5, width=1 << 10, seed=5)
    c = CountSketch(depth=5, width=1 << 10, seed=5)
    whole = CountSketch(depth=5, width=1 << 10, seed=5)
    a.update(keys[:20000]); b.update(keys[20000:40000]); c.update(keys[40000:])
    whole.update(keys)
    merged = b.merge(c).merge(a)
    assert merged.to_bytes() == whole.to_bytes()

    # turnstile: inserting then deleting a key's weight cancels exactly
    t = CountSketch(depth=5, width=1 << 10, seed=5)
    t.update(np.array([11, 22], np.uint64), np.array([100, 40], np.int64))
    t.update(np.array([11], np.uint64), np.array([-100], np.int64))
    assert abs(int(t.query(np.array([11], np.uint64))[0])) <= 1
    assert int(t.query(np.array([22], np.uint64))[0]) == 40


def test_countsketch_inner_product_two_sided():
    """CS inner product is unbiased (two-sided, unlike CM's one-sided):
    close to truth across seeds at modest width."""
    from sketch_ray.kernels import CountSketch

    rng = np.random.default_rng(4)
    ka = (rng.zipf(1.3, 30000) % 800).astype(np.uint64)
    kb = (rng.zipf(1.3, 20000) % 800).astype(np.uint64)
    ca = np.bincount(ka.astype(np.int64), minlength=800)
    cb = np.bincount(kb.astype(np.int64), minlength=800)
    true = int((ca * cb).sum())
    errs = []
    for seed in (1, 7, 42):
        a = CountSketch(depth=5, width=1 << 12, seed=seed)
        b = CountSketch(depth=5, width=1 << 12, seed=seed)
        a.update(ka); b.update(kb)
        errs.append(a.inner_product(b) - true)
    # each within the AMS-style deviation; not systematically one-sided
    bound = 4 * (float(ca @ ca) * float(cb @ cb) / (1 << 12)) ** 0.5
    assert all(abs(e) <= bound for e in errs)

    with pytest.raises(ValueError):
        CountSketch(width=1 << 10).inner_product(CountSketch(width=1 << 11))


def test_f2_pipeline_exact_and_cs_estimate(ray_session):
    """f2_self_join_exact plans agree with DuckDB; the distributed
    CountSketch estimate lands within the AMS bound of it."""
    import duckdb

    from sketch_ray.pipelines.relational import f2_self_join_exact
    from sketch_ray.pipelines.sketch_queries import cs_moments

    sf = "/root/testdata/sf0.001"
    want = duckdb.sql(
        f"""SELECT sum(c*c)::BIGINT FROM (SELECT count(*) AS c
            FROM read_parquet('{sf}/events.parquet') GROUP BY user_id)"""
    ).fetchone()[0]
    a = f2_self_join_exact(sf, force="driver").column("f2")[0].as_py()
    b = f2_self_join_exact(sf, force="shuffle").column("f2")[0].as_py()
    assert a == b == want
    est = cs_moments(sf).to_pandas()
    for _, r in est.iterrows():
        eps = (8 / r["width"]) ** 0.5
        assert abs(r["f2_est"] - want) <= max(eps * want, 0.02 * want)


def test_frequent_directions_bounds_and_merge():
    """FD guarantee on a low-rank+noise matrix: BᵀB never overshoots
    (AᵀA − BᵀB ⪰ 0) and the spectral error is within ‖A‖F²/(ℓ−k) — for
    the one-pass build AND for any partition/merge order. Serialization
    roundtrips; config mismatch rejected."""
    import numpy as np
    import pytest

    from sketch_ray.kernels import sketch_from_bytes
    from sketch_ray.kernels.freqdirs import FrequentDirections

    rng = np.random.default_rng(0)
    d, n, ell, k = 64, 5000, 64, 8
    a = rng.normal(size=(n, k)) @ rng.normal(size=(k, d)) \
        + 0.1 * rng.normal(size=(n, d))
    ata = a.T @ a

    fd = FrequentDirections(d=d, ell=ell)
    fd.update(a)
    err = np.linalg.norm(ata - fd.cov_estimate(), 2)
    assert err <= fd.spectral_error_bound(k)
    assert np.linalg.eigvalsh(ata - fd.cov_estimate()).min() >= -1e-6

    # low-rank data: top singular values nearly exact
    sv_true = np.linalg.svd(a, compute_uv=False)[:k]
    sv_est = fd.singular_values(k)
    assert np.all(np.abs(sv_est - sv_true) / sv_true < 0.01)

    # merge of arbitrary chunking obeys the same bound
    m = FrequentDirections(d=d, ell=ell)
    for chunk in np.array_split(a[rng.permutation(n)], 7):
        p = FrequentDirections(d=d, ell=ell)
        p.update(chunk)
        m.merge(sketch_from_bytes(p.to_bytes()))
    assert np.linalg.norm(ata - m.cov_estimate(), 2) <= m.spectral_error_bound(k)
    assert m.sq_frob == pytest.approx(fd.sq_frob)

    with pytest.raises(AssertionError):
        FrequentDirections(d=d, ell=32).merge(FrequentDirections(d=d, ell=64))
    with pytest.raises(ValueError):
        fd.spectral_error_bound(k=ell)


def test_embedding_spectrum_pipeline(ray_session):
    """Pipeline level: the distributed FD build tracks the exact
    distributed Gram fold on the real embeddings table — top singular
    values within 5% and within the a-priori FD bound."""
    import numpy as np

    from sketch_ray.pipelines.similarity import embedding_spectrum

    out = embedding_spectrum("/root/testdata/sf0.001", ell=128, k=8).to_pandas()
    assert out["rank"].tolist() == list(range(1, 9))
    assert (out["sv_exact"] > 0).all()
    assert (out["rel_err"] < 0.05).all()
    # spectrum is sorted descending on both sides
    assert (np.diff(out["sv_exact"].to_numpy()) <= 1e-9).all()
    assert (np.diff(out["sv_est"].to_numpy()) <= 1e-9).all()


def test_dyadic_cm_range_counts_and_merge():
    """Dyadic CM (C&M 2005 §4.2): range estimates never undercount, stay
    within the 2·bits·ε·N bound, merge is byte-identical and order-free,
    CU never exceeds vanilla, quantiles have bounded rank error."""
    from sketch_ray.kernels.base import sketch_from_bytes
    from sketch_ray.kernels.dyadic import DyadicCM

    rng = np.random.default_rng(7)
    vals = rng.zipf(1.3, size=20_000)
    vals = vals[vals < (1 << 16)].astype(np.int64)
    n = len(vals)
    for seed in (1, 42, 99):
        sk = DyadicCM(bits=16, depth=4, width=2048, seed=seed)
        sk.update(vals)
        assert sk.n_updates == n
        bound = sk.range_error_bound()
        for lo, hi in [(0, 10), (5, 77), (100, 5000), (0, 1 << 16), (3, 4)]:
            true = int(((vals >= lo) & (vals < hi)).sum())
            est = sk.range_count(lo, hi)
            assert est >= true, (lo, hi, est, true)
            assert est - true <= bound, (lo, hi, est - true, bound)
        # quantile: a heavy atom makes rank an interval — the returned x
        # must satisfy count(<x) <= q·n + err and count(<=x) >= q·n − err
        srt = np.sort(vals)
        err = 2 * sk.bits * (np.e / sk.width) * n + 1
        for q in (0.1, 0.5, 0.9):
            x = sk.quantile(q)
            assert np.searchsorted(srt, x, side="left") <= q * n + err
            assert np.searchsorted(srt, x, side="right") >= q * n - err

    # merge: tree vs sequential vs one-shot, byte-identical
    sk_all = DyadicCM(bits=16, seed=42)
    sk_all.update(vals)
    parts = []
    for i in range(4):
        p = DyadicCM(bits=16, seed=42)
        p.update(vals[i::4])
        parts.append(p)
    m1 = parts[0].copy().merge(parts[1]).merge(parts[2]).merge(parts[3])
    m2 = parts[3].copy().merge(parts[2]).merge(parts[1]).merge(parts[0])
    assert m1.to_bytes() == m2.to_bytes() == sk_all.to_bytes()
    rt = sketch_from_bytes(m1.to_bytes())
    assert rt.range_count(5, 77) == m1.range_count(5, 77)

    # CU tightness on one instance; weighted update == repeated update
    cu = DyadicCM(bits=16, seed=42, cu=True)
    cu.update(vals)
    for lo, hi in [(0, 10), (5, 77), (100, 5000)]:
        true = int(((vals >= lo) & (vals < hi)).sum())
        assert true <= cu.range_count(lo, hi) <= sk_all.range_count(lo, hi)
    w = DyadicCM(bits=16, seed=42)
    uv, uc = np.unique(vals, return_counts=True)
    w.update(uv, uc)
    assert w.to_bytes() == sk_all.to_bytes()

    # domain guard
    with np.testing.assert_raises(ValueError):
        DyadicCM(bits=8).update(np.array([256]))


def test_cm_range_counts_pipeline(ray_session):
    from sketch_ray.pipelines.sketch_queries import cm_range_counts

    t = cm_range_counts("/root/testdata/sf0.001").to_pandas()
    assert len(t) == 4
    assert (t["est_n_docs"] >= t["exact_n_docs"]).all()
    n = int(t["exact_n_docs"].sum())
    # full-domain row is exact-total; estimates within the a-priori bound
    assert int(t["exact_n_docs"].iloc[-1] + t["exact_n_docs"].iloc[:-1].sum()) == n
    slack = 2 * 16 * (np.e / 2048) * n + 1
    assert ((t["est_n_docs"] - t["exact_n_docs"]) <= slack).all()


def test_dyadic_cm_range_sql_parity():
    """The full-SQL dyadic-CM rendering (_sqlgen.dyadic_cm_range_sql) is
    bit-identical to the kernel — with a width tiny enough that CM
    collisions are REAL, so the SQL min-over-cells and the unrolled
    quantile descent are exercised on overcounting cells, not on a
    collision-free sketch like the sf gate corpora."""
    import duckdb
    import pandas as pd

    from sketch_ray.kernels.dyadic import DyadicCM
    from sketch_ray.pipelines._sqlgen import dyadic_cm_range_sql

    rng = np.random.default_rng(11)
    vals = rng.zipf(1.4, size=800)
    vals = vals[vals < 256].astype(np.int64)
    bits, width, depth, seed = 8, 16, 3, 5
    ranges = [(0, 4), (3, 57), (10, 200), (2, 256)]
    sk = DyadicCM(bits=bits, depth=depth, width=width, seed=seed)
    sk.update(vals)
    want = pd.DataFrame({
        "lo": np.array([r[0] for r in ranges], np.int64),
        "hi": np.array([r[1] for r in ranges], np.int64),
        "est_n_docs": np.array(
            [sk.range_count(lo, hi) for lo, hi in ranges], np.int64),
        "exact_n_docs": np.array(
            [int(((vals >= lo) & (vals < hi)).sum()) for lo, hi in ranges],
            np.int64),
        "est_q50": np.array([sk.quantile(0.5)] * len(ranges), np.int64),
    }).sort_values("lo").reset_index(drop=True)
    assert (want["est_n_docs"] > want["exact_n_docs"]).any(), \
        "test setup must force collisions"
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    got = con.execute(
        dyadic_cm_range_sql("t", "v", ranges, bits, width, depth, seed)).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=True, check_exact=True)


def test_cbloom_turnstile_guarantees():
    """Counting Bloom: no false negatives, min-counter never undercounts,
    deletes retract exactly, merge is order-independent byte-identical."""
    import numpy as np

    from sketch_ray.kernels import CountingBloom

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 500, size=4000).astype(np.int64)
    is_del = rng.random(4000) < 0.3
    # deletes only retract keys already inserted: insert all, then delete
    # the flagged subset a second time with -1
    net = {}
    for k in keys:
        net[int(k)] = net.get(int(k), 0) + 1
    for k in keys[is_del]:
        net[int(k)] -= 1

    sk = CountingBloom(width=1 << 14, n_hashes=4, seed=42)
    sk.update(keys)
    sk.update(keys[is_del], counts=np.full(int(is_del.sum()), -1, np.int64))

    probe = np.arange(600, dtype=np.int64)
    exact = np.array([net.get(int(u), 0) for u in probe], np.int64)
    member = sk.contains(probe)
    est = sk.estimate_counts(probe)
    assert member[exact > 0].all()          # zero false negatives
    assert (est >= exact).all()             # CM-style upper bound
    assert (est[exact > 0] == exact[exact > 0]).mean() > 0.9
    assert member[exact == 0].mean() < 0.05  # FP rate sane at this load

    # merge: partition the stream arbitrarily (deletes may precede their
    # inserts within a partition) -> byte-identical merged state
    parts = []
    order = rng.permutation(4000)
    for chunk in np.array_split(order, 7):
        p = CountingBloom(width=1 << 14, n_hashes=4, seed=42)
        p.update(keys[chunk])
        dmask = is_del[chunk]
        p.update(keys[chunk][dmask],
                 counts=np.full(int(dmask.sum()), -1, np.int64))
        parts.append(p)
    rng.shuffle(parts)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.to_bytes() == sk.to_bytes() or \
        (merged.counters == sk.counters).all()


def test_cbloom_pipeline_matches_exact_counts(ray_session):
    """The turnstile membership pipeline over events: est_count upper-
    bounds (and at this width equals) each user's non-error event count."""
    import duckdb
    import numpy as np

    from sketch_ray.pipelines.sketch_queries import cbloom_turnstile_membership

    got = cbloom_turnstile_membership(
        "/root/testdata/sf0.001", n_probe=100).to_pandas()
    con = duckdb.connect()
    exact = con.execute("""
        SELECT user_id, count(*) AS n
        FROM read_parquet('/root/testdata/sf0.001/events.parquet')
        WHERE event_type <> 'error' AND user_id < 100
        GROUP BY user_id""").df().set_index("user_id")["n"]
    ex = np.array([int(exact.get(u, 0)) for u in got["user_id"]], np.int64)
    est = got["est_count"].to_numpy(np.int64)
    member = got["member"].to_numpy(bool)
    assert member[ex > 0].all()
    assert (est >= ex).all()
    assert (est == ex).mean() > 0.95


def test_ehist_window_bound_and_ordered_merge():
    """Exponential histogram (DGIM generalization): estimate within
    true/(2k)+1 of the exact trailing-window count for random streams
    split into random time-contiguous chunks; n_total exact; state
    O(k log n); serialization roundtrip; out-of-order merge refused."""
    from sketch_ray.kernels.ehist import ExpHistogram

    rng = np.random.default_rng(11)
    for _ in range(60):
        n = int(rng.integers(1, 4000))
        k = int(rng.choice([4, 8, 16]))
        times = np.sort(rng.integers(0, 50000, n)).astype(np.int64)
        n_chunks = int(rng.integers(1, 6))
        cuts = np.sort(rng.integers(0, n, n_chunks - 1)) \
            if n_chunks > 1 else []
        merged = None
        for ch in np.split(times, cuts):
            e = ExpHistogram(k=k)
            e.update(ch)
            merged = e if merged is None else merged.merge(e)
        assert merged.n_total == n
        assert len(merged.cnt) <= 4 * k * (np.log2(max(n, 2)) + 2)
        t_now = int(times.max())
        for w in (1, 100, 10000, 100000):
            est = merged.estimate(t_now, w)
            true = int((times >= t_now - w + 1).sum())
            assert abs(est - true) <= true / (2 * k) + 1, (est, true, k, w)
        rt = ExpHistogram.from_bytes(merged.to_bytes())
        assert np.array_equal(rt.ts, merged.ts)
        assert np.array_equal(rt.cnt, merged.cnt)

    a, b = ExpHistogram(k=8), ExpHistogram(k=8)
    a.update(np.array([100, 200], np.int64))
    b.update(np.array([10, 20], np.int64))
    with pytest.raises(ValueError):
        a.merge(b)  # b precedes a: time-contiguity contract


def test_window_count_estimates_vs_exact(ray_session):
    """Pipeline: per-type trailing-7d EH estimates within the kernel bound
    of the exact DuckDB window counts; n_events exact per type."""
    import duckdb

    from sketch_ray.pipelines.sketch_queries import window_count_estimates

    sf = "/root/testdata/sf0.01"
    k = 32
    got = window_count_estimates(sf, window_days=7, k=k).to_pandas()
    con = duckdb.connect()
    exact = con.execute(f"""
        WITH g AS (SELECT max(ts) AS tmax
                   FROM read_parquet('{sf}/events.parquet'))
        SELECT event_type, count(*) AS n,
               sum(CASE WHEN ts >= g.tmax - INTERVAL 7 DAY
                        THEN 1 ELSE 0 END) AS w
        FROM read_parquet('{sf}/events.parquet') CROSS JOIN g
        GROUP BY event_type ORDER BY event_type""").df()
    assert list(got["event_type"]) == list(exact["event_type"])
    assert (got["n_events"].to_numpy() == exact["n"].to_numpy()).all()
    true = exact["w"].to_numpy(np.int64)
    est = got["est_window"].to_numpy(np.int64)
    assert (np.abs(est - true) <= true / (2 * k) + 1).all(), (est, true)


def test_ehsum_window_bound_and_pipeline(ray_session):
    """Weighted EH: |est - true| <= true/(2k) + a_max/2 + 1 on random
    value streams under random contiguous splits; pipeline totals exact
    and window estimates within the bound vs DuckDB."""
    import duckdb

    from sketch_ray.kernels.ehist import ExpHistogramSum
    from sketch_ray.pipelines.sketch_queries import window_value_sums

    rng = np.random.default_rng(13)
    for _ in range(40):
        n = int(rng.integers(1, 2500))
        k = int(rng.choice([8, 16, 32]))
        times = np.sort(rng.integers(0, 40000, n)).astype(np.int64)
        vals = rng.integers(0, 500, n).astype(np.int64)
        cuts = (np.sort(rng.integers(0, n, int(rng.integers(0, 5))))
                if n > 1 else [])
        merged = None
        for tc, vc in zip(np.split(times, cuts), np.split(vals, cuts)):
            e = ExpHistogramSum(k=k)
            e.update(tc, vc)
            merged = e if merged is None else merged.merge(e)
        assert merged.v_total == int(vals.sum())
        t_now = int(times.max())
        amax = int(vals.max()) if n else 0
        for w in (1, 1000, 100000):
            est = merged.estimate(t_now, w)
            true = int(vals[times >= t_now - w + 1].sum())
            assert abs(est - true) <= true / (2 * k) + amax / 2 + 1

    sf = "/root/testdata/sf0.01"
    k = 32
    got = window_value_sums(sf, window_days=7, k=k).to_pandas()
    con = duckdb.connect()
    exact = con.execute(f"""
        WITH g AS (SELECT max(ts) AS tmax
                   FROM read_parquet('{sf}/events.parquet'))
        SELECT event_type,
               sum(CAST(round(value * 100) AS BIGINT)) AS tot,
               sum(CASE WHEN ts >= g.tmax - INTERVAL 7 DAY
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS w,
               max(CASE WHEN ts >= g.tmax - INTERVAL 8 DAY
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS amax
        FROM read_parquet('{sf}/events.parquet') CROSS JOIN g
        GROUP BY event_type ORDER BY event_type""").df()
    assert list(got["event_type"]) == list(exact["event_type"])
    assert (got["total_cents"].to_numpy(np.int64)
            == exact["tot"].to_numpy(np.int64)).all()
    true = exact["w"].to_numpy(np.int64)
    est = got["est_window_cents"].to_numpy(np.int64)
    amax = exact["amax"].to_numpy(np.int64)
    assert (np.abs(est - true) <= true / (2 * k) + amax / 2 + 1).all()


def test_cs_join_size_two_sided_bound(ray_session):
    """Count-sketch bilinear join-size estimate: two-sided error within
    ~4·sqrt(F2(a)·F2(b)/width) of the exact join size (AMS variance bound
    with a generous constant for the median-of-5 rows)."""
    import math

    import duckdb

    from sketch_ray.pipelines.sketch_queries import cs_join_size

    sf = "/root/testdata/sf0.001"
    want = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{sf}/events.parquet') e
            JOIN read_parquet('{sf}/orders.parquet') o
            ON e.user_id = o.o_custkey"""
    ).fetchone()[0]
    f2a = duckdb.sql(
        f"""SELECT sum(c*c) FROM (SELECT count(*) AS c FROM
            read_parquet('{sf}/events.parquet') GROUP BY user_id)"""
    ).fetchone()[0]
    f2b = duckdb.sql(
        f"""SELECT sum(c*c) FROM (SELECT count(*) AS c FROM
            read_parquet('{sf}/orders.parquet') GROUP BY o_custkey)"""
    ).fetchone()[0]
    est = cs_join_size(sf).to_pandas()
    assert list(est.columns) == ["width", "est_pairs"]
    for _, r in est.iterrows():
        tol = 4.0 * math.sqrt(float(f2a) * float(f2b) / r["width"])
        assert abs(r["est_pairs"] - want) <= tol, (r["est_pairs"], want, tol)


def test_linear_counter_error_merge_and_saturation():
    """LinearCounter: estimate within 5 std errors of truth across fill
    ratios, merge == single-pass byte-identically, saturation returns the
    documented m·ln(m) boundary."""
    import math

    from sketch_ray.kernels.lincount import LinearCounter

    m = 1 << 12
    for n in (50, 500, 4000, 12000):
        keys = [f"k{i}" for i in range(n)]
        lc = LinearCounter(n_bits=m, seed=1)
        lc.update(keys)
        t = n / m
        se = math.sqrt(m) * math.sqrt(max(math.exp(t) - t - 1, 1e-12)) / t / m
        assert abs(lc.estimate() - n) <= 5 * se * n + 3, (n, lc.estimate())
    # merge associativity/idempotence: any partition -> same bytes
    keys = [f"u{i}" for i in range(3000)]
    whole = LinearCounter(n_bits=m, seed=1)
    whole.update(keys)
    parts = [LinearCounter(n_bits=m, seed=1) for _ in range(3)]
    for i, kk in enumerate(keys):
        parts[i % 3].update([kk])
    merged = parts[0].merge(parts[1]).merge(parts[2]).merge(parts[1])
    assert bytes(merged.bits) == bytes(whole.bits)
    # saturation
    full = LinearCounter(n_bits=64, seed=1)
    full.update([f"x{i}" for i in range(5000)])
    assert full.estimate() == pytest.approx(64 * math.log(64), rel=1e-12)


def test_lincount_query_tracks_truth(ray_session):
    import duckdb

    from sketch_ray.pipelines.sketch_queries import lincount_cardinalities

    sf = "/root/testdata/sf0.001"
    out = lincount_cardinalities(sf).to_pandas().set_index("column")
    truth = {
        "documents.source": duckdb.sql(
            f"SELECT count(DISTINCT source) FROM read_parquet('{sf}/documents.parquet')").fetchone()[0],
        "events.user_id": duckdb.sql(
            f"SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')").fetchone()[0],
        "events.event_type": duckdb.sql(
            f"SELECT count(DISTINCT event_type) FROM read_parquet('{sf}/events.parquet')").fetchone()[0],
    }
    for col, n in truth.items():
        est = out.loc[col, "est"]
        assert abs(est - n) <= max(0.05 * n, 3), (col, est, n)


def test_ddsketch_relative_error_bound():
    """DDSketch (Masson et al. 2019): every quantile estimate within
    alpha relative error of the exact inverted-CDF quantile, across a
    heavy-tailed mix of positives, negatives, and zeros. Exact side uses
    method="lower" = sorted[floor(q*(n-1))], the kernel's (and the paper's)
    rank convention — inverted_cdf picks ceil(q*n)-1, a different ITEM in a
    heavy tail."""
    import numpy as np

    from sketch_ray.kernels import DDSketch

    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.lognormal(3, 2, 40000),
                           -rng.lognormal(1, 1.5, 8000),
                           np.zeros(200)])
    for alpha in (0.01, 0.05):
        sk = DDSketch(alpha=alpha)
        sk.update(vals)
        qs = np.array([0.001, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999])
        est = np.asarray(sk.quantile(qs))
        exact = np.quantile(vals, qs, method="lower")
        assert (np.abs(est - exact) <= alpha * np.abs(exact) + 1e-12).all(), \
            (alpha, est, exact)
    assert sk.n == len(vals)


def test_ddsketch_merge_byte_identical_any_order():
    """Linear over bucket space: merged state is byte-identical under any
    partition ordering AND equals the single-pass build — the property
    that admits dd into incremental artifacts (pipelines/continuous.py)."""
    import numpy as np

    from sketch_ray.kernels import DDSketch, sketch_from_bytes

    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.lognormal(2, 1.5, 20000), -rng.exponential(5, 3000)])
    chunks = np.array_split(rng.permutation(vals), 6)
    parts = []
    for c in chunks:
        p = DDSketch(alpha=0.02)
        p.update(c)
        parts.append(p)
    ref = None
    for perm in ([0, 1, 2, 3, 4, 5], [5, 3, 1, 0, 4, 2], [2, 4, 0, 5, 1, 3]):
        acc = sketch_from_bytes(parts[perm[0]].to_bytes())
        for i in perm[1:]:
            acc.merge(sketch_from_bytes(parts[i].to_bytes()))
        if ref is None:
            ref = acc.to_bytes()
        assert acc.to_bytes() == ref
    whole = DDSketch(alpha=0.02)
    whole.update(vals)
    assert whole.to_bytes() == ref
    # serialization roundtrip preserves bytes
    assert sketch_from_bytes(ref).to_bytes() == ref


def test_ddsketch_weighted_update_and_insert_only():
    import numpy as np
    import pytest

    from sketch_ray.kernels import DDSketch

    a = DDSketch()
    a.update(np.array([2.0, 3.0, 2.0, 2.0, -1.5]))
    b = DDSketch()
    b.update(np.array([2.0, 3.0, -1.5]), np.array([3, 1, 1]))
    assert a.to_bytes() == b.to_bytes()
    with pytest.raises(ValueError):
        b.update(np.array([1.0]), np.array([-1]))


def test_ddsketch_collapse_preserves_counts_and_upper_quantiles():
    """Forced collapse (tiny max_bins): total count is exact, and the alpha
    guarantee still holds for every quantile whose rank lands ABOVE the
    collapsed accumulator bucket — the paper's eviction contract."""
    import numpy as np

    from sketch_ray.kernels import DDSketch

    rng = np.random.default_rng(5)
    vals = rng.lognormal(0, 3, 30000)
    alpha, bins = 0.02, 64
    sk = DDSketch(alpha=alpha, max_bins=bins)
    sk.update(vals)
    assert sk.n == len(vals)
    assert sk.n_bins() <= bins + 1  # + the (empty here) zero bucket
    # ranks strictly above the accumulator bucket keep the guarantee
    collapsed_mass = int(sk.pos_cnt[0])
    q_min = (collapsed_mass + 1) / (sk.n - 1)
    for q in (0.9, 0.99, 0.999):
        if q <= q_min:
            continue
        est = sk.quantile(q)
        exact = np.quantile(vals, q, method="lower")
        assert abs(est - exact) <= alpha * exact + 1e-12, (q, est, exact)


def test_ddsketch_query_tracks_truth(ray_session):
    """ddsketch_quantiles over the real corpus: every reported quantile
    within alpha relative error of DuckDB's exact quantile_disc."""
    import duckdb

    from sketch_ray.pipelines.sketch_queries import ddsketch_quantiles

    sf = "/root/testdata/sf0.001"
    out = ddsketch_quantiles(sf).to_pandas()
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/events.parquet')").fetchone()[0]
    assert (out["n"] == n).all()
    for _, row in out.iterrows():
        exact = duckdb.sql(
            f"SELECT quantile_disc(value, {row['q']}) "
            f"FROM read_parquet('{sf}/events.parquet')").fetchone()[0]
        # 6dp output rounding adds (at most) 5e-7 on top of the alpha band
        assert abs(row["value"] - exact) <= 0.01 * abs(exact) + 1e-6, \
            (row["q"], row["value"], exact)


class TestPrioritySample:
    """Priority sampling (Duffield-Lund-Thorup): mergeable weighted sample
    with unbiased subset sums and hash-deterministic byte-identical merge."""

    def _stream(self, n=2000, seed=0):
        rng = np.random.default_rng(seed)
        keys = np.arange(n, dtype=np.int64)
        w = rng.integers(1, 1000, n).astype(np.int64)
        return keys, w

    def test_exact_below_capacity(self):
        from sketch_ray.kernels import PrioritySample

        keys, w = self._stream(500)
        sk = PrioritySample(k=512, seed=1)
        sk.update(keys, w)
        assert sk.tau() == 0.0
        assert abs(sk.estimate() - int(w.sum())) < 1e-9
        _, sw, est = sk.sample()
        assert (est == sw).all()

    def test_unbiased_total_and_subset(self):
        from sketch_ray.kernels import PrioritySample

        keys, w = self._stream()
        W = int(w.sum())
        sub = keys % 3 == 0
        Ws = int(w[sub].sum())
        tot, ss = [], []
        for s in range(60):
            sk = PrioritySample(k=64, seed=s)
            sk.update(keys, w)
            ks, _, _ = sk.sample()
            member = np.array([int(x) % 3 == 0 for x in ks])
            tot.append(sk.estimate())
            ss.append(sk.subset_sum(member))
        # se of the mean over 60 runs ≈ W/sqrt(60·(k−1)) — 5σ bounds
        assert abs(np.mean(tot) - W) < 5 * W / np.sqrt(60 * 63)
        assert abs(np.mean(ss) - Ws) < 5 * W / np.sqrt(60 * 63)

    def test_merge_byte_identical_any_split_any_order(self):
        from sketch_ray.kernels import PrioritySample

        keys, w = self._stream()
        one = PrioritySample(k=64, seed=7)
        one.update(keys, w)
        rng = np.random.default_rng(3)
        for _ in range(5):
            perm = rng.permutation(len(keys))
            cuts = np.sort(rng.choice(np.arange(1, len(keys)), 5,
                                      replace=False))
            acc = PrioritySample(k=64, seed=7)
            for part in rng.permutation(len(cuts) + 1):
                idx = np.split(perm, cuts)[part]
                p = PrioritySample(k=64, seed=7)
                p.update(keys[idx], w[idx])
                acc.merge(p)
            assert acc.to_bytes() == one.to_bytes()

    def test_estimated_weights_dominate_and_partition(self):
        from sketch_ray.kernels import PrioritySample

        keys, w = self._stream()
        sk = PrioritySample(k=64, seed=11)
        sk.update(keys, w)
        ks, sw, est = sk.sample()
        assert (est >= sw).all() and sk.tau() > 0
        grp = np.array([int(x) % 4 for x in ks])
        parts = sum(sk.subset_sum(grp == g) for g in range(4))
        assert abs(parts - sk.estimate()) < 1e-6

    def test_roundtrip_and_config_guard(self):
        from sketch_ray.kernels import PrioritySample, sketch_from_bytes

        keys, w = self._stream(100)
        sk = PrioritySample(k=16, seed=5)
        sk.update(keys, w)
        rt = sketch_from_bytes(sk.to_bytes())
        assert rt == sk
        other = PrioritySample(k=16, seed=6)
        with pytest.raises(AssertionError):
            sk.merge(other)
        with pytest.raises(ValueError):
            PrioritySample(k=0)
        with pytest.raises(ValueError):
            bad = PrioritySample(k=4)
            bad.update(keys[:3], np.array([1, -2, 3]))

    def test_pipeline_exact_when_unsaturated_and_bounded(self, ray_session):
        import pandas as pd

        from sketch_ray.pipelines.sketch_queries import priority_sample_revenue

        sf = "/root/testdata/sf0.001"
        got = priority_sample_revenue(sf, k=10 ** 6).to_pandas()
        orders = pd.read_parquet(f"{sf}/orders.parquet")
        cust = pd.read_parquet(f"{sf}/customer.parquet")
        nat = pd.read_parquet(f"{sf}/nation.parquet")
        j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey") \
            .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        j["cents"] = (j["o_totalprice"] * 100).round().astype("int64")
        want = (j.groupby("n_name")["cents"].sum() / 100.0).round(2)
        m = dict(zip(got["nation"], got["est_revenue"]))
        assert set(m) == set(want.index)
        for nm, v in want.items():
            assert abs(m[nm] - v) < 0.011
        # saturated: total within 5·W/sqrt(k−1) (priority-sampling variance
        # bound), deterministic across reruns
        est = priority_sample_revenue(sf, k=256).to_pandas()
        est2 = priority_sample_revenue(sf, k=256).to_pandas()
        pd.testing.assert_frame_equal(est, est2)
        W = float(want.sum())
        assert abs(float(est["est_revenue"].sum()) - W) \
            < 5 * W / np.sqrt(255)
        assert int(est["n_sampled"].sum()) == 256


def test_decayed_cmcu_never_undercounts(ray_session):
    """Time-decayed CM-CU: weighted CU over integer forward-decay weights
    never undercounts the exact decayed score (twin: decayed_heavy_users),
    and at a narrow width still upper-bounds it."""
    from sketch_ray.pipelines.sketch_queries import decayed_cmcu_user_estimates

    sf = "/root/testdata/sf0.001"
    out = decayed_cmcu_user_estimates(sf).to_pandas()
    assert len(out) > 0
    assert (out["est_decayed"] >= out["decayed_score"] - 1e-9).all()
    narrow = decayed_cmcu_user_estimates(sf, width=1 << 6).to_pandas()
    assert (narrow["est_decayed"] >= narrow["decayed_score"] - 1e-9).all()
