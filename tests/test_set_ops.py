"""Theta-sketch set algebra: kernel exactness/error bounds, the exact
membership pipeline's plan invariance vs DuckDB, and the sketch-vs-exact
pairing (SURVEY.md §5 strategy: estimates validated against exact scans)."""

import duckdb
import numpy as np
import pytest

from sketch_ray.kernels.bottomk import BottomK, theta_set_ops

SF = "/root/testdata/sf0.001"


def test_theta_set_ops_exact_when_unsaturated():
    a, b = BottomK(k=4096, seed=9), BottomK(k=4096, seed=9)
    a.update([f"k{i}" for i in range(300)])
    b.update([f"k{i}" for i in range(200, 500)])
    r = theta_set_ops(a, b)
    assert r["theta"] == 1.0
    assert r["est_a"] == 300 and r["est_b"] == 300
    assert r["est_union"] == 500 and r["est_intersect"] == 100
    assert r["est_only_a"] == 200 and r["est_only_b"] == 200
    assert r["jaccard"] == pytest.approx(0.2)

    with pytest.raises(ValueError):
        theta_set_ops(a, BottomK(k=4096, seed=10))


def test_theta_set_ops_saturated_error_and_merge_invariance():
    """Saturated case: ~1/sqrt(k) error on every set estimate; and the
    result is identical whether each side was built in one pass or merged
    from shuffled partials (the distributed-build contract)."""
    keys_a = [f"x{i}" for i in range(40000)]          # |A|=40k
    keys_b = [f"x{i}" for i in range(30000, 60000)]   # |B|=30k, overlap 10k
    a, b = BottomK(k=2048, seed=7), BottomK(k=2048, seed=7)
    a.update(keys_a)
    b.update(keys_b)
    r = theta_set_ops(a, b)
    assert 0 < r["theta"] < 1
    for key, truth in [("est_a", 40000), ("est_b", 30000),
                       ("est_union", 60000), ("est_intersect", 10000),
                       ("est_only_a", 30000), ("est_only_b", 20000)]:
        assert abs(r[key] - truth) / truth < 0.10, (key, r[key])
    assert abs(r["jaccard"] - 10000 / 60000) < 0.03

    # partition-order invariance: merge of arbitrary chunked partials
    rng = np.random.default_rng(0)
    order = rng.permutation(len(keys_a))
    a2 = BottomK(k=2048, seed=7)
    for lo in range(0, len(order), 7000):
        part = BottomK(k=2048, seed=7)
        part.update([keys_a[i] for i in order[lo:lo + 7000]])
        a2.merge(part)
    assert theta_set_ops(a2, b) == r


def test_set_op_cardinalities_plans_and_oracle(ray_session):
    """Both adaptive plans (driver fold / tagged shuffle) produce the same
    row, and that row matches DuckDB's exact distinct-set algebra."""
    from sketch_ray.pipelines.relational import set_op_cardinalities

    want = duckdb.sql(
        f"""WITH a AS (SELECT DISTINCT user_id AS k
                       FROM read_parquet('{SF}/events.parquet')),
                 b AS (SELECT DISTINCT o_custkey AS k
                       FROM read_parquet('{SF}/orders.parquet'))
            SELECT (SELECT count(*) FROM a),
                   (SELECT count(*) FROM b),
                   (SELECT count(*) FROM a JOIN b USING (k))"""
    ).fetchone()
    n_a, n_b, n_inter = want

    drv = set_op_cardinalities(SF, force="driver").to_pydict()
    shf = set_op_cardinalities(SF, force="shuffle").to_pydict()
    assert drv == shf
    assert drv["n_a"] == [n_a] and drv["n_b"] == [n_b]
    assert drv["n_intersect"] == [n_inter]
    assert drv["n_union"] == [n_a + n_b - n_inter]
    assert drv["n_only_a"] == [n_a - n_inter]
    assert drv["n_only_b"] == [n_b - n_inter]


def test_kmv_set_ops_pipeline_exact_at_small_scale(ray_session):
    """At sf0.001 both sides have < k distinct keys, so theta = 1 and the
    sketch answers are EXACT — equality, not a tolerance, against the
    exact pipeline."""
    from sketch_ray.pipelines.relational import set_op_cardinalities
    from sketch_ray.pipelines.sketch_queries import kmv_set_ops

    exact = set_op_cardinalities(SF).to_pydict()
    est = kmv_set_ops(SF).to_pydict()
    assert est["theta"] == [1.0]
    assert est["est_a"] == [float(exact["n_a"][0])]
    assert est["est_b"] == [float(exact["n_b"][0])]
    assert est["est_union"] == [float(exact["n_union"][0])]
    assert est["est_intersect"] == [float(exact["n_intersect"][0])]
    assert est["est_only_a"] == [float(exact["n_only_a"][0])]
    assert est["est_only_b"] == [float(exact["n_only_b"][0])]
    assert est["jaccard"][0] == pytest.approx(exact["jaccard"][0], abs=1e-6)


def test_hll_set_ops_tracks_exact(ray_session):
    """Inclusion-exclusion HLL set estimates stay within the published
    ~1.04/sqrt(2^p) union error of the exact distinct-set algebra (the
    intersection inherits union-scaled error — documented limitation)."""
    from sketch_ray.pipelines.relational import set_op_cardinalities
    from sketch_ray.pipelines.sketch_queries import hll_set_ops

    exact = set_op_cardinalities(SF).to_pydict()
    est = hll_set_ops(SF).to_pydict()
    tol = 5 * 1.04 / (2 ** 14) ** 0.5  # 5 sigma at p=14
    for k_est, k_ex in [("est_a", "n_a"), ("est_b", "n_b"),
                        ("est_union", "n_union")]:
        truth = exact[k_ex][0]
        assert abs(est[k_est][0] - truth) <= max(2.0, tol * truth), (k_est, est[k_est], truth)
    # intersection error is union-scaled
    assert abs(est["est_intersect"][0] - exact["n_intersect"][0]) \
        <= max(4.0, 2 * tol * exact["n_union"][0])


def test_windowed_hll_users_accuracy(ray_session):
    """Per-day HLL states unioned per trailing window track the exact
    rolling distinct within 5 sigma of the published 1.04/sqrt(2^p)."""
    import numpy as np

    from sketch_ray.pipelines.sketch_queries import windowed_hll_users

    t = windowed_hll_users("/root/testdata/sf0.001", p=12).to_pandas()
    assert len(t) > 0
    rel = (np.abs(t["est_users"] - t["exact_users"])
           / np.maximum(t["exact_users"], 1))
    assert (rel <= 5 * 1.04 / np.sqrt(2 ** 12)).all()


def test_windowed_value_quantiles_accuracy(ray_session):
    """Per-day t-digest states merged per trailing window: each estimate's
    true rank in the exact window multiset is within a generous digest
    rank tolerance, and the windowed p50 <= p95 <= p99 monotonically."""
    import duckdb
    import numpy as np

    from sketch_ray.pipelines.sketch_queries import windowed_value_quantiles

    sf = "/root/testdata/sf0.001"
    t = windowed_value_quantiles(sf).to_pandas()
    assert len(t) > 0
    piv = t.pivot_table(index="day", columns="q", values="est_value")
    assert (piv[0.5] <= piv[0.95]).all() and (piv[0.95] <= piv[0.99]).all()

    ex = duckdb.sql(f"""
        WITH dv AS (SELECT date_trunc('day', ts) AS day, value
                    FROM read_parquet('{sf}/events.parquet')),
             days AS (SELECT DISTINCT day FROM dv)
        SELECT d.day AS day, v.value
        FROM days d JOIN dv v
          ON v.day <= d.day AND v.day >= d.day - INTERVAL 6 DAY""").df()
    for day, grp in ex.groupby("day"):
        vals = np.sort(grp["value"].to_numpy())
        n = len(vals)
        sub = t[t["day"] == day]
        for _, row in sub.iterrows():
            r = np.searchsorted(vals, row["est_value"], side="right")
            assert abs(r - row["q"] * n) <= max(0.12 * n, 3), \
                (day, row["q"], r, n)


def test_lang_overlap_estimates_vs_exact(ray_session):
    """Grouped theta set ops: unsaturated k ⇒ exact equality with the
    oracle-gated lang_token_overlap; saturated k stays within the
    ~1/sqrt(k) theta envelope on jaccard."""
    import numpy as np
    import pandas as pd

    from sketch_ray.pipelines.analytics import lang_token_overlap
    from sketch_ray.pipelines.sketch_queries import lang_overlap_estimates

    sf = "/root/testdata/sf0.001"
    ex = lang_token_overlap(sf).to_pandas()
    big = lang_overlap_estimates(sf, k=1_000_000).to_pandas()
    m = big.merge(ex, on=["lang_a", "lang_b"])
    assert len(m) == len(ex) == len(big)
    assert np.allclose(m["est_common"], m["n_common"])
    assert np.allclose(m["est_union"], m["n_union"])
    assert np.allclose(m["est_jaccard"], m["jaccard"], atol=1e-6)

    small = lang_overlap_estimates(sf, k=256).to_pandas()
    ms = small.merge(ex, on=["lang_a", "lang_b"])
    assert (np.abs(ms["est_jaccard"] - ms["jaccard"])
            <= 5.0 / np.sqrt(256) + 1e-9).all()
    # deterministic across reruns
    again = lang_overlap_estimates(sf, k=256).to_pandas()
    pd.testing.assert_frame_equal(small, again)
