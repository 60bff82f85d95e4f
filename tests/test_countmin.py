"""Property tests for CM / CM-CU (SURVEY.md §5 target test strategy).

Mirrors the reference's verified behaviors: no-undercount, CU tightness vs
vanilla CM, eps-delta bound, determinism, and (beyond the reference) merge
associativity/commutativity byte-identity for sum-merged partials.
"""

import numpy as np
import pytest

from sketch_ray.kernels import CountMin, CountMinCU, sketch_from_bytes


def zipf_stream(n=20000, vocab=2000, s=1.2, seed=7):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(s, size=n)
    ranks = ranks[ranks <= vocab]
    return np.array([f"tok{r:06d}" for r in ranks])


@pytest.fixture(scope="module")
def stream():
    return zipf_stream()


@pytest.fixture(scope="module")
def exact(stream):
    keys, counts = np.unique(stream, return_counts=True)
    return dict(zip(keys.tolist(), counts.tolist()))


@pytest.mark.parametrize("cls", [CountMin, CountMinCU])
def test_no_undercount(cls, stream, exact):
    sk = cls(depth=4, width=1024, seed=42)
    # feed in batches to exercise batched/weighted update
    for chunk in np.array_split(stream, 13):
        sk.update(chunk)
    keys = list(exact)
    est = sk.query(keys)
    true = np.array([exact[k] for k in keys])
    assert (est >= true).all(), "sketch undercounted"


def test_cu_tighter_than_cm(stream, exact):
    cm = CountMin(depth=4, width=512, seed=42)
    cu = CountMinCU(depth=4, width=512, seed=42)
    for chunk in np.array_split(stream, 17):
        cm.update(chunk)
        cu.update(chunk)
    keys = list(exact)
    est_cm = cm.query(keys)
    est_cu = cu.query(keys)
    true = np.array([exact[k] for k in keys])
    assert (est_cu <= est_cm).all(), "CU estimate exceeded vanilla CM"
    assert (est_cu >= true).all()
    # CU must be strictly tighter somewhere on a congested sketch
    assert est_cu.sum() < est_cm.sum()


def test_eps_delta_bound(stream, exact):
    """Per-key guarantee: P[est(k) - true(k) > (e/width)·N] <= e^-depth.
    Measured as the (key, seed)-pair violation rate over 20 seeds."""
    keys = list(exact)
    true = np.array([exact[k] for k in keys])
    n = len(stream)
    width, depth = 256, 4
    eps_n = np.e / width * n
    violations = 0
    trials = 0
    n_seeds = 20
    for seed in range(n_seeds):
        sk = CountMin(depth=depth, width=width, seed=seed)
        sk.update(stream)
        est = sk.query(keys)
        violations += int(((est - true) > eps_n).sum())
        trials += len(keys)
    delta = np.exp(-depth)  # ~0.018
    assert violations / trials <= 2 * delta, f"violation rate {violations/trials}"


def test_weighted_equals_sequential_cu():
    """Weighted CU (key, c) == c consecutive scalar CU increments of that key
    (SURVEY.md §7.0 weighted-update equivalence; holds per key group)."""
    c = CountMinCU(depth=4, width=64, seed=1)
    d = CountMinCU(depth=4, width=64, seed=1)
    for _ in range(37):
        c.update(["hot"])
    d.update(["hot"], [37])
    assert c == d
    # and a batched update never exceeds the sequential one (within-batch
    # keys see the pre-batch state, so batched <= sequential pointwise)
    rng = np.random.default_rng(3)
    keys = np.array([f"k{i}" for i in rng.integers(0, 50, size=500)])
    seq = CountMinCU(depth=4, width=64, seed=1)
    for k in keys:
        seq.update([k])
    batched = CountMinCU(depth=4, width=64, seed=1)
    batched.update(keys)
    uniq = np.unique(keys)
    assert (batched.query(uniq) <= seq.query(uniq)).all()


def test_merge_associative_commutative(stream):
    parts = np.array_split(stream, 8)
    rng = np.random.default_rng(0)

    def build(order, tree_fold):
        sks = []
        for i in order:
            sk = CountMinCU(depth=4, width=1024, seed=42)
            sk.update(parts[i])
            sks.append(sk)
        return tree_fold(sks)

    def fold_left(sks):
        acc = sks[0]
        for s in sks[1:]:
            acc.merge(s)
        return acc

    def fold_pairwise(sks):
        while len(sks) > 1:
            nxt = []
            for i in range(0, len(sks) - 1, 2):
                nxt.append(sks[i].merge(sks[i + 1]))
            if len(sks) % 2:
                nxt.append(sks[-1])
            sks = nxt
        return sks[0]

    ref = build(range(8), fold_left)
    for _ in range(4):
        order = rng.permutation(8)
        other = build(order, fold_pairwise if rng.integers(2) else fold_left)
        assert ref == other
        assert ref.to_bytes() == other.to_bytes(), "merged bytes differ across orderings"


def test_merged_cu_no_undercount(stream, exact):
    parts = np.array_split(stream, 8)
    acc = CountMinCU(depth=4, width=1024, seed=42)
    for p in parts:
        part_sk = CountMinCU(depth=4, width=1024, seed=42)
        part_sk.update(p)
        acc.merge(part_sk)
    keys = list(exact)
    true = np.array([exact[k] for k in keys])
    assert (acc.query(keys) >= true).all()


def test_serialization_roundtrip(stream):
    sk = CountMinCU(depth=4, width=256, seed=5)
    sk.update(stream[:1000])
    raw = sk.to_bytes()
    back = sketch_from_bytes(raw)
    assert back == sk
    assert back.to_bytes() == raw
    assert (back.query(["tok000001"]) == sk.query(["tok000001"])).all()


def test_determinism_across_instances(stream):
    a = CountMinCU(depth=4, width=256, seed=9)
    b = CountMinCU(depth=4, width=256, seed=9)
    a.update(stream)
    b.update(stream)
    assert a.to_bytes() == b.to_bytes()
