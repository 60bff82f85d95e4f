"""Multi-length DNA k-mer emerging-heavy-hitter pipeline — the reference's
actual workload (src/sketch.cpp:48-289), re-expressed Ray-Data-first and
EXACT in its final output.

Semantics parity with the reference CLI ``sketch test control min max th...``:

- windows of every length L in [min_len, max_len] at every byte offset,
  resetting at non-ACGT bytes and line boundaries (src/sketch.cpp:103-171);
- per-length threshold: candidate iff count >= threshold[L]
  (baseline ``>=`` semantics, src/sketch.cpp:160-162);
- emerging: floor(test_cnt / growth) − control_cnt > 0 (scale
  src/sketch.cpp:179-183, probe src/sketch.cpp:222-227, prune
  src/sketch.cpp:238-245); reported frequency is the raw test count
  (snapshot before scaling, src/sketch.cpp:176).

Physical plan: pass 1 streams batches through a per-length *incremental*
rolling hash (the reference's M7 hash-extension trick, sketch_pipelined.cu:
51-76, vectorized: hash_{L+1} = hash_L · B + code) into one CM-CU sketch
(hashes salted by L); pass 2 re-streams, queries the broadcast sketch, and
materializes ONLY threshold-crossing windows as strings — so k-mer strings
exist just for candidates, never for the corpus (the reference's
candidate-map discipline). A tiny groupby over candidate hashes gives exact
counts; control occurrences come from a broadcast candidate-hash probe.
Cross-implementation conformance vs the compiled reference binary is tested
in tests/test_kmers.py (the reference's own test strategy, SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..kernels import CountMinCU, sketch_from_bytes
from ..kernels.hashing import splitmix64

_U64 = np.uint64
_BASE = _U64(0x100000001B3)

# Per-worker broadcast cache for the deserialized sketch: the pass-2 /
# probe stages are STATELESS tasks (no actor-pool spin-up), but each worker
# deserializes the sketch only once — the same stages/broadcast.cached LRU
# the other pipelines use (ADVICE r2: one cache discipline, not two).


def _cached_sketch(ref):
    from ..stages.broadcast import cached

    return cached(ref, build=sketch_from_bytes)

# byte -> 2-bit code; 255 = invalid (window terminator), matching the
# reference's symbol encoder semantics (src/sketch.cpp:113-129)
_CODE = np.full(256, 255, dtype=np.uint8)
for _b, _c in zip(b"ACTG", range(4)):  # reference order A=0 C=1 T=2 G=3
    _CODE[_b] = _c


def _seq_bytes(batch: pa.Table, col: str = "seq"):
    """batch -> (bytes uint8[n], row_index int64[n] per byte)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buffers = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(buffers[1], dtype=off_dtype, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    data = data[offsets[0]: offsets[-1]]
    row_index = np.repeat(np.arange(len(arr), dtype=np.int64), np.diff(offsets))
    return data, row_index


def _window_hashes(data: np.ndarray, row_index: np.ndarray, lengths: range):
    """Incremental multi-length window hashing.

    Yields (L, start_positions int64[mL], hashes uint64[mL]) for each L,
    where start positions index into ``data`` and every window is valid
    (all ACGT, single row). hash_{L+1} extends hash_L — one multiply-add
    per extra symbol, the vectorized analog of the reference's
    per-symbol hash extension (src/sketch.cpp:136-138)."""
    n = len(data)
    codes = _CODE[data]
    valid = codes != 255
    inv_cum = np.concatenate([[0], np.cumsum(~valid)])
    acc = None
    for L in lengths:
        m = n - L + 1
        if m <= 0:
            return
        if acc is None:
            acc = np.zeros(m, dtype=_U64)
            for j in range(L):
                acc = acc * _BASE + codes[j: j + m]
        else:
            acc = acc[:m] * _BASE + codes[L - 1: L - 1 + m]
        ok = (
            (inv_cum[L:] - inv_cum[:-L] == 0)       # all symbols valid
            & (row_index[:m] == row_index[L - 1:])  # window inside one row
        )
        starts = np.flatnonzero(ok)
        salt = _U64((L * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        yield L, starts, splitmix64(acc[starts] ^ salt)


def _sketch_partial(batch: pa.Table, min_len: int, max_len: int,
                    width: int, seed: int) -> pa.Table:
    """Pass-1 stage (stateless task): per-batch CM-CU partial over all
    lengths (hashes are length-salted). Stateless on purpose: the partial is
    per batch either way, and task stages skip actor-pool spin-up entirely."""
    sk = CountMinCU(depth=4, width=width, seed=seed)
    data, row_index = _seq_bytes(batch)
    for L, starts, hashes in _window_hashes(data, row_index, range(min_len, max_len + 1)):
        # no pre-unique: update_hashed's _dedup does the one sort needed
        sk.update_hashed(hashes)
    return pa.table(
        {
            "sketch": pa.array(["kmer"], pa.string()),
            "kind": pa.array([sk.kind], pa.string()),
            "partial": pa.array([sk.to_bytes()], pa.large_binary()),
            "n_rows": pa.array([batch.num_rows], pa.int64()),
        }
    )


def _candidate_rows(batch: pa.Table, sketch_ref, min_len: int,
                    thresholds: list[int]) -> pa.Table:
    """Pass-2 stage (stateless task; sketch cached per worker): emit
    (khash, kmer, length, partial) for windows whose sketch estimate crosses
    the per-length threshold; strings materialize for candidates only."""
    sketch = _cached_sketch(sketch_ref)
    data, row_index = _seq_bytes(batch)
    out_h, out_s, out_l, out_c = [], [], [], []
    for L, starts, hashes in _window_hashes(data, row_index,
                                            range(min_len, min_len + len(thresholds))):
        # one sort serves dedup, counts, AND a representative position per
        # distinct hash (first occurrence)
        uniq, first_idx, counts = np.unique(hashes, return_index=True, return_counts=True)
        est = sketch.query_hashed(uniq)
        mask = est >= thresholds[L - min_len]
        if not mask.any():
            continue
        hot = uniq[mask]
        pos = starts[first_idx[mask]]
        out_h.extend(hot.view(np.int64).tolist())  # bit-reinterpret
        out_s.extend(bytes(data[p: p + L]).decode("ascii") for p in pos.tolist())
        out_l.extend([L] * len(hot))
        out_c.extend(counts[mask].tolist())
    return pa.table(
        {
            "khash": pa.array(out_h, pa.int64()),
            "kmer": pa.array(out_s, pa.large_string()),
            "length": pa.array(out_l, pa.int64()),
            "partial": pa.array(out_c, pa.int64()),
        }
    )


def _tagged(t: pa.Table, corpus: int) -> pa.Table:
    return t.append_column("corpus", pa.array([corpus] * t.num_rows, pa.int8()))


def _probe_rows_full(batch: pa.Table, sketch_ref, min_len: int,
                     thresholds: list[int]) -> pa.Table:
    """Probe rows widened to the candidate-row schema so the test and
    control scans can union into ONE streaming execution."""
    t = _probe_rows(batch, sketch_ref, min_len, thresholds)
    n = t.num_rows
    return pa.table(
        {
            "khash": t["khash"],
            "kmer": pa.array([""] * n, pa.large_string()),
            "length": pa.array(np.zeros(n, np.int64), pa.int64()),
            "partial": t["partial"],
        }
    )


def _probe_rows(batch: pa.Table, sketch_ref, min_len: int,
                thresholds: list[int]) -> pa.Table:
    """Control-side probe (stateless task; sketch cached per worker): count
    occurrences of every window whose TEST sketch estimate crosses the
    threshold (a superset of the exact candidates, so the control scan needs
    no dependency on pass-2 output and can run CONCURRENTLY with it;
    non-candidate rows are discarded by the final join). The sketch plays
    the reference's candidate-map role (J1, src/sketch.cpp:222-227) with no
    strings materialized."""
    sketch = _cached_sketch(sketch_ref)
    data, row_index = _seq_bytes(batch)
    out_h, out_c = [], []
    for L, starts, hashes in _window_hashes(data, row_index,
                                            range(min_len, min_len + len(thresholds))):
        uniq, counts = np.unique(hashes, return_counts=True)
        est = sketch.query_hashed(uniq)
        hit = est >= thresholds[L - min_len]
        if hit.any():
            out_h.extend(uniq[hit].view(np.int64).tolist())  # bit-reinterpret
            out_c.extend(counts[hit].tolist())
    return pa.table({"khash": pa.array(out_h, pa.int64()),
                     "partial": pa.array(out_c, pa.int64())})


def _build_kmer_sketch(ds, min_len, max_len, width, seed, batch_size):
    from ..stages.sketch_build import merge_partials

    partials = ds.map_batches(
        lambda b: _sketch_partial(b, min_len, max_len, width, seed),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True,
    )
    # rounds=0: at this partial count the driver folds the streamed partial
    # rows directly (each is a compressed few-hundred-KB blob); raise rounds
    # when n_batches outgrows driver fan-in (SURVEY.md §7.1 step 3)
    return merge_partials(partials, rounds=0)["kmer"]


def heavy_kmers(
    ds, min_len: int, max_len: int, thresholds: list[int],
    width: int | None = None, seed: int = 42, batch_size: int = 1024,
    semantics: str = "baseline",
) -> pd.DataFrame:
    """Exact per-length heavy-hitter k-mers: (kmer, length, cnt) with
    cnt >= threshold[length].

    ``semantics="first_crossing"`` mirrors the reference's ``== threshold``
    emit-once variant (src/sketch_approx.cu:72, sketch_pipelined.cu:118-121):
    same k-mer set (counts grow by 1, so every count >= T passed == T once),
    but ``cnt`` is the crossing snapshot — the per-length threshold itself —
    rather than the refreshed final count.

    ``width=None`` scales the single length-salted sketch to the reference's
    per-length budget (src/sketch.cpp:28-31: one 2^14-wide sketch PER
    length): width = next_pow2(2^14 × n_lengths). An undersized sketch
    stays exact (false candidates are pruned by verification) but floods
    pass 2 with candidates."""
    assert len(thresholds) == max_len - min_len + 1
    if width is None:
        n_lengths = max_len - min_len + 1
        width = 1 << (14 + max(0, int(np.ceil(np.log2(n_lengths)))))
    if semantics not in ("baseline", "first_crossing"):
        raise ValueError(f"unknown threshold semantics: {semantics!r}")
    sk = _build_kmer_sketch(ds, min_len, max_len, width, seed, batch_size)
    ref = ray.put(sk.to_bytes())
    out = _exact_candidates(ds, ref, min_len, thresholds, batch_size)
    if semantics == "first_crossing":
        thr = {min_len + i: t for i, t in enumerate(thresholds)}
        out = out.assign(cnt=out["length"].map(thr).astype("int64"))
    return out


def _exact_candidates(ds, sketch_ref, min_len, thresholds, batch_size) -> pd.DataFrame:
    """One scan; per-batch rows are candidate-only (threshold-selected), so
    the reduce is a single driver-side pandas fold — counts AND metadata come
    out of the same pass (no materialize, no groupby shuffle). Driver pull is
    bounded by candidates × n_batches; at corpus scales where that outgrows
    the driver, reinstate a distributed groupby over the same rows."""
    cand = ds.map_batches(
        lambda b: _candidate_rows(b, sketch_ref, min_len, thresholds),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True,
    )
    df = cand.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"kmer": pd.Series([], dtype=str),
                             "length": pd.Series([], dtype="int64"),
                             "cnt": pd.Series([], dtype="int64")})
    g = df.groupby("khash", as_index=False).agg(
        cnt=("partial", "sum"), kmer=("kmer", "first"), length=("length", "first"))
    thr = {min_len + i: t for i, t in enumerate(thresholds)}
    g = g[g["cnt"] >= g["length"].map(thr)]
    return g[["kmer", "length", "cnt", "khash"]].sort_values(["length", "kmer"]).reset_index(drop=True)


def emerging_kmers(
    test_ds, control_ds, min_len: int, max_len: int, thresholds: list[int],
    growth: int = 2, width: int | None = None, seed: int = 42, batch_size: int = 1024,
) -> pd.DataFrame:
    """The reference's full program: per-length heavy hitters of the test
    corpus, pruned by floor(cnt/growth) − control_cnt > 0. Returns
    (kmer, length, cnt) where cnt is the RAW test count (reference snapshot
    semantics, src/sketch.cpp:176).

    The test-candidate scan and the control probe both key off the pass-1
    sketch only, so they run as ONE fused dataset execution (a union of the
    two tagged scans — one streaming run, no barrier between corpora); the
    control side counts a candidate SUPERSET and the final join discards
    non-candidates."""
    assert len(thresholds) == max_len - min_len + 1
    if width is None:
        n_lengths = max_len - min_len + 1
        width = 1 << (14 + max(0, int(np.ceil(np.log2(n_lengths)))))
    sk = _build_kmer_sketch(test_ds, min_len, max_len, width, seed, batch_size)
    ref = ray.put(sk.to_bytes())

    cand = test_ds.map_batches(
        lambda b: _tagged(_candidate_rows(b, ref, min_len, thresholds), 0),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True,
    )
    probe = control_ds.map_batches(
        lambda b: _tagged(_probe_rows_full(b, ref, min_len, thresholds), 1),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True,
    )
    both = cand.union(probe).to_pandas()  # candidate-bounded driver fold

    tdf = both[both["corpus"] == 0]
    cdf = both[both["corpus"] == 1]
    if len(tdf) == 0:
        return pd.DataFrame({"kmer": pd.Series([], dtype=str),
                             "length": pd.Series([], dtype="int64"),
                             "cnt": pd.Series([], dtype="int64")})
    hh = tdf.groupby("khash", as_index=False).agg(
        cnt=("partial", "sum"), kmer=("kmer", "first"), length=("length", "first"))
    thr = {min_len + i: t for i, t in enumerate(thresholds)}
    hh = hh[hh["cnt"] >= hh["length"].map(thr)]
    ctrl = cdf.groupby("khash", as_index=False).agg(control_cnt=("partial", "sum"))

    if len(hh) == 0:
        return hh.drop(columns=["khash"], errors="ignore")
    df = hh.merge(ctrl, on="khash", how="left")
    df["control_cnt"] = df["control_cnt"].fillna(0).astype("int64")
    keep = df["cnt"] // growth - df["control_cnt"] > 0
    df = df[keep]
    return df[["kmer", "length", "cnt"]].sort_values(["length", "kmer"]).reset_index(drop=True)
