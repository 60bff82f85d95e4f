"""Similarity search over the ``embeddings`` table (list<float> column).

- ``embedding_near_dups``  exact all-pairs cosine >= tau: each batch does one
  float64 matmul against the broadcast full matrix (``ray.put`` once, fetched
  once per task, NOT per batch). Oracle-gated vs DuckDB
  ``list_cosine_similarity``.
- ``ann_topk``             brute-force top-k for a fixed query set: query
  matrix broadcast, per-batch matmul + partial top-k, final exact top-k on
  the (n_queries × k × n_batches)-sized partials. Oracle-gated.
- ``lsh_ann_topk``         the scale path: random-hyperplane LSH buckets ->
  search only the query's buckets (rows-only: approximate recall).

Scale notes: brute force is O(N·d) per query batch and exists as the exact
baseline/oracle anchor; at 10^9+ vectors the LSH variant bounds the scanned
fraction, trading recall (multi-probe tables raise it). Vectors travel as
zero-copy Arrow fixed-size lists; scores are float64 for cross-engine
comparability, rounded to 6dp at the boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..kernels.hashing import splitmix64
from ..stages.broadcast import cached
from ._util import n_reducers, round6
from .relational import _SMALL_ROWS

_U64 = np.uint64


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids int64[n], unit-normalized float64[n, d]) from a batch."""
    ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(ids) == 0:  # empty batch: report a 0-row matrix with a safe dim
        return ids, np.empty((0, 1), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(flat) // len(ids)
    mat = flat.reshape(len(ids), d)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def _full_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Whole embeddings table on the driver — ONLY for the exact baselines
    (embedding_near_dups / ann_topk), which broadcast the full matrix by
    design (documented ~10 GB cap). The scale paths (LSH / IVF) never call
    this: they use _query_matrix / _sample_matrix."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return _batch_matrix(t)


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Query vectors only (vec_id < n_queries) via a parquet predicate-
    pushdown read: row groups that cannot contain query ids are pruned by
    their statistics, so the driver materializes O(n_queries) rows, never
    the corpus."""
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < n_queries)
    return _batch_matrix(t)


def _sample_matrix(sf_dir: str, n_sample: int, seed: int) -> np.ndarray:
    """Deterministic distributed sample of ~n_sample unit-normalized rows
    for quantizer training: each batch keeps rows whose
    splitmix64(vec_id ^ seed) falls under a global threshold sized from the
    parquet-metadata row count (expected 4x oversample), then the driver
    trims to the exact bottom-n_sample by hash. The kept set is a pure
    function of (vec_id, seed) — identical across runs and parallelism —
    and the driver pull is O(n_sample), never the corpus."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n_total = max(1, ds.count())  # parquet-metadata count: no scan
    frac = min(1.0, 4.0 * n_sample / n_total)
    # float(2**64 - 1) rounds UP to 2**64, so scale in float and clamp
    threshold = (_U64(0xFFFFFFFFFFFFFFFF) if frac >= 1.0
                 else _U64(frac * 2.0**64))
    mix = _U64(seed) * _U64(0x9E3779B97F4A7C15)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(_U64) ^ mix)
        return batch.filter(pa.array(h <= threshold))

    refs = ds.map_batches(pick, batch_format="pyarrow", batch_size=4096).to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows]
    if not tables:  # degenerate threshold underflow: fall back to a head block
        tables = [t for t in ray.get(ds.limit(n_sample).to_arrow_refs()) if t.num_rows]
    ids, mat = _batch_matrix(pa.concat_tables(tables))
    h = splitmix64(ids.astype(_U64) ^ mix)
    order = np.argsort(h, kind="stable")[:n_sample]
    return mat[order]


def embedding_near_dups(sf_dir: str, tau: float = 0.4) -> pa.Table:
    """EXACT pairs (vec_a < vec_b) with cosine similarity >= tau.

    Exact-duplicate collapse first (same trick as the dedup pipelines):
    byte-identical vectors map to one representative, the O(N_distinct²)
    matmul runs on representatives only, and document pairs expand back at
    the end (identical nonzero vectors have cosine exactly 1.0) — a corpus
    that is mostly replicas costs the quadratic core only its distinct part
    (the --soak finding: 10x replication made this query 34x slower before).

    The representative unit-normalized matrix is broadcast once via
    ``ray.put`` (small side: N×d float64; at 5M×256 ≈ 10 GB you would switch
    to the LSH-bucketed variant); each batch computes batch × matrixᵀ and
    emits qualifying pairs with a<b so every pair appears exactly once."""
    import pandas as pd

    from .dedup import _expand_class_pairs

    ids_full, mat_full = _full_matrix(sf_dir)
    # collapse byte-identical rows: void-view unique gives class ids with no
    # hashing; representative = smallest vec_id per class
    void = np.ascontiguousarray(mat_full).view(
        np.dtype((np.void, mat_full.shape[1] * 8))).ravel()
    order = np.argsort(ids_full, kind="stable")
    void_o, ids_o, = void[order], ids_full[order]
    _, first_idx, inv = np.unique(void_o, return_index=True, return_inverse=True)
    rep_of = ids_o[first_idx][inv]  # per (sorted) row: its class representative
    classes = pd.DataFrame({"doc_id": ids_o, "rep": rep_of})
    nonzero = np.linalg.norm(mat_full[order], axis=1) > 0
    rep_has_norm = pd.Series(nonzero, index=ids_o).groupby(
        classes["rep"].to_numpy()).max().astype(int)

    rep_mask = ids_o == rep_of
    rep_ids_sorted = ids_o[rep_mask]
    ids_all = rep_ids_sorted
    mat_all = mat_full[order][rep_mask]
    rep_value_set = pa.array(ids_all, pa.int64())
    ref = ray.put((ids_all, mat_all))

    # stateless stage + per-worker broadcast cache (stages/broadcast.py):
    # same fetch-once discipline as an actor pool, none of the spin-up
    def pair_finder(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_in(batch["vec_id"], value_set=rep_value_set))
        if batch.num_rows == 0:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ids_r, mat_r = cached(ref)
        ids, mat = _batch_matrix(batch)
        sims = mat @ mat_r.T
        ia, ib = np.nonzero(sims >= tau)
        a, b = ids[ia], ids_r[ib]
        keep = a < b
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(np.round(sims[ia, ib][keep], 6), pa.float64()),
            }
        )

    out = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        pair_finder, batch_format="pyarrow", batch_size=4096,
    )
    df = out.to_pandas()
    if "vec_a" not in df.columns:
        df = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                           "vec_b": pd.Series([], dtype="int64"),
                           "cosine": pd.Series([], dtype="float64")})
    rep_pairs = df.rename(columns={"vec_a": "doc_a", "vec_b": "doc_b"})
    expanded = _expand_class_pairs(rep_pairs, classes, rep_has_norm, tau,
                                   score_col="cosine")
    expanded = expanded.rename(columns={"doc_a": "vec_a", "doc_b": "vec_b"})
    expanded = expanded.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        expanded.astype({"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}),
        preserve_index=False)


_EMPTY_PARTIAL = {"query_id": pa.array([], pa.int64()),
                  "vec_id": pa.array([], pa.int64()),
                  "cosine64": pa.array([], pa.float64())}


def _partial_table(out_q: list, out_v: list, out_c: list) -> pa.Table:
    if not out_q:
        return pa.table(_EMPTY_PARTIAL)
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "cosine64": pa.array(np.concatenate(out_c), pa.float64()),
        }
    )


def _block_topk(q_ids: np.ndarray, q_mat: np.ndarray, ids: np.ndarray,
                mat: np.ndarray, k: int, out_q: list, out_v: list, out_c: list) -> None:
    """One block matmul (all queries in q_mat × all vectors in mat) +
    per-query partial top-(k+1); appends flat partial rows."""
    sims = q_mat @ mat.T  # (nq, nb)
    nb = sims.shape[1]
    kk = min(k + 1, nb)  # +1: self may be among the block's vectors
    part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    out_q.append(np.repeat(q_ids, kk))
    out_v.append(ids[part.reshape(-1)])
    out_c.append(np.take_along_axis(sims, part, axis=1).reshape(-1))


def _merge_topk(partials: pd.DataFrame, k: int) -> pa.Table:
    """Vectorized driver merge of per-batch partials -> (query_id, rank,
    vec_id, cosine): sort + per-group head(k) + cumcount (no iterrows)."""
    cols = {"query_id": "int64", "rank": "int64", "vec_id": "int64", "cosine": "float64"}
    if len(partials) == 0 or "query_id" not in partials.columns:
        return pa.Table.from_pandas(
            pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()}),
            preserve_index=False)
    df = partials[partials["query_id"] != partials["vec_id"]]
    df = df.sort_values(["query_id", "cosine64", "vec_id"],
                        ascending=[True, False, True])
    # a vector can be retrieved for the same query by more than one partial
    # (e.g. a query probing several IVF cells): keep its best-scored row
    df = df.drop_duplicates(["query_id", "vec_id"])
    df = df.groupby("query_id", group_keys=False).head(k)
    df = df.assign(rank=df.groupby("query_id").cumcount() + 1,
                   cosine=np.round(df["cosine64"].to_numpy(), 6))
    df = df[["query_id", "rank", "vec_id", "cosine"]].reset_index(drop=True)
    return pa.Table.from_pandas(df.astype(cols), preserve_index=False)


def ann_topk(sf_dir: str, k: int = 5, n_queries: int = 8) -> pa.Table:
    """Exact top-k cosine neighbors for query vectors vec_id < n_queries
    (self excluded). Per-batch partial top-k + driver merge of the
    (n_queries × k)-sized partials — the distributed top-k pattern.
    Returns (query_id, rank, vec_id, cosine)."""
    ids_all, mat_all = _full_matrix(sf_dir)
    qmask = ids_all < n_queries
    q_ids, q_mat = ids_all[qmask], mat_all[qmask]
    ref = ray.put((q_ids, q_mat))

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_EMPTY_PARTIAL)
        qi, qm = cached(ref)
        ids, mat = _batch_matrix(batch)
        out_q, out_v, out_c = [], [], []
        _block_topk(qi, qm, ids, mat, k, out_q, out_v, out_c)
        return _partial_table(out_q, out_v, out_c)

    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        topk, batch_format="pyarrow", batch_size=4096,
    ).to_pandas()
    return _merge_topk(partials, k)


def _kmeans_centroids(mat: np.ndarray, n_cells: int, seed: int, iters: int = 8) -> np.ndarray:
    """Deterministic Lloyd k-means on unit vectors (cosine ≡ dot): seeded
    farthest-point-ish init from hashed row order, fixed iteration count.
    Trains on the seeded distributed sample from _sample_matrix (O(n_sample)
    driver rows), never the full corpus."""
    order = np.argsort(splitmix64(np.arange(len(mat), dtype=_U64) + _U64(seed)))
    centroids = mat[order[:n_cells]].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(n_cells):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def ivf_ann_topk(
    sf_dir: str, k: int = 5, n_queries: int = 8, n_cells: int = 16,
    nprobe: int = 4, seed: int = 42, train_per_cell: int = 256,
) -> pa.Table:
    """IVF (inverted-file) approximate top-k: a deterministic k-means coarse
    quantizer cells the corpus; each query scans only its ``nprobe`` nearest
    cells (expected fraction ≈ nprobe/n_cells of the corpus). The second
    scale path next to LSH; exact scores for whatever it retrieves.

    Driver never sees the corpus: the quantizer trains on a seeded
    distributed sample (_sample_matrix, ~train_per_cell rows per cell) and
    the query matrix comes from a predicate-pushdown read (_query_matrix).
    Returns (query_id, rank, vec_id, cosine) — rows-only gated; recall vs
    brute force pinned in pytest."""
    train = _sample_matrix(sf_dir, n_cells * train_per_cell, seed)
    centroids = _kmeans_centroids(train, min(n_cells, len(train)), seed)
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    # nprobe nearest cells per query
    q_cells = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]
    ref = ray.put((q_ids, q_mat, q_cells, centroids))

    def _build_ivf(state):
        q_ids_, q_mat_, q_cells_, centroids_ = state
        cell_queries = {
            int(c): np.flatnonzero((q_cells_ == c).any(axis=1))
            for c in np.unique(q_cells_)
        }
        return q_ids_, q_mat_, centroids_, cell_queries

    def ivf_topk(batch: pa.Table) -> pa.Table:
        """Per batch: assign vectors to cells once, then ONE block matmul per
        probed cell over ALL queries probing that cell (queries grouped by
        cell in the cached per-worker state) — the loop is over n_cells,
        never over queries."""
        if batch.num_rows == 0:
            return pa.table(_EMPTY_PARTIAL)
        qi, qm, cents, cell_queries = cached(ref, build=_build_ivf)
        ids, mat = _batch_matrix(batch)
        cell = np.argmax(mat @ cents.T, axis=1)
        out_q, out_v, out_c = [], [], []
        for c in np.unique(cell):
            qrows = cell_queries.get(int(c))
            if qrows is None:
                continue
            sel = cell == c
            _block_topk(qi[qrows], qm[qrows], ids[sel], mat[sel], k,
                        out_q, out_v, out_c)
        return _partial_table(out_q, out_v, out_c)

    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        ivf_topk, batch_format="pyarrow", batch_size=4096,
    ).to_pandas()
    return _merge_topk(partials, k)


# module-level stage fns: pickled by reference, so each worker imports this
# module (and with it the package's allocator + log-filter setup) instead of
# a by-value closure graph
_CENTROID_EMPTY = pa.table({"label": pa.array([], pa.int64()),
                            "svec": pa.array([], pa.list_(pa.float64())),
                            "cnt": pa.array([], pa.int64())})


def _centroid_fold(labels: np.ndarray, mat: np.ndarray,
                   weights: np.ndarray) -> pa.Table:
    uniq, inv = np.unique(labels, return_inverse=True)
    sums = np.zeros((len(uniq), mat.shape[1]), np.float64)
    np.add.at(sums, inv, mat)
    cnt = np.bincount(inv, weights=weights, minlength=len(uniq))
    return pa.table({"label": pa.array(uniq, pa.int64()),
                     "svec": pa.array(list(sums), pa.list_(pa.float64())),
                     "cnt": pa.array(cnt.astype(np.int64), pa.int64())})


def _list_matrix(col, n: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, len(flat) // n) if n else np.empty((0, 1))


def _centroid_partials(batch: pa.Table) -> pa.Table:
    n = len(batch)
    if not n:
        return _CENTROID_EMPTY
    labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    return _centroid_fold(labels, _list_matrix(batch["embedding"], n),
                          np.ones(n))


def _centroid_merge(batch: pa.Table) -> pa.Table:
    n = len(batch)
    if not n:
        return _CENTROID_EMPTY
    labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    return _centroid_fold(labels, _list_matrix(batch["svec"], n), w)


def label_centroids(sf_dir: str) -> pa.Table:
    """Per-label mean embedding — class centroids, the building block of
    prototype classifiers, dataset cartography, and k-means seeding.

    Scale shape: per-batch (label, sum-vector, count) partials (label-
    bounded per batch, RAW vectors never leave the tasks), coalesced by a
    second shuffle-free map_batches fold (4096 partial rows merge per
    task — the stages/sketch_build.merge_partials discipline), then one
    tiny driver fold over n_labels × n_tasks rows. Output is long-form
    (label, dim, mean_x) so the SQL oracle can mean positionally-unnested
    elements; dim is 1-based (generate_subscripts parity)."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    pdf = (
        ds.map_batches(_centroid_partials, batch_format="pyarrow",
                       batch_size=4096)
        .map_batches(_centroid_merge, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    final = _centroid_merge(
        pa.Table.from_pandas(pdf, preserve_index=False)
        .cast(_CENTROID_EMPTY.schema)) if len(pdf) else _CENTROID_EMPTY
    labels = final["label"].to_numpy(zero_copy_only=False)
    cnt = final["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    sums = _list_matrix(final["svec"], len(final))
    means = np.round(sums / cnt[:, None], 6)
    d = means.shape[1] if len(final) else 0
    order = np.argsort(labels)
    out = pa.table({
        "label": pa.array(np.repeat(labels[order], d), pa.int64()),
        "dim": pa.array(np.tile(np.arange(1, d + 1), len(final)), pa.int64()),
        "mean_x": pa.array(means[order].ravel(), pa.float64()),
    })
    return out


def semantic_decontaminate(sf_dir: str, tau: float = 0.4,
                           n_holdout: int = 20) -> pa.Table:
    """Semantic (embedding-space) decontamination: for every corpus vector
    (vec_id >= n_holdout), its max cosine similarity against the holdout /
    benchmark set (vec_id < n_holdout) and a contamination flag at ``tau``
    — the embedding-space counterpart of the 3-gram ``decontaminate_corpus``
    (a near-verbatim benchmark leak shows up as cosine ~1 even after
    paraphrase-level edits).

    Scale shape: the holdout matrix is benchmark-sized (thousands of rows,
    not corpus-sized) — read with a vec_id pushdown filter, broadcast once
    via ray.put, ONE streaming pass over the corpus with a per-batch block
    matmul. No shuffle."""
    import pyarrow.dataset as pads
    import ray

    from ..stages.broadcast import cached

    hold = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < n_holdout)
    _, hmat = _batch_matrix(hold)
    ref = ray.put(hmat.T.copy())  # (d, n_holdout), contiguous for the matmul

    def probe(batch: pa.Table) -> pa.Table:
        ht = cached(ref)
        ids, mat = _batch_matrix(batch)
        keep = ids >= n_holdout
        ids, mat = ids[keep], mat[keep]
        mx = (mat @ ht).max(axis=1) if len(ids) and ht.shape[1] else \
            np.zeros(len(ids))
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "max_cos": pa.array(np.round(mx, 6), pa.float64()),
            "contaminated": pa.array((mx >= tau).astype(np.int64), pa.int64()),
        })

    from ._util import ensure_columns

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    df = ensure_columns(
        ds.map_batches(probe, batch_format="pyarrow", batch_size=4096).to_pandas(),
        {"vec_id": "int64", "max_cos": "float64", "contaminated": "int64"})
    df = df.sort_values("vec_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def embedding_dedup_clusters(sf_dir: str, tau: float = 0.4) -> pa.Table:
    """SEMANTIC dedup: connected components over the cosine >= tau relation
    — every vector gets the smallest vec_id reachable through near-dup
    pairs as ``cluster_rep`` (keep rows where vec_id == cluster_rep for a
    semantically deduplicated corpus). The embedding-space analog of the
    token-space ``dedup.dedup_clusters``; same physical plan: pair set from
    the exact pair operator, component labels resolved over pair-TOUCHED
    vectors only (dedup._cluster_labels — O(pair set), never O(corpus)),
    (node -> label) map broadcast once, labels attached by a streaming map
    that emits singletons as their own rep. Oracle-gated vs a DuckDB
    recursive-CTE transitive closure."""
    import pandas as pd

    from .dedup import _cluster_labels
    from ._util import ensure_columns

    pairs = embedding_near_dups(sf_dir, tau=tau).to_pandas().rename(
        columns={"vec_a": "doc_a", "vec_b": "doc_b"})
    if len(pairs):
        nodes, labels = _cluster_labels(pairs)
    else:
        nodes = np.empty(0, np.int64)
        labels = nodes
    ref = ray.put((nodes, labels))

    def attach(batch: pa.Table) -> pa.Table:
        nd, lb = cached(ref)
        d = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = d.copy()
        if len(nd):
            idx = np.clip(np.searchsorted(nd, d), 0, len(nd) - 1)
            found = nd[idx] == d
            rep[found] = lb[idx[found]]
        return pa.table({"vec_id": pa.array(d, pa.int64()),
                         "cluster_rep": pa.array(rep, pa.int64())})

    labeled = _read(sf_dir, "embeddings", ["vec_id"]).map_batches(
        attach, batch_format="pyarrow", batch_size=65536)
    df = ensure_columns(labeled.to_pandas(), {"vec_id": "int64", "cluster_rep": "int64"})
    df = df.sort_values("vec_id").reset_index(drop=True)
    return pa.Table.from_pandas(df.astype("int64"), preserve_index=False)


def embedding_near_dups_lsh(
    sf_dir: str, tau: float = 0.4, n_bits: int = 4, n_tables: int = 8,
    seed: int = 42,
) -> pa.Table:
    """APPROXIMATE pairs (vec_a < vec_b, cosine >= tau) — the bucketed scale
    path next to the exact ``embedding_near_dups`` (whose broadcast matrix
    caps at ~10 GB; SURVEY.md §9 flagged that ✗).

    Multi-table random-hyperplane LSH: every vector gets ``n_tables``
    signatures (independent plane sets); candidate pairs are vectors sharing
    a (table, signature) bucket in ANY table — collision probability per
    table is (1 − θ/π)^n_bits, OR-amplified across tables. Physical plan:
    one map_batches emits (bucket, vec_id, embedding) rows (the corpus
    moves n_tables×, the honest cost of OR-amplification), ONE
    groupby(bucket).map_groups computes exact within-bucket cosines and
    emits pairs >= tau, and a final pair-keyed dedupe collapses pairs found
    in several tables. Nothing broadcast grows with the corpus; bucket size
    ~N/2^n_bits bounds the quadratic core. Precision is exact (scores are
    true cosines); recall < 1 is pinned monotone-in-tables by pytest.
    Identical vectors share every signature, so exact duplicates are always
    found. Rows-only gated."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    table_seeds = [seed + 1_000_003 * t for t in range(n_tables)]

    def add_buckets(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": batch["embedding"]})
        d = mat.shape[1]
        weights = 1 << np.arange(n_bits)
        parts = []
        for t, s in enumerate(table_seeds):
            planes = _hyperplanes(d, n_bits, s)  # deterministic regeneration
            sig = ((mat @ planes.T) > 0) @ weights
            bucket = (np.int64(t) << n_bits) | sig
            parts.append(pa.table({
                "bucket": pa.array(bucket, pa.int64()),
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
            }))
        return pa.concat_tables(parts)

    _EMPTY_PAIRS = pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return _EMPTY_PAIRS
        # zero-copy list-flatten into the normalized matrix — no per-row
        # Python even inside the per-bucket kernel
        ids, mat = _batch_matrix(group)
        sims = mat @ mat.T
        ia, ib = np.nonzero(sims >= tau)
        a, b = ids[ia], ids[ib]
        keep = a < b
        if not keep.any():
            return _EMPTY_PAIRS
        return pa.table({"vec_a": pa.array(a[keep], pa.int64()),
                         "vec_b": pa.array(b[keep], pa.int64()),
                         "cosine": pa.array(np.round(sims[ia, ib][keep], 6),
                                            pa.float64())})

    pairs = (
        ds.map_batches(add_buckets, batch_format="pyarrow", batch_size=4096)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # pair-keyed dedupe: the pair set is tau-bounded (same bound as the
    # exact variant's driver output), so a driver drop_duplicates is fine
    df = pairs.to_pandas()
    if "vec_a" not in df.columns or not len(df):
        df = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                           "vec_b": pd.Series([], dtype="int64"),
                           "cosine": pd.Series([], dtype="float64")})
    df = (df.drop_duplicates(["vec_a", "vec_b"])
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))
    return pa.Table.from_pandas(
        df.astype({"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}),
        preserve_index=False)


def _hyperplanes(d: int, n_bits: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from counter-hash bits
    (no np.random: every worker regenerates the identical planes)."""
    n = d * n_bits
    h = splitmix64(np.arange(n, dtype=_U64) + _U64(seed) * _U64(0x9E3779B1))
    # map uint64 -> approx N(0,1) via sum of 4 uniform 16-bit fields (CLT)
    parts = np.stack([((h >> _U64(16 * i)) & _U64(0xFFFF)).astype(np.float64) for i in range(4)])
    g = (parts.sum(axis=0) / 65535.0 - 2.0) * np.sqrt(3.0)
    return g.reshape(n_bits, d)


def lsh_ann_topk(
    sf_dir: str, k: int = 5, n_queries: int = 8, n_bits: int = 8, seed: int = 42,
    n_probes: int = 1,
) -> pa.Table:
    """Approximate top-k: random-hyperplane signatures bucket the corpus.

    ``n_probes=1`` searches only each query's own bucket (the honest-scale
    single-probe baseline). ``n_probes>1`` is MULTI-PROBE LSH: each query
    additionally probes the buckets reached by flipping its lowest-margin
    signature bits (the hyperplanes it sits closest to — the bits most
    likely to disagree with a true neighbor), scanning ~n_probes/2^n_bits
    of the corpus for monotonically higher recall (pinned in pytest).
    Query vectors come from a predicate-pushdown read (_query_matrix) —
    the corpus never lands on the driver.
    Returns (query_id, rank, vec_id, cosine) — rows-only gated."""
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    planes = _hyperplanes(q_mat.shape[1], n_bits, seed)
    proj = q_mat @ planes.T  # (n_q, n_bits) signed margins
    q_sig = (proj > 0) @ (1 << np.arange(n_bits))
    n_probes = max(1, min(int(n_probes), n_bits + 1))
    # probe sigs per query: own bucket + flip the (n_probes-1) nearest planes
    flip_order = np.argsort(np.abs(proj), axis=1)[:, : n_probes - 1]
    probe_sigs = [q_sig]
    for j in range(flip_order.shape[1]):
        probe_sigs.append(q_sig ^ (1 << flip_order[:, j]))
    q_sig_all = np.stack(probe_sigs, axis=1)  # (n_q, n_probes)
    ref = ray.put((q_ids, q_mat, q_sig_all, planes))

    def _build_lsh(state):
        q_ids_, q_mat_, q_sig_, planes_ = state
        sig_queries = {
            int(s): np.flatnonzero((q_sig_ == s).any(axis=1))
            for s in np.unique(q_sig_)
        }
        return q_ids_, q_mat_, planes_, sig_queries

    def bucket_topk(batch: pa.Table) -> pa.Table:
        """Queries grouped by bucket signature in the cached per-worker
        state; per batch, ONE block matmul per distinct signature shared by
        >= 1 query — the loop is over distinct buckets, never queries."""
        if batch.num_rows == 0:
            return pa.table(_EMPTY_PARTIAL)
        qi, qm, pl, sig_queries = cached(ref, build=_build_lsh)
        ids, mat = _batch_matrix(batch)
        sig = ((mat @ pl.T) > 0) @ (1 << np.arange(pl.shape[0]))
        out_q, out_v, out_c = [], [], []
        for s, qrows in sig_queries.items():
            sel = sig == s
            if not sel.any():
                continue
            _block_topk(qi[qrows], qm[qrows], ids[sel], mat[sel], k,
                        out_q, out_v, out_c)
        return _partial_table(out_q, out_v, out_c)

    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        bucket_topk, batch_format="pyarrow", batch_size=4096,
    ).to_pandas()
    return _merge_topk(partials, k)


def knn_label_vote(sf_dir: str, k: int = 5, n_queries: int = 8) -> pa.Table:
    """k-NN majority-vote label prediction — the classifier shape of a
    label-propagation / weak-supervision stage: each query vector's
    predicted label is the most common label among its exact top-k cosine
    neighbors (self excluded), ties broken by the smaller label id.

    Composes on the oracle-gated ``ann_topk`` (per-batch partial top-k +
    driver merge — nothing corpus-sized anywhere); neighbor labels come
    from a predicate-pushdown read bounded by the n_queries·k neighbor
    set. Returns (query_id, pred_label, n_votes)."""
    import pyarrow.parquet as pq

    neigh = ann_topk(sf_dir, k=k, n_queries=n_queries).to_pandas()
    wanted = sorted(set(neigh["vec_id"].tolist()))
    labels = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"],
        filters=[("vec_id", "in", wanted)]).to_pandas()
    merged = neigh.merge(labels, on="vec_id")
    votes = (merged.groupby(["query_id", "label"]).size()
             .rename("n_votes").reset_index())
    votes = votes.sort_values(["query_id", "n_votes", "label"],
                              ascending=[True, False, True], kind="stable")
    win = votes.groupby("query_id", as_index=False).head(1)
    out = win.rename(columns={"label": "pred_label"}).reset_index(drop=True)
    return pa.table({
        "query_id": pa.array(out["query_id"].to_numpy(np.int64), pa.int64()),
        "pred_label": pa.array(out["pred_label"].to_numpy(np.int64), pa.int64()),
        "n_votes": pa.array(out["n_votes"].to_numpy(np.int64), pa.int64()),
    })


def embedding_spectrum(sf_dir: str, ell: int = 128, k: int = 8) -> pa.Table:
    """Top-k spectrum of the embedding matrix two ways in ONE streaming
    pass each — the sketch-vs-exact pairing applied to a MATRIX statistic:

    - Frequent Directions (kernels/freqdirs.py, Liberty 2013): ℓ×d state,
      the only thing that ever leaves a worker; at 10^12 rows this is THE
      way to ask "how many effective dimensions do my embeddings have"
      without shuffling a single vector.
    - exact Gram fold: per-batch d×d partial Σvvᵀ rows (d² floats, fixed
      size) summed on the driver — exact because matrix addition is
      associative; feasible only because d is small, which is precisely
      the regime where it VALIDATES the sketch (SURVEY §5 discipline).

    Returns (rank, sv_exact, sv_est, rel_err) for the top-k singular
    values, 6dp; rows-only gated (eigenvalues are not SQL-expressible),
    the FD guarantee ‖AᵀA−BᵀB‖₂ ≤ ‖A‖F²/(ℓ−k) is pinned in pytest."""
    import pyarrow.parquet as pq_mod

    from ..stages.sketch_build import SketchSpec, build_sketches
    from ._util import round6

    head = pq_mod.ParquetFile(f"{sf_dir}/embeddings.parquet").read_row_group(
        0, columns=["embedding"])
    d = len(head["embedding"][0])

    spec = SketchSpec("fd", "freqdirs", "embedding", mode="vectors",
                      params={"d": d, "ell": int(ell), "seed": 42})
    sk = build_sketches(_read(sf_dir, "embeddings", ["embedding"]),
                        [spec], batch_size=4096)["fd"]

    import pyarrow.compute as pc

    def gram_partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(batch["embedding"].combine_chunks()) \
            .to_numpy(zero_copy_only=False)
        v = flat.astype(np.float64).reshape(-1, d)
        g = v.T @ v
        return pa.table({"gram": pa.array([g.tobytes()], pa.large_binary())})

    gram = np.zeros((d, d))
    parts = _read(sf_dir, "embeddings", ["embedding"]).map_batches(
        gram_partial, batch_format="pyarrow", batch_size=4096)
    for b in parts.iter_batches(batch_size=256, batch_format="pyarrow"):
        for raw in b["gram"].to_pylist():
            gram += np.frombuffer(raw, np.float64).reshape(d, d)

    eig = np.linalg.eigvalsh(gram)[::-1]
    sv_exact = np.sqrt(np.maximum(eig[:k], 0.0))
    sv_est = np.asarray(sk.singular_values(k), np.float64)
    if len(sv_est) < k:
        sv_est = np.concatenate([sv_est, np.zeros(k - len(sv_est))])
    rel = np.abs(sv_est - sv_exact) / np.maximum(sv_exact, 1e-12)
    return pa.table({
        "rank": pa.array(np.arange(1, k + 1), pa.int64()),
        "sv_exact": pa.array(np.asarray(round6(sv_exact)), pa.float64()),
        "sv_est": pa.array(np.asarray(round6(sv_est)), pa.float64()),
        "rel_err": pa.array(np.asarray(round6(rel)), pa.float64()),
    })


def embedding_kmeans(sf_dir: str, n_clusters: int = 8, iters: int = 5,
                     seed: int = 42) -> pa.Table:
    """Distributed spherical k-means over the FULL embedding corpus — the
    domain-clustering step a mixture-curation pipeline runs before
    choosing sampling weights. ``_kmeans_centroids`` trains a coarse
    quantizer on a distributed SAMPLE (the IVF path); this refines it
    with ``iters`` full-corpus Lloyd passes, each ONE streaming
    map_batches: broadcast centroids, per-batch argmax assignment (one
    block matmul), and (k×d vector-sum, k counts, k dot-sums) partials —
    k·d floats per batch cross the wire, never a vector row. New
    centroids are the normalized cluster means (spherical update);
    empty clusters keep their previous centroid (deterministic).

    Driver holds k·d floats; corpus never leaves the tasks. Rows-only
    gated (iterative — not SQL); Lloyd-identity vs a one-machine numpy
    reference, objective monotonicity and determinism are pinned in
    pytest. Returns (cluster, n_vecs, mean_cos) sorted by cluster,
    mean_cos rounded 6dp."""
    from ._util import ensure_columns, round6

    k = int(n_clusters)
    train = _sample_matrix(sf_dir, k * 64, seed)
    centroids = _kmeans_centroids(train, min(k, len(train)), seed)
    k = len(centroids)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    counts = sims = None
    for _ in range(int(iters)):
        ref = ray.put(centroids)

        def partials(batch: pa.Table, _ref=ref) -> pa.Table:
            from ..stages.broadcast import cached

            C = cached(_ref)
            _, X = _batch_matrix(batch)
            if len(X) == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64()),
                                 "vsum": pa.array([], pa.list_(pa.float64()))})
            dots = X @ C.T
            assign = np.argmax(dots, axis=1)
            best = dots[np.arange(len(X)), assign]
            nz = np.unique(assign)
            n_c = np.bincount(assign, minlength=k)[nz]
            sim_c = np.bincount(assign, weights=best, minlength=k)[nz]
            vs = np.zeros((k, X.shape[1]), np.float64)
            np.add.at(vs, assign, X)
            return pa.table({
                "cluster": pa.array(nz.astype(np.int64)),
                "n": pa.array(n_c.astype(np.int64)),
                "sim": pa.array(sim_c, pa.float64()),
                "vsum": pa.array(list(vs[nz]), pa.list_(pa.float64()))})

        pdf = ensure_columns(
            ds.map_batches(partials, batch_format="pyarrow", batch_size=4096)
              .to_pandas(),
            {"cluster": "int64", "n": "int64", "sim": "float64",
             "vsum": "object"})
        counts = np.zeros(k, np.int64)
        sims = np.zeros(k, np.float64)
        vsums = np.zeros((k, centroids.shape[1]), np.float64)
        for c, n, s, v in zip(pdf["cluster"], pdf["n"], pdf["sim"],
                              pdf["vsum"]):  # k×batches-bounded fold
            counts[c] += n
            sims[c] += s
            vsums[c] += np.asarray(v, np.float64)
        nonempty = counts > 0
        norms = np.linalg.norm(vsums, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        new_c = vsums / norms
        centroids = np.where(nonempty[:, None], new_c, centroids)

    return pa.table({
        "cluster": pa.array(np.arange(k, dtype=np.int64)),
        "n_vecs": pa.array(counts, pa.int64()),
        "mean_cos": pa.array(
            np.asarray(round6(np.where(counts > 0, sims / np.maximum(counts, 1),
                                       0.0)), np.float64), pa.float64()),
    })


def _pq_codebooks(train: np.ndarray, m: int, n_codes: int, seed: int,
                  iters: int = 10) -> np.ndarray:
    """Per-subspace vanilla Lloyd (Euclidean mean, NOT the unit-normalized
    spherical k-means of _kmeans_centroids — PQ cells approximate raw
    subvectors). Deterministic seeded init from hashed row order; trains
    on the seeded distributed sample only."""
    d = train.shape[1]
    ds_sub = d // m
    cbs = np.empty((m, n_codes, ds_sub), np.float64)
    for j in range(m):
        sub = np.ascontiguousarray(train[:, j * ds_sub:(j + 1) * ds_sub])
        order = np.argsort(splitmix64(
            np.arange(len(sub), dtype=_U64) + _U64(seed * 1000003 + j)))
        cb = sub[order[:n_codes]].copy()
        if len(cb) < n_codes:  # degenerate train set: tile to shape
            reps = -(-n_codes // max(len(cb), 1))
            cb = np.tile(cb, (reps, 1))[:n_codes]
        for _ in range(iters):
            # argmin ||x-c||^2 == argmax (x·c - ||c||^2/2)
            a = np.argmax(sub @ cb.T - 0.5 * (cb ** 2).sum(axis=1), axis=1)
            for c in range(n_codes):
                memb = sub[a == c]
                if len(memb):
                    cb[c] = memb.mean(axis=0)
        cbs[j] = cb
    return cbs


def pq_ann_topk(
    sf_dir: str, k: int = 5, n_queries: int = 8, m: int = 16,
    n_codes: int = 16, seed: int = 42, train_rows: int = 4096,
    rerank: int = 64,
) -> pa.Table:
    """Product-quantization ANN (Jégou, Douze & Schmid, "Product
    Quantization for Nearest Neighbor Search", PAMI 2011 — public): the
    third scale path next to LSH and IVF. Each vector compresses to ``m``
    uint4/uint8 codes (m·log2(n_codes) bits ≈ 8 bytes here vs 512 for the
    raw float64[64]) and query↔vector scores come from table lookups
    (ADC), so the per-batch cost is m gather-adds instead of a d-wide
    matmul — at 100 TB the codes, not the vectors, are what a reranking
    tier would keep hot.

    Pipeline shape: codebooks train driver-side on the seeded distributed
    sample (_sample_matrix, O(train_rows)); per batch the stage encodes
    vectors once (m small matmuls), scores ALL queries via the broadcast
    LUT (vectorized gather-sum), takes the ADC top-``rerank`` per query
    and EXACT-rescores only those (candidate-union block matmul), so
    returned cosines are exact for whatever PQ retrieves (IVF
    discipline). Rows-only gated; recall vs brute force pinned in
    pytest."""
    train = _sample_matrix(sf_dir, train_rows, seed)
    d = train.shape[1]
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    ds_sub = d // m
    cbs = _pq_codebooks(train, m, n_codes, seed)
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    # LUT[q, j, c] = q_subspace_j · codebook[j][c]  (ADC inner product;
    # corpus vectors are unit-normalized so dot == cosine)
    lut = np.einsum("qjd,jcd->qjc",
                    q_mat.reshape(len(q_mat), m, ds_sub), cbs)
    ref = ray.put((q_ids, q_mat, cbs, lut))

    def pq_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_EMPTY_PARTIAL)
        qi, qm, cbs_w, lut_w = cached(ref)
        ids, mat = _batch_matrix(batch)
        n = len(ids)
        sub = mat.reshape(n, m, ds_sub)
        codes = np.empty((n, m), np.int64)
        for j in range(m):
            codes[:, j] = np.argmax(
                sub[:, j] @ cbs_w[j].T - 0.5 * (cbs_w[j] ** 2).sum(axis=1),
                axis=1)
        adc = np.zeros((len(qi), n), np.float64)
        for j in range(m):
            adc += lut_w[:, j, :][:, codes[:, j]]
        rr = min(rerank + 1, n)  # +1: self may be among the candidates
        cand = np.argpartition(-adc, rr - 1, axis=1)[:, :rr]
        # exact rescore of the candidate UNION in one block matmul, then
        # per-query top-k restricted to each query's own candidates
        uniq = np.unique(cand)
        sims_all = qm @ mat[uniq].T                      # (nq, |U|)
        pos = np.searchsorted(uniq, cand)                # (nq, rr)
        sims_cand = np.take_along_axis(sims_all, pos, axis=1)
        kk = min(k + 1, rr)
        part = np.argpartition(-sims_cand, kk - 1, axis=1)[:, :kk]
        sel = np.take_along_axis(cand, part, axis=1)     # batch positions
        return _partial_table(
            [np.repeat(qi, kk)],
            [ids[sel.reshape(-1)]],
            [np.take_along_axis(sims_cand, part, axis=1).reshape(-1)])

    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .map_batches(pq_topk, batch_format="pyarrow",
                     batch_size=4096).to_pandas()
    return _merge_topk(partials, k)


def mutual_knn_pairs(sf_dir: str, k: int = 5, topn: int = 25,
                     force: str | None = None) -> pa.Table:
    """Reciprocal-nearest-neighbor (mutual-kNN) pairs: (a, b) such that b
    is in a's exact cosine top-k AND a is in b's — the symmetric
    neighborhood graph curation pipelines build before RNN clustering /
    diversity pruning (a much stronger tie than one-directional kNN:
    hubs collect thousands of in-edges but reciprocate only k).

    Exact brute-force anchor (the ann_topk discipline): the unit matrix
    broadcasts once via ``ray.put`` (documented ~10 GB cap — at 10^9
    vectors the LSH/IVF variants bound the scanned set instead); each
    batch ranks ITS OWN rows against the full matrix, so a batch emits
    exactly k rows per vector (n×k directed edges total, never a
    per-batch × per-query product). Ranking is (cosine DESC, vec_id ASC)
    via ONE stable argsort over columns pre-sorted by vec_id — duplicate
    vectors tie at cosine 1.0 and the tie-break must match the oracle's
    window ORDER BY exactly.

    The mutual fold is adaptive: below `_SMALL_ROWS` edges the n×k edge
    table folds on the driver (one packed-key np.unique, count==2 keeps
    reciprocated pairs); above, the house bucket pattern — canonical-key
    hash bucket + the same vectorized fold per group (NEVER a native
    high-cardinality pair groupby, CLAUDE.md trap), per-block top-n
    prune (counts are final after the fold), driver merges ≤ topn rows
    per block. Returns the top-n pairs by (round6(cosine) DESC, vec_a,
    vec_b) — round6 BEFORE the ORDER BY cut, BM25 discipline — plus the
    total reciprocated-pair count as a column (the aggregate a 100 TB
    run would keep even when the pair list goes to a digest sink)."""
    ids_all, mat_all = _full_matrix(sf_dir)
    order = np.argsort(ids_all, kind="stable")
    ids_s, mat_s = ids_all[order], np.ascontiguousarray(mat_all[order])
    ref = ray.put((ids_s, mat_s))
    kk = int(k)

    def knn_edges(batch: pa.Table) -> pa.Table:
        ids_r, mat_r = cached(ref)
        ids, mat = _batch_matrix(batch)
        if len(ids) == 0:
            return pa.table({"qa": pa.array([], pa.int64()),
                             "qb": pa.array([], pa.int64()),
                             "c": pa.array([], pa.float64())})
        sims = mat @ mat_r.T
        pos = np.searchsorted(ids_r, ids)
        has = pos < len(ids_r)
        has &= ids_r[np.minimum(pos, len(ids_r) - 1)] == ids
        sims[np.flatnonzero(has), pos[has]] = -2.0  # self never ranks
        # columns ascend by vec_id and every sort below is STABLE on
        # vec_id-ordered input, so ties break toward the lower vec_id —
        # the oracle's (c DESC, vec_id). Ranking is O(n) argpartition to
        # a k+64 slice + in-slice sort (full argsort is O(n log n) per
        # row and dominates at 10^5+ columns); a cosine tie that crosses
        # the slice boundary (c[k-1] == slice minimum — duplicate-heavy
        # data) falls back to the exact full-row sort for those rows.
        n_cols = sims.shape[1]
        m = min(kk + 64, n_cols)
        if m == n_cols:
            top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        else:
            part = np.argpartition(-sims, m - 1, axis=1)[:, :m]
            o1 = np.argsort(part, axis=1, kind="stable")  # vec_id order
            part = np.take_along_axis(part, o1, axis=1)
            cs = np.take_along_axis(sims, part, axis=1)
            o2 = np.argsort(-cs, axis=1, kind="stable")
            part = np.take_along_axis(part, o2, axis=1)
            cs = np.take_along_axis(cs, o2, axis=1)
            top = part[:, :kk]
            bad = np.flatnonzero(cs[:, min(kk, m) - 1] <= cs[:, m - 1])
            if len(bad):
                full = np.argsort(-sims[bad], axis=1, kind="stable")[:, :kk]
                top[bad] = full
        nk = top.shape[1]
        return pa.table({
            "qa": pa.array(np.repeat(ids, nk), pa.int64()),
            "qb": pa.array(ids_r[top.reshape(-1)], pa.int64()),
            "c": pa.array(np.take_along_axis(sims, top, axis=1).reshape(-1),
                          pa.float64()),
        })

    edges = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        knn_edges, batch_format="pyarrow", batch_size=1024)

    def mutual_np(qa: np.ndarray, qb: np.ndarray, c: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """count==2 on canonical packed keys -> reciprocated (a<b, cos)."""
        lo, hi = np.minimum(qa, qb), np.maximum(qa, qb)
        stride = np.int64(hi.max()) + 1 if len(hi) else np.int64(1)
        key = lo * stride + hi
        uniq, inv, cnt = np.unique(key, return_inverse=True,
                                   return_counts=True)
        keep = (cnt == 2)[inv] & (qa < qb)  # the a->b direction's cosine
        return qa[keep], qb[keep], c[keep]

    n = len(ids_all)
    small = (n * kk < _SMALL_ROWS) if force is None else (force == "driver")
    if small:
        df = edges.to_pandas()
        va, vb, vc = mutual_np(df["qa"].to_numpy(np.int64),
                               df["qb"].to_numpy(np.int64),
                               df["c"].to_numpy(np.float64))
    else:
        nr = n_reducers()

        def tag(batch: pa.Table) -> pa.Table:
            qa = batch["qa"].to_numpy(zero_copy_only=False).astype(np.uint64)
            qb = batch["qb"].to_numpy(zero_copy_only=False).astype(np.uint64)
            b = ((splitmix64(np.minimum(qa, qb))
                  ^ splitmix64(np.maximum(qa, qb) + np.uint64(11)))
                 % np.uint64(nr)).astype(np.int64)
            return batch.append_column("bucket", pa.array(b, pa.int64()))

        def group(df: pd.DataFrame) -> pd.DataFrame:
            va, vb, vc = mutual_np(df["qa"].to_numpy(np.int64),
                                   df["qb"].to_numpy(np.int64),
                                   df["c"].to_numpy(np.float64))
            return pd.DataFrame({"qa": va, "qb": vb, "c": vc})

        folded = (edges.map_batches(tag, batch_format="pyarrow")
                  .groupby("bucket")
                  .map_groups(lambda g: group(g.drop(columns=["bucket"])),
                              batch_format="pandas")
                  .materialize())  # 2 consumers: count + top-n pull
        n_mutual_dist = folded.count()

        def local_topn(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            c6 = np.round(df["c"].to_numpy(), 6)
            o = np.lexsort((df["qb"].to_numpy(), df["qa"].to_numpy(),
                            -c6))[:int(topn)]
            return pa.Table.from_pandas(df.iloc[o], preserve_index=False)

        df = folded.map_batches(local_topn,
                                batch_format="pyarrow").to_pandas()
        va = df["qa"].to_numpy(np.int64)
        vb = df["qb"].to_numpy(np.int64)
        vc = df["c"].to_numpy(np.float64)

    n_mutual = int(n_mutual_dist) if not small else len(va)
    c6 = np.array([round6(float(x)) for x in vc], np.float64)
    o = np.lexsort((vb, va, -c6))[:int(topn)]
    return pa.table({
        "vec_a": pa.array(va[o], pa.int64()),
        "vec_b": pa.array(vb[o], pa.int64()),
        "cosine": pa.array(c6[o], pa.float64()),
        "n_mutual": pa.array([n_mutual] * len(o), pa.int64()),
    })
