"""Distributed model training over Ray Data: a logistic-regression text
classifier trained by full-batch gradient descent — the "model-based quality
filter" stage of a web-corpus pipeline (fastText-style classifiers in
public pipelines like CCNet/RefinedWeb; here the features are the engine's
own exact quality signals, so no external model ships in).

Training shape (the part that matters at 100 TB):

- ONE featurization pass over documents → a narrow float64 feature Dataset
  (4 + label columns ≈ 40 B/doc), ``materialize()``d so the T gradient
  passes iterate over object-store-resident blocks instead of re-reading
  and re-tokenizing parquet every step.
- Each GD step ships the 32-byte weight vector by closure capture (the
  fetch-once broadcast cache is for dimension-sized state, not this) and
  folds per-batch gradient partials (one 4-float row per batch) — a
  shuffle-free associative reduction, same discipline as
  sketch_build.merge_partials.
- Driver sums partials with ``math.fsum`` (exactly rounded, therefore
  ORDER-INDEPENDENT) so the trained weights are bit-deterministic across
  runs and parallelism — the property every other operator here gets from
  integer folds, recovered for float gradients.

Rows-only gated (iterative training is not SQL-expressible); convergence,
separation quality and rerun determinism are pinned in pytest.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text_analysis import STOPWORDS
from ._util import ensure_columns, round6

_FEATURES = ("bias", "stopword_ratio", "mean_token_len", "log1p_tokens")


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _feature_ds(sf_dir: str, pos_lang: str):
    stop_set = pa.array(list(STOPWORDS))

    def feats(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        toks = pc.split_pattern(text, " ")
        ntok = pc.list_value_length(toks).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        nchr = pc.utf8_length(text).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        is_stop = pc.is_in(flat, value_set=stop_set.cast(flat.type)) \
            .to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(ntok)), ntok)
        n_stop = np.bincount(doc_idx, weights=is_stop.astype(np.float64),
                             minlength=len(ntok))
        safe = np.maximum(ntok, 1).astype(np.float64)
        y = (batch["lang"].to_numpy(zero_copy_only=False)
             == pos_lang).astype(np.float64)
        return pa.table({
            "y": pa.array(y, pa.float64()),
            "f1": pa.array(n_stop / safe, pa.float64()),
            "f2": pa.array(nchr / safe, pa.float64()),
            "f3": pa.array(np.log1p(ntok.astype(np.float64)), pa.float64()),
        })

    return _read(sf_dir, "documents", ["lang", "text"]) \
        .map_batches(feats, batch_format="pyarrow", batch_size=8192) \
        .materialize()  # T gradient passes re-consume these blocks


def train_quality_classifier(sf_dir: str, pos_lang: str = "en",
                             iters: int = 30, lr: float = 1.0) -> pa.Table:
    """Train the 4-weight logistic classifier "is this document
    ``pos_lang``-like" on exact quality features and report the weights
    plus final train accuracy. Returns one row per feature:
    (term, weight, train_acc, n_docs) — weight round6'd, accuracy an
    exact integer ratio.

    Honest note on the bundled testdata: its languages share one token
    distribution (per-lang length/stopword stats are statistically
    identical), so Bayes accuracy ≈ the majority rate there — what this
    operator demonstrates is the distributed-training machinery (scaler
    fold → materialized features → T deterministic gradient folds), and
    pytest pins convergence on a PLANTED separable corpus where accuracy
    must exceed 0.9, plus monotone loss + bit-determinism here."""
    feats = _feature_ds(sf_dir, pos_lang)
    d = len(_FEATURES)
    w = np.zeros(d, np.float64)

    # scaler fit = one more fold (GD on raw scales diverges: token-length
    # features dwarf the ratio feature); fsum keeps μ/σ order-independent
    def scale_partials(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in ("f1", "f2", "f3"):
            v = batch[c].to_numpy(zero_copy_only=False)
            cols[f"s_{c}"] = pa.array([float(v.sum())], pa.float64())
            cols[f"ss_{c}"] = pa.array([float((v * v).sum())], pa.float64())
        cols["n"] = pa.array([batch.num_rows], pa.int64())
        return pa.table(cols)

    spdf = ensure_columns(
        feats.map_batches(scale_partials, batch_format="pyarrow",
                          batch_size=8192).to_pandas(),
        {**{f"{p}_{c}": "float64" for c in ("f1", "f2", "f3")
            for p in ("s", "ss")}, "n": "int64"})
    n_all = max(int(spdf["n"].sum()), 1)
    mu = np.zeros(d, np.float64)
    sd = np.ones(d, np.float64)
    for j, c in enumerate(("f1", "f2", "f3"), start=1):
        m = math.fsum(spdf[f"s_{c}"]) / n_all
        var = math.fsum(spdf[f"ss_{c}"]) / n_all - m * m
        mu[j] = m
        sd[j] = math.sqrt(var) if var > 1e-18 else 1.0

    def _design(batch: pa.Table):
        n = batch.num_rows
        X = np.empty((n, d), np.float64)
        X[:, 0] = 1.0
        for j, c in enumerate(("f1", "f2", "f3"), start=1):
            X[:, j] = (batch[c].to_numpy(zero_copy_only=False)
                       - mu[j]) / sd[j]
        return X, batch["y"].to_numpy(zero_copy_only=False)

    def make_grad(w_b: np.ndarray):
        # w is 32 bytes: captured by value in the task closure — the
        # fetch-once broadcast cache is for dimension-sized state, not this
        def grad_partials(batch: pa.Table) -> pa.Table:
            X, y = _design(batch)
            p = 1.0 / (1.0 + np.exp(-(X @ w_b)))
            g = X.T @ (p - y)
            # clamped log-loss partial (diagnostic, not used in updates)
            eps = 1e-12
            loss = -float(np.sum(y * np.log(p + eps)
                                 + (1.0 - y) * np.log(1.0 - p + eps)))
            cols = {f"g{j}": pa.array([float(g[j])], pa.float64())
                    for j in range(d)}
            cols["loss"] = pa.array([loss], pa.float64())
            cols["n"] = pa.array([len(y)], pa.int64())
            return pa.table(cols)

        return grad_partials

    losses = []
    n_docs = 0
    for _ in range(iters):
        pdf = ensure_columns(
            feats.map_batches(make_grad(w.copy()), batch_format="pyarrow",
                              batch_size=8192).to_pandas(),
            {**{f"g{j}": "float64" for j in range(d)},
             "loss": "float64", "n": "int64"})
        n_docs = int(pdf["n"].sum())
        # fsum: exactly-rounded => independent of partial arrival order
        g = np.array([math.fsum(pdf[f"g{j}"]) for j in range(d)])
        losses.append(math.fsum(pdf["loss"]) / max(n_docs, 1))
        w = w - lr * g / max(n_docs, 1)

    w_final = w.copy()

    def acc_partials(batch: pa.Table) -> pa.Table:
        X, y = _design(batch)
        pred = (X @ w_final) > 0.0
        return pa.table({
            "correct": pa.array([int((pred == (y > 0.5)).sum())], pa.int64()),
            "n": pa.array([len(y)], pa.int64())})

    apdf = ensure_columns(
        feats.map_batches(acc_partials, batch_format="pyarrow",
                          batch_size=8192).to_pandas(),
        {"correct": "int64", "n": "int64"})
    acc = float(round6(float(int(apdf["correct"].sum()))
                       / float(max(int(apdf["n"].sum()), 1))))
    train_quality_classifier.last_losses = losses  # pytest hook
    return pa.table({
        "term": pa.array(list(_FEATURES), pa.string()),
        "weight": pa.array(np.asarray(round6(w), np.float64), pa.float64()),
        "train_acc": pa.array([acc] * d, pa.float64()),
        "n_docs": pa.array([n_docs] * d, pa.int64()),
    })
