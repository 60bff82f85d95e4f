"""Distributed sketch build: actor-pool map_batches → tiny merge shuffle.

Architecture (SURVEY.md §3.4 / §7.2): every input block flows through a
``map_batches`` stage whose callable-class workers turn a batch of rows into
one serialized *partial sketch* row per sketch spec. Partials are bounded-size
(KB–MB) regardless of input size, so the reduce is a tiny shuffle:
``groupby(sketch, bucket).map_groups(merge)`` tree rounds, then a driver fold
over ≤ ``fan_in`` rows. No cross-worker mutable state — the architectural
inverse of the reference's device-global atomics (reference src/sketch.cu:145-149).

Scale notes (100 TB thinking):
- partial rows per sketch = number of input batches; each merge round reduces
  the row count by ``fan_in``; rounds = ceil(log_fan_in(n_batches)).
- hot keys never shuffle: in-batch ``value_counts`` pre-aggregation means a
  token appearing 10^9 times contributes one (key, count) pair per batch
  (SURVEY.md §4 skew row).
- updates are weighted conservative updates, so pre-aggregation does not
  change CM-CU semantics (kernels/countmin.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import make_sketch, sketch_from_bytes
from ..kernels.base import SketchBase
from .tokenize import ngram_counts, token_counts

PARTIAL_SCHEMA = pa.schema(
    [
        ("sketch", pa.string()),
        ("kind", pa.string()),
        ("partial", pa.large_binary()),
        ("n_rows", pa.int64()),
    ]
)


@dataclass(frozen=True)
class SketchSpec:
    """What to sketch over which column.

    mode:
      - "tokens":  whitespace tokens of a text column (pre-aggregated)
      - "ngrams":  word n-grams of ``lengths`` (pre-aggregated)
      - "column":  raw column values as keys (for HLL/Bloom/CM over e.g. url)
      - "numeric": numeric column values (for KLL/t-digest)
      - "vectors": list<float> embedding column → (n, d) float rows
                   (for the Frequent Directions matrix sketch; d from
                   ``params["d"]``)
      - "weighted": raw column values as UNIQUE item keys, integer weights
                   from ``weight_col`` (for priority sampling — weight is a
                   fixed per-item attribute, not an occurrence count)
    """

    name: str
    kind: str
    column: str
    mode: str = "column"
    lengths: tuple[int, ...] = (2,)
    lowercase: bool = False
    params: dict[str, Any] = field(default_factory=dict)
    weight_col: str | None = None  # for mode="weighted"
    # turnstile retraction (delete-capable kinds, e.g. "kllpm"): every row
    # inserts +1; rows where ``batch[delete_eq[0]] == delete_eq[1]`` emit an
    # ADDITIONAL −1, so each delete retracts a value that was inserted (the
    # KLL± contract)
    delete_eq: tuple[str, str] | None = None

    def make(self) -> SketchBase:
        return make_sketch(self.kind, **self.params)

    def extract(self, batch: pa.Table):
        """→ (keys_or_values, counts_or_None) for this batch."""
        col = batch[self.column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self.mode == "tokens":
            return token_counts(col, self.lowercase)
        if self.mode == "ngrams":
            return ngram_counts(col, self.lengths, lowercase=self.lowercase)
        if self.mode == "numeric":
            vals = col.to_numpy(zero_copy_only=False)
            if self.delete_eq is not None:
                dcol, dval = self.delete_eq
                c = batch[dcol]
                if isinstance(c, pa.ChunkedArray):
                    c = c.combine_chunks()
                is_del = pc.fill_null(pc.equal(c, dval), False) \
                    .to_numpy(zero_copy_only=False)
                dels = vals[is_del]
                return (np.concatenate([vals, dels]),
                        np.concatenate([np.ones(len(vals), np.int64),
                                        np.full(len(dels), -1, np.int64)]))
            return vals, None
        if self.mode == "column":
            return col, None
        if self.mode == "weighted":
            wc = batch[self.weight_col]
            if isinstance(wc, pa.ChunkedArray):
                wc = wc.combine_chunks()
            return (col.to_numpy(zero_copy_only=False).astype(np.int64),
                    wc.to_numpy(zero_copy_only=False).astype(np.int64))
        if self.mode == "vectors":
            flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
            return flat.astype(np.float64).reshape(-1, int(self.params["d"])), None
        raise ValueError(f"unknown mode {self.mode}")

    def update_from_batch(self, sk: SketchBase, batch: pa.Table) -> None:
        keys, counts = self.extract(batch)
        sk.update(keys, counts)


class SketchUpdate:
    """Callable class for ``map_batches(SketchUpdate, fn_constructor_args=(specs,),
    concurrency=N, batch_format="pyarrow")`` — the stateful actor-pool stage
    (SURVEY.md §2.3 T1). Emits one partial-sketch row per spec per batch."""

    def __init__(self, specs: list[SketchSpec]):
        self.specs = specs

    def __call__(self, batch: pa.Table) -> pa.Table:
        names, kinds, blobs, n_rows = [], [], [], []
        for spec in self.specs:
            sk = spec.make()
            spec.update_from_batch(sk, batch)
            names.append(spec.name)
            kinds.append(spec.kind)
            blobs.append(sk.to_bytes())
            n_rows.append(batch.num_rows)
        return pa.table(
            {
                "sketch": pa.array(names, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "partial": pa.array(blobs, pa.large_binary()),
                "n_rows": pa.array(n_rows, pa.int64()),
            }
        )


def build_partials(
    ds,
    specs: list[SketchSpec],
    batch_size: int = 4096,
    concurrency=None,
):
    """input Dataset → Dataset of partial-sketch rows (streaming, no
    materialization). ``concurrency=None`` → stateless tasks (elastic);
    an int → actor pool of that size."""
    kw: dict[str, Any] = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if concurrency is not None:
        # stateful actor pool (specs built once per actor)
        return ds.map_batches(
            SketchUpdate, fn_constructor_args=(specs,), concurrency=concurrency, **kw
        )
    # stateless tasks: ship the (tiny) spec list in the task closure
    update = SketchUpdate(specs)
    return ds.map_batches(lambda b: update(b), **kw)


def _merge_batch(batch: pa.Table) -> pa.Table:
    """Fold every partial row in one batch down to one row per sketch name.

    Merge is associative + commutative (tests/test_countmin.py /
    test_sketches.py), so ANY grouping of rows into batches yields the same
    global result — which means the reduce needs NO shuffle at all: Ray
    Data's batch coalescing bundles upstream partial rows into batches and
    each task folds its bundle, shrinking the row count ×fan_in per round."""
    names = batch.column("sketch").to_pylist()
    kinds = batch.column("kind").to_pylist()
    blobs = batch.column("partial").to_pylist()
    rows = batch.column("n_rows").to_pylist()
    accs: dict[str, SketchBase] = {}
    kind_of: dict[str, str] = {}
    n_of: dict[str, int] = {}
    for name, kind, raw, n in zip(names, kinds, blobs, rows):
        if name in accs:
            accs[name].merge(sketch_from_bytes(raw))
            n_of[name] += n
        else:
            accs[name] = sketch_from_bytes(raw)
            kind_of[name] = kind
            n_of[name] = n
    out_names = sorted(accs)
    return pa.table(
        {
            "sketch": pa.array(out_names, pa.string()),
            "kind": pa.array([kind_of[n] for n in out_names], pa.string()),
            "partial": pa.array([accs[n].to_bytes() for n in out_names], pa.large_binary()),
            "n_rows": pa.array([n_of[n] for n in out_names], pa.int64()),
        }
    )


def merge_partials(partials_ds, fan_in: int = 64, rounds: int = 1) -> dict[str, SketchBase]:
    """Reduce partial rows to one global sketch per name — WITHOUT a shuffle.

    Each round is a narrow ``map_batches(batch_size=fan_in)`` that folds
    ~fan_in partial rows per task (any grouping is valid: merge is
    associative + commutative, so the tree shape is irrelevant to the
    result). ``rounds`` controls driver fan-in: after r rounds the driver
    folds ≈ n_partials / fan_in^r rows. One round suffices up to
    fan_in² partials; at 10^12-doc scale use rounds=2-3 (cost is a narrow
    pass over KB-sized rows, never an all-to-all)."""
    for _ in range(rounds):
        partials_ds = partials_ds.map_batches(
            _merge_batch, batch_format="pyarrow", batch_size=fan_in
        )
    out: dict[str, SketchBase] = {}
    for batch in partials_ds.iter_batches(batch_size=fan_in, batch_format="pyarrow"):
        for name, raw in zip(batch.column("sketch").to_pylist(), batch.column("partial").to_pylist()):
            sk = sketch_from_bytes(raw)
            if name in out:
                out[name].merge(sk)
            else:
                out[name] = sk
    return out


def build_sketches(
    ds,
    specs: list[SketchSpec],
    batch_size: int = 4096,
    concurrency=None,
    fan_in: int = 64,
) -> dict[str, SketchBase]:
    """read → partials → tree merge → {name: global sketch}."""
    return merge_partials(build_partials(ds, specs, batch_size, concurrency), fan_in)
