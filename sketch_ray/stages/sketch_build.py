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
    """

    name: str
    kind: str
    column: str
    mode: str = "column"
    lengths: tuple[int, ...] = (2,)
    lowercase: bool = False
    params: dict[str, Any] = field(default_factory=dict)

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
            return col.to_numpy(zero_copy_only=False), None
        if self.mode == "column":
            return col, None
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


def _merge_group(group: pa.Table) -> pa.Table:
    """Merge all partial rows of one (sketch, bucket) group into one row."""
    blobs = group.column("partial").to_pylist()
    acc = sketch_from_bytes(blobs[0])
    for raw in blobs[1:]:
        acc.merge(sketch_from_bytes(raw))
    return pa.table(
        {
            "sketch": group.column("sketch").slice(0, 1),
            "kind": group.column("kind").slice(0, 1),
            "partial": pa.array([acc.to_bytes()], pa.large_binary()),
            "n_rows": pa.array([int(pa.compute.sum(group.column("n_rows")).as_py())], pa.int64()),
        }
    )


def merge_partials(partials_ds, fan_in: int = 64) -> dict[str, SketchBase]:
    """Tree-merge partial rows to one global sketch per name.

    One distributed round: hash-bucket partials into ``fan_in`` buckets per
    sketch, merge each bucket in a ``map_groups`` task (the only shuffle —
    payload is sketch-sized, not data-sized), then fold the ≤ fan_in
    surviving rows on the driver. Associativity/commutativity of merge makes
    the tree shape irrelevant to the result (tests/test_countmin.py)."""
    import pyarrow.compute as pc

    def add_bucket(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # spread partials across buckets round-robin-by-hash; any assignment
        # works (merge is order-insensitive), uniformity is all that matters
        h = np.arange(n, dtype=np.int64) % fan_in
        return batch.append_column("bucket", pa.array(h, pa.int64()))

    bucketed = partials_ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=fan_in * 4)
    reduced = bucketed.groupby(["sketch", "bucket"]).map_groups(
        lambda g: _merge_group(g.drop_columns(["bucket"])), batch_format="pyarrow"
    )
    out: dict[str, SketchBase] = {}
    for batch in reduced.iter_batches(batch_size=1024, batch_format="pyarrow"):
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
