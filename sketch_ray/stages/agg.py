"""Sketches as native Ray Data aggregates: ``ds.groupby(k).aggregate(SketchAgg(...))``.

This is the one-call grouped-sketch API promised in SURVEY.md §7.1 step 3:
the mergeable-sketch protocol (init / update_batch / merge / finalize) maps
1:1 onto ``ray.data.aggregate.AggregateFn``, so per-group sketches ride
Ray's own aggregate machinery — partial accumulation per block, associative
merge across blocks, finalize at the end. Works for global aggregates
(``groupby(None)``) and per-key grouped sketches alike.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa

from ray.data.aggregate import AggregateFn

from .sketch_build import SketchSpec


def _as_arrow(block: Any) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


class SketchAgg(AggregateFn):
    """Aggregate a :class:`SketchSpec` over each group.

    ``finalize`` selects the output per group:
      - ``"bytes"``      serialized sketch (for later merging / querying)
      - ``"estimate"``   HLL cardinality estimate (float -> int64)
      - ``("quantile", q)``  KLL/t-digest quantile value
      - any callable ``sketch -> value``
    """

    def __init__(self, spec: SketchSpec, alias_name: str | None = None,
                 finalize: Any = "bytes"):
        if finalize == "bytes":
            fin: Callable = lambda sk: sk.to_bytes()
        elif finalize == "estimate":
            fin = lambda sk: int(round(sk.estimate()))
        elif isinstance(finalize, tuple) and finalize[0] == "quantile":
            q = float(finalize[1])
            fin = lambda sk: float(np.asarray(sk.quantile(np.array([q])))[0])
        elif callable(finalize):
            fin = finalize
        else:
            raise ValueError(f"unknown finalize {finalize!r}")

        def accumulate_block(sk, block):
            spec.update_from_batch(sk, _as_arrow(block))
            return sk

        super().__init__(
            init=lambda k: spec.make(),
            merge=lambda a, b: a.merge(b),
            accumulate_block=accumulate_block,
            finalize=fin,
            name=alias_name or f"{spec.kind}({spec.column})",
        )
