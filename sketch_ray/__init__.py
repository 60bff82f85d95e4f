"""sketch_ray — a Ray-Data-native distributed sketch / approximate-aggregation
engine with the query and data-processing capabilities of HansLehnert/sketch,
rebuilt from scratch on ray.data.Dataset pipelines (NOT a port).

Layout:
- ``kernels/``   pure-numpy mergeable sketches (CM, CM-CU, HLL, Bloom, KLL, t-digest)
- ``sources/``   fixture generators + readers (Common-Crawl-style ``pages`` table)
- ``stages/``    map_batches stages (extract, tokenize, sketch-build actors, merge)
- ``pipelines/`` end-to-end pipelines (heavy hitters, emerging HH, dedup, ANN, ...)
- ``state/``     checkpoint / resume / run manifest

Never calls ``ray.init``/``ray.shutdown`` — session ownership belongs to the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

from ._alloc import tune_allocator as _tune_allocator

# Applied in every process that imports sketch_ray — driver AND each Ray
# worker (stage callables reference this package, so deserializing them
# imports it). See _alloc.py for the measured rationale.
_tune_allocator()


def _quiet_schema_hash_warning() -> None:
    """Suppress Ray Data's benign "Failed to hash the schemas" warning.

    The read-only testdata parquet files carry ``pandas`` schema metadata
    that pyarrow's ``Schema.__hash__`` rejects (``unhashable type: 'dict'``),
    so every block unification logs one warning line per worker — pure noise
    (Ray falls back to full schema comparison, results are unaffected, and
    the inputs cannot be rewritten). Filter that one message, nothing else."""
    import logging

    class _Drop(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return not str(record.getMessage()).startswith(
                "Failed to hash the schemas")

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow").addFilter(_Drop())


_quiet_schema_hash_warning()
