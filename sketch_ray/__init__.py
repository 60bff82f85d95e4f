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
