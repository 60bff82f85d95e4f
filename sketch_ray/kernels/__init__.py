"""Pure-numpy mergeable sketch kernels (no Ray dependency).

The reference implements one kernel — Count-Min with conservative update
(reference src/sketch.cpp:144-158) — in seven physical variants. Here the
kernel layer is a registry of mergeable sketches sharing one protocol
(SURVEY.md §2.8): CountMin, CountMinCU, CountSketch (AMS), HLL, BloomFilter,
KLL, KLL± (turnstile), TDigest, MisraGries (top-k), BottomK (KMV sample).
"""

from .base import MergeableSketch, SketchBase, make_sketch, registry, sketch_from_bytes
from .bloom import BloomFilter
from .bottomk import BottomK
from .cbloom import CountingBloom
from .countmin import CountMin, CountMinCU
from .countsketch import CountSketch
from .ddsketch import DDSketch
from .dyadic import DyadicCM
from .ehist import ExpHistogram, ExpHistogramSum
from .freqdirs import FrequentDirections
from .hashing import hash_arrow_strings, hash_ints, hash_strings, row_hashes, splitmix64
from .hll import HLL
from .kll import KLL
from .kllpm import KLLPM
from .lincount import LinearCounter
from .prisample import PrioritySample
from .spacesaving import MisraGries
from .tdigest import TDigest

__all__ = [
    "MergeableSketch", "SketchBase", "make_sketch", "registry", "sketch_from_bytes",
    "CountMin", "CountMinCU", "CountSketch", "CountingBloom", "DDSketch", "DyadicCM", "ExpHistogram", "ExpHistogramSum", "FrequentDirections", "HLL", "BloomFilter", "BottomK", "KLL", "KLLPM", "LinearCounter", "MisraGries", "PrioritySample", "TDigest",
    "hash_strings", "hash_arrow_strings", "hash_ints", "row_hashes", "splitmix64",
]
