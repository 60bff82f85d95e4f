"""Tokenization + multi-length n-gram enumeration + in-batch pre-aggregation.

The reference enumerates multi-length k-mers with a fused byte-scan
(reference src/sketch.cpp:103-171); here documents are rows, so n-gram windows
live entirely inside a row and never span blocks — the chunk-overlap machinery
of the GPU variant (reference src/sketch.cu:410) is eliminated by design
(SURVEY.md §2.7).

Everything is vectorized: Arrow C++ ``split_pattern`` / ``value_counts`` for
tokens, and a flat-array shift trick for word n-grams (token i joined with
tokens i+1..i+n-1, masked where the window crosses a document boundary).
In-batch pre-aggregation (``value_counts``) is the salted-pre-agg analog for
sketch updates: hot Zipf tokens cost O(1) per batch, not O(frequency)
(SURVEY.md §4 skew row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tokenize_column(text: pa.Array | pa.ChunkedArray, lowercase: bool = False) -> pa.ListArray:
    """string column → list<string> of whitespace tokens (split on single
    space; the corpus normalizes whitespace at extraction)."""
    col = text
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if lowercase:
        col = pc.utf8_lower(col)
    return pc.split_pattern(col, " ")


def flat_tokens(text: pa.Array | pa.ChunkedArray, lowercase: bool = False) -> tuple[pa.Array, np.ndarray]:
    """Returns (flat token array, int64 doc offsets of length n_docs+1)."""
    lists = tokenize_column(text, lowercase)
    flat = pc.list_flatten(lists)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
    return flat, offsets


def token_counts(text: pa.Array | pa.ChunkedArray, lowercase: bool = False) -> tuple[pa.Array, np.ndarray]:
    """Pre-aggregated (unique token, count) for a batch of documents."""
    flat, _ = flat_tokens(text, lowercase)
    vc = pc.value_counts(flat)
    return vc.field("values"), vc.field("counts").to_numpy()


def ngrams(
    text: pa.Array | pa.ChunkedArray,
    n: int,
    sep: str = " ",
    lowercase: bool = False,
) -> pa.Array:
    """All word n-grams of length ``n`` across a batch (one flat array).

    Windows never cross document boundaries (mask on the per-token doc id) —
    the row-oriented replacement for the reference's multi-length sliding
    window (reference src/sketch.cpp:103-171).
    """
    flat, offsets = flat_tokens(text, lowercase)
    total = len(flat)
    if n <= 1:
        return flat
    if total < n:
        return pa.array([], type=flat.type)
    doc_id = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
    m = total - n + 1
    valid = doc_id[:m] == doc_id[n - 1 :]
    shifted = [flat.slice(j, m) for j in range(n)]
    sep_arr = pa.scalar(sep, type=flat.type)  # match large_string vs string
    joined = pc.binary_join_element_wise(*shifted, sep_arr)
    return joined.filter(pa.array(valid))


def ngram_counts(
    text: pa.Array | pa.ChunkedArray,
    lengths: tuple[int, ...] = (2,),
    sep: str = " ",
    lowercase: bool = False,
) -> tuple[pa.Array, np.ndarray]:
    """Pre-aggregated (unique n-gram, count) over one or more window lengths —
    the multi-length analog of the reference's per-length sketches
    (reference src/sketch.cpp:28-31: one sketch per k-mer length; here the
    length is encoded in the key text itself)."""
    parts = [ngrams(text, n, sep, lowercase) for n in lengths]
    flat = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts])
    vc = pc.value_counts(flat)
    return vc.field("values"), vc.field("counts").to_numpy()
