"""Vectorized, seed-explicit 64-bit hashing for sketch keys.

The reference uses an H3 hash family seeded by an *unseeded* ``rand()``
(reference: src/sketch.cpp:79-84) — deterministic only by accident. Here every
hash is derived from an explicit ``seed`` so any worker process regenerates the
identical hash family (SURVEY.md §7.0 "Seeds/config explicit").

Two layers:

- ``hash_bytes_columnar`` — FNV-1a-64 over an Arrow string/binary column's raw
  buffers (zero-copy), finished with a splitmix64 avalanche. O(max_len)
  vectorized numpy passes per batch, no per-row Python.
- ``row_hashes`` — Kirsch–Mitzenmacher double hashing: ``h_j = h1 + j * h2``
  derives the d row-hashes of a Count-Min / Bloom family from one 64-bit hash
  (published result: preserves the CM/Bloom guarantees).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)

# Unsigned overflow wraps silently in numpy arrays, which is exactly what we
# want; numpy only warns for Python-scalar ops, so keep everything ndarray.
_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain, Steele et al.); vectorized."""
    x = x.astype(np.uint64, copy=True)
    x += _U64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    z = z ^ (z >> _U64(31))
    return z


def _seed_basis(seed: int) -> np.uint64:
    return _FNV_OFFSET ^ splitmix64(np.array([seed], dtype=np.uint64))[0]


def hash_bytes_columnar(values: np.ndarray, offsets: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded 64-bit polynomial hash of ``n`` variable-length byte strings
    stored columnar, fully vectorized (no per-position Python loop).

    ``h(s) = mix( Σ_i s[i] · P^(len−1−i)  (mod 2^64)  ⊕  len·P2  ⊕  seed )``

    values: uint8 array (concatenated bytes), offsets: int64[n+1] monotone
    offsets into ``values``. Returns uint64[n]. Cost: ~5 vectorized passes
    over the total byte count + one cumsum — O(total_bytes), loop-free.
    """
    offsets = offsets.astype(np.int64, copy=False)
    n = len(offsets) - 1
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    base = offsets[0]
    lens = offsets[1:] - offsets[:-1]
    total = int(offsets[-1] - base)
    if total == 0:
        return splitmix64(np.full(n, _seed_basis(seed), dtype=np.uint64))
    vals = values[base : offsets[-1]].astype(np.uint64)
    max_len = int(lens.max())
    pow_table = np.ones(max_len + 1, dtype=np.uint64)
    if max_len:
        np.cumprod(np.full(max_len, _FNV_PRIME, dtype=np.uint64), out=pow_table[1:])
    # position-from-end of every byte: end_of_its_segment - 1 - absolute_pos
    pos_from_end = np.repeat(offsets[1:], lens) - np.arange(base + 1, base + total + 1, dtype=np.int64)
    contrib = vals * pow_table[pos_from_end]
    csum = np.concatenate([np.zeros(1, dtype=np.uint64), np.cumsum(contrib, dtype=np.uint64)])
    seg = csum[offsets[1:] - base] - csum[offsets[:-1] - base]  # wraps mod 2^64: fine
    h = seg ^ (lens.astype(np.uint64) * _U64(0x94D049BB133111EB)) ^ _seed_basis(seed)
    return splitmix64(h)


def hash_arrow_strings(arr: pa.Array, seed: int = 0) -> np.ndarray:
    """Hash a pyarrow string/large_string/binary array → uint64[n], zero-copy
    on the Arrow buffers. Nulls hash as empty strings."""
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 1:
            arr = arr.chunk(0)
        else:
            arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        off_dtype = np.int64
    elif pa.types.is_string(t) or pa.types.is_binary(t):
        off_dtype = np.int32
    else:
        arr = arr.cast(pa.string())
        off_dtype = np.int32
    buffers = arr.buffers()
    # buffers: [validity, offsets, data]
    offsets = np.frombuffer(buffers[1], dtype=off_dtype, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    return hash_bytes_columnar(data, offsets, seed)


def hash_strings(keys, seed: int = 0) -> np.ndarray:
    """Hash a sequence of python strings / bytes (or a pa.Array) → uint64[n]."""
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        return hash_arrow_strings(keys, seed)
    if isinstance(keys, np.ndarray) and keys.dtype.kind in "ui":
        return hash_ints(keys, seed)
    arr = pa.array([k.decode() if isinstance(k, (bytes, bytearray)) else str(k) for k in keys], type=pa.string())
    return hash_arrow_strings(arr, seed)


def hash_ints(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Hash an integer array → uint64[n] (splitmix64 with seeded offset)."""
    h = x.astype(np.uint64, copy=True)
    h ^= _seed_basis(seed)
    return splitmix64(h)


def row_hashes(h: np.ndarray, depth: int) -> np.ndarray:
    """Kirsch–Mitzenmacher: derive ``depth`` hashes (uint64[depth, n]) from one."""
    h1 = h.astype(np.uint64, copy=False)
    h2 = splitmix64(h1) | _U64(1)
    j = np.arange(depth, dtype=np.uint64)[:, None]
    return h1[None, :] + j * h2[None, :]


def clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 array, vectorized (6 halving passes)."""
    x = x.astype(np.uint64, copy=True)
    n = np.full(x.shape, 64, dtype=np.int64)
    shift = np.zeros_like(n)
    for s in (32, 16, 8, 4, 2, 1):
        su = _U64(s)
        mask = (x >> su) != 0
        x[mask] >>= su
        shift[mask] += s
    nz = x != 0
    n[nz] = 63 - shift[nz]
    return n
