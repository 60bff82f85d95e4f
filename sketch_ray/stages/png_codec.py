"""Minimal pure-Python PNG codec (stdlib zlib only) for the multimodal
``mode="real"`` decode path.

The container ships no image libraries, but PNG's format is fully public
(RFC 2083 / W3C PNG spec): IHDR/IDAT/IEND chunks, zlib-compressed
scanlines, five per-scanline byte filters. This module implements the
subset a real pipeline stage needs deterministically:

- ``decode_png``: 8-bit grayscale / gray+alpha / RGB / RGBA, non-interlaced
  (interlace 0), all five filter types (None/Sub/Up/Average/Paeth),
  unfiltered with vectorized numpy per scanline (the filter recurrences are
  sequential in x for Sub/Average/Paeth, so those loop over PIXELS of one
  row at a time — bounded work, never over the whole image byte-by-byte).
- ``encode_png``: filter-0 writer used by tests and fixture generation.

Anything outside that subset (16-bit, palette, interlaced) raises
``ValueError`` with the offending feature named — the honest boundary of a
codec written for this environment.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def is_png(data: bytes) -> bool:
    return data[:8] == _MAGIC


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (height, width, channels).

    Supports bit depth 8, color types 0/2/4/6, interlace 0."""
    if not is_png(data):
        raise ValueError("not a PNG (bad magic)")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = raw.reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        f = int(filters[y])
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            line = cur
        elif f == 2:  # Up
            line = cur + prev
        elif f == 1:  # Sub — sequential in x; vectorize across channels,
            # loop over the width only (cumulative per byte-lane)
            line = cur.reshape(width, bpp)
            line = np.cumsum(line, axis=0, dtype=np.int64).reshape(stride)
        elif f == 3:  # Average
            line = np.empty(stride, np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = cur[x] + ((a + prev[x]) >> 1)
                line[x] &= 0xFF
        elif f == 4:  # Paeth
            line = np.empty(stride, np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                line[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = (line & 0xFF).astype(np.uint8)
    return out.reshape(height, width, channels)


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, c) array -> PNG bytes (filter 0, one IDAT)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * c)], axis=1
    ).tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def to_gray_block(img: np.ndarray, side: int) -> np.ndarray:
    """(h, w, c) uint8 -> (side*side,) uint8: integer BT.601 luma, then
    nearest-neighbor resample to the fixed side×side block every decode
    stage emits (same output contract as the fake decoder)."""
    c = img.shape[2]
    if c >= 3:
        g = ((77 * img[:, :, 0].astype(np.uint32)
              + 150 * img[:, :, 1].astype(np.uint32)
              + 29 * img[:, :, 2].astype(np.uint32)) >> 8).astype(np.uint8)
    else:
        g = img[:, :, 0]
    h, w = g.shape
    ys = (np.arange(side) * h) // side
    xs = (np.arange(side) * w) // side
    return g[np.ix_(ys, xs)].reshape(-1)
