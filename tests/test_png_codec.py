"""Pure-Python PNG codec + real-mode decode stage tests."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from sketch_ray.stages.png_codec import (decode_png, encode_png, is_png,
                                         to_gray_block)


def _rng_img(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, size=shape,
                                                dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    img = _rng_img((13, 7, channels), seed=channels)
    data = encode_png(img)
    assert is_png(data)
    out = decode_png(data)
    np.testing.assert_array_equal(out, img)


def _encode_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Forward-filter a (h, w, c) image with a chosen filter per row and wrap
    it in PNG chunks — exercises the decoder's filter inversion for all five
    types (the repo encoder only emits filter 0)."""
    h, w, c = img.shape
    stride = w * c
    recon = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        cur = recon[y]
        prev = recon[y - 1] if y else np.zeros(stride, np.int32)
        line = np.empty(stride, np.int32)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
            line[x] = (cur[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filters(filters):
    img = _rng_img((9, 5, 3), seed=sum(filters) + 11)
    out = decode_png(_encode_with_filters(img, filters))
    np.testing.assert_array_equal(out, img)


def test_png_unsupported_features_named():
    img = _rng_img((4, 4, 1), seed=3)
    data = bytearray(encode_png(img))
    data[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="magic"):
        decode_png(b"JFIF not a png")


def test_gray_block_resample():
    # constant image stays constant through luma + resample at any side
    img = np.full((10, 6, 3), 200, np.uint8)
    block = to_gray_block(img, side=8)
    assert block.shape == (64,)
    assert (block == 199).all() or (block == 200).all()  # integer luma of (200,200,200)


def test_decode_image_real_mode_png(ray_session):
    """DecodeImage(mode='real') decodes PNG payloads end-to-end; non-PNG
    payloads raise NotImplementedError naming the format."""
    from sketch_ray.stages.multimodal import DecodeImage

    imgs = [_rng_img((12, 9, 3), seed=i) for i in range(3)]
    batch = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "payload": pa.array([encode_png(im) for im in imgs], pa.large_binary()),
    })
    dec = DecodeImage(mode="real", side=8)
    out = dec(batch)
    assert out.column("pixels").type.list_size == 64
    want = np.stack([to_gray_block(im, 8) for im in imgs])
    got = np.asarray(out.column("pixels").to_pylist(), np.uint8)
    np.testing.assert_array_equal(got, want)
    # determinism across instances
    out2 = DecodeImage(mode="real", side=8)(batch)
    assert out.column("pixels").to_pylist() == out2.column("pixels").to_pylist()

    bad = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "payload": pa.array([b"\xff\xd8\xff\xe0 jpeg-ish"], pa.large_binary()),
    })
    with pytest.raises(NotImplementedError, match="PNG only"):
        dec(bad)
