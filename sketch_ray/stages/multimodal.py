"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded / feature-extracted by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the DECODE step is stubbed two
ways (clearly marked):

- ``mode="real"`` raises ``NotImplementedError`` (would use PIL/av in a
  production image build);
- ``mode="fake"`` is a deterministic pseudo-decoder (hash-expanded pixel
  block) so the Ray-side plumbing — schema, batch sizing, actor signature,
  output layout — is real and testable end-to-end.

Scale notes: payloads are large, so stages that carry them use SMALL
``batch_size`` (payload bytes × batch_size × concurrency must fit worker
heap); feature outputs drop the payload column as early as possible so only
KB-sized rows flow downstream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

PAYLOAD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("payload", pa.large_binary()),
        ("media_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def attach_payload(batch: pa.Table) -> pa.Table:
    """documents batch -> multimodal batch: the text bytes stand in for an
    encoded image payload (deterministic), with fake-but-typed metadata."""
    text = batch["text"].combine_chunks()
    payload = text.cast(pa.large_binary())
    n = len(batch)
    sizes = pa.compute.binary_length(payload).to_numpy(zero_copy_only=False).astype(np.int64)
    width = (16 + (sizes % 16)).astype(np.int32)
    height = (16 + (sizes // 16 % 16)).astype(np.int32)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": payload,
            "media_type": pa.array(["image/fake"] * n, pa.string()),
            "width": pa.array(width, pa.int32()),
            "height": pa.array(height, pa.int32()),
        }
    )


def _fake_decode_one(payload: bytes, out_pixels: int) -> np.ndarray:
    """Deterministic pseudo-decode: BLAKE2b-expand payload bytes into a fixed
    pixel block. NOT a real codec — a stand-in with the same data shape."""
    h = hashlib.blake2b(payload, digest_size=32).digest()
    reps = (out_pixels + 31) // 32
    raw = (h * reps)[:out_pixels]
    return np.frombuffer(raw, dtype=np.uint8)


class DecodeImage:
    """Actor-pool decode stage: ``map_batches(DecodeImage,
    fn_constructor_args=(mode, side), concurrency=N, batch_size=SMALL)``.

    Emits fixed-size pixel blocks as a fixed_size_list column; drops the
    payload so downstream stages are narrow."""

    def __init__(self, mode: str = "fake", side: int = 16):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.side = side
        self.n_pixels = side * side

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real image decode needs an image codec (PIL/libjpeg), not "
                "available in this environment; use mode='fake'"
            )
        payloads = batch["payload"].combine_chunks()
        pixels = np.concatenate(
            [_fake_decode_one(p.as_py(), self.n_pixels) for p in payloads]
        ) if len(batch) else np.empty(0, np.uint8)
        pix_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(pixels, pa.uint8()), self.n_pixels
        )
        return pa.table({"doc_id": batch["doc_id"], "pixels": pix_arr})


class ExtractImageFeatures:
    """Actor-pool feature stage over decoded pixel blocks: vectorized
    mean/std/edge-energy per image (one numpy pass per batch)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["pixels"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(batch)
        width = col.type.list_size
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(n, width) if n else np.empty((0, width))
        mean = mat.mean(axis=1) if n else np.empty(0)
        std = mat.std(axis=1) if n else np.empty(0)
        edge = np.abs(np.diff(mat, axis=1)).mean(axis=1) if n else np.empty(0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "feat_mean": pa.array(np.round(mean, 6), pa.float64()),
                "feat_std": pa.array(np.round(std, 6), pa.float64()),
                "feat_edge": pa.array(np.round(edge, 6), pa.float64()),
            }
        )


def sample_frames(batch: pa.Table, every: int = 4) -> pa.Table:
    """Frame-sampling stage shape for video-like payload lists: keeps every
    ``every``-th row (deterministic row-subsample inside the batch — a real
    video pipeline would explode frames per payload first)."""
    idx = np.arange(0, len(batch), every)
    return batch.take(idx)


def multimodal_features(sf_dir: str) -> pa.Table:
    """documents -> payload attach -> actor-pool fake decode -> feature
    extract. Rows-only gated (fake decode has no SQL equivalent); the
    pipeline shape (small batches through the payload stage, narrow rows
    after decode) is the real thing."""
    import ray.data as rd

    from .broadcast import cached_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # the fake decoder's state is config-only, so both stages run as
    # stateless tasks with per-worker memoized instances (warm worker pool,
    # no actor spin-up). A REAL decoder holding heavy state (codec context,
    # model weights on an accelerator) would use the actor-pool form:
    #   .map_batches(DecodeImage, fn_constructor_args=(mode, side),
    #                concurrency=(1, N), batch_size=SMALL)
    out = (
        ds.map_batches(attach_payload, batch_format="pyarrow", batch_size=1024)
        .map_batches(lambda b: cached_by_key("decode_fake_16", lambda: DecodeImage("fake", 16))(b),
                     batch_format="pyarrow", batch_size=256)
        .map_batches(lambda b: cached_by_key("img_features", ExtractImageFeatures)(b),
                     batch_format="pyarrow", batch_size=4096)
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def payload_stats(sf_dir: str) -> pa.Table:
    """Payload byte sizes (exact, oracle-gated vs octet_length): proves the
    binary-column plumbing carries the exact source bytes."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        b = attach_payload(batch)
        sizes = pa.compute.binary_length(b["payload"].combine_chunks()).cast(pa.int64())
        return pa.table({"doc_id": b["doc_id"], "payload_bytes": sizes})

    df = ds.map_batches(stats, batch_format="pyarrow", batch_size=8192).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
