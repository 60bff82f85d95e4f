"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded / feature-extracted by actor-pool ``map_batches`` stages.

The container has no image/audio codec libraries, so DECODE has two modes
(clearly marked):

- ``mode="real"`` decodes PNG payloads via the pure-Python stdlib-zlib
  codec in ``stages/png_codec`` (8-bit gray/RGB/RGBA, all five filters);
  any other format raises ``NotImplementedError`` naming the format — a
  production build would route those to PIL/libjpeg/av.
- ``mode="fake"`` is a deterministic batch-vectorized pseudo-decoder
  (SplitMix64 stream over the payload content hash) so the Ray-side
  plumbing — schema, batch sizing, actor signature, output layout — is
  real and testable end-to-end on arbitrary payload bytes.

Scale notes: payloads are large, so stages that carry them use SMALL
``batch_size`` (payload bytes × batch_size × concurrency must fit worker
heap); feature outputs drop the payload column as early as possible so only
KB-sized rows flow downstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.hashing import hash_arrow_strings, splitmix64

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


def _fake_decode_batch(payloads: pa.Array, out_pixels: int) -> np.ndarray:
    """Deterministic pseudo-decode, BATCH-vectorized (no per-row loop): one
    64-bit content hash per payload computed over the Arrow binary buffers,
    expanded to ``out_pixels`` bytes via a SplitMix64 counter stream. NOT a
    real codec — a stand-in with the same data shape. Returns
    uint8[n, out_pixels]."""
    n = len(payloads)
    if n == 0:
        return np.empty((0, out_pixels), np.uint8)
    h = hash_arrow_strings(payloads, seed=7)  # uint64[n], zero-copy buffers
    n_words = (out_pixels + 7) // 8
    ctr = np.arange(1, n_words + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    words = splitmix64((h[:, None] ^ ctr[None, :]).reshape(-1))
    return np.ascontiguousarray(words.reshape(n, n_words)) \
        .view(np.uint8)[:, :out_pixels]


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
        payloads = batch["payload"].combine_chunks()
        if self.mode == "real":
            pixels = self._real_decode(payloads)
        else:
            pixels = _fake_decode_batch(payloads, self.n_pixels).reshape(-1)
        pix_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(pixels, pa.uint8()), self.n_pixels
        )
        return pa.table({"doc_id": batch["doc_id"], "pixels": pix_arr})

    def _real_decode(self, payloads: pa.Array) -> np.ndarray:
        """Real decode path: pure-Python PNG (stages/png_codec — the one
        format decodable with stdlib zlib in this codec-less container),
        luma + nearest-neighbor resample to the fixed block. Decoding is
        inherently per-item (variable-size compressed payloads); any
        non-PNG payload raises NotImplementedError naming the format —
        a production build would route those to PIL/libjpeg/av."""
        from .png_codec import decode_png, is_png, to_gray_block

        out = np.empty((len(payloads), self.n_pixels), np.uint8)
        for i, p in enumerate(payloads):
            data = p.as_py()
            if data is None or not is_png(data):
                head = (data or b"")[:4]
                raise NotImplementedError(
                    f"real decode supports PNG only in this environment; "
                    f"payload {i} starts with {head!r} (JPEG/WebP/AV "
                    f"need external codecs)"
                )
            out[i] = to_gray_block(decode_png(data), self.side)
        return out.reshape(-1)


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


def multimodal_features_digest(sf_dir: str) -> pa.Table:
    """At-scale output mode for multimodal_features: the per-doc feature
    table streams to partitioned Parquet and only an order-invariant
    digest reaches the driver (rows-only gate, like multimodal_features
    itself — the fake decode has no SQL twin; pytest pins the digest
    against an independent driver recomputation and across reruns).
    Returns one row (n_docs, digest)."""
    import ray.data as rd

    from ..kernels.hashing import splitmix64
    from ..pipelines._sqlgen import mix_constant
    from ..pipelines._util import write_and_digest
    from .broadcast import cached_by_key

    mix = np.uint64(mix_constant(13))
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    per_doc = (
        ds.map_batches(attach_payload, batch_format="pyarrow", batch_size=1024)
        .map_batches(lambda b: cached_by_key("decode_fake_16",
                                             lambda: DecodeImage("fake", 16))(b),
                     batch_format="pyarrow", batch_size=256)
        .map_batches(lambda b: cached_by_key("img_features",
                                             ExtractImageFeatures)(b),
                     batch_format="pyarrow", batch_size=4096)
    )

    def digest_batch(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(did ^ mix)
        for col in ("feat_mean", "feat_std", "feat_edge"):
            v6 = np.rint(batch[col].to_numpy(zero_copy_only=False)
                         * 1e6).astype(np.int64).astype(np.uint64)
            h = splitmix64(h ^ v6)
        s = h.sum(dtype=np.uint64)
        return pa.table({
            "chk": pa.array(np.array([s], np.uint64).view(np.int64), pa.int64()),
            "n": pa.array([batch.num_rows], pa.int64())})

    n, digest, _ = write_and_digest(per_doc, sf_dir, "multimodal_features",
                                    digest_batch)
    return pa.table({"n_docs": pa.array([n], pa.int64()),
                     "digest": pa.array([digest], pa.int64())})
