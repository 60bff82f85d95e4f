"""FASTA ingestion — the reference's native input format.

Reference semantics (src/fasta.cpp:77-87, src/sketch.cpp:113-129): the corpus
is a byte stream; ``>`` header lines are skipped; a k-mer window lives inside
one line and resets at any non-ACGT byte. Ray-side: ``read_text`` already
yields lines (distributed, splits on newlines), so a row = one sequence line
and windows can never cross rows — the same documents-are-rows property that
removes the reference GPU variant's chunk-overlap machinery (SURVEY.md §2.7).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def read_fasta(path: str):
    """FASTA file(s) → Dataset with a single ``seq`` (large_string) column of
    sequence lines (headers dropped, empty lines dropped)."""
    import ray.data as rd

    def seq_lines(batch: pa.Table) -> pa.Table:
        col = batch["text"].combine_chunks()
        is_header = pc.starts_with(col, ">")
        nonempty = pc.greater(pc.utf8_length(col), 0)
        keep = pc.and_(pc.invert(is_header), nonempty)
        return pa.table({"seq": col.filter(keep).cast(pa.large_string())})

    return rd.read_text(path).map_batches(seq_lines, batch_format="pyarrow", batch_size=8192)
