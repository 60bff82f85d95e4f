"""html → text extraction as a vectorized, deterministic map_batches stage.

The north_rule per-row invariant: byte-identical extracted text per url across
runs and parallelism levels (reference analog: all three CPU implementations of
the FASTA parse produce identical outputs — reference src/fasta.cpp:60-116,
verified in BASELINE.md). The whole pipeline runs in Arrow C++ re2 kernels
(``pc.replace_substring_regex``), so there is no per-row Python and no
locale/threading nondeterminism.

Order of operations (inverse of sources/pages.py:_wrap_html):
 1. drop <script>...</script>, <style>...</style>, <head>...</head> blocks
 2. drop <!-- comments -->
 3. strip remaining tags
 4. unescape the five standard entities (&amp; last)
 5. collapse whitespace runs to single spaces, trim
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?is)<head[^>]*>.*?</head>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
]
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#x27;", "'"), ("&#39;", "'"), ("&amp;", "&")]


def extract_text_array(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """binary/string array of HTML → large_string array of extracted text."""
    col = html
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        col = col.cast(pa.large_string())
    for pat, rep in _STEPS:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=rep)
    for ent, ch in _ENTITIES:
        col = pc.replace_substring(col, pattern=ent, replacement=ch)
    col = pc.replace_substring_regex(col, pattern=r"\s+", replacement=" ")
    col = pc.utf8_trim_whitespace(col)
    return col.cast(pa.large_string())


def extract_text(batch: pa.Table, html_col: str = "html", out_col: str = "extracted_text") -> pa.Table:
    """map_batches(batch_format="pyarrow") stage: adds the extracted column."""
    return batch.append_column(out_col, extract_text_array(batch[html_col]))


def host_of_url(url: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized url → host (north_star: distinct-host cardinality; the
    host is parsed in a stateless map, RE2 kernel, no per-row Python)."""
    col = url
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ext = pc.extract_regex(col, r"^[a-z][a-z0-9+.-]*://(?P<host>[^/:?#]+)")
    return pc.struct_field(ext, "host")


def add_host(batch: pa.Table, url_col: str = "url", out_col: str = "host") -> pa.Table:
    """map_batches stage: append the parsed host column."""
    return batch.append_column(out_col, host_of_url(batch[url_col]))
