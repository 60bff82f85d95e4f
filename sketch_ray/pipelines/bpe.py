"""BPE tokenizer training over the corpus — the standard scale shape.

Real BPE trainers (HuggingFace tokenizers, SentencePiece-BPE) never run
the merge loop over the raw corpus: ONE distributed pass collects word
frequencies (vocab-sized output, the same salted two-level aggregation as
every exact count in this engine), and the greedy merge loop then runs
over the frequency-weighted word list — vocabulary size is independent of
corpus size, so at 100 TB only the counting pass grows. The merge loop is
the textbook algorithm (Sennrich et al. 2016): repeatedly merge the
most-frequent adjacent symbol pair, ties broken lexicographically
(deterministic across runs and machines).

Words are space-delimited tokens with an end-of-word sentinel appended
(``</w>``) so merges cannot cross word boundaries — the classic
formulation. Output is the ordered merge list plus the resulting symbol
vocabulary; ``bpe_encode`` applies the merges to text for the tokens-per-
doc statistic (the compression measurement a tokenizer is judged on).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EOW = "</w>"


def bpe_train(sf_dir: str, n_merges: int = 50) -> dict:
    """Train ``n_merges`` BPE merges on the documents corpus. Returns
    ``{"merges": [(a, b), ...], "vocab": [symbol, ...]}`` with the merge
    list in learned order and vocab sorted. Deterministic: greedy
    max-count merge with (count desc, pair asc) tie-break."""
    from .exact import token_counts_ds

    wc = token_counts_ds(sf_dir).to_pandas()  # ONE distributed pass, vocab-sized
    return _train_from_wc(wc, n_merges)


def _train_from_wc(wc: pd.DataFrame, n_merges: int) -> dict:
    words = [tuple(w) + (_EOW,) for w in wc["token"]]
    counts = wc["cnt"].to_numpy(np.int64)
    return _bpe_merge_loop(words, counts, n_merges)


def _bpe_merge_loop(words: list[tuple[str, ...]], counts: np.ndarray,
                    n_merges: int) -> dict:
    """Greedy merge loop over the frequency-weighted word list (driver-side
    by design: len(words) == vocabulary size, not corpus size)."""
    from collections import Counter

    words = list(words)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, c in zip(words, counts):
            for i in range(len(w) - 1):
                pair_counts[(w[i], w[i + 1])] += int(c)
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words = []
        for w in words:
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == best[0] and w[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words.append(tuple(out))
        words = new_words
    vocab = sorted({s for w in words for s in w} | {a + b for a, b in merges})
    return {"merges": merges, "vocab": vocab}


def bpe_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply merges (in learned priority order) to one word."""
    sym = list(word) + [_EOW]
    rank = {m: i for i, m in enumerate(merges)}
    while len(sym) > 1:
        pairs = [(rank.get((sym[i], sym[i + 1]), len(rank)), i)
                 for i in range(len(sym) - 1)]
        r, i = min(pairs)
        if r == len(rank):
            break
        sym[i:i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_token_stats(sf_dir: str, n_merges: int = 50) -> pa.Table:
    """Per-document BPE token counts under the corpus-trained merges — the
    compression statistic a tokenizer is judged on (chars per BPE token).

    Scale shape: train once (above), build the word -> n_subtokens map for
    the VOCABULARY (driver-side, vocab-sized), broadcast it as sorted hash
    arrays, and count per doc in one streaming map_batches via searchsorted
    — the corpus is never re-tokenized per merge."""
    import ray
    import pyarrow.compute as pc

    from .exact import token_counts_ds, _read as _read_exact
    from ..kernels.hashing import hash_arrow_strings
    from ..stages.broadcast import cached
    from ..stages.tokenize import flat_tokens
    from ._util import ensure_columns

    wc = token_counts_ds(sf_dir).to_pandas()  # ONE pass shared by train + encode map
    model = _train_from_wc(wc, n_merges)
    n_sub = np.array([len(bpe_encode_word(w, model["merges"])) for w in wc["token"]],
                     np.int64)
    h = hash_arrow_strings(pa.array(wc["token"], pa.large_string()), seed=5)
    order = np.argsort(h)
    ref = ray.put((h[order], n_sub[order]))

    def stats(batch: pa.Table) -> pa.Table:
        hs, ns = cached(ref)
        flat, offsets = flat_tokens(batch["text"])
        hw = hash_arrow_strings(flat, seed=5)
        pos = np.minimum(np.searchsorted(hs, hw), len(hs) - 1)
        # every corpus word is in the trained vocab by construction
        sub = ns[pos]
        doc_index = np.repeat(np.arange(len(batch)), np.diff(offsets))
        n_bpe = np.bincount(doc_index, weights=sub, minlength=len(batch)).astype(np.int64)
        n_chars = pc.utf8_length(batch["text"].combine_chunks()) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            "chars_per_token": pa.array(
                np.round(n_chars / np.maximum(n_bpe, 1), 6), pa.float64()),
        })

    docs = _read_exact(sf_dir, "documents", ["doc_id", "text"])
    df = ensure_columns(
        docs.map_batches(stats, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": "int64", "n_bpe_tokens": "int64", "chars_per_token": "float64"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
