"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash). Ray session ownership stays with the
caller: nothing in sketch_ray calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the two-pass exact
    heavy-hitter pipeline (CM-CU candidates → exact verification), the
    Ray-Data re-expression of the reference's core program
    (reference src/sketch.cpp:48-289)."""
    from sketch_ray.pipelines.exact import heavy_hitter_tokens

    return heavy_hitter_tokens("/root/testdata/sf0.001", rel_threshold=0.02)


def queries() -> dict[str, Callable[[str], Any]]:
    from sketch_ray.pipelines import exact, sketch_queries

    return {
        # --- exact, oracle-gated (operator coverage: M1/M3/M8, A1-A6, T1-T2, J1) ---
        "top_tokens": lambda sf: exact.top_tokens(sf, k=20),
        "heavy_hitter_tokens": lambda sf: exact.heavy_hitter_tokens(sf, rel_threshold=0.02),
        "bigram_counts_min": lambda sf: exact.bigram_counts_min(sf, min_cnt=25),
        "tokens_per_lang": exact.tokens_per_lang,
        "distinct_sources_per_lang": exact.distinct_sources_per_lang,
        "doc_token_stats": exact.doc_token_stats,
        "len_histogram": exact.len_histogram,
        "quantiles_exact": exact.quantiles_exact,
        "events_per_type": exact.events_per_type,
        "heavy_users": lambda sf: exact.heavy_users(sf, rel_threshold=0.002),
        # --- sketch estimates, rows-only (published-bound guarantees tested in pytest) ---
        "cmcu_token_estimates": lambda sf: sketch_queries.cmcu_token_estimates(sf, top=50),
        "hll_cardinalities": sketch_queries.hll_cardinalities,
        "kll_quantiles": lambda sf: sketch_queries.quantile_sketches(sf, "kll"),
        "tdigest_quantiles": lambda sf: sketch_queries.quantile_sketches(sf, "tdigest"),
        "bloom_membership": sketch_queries.bloom_membership,
    }


def oracle_sql() -> dict[str, str]:
    tok = "SELECT unnest(string_split(text, ' ')) AS token FROM documents"
    return {
        "top_tokens": f"""
            SELECT token, count(*) AS cnt FROM ({tok}) GROUP BY token
            ORDER BY cnt DESC, token ASC LIMIT 20
        """,
        "heavy_hitter_tokens": f"""
            WITH t AS ({tok}), total AS (SELECT count(*) AS n FROM t)
            SELECT token, count(*) AS cnt FROM t GROUP BY token
            HAVING count(*) >= (SELECT ceil(0.02 * n) FROM total)
            ORDER BY token
        """,
        "bigram_counts_min": """
            WITH toks AS (
                SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
                       unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
            SELECT a.tok || ' ' || b.tok AS bigram, count(*) AS cnt
            FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            GROUP BY 1 HAVING count(*) >= 25 ORDER BY bigram
        """,
        "tokens_per_lang": """
            SELECT lang, sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "distinct_sources_per_lang": """
            SELECT lang, count(DISTINCT source) AS n_sources
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "doc_token_stats": """
            SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
                   length(text)::BIGINT AS n_chars_computed
            FROM documents ORDER BY doc_id
        """,
        "len_histogram": """
            SELECT n_chars, count(*) AS cnt FROM documents
            GROUP BY n_chars ORDER BY n_chars
        """,
        "quantiles_exact": " UNION ALL ".join(
            f"SELECT {q}::DOUBLE AS q, quantile_disc(n_chars, {q})::BIGINT AS value FROM documents"
            for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
        ),
        "events_per_type": """
            SELECT event_type, count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "heavy_users": """
            WITH total AS (SELECT count(*) AS n FROM events)
            SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
            HAVING count(*) >= greatest(2, (SELECT ceil(0.002 * n) FROM total))
            ORDER BY user_id
        """,
    }
