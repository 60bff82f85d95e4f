"""Shared pipeline helpers."""

from __future__ import annotations

import pandas as pd


def ensure_columns(df: pd.DataFrame, schema: dict[str, str]) -> pd.DataFrame:
    """A Ray Dataset that produced zero blocks loses its schema on
    ``to_pandas()``; rebuild the typed empty frame so downstream column
    selection keeps working (empty partitions are routine at scale)."""
    if all(c in df.columns for c in schema):
        return df
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in schema.items()})
