"""Local replica of the driver's correctness gate: run every queries() entry
and compare against oracle_sql() via DuckDB (row count + schema + value
equality, column-name-sorted, order-insensitive).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py --sample N --seed R [sf_dir]

``--sample N --seed R`` verifies a seeded random N-query slice — parity
with a rotating driver-gate sample, so successive rounds' artifacts can
show DIFFERENT verified slices while the full run stays the CI default.
"""

from __future__ import annotations

import argparse
import random
import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize to the dtype classes the driver's value hash distinguishes.

    The driver hashes the column-name-sorted frame's VALUES, which is
    insensitive to integer width (int32(5) and int64(5) hash alike) but
    SENSITIVE to int-vs-float (99111 != 99111.0 — the r4 props_field_stats
    failure).  So: unify widths within a class, never across classes, and
    compare with check_dtype=True afterwards.
    """
    df = df[sorted(df.columns)].copy()
    import numpy as np

    for c in df.columns:
        kind = df[c].dtype.kind
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif kind in "iu":
            df[c] = df[c].astype(np.int64)
        elif kind == "f":
            df[c] = df[c].astype(np.float64)
        elif kind == "M":
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*", default=[])
    ap.add_argument("--sample", type=int, default=0,
                    help="verify a seeded random N-query slice instead of all")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    sf_dir = args.sf_dir
    only = set(args.queries)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    if args.sample and not only:
        names = sorted(qs)
        only = set(random.Random(args.seed).sample(names, min(args.sample, len(names))))
        print(f"sampled {len(only)} / {len(names)} queries (seed={args.seed})")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        want = canon(con.execute(sqls[name]).df())
        status = []
        if len(got) != len(want):
            status.append(f"rows {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"cols {list(got.columns)} != {list(want.columns)}")
        elif len(got) == len(want):
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
            except AssertionError as e:
                status.append("values differ: " + str(e).splitlines()[-1][:160])
        if status:
            print(f"FAIL {name}: {'; '.join(status)} ({dt:.1f}s)")
            if len(got) and len(want) and list(got.columns) == list(want.columns):
                merged = got.merge(want, how="outer", indicator=True, on=list(got.columns))
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows ({dt:.1f}s)")
    ray.shutdown()
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main())
