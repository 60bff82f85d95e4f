"""Distributed-branch verification at 10x scale (VERDICT r4 item 4).

Every adaptive operator picks driver-fold vs distributed by a module-level
row threshold (``_SMALL_ROWS`` / ``_SMALL_DOCS``) or byte gate
(``_BCAST_JOIN_BYTES``, ``_EDIT_DRIVER_PAIRS``).  This script patches ALL of
those to 0 in every pipelines module namespace — so every adaptive operator
takes the branch that actually runs at 100 TB — and then value-hash-verifies
every oracle-gated query against DuckDB on the 10x soak corpus.

Results append to the --out JSON after every query, so a rerun resumes
(skips recorded PASSes); chunk long runs by passing query names.

Usage:
    python scripts/verify_distributed_10x.py [--sf SF_DIR] [--out PATH]
                                             [--num-cpus N] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
PATCH_ATTRS = ("_SMALL_ROWS", "_SMALL_DOCS", "_EDIT_DRIVER_PAIRS",
               "_BCAST_JOIN_BYTES")


def patch_thresholds() -> list[str]:
    """Set every adaptive threshold to 0 in every pipelines module namespace
    (from-imports bind per-module names, so each namespace is patched)."""
    import importlib
    import pkgutil

    import sketch_ray.pipelines as pk

    patched = []
    mods = [importlib.import_module(f"sketch_ray.pipelines.{m.name}")
            for m in pkgutil.iter_modules(pk.__path__)]
    mods.append(importlib.import_module("sketch_ray.pipelines.heavy_hitters"))
    for mod in mods:
        for attr in PATCH_ATTRS:
            if hasattr(mod, attr):
                setattr(mod, attr, 0)
                patched.append(f"{mod.__name__.split('.')[-1]}.{attr}")
    return sorted(set(patched))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=[])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/dist10x_results.json")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    import bench
    soak_dir = bench._make_soak_dir(args.sf, args.factor)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    patched = patch_thresholds()
    print(f"patched {len(patched)} thresholds: {patched}")

    import __ray_entry__ as entrymod
    from check_oracle import canon, to_pandas

    import pandas as pd

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    # pin the resume cache to the exact corpus + patch set: a rerun against
    # a different --sf/--factor must NOT report stale PASSes as verified
    # (the write_hash_index manifest discipline, applied to this file)
    meta = {"sf": os.path.abspath(args.sf), "factor": args.factor,
            "soak_dir": soak_dir, "patched": patched}
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
        if results.get("_meta") != meta:
            print(f"resume cache {args.out} was built for "
                  f"{results.get('_meta')}; starting fresh for {meta}")
            results = {}
    results["_meta"] = meta

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{soak_dir}/{t}.parquet')")

    only = set(args.queries)
    n_fail = 0
    for name in qs:
        if only and name not in only:
            continue
        if name not in sqls:
            continue  # rows-only estimates: bounds pinned in pytest
        if results.get(name, {}).get("status") == "PASS" and not only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(qs[name](soak_dir)))
            want = canon(con.execute(sqls[name]).df())
            ok = (len(got) == len(want)
                  and list(got.columns) == list(want.columns))
            if ok:
                pd.testing.assert_frame_equal(got, want, check_dtype=True,
                                              check_exact=True)
            status, err = ("PASS", None) if ok else \
                ("FAIL", f"rows {len(got)} != {len(want)} or cols differ")
            if not ok:
                n_fail += 1
        except AssertionError as e:
            status, err = "FAIL", str(e).splitlines()[-1][:200]
            n_fail += 1
        except Exception as e:
            status, err = "ERROR", f"{type(e).__name__}: {e}"[:200]
            n_fail += 1
        dt = round(time.time() - t0, 1)
        results[name] = {"status": status, "rows": int(len(got)) if status == "PASS" else None,
                         "secs": dt, "err": err}
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        os.replace(tmp, args.out)
        print(f"{status} {name} ({dt}s)" + (f" — {err}" if err else ""),
              flush=True)

    recorded = {k: r for k, r in results.items() if k != "_meta"}
    done = [r for r in recorded.values() if r["status"] == "PASS"]
    print(f"\n{len(done)} PASS / {len(recorded)} recorded; "
          f"{n_fail} new failures this run")
    ray.shutdown()
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main())
