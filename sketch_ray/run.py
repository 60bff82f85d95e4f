"""Job entry point: ``ray job submit -- python -m sketch_ray.run ...``

Runs a resumable, checkpointed sketch build over a directory (or list) of
Parquet files and writes the global sketch artifact + lineage manifest.

Examples
--------
ray job submit --working-dir . -- python -m sketch_ray.run \
    --input /root/testdata/sf0.01/documents.parquet \
    --ckpt /tmp/ckpt_run1 --out /tmp/sketches.parquet

python -m sketch_ray.run --input data/*.parquet --ckpt /tmp/ckpt \
    --spec tok:cmcu:text:tokens --spec src:hll:source:column
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


DEFAULT_SPECS = [
    "tok:cmcu:text:tokens",
    "src:hll:source:column",
    "len:kll:n_chars:numeric",
    "blm:bloom:text:tokens",
]


def parse_spec(s: str):
    from .stages.sketch_build import SketchSpec

    parts = s.split(":")
    if len(parts) != 4:
        raise SystemExit(f"--spec must be name:kind:column:mode, got {s!r}")
    name, kind, column, mode = parts
    params = {
        "cmcu": {"width": 1 << 16, "seed": 42},
        "cm": {"width": 1 << 16, "seed": 42},
        "hll": {"p": 14, "seed": 42},
        "kll": {"k": 200, "seed": 42},
        "tdigest": {"delta": 200, "seed": 42},
        "bloom": {"n_bits": 1 << 22, "n_hashes": 7, "seed": 42},
    }[kind]
    return SketchSpec(name, kind, column, mode=mode, params=params)


def run_config(cfg_path: str) -> list[dict]:
    """Config-file job registry (the analog of the reference's
    ``datasets.json``, run_eval.py:59-90): a JSON file with
    ``{"jobs": [{"name", "input": [...], "ckpt", "specs": [...],
    "columns": [...], "batch_size"}]}`` — each job is a resumable
    checkpointed build; returns one summary dict per job."""
    import glob as _glob

    from .state.checkpoint import CheckpointedBuild

    with open(cfg_path) as f:
        cfg = json.load(f)
    out = []
    for job in cfg["jobs"]:
        files: list[str] = []
        for pat in job["input"]:
            hits = sorted(_glob.glob(pat))
            files.extend(hits if hits else [pat])
        specs = [parse_spec(s) for s in job.get("specs", DEFAULT_SPECS)]
        cb = CheckpointedBuild(files, specs, job["ckpt"],
                               columns=job.get("columns"),
                               batch_size=int(job.get("batch_size", 8192)))
        sketches = cb.run()
        with open(os.path.join(job["ckpt"], "manifest.json")) as f:
            manifest = json.load(f)
        out.append({"name": job["name"], "status": manifest["status"],
                    "n_done": manifest["n_done"], "totals": manifest["totals"],
                    "sketches": sorted(sketches)})
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m sketch_ray.run")
    ap.add_argument("--input", nargs="+",
                    help="parquet file(s) or glob(s); one file = one resumable shard")
    ap.add_argument("--config", default=None,
                    help="JSON job registry: {jobs: [{name, input, ckpt, specs, ...}]}")
    ap.add_argument("--ckpt", help="checkpoint directory")
    ap.add_argument("--out", default=None, help="write global sketches parquet here")
    ap.add_argument("--spec", action="append", default=None,
                    help="name:kind:column:mode (repeatable); default document suite")
    ap.add_argument("--columns", nargs="*", default=None)
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--load", default=None,
                    help="load a sketch artifact parquet (written via --out) "
                         "and answer queries instead of building")
    ap.add_argument("--query-keys", nargs="*", default=None,
                    help="with --load: point-query/membership keys")
    ap.add_argument("--quantiles", nargs="*", type=float, default=None,
                    help="with --load: quantiles to evaluate on quantile sketches")
    args = ap.parse_args(argv)

    if args.load:  # artifact query path needs no Ray at all
        from .kernels import sketch_from_bytes

        t = pq.read_table(args.load)
        out: dict = {}
        for name, kind, raw in zip(t.column("sketch").to_pylist(),
                                   t.column("kind").to_pylist(),
                                   t.column("data").to_pylist()):
            sk = sketch_from_bytes(raw)
            entry: dict = {"kind": kind}
            if hasattr(sk, "estimate"):
                entry["estimate"] = round(float(sk.estimate()), 1)
            if args.query_keys and hasattr(sk, "query"):
                entry["counts"] = dict(zip(args.query_keys,
                                           [int(x) for x in sk.query(args.query_keys)]))
            if args.query_keys and hasattr(sk, "contains"):
                entry["membership"] = dict(zip(args.query_keys,
                                               [bool(x) for x in sk.contains(args.query_keys)]))
            if args.quantiles and hasattr(sk, "quantile"):
                import numpy as np

                vals = sk.quantile(np.asarray(args.quantiles, dtype=float))
                entry["quantiles"] = dict(zip(map(str, args.quantiles),
                                              [float(v) for v in np.asarray(vals)]))
            out[name] = entry
        print(json.dumps(out))
        return 0

    import ray

    if not ray.is_initialized():  # driver owns the session; guard for ray job submit
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    if args.config:
        print(json.dumps(run_config(args.config)))
        return 0
    if not args.input or not args.ckpt:
        ap.error("--input and --ckpt are required without --config")

    files: list[str] = []
    for pat in args.input:
        hits = sorted(glob.glob(pat))
        files.extend(hits if hits else [pat])
    specs = [parse_spec(s) for s in (args.spec or DEFAULT_SPECS)]

    from .state.checkpoint import CheckpointedBuild

    cb = CheckpointedBuild(files, specs, args.ckpt, columns=args.columns,
                           batch_size=args.batch_size)
    sketches = cb.run()

    if args.out:
        names = sorted(sketches)
        pq.write_table(
            pa.table(
                {
                    "sketch": pa.array(names, pa.string()),
                    "kind": pa.array([sketches[n].kind for n in names], pa.string()),
                    "data": pa.array([sketches[n].to_bytes() for n in names], pa.large_binary()),
                }
            ),
            args.out,
        )
    with open(os.path.join(args.ckpt, "manifest.json")) as f:
        manifest = json.load(f)
    print(json.dumps({"status": manifest["status"], "n_done": manifest["n_done"],
                      "totals": manifest["totals"], "sketches": sorted(sketches)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
