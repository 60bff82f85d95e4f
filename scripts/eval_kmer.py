"""Comparative evaluation harness — the analog of the reference's
run_eval.py (S6, SURVEY.md §2.1): run every registered program on every
dataset, scrape times + heavy-hitter counts, write one CSV per program.

    python scripts/eval_kmer.py --datasets /tmp/datasets.json --out /tmp/eval_out

datasets.json (same shape as the reference's, readme.md:15-26):
    {"name": {"test_file": ..., "control_file": ...,
              "first_length": 10, "thresholds": [30, 30, 30]}}

Programs: this engine's ``python -m sketch_ray.kmer`` plus, when g++ is
available, the reference's CPU binaries built from /root/reference/src.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TIME_RE = re.compile(r"Total time: ([0-9.]+)")
TOTAL_RE = re.compile(r"Heavy-hitters \(total\): (\d+)")
# per-phase runtimes: every "<Name> time: <s>" stderr line becomes its own
# metric row ("<name>-runtime [s]"), the run_eval.py:128-134 scrape shape
NAMED_TIME_RE = re.compile(r"^(.*) time: ([0-9.]*)", re.MULTILINE)
# nvprof scrape targets (run_eval.py:109-126 parity): memcpy transfer rows
# and kernel rows from the profiler's stderr summary. Regex targets match
# the profiler's fixed output format by necessity; no-ops without CUDA.
CUDA_MEMCPY_RE = re.compile(r"(\S*)\s+(?:\S+\s+){4}\[CUDA memcpy (.*)\]")
CUDA_KERNEL_RE = re.compile(r"([0-9.]+[muns.]+)\s+(?:\S+\s+){4}(?P<kernel>[^(\s]+)\(")


def build_reference() -> dict[str, tuple[list[str], set[str]]]:
    """-> {program_name: (argv_prefix, tags)}; includes reference binaries if
    buildable. Tags mirror run_eval.py's program registry (run_eval.py:47-52):
    a program runs a dataset when their tag sets intersect (untagged = all)."""
    programs = {"sketch_ray": ([sys.executable, "-m", "sketch_ray.kmer"], {"cpu", "ray"})}
    if shutil.which("g++"):
        d = tempfile.mkdtemp(prefix="eval_ref_")
        src = "/root/reference/src"
        for name, tags in (("sketch", {"cpu"}), ("sketch_multithread", {"cpu", "thread"})):
            out = os.path.join(d, name)
            r = subprocess.run(
                ["g++", "-std=c++11", "-pthread", "-O3", f"{src}/{name}.cpp",
                 f"{src}/fasta.cpp", f"{src}/MappedFile.cpp", "-o", out],
                capture_output=True, text=True)
            if r.returncode == 0:
                programs[name] = ([out], tags)
    return programs


def run_one(prefix: list[str], ds: dict, nvprof: bool = False,
            is_cuda: bool = False) -> dict:
    n_len = len(ds["thresholds"])
    args = [ds["test_file"], ds["control_file"], str(ds["first_length"]),
            str(ds["first_length"] + n_len - 1), *map(str, ds["thresholds"])]
    cmd = prefix + args
    use_nvprof = nvprof and is_cuda and shutil.which("nvprof") is not None
    if use_nvprof:
        cmd = ["nvprof"] + cmd
    t0 = time.perf_counter()
    r = subprocess.run(cmd, capture_output=True, text=True,
                       cwd=REPO, env={**os.environ, "PYTHONPATH": REPO})
    wall = time.perf_counter() - t0
    out = {"wall_s": round(wall, 3), "returncode": r.returncode}
    m = TIME_RE.search(r.stderr)
    if m:
        out["reported_time_s"] = float(m.group(1))
    for name, t in NAMED_TIME_RE.findall(r.stderr):
        out[f"{name.strip().lower()}-runtime [s]"] = float(t) if t else None
    if use_nvprof:
        for t, name in CUDA_MEMCPY_RE.findall(r.stderr):
            out[f"{name}-transfer-time"] = t
        for t, kernel in CUDA_KERNEL_RE.findall(r.stderr):
            out[f"{kernel}-kernel-runtime"] = t
    m = TOTAL_RE.search(r.stderr)
    if m:
        out["heavy_hitters_total"] = int(m.group(1))
    out["n_output_lines"] = len([x for x in r.stdout.splitlines() if x.strip()])
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--runs", type=int, default=1,
                    help="repetitions per (program, dataset); CSV gets one "
                         "column per run (run_eval.py:208-215 shape)")
    ap.add_argument("--nvprof", action="store_true",
                    help="profile cuda-tagged programs under nvprof and add "
                         "memcpy/kernel metric rows (run_eval.py:92-126 "
                         "parity); a no-op when nvprof/CUDA is absent, but "
                         "the scrape columns stay in the CSV schema")
    args = ap.parse_args()

    with open(args.datasets) as f:
        datasets = json.load(f)
    os.makedirs(args.out, exist_ok=True)
    programs = build_reference()
    summary = {}
    for prog, (prefix, ptags) in programs.items():
        rows = []
        first_runs = {}
        for name, ds in datasets.items():
            dtags = set(ds.get("tags", []))
            if ptags and dtags and not (ptags & dtags):
                continue  # tag-filtered, like run_eval.py's registry match
            runs = [run_one(prefix, ds, nvprof=args.nvprof,
                            is_cuda="cuda" in ptags)
                    for _ in range(max(1, args.runs))]
            first_runs[name] = runs[0]
            # reference CSV shape: one row per metric, one column per run
            for metric in sorted({k for r in runs for k in r}):
                rows.append({"dataset": name, "metric": metric,
                             **{f"run_{i + 1}": r.get(metric)
                                for i, r in enumerate(runs)}})
        path = os.path.join(args.out, f"result_{prog}.csv")
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["dataset", "metric"]
                               + [f"run_{i + 1}" for i in range(max(1, args.runs))])
            w.writeheader()
            w.writerows(rows)
        summary[prog] = first_runs
    # cross-implementation agreement (the reference's de-facto conformance):
    agree = {}
    for name in datasets:
        counts = {p: summary[p][name].get("heavy_hitters_total")
                  for p in programs if name in summary[p]}
        agree[name] = len(set(counts.values())) == 1
    print(json.dumps({"programs": list(programs), "agreement": agree,
                      "runs": max(1, args.runs), "out_dir": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
