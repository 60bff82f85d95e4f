"""Drop-in CLI for the reference's program contract
(src/sketch.cpp:49-55: ``sketch test_set control_set min_length max_length
threshold_1 ...``):

    python -m sketch_ray.kmer test.fasta control.fasta 10 20 365 308 ...

Prints ``<kmer> <freq>`` per emerging heavy hitter to stdout and
``Heavy-hitters (length L): n`` / ``Heavy-hitters (total): n`` plus timing
to stderr — the same report surface the reference's eval harness scrapes
(run_eval.py:109-141).
"""

from __future__ import annotations

import os
import sys
import time


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 5:
        print("usage: python -m sketch_ray.kmer TEST CONTROL MIN MAX THRESH...",
              file=sys.stderr)
        return 1
    test_path, control_path = argv[0], argv[1]
    min_len, max_len = int(argv[2]), int(argv[3])
    thresholds = [int(x) for x in argv[4:]]
    n_length = max_len - min_len + 1
    if len(thresholds) < n_length:
        print(f"Missing threshold values. Got {len(thresholds)}, expected {n_length}",
              file=sys.stderr)
        return 1
    thresholds = thresholds[:n_length]

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.kmers import emerging_kmers
    from .sources.fasta import read_fasta

    t0 = time.perf_counter()
    out = emerging_kmers(read_fasta(test_path), read_fasta(control_path),
                         min_len, max_len, thresholds, growth=2)
    total = time.perf_counter() - t0

    for _, r in out.iterrows():
        print(f"{r['kmer']} {r['cnt']}")
    print(f"Total time: {total:.4f} s", file=sys.stderr)
    for L in range(min_len, max_len + 1):
        n = int((out["length"] == L).sum())
        print(f"Heavy-hitters (length {L}): {n}", file=sys.stderr)
    print(f"Heavy-hitters (total): {len(out)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
