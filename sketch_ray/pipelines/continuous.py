"""Continuous (incremental) sketch-artifact maintenance over snapshots.

The reference keeps device sketch state alive across input chunks and folds
each new chunk into it (reference src/sketch.cu:353-412 — the one axis of the
reference the earlier rounds had not re-expressed).  The Ray-Data-native
equivalent: a persisted per-shard partial artifact (`state/checkpoint.py`)
that a NEW data snapshot extends by scanning ONLY the new snapshot's files —
global sketches are then the fold of old partials (read back from the
artifact, bytes on disk) + the new partials, byte-identical to a full
rebuild because every kernel used here merges by an order-independent
elementwise sum/max/or (cm/cmcu tables, HLL registers, Bloom bits).

100 TB shape: a Common-Crawl-style corpus arrives as per-crawl partition
directories; each monthly crawl is one (or many) new shard(s).  The update
cost is O(new data) regardless of accumulated history — the whole point of
mergeable-UDAF sketches.  The test corpus synthesizes two snapshots from
documents.parquet with a deterministic doc_id rule so the query is
reproducible at every scale factor.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.sketch_build import SketchSpec
from ..state.checkpoint import CheckpointedBuild

# new snapshot = every 4th doc: deterministic under any row order, and both
# snapshots keep every lang/source stratum populated
_SNAP_MOD = 4

_SNAP_COLS = ("doc_id", "text", "source", "n_chars")

_SNAP_MEMO: dict = {}


def _artifact_specs() -> list[SketchSpec]:
    """The north-star sketch family over the web-page shape: token
    frequencies (CM + CM-CU), distinct sources (HLL), membership (Bloom).
    Only order-independent-merge kinds belong in an incremental artifact;
    kll/tdigest partials are merge-order-sensitive and would break the
    byte-identity contract (they stay in the per-day windowed_* queries).
    DDSketch is the one QUANTILE kernel that qualifies: its merge is sparse
    bucket-count addition (kernels/ddsketch.py), byte-identical under any
    partition order as long as the bin budget never collapses — n_chars
    spans ~3 decades, ~350 bins at α=0.01, far under max_bins=4096."""
    return [
        SketchSpec("bloom_source", "bloom", "source", mode="column",
                   params={"n_bits": 1 << 16, "n_hashes": 5, "seed": 42}),
        SketchSpec("cm_tokens", "cm", "text", mode="tokens",
                   params={"depth": 4, "width": 1 << 14, "seed": 42}),
        SketchSpec("cmcu_tokens", "cmcu", "text", mode="tokens",
                   params={"depth": 4, "width": 1 << 14, "seed": 42}),
        SketchSpec("dd_chars", "dd", "n_chars", mode="numeric",
                   params={"alpha": 0.01, "max_bins": 4096}),
        SketchSpec("hll_source", "hll", "source", mode="column",
                   params={"p": 12, "seed": 42}),
        # priority sampling qualifies too: hash-deterministic priorities
        # make the merge union+dedup+re-trim — byte-identical in any
        # partition order (kernels/prisample.py); keyed by the unique
        # doc_id, weighted by n_chars, so the artifact can answer post-hoc
        # subset char-volume sums without any rescan
        SketchSpec("ps_docs", "prisample", "doc_id", mode="weighted",
                   weight_col="n_chars", params={"k": 512, "seed": 42}),
    ]


def artifact_dirs(base: str) -> tuple[str, str]:
    """Spec-fingerprinted checkpoint dirs (incremental, full-rebuild):
    changing the artifact family mints FRESH dirs instead of tripping the
    resume guard on a stale /tmp artifact built with the old spec set
    (the write_hash_index pin-and-rebuild discipline)."""
    from ..state.checkpoint import _spec_lineage

    spec_fp = hashlib.sha256(
        json.dumps([_spec_lineage(s) for s in _artifact_specs()],
                   sort_keys=True).encode()).hexdigest()[:8]
    return (os.path.join(base, f"ckpt_incremental_{spec_fp}"),
            os.path.join(base, f"ckpt_full_{spec_fp}"))


def _snapshot_files(sf_dir: str) -> tuple[str, str, str]:
    """Split documents.parquet into (snap0, snap1) under a fingerprint-keyed
    /tmp dir (memoized per corpus file identity). snap0 = the corpus as of
    the last build; snap1 = the newly arrived snapshot. Returns
    (snap0_path, snap1_path, base_dir)."""
    path = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    st = os.stat(path)
    # _SNAP_COLS in the key: a column-set change must mint NEW fixture
    # files (a stale /tmp snapshot without the column would poison reads)
    key = (path, st.st_size, st.st_mtime_ns, tuple(_SNAP_COLS))
    memo = _SNAP_MEMO.get(key)
    if memo and all(os.path.exists(p) for p in memo[:2]):
        return memo
    fp = hashlib.sha256(repr(key).encode()).hexdigest()[:16]
    base = f"/tmp/sketch_ray_continuous/{fp}"
    os.makedirs(base, exist_ok=True)
    s0, s1 = f"{base}/snap0.parquet", f"{base}/snap1.parquet"
    if not (os.path.exists(s0) and os.path.exists(s1)):
        # driver-side split is fine HERE: snapshots are an input-layout
        # fixture for the test corpus; at 100 TB the snapshots already
        # exist as per-crawl partition directories and this step vanishes
        t = pq.read_table(path, columns=list(_SNAP_COLS))
        did = t.column("doc_id").to_numpy()
        new_mask = (did % _SNAP_MOD) == 0
        pq.write_table(t.filter(pa.array(~new_mask)), s0 + ".tmp")
        os.replace(s0 + ".tmp", s0)
        pq.write_table(t.filter(pa.array(new_mask)), s1 + ".tmp")
        os.replace(s1 + ".tmp", s1)
    _SNAP_MEMO.clear()
    _SNAP_MEMO[key] = (s0, s1, base)
    return s0, s1, base


def update_sketch_artifact(sf_dir: str) -> pa.Table:
    """Incremental artifact maintenance, end-to-end with built-in proof:

    1. build the artifact over snapshot 0 (checkpointed, per-shard lineage);
    2. a new snapshot arrives → extend the SAME artifact: the resume logic
       skips snapshot 0 (its partial + lineage row are already on disk) and
       scans ONLY snapshot 1;
    3. fold old + new partials into the global sketches;
    4. independently rebuild from scratch over both snapshots and compare
       every sketch's serialized state BYTE-FOR-BYTE.

    Gated columns: ``n_rows`` (rows folded into the artifact — manifest
    lineage total), ``n_updates`` (CM/CMCU: total token occurrences seen,
    the A3 grand-sum invariant; Bloom: keys presented; HLL: rows presented),
    ``matches_rebuild`` (the byte-identity verdict — TRUE in the oracle, so
    any divergence between the incremental and full-rebuild artifacts fails
    the value hash), ``scanned_incrementally`` (TRUE iff the update step's
    manifest shows snapshot 0's partial was reused, not rebuilt).

    Returns (sketch, kind, n_rows, n_updates, matches_rebuild,
    scanned_incrementally) — one row per sketch, ordered by name.
    """
    s0, s1, base = _snapshot_files(sf_dir)
    cols = ["doc_id", "text", "source", "n_chars"]
    d_inc, d_full = artifact_dirs(base)

    # phase 1: artifact over the old snapshot only
    CheckpointedBuild([s0], _artifact_specs(), d_inc, columns=cols).run()
    sid0 = CheckpointedBuild.shard_id(s0)
    with open(os.path.join(d_inc, "manifest.json")) as f:
        shard0_before = json.load(f)["shards"][sid0]

    # phase 2: the new snapshot arrives — extend the same artifact
    upd = CheckpointedBuild([s0, s1], _artifact_specs(), d_inc,
                            columns=cols).run()
    with open(os.path.join(d_inc, "manifest.json")) as f:
        manifest = json.load(f)
    # snapshot 0's lineage row must be untouched: the update scanned ONLY
    # the new snapshot (wall_s is recorded at build time, so a rescan
    # would overwrite it)
    incremental = manifest["shards"][sid0] == shard0_before

    # phase 3: full rebuild from scratch — the byte-identity oracle
    full = CheckpointedBuild([s0, s1], _artifact_specs(), d_full,
                             columns=cols).run()

    names = sorted(upd)
    n_rows_total = int(manifest["totals"]["rows"])
    matches = all(upd[n].to_bytes() == full[n].to_bytes() for n in names)

    def updates_of(sk) -> int:
        if hasattr(sk, "n_updates"):
            return int(sk.n_updates)
        if hasattr(sk, "n_added"):
            return int(sk.n_added)
        return n_rows_total  # column-mode kinds see one key per row

    return pa.table({
        "sketch": pa.array(names, pa.string()),
        "kind": pa.array([upd[n].kind for n in names], pa.string()),
        "n_rows": pa.array([n_rows_total] * len(names), pa.int64()),
        "n_updates": pa.array([updates_of(upd[n]) for n in names], pa.int64()),
        "matches_rebuild": pa.array([matches] * len(names), pa.bool_()),
        "scanned_incrementally": pa.array([incremental] * len(names),
                                          pa.bool_()),
    })


def update_artifact(ckpt_dir: str, files: list[str],
                    specs: list[SketchSpec] | None = None,
                    columns: list[str] | None = None) -> dict:
    """Library surface: extend (or create) a persisted sketch artifact with
    whatever of ``files`` it has not folded yet; returns the global
    sketches. Idempotent — already-checkpointed shards are never rescanned
    (input-path lineage guards against silently folding a renamed file)."""
    return CheckpointedBuild(files, specs or _artifact_specs(), ckpt_dir,
                             columns=columns).run()
