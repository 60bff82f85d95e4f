"""Resumable sketch builds: per-shard partial checkpoints + lineage manifest.

north_rule: "resumable from checkpoint with per-partition lineage + metrics".

Shard = one input file (the natural unit of a 100 TB corpus laid out as many
Parquet files; a failed run resumes by skipping shards whose partial file is
already on disk). Each shard runs as its own streaming Ray Data pipeline
(read → partial sketches → shuffle-free fold) and writes:

- ``<ckpt>/parts/shard=<id>/partial.parquet`` — one row per sketch spec
  (serialized partial), written atomically via tmp+rename;
- ``<ckpt>/manifest.json`` — lineage + metrics per shard: input file, row
  count, wall seconds, docs/s, status, plus the full sketch config and seeds.

The final global sketch is the fold of the per-shard partials in sorted
input-file order (driver-side: shard count ≪ block count), making the artifact
byte-identical between a straight-through run and any kill/resume schedule
for the sum/max/or-merge sketches (cm, cmcu, hll, bloom — asserted in
tests/test_checkpoint.py).

The reference has no fault tolerance (SURVEY.md §4 retries row); this module
is the explicit design the survey calls for (§7.1 step 5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernels.base import SketchBase
from ..kernels import sketch_from_bytes
from ..stages.sketch_build import SketchSpec, build_partials, merge_partials


def _spec_lineage(spec: SketchSpec) -> dict[str, Any]:
    return {
        "name": spec.name,
        "kind": spec.kind,
        "column": spec.column,
        "mode": spec.mode,
        "lengths": list(spec.lengths),
        "params": dict(spec.params),
        "weight_col": spec.weight_col,
    }


def _ensure_thread_safe_fs_imports() -> None:
    """Ray's path resolution re-imports ``fsspec.implementations.http`` on
    EVERY read; when aiohttp is absent that import fails, and two driver
    threads racing the failed import can observe a half-initialized module
    (ImportError: cannot import name 'HTTPFileSystem'), which Ray does not
    catch. Install a deterministic stub once so concurrent shard threads
    never race the import. The stub class matches nothing in isinstance
    checks, which is exactly the no-HTTP-filesystem behavior."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - stub for isinstance only
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


class CheckpointedBuild:
    """Orchestrates a resumable multi-shard sketch build.

    >>> cb = CheckpointedBuild(files, specs, ckpt_dir)
    >>> sketches = cb.run()          # skips shards already checkpointed
    """

    def __init__(
        self,
        files: list[str],
        specs: list[SketchSpec],
        ckpt_dir: str,
        columns: list[str] | None = None,
        batch_size: int = 8192,
    ):
        self.files = sorted(files)
        self.specs = specs
        self.ckpt_dir = ckpt_dir
        self.columns = columns
        self.batch_size = batch_size
        self.parts_dir = os.path.join(ckpt_dir, "parts")
        self.manifest_path = os.path.join(ckpt_dir, "manifest.json")
        os.makedirs(self.parts_dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _load_manifest(self) -> dict[str, Any]:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                manifest = json.load(f)
            # spec-lineage check: resuming into a ckpt dir written under
            # different sketch specs would fold incompatible partials
            # (ADVICE r1) — fail loudly instead
            want = [_spec_lineage(s) for s in self.specs]
            have = manifest.get("specs")
            if have != want:
                raise ValueError(
                    f"checkpoint dir {self.ckpt_dir} was written with different "
                    f"sketch specs; refusing to resume (stored={have}, current={want})")
            return manifest
        return {
            "specs": [_spec_lineage(s) for s in self.specs],
            "shards": {},
            "status": "running",
        }

    def _save_manifest(self, manifest: dict[str, Any]) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    # -- shards ------------------------------------------------------------
    @staticmethod
    def shard_id(path: str) -> str:
        """Stable content-address of the input file PATH. Shard identity
        must not depend on the file's position in the sorted input list:
        positional ids meant a late-arriving file that sorts before
        existing shards shifted every id, failed every lineage check, and
        silently rescanned the whole history — O(accumulated data), not
        O(new data). Path-keyed ids keep every existing shard's partial
        valid no matter where new files land in the sort order."""
        import hashlib

        h = hashlib.sha256(os.path.abspath(path).encode()).hexdigest()[:12]
        return f"{os.path.basename(path)}-{h}"

    def _partial_path(self, shard_id: str) -> str:
        return os.path.join(self.parts_dir, f"shard={shard_id}", "partial.parquet")

    def _shard_done(self, manifest: dict, shard_id: str, path: str) -> bool:
        info = manifest["shards"].get(shard_id)
        # lineage check: a reused ckpt dir with renamed inputs must NOT
        # silently fold a stale partial built from a different file
        # (ADVICE r1); the path hash already pins abspath, this pins the
        # human-readable record too
        return bool(info and info.get("status") == "done"
                    and info.get("input") == path
                    and os.path.exists(self._partial_path(shard_id)))

    def _run_shard(self, shard_id: str, path: str, manifest: dict[str, Any],
                   lock=None) -> None:
        import contextlib

        import ray.data as rd

        t0 = time.perf_counter()
        ds = rd.read_parquet(path, columns=self.columns)
        partials = build_partials(ds, self.specs, batch_size=self.batch_size)
        folded = merge_partials(partials)  # {name: sketch} for THIS shard
        n_rows = pq.ParquetFile(path).metadata.num_rows
        wall = time.perf_counter() - t0

        names = sorted(folded)
        table = pa.table(
            {
                "sketch": pa.array(names, pa.string()),
                "kind": pa.array([folded[n].kind for n in names], pa.string()),
                "partial": pa.array([folded[n].to_bytes() for n in names], pa.large_binary()),
                "n_rows": pa.array([n_rows] * len(names), pa.int64()),
            }
        )
        out = self._partial_path(shard_id)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = out + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, out)  # atomic: a crash never leaves a half partial

        guard = lock if lock is not None else contextlib.nullcontext()
        with guard:
            manifest["shards"][shard_id] = {
                "input": path,
                "rows": int(n_rows),
                "bytes": int(os.path.getsize(path)),
                "wall_s": round(wall, 3),
                "rows_per_s": round(n_rows / wall, 1) if wall > 0 else None,
                "status": "done",
            }
            self._save_manifest(manifest)

    # -- driver ------------------------------------------------------------
    def run(self, max_shards: int | None = None,
            concurrent_shards: int = 2) -> dict[str, SketchBase]:
        """Process missing shards (optionally at most ``max_shards`` — used
        by tests to simulate a crash), then fold all completed partials in
        sorted shard order. Returns the global sketches once every shard is
        done; partial progress returns the fold of what exists.

        ``concurrent_shards`` driver threads keep the cluster busy across
        shard boundaries (each thread drives its own streaming Dataset
        execution; Ray schedules them jointly). Manifest writes are
        lock-serialized; each shard's partial file stays atomic, so crash
        semantics are unchanged."""
        import threading
        from concurrent.futures import ThreadPoolExecutor

        _ensure_thread_safe_fs_imports()
        manifest = self._load_manifest()
        todo = []
        for path in self.files:
            sid = self.shard_id(path)
            if not self._shard_done(manifest, sid, path):
                todo.append((sid, path))
        if max_shards is not None:
            todo = todo[:max_shards]
        if todo:
            lock = threading.Lock()

            def work(item):
                sid, path = item
                self._run_shard(sid, path, manifest, lock)

            if concurrent_shards <= 1 or len(todo) == 1:
                for item in todo:
                    work(item)
            else:
                with ThreadPoolExecutor(max_workers=concurrent_shards) as ex:
                    list(ex.map(work, todo))

        done = [self.shard_id(p) for p in self.files
                if self._shard_done(manifest, self.shard_id(p), p)]
        manifest["status"] = "done" if len(done) == len(self.files) else "partial"
        manifest["n_shards"] = len(self.files)
        manifest["n_done"] = len(done)
        total_rows = sum(manifest["shards"][s]["rows"] for s in done)
        total_wall = sum(manifest["shards"][s]["wall_s"] for s in done)
        manifest["totals"] = {
            "rows": total_rows,
            "wall_s": round(total_wall, 3),
            "rows_per_s": round(total_rows / total_wall, 1) if total_wall else None,
        }
        self._save_manifest(manifest)

        # deterministic driver fold in sorted shard order (shard count is
        # small by construction; partial rows are KB-sized)
        out: dict[str, SketchBase] = {}
        for sid in done:
            t = pq.read_table(self._partial_path(sid))
            for name, raw in zip(t.column("sketch").to_pylist(), t.column("partial").to_pylist()):
                sk = sketch_from_bytes(raw)
                if name in out:
                    out[name].merge(sk)
                else:
                    out[name] = sk
        return out
