"""Allocator tuning for numpy-heavy batch workers.

glibc serves every allocation above ``M_MMAP_THRESHOLD`` (default 128 KB) with
a private ``mmap`` and *unmaps it on free*, so each large numpy temporary in a
hot ``map_batches`` stage pays the full page-fault cost of its pages again on
the next batch. On this sandbox's kernel those faults are extremely expensive
(measured: ~2 s per 40 MB of first-touch — a plain 5M-element ``a * k + b``
took 2.0 s cold and 14 ms warm), and they were the root cause of the
round-1 "intermittent allocator stalls" (see BASELINE.md).

``tune_allocator()`` raises the mmap threshold so large blocks come from the
sbrk heap, and disables trimming so the heap is never returned mid-run: each
worker process faults its peak working set ONCE and then recycles it for every
subsequent batch. On a long-lived real cluster this is the standard setting
for steady-state batch workers (bounded peak per worker by batch sizing; RSS
stays at the per-worker peak, which Ray's memory accounting already budgets).

Called at ``sketch_ray`` import time, so every Ray worker that deserializes
one of our stage callables gets it automatically. No-op off glibc/Linux.
"""

from __future__ import annotations

_done = False


def tune_allocator() -> bool:
    """Idempotent; returns True if mallopt was applied."""
    global _done
    if _done:
        return True
    import os

    if os.environ.get("SKETCH_RAY_NO_MALLOPT"):
        return False
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        ok = libc.mallopt(M_MMAP_THRESHOLD, 1 << 30) == 1
        ok = libc.mallopt(M_TRIM_THRESHOLD, -1) == 1 and ok
        _done = bool(ok)
        return _done
    except Exception:
        return False
