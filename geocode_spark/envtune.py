"""Allocator environment tuning for Arrow-kernel-heavy workloads.

Round-5 finding (BASELINE.md, scripts/box_probes.py): on this
virtualized host, FIRST-TOUCH of freshly mmap'd memory is served at
~40 GB/s aggregate and does not improve from 4 to 16 concurrent
processes (host-side backing of new guest pages serializes), while
already-touched memory streams at ~200 GB/s and scales at ~0.75+. The
Arrow pipeline allocates large transient buffers per batch (JVM IPC
buffers, numpy kernel arrays); with glibc's default M_MMAP_THRESHOLD
(128 KB, dynamic) every one of them is a fresh mmap that is munmap'd on
free — so the hot path pays the serialized first-touch cost once per
batch per worker, forever.

Raising M_MMAP_THRESHOLD / M_TRIM_THRESHOLD makes glibc serve large
allocations from the (sbrk) arena and KEEP freed blocks there: after
the first batch, every worker's buffers are warm re-uses. Measured on
the word-pair kernel at local[16]: 1.12 s -> 1.02 s per pass, and
4->16-slot scaling efficiency 0.54 -> 0.64.

Cost model, stated honestly: each python worker's resident set grows to
the high-water mark of its batch working set (~200-400 MB at the bench
batch size) and stays there for the worker's life. 32 workers => <= ~10
GB resident on a 128 GB box. setdefault only — a deployment that needs
the memory back can override or unset the variables.

Call tune_allocator_env() BEFORE the JVM launches (the executor and its
python workers inherit the driver process environment in local mode;
cluster deployments set the same variables via spark.executorEnv.*).
"""
from __future__ import annotations

import os

_GiB = 1024**3

ALLOCATOR_ENV = {
    # large allocations come from the arena, not fresh mmaps
    "MALLOC_MMAP_THRESHOLD_": str(16 * _GiB),
    # freed arena memory is kept (warm), not trimmed back to the OS
    "MALLOC_TRIM_THRESHOLD_": str(16 * _GiB),
}


def tune_allocator_env() -> dict:
    """setdefault the glibc malloc tunables into os.environ; returns the
    mapping actually in effect (user overrides win). No-op on non-glibc
    platforms (the variables are simply ignored)."""
    return {
        k: os.environ.setdefault(k, v) or os.environ[k]
        for k, v in ALLOCATOR_ENV.items()
    }
