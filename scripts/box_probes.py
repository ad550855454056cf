"""Box-level scaling probes: what does THIS host's hardware give back for
4x more processes, independent of Spark and of this engine?

Two probes, both pure numpy/python (no Spark):

  cpu    — a compute-dominant integer kernel (splitmix64 finalizer over a
           small, cache-resident buffer): measures core scaling with
           near-zero DRAM traffic.
  membw  — a DRAM-streaming copy over a 200 MB per-process buffer:
           measures the shared memory subsystem.

Run: python scripts/box_probes.py
Prints one JSON line: aggregate throughput at 1 / 4 / 16 worker
processes for each probe, plus the 4->16 scaling efficiency.

Why this exists (round 5): the LM-selection scaling protocol
(bench.py --scaling-select) sits at ~0.5 efficiency from 4 -> 16 task
slots no matter the process topology — shared-JVM threads (local[16]),
two concurrent 8-slot JVMs, and 1-vs-4 REAL executor JVMs
(--scaling-select-cluster) all land within a few points of each other.
These probes separate the two remaining explanations: on this box the
cpu probe scales at ~0.9 while membw SATURATES AT 4 PROCESSES (~44 GB/s,
and slightly degrades at 16) — so any operator whose compute-per-byte is
low (the rolling-hash kernels: a few ALU ops per byte streamed) hits the
memory-controller wall, not an engine wall. A real 4N-executor cluster
multiplies memory controllers with nodes; this box does not.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import time

SECONDS = 3.0


def _cpu_worker(q):
    import numpy as np

    # 1 MB buffer: LLC-resident, so the loop is ALU-bound, not DRAM-bound
    x = np.arange(131_072, dtype=np.uint64)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < SECONDS:
        y = x + np.uint64(0x9E3779B97F4A7C15)
        y = (y ^ (y >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        y = (y ^ (y >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = y ^ (y >> np.uint64(31))
        n += 1
    dt = time.perf_counter() - t0
    q.put(n * len(x) / dt / 1e6)  # M finalizations / s


def _membw_worker(q):
    import numpy as np

    a = np.random.randint(0, 255, 200_000_000, dtype=np.uint8)  # 200 MB
    b = np.empty_like(a)
    np.copyto(b, a)  # touch every page before timing
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < SECONDS:
        np.copyto(b, a)
        n += 1
    dt = time.perf_counter() - t0
    q.put(2 * 0.2 * n / dt)  # GB/s (read + write)


def run_probe(worker, levels=(1, 4, 16)) -> dict:
    out = {}
    for nproc in levels:
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(q,)) for _ in range(nproc)]
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        out[nproc] = round(sum(q.get() for _ in range(nproc)), 1)
    lo, hi = levels[1], levels[2]
    out["eff_4_to_16"] = round((out[hi] / out[lo]) / (hi / lo), 3)
    return out


def main():
    res = {
        "cpu_Mops": run_probe(_cpu_worker),
        "membw_GBps": run_probe(_membw_worker),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
