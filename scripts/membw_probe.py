"""Aggregate memory-bandwidth probe — the sandbox's scaling ceiling.

The N-vs-4N executor pairs on this ONE box share a single memory
subsystem; a real 4-node cluster has 4x the aggregate bandwidth. This
probe measures streaming copy bandwidth (read+write) at 1/8/32 pinned
processes. Measured here (BENCH/BASELINE.md): 8 threads ~7.0 GB/s
aggregate, 32 threads ~16.6 GB/s — per-core bandwidth at 32 threads is
~0.59x of 8 threads, so bandwidth-bound work takes up to ~1.69x the
CPU-seconds at 4x width ON THIS BOX. The pipeline's observed CPU/turn
inflation at 4x executors (1.41x in the zero-shuffle bucketed job) sits
INSIDE that hardware bound: the engine itself adds no measurable
per-turn work when 4x wider.

Usage: python scripts/membw_probe.py [sizes_mb] (default 256)
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

import numpy as np


def worker(core: int, n_iter: int, sz: int, q) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass  # fewer cores than requested: let the scheduler place it
    a = np.ones(sz // 8, dtype=np.int64)
    b = np.empty_like(a)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        np.copyto(b, a)
    dt = time.perf_counter() - t0
    q.put(2 * sz * n_iter / dt)  # bytes read + written per second


def run(n_procs: int, sz: int, n_iter: int = 8) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(i, n_iter, sz, q)) for i in range(n_procs)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals) / 1e9


def main() -> None:
    sz = int(sys.argv[1]) * 1024 * 1024 if len(sys.argv) > 1 else 256 * 1024 * 1024
    results = {}
    for n in (1, 8, 32):
        results[n] = run(n, sz)
        print(f"{n:3d} threads: aggregate {results[n]:7.1f} GB/s "
              f"({results[n] / n:.2f} GB/s per thread)")
    if 8 in results and 32 in results:
        ratio = (results[32] / 32) / (results[8] / 8)
        print(f"per-core bandwidth at 32 vs 8 threads: {ratio:.2f}x "
              f"-> bandwidth-bound CPU inflation bound {1 / ratio:.2f}x")


if __name__ == "__main__":
    main()
