"""Host memory-bandwidth scaling calibration (BENCH/BASELINE.md).

The N-vs-4N scaling bench runs both parallelism levels on ONE box, so
every level shares a single memory subsystem. This probe measures how
aggregate copy bandwidth (read+write, 120MB working set per worker —
far beyond LLC) scales with worker count; the resulting curve is the
hard ceiling for the bandwidth-bound fraction of any Spark stage in
the same measurement, and the reason single-box 2-vs-8-core ratios
UNDERSTATE real-cluster scaling: 4x the executors on a cluster bring
4x the memory controllers, while this box brings the same ~34 GB/s to
2 and to 8 cores.

Usage: python tools/membw_probe.py   (quiet host, ~30s)
"""
from __future__ import annotations

import multiprocessing as mp
import time

import numpy as np


def _worker(q, bar, seconds: float = 4.0) -> None:
    a = np.ones(15_000_000, dtype=np.int64)  # 120 MB source
    b = np.empty_like(a)
    bar.wait()  # all workers allocate first, then measure together
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        np.copyto(b, a)
        n += 1
    q.put(n * a.nbytes * 2 / (time.time() - t0) / 1e9)


def main() -> None:
    for workers in (1, 2, 4, 8):
        q: mp.Queue = mp.Queue()
        bar = mp.Barrier(workers)
        ps = [mp.Process(target=_worker, args=(q, bar)) for _ in range(workers)]
        for p in ps:
            p.start()
        vals = [q.get() for _ in ps]
        for p in ps:
            p.join()
        print(
            f"{workers} workers: per-worker {sum(vals) / len(vals):6.2f} GB/s"
            f"  aggregate {sum(vals):6.1f} GB/s"
        )


if __name__ == "__main__":
    main()
