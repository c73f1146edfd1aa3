"""Spark-free host scaling probe: the upper bound any Spark job can hit.

Runs the same CPU+memory-bound kernel (byte-histogram over a private
buffer — streams memory like a parse kernel does) in N independent
processes for N in (4, 8, 16, 32) and prints per-core throughput and the
N->4N efficiencies. On this sandbox's shared host the 8->32 pair lands
around ~0.82 with ZERO Spark involved — shared memory bandwidth, not
framework overhead, is the binding constraint the extraction ladder's
8->32 numbers in BENCH_r{N}.json should be read against (the 4->16 pair
is the criterion witness). Referenced by BENCH/BASELINE.md.

Usage: python scripts/bandwidth_probe.py [buffer_mb_per_proc]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

BUF_MB = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ROUNDS = 6
RUNGS = (4, 8, 16, 32)


def _kernel(q: mp.Queue, buf_mb: int, rounds: int) -> None:
    buf = bytes(range(256)) * (buf_mb * 1024 * 1024 // 256)
    t0 = time.time()
    acc = 0
    for _ in range(rounds):
        # count() scans the buffer at memcmp speed — memory-bound like a
        # columnar scan; the sum keeps the loop honest
        acc += buf.count(b"\x7f")
    q.put((time.time() - t0, acc))


def _rung(n_procs: int) -> float:
    q: mp.Queue = mp.Queue()
    ps = [
        mp.Process(target=_kernel, args=(q, BUF_MB, ROUNDS)) for _ in range(n_procs)
    ]
    t0 = time.time()
    for p in ps:
        p.start()
    results = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.time() - t0
    total_mb = BUF_MB * ROUNDS * n_procs
    assert all(r[1] > 0 for r in results)
    return total_mb / wall  # MB scanned per second, all procs together


def main() -> None:
    # warm-up rung (page allocation, fork machinery)
    _rung(2)
    thr = {n: max(_rung(n) for _ in range(3)) for n in RUNGS}
    pairs = {}
    for lo, hi in ((4, 16), (8, 32)):
        per_lo, per_hi = thr[lo] / lo, thr[hi] / hi
        pairs[f"{lo}->{hi}"] = round(per_hi / per_lo, 3)
    print(
        json.dumps(
            {
                "metric": "spark_free_scan_mb_per_sec",
                "buffer_mb_per_proc": BUF_MB,
                "throughput_by_procs": {str(n): round(v, 1) for n, v in thr.items()},
                "per_core_efficiency_pairs": pairs,
            }
        )
    )


if __name__ == "__main__":
    main()
