"""Hardware scaling ceiling probe.

Measures how a pure-CPU, shared-nothing workload (sha256 loops in N
worker processes, zero coordination) scales from n_small to n_large
processes on THIS machine. This is the upper bound any Spark job can
reach here: the sandbox VM shows both multi-tenant steal noise and
small-core-count turbo headroom, so even embarrassingly parallel work
does not scale 4x from 8 to 32 processes. Report engine scaling
efficiency alongside this ceiling.

Usage: python tools/hw_probe.py [n_small] [n_large] [reps]
Prints one JSON line with best-of-reps throughput at each size and the
ceiling efficiency.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time


def _work(_):
    x = b"x" * 4096
    for _i in range(20000):
        x = hashlib.sha256(x).digest() + x[:3968]
    return 1


def measure(n: int, reps: int) -> float:
    best = 0.0
    for _ in range(reps):
        with mp.Pool(n) as p:
            t0 = time.time()
            p.map(_work, range(n * 8))
            rate = n * 8 / (time.time() - t0)
        best = max(best, rate)
    return best


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    r_small = measure(n_small, reps)
    r_large = measure(n_large, reps)
    factor = n_large / n_small
    print(
        json.dumps(
            {
                "n_small": n_small,
                "n_large": n_large,
                "reps": reps,
                "best_small_tasks_per_sec": round(r_small, 1),
                "best_large_tasks_per_sec": round(r_large, 1),
                "speedup": round(r_large / r_small, 2),
                "hw_ceiling_efficiency": round(r_large / (factor * r_small), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
