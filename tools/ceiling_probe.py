"""Hardware scaling ceilings for the two-cluster-size evidence.

The north rule's N -> 4N executor scaling cannot use a real cluster in
this sandbox; local[8] -> local[32] on ONE VM shares a single memory
system, so the achievable ceiling depends on the workload's byte/compute
mix. This probe measures three ceilings (8 -> 32 worker processes,
zero coordination — upper bounds no Spark job can beat here):

  cpu     sha256 loops (cache-resident compute)
  stream  128MB numpy copy+scale loops (pure memory bandwidth)
  build   parquet read -> lower+regex-split tokenize -> zstd parquet
          write over real transcript rows (the index build's actual
          byte flow, no Spark)

On a REAL N -> 4N executor cluster each added node brings its own
memory channels and disks, so bandwidth scales with N; on this VM it
does not (stream typically ~1.3-1.4x for 4x processes). Engine
efficiency should therefore be read against the matching ceiling:
query scoring vs `cpu`, index build vs `build`.

Usage: python tools/ceiling_probe.py [n_small] [n_large] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import glob
import hashlib
import json
import multiprocessing as mp
import os
import sys
import time


def _cpu_work(_):
    x = b"x" * 4096
    for _i in range(20000):
        x = hashlib.sha256(x).digest() + x[:3968]
    return 1


def _stream_work(_):
    import numpy as np

    a = np.empty(1 << 24)
    a.fill(1.0)
    b = np.empty_like(a)
    for _i in range(10):
        np.copyto(b, a)
        a *= 1.0000001
    return 1


_SRC_GLOB = "/tmp/scaling_src_*.parquet/part-*.parquet"


def _build_work(args):
    wid, files = args
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for i, f in enumerate(files):
        t = pq.read_table(f, columns=["conv_id", "turn_idx", "text"])
        toks = pc.split_pattern_regex(pc.utf8_lower(t.column("text")), r"[^a-z0-9]+")
        out = t.append_column("tokens", toks)
        dst = f"/tmp/_ceiling_probe_{wid}_{i}.parquet"
        pq.write_table(out, dst, compression="zstd")
        os.remove(dst)
    return 1


def _bench(kind: str, nproc: int) -> float:
    if kind == "build":
        files = sorted(glob.glob(_SRC_GLOB))
        if not files:
            return float("nan")
        per = max(1, min(3, len(files) // nproc))
        jobs = [(w, files[(w * per) % len(files):][:per]) for w in range(nproc)]
        with mp.Pool(nproc) as p:
            t0 = time.time()
            p.map(_build_work, jobs)
            wall = time.time() - t0
        return nproc * per / wall
    work = _cpu_work if kind == "cpu" else _stream_work
    with mp.Pool(nproc) as p:
        t0 = time.time()
        p.map(work, [None] * nproc)
        wall = time.time() - t0
    return nproc / wall


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out: dict = {"n_small": n_small, "n_large": n_large, "reps": reps}
    for kind in ("cpu", "stream", "build"):
        best = {n_small: 0.0, n_large: 0.0}
        for _ in range(reps):
            for n in (n_small, n_large):
                r = _bench(kind, n)
                if r == r and r > best[n]:  # skip NaN
                    best[n] = r
        if best[n_small] > 0:
            speedup = best[n_large] / best[n_small]
            out[kind] = {
                "small_rate": round(best[n_small], 2),
                "large_rate": round(best[n_large], 2),
                "speedup": round(speedup, 2),
                "ceiling_efficiency": round(speedup / (n_large / n_small), 3),
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
