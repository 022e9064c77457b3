"""Deep differential fuzz: run N random CQL queries (fresh seed, larger
corpus than the CI test) through BOTH planner modes against the naive
interpreter from tests/test_differential.py.

Usage: python tools/deep_fuzz.py [n_queries] [seed] [n_docs]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import pandas as pd

from blacklab_spark.config import EngineConfig
from blacklab_spark.corpus import Corpus
from blacklab_spark.session import get_spark
from test_differential import _random_docs, engine_hits, gen_queries, naive_find


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 777001
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 60

    spark = get_spark("deep-fuzz", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = _random_docs(seed, n_docs)
    pdf = pd.DataFrame(
        {
            "conv_id": [f"d{i:03d}" for i in range(len(docs))],
            "turn_idx": [0] * len(docs),
            "role": ["user"] * len(docs),
            "text": [" ".join(d) for d in docs],
            "tool": [""] * len(docs),
            "ts": pd.to_datetime(["2025-01-01"] * len(docs)),
        }
    )
    idx = f"/tmp/deep_fuzz_idx_{seed}"
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    corpus = Corpus.build(
        spark, spark.createDataFrame(pdf), idx, EngineConfig(segment_size=8, block_size=4)
    )
    orig = corpus.cfg
    t0 = time.time()
    failures = 0
    for i, q in enumerate(gen_queries(seed + 1, n_queries)):
        expected = naive_find(docs, q)
        for label, ratio in (("probe", 1.01), ("join", 0.0)):
            corpus.cfg = dataclasses.replace(orig, fi_probe_ratio=ratio)
            got = engine_hits(corpus, q)
            if got != expected:
                failures += 1
                print(f"FAIL [{label}] {q!r}\n  naive={expected[:12]}\n  engine={got[:12]}",
                      flush=True)
        if (i + 1) % 50 == 0:
            print(f"... {i + 1}/{n_queries} ({time.time() - t0:.0f}s)", flush=True)
    # constraint (MatchFilter) axis: 1 constraint query per 5 plain ones
    from test_differential import _gen_constraint_queries, naive_constrained

    n_constraints = max(1, n_queries // 5)
    for i, (cq, a, b, g, h, fn) in enumerate(
        _gen_constraint_queries(seed + 2, n_constraints)
    ):
        expected = naive_constrained(docs, a, b, g, h, fn)
        for label, ratio in (("probe", 1.01), ("join", 0.0)):
            corpus.cfg = dataclasses.replace(orig, fi_probe_ratio=ratio)
            got = engine_hits(corpus, cq)
            if got != expected:
                failures += 1
                print(f"FAIL [{label}] {cq!r}\n  naive={expected[:12]}\n"
                      f"  engine={got[:12]}", flush=True)
        if (i + 1) % 50 == 0:
            print(f"... constraints {i + 1}/{n_constraints} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    corpus.cfg = orig
    print(f"done: {n_queries}+{n_constraints} queries x 2 modes, "
          f"{failures} failures, {time.time() - t0:.0f}s", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
