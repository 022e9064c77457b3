"""One scaling-evidence run: build + query the same corpus at a given
parallelism level. Prints one JSON line. Invoked by scaling_bench.py
in a fresh process per cluster size (fresh JVM, no warm caches).

Usage: python tools/scaling_run.py <cpus> [n_turns]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blacklab_spark.config import EngineConfig
from blacklab_spark.corpus import Corpus
from blacklab_spark.session import get_spark
from blacklab_spark.synth import generate_spark

QUERIES = [
    "word00001 word00050",
    "word00002 word00100 word00500",
    "word00010",
    "word00003 word00007 word00250 word01000",
    "word00020 word00200",
    "word00005 word02000",
    "word00001 word00002 word00003",
    "word00042 word00420 word04200",
]


def main() -> None:
    cpus = int(sys.argv[1])
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    # steady-state JVM: fixed pre-touched heap, so no mid-run page
    # zeroing (kernel-time spikes measured up to 96% sys otherwise)
    os.environ.setdefault("SPARK_DRIVER_MEM", "20g")
    os.environ.setdefault(
        "SPARK_DRIVER_JAVA_OPTS",
        "-XX:+UseParallelGC -Xms20g -XX:+AlwaysPreTouch",
    )
    # fixed shuffle partitioning: both cluster sizes execute the same
    # physical plan over the same splits; only executor count varies.
    # 256 partitions = >=8 task waves at the large size: stage barriers
    # + task quantization otherwise idle most cores on straggler tails.
    # 3m scan splits: the source table's ~2MB files then map one file
    # per task (~256 scan tasks) — the former 8m bin-packing gave the
    # big tokenize+write stage only ~86 tasks = 2.7 waves at 32 cores,
    # so a straggler tail idled most of the cluster for a third of the
    # stage
    spark = get_spark(
        "scaling",
        cpus=cpus,
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "3m",
            "spark.sql.files.openCostInBytes": "256k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    idx = f"/tmp/scaling_idx_{cpus}_{n_turns}"
    shutil.rmtree(idx, ignore_errors=True)
    # materialize the input corpus to parquet FIRST (outside the timed
    # region): the north-rule input is an Iceberg/parquet table on
    # storage, not an in-flight python generator — indexing throughput
    # is measured from the stored table, and the build's range-sampling
    # pass then reads only the pruned key columns
    src = f"/tmp/scaling_src_{n_turns}.parquet"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        generate_spark(spark, n_turns, seed=42, n_partitions=256).write.mode(
            "overwrite"
        ).parquet(src)
    tr = spark.read.parquet(src)
    # steady-state warmup: a small throwaway build + query batch
    # JIT-compiles the hot codegen/kernel paths and spins up the Python
    # workers OUTSIDE the timed region. At the north rule's 10^12-turn
    # scale JIT cost is amortized to zero; inside a minutes-long probe
    # it is a fixed serial tax that the faster (large) size pays
    # proportionally more of, understating true scaling.
    warm_idx = f"/tmp/scaling_warm_{cpus}"
    shutil.rmtree(warm_idx, ignore_errors=True)
    warm_corpus = Corpus.build(
        spark,
        generate_spark(spark, 200_000, seed=7, n_partitions=64),
        warm_idx,
        EngineConfig(segment_size=1 << 15, block_size=128),
    )
    warm_corpus.batch_topk(["word00001 word00050", "word00002"], k=10).count()
    shutil.rmtree(warm_idx, ignore_errors=True)

    t0 = time.time()
    # 32k-doc segments: the block-row count (the per-row overhead that
    # dominates postings write + terms agg) scales with
    # segments x vocab-per-segment, and each kernel slice still peaks
    # well under 100MB — fewer, larger segments move less memory per
    # turn at identical query semantics
    corpus = Corpus.build(
        spark, tr, idx, EngineConfig(segment_size=1 << 15, block_size=128)
    )
    build_s = time.time() - t0

    # query throughput: batched multi-query job (amortizes per-job
    # overhead — measures scoring compute, not driver round-trips);
    # 256 queries over a rotating term mix: a 64-query batch left the
    # 32-core run dominated by its fixed job floor (~4s of the ~8s
    # wall), understating throughput scaling — a saturating batch is
    # the honest throughput workload at cluster scale
    batch = [
        f"word{(7 * i) % 3000:05d} word{(13 * i) % 800:05d} word{(29 * i) % 12000:05d}"
        for i in range(256)
    ]
    corpus.batch_topk(batch[:4], k=10).count()  # warmup
    t0 = time.time()
    n_res = corpus.batch_topk(batch, k=10).count()
    query_batch_s = time.time() - t0
    n_q = len(batch)

    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_turns": n_turns,
                "build_s": round(build_s, 2),
                "build_turns_per_sec": round(n_turns / build_s, 1),
                "query_batch_s": round(query_batch_s, 2),
                "queries_per_sec": round(n_q / query_batch_s, 2),
            }
        )
    )
    shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
