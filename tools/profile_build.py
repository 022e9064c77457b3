"""Per-stage build profiling at one parallelism level.

Usage: BLSPARK_STAGE_TIMING=1 python tools/profile_build.py <cpus> [n_turns]
Input is materialized to parquet first (un-timed), like scaling_run.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blacklab_spark.config import EngineConfig
from blacklab_spark.corpus import Corpus
from blacklab_spark.session import get_spark
from blacklab_spark.synth import generate_spark


def main() -> None:
    cpus = int(sys.argv[1])
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    # many small tasks: stage barriers + task quantization are the
    # local-mode scaling killers (a 33-task stage on 32 cores runs a
    # 2nd wave with 1 task); >=8 waves of small tasks smooth both
    # quantization and host-noise stragglers at every cluster size
    spark = get_spark(
        "profile",
        cpus=cpus,
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "512k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    src = f"/tmp/scaling_src_{n_turns}.parquet"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        generate_spark(spark, n_turns, seed=42, n_partitions=256).write.mode(
            "overwrite"
        ).parquet(src)
    tr = spark.read.parquet(src)
    tr.limit(1000).count()
    idx = f"/tmp/prof_idx_{cpus}"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    Corpus.build(spark, tr, idx, EngineConfig(segment_size=1 << 13, block_size=128))
    dt = time.time() - t0
    print(f"TOTAL {dt:.2f}s  {n_turns/dt:.0f} turns/s", file=sys.stderr)
    shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
