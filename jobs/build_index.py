"""spark-submit job: build (or resume) the inverted index.

    spark-submit --py-files dist/blacklab_spark.zip jobs/build_index.py \
        --input  <transcripts table: parquet path or catalog table> \
        --index  <index dir (shared storage on a real cluster)> \
        --resume            # skip stages with a _STAGE_DONE marker
        [--segment-size N] [--block-size N]

The input must have the transcript shape
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp). On a cluster the SparkSession comes from spark-submit's
conf (master/executors set there); standalone runs fall back to local
mode. Checkpointed stages + per-partition lineage in `segments_meta`
make a killed build resumable with `--resume` (north rule).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or table name")
    ap.add_argument("--index", required=True, help="index output directory")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--segment-size", type=int, default=1 << 13)
    ap.add_argument("--block-size", type=int, default=128)
    args = ap.parse_args()

    from blacklab_spark.config import EngineConfig
    from blacklab_spark.corpus import Corpus

    spark = SparkSession.builder.appName("blacklab-build-index").getOrCreate()
    src = args.input
    if src.endswith(".parquet") or "/" in src:
        transcripts = spark.read.parquet(src)
    else:
        transcripts = spark.read.table(src)

    t0 = time.time()
    corpus = Corpus.build(
        spark,
        transcripts,
        args.index,
        EngineConfig(segment_size=args.segment_size, block_size=args.block_size),
        resume=args.resume,
    )
    dt = time.time() - t0
    n_docs = corpus.meta["n_docs"]
    print(
        json.dumps(
            {
                "index": args.index,
                "n_docs": n_docs,
                "build_s": round(dt, 2),
                "turns_per_sec": round(n_docs / dt, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
