"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     — flagship query: build the inverted index over the
                   sf0.001 documents corpus and run a top-k BM25 query.
queries()        — one entry per implemented operator (SURVEY.md §2 +
                   the training-data pipeline ops).
oracle_sql()     — DuckDB-runnable ANSI SQL equivalents, value-exact.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index build + top-k BM25 over sf0.001 documents."""
    from blacklab_spark.entry_queries import q_bm25_topk

    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from blacklab_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from blacklab_spark.entry_queries import ORACLES

    return dict(ORACLES)
