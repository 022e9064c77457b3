"""Scale-safe dense id assignment.

BlackLab's doc ids are Lucene's dense segment-local ints rebased by
docBase (reference search/results/SpansReader.java:212-310). Our global
``doc_id`` is a dense rank over a stable ordering, assigned with the
classic distributed two-pass (range-partition -> per-partition counts
-> broadcast offsets -> narrow id stamp). No global window, no
single-partition sort, no per-row Python: the stamp is a vectorized
Arrow pass. Cost at any scale: one range shuffle + one tiny collect.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def with_dense_id(
    df: DataFrame,
    order_cols: tuple[str, ...],
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = dense 0-based rank of rows under ``order_cols``.

    Equivalent to ``row_number() over (order by *order_cols) - 1`` but
    executes as two narrow passes over a range-partitioned sort instead
    of a single-partition window.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    d = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in d.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_fields = [f for f in d.schema.fields if f.name != "_pid"]
    out_schema_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    out_schema_ddl += f", {id_col} long"
    keep_names = [f.name for f in out_fields]

    def stamp(batches):
        next_id = None
        for batch in batches:
            if next_id is None:
                pid = batch.column("_pid")[0].as_py()
                next_id = b_offsets.value[pid]
            ids = pa.array(np.arange(next_id, next_id + batch.num_rows, dtype=np.int64))
            next_id += batch.num_rows
            cols = [batch.column(name) for name in keep_names] + [ids]
            yield pa.RecordBatch.from_arrays(cols, names=keep_names + [id_col])

    return d.mapInArrow(stamp, schema=out_schema_ddl)
