"""Scale-safe dense id assignment.

BlackLab's doc ids are Lucene's dense segment-local ints rebased by
docBase (reference search/results/SpansReader.java:212-310). Our global
``doc_id`` is a dense rank over a stable ordering.

Two physical strategies, picked by a cheap key-only pre-pass:

1. **Pre-ranged fast path (zero shuffle).** If the input's partitions
   already cover pairwise-disjoint key ranges — the natural layout of
   an Iceberg/parquet table written sorted or partitioned by the key
   (e.g. transcripts laid out by conv_id) — then dense rank =
   per-partition offset + local row index. The pre-pass reads ONLY the
   key columns (parquet column pruning) to get per-partition
   (count, min, max); the main pass is `sortWithinPartitions` (local
   sort, no exchange) + `monotonically_increasing_id` (partition id in
   the upper 31 bits, record number in the lower 33) + a broadcast
   join against the offsets. Zero data movement. Within-partition
   order is NOT required — only range disjointness — because the
   local sort establishes it.

2. **Generic path (one range shuffle).** Otherwise: repartitionByRange
   on the key (the sampling job is column-pruned), persist, tiny
   per-partition count collect, then the same local-sort + mono-id +
   broadcast-offset stamp. No window over _pid anywhere — a window
   partitioned by _pid would force a second full hash exchange.

Everything stays JVM-side (whole-stage codegen). (An earlier revision
stamped ids in an Arrow pass; pushing full rows through Python workers
measurably anti-scaled at high core counts, so this stays in the JVM.)
Cost at 100-TB scale: sorted-table ingest pays ZERO shuffle; unsorted
ingest pays exactly one range shuffle + one tiny collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

_RECORD_BITS = 33  # monotonically_increasing_id: record number bit width


def _partition_key_stats(df: DataFrame, order_cols: tuple[str, ...]):
    """One column-pruned pass: per (physical partition, source file)
    SLICE — (pid, file, count, min_key, max_key) with key =
    struct(order_cols).

    Slicing by file matters: Spark's scan planner size-sorts and
    bin-packs file chunks, so one partition routinely holds chunks of
    DIFFERENT files. Whole-partition ranges then overlap even for a
    perfectly sorted table, but the per-(pid, file) slices stay
    range-disjoint — and disjoint slices are all the zero-shuffle
    stamp needs. Non-file sources yield file='' and degrade to plain
    per-partition stats."""
    key = F.struct(*[F.col(c) for c in order_cols])
    rows = (
        df.select(key.alias("_key"))
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_file", F.input_file_name())
        .groupBy("_pid", "_file")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("_key").alias("kmin"),
            F.max("_key").alias("kmax"),
        )
        .collect()
    )
    return rows


def _keys_clean(stats) -> bool:
    """False when any partition key bound is NULL (or holds a NULL
    field) — Row comparison would raise, and NULL ordering is
    ill-defined here; such inputs take the generic range-shuffle path
    (repartitionByRange has well-defined null ordering)."""
    for r in stats:
        for bound in (r["kmin"], r["kmax"]):
            if bound is None or any(v is None for v in bound):
                return False
    return True


def _disjoint_ranges(stats) -> bool:
    for prev, cur in zip(stats, stats[1:]):
        if prev["kmax"] >= cur["kmin"]:
            return False
    return True


def _stamp(df: DataFrame, order_cols: tuple[str, ...], id_col: str, slices) -> DataFrame:
    """Local sort + mono-id + broadcast slice join; no exchange.

    ``slices``: (pid, local_lo, local_hi, global_offset) rows. After
    the local sort, a partition's rows 0..n-1 decompose into contiguous
    runs — one per range-disjoint slice, in key order — so a row's
    global rank is slice_offset + (local_row - local_lo). The
    single-slice-per-partition case (generic path) degenerates to the
    plain per-partition offset join."""
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        slices, "_spid int, _lo long, _hi long, _off long"
    )
    m = F.monotonically_increasing_id()
    d = (
        df.sortWithinPartitions(*order_cols)
        .withColumn("_mono", m)
        .withColumn("_pid", F.shiftright("_mono", _RECORD_BITS).cast("int"))
        .withColumn(
            "_r", F.col("_mono").bitwiseAND(F.lit((1 << _RECORD_BITS) - 1))
        )
    )
    cond = (
        (d["_pid"] == off_df["_spid"])
        & (d["_r"] >= off_df["_lo"])
        & (d["_r"] < off_df["_hi"])
    )
    return (
        d.join(F.broadcast(off_df), cond)
        .withColumn(id_col, F.col("_off") + F.col("_r") - F.col("_lo"))
        .drop("_pid", "_spid", "_lo", "_hi", "_off", "_mono", "_r")
    )


def _stable_partitioning(df: DataFrame) -> bool:
    """True iff two separate queries over ``df`` are guaranteed to see
    the same physical partition ids: a file-based scan (deterministic
    split planning) with only narrow ops above it (no Exchange — AQE
    re-plans shuffle partitioning per query, and LocalRelation plans
    parallelize differently per query)."""
    try:
        if not df.inputFiles():
            return False
        plan = df._jdf.queryExecution().executedPlan().toString()
        return "Exchange" not in plan
    except Exception:
        return False


def with_dense_id(
    df: DataFrame,
    order_cols: tuple[str, ...],
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = dense 0-based rank of rows under ``order_cols``
    (keys must be unique). Equivalent to
    ``row_number() over (order by *order_cols) - 1`` without the
    single-partition global window."""
    spark = df.sparkSession

    if _stable_partitioning(df):
        slices = _partition_key_stats(df, order_cols)
        if slices and _keys_clean(slices):
            ordered = sorted(slices, key=lambda r: r["kmin"])
            if _disjoint_ranges(ordered):
                # global offset per slice, in key order
                glob: dict[tuple, int] = {}
                acc = 0
                for r in ordered:
                    glob[(r["_pid"], r["_file"])] = acc
                    acc += int(r["cnt"])
                # per-partition local starts: a partition's slices in
                # key order become contiguous runs after the local sort
                by_pid: dict[int, list] = {}
                for r in ordered:
                    by_pid.setdefault(int(r["_pid"]), []).append(r)
                stamp_rows = []
                for pid, rs in by_pid.items():
                    lo = 0
                    for r in rs:
                        cnt = int(r["cnt"])
                        stamp_rows.append(
                            (pid, lo, lo + cnt, glob[(r["_pid"], r["_file"])])
                        )
                        lo += cnt
                return _stamp(df, order_cols, id_col, stamp_rows)

    # generic path: one range shuffle, then the same local stamp.
    # The persist pins the (sampled, hence nondeterministic) range
    # partitioning so the counted offsets stay valid; callers must
    # release it once the stamped output is materialized — the handle
    # is exposed as `_blspark_persisted` (see release_dense_id_cache).
    # 4x parallelism: the stamped output feeds parquet writes, and too
    # few range partitions produce few fat files whose row groups
    # bottleneck every downstream scan (measured: a 32-file tokenized
    # table gave one 94s straggler task in the posting encode)
    n = num_partitions or 4 * spark.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, *order_cols).persist(StorageLevel.MEMORY_AND_DISK)
    counts = {
        r["_pid"]: r["cnt"]
        for r in (
            d.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
    }
    slices: list[tuple[int, int, int, int]] = []
    acc = 0
    for pid in sorted(counts):
        slices.append((pid, 0, counts[pid], acc))
        acc += counts[pid]
    out = _stamp(d, order_cols, id_col, slices)
    out._blspark_persisted = d
    return out


def release_dense_id_cache(df: DataFrame) -> None:
    """Unpersist the intermediate the generic with_dense_id path pinned
    (no-op for the zero-shuffle fast path). Call after the stamped
    output has been materialized (written/collected) — otherwise the
    executor-memory pin leaks across repeated builds in one session."""
    d = getattr(df, "_blspark_persisted", None)
    if d is not None:
        d.unpersist()
    d2 = getattr(df, "_blspark_persisted_extra", None)
    if d2 is not None:
        d2.unpersist()
