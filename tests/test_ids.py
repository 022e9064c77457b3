"""Dense-id assignment: zero-shuffle fast path (range-disjoint file
source) and generic range-shuffle path must both produce the exact
dense rank, and the fast path must add no Exchange."""

from pyspark.sql import functions as F

from blacklab_spark.ids import _stable_partitioning, with_dense_id
from blacklab_spark.synth import generate_pandas


def _check(out, n):
    rows = out.select("doc_id", "conv_id", "turn_idx").orderBy("doc_id").collect()
    ids = [r["doc_id"] for r in rows]
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert ids == list(range(n))
    assert keys == sorted(keys)


def test_fast_path_parquet(spark, tmp_path):
    p = str(tmp_path / "src.parquet")
    pdf = generate_pandas(800, seed=7)
    spark.createDataFrame(pdf).repartitionByRange(
        4, "conv_id", "turn_idx"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    assert _stable_partitioning(df)
    out = with_dense_id(df, ("conv_id", "turn_idx"), "doc_id")
    # zero-shuffle: no data exchange (a BroadcastExchange for the tiny
    # offsets table is fine)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    _check(out, 800)


def test_generic_path_shuffled_source(spark, tmp_path):
    p = str(tmp_path / "src2.parquet")
    pdf = generate_pandas(800, seed=8)
    spark.createDataFrame(pdf).write.parquet(p)
    # hash-repartitioned source: ranges overlap -> generic path
    df = spark.read.parquet(p).repartition(4)
    out = with_dense_id(df, ("conv_id", "turn_idx"), "doc_id")
    _check(out, 800)


def test_local_relation_source(spark):
    # createDataFrame sources have unstable partition planning; must
    # take the generic path and stay exact
    pdf = generate_pandas(500, seed=9)
    df = spark.createDataFrame(pdf)
    assert not _stable_partitioning(df)
    out = with_dense_id(df, ("conv_id", "turn_idx"), "doc_id")
    _check(out, 500)


def test_fast_path_survives_split_packing(spark, tmp_path):
    """Sorted table written as many small files: Spark's scan planner
    size-sorts and bin-packs chunks of different files into shared
    partitions, so whole-partition ranges overlap — but per-(pid,file)
    slices stay disjoint and the zero-shuffle stamp must still engage
    (no Exchange in the plan) and produce the exact global rank."""
    import pandas as pd
    from pyspark.sql import functions as F

    from blacklab_spark.ids import with_dense_id

    src = str(tmp_path / "packed")
    n = 20000
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i:08d}" for i in range(n)],
            "turn_idx": [0] * n,
            "payload": ["x" * 50] * n,
        }
    )
    # 40 small files, each a contiguous conv range
    spark.createDataFrame(pdf).repartitionByRange(40, "conv_id").write.mode(
        "overwrite"
    ).parquet(src)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "64k")
    try:
        df = spark.read.parquet(src)
        out = with_dense_id(df, ("conv_id", "turn_idx"), "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # broadcast exchange (the tiny slice table) is fine; a shuffle
        # (hash/range repartition) means the generic path ran
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        assert "Exchange rangepartitioning" not in plan, plan[:800]
        got = {
            r["conv_id"]: r["doc_id"]
            for r in out.select("conv_id", "doc_id").collect()
        }
        assert len(got) == n
        for i, cid in enumerate(sorted(got)):
            assert got[cid] == i, (cid, got[cid], i)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
