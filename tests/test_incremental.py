"""Incremental index maintenance tests — the analogue of the
reference's TestDeleteDocument / IndexerImpl add-to-existing-index
behavior, plus resumable-build markers."""

import os

import pytest
from pyspark.sql import functions as F

from blacklab_spark.config import EngineConfig
from blacklab_spark.corpus import Corpus
from blacklab_spark.index.incremental import (
    add_documents,
    compact,
    delete_documents,
    load_deletes,
)
from blacklab_spark.oracle import OracleIndex
from blacklab_spark.synth import generate_pandas


@pytest.fixture(scope="module")
def incr_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("incr") / "idx")
    pdf = generate_pandas(600, seed=7)
    corpus = Corpus.build(
        spark, spark.createDataFrame(pdf), d, EngineConfig(segment_size=256, block_size=16)
    )
    return d, pdf


def test_add_documents(spark, incr_idx):
    d, pdf = incr_idx
    extra = generate_pandas(200, seed=8, start_conv=50_000)
    meta = add_documents(spark, d, spark.createDataFrame(extra))
    assert meta["n_docs"] == 800
    assert meta["generation"] == 1

    corpus = Corpus.open(spark, d)
    # combined corpus must be rank-identical to an oracle over all rows
    import pandas as pd

    allrows = pd.concat([pdf, extra], ignore_index=True)
    oracle = OracleIndex.from_rows(allrows.to_dict("records"))
    # doc_id mapping differs (delta starts at a segment boundary), so
    # compare by (conv_id, turn_idx) identity and score
    got = corpus.topk("word00001 word00050", k=5).collect()
    exp = oracle.bm25_topk("word00001 word00050", k=5)
    exp_keys = [
        (oracle.docs[i]["conv_id"], oracle.docs[i]["turn_idx"]) for i, _ in exp
    ]
    got_keys = [(r["conv_id"], r["turn_idx"]) for r in got]
    assert got_keys == exp_keys
    for r, (_, s) in zip(got, exp):
        assert abs(r["score"] - s) < 1e-9

    # new docs are searchable via spans too
    h = corpus.find('"word00001"')
    assert h.count() == len(oracle.term_hits("word00001"))


def test_delete_and_query(spark, incr_idx):
    d, pdf = incr_idx
    corpus = Corpus.open(spark, d)
    # delete every doc of one conversation
    victim = corpus.doc_stats.filter(F.col("conv_id") == "conv000000000000").select("doc_id")
    n_victims = victim.count()
    assert n_victims > 0
    n = delete_documents(spark, d, victim)
    assert n == n_victims
    dels = load_deletes(spark, d)
    assert dels.count() == n_victims

    # topk must never return tombstoned docs
    top = corpus.topk("word00001 word00050", k=10)
    assert top.filter(F.col("conv_id") == "conv000000000000").count() == 0

    # span queries must not return tombstoned docs
    h = corpus.find('"word00001"')
    live = h.df.join(corpus.doc_stats, "doc_id").filter(
        F.col("conv_id") == "conv000000000000"
    )
    assert live.count() == 0


def test_compact(spark, incr_idx):
    d, pdf = incr_idx
    pre = Corpus.open(spark, d)
    n_before = pre.meta["n_docs"]
    dels = load_deletes(spark, d).count()
    meta = compact(spark, d)
    assert meta["n_docs"] == n_before - dels
    assert load_deletes(spark, d) is None

    corpus = Corpus.open(spark, d)
    # deleted conversation is really gone from all tables
    assert corpus.doc_stats.filter(F.col("conv_id") == "conv000000000000").count() == 0
    assert corpus.tokenized.filter(F.col("conv_id") == "conv000000000000").count() == 0

    # stats now reflect live docs only; scores match a fresh oracle
    import pandas as pd

    extra = generate_pandas(200, seed=8, start_conv=50_000)
    allrows = pd.concat([pdf, extra], ignore_index=True)
    allrows = allrows[allrows["conv_id"] != "conv000000000000"]
    oracle = OracleIndex.from_rows(allrows.to_dict("records"))
    got = corpus.topk("word00001 word00050", k=5).collect()
    exp = oracle.bm25_topk("word00001 word00050", k=5)
    exp_keys = [
        (oracle.docs[i]["conv_id"], oracle.docs[i]["turn_idx"]) for i, _ in exp
    ]
    assert [(r["conv_id"], r["turn_idx"]) for r in got] == exp_keys
    for r, (_, s) in zip(got, exp):
        assert abs(r["score"] - s) < 1e-9

    # lineage rows recorded for both operations
    lin = corpus.segments_meta
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert {"add_documents", "compact"} <= stages


def test_resume_skips_stages(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("resume") / "idx")
    pdf = generate_pandas(300, seed=9)
    df = spark.createDataFrame(pdf)
    cfg = EngineConfig(segment_size=128, block_size=16)
    Corpus.build(spark, df, d, cfg)
    # mtimes of stage outputs must survive a resumed rebuild
    tok_marker = os.path.join(d, "tokenized", "_STAGE_DONE")
    m0 = os.path.getmtime(tok_marker)
    Corpus.build(spark, df, d, cfg, resume=True)
    assert os.path.getmtime(tok_marker) == m0
