"""Inverted-index build pipeline (Spark-first).

Reference behavior being re-expressed (NOT ported): BlackLab's codec
intercepts Lucene segment writes and produces postings + forward index
+ terms files per segment (reference codec/BlackLab40PostingsWriter.java:222-340,
doc/index-formats/integrated.md:17-103). Our analogue:

  transcripts ──dense doc_id──> tokenized (forward index, parquet)
       │                            │
       │                            ├─> doc_stats + global meta (N, avgdl)
       │                            ├─> terms dict (salted two-phase agg,
       │                            │   dense alphabetical term_id)
       │                            └─> explode -> join term_id
       │                                 -> shuffle by segment_id
       │                                 -> vectorized numpy block encode
       │                                 -> postings parquet, partitioned
       │                                    by segment_id
       └─> spans table (one 'turn' span per doc; analogue of the
           reference's starttag annotation, SpansTags.java:81-102)

Scale design notes (the 100-TB story):
- *Segments are doc ranges*, like Lucene's. The posting-build shuffle
  key is segment_id — uniformly sized by construction, so Zipf head
  terms can NOT skew the build shuffle; a head term costs memory only
  within one bounded segment task (segment_size docs max).
- The terms dict is the only global, term-keyed aggregation. Partial
  (map-side) aggregation already defuses count skew; the dense
  term_id assignment reuses the two-pass range-partitioned rank (no
  global window).
- Every stage writes to its own directory with a _STAGE_DONE marker +
  per-partition lineage rows in segments_meta -> resumable builds
  (north rule): `build_index(..., resume=True)` skips finished stages.
- Everything between source and the numpy block encoder is pure
  DataFrame API — Catalyst does pruning/pushdown; the encoder is one
  applyInPandas per segment (vectorized numpy inside).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from blacklab_spark.config import EngineConfig
from blacklab_spark.ids import with_dense_id
from blacklab_spark.index import codec

POSTINGS_SCHEMA = (
    "segment_id long, term_id long, block_id int, n_docs int, "
    "min_doc long, max_doc long, doc_ids binary, freqs binary, "
    "dls binary, positions binary, block_max_tf int, block_max_wtf double"
)

SEGMENTS_META_SCHEMA = (
    "stage string, partition_id long, rows long, tokens long, checksum string"
)


def _stage_dir(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, name)


def _stage_done(index_dir: str, name: str) -> bool:
    return os.path.exists(os.path.join(_stage_dir(index_dir, name), "_STAGE_DONE"))


def _mark_done(index_dir: str, name: str, payload: dict | None = None) -> None:
    with open(os.path.join(_stage_dir(index_dir, name), "_STAGE_DONE"), "w") as f:
        json.dump(payload or {}, f)


def tokenize(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Vectorized tokenization, entirely JVM-side (regexp_extract_all in
    whole-stage codegen — the analogue of the reference's
    BLStandardAnalyzer, analysis/BLStandardAnalyzer.java). `tokens`
    keeps original case (the 'sensitive' annotation); `tokens_i` is the
    insensitive variant the postings are built over
    (cf. MatchSensitivity.java:14-17)."""
    pat = cfg.token_pattern
    return df.withColumn(
        "tokens", F.expr(f"regexp_extract_all(text, '(?i){pat}', 0)")
    ).withColumn("tokens_i", F.expr("transform(tokens, t -> lower(t))")).withColumn(
        "num_tokens", F.size("tokens")
    )


def make_encoder(cfg: EngineConfig, n_docs: int, avgdl: float):
    """Posting-block encoder for one (segment, term-bucket) slice —
    a single vectorized numpy pass, no per-block Python (the grouped
    codec splits one encoded byte stream into per-block buffers).
    Shared by the full build and incremental delta builds."""
    k1, b, block_size = cfg.k1, cfg.b, cfg.block_size
    n_docs_b, avgdl_b = n_docs, avgdl

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["segment_id"].iloc[0])
        tid = pdf["term_id"].to_numpy(np.int64)
        did = pdf["doc_id"].to_numpy(np.int64)
        pos = pdf["pos"].to_numpy(np.int64)
        dl = pdf["num_tokens"].to_numpy(np.int64)
        dfv = pdf["df"].to_numpy(np.int64)
        order = np.lexsort((pos, did, tid))
        tid, did, pos, dl, dfv = (
            tid[order], did[order], pos[order], dl[order], dfv[order]
        )
        # group boundaries at (term, doc) changes
        td_change = np.empty(len(tid), dtype=bool)
        td_change[0] = True
        np.not_equal(tid[1:], tid[:-1], out=td_change[1:])
        td_change[1:] |= did[1:] != did[:-1]
        td_starts = np.flatnonzero(td_change)
        tf = np.diff(np.append(td_starts, len(tid)))
        g_tid = tid[td_starts]
        g_did = did[td_starts]
        g_dl = dl[td_starts]
        g_df = dfv[td_starts]
        idf = np.log(1.0 + (n_docs_b - g_df + 0.5) / (g_df + 0.5))
        score = idf * (tf / (tf + k1 * (1.0 - b + b * g_dl / avgdl_b)))

        # blocks: runs of <= block_size (term,doc) groups per term
        t_change = np.empty(len(g_tid), dtype=bool)
        t_change[0] = True
        np.not_equal(g_tid[1:], g_tid[:-1], out=t_change[1:])
        t_starts = np.flatnonzero(t_change)
        t_counts = np.diff(np.append(t_starts, len(g_tid)))
        within = np.arange(len(g_tid)) - np.repeat(t_starts, t_counts)
        block_starts = np.flatnonzero(within % block_size == 0)
        block_lens = np.diff(np.append(block_starts, len(g_tid)))
        block_ends = block_starts + block_lens

        # per-block payloads via the grouped codec
        did_deltas = codec.delta_encode_grouped(g_did, block_starts)
        doc_bytes = codec.varint_encode_grouped(did_deltas, block_lens)
        tf_bytes = codec.varint_encode_grouped(tf, block_lens)
        dl_bytes = codec.varint_encode_grouped(g_dl, block_lens)
        pos_deltas = codec.delta_encode_grouped(pos, td_starts)
        flat_block_lens = np.add.reduceat(tf, block_starts)
        pos_bytes = codec.varint_encode_grouped(pos_deltas, flat_block_lens)

        return pd.DataFrame(
            {
                "segment_id": np.full(len(block_starts), seg, dtype=np.int64),
                "term_id": g_tid[block_starts],
                "block_id": (within[block_starts] // block_size).astype(np.int32),
                "n_docs": block_lens.astype(np.int32),
                "min_doc": g_did[block_starts],
                "max_doc": g_did[block_ends - 1],
                "doc_ids": doc_bytes,
                "freqs": tf_bytes,
                "dls": dl_bytes,
                "positions": pos_bytes,
                "block_max_tf": np.maximum.reduceat(tf, block_starts).astype(np.int32),
                "block_max_wtf": np.maximum.reduceat(score, block_starts),
            }
        )

    return encode_group


def encode_postings(
    tokenized: DataFrame,
    terms: DataFrame,
    cfg: EngineConfig,
    n_docs: int,
    avgdl: float,
) -> DataFrame:
    """tokenized -> posting blocks. Encode parallelism = segments x
    term-buckets: blocks are per (segment, term), so bucketing terms is
    partition-safe; it also bounds any Zipf head term to one task."""
    exploded = tokenized.select(
        "segment_id",
        "doc_id",
        "num_tokens",
        F.posexplode("tokens_i").alias("pos", "term"),
    )
    # term -> term_id: vocab is tiny next to the corpus, broadcast;
    # (at >~100M-term vocab Spark falls back to sort-merge + AQE
    # skew-split automatically when the broadcast threshold trips)
    joined = exploded.join(F.broadcast(terms.select("term", "term_id", "df")), "term")
    salted = joined.withColumn(
        "bucket", F.pmod(F.hash("term_id"), F.lit(cfg.encode_buckets))
    )
    return salted.groupBy("segment_id", "bucket").applyInPandas(
        make_encoder(cfg, n_docs, avgdl), schema=POSTINGS_SCHEMA
    )


def turn_spans(tokenized: DataFrame) -> DataFrame:
    """The implicit per-turn span rows (analogue of the reference's
    starttag annotation, SpansTags.java:81-102)."""
    return tokenized.select(
        "doc_id",
        F.lit("turn").alias("tag"),
        F.lit(0).alias("start"),
        F.col("num_tokens").alias("end"),
        F.map_from_arrays(
            F.array(F.lit("role"), F.lit("tool")),
            F.array(F.col("role"), F.col("tool")),
        ).alias("attrs"),
    )


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    cfg: EngineConfig | None = None,
    resume: bool = False,
    extra_spans: DataFrame | None = None,
) -> dict:
    """``extra_spans``: optional (conv_id, turn_idx, tag, start, end,
    attrs:map) rows — inline tags beyond the implicit per-turn span
    (the analogue of `<s>`/`<entity>` starttag tokens,
    reference SpansTags.java:81-102)."""
    """Build all index tables under ``index_dir``. Returns meta dict."""
    cfg = cfg or EngineConfig()
    os.makedirs(index_dir, exist_ok=True)
    lineage: list[pd.DataFrame] = []

    # ---- stage 1: forward index (tokenized table) --------------------
    tok_path = _stage_dir(index_dir, "tokenized")
    if not (resume and _stage_done(index_dir, "tokenized")):
        with_ids = with_dense_id(transcripts, ("conv_id", "turn_idx"), "doc_id")
        tokenized = tokenize(with_ids, cfg).withColumn(
            "segment_id", F.expr(f"doc_id DIV {cfg.segment_size}")
        )
        n_out = max(spark.sparkContext.defaultParallelism, 8)
        (
            tokenized.repartitionByRange(n_out, "doc_id")
            .write.mode("overwrite")
            .partitionBy("segment_id")
            .parquet(tok_path)
        )
        _mark_done(index_dir, "tokenized")
    tokenized = spark.read.parquet(tok_path)

    # ---- stage 2: doc stats + global meta ----------------------------
    stats_path = _stage_dir(index_dir, "doc_stats")
    if not (resume and _stage_done(index_dir, "doc_stats")):
        doc_stats = tokenized.select(
            "doc_id", "segment_id", "conv_id", "turn_idx", "role", "tool", "num_tokens"
        )
        doc_stats.write.mode("overwrite").parquet(stats_path)
        _mark_done(index_dir, "doc_stats")
    doc_stats = spark.read.parquet(stats_path)

    agg = doc_stats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("num_tokens").alias("total_tokens")
    ).collect()[0]
    n_docs, total_tokens = int(agg["n_docs"]), int(agg["total_tokens"] or 0)
    avgdl = (total_tokens / n_docs) if n_docs else 0.0

    # ---- stage 3: terms dictionary -----------------------------------
    terms_path = _stage_dir(index_dir, "terms")
    if not (resume and _stage_done(index_dir, "terms")):
        exploded = tokenized.select(
            "doc_id", F.explode("tokens_i").alias("term")
        )
        # two-phase agg: per-(term,doc) tf first (map-side partial aggs
        # already absorb Zipf skew), then per-term df/cf
        per_doc = exploded.groupBy("term", "doc_id").agg(
            F.count(F.lit(1)).alias("tf")
        )
        term_stats = per_doc.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        )
        # dense alphabetical term_id == sensitive sort position
        # (reference precomputes collator sort orders per terms dict,
        # forwardindex/Terms.java:69-95); our terms are already
        # case-folded so insensitive order == sensitive order here.
        terms = with_dense_id(term_stats, ("term",), "term_id")
        terms = terms.withColumn("sort_pos_s", F.col("term_id")).withColumn(
            "sort_pos_i", F.col("term_id")
        )
        terms.write.mode("overwrite").parquet(terms_path)
        _mark_done(index_dir, "terms")
    terms = spark.read.parquet(terms_path)

    # ---- stage 4: postings (the inverted index) ----------------------
    post_path = _stage_dir(index_dir, "postings")
    if not (resume and _stage_done(index_dir, "postings")):
        postings = encode_postings(tokenized, terms, cfg, n_docs, avgdl)
        (
            postings.write.mode("overwrite")
            .partitionBy("segment_id")
            .parquet(post_path)
        )
        _mark_done(index_dir, "postings")
    postings = spark.read.parquet(post_path)
    # ---- stage 5: spans table (turn spans; analogue of starttag) -----
    spans_path = _stage_dir(index_dir, "spans")
    if not (resume and _stage_done(index_dir, "spans")):
        spans = turn_spans(tokenized)
        if extra_spans is not None:
            extra = extra_spans.join(
                tokenized.select("conv_id", "turn_idx", "doc_id"),
                ["conv_id", "turn_idx"],
            ).select(
                "doc_id",
                "tag",
                F.col("start").cast("int").alias("start"),
                F.col("end").cast("int").alias("end"),
                F.col("attrs").cast("map<string,string>").alias("attrs"),
            )
            spans = spans.unionByName(extra)
        spans.write.mode("overwrite").parquet(spans_path)
        _mark_done(index_dir, "spans")

    # ---- stage 6: lineage + meta --------------------------------------
    meta = {
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": avgdl,
        "k1": cfg.k1,
        "b": cfg.b,
        "segment_size": cfg.segment_size,
        "block_size": cfg.block_size,
        "token_pattern": cfg.token_pattern,
        "n_terms": terms.count(),
        "n_posting_blocks": postings.count(),
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)

    # per-partition lineage: rows+tokens+checksum per segment
    lin = (
        spark.read.parquet(stats_path)
        .groupBy("segment_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("num_tokens").alias("tokens"),
            F.md5(F.concat_ws(",", F.sort_array(F.collect_list("doc_id")))).alias(
                "checksum"
            ),
        )
        .select(
            F.lit("doc_stats").alias("stage"),
            F.col("segment_id").alias("partition_id"),
            "rows",
            "tokens",
            "checksum",
        )
    )
    lin.write.mode("overwrite").parquet(_stage_dir(index_dir, "segments_meta"))
    return meta
