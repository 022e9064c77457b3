"""Top-k BM25 over the posting blocks.

The reference inherits scored top-k from Lucene 8's IndexSearcher
(BM25 k1=1.2 b=0.75, block-max WAND over impact-sorted postings;
reference search/BlackLabIndexAbstract.java:496,619). Our execution:

1. resolve query terms in the terms dict (driver-side; a filter over a
   table that is tiny relative to the corpus),
2. prune the postings scan to the query term_ids — parquet predicate
   pushdown means only those blocks' bytes are read,
3. one vectorized numpy kernel per *segment* (Spark's analogue of
   Lucene's one-SpansReader-per-segment parallelism,
   HitsFromQuery.java:109-194): MaxScore-style term-at-a-time scoring
   with block-max skipping — terms in desc max-contribution order, θ =
   running k-th best, blocks skipped when their stored max impact
   cannot reach/tie θ or when their [min_doc,max_doc] range holds no
   remaining candidate — then a per-segment exact top-k,
4. global top-k merge: orderBy(desc(score), doc_id).limit(k) over the
   tiny union of per-segment candidates (TakeOrderedAndProject).

Scale: step 3's input shuffle moves only the query terms' postings
(KBs..MBs, not the index); step 4 moves ≤ k rows per segment.

score(q,d) = Σ_t idf(t) · tf/(tf + k1·(1−b+b·dl/avgdl)),
idf = ln(1 + (N − df + 0.5)/(df + 0.5)), ties broken by ascending
doc_id — the exact-arithmetic oracle contract (SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from blacklab_spark.index import codec

# above this k, topk_bm25 keeps the plan lazy (broadcast-join hydration)
# instead of materializing k full-text rows on the driver — maxretrieve-
# scale requests must not shift O(k·doc_text) onto the driver
DRIVER_HYDRATE_MAX_K = 1024


def _maxscore_query(
    scores: np.ndarray,
    blocks_by_term: dict,
    qidf_map: dict,
    k: int,
    base: int,
    seg_size: int,
    allow_arr,
    seg_dead_arr: np.ndarray,
    decode_block,
) -> None:
    """MaxScore / block-max scoring of ONE query into ``scores`` — the
    single kernel shared by topk_bm25 and batch_topk (the analogue of
    Lucene's block-max WAND over impact-sorted postings, which applies
    per query in a batch harness too; reference
    tools/.../performance/BatchQuery.java).

    Terms are processed in desc order of their max possible
    contribution U_t = idf_t * max(block_max_wtf). After each term,
    θ = current k-th best segment score. For term t with R = Σ U of the
    remaining terms:
     * if U_t + R <= θ, no unseen doc can reach the top-k, so only docs
       with score > θ - (U_t + R) (candidates) matter — blocks whose
       [min_doc, max_doc] range holds no candidate are skipped without
       decoding;
     * any block with idf_t*bmax + M + R <= θ (M = current max segment
       score) cannot change the top-k and is skipped.
    Strict comparisons everywhere: a doc that can still TIE the k-th
    score may win on the ascending-doc_id tie-break.

    ``blocks_by_term`` maps term -> (block rows, max block_max_wtf_raw);
    ``decode_block(term, block_idx, row) -> (local_doc_ids, w_base)``
    returns idf-independent weights (batch memoizes it so shared blocks
    decode once across queries). Tombstoned docs (``seg_dead_arr``,
    local ids) are zeroed as we go so they never contribute to θ
    (they'd cause over-pruning of live candidates)."""
    items = []
    for t, qidf in qidf_map.items():
        got = blocks_by_term.get(t)
        if got is not None:
            items.append((t, qidf, qidf * got[1]))
    if not items:
        return
    items.sort(key=lambda x: (-x[2], x[0]))
    u = np.array([it[2] for it in items])
    suffix_r = np.concatenate([np.cumsum(u[::-1])[::-1][1:], [0.0]])
    theta = 0.0
    for i, (t, qidf, u_t) in enumerate(items):
        rem = float(suffix_r[i])
        cand_cum = None
        if theta > 0.0 and u_t + rem < theta:
            cand = scores >= (theta - (u_t + rem))
            if not cand.any():
                continue
            cand_cum = np.concatenate([[0], np.cumsum(cand)])
        m_cur = float(scores.max()) if theta > 0.0 else np.inf
        for bi, r in enumerate(blocks_by_term[t][0]):
            if qidf * r.block_max_wtf_raw + m_cur + rem < theta:
                continue  # block-max skip: can't reach or tie top-k
            if cand_cum is not None:
                lo = max(int(r.min_doc) - base, 0)
                hi = min(int(r.max_doc) - base + 1, seg_size)
                if cand_cum[hi] - cand_cum[lo] == 0:
                    continue  # no candidate doc in this block's range
            local, w = decode_block(t, bi, r)
            if allow_arr is not None:
                keep = np.isin(local + base, allow_arr)
                local, w = local[keep], w[keep]
            np.add.at(scores, local, qidf * w)
        if seg_dead_arr.size:
            scores[seg_dead_arr] = 0.0
        nz_now = np.flatnonzero(scores)
        if nz_now.size >= k:
            s = scores[nz_now]
            theta = float(np.partition(s, nz_now.size - k)[nz_now.size - k])
    if seg_dead_arr.size:
        scores[seg_dead_arr] = 0.0


def _topk_select(scores: np.ndarray, k: int) -> np.ndarray:
    """Exact per-segment top-k over a dense score array with
    (score desc, doc_id asc) ties: threshold = k-th largest score; keep
    all above, fill ties by ascending local doc id. Returns selected
    local ids in final order (empty if no nonzero score)."""
    nz = np.flatnonzero(scores)
    if nz.size == 0:
        return nz
    n = nz.size
    if n > k:
        s = scores[nz]
        kth = np.partition(s, n - k)[n - k]
        above = nz[s > kth]
        equal = np.sort(nz[s == kth])[: k - above.size]
        nz = np.concatenate([above, equal])
    order = np.lexsort((nz, -scores[nz]))
    return nz[order]


def _seg_partitioned(corpus, posts: DataFrame) -> DataFrame:
    """Explicit hash repartition on segment_id for the scoring kernel:
    it is CPU-bound per byte, so AQE's byte-based coalescing (advisory
    sizes tuned for scans) would fuse the small posting blocks into too
    few Python tasks and serialize the scoring wave. Sized to
    min(n_segments, 8 x cluster parallelism) — enough waves to absorb
    stragglers without over-fragmenting small clusters. A
    user-specified partition count is exempt from AQE coalescing;
    groupBy reuses the partitioning (no second exchange)."""
    meta = corpus.meta
    n_segments = max(1, -(-meta["n_docs"] // meta["segment_size"]))
    par = corpus.spark.sparkContext.defaultParallelism
    return posts.repartition(min(n_segments, 8 * par), "segment_id")


def topk_bm25(
    corpus,
    query: str,
    k: int = 10,
    filter_expr: str | None = None,
) -> DataFrame:
    """Returns DataFrame (doc_id, score, conv_id, turn_idx, role, tool,
    text) — top-k by (score desc, doc_id asc)."""
    spark = corpus.spark
    meta = corpus.meta
    qterms = corpus.tokenize_query(query)
    out_schema = "doc_id long, score double"

    def empty():
        # no-match results carry the SAME hydrated schema as hits
        hyd = corpus.tokenized.select(
            "doc_id", "conv_id", "turn_idx", "role", "tool", "text"
        )
        sch = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("score", T.DoubleType()),
            ]
            + [f for f in hyd.schema.fields if f.name != "doc_id"]
        )
        return spark.createDataFrame([], sch)

    if not qterms:
        return empty()

    tinfo = corpus.term_stats(qterms)
    if not tinfo:
        return empty()
    n_docs = meta["n_docs"]
    # repeated query terms accumulate idf weight, like Lucene's
    # BooleanQuery with duplicate clauses; idf comes from LIVE stats
    # (appends/compactions change N and df — stored per-block maxima
    # are idf-independent for this reason)
    from collections import Counter

    qcount = Counter(qterms)
    idf_by_term = {
        t: qcount[t]
        * float(np.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5)))
        for t, df_ in tinfo.items()
    }

    posts = corpus.postings.filter(
        F.col("term").isin(list(idf_by_term))
    ).select(
        "segment_id", "term", "min_doc", "max_doc",
        "doc_ids", "freqs", "dls", "block_max_wtf_raw",
    )

    allowed_df = None
    if filter_expr:
        # metadata filter -> DISTRIBUTED per-segment doc set (reference
        # SpanQueryFiltered builds an acceptedDocs bitset per segment,
        # SpansFiltered.java:17-60 — never a driver-global set). The
        # cogroup below ships each segment's allowed doc_ids straight
        # into that segment's scoring task; the filter never visits the
        # driver, so there is no size cliff. doc_stats already excludes
        # tombstoned docs, so deletes need no separate handling here.
        allowed_df = corpus.doc_stats.filter(filter_expr).select(
            "segment_id", "doc_id"
        )

    # tombstones (liveDocs analogue): excluded before per-segment top-k
    # selection so tombstoned docs can't crowd out live candidates.
    # DISTRIBUTED: each segment's tombstones cogroup into that segment's
    # scoring task (same pattern as the metadata filter) — the delete
    # set never visits the driver, so a large tombstone table cannot
    # bloat a broadcast. When a metadata filter is present, doc_stats
    # already excludes tombstoned docs, so deletes need no handling.
    dels = corpus.deletes
    dead_df = None
    if dels is not None and allowed_df is None:
        dead_df = dels.select(
            F.expr(f"doc_id DIV {meta['segment_size']}").alias("segment_id"),
            "doc_id",
        )

    k1, b_ = meta["k1"], meta["b"]
    avgdl = meta["avgdl"]
    seg_size = meta["segment_size"]
    b_idf = spark.sparkContext.broadcast(idf_by_term)

    def _score_segment(pdf: pd.DataFrame, allow_arr, dead_arr=None) -> pd.DataFrame:
        idf = b_idf.value
        seg = int(pdf["segment_id"].iloc[0])
        base = seg * seg_size
        scores = np.zeros(seg_size, dtype=np.float64)
        blocks_by_term = {
            term: (rows := list(grp.itertuples(index=False)),
                   max(r.block_max_wtf_raw for r in rows))
            for term, grp in pdf.groupby("term")
        }
        seg_dead_arr = (
            np.asarray([], dtype=np.int64)
            if dead_arr is None
            else (dead_arr[(dead_arr >= base) & (dead_arr < base + seg_size)] - base)
        )

        def decode_block(t, bi, r):
            dids = codec.decode_doc_ids(r.doc_ids)
            tf = codec.decode_freqs(r.freqs)
            dl = codec.decode_freqs(r.dls)
            return dids - base, tf / (tf + k1 * (1.0 - b_ + b_ * dl / avgdl))

        _maxscore_query(scores, blocks_by_term, idf, k, base, seg_size,
                        allow_arr, seg_dead_arr, decode_block)
        sel = _topk_select(scores, k)
        if sel.size == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"doc_id": (sel + base).astype(np.int64),
                             "score": scores[sel]})

    if allowed_df is not None:
        _empty = pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "score": pd.Series([], dtype=np.float64)}
        )

        def score_cogrouped(posts_pdf: pd.DataFrame,
                            allowed_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(posts_pdf) == 0 or len(allowed_pdf) == 0:
                return _empty
            allow = allowed_pdf["doc_id"].to_numpy(np.int64)
            return _score_segment(posts_pdf, allow)

        per_seg = (
            posts.groupBy("segment_id")
            .cogroup(allowed_df.groupBy("segment_id"))
            .applyInPandas(score_cogrouped, schema=out_schema)
        )
    elif dead_df is not None:

        def score_with_dead(posts_pdf: pd.DataFrame,
                            dead_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(posts_pdf) == 0:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype=np.int64),
                     "score": pd.Series([], dtype=np.float64)}
                )
            dead_arr = dead_pdf["doc_id"].to_numpy(np.int64)
            return _score_segment(posts_pdf, None, dead_arr)

        per_seg = (
            posts.groupBy("segment_id")
            .cogroup(dead_df.groupBy("segment_id"))
            .applyInPandas(score_with_dead, schema=out_schema)
        )
    else:
        # single-arg wrapper: applyInPandas treats a two-arg function
        # as (key, pdf)
        def score_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            return _score_segment(pdf, None)

        per_seg = _seg_partitioned(corpus, posts).groupBy(
            "segment_id"
        ).applyInPandas(score_segment, schema=out_schema)
    # global top-k merge (TakeOrderedAndProject over <=k rows/segment),
    # then hydrate metadata for just those k docs: the isin filter is
    # pushed into the tokenized parquet scan (row-group pruning), so
    # hydration never joins against the full corpus. For display-sized k
    # the k-row join of scores to metadata happens ON THE DRIVER (the
    # score rows are already collected for the isin list): one small
    # scan job instead of a broadcast-join+sort plan — per-query latency
    # is floor-bound by Spark job count, and display decoration of k
    # rows is O(k).
    hyd_src = corpus.tokenized.select(
        "doc_id", "conv_id", "turn_idx", "role", "tool", "text"
    )
    if k > DRIVER_HYDRATE_MAX_K:
        # maxretrieve-scale k: stay lazy and distributed — broadcast the
        # ≤k score rows into the tokenized scan so no full-text row ever
        # lands on the driver, and callers keep pushdown/projection on
        # the returned plan
        top = per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        meta_cols = [f.name for f in hyd_src.schema.fields
                     if f.name != "doc_id"]
        return (
            hyd_src.join(F.broadcast(top), "doc_id")
            .select("doc_id", "score", *meta_cols)
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
    top_rows = per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    full_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
        + [f for f in hyd_src.schema.fields if f.name != "doc_id"]
    )
    if not top_rows:
        return spark.createDataFrame([], full_schema)
    ids = [int(r["doc_id"]) for r in top_rows]
    by_id = {
        r["doc_id"]: r
        for r in hyd_src.filter(F.col("doc_id").isin(ids)).collect()
    }
    meta_cols = [f.name for f in full_schema.fields[2:]]
    rows = [
        tuple(
            [int(r["doc_id"]), float(r["score"])]
            + [by_id[r["doc_id"]][c] if r["doc_id"] in by_id else None
               for c in meta_cols]
        )
        for r in top_rows
    ]
    return spark.createDataFrame(rows, full_schema)


def topk_bm25_phrase(corpus, phrase: str, k: int = 10) -> DataFrame:
    """Phrase-scored top-k: the whole phrase is scored like a single
    term with tf = per-doc phrase occurrence count and df = number of
    docs containing the phrase — Lucene's SpanWeight / sloppy-freq
    semantics at slop 0, the layer the reference inherits but leaves
    unused (SURVEY §2.5 'phrase-scored queries'; reference
    BlackLabIndexAbstract.java:496 creates the plain IndexSearcher
    whose SpanQuery scoring works this way).

    Execution: phrase occurrences come from the span algebra (postings-
    backed sequence join — only the phrase terms' blocks are read),
    per-doc tf is one hash aggregation, and scoring is pure codegen
    (idf from live stats, dl from the doc-stats projection). The only
    driver value is the phrase df scalar — the same single number the
    reference reads from its term dictionary."""
    spark = corpus.spark
    meta = corpus.meta
    out_schema = "doc_id long, score double"
    qterms = corpus.tokenize_query(phrase)
    if not qterms:
        return spark.createDataFrame([], out_schema)
    cql = " ".join(f'"{t}"' for t in qterms)
    hits = corpus.find(cql).df.select("doc_id")
    tf_df = hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf_df.count()  # phrase document frequency (one scalar)
    if df_ == 0:
        return spark.createDataFrame([], out_schema)
    n_docs = meta["n_docs"]
    idf = float(np.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5)))
    k1, b_, avgdl = meta["k1"], meta["b"], meta["avgdl"]
    dl = corpus.doc_stats.select("doc_id", F.col("num_tokens").alias("dl"))
    scored = tf_df.join(dl, "doc_id").select(
        "doc_id",
        (
            F.lit(idf)
            * F.col("tf")
            / (F.col("tf") + k1 * (1.0 - b_ + b_ * F.col("dl") / avgdl))
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def batch_topk(corpus, queries: list[str], k: int = 10) -> "DataFrame":
    """Score MANY queries in ONE Spark job (the reference ships the
    same idea as a perf harness: tools/.../performance/BatchQuery.java).

    One postings scan covers the union of all query terms (parquet
    pushdown on the term column), one per-segment kernel scores every
    query against its blocks, and one window takes global top-k per
    query. Amortizes per-job overhead across the whole batch — the
    honest way to measure query THROUGHPUT at scale.

    Returns (query_id, doc_id, score) with k rows per query, ordered
    (score desc, doc_id asc) within each query.
    """
    from pyspark.sql import Window

    spark = corpus.spark
    meta = corpus.meta
    n_docs = meta["n_docs"]
    out_schema = "query_id int, doc_id long, score double"

    from collections import Counter

    qterm_counts = [Counter(corpus.tokenize_query(q)) for q in queries]
    all_terms = sorted({t for qc in qterm_counts for t in qc})
    if not all_terms:
        return spark.createDataFrame([], out_schema)
    tinfo = corpus.term_stats(all_terms)
    # per-query {term: weighted idf}
    idf_by_query: list[dict[str, float]] = []
    for qc in qterm_counts:
        m = {}
        for t, qtf in qc.items():
            if t in tinfo:
                df_ = tinfo[t]
                m[t] = qtf * float(
                    np.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))
                )
        idf_by_query.append(m)
    live_terms = sorted({t for m in idf_by_query for t in m})
    if not live_terms:
        return spark.createDataFrame([], out_schema)

    posts = corpus.postings.filter(F.col("term").isin(live_terms)).select(
        "segment_id", "term", "min_doc", "max_doc",
        "doc_ids", "freqs", "dls", "block_max_wtf_raw",
    )
    k1, b_, avgdl = meta["k1"], meta["b"], meta["avgdl"]
    seg_size = meta["segment_size"]
    # tombstones cogroup per segment (no driver collect / broadcast)
    dels = corpus.deletes
    dead_df = (
        dels.select(
            F.expr(f"doc_id DIV {seg_size}").alias("segment_id"), "doc_id"
        )
        if dels is not None
        else None
    )
    b_q = spark.sparkContext.broadcast(idf_by_query)

    def score_segment(pdf: pd.DataFrame, dead_arr=None) -> pd.DataFrame:
        """Batch scorer = the SAME MaxScore/block-max kernel as the
        single-query path (_maxscore_query), run per query over shared
        block state: blocks are decoded lazily and memoized, so a block
        several queries need decodes ONCE, and a block no query's θ
        bound ever reaches is never decoded at all. The former batch
        kernel decoded every block of every query term — fine for small
        batches, but a head-term-heavy batch at 100x decodes whole
        head-term posting lists; the θ/candidate-range skips prune them.
        One dense seg_size accumulator is shared by all queries and
        reset candidate-proportionally (scores[nz] = 0) between queries
        — no per-query memset."""
        seg = int(pdf["segment_id"].iloc[0])
        base = seg * seg_size
        blocks_by_term = {
            term: (rows := list(grp.itertuples(index=False)),
                   max(r.block_max_wtf_raw for r in rows))
            for term, grp in pdf.groupby("term")
        }
        seg_dead_arr = (
            np.asarray([], dtype=np.int64)
            if dead_arr is None
            else (dead_arr[(dead_arr >= base) & (dead_arr < base + seg_size)] - base)
        )
        decoded: dict[tuple, tuple] = {}

        def decode_block(t, bi, r):
            got = decoded.get((t, bi))
            if got is None:
                dids = codec.decode_doc_ids(r.doc_ids)
                tf = codec.decode_freqs(r.freqs)
                dl = codec.decode_freqs(r.dls)
                got = (dids - base,
                       tf / (tf + k1 * (1.0 - b_ + b_ * dl / avgdl)))
                decoded[(t, bi)] = got
            return got

        scores = np.zeros(seg_size, dtype=np.float64)
        out_q, out_d, out_s = [], [], []
        for qid, idf_map in enumerate(b_q.value):
            _maxscore_query(scores, blocks_by_term, idf_map, k, base,
                            seg_size, None, seg_dead_arr, decode_block)
            sel = _topk_select(scores, k)
            if sel.size:
                out_q.append(np.full(sel.size, qid, dtype=np.int32))
                out_d.append((sel + base).astype(np.int64))
                out_s.append(scores[sel].copy())
            nz = np.flatnonzero(scores)
            if nz.size:
                scores[nz] = 0.0
        if not out_q:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype=np.int32),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "score": pd.Series([], dtype=np.float64)}
            )
        return pd.DataFrame(
            {"query_id": np.concatenate(out_q),
             "doc_id": np.concatenate(out_d),
             "score": np.concatenate(out_s)}
        )

    if dead_df is not None:
        _empty_b = pd.DataFrame(
            {"query_id": pd.Series([], dtype=np.int32),
             "doc_id": pd.Series([], dtype=np.int64),
             "score": pd.Series([], dtype=np.float64)}
        )

        def score_with_dead(posts_pdf: pd.DataFrame,
                            dead_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(posts_pdf) == 0:
                return _empty_b
            return score_segment(
                posts_pdf, dead_pdf["doc_id"].to_numpy(np.int64)
            )

        per_seg = (
            posts.groupBy("segment_id")
            .cogroup(dead_df.groupBy("segment_id"))
            .applyInPandas(score_with_dead, schema=out_schema)
        )
    else:
        # single-arg wrapper: applyInPandas treats a two-arg function
        # as (key, pdf)
        per_seg = _seg_partitioned(corpus, posts).groupBy(
            "segment_id"
        ).applyInPandas(lambda pdf: score_segment(pdf), schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_seg.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    )
