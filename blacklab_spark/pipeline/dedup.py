"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
- exact dedup: one hash-groupBy on md5(text) — partial aggregation
  absorbs duplicates map-side; never shuffles document text, only
  (hash, doc_id).
- MinHash/LSH: signatures are computed as JVM-side array expressions
  (no explode of the shingle set, no Python); the only shuffle keys are
  (band_idx, band_key) — bounded-size buckets replace the O(n²)
  all-pairs join. Verification joins only candidate pairs.
- SimHash: per-doc 32-bit fingerprint via one explode + groupBy(doc_id)
  — doc-keyed, skew-free.
All hashes derive from md5 so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from blacklab_spark.pipeline import SQL_TOKEN_PATTERN, spark_hash32, spark_hash60

N_HASHES = 12
BAND_ROWS = 3  # 12 hashes / 3 rows = 4 bands
SHINGLE_K = 3
SIMHASH_BITS = 60  # widest md5-prefix hash that fits a signed BIGINT
#                    in both Spark and the DuckDB oracle; 60 bits give
#                    2^(60/(d+1))-sized band spaces instead of the old
#                    32-bit / 256-buckets-per-band degeneracy at scale
# degenerate-bucket guard default: buckets above this size are dropped
# before pairing (boilerplate/empty-doc families that exact_dedup
# already collapses); bounds the candidate join at O(n * cap) instead
# of O(n^2 / bucket_space)
DEFAULT_MAX_BUCKET = 2000


def _toks(col: str = "text") -> str:
    return f"regexp_extract_all(lower({col}), '{SQL_TOKEN_PATTERN}', 0)"


def _shingles_expr(k: int = SHINGLE_K) -> str:
    toks = _toks()
    return (
        f"case when size({toks}) >= {k} then "
        f"array_distinct(transform(sequence(1, size({toks}) - {k - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {k})))) "
        f"else array(concat_ws(' ', {toks})) end"
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups: keep-first representative + group size.
    One row per distinct text."""
    return (
        docs.select("doc_id", F.expr("md5(text)").alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def minhash_signature(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, sig: array<bigint>) — min over shingles of H salted
    32-bit hashes. Shingles are exploded ONCE, then one hash-aggregate
    computes all H mins (partial aggregation map-side): tokenization
    and shingling run exactly once per doc regardless of H, and the
    shuffle moves only (doc_id, H mins)."""
    sh = docs.select("doc_id", F.explode(F.expr(_shingles_expr())).alias("s"))
    aggs = [
        F.min(F.expr(spark_hash32("s", f"h{i}"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    mins = sh.groupBy("doc_id").agg(*aggs)
    return mins.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(docs: DataFrame, n_hashes: int = N_HASHES,
                        band_rows: int = BAND_ROWS,
                        max_bucket: int | None = DEFAULT_MAX_BUCKET,
                        persist_bands: bool = True) -> DataFrame:
    """Banded LSH: docs sharing any band of their MinHash signature.
    Shuffle key = (band_idx, band_key): bucket sizes are bounded by
    collision probability, not corpus size — the scale path that
    replaces the O(n²) self-join.

    ``max_bucket`` (default ON) guards the degenerate-bucket failure
    mode (a band key shared by e.g. millions of empty/boilerplate docs
    turns one bucket into an O(n²) join): buckets above the cap are
    dropped before pairing — at scale such buckets are exact-dup
    families that exact_dedup already collapses, so dropping them loses
    no near-dup signal. The dropped buckets ride along as the returned
    DataFrame's ``_blspark_dropped_buckets`` attribute (band_idx,
    band_key, size) so callers can log/audit them; the oracle applies
    the same cap. Pass None for exhaustive output."""
    sigs = minhash_signature(docs, n_hashes)
    n_bands = n_hashes // band_rows
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(
                            f"md5(concat_ws(',', slice(sig, {b * band_rows + 1}, {band_rows})))"
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_key")
    if persist_bands:
        # the band table is ~200 B/doc (vs KBs of text): persisting it
        # means tokenize/shingle/hash runs ONCE even though the
        # self-join + bucket audit read it multiple times (at 10^8 docs
        # this is ~20 GB across executors, MEMORY_AND_DISK spills).
        # The handle rides on the result as _blspark_bands so a long
        # pipeline can unpersist after its dedup stage.
        from pyspark import StorageLevel

        bands = bands.persist(StorageLevel.MEMORY_AND_DISK)
    dropped = None
    if max_bucket is not None:
        # bucket-size guard via a window over the SAME (band_idx,
        # band_key) exchange the join needs — no second signature scan
        # and no semi-join; the two identical join branches below then
        # share one ReusedExchange, so tokenize/shingle/hash runs once
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_key")
        bands = bands.withColumn("_bsz", F.count(F.lit(1)).over(w))
        dropped = (
            bands.filter(F.col("_bsz") > max_bucket)
            .groupBy("band_idx", "band_key")
            .agg(F.count(F.lit(1)).alias("size"))
        )
        bands = bands.filter(F.col("_bsz") <= max_bucket).drop("_bsz")
    a, b = bands.alias("a"), bands.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    if dropped is not None:
        out._blspark_dropped_buckets = dropped
    if persist_bands:
        out._blspark_bands = bands
    return out


def ngram_jaccard(docs: DataFrame, pairs: DataFrame | None = None,
                  threshold: float = 0.0) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (default: LSH
    candidates). Output (doc_a, doc_b, jaccard_x10000:int)."""
    if pairs is None:
        pairs = lsh_candidate_pairs(docs)
    sh = docs.select("doc_id", F.explode(F.expr(_shingles_expr())).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard_x10000",
            F.expr("cast(floor(10000.0 * n_common / (n_a + n_b - n_common)) as bigint)"),
        )
        .select("doc_a", "doc_b", "jaccard_x10000")
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard_x10000") >= int(threshold * 10000))
    return out


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash fingerprint: bit b is set when the tf-weighted
    sum of (2·bit_b(h(token)) − 1) over tokens is positive. 60-bit
    default (md5-derived, signed-BIGINT-safe in Spark AND the DuckDB
    oracle) — wide enough that banded near-dup search keeps
    2^(bits/(d+1)) bucket values per band at scale."""
    toks = docs.select("doc_id", F.explode(F.expr(_toks())).alias("tok"))
    hash_fn = spark_hash60 if bits > 32 else spark_hash32
    h = toks.withColumn("h", F.expr(hash_fn("tok")))
    aggs = [
        F.sum(F.expr(f"(cast(shiftright(h, {b}) & 1 as int)) * 2 - 1")).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = h.groupBy("doc_id").agg(*aggs)
    fp = " + ".join(
        f"(case when s{b} > 0 then cast({1 << b} as bigint) else 0 end)" for b in range(bits)
    )
    return sums.select("doc_id", F.expr(f"cast({fp} as bigint)").alias("simhash"))


def simhash_neardup_pairs(docs: DataFrame, max_hamming: int = 3,
                          bits: int = SIMHASH_BITS) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming, using
    the classic block-permutation trick: split the fingerprint into
    (max_hamming+1) bands COVERING ALL BITS (pigeonhole: ≤d differing
    bits leave ≥1 of d+1 bands identical) — the join key is
    (band_idx, band_bits), never all-pairs. Band boundaries are spread
    evenly so every fingerprint bit lands in exactly one band."""
    fps = simhash(docs, bits)
    n_bands = max_hamming + 1
    bounds = [i * bits // n_bands for i in range(n_bands + 1)]
    bands = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(
                            f"shiftright(simhash, {bounds[i]}) & "
                            f"{(1 << (bounds[i + 1] - bounds[i])) - 1}"
                        ).alias("band_bits"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_bits")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.expr("bit_count(fp_a ^ fp_b)")
    ).filter(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


def dedup_clusters(
    docs: DataFrame,
    threshold_x10000: int = 8000,
    pairs: DataFrame | None = None,
    include_exact: bool = True,
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    verified near-duplicate graph. Output one row per document,
    ``(doc_id, cluster_id)`` where cluster_id = min doc_id reachable
    through edges; a training pipeline keeps ``doc_id == cluster_id``
    rows and drops the rest.

    Edges: LSH candidate pairs verified at shingle-Jaccard >=
    ``threshold_x10000`` (exact verification — LSH recall never
    *creates* false merges), plus exact-duplicate star edges (md5
    groups) so byte-identical docs cluster even when the bucket cap
    dropped their degenerate LSH buckets.

    Scale: distributed min-label propagation with pointer jumping
    (path halving) — per round one edge join + hash agg plus one
    label self-join, so label depth halves each round and convergence
    is O(log max-component-diameter) rounds, not O(diameter) (the
    two-phase star algorithms of Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14, have the same round bound; the
    label-table variant here avoids their collect-neighbors step, so
    no hub node ever materializes its adjacency list in one task).
    Near-dup components are near-cliques in practice, so typical
    convergence is 2-3 rounds. Each round localCheckpoints the label
    table: lineage stays O(1) and a lost executor recomputes one
    round, not the whole chain."""
    if pairs is None:
        pairs = ngram_jaccard(docs).filter(
            F.col("jaccard_x10000") >= threshold_x10000
        ).select("doc_a", "doc_b")
    else:
        pairs = pairs.select("doc_a", "doc_b")
    if include_exact:
        exact = docs.select("doc_id", F.expr("md5(text)").alias("h"))
        grp = exact.groupBy("h").agg(F.min("doc_id").alias("root"))
        star = (
            exact.join(grp, "h")
            .filter(F.col("doc_id") != F.col("root"))
            .select(F.col("root").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        )
        pairs = pairs.unionByName(star)
    # symmetric edge list; shuffle key is always a doc id — skew-free.
    # localCheckpoint: the LSH + Jaccard pipeline behind `pairs` must
    # run ONCE, not once per propagation round
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
        )
    ).distinct().localCheckpoint()
    lab = docs.select("doc_id", F.col("doc_id").alias("lab")).localCheckpoint()
    for _ in range(max_iter):
        # min label among neighbors (one hop)...
        neigh = (
            edges.join(lab, edges.src == lab.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("lab").alias("nmin"))
        )
        # ...and the label's own label (pointer jump / path halving)
        jump = (
            lab.alias("a")
            .join(
                lab.select(
                    F.col("doc_id").alias("lid"), F.col("lab").alias("jmin")
                ),
                F.col("a.lab") == F.col("lid"),
            )
            .select(F.col("a.doc_id").alias("doc_id"), "jmin")
        )
        new = (
            lab.join(neigh, "doc_id", "left")
            .join(jump, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    "lab", F.coalesce("nmin", "lab"), F.coalesce("jmin", "lab")
                ).alias("lab"),
            )
            .localCheckpoint()  # also materializes for the change count
        )
        changed = (
            new.join(lab.withColumnRenamed("lab", "old"), "doc_id")
            .filter(F.col("lab") < F.col("old"))
            .count()
        )
        lab = new
        if changed == 0:
            break
    return lab.select("doc_id", F.col("lab").alias("cluster_id"))
