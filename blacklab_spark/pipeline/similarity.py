"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exact baseline. Dot products are
  JVM-side `aggregate(zip_with(...))` expressions in float64 — no
  Python, no UDF; the global top-k is TakeOrderedAndProject.
- LSH (sign random projection) bucketing: the scale path. Hyperplanes
  are derived deterministically from md5, so results are reproducible
  across runs/clusters. Probing compares only within-bucket vectors:
  the shuffle key is the hash bucket, never all-pairs.
- exact near-dup pairs: bounded self-join for oracle-verifiable tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0.0D, (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))"


def _dot(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


def _norm(a: str) -> str:
    return _NORM.format(a=a)


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 20,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.
    Output (vec_id, cos_x10000) ordered by (sim desc, vec_id)."""
    q = "array(" + ", ".join(f"cast({float(v)!r} as double)" for v in query_vec) + ")"
    sim = (
        f"{_dot(vec_col, q)} / ({_norm(vec_col)} * {_norm(q)})"
    )
    return (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.expr(f"cast(floor({sim} * 10000 + 0.5) as bigint)").alias("cos_x10000"),
        )
        .orderBy(F.desc("cos_x10000"), "vec_id")
        .limit(k)
    )


def exact_neardup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                        vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """All pairs with cosine ≥ threshold — exact O(n²) baseline for
    verification; use lsh_neardup_pairs at scale."""
    e = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.expr(_norm(vec_col)).alias("nrm"),
    )
    a = e.select(F.col("vid").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", F.expr(f"{_dot('va', 'vb')} / (na * nb)"))
        .filter(F.col("cos") >= threshold)
        .select(
            "vec_a",
            "vec_b",
            F.expr("cast(floor(cos * 10000 + 0.5) as bigint)").alias("cos_x10000"),
        )
    )


# 16 planes give 65,536 buckets per table (the old 8 -> 256 buckets
# degenerates into O(n²/256) candidate joins at 10^8+ vectors); 16
# independent tables hold near-dup recall: P(collide in one table) at
# cos 0.95 is (1-θ/π)^16 = 0.898^16 ≈ 0.179, miss = (1-0.179)^16 ≈
# 0.043 -> ≥0.95 expected recall. Planes stay a deterministic md5
# parity so the DuckDB oracle replicates the bucketing bit-for-bit.
N_PLANES = 16
N_TABLES = 16


def rademacher_signs(dim: int, n_planes: int, table: int) -> np.ndarray:
    """Deterministic ±1 hyperplanes (Rademacher SRP): sign(t,p,d) = +1
    iff the first 8 md5 hex digits of 'srp|t|p|d' are even. The rule is
    a pure md5 parity, so the DuckDB oracle regenerates the exact same
    planes and replicates the bucketing bit-for-bit — the approximation
    itself becomes oracle-verifiable. Shape (dim, n_planes)."""
    import hashlib

    s = np.empty((dim, n_planes), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"srp|{table}|{p}|{d}".encode()).hexdigest()[:8], 16)
            s[d, p] = 1.0 if h % 2 == 0 else -1.0
    return s


def srp_signatures(embeddings: DataFrame, n_planes: int = N_PLANES,
                   n_tables: int = N_TABLES, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """(vec_id, table_id, bucket) — sign-random-projection bucket per
    vector per table. The sign matrices are broadcast numpy (one matmul
    per Arrow batch, dimension-independent — NO dim×planes literal
    expression tree in the plan); only tiny signature rows shuffle."""
    import pandas as pd

    dim = int(embeddings.select(F.size(vec_col).alias("d")).first()["d"])
    signs = np.stack(
        [rademacher_signs(dim, n_planes, t) for t in range(n_tables)]
    )  # (T, dim, P)
    b_signs = embeddings.sparkSession.sparkContext.broadcast(signs)

    def run(batches):
        s = b_signs.value
        n_t, _, n_p = s.shape
        weights = (1 << np.arange(n_p)).astype(np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            ids = pdf[id_col].to_numpy(np.int64)
            outs = []
            for t in range(n_t):
                bits = (x @ s[t]) > 0.0
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "table_id": np.full(len(ids), t, dtype=np.int32),
                            "bucket": bits.astype(np.int64) @ weights,
                        }
                    )
                )
            yield pd.concat(outs)

    return embeddings.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        run, schema="vec_id long, table_id int, bucket long"
    )


def lsh_neardup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                      n_planes: int = N_PLANES,
                      n_tables: int = N_TABLES,
                      max_bucket: int | None = None) -> DataFrame:
    """Approximate near-dup pairs: candidates share an SRP bucket in at
    least one of ``n_tables`` independent tables, then exact cosine
    verification on candidates only. The shuffle key is (table_id,
    bucket) — never all-pairs — and the candidate join moves only
    (vec_id, bucket) signature rows; embedding vectors are joined back
    for the candidate pairs alone. Default 16 planes × 16 tables gives
    ≥0.95 expected recall at cos 0.95 (miss = (1−0.898^16)^16 ≈ 0.043)
    with 2^16 bucket values per table — sized for 10^8+ vectors.
    ``max_bucket`` optionally drops degenerate buckets (e.g. a zero
    vector family) before pairing; dropped buckets are exposed on the
    result's ``_blspark_dropped_buckets`` attribute."""
    sigs = srp_signatures(embeddings, n_planes, n_tables)
    dropped = None
    if max_bucket is not None:
        sizes = sigs.groupBy("table_id", "bucket").agg(
            F.count(F.lit(1)).alias("size")
        )
        ok = sizes.filter(F.col("size") <= max_bucket).select("table_id", "bucket")
        dropped = sizes.filter(F.col("size") > max_bucket)
        sigs = sigs.join(ok, ["table_id", "bucket"], "leftsemi")
    a = sigs.select(F.col("vec_id").alias("vec_a"), "table_id", "bucket")
    b = sigs.select(F.col("vec_id").alias("vec_b"), "table_id", "bucket")
    cand = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    e = embeddings.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").alias("v"),
        F.expr(_norm("embedding")).alias("nrm"),
    )
    cand = (
        cand.join(
            e.select(F.col("vid").alias("vec_a"), F.col("v").alias("va"),
                     F.col("nrm").alias("na")),
            "vec_a",
        )
        .join(
            e.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb"),
                     F.col("nrm").alias("nb")),
            "vec_b",
        )
    )
    out = (
        cand.withColumn("cos", F.expr(f"{_dot('va', 'vb')} / (na * nb)"))
        .filter(F.col("cos") >= threshold)
        .select(
            "vec_a",
            "vec_b",
            F.expr("cast(floor(cos * 10000 + 0.5) as bigint)").alias("cos_x10000"),
        )
    )
    if dropped is not None:
        out._blspark_dropped_buckets = dropped
    return out


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: the cluster-pruned scale path. Coarse
# quantizer = deterministic stride-sampled centroids (a standard IVF
# baseline quantizer; k-means would improve recall but is not
# deterministic), so the DuckDB oracle can regenerate the exact same
# centroid set, assignment, and probe order.
# ---------------------------------------------------------------------------


def ivf_centroids(embeddings: DataFrame, n_centroids: int = 8,
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """Deterministic coarse quantizer: every ``stride``-th vector by id
    (stride = ceil(n / n_centroids)) is a centroid. Returns
    (centroid_ids int64[C], centroid_matrix float64[C, dim]) on the
    driver — the centroid table is tiny by construction (C vectors,
    e.g. 65k x 768 floats ≈ 200 MB at 10^9-vector scale) and is meant
    to be broadcast."""
    n = embeddings.count()
    stride = max(1, -(-n // n_centroids))  # ceil
    rows = (
        embeddings.filter(F.col(id_col) % stride == 0)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy("cid")
        .collect()
    )
    cids = np.asarray([r["cid"] for r in rows], dtype=np.int64)
    mat = np.asarray([list(r["cv"]) for r in rows], dtype=np.float64)
    return cids, mat


def ivf_assignments(embeddings: DataFrame, n_centroids: int = 8,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    centroids: tuple | None = None) -> DataFrame:
    """(vec_id, centroid_id): nearest centroid by cosine (ties -> the
    smaller centroid id). Build-time step of the IVF index: one
    broadcast-matmul Arrow pass over the data, zero shuffle. At scale
    the embeddings table is then written clustered by centroid_id so a
    probe prunes whole files/partitions. ``centroids``: a precomputed
    ivf_centroids() result, so callers holding one skip the
    count+collect jobs."""
    import pandas as pd

    cids, mat = (
        centroids
        if centroids is not None
        else ivf_centroids(embeddings, n_centroids, vec_col, id_col)
    )
    cnorm = np.sqrt((mat * mat).sum(axis=1))
    cnorm[cnorm == 0.0] = 1.0
    b = embeddings.sparkSession.sparkContext.broadcast((cids, mat, cnorm))

    def run(batches):
        c_ids, c_mat, c_nrm = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            xn = np.sqrt((x * x).sum(axis=1))
            xn[xn == 0.0] = 1.0
            # cosine to every centroid; argmax returns the FIRST max,
            # and c_ids is ascending, so ties resolve to the smaller id
            sims = (x @ c_mat.T) / (xn[:, None] * c_nrm[None, :])
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(np.int64),
                    "centroid_id": c_ids[np.argmax(sims, axis=1)],
                }
            )

    return embeddings.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        run, schema="vec_id long, centroid_id long"
    )


def build_ann(embeddings: DataFrame, out_dir: str, n_centroids: int = 8,
              vec_col: str = "embedding", id_col: str = "vec_id") -> str:
    """Materialize the IVF index as a BUILD artifact (the clustered
    layout ivf_assignments' docstring promises): under ``out_dir``,
    - centroids/          tiny (centroid_id, centroid) parquet
    - by_centroid/        the embeddings written partitionBy(centroid_id)
    Assignment runs ONCE here (one broadcast-matmul Arrow pass + one
    repartition into the centroid layout); every later ivf_topk over
    the artifact is a partition-pruned scan — no assignment recompute,
    no full-corpus matmul on the query path. Resumable (skips when the
    _ANN_DONE marker exists)."""
    import json
    import os

    import pandas as pd

    done = os.path.join(out_dir, "_ANN_DONE")
    if os.path.exists(done):
        return out_dir
    spark = embeddings.sparkSession
    cents = ivf_centroids(embeddings, n_centroids, vec_col, id_col)
    cids, mat = cents
    spark.createDataFrame(
        [(int(c), [float(x) for x in row]) for c, row in zip(cids, mat)],
        "centroid_id long, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "centroids")
    )
    b = spark.sparkContext.broadcast(
        (cids, mat, np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-300))
    )

    def assign(batches):
        c_ids, c_mat, c_nrm = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            xn = np.sqrt((x * x).sum(axis=1))
            xn[xn == 0.0] = 1.0
            sims = (x @ c_mat.T) / (xn[:, None] * c_nrm[None, :])
            out = pdf.copy()
            out["centroid_id"] = c_ids[np.argmax(sims, axis=1)]
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in embeddings.schema.fields
    ) + ", centroid_id long"
    (
        embeddings.mapInPandas(assign, schema=schema)
        # one shuffle into the centroid layout so each inverted list is
        # a contiguous partition directory (at 10^9 vectors this is the
        # index build's only all-to-all move, and it is what turns every
        # probe forever after into partition pruning)
        .repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(out_dir, "by_centroid"))
    )
    with open(done, "w") as f:
        json.dump({"n_centroids": n_centroids, "vec_col": vec_col,
                   "id_col": id_col}, f)
    return out_dir


def load_ann(spark, ann_dir: str):
    """-> (centroids tuple, clustered embeddings DF). The assignments
    relation is the clustered table's (vec_id, centroid_id) projection
    — zero extra jobs, column-pruned."""
    import os

    rows = (
        spark.read.parquet(os.path.join(ann_dir, "centroids"))
        .orderBy("centroid_id")
        .collect()
    )
    cids = np.asarray([r["centroid_id"] for r in rows], dtype=np.int64)
    mat = np.asarray([list(r["centroid"]) for r in rows], dtype=np.float64)
    emb = spark.read.parquet(os.path.join(ann_dir, "by_centroid"))
    return (cids, mat), emb


def ivf_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             n_centroids: int = 8, nprobe: int = 3,
             assignments: DataFrame | None = None,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: tuple | None = None,
             ann_dir: str | None = None) -> DataFrame:
    """IVF ANN top-k: rank centroids by cosine to the query on the
    driver (C is tiny), probe the best ``nprobe`` inverted lists, and
    exact-score ONLY vectors assigned to those lists with the JVM-side
    cosine expression + TakeOrderedAndProject. Scanned fraction ≈
    nprobe / n_centroids.

    With ``ann_dir`` (a build_ann artifact) the query path loads stored
    centroids and scans the centroid-clustered table with partition
    pruning — no assignment matmul, no join, no full-corpus scan; this
    is the 100-TB shape. Without it, assignment is recomputed inline
    (exploratory use). Output (vec_id, cos_x10000) ordered by
    (sim desc, vec_id)."""
    if ann_dir is not None:
        centroids, clustered = load_ann(embeddings.sparkSession, ann_dir)
        cids, mat = centroids
        q = np.asarray(query_vec, dtype=np.float64)
        qn = np.sqrt((q * q).sum()) or 1.0
        cnorm = np.sqrt((mat * mat).sum(axis=1))
        cnorm[cnorm == 0.0] = 1.0
        sims = (mat @ q) / (cnorm * qn)
        order = np.lexsort((cids, -sims))
        probed = [int(c) for c in cids[order[:nprobe]]]
        qlit = "array(" + ", ".join(
            f"cast({float(v)!r} as double)" for v in query_vec
        ) + ")"
        sim = f"{_dot(vec_col, qlit)} / ({_norm(vec_col)} * {_norm(qlit)})"
        return (
            clustered.filter(F.col("centroid_id").isin(probed))
            .select(
                F.col(id_col).alias("vec_id"),
                F.expr(f"cast(floor({sim} * 10000 + 0.5) as bigint)").alias(
                    "cos_x10000"
                ),
            )
            .orderBy(F.desc("cos_x10000"), "vec_id")
            .limit(k)
        )
    if centroids is None:
        centroids = ivf_centroids(embeddings, n_centroids, vec_col, id_col)
    if assignments is None:
        assignments = ivf_assignments(
            embeddings, n_centroids, vec_col, id_col, centroids=centroids
        )
    cids, mat = centroids
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum()) or 1.0
    cnorm = np.sqrt((mat * mat).sum(axis=1))
    cnorm[cnorm == 0.0] = 1.0
    sims = (mat @ q) / (cnorm * qn)
    # stable sort: sim desc, centroid id asc
    order = np.lexsort((cids, -sims))
    probed = [int(c) for c in cids[order[:nprobe]]]
    qlit = "array(" + ", ".join(
        f"cast({float(v)!r} as double)" for v in query_vec
    ) + ")"
    sim = f"{_dot(vec_col, qlit)} / ({_norm(vec_col)} * {_norm(qlit)})"
    cand = assignments.filter(F.col("centroid_id").isin(probed)).select(
        F.col("vec_id").alias("_ivf_cand_id")
    )
    return (
        embeddings.join(cand, F.col(id_col) == F.col("_ivf_cand_id"), "leftsemi")
        .select(
            F.col(id_col).alias("vec_id"),
            F.expr(f"cast(floor({sim} * 10000 + 0.5) as bigint)").alias(
                "cos_x10000"
            ),
        )
        .orderBy(F.desc("cos_x10000"), "vec_id")
        .limit(k)
    )
