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


def _hyperplanes(dim: int, n_planes: int, seed: str = "srp") -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: unit gaussians seeded
    from md5 — reproducible across any cluster, no RNG state."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for chunk in range((dim + 3) // 4):
            h = hashlib.md5(f"{seed}|{p}|{chunk}".encode()).digest()
            for j in range(4):
                i = chunk * 4 + j
                if i >= dim:
                    break
                u = int.from_bytes(h[j * 4: j * 4 + 4], "big") / 2**32
                out[p, i] = u - 0.5
    return out


def srp_bucket(embeddings: DataFrame, n_planes: int = 12,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Sign-random-projection bucket id per vector (LSH for cosine)."""
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    planes = _hyperplanes(dim, n_planes)
    bits = []
    for p in range(n_planes):
        vec = "array(" + ", ".join(f"{v!r}D" for v in planes[p]) + ")"
        bits.append(f"(case when {_dot(vec_col, vec)} > 0 then {1 << p} else 0 end)")
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.expr(" + ".join(bits)).alias("bucket"),
    )


def lsh_neardup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                      n_planes: int = 12, n_tables: int = 4) -> DataFrame:
    """Approximate near-dup pairs: candidates share an SRP bucket in at
    least one of ``n_tables`` independent tables, then exact cosine
    verification on candidates only. The shuffle key is (table, bucket)."""
    first = embeddings.select(F.size("embedding").alias("d")).first()
    dim = int(first["d"])
    tables = []
    for t in range(n_tables):
        # independent tables need independent planes: seed per table
        planes = _hyperplanes(dim, n_planes, seed=f"srp{t}")
        bits = []
        for p in range(n_planes):
            vec = "array(" + ", ".join(f"{v!r}D" for v in planes[p]) + ")"
            bits.append(f"(case when {_dot('embedding', vec)} > 0 then {1 << p} else 0 end)")
        tables.append(
            embeddings.select(
                F.col("vec_id"),
                F.col("embedding"),
                F.lit(t).alias("table_id"),
                F.expr(" + ".join(bits)).alias("bucket"),
            )
        )
    allb = tables[0]
    for t in tables[1:]:
        allb = allb.unionByName(t)
    a = allb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"),
        "table_id", "bucket",
    )
    b = allb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"),
        "table_id", "bucket",
    )
    cand = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "va", "vb")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    cos = f"{_dot('va', 'vb')} / ({_norm('va')} * {_norm('vb')})"
    return (
        cand.withColumn("cos", F.expr(cos))
        .filter(F.col("cos") >= threshold)
        .select(
            "vec_a",
            "vec_b",
            F.expr("cast(floor(cos * 10000 + 0.5) as bigint)").alias("cos_x10000"),
        )
    )
