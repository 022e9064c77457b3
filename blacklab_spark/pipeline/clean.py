"""Composed training-data cleaning pipeline: exact dedup + quality
filter + language filter in ONE job — the shape a 100 TB pretraining
corpus actually runs, assembled from the individual pipeline ops
(pipeline/text.py, pipeline/dedup.py) without re-scanning the source
per stage.

Scale story:
- one columnar scan of the source (all features — token stats, quality
  composite, per-language marker counts, text hash — are computed in a
  single whole-stage-codegen projection; Catalyst prunes to the two
  columns read);
- quality/language filters run BEFORE the dedup shuffle (exact
  duplicates share identical text, hence identical features, so
  filter-then-dedup is semantically identical to dedup-then-filter and
  moves only surviving rows);
- exact dedup is one hash shuffle on md5(text) — uniformly distributed
  keys, no skew by construction; the winner per group is the smallest
  doc_id (a window row_number, which AQE sizes like any hash agg).
No UDFs, no driver collects; output is a filtered projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from blacklab_spark.pipeline.text import _EN_STOP, _STOPWORDS, _toks


def clean_corpus(docs: DataFrame, min_quality: int = 800,
                 langs: tuple[str, ...] = ("en",)) -> DataFrame:
    """Kept documents after exact dedup + quality + language gates.
    Output (doc_id, lang_pred, quality_x1000, n_tokens); the quality
    and language definitions are exactly pipeline/text.py's
    quality_score / lang_id (same integer quantization), so each gate
    is individually oracle-verified and the composition adds only the
    dedup winner rule (min doc_id per exact text)."""
    toks = _toks()
    n_tok = f"size({toks})"
    stop_list = ", ".join(f"'{w}'" for w in _EN_STOP)
    lang_counts = {
        lang: f"size(filter({toks}, t -> t in ({', '.join(repr(w) for w in ws)})))"
        for lang, ws in sorted(_STOPWORDS.items())
    }
    best = " ".join(
        f"when c_{lang} >= greatest({', '.join('c_' + l for l in lang_counts)}) "
        f"and c_{lang} > 0 then '{lang}'"
        for lang in lang_counts
    )
    feats = (
        docs.select(
            "doc_id",
            F.md5(F.col("text")).alias("_h"),
            F.expr(n_tok).alias("n_tokens"),
            F.expr(
                f"cast(floor(1000.0 * size(filter({toks}, t -> t in ({stop_list})))"
                f" / greatest({n_tok}, 1)) as bigint)"
            ).alias("stopword_ratio_x1000"),
            F.expr(
                "cast(floor(1000.0 * length(regexp_replace(text, '[^a-zA-Z]', ''))"
                " / greatest(length(text), 1)) as bigint)"
            ).alias("alpha_ratio_x1000"),
            *[F.expr(e).alias(f"c_{lang}") for lang, e in lang_counts.items()],
        )
        .withColumn(
            "quality_x1000",
            F.expr(
                "cast(least(1000, (case when n_tokens between 10 and 100000 then 400 else 0 end)"
                " + least(300, stopword_ratio_x1000 * 3)"
                " + least(300, alpha_ratio_x1000 div 3)) as bigint)"
            ),
        )
        .withColumn("lang_pred", F.expr(f"case {best} else 'und' end"))
    )
    kept = feats.filter(
        (F.col("quality_x1000") >= min_quality) & F.col("lang_pred").isin(list(langs))
    )
    w = Window.partitionBy("_h").orderBy("doc_id")
    return (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "lang_pred", "quality_x1000", "n_tokens")
    )
