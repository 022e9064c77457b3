"""Text-analysis operators: tokenization stats, language ID, quality
scoring, document fingerprinting.

All pure JVM-side expressions (whole-stage codegen); outputs are
integers / strings so the DuckDB oracle comparison is exact. Scale:
each operator is a narrow map over the documents table — no shuffle,
no Python. At 100 TB these run at parquet-scan speed with full column
pruning (only `text` + keys are read)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from blacklab_spark.pipeline import SQL_TOKEN_PATTERN

_STOPWORDS = {
    # tiny deterministic marker lists; the synthetic corpus vocabulary
    # is OLAP words, so 'the'/'a' are the live markers
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
}

_EN_STOP = _STOPWORDS["en"]


def _toks(col: str = "text") -> str:
    return f"regexp_extract_all(lower({col}), '{SQL_TOKEN_PATTERN}', 0)"


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letter runs / digit
    runs / single non-space symbols) per document."""
    return docs.select(
        "doc_id",
        F.expr(f"size({_toks()})").alias("n_tokens"),
        F.expr(r"size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0))").alias(
            "n_bpe_tokens"
        ),
        F.expr("size(split(trim(text), '\\\\s+'))").alias("n_ws_tokens"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features, all integer-quantized (x1000):
    mean token length, stopword ratio, alpha-char ratio, plus a
    composite 0..1000 score. The shape of a C4/Gopher-style quality
    filter, reduced to deterministic arithmetic."""
    toks = _toks()
    stop_list = ", ".join(f"'{w}'" for w in _EN_STOP)
    n_tok = f"size({toks})"
    return docs.select(
        "doc_id",
        F.expr(n_tok).alias("n_tokens"),
        F.expr(
            f"cast(floor(1000.0 * length(concat_ws('', {toks})) / greatest({n_tok}, 1)) as bigint)"
        ).alias("mean_token_len_x1000"),
        F.expr(
            f"cast(floor(1000.0 * size(filter({toks}, t -> t in ({stop_list}))) / greatest({n_tok}, 1)) as bigint)"
        ).alias("stopword_ratio_x1000"),
        F.expr(
            "cast(floor(1000.0 * length(regexp_replace(text, '[^a-zA-Z]', '')) / greatest(length(text), 1)) as bigint)"
        ).alias("alpha_ratio_x1000"),
    ).withColumn(
        "quality_x1000",
        F.expr(
            "cast(least(1000, (case when n_tokens between 10 and 100000 then 400 else 0 end)"
            " + least(300, stopword_ratio_x1000 * 3)"
            " + least(300, alpha_ratio_x1000 div 3)) as bigint)"
        ),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: argmax of per-language stopword hits,
    'und' when no marker occurs. Deterministic tie-break by language
    code order (de < en < es < fr)."""
    toks = _toks()
    counts = {
        lang: f"size(filter({toks}, t -> t in ({', '.join(repr(w) for w in ws)})))"
        for lang, ws in sorted(_STOPWORDS.items())
    }
    best = " ".join(
        f"when c_{lang} >= greatest({', '.join('c_' + l for l in counts)}) "
        f"and c_{lang} > 0 then '{lang}'"
        for lang in counts
    )
    df = docs.select(
        "doc_id", *[F.expr(e).alias(f"c_{lang}") for lang, e in counts.items()]
    )
    return df.select(
        "doc_id", F.expr(f"case {best} else 'und' end").alias("lang_pred")
    )


def text_features(docs: DataFrame, k: int = 8) -> DataFrame:
    """Every per-document text feature in ONE scan: token counts
    (token_counts), quality features + composite score (quality_score),
    marker-word language ID (lang_id), and the min-shingle fingerprint
    (fingerprint). Column-for-column identical to the four standalone
    operators, which remain unit-tested individually.

    Scale: this is the shape a 100 TB pipeline actually runs — one
    parquet pass emitting all features — instead of four scans of the
    same `text` column. Still pure whole-stage-codegen SQL; the token
    array is materialized once per row and shared by every feature."""
    stop_list = ", ".join(f"'{w}'" for w in _EN_STOP)
    counts = {
        lang: f"size(filter(toks, t -> t in ({', '.join(repr(w) for w in ws)})))"
        for lang, ws in sorted(_STOPWORDS.items())
    }
    best = " ".join(
        f"when c_{lang} >= greatest({', '.join('c_' + l for l in counts)}) "
        f"and c_{lang} > 0 then '{lang}'"
        for lang in counts
    )
    sh = (
        f"case when size(toks) >= {k} then "
        f"transform(sequence(1, size(toks) - {k - 1}), "
        f"i -> concat_ws(' ', slice(toks, i, {k}))) "
        f"else array(concat_ws(' ', toks)) end"
    )
    base = docs.select("doc_id", "text", F.expr(_toks()).alias("toks"))
    feat = base.select(
        "doc_id",
        F.expr("size(toks)").alias("n_tokens"),
        F.expr(
            r"size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0))"
        ).alias("n_bpe_tokens"),
        F.expr("size(split(trim(text), '\\\\s+'))").alias("n_ws_tokens"),
        F.expr(
            "cast(floor(1000.0 * length(concat_ws('', toks)) / greatest(size(toks), 1)) as bigint)"
        ).alias("mean_token_len_x1000"),
        F.expr(
            f"cast(floor(1000.0 * size(filter(toks, t -> t in ({stop_list}))) / greatest(size(toks), 1)) as bigint)"
        ).alias("stopword_ratio_x1000"),
        F.expr(
            "cast(floor(1000.0 * length(regexp_replace(text, '[^a-zA-Z]', '')) / greatest(length(text), 1)) as bigint)"
        ).alias("alpha_ratio_x1000"),
        *[F.expr(e).alias(f"c_{lang}") for lang, e in counts.items()],
        F.expr(f"array_min(transform({sh}, s -> md5(s)))").alias("fingerprint"),
    )
    return feat.select(
        "doc_id",
        "n_tokens",
        "n_bpe_tokens",
        "n_ws_tokens",
        "mean_token_len_x1000",
        "stopword_ratio_x1000",
        "alpha_ratio_x1000",
        F.expr(
            "cast(least(1000, (case when n_tokens between 10 and 100000 then 400 else 0 end)"
            " + least(300, stopword_ratio_x1000 * 3)"
            " + least(300, alpha_ratio_x1000 div 3)) as bigint)"
        ).alias("quality_x1000"),
        F.expr(f"case {best} else 'und' end").alias("lang_pred"),
        "fingerprint",
    )


def fingerprint(docs: DataFrame, k: int = 8) -> DataFrame:
    """Document fingerprint: min-hash over k-token shingles (the
    winnowing/rolling-hash family reduced to one representative hash).
    Identical docs get identical fingerprints; near-identical docs get
    equal fingerprints with probability ~ their shingle overlap."""
    toks = _toks()
    sh = (
        f"case when size({toks}) >= {k} then "
        f"transform(sequence(1, size({toks}) - {k - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {k}))) "
        f"else array(concat_ws(' ', {toks})) end"
    )
    return docs.select(
        "doc_id",
        F.expr(f"array_min(transform({sh}, s -> md5(s)))").alias("fingerprint"),
    )
