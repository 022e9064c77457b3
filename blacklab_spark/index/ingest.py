"""Input-format ingestion: files -> the canonical transcript table.

The reference's input-format subsystem parses many file types into
token streams per `.blf.yaml` configs (reference
indexers/config/DocIndexerPlainText.java, DocIndexerTabular.java,
DocIndexerChat.java; built-in configs
core/src/main/resources/formats/{txt,csv,tsv,chat}.blf.yaml). Our
engine's single input contract is the transcript DataFrame
``(conv_id, turn_idx, role, text, tool, ts)`` (+ optional ``ann_*``
sidecar annotation arrays); these readers map each supported file type
onto that shape with pure JVM-side expressions — `wholetext` scans,
`split`/`transform`/`posexplode` — so ingestion scales like any other
file scan (one task per file, no Python in the row path).

Scope notes (documented divergences, all per the simple built-in
configs rather than the full `.blf.yaml` engine):
- tabular: plain separator split; quoted separators inside fields are
  not un-escaped (the reference's csv.blf.yaml also assumes simple
  fields unless the quote option is set).
- chat: ``@``-header lines are dropped, ``%``-dependent tiers are
  dropped, ``*SPK:\ttext`` utterance lines become turns; continuation
  lines (tab-indented) are merged into their utterance.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

_EPOCH = "1970-01-01 00:00:00"


def _canonical(df: DataFrame, ann_cols: list[str] | None = None) -> DataFrame:
    """Project to the canonical transcript column set + sidecars."""
    cols = [
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("role").cast("string").alias("role"),
        F.col("text").cast("string").alias("text"),
        F.col("tool").cast("string").alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
    ]
    cols += [F.col(c) for c in (ann_cols or [])]
    return df.select(*cols)


def _file_id() -> F.Column:
    # stable doc key: file basename without extension
    return F.regexp_extract(F.input_file_name(), r"([^/]+?)(\.[A-Za-z0-9]+)?$", 1)


def read_plaintext(spark: SparkSession, path: str) -> DataFrame:
    """One document per file (reference txt.blf.yaml: fileType text,
    the whole file is the contents field)."""
    return _canonical(
        spark.read.text(path, wholetext=True)
        .select(
            _file_id().alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.lit("").alias("role"),
            F.col("value").alias("text"),
            F.lit("").alias("tool"),
            F.lit(_EPOCH).alias("ts"),
        )
    )


def read_tabular(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    columns: list[str] | None = None,
    has_header: bool = True,
) -> DataFrame:
    """One document per file of token rows (reference csv/tsv.blf.yaml:
    fileType tabular — each row is one token position, columns are
    parallel annotations; first column/annotation is the main `word`).
    Extra columns surface as ``ann_<name>`` sidecar annotation arrays,
    which the index build stores alongside the word annotation."""
    columns = columns or ["word", "lemma", "pos"]
    raw = spark.read.text(path, wholetext=True)
    lines = F.filter(
        F.split(F.col("value"), "\r?\n"), lambda l: F.length(F.trim(l)) > 0
    )
    if has_header:
        lines = F.slice(lines, 2, F.size(lines))
    cells = F.transform(lines, lambda l: F.split(l, sep))
    df = raw.select(_file_id().alias("conv_id"), cells.alias("_cells"))
    ann_cols = []

    def _pick(i: int):
        # NB: a two-parameter lambda would make transform() pass the
        # array index as the second arg — keep it single-parameter
        return lambda c: F.trim(c.getItem(i))

    for i, name in enumerate(columns):
        col = F.transform(F.col("_cells"), _pick(i))
        if i == 0:
            df = df.withColumn("_words", col)
        else:
            df = df.withColumn(f"ann_{name}", col)
            ann_cols.append(f"ann_{name}")
    df = df.select(
        "conv_id",
        F.lit(0).alias("turn_idx"),
        F.lit("").alias("role"),
        F.array_join("_words", " ").alias("text"),
        F.lit("").alias("tool"),
        F.lit(_EPOCH).alias("ts"),
        *ann_cols,
    )
    return _canonical(df, ann_cols)


def read_tsv(spark: SparkSession, path: str, **kw) -> DataFrame:
    kw.setdefault("sep", "\t")
    return read_tabular(spark, path, **kw)


def read_jsonl(
    spark: SparkSession,
    path: str,
    mapping: dict[str, str] | None = None,
) -> DataFrame:
    """One turn per JSON line — the shape LLM-pipeline corpora actually
    ship in. ``mapping`` renames source fields to canonical ones, e.g.
    ``{"conv_id": "conversation", "text": "content", "role": "speaker"}``;
    unmapped canonical fields fall back to a same-named source column
    or a default (turn_idx defaults to per-conversation line order)."""
    mapping = mapping or {}
    df = spark.read.json(path)
    cols = set(df.columns)

    def src(name: str) -> str | None:
        s = mapping.get(name, name)
        return s if s in cols else None

    out = df
    for name, default in (
        ("conv_id", None),
        ("role", F.lit("")),
        ("text", None),
        ("tool", F.lit("")),
        ("ts", F.lit(_EPOCH)),
    ):
        s = src(name)
        if s is not None:
            out = out.withColumn(f"_{name}", F.col(s))
        elif default is not None:
            out = out.withColumn(f"_{name}", default)
        else:
            raise ValueError(f"jsonl input missing required field {name!r}")
    s = src("turn_idx")
    if s is not None:
        out = out.withColumn("_turn_idx", F.col(s))
    else:
        from pyspark.sql import Window

        # deterministic per-conversation order: ts, then text tiebreak
        w = Window.partitionBy("_conv_id").orderBy("_ts", "_text")
        out = out.withColumn("_turn_idx", F.row_number().over(w) - 1)
    return _canonical(
        out.select(
            F.col("_conv_id").alias("conv_id"),
            F.col("_turn_idx").alias("turn_idx"),
            F.col("_role").alias("role"),
            F.col("_text").alias("text"),
            F.col("_tool").alias("tool"),
            F.col("_ts").alias("ts"),
        )
    )


def read_chat(spark: SparkSession, path: str) -> DataFrame:
    """CHAT transcripts (reference chat.blf.yaml / DocIndexerChat.java):
    one conversation per file; ``*SPK:\ttext`` utterance lines become
    turns with role=SPK. Continuation lines start with a tab, so
    replacing ``\\n\\t`` with a space merges them before the line split
    — the whole parse stays in codegen expressions."""
    raw = spark.read.text(path, wholetext=True)
    merged = F.regexp_replace(F.col("value"), "\r", "")
    merged = F.regexp_replace(merged, "\n\t", " ")
    lines = F.split(merged, "\n")
    utt = F.filter(lines, lambda l: l.startswith("*"))
    df = raw.select(_file_id().alias("conv_id"), F.posexplode(utt))
    return _canonical(
        df.select(
            "conv_id",
            F.col("pos").alias("turn_idx"),
            F.regexp_extract("col", r"^\*([^:]+):", 1).alias("role"),
            F.trim(F.regexp_extract("col", r"^\*[^:]+:\s*(.*)$", 1)).alias("text"),
            F.lit("").alias("tool"),
            F.lit(_EPOCH).alias("ts"),
        )
    )


def _read_xml(spark: SparkSession, path: str, **kw) -> DataFrame:
    from blacklab_spark.index.xml_ingest import read_xml

    return read_xml(spark, path, **kw)


def _read_tei(spark: SparkSession, path: str, **kw) -> DataFrame:
    from blacklab_spark.index.xml_ingest import read_xml

    kw.setdefault("cfg", "tei-p5")
    return read_xml(spark, path, **kw)


READERS = {
    "txt": read_plaintext,
    "csv": read_tabular,
    "tsv": read_tsv,
    "jsonl": read_jsonl,
    "chat": read_chat,
    "xml": _read_xml,
    "tei": _read_tei,
}


def read_input(spark: SparkSession, path: str, fmt: str | None = None, **kw) -> DataFrame:
    """Format dispatch (the DocumentFormats.java analogue): explicit
    ``fmt`` or inferred from the path's extension."""
    if fmt is None:
        ext = os.path.splitext(path.rstrip("/*"))[1].lstrip(".").lower()
        fmt = {"cha": "chat", "text": "txt", "json": "jsonl"}.get(ext, ext)
    if fmt not in READERS:
        raise ValueError(f"unknown input format {fmt!r} (known: {sorted(READERS)})")
    return READERS[fmt](spark, path, **kw)
