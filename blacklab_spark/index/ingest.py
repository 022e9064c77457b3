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
    which the index build stores alongside the word annotation.

    ``columns`` may hold ``None`` placeholders for cells to skip
    (reference valuePaths are 1-based column NUMBERS, so formats like
    tsv-frog address a sparse subset: word=2, lemma=3, pos=5); the
    entry named ``word`` (else the first named entry) is the main
    annotation."""
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
    word_i = (
        columns.index("word") if "word" in columns
        else next(i for i, n in enumerate(columns) if n)
    )

    def _pick(i: int):
        # NB: a two-parameter lambda would make transform() pass the
        # array index as the second arg — keep it single-parameter
        return lambda c: F.trim(c.getItem(i))

    for i, name in enumerate(columns):
        if name is None:
            continue
        col = F.transform(F.col("_cells"), _pick(i))
        if i == word_i:
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


def read_frog(spark: SparkSession, path: str, **kw) -> DataFrame:
    """Frog tagger TSV (reference tsv-frog.blf.yaml): headerless
    10-column rows; word=col2, lemma=col3, pos=col5 (1-based)."""
    kw.setdefault("sep", "\t")
    kw.setdefault("has_header", False)
    kw.setdefault("columns", [None, "word", "lemma", None, "pos"])
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


def parse_sketch_wpl(spark: SparkSession, path: str) -> DataFrame:
    """Sketch Engine WPL (reference sketch-wpl.blf.yaml: fileType
    tabular + inlineTags + glueTags): one token per line with
    tab-separated word/pos/lemma cells (valuePaths 1/2/3), XML-ish tag
    lines interspersed. ``<doc attrs...>`` starts a document (attributes
    become metadata fields); other open/close tag pairs become spans
    over token positions; ``<g/>`` glue tags affect display spacing
    only, never token positions, so they're skipped. Output rows use
    the same parsed schema as the XML engine, so ``read_xml`` /
    ``xml_spans`` can consume them via ``parsed=``."""
    import re

    from blacklab_spark.index.xml_ingest import _PARSED_SCHEMA

    raw = spark.read.text(path, wholetext=True).select(
        _file_id().alias("file_id"), "value"
    )
    tag_re = re.compile(
        r'^<(/?)([\w:.-]+)((?:\s+[\w:.-]+="[^"]*")*)\s*(/?)>$'
    )
    attr_re = re.compile(r'([\w:.-]+)="([^"]*)"')

    def parse_batch(batches):
        import pandas as pd

        from blacklab_spark.analysis import py_tokenize

        for pdf in batches:
            rows = []
            for file_id, text in zip(pdf["file_id"], pdf["value"]):
                doc = None
                n_docs = 0
                open_spans: list[tuple[str, dict, int]] = []

                def flush():
                    nonlocal doc, open_spans
                    if doc is not None and doc["words"]:
                        n = len(doc["anns"]["pos"])  # engine tokens
                        # unclosed spans run to doc end (lenient, like
                        # the reference's inline-tag handling)
                        for tag, attrs, start in open_spans:
                            doc["spans"].append(
                                {"tag": tag, "start": start, "end": n,
                                 "attrs": attrs}
                            )
                        anns = {
                            k: v for k, v in doc["anns"].items()
                            if any(v)
                        }
                        rows.append({
                            "conv_id": doc["meta"].get("id")
                            or f"{file_id}-{doc['idx']}",
                            "turn_idx": 0, "role": "",
                            "text": " ".join(doc["words"]),
                            "tool": "", "ts": _EPOCH, "anns": anns,
                            "spans": doc["spans"], "xml": None,
                            "metadata": doc["meta"],
                        })
                    doc, open_spans = None, []

                def new_doc(meta: dict):
                    nonlocal doc, n_docs
                    doc = {
                        "idx": n_docs, "meta": meta, "words": [],
                        "anns": {"pos": [], "lemma": []}, "spans": [],
                    }
                    n_docs += 1

                for line in text.splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    if line.startswith("<"):
                        m = tag_re.match(line)
                        if not m:
                            continue  # malformed tag line: skip
                        closing, tag, attr_s, selfclose = m.groups()
                        if tag == "g":
                            continue  # glue = display spacing only
                        if tag == "doc":
                            flush()
                            if not closing:
                                new_doc(dict(attr_re.findall(attr_s)))
                            continue
                        if doc is None:
                            new_doc({})  # tags before any <doc>
                        n = len(doc["anns"]["pos"])
                        if closing:
                            for j in range(len(open_spans) - 1, -1, -1):
                                if open_spans[j][0] == tag:
                                    _, attrs, start = open_spans.pop(j)
                                    doc["spans"].append(
                                        {"tag": tag, "start": start,
                                         "end": n, "attrs": attrs}
                                    )
                                    break
                        elif selfclose:
                            doc["spans"].append(
                                {"tag": tag, "start": n, "end": n,
                                 "attrs": dict(attr_re.findall(attr_s))}
                            )
                        else:
                            open_spans.append(
                                (tag, dict(attr_re.findall(attr_s)), n)
                            )
                        continue
                    if doc is None:
                        new_doc({})  # headerless WPL: whole file = doc
                    cells = line.split("\t")
                    word = cells[0].strip()
                    # positions count ENGINE tokens (same contract as
                    # the XML parser: k sub-tokens per input word)
                    k = len(py_tokenize(word))
                    if not k:
                        continue
                    doc["words"].append(word)
                    pos = cells[1].strip() if len(cells) > 1 else ""
                    lem = cells[2].strip() if len(cells) > 2 else ""
                    doc["anns"]["pos"].extend([pos] * k)
                    doc["anns"]["lemma"].extend([lem] * k)
                flush()
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "role", "text", "tool", "ts",
                    "anns", "spans", "xml", "metadata",
                ],
            )

    return raw.mapInPandas(parse_batch, schema=_PARSED_SCHEMA)


def read_sketch_wpl(spark: SparkSession, path: str) -> DataFrame:
    """Sketch WPL -> canonical transcript rows with lemma/pos sidecars
    and doc-attribute metadata (as the ``meta_fields`` map column)."""
    from blacklab_spark.index.xml_ingest import XmlFormat, read_xml

    cfg = XmlFormat(
        annotations={"lemma": "@l", "pos": "@p"},  # names only; parsed=
        metadata={}, metadata_foreach="doc", inline_tags=(),
        name="sketch-wpl",
    )
    return read_xml(spark, path, cfg, parsed=parse_sketch_wpl(spark, path))


def sketch_wpl_spans(spark: SparkSession, path: str) -> DataFrame:
    """Inline-tag spans of a Sketch WPL corpus, as extra_spans rows."""
    from blacklab_spark.index.xml_ingest import xml_spans

    return xml_spans(spark, path, parsed=parse_sketch_wpl(spark, path))


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
    "tsv-frog": read_frog,
    "frog": read_frog,
    "jsonl": read_jsonl,
    "chat": read_chat,
    "xml": _read_xml,
    "tei": _read_tei,
    "sketch-wpl": read_sketch_wpl,
    "wpl": read_sketch_wpl,
}


def read_input(spark: SparkSession, path: str, fmt: str | None = None, **kw) -> DataFrame:
    """Format dispatch (the DocumentFormats.java analogue): explicit
    ``fmt`` or inferred from the path's extension."""
    if fmt is None:
        ext = os.path.splitext(path.rstrip("/*"))[1].lstrip(".").lower()
        fmt = {"cha": "chat", "text": "txt", "json": "jsonl"}.get(ext, ext)
    if fmt not in READERS:
        # plugin-backed formats (convert/tag chains) register on import
        import blacklab_spark.index.preprocess  # noqa: F401

    if fmt not in READERS:
        raise ValueError(f"unknown input format {fmt!r} (known: {sorted(READERS)})")
    return READERS[fmt](spark, path, **kw)
