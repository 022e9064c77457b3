"""Linked metadata documents (the reference's linkedDocuments).

The reference locates and fetches ONE external metadata file per
content document at index time: linkValues are computed from document
fields via a `process` chain of regex actions, substituted into an
`inputFile` template, and the fetched file is parsed with a named
input format — usually CMDI — whose fields are indexed onto the
content document (ConfigLinkedDocument.java; DocIndexerBase
processLinkedDocument; guide how-to-configure-indexing.md
"linkedDocuments"). Per-document fetch is the wrong shape for a
cluster: at 10^9 documents it is 10^9 driver-coordinated file reads.

The Spark-first re-expression is a bulk scan + distributed join:

1. ``read_linked_metadata`` parses EVERY metadata file under a root in
   one distributed scan (the XML engine's CMDI forEach config — one
   task per file slice) into ``(link_key, meta_fields)`` rows;
2. ``link_values`` computes each content document's link key with the
   same regex `process` actions as the reference, but as codegen
   ``regexp_replace`` expressions (no Python in the row path);
3. ``link_metadata`` joins the two. Metadata tables are one row per
   document (not per token), so AQE usually picks a broadcast join on
   its own; pass ``broadcast=True`` to force the hint when the
   metadata side is known-small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def read_linked_metadata(
    spark: SparkSession,
    path: str,
    cfg: str | object = "cmdi",
    key: str = "file",
) -> DataFrame:
    """All metadata files under ``path`` -> ``(link_key string,
    meta_fields map<string,string>)``.

    ``key="file"`` keys on the file stem (the reference's inputFile
    locator resolves to a file path, so the stem is the natural join
    key for a file-per-document metadata dump); any other value names
    a parsed metadata field to key on (e.g. a CMDI ``id`` leaf).
    """
    from blacklab_spark.index.xml_ingest import parse_xml_files

    df = parse_xml_files(spark, path, cfg)
    if key == "file":
        # conv_id is "<file_stem>-<doc_idx>" for id-less documents
        k = F.regexp_replace("conv_id", r"-\d+$", "")
    else:
        k = F.element_at("metadata", key)
    return df.select(
        k.cast("string").alias("link_key"),
        F.col("metadata").alias("meta_fields"),
    )


def link_values(col: Column | str, actions: list[dict]) -> Column:
    """The reference's linkValues `process` chain (replace actions) as
    a single codegen expression: each action is ``{"action":
    "replace", "find": <java regex>, "replace": <template with $1..>}``
    applied in order (how-to-configure-indexing.md:635-646)."""
    out = F.col(col) if isinstance(col, str) else col
    for a in actions:
        if a.get("action", "replace") != "replace":
            raise ValueError(f"unsupported link process action: {a}")
        out = F.regexp_replace(out, a["find"], a["replace"])
    return out.cast("string")


def link_metadata(
    transcripts: DataFrame,
    meta: DataFrame,
    link_col: str = "conv_id",
    actions: list[dict] | None = None,
    broadcast: bool = False,
) -> DataFrame:
    """Left-join linked metadata onto the transcript table.

    ``link_col`` + ``actions`` compute each row's link key (the
    linkValues analogue); rows with no matching metadata document keep
    a null ``meta_fields`` (the reference logs-and-continues on a
    missing linked document unless configured otherwise). Duplicate
    metadata keys keep one arbitrary-but-deterministic row (max by
    map size) so the join never fans out transcript rows.
    """
    key = link_values(link_col, actions or [])
    m = (
        meta.withColumn("_sz", F.size("meta_fields"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("link_key")
                .orderBy(F.desc("_sz"), F.desc(F.to_json("meta_fields")))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("link_key", "meta_fields")
    )
    if broadcast:
        m = F.broadcast(m)
    return (
        transcripts.withColumn("_link_key", key)
        .join(m, F.col("_link_key") == m.link_key, "left")
        .drop("_link_key", "link_key")
    )
