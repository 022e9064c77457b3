"""XML input-format ingestion (reference DocIndexerXPath lite).

The reference parses XML corpora (TEI, FoLiA, its own test format) per
`.blf.yaml` configs into token streams with per-word annotations and
inline-tag spans (reference indexers/config/DocIndexerXPath.java;
built-in configs core/src/main/resources/formats/*.blf.yaml; the test
corpus format is the `<doc><s><w l=.. p=..>word</w>...` shape of
core/src/test/java/nl/inl/blacklab/testutil/TestIndex.java:117-170).

Our lite engine covers the config surface those built-in formats
actually use on word-tokenized XML:

- a *document* element (one indexed doc per occurrence per file),
- a *word* element (one token per occurrence; text content = word),
- per-word annotations read from word-element ATTRIBUTES
  (``@l``/``@lemma``/``@p``/``@pos`` style valuePaths),
- *inline tags* (``<s>``, ``<entity>``, TEI ``<u>``...) recorded as
  span rows over token positions, attributes preserved,
- doc metadata from document-element attributes.

Parsing is stdlib ElementTree inside ``mapInPandas`` — per *file*
Python, not per row: one task per file slice, the same unit of
parallelism the reference's FileProcessor uses (IndexerImpl.java:434).
Tag names match on LOCAL name, so TEI namespaces need no config.

Documented divergences (scope-honest):
- ``text`` is the space-joined word list, not the raw XML — the
  content store keeps reconstructed text (the reference stores the
  original XML and strips tags at snippet time).
- multiple values at one word position (``The|DOH|ZZZ`` in the
  reference test corpus) keep the primary value in ``text``; the full
  ``|``-joined value lands in the ``ann_word`` sidecar, searchable via
  the annotation-scan multivalue path (the reference indexes
  secondaries in the reverse index only, AnnotationWriter.java:246-263
  — same search surface, different field name).
- annotation valuePaths must be attributes (``@attr``); child-element
  valuePaths (FoLiA's ``<lemma class=..>``) map via ``child:tag@attr``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_EPOCH = "1970-01-01 00:00:00"

_PARSED_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts string, anns map<string,array<string>>, "
    "spans array<struct<tag:string,start:int,end:int,attrs:map<string,string>>>, "
    "xml string"
)


@dataclass
class XmlFormat:
    """The `.blf.yaml` subset we honor (field names mirror the yaml keys)."""

    document_tag: str = "doc"
    word_tag: str = "w"
    # annotation name -> source: "@attr" (word-element attribute) or
    # "child:tag@attr" (attribute of a child element, FoLiA-style)
    annotations: dict = field(default_factory=lambda: {"lemma": "@l", "pos": "@p"})
    inline_tags: tuple = ("s", "entity")
    # canonical metadata column -> "@attr" on the document element
    metadata: dict = field(default_factory=lambda: {"conv_id": "@pid"})
    name: str = "xml"


# TEI P5 (reference tei-p5.blf.yaml): <text> body, <w> tokens with
# lemma/pos attributes, sentences/utterances as inline tags
TEI_P5 = XmlFormat(
    document_tag="text",
    word_tag="w",
    annotations={"lemma": "@lemma", "pos": "@pos"},
    inline_tags=("s", "u", "p"),
    metadata={},
    name="tei-p5",
)

# FoLiA (reference folia.blf.yaml): <w> wraps a <t> text child plus
# annotation children carrying their value in a `class` attribute;
# pos subannotations (head, ... — folia.blf.yaml `subannotations:`)
# flatten to `pos_head`-style sidecars, queryable as `[pos.head=..]`
FOLIA = XmlFormat(
    document_tag="FoLiA",
    word_tag="w",
    annotations={
        "lemma": "child:lemma@class",
        "pos": "child:pos@class",
        "pos_head": "child:pos@head",
    },
    inline_tags=("s", "p", "event", "entity"),
    metadata={"conv_id": "@xml:id"},
    name="folia",
)

FORMATS = {
    "xml": XmlFormat(), "tei-p5": TEI_P5, "tei": TEI_P5, "folia": FOLIA,
}


def _local(tag) -> str | None:
    if not isinstance(tag, str):
        return None  # comments / PIs
    return tag.rsplit("}", 1)[-1]


def _ann_value(el, spec: str) -> str:
    """Resolve an annotation valuePath against a word element."""
    if spec.startswith("@"):
        return el.get(spec[1:], "")
    if spec.startswith("child:"):
        child_tag, _, attr = spec[len("child:"):].partition("@")
        for ch in el:
            if _local(ch.tag) == child_tag:
                return ch.get(attr, "") if attr else "".join(ch.itertext()).strip()
    return ""


def _parse_doc(doc_el, cfg: XmlFormat, file_id: str, doc_idx: int,
               keep_xml: bool = False) -> dict:
    """Positions are counted in ENGINE tokens, not <w> elements: the
    build re-tokenizes ``text`` with the engine token pattern, so a
    <w> whose content yields k != 1 regex tokens ("New-York" -> 2,
    an empty <w/> -> 0) would silently shift every later annotation
    and span. Each <w> therefore contributes k aligned entries per
    annotation (value repeated across its sub-tokens) and k to the
    running position counter. Assumes the default token pattern
    (EngineConfig.token_pattern), like read_xml's sidecar padding."""
    from blacklab_spark.analysis import py_tokenize

    words: list[str] = []
    word_full: list[str] = []
    anns: dict[str, list[str]] = {name: [] for name in cfg.annotations}
    spans: list[dict] = []
    has_multivalue = False
    n_tok = 0  # engine-token positions emitted so far

    def walk(el) -> None:
        nonlocal has_multivalue, n_tok
        tag = _local(el.tag)
        if tag == cfg.word_tag:
            raw = "".join(el.itertext()).strip()
            primary = raw.split("|", 1)[0]
            if "|" in raw:
                has_multivalue = True
            k = len(py_tokenize(primary))
            if k:
                words.append(primary)
                word_full.extend([raw] * k)
                for name, spec in cfg.annotations.items():
                    anns[name].extend([_ann_value(el, spec)] * k)
                n_tok += k
            return  # a word's children are its own markup, not tokens
        rec = tag in cfg.inline_tags
        if rec:
            start = n_tok
        for ch in el:
            walk(ch)
        if rec:
            spans.append(
                {
                    "tag": tag,
                    "start": start,
                    "end": n_tok,
                    "attrs": {k: str(v) for k, v in el.attrib.items()},
                }
            )

    for ch in doc_el:
        walk(ch)

    def _attr(el, name: str) -> str:
        """Attribute by qualified or local name (xml:id etc. arrive
        namespace-expanded from ElementTree)."""
        v = el.get(name)
        if v is not None:
            return v
        local = name.rsplit(":", 1)[-1]
        for k, v in el.attrib.items():
            if k == local or k.endswith("}" + local):
                return v
        return ""

    conv_id = f"{file_id}-{doc_idx}"
    role = tool = ""
    for col, spec in cfg.metadata.items():
        val = _attr(doc_el, spec[1:]) if spec.startswith("@") else ""
        if col == "conv_id" and val:
            conv_id = val
        elif col == "role":
            role = val
        elif col == "tool":
            tool = val
    out_anns = {}
    for name, vals in anns.items():
        if any(v for v in vals):
            out_anns[name] = vals
    if has_multivalue:
        out_anns["word"] = word_full
    xml = None
    if keep_xml:
        import xml.etree.ElementTree as ET

        xml = ET.tostring(doc_el, encoding="unicode")
    return {
        "conv_id": conv_id,
        "turn_idx": 0,
        "role": role,
        "text": " ".join(w for w in words if w),
        "tool": tool,
        "ts": _EPOCH,
        "anns": out_anns,
        "spans": spans,
        "xml": xml,
    }


def parse_xml_files(
    spark: SparkSession, path: str, cfg: XmlFormat | str | None = None,
    keep_xml: bool = False,
) -> DataFrame:
    """Whole-file XML scan -> one parsed row per document element, with
    annotation arrays and inline-tag span rows still nested (split into
    the canonical tables by ``read_xml`` / ``xml_spans``)."""
    import os

    if isinstance(cfg, str):
        cfg = FORMATS[cfg]
    cfg = cfg or XmlFormat()

    raw = spark.read.text(path, wholetext=True).select(
        F.regexp_extract(F.input_file_name(), r"([^/]+?)(\.[A-Za-z0-9]+)?$", 1)
        .alias("file_id"),
        "value",
    )

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows = []
            for file_id, xml_text in zip(pdf["file_id"], pdf["value"]):
                try:
                    root = ET.fromstring(xml_text)
                except ET.ParseError:
                    # reference FileProcessor logs+skips malformed files
                    continue
                docs = (
                    [root]
                    if _local(root.tag) == cfg.document_tag
                    else [
                        el for el in root.iter()
                        if _local(el.tag) == cfg.document_tag
                    ]
                )
                for i, doc_el in enumerate(docs):
                    rows.append(_parse_doc(doc_el, cfg, file_id, i, keep_xml))
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "role", "text", "tool", "ts",
                    "anns", "spans", "xml",
                ],
            )

    return raw.mapInPandas(parse_batch, schema=_PARSED_SCHEMA)


def read_xml(
    spark: SparkSession, path: str, cfg: XmlFormat | str | None = None,
    parsed: DataFrame | None = None, keep_xml: bool = False,
) -> DataFrame:
    """XML files -> canonical transcript rows (+ ``ann_*`` sidecars).
    Pass ``parsed=parse_xml_files(...)`` (optionally persisted) to share
    one parse with ``xml_spans``. ``keep_xml=True`` carries the raw
    document XML through as an ``xml_text`` column — the build stores
    it alongside the text (our content store keeps original XML like
    the reference's, ContentStoreIntegrated.java:14), and snippets then
    highlight the XML well-formed (util XmlHighlighter.java)."""
    if isinstance(cfg, str):
        cfg = FORMATS[cfg]
    cfg = cfg or XmlFormat()
    df = (
        parsed if parsed is not None
        else parse_xml_files(spark, path, cfg, keep_xml=keep_xml)
    )
    ann_names = list(cfg.annotations) + ["word"]
    cols = [
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role", "text", "tool",
        F.col("ts").cast("timestamp").alias("ts"),
    ]
    if keep_xml:
        cols.append(F.col("xml").alias("xml_text"))
    ann_cols = []
    for name in ann_names:
        c = f"ann_{name}"
        cols.append(F.element_at("anns", name).alias(c))
        ann_cols.append(c)
    out = df.select(*cols)
    # drop sidecars no document populated (pruned-scan agg, tiny)
    present = out.agg(
        *[F.max(F.size(F.coalesce(c, F.array()))).alias(c) for c in ann_cols]
    ).collect()[0]
    keep = [c for c in ann_cols if (present[c] or 0) > 0]
    base_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    if keep_xml:
        base_cols.append("xml_text")
    out = out.select(*base_cols, *keep)
    # absent sidecar cells must still be position-aligned arrays — size
    # the filler with the ENGINE tokenizer (whitespace-splitting counts
    # 1 for empty text and undercounts hyphenated words, shifting every
    # positional lookup into the pad)
    from blacklab_spark.config import EngineConfig
    from blacklab_spark.index.build import _case_expanded

    pat = _case_expanded(EngineConfig().token_pattern)
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
    for c in keep:
        out = out.withColumn(
            c,
            F.when(F.col(c).isNull(), F.array_repeat(F.lit(""), n_tok)).otherwise(
                F.col(c)
            ),
        )
    return out


def xml_spans(
    spark: SparkSession, path: str, cfg: XmlFormat | str | None = None,
    parsed: DataFrame | None = None,
) -> DataFrame:
    """Inline-tag spans as ``extra_spans`` input rows for build_index
    (the starttag analogue, reference SpansTags.java:81-102)."""
    df = parsed if parsed is not None else parse_xml_files(spark, path, cfg)
    return df.select(
        "conv_id", "turn_idx", F.explode("spans").alias("sp")
    ).select(
        "conv_id", "turn_idx",
        F.col("sp.tag").alias("tag"),
        F.col("sp.start").alias("start"),
        F.col("sp.end").alias("end"),
        F.col("sp.attrs").alias("attrs"),
    )


def load_blf_config(path: str) -> XmlFormat:
    """Parse the `.blf.yaml` subset into an XmlFormat (reference
    ConfigInputFormat.java reads the full surface; we honor the keys
    the XML shapes above use). Recognized keys::

        documentPath: //doc            (last path component = tag)
        annotatedFields:
          contents:
            wordPath: .//w
            annotations:
            - { name: lemma, valuePath: "@l" }
            inlineTags:
            - { path: .//s }
        metadata:
          fields:
          - { name: conv_id, valuePath: "@pid" }
    """
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)

    def last_tag(p: str) -> str:
        return p.rstrip("/").rsplit("/", 1)[-1]

    def ann_spec(a: dict, base_path: str | None = None) -> str:
        """ValuePath -> our spec; a basePath names a child element the
        attribute lives on (reference folia.blf.yaml `basePath:
        folia:pos` + `valuePath: "@class"` reads <pos class=..> under
        the word)."""
        vp = a.get("valuePath", "")
        bp = a.get("basePath", base_path)
        if bp and vp.startswith("@"):
            return f"child:{last_tag(bp.split(':')[-1])}@{vp[1:]}"
        return vp

    fmt = XmlFormat(name=doc.get("name", "xml"))
    if doc.get("documentPath"):
        fmt.document_tag = last_tag(doc["documentPath"])
    contents = (doc.get("annotatedFields") or {}).get("contents") or {}
    if contents.get("wordPath"):
        fmt.word_tag = last_tag(contents["wordPath"])
    if contents.get("annotations"):
        fmt.annotations = {}
        for a in contents["annotations"]:
            fmt.annotations[a["name"]] = ann_spec(a)
            for sub in a.get("subannotations") or []:
                # reference indexes each subannotation as its own
                # field (folia.blf.yaml subannotations:); flattened
                # name parent_sub is what `[pos.head=..]` resolves to
                fmt.annotations[f"{a['name']}_{sub['name']}"] = ann_spec(
                    sub, a.get("basePath")
                )
    if contents.get("inlineTags"):
        fmt.inline_tags = tuple(
            last_tag(t["path"]) for t in contents["inlineTags"]
        )
    meta = (doc.get("metadata") or {}).get("fields") or []
    if meta:
        fmt.metadata = {m["name"]: m.get("valuePath", "") for m in meta}
    return fmt
