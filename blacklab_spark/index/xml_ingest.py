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
- doc metadata from document-element attributes,
- *standoff annotations* (ConfigStandoffAnnotations.java; processing
  loop DocIndexerXPath.java:430-505): ``tokenIdPath`` ids on words, a
  standoff ``path`` elsewhere in the document whose ``tokenRefPath``
  values select the positions to index at (NAF terms layer, EAF
  tiers), plus span standoffs (``spanEndPath`` inclusive/exclusive,
  ``spanNamePath``) that land in the spans table.

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
- annotation valuePaths are attributes (``@attr``) or element paths:
  ``child:t1/t2@attr`` descends a direct-child chain, ``desc:tag@attr``
  searches descendants, steps accept ``[@attr=value]`` predicates and
  an omitted trailing ``@attr`` reads the element's text — enough for
  FoLiA's nested layers (``child:pos/feat[@subset=head]@class``) and
  TEI ``<choice>`` (``child:choice/reg``); full XPath is out of scope.
"""

from __future__ import annotations

import re

from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_EPOCH = "1970-01-01 00:00:00"

_PARSED_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts string, anns map<string,array<string>>, "
    "spans array<struct<tag:string,start:int,end:int,attrs:map<string,string>>>, "
    "xml string, metadata map<string,string>"
)


@dataclass
class XmlFormat:
    """The `.blf.yaml` subset we honor (field names mirror the yaml keys)."""

    document_tag: str = "doc"
    word_tag: str = "w"
    # annotation name -> source: "@attr" (word-element attribute),
    # "child:t1/t2@attr" (direct-child chain), or "desc:tag@attr"
    # (descendant search); steps accept [@attr=value] predicates; no
    # trailing @attr reads the element's text
    annotations: dict = field(default_factory=lambda: {"lemma": "@l", "pos": "@p"})
    inline_tags: tuple = ("s", "entity")
    # metadata column -> spec on the DOCUMENT element (same language as
    # annotations: "@attr", "child:...", "desc:..."). conv_id/role/tool
    # map to the canonical transcript columns; other names surface as
    # meta_<name> columns from read_xml (reference indexes arbitrary
    # metadata fields, DocIndexerXPath metadata section)
    metadata: dict = field(default_factory=lambda: {"conv_id": "@pid"})
    # word text source relative to the word element ("" = the element's
    # full string value, like the reference's valuePath "."). FoLiA
    # words keep their text in a <t> child (folia.blf.yaml `valuePath:
    # folia:t`); TEI editorial words can take `child:choice/orig`
    word_value: str = ""
    # containerPath analogue: only this descendant of the document
    # element is walked for words/inline tags ("" = whole document).
    # TEI indexes .//text so teiHeader <p>s never become spans
    container_tag: str = ""
    # tokenIdPath analogue: spec giving each word element a unique id
    # ("@id", "@xml:id"); required for standoff refs (reference
    # DocIndexerXPath.java tokenPositionsMap)
    token_id: str = ""
    # standoffAnnotations analogue (ConfigStandoffAnnotations.java):
    # annotations living elsewhere in the document, tied to tokens by id
    standoff: tuple = ()
    # multi-step wordPath analogue ("TIER[@X='Words']/ANNOTATION/W"):
    # the LAST step must match the word element, earlier steps its
    # nearest enclosing ancestors in order (EAF's tier-qualified words,
    # eaf.blf.yaml wordPath). Empty = match on word_tag alone.
    word_path: str = ""
    # forEachPath metadata analogue (tcf/cmdi.blf.yaml: containerPath +
    # `forEachPath: .//*[not(*) and text()]`): every leaf element with
    # text under this document descendant becomes a metadata field named
    # by its local tag; all fields surface as one meta_fields map column
    metadata_foreach: str = ""
    # display-only extras carried from the yaml for the XSLT generator
    # (reference XslGenerator.java): raw documentPath/containerPath/
    # wordPath strings under keys "document"/"container"/"word", and the
    # `namespaces:` map ("" key = default namespace). The engine itself
    # matches local names and never reads these.
    raw_paths: dict = field(default_factory=dict)
    namespaces: dict = field(default_factory=dict)
    # punctPath analogue (voice-tei.blf.yaml `punctPath: .//text()[not(
    # ancestor::w)]`): collect the text BETWEEN word elements as a
    # `punct` annotation, one whitespace-collapsed value per token (the
    # text preceding that token) — the reference carries punct in every
    # Kwic context (Kwic.java, DocIndexerXPath punct handling)
    punct: bool = True
    # `process:` value operations + `mapValues:` tables per annotation
    # name (reference DocIndexerConfig.processStringMultipleValues) and
    # per metadata column (processString): name -> (steps, map_values)
    processing: dict = field(default_factory=dict)
    meta_processing: dict = field(default_factory=dict)
    name: str = "xml"


@dataclass
class StandoffSpec:
    """One standoffAnnotations block (ConfigStandoffAnnotations.java;
    processing loop DocIndexerXPath.java:430-505). ``path`` finds the
    standoff elements under the DOCUMENT element (first step searches
    all descendants, deeper steps are direct children — covers NAF's
    document-relative `terms/term` and EAF's absolute TIER paths);
    ``token_ref`` resolves one or MORE token ids on each standoff
    element; values index at every referenced position. A non-empty
    ``span_end`` makes it a span standoff: start = first token ref,
    end = the span_end ref (inclusive end gets +1 like the reference),
    name from ``span_name`` (spec, or ``=literal``), annotations become
    span attributes."""

    path: str
    token_ref: str
    annotations: dict = field(default_factory=dict)
    span_end: str = ""
    span_end_inclusive: bool = True
    span_name: str = ""


# TEI P5 (reference tei-p5.blf.yaml): documentPath //TEI, containerPath
# .//text, <w> tokens with lemma/pos attributes, p/s/pb/lb inline tags,
# header metadata from element text (fileDesc/titleStmt/title)
TEI_P5 = XmlFormat(
    document_tag="TEI",
    container_tag="text",
    word_tag="w",
    annotations={"lemma": "@lemma", "pos": "@pos"},
    inline_tags=("s", "u", "p", "pb", "lb"),
    metadata={"title": "desc:titleStmt/title"},
    name="tei-p5",
)

# Legacy TEI variants (reference tei-p5-legacy.blf.yaml /
# tei-p4-legacy.blf.yaml): identical to P5 except PoS lives in @type;
# P4 additionally roots at <TEI.2>
TEI_P5_LEGACY = XmlFormat(
    document_tag="TEI",
    container_tag="text",
    word_tag="w",
    annotations={"lemma": "@lemma", "pos": "@type"},
    inline_tags=("s", "u", "p", "pb", "lb"),
    metadata={"title": "desc:titleStmt/title"},
    name="tei-p5-legacy",
)
TEI_P4_LEGACY = XmlFormat(
    document_tag="TEI.2",
    container_tag="text",
    word_tag="w",
    annotations={"lemma": "@lemma", "pos": "@type"},
    inline_tags=("s", "u", "p", "pb", "lb"),
    metadata={"title": "desc:titleStmt/title"},
    name="tei-p4-legacy",
)

# FoLiA (reference folia.blf.yaml): word text lives in the <t> child
# (`valuePath: folia:t`); annotation children carry their value in a
# `class` attribute; pos subannotations (head, ... — folia.blf.yaml
# `subannotations:`) flatten to `pos_head`-style sidecars, queryable
# as `[pos.head=..]`; native metadata in <meta id=..>text</meta>
FOLIA = XmlFormat(
    document_tag="FoLiA",
    word_tag="w",
    word_value="child:t",
    annotations={
        "lemma": "child:lemma@class",
        "pos": "child:pos@class",
        "pos_head": "child:pos@head",
    },
    inline_tags=("s", "p", "event", "entity"),
    metadata={"conv_id": "@xml:id", "title": "desc:meta[@id=title]"},
    name="folia",
)

# NAF (reference naf.blf.yaml): tokens are .//text//wf elements carrying
# @id (tokenIdPath); lemma/pos live in the standoff <terms> layer, each
# <term> referencing token ids via <span><target id=..>
NAF = XmlFormat(
    document_tag="NAF",
    container_tag="text",
    word_tag="wf",
    annotations={},
    inline_tags=(),
    metadata={},
    token_id="@id",
    standoff=(
        StandoffSpec(
            path="terms/term",
            token_ref="child:span/target@id",
            annotations={"lemma": "@lemma", "pos": "@pos"},
        ),
    ),
    name="naf",
)

# EAF / ELAN (reference eaf.blf.yaml): tokens are ALIGNABLE_ANNOTATIONs
# of the Words TIER only (tier-predicate wordPath); lemma/pos are
# REF_ANNOTATIONs in their own tiers referencing word ANNOTATION_IDs
EAF = XmlFormat(
    document_tag="ANNOTATION_DOCUMENT",
    word_tag="ALIGNABLE_ANNOTATION",
    word_path="TIER[@LINGUISTIC_TYPE_REF='Words']/ANNOTATION/"
              "ALIGNABLE_ANNOTATION",
    word_value="child:ANNOTATION_VALUE",
    annotations={},
    inline_tags=(),
    metadata={},
    token_id="@ANNOTATION_ID",
    standoff=(
        StandoffSpec(
            path="TIER[@LINGUISTIC_TYPE_REF='Lemma']/ANNOTATION/"
                 "REF_ANNOTATION",
            token_ref="@ANNOTATION_REF",
            annotations={"lemma": "child:ANNOTATION_VALUE"},
        ),
        StandoffSpec(
            path="TIER[@LINGUISTIC_TYPE_REF='PoS']/ANNOTATION/"
                 "REF_ANNOTATION",
            token_ref="@ANNOTATION_REF",
            annotations={"pos": "child:ANNOTATION_VALUE"},
        ),
    ),
    name="eaf",
)

# TCF / WebLicht (reference tcf.blf.yaml): <token ID=..> under
# <tokens>; lemmas/POS tags reference tokens via space-separated
# @tokenIDs lists (the reference resolves them with a contains() XPath;
# same index result via the standoff machinery). Embedded CMDI header
# leaves become metadata fields (forEachPath idiom).
TCF = XmlFormat(
    document_tag="D-Spin",
    container_tag="TextCorpus",
    word_tag="token",
    annotations={},
    inline_tags=(),
    metadata={},
    token_id="@ID",
    standoff=(
        StandoffSpec(
            path="lemmas/lemma", token_ref="@tokenIDs",
            annotations={"lemma": "."},
        ),
        StandoffSpec(
            path="POStags/tag", token_ref="@tokenIDs",
            annotations={"pos": "."},
        ),
        # sentence layer -> spans (commented out in the reference yaml
        # pending a plugin; expressible directly here)
        StandoffSpec(
            path="sentences/sentence", token_ref="@tokenIDs",
            span_name="=s",
        ),
    ),
    metadata_foreach="MetaData",
    name="tcf",
)

# CMDI (reference cmdi.blf.yaml): metadata-only documents — no word
# tokens; every text-bearing leaf under /CMD/Components becomes a
# metadata field (forEach idiom). Used as the linked-metadata side of
# index.linked.read_linked_metadata.
CMDI = XmlFormat(
    document_tag="Components",
    word_tag="",  # metadata-only: nothing tokenizes
    annotations={},
    inline_tags=(),
    metadata={},
    metadata_foreach="Components",
    name="cmdi",
)

# the reference's own integration-test format (testformat.blf.yaml,
# TestIndex.java corpus): <doc pid= title=><s><entity><w l= p=>word —
# the default XmlFormat shape plus title metadata
TESTFORMAT = XmlFormat(
    metadata={"conv_id": "@pid", "title": "@title"},
    name="testformat",
)

FORMATS = {
    "xml": XmlFormat(), "tei-p5": TEI_P5, "tei": TEI_P5, "folia": FOLIA,
    "naf": NAF, "eaf": EAF, "tcf": TCF, "cmdi": CMDI,
    "tei-p5-legacy": TEI_P5_LEGACY, "tei-p4-legacy": TEI_P4_LEGACY,
    "testformat": TESTFORMAT,
}


def _local(tag) -> str | None:
    if not isinstance(tag, str):
        return None  # comments / PIs
    return tag.rsplit("}", 1)[-1]


def _attr_get(el, name: str) -> str | None:
    """Attribute by qualified or local name (xml:id etc. arrive
    namespace-expanded from ElementTree)."""
    v = el.get(name)
    if v is not None:
        return v
    local = name.rsplit(":", 1)[-1]
    for k, v in el.attrib.items():
        if k == local or k.endswith("}" + local):
            return v
    return None


class UnsupportedXPathError(ValueError):
    """A format config uses XPath beyond the declarative-lite subset
    (the reference evaluates full Saxon XPath, DocIndexerSaxon.java /
    SaxonHelper.java; we support the documented step grammar). Raised
    LOUDLY at config load so a user's custom .blf.yaml fails with the
    offending construct named instead of silently indexing empty
    annotations."""


_CONTAINS_RE = re.compile(
    r"^contains\(\s*@([\w.:-]+)\s*,\s*(['\"])(.*)\2\s*\)$"
)


def _parse_pred(pred: str):
    """One step predicate -> (kind, attr, val).

    Supported forms (the subset the shipped reference configs use,
    plus the round-5 depth step: positional + contains()):
      [@attr=value] / [@attr='value']   attribute equality
      [@attr]                           attribute existence
      [N]                               positional (1-based, XPath
                                        t[N]: N-th matching child of
                                        its parent)
      [contains(@attr,'value')]         substring test
    """
    inner = pred.rstrip("]").strip()
    if inner.isdigit():
        return ("pos", None, int(inner))
    m = _CONTAINS_RE.match(inner)
    if m:
        return ("contains", m.group(1), m.group(3))
    if inner.startswith("@"):
        attr, eq, val = inner[1:].partition("=")
        if not eq:
            return ("exists", attr, None)
        return ("attr", attr, val.strip("'\""))
    raise UnsupportedXPathError(
        f"unsupported step predicate '[{inner}]' (supported: [@attr=value], "
        f"[@attr], [N], [contains(@attr,'value')])"
    )


def _parse_steps(path: str) -> list[tuple[str, tuple | None]]:
    """'t1/t2[@a=v]' -> [(tag, pred), ...] with pred from _parse_pred."""
    steps = []
    for raw in path.split("/"):
        tag, _, pred = raw.partition("[")
        steps.append((tag, _parse_pred(pred) if pred else None))
    return steps


_TAG_OK_RE = re.compile(r"^@?[\w.:\-]*$")


def check_xpath(expr: str | None, where: str,
                allow_positional: bool = True) -> None:
    """Validate a config path against the declarative-lite grammar at
    CONFIG LOAD time, raising :class:`UnsupportedXPathError` that names
    the offending construct and location — the round-4 risk was a
    Saxon-only path silently producing empty annotations (the reference
    evaluates real XPath: DocIndexerSaxon.java, SaxonHelper.java,
    DocIndexerXPath.java)."""
    vp = (expr or "").strip()
    if not vp:
        return

    def bad(construct: str) -> UnsupportedXPathError:
        return UnsupportedXPathError(
            f"{where}: '{vp}' uses {construct}, which is beyond the "
            f"supported declarative path subset (steps of "
            f"tag[@attr=value] / tag[@attr] / tag[N] / "
            f"tag[contains(@attr,'v')] with an optional trailing @attr "
            f"or '.'). Pre-process the document or extend the format "
            f"with process/mapValues steps instead."
        )

    if "::" in vp:
        raise bad(f"the XPath axis '{vp[:vp.index('::')].rsplit('/', 1)[-1]}::'")
    if "|" in vp:
        raise bad("a union '|'")
    if ".." in vp:
        raise bad("a parent-axis step '..'")
    for raw in [s for s in vp.lstrip("./").split("/") if s and s != "."]:
        tag, _, predpart = raw.partition("[")
        if "][" in raw:
            raise bad("multiple step predicates")
        if "(" in tag:
            raise bad(f"the function call '{tag[:tag.index('(')]}()'")
        if tag == "*" or tag.endswith("*"):
            raise bad("a wildcard step '*'")
        if not _TAG_OK_RE.match(tag):
            raise bad(f"the step '{raw}'")
        if predpart:
            try:
                kind, _a, _v = _parse_pred(predpart)
            except UnsupportedXPathError as e:
                raise UnsupportedXPathError(f"{where}: {e}") from None
            if kind == "pos" and not allow_positional:
                raise bad("a positional predicate (not supported on this key)")


def _ann_value(el, spec: str) -> str:
    """Resolve a valuePath against an element (word or document).

    Grammar (the nested-element subset of the reference's XPath
    valuePaths, DocIndexerXPath.java):
      @attr                      attribute on the element itself
      child:t1/t2[...]@attr      direct-child chain, first match per
                                 step in document order
      desc:t1/t2[...]@attr       first step searches ALL descendants,
                                 deeper steps are direct children
      [...]                      optional [@attr=value] step predicate
      (no trailing @attr)        the matched element's text content
    """
    vals = _ann_values(el, spec)
    return vals[0] if vals else ""


def _pred_ok(el, pred) -> bool:
    """Non-positional predicate test against one element."""
    kind, attr, val = pred
    if kind == "attr":
        return (_attr_get(el, attr) or "") == val
    if kind == "exists":
        return _attr_get(el, attr) is not None
    if kind == "contains":
        return val in (_attr_get(el, attr) or "")
    raise UnsupportedXPathError(f"predicate kind '{kind}' not valid here")


def _walk_steps(els: list, steps, desc_first: bool) -> list:
    """Resolve a step chain against a seed element list (first step
    optionally searches all descendants; deeper steps direct children).
    Positional predicates (t[N]) select the N-th matching child of each
    PARENT, per XPath semantics — for a descendant-searched step every
    descendant acts as a candidate parent."""
    for i, (tag, pred) in enumerate(steps):
        nxt = []
        for e in els:
            if pred is not None and pred[0] == "pos":
                n = pred[2]
                parents = e.iter() if (i == 0 and desc_first) else [e]
                for p in parents:
                    matches = [ch for ch in p if _local(ch.tag) == tag]
                    if len(matches) >= n:
                        nxt.append(matches[n - 1])
                continue
            pool = e.iter() if (i == 0 and desc_first) else list(e)
            for ch in pool:
                if ch is e or _local(ch.tag) != tag:
                    continue
                if pred is not None and not _pred_ok(ch, pred):
                    continue
                nxt.append(ch)
        if not nxt:
            return []
        els = nxt
    return els


def _step_match(el, step) -> bool:
    tag, pred = step
    if _local(el.tag) != tag:
        return False
    return pred is None or _pred_ok(el, pred)


def _find_elements(root, path: str) -> list:
    """Standoff `path` resolution: elements under ``root`` matching the
    chain, first step descendant-searched (NAF `terms/term`, EAF TIER
    chains both land here after config normalization)."""
    return _walk_steps([root], _parse_steps(path), desc_first=True)


def _ann_values(el, spec: str) -> list[str]:
    """Like :func:`_ann_value` but EVERY match in document order — the
    reference's standoff tokenRefPath loop collects all matches
    (DocIndexerXPath.java:446-455)."""
    if spec == ".":  # the element's own string value (valuePath ".")
        return ["".join(el.itertext()).strip()]
    if spec.startswith("@"):
        v = _attr_get(el, spec[1:])
        return [v] if v is not None else []
    for prefix in ("child:", "desc:"):
        if spec.startswith(prefix):
            break
    else:
        return []
    # the trailing @attr is the LAST '@' outside any [...] predicate
    # ("meta[@id=title]" has no trailing attr; "pos/feat[@s=h]@class"
    # does)
    body, sep, attr = spec[len(prefix):].rpartition("@")
    if not sep or "]" in attr or "=" in attr:
        body, attr = spec[len(prefix):], ""
    els = _walk_steps([el], _parse_steps(body), desc_first=(prefix == "desc:"))
    out = []
    for hit in els:
        if attr:
            v = _attr_get(hit, attr)
            if v is not None:
                out.append(v)
        else:
            out.append("".join(hit.itertext()).strip())
    return out


def _java_repl(replace: str) -> str:
    """Java replaceAll group refs ($1) -> Python re.sub (\\g<1>)."""
    import re

    return re.sub(r"\$(\d+)", r"\\g<\1>", replace)


def _op_parse_pos(value: str, feat: str) -> str:
    """DocIndexerConfig.opParsePartOfSpeech: 'NOU-C(gender=f)' -> main
    pos for field '_', else the named feature's value ('' if absent)."""
    import re

    value = value.strip()
    if feat == "_":
        return re.sub(r"^([^(]+)(\s*\(.*\))?$", r"\g<1>", value)
    m = re.match(r"^[^(]+(\s*\((.*)\))?$", value)
    feats = (m.group(2) or "") if m else ""
    for part in feats.split(","):
        k, _, v = part.partition("=")
        if k.strip() == feat:
            return v.strip()
    return ""


def apply_process(values: list[str], steps: list[dict],
                  map_values: dict | None = None,
                  get_meta=None) -> list[str]:
    """The reference's `process:` value-operation chain
    (DocIndexerConfig.processStringMultipleValues:280-370 and the op*
    helpers :375-565): replace (regex, keep=all keeps originals),
    default/append (constant value or another metadata field via
    ``get_meta``), split (separator regex; keep = index / 'all' /
    'both'), strip, parsePos, chatFormatAgeToMonths, concatDate; then
    the ``mapValues`` table. Pure Python — runs inside the per-file
    ``mapInPandas`` parser, never per Spark row."""
    import re

    def meta_or_value(p: dict, sep: str) -> str | None:
        f = p.get("field")
        if f is not None and get_meta is not None:
            got = get_meta(f)
            if got:
                return sep.join(got) if isinstance(got, list) else str(got)
            return None
        return p.get("value")

    result = list(values)
    for step in steps:
        method = step.get("action") or step.get("method") or ""
        if method == "replace":
            keep_all = str(step.get("keep", "replaced")) == "all"
            out: list[str] = []
            for s in result:
                r = re.sub(step.get("find", ""), _java_repl(
                    str(step.get("replace", ""))), s)
                out.extend([s, r] if keep_all else [r])
            result = out
        elif method in ("default", "ifempty"):
            v = meta_or_value(step, str(step.get("separator", ";")))
            if v is not None:
                result = [v if s == "" else s for s in result]
        elif method == "append":
            sep = str(step.get("separator", " "))
            v = meta_or_value(step, sep)
            if v:
                result = [(s + sep + v if s else v) for s in result]
        elif method == "split":
            sep = str(step.get("separator", ";"))
            keep = str(step.get("keep", "-1")).lower()
            out = []
            for s in result:
                parts = re.split(sep, s)
                if keep == "all":
                    out.extend(parts)
                elif keep == "both":
                    out.append(s)
                    out.extend(parts)
                else:
                    try:
                        i = int(keep)
                    except ValueError:
                        i = -1
                    i = max(i, 0)
                    out.append(parts[i] if i < len(parts) else "")
            result = out
        elif method == "strip":
            chars = str(step.get("chars", " "))
            result = [s.strip(chars) for s in result]
        elif method == "parsePos":
            feat = str(step.get("field", "_"))
            result = [_op_parse_pos(s, feat) for s in result]
        elif method == "chatFormatAgeToMonths":
            out = []
            for s in result:
                parts = re.split(r"[;.]", s, maxsplit=2)
                try:
                    y = int(parts[0])
                    m = int(parts[1]) if len(parts) > 1 else 0
                    d = int(parts[2]) if len(parts) > 2 else 0
                    out.append(str(y * 12 + m + (1 if d > 14 else 0)))
                except ValueError:
                    out.append(s)
            result = out
        elif method == "concatDate":
            # yyyymmdd from three metadata fields, autofill start/end
            # clamping (opConcatDate)
            import calendar

            def intfield(name):
                got = get_meta(name) if get_meta else None
                if isinstance(got, list):
                    got = got[0] if got else None
                try:
                    return int(got)
                except (TypeError, ValueError):
                    return None

            y = intfield(step.get("yearField", ""))
            m = intfield(step.get("monthField", ""))
            d = intfield(step.get("dayField", ""))
            start = str(step.get("autofill", "start")).lower() == "start"
            if y is None:
                result = [""] + result[1:]
            else:
                if m is None or not 1 <= m <= 12:
                    m = 1 if start else 12
                last = calendar.monthrange(y, m)[1]
                if d is None or not 1 <= d <= last:
                    d = 1 if start else last
                s = f"{y:04d}{m:02d}{d:02d}"
                result = [s] + result[1:] if result else [s]
        else:
            raise ValueError(f"unknown processing step method {method!r}")
    if map_values:
        result = [map_values.get(s, s) for s in result]
    return result


def _parse_doc(doc_el, cfg: XmlFormat, file_id: str, doc_idx: int,
               keep_xml: bool = False,
               token_pattern: str | None = None) -> dict:
    """Positions are counted in ENGINE tokens, not <w> elements: the
    build re-tokenizes ``text`` with the engine token pattern, so a
    <w> whose content yields k != 1 regex tokens ("New-York" -> 2,
    an empty <w/> -> 0) would silently shift every later annotation
    and span. Each <w> therefore contributes k aligned entries per
    annotation (value repeated across its sub-tokens) and k to the
    running position counter. ``token_pattern`` must be the SAME
    pattern the index build will use (EngineConfig.token_pattern,
    default when None) — with ``[^\\s]+`` every <w> is exactly one
    engine token, which reproduces the reference's <w>-element
    positions exactly (see tests/test_voice_parity.py)."""
    import re

    from blacklab_spark.analysis import py_token_pattern, py_tokenize

    tok_pat = py_token_pattern(token_pattern) if token_pattern else None

    words: list[str] = []
    word_full: list[str] = []
    punct: list[str] = []   # text before token i (punctPath analogue)
    pend: list[str] = []    # inter-word text fragments not yet flushed
    anns: dict[str, list[str]] = {name: [] for name in cfg.annotations}
    spans: list[dict] = []
    tok_pos: dict[str, tuple[int, int]] = {}  # token id -> (start, k)
    has_multivalue = False
    n_tok = 0  # engine-token positions emitted so far

    # multi-step wordPath: last step matches the element itself, the
    # steps before it must match the nearest enclosing ancestors in
    # order (eaf.blf.yaml TIER[@LINGUISTIC_TYPE_REF='Words']/ANNOTATION/
    # ALIGNABLE_ANNOTATION — only the Words tier's annotations tokenize)
    word_steps = _parse_steps(cfg.word_path) if cfg.word_path else None

    # metadata FIRST (it only reads the document element) so process
    # steps on annotations can reference metadata fields, like the
    # reference's getMetadataField during processing
    conv_id = f"{file_id}-{doc_idx}"
    role = tool = ""
    extra_meta: dict[str, str] = {}
    if cfg.metadata_foreach:
        # forEachPath leaf-element metadata (tcf/cmdi.blf.yaml:
        # `forEachPath: .//*[not(*) and text()]` + `namePath:
        # local-name()` under a containerPath): every text-bearing leaf
        # under the container becomes a field named by its local tag;
        # first occurrence wins (repeated names are rare in CMDI
        # headers). The container may be the document element itself
        # (cmdi.blf.yaml has no metadata containerPath).
        for c in doc_el.iter():
            if _local(c.tag) == cfg.metadata_foreach:
                for leaf in c.iter():
                    txt = (leaf.text or "").strip()
                    if len(leaf) == 0 and txt:
                        extra_meta.setdefault(_local(leaf.tag), txt)
                break

    def get_meta(name: str):
        return {"conv_id": conv_id, "role": role, "tool": tool}.get(
            name, extra_meta.get(name, "")
        )

    for col, spec in cfg.metadata.items():
        val = _ann_value(doc_el, spec)
        proc = cfg.meta_processing.get(col)
        if proc:
            got = apply_process([val], proc[0], proc[1], get_meta)
            val = got[0] if got else ""
        if col == "conv_id" and val:
            conv_id = val
        elif col == "role":
            role = val
        elif col == "tool":
            tool = val
        elif val:
            extra_meta[col] = val

    def is_word(el, tag: str, stack: list) -> bool:
        if word_steps is None:
            return tag == cfg.word_tag
        if not _step_match(el, word_steps[-1]):
            return False
        j = len(stack) - 1
        for step in reversed(word_steps[:-1]):
            if j < 0 or not _step_match(stack[j], step):
                return False
            j -= 1
        return True

    stack: list = []  # enclosing elements, innermost last

    def walk(el) -> None:
        nonlocal has_multivalue, n_tok
        tag = _local(el.tag)
        if is_word(el, tag, stack):
            raw = (
                _ann_value(el, cfg.word_value) if cfg.word_value else ""
            ) or "".join(el.itertext()).strip()
            primary = raw.split("|", 1)[0]
            if "|" in raw:
                has_multivalue = True
            k = len(py_tokenize(primary, tok_pat)) if tok_pat \
                else len(py_tokenize(primary))
            if k:
                if cfg.token_id:
                    tid = _ann_value(el, cfg.token_id)
                    if tid:
                        tok_pos[tid] = (n_tok, k)
                words.append(primary)
                word_full.extend([raw] * k)
                for name, spec in cfg.annotations.items():
                    v = _ann_value(el, spec)
                    proc = cfg.processing.get(name)
                    if proc:
                        got = apply_process([v], proc[0], proc[1], get_meta)
                        # multiple processed values land in one
                        # multivalue cell (build splits on `|`, same
                        # contract as the word annotation)
                        v = "|".join(got) if len(got) > 1 else (
                            got[0] if got else ""
                        )
                    anns[name].extend([v] * k)
                # flush accumulated inter-word text as this token's
                # preceding punct; a word's extra sub-tokens have none
                punct.append(re.sub(r"\s+", " ", "".join(pend)))
                punct.extend([""] * (k - 1))
                pend.clear()
                n_tok += k
            else:
                # a word the tokenizer drops entirely ("(.)" pauses):
                # its text survives as punctuation, like the
                # reference's punctPath picking up non-word text
                pend.append(raw)
            return  # a word's children are its own markup, not tokens
        rec = tag in cfg.inline_tags
        if rec:
            start = n_tok
        stack.append(el)
        pend.append(el.text or "")
        for ch in el:
            walk(ch)
            pend.append(ch.tail or "")
        stack.pop()
        if rec:
            spans.append(
                {
                    "tag": tag,
                    "start": start,
                    "end": n_tok,
                    "attrs": {k: str(v) for k, v in el.attrib.items()},
                }
            )

    # containerPath analogue: restrict the token/span walk to the
    # configured container descendant (TEI containerPath .//text —
    # header <p>s must not become spans); absent container = whole doc
    walk_root = doc_el
    if cfg.container_tag:
        for el in doc_el.iter():
            if el is not doc_el and _local(el.tag) == cfg.container_tag:
                walk_root = el
                break
    pend.append(walk_root.text or "")
    for ch in walk_root:
        walk(ch)
        pend.append(ch.tail or "")

    # standoff annotations: resolved from the DOCUMENT element (NAF's
    # <terms> lives outside the <text> container), after the token walk
    # so the id->position map is complete (reference processes standoff
    # blocks per document after words, DocIndexerXPath.java:430-505).
    # Unresolvable token refs are skipped like the reference's warn().
    for so in cfg.standoff:
        for el in _find_elements(doc_el, so.path):
            # a single tokenRef value may be a whitespace-joined id LIST
            # (TCF `tokenIDs="t1 t2"`; the reference's contains() XPath
            # in tcf.blf.yaml matches ids inside that list)
            refs = [
                tok_pos[r]
                for v in _ann_values(el, so.token_ref)
                for r in v.split()
                if r in tok_pos
            ]
            if so.span_end or so.span_name:
                if not refs:
                    continue
                start = min(p for p, _ in refs)
                # no spanEndPath (TCF sentences): the span covers every
                # referenced token; else end comes from the span_end ref
                end = max(p + k for p, k in refs)
                evs = (
                    [r for v in _ann_values(el, so.span_end) for r in v.split()]
                    if so.span_end else []
                )
                if evs and evs[0] in tok_pos:
                    ep, ek = tok_pos[evs[0]]
                    # inclusive span end refers to the LAST token inside
                    # the span; stored end is always exclusive
                    end = ep + ek if so.span_end_inclusive else ep
                if end <= start:
                    continue
                if so.span_name.startswith("="):
                    tag_name = so.span_name[1:]
                else:
                    tag_name = (
                        _ann_value(el, so.span_name) if so.span_name else ""
                    ) or "span"
                attrs = {k: str(v) for k, v in el.attrib.items()}
                for aname, spec in so.annotations.items():
                    v = _ann_value(el, spec)
                    if v:
                        attrs[aname] = v
                spans.append(
                    {"tag": tag_name, "start": start, "end": end, "attrs": attrs}
                )
            else:
                for aname, spec in so.annotations.items():
                    v = _ann_value(el, spec)
                    if not v:
                        continue
                    arr = anns.setdefault(aname, [""] * n_tok)
                    for p0, k in refs:
                        for p in range(p0, p0 + k):
                            if not arr[p]:
                                arr[p] = v
                            elif v not in arr[p].split("|"):
                                # extra value at an occupied position ->
                                # multivalue cell (build splits on `|`)
                                arr[p] = arr[p] + "|" + v

    out_anns = {}
    for name, vals in anns.items():
        if any(v for v in vals):
            out_anns[name] = vals
    if cfg.punct and "punct" not in cfg.annotations \
            and any(v for v in punct):
        out_anns["punct"] = punct
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
        "metadata": extra_meta,
    }


def parse_xml_files(
    spark: SparkSession, path: str, cfg: XmlFormat | str | None = None,
    keep_xml: bool = False, token_pattern: str | None = None,
) -> DataFrame:
    """Whole-file XML scan -> one parsed row per document element, with
    annotation arrays and inline-tag span rows still nested (split into
    the canonical tables by ``read_xml`` / ``xml_spans``).

    ``token_pattern``: the EngineConfig.token_pattern the index build
    will use, when not the default — annotation/span positions are
    counted in engine tokens, so the two must agree."""
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
                    rows.append(_parse_doc(doc_el, cfg, file_id, i,
                                           keep_xml, token_pattern))
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "role", "text", "tool", "ts",
                    "anns", "spans", "xml", "metadata",
                ],
            )

    return raw.mapInPandas(parse_batch, schema=_PARSED_SCHEMA)


def read_xml(
    spark: SparkSession, path: str, cfg: XmlFormat | str | None = None,
    parsed: DataFrame | None = None, keep_xml: bool = False,
    token_pattern: str | None = None,
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
        else parse_xml_files(spark, path, cfg, keep_xml=keep_xml,
                             token_pattern=token_pattern)
    )
    ann_names = list(cfg.annotations)
    for so in cfg.standoff:
        if not so.span_end:  # span standoffs surface via xml_spans
            ann_names += [a for a in so.annotations if a not in ann_names]
    if cfg.punct and "punct" not in ann_names:
        ann_names.append("punct")
    ann_names.append("word")
    cols = [
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role", "text", "tool",
        F.col("ts").cast("timestamp").alias("ts"),
    ]
    if keep_xml:
        cols.append(F.col("xml").alias("xml_text"))
    # non-canonical metadata fields (element-text or attribute sourced)
    # surface as meta_<name> columns (reference metadata fields become
    # Lucene doc fields; ours become transcript columns)
    for m in cfg.metadata:
        if m not in ("conv_id", "role", "tool"):
            cols.append(F.element_at("metadata", m).alias(f"meta_{m}"))
    if cfg.metadata_foreach:
        # dynamic forEach field names can't be static columns — surface
        # the whole map (fixed fields above still get typed columns)
        cols.append(F.col("metadata").alias("meta_fields"))
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
    base_cols += [
        f"meta_{m}" for m in cfg.metadata if m not in ("conv_id", "role", "tool")
    ]
    if cfg.metadata_foreach:
        base_cols.append("meta_fields")
    out = out.select(*base_cols, *keep)
    # absent sidecar cells must still be position-aligned arrays — size
    # the filler with the ENGINE tokenizer (whitespace-splitting counts
    # 1 for empty text and undercounts hyphenated words, shifting every
    # positional lookup into the pad)
    from blacklab_spark.config import EngineConfig
    from blacklab_spark.index.build import _case_expanded

    pat = _case_expanded(token_pattern or EngineConfig().token_pattern)
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
    parsed: DataFrame | None = None, token_pattern: str | None = None,
) -> DataFrame:
    """Inline-tag spans as ``extra_spans`` input rows for build_index
    (the starttag analogue, reference SpansTags.java:81-102)."""
    df = parsed if parsed is not None else parse_xml_files(
        spark, path, cfg, token_pattern=token_pattern)
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

    def strip_ns(step: str) -> str:
        """Drop a namespace prefix from a step, preserving predicates
        (folia:pos[@x='y'] -> pos[@x='y'])."""
        tag, _, pred = step.partition("[")
        tag = tag.split(":")[-1]
        return f"{tag}[{pred}" if pred else tag

    def norm_path(vp: str, base_path: str | None = None,
                  where: str = "valuePath") -> str:
        """ValuePath (the XPath subset the built-in formats use) -> our
        spec language. '.' = the element's own string value; '@attr'
        stays an attribute (on basePath's child element if one is set,
        reference folia.blf.yaml `basePath: folia:pos` + `valuePath:
        "@class"`); slashed element paths become child:/desc: chains
        with an optional trailing /@attr. Unsupported XPath fails loud
        (check_xpath) instead of silently yielding empty values."""
        check_xpath(vp, where)
        if base_path:
            check_xpath(base_path, f"{where} basePath")
        vp = (vp or "").strip()
        if vp in (".", ""):
            return ""
        if vp.startswith("@"):
            if base_path:
                return f"child:{strip_ns(last_tag(base_path))}@{vp[1:]}"
            return vp
        mode = "desc" if vp.startswith((".//", "//")) else "child"
        parts = [s for s in vp.lstrip("./").split("/") if s and s != "."]
        attr = None
        if parts and parts[-1].startswith("@"):
            attr = parts.pop()[1:]
        body = "/".join(strip_ns(s) for s in parts)
        if base_path:
            body = f"{strip_ns(last_tag(base_path))}/{body}" if body else strip_ns(
                last_tag(base_path)
            )
        return f"{mode}:{body}" + (f"@{attr}" if attr else "")

    fmt = XmlFormat(name=doc.get("name", "xml"))
    fmt.namespaces = dict(doc.get("namespaces") or {})
    if doc.get("documentPath"):
        check_xpath(doc["documentPath"], "documentPath",
                    allow_positional=False)
        fmt.raw_paths["document"] = doc["documentPath"]
        fmt.document_tag = strip_ns(last_tag(doc["documentPath"]))
    contents = (doc.get("annotatedFields") or {}).get("contents") or {}
    if contents.get("containerPath"):
        check_xpath(contents["containerPath"], "containerPath",
                    allow_positional=False)
        fmt.raw_paths["container"] = contents["containerPath"]
        fmt.container_tag = strip_ns(last_tag(contents["containerPath"]))
    if contents.get("wordPath"):
        # wordPath matches via ancestor-anchored _step_match, which has
        # no parent context for positional predicates
        check_xpath(contents["wordPath"], "wordPath",
                    allow_positional=False)
        fmt.raw_paths["word"] = contents["wordPath"]
        wp = contents["wordPath"].strip().lstrip("/").lstrip("./")
        parts = [strip_ns(s) for s in wp.split("/") if s and s != "."]
        fmt.word_tag = parts[-1].partition("[")[0] if parts else "w"
        # multi-step or predicated wordPaths (eaf.blf.yaml tier-
        # qualified words) need ancestor-anchored matching
        if len(parts) > 1 or (parts and "[" in parts[0]):
            fmt.word_path = "/".join(parts)
    def read_process(node: dict, target: str, into: dict) -> None:
        """`process:` steps + `mapValues:` table for one annotation or
        metadata field (reference ConfigProcessStep; step keys are the
        action name + its params, either flat or under `param:`)."""
        steps = []
        for st in node.get("process") or []:
            flat = dict(st.get("param") or {})
            flat.update({k: v for k, v in st.items() if k != "param"})
            steps.append(flat)
        mv = node.get("mapValues") or None
        if steps or mv:
            into[target] = (steps, mv)

    if contents.get("annotations"):
        fmt.annotations = {}
        for a in contents["annotations"]:
            spec = norm_path(a.get("valuePath", ""), a.get("basePath"))
            fmt.raw_paths[f"ann:{a['name']}"] = (
                a.get("basePath") or "", a.get("valuePath", "")
            )
            read_process(a, a["name"], fmt.processing)
            if a["name"] == "word":
                # the main annotation IS the word text (reference: the
                # first annotation; FoLiA reads it from the <t> child)
                fmt.word_value = spec
            else:
                fmt.annotations[a["name"]] = spec
            for sub in a.get("subannotations") or []:
                # reference indexes each subannotation as its own
                # field (folia.blf.yaml subannotations:); flattened
                # name parent_sub is what `[pos.head=..]` resolves to
                fmt.annotations[f"{a['name']}_{sub['name']}"] = norm_path(
                    sub.get("valuePath", ""), sub.get("basePath", a.get("basePath"))
                )
    if contents.get("inlineTags"):
        for t in contents["inlineTags"]:
            check_xpath(t.get("path"), "inlineTags path",
                        allow_positional=False)
        fmt.inline_tags = tuple(
            strip_ns(last_tag(t["path"])) for t in contents["inlineTags"]
        )
        fmt.raw_paths["inline"] = [
            (t["path"], t.get("displayAs", "")) for t in contents["inlineTags"]
        ]
    if contents.get("tokenIdPath"):
        fmt.token_id = norm_path(contents["tokenIdPath"]) or "@id"
    for so in contents.get("standoffAnnotations") or []:
        # absolute standoff paths (eaf.blf.yaml /ANNOTATION_DOCUMENT/
        # TIER[...]) start at the document element; document-relative
        # ones (naf.blf.yaml terms/term) already do — either way the
        # first remaining step is descendant-searched by _find_elements
        check_xpath(so.get("path"), "standoffAnnotations path")
        parts = [
            strip_ns(s)
            for s in (so.get("path") or "").strip().lstrip("/").lstrip("./").split("/")
            if s and s != "."
        ]
        if parts and parts[0] == fmt.document_tag:
            parts = parts[1:]
        sn = (so.get("spanNamePath") or "").strip()
        fmt.standoff = fmt.standoff + (
            StandoffSpec(
                path="/".join(parts),
                token_ref=norm_path(so.get("tokenRefPath", "")),
                annotations={
                    a["name"]: norm_path(a.get("valuePath", ""), a.get("basePath"))
                    for a in so.get("annotations") or []
                },
                span_end=norm_path(so.get("spanEndPath", "")),
                span_end_inclusive=bool(so.get("spanEndIsInclusive", True)),
                span_name=(
                    "=" + sn.strip("'\"") if sn[:1] in ("'", '"')
                    else norm_path(sn)
                ),
            ),
        )
    # metadata may be one block (dict) or several (list; tcf.blf.yaml's
    # `- containerPath: d:MetaData` + forEachPath leaf-capture idiom)
    meta_cfg = doc.get("metadata") or {}
    blocks = meta_cfg if isinstance(meta_cfg, list) else [meta_cfg]
    named: dict = {}
    for b in blocks:
        fields = b.get("fields") or []
        has_foreach = any(m.get("forEachPath") for m in fields)
        for m in fields:
            if m.get("forEachPath"):
                # `.//*[not(*) and text()]` + namePath local-name():
                # leaf elements under the block's container become
                # fields named by their tag (tcf/cmdi.blf.yaml)
                fmt.metadata_foreach = (
                    strip_ns(last_tag(b["containerPath"]))
                    if b.get("containerPath") else fmt.document_tag
                )
            elif m.get("valuePath"):
                named[m["name"]] = norm_path(m["valuePath"])
                read_process(m, m["name"], fmt.meta_processing)
            elif not has_foreach:
                # bare `- name: pid` = same-named attribute shorthand;
                # in a forEach block it's a type-only refinement
                # (`- name: Country` + `type: untokenized`) instead
                named[m["name"]] = f"@{m['name']}"
    if named:
        fmt.metadata = named
    return fmt
