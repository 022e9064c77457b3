"""Original-content snippets + highlighting.

The reference serves doc snippets from the content store with well-
formed <hl/> tags (reference contentstore/ContentStoreIntegrated.java:14,
util/XmlHighlighter.java, server RequestHandlerDocSnippet.java). Our
content store is the `text` column — or, for XML corpora ingested with
``read_xml(keep_xml=True)``, the original XML in ``xml_text``. Token
char-offsets are recomputed on demand for ONLY the result docs (bounded
work per result page, like the reference's per-hit content store reads)
inside one Arrow-batched UDF — the corpus-wide path never touches
Python.

XML mode (auto-detected from the stored ``xml_text`` column):
- token offsets are found with markup MASKED (tags replaced by spaces,
  preserving char positions), so positions line up with the indexed
  word order; a ``|``-joined multivalue token counts as ONE position;
- `<hl>` wraps only text runs — it closes before and reopens after
  every embedded tag, so the highlighted output is well-formed no
  matter how the hit straddles elements (the reference XmlHighlighter's
  invariant, achieved by splitting rather than re-nesting);
- snippet windows are clipped so they never start or end inside a tag.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

SNIPPET_SCHEMA = (
    "doc_id long, start int, end int, snippet string, match_text string"
)

_TAG_RE = re.compile(r"<[^<>]*>")


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _mask_tags(text: str) -> str:
    """Replace every tag with spaces of the same length — offsets into
    the masked string are valid in the original."""
    return _TAG_RE.sub(lambda m: " " * (m.end() - m.start()), text)


def xml_highlight_region(text: str, cs: int, ce: int) -> str:
    """Wrap [cs, ce) of raw XML in <hl>, split at every embedded tag so
    the result is well-formed (tags pass through unwrapped)."""
    out = []
    pos = cs
    for m in _TAG_RE.finditer(text, cs, ce):
        if m.start() > pos:
            out.append(f"<hl>{text[pos:m.start()]}</hl>")
        out.append(m.group(0))
        pos = m.end()
    if pos < ce:
        out.append(f"<hl>{text[pos:ce]}</hl>")
    return "".join(out)


_TAGNAME_RE = re.compile(r"<(/?)([A-Za-z_][\w.:-]*)")


def make_well_formed(frag: str) -> str:
    """Balance an XML fragment cut from a larger document: unmatched
    end-tags (their opener fell left of the window) are REMOVED, and
    still-open elements are closed at the end (reference
    util XmlHighlighter.java's makeWellFormed with its
    ADD_TAG/REMOVE_TAG strategies — we remove dangling closers and add
    missing closers, which keeps the fragment's own content intact)."""
    stack: list[str] = []
    drop: list[tuple[int, int]] = []
    for m in _TAG_RE.finditer(frag):
        t = m.group(0)
        if t.endswith("/>") or t.startswith("<!") or t.startswith("<?"):
            continue
        nm = _TAGNAME_RE.match(t)
        if nm is None:
            continue
        if nm.group(1) != "/":
            stack.append(nm.group(2))
        elif stack and stack[-1] == nm.group(2):
            stack.pop()
        else:
            drop.append(m.span())
    out, pos = [], 0
    for s, e in drop:
        out.append(frag[pos:s])
        pos = e
    out.append(frag[pos:])
    return "".join(out) + "".join(f"</{n}>" for n in reversed(stack))


def _clip_left(text: str, i: int) -> int:
    """Move a window start forward past any tag it lands inside."""
    lt = text.rfind("<", 0, i)
    if lt != -1 and text.find(">", lt) >= i:
        return text.find(">", lt) + 1
    return i


def _clip_right(text: str, i: int) -> int:
    """Move a window end back before any tag it lands inside."""
    lt = text.rfind("<", 0, i)
    if lt != -1 and text.find(">", lt) >= i:
        return lt
    return i


# the reference's XML-declaration matcher (ResultDocContents.XML_DECL):
# a partial-document fragment must not carry a second declaration
_XML_DECL_RE = re.compile(
    r"^\s*<\?xml\s+version\s*=\s*([\"'])\d\.\d\1"
    r"(?:\s+encoding\s*=\s*([\"'])[A-Za-z][A-Za-z0-9._-]*\2)?"
    r"(?:\s+standalone\s*=\s*([\"'])(?:yes|no)\3)?\s*\?>\s*"
)


def token_char_offsets(corpus, text: str, xml: bool) -> list[tuple[int, int]]:
    """Char spans of the indexed token positions in ONE document's
    stored content (markup masked in XML mode so positions line up with
    the indexed word order) — the per-doc form of the offset scan
    inside :func:`snippets`."""
    from blacklab_spark.analysis import py_token_pattern

    base_pat = py_token_pattern(corpus.cfg.token_pattern)
    if xml:
        base_pat = f"(?:{base_pat})(?:\\|(?:{base_pat}))*"
    pat = re.compile(base_pat, re.IGNORECASE)
    scan = _mask_tags(text) if xml else text
    return [m.span() for m in pat.finditer(scan)]


def word_element_offsets(
    text: str, n_tokens: int, tags: tuple[str, ...] = ("w", "tok", "word"),
    outer: bool = False,
) -> list[tuple[int, int]] | None:
    """Char spans of the word ELEMENTS' content regions in raw XML —
    exact token alignment for configs whose wordPath is an element
    (e.g. TEI ``.//w``), where the document also holds non-indexed text
    (teiHeader etc.) that would break a bare text-run scan. Tries each
    candidate tag; a tag whose occurrence count equals the indexed
    token count is trusted (the per-doc analogue of the reference's
    content-store char offsets, which Lucene records at index time —
    we recover them from the stored original). Tags may carry a
    namespace prefix (the stored content is ElementTree-serialized, so
    a default namespace becomes an explicit ``ns0:`` prefix). Returns
    None when no tag aligns (caller falls back to the text-run scan)."""
    for tag in tags:
        qt = rf"(?:[A-Za-z_][\w.-]*:)?{tag}"
        pat = re.compile(
            rf"<{qt}(?:\s[^>]*)?/>|<({qt})(?:\s[^>]*)?>(.*?)</\1>",
            re.DOTALL,
        )
        spans = []
        for m in pat.finditer(text):
            if outer:  # whole element incl. tags (window boundaries)
                spans.append(m.span())
            elif m.group(2) is None:  # self-closing: empty content
                spans.append((m.end(), m.end()))
            else:
                spans.append(m.span(2))
        if len(spans) == n_tokens and n_tokens > 0:
            return spans
    return None


def _merge_spans(spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort + merge overlapping char spans so each text run is wrapped
    in at most one <hl> (the reference XmlHighlighter collapses nested
    highlights the same way)."""
    out: list[list[int]] = []
    for s, e in sorted(spans):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [(s, e) for s, e in out]


def highlight_content(
    text: str,
    char_spans: list[tuple[int, int]],
    cs: int = 0,
    ce: int | None = None,
    xml: bool = True,
    full: bool = True,
) -> str:
    """(Part of) one document's stored content with hit char-spans
    wrapped in well-formed ``<hl>`` — the engine side of the reference's
    doc-contents highlighting (search/DocUtil.java:257
    ``highlightContent``: word window → char window → XmlHighlighter
    over the hit spans, balancing partial fragments).

    ``char_spans`` are absolute offsets into ``text``; spans outside
    the [cs, ce) window are clipped or dropped. A partial fragment is
    balanced (:func:`make_well_formed`) and loses any XML declaration
    (ResultDocContents.java:144-146)."""
    if ce is None:
        ce = len(text)
    if xml and not full:
        cs, ce = _clip_left(text, cs), _clip_right(text, ce)
    spans = _merge_spans(
        [(max(s, cs), min(e, ce)) for s, e in char_spans if s < ce and e > cs]
    )
    out, pos = [], cs
    for s, e in spans:
        out.append(text[pos:s])
        out.append(xml_highlight_region(text, s, e) if xml
                   else f"<hl>{text[s:e]}</hl>")
        pos = e
    out.append(text[pos:ce])
    frag = "".join(out)
    if not full:
        frag = _XML_DECL_RE.sub("", frag)
        if xml:
            frag = make_well_formed(frag)
    return frag


def collect_root_namespaces(text: str, fragment: str) -> list[str]:
    """Namespace declarations a partial fragment needs on its wrapper
    element (ResultDocContents.java:152-187: collect prefixes used in
    the fragment, find their xmlns declarations in the document's first
    1024 chars, plus any anonymous xmlns on the root)."""
    root = text[:1024]
    named = re.findall(r' xmlns:[^=]+="[^"]+"', root)
    out = [ns.strip() for ns in named]
    m = re.search(r'xmlns="([^ "]+)"', root)
    if m:
        out.append(m.group(0))
    return out


def snippets(
    corpus, hits_df: DataFrame, context_chars: int = 40,
    xml: bool | None = None,
) -> DataFrame:
    """(doc_id, start, end, snippet, match_text) — snippet is original
    content around the hit with the matched span wrapped in <hl>…</hl>.
    ``xml=None`` auto-enables XML mode when the index stored original
    XML (``xml_text`` column from read_xml(keep_xml=True))."""
    from blacklab_spark.analysis import py_token_pattern

    if xml is None:
        xml = "xml_text" in corpus.tokenized.columns
    base_pat = py_token_pattern(corpus.cfg.token_pattern)
    if xml:
        # one indexed position per word INCLUDING its |-joined
        # secondary values (ann_word_extra multivalue contract)
        base_pat = f"(?:{base_pat})(?:\\|(?:{base_pat}))*"
    pat = re.compile(base_pat, re.IGNORECASE)
    content_col = "xml_text" if xml else "text"
    j = hits_df.select("doc_id", "start", "end").join(
        # raw content comes from the content store (`tokenized`); the
        # bucketed FI holds token arrays only
        corpus.tokenized.select(
            "doc_id", F.col(content_col).alias("_content")
        ),
        "doc_id",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # char offsets per doc computed once per batch-doc
            offsets_cache: dict[int, list[tuple[int, int]]] = {}
            for doc_id, start, end, text in zip(
                pdf["doc_id"], pdf["start"], pdf["end"], pdf["_content"]
            ):
                did = int(doc_id)
                if did not in offsets_cache:
                    scan_text = _mask_tags(text) if xml else text
                    offsets_cache[did] = [
                        m.span() for m in pat.finditer(scan_text)
                    ]
                offs = offsets_cache[did]
                if start >= len(offs) or end > len(offs) or end <= start:
                    continue
                cs, ce = offs[start][0], offs[end - 1][1]
                if xml:
                    ls = _clip_left(text, max(0, cs - context_chars))
                    re_ = _clip_right(text, min(len(text), ce + context_chars))
                    snippet = make_well_formed(
                        text[ls:cs]
                        + xml_highlight_region(text, cs, ce)
                        + text[ce:re_]
                    )
                    match_text = re.sub(
                        r"\s+", " ", _mask_tags(text[cs:ce])
                    ).strip()
                else:
                    # escape text content so <hl> is the only markup and
                    # the snippet stays well-formed (reference
                    # XmlHighlighter keeps highlighted XML well-formed)
                    left = _esc(text[max(0, cs - context_chars): cs])
                    right = _esc(text[ce: ce + context_chars])
                    snippet = f"{left}<hl>{_esc(text[cs:ce])}</hl>{right}"
                    match_text = text[cs:ce]
                rows.append((did, int(start), int(end), snippet, match_text))
            yield pd.DataFrame(
                rows, columns=["doc_id", "start", "end", "snippet", "match_text"]
            )

    return j.mapInPandas(run, schema=SNIPPET_SCHEMA)
