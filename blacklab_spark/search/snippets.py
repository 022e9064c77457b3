"""Original-content snippets + highlighting.

The reference serves doc snippets from the content store with well-
formed <hl/> tags (reference contentstore/ContentStoreIntegrated.java:14,
util/XmlHighlighter.java, server RequestHandlerDocSnippet.java). Our
content store is the `text` column; token char-offsets are recomputed
on demand for ONLY the result docs (bounded work per result page, like
the reference's per-hit content store reads) inside one Arrow-batched
UDF — the corpus-wide path never touches Python.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SNIPPET_SCHEMA = (
    "doc_id long, start int, end int, snippet string, match_text string"
)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def snippets(corpus, hits_df: DataFrame, context_chars: int = 40) -> DataFrame:
    """(doc_id, start, end, snippet, match_text) — snippet is original
    text around the hit with the matched span wrapped in <hl>…</hl>."""
    from blacklab_spark.analysis import py_token_pattern

    pat = re.compile(py_token_pattern(corpus.cfg.token_pattern), re.IGNORECASE)
    j = hits_df.select("doc_id", "start", "end").join(
        corpus.tokenized.select("doc_id", "text"), "doc_id"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # char offsets per doc computed once per batch-doc
            offsets_cache: dict[int, list[tuple[int, int]]] = {}
            for doc_id, start, end, text in zip(
                pdf["doc_id"], pdf["start"], pdf["end"], pdf["text"]
            ):
                did = int(doc_id)
                if did not in offsets_cache:
                    offsets_cache[did] = [m.span() for m in pat.finditer(text)]
                offs = offsets_cache[did]
                if start >= len(offs) or end > len(offs) or end <= start:
                    continue
                cs, ce = offs[start][0], offs[end - 1][1]
                # escape text content so <hl> is the only markup and
                # the snippet stays well-formed (reference
                # XmlHighlighter keeps highlighted XML well-formed)
                left = _esc(text[max(0, cs - context_chars): cs])
                right = _esc(text[ce: ce + context_chars])
                rows.append(
                    (
                        did,
                        int(start),
                        int(end),
                        f"{left}<hl>{_esc(text[cs:ce])}</hl>{right}",
                        text[cs:ce],
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "start", "end", "snippet", "match_text"]
            )

    return j.mapInPandas(run, schema=SNIPPET_SCHEMA)
