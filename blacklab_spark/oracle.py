"""Exact pure-Python oracle — the rank-identity reference.

Implements the same tokenizer, BM25 formula (float64 accumulation,
ties by ascending doc_id) and span semantics as the engine, by brute
force over in-memory lists. Small-scale only; used by pytest to verify
the Spark engine (SURVEY.md §2.5 decision, FIXTURES.md §4).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from dataclasses import dataclass, field


@dataclass
class OracleIndex:
    from blacklab_spark.analysis import TOKEN_PATTERN as _DEFAULT_PATTERN

    token_pattern: str = _DEFAULT_PATTERN
    k1: float = 1.2
    b: float = 0.75
    docs: list[dict] = field(default_factory=list)  # doc_id -> row
    tokens: list[list[str]] = field(default_factory=list)  # insensitive
    tokens_s: list[list[str]] = field(default_factory=list)  # original case
    postings: dict[str, dict[int, list[int]]] = field(
        default_factory=lambda: defaultdict(dict)
    )

    def tokenize(self, text: str) -> list[str]:
        """Insensitive tokens — the same fold(lower(token)) chain the
        engine's tokens_i annotation uses."""
        from blacklab_spark.analysis import desensitize_py

        return [desensitize_py(t) for t in self.tokenize_sensitive(text)]

    def tokenize_sensitive(self, text: str) -> list[str]:
        from blacklab_spark.analysis import py_token_pattern

        return re.findall(
            py_token_pattern(self.token_pattern), text, flags=re.IGNORECASE
        )

    @staticmethod
    def from_rows(rows: list[dict], **kw) -> "OracleIndex":
        """rows: dicts with conv_id, turn_idx, role, text, tool.
        doc_id = dense rank over (conv_id, turn_idx)."""
        idx = OracleIndex(**kw)
        for doc_id, row in enumerate(
            sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
        ):
            idx.docs.append(row)
            toks_s = idx.tokenize_sensitive(row["text"])
            from blacklab_spark.analysis import desensitize_py

            toks = [desensitize_py(t) for t in toks_s]
            idx.tokens.append(toks)
            idx.tokens_s.append(toks_s)
            for pos, t in enumerate(toks):
                idx.postings[t].setdefault(doc_id, []).append(pos)
        return idx

    # ---- BM25 ----------------------------------------------------------
    @property
    def n_docs(self) -> int:
        return len(self.docs)

    @property
    def avgdl(self) -> float:
        return sum(len(t) for t in self.tokens) / max(1, self.n_docs)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25_topk(
        self, query: str, k: int = 10, allowed: set[int] | None = None
    ) -> list[tuple[int, float]]:
        qterms = self.tokenize(query)
        scores: dict[int, float] = defaultdict(float)
        qcount = Counter(qterms)
        for term, qtf in qcount.items():
            plist = self.postings.get(term)
            if not plist:
                continue
            w_idf = qtf * self.idf(term)
            for doc_id, positions in plist.items():
                if allowed is not None and doc_id not in allowed:
                    continue
                tf = len(positions)
                dl = len(self.tokens[doc_id])
                scores[doc_id] += w_idf * tf / (
                    tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
                )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    # ---- span matching ---------------------------------------------------
    def term_hits(self, term: str) -> list[tuple[int, int, int]]:
        out = []
        for doc_id, positions in sorted(self.postings.get(term.lower(), {}).items()):
            out.extend((doc_id, p, p + 1) for p in positions)
        return out

    def regex_hits(self, pattern: str) -> list[tuple[int, int, int]]:
        rx = re.compile(pattern)
        out = []
        for doc_id, toks in enumerate(self.tokens):
            for p, t in enumerate(toks):
                if rx.fullmatch(t):
                    out.append((doc_id, p, p + 1))
        return out

    def phrase_hits(self, words: list[str]) -> list[tuple[int, int, int]]:
        n = len(words)
        out = []
        for doc_id, toks in enumerate(self.tokens):
            for p in range(len(toks) - n + 1):
                if toks[p: p + n] == words:
                    out.append((doc_id, p, p + n))
        return out
