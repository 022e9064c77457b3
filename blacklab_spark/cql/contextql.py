"""ContextQL (SRU CQL) front end.

Reference: query-parser/src/main/javacc/.../contextql/contextql.jj
(grammar; boolean ops :50-58) and
queryParser/contextql/ContextualQueryLanguageParser.java (semantics:
`contains` clause builder, annotation-vs-metadata routing) plus
search/CompleteQuery.java (AND = token-level and on patterns +
boolean AND on filters; OR only within one kind; NOT = and-not).

A ContextQL query yields a `CompleteQuery`: an optional contents
pattern (our CQL AST — runs through the same planner as BCQL) and an
optional metadata filter (a Spark SQL boolean expression over the
doc_stats metadata columns; DuckDB-compatible).

Supported (mirroring the reference): `term`, `field = term`,
phrase values ("a b c" → sequence), `*`/`?` wildcards, parentheses,
AND / OR / NOT. PROX and relation modifiers raise, exactly like the
reference's UnsupportedOperationException.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from blacklab_spark.cql.parser import Node, Or, Seq, TermNode, TokenAnd

# annotations routed to the contents pattern; everything else is a
# metadata field (reference ContextualQueryLanguageParser.contains:
# word/lemma/pos and "contents"/"contents.X" are contents searches)
CONTENTS_ANNOTATIONS = {"word", "lemma", "pos"}
DEFAULT_ANNOTATION = "word"

_TOK_RE = re.compile(
    r"""\s+
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<op><>|>=|<=|[()=<>])
  | (?P<ident>[A-Za-z0-9_.\-*?]+)
    """,
    re.VERBOSE,
)


class ContextQLError(ValueError):
    pass


@dataclass
class CompleteQuery:
    """Contents pattern + metadata filter (reference CompleteQuery.java)."""

    pattern: Node | None = None
    filter: str | None = None

    def and_(self, other: "CompleteQuery") -> "CompleteQuery":
        if self.pattern is not None and other.pattern is not None:
            # token-level and (reference CompleteQuery.and: TextPatternAndNot)
            p = TokenAnd([("and", self.pattern), ("and", other.pattern)])
        else:
            p = self.pattern if self.pattern is not None else other.pattern
        f = _combine_filters(self.filter, other.filter, "AND")
        return CompleteQuery(p, f)

    def or_(self, other: "CompleteQuery") -> "CompleteQuery":
        if (self.pattern is None) != (other.pattern is None) or (
            (self.filter is None) != (other.filter is None)
        ):
            raise ContextQLError(
                "or can only combine contents clauses or metadata clauses, "
                "not one of each"
            )
        p = None
        if self.pattern is not None:
            p = Or([self.pattern, other.pattern])
        f = _combine_filters(self.filter, other.filter, "OR")
        return CompleteQuery(p, f)

    def not_(self, other: "CompleteQuery") -> "CompleteQuery":
        p = self.pattern
        if other.pattern is not None:
            # and-not (reference CompleteQuery.not: TextPatternAndNot(a, Not(b));
            # with no left pattern, plain TextPatternNot(b))
            left = [("and", self.pattern)] if self.pattern is not None else []
            p = TokenAnd(left + [("not", other.pattern)])
        f = self.filter
        if other.filter is not None:
            nf = f"(NOT ({other.filter}))"
            f = _combine_filters(self.filter, nf, "AND") if self.filter else nf
        return CompleteQuery(p, f)


def _combine_filters(a: str | None, b: str | None, op: str) -> str | None:
    if a is not None and b is not None:
        return f"(({a}) {op} ({b}))"
    return a if a is not None else b


def _lex(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOK_RE.match(s, i)
        if not m:
            raise ContextQLError(f"ContextQL lex error at {i}: {s[i:i+12]!r}")
        i = m.end()
        for kind in ("string", "op", "ident"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


def _wildcard_to_term(word: str, annotation: str) -> TermNode:
    """`*`/`?` wildcards → our TermNode regex value (reference uses
    TextPatternWildcard; TextPatternRegex-style simplification happens
    in the shared planner)."""
    if "*" in word or "?" in word:
        pat = re.escape(word).replace(r"\*", ".*").replace(r"\?", ".")
        return TermNode(annotation, pat)
    return TermNode(annotation, re.escape(word))


def _contains(field: str | None, value: str) -> CompleteQuery:
    field = field or DEFAULT_ANNOTATION
    annotation = None
    if field in CONTENTS_ANNOTATIONS:
        annotation = field
    elif field == "contents":
        annotation = DEFAULT_ANNOTATION
    elif field.startswith("contents."):
        annotation = field[len("contents."):]
    if annotation is not None:
        words = value.strip().split()
        if not words:
            raise ContextQLError("empty search term")
        nodes = [_wildcard_to_term(w.lower(), annotation) for w in words]
        return CompleteQuery(pattern=nodes[0] if len(nodes) == 1 else Seq(nodes))
    # metadata filter over doc columns; wildcards → LIKE
    esc = value.replace("'", "''")
    if "*" in value or "?" in value:
        like = esc.replace("%", r"\%").replace("_", r"\_")
        like = like.replace("*", "%").replace("?", "_")
        return CompleteQuery(filter=f"({field} LIKE '{like}')")
    return CompleteQuery(filter=f"({field} = '{esc}')")


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ContextQLError("unexpected end of query")
        self.i += 1
        return t

    def parse(self) -> CompleteQuery:
        q = self.scoped_clause()
        if self.peek() is not None:
            raise ContextQLError(f"trailing input: {self.peek()[1]!r}")
        return q

    def scoped_clause(self) -> CompleteQuery:
        a = self.search_clause()
        t = self.peek()
        if t and t[0] == "ident" and t[1].lower() in ("and", "or", "not", "prox"):
            op = self.next()[1].lower()
            if op == "prox":
                raise ContextQLError("prox is not yet supported")
            b = self.scoped_clause()
            return {"and": a.and_, "or": a.or_, "not": a.not_}[op](b)
        return a

    def search_clause(self) -> CompleteQuery:
        t = self.peek()
        if t and t[1] == "(":
            self.next()
            q = self.scoped_clause()
            if self.next()[1] != ")":
                raise ContextQLError("expected ')'")
            return q
        kind, first = self.next()
        term1 = first[1:-1] if kind == "string" else first
        t = self.peek()
        if t and (t[1] == "=" or (t[0] == "op" and t[1] in (">", "<", ">=", "<=", "<>"))):
            rel = self.next()[1]
            if rel != "=":
                raise ContextQLError("only the contains (=) relation is supported")
            if self.peek() and self.peek()[1] == "/":
                raise ContextQLError("relation modifiers not supported")
            k2, v2 = self.next()
            value = v2[1:-1] if k2 == "string" else v2
            return _contains(term1, value)
        return _contains(None, term1)


def parse_contextql(query: str) -> CompleteQuery:
    return _Parser(_lex(query)).parse()
