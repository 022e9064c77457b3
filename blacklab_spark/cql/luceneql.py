"""LuceneQL metadata filter → Spark SQL boolean expression.

The reference parses the `filter` request parameter with the classic
Lucene QueryParser, overriding numeric fields to range queries
(reference wslib/.../util/BlsUtils.java:44-106: `parseFilter`,
numeric handling :60-84 via IntPoint.newRangeQuery). Our metadata
lives in plain DataFrame columns, so the filter compiles to one SQL
boolean expression (Spark- and DuckDB-compatible) that Catalyst
pushes into the parquet/Iceberg scan (partition pruning + row-group
skipping — the analogue of Lucene's per-segment docID-set filter,
SpansFiltered.java:17-60).

Supported subset (the BLS-documented surface):
  field:value        equality (string; `*`/`?` wildcards → LIKE)
  field:"a b"        quoted value
  field:[a TO b]     inclusive range (numeric if both bounds numeric)
  field:{a TO b}     exclusive range
  +clause -clause    required / prohibited
  AND OR NOT ( )     boolean clause list — juxtaposition is SHOULD (the
                     stock QueryParser default operator, OR), explicit
                     AND promotes its chain to MUST
A bare term with no field applies to the default field.
"""

from __future__ import annotations

import re

_TOK = re.compile(
    r"""\s+
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<op>AND\b|OR\b|NOT\b|TO\b)
  | (?P<sign>[+-](?=\w|"))
  | (?P<range>[\[{])
  | (?P<rangeend>[\]}])
  | (?P<colon>:)
  | (?P<quoted>"(?:[^"\\]|\\.)*")
  | (?P<term>[^\s:()\[\]{}"]+)
    """,
    re.VERBOSE,
)

_NUM = re.compile(r"^-?\d+(\.\d+)?$")


class LuceneQLError(ValueError):
    pass


def _lex(s: str):
    out, i = [], 0
    while i < len(s):
        m = _TOK.match(s, i)
        if not m:
            raise LuceneQLError(f"filter lex error at {i}: {s[i:i+12]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind:
            out.append((kind, m.group(kind)))
    return out


def _sq(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _value_expr(field: str, value: str) -> str:
    if "*" in value or "?" in value:
        like = value.replace("%", r"\%").replace("_", r"\_")
        like = like.replace("*", "%").replace("?", "_")
        return f"({field} LIKE {_sq(like)})"
    return f"({field} = {_sq(value)})"


class _Parser:
    def __init__(self, toks, default_field: str):
        self.toks = toks
        self.i = 0
        self.default_field = default_field

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        if t[0] is None:
            raise LuceneQLError("unexpected end of filter")
        self.i += 1
        return t

    def parse(self) -> str:
        e = self.parse_clause_list()
        if self.peek()[0] is not None:
            raise LuceneQLError(f"trailing input: {self.peek()[1]!r}")
        return e

    def parse_clause_list(self) -> str:
        """Lucene BooleanQuery clause list. The reference's
        BlsUtils.parseFilter uses the stock QueryParser with the
        DEFAULT operator — OR (no setDefaultOperator call) — so
        juxtaposed clauses are SHOULD, `+x`/`-x`/`NOT x` are
        MUST/MUST_NOT, and an explicit AND promotes the connected
        chain to MUST. As a filter: MUSTs AND together and silence
        SHOULDs (they only affect scoring); with no MUSTs the SHOULDs
        OR together; MUST_NOTs always subtract."""
        must: list[str] = []
        must_not: list[str] = []
        should: list[str] = []
        while True:
            kind, val = self.peek()
            if kind is None or kind == "rparen":
                break
            if (kind, val) == ("op", "OR"):
                self.next()  # explicit OR: same as juxtaposition here
                continue
            occur = None
            if kind == "sign":
                self.next()
                occur = val
            elif (kind, val) == ("op", "NOT"):
                self.next()
                occur = "-"
            expr = self.parse_unary()
            is_and_chain = False
            while self.peek() == ("op", "AND"):
                self.next()
                expr = f"({expr} AND {self.parse_unary()})"
                is_and_chain = True
            if occur is None and is_and_chain:
                occur = "+"
            (must if occur == "+" else must_not if occur == "-" else should).append(
                expr
            )
        pos = None
        if must:
            pos = must[0] if len(must) == 1 else "(" + " AND ".join(must) + ")"
        elif should:
            pos = should[0] if len(should) == 1 else "(" + " OR ".join(should) + ")"
        if must_not:
            neg = (
                must_not[0]
                if len(must_not) == 1
                else "(" + " OR ".join(must_not) + ")"
            )
            return f"(NOT {neg})" if pos is None else f"({pos} AND (NOT {neg}))"
        if pos is None:
            raise LuceneQLError("empty filter clause")
        return pos

    def parse_unary(self) -> str:
        kind, val = self.peek()
        if (kind, val) == ("op", "NOT"):
            self.next()
            return f"(NOT {self.parse_unary()})"
        if kind == "sign":
            self.next()
            e = self.parse_unary()
            return e if val == "+" else f"(NOT {e})"
        return self.parse_atom()

    def parse_atom(self) -> str:
        kind, val = self.next()
        if kind == "lparen":
            e = self.parse_clause_list()
            if self.next()[0] != "rparen":
                raise LuceneQLError("expected ')'")
            return e
        if kind in ("term", "quoted"):
            word = val[1:-1] if kind == "quoted" else val
            if self.peek()[0] == "colon":
                self.next()
                return self.parse_field_value(word)
            return _value_expr(self.default_field, word)
        raise LuceneQLError(f"unexpected {val!r}")

    def parse_field_value(self, field: str) -> str:
        kind, val = self.next()
        if kind in ("term", "quoted"):
            return _value_expr(field, val[1:-1] if kind == "quoted" else val)
        if kind == "range":
            lo_incl = val == "["
            k2, lo = self.next()
            if self.next() != ("op", "TO"):
                raise LuceneQLError("expected TO in range")
            k3, hi = self.next()
            k4, close = self.next()
            if k4 != "rangeend":
                raise LuceneQLError("expected ] or } closing range")
            hi_incl = close == "]"
            lo = lo[1:-1] if k2 == "quoted" else lo
            hi = hi[1:-1] if k3 == "quoted" else hi
            # numeric if both bounds numeric (BlsUtils.java:60-84);
            # `*` bound = open end
            parts = []
            numeric = (lo == "*" or _NUM.match(lo)) and (hi == "*" or _NUM.match(hi))
            if lo != "*":
                v = lo if numeric else _sq(lo)
                parts.append(f"{field} >{'=' if lo_incl else ''} {v}")
            if hi != "*":
                v = hi if numeric else _sq(hi)
                parts.append(f"{field} <{'=' if hi_incl else ''} {v}")
            if not parts:
                return "(TRUE)"
            return "(" + " AND ".join(parts) + ")"
        raise LuceneQLError(f"unexpected {val!r} after '{field}:'")


def parse_luceneql(filter_str: str, default_field: str = "conv_id") -> str:
    """Compile a LuceneQL metadata filter to a SQL boolean expression."""
    toks = _lex(filter_str)
    if not toks:
        return "TRUE"
    return _Parser(toks, default_field).parse()
