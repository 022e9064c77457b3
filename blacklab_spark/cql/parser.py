"""BlackLab Corpus Query Language (BCQL) parser.

A hand-written recursive-descent reimplementation of the reference's
javacc grammar (reference query-parser/src/main/javacc/.../corpusql/cql.jj:
tokens :78-87, sequence :228-309, repetition :312-331, within/containing
:184-195, tags :249-271, any-token :427-439, annotation clauses :461-503,
capture :368, global constraint :103-133) producing a small dataclass
AST — the analogue of the reference's TextPattern tree
(text-pattern/.../TextPattern.java:21).

Supported surface:
    "word"  "multi word"          quoted phrase (anchored regex per word,
                                  CorpusQueryLanguageParser.java:65-75)
    [word="x" & pos!="y"]         annotation clauses with & | !
    []                            any token
    A B                           sequence
    A | B                         union
    A* A+ A? A{n} A{n,m} A{n,}    repetition
    !A  (inside [])               negation
    <s> ... </s>   <s/>           tag start / end / whole element
    <s test="1"/>                 tag with attribute filters
    grp:A                         capture group
    A within B / A containing B   position filters
    ... :: a.word = b.word        global constraints (=, !=, &, |, !)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass
class Node:
    pass


@dataclass
class TermNode(Node):
    """One annotation comparison: annotation op "value"."""
    annotation: str
    value: str
    negate: bool = False
    sensitive: bool = False  # (?-i)/(?c) flags flip this


@dataclass
class AnyToken(Node):
    pass


@dataclass
class TokenAnd(Node):
    clauses: list = field(default_factory=list)


@dataclass
class TokenOr(Node):
    clauses: list = field(default_factory=list)


@dataclass
class SpanAnd(Node):
    """Span-level intersection `A & B` between full queries (reference
    cql.jj:209-224 simpleQuery booleanOperator -> TextPatternAnd ->
    SpanQueryAndNot): hits present in every clause with identical
    (doc, start, end); a negated clause subtracts (NOTMATCHES)."""
    clauses: list = field(default_factory=list)


@dataclass
class Seq(Node):
    parts: list = field(default_factory=list)


@dataclass
class Or(Node):
    clauses: list = field(default_factory=list)


@dataclass
class Repeat(Node):
    clause: Node = None
    rmin: int = 1
    rmax: int = -1  # -1 = unbounded


@dataclass
class Capture(Node):
    name: str = ""
    clause: Node = None


@dataclass
class Tag(Node):
    name: str = ""
    attrs: dict = field(default_factory=dict)
    edge: str = "full"  # "full" (<s/>), "start" (<s>), "end" (</s>)


@dataclass
class PosFilter(Node):
    producer: Node = None
    filter: Node = None
    op: str = "within"  # within | containing
    invert: bool = False
    # edge adjustments for internalized neighbors (reference
    # SpanQueryPositionFilter leftAdjust/rightAdjust via
    # ClauseCombinerInternalisation.java:11): the positional test
    # applies to (start+ladj, end+radj) of the producer hit
    ladj: int = 0
    radj: int = 0


@dataclass
class Constrained(Node):
    clause: Node = None
    constraint: "CExpr" = None


@dataclass
class FISeq(Node):
    """Forced forward-index sequence strategy: `_FI1(a, b)` matches `a`
    via the forward index from `b`'s start (backward), `_FI2(a, b)`
    matches `b` via the forward index from `a`'s end (forward)
    (reference cql.jj queryFunctionCall,
    TextPatternQueryFunction.java:38-61)."""
    left: Node = None
    right: Node = None
    fi_clause: int = 2  # which arg runs on the forward index (1 or 2)


# constraint expression tree (reference search/matchfilter/MatchFilter*.java)
@dataclass
class CExpr:
    pass


@dataclass
class CCompare(CExpr):
    left: "CVal" = None
    right: "CVal" = None
    op: str = "="  # = or !=


@dataclass
class CBool(CExpr):
    op: str = "&"  # & | !
    clauses: list = field(default_factory=list)


@dataclass
class CVal:
    """capture.annotation access or string literal."""
    capture: str | None = None
    annotation: str = "word"
    literal: str | None = None


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s+
  | (?P<quoted>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<dcolon>::)
  | (?P<ctag></[a-zA-Z_][\w-]*\s*>)
  | (?P<num>\d+)
  | (?P<name>[a-zA-Z_][\w-]*)
  | (?P<op>!=|->|[\[\]()|&!*+?{},=:<>/.])
    """,
    re.VERBOSE,
)


def _lex(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ValueError(f"CQL lex error at {i}: {s[i:i+20]!r}")
        i = m.end()
        for kind in ("quoted", "dcolon", "ctag", "num", "name", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


def _unquote(q: str) -> str:
    """Unescape ONLY quote/backslash escapes; regex escapes like \\d or
    \\. pass through to the regex engine (the reference hands the quoted
    value to Lucene RegExp with its escapes intact)."""
    body = q[1:-1]
    return re.sub(r"\\([\"'\\])", r"\1", body)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], default_annotation: str = "word"):
        self.toks = tokens
        self.i = 0
        self.default_annotation = default_annotation

    # -- token helpers ------------------------------------------------------
    def peek(self, k: int = 0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, value: str):
        kind, v = self.next()
        if v != value:
            raise ValueError(f"CQL parse error: expected {value!r}, got {v!r}")
        return v

    def at(self, value: str) -> bool:
        return self.peek()[1] == value

    # -- grammar ------------------------------------------------------------
    def parse_query(self) -> Node:
        node = self.parse_within()
        if self.peek()[0] == "dcolon":
            self.next()
            expr = self.parse_cexpr()
            node = Constrained(clause=node, constraint=expr)
        if self.peek()[0] != "eof":
            raise ValueError(f"CQL parse error: trailing input {self.peek()[1]!r}")
        return node

    def parse_within(self) -> Node:
        node = self.parse_or()
        while self.peek()[1] in ("within", "containing") or (
            self.at("!") and self.peek(1)[1] in ("within", "containing")
        ):
            invert = False
            if self.at("!"):
                self.next()
                invert = True
            op = self.next()[1]
            rhs = self.parse_or()
            node = PosFilter(producer=node, filter=rhs, op=op, invert=invert)
        return node

    def parse_or(self) -> Node:
        """Span-level `|` and `&` between sequences — one right-
        recursive level like the reference (cql.jj:215 simpleQuery:
        `sequence [boolOp simpleQuery]`), so `a | b & c` groups as
        Or(a, And(b, c)) and `a & b | c` as And(a, Or(b, c)).
        Implemented ITERATIVELY (collect operands, fold from the
        right) so a machine-built 10k-branch OR chain parses without
        recursion-depth limits; same-operator runs flatten into one
        node."""
        items = [self.parse_sequence()]
        ops: list[str] = []
        while self.at("|") or self.at("&"):
            ops.append(self.next()[1])
            items.append(self.parse_sequence())
        node = items[-1]
        for op, item in zip(reversed(ops), reversed(items[:-1])):
            if op == "|":
                rest = node.clauses if isinstance(node, Or) else [node]
                node = Or(clauses=[item] + rest)
            else:
                rest = node.clauses if isinstance(node, SpanAnd) else [node]
                node = SpanAnd(clauses=[item] + rest)
        return node

    def parse_sequence(self) -> Node:
        parts = []
        while True:
            kind, v = self.peek()
            if kind == "eof" or v in (
                "|", "&", ")", ",", "within", "containing"
            ) or kind in ("dcolon",):
                break
            if v == "!" and self.peek(1)[1] in ("within", "containing"):
                break
            parts.append(self.parse_repeatable())
        if not parts:
            raise ValueError("CQL parse error: empty sequence")
        return parts[0] if len(parts) == 1 else Seq(parts=parts)

    def parse_repeatable(self) -> Node:
        node = self.parse_atom()
        while True:
            kind, v = self.peek()
            if v == "*":
                self.next()
                node = Repeat(clause=node, rmin=0, rmax=-1)
            elif v == "+":
                self.next()
                node = Repeat(clause=node, rmin=1, rmax=-1)
            elif v == "?":
                self.next()
                node = Repeat(clause=node, rmin=0, rmax=1)
            elif v == "{":
                self.next()
                rmin = int(self.next()[1])
                rmax = rmin
                if self.at(","):
                    self.next()
                    rmax = -1
                    if self.peek()[0] == "num":
                        rmax = int(self.next()[1])
                self.expect("}")
                node = Repeat(clause=node, rmin=rmin, rmax=rmax)
            else:
                break
        return node

    def parse_atom(self) -> Node:
        kind, v = self.peek()
        # query function: _NAME(q, q) (reference cql.jj queryFunctionCall;
        # names must start with '_')
        if kind == "name" and v.startswith("_") and self.peek(1)[1] == "(":
            fname = self.next()[1]
            self.expect("(")
            args = [self.parse_within()]
            while self.at(","):
                self.next()
                args.append(self.parse_within())
            self.expect(")")
            if fname not in ("_FI1", "_FI2"):
                raise ValueError(f"Supported query functions: _FI1, _FI2 (got {fname})")
            if len(args) != 2:
                raise ValueError("Query function must get two arguments!")
            return FISeq(
                left=args[0], right=args[1], fi_clause=1 if fname == "_FI1" else 2
            )
        # capture label: name ':' atom
        if kind == "name" and self.peek(1)[1] == ":" and v not in (
            "within",
            "containing",
        ):
            name = self.next()[1]
            self.expect(":")
            return Capture(name=name, clause=self.parse_atom())
        if kind == "quoted":
            self.next()
            return self._quoted_to_node(v, self.default_annotation)
        if v == "[":
            self.next()
            if self.at("]"):
                self.next()
                return AnyToken()
            expr = self.parse_token_expr()
            self.expect("]")
            return expr
        if v == "(":
            self.next()
            node = self.parse_within()
            self.expect(")")
            return node
        if v == "<":
            return self.parse_tag()
        if kind == "ctag":
            self.next()
            return Tag(name=v[2:-1].strip(), edge="end")
        if v == "!":
            self.next()
            inner = self.parse_atom()
            return TokenAnd(clauses=[("not", inner)])
        raise ValueError(f"CQL parse error: unexpected {v!r}")

    def parse_tag(self) -> Node:
        self.expect("<")
        if self.at("/"):  # </s>
            self.next()
            name = self.next()[1]
            self.expect(">")
            return Tag(name=name, edge="end")
        name = self.next()[1]
        attrs = {}
        while self.peek()[0] in ("name",):
            aname = self.next()[1]
            self.expect("=")
            aval = _unquote(self.next()[1])
            attrs[aname] = aval
        if self.at("/"):
            self.next()
            self.expect(">")
            return Tag(name=name, attrs=attrs, edge="full")
        self.expect(">")
        return Tag(name=name, attrs=attrs, edge="start")

    # token-level boolean expression inside [ ]
    def parse_token_expr(self) -> Node:
        node = self.parse_token_and()
        while self.at("|"):
            self.next()
            rhs = self.parse_token_and()
            if isinstance(node, TokenOr):
                node.clauses.append(rhs)
            else:
                node = TokenOr(clauses=[node, rhs])
        return node

    def parse_token_and(self) -> Node:
        node = self.parse_token_clause()
        clauses = [("and", node)]
        while self.at("&"):
            self.next()
            neg = False
            if self.at("!"):
                self.next()
                neg = True
            rhs = self.parse_token_clause()
            clauses.append(("not" if neg else "and", rhs))
        if len(clauses) == 1:
            return node
        return TokenAnd(clauses=clauses)

    def parse_token_clause(self) -> Node:
        if self.at("("):
            self.next()
            node = self.parse_token_expr()
            self.expect(")")
            return node
        if self.at("!"):
            self.next()
            inner = self.parse_token_clause()
            return TokenAnd(clauses=[("not", inner)])
        kind, v = self.peek()
        if kind == "name":
            ann = self.next()[1]
            # subannotation access `pos.head` (reference cql.jj
            # propName: NAME ("." NAME)?, indexed as a separate field
            # per AnnotatedFieldNameUtil subannotation naming) — our
            # flattened sidecar name is parent_sub
            while self.at("."):
                self.next()
                nk, nv = self.next()
                if nk != "name":
                    raise ValueError(
                        f"CQL parse error: expected subannotation name, got {nv!r}"
                    )
                ann = f"{ann}_{nv}"
            op = self.next()[1]
            if op not in ("=", "!="):
                raise ValueError(f"CQL parse error: bad token op {op!r}")
            val = self.next()
            if val[0] != "quoted":
                raise ValueError("CQL parse error: annotation value must be quoted")
            node = self._quoted_to_node(val[1], ann)
            if op == "!=":
                node.negate = True
            return node
        if kind == "quoted":  # bare value = default annotation
            self.next()
            return self._quoted_to_node(v, self.default_annotation)
        raise ValueError(f"CQL parse error: unexpected {v!r} in token expression")

    def _quoted_to_node(self, quoted: str, annotation: str) -> Node:
        value = _unquote(quoted)
        sensitive = False
        # sensitivity flags (reference TextPatternRegex.java:62-117)
        if value.startswith("(?-i)") or value.startswith("(?c)"):
            sensitive = True
            value = value.split(")", 1)[1]
        elif value.startswith("(?i)"):
            value = value[4:]
        # multi-word quoted phrase -> sequence of terms
        if annotation == self.default_annotation and " " in value.strip() and not any(
            ch in value for ch in "()[]{}|?*+\\"
        ):
            parts = [
                TermNode(annotation=annotation, value=w, sensitive=sensitive)
                for w in value.split()
            ]
            return Seq(parts=parts)
        return TermNode(annotation=annotation, value=value, sensitive=sensitive)

    # -- global constraint expression ----------------------------------------
    def parse_cexpr(self) -> CExpr:
        node = self.parse_cor()
        if self.at("->"):
            # implication, lowest precedence, right-assoc (reference
            # MatchFilterImplication.java: !a truthy -> true, else b)
            self.next()
            return CBool(op="->", clauses=[node, self.parse_cexpr()])
        return node

    def parse_cor(self) -> CExpr:
        node = self.parse_cand()
        while self.at("|"):
            self.next()
            rhs = self.parse_cand()
            node = CBool(op="|", clauses=[node, rhs])
        return node

    def parse_cand(self) -> CExpr:
        node = self.parse_ccompare()
        while self.at("&"):
            self.next()
            rhs = self.parse_ccompare()
            node = CBool(op="&", clauses=[node, rhs])
        return node

    def parse_ccompare(self) -> CExpr:
        if self.at("!"):
            self.next()
            return CBool(op="!", clauses=[self.parse_ccompare()])
        if self.at("("):
            self.next()
            node = self.parse_cexpr()
            self.expect(")")
            return node
        left = self.parse_cval()
        if not (self.at("=") or self.at("!=")):
            # bare capture = "did the group match" truthiness test
            # (reference MatchFilterTokenAnnotation.java:65-68 returns
            # undefined for an unmatched group, which is not truthy)
            if left.capture is None:
                raise ValueError(
                    "CQL parse error: bare string literal in constraint "
                    "(expected capture name or comparison)"
                )
            return CCompare(left=left, right=None, op="defined")
        op = self.next()[1]
        right = self.parse_cval()
        return CCompare(left=left, right=right, op=op)

    def parse_cval(self) -> CVal:
        kind, v = self.peek()
        if kind == "quoted":
            self.next()
            return CVal(literal=_unquote(v))
        cap = self.next()[1]
        ann = "word"
        if self.at("."):
            self.next()
            ann = self.next()[1]
        return CVal(capture=cap, annotation=ann)


_REGEX_META = set(".?*+|(){}[]\\^$")


def is_plain_term(value: str) -> bool:
    """Regex of only letters/digits -> plain term lookup
    (reference TextPatternRegex.java:62-117 simplification)."""
    return not any(c in _REGEX_META for c in value)


def parse(cql: str, default_annotation: str = "word") -> Node:
    return _Parser(_lex(cql), default_annotation).parse_query()
