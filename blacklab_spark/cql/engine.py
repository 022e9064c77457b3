"""CQL AST → hits-DataFrame planner/translator.

The analogue of the reference's TextPattern.translate(...) →
BLSpanQuery tree → optimize/rewrite passes (reference
text-pattern/.../TextPattern.java:36, BLSpanQuery.java:151-156,
optimize/ClauseCombiner*.java). Our rewrites, applied while walking
the AST:

- sequence flattening (reference SpanQuerySequence.java:71-83);
- empty-sequence alternatives: `A B?` → `A | A B`
  (reference SpanQuerySequence.makeAlternatives:364-385);
- any-token folding: `[] A` / `A []{1,3}` become Expansion(A), never a
  full token scan (reference ClauseCombinerAnyExpansion.java:16);
- regex → plain-term fast path (reference TextPatternRegex.java:62-117);
- global constraints compiled to Column expressions over forward-index
  lookups (reference SpanQueryConstrained.java:174).

Every produced operator is a DataFrame combinator from
blacklab_spark.search.spans; Catalyst handles the physical planning.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import Column, DataFrame, functions as F

from blacklab_spark.cql import parser as P
from blacklab_spark.search import spans as S
from blacklab_spark.search.results import Hits

_REP_CAP = 64  # hard bound for unbounded repetition at test scale


def find(corpus, cql: str) -> Hits:
    ast = P.parse(cql)
    return Hits(corpus, translate(corpus, ast))


# ---------------------------------------------------------------------------
# rewrites
# ---------------------------------------------------------------------------

def _flatten_seq(parts: list) -> list:
    out = []
    for p in parts:
        if isinstance(p, P.Seq):
            out.extend(_flatten_seq(p.parts))
        else:
            out.append(p)
    return out


def _matches_empty(node) -> bool:
    if isinstance(node, P.Repeat):
        return node.rmin == 0
    if isinstance(node, P.Seq):
        return all(_matches_empty(p) for p in node.parts)
    if isinstance(node, P.Capture):
        return _matches_empty(node.clause)
    if isinstance(node, P.Or):
        return any(_matches_empty(c) for c in node.clauses)
    return False


def _no_empty(node):
    """The ≥1-repetition variant of a may-match-empty node
    (reference BLSpanQuery.noEmpty contract, BLSpanQuery.java:162-186)."""
    if isinstance(node, P.Repeat) and node.rmin == 0:
        return replace(node, rmin=1)
    return node


def _seq_alternatives(parts: list) -> list[list]:
    """Expand optional parts into explicit alternatives:
    [A, B?] -> [[A], [A, B]] (cross product, reference
    SpanQuerySequence.makeAlternatives:364-385)."""
    alts: list[list] = [[]]
    for p in parts:
        if _matches_empty(p):
            ne = _no_empty(p)
            alts = [a + [] for a in alts] + [a + [ne] for a in alts]
        else:
            alts = [a + [p] for a in alts]
    # drop the fully-empty alternative (matches ε — not a hit)
    return [a for a in alts if a]


def _anytoken_bounds(node) -> tuple[int, int] | None:
    """(min,max) if node is pure any-token filler ([], []{n,m}); else None."""
    if isinstance(node, P.AnyToken):
        return (1, 1)
    if isinstance(node, P.Repeat) and isinstance(node.clause, P.AnyToken):
        rmax = node.rmax if node.rmax >= 0 else _REP_CAP
        return (node.rmin, rmax)
    return None


# ---------------------------------------------------------------------------
# translation
# ---------------------------------------------------------------------------

def translate(corpus, node) -> DataFrame:
    if isinstance(node, P.TermNode):
        return _term(corpus, node)
    if isinstance(node, P.AnyToken):
        return S.any_token(corpus, 1, 1)
    if isinstance(node, P.FISeq):
        return _fi_seq(corpus, node)
    if isinstance(node, P.TokenAnd):
        return _token_and(corpus, node)
    if isinstance(node, P.TokenOr):
        dfs = [translate(corpus, c) for c in node.clauses]
        out = dfs[0]
        for d in dfs[1:]:
            out = S.union(out, d)
        return out
    if isinstance(node, P.Or):
        dfs = [translate(corpus, c) for c in node.clauses]
        out = dfs[0]
        for d in dfs[1:]:
            out = S.union(out, d)
        return out
    if isinstance(node, P.Seq):
        return _sequence(corpus, _flatten_seq(node.parts))
    if isinstance(node, P.Repeat):
        rmin = max(1, node.rmin)  # standalone X* ≡ X+ (ε hits dropped)
        rmax = node.rmax if node.rmax >= 0 else -1
        inner = translate(corpus, node.clause)
        if rmin == 1 and node.rmax == 1:
            return inner
        return S.repetition(inner, rmin, rmax, hard_cap=_REP_CAP)
    if isinstance(node, P.Capture):
        return S.capture(translate(corpus, node.clause), node.name)
    if isinstance(node, P.Tag):
        spans = S.tag_spans(corpus, node.name, node.attrs or None)
        if node.edge == "start":
            return S.edge(spans, right=False)
        if node.edge == "end":
            return S.edge(spans, right=True)
        return spans
    if isinstance(node, P.PosFilter):
        prod = translate(corpus, node.producer)
        filt = translate(corpus, node.filter)
        return S.position_filter(prod, filt, node.op, invert=node.invert)
    if isinstance(node, P.Constrained):
        hits = translate(corpus, node.clause)
        return _constrained(corpus, hits, node.constraint)
    raise TypeError(f"cannot translate {type(node).__name__}")


def _term(corpus, node: P.TermNode) -> DataFrame:
    if node.negate:
        return S.token_not(corpus, _term(corpus, replace(node, negate=False)))
    if P.is_plain_term(node.value):
        return S.term_hits(
            corpus, node.value, annotation=node.annotation, sensitive=node.sensitive
        )
    return S.regex_hits(
        corpus, node.value, annotation=node.annotation, sensitive=node.sensitive
    )


def _token_and(corpus, node: P.TokenAnd) -> DataFrame:
    pos, neg = [], []
    for kind, clause in node.clauses:
        # inner negation on a term clause (word!="x")
        if isinstance(clause, P.TermNode) and clause.negate:
            clause = replace(clause, negate=False)
            kind = "not" if kind == "and" else "and"
        (pos if kind == "and" else neg).append(clause)
    if pos:
        out = translate(corpus, pos[0])
        for c in pos[1:]:
            out = S.and_spans(out, translate(corpus, c))
    else:
        out = S.any_token(corpus, 1, 1)
    for c in neg:
        out = S.and_not(out, translate(corpus, c))
    return out


def _sequence(corpus, parts: list) -> DataFrame:
    alts = _seq_alternatives(parts)
    dfs = [_sequence_one(corpus, a) for a in alts]
    out = dfs[0]
    for d in dfs[1:]:
        out = S.union(out, d)
    if len(dfs) > 1:
        out = S.unique(out)
    return out


def _plain_term(part) -> str | None:
    """The insensitive plain-term value of a part, or None."""
    if (
        isinstance(part, P.TermNode)
        and not part.negate
        and not part.sensitive
        and part.annotation in ("word", "")
        and P.is_plain_term(part.value)
    ):
        from blacklab_spark.analysis import desensitize_py

        return desensitize_py(part.value)
    return None


def _invertible_neg(part) -> P.TermNode | None:
    """A negated plain-term part eligible for NOTCONTAINING inversion
    inside a sequence (reference ClauseCombinerNot.java:14-56;
    BLSpanQuery.okayToInvertForOptimization:205 — cheap negations get
    rewritten so the corpus-wide any-token complement is never built)."""
    if (
        isinstance(part, P.TermNode)
        and part.negate
        and not part.sensitive
        and P.is_plain_term(part.value)
    ):
        return part
    return None


def _probe_target(part) -> tuple[str, str] | None:
    """(annotation, value) when the part can be matched by a
    forward-index neighbor probe (any single-valued plain-term clause,
    word or sidecar annotation)."""
    if (
        isinstance(part, P.TermNode)
        and not part.negate
        and not part.sensitive
        and P.is_plain_term(part.value)
    ):
        from blacklab_spark.analysis import desensitize_py

        return (part.annotation or "word", desensitize_py(part.value))
    return None


def _fi_seq(corpus, node: P.FISeq) -> DataFrame:
    """Forced forward-index strategy (reference
    TextPatternQueryFunction.java:38-61 → SpanQueryFiSeq): _FI1 anchors
    on the RIGHT clause and probes the left backward over the token
    arrays; _FI2 anchors LEFT and probes right. Falls back to the
    adjacency join when the FI clause is not a plain term (our probe
    is single-token; the reference walks an NFA)."""
    if node.fi_clause == 1:
        tgt = _probe_target(node.left)
        if tgt is not None:
            anchor = translate(corpus, node.right)
            return S.probe_neighbor(corpus, anchor, tgt[1], "left", annotation=tgt[0])
    else:
        tgt = _probe_target(node.right)
        if tgt is not None:
            anchor = translate(corpus, node.left)
            return S.probe_neighbor(corpus, anchor, tgt[1], "right", annotation=tgt[0])
    return _sequence(corpus, [node.left, node.right])


def _seq_term_dfs(corpus, parts: list) -> dict[str, int]:
    """Driver-side df lookup for the sequence's plain terms (one tiny
    filtered scan of the terms dict) — the planner's cost model input,
    like the reference's term-frequency cost source
    (BLSpanQuery.reverseMatchingCost via ClauseCombinerNfa.java:144-282)."""
    terms = {t for t in (_plain_term(p) for p in parts) if t is not None}
    if not terms:
        return {}
    rows = (
        corpus.terms.filter(F.col("term").isin(list(terms)))
        .select("term", "df")
        .collect()
    )
    return {r["term"]: int(r["df"]) for r in rows}


def _sequence_one(corpus, parts: list) -> DataFrame:
    """One alternative with no empty-matching parts: left-to-right
    adjacency joins, folding [] fillers into expansions.

    Cost-based forward-index strategy (reference ClauseCombinerNfa):
    an adjacent plain term whose df dwarfs the running df estimate is
    matched by probing the token arrays from the anchor hits
    (S.probe_neighbor) instead of joining its position list; a frequent
    LEADING term is deferred so the rare right neighbor anchors a
    backward probe."""
    ratio = corpus.cfg.fi_probe_ratio
    dfs = _seq_term_dfs(corpus, parts) if ratio else {}

    current: DataFrame | None = None
    cur_df: int | None = None  # df estimate (min term df so far)
    pending_left_probe: str | None = None  # frequent leading term deferred
    pending_gap: tuple[int, int] | None = None  # leading/infix [] bounds
    pending_neg_lefts: list[DataFrame] = []  # leading [!x] parts deferred

    for i, part in enumerate(parts):
        at = _anytoken_bounds(part)
        if at is not None:
            pending_gap = (
                at
                if pending_gap is None
                else (pending_gap[0] + at[0], pending_gap[1] + at[1])
            )
            continue
        neg = _invertible_neg(part)
        if neg is not None and pending_gap is None and pending_left_probe is None:
            # ClauseCombinerNot inversion: never materialize [!x] as an
            # any-token anti-join inside a sequence
            x_hits = translate(corpus, replace(neg, negate=False))
            if current is None:
                pending_neg_lefts.append(x_hits)
            else:
                current = S.not_token_right(current, corpus, x_hits)
                cur_df = None
            continue
        term = _plain_term(part)
        df_t = dfs.get(term) if term is not None else None

        if current is None:
            # frequent leading term directly followed by a rarer plain
            # term: defer it and probe backward from the rare anchor
            if (
                term is not None
                and df_t is not None
                and pending_gap is None
                and pending_left_probe is None
                and i + 1 < len(parts)
            ):
                nxt = _plain_term(parts[i + 1])
                df_n = dfs.get(nxt) if nxt is not None else None
                if df_n is not None and df_t >= ratio * max(df_n, 1):
                    pending_left_probe = term
                    continue
            t = translate(corpus, part)
            if pending_gap is not None:
                # leading []s: expand first clause left
                t = S.expand(t, corpus, "left", pending_gap[0], pending_gap[1])
            current = t
            cur_df = df_t
            if pending_left_probe is not None:
                current = S.probe_neighbor(
                    corpus, current, pending_left_probe, "left"
                )
                pending_left_probe = None
            if pending_neg_lefts:
                for x_hits in reversed(pending_neg_lefts):
                    current = S.not_token_left(current, corpus, x_hits)
                pending_neg_lefts = []
        elif pending_gap is not None:
            gmin, gmax = pending_gap
            current = S.sequence_with_gap(current, translate(corpus, part), gmin, gmax)
            cur_df = None
        elif (
            term is not None
            and df_t is not None
            and cur_df is not None
            and df_t >= ratio * max(cur_df, 1)
        ):
            current = S.probe_neighbor(corpus, current, term, "right")
        else:
            current = S.sequence(current, translate(corpus, part))
            if df_t is not None:
                cur_df = df_t if cur_df is None else min(cur_df, df_t)
        pending_gap = None

    if pending_left_probe is not None:
        # the deferred frequent term turned out to be the only part
        current = translate(
            corpus, P.TermNode("word", pending_left_probe)
        ) if current is None else S.probe_neighbor(
            corpus, current, pending_left_probe, "left"
        )

    if current is None and pending_gap is not None:
        # pure any-token sequence: [] []{1,2} -> n-grams
        gmin, gmax = pending_gap
        current = S.any_token(corpus, gmin, gmax)
        pending_gap = None
    if pending_neg_lefts:
        if current is None:
            # only negated terms: ONE any-token complement for the last,
            # the rest invert onto it
            current = S.token_not(corpus, pending_neg_lefts.pop())
        for x_hits in reversed(pending_neg_lefts):
            current = S.not_token_left(current, corpus, x_hits)
    if pending_gap is not None:
        # trailing []s: expand right
        current = S.expand(current, corpus, "right", pending_gap[0], pending_gap[1])
    return current


# ---------------------------------------------------------------------------
# global constraints
# ---------------------------------------------------------------------------

def _cexpr_captures(expr) -> set[tuple[str, str]]:
    if isinstance(expr, P.CCompare):
        out = set()
        for v in (expr.left, expr.right):
            if v.capture is not None:
                out.add((v.capture, v.annotation or "word"))
        return out
    if isinstance(expr, P.CBool):
        out = set()
        for c in expr.clauses:
            out |= _cexpr_captures(c)
        return out
    return set()


def _constrained(corpus, hits: DataFrame, expr) -> DataFrame:
    """Compile a MatchFilter expression to Column predicates over
    element_at() forward-index lookups (reference MatchFilter.java:41,
    SpansConstrained.java:190) — a single doc_id equi-join, zero Python."""
    needed = _cexpr_captures(expr)
    anns = sorted({a for _, a in needed})
    cols = ["doc_id"]
    for a in anns:
        src = "tokens_i" if a in ("word", "") else f"ann_{a}"
        cols.append(F.col(src).alias(f"_toks_{a}"))
    tk = corpus.tokenized.select(*cols)
    joined = hits.join(tk, "doc_id")

    from blacklab_spark.analysis import desensitize_col, desensitize_py

    env: dict[tuple[str, str], Column] = {}
    for cap, ann in needed:
        elem = F.element_at(F.col(f"_toks_{ann}"), F.col(f"cap_{cap}_start") + 1)
        # tokens_i is already fully desensitized; sidecar values fold here
        env[(cap, ann)] = (
            elem if ann in ("word", "") else desensitize_col(elem, "i")
        )

    def val(v: P.CVal) -> Column:
        if v.literal is not None:
            return F.lit(desensitize_py(v.literal))
        return env[(v.capture, v.annotation or "word")]

    def compile_expr(e) -> Column:
        if isinstance(e, P.CCompare):
            c = val(e.left) == val(e.right)
            return c if e.op == "=" else ~c
        if isinstance(e, P.CBool):
            if e.op == "!":
                return ~compile_expr(e.clauses[0])
            parts = [compile_expr(c) for c in e.clauses]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if e.op == "&" else (out | p)
            return out
        raise TypeError(type(e).__name__)

    drop = [f"_toks_{a}" for a in anns]
    return joined.filter(compile_expr(expr)).drop(*drop)
