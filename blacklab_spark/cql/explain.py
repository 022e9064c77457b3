"""Query explain surface — the analogue of the reference's `explain`
endpoint (reference server/.../RequestHandlerExplain.java: shows the
original pattern, the rewritten BLSpanQuery, and the chosen strategy).

explain() renders three layers:
  1. the parsed AST,
  2. the planner rewrites that will fire (empty-alternatives,
     any-token folding, regex->term),
  3. the Spark physical plan of the translated DataFrame
     (`df.explain` formatted string) so pushdown/codegen are auditable.
"""

from __future__ import annotations

from blacklab_spark.cql import parser as P


def _render(node, indent: int = 0) -> list[str]:
    pad = "  " * indent
    t = type(node).__name__
    if isinstance(node, P.TermNode):
        op = "!=" if node.negate else "="
        sens = " (sensitive)" if node.sensitive else ""
        kind = "TERM" if P.is_plain_term(node.value) else "REGEX"
        return [f"{pad}{kind} {node.annotation}{op}{node.value!r}{sens}"]
    if isinstance(node, P.AnyToken):
        return [f"{pad}ANYTOKEN []"]
    if isinstance(node, P.Seq):
        out = [f"{pad}SEQUENCE"]
        for p in node.parts:
            out += _render(p, indent + 1)
        return out
    if isinstance(node, P.Or):
        out = [f"{pad}OR"]
        for p in node.clauses:
            out += _render(p, indent + 1)
        return out
    if isinstance(node, P.TokenAnd):
        out = [f"{pad}TOKEN-AND"]
        for kind, c in node.clauses:
            out += [f"{'  ' * (indent + 1)}[{kind}]"] + _render(c, indent + 2)
        return out
    if isinstance(node, P.TokenOr):
        out = [f"{pad}TOKEN-OR"]
        for c in node.clauses:
            out += _render(c, indent + 1)
        return out
    if isinstance(node, P.SpanAnd):
        out = [f"{pad}SPAN-AND"]
        for c in node.clauses:
            out += _render(c, indent + 1)
        return out
    if isinstance(node, P.Repeat):
        rmax = "inf" if node.rmax < 0 else node.rmax
        out = [f"{pad}REPEAT{{{node.rmin},{rmax}}}"]
        return out + _render(node.clause, indent + 1)
    if isinstance(node, P.Capture):
        return [f"{pad}CAPTURE {node.name}:"] + _render(node.clause, indent + 1)
    if isinstance(node, P.Tag):
        return [f"{pad}TAG <{node.name}> edge={node.edge} attrs={node.attrs}"]
    if isinstance(node, P.PosFilter):
        inv = "NOT-" if node.invert else ""
        adj = f" adj=({node.ladj},{node.radj})" if (node.ladj or node.radj) else ""
        out = [f"{pad}{inv}{node.op.upper()}{adj}"]
        out += [f"{'  ' * (indent + 1)}producer:"] + _render(node.producer, indent + 2)
        out += [f"{'  ' * (indent + 1)}filter:"] + _render(node.filter, indent + 2)
        return out
    if isinstance(node, P.Constrained):
        out = [f"{pad}CONSTRAINED ::"] + _render(node.clause, indent + 1)
        out.append(f"{'  ' * (indent + 1)}constraint: {node.constraint}")
        return out
    if isinstance(node, P.FISeq):
        direction = "left (FI=1st clause)" if node.fi_clause == 1 else "right (FI=2nd clause)"
        out = [f"{pad}FISEQ probe {direction}"]
        out += _render(node.left, indent + 1)
        out += _render(node.right, indent + 1)
        return out
    return [f"{pad}{t}"]


def _rewrites(node) -> list[str]:
    """Which planner rewrites fire for this AST (reference
    optimize/ClauseCombiner*.java names kept for parity)."""
    from blacklab_spark.cql.engine import _anytoken_bounds, _matches_empty

    notes: list[str] = []

    def walk(n):
        if isinstance(n, P.Seq):
            from blacklab_spark.cql.engine import _rewrite_matching_tags

            if _rewrite_matching_tags(list(n.parts)) != list(n.parts):
                notes.append(
                    "bracketing tags -> position filter "
                    "(SpanQuerySequence.findMatchingTags)"
                )
            if any(_matches_empty(p) for p in n.parts):
                notes.append(
                    "empty-sequence alternatives (SpanQuerySequence.makeAlternatives)"
                )
            if any(_anytoken_bounds(p) is not None for p in n.parts):
                notes.append("any-token -> expansion (ClauseCombinerAnyExpansion)")
            from blacklab_spark.cql.engine import _internalize

            if _internalize(list(n.parts)) != list(n.parts):
                notes.append(
                    "fixed-length neighbor internalized into position "
                    "filter (ClauseCombinerInternalisation)"
                )
            for p in n.parts:
                walk(p)
        elif isinstance(n, P.TermNode):
            if not P.is_plain_term(n.value):
                notes.append(f"regex scan via terms dict: {n.value!r}")
            else:
                notes.append(f"plain-term fast path: {n.value!r} (TextPatternRegex)")
        elif isinstance(n, (P.Or, P.TokenOr)):
            for c in n.clauses:
                walk(c)
        elif isinstance(n, P.TokenAnd):
            for _, c in n.clauses:
                walk(c)
        elif isinstance(n, P.Repeat):
            walk(n.clause)
        elif isinstance(n, P.Capture):
            walk(n.clause)
        elif isinstance(n, P.PosFilter):
            walk(n.producer)
            walk(n.filter)
        elif isinstance(n, P.Constrained):
            walk(n.clause)
            notes.append("constraint compiled to forward-index element_at() columns")

    walk(node)
    # stable unique
    seen, out = set(), []
    for x in notes:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def explain(corpus, cql: str, physical: bool = False) -> str:
    ast = P.parse(cql)
    lines = [f"pattern: {cql}", "", "AST:"]
    lines += _render(ast, 1)
    lines += ["", "rewrites:"]
    lines += [f"  - {n}" for n in _rewrites(ast)]
    if physical:
        from blacklab_spark.cql.engine import translate

        df = translate(corpus, ast)
        lines += ["", "spark plan:", df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )]
    return "\n".join(lines)
