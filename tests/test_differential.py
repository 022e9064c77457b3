"""Randomized differential testing of the CQL span algebra.

A naive pure-Python interpreter of the parsed AST (quadratic, obviously
correct) is the oracle; every generated query must return EXACTLY the
same (doc, start, end) set from the engine under BOTH planner modes —
forward-index probing forced (fi_probe_ratio=1.01) and disabled (0.0).
This differentially tests the cost-based planner rewrites (gap folding,
NOT inversion, probe walks, repetition kernel, alternative expansion)
against each other and against the reference semantics
(reference SpanQuerySequence/SpanQueryRepetition/SpanQueryNot contracts).

Vocabulary is plain lowercase ASCII so tokenization/folding is identity
— the analysis chain has its own tests; this file targets the algebra.
"""

from __future__ import annotations

import dataclasses
import random
import re

import pandas as pd
import pytest

from blacklab_spark.config import EngineConfig
from blacklab_spark.corpus import Corpus
from blacklab_spark.cql import parser as P

VOCAB = ["aa", "ab", "ba", "bb", "cc"]
REGEXES = ["a.", ".b", "aa|cc", "[ab]+"]
MAXLEN = 12
SEED = 20260817
N_QUERIES = 45


# ---------------------------------------------------------------------------
# naive interpreter: AST -> set[(doc, start, end)] (may contain zero-length
# spans mid-computation; the top level drops them, mirroring the engine's
# epsilon-hit contract)
# ---------------------------------------------------------------------------

def _tok_positions(doc: list[str], node: P.TermNode) -> set[tuple[int, int]]:
    if P.is_plain_term(node.value):
        m = [t == node.value for t in doc]
    else:
        rx = re.compile(f"(?:{node.value})", re.I)
        m = [rx.fullmatch(t) is not None for t in doc]
    if node.negate:
        m = [not x for x in m]
    return {(i, i + 1) for i, x in enumerate(m) if x}


def naive_spans(docs: list[list[str]], node) -> set[tuple[int, int, int]]:
    if isinstance(node, P.TermNode):
        return {
            (d, s, e) for d, doc in enumerate(docs) for s, e in _tok_positions(doc, node)
        }
    if isinstance(node, P.AnyToken):
        return {(d, i, i + 1) for d, doc in enumerate(docs) for i in range(len(doc))}
    if isinstance(node, (P.TokenOr, P.Or)):
        out: set = set()
        for c in node.clauses:
            out |= naive_spans(docs, c)
        return out
    if isinstance(node, P.Capture):
        return naive_spans(docs, node.clause)
    if isinstance(node, P.Seq):
        cur: set | None = None
        for part in node.parts:
            nxt = naive_spans(docs, part)
            if _may_be_empty(part):
                nxt |= {(d, i, i) for d, doc in enumerate(docs) for i in range(len(doc) + 1)}
            if cur is None:
                cur = nxt
            else:
                by_start: dict = {}
                for d, s, e in nxt:
                    by_start.setdefault((d, s), []).append(e)
                cur = {
                    (d, s, e2)
                    for d, s, e in cur
                    for e2 in by_start.get((d, e), [])
                }
        return cur or set()
    if isinstance(node, P.SpanAnd):
        # reference TextPatternAnd: positives intersect on identical
        # spans; a negated clause subtracts exact spans (the
        # AND(a, NOT(b)) -> POSFILTER(a, b, NOTMATCHES) rewrite)
        pos_sets, neg_sets = [], []
        for c in node.clauses:
            if isinstance(c, P.TermNode) and c.negate:
                neg_sets.append(
                    naive_spans(docs, dataclasses.replace(c, negate=False))
                )
            else:
                pos_sets.append(naive_spans(docs, c))
        if pos_sets:
            cur = set.intersection(*pos_sets)
        else:
            cur = {
                (d, i, i + 1)
                for d, doc in enumerate(docs)
                for i in range(len(doc))
            }
        for ns in neg_sets:
            cur -= ns
        return cur
    if isinstance(node, P.PosFilter):
        # reference SpanQueryPositionFilter WITHIN/CONTAINS (+invert):
        # keep producer spans (not) fully inside / fully covering some
        # filter span in the same doc (SpansPositionFilter.java)
        prod = naive_spans(docs, node.producer)
        filt = naive_spans(docs, node.filter)
        if node.op == "within":
            keep = {
                (d, s, e) for (d, s, e) in prod
                if any(fd == d and fs <= s and e <= fe for (fd, fs, fe) in filt)
            }
        else:  # containing
            keep = {
                (d, s, e) for (d, s, e) in prod
                if any(fd == d and s <= fs and fe <= e for (fd, fs, fe) in filt)
            }
        return (prod - keep) if node.invert else keep
    if isinstance(node, P.Repeat):
        base = naive_spans(docs, node.clause)
        rmin, rmax = node.rmin, node.rmax
        if rmax < 0:
            rmax = MAXLEN
        out: set = set()
        if rmin == 0:
            out |= {(d, i, i) for d, doc in enumerate(docs) for i in range(len(doc) + 1)}
        level = base
        for n in range(1, rmax + 1):
            if n >= max(rmin, 1):
                out |= level
            by_start: dict = {}
            for d, s, e in base:
                by_start.setdefault((d, s), []).append(e)
            level = {
                (d, s, e2) for d, s, e in level for e2 in by_start.get((d, e), [])
            }
            if not level:
                break
        return out
    raise NotImplementedError(type(node))


def _may_be_empty(node) -> bool:
    if isinstance(node, P.Repeat):
        return node.rmin == 0 or _may_be_empty(node.clause)
    if isinstance(node, P.Seq):
        return all(_may_be_empty(p) for p in node.parts)
    if isinstance(node, (P.Or, P.TokenOr)):
        return any(_may_be_empty(c) for c in node.clauses)
    if isinstance(node, P.Capture):
        return _may_be_empty(node.clause)
    if isinstance(node, P.SpanAnd):
        return all(_may_be_empty(c) for c in node.clauses)
    if isinstance(node, P.PosFilter):
        return _may_be_empty(node.producer)
    return False


def naive_find(docs: list[list[str]], cql: str) -> list[tuple[int, int, int]]:
    node = P.parse(cql)
    return sorted((d, s, e) for d, s, e in naive_spans(docs, node) if e > s)


# ---------------------------------------------------------------------------
# random query generator (rendered to CQL strings so the parser is in the
# differential loop too)
# ---------------------------------------------------------------------------

def _gen_atom(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.55:
        return f'"{rng.choice(VOCAB)}"'
    if r < 0.70:
        return f'"{rng.choice(REGEXES)}"'
    if r < 0.82:
        return f'[word != "{rng.choice(VOCAB)}"]'
    return "[]"


def _render_bounds(rng: random.Random, allow_zero: bool) -> str:
    lo = rng.choice([0, 1, 1, 2]) if allow_zero else rng.choice([1, 1, 2])
    if rng.random() < 0.15:
        return "+" if lo >= 1 else "*"
    hi = lo + rng.choice([0, 1, 2])
    return f"{{{lo},{hi}}}" if hi > lo else f"{{{lo}}}"


def _gen(rng: random.Random, depth: int, in_seq: bool) -> str:
    if depth <= 0:
        return _gen_atom(rng)
    r = rng.random()
    if r < 0.40:
        n = rng.choice([2, 2, 3])
        return " ".join(_gen(rng, depth - 1, True) for _ in range(n))
    if r < 0.58:
        a = _gen(rng, depth - 1, False)
        b = _gen(rng, depth - 1, False)
        return f"({a} | {b})"
    if r < 0.68:
        # span-level AND (non-ε clauses by construction: atoms or a
        # 2-atom sequence intersected with an atom)
        a = _gen_atom(rng)
        b = (
            f"{_gen_atom(rng)} {_gen_atom(rng)}"
            if rng.random() < 0.4
            else _gen_atom(rng)
        )
        return f"({a} & {b})" if rng.random() < 0.5 else f"({b} & {a})"
    if r < 0.76:
        # repetition of a GROUP (possibly itself containing optional
        # parts — exercises nested ε-matching repetition rewrites)
        grp = _gen(rng, depth - 1, False)
        return f"({grp}){_render_bounds(rng, allow_zero=in_seq)}"
    if r < 0.86:
        # position filter: within/containing (+inverted) against a
        # non-ε producer and a non-ε filter span pattern
        prod = _gen(rng, depth - 1, False)
        for _ in range(4):
            if not _may_be_empty(P.parse(prod)):
                break
            prod = _gen(rng, depth - 1, False)
        else:
            prod = _gen_atom(rng)
        filt = (
            f"{_gen_atom(rng)} {_gen_atom(rng)}"
            if rng.random() < 0.5
            else f"{_gen_atom(rng)} []"
        )
        op = rng.choice(["within", "containing", "within", "containing",
                         "!within", "!containing"])
        return f"(({prod}) {op} ({filt}))"
    atom = _gen_atom(rng)
    return f"({atom}){_render_bounds(rng, allow_zero=in_seq)}"


def gen_queries(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    while len(out) < n:
        q = _gen(rng, 2, False)
        # a bare all-optional query has no non-empty top-level contract
        if re.fullmatch(r"[\s()\[\]{},0-9*?]*", q):
            continue
        out.append(q)
    return out


# ---------------------------------------------------------------------------
# fixture: one random corpus, built once
# ---------------------------------------------------------------------------

def _random_docs(seed: int, n_docs: int) -> list[list[str]]:
    rng = random.Random(seed)
    return [
        [rng.choice(VOCAB) for _ in range(rng.randint(1, MAXLEN))]
        for _ in range(n_docs)
    ]


@pytest.fixture(scope="module")
def diff_corpus(spark, tmp_path_factory):
    docs = _random_docs(SEED, 40)
    pdf = pd.DataFrame(
        {
            "conv_id": [f"d{i:03d}" for i in range(len(docs))],
            "turn_idx": [0] * len(docs),
            "role": ["user"] * len(docs),
            "text": [" ".join(d) for d in docs],
            "tool": [""] * len(docs),
            "ts": pd.to_datetime(["2025-01-01"] * len(docs)),
        }
    )
    d = str(tmp_path_factory.mktemp("diff") / "idx")
    cfg = EngineConfig(segment_size=8, block_size=4)
    corpus = Corpus.build(spark, spark.createDataFrame(pdf), d, cfg)
    return corpus, docs


def engine_hits(corpus, q: str) -> list[tuple[int, int, int]]:
    return sorted(
        (r["doc_id"], r["start"], r["end"])
        for r in corpus.find(q).df.select("doc_id", "start", "end").collect()
    )


def test_differential_random_queries(diff_corpus):
    corpus, docs = diff_corpus
    queries = gen_queries(SEED + 1, N_QUERIES)
    orig = corpus.cfg
    failures = []
    try:
        for q in queries:
            expected = naive_find(docs, q)
            corpus.cfg = dataclasses.replace(orig, fi_probe_ratio=1.01)
            probed = engine_hits(corpus, q)
            if probed != expected:
                failures.append((q, "probe", expected, probed))
                continue
            corpus.cfg = dataclasses.replace(orig, fi_probe_ratio=0.0)
            joined = engine_hits(corpus, q)
            if joined != expected:
                failures.append((q, "join", expected, joined))
    finally:
        corpus.cfg = orig
    assert not failures, "\n".join(
        f"{mode} plan diverges on {q!r}:\n  naive={exp[:12]}\n  engine={got[:12]}"
        for q, mode, exp, got in failures[:5]
    )


def test_variable_length_sequence_dedup(diff_corpus):
    """Two variable-length parts can derive the same span via
    different length splits (|A|=1,|B|=2 vs |A|=2,|B|=1) — the engine
    must emit one row per distinct hit under BOTH planner modes
    (reference ensureSortedUnique, BLSpanQuery.java:105-112). Found by
    a deep fuzz run (seed 424242, 60-doc corpus)."""
    import copy as _copy
    import dataclasses as _dc

    corpus, docs = diff_corpus
    q = '("ab"){1,3} ([word != "bb"]){1,3}'
    want = naive_find(docs, q)
    for ratio in (0.0, 1.01):
        c2 = _copy.copy(corpus)
        c2.cfg = _dc.replace(corpus.cfg, fi_probe_ratio=ratio)
        got = engine_hits(c2, q)
        assert got == want, f"ratio={ratio}"


# ---------------------------------------------------------------------------
# constraint (MatchFilter) differential axis:  a:X []{g,h} b:Y :: expr
# (reference SpanQueryConstrained.java + search/matchfilter/*.java —
# =, !=, &, |, ! over captured-token annotation values)
# ---------------------------------------------------------------------------

def _gen_constraint_queries(seed: int, n: int):
    """Yields (cql, a_atom, b_atom, g, h, eval_fn) where eval_fn(wa, wb)
    evaluates the generated constraint over the captured tokens."""
    rng = random.Random(seed)

    def atom() -> str:
        r = rng.random()
        if r < 0.40:
            return "[]"
        if r < 0.70:
            return f'"{rng.choice(REGEXES)}"'
        return f'"{rng.choice(VOCAB)}"'

    def cmp_():
        r = rng.random()
        if r < 0.35:
            return "a.word = b.word", lambda wa, wb: wa == wb
        if r < 0.55:
            return "a.word != b.word", lambda wa, wb: wa != wb
        lit = rng.choice(VOCAB)
        side, op = rng.choice(["a", "b"]), rng.choice(["=", "!="])
        expr = f'{side}.word {op} "{lit}"'

        def fn(wa, wb, side=side, op=op, lit=lit):
            w = wa if side == "a" else wb
            return (w == lit) if op == "=" else (w != lit)

        return expr, fn

    out = []
    for _ in range(n):
        a, b = atom(), atom()
        g = rng.choice([0, 0, 1])
        h = g + rng.choice([0, 1, 2])
        r = rng.random()
        if r < 0.45:
            expr, fn = cmp_()
        elif r < 0.65:
            (e1, f1), (e2, f2) = cmp_(), cmp_()
            expr = f"({e1} & {e2})"
            fn = lambda wa, wb, f1=f1, f2=f2: f1(wa, wb) and f2(wa, wb)
        elif r < 0.85:
            (e1, f1), (e2, f2) = cmp_(), cmp_()
            expr = f"({e1} | {e2})"
            fn = lambda wa, wb, f1=f1, f2=f2: f1(wa, wb) or f2(wa, wb)
        else:
            e1, f1 = cmp_()
            expr = f"!({e1})"
            fn = lambda wa, wb, f1=f1: not f1(wa, wb)
        cql = f"a:{a} []{{{g},{h}}} b:{b} :: {expr}"
        out.append((cql, a, b, g, h, fn))
    return out


def naive_constrained(docs, a_atom, b_atom, g, h, fn):
    a_set = naive_spans(docs, P.parse(a_atom))
    b_set = naive_spans(docs, P.parse(b_atom))
    b_by_doc: dict = {}
    for d, s, _e in b_set:
        b_by_doc.setdefault(d, []).append(s)
    out = set()
    for d, s, _e in a_set:
        for m in b_by_doc.get(d, ()):
            if g <= m - s - 1 <= h and fn(docs[d][s], docs[d][m]):
                out.add((d, s, m + 1))
    return sorted(out)


def test_differential_constraint_queries(diff_corpus):
    corpus, docs = diff_corpus
    cases = _gen_constraint_queries(SEED + 7, 30)
    orig = corpus.cfg
    failures = []
    try:
        for cql, a, b, g, h, fn in cases:
            expected = naive_constrained(docs, a, b, g, h, fn)
            for label, ratio in (("probe", 1.01), ("join", 0.0)):
                corpus.cfg = dataclasses.replace(orig, fi_probe_ratio=ratio)
                got = engine_hits(corpus, cql)
                if got != expected:
                    failures.append((cql, label, expected, got))
                    break
    finally:
        corpus.cfg = orig
    assert not failures, "\n".join(
        f"{mode} plan diverges on {q!r}:\n  naive={exp[:12]}\n  engine={got[:12]}"
        for q, mode, exp, got in failures[:5]
    )
