"""One-shot OR union + cached cost-model stats (planner economics).

- A k-branch mixed OR (term-set fast path defeated by a regex branch)
  must plan as ONE Union + ONE dedup, not k-1 chained dedups.
- The sequence planner's df estimates come from the in-memory
  Corpus.field_stats dict: repeated queries run ZERO terms-dict Spark
  jobs, and the estimates match the terms dict exactly.
"""

from __future__ import annotations

import pytest

from blacklab_spark.cql import engine as E
from blacklab_spark.cql.parser import parse


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mixed_or_single_union_single_dedup(small_corpus):
    corpus, _ = small_corpus
    q = '"word00001" | "word0000[23]" | "word00004" | "word00005"'
    df = corpus.find(q).df
    p = _plan(df)
    # one Union over all branches; one dedup (= one HashAggregate pair)
    assert p.count("Union") == 1
    assert p.count("HashAggregate") == 2
    # and the result is the true set union of the branches
    parts = ['"word00001"', '"word0000[23]"', '"word00004"', '"word00005"']
    want = set()
    for b in parts:
        want |= {
            (r["doc_id"], r["start"], r["end"])
            for r in corpus.find(b).df.collect()
        }
    got = {(r["doc_id"], r["start"], r["end"]) for r in df.collect()}
    assert got == want and got


def test_seq_cost_model_runs_from_cache(small_corpus):
    corpus, _ = small_corpus
    node = parse('"word00001" "word00002"')
    parts = list(node.parts)
    first = E._seq_part_dfs(corpus, parts)
    assert first  # estimates produced
    # the dict-backed estimate equals the terms table's df
    ts = corpus.term_stats(["word00001", "word00002"])
    assert first[0] == ts["word00001"]
    assert first[1] == ts["word00002"]

    # repeated planning must issue NO terms-dict job at all
    orig = corpus.terms_for
    def _boom(field):  # pragma: no cover - failure path
        raise AssertionError("terms-dict job on a repeated query")
    corpus.terms_for = _boom
    try:
        again = E._seq_part_dfs(corpus, parts)
    finally:
        corpus.terms_for = orig
    assert again == first


def test_regex_and_negation_estimates(small_corpus):
    """Regex parts estimate as the df-sum over matching dict terms;
    negated parts as max(total - match, 1) — same as the former
    distributed agg."""
    corpus, _ = small_corpus
    fs = corpus.field_stats("word@i")
    assert fs is not None
    d, total = fs
    node = parse('"word00001" "word0000.*"')
    ests = E._seq_part_dfs(corpus, list(node.parts))
    import re

    want = sum(df for t, df in d.items() if re.match(r"^(?:word0000.*)$", t))
    assert ests[1] == want
    node2 = parse('"word00001" [word != "word00002"]')
    ests2 = E._seq_part_dfs(corpus, list(node2.parts))
    assert ests2[1] == max(total - d["word00002"], 1)
