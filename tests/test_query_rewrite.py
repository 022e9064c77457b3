"""Planner-rewrite parity with the reference's TestQueryRewrite
(core/src/test/java/nl/inl/blacklab/search/TestQueryRewrite.java).

The reference asserts the rewritten BLSpanQuery's STRING form; our
planner is a DataFrame translator, so the portable invariant is
SEMANTIC: the sugar pattern and the explicitly-rewritten pattern must
return identical hit sets on the TestIndex corpus. Each test cites the
reference case it mirrors. This doubles as an equivalence check that
the rewrites the planner applies (NOT-inversion, repetition merge,
any-token folding, containing/within normalization) preserve results.
"""

from __future__ import annotations

import pytest

from blacklab_spark.config import EngineConfig
from blacklab_spark.corpus import Corpus

from micro_corpus import spans_pdf, transcripts_pdf


@pytest.fixture(scope="module")
def micro(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("microrw") / "idx")
    cfg = EngineConfig(segment_size=2, block_size=4)
    return Corpus.build(
        spark,
        spark.createDataFrame(transcripts_pdf()),
        d,
        cfg,
        extra_spans=spark.createDataFrame(
            spans_pdf(),
            schema="conv_id string, turn_idx long, tag string, "
            "start int, end int, attrs map<string,string>",
        ),
    )


def hits(corpus, cql: str) -> list[tuple]:
    return sorted(
        (r["doc_id"], r["start"], r["end"])
        for r in corpus.find(cql).df.select("doc_id", "start", "end").collect()
    )


def assert_equiv(corpus, sugar: str, explicit: str):
    got, want = hits(corpus, sugar), hits(corpus, explicit)
    assert got == want, f"{sugar!r} -> {got}\n{explicit!r} -> {want}"


# --- double negation (testRewrite) -----------------------------------------

def test_double_negation(micro):
    """[!(word != x)] == x (TestQueryRewrite.java:79-84)."""
    assert_equiv(micro, '[!(word != "the")]', '"the"')


# --- sensitivity flags (testRewriteInsensitive*/Sensitive) ------------------

def test_insensitive_flag_term(micro):
    """(?i) on a plain term folds to the insensitive term
    (TestQueryRewrite.java:86-89)."""
    assert_equiv(micro, '[word = "(?i)Fox"]', '"fox"')


def test_insensitive_regex_expands_to_or(micro):
    """(?i)b.* == OR over the dictionary matches be|brown
    (TestQueryRewrite.java:91-96)."""
    assert_equiv(micro, '[word = "(?i)b.*"]', '"be" | "brown"')


def test_insensitive_regex_alternation(micro):
    """(?i)(th|b)e == be|the (TestQueryRewrite.java:105-110)."""
    assert_equiv(micro, '[word = "(?i)(th|b)e"]', '"be" | "the"')


def test_sensitive_flag(micro):
    """(?-i) keeps case: 'Force' only matches the capitalized token in
    doc2 (TestQueryRewrite.java:112-117)."""
    assert hits(micro, '[word = "(?-i)Force"]') == [(2, 2, 3)]
    assert hits(micro, '[word = "(?-i)force"]') == []


# --- and/or/not combinations (testRewriteNested*/Negative*/AndNot) ----------

def test_nested_and_with_negative(micro):
    """[a & b & !c] == POSFILTER(AND(a,b), c, NOTMATCHES)
    (TestQueryRewrite.java:118-122): same results as subtracting the
    c-hits from the positive intersection."""
    assert_equiv(
        micro,
        '[word = "the" & lemma = "the" & pos != "nou"]',
        '[word = "the" & lemma = "the"] & [pos != "nou"]',
    )
    # and against the hand-derived set: every 'the' is art (never nou)
    assert hits(micro, '[word = "the" & lemma = "the" & pos != "nou"]') == [
        (0, 0, 1), (0, 6, 7), (2, 1, 2), (3, 8, 9),
    ]


def test_negative_and_demorgan(micro):
    """[x != a & x != b] == NOT(OR(a, b))
    (TestQueryRewrite.java:132-137)."""
    assert_equiv(
        micro, '[word != "the" & word != "aap"]', '[!(word = "the" | word = "aap")]'
    )


def test_negative_or_demorgan(micro):
    """[x != a | y != b] == NOT(AND(a, b))
    (TestQueryRewrite.java:139-144)."""
    assert_equiv(
        micro,
        '[word != "the" | lemma != "the"]',
        '[!(word = "the" & lemma = "the")]',
    )


def test_and_not(micro):
    """[a & b != x] == positive minus the x-matches
    (TestQueryRewrite.java:146-151)."""
    assert_equiv(micro, '[word = "find" & pos != "con"]', '"find"')


# --- repetition merging (testRewriteRepetition*) ----------------------------

def test_adjacent_same_clause_merges_to_repetition(micro):
    """'a' 'a' == 'a'{2} (TestQueryRewrite.java:159-167)."""
    assert_equiv(micro, '"aap" "aap"', '"aap"{2}')
    assert hits(micro, '"aap"{2}') == [(1, 8, 10), (1, 9, 11), (1, 10, 12)]


def test_or_clause_repetition_merge(micro):
    """('a'|'b') ('a'|'b') == ('a'|'b'){2}
    (TestQueryRewrite.java:196-201)."""
    assert_equiv(micro, '("noot" | "aap") ("noot" | "aap")', '("noot" | "aap"){2}')


def test_repetition_flattening(micro):
    """Nested repetition bounds multiply / collapse
    (TestQueryRewrite.java:263-288 testRewriteRepetition)."""
    assert_equiv(micro, '("aap"{2,3}){1,1}', '"aap"{2,3}')
    assert_equiv(micro, '("aap"{1,1}){2,3}', '"aap"{2,3}')
    assert_equiv(micro, '"aap"{1,1}', '"aap"')
    assert_equiv(micro, '("aap"+)+', '"aap"+')


def test_repetition_absorbs_adjacent_same_term(micro):
    """'a' 'a'* == 'a'+; 'a'+ 'a' == 'a'{2,}; 'a'+ 'a'+ == 'a'{2,}
    (TestQueryRewrite.java:273-287)."""
    assert_equiv(micro, '"aap" "aap"*', '"aap"+')
    assert_equiv(micro, '"aap"* "aap"', '"aap"+')
    assert_equiv(micro, '"aap" "aap"+', '"aap"{2,}')
    assert_equiv(micro, '"aap"+ "aap"', '"aap"{2,}')
    assert_equiv(micro, '"aap"+ "aap"+', '"aap"{2,}')


def test_nested_star_plus_collapse(micro):
    """('a'*)* 'b' == ('a'+ 'b') | 'b' — empty alternatives expand to
    an OR, no zero-length hits (TestQueryRewrite.java:263-271)."""
    assert_equiv(micro, '("aap"*)* "noot"', '("aap"+ "noot") | "noot"')
    assert_equiv(micro, '("aap"+)* "noot"', '("aap"+ "noot") | "noot"')
    assert_equiv(micro, '("aap"*)+ "noot"', '("aap"+ "noot") | "noot"')


def test_optional_clauses_expand_to_or(micro):
    """'a'? 'b'? == ('a' 'b') | 'b' | 'a'
    (TestQueryRewrite.java:272-281)."""
    assert_equiv(micro, '"noot"? "aap"?', '("noot" "aap") | "noot" | "aap"')
    assert_equiv(micro, '("aap"?)? "noot"', '("aap" "noot") | "noot"')
    assert_equiv(
        micro, '"aap"? "aap"? "noot"', '("aap"{1,2} "noot") | "noot"'
    )


# --- any-token folding (testRewriteAny / testRewriteRepetitionAny) ----------

def test_anytoken_folds_into_expansion(micro):
    """'a' []{2,3} == EXPAND(a, R, 2, 3): same hits as the explicit
    per-length union (TestQueryRewrite.java:221-227)."""
    assert_equiv(micro, '"noot" []{2,3}', '("noot" [] []) | ("noot" [] [] [])')
    assert_equiv(micro, '"noot" ([]){2,3}', '"noot" []{2,3}')
    assert_equiv(micro, '"noot" ([]{2}){3}', '"noot" []{6}')
    assert_equiv(micro, '"noot" []{1,2} []{3,4}', '"noot" []{4,6}')


def test_sequence_expand(micro):
    """Trailing any-tokens expand the whole preceding sequence
    (TestQueryRewrite.java:229-233)."""
    assert_equiv(
        micro, '"noot" "mier" []{1,2}', '("noot" "mier" []) | ("noot" "mier" [] [])'
    )


# --- negative neighbors (testRewriteProblematicNegativeClauses) -------------

def test_negative_neighbor_inversion(micro):
    """'b' [!x] == NOTCONTAINING posfilter over the expansion — the
    ClauseCombinerNot inversion; equivalence vs the un-sugared
    anti-join form (TestQueryRewrite.java:242-247)."""
    assert hits(micro, '"noot" [word != "aap"]') == [(1, 0, 2), (1, 6, 8)]
    assert_equiv(micro, '"noot" [word != "aap"]{2}', '"noot" [!"aap"] [!"aap"]')


def test_optional_negative_neighbor(micro):
    """[!x]? 'b' == ([!x] 'b') | 'b' (TestQueryRewrite.java:252-254)."""
    assert_equiv(
        micro, '[word != "noot"]? "mier"', '([!"noot"] "mier") | "mier"'
    )


def test_negative_between_anchors(micro):
    """'a' [!x]{1,20} 'c' == NOTCONTAINING over the gap
    (TestQueryRewrite.java:250-251)."""
    assert_equiv(
        micro,
        '"noot" [word != "noot"]{1,3} "noot"',
        '"noot" ([!"noot"]{1,3}) "noot"',
    )
    # doc1: noot@0 [mier aap mier...] has no noot within 3; noot@6 noot@7
    # gap must be >=1 non-noot: no match between 6 and 7
    assert hits(micro, '"noot" [word != "noot"]{1,3} "noot"') == []


# --- tags (testRewriteTags / testRewriteContaining) --------------------------

def test_tag_wrapped_sequence_is_containing(micro):
    """<s> []* 'a' 'b' []* </s> == <s/> containing 'a' 'b'
    (TestQueryRewrite.java:300-305)."""
    assert_equiv(micro, '<s> []* "to" "find" []* </s>', '<s/> containing "to" "find"')


def test_sequence_of_containing_spans(micro):
    """(<s/> containing a) (<s/> containing b) sequences adjacent
    sentence spans (TestQueryRewrite.java:235-239)."""
    assert hits(
        micro, '(<s/> containing "to") (<s/> containing "that")'
    ) == [(3, 0, 10)]


def test_ngram_filter(micro):
    """[]{2,4} containing 'a' 'b' == FILTERNGRAMS
    (TestQueryRewrite.java:316-321): n-gram windows containing the
    sequence."""
    got = hits(micro, '[]{2,3} containing "to" "find"')
    # doc3 'to find' at (0,2) and (4,6): windows of len 2-3 covering them
    assert got == [
        (3, 0, 2), (3, 0, 3), (3, 3, 6), (3, 4, 6), (3, 4, 7),
    ]


# --- global constraint capture plumbing (testGlobalConstraint) ---------------

def test_global_constraint_rewrite(micro):
    """a:[] 'x' b:[] :: a.word = b.word — captures survive the
    expansion rewrites (TestQueryRewrite.java:331-335)."""
    assert hits(micro, 'a:[] "mier" b:[] :: a.word = b.word') == [(1, 3, 6)]


def test_epsilon_matching_span_and(micro):
    """An AND whose clauses ALL match ε matches ε itself (reference
    TextPatternAnd.matchesEmptySequence): ("x"* & "y"*) "noot" must
    include bare noot hits; non-ε hits of the AND are the intersection
    of each clause's non-ε hits."""
    assert_equiv(
        micro,
        '("aap"* & "aap"*) "noot"',
        '("aap"+ "noot") | "noot"',
    )
    # disjoint ε-matching clauses: intersection of non-ε hits is empty,
    # so only the bare alternative survives
    assert_equiv(micro, '("aap"* & "mier"*) "noot"', '"noot"')
