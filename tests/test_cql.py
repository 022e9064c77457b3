"""CQL end-to-end tests — transliterated from the reference's
TestSearches.java (core/src/test/java/nl/inl/blacklab/search/
TestSearches.java) query list over the 4-doc TestIndex corpus
(micro_corpus.py). Expected hits are (doc, start, end) under OUR
tokenizer ([a-z0-9]+, punctuation dropped)."""

import pytest

from blacklab_spark.config import EngineConfig
from blacklab_spark.corpus import Corpus

from micro_corpus import spans_pdf, transcripts_pdf


@pytest.fixture(scope="module")
def micro(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("microcql") / "idx")
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


def hits(h):
    return sorted(
        (r["doc_id"], r["start"], r["end"])
        for r in h.df.select("doc_id", "start", "end").collect()
    )


# --- leaf patterns (TestSearches simple term/regex section) ---------------

def test_term(micro):
    assert hits(micro.find('"the"')) == [(0, 0, 1), (0, 6, 7), (2, 1, 2), (3, 8, 9)]


def test_sensitive_term(micro):
    assert hits(micro.find('"(?-i)The"')) == [(0, 0, 1)]


def test_regex(micro):
    assert hits(micro.find('"b.*"')) == [(0, 2, 3), (2, 3, 4)]
    assert hits(micro.find('"fo[xr].*"')) == [(0, 3, 4), (2, 2, 3)]


def test_annotation_clause(micro):
    assert hits(micro.find('[pos="nou"]')) == [(0, 3, 4), (0, 8, 9), (2, 2, 3), (3, 9, 10)]
    assert hits(micro.find('[lemma="jump"]')) == [(0, 4, 5)]


# --- sequences ---------------------------------------------------------------

def test_phrase(micro):
    assert hits(micro.find('"quick" "brown"')) == [(0, 1, 3)]
    assert hits(micro.find('"quick brown"')) == [(0, 1, 3)]


def test_adj_nou_sequence(micro):
    assert hits(micro.find('[pos="adj"] [pos="nou"]')) == [(0, 2, 4), (0, 7, 9)]


def test_sequence_all_combinations(micro):
    assert hits(micro.find('"aap" "aap"')) == [(1, 8, 10), (1, 9, 11), (1, 10, 12)]


def test_fi_forced_strategies(micro):
    # reference TestSearches.java:104-114: _FI1/_FI2 force the
    # forward-index matching direction but must return the same hits
    expected = [(0, 2, 4), (0, 7, 9)]
    assert hits(micro.find('_FI1([pos="adj"], [pos="nou"])')) == expected
    assert hits(micro.find('_FI2([pos="adj"], [pos="nou"])')) == expected
    assert hits(micro.find('_FI1("the", "quick")')) == [(0, 0, 2)]
    assert hits(micro.find('_FI2("the", "quick")')) == [(0, 0, 2)]


def test_optional(micro):
    # "quick"? "brown": brown alone + quick brown
    assert hits(micro.find('"quick"? "brown"')) == [(0, 1, 3), (0, 2, 3)]
    # "the" "quick"? -> the / the quick
    assert hits(micro.find('"the" "quick"?')) == [
        (0, 0, 1),
        (0, 0, 2),
        (0, 6, 7),
        (2, 1, 2),
        (3, 8, 9),
    ]


def test_both_optional_sequence(micro):
    # 'with|find'? [pos='pro']? — alternatives {A, B, AB}, empty match
    # excluded (reference TestSearches.java:154-162)
    got = hits(micro.find("\"with|find\"? [pos='pro']?"))
    assert got == [
        (2, 4, 5), (2, 4, 6), (2, 5, 6),
        (3, 1, 2), (3, 5, 6), (3, 5, 7), (3, 6, 7),
    ]


def test_open_repetition(micro):
    # [pos='adj']{1,} — every consecutive-run subsequence
    # (reference TestSearches.java:171-176)
    got = hits(micro.find("[pos='adj']{1,}"))
    assert got == [(0, 1, 2), (0, 1, 3), (0, 2, 3), (0, 7, 8)]


def test_gap(micro):
    # 'the' []{0,1} fox|force: the force is at gap1 in doc2; 'the ... fox' none
    assert hits(micro.find('"the" []{0,1} "fox|force"')) == [(2, 1, 3)]


def test_anytoken_neighbors(micro):
    # [] "quick" -> (0,0,2)
    assert hits(micro.find('[] "quick"')) == [(0, 0, 2)]
    # "quick" [] -> (0,1,3)
    assert hits(micro.find('"quick" []')) == [(0, 1, 3)]


def test_pure_anytoken(micro):
    assert len(hits(micro.find("[]"))) == 37
    assert len(hits(micro.find("[] []"))) == 33


# --- or / and / not --------------------------------------------------------

def test_or(micro):
    assert hits(micro.find('"fox" | "force"')) == [(0, 3, 4), (2, 2, 3)]


def test_token_and_not(micro):
    assert hits(micro.find('[pos="adj" & word != "lazy"]')) == [(0, 1, 2), (0, 2, 3)]


def test_token_not(micro):
    got = hits(micro.find('[word != "the"]'))
    assert len([h for h in got if h[0] == 0]) == 7


# --- repetition -------------------------------------------------------------

def test_repetition(micro):
    assert hits(micro.find('[pos="adj"]{2}')) == [(0, 1, 3)]
    runs = [h for h in hits(micro.find('"aap"+')) if h[0] == 1]
    assert len(runs) == 11


def test_repetition_in_sequence(micro):
    # "noot" "aap"{2,} -> noot + aap runs from 8: (7,10),(7,11),(7,12)
    assert hits(micro.find('"noot" "aap"{2,}')) == [(1, 7, 10), (1, 7, 11), (1, 7, 12)]


# --- tags / position filters -----------------------------------------------

def test_within(micro):
    assert hits(micro.find('"b.*" within <entity/>')) == [(0, 2, 3)]


def test_containing(micro):
    assert hits(micro.find('<entity/> containing "b.*"')) == [(0, 0, 4)]


def test_not_within(micro):
    assert hits(micro.find('"b.*" !within <entity/>')) == [(2, 3, 4)]


def test_internalize_left_neighbor(micro):
    # "the" ([pos="adj"] within <entity/>) — the fixed-length left
    # neighbor is internalized into the position filter (reference
    # ClauseCombinerInternalisation): producer becomes the sequence,
    # the within-test applies with a +1 left-edge adjustment.
    # doc0: the@0+quick@1 (adj, within entity(0,4)); the@6+lazy@7
    # (adj, within entity(6,9))
    assert hits(micro.find('"the" ([pos="adj"] within <entity/>)')) == [
        (0, 0, 2),
        (0, 6, 8),
    ]
    from blacklab_spark.cql.explain import explain

    txt = explain(micro, '"the" ([pos="adj"] within <entity/>)')
    assert "ClauseCombinerInternalisation" in txt


def test_internalize_right_neighbor(micro):
    # ([pos="adj"] within <entity/>) "fox" — right neighbor internalized
    # with a -1 right-edge adjustment: brown@2 (adj within entity(0,4))
    # followed by fox@3
    assert hits(micro.find('([pos="adj"] within <entity/>) "fox"')) == [(0, 2, 4)]


def test_internalize_inverted_filter(micro):
    # every adjective after "the" sits inside an entity, so the
    # inverted (!within) internalized form is empty
    assert hits(micro.find('"the" ([pos="adj"] !within <entity/>)')) == []


def test_tag_start_sequence(micro):
    # <s> "to": sentence-initial 'to' (doc3 s spans [0,6) and [6,10))
    assert hits(micro.find('<s> "to"')) == [(3, 0, 1)]
    # "question" </s> : sentence-final
    assert hits(micro.find('"question" </s>')) == [(3, 9, 10)]


def test_tag_attr(micro):
    # turn tag carries role attr from the build
    assert len(hits(micro.find('<turn role="user"/>'))) == 4


# --- capture + global constraints -------------------------------------------

def test_capture(micro):
    h = micro.find('x:"fox"')
    row = h.df.collect()[0]
    assert row["cap_x_start"] == 3 and row["cap_x_end"] == 4


def test_constraint_equal_words(micro):
    got = hits(micro.find('a:[] b:[] :: a.word = b.word'))
    assert got == [(1, 3, 5), (1, 4, 6), (1, 6, 8), (1, 8, 10), (1, 9, 11), (1, 10, 12)]


def test_constraint_literal(micro):
    got = hits(micro.find('a:[] "find" :: a.word = "to"'))
    assert got == [(3, 0, 2), (3, 4, 6)]


def test_negated_term_in_sequence_inverted(micro, monkeypatch):
    from blacklab_spark.search import spans as S

    """[!x] A / A [!x] rewrite to anchored NOTCONTAINING (reference
    ClauseCombinerNot.java:14-56) — the any-token complement
    (S.token_not) must never be built inside a sequence."""
    def boom(*a, **k):
        raise AssertionError("token_not materialized inside a sequence")

    monkeypatch.setattr(S, "token_not", boom)
    # trailing: "the" [word != "quick"]
    # doc0: the@0+quick excluded, the@6+lazy ok; doc2: the@1+force ok;
    # doc3: the@8+question ok
    got = hits(micro.find('"the" [word != "quick"]'))
    assert got == [(0, 6, 8), (2, 1, 3), (3, 8, 10)]
    # leading: [word != "over"] "the"
    # doc0: the@0 no predecessor, the@6 pred=over excluded;
    # doc2: the@1 pred=may ok; doc3: the@8 pred=is ok
    got = hits(micro.find('[word != "over"] "the"'))
    assert got == [(2, 0, 2), (3, 7, 9)]
    # both sides: [word != "to"] "find" [word != "that"]
    # doc3 find@1: pred=to excluded; find@5: pred=to excluded
    assert hits(micro.find('[word != "to"] "find" [word != "that"]')) == []
    # chained leading negations: [!noot] [!mier] "aap"
    # doc1 aap@2: p1=noot excluded; aap@8: p0=noot excluded;
    # aap@9: p1=noot... positions 7=noot,8=aap -> aap@9 pred=aap,
    # pred2=noot excluded; aap@10: preds aap,aap ok; aap@11 ok
    got = hits(micro.find('[word != "noot"] [word != "mier"] "aap"'))
    assert got == [(1, 8, 11), (1, 9, 12)]


def test_only_negated_terms_sequence(micro):
    # [!the] [!quick]: falls back to ONE any-token complement + invert
    got = hits(micro.find('[word != "the"] [word != "quick"]'))
    # doc0 bigrams (pos i, i+1) where tok[i] != 'the' and tok[i+1] != 'quick':
    # (1,3),(2,4),(3,5),(4,6),(7,9) — excluded: (0,2) the, (5,7) over+the?
    # tok: the quick brown fox jumps over the lazy dog
    # (5,7): tok5=over ok, tok6=the -> excluded? tok[i+1]=the != quick ok
    # recompute in python below
    toks = "the quick brown fox jumps over the lazy dog".split()
    exp0 = [
        (0, i, i + 2)
        for i in range(len(toks) - 1)
        if toks[i] != "the" and toks[i + 1] != "quick"
    ]
    assert [h for h in got if h[0] == 0] == exp0


def test_repetition_merge_rewrite(micro, monkeypatch):
    """Adjacent equal clauses merge into one repetition (reference
    ClauseCombinerRepetition.java:11-49): no adjacency join runs."""
    from blacklab_spark.search import spans as S

    expected = hits(micro.find('"aap"{2}'))

    def boom(*a, **k):
        raise AssertionError("sequence join used for mergeable repetition")

    monkeypatch.setattr(S, "sequence", boom)
    assert hits(micro.find('"aap" "aap"')) == expected
    # A A+ -> A{2,}
    exp2 = hits(micro.find('"aap"{2,}'))
    assert hits(micro.find('"aap" "aap"+')) == exp2


def test_matching_tags_rewrite(micro):
    # <s> A </s>: A must coincide with one whole sentence element
    # (rewritten to a MATCHES position filter, not two edge joins —
    # reference SpanQuerySequence.findMatchingTags)
    got = hits(micro.find('<s> "to" []{4} "find" </s>'))
    assert got == [(3, 0, 6)]
    # whole-sentence any-token probe: every 6-token sentence
    assert hits(micro.find('<s> []{6} </s>')) == [(2, 0, 6), (3, 0, 6)]
    # inner bracket: token before a one-word-spanning entity element
    assert hits(micro.find('"the" <entity> []{3} </entity>')) is not None
    # rewrite fires in explain
    from blacklab_spark.cql.explain import explain
    txt = explain(micro, '<s> "to" </s>')
    assert "findMatchingTags" in txt


def test_lone_edge_anchor_rewrite(micro):
    # lone <s> / </s> edges anchor via STARTS_AT / ENDS_AT semi-joins;
    # results identical to the zero-width edge-adjacency semantics
    assert hits(micro.find('<s> "to"')) == [(3, 0, 1)]
    assert hits(micro.find('"question" </s>')) == [(3, 9, 10)]
    assert hits(micro.find('<s> "to" "find"')) == [(3, 0, 2)]
    from blacklab_spark.cql.explain import explain
    txt = explain(micro, '<s> "to"')
    assert "findMatchingTags" in txt


def test_annotation_repetition_probe(micro):
    # `[pos="adj"]+` adjacent to a term anchor runs as a forward-index
    # run-length probe (ClauseCombinerNfa repetition states), never a
    # full pos-column position scan. doc0: the quick/adj brown/adj fox,
    # the lazy/adj dog.
    assert hits(micro.find('"the" [pos="adj"]+')) == [(0, 0, 2), (0, 0, 3), (0, 6, 8)]
    assert hits(micro.find('[pos="adj"]+ "dog"')) == [(0, 7, 9)]
    assert hits(micro.find('"the" [pos="adj"]{2} [pos="nou"]')) == [(0, 0, 4)]


# --- constraint implication (reference TestSearches.java:356-379) ----------

def test_constraint_implication(micro):
    # if c matched, a.word must equal b.word; unmatched c passes
    got = hits(micro.find('(c:"noot")? a:[] "aap" b:[] :: c -> (a.word = b.word)'))
    assert got == [
        (1, 0, 4), (1, 1, 4), (1, 7, 10), (1, 7, 11), (1, 8, 11), (1, 9, 12),
    ]


def test_constraint_implication_never_matched(micro):
    # left side never matches -> right side ignored entirely
    got = hits(
        micro.find('(c:"notinindex")? a:[] "aap" b:[] :: c -> a.word = b.word')
    )
    assert got == [(1, 1, 4), (1, 7, 10), (1, 8, 11), (1, 9, 12)]


# --- more TestSearches transliterations -------------------------------------

def test_nfa_regex_repetition(micro):
    # reference testNfa4: 'May' '.*e'+ 'with' -> [May the Force be with] you
    assert hits(micro.find('"may" ".*e"+ "with"')) == [(2, 0, 5)]


def test_ngram_containing_between_anytokens(micro):
    # reference testConstraintSimple4a: a:[] ([]{1,5} containing 'brown') b:[]
    got = hits(micro.find('a:[] ([]{1,5} containing "brown") b:[]'))
    assert got == [
        (0, 0, 4), (0, 0, 5), (0, 0, 6), (0, 0, 7),
        (0, 1, 4), (0, 1, 5), (0, 1, 6), (0, 1, 7), (0, 1, 8),
    ]


def test_ngram_containing_with_adjustment(micro):
    # reference testNGramContainingWithAdjustment: [] ([]{1,5} containing 'brown')
    got = hits(micro.find('[] ([]{1,5} containing "brown")'))
    assert got == [
        (0, 0, 3), (0, 0, 4), (0, 0, 5), (0, 0, 6),
        (0, 1, 3), (0, 1, 4), (0, 1, 5), (0, 1, 6), (0, 1, 7),
    ]


def test_constraint_with_fixed_infix(micro):
    # reference testConstraintSimple3: a:[] 'aap' 'mier' b:[] :: a.word = b.word
    got = hits(micro.find('a:[] "aap" "mier" b:[] :: a.word = b.word'))
    assert got == [(1, 1, 5)]


def test_expand_twice(micro):
    # reference testExpandTwice: 'The' []{1,2} 'fox' []{1,2} 'over'
    assert hits(micro.find('"the" []{1,2} "fox" []{1,2} "over"')) == [(0, 0, 6)]


def test_optional_both_clauses(micro):
    # reference testOptional3: 'with|find'? [pos='pro']? (empty matches
    # excluded)
    got = hits(micro.find('"with|find"? [pos="pro"]?'))
    assert got == [
        (2, 4, 5), (2, 4, 6), (2, 5, 6),
        (3, 1, 2), (3, 5, 6), (3, 5, 7), (3, 6, 7),
    ]


def test_token_or_across_annotations_uniq(micro):
    # reference testUniq: both sides match the same position -> ONE hit
    assert hits(micro.find('[word = "jumps" | lemma = "jump"]')) == [(0, 4, 5)]
    # reference testOr
    assert hits(micro.find('[word = "jumps" | lemma = "over"]')) == [
        (0, 4, 5), (0, 5, 6),
    ]


def test_only_repetition_zero_min(micro):
    # reference testOnlyRepetition: [lemma='.*he']{0,10} standalone —
    # empty matches excluded, runs are all length 1
    assert hits(micro.find('[lemma=".*he"]{0,10}')) == [
        (0, 0, 1), (0, 6, 7), (2, 1, 2), (3, 8, 9),
    ]


def test_repetition_negation_capture_chain(micro):
    # reference testNGramsNotContaining: 'noot'+ [word != 'noot']+
    # group:('aap')+ filtered to hit text "noot aap aap"
    out = micro.search(
        patt='"noot"+ [word != "noot"]+ group:("aap")+',
        hitfiltercrit="hit",
        hitfilterval="noot aap aap",
    )
    got = sorted((r["doc_id"], r["start"], r["end"]) for r in out.collect())
    assert got == [(1, 7, 10)]


def test_token_and_with_regex(micro):
    # reference testAnd: [pos = 'adj' & lemma = '.*u.*'] -> The [quick] brown
    assert hits(micro.find('[pos = "adj" & lemma = ".*u.*"]')) == [(0, 1, 2)]


# --- TestSearchesNfa parity (reference core/src/test/java/nl/inl/
# blacklab/search/fimatch/TestSearchesNfa.java:43-155) — the queries the
# reference runs with NFA forward-index matching enabled; our planner
# picks FI probes by cost, so these run whichever strategy wins and
# must match the reference's hit sets either way -------------------------

def test_nfa_sequences(micro):
    # testSequence1/2a/2b/3 (TestSearchesNfa.java:43-64)
    assert hits(micro.find('"may" "the"')) == [(2, 0, 2)]
    assert hits(
        micro.find('"may" "the" ("force" "be" "with") "you"')
    ) == [(2, 0, 6)]
    assert hits(micro.find('"may" "the" "force" "be" "with" "you"')) == [
        (2, 0, 6)
    ]
    assert hits(micro.find('"may" "force"')) == []


def test_nfa_repetitions(micro):
    # testRepetition0-4 / RepetitionCaseSensitive (TestSearchesNfa.java:66-101)
    assert hits(micro.find('"may" "the"+')) == [(2, 0, 2)]
    assert hits(micro.find('"may" ".*e"+ "with"')) == [(2, 0, 5)]
    assert hits(micro.find('"may" "(?-i).*e"{2,3} "with"')) == [(2, 0, 5)]
    assert hits(micro.find('"may" "(?-i).*e"+ "with"')) == [(2, 0, 5)]
    # zero-or-more of an absent term collapses to direct adjacency
    assert hits(micro.find('"may" "dsgsdg"* "the"')) == [(2, 0, 2)]
    assert hits(micro.find('"may" "dsgsdg"+ "the"')) == []


def test_nfa_case_insensitive_pair(micro):
    # testCaseInsensitive (TestSearchesNfa.java:103-107)
    assert hits(micro.find('"the" ".*c."')) == [(0, 0, 2), (2, 1, 3)]


def test_nfa_expansions(micro):
    # testExpansion1-4 (TestSearchesNfa.java:109-131)
    assert hits(micro.find('"may" "the" []{2,3} "with"')) == [(2, 0, 5)]
    assert hits(micro.find('"may" "the" []{0,2} "force"')) == [(2, 0, 3)]
    assert hits(micro.find('"may" "the" []+ "force"')) == []
    assert hits(micro.find('"may" []+ "force"')) == [(2, 0, 3)]


def test_nfa_overlapping_and_suffix(micro):
    # testRelativeFreqs2 / testOverlappingSequences / testSuffix
    # (TestSearchesNfa.java:133-149)
    assert hits(micro.find('"noot" "mier" "aap"')) == [(1, 0, 3)]
    assert hits(micro.find('"mier" []{1,2} "noot" "noot"')) == [
        (1, 3, 8), (1, 4, 8),
    ]
    assert hits(micro.find('".*E" "quick"')) == [(0, 0, 2)]


def test_nfa_negated_repetition(micro):
    # testNegation (TestSearchesNfa.java:151-155)
    assert hits(micro.find('"mier" [word != "aap|mier"]+ "aap"')) == [
        (1, 5, 9)
    ]


def test_frequency_list_multi_annotation(micro):
    """lemma+pos zipped frequency list stays position-aligned
    (reference FrequencyTool multi-annotation lists, README.md example
    lemma+pos+word x metadata)."""
    from blacklab_spark.search.frequency import freq_list

    rows = {
        (r["lemma"], r["pos"]): r["frequency"]
        for r in freq_list(micro, ["lemma", "pos"]).collect()
    }
    # doc0 has two (the, art) and doc2/doc3 one each -> 4 total
    assert rows[("the", "art")] == 4
    # (be, vrb): doc2 'be' + doc3 'is' -> 2; doc3 'not' is (not, adv)
    assert rows[("be", "vrb")] == 2
    assert rows[("not", "adv")] == 1


def test_autocomplete_annotation(micro):
    """Autocomplete on a sidecar annotation (reference
    RequestHandlerAutocomplete.java resolves the requested annotation's
    insensitive field): 'a' prefix over pos -> adj/adv/art."""
    from blacklab_spark.search.results import autocomplete

    rows = autocomplete(micro, "a", annotation="pos").collect()
    got = {r["term"]: (r["df"], r["cf"]) for r in rows}
    # adj: doc0 x3; adv: doc3 x1; art: doc0 x2, doc2 x1, doc3 x1
    assert got == {"adj": (1, 3), "adv": (1, 1), "art": (3, 4)}
