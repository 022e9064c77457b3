"""ContextQL (SRU CQL) front-end tests over the 4-doc TestIndex corpus
(reference queryParser/contextql/ContextualQueryLanguageParser.java +
search/CompleteQuery.java combine semantics)."""

import pytest

from blacklab_spark.config import EngineConfig
from blacklab_spark.corpus import Corpus
from blacklab_spark.cql.contextql import ContextQLError, parse_contextql

from micro_corpus import spans_pdf, transcripts_pdf


@pytest.fixture(scope="module")
def micro(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("microctx") / "idx")
    return Corpus.build(
        spark,
        spark.createDataFrame(transcripts_pdf()),
        d,
        EngineConfig(segment_size=2, block_size=4),
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


def test_bare_term(micro):
    assert hits(micro.find_contextql("the")) == [
        (0, 0, 1), (0, 6, 7), (2, 1, 2), (3, 8, 9)
    ]


def test_quoted_phrase_is_sequence(micro):
    # "May the" → word sequence
    assert hits(micro.find_contextql('"may the"')) == [(2, 0, 2)]


def test_annotation_clause(micro):
    assert hits(micro.find_contextql('pos = "nou"')) == [
        (0, 3, 4), (0, 8, 9), (2, 2, 3), (3, 9, 10)
    ]


def test_contents_prefix(micro):
    assert hits(micro.find_contextql('contents.lemma = "jump"')) == [(0, 4, 5)]


def test_wildcard(micro):
    # qu* → quick, question
    assert hits(micro.find_contextql('word = "qu*"')) == [(0, 1, 2), (3, 9, 10)]


def test_and_token_level(micro):
    # same position: word=the AND lemma=the
    assert hits(micro.find_contextql('word = "the" and lemma = "the"')) == [
        (0, 0, 1), (0, 6, 7), (2, 1, 2), (3, 8, 9)
    ]


def test_or_contents(micro):
    assert hits(micro.find_contextql('"fox" or "dog"')) == [(0, 3, 4), (0, 8, 9)]


def test_not_contents(micro):
    # pos=nou NOT word=question
    got = hits(micro.find_contextql('pos = "nou" not word = "question"'))
    assert got == [(0, 3, 4), (0, 8, 9), (2, 2, 3)]


def test_metadata_filter_only(micro):
    docs = micro.find_contextql('conv_id = "doc1"')
    assert [r["doc_id"] for r in docs.select("doc_id").collect()] == [1]


def test_metadata_wildcard(micro):
    docs = micro.find_contextql('conv_id = "doc*"')
    assert docs.count() == 4


def test_mixed_contents_and_metadata(micro):
    h = micro.find_contextql('"the" and conv_id = "doc2"')
    assert hits(h) == [(2, 1, 2)]


def test_parenthesized(micro):
    got = hits(micro.find_contextql('("fox" or "force") and conv_id = "doc*"'))
    assert got == [(0, 3, 4), (2, 2, 3)]


def test_prox_unsupported(micro):
    with pytest.raises(ContextQLError):
        parse_contextql('"a" prox "b"')


def test_or_mixed_kinds_rejected(micro):
    with pytest.raises(ContextQLError):
        parse_contextql('"fox" or conv_id = "doc1"')
