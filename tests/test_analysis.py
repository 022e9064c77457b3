"""Unicode analysis chain + 4 match sensitivities
(reference analysis/BLStandardAnalyzer.java, RemoveAllAccentsFilter.java,
MatchSensitivity.java:14-17)."""

import pandas as pd
import pytest

from blacklab_spark.analysis import (
    desensitize_py,
    fold_py,
    py_tokenize,
    py_tokenize_insensitive,
)
from blacklab_spark.config import EngineConfig
from blacklab_spark.corpus import Corpus
from blacklab_spark.search import spans as S


def test_fold_py():
    assert fold_py("càfé") == "cafe"
    assert fold_py("CAFÉ") == "CAFE"
    assert desensitize_py("Ångström") == "angstrom"
    assert desensitize_py("naïve") == "naive"
    # decomposed form (combining acute) folds identically
    assert desensitize_py("café") == "cafe"


def test_py_tokenizer_unicode():
    assert py_tokenize("Héllo, wörld! 42 foo_bar") == ["Héllo", "wörld", "42", "foo", "bar"]
    assert py_tokenize_insensitive("Héllo, wörld!") == ["hello", "world"]


@pytest.fixture(scope="module")
def acc_corpus(spark, tmp_path_factory):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c0", "c1", "c2", "c3"],
            "turn_idx": [0, 0, 0, 0],
            "role": ["user"] * 4,
            "text": [
                "the café opens",
                "the cafe closes",
                "THE CAFÉ IS LOUD",
                "El Niño likes the Café",
            ],
            "tool": [""] * 4,
            "ts": pd.to_datetime(["2024-01-01"] * 4),
        }
    )
    d = str(tmp_path_factory.mktemp("acc") / "idx")
    return Corpus.build(
        spark, spark.createDataFrame(pdf), d, EngineConfig(segment_size=2, block_size=4)
    )


def _hits(df):
    return sorted((r["doc_id"], r["start"]) for r in df.collect())


def test_sensitivity_i(acc_corpus):
    # insensitive: all four docs' variants match 'cafe' AND 'café'
    assert _hits(S.term_hits(acc_corpus, "cafe", sensitive="i")) == [
        (0, 1), (1, 1), (2, 1), (3, 4)
    ]
    assert _hits(S.term_hits(acc_corpus, "Café", sensitive="i")) == [
        (0, 1), (1, 1), (2, 1), (3, 4)
    ]


def test_sensitivity_s(acc_corpus):
    # fully sensitive: exact form only
    assert _hits(S.term_hits(acc_corpus, "café", sensitive="s")) == [(0, 1)]
    assert _hits(S.term_hits(acc_corpus, "CAFÉ", sensitive="s")) == [(2, 1)]
    assert _hits(S.term_hits(acc_corpus, "Café", sensitive="s")) == [(3, 4)]


def test_sensitivity_ci(acc_corpus):
    # case-insensitive, diacritics-sensitive: accented forms only
    assert _hits(S.term_hits(acc_corpus, "café", sensitive="ci")) == [
        (0, 1), (2, 1), (3, 4)
    ]
    assert _hits(S.term_hits(acc_corpus, "cafe", sensitive="ci")) == [(1, 1)]


def test_sensitivity_di(acc_corpus):
    # diacritics-insensitive, case-sensitive
    assert _hits(S.term_hits(acc_corpus, "cafe", sensitive="di")) == [
        (0, 1), (1, 1)
    ]
    assert _hits(S.term_hits(acc_corpus, "CAFE", sensitive="di")) == [(2, 1)]


def test_cql_sensitivity_flags(acc_corpus):
    # default = insensitive; (?c) = sensitive (reference TextPatternRegex)
    assert len(_hits(acc_corpus.find('"café"').df)) == 4
    assert _hits(acc_corpus.find('"(?c)café"').df) == [(0, 1)]


def test_regex_fold(acc_corpus):
    # insensitive regex folds the pattern: caf./café?. both match all
    assert len(_hits(S.regex_hits(acc_corpus, "caf."))) == 4
    assert len(_hits(S.regex_hits(acc_corpus, "café?"))) == 4
    # sensitive regex keeps accents and case: 'caf.' matches lowercase
    # 'cafe' AND 'café' (dot spans the accented char), not CAFÉ/Café
    assert _hits(S.regex_hits(acc_corpus, "caf.", sensitive="s")) == [
        (0, 1), (1, 1)
    ]
    assert _hits(S.regex_hits(acc_corpus, "café", sensitive="s")) == [(0, 1)]


def test_bm25_accented_query(acc_corpus):
    # query 'CAFÉ' scores the folded term
    top = acc_corpus.topk("CAFÉ", k=4)
    assert top.count() == 4
