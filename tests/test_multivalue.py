"""Multiple annotation values at one token position (reference
AnnotationWriter.java:246-263 addValueAtPosition / PayloadUtils.java:25-62
primary vs secondary values). Encoding: `|`-separated values in an
`ann_*` cell; first = primary (forward index / concordances), the rest
are secondary (searchable, not displayed)."""

import pandas as pd
import pytest

from blacklab_spark.config import EngineConfig
from blacklab_spark.corpus import Corpus


@pytest.fixture(scope="module")
def mv(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mv") / "idx")
    pdf = pd.DataFrame(
        {
            "conv_id": ["d0", "d1"],
            "turn_idx": [0, 0],
            "role": ["user", "user"],
            "text": ["the fox jumps high", "she walks away"],
            "tool": ["", ""],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-01"]),
            # multi-value lemmas: jumps -> jump|leap, walks -> walk|stroll|amble
            "ann_lemma": [
                ["the", "fox", "jump|leap", "high"],
                ["she", "walk|stroll|amble", "away"],
            ],
        }
    )
    return Corpus.build(
        spark, spark.createDataFrame(pdf), d, EngineConfig(segment_size=2, block_size=4)
    )


def hits(h):
    return sorted(
        (r["doc_id"], r["start"], r["end"])
        for r in h.df.select("doc_id", "start", "end").collect()
    )


def test_secondary_value_matches(mv):
    # searching a secondary value finds the position
    assert hits(mv.find('[lemma="leap"]')) == [(0, 2, 3)]
    assert hits(mv.find('[lemma="stroll"]')) == [(1, 1, 2)]
    assert hits(mv.find('[lemma="amble"]')) == [(1, 1, 2)]


def test_primary_value_still_matches(mv):
    assert hits(mv.find('[lemma="jump"]')) == [(0, 2, 3)]
    assert hits(mv.find('[lemma="walk"]')) == [(1, 1, 2)]


def test_primary_only_in_display_keys(mv):
    # group key (forward-index read) shows the primary value only
    out = mv.find('[lemma="leap"]').group_by(["hit:lemma"])
    rows = {r["hit_lemma"]: r["size"] for r in out.collect()}
    assert rows == {"jump": 1}


def test_secondary_in_sequence(mv):
    # secondary values compose with adjacency like any term
    assert hits(mv.find('"fox" [lemma="leap"]')) == [(0, 1, 3)]


def test_no_pipe_annotations_unchanged(mv):
    # single-valued cells round-trip exactly
    assert hits(mv.find('[lemma="fox"]')) == [(0, 1, 2)]
    assert hits(mv.find('[lemma="high"]')) == [(0, 3, 4)]


def test_regex_over_secondary(mv):
    # regex term-set scan sees secondary values too
    assert hits(mv.find('[lemma="str.*"]')) == [(1, 1, 2)]


def test_multiple_values_match_dedup(mv):
    # 'walk' and 'amble' BOTH match .*a.* at d1 pos 1 — one hit, not two
    # (plus 'leap' at d0 pos 2 and 'away' at d1 pos 2)
    assert hits(mv.find('[lemma=".*a.*"]')) == [(0, 2, 3), (1, 1, 2), (1, 2, 3)]


def test_repetition_over_multivalue_falls_back(mv):
    # repetition probe rejects multi-valued annotations; the generic
    # repetition path still answers correctly
    assert hits(mv.find('"the" [lemma="fox"]{1,2}')) == [(0, 0, 2)]
    assert hits(mv.find('"she" [lemma="stroll"]+')) == [(1, 0, 2)]
