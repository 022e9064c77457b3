"""Input-format readers -> canonical transcript shape (reference
DocIndexerPlainText/Tabular/Chat + formats/{txt,csv,tsv,chat}.blf.yaml)."""

from __future__ import annotations

import pytest

from blacklab_spark.index.ingest import (
    read_chat,
    read_input,
    read_jsonl,
    read_plaintext,
    read_tabular,
    read_tsv,
)

CANON = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ingest")
    (d / "a.txt").write_text("The quick brown fox")
    (d / "b.txt").write_text("jumps over the lazy dog")
    (d / "c.csv").write_text("word,lemma,pos\nThe,the,art\nquick,quick,adj\nfox,fox,nou\n")
    (d / "d.tsv").write_text("word\tlemma\tpos\nmay\tmay\tvrb\nthe\tthe\tart\n")
    (d / "e.jsonl").write_text(
        '{"conversation": "conv1", "speaker": "user", "content": "hello there", "n": 0}\n'
        '{"conversation": "conv1", "speaker": "assistant", "content": "hi back", "n": 1}\n'
    )
    (d / "f.cha").write_text(
        "@Begin\n"
        "@Participants:\tCHI Child, MOT Mother\n"
        "*CHI:\tmore cookie .\n"
        "%mor:\tqn|more n|cookie .\n"
        "*MOT:\tyou want more\n"
        "\tcookies ?\n"
        "@End\n"
    )
    return d


def test_plaintext(spark, docs_dir):
    rows = read_plaintext(spark, str(docs_dir / "*.txt")).orderBy("conv_id").collect()
    assert [r["conv_id"] for r in rows] == ["a", "b"]
    assert rows[0]["text"] == "The quick brown fox"
    assert rows[0]["turn_idx"] == 0
    assert [f.name for f in read_plaintext(spark, str(docs_dir / "*.txt")).schema][:6] == CANON


def test_tabular_csv(spark, docs_dir):
    df = read_tabular(spark, str(docs_dir / "c.csv"))
    r = df.collect()[0]
    assert r["conv_id"] == "c"
    assert r["text"] == "The quick fox"
    assert list(r["ann_lemma"]) == ["the", "quick", "fox"]
    assert list(r["ann_pos"]) == ["art", "adj", "nou"]


def test_tabular_tsv(spark, docs_dir):
    r = read_tsv(spark, str(docs_dir / "d.tsv")).collect()[0]
    assert r["text"] == "may the"
    assert list(r["ann_pos"]) == ["vrb", "art"]


def test_jsonl_mapping_and_order(spark, docs_dir):
    df = read_jsonl(
        spark,
        str(docs_dir / "e.jsonl"),
        mapping={"conv_id": "conversation", "role": "speaker",
                 "text": "content", "turn_idx": "n"},
    )
    rows = df.orderBy("turn_idx").collect()
    assert [(r["turn_idx"], r["role"]) for r in rows] == [(0, "user"), (1, "assistant")]
    assert rows[1]["text"] == "hi back"


def test_chat(spark, docs_dir):
    rows = read_chat(spark, str(docs_dir / "f.cha")).orderBy("turn_idx").collect()
    assert [(r["turn_idx"], r["role"]) for r in rows] == [(0, "CHI"), (1, "MOT")]
    assert rows[0]["text"] == "more cookie ."
    # continuation line merged into the utterance
    assert rows[1]["text"] == "you want more cookies ?"


def test_dispatch(spark, docs_dir):
    assert read_input(spark, str(docs_dir / "f.cha")).count() == 2
    with pytest.raises(ValueError, match="unknown input format"):
        read_input(spark, str(docs_dir / "x.weird"))


def test_build_from_tabular(spark, docs_dir, tmp_path_factory):
    # end-to-end: tabular ingest carries sidecar annotations into the
    # index, queryable via [pos="..."]
    from blacklab_spark import Corpus, EngineConfig

    idx = str(tmp_path_factory.mktemp("idx_ingest"))
    tr = read_tabular(spark, str(docs_dir / "c.csv"))
    c = Corpus.build(spark, tr, idx, EngineConfig(segment_size=4, block_size=4))
    assert c.find('[pos="adj"]').df.count() == 1
    assert c.find('"the" [pos="adj"]').df.count() == 1
