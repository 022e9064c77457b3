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


WPL_DOC = """<doc id="d1" year="1999">
<s>
The\tart\tthe
quick\tadj\tquick
fox\tnou\tfox
</s>
<s>
It\tpro\tit
<g/>
jumps\tvrb\tjump
</s>
</doc>
<doc id="d2">
<p>
over\tpre\tover
</p>
</doc>
"""


@pytest.fixture(scope="module")
def wpl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wpl")
    (d / "corpus.wpl").write_text(WPL_DOC)
    return d


def test_sketch_wpl(spark, wpl_dir):
    """Sketch WPL (reference sketch-wpl.blf.yaml): word/pos/lemma
    columns, <doc> attributes as metadata, <s>/<p> inline tags as
    spans, <g/> glue skipped."""
    from blacklab_spark.index.ingest import read_sketch_wpl, sketch_wpl_spans

    rows = {r["conv_id"]: r for r in read_sketch_wpl(spark, str(wpl_dir)).collect()}
    assert set(rows) == {"d1", "d2"}
    assert rows["d1"]["text"] == "The quick fox It jumps"
    assert rows["d1"]["ann_lemma"] == ["the", "quick", "fox", "it", "jump"]
    assert rows["d1"]["ann_pos"] == ["art", "adj", "nou", "pro", "vrb"]
    assert rows["d1"]["meta_fields"] == {"id": "d1", "year": "1999"}
    assert rows["d2"]["ann_pos"] == ["pre"]
    spans = {
        (r["conv_id"], r["tag"], r["start"], r["end"])
        for r in sketch_wpl_spans(spark, str(wpl_dir)).collect()
    }
    assert spans == {
        ("d1", "s", 0, 3), ("d1", "s", 3, 5), ("d2", "p", 0, 1),
    }


def test_frog_tsv(spark, tmp_path_factory):
    """tsv-frog (reference tsv-frog.blf.yaml): headerless, word=col2,
    lemma=col3, pos=col5 of 10 columns."""
    from blacklab_spark.index.ingest import read_frog

    d = tmp_path_factory.mktemp("frog")
    (d / "x.tsv").write_text(
        "1\tDe\tde\t[de]\tLID(bep)\t0.99\tO\tB-NP\t2\tdet\n"
        "2\thond\thond\t[hond]\tN(soort)\t0.98\tO\tI-NP\t3\tsu\n"
    )
    rows = read_frog(spark, str(d)).collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "De hond"
    assert rows[0]["ann_lemma"] == ["de", "hond"]
    assert rows[0]["ann_pos"] == ["LID(bep)", "N(soort)"]


def test_sketch_wpl_indexed(spark, wpl_dir, tmp_path_factory):
    """End-to-end: WPL corpus builds an index; pos annotation and <s>
    spans are queryable."""
    from blacklab_spark import Corpus, EngineConfig
    from blacklab_spark.index.ingest import read_sketch_wpl, sketch_wpl_spans

    idx = str(tmp_path_factory.mktemp("idx_wpl"))
    tr = read_sketch_wpl(spark, str(wpl_dir)).drop("meta_fields")
    c = Corpus.build(
        spark, tr, idx, EngineConfig(segment_size=4, block_size=4),
        extra_spans=sketch_wpl_spans(spark, str(wpl_dir)),
    )
    assert c.find('[pos="adj"]').df.count() == 1
    assert c.find('"the" [pos="adj"] within <s/>').df.count() == 1
