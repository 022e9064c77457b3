"""Convert/tag plugin layer (reference DocIndexerConvertAndTag.java +
PluginManager.java; the convert-and-tag module's example wrappers):
file → convertPlugin → tagPlugin → parser, distributed in one
mapInPandas pass."""

from __future__ import annotations

import pytest

from blacklab_spark.index.preprocess import (
    convert_markdown,
    read_with_plugins,
    register_convert_plugin,
    register_tag_plugin,
    tag_rule_pos,
)

MD = """# Title

Some *emphasized* text with a [link](http://x.example) and `code`.

```python
ignored = True
```

The quick brown fox jumped. It runs quickly!
"""


def test_convert_markdown_strips_syntax():
    text = convert_markdown(MD.encode(), "a.md")
    assert "#" not in text and "*" not in text and "`" not in text
    assert "link" in text and "http://x.example" not in text
    assert "ignored" not in text  # fenced code dropped
    assert "emphasized" in text


def test_tag_rule_pos_contract():
    tsv = tag_rule_pos("The dogs jumped. She runs quickly!")
    blocks = [b for b in tsv.split("\n\n") if b.strip()]
    assert len(blocks) == 2  # sentence split
    rows = [ln.split("\t") for ln in blocks[0].splitlines()]
    assert rows[0] == ["The", "the", "art"]
    assert rows[1] == ["dogs", "dog", "nou"]   # plural lemma strip
    assert rows[2] == ["jumped", "jumped", "vrb"]
    rows2 = [ln.split("\t") for ln in blocks[1].splitlines()]
    assert ["quickly", "quickly", "adv"] in rows2


@pytest.fixture(scope="module")
def md_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mddocs")
    (d / "doc_a.md").write_text(MD)
    (d / "doc_b.md").write_text("## B\n\nHello worlds. Testing links!")
    return str(d)


def test_read_with_plugins_tagged(spark, md_dir):
    df = read_with_plugins(spark, md_dir, convert="markdown", tag="rule-pos")
    rows = {(r["conv_id"], r["turn_idx"]): r for r in df.collect()}
    assert ("doc_b", 0) in rows and ("doc_b", 1) in rows
    b0 = rows[("doc_b", 0)]
    assert b0["text"] == "B Hello worlds"
    assert b0["ann_lemma"] == ["b", "hello", "world"]
    assert b0["ann_pos"] == ["nou", "nou", "nou"]
    b1 = rows[("doc_b", 1)]
    assert b1["text"] == "Testing links"
    assert b1["ann_pos"] == ["vrb", "nou"]
    # doc_a's fenced code never reaches the index
    assert not any("ignored" in r["text"] for r in rows.values())


def test_read_with_plugins_convert_only(spark, md_dir):
    df = read_with_plugins(spark, md_dir, convert="markdown")
    rows = {r["conv_id"]: r for r in df.collect()}
    assert set(rows) == {"doc_a", "doc_b"}
    assert "ann_lemma" not in df.columns
    assert "Hello worlds" in rows["doc_b"]["text"]


def test_plugin_format_registration_and_index_roundtrip(
    spark, md_dir, tmp_path_factory
):
    # the registered example format works through the normal dispatch
    # and the result builds + queries like any corpus
    from blacklab_spark.config import EngineConfig
    from blacklab_spark.corpus import Corpus
    from blacklab_spark.index.ingest import read_input

    df = read_input(spark, md_dir, fmt="md-tagged")
    idx = str(tmp_path_factory.mktemp("mdidx") / "idx")
    corpus = Corpus.build(spark, df, idx, EngineConfig(segment_size=8,
                                                       block_size=4))
    hits = corpus.find('[pos="vrb"] [pos="nou"]')
    got = {(r["doc_id"], r["start"]) for r in hits.df.collect()}
    assert got  # 'Testing links' at least
    # sanity: the word annotation round-trips
    assert corpus.find('"worlds"').count() == 1


def test_unknown_plugin_errors(spark, md_dir):
    with pytest.raises(ValueError, match="unknown convert plugin"):
        read_with_plugins(spark, md_dir, convert="nope")
    with pytest.raises(ValueError, match="unknown tag plugin"):
        read_with_plugins(spark, md_dir, tag="nope")


def test_custom_plugin_registration(spark, md_dir):
    register_convert_plugin("upper", lambda data, name: data.decode().upper())
    register_tag_plugin(
        "noop", lambda text: "\n".join(f"{w}\t{w.lower()}\tx"
                                       for w in text.split()[:3])
    )
    df = read_with_plugins(spark, md_dir, convert="upper", tag="noop")
    r = [x for x in df.collect() if x["conv_id"] == "doc_b"][0]
    assert r["ann_pos"] == ["x", "x", "x"]
    assert r["text"].isupper()
