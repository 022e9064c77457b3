"""Linked metadata documents (reference linkedDocuments /
ConfigLinkedDocument.java): bulk CMDI scan + distributed join instead
of the reference's per-document fetch."""

from __future__ import annotations

import pytest

from blacklab_spark.index.linked import (
    link_metadata, link_values, read_linked_metadata,
)

CMDI_A = """<CMD xmlns="http://www.clarin.eu/cmd/">
  <Components>
    <Session><Country>NL</Country><Age>34</Age></Session>
    <id>rec_a</id>
  </Components>
</CMD>"""
CMDI_B = """<CMD>
  <Components>
    <Session><Country>BE</Country></Session>
    <id>rec_b</id>
  </Components>
</CMD>"""


@pytest.fixture(scope="module")
def meta_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cmdi")
    (d / "rec_a.cmdi").write_text(CMDI_A)
    (d / "rec_b.cmdi").write_text(CMDI_B)
    return d


def test_read_linked_metadata_by_file(spark, meta_dir):
    """CMDI forEach: every text leaf under /CMD/Components becomes a
    field; file-stem keying (the inputFile locator analogue)."""
    rows = {
        r["link_key"]: r["meta_fields"]
        for r in read_linked_metadata(spark, str(meta_dir)).collect()
    }
    assert set(rows) == {"rec_a", "rec_b"}
    assert rows["rec_a"]["Country"] == "NL"
    assert rows["rec_a"]["Age"] == "34"
    assert rows["rec_a"]["id"] == "rec_a"
    assert rows["rec_b"]["Country"] == "BE"


def test_read_linked_metadata_by_field(spark, meta_dir):
    rows = {
        r["link_key"] for r in
        read_linked_metadata(spark, str(meta_dir), key="id").collect()
    }
    assert rows == {"rec_a", "rec_b"}


def test_link_metadata_join(spark, meta_dir):
    """linkValues process chain (regex replace actions) + left join;
    unmatched documents keep null meta (reference warns-and-continues
    on missing linked docs)."""
    tr = spark.createDataFrame(
        [("corpus/rec_a.txt", 0, "hello"), ("corpus/rec_b.txt", 0, "world"),
         ("corpus/rec_c.txt", 0, "orphan")],
        "conv_id string, turn_idx int, text string",
    )
    # the guide's example chain: normalize slashes, keep basename, swap
    # extension (how-to-configure-indexing.md:635-646)
    actions = [
        {"action": "replace", "find": r"^.*/", "replace": ""},
        {"action": "replace", "find": r"\.txt$", "replace": ""},
    ]
    meta = read_linked_metadata(spark, str(meta_dir))
    out = link_metadata(tr, meta, "conv_id", actions)
    rows = {r["conv_id"]: r["meta_fields"] for r in out.collect()}
    assert rows["corpus/rec_a.txt"]["Country"] == "NL"
    assert rows["corpus/rec_b.txt"]["Country"] == "BE"
    assert rows["corpus/rec_c.txt"] is None
    assert out.count() == 3  # join never fans out


def test_link_values_expression(spark):
    df = spark.createDataFrame([("a\\b\\c.txt",)], "p string")
    col = link_values(
        "p",
        [
            {"action": "replace", "find": r"\\", "replace": "/"},
            {"action": "replace", "find": r"\.txt$", "replace": ".cmdi"},
        ],
    )
    assert df.select(col.alias("k")).collect()[0]["k"] == "a/b/c.cmdi"


def test_link_values_rejects_unknown_action(spark):
    with pytest.raises(ValueError, match="unsupported"):
        link_values("p", [{"action": "append", "field": "x"}])
