"""XML ingestion goldens: the reference's OWN test corpus, parsed from
its native XML (reference testutil/TestIndex.java:117-170 TEST_DATA —
4 docs of `<doc pid=.. title=..><s><entity><w l=.. p=..>word</w>...`),
must index to the same doc lengths {9,12,6,10}, annotations, inline-tag
spans, and TestSearches-style query results, including the multi-value
token position "The|DOH|ZZZ" (searchable secondaries DOH/ZZZ, primary
`The` in the forward index / concordances)."""

from __future__ import annotations

import os

import pytest

from blacklab_spark.corpus import Corpus
from blacklab_spark.index.xml_ingest import (
    XmlFormat, load_blf_config, parse_xml_files, read_xml, xml_spans,
)

TEST_DATA = [
    "<doc pid='0' title='Pangram'><s><entity>"
    "<w l='the'   p='art'>The|DOH|ZZZ</w> "
    "<w l='quick' p='adj'>quick</w> "
    "<w l='brown' p='adj'>brown</w> "
    "<w l='fox'   p='nou'>fox</w></entity> "
    "<w l='jump'  p='vrb' >jumps</w> "
    "<w l='over'  p='pre' >over</w> "
    "<entity><w l='the'   p='art' >the</w> "
    "<w l='lazy'  p='adj'>lazy</w> "
    "<w l='dog'   p='nou'>dog</w></entity>.</s></doc>",
    "<doc pid='1' title='Learning words'> <w l='noot'>noot</w> "
    "<w l='mier'>mier</w> <w l='aap'>aap</w> <w l='mier'>mier</w> "
    "<w l='mier'>mier</w> <w l='mier'>mier</w> <w l='noot'>noot</w> "
    "<w l='noot'>noot</w> <w l='aap'>aap</w> <w l='aap'>aap</w> "
    "<w l='aap'>aap</w> <w l='aap'>aap</w> </doc>",
    "<doc pid='2' title='Star Wars'> <s><w l='may' p='vrb'>May</w> "
    "<entity><w l='the' p='art'>the</w> "
    "<w l='force' p='nou'>Force</w></entity> "
    "<w l='be' p='vrb'>be</w> <w l='with' p='pre'>with</w> "
    "<w l='you' p='pro'>you</w>.</s></doc>",
    "<doc pid='3' title='Bastardized Shakespeare'> <s><w l='to' p='pre'>To</w> "
    "<w l='find' p='vrb'>find</w> <w l='or' p='con'>or</w> "
    "<w l='be' p='adv'>not</w> <w l='to' p='pre'>to</w> "
    "<w l='find' p='vrb'>find</w>.</s>"
    "<s><w l='that' p='pro'>That</w> <w l='be' p='vrb'>is</w> "
    "<w l='the' p='art'>the</w> <w l='question' p='nou'>question</w>."
    "</s></doc>",
]

FMT = XmlFormat(
    document_tag="doc",
    word_tag="w",
    annotations={"lemma": "@l", "pos": "@p"},
    inline_tags=("s", "entity"),
    metadata={"conv_id": "@pid"},
)


@pytest.fixture(scope="module")
def xml_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("refxml")
    for i, doc in enumerate(TEST_DATA):
        (d / f"doc{i}.xml").write_text(doc)
    return str(d)


@pytest.fixture(scope="module")
def parsed(spark, xml_dir):
    return parse_xml_files(spark, xml_dir, FMT).cache()


def test_doc_lengths_and_text(spark, xml_dir, parsed):
    tr = read_xml(spark, xml_dir, FMT, parsed=parsed)
    rows = {r["conv_id"]: r for r in tr.collect()}
    assert set(rows) == {"0", "1", "2", "3"}
    # reference DOC_LENGTHS_TOKENS = {9, 12, 6, 10}
    lengths = {cid: len(r["text"].split()) for cid, r in rows.items()}
    assert lengths == {"0": 9, "1": 12, "2": 6, "3": 10}
    # primary value of the multi-valued position
    assert rows["0"]["text"].split()[0] == "The"
    assert rows["0"]["ann_lemma"] == [
        "the", "quick", "brown", "fox", "jump", "over", "the", "lazy", "dog",
    ]
    assert rows["0"]["ann_pos"] == [
        "art", "adj", "adj", "nou", "vrb", "pre", "art", "adj", "nou",
    ]
    # doc1 has no p annotations at all (position-aligned empties)
    assert rows["1"]["ann_pos"] == [""] * 12
    # full multivalue string lands in the ann_word sidecar
    assert rows["0"]["ann_word"][0] == "The|DOH|ZZZ"


def test_inline_tag_spans(spark, xml_dir, parsed):
    sp = xml_spans(spark, xml_dir, FMT, parsed=parsed)
    got = {
        (r["conv_id"], r["tag"], r["start"], r["end"])
        for r in sp.collect()
    }
    assert got == {
        ("0", "s", 0, 9), ("0", "entity", 0, 4), ("0", "entity", 6, 9),
        ("2", "s", 0, 6), ("2", "entity", 1, 3),
        ("3", "s", 0, 6), ("3", "s", 6, 10),
    }


@pytest.fixture(scope="module")
def xml_corpus(spark, xml_dir, parsed, small_cfg, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("xmlidx") / "idx")
    tr = read_xml(spark, xml_dir, FMT, parsed=parsed)
    sp = xml_spans(spark, xml_dir, FMT, parsed=parsed)
    return Corpus.build(spark, tr, d, small_cfg, extra_spans=sp)


def _hits(corpus, cql: str) -> set[tuple]:
    return {
        (r["doc_id"], r["start"], r["end"])
        for r in corpus.find(cql).df.select("doc_id", "start", "end").collect()
    }


def test_queries_on_xml_corpus(xml_corpus):
    c = xml_corpus
    # docs get dense ids in conv_id order 0..3
    assert _hits(c, '"quick" "brown"') == {(0, 1, 3)}
    assert _hits(c, '[pos="nou"]') == {
        (0, 3, 4), (0, 8, 9), (2, 2, 3), (3, 9, 10),
    }
    # within inline tags from the XML
    assert _hits(c, '"fox" within <entity/>') == {(0, 3, 4)}
    assert _hits(c, '<entity/> containing "force"') == {(2, 1, 3)}


def test_multivalue_word_searchable(xml_corpus):
    """Reference TestIndex.java:118-121: all values at the position are
    searchable in the reverse index; the forward index keeps the first."""
    c = xml_corpus
    assert _hits(c, '"doh"') == {(0, 0, 1)}
    assert _hits(c, '"zzz"') == {(0, 0, 1)}
    assert _hits(c, '"the"') == {(0, 0, 1), (0, 6, 7), (2, 1, 2), (3, 8, 9)}
    # sequence through a secondary value
    assert _hits(c, '"doh" "quick"') == {(0, 0, 2)}
    # concordance shows the PRIMARY value, case-preserved (the
    # reference's forward index keeps the first value's original form)
    kw = c.find('"doh"').kwic(1).collect()
    assert len(kw) == 1 and kw[0]["match"] == "The"


def test_blf_yaml_config(tmp_path, spark, xml_dir):
    cfg_path = tmp_path / "testformat.blf.yaml"
    cfg_path.write_text(
        """
name: testformat
fileType: xml
documentPath: //doc
annotatedFields:
  contents:
    wordPath: .//w
    annotations:
    - name: lemma
      valuePath: "@l"
    - name: pos
      valuePath: "@p"
    inlineTags:
    - path: .//s
    - path: .//entity
metadata:
  fields:
  - name: conv_id
    valuePath: "@pid"
"""
    )
    fmt = load_blf_config(str(cfg_path))
    assert fmt.document_tag == "doc"
    assert fmt.word_tag == "w"
    assert fmt.annotations == {"lemma": "@l", "pos": "@p"}
    assert fmt.inline_tags == ("s", "entity")
    tr = read_xml(spark, xml_dir, fmt)
    assert tr.count() == 4


def test_tei_namespace(tmp_path_factory, spark):
    """TEI P5 with namespaces: local-name matching needs no config."""
    d = tmp_path_factory.mktemp("tei")
    (d / "sample.xml").write_text(
        """<TEI xmlns="http://www.tei-c.org/ns/1.0">
  <teiHeader><fileDesc/></teiHeader>
  <text><body>
    <s><w lemma="hello" pos="INT">Hello</w>
       <w lemma="world" pos="NOU">world</w></s>
    <s><w lemma="good" pos="ADJ">Good</w>
       <w lemma="day" pos="NOU">day</w></s>
  </body></text>
</TEI>"""
    )
    tr = read_xml(spark, str(d), "tei-p5")
    rows = tr.collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "Hello world Good day"
    assert rows[0]["ann_lemma"] == ["hello", "world", "good", "day"]
    sp = xml_spans(spark, str(d), "tei-p5")
    got = {(r["tag"], r["start"], r["end"]) for r in sp.collect()}
    assert got == {("s", 0, 2), ("s", 2, 4)}


def test_keep_xml_well_formed_highlight(spark, xml_dir, small_cfg, tmp_path_factory):
    """read_xml(keep_xml=True) stores the original XML; snippets split
    <hl> at element boundaries so output stays well-formed even when
    the hit straddles tags (reference util XmlHighlighter.java)."""
    import xml.etree.ElementTree as ET

    from blacklab_spark.search.snippets import snippets, xml_highlight_region

    d = str(tmp_path_factory.mktemp("xmlhl") / "idx")
    tr = read_xml(spark, xml_dir, FMT, keep_xml=True)
    assert "xml_text" in tr.columns
    c = Corpus.build(spark, tr, d, small_cfg)
    # "fox jumps" straddles the </entity> boundary in doc 0
    sn = snippets(c, c.find('"fox" "jumps"').df, context_chars=20).collect()
    assert len(sn) == 1
    s = sn[0]["snippet"]
    assert sn[0]["match_text"] == "fox jumps"
    # both words highlighted, markup preserved; the dangling </entity>
    # closer (opener left of the window) was removed by make_well_formed
    assert "<hl>fox</hl>" in s and "<hl>jumps</hl>" in s and "<w" in s
    assert "</entity>" not in s
    # well-formed: hl tags never cross element boundaries
    ET.fromstring(f"<root>{s}</root>")
    # multivalue word position: one token, primary+secondaries in one span
    sn2 = snippets(c, c.find('"doh"').df, context_chars=5).collect()
    assert len(sn2) == 1
    assert "The|DOH|ZZZ" in sn2[0]["match_text"] or "The|DOH|ZZZ" in sn2[0]["snippet"]
    ET.fromstring(f"<root>{sn2[0]['snippet']}</root>")


def test_xml_highlight_region_splits_at_tags():
    from blacklab_spark.search.snippets import xml_highlight_region

    text = "<s>ab <b>cd</b> ef</s>"
    # highlight "ab <b>cd</b> ef" (chars 3..18)
    out = xml_highlight_region(text, 3, 18)
    assert out == "<hl>ab </hl><b><hl>cd</hl></b><hl> ef</hl>"


def test_folia_format(tmp_path_factory, spark):
    """FoLiA: <w> wraps <t> text plus lemma/pos children with class
    attributes (reference folia.blf.yaml; child-element valuePaths)."""
    d = tmp_path_factory.mktemp("folia")
    (d / "doc.xml").write_text(
        """<FoLiA xmlns="http://ilk.uvt.nl/folia" xml:id="example">
  <text>
    <p><s>
      <w><t>Hallo</t><lemma class="hallo"/><pos class="INT"/></w>
      <w><t>wereld</t><lemma class="wereld"/><pos class="N"/></w>
    </s><s>
      <w><t>dag</t><lemma class="dag"/><pos class="N"/></w>
    </s></p>
  </text>
</FoLiA>"""
    )
    tr = read_xml(spark, str(d), "folia")
    rows = tr.collect()
    assert len(rows) == 1
    assert rows[0]["conv_id"] == "example"
    assert rows[0]["text"] == "Hallo wereld dag"
    assert rows[0]["ann_lemma"] == ["hallo", "wereld", "dag"]
    assert rows[0]["ann_pos"] == ["INT", "N", "N"]
    sp = xml_spans(spark, str(d), "folia")
    got = {(r["tag"], r["start"], r["end"]) for r in sp.collect()}
    assert got == {("p", 0, 3), ("s", 0, 2), ("s", 2, 3)}


def test_make_well_formed_edges():
    from blacklab_spark.search.snippets import make_well_formed as mwf

    # dangling closers removed (opener left of window)
    assert mwf("ab</s> cd") == "ab cd"
    # unclosed openers closed at the end
    assert mwf("<s>ab <b>cd") == "<s>ab <b>cd</b></s>"
    # self-closing and comments pass through untouched
    assert mwf("<s/>ab<!-- x -->cd") == "<s/>ab<!-- x -->cd"
    # interleaved: dangling closer inside an open element
    assert mwf("<a>x</b>y") == "<a>xy</a>"
    # already balanced fragment unchanged
    frag = "<s><w>a</w> <w>b</w></s>"
    assert mwf(frag) == frag


MISALIGN_XML = (
    "<doc pid='9'><s>"
    "<w l='new-york' p='NOU'>New-York</w> "
    "<w l='gap' p='GAP'/>"
    "<w l='be' p='VRB'>is</w> "
    "<w l='big' p='ADJ'>big</w></s></doc>"
    "\n"
)


def test_subtoken_and_empty_word_alignment(spark, small_cfg, tmp_path_factory):
    """Positions are counted in ENGINE tokens: a <w> whose content
    regex-tokenizes to k != 1 tokens ('New-York' -> 2, an empty <w/>
    -> 0) must not shift later annotations or span ends (the build
    re-tokenizes text with the engine pattern)."""
    d = tmp_path_factory.mktemp("xmlmis")
    (d / "m.xml").write_text(f"<root>{MISALIGN_XML}<doc pid='8'></doc></root>")
    tr = read_xml(spark, str(d), FMT)
    rows = {r["conv_id"]: r for r in tr.collect()}
    row = rows["9"]
    assert row["text"].split() == ["New-York", "is", "big"]
    # engine tokens: New York is big — annotation values repeat across
    # a word's sub-tokens; the empty <w/> contributes no positions
    assert row["ann_pos"] == ["NOU", "NOU", "VRB", "ADJ"]
    assert row["ann_lemma"] == ["new-york", "new-york", "be", "big"]
    # a 0-token doc pads absent sidecars to 0-length arrays (the old
    # whitespace-split sizing produced 1)
    assert rows["8"]["ann_pos"] == []
    sp = xml_spans(spark, str(d), FMT)
    assert {(r["tag"], r["start"], r["end"]) for r in sp.collect()} == {
        ("s", 0, 4)
    }
    idx = str(tmp_path_factory.mktemp("xmlmisidx") / "idx")
    c = Corpus.build(spark, tr, idx, small_cfg, extra_spans=sp)
    # dense doc ids follow conv_id order: '8' -> 0, '9' -> 1
    assert _hits(c, '[pos="ADJ"]') == {(1, 3, 4)}
    assert _hits(c, '"york"') == {(1, 1, 2)}


FOLIA_SUB = (
    "<FoLiA xml:id='subdoc'><s>"
    "<w><t>grote</t><lemma class='groot'/><pos class='ADJ' head='adj'/></w> "
    "<w><t>huizen</t><lemma class='huis'/><pos class='N(soort)' head='N'/></w>"
    "</s></FoLiA>"
)


def test_folia_subannotations(spark, small_cfg, tmp_path_factory):
    """FoLiA pos subannotations (reference folia.blf.yaml
    `subannotations:` under pos; cql.jj propName NAME('.'NAME) —
    `[pos.head=..]` queries the flattened pos_head sidecar)."""
    d = tmp_path_factory.mktemp("foliasub")
    (d / "f.xml").write_text(FOLIA_SUB)
    tr = read_xml(spark, str(d), "folia")
    row = tr.collect()[0]
    assert row["ann_pos"] == ["ADJ", "N(soort)"]
    assert row["ann_pos_head"] == ["adj", "N"]
    idx = str(tmp_path_factory.mktemp("foliasubidx") / "idx")
    c = Corpus.build(spark, tr, idx, small_cfg)
    assert _hits(c, '[pos.head="N"]') == {(0, 1, 2)}
    assert _hits(c, '[pos.head="adj"] [pos.head="N"]') == {(0, 0, 2)}


def test_blf_config_subannotations(tmp_path):
    """blf.yaml-lite honors basePath + subannotations (reference
    ConfigInputFormat / folia.blf.yaml shape)."""
    p = tmp_path / "fmt.blf.yaml"
    p.write_text(
        "documentPath: //doc\n"
        "annotatedFields:\n"
        "  contents:\n"
        "    wordPath: .//w\n"
        "    annotations:\n"
        "    - name: pos\n"
        "      basePath: folia:pos\n"
        "      valuePath: \"@class\"\n"
        "      subannotations:\n"
        "      - name: head\n"
        "        valuePath: \"@head\"\n"
    )
    fmt = load_blf_config(str(p))
    assert fmt.annotations == {
        "pos": "child:pos@class",
        "pos_head": "child:pos@head",
    }


TEI_NESTED = """<TEI xmlns="http://www.tei-c.org/ns/1.0">
  <teiHeader>
    <fileDesc><titleStmt><title>Nested Sample</title></titleStmt></fileDesc>
    <profileDesc><p>Header prose that must NOT index.</p></profileDesc>
  </teiHeader>
  <text><body>
    <p><s><w lemma="the" pos="DET">The</w>
       <w lemma="unto"><choice><orig>vnto</orig><reg>unto</reg></choice></w>
       <w lemma="king" pos="NOUN">king</w></s></p>
  </body></text>
</TEI>"""


def test_tei_header_metadata_and_container(tmp_path_factory, spark):
    """Per-document metadata from a NON-attribute element
    (teiHeader//titleStmt/title text) and containerPath honored: the
    header's <p> is outside .//text, so it contributes neither tokens
    nor spans (reference tei-p5.blf.yaml documentPath //TEI +
    containerPath .//text)."""
    d = tmp_path_factory.mktemp("teinest")
    (d / "a.xml").write_text(TEI_NESTED)
    tr = read_xml(spark, str(d), "tei-p5")
    row = tr.collect()[0]
    assert row["meta_title"] == "Nested Sample"
    assert "Header prose" not in row["text"]
    sp = {(r["tag"], r["start"], r["end"])
          for r in xml_spans(spark, str(d), "tei-p5").collect()}
    # exactly one <p> and one <s> span, both over the 3 body tokens
    assert sp == {("p", 0, 3), ("s", 0, 3)}


def test_tei_choice_word_value(tmp_path_factory, spark):
    """TEI <choice> two levels under <w>: with word_value
    'child:choice/orig' the original form indexes as the token text and
    a 'reg' annotation reads the regularized form from the nested
    element — nested element valuePaths beyond one level
    (reference DocIndexerXPath arbitrary XPath; our chain subset)."""
    d = tmp_path_factory.mktemp("teichoice")
    (d / "a.xml").write_text(TEI_NESTED)
    fmt = XmlFormat(
        document_tag="TEI", container_tag="text", word_tag="w",
        word_value="child:choice/orig",
        annotations={"lemma": "@lemma", "reg": "child:choice/reg"},
        inline_tags=("s",), metadata={"title": "desc:titleStmt/title"},
        name="tei-choice",
    )
    row = read_xml(spark, str(d), fmt).collect()[0]
    assert row["text"] == "The vnto king"  # orig form wins for choice words
    assert row["ann_reg"] == ["", "unto", ""]
    assert row["ann_lemma"] == ["the", "unto", "king"]


FOLIA_NESTED = """<FoLiA xmlns="http://ilk.uvt.nl/folia" xml:id="nested1">
  <metadata type="native">
    <annotations/>
    <meta id="title">Folia Nested</meta>
    <meta id="language">nl</meta>
  </metadata>
  <text>
    <s>
      <w xml:id="w1"><t>katten</t><lemma class="kat"/>
        <pos class="N(soort)"><feat subset="head" class="N"/></pos>
        <morphology><morpheme><t>kat</t><lemma class="kat-m"/></morpheme></morphology>
      </w>
      <w xml:id="w2"><t>slapen</t><lemma class="slapen"/>
        <pos class="WW(pv)"><feat subset="head" class="WW"/></pos>
      </w>
    </s>
  </text>
</FoLiA>"""


def test_folia_nested_layers(tmp_path_factory, spark):
    """FoLiA beyond one level: word text from the <t> child (NOT the
    concatenation of every descendant's text), a feat annotation two
    levels down via a predicated chain, a morphology-layer lemma three
    levels down, and native <meta id=..> element metadata."""
    d = tmp_path_factory.mktemp("folianest")
    (d / "a.xml").write_text(FOLIA_NESTED)
    fmt = XmlFormat(
        document_tag="FoLiA", word_tag="w", word_value="child:t",
        annotations={
            "lemma": "child:lemma@class",
            "pos": "child:pos@class",
            "head": "child:pos/feat[@subset=head]@class",
            "mlemma": "child:morphology/morpheme/lemma@class",
        },
        inline_tags=("s",),
        metadata={"conv_id": "@xml:id", "title": "desc:meta[@id=title]",
                  "role": "desc:meta[@id=language]"},
        name="folia-nested",
    )
    row = read_xml(spark, str(d), fmt).collect()[0]
    # <t> is the word text: morphology's inner 'kat' must not leak in
    assert row["text"] == "katten slapen"
    assert row["conv_id"] == "nested1"
    assert row["meta_title"] == "Folia Nested"
    assert row["role"] == "nl"
    assert row["ann_lemma"] == ["kat", "slapen"]
    assert row["ann_head"] == ["N", "WW"]
    assert row["ann_mlemma"] == ["kat-m", ""]


def test_builtin_folia_word_from_t(tmp_path_factory, spark):
    """The built-in folia format reads word text from <t> (reference
    folia.blf.yaml valuePath folia:t): a word carrying nested layers
    must tokenize to ONE engine token, keeping annotation alignment."""
    d = tmp_path_factory.mktemp("foliat")
    (d / "a.xml").write_text(FOLIA_NESTED)
    row = read_xml(spark, str(d), "folia").collect()[0]
    assert row["text"] == "katten slapen"
    assert row["ann_lemma"] == ["kat", "slapen"]
    assert row["meta_title"] == "Folia Nested"


def test_blf_config_nested_paths(tmp_path):
    """blf.yaml normalization of the reference configs' own path
    shapes: containerPath, the main 'word' annotation's element
    valuePath (folia:t), slashed element+attribute valuePaths, and
    metadata element paths."""
    p = tmp_path / "fmt.blf.yaml"
    p.write_text(
        "documentPath: //folia:FoLiA\n"
        "annotatedFields:\n"
        "  contents:\n"
        "    containerPath: .//folia:text\n"
        "    wordPath: .//folia:w\n"
        "    annotations:\n"
        "    - name: word\n"
        "      valuePath: folia:t\n"
        "    - name: lemma\n"
        "      valuePath: folia:lemma/@class\n"
        "    - name: head\n"
        "      valuePath: folia:pos/folia:feat/@class\n"
        "metadata:\n"
        "  fields:\n"
        "  - name: title\n"
        "    valuePath: .//meta[@id='title']\n"
    )
    fmt = load_blf_config(str(p))
    assert fmt.document_tag == "FoLiA"
    assert fmt.container_tag == "text"
    assert fmt.word_value == "child:t"
    assert fmt.annotations == {
        "lemma": "child:lemma@class",
        "head": "child:pos/feat@class",
    }
    assert fmt.metadata == {"title": "desc:meta[@id='title']"}


NAF_DOC = """<NAF>
  <text>
    <wf id="w1">The</wf><wf id="w2">quick</wf><wf id="w3">fox</wf>
    <wf id="w4">jumps</wf>
  </text>
  <terms>
    <term id="t1" lemma="the" pos="det"><span><target id="w1"/></span></term>
    <term id="t2" lemma="quick" pos="adj"><span><target id="w2"/></span></term>
    <term id="t3" lemma="fox" pos="noun"><span><target id="w3"/></span></term>
    <term id="t4" lemma="jump" pos="verb"><span><target id="w4"/></span></term>
    <term id="mwe" lemma="quick_fox" pos="mwe"><span>
      <target id="w2"/><target id="w3"/></span></term>
    <term id="bad" lemma="ghost" pos="x"><span><target id="nope"/></span></term>
  </terms>
</NAF>"""


def test_naf_standoff_annotations(tmp_path_factory, spark):
    """NAF standoff layer (reference naf.blf.yaml standoffAnnotations):
    lemma/pos live under <terms>, tied to <wf> tokens by id; a
    multi-target term lands at every referenced position as an extra
    `|` value; unresolved refs are skipped like the reference's warn()
    (DocIndexerXPath.java:446-455)."""
    d = tmp_path_factory.mktemp("naf")
    (d / "doc.naf").write_text(NAF_DOC)
    rows = read_xml(spark, str(d), "naf").collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "The quick fox jumps"
    assert rows[0]["ann_lemma"] == ["the", "quick|quick_fox", "fox|quick_fox", "jump"]
    assert rows[0]["ann_pos"] == ["det", "adj|mwe", "noun|mwe", "verb"]


def test_naf_standoff_searchable(tmp_path_factory, spark, small_cfg):
    """Standoff values reach the annotation search surface: both the
    primary and the extra `|` value at a position match [lemma=...]."""
    d = tmp_path_factory.mktemp("nafidx")
    (d / "doc.naf").write_text(NAF_DOC)
    tr = read_xml(spark, str(d), "naf")
    corpus = Corpus.build(
        spark, tr, str(d / "idx"), small_cfg,
        extra_spans=xml_spans(spark, str(d), "naf"),
    )
    assert corpus.find('[lemma="quick_fox"]').df.count() == 2
    assert corpus.find('[lemma="fox" & pos="noun"]').df.count() == 1


def test_span_standoff(tmp_path_factory, spark):
    """Span standoffs (ConfigStandoffAnnotations.spanEndPath): start =
    first token ref, end from span_end (inclusive -> exclusive +1 like
    DocIndexerXPath.java:475-477), name from spanNamePath, annotations
    as span attributes; surfaced through xml_spans."""
    from blacklab_spark.index.xml_ingest import StandoffSpec

    fmt_inc = XmlFormat(
        document_tag="doc", word_tag="w", annotations={}, inline_tags=(),
        metadata={}, token_id="@id", name="t",
        standoff=(
            StandoffSpec(
                path="entities/entity", token_ref="child:span/target@id",
                span_end="child:span/last@id", span_end_inclusive=True,
                span_name="@type", annotations={"cls": "@class"},
            ),
        ),
    )
    d = tmp_path_factory.mktemp("spanso")
    (d / "doc.xml").write_text(
        """<doc>
  <w id="a">New</w><w id="b">York</w><w id="c">rocks</w>
  <entities>
    <entity type="loc" class="GPE"><span><target id="a"/><last id="b"/></span></entity>
  </entities>
</doc>"""
    )
    got = {
        (r["tag"], r["start"], r["end"], r["attrs"]["cls"])
        for r in xml_spans(spark, str(d), fmt_inc).collect()
    }
    assert got == {("loc", 0, 2, "GPE")}
    # exclusive end: same doc, span_end points at the first token OUTSIDE
    fmt_exc = XmlFormat(
        document_tag="doc", word_tag="w", annotations={}, inline_tags=(),
        metadata={}, token_id="@id", name="t2",
        standoff=(
            StandoffSpec(
                path="entities/entity", token_ref="child:span/target@id",
                span_end="child:span/out@id", span_end_inclusive=False,
                span_name="=ent",
            ),
        ),
    )
    (d / "doc2.xml").write_text(
        """<doc>
  <w id="a">New</w><w id="b">York</w><w id="c">rocks</w>
  <entities>
    <entity><span><target id="a"/><out id="c"/></span></entity>
  </entities>
</doc>"""
    )
    (d / "doc.xml").unlink()
    got2 = {
        (r["tag"], r["start"], r["end"])
        for r in xml_spans(spark, str(d), fmt_exc).collect()
    }
    assert got2 == {("ent", 0, 2)}


def test_blf_config_standoff(tmp_path):
    """standoffAnnotations + tokenIdPath parse from blf.yaml (the
    reference's naf.blf.yaml shape, InputFormatReader standoff keys)."""
    p = tmp_path / "naf.blf.yaml"
    p.write_text(
        "documentPath: //NAF\n"
        "annotatedFields:\n"
        "  contents:\n"
        "    containerPath: .//text\n"
        "    wordPath: .//wf\n"
        "    tokenIdPath: \"@id\"\n"
        "    annotations:\n"
        "    - name: word\n"
        "      valuePath: .\n"
        "    standoffAnnotations:\n"
        "    - path: terms/term\n"
        "      tokenRefPath: ./span/target/@id\n"
        "      annotations:\n"
        "      - name: lemma\n"
        "        valuePath: \"@lemma\"\n"
        "    - path: /NAF/entities/entity\n"
        "      tokenRefPath: ./span/target/@id\n"
        "      spanEndPath: ./span/last/@id\n"
        "      spanEndIsInclusive: true\n"
        "      spanNamePath: \"'entity'\"\n"
    )
    fmt = load_blf_config(str(p))
    assert fmt.token_id == "@id"
    so_ann, so_span = fmt.standoff
    assert so_ann.path == "terms/term"
    assert so_ann.token_ref == "child:span/target@id"
    assert so_ann.annotations == {"lemma": "@lemma"}
    assert not so_ann.span_end
    assert so_span.path == "entities/entity"
    assert so_span.span_end == "child:span/last@id"
    assert so_span.span_end_inclusive is True
    assert so_span.span_name == "=entity"


EAF_DOC = """<ANNOTATION_DOCUMENT>
  <TIER LINGUISTIC_TYPE_REF="Words" TIER_ID="W">
    <ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="a1">
      <ANNOTATION_VALUE>Hello</ANNOTATION_VALUE>
    </ALIGNABLE_ANNOTATION></ANNOTATION>
    <ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="a2">
      <ANNOTATION_VALUE>world</ANNOTATION_VALUE>
    </ALIGNABLE_ANNOTATION></ANNOTATION>
  </TIER>
  <TIER LINGUISTIC_TYPE_REF="Utterance" TIER_ID="U">
    <ANNOTATION><ALIGNABLE_ANNOTATION ANNOTATION_ID="u1">
      <ANNOTATION_VALUE>Hello world</ANNOTATION_VALUE>
    </ALIGNABLE_ANNOTATION></ANNOTATION>
  </TIER>
  <TIER LINGUISTIC_TYPE_REF="Lemma" TIER_ID="L">
    <ANNOTATION><REF_ANNOTATION ANNOTATION_ID="l1" ANNOTATION_REF="a1">
      <ANNOTATION_VALUE>hello</ANNOTATION_VALUE>
    </REF_ANNOTATION></ANNOTATION>
    <ANNOTATION><REF_ANNOTATION ANNOTATION_ID="l2" ANNOTATION_REF="a2">
      <ANNOTATION_VALUE>world</ANNOTATION_VALUE>
    </REF_ANNOTATION></ANNOTATION>
  </TIER>
  <TIER LINGUISTIC_TYPE_REF="PoS" TIER_ID="P">
    <ANNOTATION><REF_ANNOTATION ANNOTATION_ID="p1" ANNOTATION_REF="a1">
      <ANNOTATION_VALUE>intj</ANNOTATION_VALUE>
    </REF_ANNOTATION></ANNOTATION>
  </TIER>
</ANNOTATION_DOCUMENT>"""


def test_eaf_format(tmp_path_factory, spark):
    """EAF (reference eaf.blf.yaml): only the Words tier tokenizes —
    the tier-predicated multi-step wordPath must skip the Utterance
    tier's ALIGNABLE_ANNOTATIONs; lemma/pos arrive as REF_ANNOTATION
    standoffs keyed by @ANNOTATION_REF."""
    d = tmp_path_factory.mktemp("eaf")
    (d / "rec.eaf").write_text(EAF_DOC)
    rows = read_xml(spark, str(d), "eaf").collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "Hello world"  # Utterance tier NOT tokenized
    assert rows[0]["ann_lemma"] == ["hello", "world"]
    assert rows[0]["ann_pos"] == ["intj", ""]


TCF_DOC = """<D-Spin xmlns:tc="http://www.dspin.de/data/textcorpus"
    xmlns:md="http://www.dspin.de/data/metadata">
  <md:MetaData>
    <md:Source><md:Country>NL</md:Country></md:Source>
    <md:Title>A tiny corpus</md:Title>
  </md:MetaData>
  <tc:TextCorpus>
    <tc:tokens>
      <tc:token ID="t1">Dogs</tc:token>
      <tc:token ID="t2">bark</tc:token>
      <tc:token ID="t3">loudly</tc:token>
    </tc:tokens>
    <tc:lemmas>
      <tc:lemma tokenIDs="t1">dog</tc:lemma>
      <tc:lemma tokenIDs="t2 t3">bark_loudly</tc:lemma>
    </tc:lemmas>
    <tc:POStags>
      <tc:tag tokenIDs="t1">noun</tc:tag>
      <tc:tag tokenIDs="t2">verb</tc:tag>
    </tc:POStags>
    <tc:sentences>
      <tc:sentence tokenIDs="t1 t2 t3"/>
    </tc:sentences>
  </tc:TextCorpus>
</D-Spin>"""


def test_tcf_format(tmp_path_factory, spark):
    """TCF (reference tcf.blf.yaml): standoff lemma/pos layers reference
    tokens via space-separated @tokenIDs lists (the reference resolves
    them with a contains() XPath — same indexed result); sentence layer
    becomes spans; CMDI header leaves become forEach metadata fields."""
    d = tmp_path_factory.mktemp("tcf")
    (d / "doc.tcf").write_text(TCF_DOC)
    rows = read_xml(spark, str(d), "tcf").collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "Dogs bark loudly"
    assert rows[0]["ann_lemma"] == ["dog", "bark_loudly", "bark_loudly"]
    assert rows[0]["ann_pos"] == ["noun", "verb", ""]
    assert rows[0]["meta_fields"]["Country"] == "NL"
    assert rows[0]["meta_fields"]["Title"] == "A tiny corpus"
    got = {
        (r["tag"], r["start"], r["end"])
        for r in xml_spans(spark, str(d), "tcf").collect()
    }
    assert got == {("s", 0, 3)}


def test_blf_config_eaf_shape(tmp_path):
    """A tier-predicated multi-step wordPath (eaf.blf.yaml) parses into
    word_path + word_tag; absolute standoff TIER paths resolve."""
    p = tmp_path / "eaf.blf.yaml"
    p.write_text(
        "documentPath: /ANNOTATION_DOCUMENT\n"
        "annotatedFields:\n"
        "  contents:\n"
        "    wordPath: \"TIER[@LINGUISTIC_TYPE_REF='Words']"
        "/ANNOTATION/ALIGNABLE_ANNOTATION\"\n"
        "    tokenIdPath: \"@ANNOTATION_ID\"\n"
        "    annotations:\n"
        "    - name: word\n"
        "      valuePath: ANNOTATION_VALUE\n"
        "    standoffAnnotations:\n"
        "    - path: \"/ANNOTATION_DOCUMENT/TIER[@LINGUISTIC_TYPE_REF="
        "'Lemma']/ANNOTATION/REF_ANNOTATION\"\n"
        "      tokenRefPath: \"@ANNOTATION_REF\"\n"
        "      annotations:\n"
        "      - name: lemma\n"
        "        valuePath: ANNOTATION_VALUE\n"
    )
    fmt = load_blf_config(str(p))
    assert fmt.word_tag == "ALIGNABLE_ANNOTATION"
    assert fmt.word_path == (
        "TIER[@LINGUISTIC_TYPE_REF='Words']/ANNOTATION/ALIGNABLE_ANNOTATION"
    )
    assert fmt.word_value == "child:ANNOTATION_VALUE"
    (so,) = fmt.standoff
    assert so.path == "TIER[@LINGUISTIC_TYPE_REF='Lemma']/ANNOTATION/REF_ANNOTATION"
    assert so.token_ref == "@ANNOTATION_REF"


def test_blf_config_foreach_metadata(tmp_path):
    """List-form metadata blocks with containerPath + forEachPath
    (tcf.blf.yaml CMDI idiom) set metadata_foreach; type-only field
    refinements in the block don't become attribute shorthands."""
    p = tmp_path / "m.blf.yaml"
    p.write_text(
        "documentPath: /D-Spin\n"
        "annotatedFields:\n"
        "  contents:\n"
        "    containerPath: tc:TextCorpus\n"
        "    wordPath: tc:tokens/tc:token\n"
        "metadata:\n"
        "- containerPath: md:MetaData\n"
        "  fields:\n"
        "  - forEachPath: .//*[not(*) and text()]\n"
        "    namePath: local-name()\n"
        "    valuePath: .\n"
        "  - name: Country\n"
        "    type: untokenized\n"
    )
    fmt = load_blf_config(str(p))
    assert fmt.metadata_foreach == "MetaData"
    assert fmt.word_path == "tokens/token"
    assert fmt.word_tag == "token"
    assert "Country" not in fmt.metadata


def test_tei_legacy_variants(tmp_path_factory, spark):
    """Legacy TEI presets (reference tei-p4-legacy / tei-p5-legacy
    .blf.yaml): PoS in @type; P4 roots at <TEI.2>."""
    d = tmp_path_factory.mktemp("teileg")
    (d / "p4.xml").write_text(
        "<TEI.2><text><s>"
        "<w lemma='old' type='adj'>Olde</w>"
        "<w lemma='book' type='nou'>booke</w>"
        "</s></text></TEI.2>"
    )
    rows = read_xml(spark, str(d), "tei-p4-legacy").collect()
    assert len(rows) == 1
    assert rows[0]["ann_pos"] == ["adj", "nou"]
    (d / "p4.xml").unlink()
    (d / "p5.xml").write_text(
        "<TEI><text><s><w lemma='new' type='adj'>Newe</w></s></text></TEI>"
    )
    rows = read_xml(spark, str(d), "tei-p5-legacy").collect()
    assert rows[0]["ann_pos"] == ["adj"]


def test_cmdi_metadata_only(tmp_path_factory, spark):
    """CMDI (reference cmdi.blf.yaml): metadata-only — the forEach
    container is the document element itself; no tokens."""
    from blacklab_spark.index.xml_ingest import parse_xml_files

    d = tmp_path_factory.mktemp("cmdi_fmt")
    (d / "m.cmdi").write_text(
        "<CMD><Components><Session><Country>NL</Country></Session>"
        "<id>rec1</id></Components></CMD>"
    )
    rows = parse_xml_files(spark, str(d), "cmdi").collect()
    assert len(rows) == 1
    assert rows[0]["text"] == ""
    assert rows[0]["metadata"]["Country"] == "NL"
    assert rows[0]["metadata"]["id"] == "rec1"


REF_TESTFORMAT = (
    "/root/reference/core/src/main/resources/formats/testformat.blf.yaml"
)


@pytest.mark.skipif(
    not os.path.exists(REF_TESTFORMAT), reason="reference repo not present"
)
def test_reference_testformat_yaml_loads_and_ingests(spark, xml_dir):
    # The reference's ACTUAL shipped testformat.blf.yaml (not a
    # hand-copy) drives ingestion of its own TEST_DATA corpus
    # (TestIndex.java:117-170): same doc lengths, annotations,
    # metadata, and inline spans as the registered preset.
    from blacklab_spark.index.xml_ingest import FORMATS

    fmt = load_blf_config(REF_TESTFORMAT)
    assert fmt.document_tag == "doc" and fmt.word_tag == "w"
    assert fmt.annotations == {"lemma": "@l", "pos": "@p"}
    assert fmt.inline_tags == ("s", "entity")
    assert fmt.metadata.get("title") == "@title"
    df = read_xml(spark, str(xml_dir), fmt).orderBy("meta_pid")
    rows = df.collect()
    assert [len(r["text"].split()) for r in rows] == [9, 12, 6, 10]
    assert [r["meta_pid"] for r in rows] == ["0", "1", "2", "3"]
    assert rows[0]["meta_title"] == "Pangram"
    assert list(rows[0]["ann_lemma"][:4]) == ["the", "quick", "brown", "fox"]
    # the registered 15th preset matches the shipped config's shape
    reg = FORMATS["testformat"]
    assert reg.word_tag == fmt.word_tag
    assert reg.annotations == fmt.annotations
    assert reg.inline_tags == fmt.inline_tags


def test_process_operations_parity():
    # reference TestProcessingOperations.testOpPartOfSpeechParse
    from blacklab_spark.index.xml_ingest import _op_parse_pos, apply_process

    assert _op_parse_pos("NOU-C()", "_") == "NOU-C"
    assert _op_parse_pos("NOU-C(gender=f,number=pl)", "_") == "NOU-C"
    assert _op_parse_pos("NOU-C(gender=f,number=pl)", "gender") == "f"
    assert _op_parse_pos("NOU-C(gender=f,number=pl)", "number") == "pl"
    assert _op_parse_pos("NOU-C(gender=f,number=pl)", "type") == ""
    # the op chain (DocIndexerConfig.processStringMultipleValues)
    assert apply_process(["a|b|c"], [{"action": "split",
                                      "separator": r"\|",
                                      "keep": "all"}]) == ["a", "b", "c"]
    assert apply_process(["a;b"], [{"action": "split"}]) == ["a"]
    assert apply_process(["a;b"], [{"action": "split",
                                    "keep": "both"}]) == ["a;b", "a", "b"]
    assert apply_process(["x1y2"], [{"action": "replace", "find": r"(\d)",
                                     "replace": "<$1>"}]) == ["x<1>y<2>"]
    assert apply_process([""], [{"action": "default",
                                 "value": "unknown"}]) == ["unknown"]
    assert apply_process(["v"], [{"action": "append",
                                  "value": "w"}]) == ["v w"]
    assert apply_process(["--v--"], [{"action": "strip",
                                      "chars": "-"}]) == ["v"]
    assert apply_process(["1;10.30"],
                         [{"action": "chatFormatAgeToMonths"}]) == ["23"]
    assert apply_process(["raw"], [], {"raw": "mapped"}) == ["mapped"]
    meta = {"y": "2000", "m": "10", "d": "19"}
    assert apply_process([""], [{"action": "concatDate", "yearField": "y",
                                 "monthField": "m", "dayField": "d",
                                 "autofill": "start"}],
                         get_meta=meta.get) == ["20001019"]
    assert apply_process([""], [{"action": "concatDate", "yearField": "y",
                                 "monthField": "zz", "dayField": "zz",
                                 "autofill": "end"}],
                         get_meta=meta.get) == ["20001231"]


def test_process_steps_through_blf_config(tmp_path, spark):
    # a config with process/mapValues on an annotation and a metadata
    # field drives ingestion (reference DocIndexerConfig.processValue)
    cfg_path = tmp_path / "proc.blf.yaml"
    cfg_path.write_text(
        """
name: proc
documentPath: //doc
annotatedFields:
  contents:
    wordPath: .//w
    annotations:
    - name: pos
      valuePath: "@p"
      process:
        - action: parsePos
          field: _
    - name: gender
      valuePath: "@p"
      process:
        - action: parsePos
          field: gender
        - action: default
          value: none
      mapValues:
        f: female
metadata:
  fields:
  - name: lang
    valuePath: "@lang"
    process:
      - action: default
        value: eng
      - action: append
        value: "(auto)"
"""
    )
    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.xml").write_text(
        "<doc><w p='NOU-C(gender=f,number=pl)'>cats</w>"
        "<w p='VRB()'>run</w></doc>"
    )
    from blacklab_spark.index.xml_ingest import load_blf_config, read_xml

    fmt = load_blf_config(str(cfg_path))
    assert "pos" in fmt.processing and "lang" in fmt.meta_processing
    rows = read_xml(spark, str(d), fmt).collect()
    assert len(rows) == 1
    r = rows[0]
    assert list(r["ann_pos"]) == ["NOU-C", "VRB"]
    assert list(r["ann_gender"]) == ["female", "none"]
    assert r["meta_lang"] == "eng (auto)"


# ---- round 5: loud non-lite XPath rejection + predicate depth step ----

def _write_cfg(tmp_path_factory, text):
    d = tmp_path_factory.mktemp("blf")
    p = os.path.join(str(d), "custom.blf.yaml")
    with open(p, "w") as f:
        f.write(text)
    return p


def test_saxon_only_config_rejected_loudly(tmp_path_factory):
    """A Saxon-only valuePath must fail AT CONFIG LOAD with the
    construct named (r4 risk: silent empty annotations; reference
    evaluates real XPath via DocIndexerSaxon/SaxonHelper)."""
    from blacklab_spark.index.xml_ingest import UnsupportedXPathError

    cases = {
        "ancestor::div/@type": "axis",
        "concat(@a, @b)": "function call 'concat()'",
        "w/@a | w/@b": "union",
        "../@prev": "parent-axis",
        "*[@x='1']": "wildcard",
        "w[@a='1'][@b='2']": "multiple step predicates",
        "w[last()]": "predicate",
    }
    for vp, construct in cases.items():
        cfg = (
            "documentPath: /doc\n"
            "annotatedFields:\n  contents:\n    wordPath: .//w\n"
            "    annotations:\n    - name: word\n      valuePath: .\n"
            f"    - name: broken\n      valuePath: \"{vp}\"\n"
        )
        p = _write_cfg(tmp_path_factory, cfg)
        with pytest.raises(UnsupportedXPathError) as ei:
            load_blf_config(p)
        assert construct.split()[0] in str(ei.value), (vp, str(ei.value))
    # positional predicates are allowed on valuePaths but NOT wordPath
    cfg = (
        "documentPath: /doc\n"
        "annotatedFields:\n  contents:\n    wordPath: .//w[2]\n"
        "    annotations:\n    - name: word\n      valuePath: .\n"
    )
    with pytest.raises(UnsupportedXPathError, match="positional"):
        load_blf_config(_write_cfg(tmp_path_factory, cfg))


def test_positional_and_contains_predicates(tmp_path_factory, spark):
    """Round-5 depth step: [N] positional and [contains(@a,'v')]
    predicates in valuePaths (the most common non-lite forms in user
    configs; reference evaluates them via real XPath)."""
    d = tmp_path_factory.mktemp("predxml")
    with open(os.path.join(str(d), "a.xml"), "w") as f:
        f.write(
            "<doc pid='p0'>"
            "<w><alt>first</alt><alt>second</alt>"
            "<f kind='msd-case'>nom</f><f kind='other'>x</f>ww1</w>"
            "<w><alt>uno</alt><alt>dos</alt>"
            "<f kind='msd-case'>acc</f>ww2</w>"
            "</doc>"
        )
    cfg = (
        "documentPath: /doc\n"
        "annotatedFields:\n  contents:\n    wordPath: .//w\n"
        "    annotations:\n"
        "    - name: word\n      valuePath: .\n"
        "    - name: alt2\n      valuePath: alt[2]\n"
        "    - name: case\n"
        "      valuePath: \"f[contains(@kind,'case')]\"\n"
    )
    fmt = load_blf_config(_write_cfg(tmp_path_factory, cfg))
    tr = read_xml(spark, str(d), fmt)
    rows = tr.collect()
    assert len(rows) == 1
    assert rows[0]["ann_alt2"] == ["second", "dos"]
    assert rows[0]["ann_case"] == ["nom", "acc"]
