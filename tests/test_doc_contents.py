"""doc-contents hit highlighting (reference ResultDocContents.java:97-187
+ DocUtil.highlightContent, search/DocUtil.java:257): the /docs/<pid>/contents
endpoint highlights `patt` hits inside the returned document, honors
wordstart/wordend windows with balanced partial fragments, strips or
adds the XML declaration per the reference's rules, and wraps partial
documents in a namespace-carrying <blacklabResponse> element.

Golden over the reference's OWN VOICE TEI corpus (test/data/input/*.xml
with voice-tei.blf.yaml) — the corpus the reference's integration test
exercises with /test/docs/PBsve430/contents?patt="the" (test/test/docs.js:69).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import pytest

from blacklab_spark.search.server import doc_contents_response

REF = "/root/reference/test/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference test data not available"
)


@pytest.fixture(scope="module")
def voice_xml(spark, tmp_path_factory):
    """VOICE corpus built WITH the original XML kept (content store)."""
    from blacklab_spark.config import EngineConfig
    from blacklab_spark.corpus import Corpus
    from blacklab_spark.index.xml_ingest import (
        load_blf_config, parse_xml_files, read_xml, xml_spans,
    )

    pat = r"[^\s]+"
    fmt = load_blf_config(os.path.join(REF, "voice-tei.blf.yaml"))
    src = os.path.join(REF, "input")
    parsed = parse_xml_files(spark, src, fmt, keep_xml=True, token_pattern=pat)
    parsed.persist()
    tr = read_xml(spark, src, fmt, parsed=parsed, keep_xml=True)
    sp = xml_spans(spark, src, fmt, parsed=parsed)
    d = str(tmp_path_factory.mktemp("voice_xml") / "idx")
    corpus = Corpus.build(
        spark, tr, d,
        EngineConfig(segment_size=2, block_size=16, token_pattern=pat),
        extra_spans=sp,
    )
    parsed.unpersist()
    return corpus


def _doc_id(corpus, pid: str) -> int:
    rows = corpus.doc_stats.filter(
        corpus.doc_stats.conv_id.startswith(pid)
    ).collect()
    assert len(rows) == 1
    return int(rows[0]["doc_id"])


_HL_RE = re.compile(r"<hl>(.*?)</hl>", re.DOTALL)
# word elements in the stored content (ElementTree-serialized, so the
# TEI default namespace appears as an explicit prefix, e.g. <ns0:w>)
_W_RE = re.compile(r"<(?:\w+:)?w[ />]")


def test_full_doc_highlights_every_hit(voice_xml):
    """docs.js:69 — /test/docs/PBsve430/contents?patt="the": every "the"
    token (and nothing else) is wrapped in well-formed <hl>."""
    did = _doc_id(voice_xml, "PBsve430")
    n_hits = (
        voice_xml.find('"the"').df.filter(f"doc_id = {did}").count()
    )
    assert n_hits > 0
    out = doc_contents_response(voice_xml, did, patt='"the"')
    # original had an XML declaration → kept, not duplicated
    assert out.count("<?xml") == 1 and out.lstrip().startswith("<?xml")
    regions = _HL_RE.findall(out)
    # "the" is never adjacent to itself in VOICE, so no merged regions:
    # one <hl> text run per hit
    assert len(regions) == n_hits
    assert all(r.lower() == "the" for r in regions)
    # well-formed: the highlighted document still parses
    ET.fromstring(out[out.index("?>") + 2:])


def test_full_doc_without_patt_is_verbatim(voice_xml):
    did = _doc_id(voice_xml, "PBsve430")
    out = doc_contents_response(voice_xml, did)
    assert "<hl>" not in out
    with open(os.path.join(REF, "input", "PBsve430.xml")) as f:
        original = f.read()
    # the stored content store region (the TEI element) comes back whole:
    # same word-element count as the source document, TEI root closed
    assert "teiHeader>" in out and out.rstrip().endswith("TEI>")
    assert original.count("<w ") == len(_W_RE.findall(out))


def test_partial_doc_window(voice_xml):
    """wordstart/wordend: balanced fragment, no inner XML declaration,
    wrapped in <blacklabResponse> carrying the root's namespaces
    (RequestHandlerDocContents.dstreamDocContents + ResultDocContents
    namespace collection)."""
    did = _doc_id(voice_xml, "PBsve430")
    out = doc_contents_response(
        voice_xml, did, patt='"the"', wordstart=0, wordend=40
    )
    body = out[out.index("?>") + 2:].lstrip()
    assert body.startswith("<blacklabResponse")
    # the TEI namespace binding from the stored root is on the wrapper
    wrapper = body[: body.index(">") + 1]
    assert 'xmlns:' in wrapper and "tei-c.org/ns/1.0" in wrapper
    # exactly 40 word elements inside the window
    assert len(_W_RE.findall(body)) == 40
    # any XML declaration of the doc itself was stripped from the body
    assert out.count("<?xml") == 1
    root = ET.fromstring(body)
    assert root.tag == "blacklabResponse"
    # hits inside the window are highlighted
    hits_in_window = (
        voice_xml.find('"the"').df
        .filter(f"doc_id = {did} and start < 40").count()
    )
    assert len(_HL_RE.findall(body)) == hits_in_window


def test_illegal_boundaries_and_routing(small_corpus):
    """HTTP surface: ILLEGAL_BOUNDARIES validation
    (ResultDocContents.java:104-106) and text-mode highlighting."""
    import json
    import urllib.error
    import urllib.request

    from blacklab_spark.search.webservice import serve

    corpus, _ = small_corpus
    srv = serve({"transcripts": corpus}, port=0)
    try:
        port = srv.server_address[1]

        def get(path):
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=120
                ) as r:
                    raw = r.read().decode()
                    ct = r.headers.get("Content-Type", "")
                    return r.status, json.loads(raw) if "json" in ct else raw
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read().decode())

        _, h = get('/transcripts/hits?patt=%22word00001%22&number=1')
        hit = h["hits"][0]
        enc = hit["docPid"].replace("/", "%2F")
        # wordend <= wordstart → 400 ILLEGAL_BOUNDARIES
        status, body = get(f"/transcripts/docs/{enc}/contents?wordstart=5&wordend=3")
        assert status == 400
        assert body["error"]["code"] == "ILLEGAL_BOUNDARIES"
        status, body = get(f"/transcripts/docs/{enc}/contents?wordstart=-2")
        assert status == 400
        # patt highlighting on a plain-text corpus
        status, text = get(
            f"/transcripts/docs/{enc}/contents?patt=%22word00001%22"
        )
        assert status == 200
        assert "<hl>" in text
        hl = _HL_RE.findall(text)
        assert hl and all("word00001" == t.lower() for t in hl)
    finally:
        srv.shutdown()


def test_content_viewable_gate(small_corpus):
    """contentViewable=false forbids /contents with the reference's
    NOT_AUTHORIZED (ResultDocContents.java:122-124 index.mayView);
    doc-info reports mayView=false; corpus info carries the flag."""
    import json
    import urllib.error
    import urllib.request

    from blacklab_spark.search.webservice import serve

    corpus, _ = small_corpus
    old = corpus.meta.get("contentViewable")
    corpus.meta["contentViewable"] = False
    srv = serve({"transcripts": corpus}, port=0)
    try:
        port = srv.server_address[1]

        def get(path):
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=120
                ) as r:
                    return r.status, json.loads(r.read().decode())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read().decode())

        _, h = get('/transcripts/hits?patt=%22word00001%22&number=1')
        enc = h["hits"][0]["docPid"].replace("/", "%2F")
        status, body = get(f"/transcripts/docs/{enc}/contents")
        assert status == 403
        assert body["error"]["code"] == "NOT_AUTHORIZED"
        assert "contentViewable" in body["error"]["message"]
        status, info = get(f"/transcripts/docs/{enc}")
        assert status == 200 and info["docInfo"]["mayView"] is False
        status, meta = get("/transcripts")
        assert meta["contentViewable"] is False
    finally:
        srv.shutdown()
        if old is None:
            corpus.meta.pop("contentViewable", None)
        else:
            corpus.meta["contentViewable"] = old
