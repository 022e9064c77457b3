"""HTTP adapter for the BLS REST protocol (reference server webapp,
RequestHandler.java:54-73): real requests over a loopback socket
against the shared corpus."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from blacklab_spark.search.webservice import serve


@pytest.fixture(scope="module")
def bls(small_corpus):
    corpus, _ = small_corpus
    srv = serve({"transcripts": corpus}, port=0)
    port = srv.server_address[1]

    def get(path: str):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=120
        ) as r:
            body = r.read().decode()
            ctype = r.headers.get("Content-Type", "")
            return r.status, json.loads(body) if "json" in ctype else body

    def get_err(path: str):
        try:
            return get(path)
        except urllib.error.HTTPError as e:
            body = e.read().decode()
            return e.code, json.loads(body)

    get.port = port
    yield get, get_err
    srv.shutdown()


def test_server_info(bls):
    get, _ = bls
    status, body = get("/")
    assert status == 200
    assert body["indices"]["transcripts"]["status"] == "available"


def test_corpus_metadata(bls):
    get, _ = bls
    status, body = get("/transcripts")
    assert status == 200
    assert body["documentCount"] == 1000
    assert "contents" in body["annotatedFields"]


def test_hits_endpoint(bls):
    get, _ = bls
    status, body = get(
        '/transcripts/hits?patt="word00001"&number=3&wordsaroundhit=2'
    )
    assert status == 200
    assert body["summary"]["numberOfHits"] > 3
    assert len(body["hits"]) == 3
    assert body["hits"][0]["match"]["word"] == ["word00001"]
    assert body["hits"][0]["docPid"] in body["docInfos"]


def test_hits_grouped_endpoint(bls):
    get, _ = bls
    status, body = get(
        '/transcripts/hits?patt="word00001"&group=field:role'
    )
    assert status == 200
    assert body["hitGroups"]
    assert body["summary"]["numberOfGroups"] == len(body["hitGroups"])


def test_hits_csv_endpoint(bls):
    get, _ = bls
    status, body = get(
        '/transcripts/hits?patt="word00001"&number=2&wordsaroundhit=1'
        "&outputformat=csv"
    )
    assert status == 200
    assert isinstance(body, str) and "doc_id" in body.splitlines()[0]


def test_docs_endpoint(bls):
    get, _ = bls
    status, body = get('/transcripts/docs?patt="word00001"&number=2')
    assert status == 200
    assert len(body["docs"]) == 2
    assert body["docs"][0]["numberOfHits"] >= 1


def test_docs_csv_endpoint(bls):
    get, _ = bls
    status, body = get(
        '/transcripts/docs?patt="word00001"&outputformat=csv'
    )
    assert status == 200
    header = body.splitlines()[0]
    assert "doc_id" in header and "n_hits" in header


def test_doc_info_and_contents(bls):
    get, _ = bls
    # find a real pid via a hits request
    _, h = get('/transcripts/hits?patt="word00001"&number=1')
    pid = h["hits"][0]["docPid"]
    enc = pid.replace("/", "%2F")
    status, info = get(f"/transcripts/docs/{enc}")
    assert status == 200
    assert info["docPid"] == pid
    assert info["docInfo"]["lengthInTokens"] > 0
    status, text = get(f"/transcripts/docs/{enc}/contents")
    assert status == 200
    assert "word00001" in text.lower()


def test_doc_snippet_endpoint(bls):
    get, _ = bls
    _, h = get('/transcripts/hits?patt="word00001"&number=1')
    hit = h["hits"][0]
    enc = hit["docPid"].replace("/", "%2F")
    # hit + context shape (saved-responses/docs/document snippet
    # hitstart.json: {left, match, right})
    status, body = get(
        f"/transcripts/docs/{enc}/snippet?hitstart={hit['start']}"
        f"&hitend={hit['end']}&wordsaroundhit=2"
    )
    assert status == 200
    assert set(body) == {"left", "match", "right"}
    assert body["match"]["word"] == ["word00001"]
    assert len(body["left"]["word"]) <= 2
    # fragment shape (document snippet wordstart.json: {snippet})
    status, body = get(
        f"/transcripts/docs/{enc}/snippet?wordstart=0&wordend=4"
    )
    assert status == 200
    assert set(body) == {"snippet"}
    assert len(body["snippet"]["word"]) == 4


def test_termfreq_endpoint(bls):
    get, _ = bls
    status, body = get("/transcripts/termfreq?number=5")
    assert status == 200
    tf = body["termFreq"]
    assert len(tf) == 5
    freqs = list(tf.values())
    assert freqs == sorted(freqs, reverse=True)


def test_autocomplete_endpoint(bls):
    get, _ = bls
    status, body = get("/transcripts/autocomplete/contents/word?term=word0000")
    assert status == 200
    assert isinstance(body, list)
    assert all(t.startswith("word0000") for t in body)


def test_status_and_cache_info(bls):
    get, _ = bls
    assert get("/transcripts/status")[0] == 200
    assert get("/transcripts/cache-info")[0] == 200


def test_explain_endpoint(bls):
    get, _ = bls
    status, body = get('/transcripts/explain?patt="word00001"+[]')
    assert status == 200
    assert "rewrites:" in body["explanation"]["rewrittenQuery"]


def test_post_pattgapdata(bls):
    """POSTed form parameters (the reference recommends POST for large
    pattgapdata TSV payloads)."""
    import urllib.parse

    get, _ = bls
    port = get.port
    data = urllib.parse.urlencode({
        "patt": '"@@" "@@"',
        "pattgapdata": "word00001\tword00002\nword00003\tword00004",
        "number": 5,
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/transcripts/hits", data=data,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read().decode())
    assert body["summary"]["numberOfHits"] > 0
    words = {tuple(h["match"]["word"]) for h in body["hits"]}
    assert words <= {("word00001", "word00002"), ("word00003", "word00004")}


def test_usecache_default_on(bls, small_corpus):
    """The reference's BlsCache is on by default: repeated requests
    reuse the cached hit set; usecache=no opts out per request."""
    get, _ = bls
    corpus, _pdf = small_corpus
    corpus.cache.clear()
    _, r1 = get('/transcripts/hits?patt="word00007"&number=2')
    n_cached = corpus.cache.info()["entries"]
    assert n_cached >= 1
    _, r2 = get('/transcripts/hits?patt="word00007"&number=2&first=2')
    assert r2["summary"]["numberOfHits"] == r1["summary"]["numberOfHits"]
    # opting out leaves the cache untouched
    corpus.cache.clear()
    get('/transcripts/hits?patt="word00007"&number=2&usecache=no')
    assert corpus.cache.info()["entries"] == 0


def test_error_envelopes(bls):
    _, get_err = bls
    code, body = get_err("/nosuchcorpus/hits?patt=%22x%22")
    assert code == 404
    assert body["error"]["code"] == "CANNOT_OPEN_INDEX"
    code, body = get_err("/transcripts/hits")
    assert code == 400
    assert body["error"]["code"] == "NO_PATTERN_GIVEN"
    code, body = get_err("/transcripts/hits?patt=%22unclosed")
    assert code == 400
    assert body["error"]["code"] == "INVALID_QUERY"
    code, body = get_err("/transcripts/docs/zzz%2Fnope")
    assert code == 404
    assert body["error"]["code"] == "DOC_NOT_FOUND"


def test_autocomplete_metadata_field(bls):
    # /autocomplete/<metadataField> completes distinct VALUES of that
    # field (reference ResultAutocomplete.java:30-58 routes metadata vs
    # annotated-field names through the same endpoint)
    get, _ = bls
    status, body = get("/transcripts/autocomplete/role?term=u")
    assert status == 200
    assert body == ["user"]
    status, body = get("/transcripts/autocomplete/role?term=")
    assert status == 200
    assert set(body) >= {"user", "assistant"}


def test_fields_annotation_route_and_docpid_param(bls):
    get, get_err = bls
    # fields/<annotation> serves the annotation value list (the
    # reference field-info page with subprops)
    status, body = get("/transcripts/fields/word?number=5")
    assert status == 200
    assert body["annotation"] == "word"
    assert body["fromPostings"] is True
    assert len(body["values"]) == 5
    assert body["valueListComplete"] is False
    # metadata fields keep the metadata value list
    status, body = get("/transcripts/fields/role")
    assert status == 200
    assert set(body["values"]) == {"user", "assistant", "tool"}
    # docpid scopes a hits request to one document
    status, body = get('/transcripts/hits?patt="word00010"&docpid=0')
    assert status == 200
    docs = {h["docPid"] for h in body["hits"]}
    assert len(docs) <= 1
    # unknown docpid -> 400 error envelope
    status, body = get_err('/transcripts/hits?patt="x"&docpid=zz/9')
    assert status == 400


def test_termfreq_annotation_and_filter(bls, small_corpus):
    get, _ = bls
    corpus, pdf = small_corpus
    # filter restricts counting to matching docs (reference
    # WebserviceOperations.getTermFrequencies:532 filterQuery)
    status, body = get(
        "/transcripts/termfreq?terms=word00010&filter=role:user"
    )
    assert status == 200
    want = sum(
        t.split().count("word00010")
        for t, r in zip(pdf["text"], pdf["role"]) if r == "user"
    )
    assert body["termFreq"]["word00010"] == want
    # unknown annotation errors cleanly (this corpus has word only)
    status, body = get("/transcripts/termfreq?number=3")
    assert status == 200 and len(body["termFreq"]) == 3
