"""Prometheus metrics surface (reference instrumentation module:
PrometheusMetricsProvider /metrics scrape + RequestInstrumentationProvider
request tags)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from blacklab_spark.search.metrics import MetricsRegistry, bind_corpus_gauges
from blacklab_spark.search.webservice import _Router, serve


class FakeCorpus:
    """meta/cache_info are plain dicts — no Spark needed."""

    meta = {"n_docs": 42, "total_tokens": 1234}

    def cache_info(self):
        return {"entries": 3, "hits": 7, "misses": 2}


def test_registry_counts_and_format():
    reg = MetricsRegistry()
    reg.record_request("c1", "hits", 200, 0.25)
    reg.record_request("c1", "hits", 200, 0.75)
    reg.record_request("c1", "docs", 404, 0.1)
    text = reg.scrape()
    assert (
        'blacklab_requests_total{corpus="c1",operation="hits",status="200"} 2'
        in text
    )
    assert (
        'blacklab_requests_total{corpus="c1",operation="docs",status="404"} 1'
        in text
    )
    assert 'blacklab_request_seconds_count{corpus="c1",operation="hits"} 2' in text
    assert 'blacklab_request_seconds_sum{corpus="c1",operation="hits"} 1.000000' in text
    assert 'blacklab_request_seconds_max{corpus="c1",operation="hits"} 0.750000' in text
    assert "process_cpu_seconds_total" in text
    # TYPE lines precede their series (text format 0.0.4)
    lines = text.splitlines()
    assert lines.index("# TYPE blacklab_requests_total counter") < lines.index(
        'blacklab_requests_total{corpus="c1",operation="docs",status="404"} 1'
    )


def test_corpus_gauges_without_spark():
    reg = MetricsRegistry()
    bind_corpus_gauges(reg, {"mini": FakeCorpus()})
    text = reg.scrape()
    assert 'blacklab_index_documents{corpus="mini"} 42' in text
    assert 'blacklab_index_tokens{corpus="mini"} 1234' in text
    assert 'blacklab_cache_searches{corpus="mini",kind="hits"} 7' in text


def test_label_escaping():
    reg = MetricsRegistry()
    reg.record_request('we"ird\\c', "hits", 200, 0.1)
    text = reg.scrape()
    assert 'corpus="we\\"ird\\\\c"' in text


def test_operation_label_cardinality():
    f = _Router({"mycorpus": FakeCorpus()}).operation_label
    assert f("/") == ("-", "server-info")
    assert f("/metrics") == ("-", "metrics")
    assert f("/input-formats") == ("-", "input-formats")
    assert f("/mycorpus") == ("mycorpus", "corpus-info")
    assert f("/mycorpus/hits") == ("mycorpus", "hits")
    assert f("/mycorpus/docs") == ("mycorpus", "docs")
    # pid segments never become label values
    assert f("/mycorpus/docs/conv0%2F3") == ("mycorpus", "doc-info")
    assert f("/mycorpus/docs/conv0%2F3/contents") == ("mycorpus", "docs-contents")
    assert f("/mycorpus/docs/conv0%2F3/snippet") == ("mycorpus", "docs-snippet")
    # unknown paths (scanner probes, typo'd corpora) collapse to one
    # series each way — the registry cannot grow without bound
    assert f("/favicon.ico") == ("-", "unknown")
    assert f("/nosuchcorpus/hits") == ("-", "unknown")
    assert f("/mycorpus/nosuchop") == ("mycorpus", "unknown")
    assert f("/mycorpus/docs/pid/garbage") == ("mycorpus", "unknown")


def test_reserved_corpus_name_rejected():
    """A corpus named after a server route would be unreachable — the
    router refuses to mount it (ADVICE r4: /metrics shadowing)."""
    with pytest.raises(ValueError, match="metrics"):
        _Router({"metrics": FakeCorpus()})


def test_metrics_endpoint_router_no_spark():
    """/metrics dispatches without touching any corpus."""
    router = _Router({"mini": FakeCorpus()})
    status, body = router.handle("/metrics", {})
    assert status == 200 and isinstance(body, str)
    assert 'blacklab_index_documents{corpus="mini"} 42' in body


@pytest.mark.usefixtures("small_corpus")
def test_metrics_endpoint_http(small_corpus):
    """End-to-end over HTTP: requests are metered with corpus/operation
    tags and the scrape itself is not."""
    corpus, _ = small_corpus
    srv = serve({"transcripts": corpus}, port=0)
    try:
        port = srv.server_address[1]

        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=120
            ) as r:
                return r.status, r.read().decode()

        get("/transcripts/status")
        get('/transcripts/hits?patt=%22word00001%22&number=3')
        status, text = get("/metrics")
        assert status == 200
        assert (
            'blacklab_requests_total{corpus="transcripts",operation="status",status="200"} 1'
            in text
        )
        assert (
            'blacklab_requests_total{corpus="transcripts",operation="hits",status="200"} 1'
            in text
        )
        assert 'blacklab_index_documents{corpus="transcripts"}' in text
        status2, text2 = get("/metrics")
        assert 'operation="metrics"' not in text2  # scrapes unmetered
    finally:
        srv.shutdown()
