"""tools/corpus_util.py — the testutil/performance tool set.

Reference analogues: tools/src/main/java/nl/inl/blacklab/testutil/*.java
and performance/Batch*.java. The key invariant tested here is the one
ReconstructTermVector.java demonstrates: the inverted index is lossless —
a document's token sequence can be rebuilt from postings alone and must
equal the forward index."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import corpus_util  # noqa: E402


def _run(monkeypatch, corpus, fn, *args):
    monkeypatch.setattr(
        corpus_util, "_open", lambda index_dir, cpus=None: (corpus.spark, corpus)
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = fn("ignored", *args)
    assert rc == 0
    return buf.getvalue()


def test_count_tokens(monkeypatch, small_corpus):
    corpus, pdf = small_corpus
    out = _run(monkeypatch, corpus, corpus_util.count_tokens)
    total = int(out.strip().splitlines()[-1].split()[-1])
    assert total == corpus.meta["total_tokens"]


def test_reconstruct_term_vector_matches_forward_index(monkeypatch, small_corpus):
    """Postings -> token sequence == forward index (invertibility)."""
    corpus, pdf = small_corpus
    out = _run(
        monkeypatch, corpus, corpus_util.reconstruct_term_vector, "7", "0", "50"
    )
    rebuilt = [ln.split(": ", 1)[1] for ln in out.strip().splitlines()]
    from pyspark.sql import functions as F

    toks = list(
        corpus.tokenized.filter(F.col("doc_id") == 7)
        .select("tokens_i").collect()[0]["tokens_i"]
    )
    assert rebuilt == toks[:50]
    assert "[" not in rebuilt  # no position gaps


def test_run_term_query_counts(monkeypatch, small_corpus):
    corpus, pdf = small_corpus
    term = corpus.terms.orderBy("df", ascending=False).limit(1).collect()[0]
    out = _run(monkeypatch, corpus, corpus_util.run_term_query, term["term"])
    header = [ln for ln in out.splitlines() if "hits in" in ln][0]
    n_hits, n_docs = int(header.split()[0]), int(header.split()[3])
    assert n_hits == term["cf"] and n_docs == term["df"]


def test_tokens_per_meta_value_partitions_corpus(monkeypatch, small_corpus):
    """Per-value token counts sum to the corpus total for every field."""
    corpus, pdf = small_corpus
    out = _run(monkeypatch, corpus, corpus_util.tokens_per_meta_value, "role")
    rows = [ln.split("\t") for ln in out.strip().splitlines()[1:]]
    assert sum(int(r[3]) for r in rows) == corpus.meta["total_tokens"]
    assert sum(int(r[2]) for r in rows) == corpus.meta["n_docs"]


def test_export_metadata_and_field_values(monkeypatch, small_corpus, tmp_path):
    corpus, pdf = small_corpus
    out_file = str(tmp_path / "meta.tsv")
    _run(monkeypatch, corpus, corpus_util.export_metadata, out_file)
    lines = open(out_file).read().strip().splitlines()
    assert len(lines) == corpus.meta["n_docs"] + 1
    assert lines[0].startswith("docId\t")

    out = _run(monkeypatch, corpus, corpus_util.field_values, "role")
    vals = set(out.strip().splitlines()[1:])
    assert vals == set(pdf["role"].unique())


def test_export_corpus_parquet_roundtrip(monkeypatch, small_corpus, tmp_path):
    corpus, pdf = small_corpus
    out_dir = str(tmp_path / "exp")
    _run(monkeypatch, corpus, corpus_util.export_corpus, out_dir, "--parquet")
    back = corpus.spark.read.parquet(out_dir)
    assert back.count() == corpus.meta["n_docs"]
    row = back.filter("doc_id = 3").collect()[0]
    assert row["content"] == corpus.doc_contents(3)


def test_batch_probes_run(monkeypatch, small_corpus):
    corpus, pdf = small_corpus
    out = _run(monkeypatch, corpus, corpus_util.batch_fi, "500", "5")
    assert "500 forward-index snippet fetches" in out
    out = _run(monkeypatch, corpus, corpus_util.batch_cs, "500")
    assert "500 content retrievals" in out
