"""The interactive QueryTool REPL (tools/query_tool.py) driven end-to-end
as a subprocess — command set parity with the reference QueryTool
(reference tools/.../QueryTool.java:636-860: page/pagesize/context/
filter/sensitive/doc/snippet/colloc/sample/total)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TERM = "word00010"

SCRIPT = "\n".join(
    [
        f'"{TERM}"',
        "count",
        "pagesize 3",
        "page 2",
        "context 2",
        "filter role:user",
        f'"{TERM}"',
        "count",
        "filter",
        "sensitive on",
        f'"{TERM.capitalize()}"',
        "count",
        "sensitive off",
        f'"{TERM}"',
        "snippet 0",
        "doc 0",
        "total off",
        "count",
        "sample 2",
        "struct",
        "props",
        "showconc off",
        f'"{TERM}"',
        "showconc on",
        "repeat 2 count",
        "quit",
    ]
) + "\n"


def test_repl_commands(small_corpus):
    corpus, pdf = small_corpus
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "query_tool.py"),
         corpus.index_dir],
        input=SCRIPT, capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    text = out.stdout
    assert "error:" not in text, text
    # corpus banner + at least one KWIC line with the match marker
    assert "docs," in text and f"「{TERM}」" in text
    # expected counts from the generator frame (insensitive default)
    n_hits = sum(t.split().count(TERM) for t in pdf["text"])
    assert f"{n_hits} hits" in text
    # sensitive "Word00010" matches nothing (generator is lowercase)
    assert "0 hits in 0 docs" in text
    # role filter cuts the count to user turns only
    n_user = sum(
        t.split().count(TERM)
        for t, r in zip(pdf["text"], pdf["role"]) if r == "user"
    )
    assert f"{n_user} hits" in text
    # filter echo + snippet highlighting + running count
    assert "(role = 'user')" in text
    assert f"<hl>{TERM}</hl>" in text
    assert f"total: {n_hits}" in text
    # struct / props / showconc-off / repeat
    assert "annotated field 'contents'" in text
    assert "['word']" in text
    assert "showconc off" in text
    # repeat 2 count (with total off) -> two more running-count totals
    # beyond the first count's
    assert text.count("total:") >= 3


def test_apply_sensitive_rewrites_only_unflagged_literals():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from query_tool import _apply_sensitive

    assert _apply_sensitive('"the" "cat"') == '"(?-i)the" "(?-i)cat"'
    # already-flagged literals are left alone
    assert _apply_sensitive('"(?i)the"') == '"(?i)the"'
    # non-quoted syntax untouched
    assert (
        _apply_sensitive('[word="x" & pos="N.*"]')
        == '[word="(?-i)x" & pos="(?-i)N.*"]'
    )
