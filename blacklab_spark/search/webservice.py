"""BlackLab-Server HTTP adapter (pure stdlib).

The reference ships blacklab-server, a servlet speaking the REST API
under `/blacklab-server/<corpus>/...` (server/.../requesthandlers/
RequestHandler.java:54-73 routes; site/docs/server/rest-api/). This
module is the same protocol over `http.server`: URL routing + query-
string coercion in front of the JSON envelopes in `search.server` and
the corpus surface — no framework, no new dependency.

Scale posture: the HTTP layer is a protocol adapter, not the engine —
every request body is the O(page) envelope assembly; all heavy work is
the same DataFrame plans the library API runs. A production deployment
would put many adapter processes in front of a shared long-lived
SparkSession (or Spark Connect endpoint); the adapter itself holds no
per-corpus state beyond the Corpus handle.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from blacklab_spark.search.server import (
    docs_response, error_response, hits_response, index_metadata_response,
)

# query-string → python types for facade/envelope params
# (server/.../BlackLabServerParams.java parameter table)
_INT = {"first", "number", "wordsaroundhit", "samplenum", "maxretrieve",
        "fimatch", "n", "hitstart", "hitend", "wordstart", "wordend",
        "maxsnippets"}
_FLOAT = {"sample"}
_BOOL = {"waitfortotal", "explain", "usecache", "sensitive"}


def _coerce(params: dict[str, list[str]]) -> dict:
    out = {}
    for k, vs in params.items():
        v = vs[-1]
        if k in _INT:
            out[k] = int(v)
        elif k in _FLOAT:
            out[k] = float(v)
        elif k in _BOOL:
            out[k] = v.lower() in ("1", "true", "yes", "on")
        else:
            out[k] = v
    return out


class _Router:
    """Dispatch one request path against a corpus registry."""

    def __init__(self, corpora: dict):
        self.corpora = corpora

    def handle(self, path: str, q: dict) -> tuple[int, object]:
        from urllib.parse import unquote

        # split BEFORE unquoting so %2F inside a pid segment survives
        parts = [unquote(p) for p in path.strip("/").split("/") if p]
        if not parts:
            # server info (RequestHandlerServerInfo)
            return 200, {
                "indices": {
                    name: {"displayName": name, "status": "available"}
                    for name in self.corpora
                }
            }
        name, rest = parts[0], parts[1:]
        corpus = self.corpora.get(name)
        if corpus is None:
            return 404, error_response(
                "CANNOT_OPEN_INDEX", f"Could not open index '{name}'"
            )
        try:
            return self._corpus_route(corpus, rest, q)
        except (ValueError, KeyError) as e:
            # bad pattern / unknown parameter value (BadRequest analogue)
            return 400, error_response("INVALID_QUERY", str(e))

    def _corpus_route(self, corpus, rest: list[str], q: dict) -> tuple[int, object]:
        if not rest:
            return 200, index_metadata_response(corpus)
        ep = rest[0]
        if ep == "hits":
            if "patt" not in q:
                return 400, error_response(
                    "NO_PATTERN_GIVEN", "Text search pattern required"
                )
            if q.pop("outputformat", None) == "csv":
                # hits-csv endpoint: facade's CSV path
                return 200, corpus.search(outputformat="csv", **q)
            # the reference's BlsCache is ON by default (usecache=no
            # disables); paging/re-sorting then reuses the hit set
            q.setdefault("usecache", True)
            return 200, hits_response(corpus, q.pop("patt"), **q)
        if ep == "docs":
            if len(rest) == 1:
                if q.pop("outputformat", None) == "csv":
                    from blacklab_spark.search.server import docs_csv

                    return 200, docs_csv(corpus, q.pop("patt", None), **q)
                q.setdefault("usecache", True)
                return 200, docs_response(corpus, q.pop("patt", None), **q)
            # /docs/<pid>[/contents] — pid is "<conv_id>/<turn_idx>"
            # with the slash URL-encoded (%2F), or a bare doc_id
            doc = self._resolve_pid(corpus, rest[1])
            if doc is None:
                return 404, error_response(
                    "DOC_NOT_FOUND", f"Document with pid '{rest[1]}' not found"
                )
            if len(rest) == 2:  # doc-info
                info = corpus.doc_info(doc)
                info = {k: v for k, v in info.items()
                        if k not in ("segment_id",)}
                return 200, {"docPid": rest[1],
                             "docInfo": {**{k: [str(v)] for k, v in
                                            info.items() if k != "num_tokens"},
                                         "lengthInTokens": info["num_tokens"],
                                         "mayView": True}}
            if rest[2] == "contents":
                return 200, corpus.doc_contents(doc) or ""
            if rest[2] == "snippet":
                from blacklab_spark.search.server import doc_snippet_response

                return 200, doc_snippet_response(
                    corpus, doc,
                    hitstart=q.get("hitstart"), hitend=q.get("hitend"),
                    wordstart=q.get("wordstart"), wordend=q.get("wordend"),
                    wordsaroundhit=q.get("wordsaroundhit", 5),
                )
            return 404, error_response("UNKNOWN_OPERATION", rest[2])
        if ep == "termfreq":
            from blacklab_spark.search.results import term_frequencies

            df = term_frequencies(
                corpus, filter_expr=None,
                sensitive=q.get("sensitive", False),
            )
            terms = q.get("terms")
            if terms:
                want = [t.strip() for t in terms.split(",")]
                df = df.filter(df.term.isin(want))
            number = q.get("number", 20)
            rows = df.limit(q.get("first", 0) + number).collect()
            rows = rows[q.get("first", 0):]
            return 200, {"termFreq": {r["term"]: r["freq"] for r in rows}}
        if ep == "autocomplete":
            # /autocomplete/<field> or /autocomplete/contents/<annotation>
            from blacklab_spark.search.results import autocomplete

            ann = rest[2] if len(rest) > 2 else (
                rest[1] if len(rest) > 1 else "word"
            )
            if ann == "contents":
                ann = "word"
            # a METADATA field name completes its distinct values
            # (reference ResultAutocomplete.java:30-58 routes metadata
            # vs annotated-field names the same way)
            meta_src = None
            if len(rest) <= 2 and ann != "word":
                from pyspark.sql import functions as F

                stats = corpus.doc_stats
                if ann in stats.columns:
                    meta_src = stats.select(F.col(ann).cast("string"))
                elif f"meta_{ann}" in corpus.tokenized.columns:
                    meta_src = corpus.tokenized.select(
                        F.col(f"meta_{ann}").cast("string").alias(ann)
                    )
            if meta_src is not None:
                pref = q.get("term", "").lower()
                vals = (
                    meta_src.filter(F.lower(F.col(ann)).startswith(pref))
                    .distinct()
                    .orderBy(ann)
                    .limit(q.get("n", 20))
                    .collect()
                )
                return 200, [r[0] for r in vals]
            df = autocomplete(corpus, q.get("term", ""), n=q.get("n", 20),
                              annotation=ann)
            return 200, [r[0] for r in df.collect()]
        if ep == "fields" and len(rest) > 1:
            return 200, corpus.field_values(rest[1])
        if ep == "status":
            return 200, corpus.status()
        if ep == "cache-info":
            return 200, corpus.cache_info()
        if ep == "explain":
            if "patt" not in q:
                return 400, error_response(
                    "NO_PATTERN_GIVEN", "Text search pattern required"
                )
            return 200, {"explanation": {
                "originalQuery": q["patt"],
                "rewrittenQuery": corpus.explain(q["patt"]),
            }}
        return 404, error_response("UNKNOWN_OPERATION", ep)

    @staticmethod
    def _resolve_pid(corpus, pid: str):
        """pid "<conv_id>/<turn_idx>" (URL-encoded slash) or a bare
        doc_id integer → doc_id."""
        from pyspark.sql import functions as F

        if pid.isdigit():
            return int(pid)
        if "/" not in pid:
            return None
        conv_id, _, turn_idx = pid.rpartition("/")
        if not turn_idx.isdigit():
            return None
        rows = (
            corpus.doc_stats
            .filter((F.col("conv_id") == conv_id)
                    & (F.col("turn_idx") == int(turn_idx)))
            .select("doc_id").collect()
        )
        return rows[0]["doc_id"] if rows else None


def make_handler(corpora: dict):
    router = _Router(corpora)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - stdlib API
            self._respond({})

        def do_POST(self):  # noqa: N802 - BLS accepts POSTed params
            # (large pattgapdata exceeds URL limits; reference docs:
            # rest-api hits "you should use a POST request")
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n).decode() if n else ""
            ctype = self.headers.get("Content-Type", "")
            extra = parse_qs(body) if "form-urlencoded" in ctype else {}
            self._respond(extra)

        def _respond(self, extra_params: dict):
            u = urlparse(self.path)
            try:
                q = parse_qs(u.query)
                q.update(extra_params)
                status, body = router.handle(u.path, _coerce(q))
            except Exception as e:  # engine error → INTERNAL_ERROR envelope
                status, body = 500, error_response("INTERNAL_ERROR", str(e))
            if isinstance(body, str):
                payload = body.encode()
                ctype = "text/plain; charset=utf-8"
            else:
                payload = json.dumps(body).encode()
                ctype = "application/json; charset=utf-8"
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(corpora: dict, port: int = 8080, host: str = "127.0.0.1"):
    """Start the adapter; returns the (already started) server object.
    Call ``.shutdown()`` to stop. ThreadingHTTPServer: Spark job
    submission is thread-safe, concurrent requests just become
    concurrent Spark jobs sharing the session's scheduler."""
    srv = ThreadingHTTPServer((host, port), make_handler(corpora))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
