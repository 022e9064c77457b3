"""Interactive query REPL — the analogue of the reference's QueryTool
(reference tools/.../QueryTool.java:85: CQL in; commands for paging,
sorting, grouping, filtering, sensitivity, doc view — command list at
QueryTool.java:636-860).

Usage: python tools/query_tool.py <index_dir>
Commands:
  <CQL pattern>           run a span query, show first page of KWICs
  topk <query terms>      BM25 top-k documents
  next / prev / page <n>  page through current hits
  pagesize <n>            hits per page (reference `pagesize`)
  context <n>             KWIC context size in words (reference `context`)
  sort hit|left|right|<crit>   re-sort current hits (HitProperty DSL)
  group hit|<meta col>    group current hits
  filter [<LuceneQL>]     set/clear a metadata filter for NEW queries
  sensitive on|off        default match sensitivity for bare terms
  doc <doc_id>            show document contents (content store)
  snippet <hit#>          larger snippet around one hit of the page
  colloc                  collocations of the current hits
  sample <n>|<p>%         seeded sample of current hits
  count                   total hits / docs
  total on|off            off = running count (waitfortotal=no)
  explain <CQL>           show rewrite trace
  freq [prefix]           term frequencies (optionally by prefix)
  help / quit
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blacklab_spark.corpus import Corpus
from blacklab_spark.cql.luceneql import parse_luceneql
from blacklab_spark.search.results import autocomplete, term_frequencies
from blacklab_spark.session import get_spark

# insert a (?-i) sensitivity flag after the opening quote of every
# quoted literal that doesn't already carry one — the REPL-level
# default-sensitivity toggle (reference QueryTool.java:753-776 keeps
# the same session-wide default and builds queries with it)
_QUOTED = re.compile(r'"((?:[^"\\]|\\.)*)"')


def _apply_sensitive(cql: str) -> str:
    return _QUOTED.sub(
        lambda m: m.group(0)
        if m.group(1).startswith("(?")
        else f'"(?-i){m.group(1)}"',
        cql,
    )


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    spark = get_spark("query-tool", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    corpus = Corpus.open(spark, sys.argv[1])
    print(f"corpus: {corpus.meta['n_docs']} docs, {corpus.meta['n_terms']} terms")
    hits = None
    first = 0
    page = 10
    ctx = None  # None = corpus default context size
    filter_sql = None
    sensitive = False
    wait_total = True

    def show():
        if hits is None:
            print("no current hits")
            return
        for r in hits.window(first, page).kwic(size=ctx).collect():
            print(
                f"[{r['conv_id']}:{r['turn_idx']} @{r['start']}] "
                f"{r['left']} 「{r['match']}」 {r['right']}"
            )

    while True:
        try:
            line = input("bl> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        cmd, _, rest = line.partition(" ")
        try:
            if cmd in ("quit", "exit"):
                break
            elif cmd == "help":
                print(__doc__)
            elif cmd == "topk":
                for r in corpus.topk(rest, k=page, filter_expr=filter_sql).collect():
                    print(f"{r['score']:.4f}  [{r['conv_id']}:{r['turn_idx']}] {r['text'][:90]}")
            elif cmd == "next":
                first += page
                show()
            elif cmd == "prev":
                first = max(0, first - page)
                show()
            elif cmd == "page":
                first = max(0, (int(rest) - 1) * page)
                show()
            elif cmd == "pagesize":
                page = max(1, int(rest))
                show()
            elif cmd == "context":
                ctx = max(0, int(rest))
                show()
            elif cmd == "count":
                if hits is None:
                    print("-")
                elif wait_total:
                    print(f"{hits.count()} hits in {hits.doc_count()} docs")
                else:
                    rc = hits.count_running()
                    print(f"counting... {rc.running} so far")
                    print(f"total: {rc.total()}")
            elif cmd == "total":
                wait_total = rest != "off"
            elif cmd == "sensitive":
                sensitive = rest in ("on", "yes", "true", "case")
                print(f"default sensitivity: {'sensitive' if sensitive else 'insensitive'}")
            elif cmd == "filter":
                if rest:
                    filter_sql = parse_luceneql(rest)
                    print(f"filter: {filter_sql}")
                else:
                    filter_sql = None
                    print("filter cleared")
            elif cmd == "doc":
                text = corpus.doc_contents(int(rest))
                print(text if text is not None else "no such doc")
            elif cmd == "snippet":
                if hits is None:
                    print("no current hits")
                    continue
                one = hits.window(first + int(rest or 0), 1)
                snip = corpus.snippets(one.df, context_chars=200).collect()
                for r in snip:
                    print(r["snippet"])
            elif cmd == "colloc":
                if hits is not None:
                    hits.collocations().show(page, truncate=False)
            elif cmd == "sample":
                if hits is not None:
                    hits = (
                        hits.sample(fraction=float(rest[:-1]) / 100.0)
                        if rest.endswith("%")
                        else hits.sample(n=int(rest))
                    )
                    first = 0
                    show()
            elif cmd == "sort":
                if hits:
                    if rest in ("", "hit"):
                        hits = hits.sort_by_hit_text()
                    elif rest in ("left", "right"):
                        hits = hits.sort_by_context(rest, size=ctx)
                    else:
                        hits = hits.sort_by([rest])
                    first = 0
                    show()
            elif cmd == "group":
                if hits:
                    df = (
                        hits.group_by_hit_text()
                        if rest in ("", "hit")
                        else hits.group_by_metadata(rest)
                    )
                    df.show(page, truncate=False)
            elif cmd == "explain":
                print(corpus.explain(rest))
            elif cmd == "freq":
                if rest:
                    autocomplete(corpus, rest).show(page, truncate=False)
                else:
                    term_frequencies(corpus, filter_expr=filter_sql).show(
                        page, truncate=False
                    )
            else:
                patt = _apply_sensitive(line) if sensitive else line
                hits = corpus.find(patt)
                if filter_sql:
                    hits = hits.filter_docs(filter_sql)
                first = 0
                show()
        except Exception as e:  # REPL: show, don't die
            print(f"error: {e}")


if __name__ == "__main__":
    main()
