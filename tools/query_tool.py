"""Interactive query REPL — the analogue of the reference's QueryTool
(reference tools/.../QueryTool.java:85: CQL in; commands for paging,
sorting, grouping, doc view).

Usage: python tools/query_tool.py <index_dir>
Commands:
  <CQL pattern>           run a span query, show first page of KWICs
  topk <query terms>      BM25 top-k documents
  next / prev             page through current hits
  sort hit|left|right     re-sort current hits
  group hit|<meta col>    group current hits
  count                   total hits / docs
  explain <CQL>           show rewrite trace
  freq [prefix]           term frequencies (optionally by prefix)
  quit
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blacklab_spark.corpus import Corpus
from blacklab_spark.search.results import autocomplete, term_frequencies
from blacklab_spark.session import get_spark

PAGE = 10


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

    def show():
        if hits is None:
            print("no current hits")
            return
        for r in hits.window(first, PAGE).kwic().collect():
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
            elif cmd == "topk":
                for r in corpus.topk(rest, k=PAGE).collect():
                    print(f"{r['score']:.4f}  [{r['conv_id']}:{r['turn_idx']}] {r['text'][:90]}")
            elif cmd == "next":
                first += PAGE
                show()
            elif cmd == "prev":
                first = max(0, first - PAGE)
                show()
            elif cmd == "count":
                print(f"{hits.count()} hits in {hits.doc_count()} docs" if hits else "-")
            elif cmd == "sort":
                if hits:
                    hits = (
                        hits.sort_by_hit_text()
                        if rest == "hit"
                        else hits.sort_by_context(rest or "left")
                    )
                    first = 0
                    show()
            elif cmd == "group":
                if hits:
                    df = (
                        hits.group_by_hit_text()
                        if rest == "hit"
                        else hits.group_by_metadata(rest)
                    )
                    df.show(PAGE, truncate=False)
            elif cmd == "explain":
                print(corpus.explain(rest))
            elif cmd == "freq":
                if rest:
                    autocomplete(corpus, rest).show(PAGE, truncate=False)
                else:
                    term_frequencies(corpus).show(PAGE, truncate=False)
            else:
                hits = corpus.find(line)
                first = 0
                show()
        except Exception as e:  # REPL: show, don't die
            print(f"error: {e}")


if __name__ == "__main__":
    main()
