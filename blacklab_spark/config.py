"""Engine configuration.

Defaults mirror the reference where a constant exists there:
- BM25 k1=1.2, b=0.75: Lucene 8 default similarity, inherited by the
  reference via `new IndexSearcher(reader)`
  (reference engine/.../search/BlackLabIndexAbstract.java:496).
- context size 5: reference BlackLabIndex.java:74.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # BM25 (Lucene 8 defaults)
    k1: float = 1.2
    b: float = 0.75

    # Index layout.
    # segment_size: docs per segment. A segment is the unit of
    # query-time parallelism (one WAND task per segment), the analogue
    # of a Lucene segment. At 100 TB you want segments sized so that a
    # segment's postings fit comfortably in one executor task
    # (~1-4 GiB of postings); doc-range segmentation keeps the posting
    # build shuffle balanced regardless of term skew.
    segment_size: int = 1 << 14
    # block_size: docs per posting block inside a (segment, term)
    # posting list; the block-max skipping granularity (Lucene uses 128).
    block_size: int = 128
    # segments_per_dir: segments per physical partition directory
    # (`seg_group=` dirs). Writing one dir per segment anti-scales —
    # measured 2.5x slower at 32 cores from dynamic-partition writer
    # overhead + thousands of tiny dirs — and at 10^12 turns would
    # mean ~10^8 directories. Group dirs keep the dir-replacement
    # semantics incremental compaction relies on at a granularity
    # that survives scale; per-segment access within a dir uses
    # parquet row-group pruning on the segment_id column.
    segments_per_dir: int = 64

    # Tokenizer: one regex, shared with the DuckDB oracle verbatim
    # (Java regex and RE2 both support \p{L}); the pure-Python oracles
    # use the documented equivalent [^\W_]+ (analysis.PY_TOKEN_PATTERN).
    # Unicode letters/digits — accented tokens are kept, with the
    # case/diacritics folding handled by the analysis chain
    # (reference BLStandardAnalyzer.java + RemoveAllAccentsFilter.java).
    token_pattern: str = r"[\p{L}\p{N}]+"

    # Postings fields: which annotation×sensitivity views get their own
    # inverted-index postings (reference indexes every annotation
    # sensitivity as a separate Lucene field —
    # AnnotatedFieldNameUtil.java:47 `contents%word@i`,
    # AnnotationSensitivities.java:8-13). `word@i` is mandatory (BM25,
    # the terms dict and regex expansion read it). Add `word@s` to
    # serve case/diacritics-sensitive queries from postings instead of
    # token-table scans, and `<ann>@i` / `<ann>@s` (e.g. `pos@i`) to
    # give sidecar annotations postings-backed leaf queries. Each extra
    # field costs one more per-segment lexsort+encode in the build and
    # proportional postings bytes; queries it serves drop from a
    # full-corpus scan to a pruned postings read.
    index_fields: tuple = ("word@i",)

    # Default KWIC / collocation context size (reference BlackLabIndex.java:74).
    context_size: int = 5

    # fi_buckets > 0 additionally writes the forward-index access table
    # (`fi/`): the tokenized projection bucketed + sorted by doc_id
    # (Spark bucketed table). Hit->context joins (KWIC, sort-by-context,
    # FI probes) then need NO Exchange on the token-table side — only
    # the (much smaller) hit side shuffles into the bucket partitioning.
    # This mirrors the reference's layout, where the forward index is a
    # separate random-access-by-docid structure next to the content
    # store (reference forwardindex/FieldForwardIndex.java; Lucene also
    # stores postings / stored fields / FI separately). Cost: one extra
    # hash-partitioned write of the token arrays at build (the main
    # tokenized table keeps its zero-shuffle contiguous range layout,
    # which the postings encode and incremental compaction depend on).
    # Size buckets so each holds ~128MB-1GB of token arrays at target
    # scale. 0 = off (context joins fall back to the range-layout
    # table; correct, one extra exchange at query time).
    fi_buckets: int = 0

    # NOTE on skew/salting: the index build needs NO salting knob — its
    # shuffle is keyed by uniformly-sized segment ranges, so Zipf head
    # terms cannot skew it (see index/build.py header); query-side hit
    # joins rely on AQE skew-join handling (session defaults).

    # Cost-based forward-index matching (the analogue of the
    # reference's reverse-vs-NFA choice, ClauseCombinerNfa.java:66,74
    # nfaFactor=900 / TERM_FREQ_DIVIDER=500): in a sequence, when a
    # neighbor term's df is at least this many times the anchor side's
    # df estimate, the planner probes the neighbor over the token
    # arrays (element_at after one doc_id join) instead of joining the
    # neighbor's full position list.
    fi_probe_ratio: float = 16.0
