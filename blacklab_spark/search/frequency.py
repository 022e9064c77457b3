"""Frequency lists over annotations × metadata fields — the analogue
of the reference's FrequencyTool (reference tools/.../frequency/
FrequencyTool.java:52-56, config format tools/.../frequency/README.md):
each configured list is ONE token-exploded groupBy over the forward
index (the tokenized table), entirely JVM-side codegen.

Scale notes: the reference builds per-list hash maps in worker threads
and merges them on one machine (CalcTokenFrequencies.java); here each
list is a shuffle-aggregated DataFrame with map-side partial
aggregation, so a 10^12-token corpus produces (vocab × metadata
cardinality) grouped rows with no single-machine merge. Output stays a
distributed table; the CLI writes TSV part-files (one dir per list),
not a driver-collected single file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def freq_list(
    corpus,
    annotations: list[str],
    metadata_fields: list[str] | None = None,
) -> DataFrame:
    """One frequency list: token counts grouped by the requested
    annotation values (positionally aligned via ONE arrays_zip +
    explode) and per-doc metadata fields. The `word` annotation counts
    its insensitive view (the reference's default MatchSensitivity for
    frequency lists is insensitive); sidecar annotations count their
    stored primary values."""
    if not annotations:
        raise ValueError("at least one annotation required")
    md = list(metadata_fields or [])
    arrs = []
    for i, a in enumerate(annotations):
        src = F.col("tokens_i") if a in ("word", "") else F.col(f"ann_{a}")
        arrs.append(src.alias(f"_a{i}"))  # arrays_zip names fields by alias
    tok = corpus.tokenized
    zipped = tok.select(
        *md, F.explode(F.arrays_zip(*arrs)).alias("_z")
    )
    keys = [
        zipped["_z"][f"_a{i}"].alias(a) for i, a in enumerate(annotations)
    ] + [F.col(m) for m in md]
    return (
        zipped.select(*keys)
        .groupBy(*annotations, *md)
        .agg(F.count(F.lit(1)).alias("frequency"))
    )


def frequency_lists(corpus, config: dict) -> dict[str, DataFrame]:
    """All lists of a FrequencyTool YAML config (reference
    tools/.../frequency/README.md):

        annotatedField: contents
        frequencyLists:
        - annotations: [word]
        - annotations: [lemma]
          metadataFields: [year]

    Returns {list_name: DataFrame}; names follow the reference's
    field_annotations_metadata convention."""
    field = config.get("annotatedField", "contents")
    out: dict[str, DataFrame] = {}
    for spec in config.get("frequencyLists") or []:
        anns = list(spec.get("annotations") or [])
        md = list(spec.get("metadataFields") or [])
        name = "_".join([field] + anns + md)
        out[name] = freq_list(corpus, anns, md)
    return out
