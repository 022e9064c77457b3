"""Convert / tag plugin layer — pre-index document preprocessing.

The reference lets a format config name a ``convertPlugin`` and/or
``tagPlugin``; each input file is then piped through document
conversion (e.g. docx → TEI) and a tagger (plaintext → tokenized +
tagged document) before the actual DocIndexer parses it (reference
engine/.../indexers/preprocess/DocIndexerConvertAndTag.java:26-35,
index/PluginManager.java plugin discovery,
config keys ConfigInputFormat.java:167,173; the convert-and-tag module
ships ConvertPluginOpenConvert / TagPluginDutchTagger as example
wrappers around external tools).

Spark-first execution: plugins are plain Python callables applied in
ONE distributed ``mapInPandas`` pass over a ``binaryFile`` scan — per
file, Arrow-batched, convert → tag → parse all inside the same task,
so the preprocessed intermediate never hits the driver or a shuffle.
At 100 TB the pass scales exactly like the scan: one task per file
split, no stage barriers.

Like the reference's examples, the shipped plugins are self-contained
demonstrations of the PIPELINE (real converters/taggers are external
tools that don't exist in this container): ``markdown`` strips Markdown
syntax to plaintext deterministically, and ``rule-pos`` is a
deterministic suffix-heuristic tagger producing word/lemma/pos TSV.
The plumbing — registries, config keys, distributed execution, sidecar
annotation columns — is the real, tested surface.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# plugin registries (PluginManager.java analogue; keyed by plugin id)
CONVERT_PLUGINS: dict[str, Callable[[bytes, str], str]] = {}
TAG_PLUGINS: dict[str, Callable[[str], str]] = {}


def register_convert_plugin(name: str, fn: Callable[[bytes, str], str]) -> None:
    """``fn(raw_bytes, filename) -> text`` — document conversion."""
    CONVERT_PLUGINS[name] = fn


def register_tag_plugin(name: str, fn: Callable[[str], str]) -> None:
    """``fn(text) -> tagged TSV`` (word<TAB>lemma<TAB>pos per line,
    blank line between sentences) — the tagger contract."""
    TAG_PLUGINS[name] = fn


# ---- example convert plugin: markdown -> plaintext ----------------------

_MD_RULES = [
    (re.compile(r"```.*?```", re.S), " "),          # fenced code blocks
    (re.compile(r"`([^`]*)`"), r"\1"),              # inline code
    (re.compile(r"!\[([^\]]*)\]\([^)]*\)"), r"\1"),  # images -> alt text
    (re.compile(r"\[([^\]]*)\]\([^)]*\)"), r"\1"),  # links -> anchor text
    (re.compile(r"^#{1,6}\s*", re.M), ""),          # headings
    (re.compile(r"^\s*[-*+]\s+", re.M), ""),        # list bullets
    (re.compile(r"^\s*>\s?", re.M), ""),            # blockquotes
    (re.compile(r"[*_]{1,3}([^*_]+)[*_]{1,3}"), r"\1"),  # emphasis
    (re.compile(r"^\s*([-*_]\s*){3,}$", re.M), ""),  # horizontal rules
]


def convert_markdown(data: bytes, filename: str) -> str:
    text = data.decode("utf-8", errors="replace")
    for pat, repl in _MD_RULES:
        text = pat.sub(repl, text)
    return text


# ---- example tag plugin: deterministic suffix-rule tagger ---------------

_TOKEN = re.compile(r"[A-Za-z0-9]+(?:'[A-Za-z]+)?")
_SUFFIX_POS = [
    ("ing", "vrb"), ("ed", "vrb"), ("ly", "adv"), ("tion", "nou"),
    ("ness", "nou"), ("ment", "nou"), ("ous", "adj"), ("ful", "adj"),
    ("able", "adj"), ("ible", "adj"), ("est", "adj"),
]
_CLOSED = {
    "the": "art", "a": "art", "an": "art",
    "and": "con", "or": "con", "but": "con",
    "in": "pre", "on": "pre", "of": "pre", "to": "pre", "with": "pre",
    "he": "pro", "she": "pro", "it": "pro", "they": "pro", "you": "pro",
    "is": "vrb", "are": "vrb", "was": "vrb", "be": "vrb",
}


def tag_rule_pos(text: str) -> str:
    """Plaintext -> word<TAB>lemma<TAB>pos TSV, sentences split on
    [.!?] boundaries as blank lines."""
    out: list[str] = []
    for sent in re.split(r"(?<=[.!?])\s+", text):
        wrote = False
        for m in _TOKEN.finditer(sent):
            w = m.group(0)
            lw = w.lower()
            pos = _CLOSED.get(lw)
            if pos is None:
                pos = next(
                    (p for suf, p in _SUFFIX_POS if lw.endswith(suf)), "nou"
                )
            lemma = lw[:-1] if (lw.endswith("s") and not lw.endswith("ss")
                                and pos == "nou") else lw
            out.append(f"{w}\t{lemma}\t{pos}")
            wrote = True
        if wrote:
            out.append("")
    return "\n".join(out)


register_convert_plugin("markdown", convert_markdown)
register_tag_plugin("rule-pos", tag_rule_pos)


_OUT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp, ann_lemma array<string>, "
    "ann_pos array<string>"
)


def read_with_plugins(
    spark: SparkSession,
    path: str,
    convert: str | None = None,
    tag: str | None = None,
) -> DataFrame:
    """One document per input file, piped through the named plugins —
    the DocIndexerConvertAndTag flow as one distributed pass:
    binaryFile scan → convert → tag → parse, all inside the same task.
    With a tag plugin the result carries ``ann_lemma``/``ann_pos``
    sidecars (one sentence per turn); without one, the converted text
    becomes a single plaintext turn per file."""
    if convert is not None and convert not in CONVERT_PLUGINS:
        raise ValueError(
            f"unknown convert plugin {convert!r} "
            f"(registered: {sorted(CONVERT_PLUGINS)})"
        )
    if tag is not None and tag not in TAG_PLUGINS:
        raise ValueError(
            f"unknown tag plugin {tag!r} (registered: {sorted(TAG_PLUGINS)})"
        )
    conv_fn = CONVERT_PLUGINS.get(convert) if convert else None
    tag_fn = TAG_PLUGINS.get(tag) if tag else None

    raw = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        epoch = pd.Timestamp("1970-01-01")
        for pdf in batches:
            rows = []
            for p, data in zip(pdf["path"], pdf["content"]):
                name = p.rsplit("/", 1)[-1]
                doc_id = name.rsplit(".", 1)[0]
                text = (
                    conv_fn(bytes(data), name)
                    if conv_fn is not None
                    else bytes(data).decode("utf-8", errors="replace")
                )
                if tag_fn is None:
                    rows.append((doc_id, 0, "", text, "", epoch, None, None))
                    continue
                tagged = tag_fn(text)
                # parse the tagger's TSV: blank line = sentence/turn
                for ti, block in enumerate(
                    b for b in re.split(r"\n\s*\n", tagged) if b.strip()
                ):
                    words, lemmas, poss = [], [], []
                    for line in block.splitlines():
                        parts = line.split("\t")
                        if len(parts) >= 3:
                            words.append(parts[0])
                            lemmas.append(parts[1])
                            poss.append(parts[2])
                    if words:
                        rows.append((doc_id, ti, "", " ".join(words), "",
                                     epoch, lemmas, poss))
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "role", "text", "tool",
                         "ts", "ann_lemma", "ann_pos"],
            )

    out = raw.mapInPandas(process, schema=_OUT_SCHEMA)
    if tag_fn is None:
        return out.drop("ann_lemma", "ann_pos")
    return out


def register_plugin_format(
    fmt_name: str, convert: str | None = None, tag: str | None = None
) -> None:
    """Install a convert/tag chain as a named input format, so
    ``read_input(spark, path, fmt=fmt_name)`` and the build_index job
    see it like any built-in (the reference reaches the same state via
    a format config carrying convertPlugin/tagPlugin keys,
    InputFormatReader.java)."""
    from blacklab_spark.index import ingest

    def reader(spark: SparkSession, path: str, **kw) -> DataFrame:
        return read_with_plugins(spark, path, convert=convert, tag=tag)

    ingest.READERS[fmt_name] = reader


# the worked example the reference module demonstrates: markdown files
# converted to plaintext, then tagged — `fmt="md-tagged"` anywhere a
# format name is accepted
register_plugin_format("md-tagged", convert="markdown", tag="rule-pos")
register_plugin_format("md", convert="markdown")
