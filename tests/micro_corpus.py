"""The reference's 4-doc TestIndex corpus, transliterated to transcripts
(reference core/src/test/java/nl/inl/blacklab/testutil/TestIndex.java:117-170,
doc lengths {9+1, 12, 6+1, 10+2} with punctuation tokens dropped by our
[a-z0-9]+ tokenizer — positions below are for OUR tokenizer).

Token positions (our tokenizer, lowercased):
doc0: the quick brown fox jumps over the lazy dog            (9 tokens)
doc1: noot mier aap mier mier mier noot noot aap aap aap aap (12)
doc2: may the force be with you                              (6)
doc3: to find or not to find that is the question            (10)
"""

from __future__ import annotations

import pandas as pd

DOCS = [
    "The quick brown fox jumps over the lazy dog",
    "noot mier aap mier mier mier noot noot aap aap aap aap",
    "May the Force be with you",
    "To find or not to find That is the question",
]

# lemma/pos sidecars (reference TestIndex.java uses word/lemma/pos);
# doc1 deliberately has no annotations (missing-annotation case)
LEMMA = [
    "the quick brown fox jump over the lazy dog".split(),
    [""] * 12,
    "may the force be with you".split(),
    "to find or not to find that be the question".split(),
]
POS = [
    "art adj adj nou vrb pre art adj nou".split(),
    [""] * 12,
    "vrb art nou vrb pre pro".split(),
    "pre vrb con adv pre vrb pro vrb art nou".split(),
]

# inline tag spans: sentences and entities (token positions)
SPANS = [
    # (doc, tag, start, end)
    (0, "s", 0, 9),
    (0, "entity", 0, 4),
    (0, "entity", 6, 9),
    (1, "s", 0, 12),
    (2, "s", 0, 6),
    (2, "entity", 1, 3),
    (3, "s", 0, 6),
    (3, "s", 6, 10),
]


def transcripts_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [f"doc{i}" for i in range(4)],
            "turn_idx": [0] * 4,
            "role": ["user"] * 4,
            "text": DOCS,
            "tool": [""] * 4,
            "ts": pd.to_datetime(["2025-01-01"] * 4),
            "ann_lemma": LEMMA,
            "ann_pos": POS,
        }
    )


def spans_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [f"doc{d}" for d, *_ in SPANS],
            "turn_idx": [0] * len(SPANS),
            "tag": [t for _, t, *_ in SPANS],
            "start": [s for *_, s, _ in SPANS],
            "end": [e for *_, e in SPANS],
            "attrs": [{} for _ in SPANS],
        }
    )
