"""Collator-correct sort keys for text sorts.

The reference sorts hits/terms with a TERTIARY-strength
RuleBasedCollator (engine forwardindex/Collators.java:28-33; the terms
dict stores its sort positions, Terms.java:69-95). This module builds
the equivalent ORDER BY key chain for a text Column:

- with PyICU installed, one binary ICU tertiary sort key
  (analysis.icu_sort_key_col) — exact collator order;
- otherwise a deterministic three-strength chain mirroring UCA level
  order, pure codegen expressions (no native deps, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from blacklab_spark.analysis import fold_col, icu_sort_key_col


def case_mask_col(col: Column | str) -> Column:
    """Per-character case pattern ('0' = lowercase letter, '1' =
    uppercase/titlecase): the TERTIARY weight string of the fallback
    collator chain below. Codegen-only (two regexp_replace passes)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, r"\p{Lu}|\p{Lt}", "1"), r"\p{Ll}", "0")


def collation_keys(col: Column | str) -> list[Column]:
    """Collator-correct sort key chain for text sorts.

    With PyICU installed: [ICU tertiary binary key] — exact.
    Fallback (no native deps): a deterministic three-strength chain
    mirroring UCA level order,
      1. primary   = accent+case-folded text (letter identity),
      2. secondary = lowercased raw text (accent pattern; accentless
         sorts before accented, approximating UCA secondary weights by
         the codepoint order of precomposed Latin forms),
      3. tertiary  = case pattern, '0' (lower) before '1' (upper) —
         ICU's lowercase-first tertiary rule,
      4. identity  = the raw string (total order).
    For ASCII + Latin-1 corpora this reproduces ICU en tertiary order;
    the residual divergence (rare multi-accent secondary weights) is
    golden-tested in tests/test_fields.py."""
    c = F.col(col) if isinstance(col, str) else col
    k = icu_sort_key_col(c)
    if k is not None:
        return [k]
    low = F.lower(c)
    return [fold_col(low), low, case_mask_col(c), c]
