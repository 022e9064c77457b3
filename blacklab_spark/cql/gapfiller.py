"""Gap filling for query templates (BLS ``pattgapdata``).

The reference fills `@@` gaps in the pattern template with column
values from TSV data, parses each filled row as CQL, and ORs the
resulting patterns together (reference
wslib/.../server/util/GapFiller.java:52-110; parameter plumbing
BlackLabServerParams.java:33,256). Same semantics here: the filled
template list becomes one `Or` AST node, so the engine runs a single
plan — a union of the row patterns — instead of one query per row.
"""

from __future__ import annotations

import csv
import io

from blacklab_spark.cql import parser as P

GAP = "@@"


def has_gaps(patt: str) -> bool:
    """GapFiller.hasGaps (reference GapFiller.java:112-114)."""
    return GAP in patt


def fill_gaps(template: str, tsv_values: str) -> list[str]:
    """One filled pattern string per non-empty TSV row; row values map
    positionally onto the template's `@@` gaps, missing trailing
    columns fill as empty, embedded quotes escaped
    (reference GapFiller.java:88-105)."""
    parts = template.split(GAP)
    n_gaps = len(parts) - 1
    out: list[str] = []
    for row in csv.reader(io.StringIO(tsv_values), delimiter="\t"):
        if not row or (len(row) == 1 and not row[0]):
            continue
        vals = [
            (row[i] if i < len(row) else "")
            .replace("\\", "\\\\")
            .replace('"', '\\"')
            for i in range(n_gaps)
        ]
        filled = "".join(
            p + (vals[i] if i < n_gaps else "") for i, p in enumerate(parts)
        )
        out.append(filled)
    return out


def parse_gap_query(template: str, tsv_values: str) -> P.Node:
    """TextPatternOr over the filled rows (GapFiller.java:106-109)."""
    clauses = [P.parse(f) for f in fill_gaps(template, tsv_values)]
    if not clauses:
        raise ValueError("pattgapdata contained no usable rows")
    if len(clauses) == 1:
        return clauses[0]
    return P.Or(clauses=clauses)
