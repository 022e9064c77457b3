"""Folded driver entries stay oracle-verified.

The driver records at most 50 CORRECTNESS rows, so overlapping entries
were folded out of entry_queries.QUERIES (see the comment there). Each
folded entry keeps its full (Spark query, DuckDB oracle) pair here and
is checked with the SAME comparison the driver gate uses: row count,
column names, and order-insensitive stringified values.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from blacklab_spark import entry_queries as EQ

SF_DIR = os.environ.get("BLSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="testdata not present",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append("\x00".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(EQ.FOLDED_QUERIES))
def test_folded_entry_matches_oracle(spark, duck, name):
    sdf = EQ.FOLDED_QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(EQ.FOLDED_ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(orows)
    assert _norm(scols, srows) == _norm(ocols, orows)
