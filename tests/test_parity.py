"""Operator-vs-DuckDB parity (SURVEY.md §5.2 layer 2) — a local replica of
the driver's correctness gate: for every ``queries()`` entry with an
oracle, run both at sf0.001 and compare row count, column names, and the
order-insensitive multiset of canonicalized row values."""

from __future__ import annotations

import datetime
import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def canon(v):
    if v is None:
        return "\0null"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, ddb):
    df = QUERIES[name](spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in ORACLES:
        # rows-only contract: runs, stable schema, >=0 rows
        assert isinstance(spark_cols, list) and len(spark_cols) > 0
        return
    rel = ddb.sql(ORACLES[name])
    ddb_cols = [c.lower() for c in rel.columns]
    ddb_rows = rel.fetchall()
    assert sorted(c.lower() for c in spark_cols) == sorted(ddb_cols), (
        f"{name}: column mismatch {spark_cols} vs {rel.columns}")
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(ddb_rows)}")
    s = rowset([c.lower() for c in spark_cols], spark_rows)
    d = rowset(ddb_cols, ddb_rows)
    if s != d:
        diff = [(a, b) for a, b in zip(s, d) if a != b][:5]
        pytest.fail(f"{name}: value mismatch; first diffs: {diff}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) >= 2
