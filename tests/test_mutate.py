"""Predicate DELETE WHERE / UPDATE WHERE as transactional commits
(cdc/table/mutate.py — the Delta-style row-level mutation analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc.pipeline import apply_batch
from cdc.table.maintenance import compact
from cdc.table.mutate import delete_where, update_where
from cdc.table.table import CdcTable


def ev(spark, rows, batch_id=0):
    """rows: (repo, path, lsn, content, score, op)"""
    return (spark.createDataFrame(
                rows, "repo string, path string, lsn long, "
                      "content string, score double, op string")
            .select("*",
                    F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
                    F.lit(batch_id).alias("batch_id")))


def contents(df):
    return {(r.repo, r.path): (r.content, r.score) for r in df.collect()}


@pytest.fixture
def table(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    rows = [(f"r{i % 3}", f"p{i}", i + 1, f"v{i}", float(i), "U")
            for i in range(12)]
    apply_batch(spark, t, ev(spark, rows), "b0",
                normalize=False, metrics=False)
    return t


def test_delete_where_tombstones_matches(spark, table):
    before = contents(table.read(spark))
    snap = delete_where(spark, table, "score >= 9.0", "del-1")
    got = contents(table.read(spark))
    assert got == {k: v for k, v in before.items() if v[1] < 9.0}
    assert len(got) == 9
    # exactly-once: replaying the statement's batch key is a no-op
    assert delete_where(spark, table, "score >= 0.0",
                        "del-1")["snapshot_id"] == snap["snapshot_id"]
    assert contents(table.read(spark)) == got
    # tombstones guard the LSN: a late lower-LSN update for a deleted
    # key loses to the delete
    apply_batch(spark, table, ev(spark, [("r0", "p9", 5, "late", 1.0, "U")]),
                "late", normalize=False, metrics=False)
    assert ("r0", "p9") not in contents(table.read(spark))
    # MOR delete wrote only tombstones; compaction folds them away
    compact(spark, table, vacuum_tombstones_below_lsn=table.lsn_high())
    assert contents(table.read(spark)) == got


def test_update_where_applies_set_over_old_row(spark, table):
    update_where(spark, table, "repo = 'r1'",
                 {"score": "score * 10", "content": "upper(content)"},
                 "upd-1")
    got = contents(table.read(spark))
    assert got[("r1", "p1")] == ("V1", 10.0)
    assert got[("r1", "p4")] == ("V4", 40.0)
    assert got[("r0", "p0")] == ("v0", 0.0)        # unmatched untouched
    assert len(got) == 12
    # swap-style SET: both exprs see the OLD row, not each other
    update_where(spark, table, "path = 'p0'",
                 {"score": "cast(length(content) as double)",
                  "content": "cast(score as string)"}, "upd-2")
    assert contents(table.read(spark))[("r0", "p0")] == ("0.0", 2.0)
    with pytest.raises(ValueError, match="key column"):
        update_where(spark, table, "true", {"repo": "'x'"}, "upd-3")
    with pytest.raises(ValueError, match="unknown column"):
        update_where(spark, table, "true", {"nope": "1"}, "upd-4")


def test_mutations_are_single_statement_lsn_commits(spark, table):
    high = table.lsn_high()
    delete_where(spark, table, "path = 'p0'", "del-lsn")
    assert table.lsn_high() == high + 1
    update_where(spark, table, "path = 'p1'", {"score": "0.0"}, "upd-lsn")
    assert table.lsn_high() == high + 2
    # empty match: no commit at all (apply_batch's empty-batch guard) —
    # state, lsn_high and the snapshot chain are untouched
    before = contents(table.read(spark))
    sid = table.current_snapshot()["snapshot_id"]
    delete_where(spark, table, "false", "del-none")
    assert not table.is_committed("del-none")
    assert table.current_snapshot()["snapshot_id"] == sid
    assert contents(table.read(spark)) == before
