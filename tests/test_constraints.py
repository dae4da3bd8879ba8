"""Persisted table properties + CHECK constraints (cdc/table/alter.py
set_property/set_check; enforced by cdc.pipeline.apply_batch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc import quality
from cdc.pipeline import apply_batch
from cdc.table import alter
from cdc.table.table import CdcTable


def ev(spark, rows):
    """rows: (repo, path, lsn, content, score, op)"""
    return (spark.createDataFrame(
                rows, "repo string, path string, lsn long, "
                      "content string, score int, op string")
            .select("*",
                    F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
                    F.lit(0).alias("batch_id")))


def test_check_constraints_gate_commits(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=2, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", 10, "U")]), "b0",
                normalize=False, metrics=False)
    alter.set_check(t, "score_pos", "score >= 0")
    alter.set_check(t, "content_present", "content IS NOT NULL")
    assert t.current_snapshot()["properties"] == {
        "check.score_pos": "score >= 0",
        "check.content_present": "content IS NOT NULL"}

    # violating batch refused, nothing lands, no ledger entry
    before = t.current_snapshot()["snapshot_id"]
    with pytest.raises(quality.ExpectationError) as e:
        apply_batch(spark, t, ev(spark, [("r2", "b", 5, "w", -3, "U")]),
                    "bad", normalize=False, metrics=False)
    assert e.value.violations == {"score_pos": 1}
    assert t.current_snapshot()["snapshot_id"] == before
    assert not t.is_committed("bad")

    # the corrected batch reuses the SAME key (nothing was burned)
    apply_batch(spark, t, ev(spark, [("r2", "b", 5, "w", 3, "U")]), "bad",
                normalize=False, metrics=False)
    assert t.is_committed("bad")

    # only batch WINNERS are checked: a violating event superseded within
    # the same batch doesn't block, and delete tombstones are exempt
    apply_batch(spark, t, ev(spark, [("r3", "c", 7, "x", -9, "U"),
                                     ("r3", "c", 8, "x", 9, "U"),
                                     ("r1", "a", 9, None, None, "D")]),
                "b2", normalize=False, metrics=False)
    got = {(r.repo, r.score) for r in t.read(spark).collect()}
    assert got == {("r2", 3), ("r3", 9)}

    # constraints carry forward through commits and survive in metadata
    assert t.current_snapshot()["properties"]["check.score_pos"] == \
        "score >= 0"

    # dropping the check lifts the gate
    alter.drop_check(t, "score_pos")
    apply_batch(spark, t, ev(spark, [("r4", "d", 11, "y", -1, "U")]), "b3",
                normalize=False, metrics=False)
    assert ("r4", -1) in {(r.repo, r.score) for r in t.read(spark).collect()}


def test_checks_gate_sql_update_and_insert(spark, tmp_path):
    """The same constraint refuses an UPDATE that would break it — DML
    routes through apply_batch, so the gate is universal."""
    from cdc.table.mutate import update_where

    t = CdcTable(str(tmp_path / "t"), n_partitions=2, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", 10, "U")]), "b0",
                normalize=False, metrics=False)
    alter.set_check(t, "score_pos", "score >= 0")
    with pytest.raises(quality.ExpectationError):
        update_where(spark, t, "repo = 'r1'", {"score": "score - 100"},
                     "u1", mode="cow")
    assert {r.score for r in t.read(spark).collect()} == {10}
    update_where(spark, t, "repo = 'r1'", {"score": "score + 100"},
                 "u2", mode="cow")
    assert {r.score for r in t.read(spark).collect()} == {110}


def test_rollback_restores_properties(spark, tmp_path):
    """Rolling back across SET/UNSET restores the target's constraint
    state exactly — properties travel with the schema."""
    from cdc.table.maintenance import rollback

    t = CdcTable(str(tmp_path / "t"), n_partitions=2, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", 10, "U")]), "b0",
                normalize=False, metrics=False)                 # snap 1
    alter.set_check(t, "pos", "score >= 0")                     # snap 2
    # rollback to the unconstrained snapshot: the gate lifts
    rollback(t, 1)
    apply_batch(spark, t, ev(spark, [("r2", "b", 5, "w", -1, "U")]), "b1",
                normalize=False, metrics=False)
    assert ("r2", -1) in {(r.repo, r.score) for r in t.read(spark).collect()}
    # rollback INTO the constrained snapshot: the gate is back
    rollback(t, 2)
    with pytest.raises(quality.ExpectationError):
        apply_batch(spark, t, ev(spark, [("r3", "c", 9, "x", -2, "U")]),
                    "b2", normalize=False, metrics=False)
