"""Optimistic concurrency: CAS conflict + retry (apply_batch
conflict_retries) and writer-unique staging directories. The race is
injected deterministically: a competing handle commits in the window
between the first writer's state read and its CAS pointer swap."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc.meta import store
from cdc.meta.store import CommitConflictError
from cdc.pipeline import apply_batch
from cdc.table.maintenance import vacuum_orphans
from cdc.table.table import CdcTable


def ev(spark, rows):
    return (spark.createDataFrame(
                rows, "repo string, path string, lsn long, "
                      "content string, op string")
            .select("*",
                    F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
                    F.lit(0).alias("batch_id")))


def contents(df):
    return {(r.repo, r.path): r.content for r in
            df.select("repo", "path", "content").collect()}


def _racing_write_snapshot(spark, root, competing_events, competing_key):
    """A write_snapshot wrapper that lands a competing commit (through a
    SEPARATE handle) immediately before the first caller's CAS."""
    orig = store.write_snapshot
    state = {"fired": False}

    def flaky(r, snap, expected_parent=None, ref=store.CURRENT):
        if not state["fired"] and r == root:
            state["fired"] = True   # the competing commit below recurses
            other = CdcTable.open(root)
            apply_batch(spark, other, competing_events, competing_key,
                        normalize=False, metrics=False)
        return orig(r, snap, expected_parent=expected_parent, ref=ref)

    return flaky


def test_conflict_retry_recomputes_and_lands_both(spark, tmp_path, monkeypatch):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]), "b0",
                normalize=False, metrics=False)
    monkeypatch.setattr(
        store, "write_snapshot",
        _racing_write_snapshot(spark, t.root,
                               ev(spark, [("r2", "x", 5, "z1", "U")]), "bX"))
    apply_batch(spark, t, ev(spark, [("r1", "b", 6, "w1", "U")]), "b1",
                normalize=False, metrics=False, conflict_retries=1)
    # both the competing writer's batch and the retried batch landed
    assert contents(t.read(spark)) == {("r1", "a"): "v1", ("r2", "x"): "z1",
                                       ("r1", "b"): "w1"}
    assert t.is_committed("bX") and t.is_committed("b1")


def test_conflict_without_retry_raises_and_loser_files_vacuum(
        spark, tmp_path, monkeypatch):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]), "b0",
                normalize=False, metrics=False)
    monkeypatch.setattr(
        store, "write_snapshot",
        _racing_write_snapshot(spark, t.root,
                               ev(spark, [("r2", "x", 5, "z1", "U")]), "bX"))
    with pytest.raises(CommitConflictError):
        apply_batch(spark, t, ev(spark, [("r1", "b", 6, "w1", "U")]), "b1",
                    normalize=False, metrics=False)
    # the competing commit is intact; the loser left only an orphan
    # staging dir (its own writer token — nobody's files were clobbered)
    assert contents(t.read(spark)) == {("r1", "a"): "v1", ("r2", "x"): "z1"}
    live = {f["path"].split("/", 2)[1] for f in t.current_snapshot()["files"]}
    on_disk = set(os.listdir(os.path.join(t.root, "data")))
    orphans = on_disk - live
    assert orphans and all(f"-{t.writer_token}" in o for o in orphans)
    removed = vacuum_orphans(t)
    assert orphans <= set(removed)
    assert contents(t.read(spark)) == {("r1", "a"): "v1", ("r2", "x"): "z1"}


def test_writer_tokens_are_unique_per_handle(tmp_path):
    root = str(tmp_path / "t")
    assert CdcTable(root).writer_token != CdcTable(root).writer_token
