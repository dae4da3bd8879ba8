"""Write-audit-publish staging, snapshot rollback, quality expectations
(SURVEY.md §4 commit-protocol extensions)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc import quality
from cdc.meta.store import CommitConflictError
from cdc.pipeline import apply_batch
from cdc.table import wap
from cdc.table.maintenance import rollback, vacuum_orphans
from cdc.table.table import CdcTable


def ev(spark, rows, batch_id=0):
    """rows: (repo, path, lsn, content, op)"""
    return (spark.createDataFrame(
                rows, "repo string, path string, lsn long, "
                      "content string, op string")
            .select("*",
                    F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
                    F.lit(batch_id).alias("batch_id")))


def contents(df):
    return {(r.repo, r.path): r.content for r in
            df.select("repo", "path", "content").collect()}


def test_stage_is_invisible_until_publish(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U"),
                                     ("r1", "b", 2, "w1", "U")]),
                "b0", normalize=False, metrics=False)
    staged_snap = wap.stage(spark, t, ev(spark, [("r1", "a", 5, "v2", "U")]),
                            "b1")
    # main line untouched; staged read sees the merge result
    assert contents(t.read(spark)) == {("r1", "a"): "v1", ("r1", "b"): "w1"}
    assert not t.is_committed("b1")
    assert contents(wap.read_staged(spark, t)) == {("r1", "a"): "v2",
                                                   ("r1", "b"): "w1"}
    pub = wap.publish(t)
    assert pub["snapshot_id"] == staged_snap["snapshot_id"]
    assert wap.staged(t) is None                      # ref consumed
    assert t.is_committed("b1")
    assert contents(t.read(spark)) == {("r1", "a"): "v2", ("r1", "b"): "w1"}


def test_publish_cas_fails_after_mainline_commit(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]),
                "b0", normalize=False, metrics=False)
    staged_snap = wap.stage(spark, t, ev(spark, [("r1", "a", 5, "stale", "U")]),
                            "b1")
    # a main-line commit lands while the audit runs — distinct snapshot id,
    # no file collision with the staged snapshot
    mainline = apply_batch(spark, t, ev(spark, [("r1", "a", 6, "v2", "U")]),
                           "b2", normalize=False, metrics=False)
    assert mainline["snapshot_id"] != staged_snap["snapshot_id"]
    with pytest.raises(CommitConflictError):
        wap.publish(t)
    assert contents(t.read(spark)) == {("r1", "a"): "v2"}
    # abandon + vacuum reclaims the staged files (dir name carries the
    # writer token, so derive it from the staged manifest)
    staged_name = staged_snap["files"][0]["path"].split("/", 2)[1]
    staged_dir = os.path.join(t.root, "data", staged_name)
    assert os.path.isdir(staged_dir)
    assert wap.abandon(t)
    removed = vacuum_orphans(t)
    assert staged_name in removed
    assert not os.path.isdir(staged_dir)
    assert contents(t.read(spark)) == {("r1", "a"): "v2"}


def test_audit_gate_blocks_bad_batch_then_passes_good_one(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]),
                "b0", normalize=False, metrics=False)
    checks = {"content_not_null": quality.not_null("content"),
              "lsn_positive": F.col("_lsn") >= 0}
    wap.stage(spark, t, ev(spark, [("r1", "b", 5, None, "U")]), "bad")
    with pytest.raises(quality.ExpectationError) as ei:
        wap.audit_and_publish(spark, t, predicates=checks,
                              unique=("repo", "path"))
    assert ei.value.violations == {"content_not_null": 1}
    assert wap.staged(t) is None                      # abandoned
    assert contents(t.read(spark)) == {("r1", "a"): "v1"}
    wap.stage(spark, t, ev(spark, [("r1", "b", 6, "w1", "U")]), "good")
    wap.audit_and_publish(spark, t, predicates=checks, unique=("repo", "path"))
    assert contents(t.read(spark)) == {("r1", "a"): "v1", ("r1", "b"): "w1"}


def test_rollback_restores_state_schema_and_ledger(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]),
                "b0", normalize=False, metrics=False)
    keep = t.current_snapshot()["snapshot_id"]
    apply_batch(spark, t, ev(spark, [("r1", "a", 5, "v2", "U"),
                                     ("r2", "x", 6, "z1", "U")]),
                "b1", normalize=False, metrics=False)
    assert t.is_committed("b1")
    rb = rollback(t, keep)
    assert rb["operation"] == "rollback"
    assert contents(t.read(spark)) == {("r1", "a"): "v1"}
    assert t.lsn_high() == 1
    # the undone batch left the ledger -> replaying it APPLIES again
    assert not t.is_committed("b1")
    apply_batch(spark, t, ev(spark, [("r1", "a", 5, "v2", "U"),
                                     ("r2", "x", 6, "z1", "U")]),
                "b1", normalize=False, metrics=False)
    assert contents(t.read(spark)) == {("r1", "a"): "v2", ("r2", "x"): "z1"}
    # history stayed append-only: time travel into the undone range works
    undone = contents(t.read(spark, snapshot_id=keep + 1))
    assert undone == {("r1", "a"): "v2", ("r2", "x"): "z1"}
    # rolling back to the current snapshot is a no-op
    cur = t.current_snapshot()
    assert rollback(t, cur["snapshot_id"])["snapshot_id"] == cur["snapshot_id"]


def test_quality_check_counts_and_violation_rows(spark):
    df = spark.createDataFrame(
        [("r1", "a", 1, "ok"), ("r1", "a", 2, None), ("r2", "b", -3, "ok")],
        "repo string, path string, lsn long, content string")
    checks = {"content_not_null": quality.not_null("content"),
              "lsn_in_range": quality.in_range("lsn", 0, 100),
              "repo_known": quality.one_of("repo", ["r1", "r2"])}
    counts = quality.check(df, checks, unique=("repo", "path"))
    assert counts == {"content_not_null": 1, "lsn_in_range": 1,
                      "repo_known": 0, "unique(repo,path)": 1}
    bad = {tuple(r._failed_checks) for r in
           quality.violations(df, checks).collect()}
    assert bad == {("content_not_null",), ("lsn_in_range",)}
    # empty frame -> zero violations, enforce passes
    assert all(v == 0 for v in
               quality.enforce(df.limit(0), checks, unique=("repo",)).values())
    with pytest.raises(quality.ExpectationError):
        quality.enforce(df, checks)


def test_branch_chain_stage_publish(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]),
                "b0", normalize=False, metrics=False)
    # two chained stages: the second merges AGAINST the first's state
    wap.stage(spark, t, ev(spark, [("r1", "b", 5, "w1", "U")]), "b1")
    head = wap.stage(spark, t, ev(spark, [("r1", "b", 6, "w2", "U"),
                                          ("r2", "x", 7, "z1", "U")]), "b2")
    assert contents(t.read(spark)) == {("r1", "a"): "v1"}   # main untouched
    assert contents(wap.read_staged(spark, t)) == {
        ("r1", "a"): "v1", ("r1", "b"): "w2", ("r2", "x"): "z1"}
    # exactly-once against the BRANCH ledger: restaging b1 no-ops
    assert wap.stage(spark, t, ev(spark, [("r1", "b", 9, "dup", "U")]),
                     "b1")["snapshot_id"] == head["snapshot_id"]
    pub = wap.publish(t)                                    # fast-forward
    assert pub["snapshot_id"] == head["snapshot_id"]
    assert t.is_committed("b1") and t.is_committed("b2")
    assert contents(t.read(spark)) == {
        ("r1", "a"): "v1", ("r1", "b"): "w2", ("r2", "x"): "z1"}
    # chain history is intact after publish (parent links on main line)
    assert contents(t.read(spark, snapshot_id=pub["parent_id"])) == {
        ("r1", "a"): "v1", ("r1", "b"): "w1"}


def test_branch_abandon_drops_whole_chain(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]),
                "b0", normalize=False, metrics=False)
    s1 = wap.stage(spark, t, ev(spark, [("r1", "b", 5, "w1", "U")]), "b1")
    s2 = wap.stage(spark, t, ev(spark, [("r2", "x", 6, "z1", "U")]), "b2")
    # a main-line commit invalidates the branch base -> publish CAS fails
    apply_batch(spark, t, ev(spark, [("r1", "a", 9, "v2", "U")]),
                "bm", normalize=False, metrics=False)
    with pytest.raises(CommitConflictError):
        wap.publish(t)
    assert wap.abandon(t)
    # BOTH chain snapshots' metadata gone; vacuum reclaims both data dirs
    ids = {s["snapshot_id"] for s in t.snapshots()}
    assert s1["snapshot_id"] not in ids and s2["snapshot_id"] not in ids
    removed = vacuum_orphans(t)
    for s in (s1, s2):
        name = s["files"][0]["path"].split("/", 2)[1]
        assert name in removed
    assert contents(t.read(spark)) == {("r1", "a"): "v2"}


def test_restage_after_publish_uses_fresh_fork_point(spark, tmp_path):
    """Regression: a published snapshot keeps its branch_base in history;
    a FRESH stage forking from it must CAS on the fork point itself, not
    inherit that stale base (which made every post-publish stage fail)."""
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]),
                "b0", normalize=False, metrics=False)
    wap.stage(spark, t, ev(spark, [("r1", "b", 5, "w1", "U")]), "b1")
    wap.publish(t)
    # second WAP cycle on the now-advanced main line
    wap.stage(spark, t, ev(spark, [("r2", "x", 9, "z1", "U")]), "b2")
    pub = wap.publish(t)
    assert pub["branch_base"] == pub["parent_id"]
    assert contents(t.read(spark)) == {
        ("r1", "a"): "v1", ("r1", "b"): "w1", ("r2", "x"): "z1"}


def test_publish_all_is_all_or_nothing(spark, tmp_path):
    """Multi-table atomic publish: both tables' staged refs fast-forward
    together; a CAS failure on ONE table publishes NEITHER."""
    a = CdcTable(str(tmp_path / "a"), n_partitions=4, layout="key_hash")
    b = CdcTable(str(tmp_path / "b"), n_partitions=4, layout="key_hash")
    for t, key in ((a, "a0"), (b, "b0")):
        apply_batch(spark, t, ev(spark, [("r1", "x", 1, "v1", "U")]), key,
                    normalize=False, metrics=False)
    wap.stage(spark, a, ev(spark, [("r1", "y", 5, "w1", "U")]), "a1")
    wap.stage(spark, b, ev(spark, [("r1", "z", 6, "z1", "U")]), "b1")
    pa, pb = wap.publish_all([(a, "audit"), (b, "audit")])
    assert contents(a.read(spark)) == {("r1", "x"): "v1", ("r1", "y"): "w1"}
    assert contents(b.read(spark)) == {("r1", "x"): "v1", ("r1", "z"): "z1"}
    assert pa["snapshot_id"] == a.current_snapshot()["snapshot_id"]
    assert pb["snapshot_id"] == b.current_snapshot()["snapshot_id"]

    # second round: main-line advance on b invalidates the WHOLE txn
    wap.stage(spark, a, ev(spark, [("r2", "p", 9, "q1", "U")]), "a2")
    wap.stage(spark, b, ev(spark, [("r2", "p", 9, "q1", "U")]), "b2")
    apply_batch(spark, b, ev(spark, [("r9", "m", 8, "mm", "U")]), "bm",
                normalize=False, metrics=False)
    before_a = a.current_snapshot()["snapshot_id"]
    before_b = b.current_snapshot()["snapshot_id"]
    with pytest.raises(CommitConflictError):
        wap.publish_all([(a, "audit"), (b, "audit")])
    # NOTHING moved; both refs still staged (retryable after restage)
    assert a.current_snapshot()["snapshot_id"] == before_a
    assert b.current_snapshot()["snapshot_id"] == before_b
    assert wap.staged(a) is not None and wap.staged(b) is not None


def test_publish_all_crash_rolls_forward(spark, tmp_path, monkeypatch):
    """Crash after the intent + first swap: recover() completes the
    remaining swaps (roll-forward) — never a half-published end state."""
    from cdc.meta import store as st

    a = CdcTable(str(tmp_path / "a"), n_partitions=4, layout="key_hash")
    b = CdcTable(str(tmp_path / "b"), n_partitions=4, layout="key_hash")
    for t, key in ((a, "a0"), (b, "b0")):
        apply_batch(spark, t, ev(spark, [("r1", "x", 1, "v1", "U")]), key,
                    normalize=False, metrics=False)
    wap.stage(spark, a, ev(spark, [("r1", "y", 5, "w1", "U")]), "a1")
    wap.stage(spark, b, ev(spark, [("r1", "z", 6, "z1", "U")]), "b1")

    real = st._complete_swap
    calls = {"n": 0}

    def crashing(root, ref, name):
        if calls["n"] == 1:
            raise RuntimeError("simulated crash mid-publish")
        calls["n"] += 1
        real(root, ref, name)

    monkeypatch.setattr(st, "_complete_swap", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        wap.publish_all([(a, "audit"), (b, "audit")])
    monkeypatch.setattr(st, "_complete_swap", real)

    # intent survives the crash; a fresh publish refuses until recovery
    wap.stage(spark, a, ev(spark, [("r3", "n", 7, "x", "U")]), "nope")
    with pytest.raises(CommitConflictError, match="recover_txn"):
        wap.publish_all([(a, "nope")])
    assert wap.recover([a, b])
    assert not wap.recover([a, b])          # idempotent no-op second time
    # BOTH tables ended published, including the one whose swap crashed
    assert contents(a.read(spark)) == {("r1", "x"): "v1", ("r1", "y"): "w1"}
    assert contents(b.read(spark)) == {("r1", "x"): "v1", ("r1", "z"): "z1"}
    assert wap.staged(a, "audit") is None and wap.staged(b, "audit") is None
