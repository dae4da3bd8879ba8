"""Merge-on-read commits: delta layers, read reconcile, compaction fold,
CoW equivalence (cdc.table.table.commit_delta)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc.pipeline import replay
from cdc.table.maintenance import compact
from cdc.table.table import CdcTable
from cdc.testing.gen import gen_change_events, write_change_log
from cdc.testing.oracle import expected_state


@pytest.fixture(scope="module")
def log_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("mor")
    events = gen_change_events(spark, n_keys=500, mean_events_per_key=6, seed=41).cache()
    log_dir = str(root / "log")
    write_change_log(events, log_dir, events_per_file=800)
    return {"events": events, "log_dir": log_dir, "root": root}


def live_set(spark, table):
    return {(r.repo, r.path, r._lsn, r._content_sha256) for r in
            table.read(spark).select("repo", "path", "_lsn", "_content_sha256").collect()}


def test_mor_equals_cow_and_pandas_oracle(spark, log_env, tmp_path):
    cow = CdcTable(str(tmp_path / "cow"), n_partitions=4)
    replay(spark, log_env["log_dir"], cow, batches_per_commit=2, metrics=False)

    mor = CdcTable(str(tmp_path / "mor"), n_partitions=4)
    replay(spark, log_env["log_dir"], mor, batches_per_commit=2, metrics=False,
           mode="mor")
    assert live_set(spark, mor) == live_set(spark, cow)

    exp = expected_state(log_env["events"].toPandas())
    got = {(r[0], r[1], r[3]) for r in live_set(spark, mor)}
    assert got == set(map(tuple, exp[["repo", "path", "content_sha256"]].values))


def test_mor_commit_appends_only_batch_rows(spark, log_env, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4)
    replay(spark, log_env["log_dir"], t, batches_per_commit=2, metrics=False,
           mode="mor")
    snaps = t.snapshots()
    assert len(snaps) >= 2
    last = snaps[-1]
    added = [f for f in last["files"] if f["origin"] == "added"]
    carried = [f for f in last["files"] if f["origin"] == "existing"]
    assert added and carried
    assert all(f["kind"] == "delta" for f in added)
    # delta layers are small: far fewer rows than the full key space
    n_added = sum(f["rows"] for f in added)
    assert n_added < t.read(spark).count()


def test_mor_out_of_order_batches(spark, tmp_path):
    """A lower-LSN batch applied after a higher-LSN one must lose at read
    time (the reconcile is max-_lsn per key, tombstones included)."""
    from cdc.pipeline import apply_batch

    def mk(rows):
        df = spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, "
                  "content string, lsn long, op string, batch_id long")
        return df.withColumn("ts", F.timestamp_seconds(F.col("lsn")))

    t = CdcTable(str(tmp_path / "t"), n_partitions=2)
    hi = mk([("r", "a", "c2", "py", None, 10, "D", 1),
             ("r", "b", "c3", "py", "new-b", 11, "U", 1)])
    lo = mk([("r", "a", "c1", "py", "old-a", 5, "U", 0),
             ("r", "c", "c4", "py", "only-c", 6, "I", 0)])
    apply_batch(spark, t, hi, "hi", metrics=False, mode="mor")
    apply_batch(spark, t, lo, "lo", metrics=False, mode="mor")

    state = {r.path: (r._lsn, r.content) for r in t.read(spark).collect()}
    assert "a" not in state               # delete at lsn 10 beats update at 5
    assert state["b"] == (11, "new-b")
    assert state["c"] == (6, "only-c")    # unseen key from the late batch lands


def test_compact_folds_deltas(spark, log_env, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4)
    replay(spark, log_env["log_dir"], t, batches_per_commit=2, metrics=False,
           mode="mor")
    before = live_set(spark, t)
    assert any(f.get("kind") == "delta" for f in t.current_snapshot()["files"])

    snap = compact(spark, t, vacuum_tombstones_below_lsn=t.lsn_high())
    assert all(f["kind"] == "base" for f in snap["files"])
    assert live_set(spark, t) == before
    assert t.read(spark, include_deleted=True).filter("_deleted").count() == 0


def test_mixed_mode_commits(spark, log_env, tmp_path):
    """CoW commit on top of MOR deltas reconciles the touched partitions
    and leaves untouched partitions' deltas in place."""
    from cdc.pipeline import apply_batch
    from cdc.io.log import read_log
    from cdc.schema.registry import default_registry

    t = CdcTable(str(tmp_path / "t"), n_partitions=4)
    reg = default_registry()
    log = read_log(spark, log_env["log_dir"], reg)
    mid = 1000
    apply_batch(spark, t, log.filter(F.col("lsn") <= mid), "b1",
                metrics=False, mode="mor")
    apply_batch(spark, t, log.filter(F.col("lsn") > mid), "b2",
                metrics=False, mode="cow")

    cow = CdcTable(str(tmp_path / "cow_ref"), n_partitions=4)
    replay(spark, log_env["log_dir"], cow, metrics=False)
    assert live_set(spark, t) == live_set(spark, cow)


def test_mor_equal_lsn_ties_resolve_in_commit_order(spark, tmp_path):
    """ADVICE.md round-1 (low): equal-_lsn rows landing in different delta
    layers must reconcile deterministically in COMMIT order (later layer
    wins), matching CoW's batch-wins (>=) merge semantics — not an
    arbitrary max_by tie-break."""
    import datetime
    t0 = datetime.datetime(2026, 1, 1)
    ddl = ("repo string, path string, content string, lsn long, "
           "ts timestamp, op string, batch_id long")

    def batch(op, content):
        return spark.createDataFrame(
            [("r0", "k.py", content, 7, t0, op, 0)], ddl)

    # same-lsn delete tombstone then update, in separate delta commits:
    # the LATER commit must win on read.
    t = CdcTable(str(tmp_path / "a"), n_partitions=2)
    t.commit_delta(spark, batch("D", None), "b1")
    t.commit_delta(spark, batch("U", "v2"), "b2")
    rows = t.read(spark).collect()
    assert [(r["path"], r["content"], r["_lsn"]) for r in rows] == [("k.py", "v2", 7)]

    # reversed commit order: the delete is the later layer -> key is dead.
    t2 = CdcTable(str(tmp_path / "b"), n_partitions=2)
    t2.commit_delta(spark, batch("U", "v2"), "b1")
    t2.commit_delta(spark, batch("D", None), "b2")
    assert t2.read(spark).count() == 0


def test_key_hash_stream_and_compact(spark, log_env, tmp_path):
    """key_hash layout end-to-end under MOR commits + compaction: state
    equals the CoW repo_hash replay, and compacted files stay
    one-part-per-file."""
    import os
    from cdc.table.table import key_part_expr
    ref = CdcTable(str(tmp_path / "ref"), n_partitions=4)
    replay(spark, log_env["log_dir"], ref, metrics=False)

    t = CdcTable(str(tmp_path / "kh"), n_partitions=4, layout="key_hash")
    replay(spark, log_env["log_dir"], t, batches_per_commit=2, metrics=False,
           mode="mor")
    assert live_set(spark, t) == live_set(spark, ref)

    compact(spark, t, files_per_partition=1)
    assert live_set(spark, t) == live_set(spark, ref)
    files = t.current_snapshot()["files"]
    assert len(files) == 4  # one file per partition after compaction
    for f in files:
        got = (spark.read.parquet(os.path.join(t.root, f["path"]))
               .select(key_part_expr(("repo", "path"), 4).alias("p"))
               .distinct().collect())
        assert [r.p for r in got] == [int(f["part"])]
