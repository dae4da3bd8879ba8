"""Round-3 regression pins for the ADVICE findings: snapshot-id
allocation race (metadata write-once under the commit lock), depth-aware
Debezium DDL parsing, expire_snapshots pinning staged branch chains,
clear error on un-refreshed index lookups, and verify_table on MOR
snapshots with no applicable data checks."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cdc import index
from cdc.io.debezium import from_debezium
from cdc.meta import store
from cdc.meta.store import CommitConflictError
from cdc.pipeline import apply_batch
from cdc.table import wap
from cdc.table.maintenance import expire_snapshots, vacuum_orphans, verify_table
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


# ---------------------------------------------------------------- store race

def test_duplicate_snapshot_id_write_raises_not_clobbers(spark, tmp_path):
    """Two staged writers that optimistically allocated the SAME snapshot
    id must not clobber each other's metadata: the second write_snapshot
    for an id is a conflict, and the first ref's staged state survives."""
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]), "b0",
                normalize=False, metrics=False)
    snap_a = wap.stage(spark, t, ev(spark, [("r1", "a", 5, "staged-a", "U")]),
                       "b1", ref="tx_a")
    sid = snap_a["snapshot_id"]

    # writer B (its OWN handle — own writer token, own staging dirs)
    # allocated the same id during its data-write window
    other = CdcTable.open(t.root)
    orig = store.next_snapshot_id
    try:
        store.next_snapshot_id = lambda root: sid
        with pytest.raises(CommitConflictError, match="already written"):
            wap.stage(spark, other,
                      ev(spark, [("r2", "x", 6, "staged-b", "U")]),
                      "b2", ref="tx_b")
    finally:
        store.next_snapshot_id = orig

    # A's staged chain is untouched and still publishable
    assert contents(wap.read_staged(spark, t, ref="tx_a")) == {
        ("r1", "a"): "staged-a"}
    pub = wap.publish(t, ref="tx_a")
    assert pub["snapshot_id"] == sid
    assert contents(t.read(spark)) == {("r1", "a"): "staged-a"}


def test_store_rejects_existing_snapshot_file(tmp_path):
    root = str(tmp_path / "t")
    snap = store.new_snapshot(None, "b0", 1, [], "repo string", committed_ts="t0")
    store.write_snapshot(root, dict(snap))
    with pytest.raises(CommitConflictError, match="already written"):
        store.write_snapshot(root, dict(snap), ref="other")


# ------------------------------------------------------------ debezium DDL

def test_debezium_parameterized_types_parse(spark):
    """decimal(18,2) / struct<...> field types carry commas a naive split
    would break on — the decoded frame must still name fields correctly."""
    row_ddl = ("repo string, amount decimal(18,2), "
               "meta struct<a: int, b: string>, path string")
    val = json.dumps({"payload": {
        "before": None,
        "after": {"repo": "r1", "amount": 12.50,
                  "meta": {"a": 1, "b": "x"}, "path": "p"},
        "op": "c", "ts_ms": 1767225600000, "source": {"lsn": 7}}})
    df = spark.createDataFrame([(val,)], "value string")
    out = from_debezium(df, row_ddl)
    assert out.columns[:4] == ["repo", "amount", "meta", "path"]
    r = out.collect()[0]
    assert (r.repo, str(r.amount), r.meta.a, r.meta.b, r.path, r.op, r.lsn) \
        == ("r1", "12.50", 1, "x", "p", "U", 7)


# ----------------------------------------------- expire pins staged chains

def test_expire_snapshots_pins_staged_branch_chain(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]), "b0",
                normalize=False, metrics=False)
    staged = wap.stage(spark, t, ev(spark, [("r1", "a", 5, "audit", "U")]),
                       "b1", ref="audit")
    # chain a second stage onto the same ref
    head = wap.stage(spark, t, ev(spark, [("r1", "b", 6, "w1", "U")]),
                     "b2", ref="audit")
    # main line advances well past the staged chain's ids
    for i in range(3):
        apply_batch(spark, t, ev(spark, [("r9", f"p{i}", 10 + i, "z", "U")]),
                    f"main{i}", normalize=False, metrics=False)

    expired = expire_snapshots(t, keep_last=1)
    # staged chain snapshots survive expiry (they are held by a live ref)
    for sid in (staged["snapshot_id"], head["snapshot_id"]):
        assert os.path.exists(store.snap_path(t.root, sid)), sid
        assert sid not in expired
    # the staged state stays readable and its data survives vacuum
    vacuum_orphans(t)
    assert contents(wap.read_staged(spark, t, ref="audit")) == {
        ("r1", "a"): "audit", ("r1", "b"): "w1"}
    # abandon still works cleanly (no dangling-ref FileNotFoundError)
    assert wap.abandon(t, ref="audit")
    assert wap.staged(t, ref="audit") is None


# ---------------------------------------------------- ledger window bound

def test_batch_key_past_ledger_window_replays_as_lsn_noop(
        spark, tmp_path, monkeypatch):
    """A batch_key trimmed out of the LEDGER_KEEP window re-applies
    instead of short-circuiting — the LSN merge guard must make that
    replay a no-op for full images AND patch images."""
    monkeypatch.setattr(store, "LEDGER_KEEP", 2)
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]), "old",
                normalize=False, metrics=False)
    # push 'old' out of the 2-entry ledger window
    apply_batch(spark, t, ev(spark, [("r1", "a", 5, "v2", "U")]), "mid",
                normalize=False, metrics=False)
    apply_batch(spark, t, ev(spark, [("r1", "b", 6, "w1", "U")]), "new",
                normalize=False, metrics=False)
    assert not t.is_committed("old") and t.is_committed("new")

    before = contents(t.read(spark))
    res = apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]),
                      "old", normalize=False, metrics=False)
    # not a ledger short-circuit: it really re-applied (a new snapshot)...
    assert res is not None
    # ...but the stale row lost the LSN guard — data unchanged
    assert contents(t.read(spark)) == before == {("r1", "a"): "v2",
                                                 ("r1", "b"): "w1"}

    # patch-image twin: stale patch loses; equal-lsn latest-patch replay
    # recomputes the identical coalesce
    p = (spark.createDataFrame(
            [("r1", "a", 9, "patched", "U")],
            "repo string, path string, lsn long, content string, op string")
         .select("*", F.to_timestamp(F.lit("2026-01-02")).alias("ts"),
                 F.lit(0).alias("batch_id")))
    apply_batch(spark, t, p, "p1", normalize=False, metrics=False,
                image="patch")
    apply_batch(spark, t, ev(spark, [("r9", "x", 10, "z", "U")]), "f1",
                normalize=False, metrics=False)
    apply_batch(spark, t, ev(spark, [("r9", "y", 11, "z", "U")]), "f2",
                normalize=False, metrics=False)
    assert not t.is_committed("p1")
    before = contents(t.read(spark))
    apply_batch(spark, t, p, "p1", normalize=False, metrics=False,
                image="patch")
    assert contents(t.read(spark)) == before
    assert before[("r1", "a")] == "patched"


# ------------------------------------------------------ index empty lookup

def test_index_lookup_before_refresh_raises_clear_error(spark, tmp_path):
    base = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, base, ev(spark, [("r1", "a", 1, "v1", "U")]), "b0",
                normalize=False, metrics=False)
    idx = index.create_index(str(tmp_path / "idx"), base, "content")
    with pytest.raises(ValueError, match="index.refresh"):
        index.lookup_value(spark, base, idx, "v1")


# ---------------------------------------------- verify_table empty checks

def test_verify_table_mor_without_content_columns(spark, tmp_path):
    """A MOR snapshot over a schema with no content/_content_sha256
    columns has no applicable data checks: check_data=True must return
    the metadata-tier result, not crash on an empty agg."""
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    events = (spark.createDataFrame(
                  [("r1", "a", 1, 10, "U"), ("r1", "b", 2, 20, "U")],
                  "repo string, path string, lsn long, val long, op string")
              .select("*",
                      F.to_timestamp(F.lit("2026-01-01")).alias("ts"),
                      F.lit(0).alias("batch_id")))
    apply_batch(spark, t, events, "b0", normalize=False, metrics=False)
    more = (spark.createDataFrame(
                [("r1", "a", 5, 11, "U")],
                "repo string, path string, lsn long, val long, op string")
            .select("*",
                    F.to_timestamp(F.lit("2026-01-02")).alias("ts"),
                    F.lit(1).alias("batch_id")))
    apply_batch(spark, t, more, "b1", normalize=False, metrics=False,
                mode="mor")
    res = verify_table(spark, t, check_data=True)
    assert res["ok"], res["errors"]
    assert res["files_checked"] > 0


def test_verify_table_catches_patch_mor_corruption(spark, tmp_path):
    """The data-tier audit must check STORED bytes, not a reconciled
    read: a patch-MOR read recomputes the sha from the folded content, so
    only a raw-file check can see a bit-flipped stored content value."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U")]), "b0",
                normalize=False, metrics=False)
    apply_batch(spark, t, ev(spark, [("r1", "a", 5, "patched", "U")]),
                "b1", normalize=False, metrics=False, mode="mor",
                image="patch")
    assert verify_table(spark, t, check_data=True)["ok"]

    delta = next(f for f in t.current_snapshot()["files"]
                 if f.get("kind") == "delta")
    full = os.path.join(t.root, delta["path"])
    raw = pq.read_table(full)
    cols = [pa.array(["CORRUPTED"] * raw.num_rows)
            if n == "content" else raw[n] for n in raw.column_names]
    pq.write_table(pa.table(cols, names=raw.column_names), full)
    crc = os.path.join(os.path.dirname(full),
                       "." + os.path.basename(full) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)   # Hadoop LocalFS checksum sidecar (CLAUDE.md)

    res = verify_table(spark, t, check_data=True)
    assert not res["ok"]
    assert any("sha256" in e for e in res["errors"]), res["errors"]
