"""SCD Type-2 history maintenance (cdc.scd2): per-commit refresh, as-of
reconstruction, exactly-once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc.pipeline import apply_batch
from cdc.scd2 import (current_versions, history_table, refresh_history,
                      versions_as_of_snapshot)
from cdc.table.table import CdcTable
from cdc.testing.gen import gen_change_events


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("scd2")
    events = gen_change_events(spark, n_keys=150, mean_events_per_key=5,
                               seed=53).cache()
    base = CdcTable(str(root / "base"), n_partitions=4, layout="key_hash")
    hist = history_table(str(root / "hist"), base)
    bids = sorted(r[0] for r in events.select("batch_id").distinct().collect())
    for i, b in enumerate(bids):
        apply_batch(spark, base, events.filter(F.col("batch_id") == b),
                    f"b{i}", normalize=False, metrics=False)
        refresh_history(spark, base, hist)
    events.unpersist()
    return {"base": base, "hist": hist, "n_commits": len(bids)}


def state_set(df):
    return {(r.repo, r.path, r._lsn if hasattr(r, "_lsn") else r.row_lsn,
             r.content) for r in df.collect()}


def test_current_versions_equal_live_state(spark, env):
    base, hist = env["base"], env["hist"]
    live = base.read(spark).select("repo", "path", "_lsn", "content")
    cur = current_versions(spark, hist).select("repo", "path", "row_lsn", "content")
    assert state_set(cur) == state_set(live)


def test_as_of_reconstructs_every_snapshot(spark, env):
    base, hist = env["base"], env["hist"]
    for snap in base.snapshots():
        sid = snap["snapshot_id"]
        want = state_set(base.read(spark, snapshot_id=sid)
                         .select("repo", "path", "_lsn", "content"))
        got = state_set(versions_as_of_snapshot(spark, hist, sid)
                        .select("repo", "path", "row_lsn", "content"))
        assert got == want, f"history reconstruction diverged at snapshot {sid}"


def test_versions_are_well_formed(spark, env):
    hist = env["hist"]
    rows = hist.read(spark).select(
        "repo", "path", "valid_from_snap", "valid_to_snap").collect()
    for r in rows:
        assert r.valid_to_snap is None or r.valid_to_snap > r.valid_from_snap
    # at most one open version per entity
    from collections import Counter
    open_counts = Counter((r.repo, r.path) for r in rows if r.valid_to_snap is None)
    assert all(v == 1 for v in open_counts.values())


def test_refresh_is_idempotent(spark, env):
    base, hist = env["base"], env["hist"]
    before = hist.current_snapshot()["snapshot_id"]
    assert refresh_history(spark, base, hist) is None
    assert hist.current_snapshot()["snapshot_id"] == before


def test_layout_guard(spark, tmp_path):
    base = CdcTable(str(tmp_path / "b"), n_partitions=2)
    bad = CdcTable(str(tmp_path / "h"),
                   key_cols=(*base.key_cols, "valid_from_snap"),
                   n_partitions=2, layout="key_hash")
    with pytest.raises(ValueError, match="repo_hash"):
        refresh_history(spark, base, bad)
