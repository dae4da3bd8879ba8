"""ALTER TABLE column mapping (cdc/table/alter.py): rename / drop / add /
widen as metadata-only commits, resolved by field id on read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc.pipeline import apply_batch
from cdc.table import alter
from cdc.table.maintenance import rollback
from cdc.table.table import CdcTable


def ev(spark, rows, batch_id=0):
    """rows: (repo, path, lsn, content, score, op)"""
    return (spark.createDataFrame(
                rows, "repo string, path string, lsn long, "
                      "content string, score int, op string")
            .select("*",
                    F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
                    F.lit(batch_id).alias("batch_id")))


ROWS = [("r1", "a", 1, "v1", 10, "U"), ("r2", "b", 2, "w1", 20, "U"),
        ("r3", "c", 3, "x1", 30, "U")]


@pytest.fixture
def table(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, ROWS), "b0",
                normalize=False, metrics=False)
    return t


def test_rename_is_metadata_only(spark, table):
    before = {f["path"] for f in table.current_snapshot()["files"]}
    snap = alter.rename_column(table, "content", "body")
    assert snap["operation"] == "alter"
    # zero data movement: exactly the same files serve the renamed column
    assert {f["path"] for f in snap["files"]} == before
    got = {(r.repo, r.body) for r in
           table.read(spark).select("repo", "body").collect()}
    assert got == {("r1", "v1"), ("r2", "w1"), ("r3", "x1")}
    assert "content" not in table.read(spark).columns
    # time travel to the pre-rename snapshot still resolves the OLD name
    old = table.read(spark, snapshot_id=1)
    assert "content" in old.columns and "body" not in old.columns
    # a post-rename batch writes under the new name and merges with old files
    apply_batch(spark, table,
                ev(spark, [("r1", "a", 9, "v2", 11, "U")])
                .withColumnRenamed("content", "body"),
                "b1", normalize=False, metrics=False)
    got = {(r.repo, r.body) for r in
           table.read(spark).select("repo", "body").collect()}
    assert got == {("r1", "v2"), ("r2", "w1"), ("r3", "x1")}
    # point lookups keep working across mixed-schema files
    assert table.lookup(spark, repo="r1", path="a").collect()[0].body == "v2"


def test_drop_then_readd_never_resurrects(spark, table):
    alter.drop_column(table, "score")
    assert "score" not in table.read(spark).columns
    # re-added name mints a FRESH field id: old bytes stay dead
    alter.add_column(table, "score", "int")
    vals = {r.repo: r.score for r in table.read(spark).collect()}
    assert vals == {"r1": None, "r2": None, "r3": None}
    apply_batch(spark, table, ev(spark, [("r2", "b", 9, "w2", 99, "U")]),
                "b1", normalize=False, metrics=False)
    vals = {r.repo: r.score for r in table.read(spark).collect()}
    assert vals == {"r1": None, "r2": 99, "r3": None}
    # pre-drop history still shows the original values
    old = {r.repo: r.score for r in
           table.read(spark, snapshot_id=1).collect()}
    assert old == {"r1": 10, "r2": 20, "r3": 30}


def test_widen_column_in_place(spark, table):
    alter.widen_column(table, "score", "bigint")
    df = table.read(spark)
    assert dict(df.dtypes)["score"] == "bigint"
    assert {r.score for r in df.collect()} == {10, 20, 30}
    apply_batch(spark, table,
                ev(spark, [("r9", "z", 9, "n", 1, "U")])
                .withColumn("score", F.lit(5_000_000_000).cast("bigint")),
                "b1", normalize=False, metrics=False)
    assert {r.score for r in table.read(spark).collect()} == \
        {10, 20, 30, 5_000_000_000}
    with pytest.raises(ValueError, match="cannot widen"):
        alter.widen_column(table, "content", "bigint")


def test_alter_guards_and_rollback(spark, table):
    with pytest.raises(ValueError, match="key column"):
        alter.rename_column(table, "repo", "repository")
    with pytest.raises(ValueError, match="system column"):
        alter.drop_column(table, "_lsn")
    with pytest.raises(ValueError, match="already exists"):
        alter.add_column(table, "score", "int")
    snap = alter.rename_column(table, "content", "body")
    rollback(table, 1)
    df = table.read(spark)
    assert "content" in df.columns and "body" not in df.columns
    assert {r.content for r in df.collect()} == {"v1", "w1", "x1"}
    # history is append-only: the alter snapshot is still readable
    assert "body" in table.read(spark, snapshot_id=snap["snapshot_id"]).columns


def test_rename_through_datasource_and_feed(spark, table):
    from cdc.spark_source import CdcTableDataSource
    from cdc.table.timetravel import change_feed

    spark.dataSource.register(CdcTableDataSource)
    alter.rename_column(table, "content", "body")
    df = spark.read.format("cdctable").option("root", table.root).load()
    assert {(r.repo, r.body) for r in df.select("repo", "body").collect()} \
        == {("r1", "v1"), ("r2", "w1"), ("r3", "x1")}
    # change feed across the rename classifies nothing as changed (the
    # alter moved no rows) — and emits the current names
    apply_batch(spark, table,
                ev(spark, [("r1", "a", 9, "v2", 11, "U")])
                .withColumnRenamed("content", "body"),
                "b1", normalize=False, metrics=False)
    feed = change_feed(spark, table, 1, 3)
    rows = [(r.repo, r.body, r._change_type) for r in feed.collect()]
    assert rows == [("r1", "v2", "update")]


# -- property: random ALTER sequences vs a pure-Python column model --------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_POOL = ["c1", "c2", "c3"]


@st.composite
def _alter_programs(draw):
    """Random sequences of (rename|drop|add) over a small column pool."""
    ops = []
    for _ in range(draw(st.integers(min_value=1, max_value=6))):
        kind = draw(st.sampled_from(["rename", "drop", "add"]))
        ops.append((kind,
                    draw(st.sampled_from(_POOL + ["x1", "x2"])),
                    draw(st.sampled_from(["x1", "x2", "x3"]))))
    return ops


@pytest.mark.slow
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_alter_programs())
def test_alter_sequences_match_column_model(spark, tmp_path_factory, prog):
    """Any legal sequence of rename/drop/add leaves the table readable
    with exactly the model's (column -> original-source) mapping: renamed
    columns serve their original data, re-added names serve NULL."""
    tmp = tmp_path_factory.mktemp("alterprop")
    t = CdcTable(str(tmp / "t"), n_partitions=2, layout="key_hash")
    base = (spark.createDataFrame(
                [("r1", "a", 1, "v", 11, 22, 33)],
                "repo string, path string, lsn long, content string, "
                "c1 int, c2 int, c3 int")
            .select("*",
                    F.lit("U").alias("op"),
                    F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
                    F.lit(0).alias("batch_id")))
    apply_batch(spark, t, base, "b0", normalize=False, metrics=False)

    # model: current name -> original column it must serve (None = re-add)
    model = {"c1": "c1", "c2": "c2", "c3": "c3"}
    for kind, a, b in prog:
        try:
            if kind == "rename":
                alter.rename_column(t, a, b)
                model[b] = model.pop(a)
            elif kind == "drop":
                alter.drop_column(t, a)
                model.pop(a)
            else:
                alter.add_column(t, a, "int")
                model[a] = None
        except ValueError:
            # illegal against current schema: engine and model both no-op
            continue

    row = t.read(spark).collect()[0].asDict()
    originals = {"c1": 11, "c2": 22, "c3": 33}
    for cur, src in model.items():
        assert row[cur] == (originals[src] if src else None), \
            f"{cur} (from {src}) after {prog}"
    # no stale names survive
    for pool in ("c1", "c2", "c3", "x1", "x2", "x3"):
        if pool not in model:
            assert pool not in row
