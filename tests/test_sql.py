"""The SQL façade (cdc/sql.py) + catalog (cdc/catalog.py): named tables,
DML/DDL routing onto the commit machinery, SELECT with time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc.catalog import Catalog
from cdc.sql import execute


@pytest.fixture
def cat(tmp_path):
    return Catalog(str(tmp_path / "catalog"))


def q(spark, cat, stmt, **kw):
    return execute(spark, cat, stmt, **kw)


def test_sql_lifecycle_end_to_end(spark, cat):
    q(spark, cat, "CREATE TABLE db.src KEY (repo, path) PARTITIONS 4 "
                  "LAYOUT key_hash")
    assert cat.tables() == ["db.src"]

    seed = spark.createDataFrame(
        [("r1", "a", "v1", 10), ("r2", "b", "w1", 20), ("r3", "c", "x1", 30)],
        "repo string, path string, content string, score int")
    seed.createOrReplaceTempView("seed")
    q(spark, cat, "INSERT INTO db.src SELECT * FROM seed")

    got = q(spark, cat, "SELECT repo, content, score FROM db.src "
                        "ORDER BY repo").collect()
    assert [(r.repo, r.content, r.score) for r in got] == \
        [("r1", "v1", 10), ("r2", "w1", 20), ("r3", "x1", 30)]

    # UPDATE / DELETE route through the transactional mutate path
    q(spark, cat, "UPDATE db.src SET score = score * 2 WHERE repo = 'r1'")
    q(spark, cat, "DELETE FROM db.src WHERE repo = 'r3'")
    got = {(r.repo, r.score) for r in
           q(spark, cat, "SELECT repo, score FROM db.src").collect()}
    assert got == {("r1", 20), ("r2", 20)}

    # time travel: version 1 (the INSERT) still shows r3 and score 10
    old = {(r.repo, r.score) for r in
           q(spark, cat, "SELECT repo, score FROM db.src VERSION AS OF 1")
           .collect()}
    assert old == {("r1", 10), ("r2", 20), ("r3", 30)}

    # ALTER: rename + widen through SQL
    q(spark, cat, "ALTER TABLE db.src RENAME COLUMN content TO body")
    q(spark, cat, "ALTER TABLE db.src ALTER COLUMN score TYPE bigint")
    got = q(spark, cat, "SELECT repo, body FROM db.src WHERE repo = 'r1'")
    assert got.collect()[0].body == "v1"

    # OPTIMIZE + VACUUM
    snap = q(spark, cat, "OPTIMIZE db.src")
    assert snap["operation"] == "compact"
    rep = q(spark, cat, "VACUUM db.src RETAIN 2 SNAPSHOTS")
    assert rep["expired"]

    # joins against ordinary Spark tables/views still work
    dim = spark.createDataFrame([("r1", "alpha")], "repo string, label string")
    dim.createOrReplaceTempView("dim")
    j = q(spark, cat, "SELECT s.repo, d.label FROM db.src s "
                      "JOIN dim d ON s.repo = d.repo").collect()
    assert [(r.repo, r.label) for r in j] == [("r1", "alpha")]

    q(spark, cat, "DROP TABLE db.src")
    assert cat.tables() == []
    with pytest.raises(ValueError, match="unsupported"):
        q(spark, cat, "GRANT ALL ON db.src TO nobody")


def test_sql_optimize_zorder_and_catalog_publish(spark, cat):
    from cdc.table import wap

    q(spark, cat, "CREATE TABLE db.m KEY (repo, path) PARTITIONS 2")
    rows = spark.createDataFrame(
        [(f"r{i}", f"p{i}", float(i % 8), float((i * 3) % 8))
         for i in range(64)],
        "repo string, path string, x double, y double")
    rows.createOrReplaceTempView("rows64")
    q(spark, cat, "INSERT INTO db.m SELECT * FROM rows64")
    snap = q(spark, cat, "OPTIMIZE db.m ZORDER BY (x, y)")
    assert snap["operation"] == "compact"
    assert all("x" in f.get("stats", {}) for f in snap["files"])

    # multi-table publish by name: stage onto both, publish atomically
    q(spark, cat, "CREATE TABLE db.n KEY (repo, path) PARTITIONS 2")
    q(spark, cat, "INSERT INTO db.n SELECT repo, path, x FROM rows64")
    for name in ("db.m", "db.n"):
        t = cat.get(name)
        batch = (t.read(spark).limit(1)
                 .select("repo", "path",
                         F.lit(999).cast("long").alias("lsn"),
                         F.current_timestamp().alias("ts"),
                         F.lit("U").alias("op"),
                         F.lit(0).cast("long").alias("batch_id")))
        wap.stage(spark, t, batch, f"stage-{name}", ref="audit")
    published = cat.publish_all([("db.m", "audit"), ("db.n", "audit")])
    assert len(published) == 2
    assert all(cat.get(n).current_snapshot()["snapshot_id"] ==
               p["snapshot_id"]
               for n, p in zip(("db.m", "db.n"), published))


def test_sql_constraints(spark, cat):
    from cdc import quality

    q(spark, cat, "CREATE TABLE db.c KEY (repo, path) PARTITIONS 2")
    spark.createDataFrame([("r1", "a", 5)],
                          "repo string, path string, score int") \
         .createOrReplaceTempView("one")
    q(spark, cat, "INSERT INTO db.c SELECT * FROM one")
    q(spark, cat, "ALTER TABLE db.c ADD CONSTRAINT pos CHECK (score >= 0)")
    with pytest.raises(quality.ExpectationError):
        q(spark, cat, "UPDATE db.c SET score = -1 WHERE repo = 'r1'",
          mode="cow")
    q(spark, cat, "ALTER TABLE db.c DROP CONSTRAINT pos")
    q(spark, cat, "UPDATE db.c SET score = -1 WHERE repo = 'r1'",
      mode="cow")
    assert q(spark, cat, "SELECT score FROM db.c").collect()[0].score == -1


def test_sql_show_and_describe(spark, cat):
    q(spark, cat, "CREATE TABLE db.d KEY (repo, path) PARTITIONS 2")
    spark.createDataFrame([("r1", "a", 1)],
                          "repo string, path string, v int") \
         .createOrReplaceTempView("seed1")
    q(spark, cat, "INSERT INTO db.d SELECT * FROM seed1")
    assert [(r.database, r.table) for r in
            q(spark, cat, "SHOW TABLES").collect()] == [("db", "d")]
    cols = {r.col_name: r.data_type for r in
            q(spark, cat, "DESCRIBE db.d").collect()}
    assert cols["repo"] == "string" and cols["v"] == "int"
    assert "_lsn" in cols
    hist = q(spark, cat, "DESCRIBE HISTORY db.d").collect()
    assert len(hist) == 1 and hist[0].operation == "merge"
    det = q(spark, cat, "DESCRIBE DETAIL db.d").collect()[0]
    assert det.snapshot_id == 1 and det.n_files > 0


def test_sql_views_resolve_recursively(spark, cat):
    q(spark, cat, "CREATE TABLE db.base KEY (repo, path) PARTITIONS 2")
    spark.createDataFrame(
        [("r1", "a", 5), ("r2", "b", -2), ("r3", "c", 9)],
        "repo string, path string, v int").createOrReplaceTempView("seedv")
    q(spark, cat, "INSERT INTO db.base SELECT * FROM seedv")
    q(spark, cat, "CREATE VIEW db.pos AS SELECT repo, v FROM db.base "
                  "WHERE v > 0")
    q(spark, cat, "CREATE VIEW db.big AS SELECT repo FROM db.pos "
                  "WHERE v > 6")
    assert [r.repo for r in
            q(spark, cat, "SELECT repo FROM db.big").collect()] == ["r3"]
    # views are live: new data flows through on the next query
    spark.createDataFrame([("r4", "d", 7)],
                          "repo string, path string, v int") \
         .createOrReplaceTempView("seedv2")
    q(spark, cat, "INSERT INTO db.base SELECT * FROM seedv2")
    assert sorted(r.repo for r in
                  q(spark, cat, "SELECT repo FROM db.big").collect()) == \
        ["r3", "r4"]
    # OR REPLACE; time travel on a view refuses; DROP VIEW works
    q(spark, cat, "CREATE OR REPLACE VIEW db.big AS "
                  "SELECT repo FROM db.pos WHERE v > 100")
    assert q(spark, cat, "SELECT repo FROM db.big").count() == 0
    with pytest.raises(ValueError, match="VIEW"):
        q(spark, cat, "SELECT repo FROM db.big VERSION AS OF 1")
    q(spark, cat, "DROP VIEW db.big")
    with pytest.raises(Exception):
        q(spark, cat, "SELECT repo FROM db.big").collect()


def test_sql_edge_cases(spark, cat):
    from cdc import quality  # noqa: F401

    q(spark, cat, "CREATE TABLE db.e KEY (repo, path) PARTITIONS 2")
    spark.createDataFrame([("r1", "a", "x", 1)],
                          "repo string, path string, s string, v int") \
         .createOrReplaceTempView("seede")
    q(spark, cat, "INSERT INTO db.e SELECT * FROM seede")
    # quoted comma inside a SET expression must not split the SET list
    q(spark, cat, "UPDATE db.e SET s = concat(s, ',tail'), v = v + 1 "
                  "WHERE repo = 'r1'", mode="cow")
    row = q(spark, cat, "SELECT s, v FROM db.e").collect()[0]
    assert (row.s, row.v) == ("x,tail", 2)
    # CREATE OR REPLACE VIEW cannot clobber a TABLE entry
    with pytest.raises(ValueError, match="TABLE"):
        q(spark, cat, "CREATE OR REPLACE VIEW db.e AS SELECT 1 AS x")


def test_sql_transaction_atomic_across_tables(spark, cat):
    from cdc import quality
    from cdc.sql import transaction
    from cdc.table import wap

    q(spark, cat, "CREATE TABLE db.ta KEY (repo, path) PARTITIONS 2")
    q(spark, cat, "CREATE TABLE db.tb KEY (repo, path) PARTITIONS 2")
    spark.createDataFrame([("r1", "a", 1)],
                          "repo string, path string, v int") \
         .createOrReplaceTempView("tx_seed")
    q(spark, cat, "INSERT INTO db.ta SELECT * FROM tx_seed")
    q(spark, cat, "INSERT INTO db.tb SELECT * FROM tx_seed")

    # commit path: same-table chaining (INSERT then UPDATE the new key)
    # plus a second table — published together
    spark.createDataFrame([("r2", "b", 10)],
                          "repo string, path string, v int") \
         .createOrReplaceTempView("tx_new")
    transaction(spark, cat, [
        "INSERT INTO db.ta SELECT * FROM tx_new",
        "UPDATE db.ta SET v = v + 5 WHERE repo = 'r2'",
        "DELETE FROM db.tb WHERE repo = 'r1'",
    ])
    a = {(r.repo, r.v) for r in q(spark, cat,
                                  "SELECT repo, v FROM db.ta").collect()}
    assert a == {("r1", 1), ("r2", 15)}
    assert q(spark, cat, "SELECT repo FROM db.tb").count() == 0

    # abort path: a CHECK violation in the LAST statement rolls back
    # EVERY table's staged work — nothing published, refs abandoned
    q(spark, cat, "ALTER TABLE db.ta ADD CONSTRAINT pos CHECK (v >= 0)")
    before_a = a
    with pytest.raises(quality.ExpectationError):
        transaction(spark, cat, [
            "INSERT INTO db.tb SELECT * FROM tx_new",   # would succeed
            "UPDATE db.ta SET v = -9 WHERE repo = 'r1'",  # violates
        ])
    assert {(r.repo, r.v) for r in
            q(spark, cat, "SELECT repo, v FROM db.ta").collect()} == before_a
    assert q(spark, cat, "SELECT repo FROM db.tb").count() == 0
    # no dangling refs
    for name in ("db.ta", "db.tb"):
        t = cat.get(name)
        assert [r for r in t.refs_df(spark).collect()
                if r.kind == "branch"] == []

    # only mutating statements allowed inside
    with pytest.raises(ValueError, match="transaction"):
        transaction(spark, cat, ["SELECT repo FROM db.ta"])


def test_sql_explain(spark, cat):
    q(spark, cat, "CREATE TABLE db.x KEY (repo, path) PARTITIONS 2")
    spark.createDataFrame([("r1", "a", 1)],
                          "repo string, path string, v int") \
         .createOrReplaceTempView("seedx")
    q(spark, cat, "INSERT INTO db.x SELECT * FROM seedx")
    plan = "\n".join(r[0] for r in
                     q(spark, cat, "EXPLAIN SELECT repo FROM db.x "
                                   "WHERE v > 0").collect())
    assert "Physical Plan" in plan and "Scan" in plan


def test_catalog_get_on_view_is_a_clear_error(spark, cat):
    q(spark, cat, "CREATE VIEW db.v AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="VIEW"):
        cat.get("db.v")
    with pytest.raises(ValueError, match="VIEW"):
        q(spark, cat, "DESCRIBE db.v")
