"""Parity queries for the quality-expectation auditor (cdc.quality) and
the write-audit-publish commit flow (cdc.table.wap).

``quality_audit_counts`` pins the one-pass violation-count aggregate
itself; ``wap_quality_gate`` drives the full table lifecycle — stage a
deterministically-corrupted batch under a ref, have the audit gate reject
and abandon it, then stage/audit/publish the cleaned batch — and the
DuckDB oracle recomputes the final LWW state with the rejected rows
excluded, so the gate's "bad batches leave no trace" guarantee is
hash-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc.parity.common import load
from cdc.parity.udf_q import _scratch

QUERIES: dict = {}
ORACLES: dict = {}

KNOWN_TYPES = ("click", "purchase", "signup", "view")  # 'error' is NOT ok


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


@q("quality_audit_counts", """
SELECT CAST(SUM(CASE WHEN NOT COALESCE(value BETWEEN 0 AND 100, FALSE)
                     THEN 1 ELSE 0 END) AS BIGINT) AS value_in_0_100,
       CAST(SUM(CASE WHEN NOT COALESCE(
                  event_type IN ('click','purchase','signup','view'), FALSE)
                     THEN 1 ELSE 0 END) AS BIGINT) AS type_known,
       CAST(SUM(CASE WHEN NOT COALESCE(
                  user_id IS NOT NULL AND ts IS NOT NULL, FALSE)
                     THEN 1 ELSE 0 END) AS BIGINT) AS ids_present,
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS dup_event_id
FROM events
""")
def quality_audit_counts(spark, sf_dir):
    """cdc.quality.check: every declared expectation (range, enum,
    not-null, key uniqueness) counted in ONE whole-stage-codegen aggregate
    pass over the frame — the oracle recomputes each violation count with
    the same NULL-counts-as-violation semantics."""
    from cdc import quality

    ev = load(spark, sf_dir, "events")
    counts = quality.check(ev, {
        "value_in_0_100": quality.in_range("value", 0, 100),
        "type_known": quality.one_of("event_type", KNOWN_TYPES),
        "ids_present": quality.not_null("user_id", "ts"),
    }, unique=("event_id",))
    row = (counts["value_in_0_100"], counts["type_known"],
           counts["ids_present"], counts["unique(event_id)"])
    return spark.createDataFrame(
        [row], "value_in_0_100 long, type_known long, ids_present long, "
               "dup_event_id long")


@q("wap_quality_gate", """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_type AS path,
         event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS content
  FROM events
  -- the second batch (lsn >= 6000) is staged twice: the corrupted form
  -- (U-row content nulled where value > 400) is rejected by the audit
  -- gate and abandoned, so only its cleaned form (those rows dropped)
  -- ever lands; delete rows are never corrupted, so both forms agree on
  -- tombstones and parity holds whether or not the gate fires
  WHERE event_id < 6000 OR value <= 400 OR event_type = 'error'
),
state AS (
  SELECT repo, path, content FROM (
    SELECT *, row_number() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1 AND op <> 'D'
)
SELECT repo, path, content FROM state
""")
def wap_quality_gate(spark, sf_dir):
    """Write-audit-publish lifecycle (cdc/table/wap.py + cdc/quality.py):
    batch b0 (lsn < 6000) commits on the main line; batch b1 is staged
    under a ref with a deterministic corruption (upsert content nulled
    where value > 400), the audit gate rejects + abandons it, and the
    cleaned batch (corrupted rows removed) stages and publishes through
    the same gate. Final table state must equal the oracle's LWW over the
    log with the rejected rows excluded — a corrupt stage leaves no
    trace. The corruption is scoped to op='U' rows so the corrupted and
    cleaned forms agree on tombstones: whichever way the gate goes (it
    can only pass when no corrupted row wins its key), the published
    winners equal the oracle's.

    The lsn cutoff assumes sf0.01 (10k events); at sf0.001 batch b1 is
    empty, both stages audit clean, and parity still holds."""
    from cdc import quality
    from cdc.dedup import last_writer_wins
    from cdc.pipeline import apply_batch
    from cdc.table import wap
    from cdc.table.table import CdcTable

    rendered = F.col("value").cast("decimal(18,2)").cast("string")
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        rendered.alias("content"),
        F.lit(0).alias("batch_id"),
        F.col("value"))

    work = _scratch("cdc_wap_q")
    t = CdcTable(f"{work}/t", n_partitions=8, layout="key_hash")
    apply_batch(spark, t, ev.filter(F.col("lsn") < 6000).drop("value"),
                "b0", normalize=False, metrics=False)

    checks = {"content_not_null": quality.not_null("content")}
    tail = ev.filter(F.col("lsn") >= 6000)
    bad = (F.col("value") > 400) & (F.col("op") == "U")
    corrupted = tail.withColumn(
        "content", F.when(bad, F.lit(None).cast("string"))
                    .otherwise(F.col("content"))).drop("value")
    wap.stage(spark, t, last_writer_wins(corrupted), "b1")
    try:
        wap.audit_and_publish(spark, t, predicates=checks)
        # no corrupted row won its key (e.g. tiny sf: empty tail) — the
        # publish is then winner-identical to the cleaned batch's
    except quality.ExpectationError:
        pass  # rejected + abandoned: the corrupt stage must leave no trace
    cleaned = last_writer_wins(tail.filter(~bad).drop("value"))
    wap.stage(spark, t, cleaned, "b1-clean")
    wap.audit_and_publish(spark, t, predicates=checks)

    return t.read(spark).select("repo", "path", "content")


@q("dml_update_delete", """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_type AS path,
         event_id AS lsn,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS content,
         value AS val
  FROM events
),
state AS (
  SELECT repo, path, content, val FROM (
    SELECT *, row_number() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1
),
upd AS (
  SELECT repo, path,
         CASE WHEN val > 300 THEN content || '+hot' ELSE content END
           AS content,
         CASE WHEN val > 300 THEN val * 2 ELSE val END AS val
  FROM state
)
SELECT repo, path, content, val FROM upd WHERE path <> 'error'
""")
def dml_update_delete(spark, sf_dir):
    """Predicate DML over the table (cdc/table/mutate.py): ingest the log,
    then ``UPDATE ... SET content = content || '+hot', val = val * 2
    WHERE val > 300`` and ``DELETE WHERE path = 'error'`` — both as MOR
    commits (only matched rows written; readers reconcile). The oracle
    recomputes LWW state and applies the same UPDATE-over-old-row /
    DELETE algebra, so statement-LSN stamping, tombstone semantics and
    the MOR read reconcile are all hash-checked."""
    from cdc.pipeline import apply_batch
    from cdc.table.mutate import delete_where, update_where
    from cdc.table.table import CdcTable

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.lit("U").alias("op"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("content"),
        F.col("value").alias("val"),
        F.lit(0).alias("batch_id"))

    work = _scratch("cdc_dml_q")
    t = CdcTable(f"{work}/t", n_partitions=8, layout="key_hash")
    apply_batch(spark, t, ev, "b0", normalize=False, metrics=False)
    update_where(spark, t, "val > 300",
                 {"content": "concat(content, '+hot')", "val": "val * 2"},
                 "u1", mode="mor")
    delete_where(spark, t, "path = 'error'", "d1", mode="mor")
    return t.read(spark).select("repo", "path", "content", "val")


@q("src_cdctable_read", """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_type AS path,
         event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS content
  FROM events
),
state AS (
  SELECT repo, path, content FROM (
    SELECT *, row_number() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1 AND op <> 'D'
)
SELECT repo, path, content FROM state
""")
def src_cdctable_read(spark, sf_dir):
    """The ``cdctable`` Spark 4 Python DataSource (cdc/spark_source.py):
    ingest the log, then read the table back through
    ``spark.read.format('cdctable')`` — manifest-driven file partitions,
    executor-side pyarrow Arrow-batch reads, tombstones filtered — and
    hash-compare against the oracle's LWW state. Exercises the
    session-less DDL→arrow schema path and the per-file read alignment."""
    from cdc.pipeline import apply_batch
    from cdc.spark_source import CdcTableDataSource
    from cdc.table.table import CdcTable

    spark.dataSource.register(CdcTableDataSource)
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("content"),
        F.lit(0).alias("batch_id"))

    work = _scratch("cdc_src_q")
    t = CdcTable(f"{work}/t", n_partitions=8, layout="key_hash")
    apply_batch(spark, t, ev, "b0", normalize=False, metrics=False)
    return (spark.read.format("cdctable").option("root", t.root).load()
            .select("repo", "path", "content"))


@q("src_cdctable_read_mor", """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_type AS path,
         event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS content
  FROM events
),
state AS (
  SELECT repo, path, content FROM (
    SELECT *, row_number() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1 AND op <> 'D'
)
SELECT repo, path, content FROM state
""")
def src_cdctable_read_mor(spark, sf_dir):
    """The ``cdctable`` DataSource over an UNCOMPACTED merge-on-read
    snapshot: a CoW base commit plus a MOR delta commit (updates, deletes,
    new keys), read back through ``spark.read.format('cdctable')`` with
    NO compaction in between. Under the key_hash layout every key's rows
    share one table partition, so the source reconciles base+delta
    FILE-LOCALLY per part (max (_lsn, _layer) per key — commit order
    breaks lsn ties), which the oracle checks by recomputing the global
    LWW fold over both halves of the log."""
    from cdc.pipeline import apply_batch
    from cdc.spark_source import CdcTableDataSource
    from cdc.table.table import CdcTable

    spark.dataSource.register(CdcTableDataSource)
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("content"),
        F.lit(0).alias("batch_id"))

    work = _scratch("cdc_src_mor_q")
    t = CdcTable(f"{work}/t", n_partitions=8, layout="key_hash")
    apply_batch(spark, t, ev.filter(F.col("lsn") % 2 == 0), "b0",
                normalize=False, metrics=False)
    apply_batch(spark, t, ev.filter(F.col("lsn") % 2 == 1), "b1",
                normalize=False, metrics=False, mode="mor")
    return (spark.read.format("cdctable").option("root", t.root).load()
            .select("repo", "path", "content"))


@q("txn_multi_table_publish", """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_type AS path,
         event_id AS lsn,
         CAST(user_id % 2 AS VARCHAR) AS tbl,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS content
  FROM events
),
state AS (
  SELECT tbl, repo, path, content FROM (
    SELECT *, row_number() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1
)
SELECT tbl, repo, path, content FROM state
""")
def txn_multi_table_publish(spark, sf_dir):
    """Cross-table transaction (wap.publish_all / store.publish_refs_atomic):
    the log routes to TWO tables (user_id parity), the head batch commits
    on each main line, both tails stage under refs, and ONE atomic
    multi-table publish makes them visible together (all CASes validated
    under all commit locks before any pointer moves). The oracle is the
    full-log LWW state per routed table, so a lost or torn publish on
    either table breaks the hash."""
    from cdc.dedup import last_writer_wins
    from cdc.pipeline import apply_batch
    from cdc.table import wap
    from cdc.table.table import CdcTable

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.lit("U").alias("op"),
        (F.col("user_id") % 2).cast("string").alias("tbl"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("content"),
        F.lit(0).alias("batch_id"))

    work = _scratch("cdc_txn_q")
    tables = {}
    for k in ("0", "1"):
        t = CdcTable(f"{work}/t{k}", n_partitions=4, layout="key_hash")
        part = ev.filter(F.col("tbl") == k).drop("tbl")
        apply_batch(spark, t, part.filter(F.col("lsn") < 6000), f"head-{k}",
                    normalize=False, metrics=False)
        wap.stage(spark, t,
                  last_writer_wins(part.filter(F.col("lsn") >= 6000)),
                  f"tail-{k}")
        tables[k] = t
    wap.publish_all([(tables["0"], "audit"), (tables["1"], "audit")])
    out = None
    for k, t in tables.items():
        d = (t.read(spark).withColumn("tbl", F.lit(k))
             .select("tbl", "repo", "path", "content"))
        out = d if out is None else out.unionByName(d)
    return out


@q("stats_prune_read", """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_type AS path,
         event_id AS lsn, value AS val
  FROM events
),
state AS (
  SELECT repo, path, val FROM (
    SELECT *, row_number() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1
)
SELECT repo, path, val FROM state WHERE val >= 150
""")
def stats_prune_read(spark, sf_dir):
    """Manifest column-stats data skipping (``stats_cols`` +
    ``read(prune=...)``): ingest the log into a table recording per-file
    val min/max, then read with ``prune={'val': (150, None)}`` — files
    whose recorded range cant reach 150 are never handed to Spark — and
    apply the exact predicate on top (superset semantics). The oracle is
    the plain filtered LWW state, so a wrongly-skipped file would lose
    rows and break the hash."""
    from cdc.pipeline import apply_batch
    from cdc.table.table import CdcTable

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.lit("U").alias("op"),
        F.col("value").alias("val"),
        F.lit(0).alias("batch_id"))

    work = _scratch("cdc_prune_q")
    t = CdcTable(f"{work}/t", n_partitions=8, layout="key_hash",
                 stats_cols=("val",))
    apply_batch(spark, t, ev, "b0", normalize=False, metrics=False)
    return (t.read(spark, prune={"val": (150, None)})
            .filter(F.col("val") >= 150)
            .select("repo", "path", "val"))


@q("meta_commits", """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_type AS path,
         event_id AS lsn
  FROM events
),
cut AS (
  SELECT 1 AS i, -1 AS lo, 3000 AS hi UNION ALL
  SELECT 2, 3000, 6000 UNION ALL
  SELECT 3, 6000, 2147483647
),
-- an empty tail batch does not commit (pipeline.apply_batch resume
-- guard), so only cutoffs that add events appear in the ledger; their
-- snapshot ids are the dense 1..n commit order
live AS (
  SELECT c.* FROM cut c
  WHERE EXISTS (SELECT 1 FROM ev WHERE lsn > c.lo AND lsn <= c.hi)
)
SELECT CAST(row_number() OVER (ORDER BY hi) AS BIGINT) AS snapshot_id,
       'b' || CAST(i AS VARCHAR) AS batch_key,
       'merge' AS operation,
       (SELECT CAST(max(lsn) AS BIGINT) FROM ev WHERE lsn <= live.hi) AS lsn_high,
       (SELECT CAST(count(DISTINCT repo || '|' || path) AS BIGINT)
        FROM ev WHERE lsn <= live.hi) AS total_rows
FROM live
""")
def meta_commits(spark, sf_dir):
    """Metadata inspection tables (``commits_df`` + ``manifest_df``,
    cdc/table/table.py): ingest three LSN-bounded batches, then answer
    "what did each commit do" FROM TABLE METADATA ALONE — ledger row
    (batch_key, operation, lsn_high) joined to the per-snapshot manifest
    row total. The oracle recomputes each from the raw log: lsn_high =
    max event lsn under the cutoff; total_rows = distinct keys seen
    (CoW state keeps one row per key, tombstones included). Metadata is
    O(files) driver-side JSON — no data file is read by this query."""
    from cdc.pipeline import apply_batch
    from cdc.table.table import CdcTable

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("content"),
        F.lit(0).alias("batch_id"))

    work = _scratch("meta_commits_q")
    t = CdcTable(f"{work}/t", n_partitions=8, layout="key_hash")
    for i, (lo, hi) in enumerate([(-1, 3000), (3000, 6000),
                                  (6000, 1 << 31)], 1):
        apply_batch(spark, t, ev.filter((F.col("lsn") > lo)
                                        & (F.col("lsn") <= hi)),
                    f"b{i}", normalize=False, metrics=False)

    commits = t.commits_df(spark).select(
        "snapshot_id", "batch_key", "operation", "lsn_high")
    manifests = None
    for s in t.snapshots():
        m = t.manifest_df(spark, snapshot_id=s["snapshot_id"])
        manifests = m if manifests is None else manifests.unionByName(m)
    totals = (manifests.groupBy("snapshot_id")
              .agg(F.sum("rows").alias("total_rows")))
    return commits.join(totals, "snapshot_id")


@q("ddl_alter_lifecycle", """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_type AS path,
         event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS content
  FROM events
),
state AS (
  SELECT repo, path, content FROM (
    SELECT *, row_number() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1 AND op <> 'D'
)
SELECT repo, path, content AS body FROM state
""")
def ddl_alter_lifecycle(spark, sf_dir):
    """ALTER TABLE column mapping (cdc/table/alter.py): ingest half the
    log, RENAME content->body (metadata-only — field ids resolve the old
    files to the new name with zero rewrite), ingest the rest under the
    new name, read back. The oracle computes plain LWW over the whole
    log: the rename must be invisible to the data."""
    from cdc.pipeline import apply_batch
    from cdc.table import alter
    from cdc.table.table import CdcTable

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("content"),
        F.lit(0).alias("batch_id"))

    work = _scratch("alter_q")
    t = CdcTable(f"{work}/t", n_partitions=8, layout="key_hash")
    apply_batch(spark, t, ev.filter(F.col("lsn") <= 5000), "b0",
                normalize=False, metrics=False)
    alter.rename_column(t, "content", "body")
    apply_batch(spark, t,
                ev.filter(F.col("lsn") > 5000)
                  .withColumnRenamed("content", "body"),
                "b1", normalize=False, metrics=False)
    return t.read(spark).select("repo", "path", "body")


@q("sql_facade_dml", """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_type AS path,
         event_id AS lsn,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS content,
         value AS val
  FROM events
),
state AS (
  SELECT repo, path, content, val FROM (
    SELECT *, row_number() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1
),
upd AS (
  SELECT repo, path,
         CASE WHEN val > 300 THEN content || '+hot' ELSE content END
           AS content,
         CASE WHEN val > 300 THEN val * 2 ELSE val END AS val
  FROM state
)
SELECT repo, path, content AS body, val FROM upd WHERE path <> 'error'
""")
def sql_facade_dml(spark, sf_dir):
    """The SQL façade (cdc/sql.py + cdc/catalog.py): the dml_update_delete
    lifecycle driven entirely through SQL STRINGS — UPDATE ... SET ...
    WHERE, DELETE FROM ... WHERE, ALTER TABLE RENAME COLUMN, and the final
    SELECT with its FROM reference bound through the catalog. Same oracle
    algebra; routing, statement parsing and name resolution are what this
    query pins."""
    from cdc.catalog import Catalog
    from cdc.pipeline import apply_batch
    from cdc.sql import execute

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.lit("U").alias("op"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("content"),
        F.col("value").alias("val"),
        F.lit(0).alias("batch_id"))

    work = _scratch("cdc_sqlq")
    cat = Catalog(f"{work}/catalog")
    t = cat.create("db.src", n_partitions=8)
    apply_batch(spark, t, ev, "b0", normalize=False, metrics=False)
    execute(spark, cat,
            "UPDATE db.src SET content = concat(content, '+hot'), "
            "val = val * 2 WHERE val > 300", mode="mor")
    execute(spark, cat, "DELETE FROM db.src WHERE path = 'error'",
            mode="mor")
    execute(spark, cat, "ALTER TABLE db.src RENAME COLUMN content TO body")
    return execute(spark, cat,
                   "SELECT repo, path, body, val FROM db.src")


@q("idx_secondary_lookup", """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_type AS path,
         event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS content,
         substr(md5(event_type || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)), 1, 1) AS cat
  FROM events
),
state AS (
  SELECT repo, path, content, cat FROM (
    SELECT *, row_number() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1 AND op <> 'D'
)
SELECT repo, path, content, cat FROM state WHERE cat = 'a'
""")
def idx_secondary_lookup(spark, sf_dir):
    """Secondary index (cdc/index.py): ingest in two batches with an
    incremental index refresh between them — so the netted
    tombstone/upsert delta path runs, not just the initial load — then
    answer a VALUE lookup through the index (one index partition probed,
    keys fed to base.lookup_keys; never a base scan). The oracle
    recomputes LWW state and filters on the same md5-derived category;
    the index must return exactly those rows."""
    from cdc import index
    from cdc.pipeline import apply_batch
    from cdc.table.table import CdcTable

    rendered = F.col("value").cast("decimal(18,2)").cast("string")
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        rendered.alias("content"),
        F.substring(F.md5(F.concat(F.col("event_type"), rendered)), 1, 1)
         .alias("cat"),
        F.lit(0).alias("batch_id"))

    work = _scratch("cdc_idx_q")
    t = CdcTable(f"{work}/t", n_partitions=8, layout="key_hash")
    idx = index.create_index(f"{work}/idx", t, "cat", n_partitions=8)
    apply_batch(spark, t, ev.filter(F.col("lsn") <= 5000), "b0",
                normalize=False, metrics=False)
    index.refresh(spark, t, idx)            # initial load
    apply_batch(spark, t, ev.filter(F.col("lsn") > 5000), "b1",
                normalize=False, metrics=False)
    index.refresh(spark, t, idx)            # incremental net delta
    return (index.lookup_value(spark, t, idx, "a")
            .select("repo", "path", "content", "cat"))


@q("txn_sql_atomic", """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_type AS path,
         event_id AS lsn,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS content,
         value AS val
  FROM events
),
state AS (
  SELECT repo, path, content, val FROM (
    SELECT *, row_number() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1
),
upd AS (
  SELECT repo, path,
         CASE WHEN val > 300 THEN content || '+hot' ELSE content END
           AS content,
         CASE WHEN val > 300 THEN val * 2 ELSE val END AS val
  FROM state
)
SELECT repo, path, content, val FROM upd WHERE path <> 'error'
""")
def txn_sql_atomic(spark, sf_dir):
    """Cross-statement ATOMIC transactions (cdc/sql.py::transaction over
    WAP branches + publish_all): first a txn that must ABORT — its second
    statement violates a CHECK constraint, so the first statement's
    staged work is abandoned too — then the good txn (the
    dml_update_delete algebra as ONE atomic unit). The oracle recomputes
    plain LWW + UPDATE/DELETE algebra: the aborted txn must leave no
    trace, and the committed one must land exactly."""
    from cdc.catalog import Catalog
    from cdc.pipeline import apply_batch
    from cdc.sql import transaction
    from cdc.table import alter
    from cdc.table.table import CdcTable

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.lit("U").alias("op"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("content"),
        F.col("value").alias("val"),
        F.lit(0).alias("batch_id"))

    work = _scratch("cdc_txn_q")
    cat = Catalog(f"{work}/catalog")
    t = cat.create("db.t", n_partitions=8)
    apply_batch(spark, t, ev, "b0", normalize=False, metrics=False)
    alter.set_check(t, "val_not_negative", "val >= 0")

    from cdc import quality

    aborted = False
    try:  # must abort whenever any val > 300 row exists (all tested sf)
        transaction(spark, cat, [
            "DELETE FROM db.t WHERE path = 'error'",
            "UPDATE db.t SET val = -val WHERE val > 300",
        ])
    except quality.ExpectationError:
        aborted = True
    # violation fires iff some LIVE WINNER row (error-path rows are
    # tombstoned by statement 1 of the same txn) has val > 300
    from cdc.dedup import last_writer_wins
    winners = last_writer_wins(ev.filter(F.col("path") != "error"),
                               via="maxby")
    has_hot = not winners.filter(F.col("val") > 300).isEmpty()
    assert aborted == has_hot, "abort must fire iff a winner violates"
    transaction(spark, cat, [
        "UPDATE db.t SET content = concat(content, '+hot'), val = val * 2 "
        "WHERE val > 300",
        "DELETE FROM db.t WHERE path = 'error'",
    ])
    return cat.get("db.t").read(spark).select("repo", "path", "content", "val")
