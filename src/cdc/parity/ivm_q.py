"""Parity query for incremental view maintenance (cdc.ivm).

The Spark side maintains a per-event-type materialized aggregate through
three successive transactional commits — initial load + two delta-rule
refreshes driven by the pre/post-image change feed — and returns the final
MV rows. The DuckDB oracle recomputes the same aggregate from scratch over
the final LWW state: refresh-by-delta must equal recompute exactly
(decimal arithmetic, so no float-order tolerance is needed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc.parity.common import load
from cdc.parity.udf_q import _scratch

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


@q("ivm_incremental_agg", """
WITH ev AS (
  SELECT user_id, event_type,
         event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS content
  FROM events
),
state AS (
  SELECT user_id, event_type, content FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1 AND op <> 'D'
)
SELECT event_type AS path,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(content AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_val
FROM state GROUP BY event_type
""")
def ivm_incremental_agg(spark, sf_dir):
    """Delta-rule IVM vs full recompute (cdc/ivm.py): the events log lands
    as three commits into a key_hash base table; after each commit
    ``ivm.refresh`` folds the pruned change feed's signed deltas into the
    MV table (its ledger key doubling as the refresh checkpoint). The MV's
    final live rows must equal the oracle's from-scratch GROUP BY over the
    final LWW state — including groups deleted on the way ('error' keys
    always end tombstoned, so that group must be absent)."""
    from cdc.ivm import refresh
    from cdc.pipeline import apply_batch
    from cdc.table.table import CdcTable

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.col("event_type").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("content"),
        (F.col("event_id") / 1000).cast("long").alias("batch_id"))

    work = _scratch("cdc_ivm_q")
    base = CdcTable(f"{work}/base", n_partitions=8, layout="key_hash")
    mv = CdcTable(f"{work}/mv", key_cols=("path",), n_partitions=4,
                  layout="key_hash")
    measures = {"sum_val": F.col("content").cast("decimal(18,2)")}
    # cutoffs assume sf0.01 (10k events); at sf0.001 the later slices are
    # empty and their commits/refreshes no-op — parity still holds.
    for i, cond in enumerate((F.col("lsn") < 3300,
                              (F.col("lsn") >= 3300) & (F.col("lsn") < 6600),
                              F.col("lsn") >= 6600)):
        apply_batch(spark, base, ev.filter(cond), f"b{i}",
                    normalize=False, metrics=False)
        refresh(spark, base, mv, measures)

    out = mv.read(spark)
    return out.select("path", "cnt",
                      F.col("sum_val").cast("decimal(38,2)").alias("sum_val"))


@q("scd2_version_history", """
WITH ev AS (
  SELECT user_id, event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         concat(event_type, ':', CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)) AS content
  FROM events),
snapped AS (
  SELECT s.snap, e.* FROM (VALUES (1, 3300), (2, 6600),
                                  (3, 9223372036854775807)) s(snap, cutoff)
  JOIN ev e ON e.lsn < s.cutoff),
state AS (
  SELECT snap, user_id, content FROM (
    SELECT *, row_number() OVER (PARTITION BY snap, user_id
                                 ORDER BY lsn DESC) AS rn
    FROM snapped) WHERE rn = 1 AND op <> 'D'),
grid AS (
  SELECT s.snap, k.user_id, st.content
  FROM (VALUES (1), (2), (3)) s(snap)
  CROSS JOIN (SELECT DISTINCT user_id FROM ev) k
  LEFT JOIN state st ON st.snap = s.snap AND st.user_id = k.user_id),
marked AS (
  SELECT *, content IS DISTINCT FROM
            lag(content) OVER (PARTITION BY user_id ORDER BY snap) AS chg
  FROM grid),
points AS (SELECT * FROM marked WHERE chg),
versions AS (
  SELECT user_id, snap AS valid_from_snap, content,
         lead(snap) OVER (PARTITION BY user_id ORDER BY snap) AS valid_to_snap
  FROM points)
SELECT user_id, CAST(valid_from_snap AS BIGINT) AS valid_from_snap, content,
       CAST(valid_to_snap AS BIGINT) AS valid_to_snap
FROM versions WHERE content IS NOT NULL
""")
def scd2_version_history(spark, sf_dir):
    """SCD Type-2 history maintenance (cdc/scd2.py): the events log lands
    as three commits; after each, ``refresh_history`` opens new versions
    from post-images and retires the touched open versions (validity
    bounds are base snapshot ids). The oracle rebuilds the same version
    table from scratch: state at each commit cutoff, change points via
    null-safe lag over the snapshot grid, retirement via lead — so the
    incremental open/close bookkeeping must equal a full recompute,
    including delete-then-reinsert version splits."""
    from cdc.pipeline import apply_batch
    from cdc.scd2 import history_table, refresh_history
    from cdc.table.table import CdcTable

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.lit("state").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.concat(F.col("event_type"), F.lit(":"),
                 F.col("value").cast("decimal(18,2)").cast("string")).alias("content"),
        (F.col("event_id") / 1000).cast("long").alias("batch_id"))
    work = _scratch("cdc_scd2_q")
    base = CdcTable(f"{work}/base", n_partitions=8, layout="key_hash")
    hist = history_table(f"{work}/hist", base)
    for i, cond in enumerate((F.col("lsn") < 3300,
                              (F.col("lsn") >= 3300) & (F.col("lsn") < 6600),
                              F.col("lsn") >= 6600)):
        apply_batch(spark, base, ev.filter(cond), f"b{i}",
                    normalize=False, metrics=False)
        refresh_history(spark, base, hist)
    h = hist.read(spark)
    return h.select(F.col("repo").cast("long").alias("user_id"),
                    "valid_from_snap", "content", "valid_to_snap")
