"""A1/A3/A5/A6/A7/W3 — per-partition lineage & metrics tables
(SURVEY.md §1.2 lineage_metrics; BASELINE.json "per-partition lineage +
metrics").

All metrics are single hash aggregates with map-side partial aggregation —
at 10^10-event scale each costs one (already-needed) shuffle of ~P rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LATE_SECONDS = 600  # watermark analog: events >10 min behind the partition max


def batch_lineage_metrics(events_raw: DataFrame, part_col: str = "part") -> DataFrame:
    """Per-partition counters for one batch: op mix, dedup drops, late rows,
    lsn bounds, distinct-path cardinality (HLL).

    Single-pass over the raw (pre-dedup) stream, and the scan never touches
    the wide ``content`` column — duplicate-delivery accounting is a
    count(distinct (batch_id, lsn)) rather than a materialized dedup, so
    the metrics job shuffles narrow key/count columns only. (The merge path
    itself doesn't need a dedup pass at all: verbatim re-deliveries collapse
    inside the LWW max_by/row_number — cdc.pipeline.apply_batch.)

    "Late" is measured against the *partition* max ts (a per-partition
    window, parallel by construction) rather than a global max, which would
    need a single-task global window."""
    narrow = events_raw.select(part_col, "batch_id", "lsn", "ts", "op", "path")
    raw = narrow.groupBy(part_col).agg(F.count(F.lit(1)).alias("n_raw"))
    ded = narrow.dropDuplicates(["batch_id", "lsn"])
    max_ts = F.max("ts").over(Window.partitionBy(part_col))
    agg = (
        ded.withColumn("_batch_max_ts", max_ts)
        .groupBy(part_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("n_ins"),
            F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).alias("n_upd"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_del"),
            F.sum(F.when(F.col("ts") < F.col("_batch_max_ts") - F.expr(f"INTERVAL {LATE_SECONDS} SECONDS"), 1).otherwise(0)).alias("n_late"),
            F.min("lsn").alias("lsn_low"),
            F.max("lsn").alias("lsn_high"),
            F.approx_count_distinct("path").alias("approx_paths"),
        )
    )
    return (raw.join(agg, part_col, "full_outer")
            .withColumn("n_dedup_dropped",
                        F.coalesce(F.col("n_raw"), F.lit(0))
                        - F.coalesce(F.col("n_events"), F.lit(0))))


def write_batch_metrics(metrics: DataFrame, table_root: str, batch_key: str,
                        wall_ms: int | None = None) -> None:
    """Append one batch's lineage metrics; path keyed by batch_key so a
    retried batch overwrites instead of duplicating (idempotent)."""
    out = metrics.withColumn("batch_key", F.lit(str(batch_key)))
    if wall_ms is not None:
        out = out.withColumn("wall_ms", F.lit(int(wall_ms)))
    out.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(table_root, "metrics", f"batch_key={batch_key}"))


def read_metrics(spark, table_root: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(table_root, "metrics")).parquet(
        os.path.join(table_root, "metrics", "batch_key=*"))
