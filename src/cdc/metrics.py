"""A1/A3/A5/A6/A7/W3 — per-partition lineage & metrics tables
(SURVEY.md §1.2 lineage_metrics; BASELINE.json "per-partition lineage +
metrics").

All metrics are single hash aggregates with map-side partial aggregation —
at 10^10-event scale each costs one (already-needed) shuffle of ~P rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LATE_SECONDS = 600  # watermark analog: events >10 min behind the partition max


def batch_lineage_metrics(events_raw: DataFrame, part_col: str = "part",
                          exact_dedup: bool = True) -> DataFrame:
    """Per-partition counters for one batch: op mix, dedup drops, late rows,
    lsn bounds, distinct-path cardinality (HLL).

    One full (narrow-column) pass over the raw stream — the scan never
    touches the wide ``content`` column. (The merge path itself doesn't
    need a dedup pass at all: verbatim re-deliveries collapse inside the
    LWW max_by/row_number — cdc.pipeline.apply_batch.)

    ``exact_dedup=True`` — duplicate-delivery accounting folds into a
    (part,batch,lsn)-granularity aggregate: exact, but it shuffles the
    whole (narrow) batch once. ``exact_dedup=False`` — the replay default
    (cdc.pipeline): ``n_events`` comes from an approx_count_distinct HLL
    sketch whose partials combine map-side, so the ONLY shuffle is P
    partial-agg rows. Op mix / late then count raw deliveries (verbatim
    duplicates included, ~the duplicate rate, which n_dedup_dropped itself
    reports); lsn bounds and n_raw are duplicate-insensitive either way.
    At 10^10 events a full shuffle of the log for an informational counter
    is the wrong trade — that is what the flag is for.

    "Late" is measured against the *partition* max ts, gathered first from
    a 2-column scan and broadcast back (P rows) — never a single-task
    global window or a whole-batch re-shuffle."""
    narrow = events_raw.select(part_col, "batch_id", "lsn", "ts", "op", "path")
    # phase 1 — per-partition max ts from a TWO-column scan (repo-derived
    # part + ts only; column pruning keeps everything else unread). The
    # result is P rows, broadcast into the main pass: never a
    # max-over-window re-shuffle of the whole batch.
    maxes = (narrow.select(part_col, "ts").groupBy(part_col)
             .agg(F.max("ts").alias("_batch_max_ts")))
    # phase 2 — ONE full scan + ONE shuffle: aggregate straight to
    # (part, batch_id, lsn) granularity, so map-side partial agg collapses
    # verbatim duplicate deliveries locally and carries their count — raw
    # AND deduped counters come out of the same shuffled frame. (A dup
    # group's other columns are identical by definition; max() picks the
    # value. The late flag is constant within a group: dup copies carry the
    # same ts.) Plan shape pinned by test_plans.py::test_metrics_single_pass.
    late_flag = (F.col("ts") < F.col("_batch_max_ts")
                 - F.expr(f"INTERVAL {LATE_SECONDS} SECONDS"))
    if not exact_dedup:
        out = (narrow.join(F.broadcast(maxes), part_col)
               .groupBy(part_col).agg(
                   F.count(F.lit(1)).alias("n_raw"),
                   F.approx_count_distinct(F.struct("batch_id", "lsn"))
                    .alias("n_events"),
                   F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("n_ins"),
                   F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).alias("n_upd"),
                   F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_del"),
                   F.sum(late_flag.cast("int")).alias("n_late"),
                   F.min("lsn").alias("lsn_low"),
                   F.max("lsn").alias("lsn_high"),
                   F.approx_count_distinct("path").alias("approx_paths")))
        return out.withColumn(
            "n_dedup_dropped",
            F.greatest(F.col("n_raw") - F.col("n_events"), F.lit(0)))
    ded = (narrow.join(F.broadcast(maxes), part_col)
           .groupBy(part_col, "batch_id", "lsn")
           .agg(F.count(F.lit(1)).alias("_copies"),
                F.max("op").alias("op"),
                F.max(late_flag.cast("int")).alias("_late"),
                F.max("path").alias("path")))
    return (ded.groupBy(part_col).agg(
        F.sum("_copies").alias("n_raw"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("n_ins"),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).alias("n_upd"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_del"),
        F.sum("_late").alias("n_late"),
        F.min("lsn").alias("lsn_low"),
        F.max("lsn").alias("lsn_high"),
        F.approx_count_distinct("path").alias("approx_paths"),
    ).withColumn("n_dedup_dropped", F.col("n_raw") - F.col("n_events")))


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
