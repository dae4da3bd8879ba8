"""Batch replay driver — SURVEY.md §3.2 entry point 1 (the flagship path).

replay(log) = resume-from-checkpoint tail -> exact dedup -> pandas-UDF
content normalization -> per-key LWW collapse -> transactional MERGE commit
-> lineage metrics. Each commit is one Spark job; everything before it is a
single lazy plan that Catalyst optimizes end-to-end (lsn filter pushed to
parquet footers, dedup+LWW partials map-side, merge join AQE-planned).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc.dedup import last_writer_wins
from cdc.io.log import read_log
from cdc.metrics import batch_lineage_metrics, write_batch_metrics
from cdc.schema.normalize import normalize_content
from cdc.schema.registry import SchemaRegistry, default_registry
from cdc.table.table import CdcTable, part_expr


@dataclass
class ReplayResult:
    n_commits: int = 0
    n_skipped: int = 0
    lsn_high: int = -1
    wall_ms: int = 0
    batch_keys: list[str] = field(default_factory=list)


def apply_batch(
    spark: SparkSession,
    table: CdcTable,
    events: DataFrame,
    batch_key: str,
    normalize: bool = True,
    lww_via: str = "maxby",
    metrics: bool = True,
    mode: str = "cow",
) -> dict:
    """Apply one event batch exactly-once: no-op if batch_key is already in
    the table's commit ledger (T7).

    ``mode='cow'`` — copy-on-write MERGE (rewrite touched partitions).
    ``mode='mor'`` — merge-on-read delta append (write only the batch's
    winner rows; readers reconcile, compaction folds)."""
    if table.is_committed(batch_key):
        return table.current_snapshot()
    # resume-path guard only: a fully-applied tail must not commit an empty
    # snapshot. Fresh tables skip the probe job entirely.
    if table.lsn_high() >= 0 and events.isEmpty():
        return table.current_snapshot()
    t0 = time.monotonic()
    # No standalone dedup pass: verbatim at-least-once re-deliveries are
    # identical rows, so they collapse inside the LWW max_by / row_number
    # itself — one wide-content shuffle instead of two. (dedupe_exact (A2)
    # remains the standalone operator for metrics and streaming state.)
    final = last_writer_wins(events, via=lww_via)
    if normalize:
        # normalization is per-row deterministic, so it commutes with the
        # LWW collapse: applying it to the ~1-row-per-key winners instead of
        # the full event stream cuts the Arrow/pandas traffic by the
        # events-per-key factor (~10x at bench scale).
        final = final.withColumn("content", normalize_content(F.col("content")))
    # the collapsed batch is consumed twice inside commit (planning agg +
    # merge/write) — cache it so the log scan -> dedup -> LWW chain runs once.
    final = final.persist()
    try:
        if mode == "mor":
            snap = table.commit_delta(spark, final, batch_key)
        else:
            snap = table.commit_merge(spark, final, batch_key)
        if metrics:
            pcol = part_expr(table.key_cols[0], table.n_partitions)
            m = batch_lineage_metrics(events.withColumn("part", pcol))
            write_batch_metrics(m, table.root, batch_key, wall_ms=int((time.monotonic() - t0) * 1000))
    finally:
        final.unpersist()
    return snap


def replay(
    spark: SparkSession,
    log_dir: str,
    table: CdcTable,
    registry: SchemaRegistry | None = None,
    batches_per_commit: int | None = None,
    normalize: bool = True,
    lww_via: str = "maxby",
    metrics: bool = True,
    mode: str = "cow",
) -> ReplayResult:
    """Resume-safe batch replay of the whole log tail.

    ``batches_per_commit=None`` -> one transactional commit for the full
    tail (fastest; still atomic). An integer k groups producer batch_ids
    into commits of k, giving checkpoint granularity: a killed replay
    resumes after the last committed group (lsn > table.lsn_high pushes the
    skip down to parquet footers — resumed work is O(remaining), not O(log)).
    """
    registry = registry or default_registry()
    res = ReplayResult()
    t0 = time.monotonic()
    after = table.lsn_high()
    log = read_log(spark, log_dir, registry, after_lsn=after)

    if batches_per_commit is None:
        key = f"replay-from-{after + 1}"
        before = table.current_snapshot()
        snap = apply_batch(spark, table, log, key, normalize, lww_via, metrics, mode)
        unchanged = snap is None or (
            before is not None and snap["snapshot_id"] == before["snapshot_id"])
        if unchanged:
            res.n_skipped += 1
        else:
            res.n_commits += 1
            res.batch_keys.append(key)
    else:
        bids = [r[0] for r in log.select("batch_id").distinct().orderBy("batch_id").collect()]
        for i in range(0, len(bids), batches_per_commit):
            group = bids[i : i + batches_per_commit]
            lo, hi = group[0], group[-1]
            key = f"b{lo:08d}-{hi:08d}"
            if table.is_committed(key):
                res.n_skipped += 1
                continue
            sub = log.filter((F.col("batch_id") >= lo) & (F.col("batch_id") <= hi))
            apply_batch(spark, table, sub, key, normalize, lww_via, metrics, mode)
            res.n_commits += 1
            res.batch_keys.append(key)

    res.lsn_high = table.lsn_high()
    res.wall_ms = int((time.monotonic() - t0) * 1000)
    return res
