"""Incremental view maintenance (IVM) — keep a GROUP BY aggregate in sync
with a base CdcTable without recomputing it.

A *materialized aggregate* is itself a CdcTable keyed by the grouping
dimensions (``layout='key_hash'`` so refreshes cluster-align), holding a
live-row count plus caller-defined ADDITIVE measures (sums over column
expressions of base rows). Refresh algebra is the classic delta-rule for
distributive aggregates:

    MV' = MV  ⊕  Σ sign(change) · measure(row)        over the change feed

where ``sign`` is +1 for insert/update_postimage and -1 for
delete/update_preimage (``change_feed(images='both')``). Groups whose live
count reaches zero are deleted (CDC tombstone in the MV table).

Why this scales where recompute doesn't (SURVEY.md §2.B consumer side):
- the change feed is pruned to partitions whose manifests changed
  (``timetravel.changed_parts``) — O(churn), not O(base table);
- the signed delta is one map-side-partial groupBy over feed rows;
- current MV contributions are read with manifest partition pruning +
  a broadcast semi-join on the touched dims — O(touched groups);
- the MV commit is a normal transactional merge rewriting only touched
  MV partitions, and its ledger key ``ivm-<from>-<to>`` doubles as the
  refresh checkpoint: re-running a crashed refresh is a no-op (T7
  exactly-once carried over to the view).
"""

from __future__ import annotations

from collections.abc import Mapping
from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc.table.table import CdcTable
from cdc.table.timetravel import change_feed

IVM_KEY_PREFIX = "ivm-"
_POSITIVE = ("insert", "update_postimage")


def signed_delta(feed: DataFrame, dims: list[str],
                 measures: Mapping[str, Column]) -> DataFrame:
    """One groupBy over an ``images='both'`` change feed: per-group net
    change of live-row count and of every additive measure. NULL measure
    values contribute 0 on whichever side they appear (sum semantics), so
    NULL->value transitions net out correctly."""
    sign = (F.when(F.col("_change_type").isin(*_POSITIVE), F.lit(1))
            .otherwise(F.lit(-1)))
    aggs = [F.sum(sign).cast("long").alias("cnt")]
    for name, expr in measures.items():
        aggs.append(F.sum(expr * sign).alias(name))
    return feed.groupBy(*dims).agg(*aggs)


def full_aggregate(rows: DataFrame, dims: list[str],
                   measures: Mapping[str, Column]) -> DataFrame:
    """Initial-load form: aggregate the base table's live state directly
    (also the recompute twin the parity oracle checks refresh against)."""
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for name, expr in measures.items():
        aggs.append(F.sum(expr).alias(name))
    return rows.groupBy(*dims).agg(*aggs)


def synced_snapshot_id(mv: CdcTable) -> int:
    """Highest base-table snapshot id a committed refresh has covered —
    parsed from the MV's own commit ledger (``ivm-<from>-<to>`` keys), so
    the checkpoint is transactional with the refresh itself. 0 = never
    refreshed (base snapshot ids start at 1)."""
    snap = mv.current_snapshot()
    hi = 0
    for key in (snap["committed_batches"] if snap else []):
        if key.startswith(IVM_KEY_PREFIX):
            lo_s, _, hi_s = key[len(IVM_KEY_PREFIX):].partition("-")
            if lo_s.isdigit() and hi_s.isdigit():
                hi = max(hi, int(hi_s))
    return hi


def maintainer(mv: CdcTable, measures: Mapping[str, Column]):
    """Adapter for ``stream_to_table(downstream=[...])``: refresh ``mv``
    after every ingest epoch (no-op when already current)."""
    def _refresh(spark: SparkSession, base: CdcTable):
        return refresh(spark, base, mv, measures)
    return _refresh


def refresh(spark: SparkSession, base: CdcTable, mv: CdcTable,
            measures: Mapping[str, Column]) -> dict | None:
    """Bring ``mv`` up to date with ``base``'s current snapshot. Returns
    the new MV snapshot, or None when already current / base is empty.

    ``mv.key_cols`` are the grouping dimensions (must exist on base rows);
    measure Columns are expressions over base-row columns. The MV rows'
    ``_lsn`` is the covered base snapshot id — monotone per refresh, so
    the merge's ``lsn >=`` guard makes replayed refreshes idempotent
    row-by-row too."""
    if mv.layout != "key_hash":
        raise ValueError("IVM target table must use layout='key_hash' "
                         "(dims-hash partition pruning drives the refresh)")
    dims = list(mv.key_cols)
    bsnap = base.current_snapshot()
    if bsnap is None:
        return None
    to_id = int(bsnap["snapshot_id"])
    from_id = synced_snapshot_id(mv)
    if from_id >= to_id:
        return None

    if from_id == 0:
        new = full_aggregate(base.read(spark), dims, measures)
        batch = new.withColumn("op", F.lit("U"))
    else:
        feed = change_feed(spark, base, from_id, to_id, images="both")
        delta = signed_delta(feed, dims, measures)
        # net-zero groups (e.g. an update that left every measure intact)
        # would dirty MV partitions for nothing — drop them early
        nonzero = F.col("cnt") != 0
        for name in measures:
            nonzero = nonzero | ~F.col(name).eqNullSafe(F.lit(0) * F.col(name))
        delta = delta.filter(nonzero).persist()
        try:
            touched = sorted(r[0] for r in
                             delta.select(mv.part_of()).distinct().collect())
            cur = mv.read(spark, parts=touched)
            names = ["cnt", *measures]
            if cur is None:
                joined = delta.select(
                    *dims, *[F.col(n).alias(f"_d_{n}") for n in names])
                for n in names:
                    joined = joined.withColumn(f"_c_{n}", F.lit(None))
            else:
                cur = cur.join(F.broadcast(delta.select(*dims)),
                               dims, "left_semi")
                joined = delta.select(
                    *dims, *[F.col(n).alias(f"_d_{n}") for n in names]
                ).join(cur.select(
                    *dims, *[F.col(n).alias(f"_c_{n}") for n in names]),
                    dims, "left")
            batch = joined.select(
                *dims,
                *[(F.coalesce(F.col(f"_c_{n}"), F.lit(0))
                   + F.coalesce(F.col(f"_d_{n}"), F.lit(0))).alias(n)
                  for n in names])
            batch = batch.withColumn(
                "op", F.when(F.col("cnt") <= 0, "D").otherwise("U"))
            batch = batch.persist()
            batch.count()   # materialize before delta unpersists
        finally:
            delta.unpersist()

    ts = datetime.fromisoformat(bsnap["committed_ts"]).replace(tzinfo=None)
    batch = (batch.withColumn("lsn", F.lit(to_id).cast("long"))
             .withColumn("ts", F.lit(ts).cast("timestamp"))
             .withColumn("batch_id", F.lit(to_id).cast("long")))
    key = f"{IVM_KEY_PREFIX}{from_id:08d}-{to_id:08d}"
    try:
        return mv.commit_merge(spark, batch, key)
    finally:
        if from_id != 0:
            batch.unpersist()
