"""Secondary indexes: value → key lookups without scanning the base table.

The base table's ``key_hash`` layout makes KEY lookups O(one partition)
(``CdcTable.lookup``), but a predicate on a NON-key column is a full scan.
A secondary index is itself a CdcTable whose rows are ``(value, *base
keys)`` with key_cols = (indexed column, *base keys) and layout
``repo_hash`` — its partition function hashes the FIRST key column, i.e.
the indexed VALUE, so an index probe manifest-prunes to one partition.

Maintenance is incremental over the change feed (``images='both'``),
exactly the IVM delta-rule with no measures: per (value, key) the signed
row count nets pre/post images out, so an update that KEEPS the value
emits nothing, an update that CHANGES it emits a tombstone under the old
value and an upsert under the new one, and deletes retire their entry.
The refresh is exactly-once via the index's own ledger (``idx-<from>-
<to>`` keys = the checkpoint), identical to cdc.ivm; plug
``index.maintainer(idx)`` into ``stream_to_table(downstream=[...])`` to
advance the index in lock-step with ingest.

Cost model at scale: refresh is O(churned base partitions) for the feed +
one small shuffle of the netted (value, key) deltas; a lookup costs one
index-partition read (bloom/row-group skipping applies — the index rows
are key-sorted like any table) + ``base.lookup_keys`` over the hits.
NULL values are not indexed (SQL index semantics: IS NULL scans).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc.table.table import CdcTable
from cdc.table.timetravel import change_feed

IDX_KEY_PREFIX = "idx-"
_POSITIVE = ("insert", "update_postimage")


def create_index(root: str, base: CdcTable, column: str,
                 n_partitions: int = 16) -> CdcTable:
    """An (empty) index table handle over ``base[column]``. ``refresh``
    populates it; the handle is an ordinary CdcTable (time travel, WAP,
    inspection all apply)."""
    if column in base.key_cols:
        raise ValueError(f"{column!r} is a base key column — key lookups "
                         f"are already O(partition); no index needed")
    return CdcTable(root, key_cols=(column, *base.key_cols),
                    n_partitions=n_partitions, layout="repo_hash")


def synced_snapshot_id(idx: CdcTable) -> int:
    snap = idx.current_snapshot()
    hi = 0
    for key in (snap["committed_batches"] if snap else []):
        if key.startswith(IDX_KEY_PREFIX):
            lo_s, _, hi_s = key[len(IDX_KEY_PREFIX):].partition("-")
            if lo_s.isdigit() and hi_s.isdigit():
                hi = max(hi, int(hi_s))
    return hi


def refresh(spark: SparkSession, base: CdcTable, idx: CdcTable) -> dict | None:
    """Bring the index up to date with ``base``'s current snapshot.
    Returns the new index snapshot, or None when already current."""
    column = idx.key_cols[0]
    bsnap = base.current_snapshot()
    if bsnap is None:
        return None
    to_id = int(bsnap["snapshot_id"])
    from_id = synced_snapshot_id(idx)
    if from_id >= to_id:
        return None

    keys = list(base.key_cols)
    if from_id == 0:
        batch = (base.read(spark)
                 .filter(F.col(column).isNotNull())
                 .select(column, *keys)
                 .withColumn("op", F.lit("U")))
    else:
        feed = change_feed(spark, base, from_id, to_id, images="both")
        sign = (F.when(F.col("_change_type").isin(*_POSITIVE), F.lit(1))
                .otherwise(F.lit(-1)))
        net = (feed.filter(F.col(column).isNotNull())
               .groupBy(column, *keys)
               .agg(F.sum(sign).alias("_net"))
               .filter(F.col("_net") != 0))
        batch = net.select(
            column, *keys,
            F.when(F.col("_net") > 0, "U").otherwise("D").alias("op"))

    ts = datetime.fromisoformat(bsnap["committed_ts"]).replace(tzinfo=None)
    batch = (batch
             .withColumn("lsn", F.lit(to_id).cast("long"))
             .withColumn("ts", F.lit(ts).cast("timestamp"))
             .withColumn("batch_id", F.lit(to_id).cast("long")))
    return idx.commit_merge(
        spark, batch, f"{IDX_KEY_PREFIX}{from_id:08d}-{to_id:08d}")


def maintainer(idx: CdcTable):
    """Adapter for ``stream_to_table(downstream=[...])``."""
    def _refresh(spark: SparkSession, base: CdcTable):
        return refresh(spark, base, idx)
    return _refresh


def lookup_value(spark: SparkSession, base: CdcTable, idx: CdcTable,
                 value) -> DataFrame:
    """Point lookup by indexed value: probe ONE index partition for the
    matching keys, then ``base.lookup_keys`` — never a base scan."""
    column = idx.key_cols[0]
    probe = spark.range(1).select(F.lit(value).alias(column))
    part = probe.select(idx.part_of().alias("p")).first()["p"]
    rows = idx.read(spark, parts=[part])
    if rows is None:
        # an index table with no commits yet reads as None; surface the
        # operational fix instead of an AttributeError on rows.filter
        raise ValueError(
            f"index at {idx.root} has no commits yet — run "
            f"index.refresh(spark, base, idx) before point lookups")
    hits = rows.filter(F.col(column) == F.lit(value)) \
               .select(*base.key_cols)
    out = base.lookup_keys(spark, hits)
    if out is None:
        return hits
    # the index may momentarily trail the base (refresh is a separate
    # commit): re-verify the predicate on the base rows — index hits are
    # candidates, the base is the truth
    return out.filter(F.col(column) == F.lit(value))
