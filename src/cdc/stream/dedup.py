"""Continuous dedup as a STREAMING job — the full composition of the
incremental dedup operators over engine tables.

Each micro-batch of new documents:

1. computes MinHash bands ONLY for the batch and probes the STANDING
   band table (``textops.minhash_pairs_incremental`` — O(batch), the
   corpus is never re-shingled);
2. merges the resulting candidate pairs into the STANDING component
   assignment (``cc.connected_components_incremental`` — O(churn),
   untouched components never enter a CC round);
3. commits the new bands and the CHANGED assignment rows (computed by an
   anti join, so the upsert is O(churn) too) to two ``CdcTable``s under
   the exactly-once commit ledger (epoch-scoped batch keys — re-delivered
   epochs no-op per table, and a crash BETWEEN the two commits heals on
   replay: the band commit skips via its ledger entry and the pair probe
   is idempotent against a standing table that already contains the
   batch's bands).

State lives in tables, so the dedup assignment survives restarts, is
time-travelable, and is readable by any downstream consumer while the
stream runs. Scale shape: the band table is keyed (doc_id, band) and the
probe joins on (band, bucket) with the SMALL batch side; the groups table
is keyed (doc_id) with key_hash layout, so the O(churn) upsert commits
with zero extra repartition.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc.cc import connected_components_incremental
from cdc.table.table import CdcTable

BANDS_SCHEMA = "doc_id long, band int, bucket string"
GROUPS_SCHEMA = "id long, grp long"


def dedup_tables(bands_root: str, groups_root: str,
                 n_partitions: int = 16) -> tuple[CdcTable, CdcTable]:
    """The two standing-state tables of a continuous dedup pipeline.
    key_hash layout: every committed frame here comes out of a key-hash
    join/merge, so the committer skips its repartition."""
    bands = CdcTable(bands_root, key_cols=("doc_id", "band"),
                     n_partitions=n_partitions, layout="key_hash")
    groups = CdcTable(groups_root, key_cols=("doc_id",),
                      n_partitions=n_partitions, layout="key_hash")
    return bands, groups


def _as_batch(df: DataFrame, lsn: int, key: str) -> DataFrame:
    """Stamp the CDC batch columns ``commit_merge`` expects onto an
    already 1-row-per-key frame."""
    return (df.withColumn("lsn", F.lit(int(lsn)).cast("long"))
            .withColumn("ts", F.timestamp_seconds(F.lit(int(lsn))))
            .withColumn("op", F.lit("U"))
            .withColumn("batch_id", F.lit(key)))


def ingest_dedup_batch(spark: SparkSession, bands: CdcTable,
                       groups: CdcTable, docs: DataFrame,
                       key: str) -> None:
    """One continuous-dedup ingest step (the foreachBatch body, callable
    directly for batch-mode backfills). ``docs`` — (doc_id, text) for the
    NEW documents only. Idempotent per (table, key)."""
    from cdc.lsh import minhash_pairs_incremental

    if bands.is_committed(key) and groups.is_committed(key):
        return   # fully re-delivered epoch: skip the probe + merge work
    # the batch lsn must beat every STANDING row's lsn or the LWW merge
    # silently drops the update — derive it from the tables, NOT from the
    # stream's epoch counter (a fresh checkpoint restarts epochs at 0).
    # Crash between the two commits: the replayed bands commit no-ops via
    # its ledger entry and the groups commit lands with a higher lsn than
    # originally planned — still monotone, same rows.
    lsn = max(bands.lsn_high(), groups.lsn_high()) + 1

    standing = bands.read(spark)
    standing_b = (standing.select("doc_id", "band", "bucket")
                  if standing is not None
                  else spark.createDataFrame([], BANDS_SCHEMA))
    pairs, nb = minhash_pairs_incremental(
        standing_b, docs.select("doc_id", "text"))

    prior_t = groups.read(spark)
    prior = (prior_t.select(F.col("doc_id").alias("id"), "grp")
             if prior_t is not None
             else spark.createDataFrame([], GROUPS_SCHEMA))
    # consumed by the CC merge (several probes) and the changed-rows anti
    # join — materialize the (id, grp) pairs once instead of re-running
    # the table read + LWW reconcile per consumer. (At extreme state
    # sizes, prefer dropping this and letting the 2-column parquet scans
    # repeat — executor-local copies of the full assignment trade memory
    # for IO.)
    prior = prior.localCheckpoint(eager=True)
    comp = connected_components_incremental(prior, pairs,
                                            src="doc_a", dst="doc_b")
    # O(churn) upsert: only rows that differ from the standing assignment
    changed = (comp.join(prior, ["id", "grp"], "left_anti")
               .select(F.col("id").alias("doc_id"), "grp"))

    if not bands.is_committed(key):
        bands.commit_merge(spark, _as_batch(nb, lsn, key), key)
    if not groups.is_committed(key):
        groups.commit_merge(spark, _as_batch(changed, lsn, key), key)


def continuous_dedup(spark: SparkSession, docs_stream: DataFrame,
                     bands: CdcTable, groups: CdcTable,
                     checkpoint_dir: str | None = None,
                     available_now: bool = True,
                     processing_time: str | None = None,
                     await_termination: bool = True):
    """Run continuous dedup over a streaming (doc_id, text) source.
    ``available_now=True`` drains the source and stops (bounded backfill);
    otherwise a live tail. Returns the StreamingQuery."""
    checkpoint = checkpoint_dir or os.path.join(groups.root,
                                                "_checkpoints", "dedup")
    # epoch_id is stable per checkpoint but not globally unique — scope
    # the ledger key by a token of the checkpoint location (same
    # convention as stream_to_table).
    token = hashlib.sha256(
        os.path.abspath(checkpoint).encode()).hexdigest()[:10]

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        key = f"dedup-{token}-epoch-{epoch_id:010d}"
        ingest_dedup_batch(spark, bands, groups, batch_df, key)

    w = (docs_stream.writeStream.foreachBatch(handle)
         .option("checkpointLocation", checkpoint)
         .outputMode("update"))
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time:
        w = w.trigger(processingTime=processing_time)
    q = w.start()
    if await_termination and available_now:
        q.awaitTermination()
    return q
