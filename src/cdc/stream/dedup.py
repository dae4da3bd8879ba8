"""Continuous dedup as a STREAMING job — the full composition of the
incremental dedup operators over engine tables, for ALL THREE dedup
families (MinHash shingles, SimHash, embedding hyperplane LSH).

Each micro-batch of new documents:

1. computes signature bands ONLY for the batch and probes the STANDING
   band table — O(batch), the corpus is never re-shingled/re-hashed. The
   band table is laid out with ``part_cols`` = the bucket columns
   (e.g. (band, bucket)) while keyed per (doc_id, band), so the probe
   reads ONLY the partitions the batch's buckets hash to (manifest
   pruning) — an epoch never scans the full standing band table;
2. merges the resulting candidate pairs into the STANDING component
   assignment via ``cc.connected_components_incremental_delta`` —
   O(churn) END-TO-END: untouched components never enter a CC round,
   never enter the changed-row anti join, and are never materialized or
   localCheckpoint'ed. The touched-component labels come from a
   partition-pruned point read of the groups table
   (``lookup_keys`` on the pair endpoints), so the assignment pays ONE
   broadcast-semi scan per epoch and zero shuffles of the corpus;
3. commits the new bands and the CHANGED assignment rows to two
   ``CdcTable``s under the exactly-once commit ledger (epoch-scoped
   batch keys — re-delivered epochs no-op per table, and a crash BETWEEN
   the two commits heals on replay: the band commit skips via its ledger
   entry and the pair probe is idempotent against a standing table that
   already contains the batch's bands).

State lives in tables, so the dedup assignment survives restarts, is
time-travelable, and is readable by any downstream consumer while the
stream runs. The embedding family additionally maintains a standing
VECTORS table (vec_id -> embedding, key_hash layout) committed first each
epoch; exact-cosine confirmation reads candidate endpoints back from it
with partition-pruned point reads — never a corpus scan.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc.cc import connected_components_incremental_delta
from cdc.merge import as_cdc_batch as _as_batch
from cdc.table.table import CdcTable

GROUPS_SCHEMA = "id long, grp long"


class DedupFamily:
    """One dedup family's pluggable pieces. ``docs`` frames carry
    (id_col, <payload>): (doc_id, text) for the text families,
    (vec_id, embedding) for vectors. Band signatures must be a PURE
    per-document function (standing rows never change after ingest) —
    that is what makes the O(batch) probe sound."""

    name: str
    id_col: str
    bands_key: tuple        # band-table key columns (LWW identity)
    bands_parts: tuple      # band-table part_cols (the probe's join key)
    bands_schema: str       # empty-table DDL
    pair_cols: tuple        # candidate-pair output columns (a, b)

    def bands(self, docs: DataFrame) -> DataFrame:
        raise NotImplementedError

    def pairs(self, spark: SparkSession, new_bands: DataFrame,
              all_bands: DataFrame, docs: DataFrame) -> DataFrame:
        raise NotImplementedError

    # optional per-epoch side state (the embedding family's vectors table)
    def prepare(self, spark: SparkSession, docs: DataFrame, lsn: int,
                key: str) -> None:
        return None

    def is_prepared(self, key: str) -> bool:
        return True

    def state_lsn_high(self) -> int:
        return -1


class MinhashFamily(DedupFamily):
    name = "minhash"
    id_col = "doc_id"
    bands_key = ("doc_id", "band")
    bands_parts = ("band", "bucket")
    bands_schema = "doc_id long, band int, bucket string"
    pair_cols = ("doc_a", "doc_b")

    def bands(self, docs):
        from cdc.lsh import minhash_bands
        return minhash_bands(docs.select("doc_id", "text"))

    def pairs(self, spark, new_bands, all_bands, docs):
        from cdc.lsh import pairs_from_bands
        return pairs_from_bands(new_bands, all_bands)


class SimhashFamily(DedupFamily):
    name = "simhash"
    id_col = "doc_id"
    bands_key = ("doc_id", "band")
    bands_parts = ("band", "bval")
    bands_schema = "doc_id long, simhash long, band int, bval long"
    pair_cols = ("doc_a", "doc_b")

    def bands(self, docs):
        from cdc.simhash import simhash_bands
        return simhash_bands(docs.select("doc_id", "text"))

    def pairs(self, spark, new_bands, all_bands, docs):
        from cdc.simhash import sim_pairs
        return sim_pairs(new_bands, all_bands).select("doc_a", "doc_b")


class EmbedFamily(DedupFamily):
    """Embedding near-dup via random-hyperplane LSH + exact-cosine
    confirmation. Maintains a standing VECTORS table (committed FIRST
    each epoch, under the same epoch key) so confirmation can read the
    candidate endpoints' embeddings back with partition-pruned point
    reads — the batch never needs the corpus' embeddings resident."""

    name = "embed"
    id_col = "vec_id"
    bands_key = ("vec_id", "band")
    bands_parts = ("band", "bval")
    bands_schema = "vec_id long, band int, bval int"
    pair_cols = ("id_a", "id_b")

    def __init__(self, vectors: CdcTable, threshold: float = 0.9,
                 dim: int = 64):
        self.vectors = vectors
        self.threshold = threshold
        self.dim = dim

    def bands(self, docs):
        from cdc.vectors import rh_bands
        return rh_bands(docs.select("vec_id", "embedding"), dim=self.dim)

    def prepare(self, spark, docs, lsn, key):
        if not self.vectors.is_committed(key):
            self.vectors.commit_merge(
                spark, _as_batch(docs.select("vec_id", "embedding"),
                                 lsn, key), key)

    def is_prepared(self, key):
        return self.vectors.is_committed(key)

    def state_lsn_high(self):
        return self.vectors.lsn_high()

    def pairs(self, spark, new_bands, all_bands, docs):
        from cdc.vectors import _confirm_cosine, _rh_candidates
        cand = (_rh_candidates(new_bands, all_bands)
                # consumed twice (endpoint lookup + confirmation join)
                .localCheckpoint(eager=True))
        ends = (cand.select(F.col("id_a").alias("vec_id"))
                .unionAll(cand.select(F.col("id_b").alias("vec_id")))
                .distinct())
        # partition-pruned point read: endpoints hash to O(batch-buckets)
        # partitions of the standing vectors table (the batch itself was
        # committed by prepare(), so one read covers both sides)
        vecs = self.vectors.lookup_keys(spark, ends)
        return (_confirm_cosine(cand, vecs.select("vec_id", "embedding"),
                                self.threshold)
                .select("id_a", "id_b"))


MINHASH = MinhashFamily()
SIMHASH = SimhashFamily()


def dedup_tables(bands_root: str, groups_root: str,
                 n_partitions: int = 16,
                 family: DedupFamily = MINHASH) -> tuple[CdcTable, CdcTable]:
    """The two standing-state tables of a continuous dedup pipeline.
    The bands table is keyed per (doc, band) — the LWW upsert unit — but
    PARTITIONED by the bucket columns (``part_cols``), so ingest probes
    prune to the batch's bucket partitions. Bucket values are a pure
    per-doc function and therefore immutable per key, satisfying the
    part_cols contract. The groups table is keyed (id) with key_hash
    layout, so the O(churn) upsert commits with zero extra repartition
    and touched-label probes are partition-pruned point reads.

    An EXISTING table at either root is opened with its RECORDED layout
    (a standing pipeline created before the bucket-partitioned layout
    keeps working — correctness never depended on the layout, only the
    probe pruning does, and ``plan_epoch`` prunes only when the layout
    matches). New roots get the bucket layout."""
    from cdc.meta import store

    def make(root, key_cols, part_cols):
        if store.read_current(root) is not None:
            return CdcTable.open(root)
        return CdcTable(root, key_cols=key_cols,
                        n_partitions=n_partitions, layout="key_hash",
                        part_cols=part_cols)

    bands = make(bands_root, family.bands_key, family.bands_parts)
    groups = make(groups_root, (family.id_col,), None)
    return bands, groups


def plan_epoch(spark: SparkSession, bands: CdcTable, groups: CdcTable,
               docs: DataFrame, key: str,
               family: DedupFamily = MINHASH
               ) -> tuple[DataFrame, DataFrame, int]:
    """Compute one epoch's (new_bands, changed_assignment_rows, lsn)
    WITHOUT committing the two dedup tables (the embedding family's
    vectors side-table IS committed — idempotent per key). Exposed so
    tests can pin the epoch's plan/IO shape; ``ingest_dedup_batch`` is
    this + the two commits."""
    # the batch lsn must beat every STANDING row's lsn or the LWW merge
    # silently drops the update — derive it from the tables, NOT from the
    # stream's epoch counter (a fresh checkpoint restarts epochs at 0).
    # Crash between the commits: the replayed earlier commits no-op via
    # their ledger entries and the later ones land with a higher lsn than
    # originally planned — still monotone, same rows.
    lsn = max(bands.lsn_high(), groups.lsn_high(),
              family.state_lsn_high()) + 1
    family.prepare(spark, docs, lsn, key)

    nb = (family.bands(docs)
          # consumed several times (part-set collect, probe, union,
          # commit) — don't run the signature pipeline per consumer
          .localCheckpoint(eager=True))
    # bucket-local probe: the standing band table is partitioned by the
    # bucket columns, so ONLY the partitions the batch's buckets hash to
    # are read — bounded by the batch's bucket set, never the corpus.
    # A LEGACY table partitioned by the key (pre-bucket layout, opened by
    # dedup_tables) must NOT prune: matching standing rows hash by their
    # own doc id, not the probe's buckets — prune only when the layout
    # is the bucket one.
    if tuple(bands.part_cols) == tuple(family.bands_parts):
        parts = sorted(r["p"] for r in nb.select(
            bands.part_of().alias("p")).distinct().collect())
    else:
        parts = None
    st = bands.read(spark, parts=parts)
    cols = [f.split()[0] for f in family.bands_schema.split(",")]
    standing_b = (st.select(*cols) if st is not None
                  else spark.createDataFrame([], family.bands_schema))
    pairs = (family.pairs(spark, nb, standing_b.unionByName(nb), docs)
             # O(batch) rows; consumed by the endpoint probe and the CC
             # merge — cut the probe-join plan once
             .localCheckpoint(eager=True))

    a, b = family.pair_cols
    prior_t = groups.read(spark)
    touched = None
    if prior_t is not None:
        prior = prior_t.select(F.col(family.id_col).alias("id"), "grp")
        # touched-component labels via a partition-pruned point read of
        # the groups table (pair endpoints -> their key partitions) —
        # the epoch's only other access to the standing assignment is
        # ONE broadcast-semi scan inside the delta merge
        ends = (pairs.select(F.col(a).alias(family.id_col))
                .unionAll(pairs.select(F.col(b).alias(family.id_col)))
                .distinct())
        probe = groups.lookup_keys(spark, ends)
        if probe is not None:
            touched = probe.select("grp")
    else:
        prior = spark.createDataFrame([], GROUPS_SCHEMA)
    changed = connected_components_incremental_delta(
        prior, pairs, src=a, dst=b, touched=touched)
    changed = changed.select(F.col("id").alias(family.id_col), "grp")
    return nb, changed, lsn


def ingest_dedup_batch(spark: SparkSession, bands: CdcTable,
                       groups: CdcTable, docs: DataFrame,
                       key: str, family: DedupFamily = MINHASH,
                       mode: str = "cow") -> None:
    """One continuous-dedup ingest step (the foreachBatch body, callable
    directly for batch-mode backfills). ``docs`` — (doc_id, text) /
    (vec_id, embedding) for the NEW documents only. Idempotent per
    (table, key).

    ``mode='mor'`` — commit both tables as merge-on-read DELTA layers:
    write cost drops from O(touched partitions) to O(batch) per epoch
    (band rows are pure appends; changed assignment rows reconcile by
    max-lsn at read), the right trade for high-frequency micro-batches.
    Reads stay exact either way; run ``maintenance.compact`` on the
    cadence that keeps the probe's reconcile bounded."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"unknown mode {mode!r}")
    if (bands.is_committed(key) and groups.is_committed(key)
            and family.is_prepared(key)):
        return   # fully re-delivered epoch: skip the probe + merge work
    nb, changed, lsn = plan_epoch(spark, bands, groups, docs, key, family)
    for table, frame in ((bands, nb), (groups, changed)):
        if not table.is_committed(key):
            commit = (table.commit_delta if mode == "mor"
                      else table.commit_merge)
            commit(spark, _as_batch(frame, lsn, key), key)


def continuous_dedup(spark: SparkSession, docs_stream: DataFrame,
                     bands: CdcTable, groups: CdcTable,
                     checkpoint_dir: str | None = None,
                     available_now: bool = True,
                     processing_time: str | None = None,
                     await_termination: bool = True,
                     family: DedupFamily = MINHASH,
                     mode: str = "cow",
                     compact_every: int | None = None):
    """Run continuous dedup over a streaming (doc_id, text) — or
    (vec_id, embedding) — source. ``available_now=True`` drains the
    source and stops (bounded backfill); otherwise a live tail. Returns
    the StreamingQuery."""
    checkpoint = checkpoint_dir or os.path.join(groups.root,
                                                "_checkpoints", "dedup")
    # epoch_id is stable per checkpoint but not globally unique — scope
    # the ledger key by a token of the checkpoint location (same
    # convention as stream_to_table).
    token = hashlib.sha256(
        os.path.abspath(checkpoint).encode()).hexdigest()[:10]

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        key = f"dedup-{token}-epoch-{epoch_id:010d}"
        ingest_dedup_batch(spark, bands, groups, batch_df, key, family,
                           mode)
        if compact_every and epoch_id % compact_every == compact_every - 1:
            from cdc.table.maintenance import compact
            compact(spark, bands)
            compact(spark, groups)

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
