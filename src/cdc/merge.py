"""J1 — MERGE apply: batch-final rows vs current state (plus J3/J4 helpers).

Replaces the reference pipeline's full-overwrite upload (SURVEY.md §2.A
R10) with an incremental, replay-idempotent upsert:

- batch op 'I'/'U' -> upsert (U on a missing key inserts — the log may
  legitimately carry U-on-dead-key);
- batch op 'D'     -> remove the key;
- LSN monotonicity guard: a batch row only wins if its lsn >= the state
  row's ``_lsn``, so re-applying an old batch (exactly-once replay, crash
  resume) is a no-op row-by-row.

Physical plan notes: the join is a full_outer on the key columns; both
sides carry the same ``part = pmod(xxhash64(repo), P)`` bucketing column
(functionally dependent on repo), letting the committer rewrite only
touched partitions (J4) and Catalyst prune untouched state files. At
cluster scale AQE picks SMJ and splits skewed key ranges.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc.dedup import KEY_COLS

SYS_COLS = ("_lsn", "_updated_ts", "_content_sha256", "_deleted")


def as_cdc_batch(df: DataFrame, lsn: int, key: str) -> DataFrame:
    """Stamp the CDC batch columns ``commit_merge``/``commit_delta``
    expect onto an already 1-row-per-key frame — the adapter every
    standing-state maintainer (continuous dedup, the IVF index) uses to
    commit derived rows under the exactly-once ledger."""
    return (df.withColumn("lsn", F.lit(int(lsn)).cast("long"))
            .withColumn("ts", F.timestamp_seconds(F.lit(int(lsn))))
            .withColumn("op", F.lit("U"))
            .withColumn("batch_id", F.lit(key)))


def with_content_sha(df: DataFrame, content_col: str = "content") -> DataFrame:
    """F1 — materialize the per-row invariant column (built-in sha2; the
    tempting per-row Python hash UDF is exactly what the spec bans)."""
    return df.withColumn("_content_sha256", F.sha2(F.col(content_col), 256))


def merge_apply(
    state: DataFrame,
    batch_final: DataFrame,
    keys: Sequence[str] = KEY_COLS,
    value_cols: Sequence[str] | None = None,
    keep_on_delete: Sequence[str] = (),
) -> DataFrame:
    """Return the new state: state FULL OUTER JOIN batch_final on keys,
    resolved per the CDC rules above.

    ``state``       — columns: keys + value_cols + SYS_COLS.
    ``batch_final`` — one row per key (already LWW-collapsed): keys +
                      value_cols + (lsn, ts, op, batch_id).

    Schema evolution (union-of-schemas, row-replacement semantics): a
    column only the batch carries is ADDED — rows the batch doesn't win
    read NULL for it; a state column the batch DROPPED is KEPT — batch
    winners read NULL (the batch row is a full-row CDC image, so a column
    its source no longer emits is genuinely absent from the new version),
    losers keep their old value. Matching columns with different but
    coercible types (int->long, float->double) widen via Spark's
    when/otherwise coercion.

    ``keep_on_delete`` — value columns a DELETE must NOT null out. A
    table laid out with ``part_cols`` beyond the key routes rows by
    those columns; a tombstone with a NULL part column would hash to the
    wrong partition and a merge-on-read reconcile (scoped to
    delta-carrying partitions) would never meet the live row it
    retires. The committer passes its non-key part columns here.
    """
    if value_cols is None:
        # SYS_COLS are stripped from the batch's value derivation too: a
        # caller that pre-stamped _content_sha256/_lsn (e.g. ran
        # with_content_sha before commit) must not produce a duplicate
        # output column name — the system aliases re-stamp them anyway
        batch_vals = [c for c in batch_final.columns
                      if c not in (*keys, *SYS_COLS, "part",
                                   "lsn", "ts", "op", "batch_id",
                                   "schema_version")]
        state_vals = [c for c in state.columns
                      if c not in (*keys, *SYS_COLS, "part")]
        value_cols = state_vals + [c for c in batch_vals if c not in state_vals]

    b = batch_final.select(
        *[F.col(k).alias(f"_b_{k}") for k in keys],
        *[(F.col(c) if c in batch_final.columns
           else F.lit(None).cast(state.schema[c].dataType)).alias(f"_bv_{c}")
          for c in value_cols],
        F.col("lsn").alias("_b_lsn"),
        F.col("ts").alias("_b_ts"),
        F.col("op").alias("_b_op"),
    )
    cond = None
    for k in keys:
        c = state[k] == b[f"_b_{k}"]
        cond = c if cond is None else (cond & c)
    joined = state.join(b, cond, "full_outer")

    batch_wins = F.col("_b_lsn").isNotNull() & (
        F.col("_lsn").isNull() | (F.col("_b_lsn") >= F.col("_lsn"))
    )
    # Deletes become TOMBSTONES (``_deleted`` flag), not physical removals:
    # a late lower-LSN 'U' arriving in a later batch/micro-batch must lose
    # to the delete, which requires the delete's LSN to still be in state.
    # Readers filter tombstones (CdcTable.read); compaction may vacuum
    # tombstones older than the source's max reordering horizon.
    sel = [F.coalesce(state[k], F.col(f"_b_{k}")).alias(k) for k in keys]
    is_del = batch_wins & (F.col("_b_op") == "D")
    kept = set(keep_on_delete)
    for c in value_cols:
        old = state[c] if c in state.columns else F.lit(None)
        first = (F.when(is_del, F.coalesce(F.col(f"_bv_{c}"), old))
                 if c in kept else F.when(is_del, F.lit(None)))
        sel.append(first.when(batch_wins, F.col(f"_bv_{c}")).otherwise(old).alias(c))
    new_sha = (
        F.sha2(F.col("_bv_content"), 256) if "content" in value_cols else F.lit(None).cast("string")
    )
    sel += [
        F.when(batch_wins, F.col("_b_lsn")).otherwise(F.col("_lsn")).alias("_lsn"),
        F.when(batch_wins, F.col("_b_ts")).otherwise(F.col("_updated_ts")).alias("_updated_ts"),
        F.when(is_del, F.lit(None)).when(batch_wins, new_sha).otherwise(F.col("_content_sha256")).alias("_content_sha256"),
        F.when(batch_wins, F.col("_b_op") == "D")
         .otherwise(F.coalesce(F.col("_deleted"), F.lit(False))).alias("_deleted"),
    ]
    return joined.select(*sel)


def empty_state(spark, batch_final: DataFrame, keys: Sequence[str] = KEY_COLS,
                value_cols: Sequence[str] | None = None) -> DataFrame:
    """An empty current-state DataFrame whose schema matches what
    merge_apply produces for the given batch shape."""
    if value_cols is None:
        value_cols = [c for c in batch_final.columns
                      if c not in (*keys, *SYS_COLS, "part",
                                   "lsn", "ts", "op", "batch_id",
                                   "schema_version")]
    import pyspark.sql.types as T

    b = batch_final.schema
    fields = [T.StructField(k, b[k].dataType) for k in keys]
    fields += [T.StructField(c, b[c].dataType) for c in value_cols]
    fields += [
        T.StructField("_lsn", T.LongType()),
        T.StructField("_updated_ts", T.TimestampType()),
        T.StructField("_content_sha256", T.StringType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
    return spark.createDataFrame([], T.StructType(fields))


def batch_to_state_rows(batch_final: DataFrame,
                        keys: Sequence[str] = KEY_COLS,
                        value_cols: Sequence[str] | None = None,
                        keep_on_delete: Sequence[str] = ()) -> DataFrame:
    """Project an LWW-collapsed batch into current-state row shape (the
    delta layer written by merge-on-read commits): keys + values + system
    columns, with 'D' ops becoming tombstone rows. ``keep_on_delete`` —
    same contract as ``merge_apply``: non-key partition columns survive
    the tombstone so it routes to the live row's partition."""
    if value_cols is None:
        # strip SYS_COLS (and 'part') here too: a pre-stamped
        # _content_sha256/_lsn in the batch would duplicate the system
        # alias below and every later read-by-name becomes ambiguous
        value_cols = [c for c in batch_final.columns
                      if c not in (*keys, *SYS_COLS, "part",
                                   "lsn", "ts", "op", "batch_id",
                                   "schema_version")]
    is_del = F.col("op") == "D"
    kept = set(keep_on_delete)
    sha = (F.when(is_del, F.lit(None)).otherwise(F.sha2(F.col("content"), 256))
           if "content" in value_cols else F.lit(None).cast("string"))
    return batch_final.select(
        *keys,
        *[(F.col(c) if c in kept
           else F.when(is_del, F.lit(None)).otherwise(F.col(c))).alias(c)
          for c in value_cols],
        F.col("lsn").alias("_lsn"),
        F.col("ts").alias("_updated_ts"),
        sha.alias("_content_sha256"),
        is_del.alias("_deleted"),
    )


def affected_keys(batch: DataFrame, state: DataFrame, keys: Sequence[str] = KEY_COLS) -> DataFrame:
    """J3 — keys present in the batch but absent from state (pure inserts)."""
    return batch.select(*keys).distinct().join(state.select(*keys), list(keys), "left_anti")


def touched(state: DataFrame, batch: DataFrame, on: Sequence[str], how: str = "left_semi") -> DataFrame:
    """J4 — state rows whose join key appears in the batch (e.g. touched
    partitions: on=['part'])."""
    return state.join(batch.select(*on).distinct(), list(on), how)
