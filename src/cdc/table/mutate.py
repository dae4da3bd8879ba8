"""Predicate row-level mutations: DELETE WHERE / UPDATE WHERE as
transactional commits (the Delta-style ``DELETE FROM t WHERE`` /
``UPDATE t SET ... WHERE`` analog — e.g. the GDPR right-to-erasure path).

Both compile to a SYNTHESIZED CDC batch over the matched rows — op 'D'
tombstones for delete, full-row 'U' images with the SET expressions
applied for update — stamped with one statement LSN above the table's
high-water mark, then routed through ``cdc.pipeline.apply_batch``. That
composition inherits the whole commit stack for free: exactly-once via
the batch-key ledger, CoW or MOR (``mode='mor'`` writes only the matched
rows — O(matched), the right default for sparse predicates at 100 TB),
optimistic ``conflict_retries``, and the skew-aware LWW planner.

Physical plan: the matched-row scan is a manifest-resolved parquet read
with the predicate pushed to footers (row-group skipping on the sorted
key / lsn stats), so an unselective predicate never materializes the
table. The matched frame pins the CURRENT snapshot's file list at build
time; a concurrent writer advancing the table surfaces as the commit
CAS conflict, not a torn read.
"""

from __future__ import annotations

from collections.abc import Mapping
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc.pipeline import apply_batch
from cdc.table.table import PART_COL, CdcTable


def _matched_events(spark: SparkSession, table: CdcTable, where: str,
                    op: str, set: Mapping[str, str] | None = None,
                    base: dict | None = None) -> DataFrame:
    """``base`` — snapshot dict to evaluate the statement against instead
    of the current one (transaction staging: statements inside a txn see
    the txn's own staged state, cdc.sql.transaction)."""
    state = table.read(spark, snapshot_id=(base["snapshot_id"]
                                           if base is not None else None))
    if state is None:
        raise ValueError("cannot mutate an empty table")
    data_cols = [c for c in state.columns
                 if c != PART_COL and not c.startswith("_")]
    matched = state.filter(F.expr(where)).select(*data_cols)
    for col in set or ():
        if col in table.key_cols:
            raise ValueError(f"cannot UPDATE key column {col!r}")
        if col not in data_cols:
            raise ValueError(f"unknown column {col!r}")
    if set:
        # every SET expr evaluates over the OLD row (SQL UPDATE
        # semantics): one simultaneous projection, no chaining
        matched = matched.select(*[
            (F.expr(set[c]).cast(matched.schema[c].dataType) if c in set
             else F.col(c)).alias(c)
            for c in data_cols])
    ts = datetime.now(timezone.utc).isoformat()
    lsn_high = (base["lsn_high"] if base is not None else table.lsn_high())
    return (matched
            .withColumn("lsn", F.lit(lsn_high + 1))
            .withColumn("ts", F.to_timestamp(F.lit(ts)))
            .withColumn("op", F.lit(op))
            .withColumn("batch_id", F.lit(0).cast("long")))


def delete_where(spark: SparkSession, table: CdcTable, where: str,
                 batch_key: str, mode: str = "mor", **apply_kw) -> dict:
    """Tombstone every current row matching the SQL predicate ``where``
    (evaluated over the table's columns), as ONE exactly-once commit.
    Matching nothing commits nothing (apply_batch's empty-batch guard) —
    an empty statement is naturally idempotent without a ledger entry."""
    ev = _matched_events(spark, table, where, "D")
    return apply_batch(spark, table, ev, batch_key, normalize=False,
                       metrics=False, mode=mode, **apply_kw)


def update_where(spark: SparkSession, table: CdcTable, where: str,
                 set: Mapping[str, str], batch_key: str,
                 mode: str = "mor", **apply_kw) -> dict:
    """UPDATE ... SET <col> = <sql expr> ... WHERE <predicate>: SET
    expressions are SQL over the OLD row (standard UPDATE semantics,
    e.g. ``{"score": "score * 2"}``), applied to the matched rows'
    full images; key columns are immutable (delete + re-insert to
    re-key, as in SQL)."""
    ev = _matched_events(spark, table, where, "U", set=set)
    return apply_batch(spark, table, ev, batch_key, normalize=False,
                       metrics=False, mode=mode, **apply_kw)
