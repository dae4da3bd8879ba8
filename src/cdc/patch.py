"""Column-level LWW for partial-update CDC feeds (SURVEY.md §2.B A-family
extension; the MongoDB-change-stream / Debezium-incomplete-image case).

Row-level last-writer-wins assumes every event carries a FULL row image.
Many real sources emit PATCHES — only the touched columns, the rest NULL
("not provided"). Folding such a feed with row-LWW silently nulls every
column the final event didn't touch. The correct fold is per-COLUMN
last-non-null-writer-wins:

- ``collapse_patches`` — one hash aggregate per key:
  ``max_by(col, order IF col IS NOT NULL)`` per column, i.e. each column
  independently resolves to its most recent non-null value. This is a
  single groupBy with map-side partial aggregation (a hot key's N patches
  collapse to 1 row per map task before the shuffle) — the same
  skew-robust shape as the row-level ``last_writer_wins(via='maxby')``.

- ``merge_patches`` — apply a collapsed patch batch to current state:
  per column, ``coalesce(patch value, state value)`` when the patch wins
  the LSN guard; delete ops still remove the key (tombstone). Columns the
  whole batch never touched fall through to state — so replaying
  (state + patches) equals folding the full event history.

NULL means "not touched" by definition of a patch feed; a source that
must SET a column to null needs an explicit sentinel upstream (the same
contract Debezium's partial images and Mongo's $unset translation use).

Ordering contract: WITHIN a batch, arbitrary reordering is handled (the
fold is order-insensitive per column). ACROSS batches the row-level LSN
guard applies — a whole patch batch older than the key's state loses, so
cross-batch reordering must stay within the replay's batch horizon (the
same assumption row-level LWW makes). True cell-level versioning
(per-column _lsn in state, Cassandra-style) is the escalation path if a
source reorders unboundedly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc.dedup import KEY_COLS
from cdc.merge import SYS_COLS


def column_lww(df: DataFrame, keys: Sequence[str] = KEY_COLS,
               order: str = "lsn",
               value_cols: Sequence[str] | None = None) -> DataFrame:
    """Per-key, per-column last-NON-NULL-writer-wins in ONE aggregate:
    ``max_by(c, CASE WHEN c IS NOT NULL THEN order END)`` ignores rows
    where the order expression is null, so each column picks its latest
    non-null value independently. Also returns ``order`` = the key's max
    (the patch high-water mark)."""
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in (*keys, order)]
    aggs = [F.max_by(F.col(c),
                     F.when(F.col(c).isNotNull(), F.col(order))).alias(c)
            for c in value_cols]
    aggs.append(F.max(order).alias(order))
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def collapse_patches(events: DataFrame, keys: Sequence[str] = KEY_COLS,
                     order: str = "lsn") -> DataFrame:
    """Collapse a patch-image event batch to one row per key: value
    columns fold per-column (column_lww); ``op``/``ts``/``batch_id`` come
    from the key's LAST event (a trailing delete must win the whole key,
    whatever columns it carries). Output shape matches what
    ``merge_patches`` (and, for full images, ``merge_apply``) consumes."""
    meta = [c for c in ("op", "ts", "batch_id") if c in events.columns]
    value_cols = [c for c in events.columns
                  if c not in (*keys, order, *meta)]
    folded = column_lww(events, keys=keys, order=order,
                        value_cols=value_cols)
    if not meta:
        return folded
    last = (events.groupBy(*[F.col(k) for k in keys])
            .agg(*[F.max_by(F.col(c), F.col(order)).alias(c) for c in meta]))
    # both sides are hash-aggregates on the same keys — the join reuses
    # that clustering (no extra shuffle beyond the aggs' own)
    return folded.join(last, list(keys))


def merge_patches(state: DataFrame, patch_final: DataFrame,
                  keys: Sequence[str] = KEY_COLS) -> DataFrame:
    """MERGE a collapsed patch batch into current state: full-outer join
    on the keys; when the patch wins the LSN guard each column resolves
    ``coalesce(patch, state)`` (patch semantics) instead of replacing the
    row; op='D' removes the key via tombstone, exactly like
    ``merge.merge_apply``. Same one-shuffle physical shape."""
    value_cols = [c for c in patch_final.columns
                  if c not in (*keys, "lsn", "ts", "op", "batch_id")]
    state_vals = [c for c in state.columns
                  if c not in (*keys, *SYS_COLS, "part")]
    value_cols = state_vals + [c for c in value_cols if c not in state_vals]

    b = patch_final.select(
        *[F.col(k).alias(f"_b_{k}") for k in keys],
        *[(F.col(c) if c in patch_final.columns
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
        F.col("_lsn").isNull() | (F.col("_b_lsn") >= F.col("_lsn")))
    is_del = batch_wins & (F.col("_b_op") == "D")
    sel = [F.coalesce(state[k], F.col(f"_b_{k}")).alias(k) for k in keys]
    for c in value_cols:
        old = state[c] if c in state.columns else F.lit(None)
        patched = F.coalesce(F.col(f"_bv_{c}"), old)
        sel.append(F.when(is_del, F.lit(None))
                    .when(batch_wins, patched).otherwise(old).alias(c))
    new_content = (F.coalesce(F.col("_bv_content"), state["content"])
                   if "content" in value_cols and "content" in state.columns
                   else (F.col("_bv_content") if "content" in value_cols
                         else F.lit(None).cast("string")))
    sel += [
        F.when(batch_wins, F.col("_b_lsn")).otherwise(F.col("_lsn")).alias("_lsn"),
        F.when(batch_wins, F.col("_b_ts")).otherwise(F.col("_updated_ts")).alias("_updated_ts"),
        F.when(is_del, F.lit(None))
         .when(batch_wins, F.sha2(new_content, 256))
         .otherwise(F.col("_content_sha256")).alias("_content_sha256"),
        F.when(batch_wins, F.col("_b_op") == "D")
         .otherwise(F.coalesce(F.col("_deleted"), F.lit(False))).alias("_deleted"),
    ]
    return joined.select(*sel)


def patch_reconcile(df: DataFrame, keys: Sequence[str] = KEY_COLS) -> DataFrame:
    """READ-side reconcile for patch-image MOR delta layers: per key, fold
    the base row plus every patch layer IN COMMIT ORDER (``_layer``) with
    exactly ``merge_patches``' semantics — the >= row-LSN guard, per-column
    ``coalesce(patch, acc)``, delete resets the row, a later patch
    resurrects from NULL state. One hash aggregate per key
    (collect_list -> array_sort by layer -> ``F.aggregate`` fold), fully
    codegen'd — the same one-wide-shuffle shape as the row-level LWW
    reconcile, paid only while deltas exist (compaction folds them).

    ``df``: keys + value columns + ``_lsn``/``_updated_ts``/
    ``_content_sha256``/``_deleted`` + ``_layer`` (commit ordinal) +
    ``_is_patch`` (False for base/full-image rows, True for patch delta
    rows). Equivalence with the sequential CoW fold is pinned by
    tests/test_patch.py::test_patch_mor_read_equals_cow_fold."""
    sys_here = ("_lsn", "_updated_ts", "_content_sha256", "_deleted",
                "_layer", "_is_patch")
    value_cols = [c for c in df.columns if c not in (*keys, *sys_here)]
    types = {f.name: f.dataType for f in df.schema.fields}

    item = F.struct(
        F.col("_layer").alias("layer"),
        F.col("_lsn").alias("lsn"),
        F.col("_updated_ts").alias("ts"),
        F.coalesce(F.col("_deleted"), F.lit(False)).alias("deleted"),
        F.col("_is_patch").alias("is_patch"),
        *[F.col(c).alias(f"v_{c}") for c in value_cols])
    grouped = (df.groupBy(*[F.col(k) for k in keys])
               .agg(F.array_sort(F.collect_list(item)).alias("_items")))

    def _acc(lsn, ts, deleted, vals):
        return F.struct(lsn.alias("lsn"), ts.alias("ts"),
                        deleted.alias("deleted"),
                        *[v.alias(f"v_{c}") for c, v in vals])

    def _nulls():
        return [(c, F.lit(None).cast(types[c])) for c in value_cols]

    zero = _acc(F.lit(-1).cast("long"),
                F.lit(None).cast(types["_updated_ts"]),
                F.lit(True), _nulls())

    def step(acc, x):
        # NULL-lsn rows never win — merge_patches requires a non-null
        # batch lsn (its batch_wins has _b_lsn.isNotNull()); an unguarded
        # NULL >= comparison would fall through F.when and apply the row
        wins = x["lsn"].isNotNull() & (x["lsn"] >= acc["lsn"])
        tomb = _acc(x["lsn"], x["ts"], F.lit(True), _nulls())
        patched = _acc(x["lsn"], x["ts"], F.lit(False),
                       [(c, F.coalesce(x[f"v_{c}"], acc[f"v_{c}"]))
                        for c in value_cols])
        full = _acc(x["lsn"], x["ts"], F.lit(False),
                    [(c, x[f"v_{c}"]) for c in value_cols])
        return (F.when(~wins, acc)
                 .when(x["deleted"], tomb)
                 .when(x["is_patch"], patched)
                 .otherwise(full))

    acc = F.aggregate(F.col("_items"), zero, step)
    sha = (F.when(acc["deleted"], F.lit(None))
            .otherwise(F.sha2(acc["v_content"], 256))
           if "content" in value_cols else F.lit(None).cast("string"))
    return grouped.select(
        *keys,
        *[acc[f"v_{c}"].alias(c) for c in value_cols],
        acc["lsn"].alias("_lsn"),
        acc["ts"].alias("_updated_ts"),
        sha.alias("_content_sha256"),
        acc["deleted"].alias("_deleted"))
