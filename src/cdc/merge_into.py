"""Generic conditional MERGE INTO (SQL:2003 MERGE / Delta-style builder) —
the general-purpose sibling of the CDC-specialized ``merge.merge_apply``
(SURVEY.md §2.B J1). Where merge_apply hard-codes the binlog rules (LSN
guard, op column, tombstones), this operator takes arbitrary clause
conditions and SET/VALUES expressions, so a user can express any
WHEN MATCHED [AND cond] THEN UPDATE/DELETE, WHEN NOT MATCHED [AND cond]
THEN INSERT statement over DataFrames.

Conditions and expressions are SQL strings over the aliases ``t``
(target) and ``s`` (source) — e.g. ``"s.lsn > t.lsn"`` — resolved inside
the single full-outer equi-join this compiles to. Physical plan: ONE
shuffle (or broadcast, when one side is small — AQE decides) on the
``on`` keys; every clause evaluates as whole-stage-codegen CASE
expressions over the joined row, never a second pass.

Clause order follows SQL MERGE: ``matched_delete`` is checked before
``matched_update``; a matched row satisfying neither carries over
unchanged. The source must be unique on ``on`` (SQL MERGE's "cannot
update the same row twice" rule) — enforce upstream with
``cdc.dedup.last_writer_wins`` or ``cdc.quality.check(unique=...)``.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: Sequence[str],
    *,
    matched_update: str | None = "true",
    update_set: Mapping[str, str] | None = None,
    matched_delete: str | None = None,
    not_matched_insert: str | None = "true",
    insert_values: Mapping[str, str] | None = None,
) -> DataFrame:
    """Return the merged target (same schema as ``target``).

    - ``matched_update`` — WHEN MATCHED AND <cond> THEN UPDATE; ``None``
      disables updates. ``update_set`` maps target column -> SQL expr
      (default: ``s.<col>`` for columns the source shares, else keep).
    - ``matched_delete`` — WHEN MATCHED AND <cond> THEN DELETE; checked
      before the update clause, per SQL clause order.
    - ``not_matched_insert`` — WHEN NOT MATCHED AND <cond> THEN INSERT;
      ``insert_values`` maps target column -> SQL expr (default:
      ``s.<col>`` where shared, else typed NULL).
    """
    if not on:
        raise ValueError("merge_into needs at least one join key")
    for k in on:
        if k not in target.columns or k not in source.columns:
            raise ValueError(f"join key {k!r} must exist on both sides")

    t = target.withColumn("_t_exists", F.lit(True)).alias("t")
    s = source.withColumn("_s_exists", F.lit(True)).alias("s")
    cond = None
    for k in on:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else cond & c
    joined = t.join(s, cond, "full_outer")

    t_ex = F.coalesce(F.col("t._t_exists"), F.lit(False))
    s_ex = F.coalesce(F.col("s._s_exists"), F.lit(False))
    matched = t_ex & s_ex
    false = F.lit(False)
    del_c = matched & F.coalesce(F.expr(matched_delete), false) \
        if matched_delete is not None else false
    upd_c = (matched & ~del_c & F.coalesce(F.expr(matched_update), false)
             if matched_update is not None else false)
    ins_c = (~t_ex & s_ex & F.coalesce(F.expr(not_matched_insert), false)
             if not_matched_insert is not None else false)

    shared = set(source.columns)
    update_set = dict(update_set or {})
    insert_values = dict(insert_values or {})
    out = []
    for f in target.schema.fields:
        c = f.name
        if c in update_set:
            upd = F.expr(update_set[c])
        else:
            upd = F.col(f"s.{c}") if c in shared else F.col(f"t.{c}")
        if c in insert_values:
            ins = F.expr(insert_values[c])
        elif c in on or c in shared:
            ins = F.col(f"s.{c}")
        else:
            ins = F.lit(None).cast(f.dataType)
        out.append(F.when(upd_c, upd).when(ins_c, ins)
                    .otherwise(F.col(f"t.{c}")).alias(c))

    return joined.filter((t_ex & ~del_c) | ins_c).select(*out)
