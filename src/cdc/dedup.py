"""Per-key dedup + ordering + last-writer-wins — the heart of the engine.

SURVEY.md §2.B rows A2 (exact dedup), A4 (max_by agg form), W1 (window
ranking form, plus the two-stage *salted* form for hot-key skew).

Scale notes (100 TB thinking):
- ``dropDuplicates`` compiles to a hash aggregate with map-side partial
  aggregation — duplicate deliveries collapse locally before the shuffle.
- The agg form (``max_by``) is the skew-robust default: partial aggregation
  reduces a hot key's N events to 1 row *per map task* before shuffling, so
  a repo receiving 60% of traffic costs ~n_map_tasks rows post-shuffle, not
  N.
- The window form (``row_number over (partition by key order by lsn desc)``)
  is the spec's semantic definition, but a plain window sends ALL events of
  a hot key to one task. AQE cannot split a window partition, so the salted
  form does it manually: stage 1 ranks within (key, salt) buckets, stage 2
  ranks the <=S survivors per key (SURVEY.md §4 "skew handling").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY_COLS = ("repo", "path")
ORDER_COLS = ("lsn", "batch_id")


def dedupe_exact(df: DataFrame, cols: Sequence[str] = ("batch_id", "lsn")) -> DataFrame:
    """A2 — drop verbatim duplicate deliveries from at-least-once sources."""
    return df.dropDuplicates(list(cols))


def last_writer_wins(
    df: DataFrame,
    keys: Sequence[str] = KEY_COLS,
    order: Sequence[str] = ORDER_COLS,
    via: str = "maxby",
    salt_buckets: int = 32,
) -> DataFrame:
    """Collapse an event batch to one final row per key (highest ``order``).

    via='maxby'  — A4: groupBy(keys).agg(max_by(payload, order)); skew-robust.
    via='window' — W1: row_number ranking; the spec's semantic definition.
    via='salted' — W1 two-stage salted ranking for hot keys.
    via='semi'   — winner keys via a NARROW shuffle (keys+order only), then
                   broadcast back as a left-semi filter: the wide content
                   column never shuffles (~events-per-key x cheaper bytes).
                   Needs the winner set to fit a broadcast (~keys x 50B);
                   commit chunking (replay batches_per_commit) bounds it,
                   so the app planner picks this for bounded batches and
                   falls back to maxby for unbounded key spaces.

    Ties on ``lsn`` are broken by ``batch_id`` (SURVEY.md §7 hard-part #2);
    exact duplicates must be removed first (dedupe_exact) so the result is
    deterministic.
    """
    if via == "window":
        w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order])
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if via == "salted":
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in order]), F.lit(salt_buckets))
        df1 = df.withColumn("_salt", salt)
        w1 = Window.partitionBy(*keys, "_salt").orderBy(*[F.desc(c) for c in order])
        survivors = (
            df1.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_salt")
        )
        w2 = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order])
        return (
            survivors.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if via == "semi":
        ord_struct = F.struct(*[F.col(c) for c in order])
        winners = (df.select(*keys, *order)
                   .groupBy(*keys).agg(F.max(ord_struct).alias("_w"))
                   .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in order]))
        out = df.join(F.broadcast(winners), [*keys, *order], "left_semi")
        # verbatim duplicate deliveries of the winning event survive the
        # semi filter; they are identical rows, so any-one-per-key is exact
        return out.dropDuplicates(list(keys))
    if via == "maxby":
        payload = [c for c in df.columns if c not in keys]
        ord_struct = F.struct(*[F.col(c) for c in order])
        row = F.max_by(F.struct(*[F.col(c) for c in payload]), ord_struct).alias("_row")
        out = df.groupBy(*keys).agg(row)
        return out.select(*keys, *[F.col(f"_row.{c}").alias(c) for c in payload])
    raise ValueError(f"unknown via={via!r}")
