"""Hot-key skew diagnostics + the app-level salting planner (SURVEY.md §4).

AQE's skew-join splitting covers the MERGE join, but window partitions
cannot be split at runtime — the salted two-stage LWW (cdc.dedup) needs an
explicit salt factor. This module measures the skew (O3 top-k, W4 deciles)
and picks that factor: the planner's rule of thumb is that no single
(key, salt) group should exceed ~``target_rows_per_task`` rows, bounded to
a power-of-two salt in [1, max_salt].
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_hot_keys(events: DataFrame, keys=("repo",), k: int = 20) -> DataFrame:
    """O3 — heaviest keys by event count (TakeOrderedAndProject: map-side
    partial top-k, no full sort)."""
    return (events.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), *keys).limit(k))


def exact_ntile(counts: DataFrame, k: int, value_col: str = "n",
                tiebreak_cols: Sequence[str] = ("user_id",),
                descending: bool = True) -> DataFrame:
    """Exact ``ntile(k) OVER (ORDER BY value DESC, tiebreaks)`` WITHOUT a
    single-partition global window.

    Distributed plan: (1) the frequency table of the (already reduced)
    value column is tiny — collect it and compute each value-group's global
    start rank on the driver; (2) rank ties WITHIN a value group with a
    window partitioned BY the value (bounded by the frequency of that
    value, never the whole frame); (3) global_rank = group_start + local
    rank, bucket via the exact ntile arithmetic (first N%k buckets get one
    extra row). Output: input columns + ``ntile``.

    At 10^9 keys the old global ntile window is a one-task sort; this plan
    is two narrow shuffles (freq agg + per-value window) and a broadcast
    rank-offset lookup."""
    freq = sorted(
        ((r[0], r[1]) for r in
         counts.groupBy(value_col).agg(F.count(F.lit(1)).alias("c")).collect()),
        key=lambda t: t[0], reverse=descending)
    n_total = sum(c for _, c in freq)
    starts, acc = [], 1
    for v, c in freq:
        starts.append((v, acc))
        acc += c
    spark = counts.sparkSession
    off = spark.createDataFrame(starts, f"{value_col} {counts.schema[value_col].dataType.simpleString()}, _start long")
    w = Window.partitionBy(value_col).orderBy(
        *[F.asc(c) for c in tiebreak_cols])
    ranked = (counts.join(F.broadcast(off), value_col)
              .withColumn("_rank", F.col("_start") + F.row_number().over(w) - 1))
    q, r = divmod(n_total, k)
    big = r * (q + 1)  # ranks covered by the (q+1)-sized leading buckets
    if q == 0:
        bucket = F.col("_rank")  # k >= N: one row per bucket
    else:
        bucket = F.when(F.col("_rank") <= big,
                        F.ceil(F.col("_rank") / (q + 1))
                        ).otherwise(r + F.ceil((F.col("_rank") - big) / q))
    return ranked.withColumn("ntile", bucket.cast("int")).drop("_start", "_rank")


def key_deciles(events: DataFrame, keys=("repo",)) -> DataFrame:
    """W4 — decile profile of the key-frequency distribution (exact ntile
    semantics via the distributed ``exact_ntile``, no global window)."""
    counts = events.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    d = exact_ntile(counts, 10, value_col="n", tiebreak_cols=keys) \
        .withColumnRenamed("ntile", "decile")
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("n").alias("n_events"),
        F.max("n").alias("max_key_events"))


def skew_stats(events: DataFrame, keys=("repo", "path")) -> dict:
    """One-pass skew summary used by the planner (single narrow agg)."""
    counts = events.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    row = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_key"),
        F.expr("percentile_approx(n, 0.999)").alias("p999"),
    ).collect()[0]
    return {"n_keys": row["n_keys"] or 0, "n_events": row["n_events"] or 0,
            "max_key": row["max_key"] or 0, "p999": row["p999"] or 0}


def choose_salt(stats: dict, target_rows_per_task: int = 100_000,
                max_salt: int = 256) -> int:
    """Planner: smallest power-of-two salt so the hottest key's per-salt
    share fits a task budget. salt=1 means 'no salting needed' — the
    common case; hot-key streams (the GLAD/Fire analog) get 2..max_salt."""
    hot = int(stats.get("max_key") or 0)
    s = 1
    while hot / s > target_rows_per_task and s < max_salt:
        s *= 2
    return s


def plan_lww(events: DataFrame, keys=("repo", "path"),
             target_rows_per_task: int = 100_000,
             broadcast_keys_max: int = 4_000_000) -> tuple[str, int]:
    """Decide the LWW strategy for a batch.

    ('semi', 1)   — when the winner-key set fits a broadcast (~keys x 50 B;
                    default cap 4M keys ~ 200 MB): winners are found over a
                    NARROW (keys+order) shuffle and broadcast back as a
                    left-semi filter, so the wide content column never
                    shuffles. This is the default-replay path — commit
                    chunking (batches_per_commit) bounds the key set.
    ('salted', S) — hot keys beyond the per-task budget AND too many keys
                    to broadcast: two-stage salted window ranking.
    ('maxby', 1)  — the skew-robust fallback (map-side partial agg).

    One narrow agg job over the key columns; parquet column pruning keeps
    the wide payload unread."""
    stats = skew_stats(events, keys)
    if 0 < stats["n_keys"] <= broadcast_keys_max:
        return ("semi", 1)
    s = choose_salt(stats, target_rows_per_task)
    return ("maxby", 1) if s == 1 else ("salted", s)
