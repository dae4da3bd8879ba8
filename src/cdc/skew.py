"""Hot-key skew diagnostics + the app-level salting planner (SURVEY.md §4).

AQE's skew-join splitting covers the MERGE join, but window partitions
cannot be split at runtime — the salted two-stage LWW (cdc.dedup) needs an
explicit salt factor. This module measures the skew (O3 top-k, W4 deciles)
and picks that factor: the planner's rule of thumb is that no single
(key, salt) group should exceed ~``target_rows_per_task`` rows, bounded to
a power-of-two salt in [1, max_salt].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_hot_keys(events: DataFrame, keys=("repo",), k: int = 20) -> DataFrame:
    """O3 — heaviest keys by event count (TakeOrderedAndProject: map-side
    partial top-k, no full sort)."""
    return (events.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), *keys).limit(k))


def key_deciles(events: DataFrame, keys=("repo",)) -> DataFrame:
    """W4 — decile profile of the key-frequency distribution."""
    counts = events.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    d = counts.withColumn(
        "decile", F.ntile(10).over(Window.orderBy(F.desc("n"), *keys)))
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
