"""T2/T3/T4 — event-time windowed metrics.

Each function works on a streaming OR batch DataFrame (same code path:
``F.window``/``F.session_window`` are plan-level, not source-level). On a
stream, pair with ``withWatermark`` upstream so state is bounded and late
rows beyond the watermark are dropped from the aggregation (they are still
*applied* to the table by the merge path — LSN order wins over event time,
SURVEY.md §2.B T1)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "1 minute",
                    key: str = "repo") -> DataFrame:
    """T2 — live throughput: events per (window, key)."""
    return (events.groupBy(F.window("ts", width).alias("win"), key)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.max("lsn").alias("lsn_high")))


def sliding_counts(events: DataFrame, width: str = "5 minutes",
                   slide: str = "1 minute", key: str = "repo") -> DataFrame:
    """T3 — smoothed rate: overlapping windows."""
    return (events.groupBy(F.window("ts", width, slide).alias("win"), key)
            .agg(F.count(F.lit(1)).alias("n_events")))


def session_bursts(events: DataFrame, gap: str = "30 seconds",
                   key: str = "repo") -> DataFrame:
    """T4 — burst detection: session windows close after ``gap`` idle."""
    return (events.groupBy(F.session_window("ts", gap).alias("win"), key)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("lsn").alias("lsn_low"), F.max("lsn").alias("lsn_high")))
