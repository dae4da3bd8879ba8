"""T2/T3/T4 windowed-metric parity — the batch forms of the streaming
window operators (cdc.stream.metrics) with DuckDB time-bucket oracles.

``F.window`` / ``F.session_window`` are plan-level operators, not
source-level: the SAME functions run on a stream (paired with a watermark)
and on a batch frame. These queries run them in batch over the driver's
``events`` table so the driver's oracle harness can hash-verify the window
semantics that the streaming pytest suite pins only batch-equivalently.

CDC mapping: ts := events.ts, lsn := event_id, key := event_type.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc.parity.common import load
from cdc.stream.metrics import session_bursts, sliding_counts, tumbling_counts

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _stream_shape(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.select("ts", F.col("event_id").alias("lsn"),
                     F.col("event_type").alias("repo"))


def _flat(win_df):
    """Project the window struct to plain timestamp columns (stable names
    for the order-insensitive value-hash compare)."""
    return win_df.select(
        F.col("win.start").alias("w_start"), F.col("win.end").alias("w_end"),
        F.col("repo").alias("key"),
        *[c for c in win_df.columns if c not in ("win", "repo")])


@q("t2_tumbling_window", """
SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS w_end,
       event_type AS key,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(event_id) AS BIGINT) AS lsn_high
FROM events GROUP BY 1, 2, 3
""")
def t2_tumbling_window(spark, sf_dir):
    """T2 — tumbling event-time window (1 h) per key: the live-throughput
    metric's batch form (same code path as the stream)."""
    return _flat(tumbling_counts(_stream_shape(spark, sf_dir), width="1 hour"))


@q("t3_sliding_window", """
WITH g AS (SELECT unnest(generate_series(0, 3)) AS k)
SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS w_start,
       time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
         + INTERVAL '1 hour' AS w_end,
       event_type AS key,
       CAST(count(*) AS BIGINT) AS n_events
FROM events CROSS JOIN g
GROUP BY 1, 2, 3
""")
def t3_sliding_window(spark, sf_dir):
    """T3 — sliding window (1 h wide, 15 min slide): every event lands in
    exactly width/slide = 4 overlapping windows; the oracle enumerates the
    same 4 starts per event with a generate_series cross join."""
    return _flat(sliding_counts(_stream_shape(spark, sf_dir),
                                width="1 hour", slide="15 minutes"))


@q("t4_session_window", """
WITH m AS (
  SELECT event_type, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT min(ts) AS w_start,
       max(ts) + INTERVAL '30 minutes' AS w_end,
       event_type AS key,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(event_id) AS BIGINT) AS lsn_low,
       CAST(max(event_id) AS BIGINT) AS lsn_high
FROM s GROUP BY event_type, sid
""")
def t4_session_window(spark, sf_dir):
    """T4 — session window (30 min gap) per key: burst detection. The
    oracle is the classic gaps-and-islands formulation (lag -> new-session
    flag -> running sum); Spark's session [start, last+gap) semantics match
    the >= gap split condition."""
    return _flat(session_bursts(_stream_shape(spark, sf_dir), gap="30 minutes"))
