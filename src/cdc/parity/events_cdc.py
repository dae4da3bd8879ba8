"""CDC-core operators exercised over the driver's ``events`` table.

The CDC mapping used throughout this module (documented once here):

    lsn      := event_id          (unique, monotone log sequence number)
    key      := user_id           (the (repo, path) analog)
    op       := 'D' if event_type = 'error' else 'U'   (deterministic)
    batch_id := event_id // 1000  (producer batch)

Every query is the engine operator itself (same code path as the replay
pipeline where possible) re-keyed to this table, so the DuckDB oracle
verifies operator semantics, not a bespoke demo.

SURVEY.md §2.B rows covered here: W1 (window + salted forms), A4, A2, J1,
J2, J3, J4, J5, J6, J7, A1, A3, A5, A6, A7, A8, O1, O3, U1, U2, U3, W2,
W3, W4, W5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc.dedup import dedupe_exact, last_writer_wins
from cdc.merge import empty_state, merge_apply
from cdc.parity.common import load

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


_LWW_ORACLE = """
SELECT user_id, event_id AS lsn, event_type, round(value, 4) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


def _lww(spark, sf_dir, via: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = last_writer_wins(ev, keys=("user_id",), order=("event_id",), via=via)
    return out.select(
        "user_id", F.col("event_id").alias("lsn"), "event_type",
        F.round("value", 4).alias("value"))


@q("w1_lww_window", _LWW_ORACLE)
def w1_lww_window(spark, sf_dir):
    """W1 — per-key last-writer-wins via row_number window ranking
    (the spec's semantic definition of dedup+order)."""
    return _lww(spark, sf_dir, via="window")


@q("w1_lww_salted", _LWW_ORACLE)
def w1_lww_salted(spark, sf_dir):
    """W1 (salted) — two-stage skew-robust ranking; must equal the plain
    window form bit-for-bit."""
    return _lww(spark, sf_dir, via="salted")


@q("a4_lww_maxby", _LWW_ORACLE)
def a4_lww_maxby(spark, sf_dir):
    """A4 — max_by aggregate form of LWW (map-side partial agg; the
    skew-robust default in the replay pipeline)."""
    return _lww(spark, sf_dir, via="maxby")


@q("w1_lww_semi", _LWW_ORACLE)
def w1_lww_semi(spark, sf_dir):
    """W1 (narrow-shuffle form) — winner keys found over (key, order)
    columns only, broadcast back as a left-semi filter so wide payload
    columns never shuffle. Must equal every other LWW form bit-for-bit."""
    return _lww(spark, sf_dir, via="semi")


@q("a2_dedup_exact", """
WITH delivered AS (
  SELECT * FROM events
  UNION ALL
  SELECT * FROM events WHERE event_id % 7 = 0
),
deduped AS (SELECT DISTINCT * FROM delivered)
SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
FROM deduped GROUP BY event_type
""")
def a2_dedup_exact(spark, sf_dir):
    """A2 — exact dedup of an at-least-once delivery (1/7th of the log
    re-delivered verbatim); dropDuplicates on the lsn collapses it."""
    ev = _events(spark, sf_dir)
    delivered = ev.unionAll(ev.filter(F.col("event_id") % 7 == 0))
    deduped = dedupe_exact(delivered, cols=["event_id"])
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


@q("j1_merge_full_outer", """
WITH last AS (
  SELECT user_id,
         arg_max(event_type, event_id) AS et,
         arg_max(value, event_id) AS v,
         max(event_id) AS lsn
  FROM events GROUP BY user_id
)
SELECT user_id,
       concat(et, ':', CAST(CAST(v AS DECIMAL(18,2)) AS VARCHAR)) AS content,
       lsn AS _lsn,
       sha256(concat(et, ':', CAST(CAST(v AS DECIMAL(18,2)) AS VARCHAR))) AS _content_sha256
FROM last WHERE et <> 'error'
""")
def j1_merge_full_outer(spark, sf_dir):
    """J1 — the engine's MERGE apply (full-outer resolve, LSN-monotonicity
    guard, delete semantics) run as two consecutive batches; events with
    event_type='error' are the delete ops."""
    ev = _events(spark, sf_dir).select(
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("user_id"),
        # DECIMAL(18,2) cast on BOTH sides: Java format_string rounds
        # HALF_UP while C printf rounds half-to-even, so a midpoint value
        # (0.125) would diverge data-dependently; decimal casts round
        # half-away-from-zero and render "x.yz" identically on both engines.
        F.concat(F.col("event_type"), F.lit(":"),
                 F.col("value").cast("decimal(18,2)").cast("string")).alias("content"),
        (F.col("event_id") / 1000).cast("long").alias("batch_id"),
    )
    b1 = last_writer_wins(ev.filter(F.col("lsn") < 5000),
                          keys=("user_id",), order=("lsn",), via="maxby")
    b2 = last_writer_wins(ev.filter(F.col("lsn") >= 5000),
                          keys=("user_id",), order=("lsn",), via="maxby")
    state = empty_state(spark, b1, keys=("user_id",))
    state = merge_apply(state, b1, keys=("user_id",))
    state = merge_apply(state, b2, keys=("user_id",))
    return (state.filter(~F.col("_deleted"))
            .select("user_id", "content", "_lsn", "_content_sha256"))


@q("j2_broadcast_lookup", """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       round(sum(e.value), 4) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""")
def j2_broadcast_lookup(spark, sf_dir):
    """J2 — broadcast equi-join against a small dimension (the
    schema-registry / enrichment-dim pattern)."""
    ev = _events(spark, sf_dir)
    cust = load(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("n_users"),
             F.round(F.sum("value"), 4).alias("sum_value")))


@q("j3_left_anti", """
SELECT c_custkey FROM customer
WHERE c_custkey < 500
  AND c_custkey NOT IN (SELECT user_id FROM events)
""")
def j3_left_anti(spark, sf_dir):
    """J3 — left anti join: dimension keys never touched by the log
    (affected-key extraction in the merge planner)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    ev = _events(spark, sf_dir).select(F.col("user_id").alias("c_custkey"))
    return cust.join(ev, "c_custkey", "left_anti").select("c_custkey")


@q("j4_left_semi", """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT user_id FROM events)
""")
def j4_left_semi(spark, sf_dir):
    """J4 — left semi join: touched-partition/touched-key detection."""
    cust = load(spark, sf_dir, "customer")
    ev = _events(spark, sf_dir).select(F.col("user_id").alias("c_custkey"))
    return cust.join(ev, "c_custkey", "left_semi").select("c_custkey", "c_name")


@q("j5_asof_state", """
SELECT user_id, event_id AS lsn, event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events WHERE event_id <= 5000)
WHERE rn = 1 AND event_type <> 'error'
""")
def j5_asof_state(spark, sf_dir):
    """J5 — as-of join / time travel: live state of every key as of
    lsn=5000 (deleted keys excluded)."""
    ev = _events(spark, sf_dir).filter(F.col("event_id") <= 5000)
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
            .select("user_id", F.col("event_id").alias("lsn"), "event_type"))


@q("j6_range_join", """
WITH iv AS (
  SELECT user_id, event_id AS lsn_lo,
         coalesce(lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id),
                  9223372036854775807) AS lsn_hi
  FROM events
),
probes AS (SELECT 1000 * g AS probe FROM generate_series(1, 9) t(g))
SELECT p.probe, iv.user_id, iv.lsn_lo AS active_lsn
FROM probes p JOIN iv ON iv.lsn_lo <= p.probe AND p.probe < iv.lsn_hi
""")
def j6_range_join(spark, sf_dir):
    """J6 — range/interval join: per-key version-validity intervals
    [lsn, next_lsn) probed at fixed LSNs (snapshot-validity semantics;
    broadcast-nested-loop physical plan with the small probe side)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    iv = ev.select(
        "user_id", F.col("event_id").alias("lsn_lo"),
        F.coalesce(F.lead("event_id").over(w),
                   F.lit(2**63 - 1)).alias("lsn_hi"))
    probes = spark.range(1, 10).select((F.col("id") * 1000).alias("probe"))
    return (F.broadcast(probes)
            .join(iv, (iv.lsn_lo <= F.col("probe")) & (F.col("probe") < iv.lsn_hi))
            .select("probe", "user_id", F.col("lsn_lo").alias("active_lsn")))


@q("j7_self_join_batches", """
WITH b1 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n1 FROM events WHERE event_id < 5000 GROUP BY user_id),
     b2 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n2 FROM events WHERE event_id >= 5000 GROUP BY user_id)
SELECT b1.user_id, b1.n1, b2.n2 FROM b1 JOIN b2 USING (user_id)
""")
def j7_self_join_batches(spark, sf_dir):
    """J7 — cross-batch conflict audit: keys written by two consecutive
    batches."""
    ev = _events(spark, sf_dir)
    b1 = (ev.filter(F.col("event_id") < 5000).groupBy("user_id")
          .agg(F.count(F.lit(1)).alias("n1")))
    b2 = (ev.filter(F.col("event_id") >= 5000).groupBy("user_id")
          .agg(F.count(F.lit(1)).alias("n2")))
    return b1.join(b2, "user_id", "inner").select("user_id", "n1", "n2")


@q("a1_lineage_metrics", """
SELECT user_id % 8 AS part,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_del,
       CAST(min(event_id) AS BIGINT) AS lsn_low,
       CAST(max(event_id) AS BIGINT) AS lsn_high,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY user_id % 8
""")
def a1_lineage_metrics(spark, sf_dir):
    """A1 — per-partition lineage metrics (hash agg, map-side partials):
    op mix, lsn bounds, per-partition totals."""
    ev = _events(spark, sf_dir).withColumn("part", F.col("user_id") % 8)
    return ev.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_del"),
        F.min("event_id").alias("lsn_low"),
        F.max("event_id").alias("lsn_high"),
        F.round(F.sum("value"), 4).alias("sum_value"))


@q("a3_approx_distinct", """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       true AS hll_within_15pct
FROM events GROUP BY event_type
""")
def a3_approx_distinct(spark, sf_dir):
    """A3 — approx_count_distinct (HyperLogLog++): cheap cardinality for
    metrics. The sketch estimate itself can't hash-match another engine,
    so the query carries its own TOLERANCE oracle: the exact per-group
    distinct (hash-compared against DuckDB) plus a boolean asserting the
    HLL estimate landed within ±15% = 3x the default rsd (0.05 is ONE
    relative standard deviation — a 5% band would fail ~1 group in 3 on
    arbitrary data; 3 sigma holds for any fixture regeneration). The
    estimate is deterministic for fixed data; the oracle expects TRUE for
    every group."""
    ev = _events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx"),
        F.countDistinct("user_id").cast("long").alias("exact_users"))
    return agg.select(
        "event_type", "exact_users",
        (F.abs(F.col("approx") - F.col("exact_users"))
         <= 0.15 * F.col("exact_users")).alias("hll_within_15pct"))


@q("a5_rollup", """
SELECT event_type,
       CAST(GROUPING(event_type) AS BIGINT) AS gflag,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY ROLLUP(event_type)
""")
def a5_rollup(spark, sf_dir):
    """A5 — rollup + grouping flag (metrics rollups)."""
    ev = _events(spark, sf_dir)
    return ev.rollup("event_type").agg(
        F.grouping("event_type").cast("long").alias("gflag"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"))


@q("a6_collect_sorted", """
SELECT user_id, string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
FROM events GROUP BY user_id
""")
def a6_collect_sorted(spark, sf_dir):
    """A6 — collect_set lineage arrays (rendered as a sorted CSV string so
    the value-hash compare is order-stable)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types"))


@q("a7_pivot", """
SELECT user_id % 10 AS bucket,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY user_id % 10
""")
def a7_pivot(spark, sf_dir):
    """A7 — pivot: ops matrix per bucket."""
    ev = _events(spark, sf_dir).withColumn("bucket", F.col("user_id") % 10)
    piv = (ev.groupBy("bucket")
           .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
           .count())
    out = [F.col("bucket")]
    for c in ("click", "view", "purchase", "signup", "error"):
        out.append(F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}"))
    return piv.select(*out)


@q("a8_distinct", """
SELECT DISTINCT event_type, CAST(floor(value / 10) AS BIGINT) AS vb FROM events
""")
def a8_distinct(spark, sf_dir):
    """A8 — global distinct."""
    ev = _events(spark, sf_dir)
    return ev.select("event_type",
                     F.floor(F.col("value") / 10).alias("vb")).distinct()


@q("o1_sort_limit", """
SELECT event_id, user_id, event_type FROM events
ORDER BY ts DESC, event_id LIMIT 100
""")
def o1_sort_limit(spark, sf_dir):
    """O1 — global sort + limit (TakeOrderedAndProject; unique tiebreak on
    event_id keeps the limit deterministic)."""
    ev = _events(spark, sf_dir)
    return (ev.orderBy(F.desc("ts"), F.asc("event_id"))
            .limit(100).select("event_id", "user_id", "event_type"))


@q("o3_topk_hot", """
SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events
GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
""")
def o3_topk_hot(spark, sf_dir):
    """O3 — top-k hot keys (feeds the salting planner)."""
    ev = _events(spark, sf_dir)
    return (ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("user_id")).limit(10))


@q("u1_union_by_name", """
WITH a AS (SELECT user_id, event_type, value FROM events WHERE event_id < 5000),
     b AS (SELECT user_id, event_type FROM events WHERE event_id >= 5000),
     u AS (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(value) AS BIGINT) AS n_with_value
FROM u GROUP BY event_type
""")
def u1_union_by_name(spark, sf_dir):
    """U1 — unionByName(allowMissingColumns): merging batches written under
    different schema versions (missing column -> typed null)."""
    ev = _events(spark, sf_dir)
    a = ev.filter(F.col("event_id") < 5000).select("user_id", "event_type", "value")
    b = ev.filter(F.col("event_id") >= 5000).select("user_id", "event_type")
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.count("value").alias("n_with_value"))


@q("u2_except", """
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
""")
def u2_except(spark, sf_dir):
    """U2 — except: parity-diff tooling (buyers who never errored)."""
    ev = _events(spark, sf_dir)
    a = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    b = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return a.subtract(b)


@q("u3_intersect", """
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
""")
def u3_intersect(spark, sf_dir):
    """U3 — intersect: common-key audit."""
    ev = _events(spark, sf_dir)
    a = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    b = ev.filter(F.col("event_type") == "signup").select("user_id").distinct()
    return a.intersect(b)


@q("w2_lag_transitions", """
WITH t AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
FROM t WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
""")
def w2_lag_transitions(spark, sf_dir):
    """W2 — lag/lead: consecutive-version transition stats (the
    schema-version transition detector's shape)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    t = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return (t.filter(F.col("prev_type").isNotNull())
            .groupBy("prev_type", "event_type")
            .agg(F.count(F.lit(1)).alias("n")))


@q("w3_running_sum", """
SELECT user_id, event_id AS lsn,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running
FROM events
""")
def w3_running_sum(spark, sf_dir):
    """W3 — running aggregate: cumulative applied value per key."""
    ev = _events(spark, sf_dir)
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select("user_id", F.col("event_id").alias("lsn"),
                     F.round(F.sum("value").over(w), 4).alias("running"))


@q("w4_ntile_deciles", """
WITH totals AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n, sum(value) AS sv
  FROM events GROUP BY user_id
),
d AS (SELECT *, ntile(10) OVER (ORDER BY n DESC, user_id) AS decile FROM totals)
SELECT decile, CAST(count(*) AS BIGINT) AS n_users, CAST(sum(n) AS BIGINT) AS n_events,
       round(sum(sv), 4) AS sum_value
FROM d GROUP BY decile
""")
def w4_ntile_deciles(spark, sf_dir):
    """W4 — ntile: hot-key decile diagnostics (skew planner input).

    Runs the DISTRIBUTED exact-ntile (cdc.skew.exact_ntile: per-value-group
    windows + broadcast rank offsets) — bit-identical to the oracle's
    global ``ntile(10) OVER (ORDER BY n DESC, user_id)`` without the
    single-partition window sort."""
    from cdc.skew import exact_ntile
    ev = _events(spark, sf_dir)
    totals = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    d = exact_ntile(totals, 10, value_col="n", tiebreak_cols=("user_id",)) \
        .withColumnRenamed("ntile", "decile")
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("n").alias("n_events"),
        F.round(F.sum("sv"), 4).alias("sum_value"))


@q("w5_range_frame", """
SELECT user_id, event_id AS lsn,
       round(sum(value) OVER (PARTITION BY user_id
                              ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                              RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 4) AS win_sum
FROM events
""")
def w5_range_frame(spark, sf_dir):
    """W5 — range frame over event time: 10-minute trailing per-key sums
    (the batch analog of a sliding-window metric)."""
    ev = _events(spark, sf_dir).withColumn("sec", F.unix_timestamp("ts"))
    w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-600, 0)
    return ev.select("user_id", F.col("event_id").alias("lsn"),
                     F.round(F.sum("value").over(w), 4).alias("win_sum"))


@q("j8_merge_into_clauses", """
WITH ev AS (SELECT user_id, event_type, value, event_id AS lsn FROM events),
t AS (SELECT user_id, event_type, value, lsn, 'old' AS tag FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY lsn DESC) AS rn
      FROM ev WHERE lsn < 5000) WHERE rn = 1),
s AS (SELECT user_id, event_type, value, lsn FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY lsn DESC) AS rn
      FROM ev WHERE lsn >= 5000) WHERE rn = 1),
j AS (SELECT t.user_id AS t_uid, t.event_type AS t_et, t.value AS t_v,
             t.lsn AS t_lsn, t.tag AS t_tag,
             s.user_id AS s_uid, s.event_type AS s_et, s.value AS s_v,
             s.lsn AS s_lsn
      FROM t FULL OUTER JOIN s ON t.user_id = s.user_id),
f AS (SELECT *,
        (t_uid IS NOT NULL AND s_uid IS NOT NULL
         AND s_et = 'error') AS d_c,
        (t_uid IS NOT NULL AND s_uid IS NOT NULL AND s_et <> 'error'
         AND COALESCE(s_v > t_v, FALSE)) AS u_c,
        (t_uid IS NULL AND s_uid IS NOT NULL AND s_et <> 'error') AS i_c
      FROM j)
SELECT COALESCE(t_uid, s_uid) AS user_id,
       CASE WHEN u_c OR i_c THEN s_et ELSE t_et END AS event_type,
       CASE WHEN u_c OR i_c THEN s_v ELSE t_v END AS value,
       CASE WHEN u_c OR i_c THEN s_lsn ELSE t_lsn END AS lsn,
       CASE WHEN u_c THEN 'updated' WHEN i_c THEN 'inserted'
            ELSE t_tag END AS tag
FROM f WHERE (t_uid IS NOT NULL AND NOT d_c) OR i_c
""")
def j8_merge_into_clauses(spark, sf_dir):
    """J8 — generic conditional MERGE INTO (cdc/merge_into.py): target =
    per-user LWW state of the log's first half, source = LWW of the second
    half; WHEN MATCHED AND s is an error THEN DELETE, WHEN MATCHED AND the
    source value is larger THEN UPDATE (SET lsn=s.lsn, tag='updated',
    other shared columns defaulting to the source), WHEN NOT MATCHED AND
    not an error THEN INSERT (tag='inserted'). The oracle replays the same
    clause ladder as a FULL OUTER JOIN CASE pipeline (this DuckDB has no
    MERGE statement). Clause order (delete before update) and
    NULL-condition-is-false semantics are both exercised."""
    from cdc.merge_into import merge_into

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "value", F.col("event_id").alias("lsn"))
    w = Window.partitionBy("user_id").orderBy(F.col("lsn").desc())
    lww = lambda df: (df.withColumn("rn", F.row_number().over(w))
                        .filter(F.col("rn") == 1).drop("rn"))
    t = lww(ev.filter(F.col("lsn") < 5000)).withColumn("tag", F.lit("old"))
    s = lww(ev.filter(F.col("lsn") >= 5000))
    return merge_into(
        t, s, on=("user_id",),
        matched_delete="s.event_type = 'error'",
        matched_update="s.value > t.value",
        update_set={"lsn": "s.lsn", "tag": "'updated'"},
        not_matched_insert="s.event_type <> 'error'",
        insert_values={"tag": "'inserted'"})


@q("s10_debezium_decode", """
SELECT user_id, event_type, value, props,
       CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
       event_id AS lsn,
       make_timestamp(epoch_ms(ts) * 1000) AS ts
FROM events
""")
def s10_debezium_decode(spark, sf_dir):
    """S10 — Debezium envelope decode (cdc/io/debezium.py): the events log
    is rendered into Debezium JSON envelopes (delete rows as op='d' with a
    BEFORE image only; upserts alternating 'c'/'u'/'r' with an AFTER
    image) and decoded back via one from_json projection. The oracle
    states the decoder's contract directly over the raw table: image
    column recovery (exact double/JSON-string round-trip), op collapsing
    to U/D, lsn from the source block, millisecond-truncated ts."""
    from cdc.io.debezium import from_debezium

    ev = _events(spark, sf_dir)
    image = F.struct("user_id", "event_type", "value", "props")
    is_del = F.col("event_type") == "error"
    op = (F.when(is_del, "d")
           .when(F.col("event_id") % 7 == 0, "r")
           .when(F.col("event_id") % 2 == 0, "c")
           .otherwise("u"))
    payload = F.struct(
        F.when(is_del, image).alias("before"),
        F.when(~is_del, image).alias("after"),
        op.alias("op"),
        # events.ts is TIMESTAMP_NTZ; unix_millis wants TIMESTAMP (session
        # tz is UTC in the harness, so the instant is unchanged)
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.struct(F.col("event_id").alias("lsn")).alias("source"))
    enveloped = ev.select(
        F.to_json(F.struct(payload.alias("payload"))).alias("value"))
    return from_debezium(
        enveloped, "user_id bigint, event_type string, value double, "
                   "props string")


@q("a9_patch_column_lww", """
WITH patches AS (
  SELECT user_id, event_id AS lsn,
         CASE WHEN event_id % 3 = 0 THEN NULL
              ELSE CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) END AS val,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END AS etype
  FROM events)
SELECT user_id,
       arg_max(val, lsn) FILTER (WHERE val IS NOT NULL) AS val,
       arg_max(etype, lsn) FILTER (WHERE etype IS NOT NULL) AS etype,
       max(lsn) AS lsn
FROM patches GROUP BY user_id
""")
def a9_patch_column_lww(spark, sf_dir):
    """A9 — column-level LWW for partial-update feeds (cdc/patch.py): the
    events log is turned into a patch stream (each event NULLs a
    deterministic subset of columns = "not touched") and folded per key
    with per-column last-non-null-wins in ONE map-side-combinable
    aggregate. The oracle states the same fold as per-column
    arg_max FILTER (non-null) — row-level LWW would instead null every
    column the key's final event didn't carry."""
    from cdc.patch import column_lww

    ev = _events(spark, sf_dir).select(
        "user_id", F.col("event_id").alias("lsn"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("string"))
         .otherwise(F.col("value").cast("decimal(18,2)").cast("string"))
         .alias("val"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("string"))
         .otherwise(F.col("event_type")).alias("etype"))
    return column_lww(ev, keys=("user_id",), order="lsn",
                      value_cols=("val", "etype"))


@q("a10_patch_mor_lww", """
WITH patches AS (
  SELECT CAST(user_id AS VARCHAR) AS repo, event_id AS lsn,
         CASE WHEN event_id % 3 = 0 THEN NULL
              ELSE CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) END AS content,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END AS etype
  FROM events)
SELECT repo,
       arg_max(content, lsn) FILTER (WHERE content IS NOT NULL) AS content,
       arg_max(etype, lsn) FILTER (WHERE etype IS NOT NULL) AS etype,
       max(lsn) AS lsn
FROM patches GROUP BY repo
""")
def a10_patch_mor_lww(spark, sf_dir):
    """A10 — patch-image MERGE-ON-READ lifecycle (round 3): the patch
    stream lands as two ``apply_batch(image='patch', mode='mor')`` delta
    commits (O(batch) writes, no partition rewrite) and the table is read
    back UNCOMPACTED — the read-side per-column commit-order fold
    (cdc.patch.patch_reconcile) must reproduce the global per-column
    last-non-null fold the oracle states. The cross-batch split is by lsn,
    so sequential batch coalesce == one global fold."""
    from cdc.pipeline import apply_batch
    from cdc.table.table import CdcTable
    from cdc.parity.udf_q import _scratch

    ev = _events(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("repo"),
        F.lit("p").alias("path"),
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("string"))
         .otherwise(F.col("value").cast("decimal(18,2)").cast("string"))
         .alias("content"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("string"))
         .otherwise(F.col("event_type")).alias("etype"),
        F.lit("U").alias("op"), "ts", F.lit(0).alias("batch_id"))

    t = CdcTable(f"{_scratch('cdc_patch_mor_q')}/t", n_partitions=8,
                 layout="key_hash")
    apply_batch(spark, t, ev.filter(F.col("lsn") <= 500), "b0",
                normalize=False, metrics=False, image="patch", mode="mor")
    apply_batch(spark, t, ev.filter(F.col("lsn") > 500), "b1",
                normalize=False, metrics=False, image="patch", mode="mor")
    return t.read(spark).select("repo", "content", "etype",
                                F.col("_lsn").alias("lsn"))
