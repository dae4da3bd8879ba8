"""V1/V2 pandas-UDF parity + the full CDC replay pipeline (rows-only).

``v1_normalize_sha`` proves the Arrow-vectorized normalization UDF and the
DuckDB SQL formulation share byte-exact semantics — the load-bearing check
for the sha256 invariant (the invariant is computed over *normalized*
content).

``cdc_replay_full`` runs the actual engine end-to-end (generate seeded
log -> transactional replay -> snapshot read). Not SQL-expressible (it
writes a table, commits snapshots, resumes), so no oracle — the pytest
suite checks it against the pure-pandas reducer instead.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pandas as pd  # module-global: pandas-UDF type hints resolve against it
from pyspark.sql import functions as F

from cdc.parity.common import load
from cdc.schema.normalize import normalize_content, normalize_content_iter, normalize_sql

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _scratch(name: str) -> str:
    """Collision-free scratch dir (unique per invocation, so concurrent
    harness/bench runs never rmtree each other's live tables), garbage-
    collected by AGE: siblings older than an hour go, bounding /tmp growth
    while the returned LAZY scans of the newest run stay readable."""
    parent = os.path.join(tempfile.gettempdir(), name)
    os.makedirs(parent, exist_ok=True)
    now = time.time()
    for d in os.listdir(parent):
        full = os.path.join(parent, d)
        try:
            if now - os.path.getmtime(full) > 3600:
                shutil.rmtree(full, ignore_errors=True)
        except OSError:
            pass
    return tempfile.mkdtemp(dir=parent)


_DIRTY = "text || '  ' || chr(13) || chr(10) || 'tail line' || chr(9) || chr(13) || ' end  '"

@q("v1_normalize_sha", f"""
WITH dirty AS (SELECT doc_id, {_DIRTY} AS content FROM documents)
SELECT doc_id,
       {normalize_sql('content')} AS normalized,
       sha256({normalize_sql('content')}) AS norm_sha256
FROM dirty
""")
def v1_normalize_sha(spark, sf_dir):
    """V1 — scalar pandas UDF normalization (CRLF/CR -> LF, trailing
    whitespace stripped) + sha256 of the normalized content."""
    d = load(spark, sf_dir, "documents")
    dirty = F.concat(F.col("text"), F.lit("  \r\ntail line\t\r end  "))
    return (d.withColumn("content", dirty)
            .withColumn("normalized", normalize_content(F.col("content")))
            .select("doc_id", "normalized",
                    F.sha2("normalized", 256).alias("norm_sha256")))


@q("v2_normalize_iter", f"""
WITH dirty AS (SELECT doc_id, {_DIRTY} AS content FROM documents)
SELECT doc_id, sha256({normalize_sql('content')}) AS norm_sha256
FROM dirty
""")
def v2_normalize_iter(spark, sf_dir):
    """V2 — iterator-form pandas UDF (per-worker init amortized across
    Arrow batches); must equal the scalar form byte-for-byte."""
    d = load(spark, sf_dir, "documents")
    dirty = F.concat(F.col("text"), F.lit("  \r\ntail line\t\r end  "))
    return (d.withColumn("content", dirty)
            .withColumn("normalized", normalize_content_iter(F.col("content")))
            .select("doc_id", F.sha2("normalized", 256).alias("norm_sha256")))


_V3_EV_SQL = """
SELECT user_id, event_id AS lsn, CAST(event_id / 1000 AS BIGINT) AS batch_id,
       repeat(event_type, CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 + 1 AS INT)) AS content
FROM events
"""


def _v3_events(spark, sf_dir):
    from cdc.parity.common import load
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "user_id", F.col("event_id").alias("lsn"),
        (F.col("event_id") / 1000).cast("long").alias("batch_id"),
        F.repeat(F.col("event_type"), (k % 4 + 1).cast("int")).alias("content"))


@q("v3_policy_lww", f"""
WITH ev AS ({_V3_EV_SQL}),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY lsn DESC, batch_id DESC) AS rn FROM ev)
SELECT user_id, lsn, content FROM r WHERE rn = 1
""")
def v3_policy_lww(spark, sf_dir):
    """V3 — grouped-map applyInPandas conflict policy: the 'lww' policy
    must reproduce the engine's column-algebra LWW bit-for-bit."""
    from cdc.policies import resolve_with_policy
    out = resolve_with_policy(_v3_events(spark, sf_dir), "lww", keys=("user_id",))
    return out.select("user_id", "lsn", "content")


@q("v3_policy_longest", f"""
WITH ev AS ({_V3_EV_SQL}),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY length(content) DESC, lsn DESC) AS rn FROM ev)
SELECT user_id, lsn, content FROM r WHERE rn = 1
""")
def v3_policy_longest(spark, sf_dir):
    """V3 — a content-aware custom policy (longest content wins, ties to
    highest lsn): semantics column expressions can't express cleanly."""
    from cdc.policies import resolve_with_policy
    out = resolve_with_policy(_v3_events(spark, sf_dir), "longest_content",
                              keys=("user_id",))
    return out.select("user_id", "lsn", "content")


@q("v4_grouped_agg_udf", """
SELECT event_type,
       round(sum(value * event_id) / sum(event_id), 6) AS lsn_weighted_value
FROM events GROUP BY event_type
""")
def v4_grouped_agg_udf(spark, sf_dir):
    """V4 — grouped-aggregate pandas UDF: a custom reducer (LSN-weighted
    mean) running as an Arrow-batched aggregate."""
    from cdc.parity.common import load

    @F.pandas_udf("double")
    def wavg(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    ev = load(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.round(wavg(F.col("value"), F.col("event_id")), 6)
                 .alias("lsn_weighted_value")))


@q("f9_misc_lineage")  # nondeterministic physical identifiers -> rows-only
def f9_misc_lineage(spark, sf_dir):
    """F9 — physical lineage functions (input_file_name,
    spark_partition_id): per-source-file row counts. Values depend on the
    physical file layout, so the driver records a rows-only check."""
    from cdc.parity.common import load
    ev = load(spark, sf_dir, "events")
    return (ev.select(F.input_file_name().alias("file"),
                      F.spark_partition_id().alias("pid"))
            .groupBy("file").agg(F.count(F.lit(1)).alias("n"),
                                 F.countDistinct("pid").alias("n_partitions")))


@q("cdc_replay_full")  # full engine path: not SQL-expressible -> rows-only
def cdc_replay_full(spark, sf_dir):
    """The flagship: seeded change-event log -> exact dedup -> pandas-UDF
    normalization -> salted LWW -> transactional MERGE commits (2 commit
    groups, exercising resume bookkeeping) -> snapshot read of final state.

    Scale knob: event volume follows the sf directory (sf0.01 ~ 20k
    events). Correctness vs the pure-pandas oracle is asserted in
    tests/test_core_replay.py; the driver records a rows-only check here.
    """
    from cdc.pipeline import replay
    from cdc.table.table import CdcTable
    from cdc.testing.gen import gen_change_events, write_change_log

    sf = os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf")
    try:
        n_keys = max(100, int(100_000 * float(sf) / 2))
    except ValueError:
        n_keys = 500
    # unique scratch dir, left in place (the returned DataFrame is a LAZY
    # scan of the committed table — no full-state collect to the driver);
    # age-based GC bounds accumulation across runs.
    work = _scratch("cdc_replay_q")
    log_dir = os.path.join(work, "log")
    ev = gen_change_events(spark, n_keys=n_keys, mean_events_per_key=8, seed=7)
    write_change_log(ev, log_dir, events_per_file=20_000)
    table = CdcTable(os.path.join(work, "table"), n_partitions=8)
    replay(spark, log_dir, table, batches_per_commit=None, metrics=False)
    return table.read(spark).select("repo", "path", "_lsn", "_content_sha256")


@q("lookup_point_reads", """
WITH ev AS (
  SELECT user_id,
         event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         concat(event_type, ':', CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)) AS content
  FROM events
),
state AS (
  SELECT user_id, content FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1 AND op <> 'D'
)
SELECT user_id, content FROM state WHERE user_id BETWEEN 1 AND 40
""")
def lookup_point_reads(spark, sf_dir):
    """Index-free point reads (CdcTable.lookup_keys): the events log lands
    as one commit into a key_hash table; a 40-key probe reads ONLY the
    partitions the key-hash maps those keys to (manifest pruning bounded
    by P, never by table size) and parquet skips row groups via the
    sorted-key stats + per-key bloom filters. Oracle = plain WHERE over
    the recomputed LWW state."""
    from cdc.pipeline import apply_batch
    from cdc.table.table import CdcTable

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.lit("state").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.concat(F.col("event_type"), F.lit(":"),
                 F.col("value").cast("decimal(18,2)").cast("string")).alias("content"),
        (F.col("event_id") / 1000).cast("long").alias("batch_id"))
    work = _scratch("cdc_lookup_q")
    table = CdcTable(work, n_partitions=16, layout="key_hash")
    apply_batch(spark, table, ev, "b0", normalize=False, metrics=False)
    probes = spark.range(1, 41).select(
        F.col("id").cast("string").alias("repo"), F.lit("state").alias("path"))
    got = table.lookup_keys(spark, probes)
    return got.select(F.col("repo").cast("long").alias("user_id"), "content")


@q("cdf_snapshot_diff", """
WITH ev AS (
  SELECT user_id,
         event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         concat(event_type, ':', CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)) AS content
  FROM events
),
s1 AS (
  SELECT user_id, content, op FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
    FROM ev WHERE lsn < 5000) WHERE rn = 1 AND op <> 'D'
),
s2 AS (
  SELECT user_id, content, op FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rn
    FROM ev) WHERE rn = 1 AND op <> 'D'
)
SELECT coalesce(s2.user_id, s1.user_id) AS user_id,
       s2.content AS content,
       CASE WHEN s1.user_id IS NULL THEN 'insert'
            WHEN s2.user_id IS NULL THEN 'delete'
            WHEN s1.content <> s2.content THEN 'update' END AS _change_type
FROM s2 FULL OUTER JOIN s1 USING (user_id)
WHERE (s1.user_id IS NULL) OR (s2.user_id IS NULL) OR (s1.content <> s2.content)
""")
def cdf_snapshot_diff(spark, sf_dir):
    """Change-data-feed read over REAL committed snapshots: the events log
    is applied as two transactional batches (lsn < 5000, rest) into a
    scratch table, and ``change_feed`` classifies every key's transition
    between the two snapshots (insert / update / delete) — one full-outer
    join of two manifest-pruned snapshot reads, no log access."""
    from cdc.pipeline import apply_batch
    from cdc.table.table import CdcTable
    from cdc.table.timetravel import change_feed

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("repo"),
        F.lit("state").alias("path"),
        F.col("event_id").alias("lsn"),
        "ts",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.concat(F.col("event_type"), F.lit(":"),
                 F.col("value").cast("decimal(18,2)").cast("string")).alias("content"),
        (F.col("event_id") / 1000).cast("long").alias("batch_id"))

    work = _scratch("cdc_cdf_q")
    table = CdcTable(work, n_partitions=8, layout="key_hash")
    apply_batch(spark, table, ev.filter(F.col("lsn") < 5000), "b1",
                normalize=False, metrics=False)
    apply_batch(spark, table, ev.filter(F.col("lsn") >= 5000), "b2",
                normalize=False, metrics=False)
    # at tiny sf the whole log sits below the cutoff: batch 2 is empty and
    # (correctly) commits nothing, so diff snapshot 1 against CURRENT —
    # same snapshot then, and the oracle's s1==s2 diff is empty too.
    cf = change_feed(spark, table, 1, table.current_snapshot()["snapshot_id"])
    return cf.select(F.col("repo").cast("long").alias("user_id"),
                     "content", "_change_type")
