"""Scalar-function family parity (SURVEY.md §2.B F1–F9).

Each query exercises one function family the engine uses (hashing for the
sha256 invariant and salting, string ops for path parsing, date/time for
metrics, conditionals for CDC op resolution, arrays/maps/json for payloads).
All stay inside whole-stage codegen — no UDFs here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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


@q("f1_sha256_invariant", """
SELECT doc_id, sha256(text) AS content_sha256,
       CAST(length(text) AS BIGINT) AS n_chars2
FROM documents
""")
def f1_sha256_invariant(spark, sf_dir):
    """F1 — the per-row content invariant: built-in sha2 (JVM-side), never
    a Python hash UDF."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.sha2("text", 256).alias("content_sha256"),
                    F.length("text").cast("long").alias("n_chars2"))


@q("f2_string_ops", """
SELECT doc_id,
       lower(source) AS src_lower,
       substring(text, 1, 12) AS head,
       CAST(length(text) AS BIGINT) AS len,
       regexp_extract(text, '([a-z]+)', 1) AS first_word,
       concat_ws('-', lang, source) AS tag,
       lpad(CAST(doc_id AS VARCHAR), 6, '0') AS doc_key,
       split_part(source, 'c', 2) AS src_num
FROM documents
""")
def f2_string_ops(spark, sf_dir):
    """F2 — string family: path parsing / normalization primitives."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower("source").alias("src_lower"),
        F.substring("text", 1, 12).alias("head"),
        F.length("text").cast("long").alias("len"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.concat_ws("-", "lang", "source").alias("tag"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("doc_key"),
        F.split_part(F.col("source"), F.lit("c"), F.lit(2)).alias("src_num"))


@q("f3_datetime_ops", """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(year(ts) AS INT) AS yr,
       CAST(weekofyear(ts) AS INT) AS wk,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS first_sec
FROM events GROUP BY 1, 2, 3
""")
def f3_datetime_ops(spark, sf_dir):
    """F3 — date/time family: bucketing + epoch seconds (metrics &
    watermark math)."""
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.year("ts").cast("int").alias("yr"),
        F.weekofyear("ts").cast("int").alias("wk"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min(F.unix_timestamp("ts")).alias("first_sec")))


@q("f4_math_ops", """
SELECT event_type,
       round(sum(abs(value - 50)), 4) AS sum_abs_dev,
       round(sum(log2(greatest(value, 1.0))), 4) AS sum_log2,
       round(sum(least(value, 10.0)), 4) AS sum_capped,
       CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor
FROM events GROUP BY event_type
""")
def f4_math_ops(spark, sf_dir):
    """F4 — math family (salt math / metrics)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.sum(F.abs(F.col("value") - 50)), 4).alias("sum_abs_dev"),
        F.round(F.sum(F.log2(F.greatest(F.col("value"), F.lit(1.0)))), 4).alias("sum_log2"),
        F.round(F.sum(F.least(F.col("value"), F.lit(10.0))), 4).alias("sum_capped"),
        F.sum(F.floor("value")).alias("sum_floor"))


@q("f5_conditional_ops", """
SELECT user_id,
       CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(count(nullif(event_type, 'error')) AS BIGINT) AS n_ok,
       round(sum(coalesce(CASE WHEN event_type = 'purchase' THEN value END, 0.0)), 4) AS purchase_value
FROM events GROUP BY user_id
""")
def f5_conditional_ops(spark, sf_dir):
    """F5 — conditional family: the CDC op-resolution building blocks
    (when/otherwise, coalesce, nullif)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("n_high"),
        F.count(F.nullif(F.col("event_type"), F.lit("error"))).alias("n_ok"),
        F.round(F.sum(F.coalesce(F.when(F.col("event_type") == "purchase", F.col("value")), F.lit(0.0))), 4).alias("purchase_value"))


@q("f6_array_hof", """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id,
       CAST(len(words) AS INT) AS n_words,
       array_to_string(list_sort(words)[1:3], ',') AS first3_sorted,
       CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT) AS total_word_len
FROM w
""")
def f6_array_hof(spark, sf_dir):
    """F6 — array + higher-order functions (transform/aggregate): the
    lineage-array and path-segment machinery."""
    d = load(spark, sf_dir, "documents").withColumn("words", F.split("text", " "))
    return d.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.concat_ws(",", F.slice(F.array_sort("words"), 1, 3)).alias("first3_sorted"),
        F.aggregate(F.transform("words", lambda x: F.length(x).cast("long")),
                    F.lit(0).cast("long"), lambda acc, x: acc + x).alias("total_word_len"))


@q("f7_map_ops", """
SELECT doc_id, lang AS lang_from_map, source AS src_from_map
FROM documents
""")
def f7_map_ops(spark, sf_dir):
    """F7 — map family: build a props map and read it back with
    element_at (the payload-props pattern)."""
    d = load(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.withColumn("m", m).select(
        "doc_id",
        F.element_at("m", "lang").alias("lang_from_map"),
        F.element_at("m", "source").alias("src_from_map"))


@q("f8_json_ops", """
SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events GROUP BY 1
""")
def f8_json_ops(spark, sf_dir):
    """F8 — JSON family: extract typed values from the props payload
    (events.props is a JSON string, the schema-registry payload analog)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.withColumn("k", k)
            .groupBy((F.col("k") % 10).alias("k_bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("k").alias("k_min"), F.max("k").alias("k_max")))
