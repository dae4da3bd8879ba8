"""Relational parity queries over the TPC-H-ish tables.

These cover the reference pipeline's analytic stages (SURVEY.md §2.A):
R5 group-by count agg, R6 date bucketing, R7 cumulative stats, R8 lookup
joins — expressed as the classic declarative plans so Catalyst's pushdown /
broadcast / partial-agg machinery carries them (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Window
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


@q("tpch_q1_pricing", """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2002-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def tpch_q1_pricing(spark, sf_dir):
    """R5 — the canonical pricing-summary aggregate (two-phase hash agg;
    the shipdate filter pushes to the parquet scan)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2002-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
             F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
             F.round(F.avg("l_discount"), 4).alias("avg_disc"),
             F.count(F.lit(1)).alias("count_order")))


@q("tpch_q3_shipping", """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-03-15'
  AND l.l_shipdate > DATE '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
""")
def tpch_q3_shipping(spark, sf_dir):
    """R8 — multi-way join + agg + top-k; customer side broadcast."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("date"))
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("date"))
    return (
        F.broadcast(c).join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10))


@q("tpch_q5_region_volume", """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""")
def tpch_q5_region_volume(spark, sf_dir):
    """R8 — star join through two broadcast dims (region, nation) plus two
    fact joins; Catalyst/AQE pick broadcast for the small sides."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")))


@q("r6_date_bucket", """
SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY date_trunc('week', o_orderdate)
""")
def r6_date_bucket(spark, sf_dir):
    """R6 — date bucketing: orders per ISO week."""
    o = load(spark, sf_dir, "orders")
    return (o.groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("week"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))


@q("r7_cumulative", """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
FROM orders
""")
def r7_cumulative(spark, sf_dir):
    """R7 — cumulative stats per key over time (running total window)."""
    o = load(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select("o_custkey", "o_orderkey",
                    F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spend"))


@q("r12_dataset_routing", """
WITH routed AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'expedite'
              WHEN o_orderstatus = 'F' THEN 'archive'
              ELSE 'standard' END AS dataset,
         o_totalprice
  FROM orders
)
SELECT dataset, CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
FROM routed GROUP BY dataset
""")
def r12_dataset_routing(spark, sf_dir):
    """R12 — dataset routing: per-dataset branch after the heavy stage,
    expressed declaratively (the enrichment-plugin dispatch pattern —
    see cdc.enrich for the registry form)."""
    o = load(spark, sf_dir, "orders")
    dataset = (F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "expedite")
               .when(F.col("o_orderstatus") == "F", "archive")
               .otherwise("standard"))
    return (o.withColumn("dataset", dataset)
            .groupBy("dataset")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))
