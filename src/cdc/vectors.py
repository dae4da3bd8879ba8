"""Vector similarity search over an ``array<float>`` embedding column.

Brute-force cosine top-k is the correctness baseline; the IVF-style
partition-pruned variant is the scale path (probe only the coarse cluster
the query falls in -> candidate set shrinks by ~n_clusters).

Everything is JVM-side: ``zip_with`` + ``aggregate`` higher-order functions
compile to codegen'd expressions, so no Python worker is involved. (A
Pandas-UDF/numpy variant would win CPU-wise on very wide vectors via BLAS,
but pays the Arrow transfer; for 64-dim vectors the codegen path wins.)

Scale notes: queries are broadcast (the small side by construction); the
candidate scan is embarrassingly parallel; top-k per query is a partial
aggregate (per-partition heap) + final merge when expressed with
row_number-over-window at moderate query counts, or map-side
TakeOrderedAndProject when k*|queries| is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_double(col) -> "F.Column":
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> "F.Column":
    """Sequential left-fold dot product (deterministic summation order —
    matters for bit-stable parity with the oracle)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> "F.Column":
    return F.sqrt(dot(a, a))


def cosine(a, b) -> "F.Column":
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(queries: DataFrame, candidates: DataFrame, k: int,
                partition_col: str | None = None) -> DataFrame:
    """Top-k cosine neighbors per query row.

    ``queries``/``candidates``: (vec_id, embedding array<float>[, partition_col]).
    ``partition_col`` — IVF-style coarse-cluster column: when given, a query
    only scans candidates in its own cluster (the scale path; recall < 1
    by design, like any IVF index with nprobe=1).
    """
    q = queries.select(F.col("vec_id").alias("qid"),
                       as_double("embedding").alias("qe"),
                       *([partition_col] if partition_col else []))
    c = candidates.select(F.col("vec_id"),
                          as_double("embedding").alias("ce"),
                          *([F.col(partition_col).alias(f"_c_{partition_col}")]
                            if partition_col else []))
    if partition_col:
        cond = (F.col(partition_col) == F.col(f"_c_{partition_col}")) & (F.col("qid") != F.col("vec_id"))
    else:
        cond = F.col("qid") != F.col("vec_id")
    pairs = F.broadcast(q).join(c, cond)
    pairs = pairs.withColumn("cos", cosine(F.col("qe"), F.col("ce")))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("qid", "vec_id", F.round("cos", 6).alias("cosine"),
                    F.col("rnk").cast("int").alias("rnk")))


def cosine_near_dup_pairs(vecs: DataFrame, threshold: float) -> DataFrame:
    """All (a<b) pairs with cosine >= threshold — brute-force verification
    path for embedding near-dup detection (LSH/IVF bucket joins are the
    candidate generators at scale)."""
    a = vecs.select(F.col("vec_id").alias("id_a"), as_double("embedding").alias("ea"))
    b = vecs.select(F.col("vec_id").alias("id_b"), as_double("embedding").alias("eb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine(F.col("ea"), F.col("eb"))
    return (pairs.withColumn("cos", cos).filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cosine")))
