"""Similarity-search parity queries over the ``embeddings`` table
(vec_id bigint, embedding float[64], label int).

DuckDB oracle computes the identical double-precision sequential fold
(list arithmetic preserves element order on both engines), rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc.parity.common import load
from cdc.vectors import cosine_near_dup_pairs, cosine_topk

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


_DOT = ("list_sum(list_transform(generate_series(1, len({a})), "
        "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")
_NORM = "sqrt(" + _DOT + ")"


def _cos(a: str, b: str) -> str:
    return (f"({_DOT.format(a=a, b=b)}) / "
            f"({_NORM.format(a=a, b=a)} * {_NORM.format(a=b, b=b)})")


@q("ann_cosine_topk", f"""
WITH qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT qv.qid, e.vec_id, {_cos('qe', 'embedding')} AS cos
  FROM qv, embeddings e WHERE e.vec_id <> qv.qid
),
ranked AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
  FROM pairs
)
SELECT qid, vec_id, round(cos, 6) AS cosine, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 5
""")
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for the first 10 query vectors — the ANN
    correctness baseline (exhaustive scan, exact recall)."""
    emb = load(spark, sf_dir, "embeddings")
    return cosine_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


@q("ann_ivf_label", f"""
WITH qv AS (SELECT vec_id AS qid, embedding AS qe, label FROM embeddings WHERE vec_id < 20),
pairs AS (
  SELECT qv.qid, e.vec_id, {_cos('qe', 'embedding')} AS cos
  FROM qv JOIN embeddings e ON e.label = qv.label AND e.vec_id <> qv.qid
),
ranked AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
  FROM pairs
)
SELECT qid, vec_id, round(cos, 6) AS cosine, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""")
def ann_ivf_label(spark, sf_dir):
    """IVF-style partition-pruned ANN: the label column acts as the coarse
    quantizer (nprobe=1) — a query scans only its own cluster. The 100 TB
    scale path: candidate set shrinks by ~n_clusters and the join is a
    plain equi-join on the cluster id."""
    emb = load(spark, sf_dir, "embeddings")
    return cosine_topk(emb.filter(F.col("vec_id") < 20), emb, k=3,
                       partition_col="label")


@q("dedup_embed_cosine", f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cos('a.embedding', 'b.embedding')} AS cos
  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cos, 6) AS cosine FROM pairs WHERE cos >= 0.95
""")
def dedup_embed_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs (brute force over the corpus with
    injected exact duplicates, threshold 0.95)."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = (emb.filter(F.col("vec_id") % 100 == 0)
           .withColumn("vec_id", F.col("vec_id") + 100000))
    return cosine_near_dup_pairs(emb.unionByName(dup), threshold=0.95)
