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


# -- random-hyperplane LSH near-dup (the embedding-dedup scale path) ----------

def _rh_sql() -> tuple[str, str]:
    """(sig CTE column list, band UNION) with the SAME deterministic ±1
    hyperplane matrix the Spark operator uses (cdc.vectors.rh_signs)."""
    from cdc.vectors import RH_BANDS, RH_PLANES, rh_signs
    signs = rh_signs(RH_PLANES, 64)
    r = RH_PLANES // RH_BANDS
    bit_cols = []
    for p, plane in enumerate(signs):
        lit = "[" + ", ".join(f"{float(s):.1f}" for s in plane) + "]"
        dotp = (f"list_sum(list_transform(generate_series(1, 64), "
                f"i -> ({lit}::DOUBLE[])[i] * CAST(embedding[i] AS DOUBLE)))")
        bit_cols.append(f"(CASE WHEN {dotp} > 0 THEN 1 ELSE 0 END) AS bit{p}")
    bands = " UNION ALL ".join(
        "SELECT vec_id, embedding, {b} AS band, {v} AS bval FROM sig".format(
            b=b, v=" + ".join(f"bit{b * r + j} * {1 << j}" for j in range(r)))
        for b in range(RH_BANDS))
    return ",\n       ".join(bit_cols), bands


_RH_BITS, _RH_BANDS_SQL = _rh_sql()

_EMB_CORPUS = """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0
)
"""


@q("dedup_embed_lsh", _EMB_CORPUS + f""",
sig AS (SELECT vec_id, embedding, {_RH_BITS} FROM corpus),
bands AS ({_RH_BANDS_SQL}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.id_a, c.id_b, {_cos('ea.embedding', 'eb.embedding')} AS cos
  FROM cand c JOIN corpus ea ON ea.vec_id = c.id_a
              JOIN corpus eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, round(cos, 6) AS cosine FROM scored WHERE cos >= 0.95
""")
def dedup_embed_lsh(spark, sf_dir):
    """Embedding near-dup via random-hyperplane LSH banding (16 seeded ±1
    hyperplanes, 4 bands): candidates come from a (band, band_value)
    equi-self-join — never all-pairs — and exact cosine runs only on the
    candidates. The 100 TB scale path; ``dedup_embed_cosine`` is the
    brute-force verification twin."""
    from cdc.vectors import cosine_near_dup_lsh
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = (emb.filter(F.col("vec_id") % 100 == 0)
           .withColumn("vec_id", F.col("vec_id") + 100000))
    return cosine_near_dup_lsh(emb.unionByName(dup), threshold=0.95)


@q("dedup_embed_lsh_incr", _EMB_CORPUS + f""",
sig AS (SELECT vec_id, embedding, {_RH_BITS} FROM corpus),
bands AS ({_RH_BANDS_SQL}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
  WHERE b.vec_id >= 100000
),
scored AS (
  SELECT c.id_a, c.id_b, {_cos('ea.embedding', 'eb.embedding')} AS cos
  FROM cand c JOIN corpus ea ON ea.vec_id = c.id_a
              JOIN corpus eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, round(cos, 6) AS cosine FROM scored WHERE cos >= 0.95
""")
def dedup_embed_lsh_incr(spark, sf_dir):
    """INCREMENTAL embedding near-dup — the vector twin of
    ``dedup_lsh_incr``: the ingest batch (the injected duplicates, all
    ids >= 100000) computes its own hyperplane bands and probes the
    standing band table of the original vectors
    (``cdc.vectors.cosine_near_dup_lsh_incremental``, O(batch)); exact
    cosine confirms only the candidates. The oracle is the full-corpus
    LSH plan restricted to pairs whose canonical greater id is new."""
    from cdc.vectors import cosine_near_dup_lsh_incremental, rh_bands
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = (emb.filter(F.col("vec_id") % 100 == 0)
           .withColumn("vec_id", F.col("vec_id") + 100000))
    pairs, _ = cosine_near_dup_lsh_incremental(
        rh_bands(emb), emb.unionByName(dup), dup, threshold=0.95)
    return pairs


# -- IVF with a REAL trained coarse quantizer ---------------------------------

_IVF_ASSIGN = f"""
cent AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cemb
         FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT e.vec_id, c.cid, {_cos('e.embedding', 'c.cemb')} AS cos
  FROM embeddings e CROSS JOIN cent c
),
ranked0 AS (
  SELECT vec_id, cid, cos,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
  FROM scored
),
assign AS (SELECT vec_id, cid, cos FROM ranked0 WHERE rn = 1)
"""


@q("ann_ivf_assigned", "WITH " + _IVF_ASSIGN + """
SELECT vec_id, cid AS centroid, round(cos, 6) AS cos6 FROM assign
""")
def ann_ivf_assigned(spark, sf_dir):
    """IVF coarse-quantizer ASSIGNMENT (no pre-existing label column):
    seeded centroids (lowest 8 vec_ids) + argmax-cosine assignment via a
    broadcast cross-join and map-side max_by. ``cdc.vectors.ivf_train``
    also supports Lloyd refinement iterations (pytest-pinned; the oracle
    pins the deterministic iters=0 quantizer)."""
    from cdc.vectors import ivf_assign, ivf_train
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = ivf_train(emb, n_centroids=8, iters=0)
    out = ivf_assign(emb, cent)
    return out.select("vec_id", "centroid", F.round("cos", 6).alias("cos6"))


# -- product quantization: codebooks are the 16 lowest vec_ids' subvectors
# (iters=0 seeding, matching cdc.vectors.pq_train); 8 subspaces x 8 dims.
_PQ_CODES = """
cw AS (SELECT CAST(vec_id AS INT) AS code, embedding
       FROM embeddings WHERE vec_id < 16),
subd AS (
  SELECT e.vec_id, j.j, c.code,
         list_sum(list_transform(generate_series(1, 8),
             t -> (CAST(e.embedding[j.j * 8 + t] AS DOUBLE)
                   - CAST(c.embedding[j.j * 8 + t] AS DOUBLE))
                  * (CAST(e.embedding[j.j * 8 + t] AS DOUBLE)
                     - CAST(c.embedding[j.j * 8 + t] AS DOUBLE))))
           AS dd
  FROM embeddings e
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) j
  CROSS JOIN cw c
),
best AS (
  SELECT vec_id, j, code,
         row_number() OVER (PARTITION BY vec_id, j ORDER BY dd, code) AS rn
  FROM subd
),
codes AS (SELECT vec_id, j, code FROM best WHERE rn = 1)
"""


@q("ann_pq_codes", "WITH " + _PQ_CODES + """
SELECT vec_id, list(code ORDER BY j) AS codes FROM codes GROUP BY vec_id
""")
def ann_pq_codes(spark, sf_dir):
    """PRODUCT-QUANTIZATION ENCODE — the memory answer at 10^9+ vectors:
    each 64-dim vector compresses to 8 sub-space code ids (argmin squared
    L2 against per-subspace codebooks, ties to the lowest code). Pure
    codegen: one literal codebook + nested transform, map-side, no
    shuffle. The oracle recomputes every code from scratch."""
    from cdc.vectors import pq_encode, pq_train
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = pq_train(emb, iters=0)
    return pq_encode(emb, cb)


@q("ann_pq_search", "WITH " + _PQ_CODES + """,
qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
       WHERE vec_id < 20),
contrib AS (
  SELECT q.qid, cd.vec_id, cd.j,
         list_sum(list_transform(generate_series(1, 8),
             t -> (CAST(q.qe[cd.j * 8 + t] AS DOUBLE)
                   - CAST(c.embedding[cd.j * 8 + t] AS DOUBLE))
                  * (CAST(q.qe[cd.j * 8 + t] AS DOUBLE)
                     - CAST(c.embedding[cd.j * 8 + t] AS DOUBLE)))) AS dd
  FROM qv q
  JOIN codes cd ON cd.vec_id <> q.qid
  JOIN cw c ON c.code = cd.code
),
dist AS (
  SELECT qid, vec_id, list_sum(list(dd ORDER BY j)) AS adc
  FROM contrib GROUP BY qid, vec_id
),
ranked AS (
  SELECT qid, vec_id, adc,
         row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rnk
  FROM dist
)
SELECT qid, vec_id, CAST(CAST(adc AS DECIMAL(28,6)) AS VARCHAR) AS adc6,
       CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""")
def ann_pq_search(spark, sf_dir):
    """ADC (asymmetric distance) top-k over PQ codes: the query builds
    its 8x16 distance table against the literal codebooks once; every
    candidate costs 8 table lookups over its codes — corpus float
    vectors are NEVER read at search time. The oracle recomputes the
    same quantized distances (sequential per-subspace fold on both
    sides, so the float sums are bit-identical)."""
    from cdc.vectors import pq_adc_search, pq_encode, pq_train
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = pq_train(emb, iters=0)
    codes = pq_encode(emb, cb)
    return pq_adc_search(emb.filter(F.col("vec_id") < 20), codes, cb,
                         topk=3)


@q("ann_ivfpq_search", "WITH " + _IVF_ASSIGN + ", " + _PQ_CODES.strip()
   + """,
qa AS (
  SELECT e.vec_id AS qid, e.embedding AS qe, a.cid
  FROM embeddings e JOIN assign a USING (vec_id) WHERE e.vec_id < 20
),
contrib AS (
  SELECT qa.qid, a2.vec_id, cd.j,
         list_sum(list_transform(generate_series(1, 8),
             t -> (CAST(qa.qe[cd.j * 8 + t] AS DOUBLE)
                   - CAST(c.embedding[cd.j * 8 + t] AS DOUBLE))
                  * (CAST(qa.qe[cd.j * 8 + t] AS DOUBLE)
                     - CAST(c.embedding[cd.j * 8 + t] AS DOUBLE)))) AS dd
  FROM qa
  JOIN assign a2 ON a2.cid = qa.cid AND a2.vec_id <> qa.qid
  JOIN codes cd ON cd.vec_id = a2.vec_id
  JOIN cw c ON c.code = cd.code
),
dist AS (
  SELECT qid, vec_id, list_sum(list(dd ORDER BY j)) AS adc
  FROM contrib GROUP BY qid, vec_id
),
ranked AS (
  SELECT qid, vec_id, adc,
         row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rnk
  FROM dist
)
SELECT qid, vec_id, CAST(CAST(adc AS DECIMAL(28,6)) AS VARCHAR) AS adc6,
       CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""")
def ann_ivfpq_search(spark, sf_dir):
    """IVF-PQ over the STANDING index (the FAISS-IVFPQ shape, engine
    form): vectors are coarse-assigned at ingest AND carry their PQ
    codes; search prunes to the query's cluster partitions and ranks by
    ADC over the stored codes — the float embedding column is never
    read at search time (column-pruned scan + M table lookups per
    candidate). The oracle recomputes cluster membership, codes, and
    every quantized distance from scratch."""
    from cdc.ann import IvfIndex
    from cdc.parity.udf_q import _scratch

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = IvfIndex(f"{_scratch('cdc_ann_q')}/ivfpq", n_partitions=8)
    idx.train_on(spark, emb, "base", n_centroids=8, iters=0, pq_m=8)
    return idx.search(spark, emb.filter(F.col("vec_id") < 20), k=3,
                      adc=True)


@q("ann_ivf_incr", "WITH " + _IVF_ASSIGN.replace(
    "FROM embeddings e CROSS JOIN cent c",
    """FROM (SELECT vec_id + 100000 AS vec_id, embedding
        FROM embeddings WHERE vec_id % 100 = 0) e CROSS JOIN cent c""") + """
SELECT vec_id, cid AS centroid, round(cos, 6) AS cos6 FROM assign
""")
def ann_ivf_incr(spark, sf_dir):
    """INCREMENTAL ANN INGEST (the IVF twin of ``dedup_lsh_incr``): the
    standing ``cdc.ann.IvfIndex`` table is trained+filled from the base
    corpus, then ONE ingest batch (the injected duplicates, ids
    >= 100000) is assigned O(batch) against the frozen broadcast
    quantizer and MERGE-committed under the epoch ledger. Returned: the
    STANDING TABLE's rows for the new ids — the oracle recomputes their
    assignment from scratch against the same seeded centroids, so any
    ingest shortcut (stale quantizer, wrong partition routing, lost
    rows) hash-mismatches. Layout: part = hash(centroid) — search prunes
    to probed clusters' partitions (pytest-pinned in test_ann)."""
    from cdc.ann import IvfIndex
    from cdc.parity.udf_q import _scratch

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = (emb.filter(F.col("vec_id") % 100 == 0)
           .withColumn("vec_id", F.col("vec_id") + 100000))
    idx = IvfIndex(f"{_scratch('cdc_ann_q')}/ivf", n_partitions=8)
    idx.train_on(spark, emb, "base", n_centroids=8, iters=0)
    idx.ingest(spark, dup, "epoch-1")
    return (idx.assignment(spark)
            .filter(F.col("vec_id") >= 100000)
            .select("vec_id", "centroid", "cos6"))


# the post-change vector corpus for the CDC ingest query: %100==7 vectors
# DELETED, %100==11 vectors UPDATED to the embedding of (vec_id - 10)
# (crossing centroids when the source lives in another cluster), +100000
# duplicates of %100==0 INSERTED. The quantizer stays FROZEN from the base
# corpus (seeds vec_id < 8 — note vec 7 itself is deleted, which must NOT
# change the quantizer), so the oracle scores the final corpus against the
# original seed centroids.
_CDC_FINAL = """(
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 100 NOT IN (7, 11)
  UNION ALL
  SELECT e.vec_id, b.embedding FROM embeddings e
  JOIN embeddings b ON b.vec_id = e.vec_id - 10
  WHERE e.vec_id % 100 = 11
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
  WHERE vec_id % 100 = 0) e"""


@q("ann_ivf_cdc", "WITH " + _IVF_ASSIGN.replace(
    "FROM embeddings e CROSS JOIN cent c",
    "FROM " + _CDC_FINAL + " CROSS JOIN cent c") + """
SELECT vec_id, cid AS centroid, round(cos, 6) AS cos6 FROM assign
""")
def ann_ivf_cdc(spark, sf_dir):
    """CDC-COMPLETE standing ANN index (round-4 next-round #3): one
    op-typed epoch of deletes, updates and inserts through
    ``IvfIndex.ingest_changes``. Deletes tombstone the assignment row IN
    its old centroid partition (routed by re-assigning the PRE image
    under the frozen quantizer — no reverse lookup); an update whose
    embedding crossed a centroid boundary is the sanctioned
    retire-then-insert key move; same-centroid updates are plain LWW
    upserts. Returned: the ENTIRE standing table — the oracle recomputes
    every final vector's assignment from scratch, so a surviving deleted
    row, a stale embedding, or a key split across partitions all
    hash-mismatch."""
    from cdc.ann import IvfIndex
    from cdc.parity.udf_q import _scratch

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = IvfIndex(f"{_scratch('cdc_ann_cdc')}/ivf", n_partitions=8)
    idx.train_on(spark, emb, "base", n_centroids=8, iters=0)

    i = F.col("vec_id")
    dels = (emb.filter(i % 100 == 7)
            .select("vec_id", F.lit("D").alias("op"),
                    F.lit(None).cast("array<float>").alias("embedding"),
                    F.col("embedding").alias("embedding_pre")))
    upds = (emb.alias("e").filter(F.col("e.vec_id") % 100 == 11)
            .join(emb.alias("b"),
                  F.col("b.vec_id") == F.col("e.vec_id") - 10)
            .select(F.col("e.vec_id").alias("vec_id"),
                    F.lit("U").alias("op"),
                    F.col("b.embedding").alias("embedding"),
                    F.col("e.embedding").alias("embedding_pre")))
    ins = (emb.filter(i % 100 == 0)
           .select((i + 100000).alias("vec_id"), F.lit("I").alias("op"),
                   F.col("embedding"),
                   F.lit(None).cast("array<float>").alias("embedding_pre")))
    idx.ingest_changes(spark, dels.unionByName(upds).unionByName(ins), "c1")
    return idx.assignment(spark).select("vec_id", "centroid", "cos6")


@q("ann_ivf_search", "WITH " + _IVF_ASSIGN + f""",
qv AS (
  SELECT e.vec_id AS qid, e.embedding AS qe, a.cid
  FROM embeddings e JOIN assign a USING (vec_id) WHERE e.vec_id < 20
),
pairs AS (
  SELECT qv.qid, e.vec_id, {_cos('qe', 'e.embedding')} AS cos
  FROM qv JOIN assign a2 ON a2.cid = qv.cid
          JOIN embeddings e ON e.vec_id = a2.vec_id AND e.vec_id <> qv.qid
),
ranked AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
  FROM pairs
)
SELECT qid, vec_id, round(cos, 6) AS cosine, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""")
def ann_ivf_search(spark, sf_dir):
    """IVF nprobe=1 SEARCH over the trained quantizer: queries scan only
    their own coarse cluster (plain equi-join on the assigned centroid —
    candidate set shrinks by ~n_clusters at scale)."""
    from cdc.vectors import ivf_search, ivf_train
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = ivf_train(emb, n_centroids=8, iters=0)
    return ivf_search(emb.filter(F.col("vec_id") < 20), emb, cent, k=3)


@q("ann_ivf_search_np2", "WITH " + _IVF_ASSIGN + f""",
qprobe AS (
  SELECT vec_id AS qid, cid FROM ranked0 WHERE rn <= 2 AND vec_id < 20
),
qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 20),
pairs AS (
  SELECT qp.qid, a2.vec_id, {_cos('qv.qe', 'e.embedding')} AS cos
  FROM qprobe qp JOIN assign a2 ON a2.cid = qp.cid
       JOIN qv ON qv.qid = qp.qid
       JOIN embeddings e ON e.vec_id = a2.vec_id
  WHERE a2.vec_id <> qp.qid
),
ranked AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
  FROM pairs
)
SELECT qid, vec_id, round(cos, 6) AS cosine, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""")
def ann_ivf_search_np2(spark, sf_dir):
    """IVF search with ``nprobe=2`` — the recall knob: each query scans
    the union of its TWO nearest clusters (every candidate lives in
    exactly one cluster, so the probes union disjoint candidate sets; the
    oracle recomputes exact top-k within that union). Same equi-join
    shape as nprobe=1; the probe list comes from one broadcast scoring
    pass + a per-query array-sort — no all-pairs anywhere."""
    from cdc.vectors import ivf_search, ivf_train
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = ivf_train(emb, n_centroids=8, iters=0)
    return ivf_search(emb.filter(F.col("vec_id") < 20), emb, cent, k=3,
                      nprobe=2)
