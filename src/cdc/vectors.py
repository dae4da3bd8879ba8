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

#: default fail-fast bound for the QUADRATIC verification-path operators
#: (brute-force top-k / all-pairs cosine). Big enough for any oracle or
#: test corpus, far below anything that would melt a cluster.
QUADRATIC_MAX_ROWS = 200_000


def guard_quadratic(df: DataFrame, op: str, twin: str,
                    max_rows: int | None) -> None:
    """The brute-force operators are O(n²) BY DESIGN — verification twins
    of a sub-quadratic default. Nothing else stops a caller pointing them
    at a big frame, so they fail fast above ``max_rows`` (pass None to
    force through). Costs one count() job on the guarded side."""
    if max_rows is None:
        return
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"{op}: input has {n:,} rows (> max_rows={max_rows:,}) — this "
            f"is the quadratic verification path; use {twin} at scale, or "
            f"pass max_rows=None to force")


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
                partition_col: str | None = None,
                max_rows: int | None = QUADRATIC_MAX_ROWS) -> DataFrame:
    """Top-k cosine neighbors per query row.

    ``queries``/``candidates``: (vec_id, embedding array<float>[, partition_col]).
    ``partition_col`` — IVF-style coarse-cluster column: when given, a query
    only scans candidates in its own cluster (the scale path; recall < 1
    by design, like any IVF index with nprobe=1). WITHOUT it this is a
    broadcast-nested-loop over every candidate — the exact-recall
    verification baseline, guarded by ``max_rows`` (see ``ivf_search``
    for the scale path).
    """
    if partition_col is None:
        guard_quadratic(candidates, "cosine_topk(partition_col=None)",
                        "ivf_search (trained quantizer + nprobe)", max_rows)
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


def cosine_near_dup_pairs(vecs: DataFrame, threshold: float,
                          max_rows: int | None = QUADRATIC_MAX_ROWS) -> DataFrame:
    """All (a<b) pairs with cosine >= threshold — brute-force verification
    path for embedding near-dup detection (``cosine_near_dup_lsh`` is the
    candidate generator at scale). Fails fast above ``max_rows``."""
    guard_quadratic(vecs, "cosine_near_dup_pairs",
                    "cosine_near_dup_lsh (LSH banding)", max_rows)
    a = vecs.select(F.col("vec_id").alias("id_a"), as_double("embedding").alias("ea"))
    b = vecs.select(F.col("vec_id").alias("id_b"), as_double("embedding").alias("eb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine(F.col("ea"), F.col("eb"))
    return (pairs.withColumn("cos", cos).filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cosine")))


# -- random-hyperplane LSH (SimHash-for-cosine) -------------------------------
#
# K hyperplanes with deterministic ±1 components derived from md5 — a public
# seeded construction reproducible bit-for-bit in any engine (the DuckDB
# oracle embeds the identical sign matrix as literals). Signature bit p =
# [dot(v, s_p) > 0]; near-identical vectors agree on (almost) every bit, so
# banding the K bits and equi-joining on (band, band_value) yields candidate
# pairs WITHOUT the all-pairs theta-join — linear in corpus size + bucket
# fan-out, the 100 TB scale path. Exact cosine runs only on candidates.

RH_PLANES = 32  # signature bits
RH_BANDS = 4    # bands of RH_PLANES // RH_BANDS bits each (8-bit band
                # values -> 256 buckets/band: bucket-join fan-out stays
                # sub-quadratic; exact duplicates still collide on ALL bands)


def rh_signs(n_planes: int = RH_PLANES, dim: int = 64) -> list[list[int]]:
    """Deterministic ±1 hyperplane components: sign(p,i) from md5 parity."""
    import hashlib

    return [[1 if int(hashlib.md5(f"rh:{p}:{i}".encode()).hexdigest()[:8], 16) % 2 == 0
             else -1 for i in range(dim)]
            for p in range(n_planes)]


def rh_signature_bits(emb, signs: list[list[int]]) -> "F.Column":
    """The 0/1 signature as ONE array<int> Column: a single sign-matrix
    literal + one ``transform`` over the planes (sign of each sequential-
    fold dot product). One expression tree instead of K independent fold
    expressions — K-times smaller codegen, same bit-exact semantics."""
    matrix = F.array(*[F.array(*[F.lit(float(s)) for s in plane])
                       for plane in signs])
    return F.transform(
        matrix, lambda plane: F.when(dot(emb, plane) > 0, F.lit(1)).otherwise(F.lit(0)))


def rh_bands(vecs: DataFrame, n_planes: int = RH_PLANES,
             n_bands: int = RH_BANDS, dim: int = 64) -> DataFrame:
    """Banded random-hyperplane signature rows (vec_id, band, bval) — the
    STANDING STATE of a continuous embedding-dedup pipeline: a pure
    per-vector function of the fixed seeded sign matrix, so a vector's
    rows never change after ingest."""
    r = n_planes // n_bands
    signs = rh_signs(n_planes, dim)
    sig = (vecs.select("vec_id", as_double("embedding").alias("emb"))
           .withColumn("_bits", rh_signature_bits(F.col("emb"), signs)))
    # band value = the band's r bits packed into an int (slice + positional
    # fold of the one signature array); one explode, not a per-band union
    # (a union would recompute the signature per band)
    powers = F.array(*[F.lit(1 << j) for j in range(r)])
    band_arr = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.aggregate(F.zip_with(F.slice("_bits", b * r + 1, r), powers,
                                   lambda x, p: x * p),
                        F.lit(0), lambda acc, x: acc + x).alias("bval"))
        for b in range(n_bands)])
    return (sig.select("vec_id", F.explode(band_arr).alias("bb"))
            .select("vec_id", F.col("bb.band").alias("band"),
                    F.col("bb.bval").alias("bval")))


def _rh_candidates(a_banded: DataFrame, b_banded: DataFrame,
                   symmetric: bool = False) -> DataFrame:
    """Random-hyperplane instantiation of ``cdc.lsh.canonical_pairs``.
    NARROW: only (vec_id, band, bval) moves through the join and the
    dedup — embeddings join back onto candidates later."""
    from cdc.lsh import canonical_pairs
    return canonical_pairs(a_banded, b_banded, "vec_id", ("band", "bval"),
                           "id_a", "id_b", symmetric)


def _confirm_cosine(cand: DataFrame, vecs: DataFrame,
                    threshold: float) -> DataFrame:
    """Exact-cosine confirmation of (id_a, id_b) candidates against a
    (vec_id, embedding) lookup — runs only on the candidate set."""
    e = vecs.select("vec_id", as_double("embedding").alias("emb"))
    pairs = (cand.join(e.select(F.col("vec_id").alias("id_a"),
                                F.col("emb").alias("ea")), "id_a")
             .join(e.select(F.col("vec_id").alias("id_b"),
                            F.col("emb").alias("eb")), "id_b"))
    cos = cosine(F.col("ea"), F.col("eb"))
    return (pairs.withColumn("cos", cos).filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cosine")))


def cosine_near_dup_lsh(vecs: DataFrame, threshold: float,
                        n_planes: int = RH_PLANES,
                        n_bands: int = RH_BANDS,
                        dim: int = 64) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH banding.

    vecs: (vec_id, embedding array<float>). Returns (id_a, id_b, cosine)
    for candidate pairs (sharing >= 1 full band of signature bits) whose
    exact cosine >= threshold. Recall < 1 by LSH design (a pair differing
    in every band is missed); exact duplicates collide on all bands, so
    dedup recall on true copies is 1.
    """
    banded = rh_bands(vecs, n_planes, n_bands, dim)
    cand = _rh_candidates(banded, banded, symmetric=True)
    return _confirm_cosine(cand, vecs, threshold)


def cosine_near_dup_lsh_incremental(
        standing_bands: DataFrame, all_vecs: DataFrame,
        new_vecs: DataFrame, threshold: float,
        n_planes: int = RH_PLANES, n_bands: int = RH_BANDS,
        dim: int = 64) -> tuple[DataFrame, DataFrame]:
    """Embedding near-dup pairs for ONE ingest batch against a standing
    corpus — the vector twin of ``cdc.lsh.minhash_pairs_incremental``,
    O(batch): signatures are a pure per-vector function of the fixed
    seeded hyperplanes, so the batch computes its own bands and probes
    standing ∪ new on (band, bval); exactly the full self-join's pairs
    touching a new vector come out. ``all_vecs`` (standing ∪ new
    embeddings; at scale the standing embedding table, joined only onto
    candidates) backs the exact-cosine confirmation. Returns
    (pairs, new_bands) — the caller appends new_bands to the standing
    band table."""
    nb = (rh_bands(new_vecs, n_planes, n_bands, dim)
          # consumed twice (probe side + the union)
          .localCheckpoint(eager=True))
    cand = _rh_candidates(nb, standing_bands.unionByName(nb))
    return _confirm_cosine(cand, all_vecs, threshold), nb


# -- IVF: real coarse quantizer ----------------------------------------------

def ivf_assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (ties -> lowest
    centroid id). One broadcast cross-join against the (small) centroid set;
    the argmax is a map-side max_by — fully codegen'd, no Python.

    vecs: (vec_id, embedding); centroids: (cid, cemb array<double>).
    Returns (vec_id, embedding, centroid, cos)."""
    c = F.broadcast(centroids.select("cid", "cemb"))
    pairs = vecs.select("vec_id", "embedding",
                        as_double("embedding").alias("emb")).crossJoin(c)
    cos = cosine(F.col("emb"), F.col("cemb"))
    scored = pairs.select("vec_id", "embedding", "cid", cos.alias("cos"))
    # max_by on (cos, -cid): highest cosine, ties to the lowest centroid id
    pick = F.max_by(F.struct("cid", "cos"), F.struct(F.col("cos"), -F.col("cid")))
    out = scored.groupBy("vec_id", "embedding").agg(pick.alias("p"))
    return out.select("vec_id", "embedding",
                      F.col("p.cid").alias("centroid"), F.col("p.cos").alias("cos"))


def seed_centroids(vecs: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic seeding: the n lowest vec_ids are the initial
    centroids (a public k-means seeding stand-in; k-means|| would sample by
    distance — the interface is the same)."""
    return (vecs.orderBy("vec_id").limit(n_centroids)
            .select(F.col("vec_id").cast("int").alias("cid"),
                    as_double("embedding").alias("cemb")))


def ivf_train(vecs: DataFrame, n_centroids: int, iters: int = 0) -> DataFrame:
    """Train the IVF coarse quantizer: seeded centroids + ``iters`` Lloyd
    refinement steps (per-dimension mean of assigned vectors, computed with
    posexplode -> avg -> re-packed array; centroid ids relabel 0..C-1 by
    assignment). The refined centroid table is tiny (C rows) and collected
    per iteration — the driver loop is O(iters), each step one Spark job.
    Returns (cid, cemb)."""
    cent = seed_centroids(vecs, n_centroids)
    for _ in range(iters):
        assigned = ivf_assign(vecs, cent)
        dims = assigned.select(
            "centroid", F.posexplode(as_double("embedding")).alias("pos", "val"))
        means = (dims.groupBy("centroid", "pos").agg(F.avg("val").alias("m"))
                 .groupBy("centroid")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
                 .select(F.col("centroid").alias("cid"),
                         F.transform("pm", lambda s: s["m"]).alias("cemb")))
        # materialize the C-row centroid table each step — without the cut,
        # step k's plan nests every earlier step and re-executes the whole
        # chain from the raw vectors (O(iters^2) scans of the corpus)
        cent = means.localCheckpoint(eager=True)
    return cent


# -- product quantization (PQ) ------------------------------------------------
#
# The memory answer at 10^9+ vectors: a 64-dim float vector (256 B) becomes
# M sub-space code ids (M bytes at K<=256) against per-subspace codebooks;
# search runs as ADC (asymmetric distance computation) — the query builds an
# M×K distance table against the codebooks ONCE, each candidate's distance
# is then M table lookups over its codes, never a float-vector read. The
# codebooks are tiny (M·K·(dim/M) doubles) and broadcast as literals, so
# both encode and ADC are pure codegen column expressions.

PQ_M = 8    # subspaces (dim/M dims each)
PQ_K = 16   # codewords per subspace (one code fits 4 bits; M=8 -> 4 B/vec)


def _sq_dist(a, b) -> "F.Column":
    """Sequential-fold squared L2 (deterministic summation order —
    bit-stable against the DuckDB list_sum oracle)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def pq_train(vecs: DataFrame, m: int = PQ_M, k: int = PQ_K,
             iters: int = 0, dim: int = 64) -> list[list[list[float]]]:
    """Train per-subspace codebooks; returns CB[m][k][dim/m] (a plain
    nested list — tiny by construction, meant to broadcast as a literal).
    Seeding matches ``seed_centroids``: codeword c of every subspace is
    the c-th lowest vec_id's subvector (public deterministic stand-in;
    k-means|| per subspace has the same interface). ``iters`` Lloyd steps
    refine per subspace (mean of assigned subvectors; empty cells keep
    their codeword).

    Determinism: BIT-exact reproducibility (the crash-heal re-train
    contract of ``IvfIndex.train_on``) holds for ``iters=0`` — the seeded
    codebook is a pure function of the vector set. Lloyd steps use
    ``F.avg`` over a shuffle, whose float summation ORDER is not
    deterministic, so an ``iters>0`` re-train can differ in the last bits
    from the codebook that stamped already-committed codes; standing
    indexes that rely on crash-heal should train with ``iters=0`` or
    re-encode after healing."""
    d_sub = dim // m
    seeds = (vecs.orderBy("vec_id").limit(k)
             .select(as_double("embedding").alias("e")).collect())
    cb = [[[float(r["e"][j * d_sub + t]) for t in range(d_sub)]
           for r in seeds] for j in range(m)]
    for _ in range(iters):
        codes = pq_encode(vecs, cb, dim=dim)
        sub = (codes.join(vecs.select("vec_id",
                                      as_double("embedding").alias("e")),
                          "vec_id")
               .select(F.posexplode("codes").alias("j", "code"), "e")
               .select("j", "code",
                       F.posexplode(F.expr(
                           f"slice(e, j * {d_sub} + 1, {d_sub})"))
                       .alias("t", "val")))
        means = (sub.groupBy("j", "code", "t").agg(F.avg("val").alias("v"))
                 .collect())
        for r in means:
            cb[r["j"]][r["code"]][r["t"]] = float(r["v"])
    return cb


def _cb_literal(cb) -> "F.Column":
    return F.array(*[F.array(*[F.array(*[F.lit(float(x)) for x in cw])
                               for cw in sub]) for sub in cb])


def pq_codes_col(cb: list, dim: int | None = None) -> "F.Column":
    """The PQ code array as ONE Column over an ``embedding`` column —
    per subspace, the argmin-squared-L2 codeword (ties -> lowest code,
    via first-position match; exact float equality is safe: both sides
    are the same computed value). Attachable to any frame (the standing
    IVF index stamps it at ingest). Subspace geometry comes from the
    CODEBOOK ITSELF (d_sub = codeword length) — a caller can't slice
    against the wrong width (``dim`` is accepted for symmetry and
    validated)."""
    m = len(cb)
    d_sub = len(cb[0][0])
    if dim is not None and dim != m * d_sub:
        raise ValueError(f"codebook is {m}x{len(cb[0])}x{d_sub} "
                         f"(dim {m * d_sub}); caller passed dim={dim}")
    cbl = _cb_literal(cb)
    e = as_double(F.col("embedding"))

    def code_for(j):
        sub = F.slice(e, j * d_sub + 1, d_sub)
        dists = F.transform(cbl[j], lambda cw: _sq_dist(sub, cw))
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return F.array(*[code_for(j) for j in range(m)])


def pq_encode(vecs: DataFrame, cb: list,
              dim: int | None = None) -> DataFrame:
    """(vec_id, codes array<int>) — ``pq_codes_col`` applied to a
    (vec_id, embedding) frame. Fully codegen, no Python, no shuffle; at
    scale this is the map-side compression pass of an ingest pipeline."""
    return vecs.select("vec_id", pq_codes_col(cb, dim=dim).alias("codes"))


def pq_adc_search(queries: DataFrame, codes: DataFrame, cb: list,
                  topk: int, dim: int | None = None,
                  partition_col: str | None = None) -> DataFrame:
    """ADC top-k: each query materializes its M×K distance table against
    the literal codebooks (one expression, map-side), then every
    candidate's approximate distance is M ``element_at`` lookups over its
    codes — the float vectors of the corpus are NEVER read. Returns
    (qid, vec_id, adc6, rnk); ties break on vec_id. Recall < 1 by
    quantization design; re-rank the top-k' > k survivors with exact
    distances when exactness matters (standard PQ practice).

    ``partition_col`` — IVF-PQ composition: when both frames carry a
    coarse-cluster column, a query only scans candidates in its own
    cluster (equi-join on the cluster id instead of the broadcast
    nested-loop) — candidate set shrinks by ~n_clusters AND each
    candidate still costs only M table lookups."""
    m = len(cb)
    d_sub = len(cb[0][0])   # geometry from the codebook (see pq_codes_col)
    if dim is not None and dim != m * d_sub:
        raise ValueError(f"codebook dim {m * d_sub} != caller dim {dim}")
    cbl = _cb_literal(cb)
    qe = as_double(F.col("embedding"))
    qt = F.array(*[
        F.transform(cbl[j], lambda cw: _sq_dist(
            F.slice(qe, j * d_sub + 1, d_sub), cw))
        for j in range(m)])
    q = queries.select(F.col("vec_id").alias("qid"), qt.alias("qt"),
                       *([partition_col] if partition_col else []))
    if partition_col:
        c = codes.withColumnRenamed(partition_col, f"_c_{partition_col}")
        cond = ((F.col(partition_col) == F.col(f"_c_{partition_col}"))
                & (F.col("qid") != F.col("vec_id")))
    else:
        c = codes
        cond = F.col("qid") != F.col("vec_id")
    pairs = F.broadcast(q).join(c, cond)
    adc = F.aggregate(
        F.zip_with(F.col("codes"), F.col("qt"),
                   lambda c, row: F.element_at(row, c + 1)),
        F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("vec_id"))
    # decimal cast, not round(): both engines quantize a shared double
    # with identical HALF_UP semantics (round() diverges on exact .5
    # decimal expansions — the repo-wide rendered-number rule)
    return (pairs.withColumn("adc", adc)
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= topk)
            .select("qid", "vec_id",
                    F.col("adc").cast("decimal(28,6)").cast("string")
                    .alias("adc6"),
                    F.col("rnk").cast("int").alias("rnk")))


def ivf_query_probes(queries: DataFrame, centroids: DataFrame,
                     nprobe: int) -> DataFrame:
    """Each query's ``nprobe`` nearest centroids — the IVF recall knob.
    One broadcast cross-join scores the C centroids per query MAP-SIDE,
    then one grouped aggregate (collect the C scores, array-sort, slice)
    picks the top-m; the only shuffle moves C small (neg-cos, cid) structs
    per query, never the candidate corpus. Ties break to the lowest cid,
    matching ``ivf_assign``. Returns (vec_id, embedding, centroid) with
    ``nprobe`` rows per query."""
    c = F.broadcast(centroids.select("cid", "cemb"))
    pairs = queries.select("vec_id", "embedding",
                           as_double("embedding").alias("emb")).crossJoin(c)
    scored = pairs.select(
        "vec_id", "embedding", "cid",
        cosine(F.col("emb"), F.col("cemb")).alias("cos"))
    # array_sort on struct(-cos, cid) = cosine desc, ties to lowest cid
    probes = F.slice(
        F.array_sort(F.collect_list(F.struct(
            (-F.col("cos")).alias("neg"), F.col("cid").alias("cid")))),
        1, nprobe)
    return (scored.groupBy("vec_id", "embedding").agg(probes.alias("pr"))
            .select("vec_id", "embedding", F.explode("pr").alias("p"))
            .select("vec_id", "embedding", F.col("p.cid").alias("centroid")))


def ivf_search(queries: DataFrame, vecs: DataFrame, centroids: DataFrame,
               k: int, nprobe: int = 1) -> DataFrame:
    """IVF search: assign queries and candidates to the trained quantizer,
    then top-k cosine WITHIN the query's probed cluster(s) only — the
    candidate set shrinks by ~n_clusters/nprobe and the join is a plain
    equi-join on the centroid id (the 100 TB path).

    ``nprobe`` — how many nearest clusters each query scans (the standard
    IVF recall/latency knob): every candidate is assigned to exactly ONE
    cluster, so probing m clusters unions m disjoint candidate sets and
    the per-query top-k ranks that union. nprobe = n_centroids degrades
    gracefully to exact search."""
    av = ivf_assign(vecs, centroids).select("vec_id", "embedding", "centroid")
    if nprobe <= 1:
        aq = ivf_assign(queries, centroids).select(
            "vec_id", "embedding", "centroid")
    else:
        aq = ivf_query_probes(queries, centroids, nprobe)
    return cosine_topk(aq, av, k=k, partition_col="centroid")
