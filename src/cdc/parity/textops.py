"""Text analysis + deduplication operators over the ``documents`` table.

The training-data-pipeline operator family: exact dedup, MinHash+LSH,
SimHash, n-gram Jaccard, plus language-ID, quality scoring, token counting
and document fingerprinting. Everything is built from JVM-side column
expressions (split/transform/md5/conv/explode) — no Python in the hot path
— and every step has a DuckDB-oracle formulation with identical hash
functions (md5), so candidate pairs match exactly.

Scale notes: the shingle explode is the classic map-side blowup (~n_words
rows per doc); at 100 TB this runs as repartition-by-doc before the
signature groupBy so partial aggregation collapses shingles locally. The
LSH band join is an equi-join on (band, bucket) — shuffle-partitioned,
broadcast-free, skew bounded by band-bucket cardinality. The all-pairs
Jaccard join is quadratic per shingle bucket and exists as the *oracle
path*; LSH is the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc.lsh import (LSH_BANDS, N_MINHASH, minhash_bands, minhash_pairs,
                     minhash_pairs_incremental, pairs_from_bands, shingles)
from cdc.parity.common import load

QUERIES: dict = {}
ORACLES: dict = {}

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is", "row", "table", "value")

# engine-side operators (cdc.lsh) under their historical parity names —
# the oracle SQL below is the DuckDB twin of exactly these constructions
_shingles = shingles
_pairs_from_bands = pairs_from_bands


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents")


def _corpus(spark, sf_dir) -> DataFrame:
    """Documents plus injected exact duplicates (doc_id % 50 == 0 rows
    re-appear with doc_id + 100000) so dedup queries have true positives.
    The oracle injects the same rows."""
    d = _docs(spark, sf_dir)
    dup = (d.filter(F.col("doc_id") % 50 == 0)
           .withColumn("doc_id", F.col("doc_id") + 100000))
    return d.unionByName(dup)


_CORPUS_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
)
"""

# words / shingles CTE shared by several oracles
_SHINGLE_SQL = _CORPUS_SQL + """,
w AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM corpus),
sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 2)) AS i) g
)
"""


@q("txt_token_count", """
SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens
FROM documents
""")
def txt_token_count(spark, sf_dir):
    """Token counting (whitespace tokenizer)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"))


@q("txt_quality", """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words,
         length(text) AS n_char
  FROM documents
)
SELECT doc_id,
       CAST(n_char AS BIGINT) AS n_char,
       CAST(len(words) AS INT) AS n_tokens,
       round(CAST(n_char AS DOUBLE) / len(words), 4) AS chars_per_token,
       round(CAST(len(list_filter(words, x -> list_contains(
           ['the','a','of','and','in','to','is','row','table','value'], x))) AS DOUBLE)
             / len(words), 4) AS stopword_ratio,
       CASE WHEN len(words) >= 5 AND CAST(n_char AS DOUBLE) / len(words) BETWEEN 2 AND 12
            THEN true ELSE false END AS is_good
FROM t
""")
def txt_quality(spark, sf_dir):
    """Quality scoring: length stats + stopword ratio + a keep/drop flag
    (the C4/Gopher-style filter shape, deterministic version)."""
    d = _docs(spark, sf_dir)
    words = F.split(F.trim(F.col("text")), r"\s+")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    t = d.select("doc_id", F.length("text").alias("n_char"), words.alias("words"))
    cpt = F.round(F.col("n_char").cast("double") / F.size("words"), 4)
    swr = F.round(
        F.size(F.filter("words", lambda x: F.array_contains(stop, x))).cast("double")
        / F.size("words"), 4)
    return t.select(
        "doc_id", F.col("n_char").cast("long").alias("n_char"),
        F.size("words").alias("n_tokens"),
        cpt.alias("chars_per_token"),
        swr.alias("stopword_ratio"),
        ((F.size("words") >= 5) & cpt.between(2, 12)).alias("is_good"))


@q("txt_langid", """
WITH t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\\s+') AS words
  FROM documents
)
SELECT doc_id, lang,
       CAST(len(list_filter(words, x -> list_contains(
           ['the','a','of','and','in','to','is','row','table','value'], x))) AS BIGINT) AS en_hits,
       CASE WHEN len(list_filter(words, x -> list_contains(
           ['the','a','of','and','in','to','is','row','table','value'], x))) * 5 >= len(words)
            THEN 'en' ELSE 'unk' END AS predicted
FROM t
""")
def txt_langid(spark, sf_dir):
    """Language-ID via stopword-hit heuristic (n-gram/marker counting —
    deterministic stand-in for a real fastText-style model)."""
    d = _docs(spark, sf_dir)
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    t = d.select("doc_id", "lang", words.alias("words"))
    hits = F.size(F.filter("words", lambda x: F.array_contains(stop, x))).cast("long")
    return t.select(
        "doc_id", "lang", hits.alias("en_hits"),
        F.when(hits * 5 >= F.size("words"), "en").otherwise("unk").alias("predicted"))


@q("txt_fingerprint", _SHINGLE_SQL + """
SELECT s.doc_id, md5(c.text) AS fingerprint, min(md5(s.shingle)) AS min_shingle_hash
FROM sh s JOIN corpus c USING (doc_id)
GROUP BY s.doc_id, md5(c.text)
""")
def txt_fingerprint(spark, sf_dir):
    """Document fingerprinting: whole-doc hash + min rolling 3-gram shingle
    hash (the MinHash k=1 special case)."""
    c = _corpus(spark, sf_dir)
    sh = _shingles(c)
    fp = c.select("doc_id", F.md5("text").alias("fingerprint"))
    return (sh.groupBy("doc_id")
            .agg(F.min(F.md5("shingle")).alias("min_shingle_hash"))
            .join(fp, "doc_id")
            .select("doc_id", "fingerprint", "min_shingle_hash"))


@q("dedup_exact_docs", _CORPUS_SQL + """
SELECT md5(text) AS content_hash, CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS keeper
FROM corpus GROUP BY md5(text) HAVING count(*) > 1
""")
def dedup_exact_docs(spark, sf_dir):
    """Exact dedup: hash-groupBy on content hash; keeper = min doc_id
    (map-side partial agg collapses copies before the shuffle)."""
    c = _corpus(spark, sf_dir)
    return (c.groupBy(F.md5("text").alias("content_hash"))
            .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper"))
            .filter(F.col("n_copies") > 1))



def _new_docs(d: DataFrame) -> DataFrame:
    """The injected near-dup INGEST BATCH shared by every dedup-groups
    query (and its oracles): a copy of each doc_id % 50 == 0 doc at
    +100000 and a second copy of each % 100 == 0 doc at +200000 — 2- and
    3-member groups. New ids are all >= 100000, originals all below."""
    return (d.filter(F.col("doc_id") % 50 == 0)
            .withColumn("doc_id", F.col("doc_id") + 100000)
            .unionByName(d.filter(F.col("doc_id") % 100 == 0)
                         .withColumn("doc_id", F.col("doc_id") + 200000)))


_MINHASH_COLS = ", ".join(
    f"min(md5('{k}:' || shingle)) AS mh{k}" for k in range(N_MINHASH))
_BAND_SQL = " UNION ALL ".join(
    "SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sig".format(
        b=b, cols=" || ".join(f"mh{k}" for k in range(b * (N_MINHASH // LSH_BANDS),
                                                      (b + 1) * (N_MINHASH // LSH_BANDS))))
    for b in range(LSH_BANDS))


@q("dedup_minhash_lsh", _SHINGLE_SQL + f""",
sig AS (SELECT doc_id, {_MINHASH_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BAND_SQL})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
""")
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash + LSH near-dup candidates: shingle -> K seeded md5 minhashes
    -> banded bucket hash -> equi-self-join on (band, bucket).

    The scale path: cost is linear in corpus size + bucket-join fan-out;
    never all-pairs."""
    return minhash_pairs(_corpus(spark, sf_dir))


_CAP_BUCKET = 2   # hot-bucket cap for the oracle-checked capped variant


@q("dedup_lsh_capped", _SHINGLE_SQL + f""",
sig AS (SELECT doc_id, {_MINHASH_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BAND_SQL}),
kept AS (
  SELECT b.doc_id, b.band, b.bucket
  FROM bands b JOIN (SELECT band, bucket FROM bands
                     GROUP BY band, bucket
                     HAVING count(*) <= {_CAP_BUCKET}) s
    USING (band, bucket)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM kept a JOIN kept b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
""")
def dedup_lsh_capped(spark, sf_dir):
    """MinHash+LSH pairs under the HOT-BUCKET GUARD
    (``canonical_pairs(max_bucket=...)``): buckets holding more than
    ``_CAP_BUCKET`` docs are dropped from the join — at web scale a
    boilerplate bucket with k members would emit k²/2 pairs from one
    task; oversized buckets route to the dedup decision as bulk
    near-identical clusters instead. The oracle applies the identical
    per-(band, bucket) cap, so the dropped-pair semantics are
    hash-checked, not just pytest-pinned."""
    bands = minhash_bands(_corpus(spark, sf_dir))
    return _pairs_from_bands(bands, bands, symmetric=True,
                             max_bucket=_CAP_BUCKET)


_GROUPS_CORPUS_SQL = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 100 = 0
),
w AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM corpus),
sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 2)) AS i) g
),
sig AS (SELECT doc_id, {{cols}} FROM sh GROUP BY doc_id),
bands AS ({{bands}})"""


@q("dedup_lsh_incr", _GROUPS_CORPUS_SQL.format(
    cols=_MINHASH_COLS, bands=_BAND_SQL) + """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id AND b.doc_id >= 100000
""")
def dedup_lsh_incr(spark, sf_dir):
    """INCREMENTAL candidate-pair generation
    (``minhash_pairs_incremental``) — the ingest half of continuous
    dedup: the batch's injected duplicates compute their own bands and
    probe the standing band table of the original docs; cost is
    O(batch), the standing corpus is never re-shingled. The oracle is
    the full-corpus LSH self-join restricted to pairs touching a new doc
    (new ids are all >= 100000, so the canonical greater id decides)."""
    d = _docs(spark, sf_dir)
    new = _new_docs(d)
    pairs, _ = minhash_pairs_incremental(minhash_bands(d), new)
    return pairs


def ngram_jaccard_pairs(sh: DataFrame, threshold: float = 0.5,
                        max_rows: int | None = -1) -> DataFrame:
    """Exact n-gram Jaccard pairs from a (doc_id, shingle) frame — the
    QUADRATIC-per-shingle-bucket verification twin of the MinHash+LSH
    candidate generator above. ``max_rows`` fails fast on big corpora,
    counted in DISTINCT documents; same convention as ``cdc.vectors``:
    default = the shared QUADRATIC_MAX_ROWS bound, ``None`` forces
    through."""
    from cdc.vectors import QUADRATIC_MAX_ROWS, guard_quadratic
    if max_rows == -1:
        max_rows = QUADRATIC_MAX_ROWS
    guard_quadratic(sh.select("doc_id").distinct(), "ngram_jaccard_pairs",
                    "dedup_minhash_lsh (banded MinHash)", max_rows)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
            .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
            .filter(jac >= threshold)
            .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard")))


@q("dedup_ngram_jaccard", _SHINGLE_SQL + """,
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common), 4) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
             JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.5
""")
def dedup_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup: exact set similarity via shingle self-join
    (the oracle/verification path; LSH above is the candidate generator at
    scale; guarded by QUADRATIC_MAX_ROWS)."""
    return ngram_jaccard_pairs(_shingles(_corpus(spark, sf_dir)))


_SIMHASH_BITS = 32
_SIM_BIT_SQL = " + ".join(
    f"(CASE WHEN sum(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) > 0 "
    f"THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS))


@q("dedup_simhash", _CORPUS_SQL + """,
w AS (
  SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS word FROM corpus
),
h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS h FROM w)
SELECT doc_id, CAST(""" + _SIM_BIT_SQL + """ AS BIGINT) AS simhash
FROM h GROUP BY doc_id
""")
def dedup_simhash(spark, sf_dir):
    """SimHash signatures: 32-bit bitwise-majority over distinct-word
    hashes (md5-derived, identical on both sides). Near-dups share
    signatures within small Hamming distance; exact copies collide."""
    return simhash_signatures(_corpus(spark, sf_dir))


def simhash_signatures(c: DataFrame) -> DataFrame:
    """Engine operator (``cdc.simhash.simhash_signatures``) — re-exported
    here so the oracle pairs stay next to their SQL."""
    from cdc.simhash import simhash_signatures as _sig
    return _sig(c)


# banding parameters live with the engine operator: cdc.simhash
# (SIM_BANDS=4 over the 32 bits; SIM_MAX_DIST=3 is pigeonhole-complete)


@q("dedup_simhash_pairs", _CORPUS_SQL + """,
w AS (
  SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS word FROM corpus
),
h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS h FROM w),
sig AS (SELECT doc_id, CAST(""" + _SIM_BIT_SQL + """ AS BIGINT) AS simhash
        FROM h GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""")
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash PAIR EXTRACTION: banded Hamming-bucket self-join over the
    32-bit signatures -> candidate pairs -> exact Hamming filter (<= 3).

    The banding is COMPLETE for the distance bound (pigeonhole over 4
    bands), so the output equals the oracle's all-pairs formulation while
    the Spark plan never goes quadratic: the join is an equi-join on
    (band, band_bits) — linear in corpus size + bucket fan-out at scale."""
    sig = dedup_simhash(spark, sf_dir)  # (doc_id, simhash)
    banded = _sim_banded(sig)
    return _sim_pairs(banded, banded, symmetric=True)


def _sim_banded(sig: DataFrame) -> DataFrame:
    """Engine operator (``cdc.simhash.sim_banded``)."""
    from cdc.simhash import sim_banded
    return sim_banded(sig)


def _sim_pairs(a_banded: DataFrame, b_banded: DataFrame,
               symmetric: bool = False) -> DataFrame:
    """Engine operator (``cdc.simhash.sim_pairs``)."""
    from cdc.simhash import sim_pairs
    return sim_pairs(a_banded, b_banded, symmetric)


# incremental oracle = the full pair extraction restricted to pairs
# touching a new doc (new ids all >= 100000 -> the canonical greater id)
_SIM_INCR_SQL = ORACLES["dedup_simhash_pairs"].replace(
    "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3",
    "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3 AND b.doc_id >= 100000")
assert "AND b.doc_id >= 100000" in _SIM_INCR_SQL


@q("dedup_simhash_incr", _SIM_INCR_SQL)
def dedup_simhash_incr(spark, sf_dir):
    """INCREMENTAL SimHash pair extraction — the third dedup family's
    ingest probe (MinHash: ``dedup_lsh_incr``; embeddings:
    ``dedup_embed_lsh_incr``): signatures are a pure per-doc function,
    so the batch (the injected duplicates) computes its own 32-bit
    signatures and probes standing ∪ new via the banded Hamming join —
    O(batch), pigeonhole-complete for distance <= 3, the standing corpus
    is never re-hashed. Its bands derive from the standing (doc_id,
    simhash) table by pure bit ops, so ONE long per doc is the whole
    state at rest."""
    d = _docs(spark, sf_dir)
    new = (d.filter(F.col("doc_id") % 50 == 0)
           .withColumn("doc_id", F.col("doc_id") + 100000))
    standing = simhash_signatures(d)        # at rest in production
    nb = _sim_banded(simhash_signatures(new)).localCheckpoint(eager=True)
    return _sim_pairs(nb, _sim_banded(standing).unionByName(nb))


# -- training-set assembly ops (split / quota / packing / decontamination) --

_HOLDOUT_PCT = 10   # percent of keys routed to the holdout split
_DOMAIN_CAP = 15    # max docs kept per source domain (binds at every sf:
                    # sf0.01 has 25 docs/source)
_BIN_BUDGET = 256   # token budget per packed training bin


def _md5_bucket(col, mod: int):
    """Deterministic [0, mod) bucket from md5 of a column — the same
    expression DuckDB spells ('0x' || substr(md5(x),1,8))::BIGINT % mod.
    Stable across runs, machines and engines (unlike Spark's hash), which
    is exactly what a train/holdout split must be: re-running the pipeline
    on a grown corpus never moves an old doc across the split boundary."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("long") % mod).cast("int")


@q("txt_split_holdout", f"""
WITH b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % 100 AS INT) AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < {_HOLDOUT_PCT} THEN 'holdout' ELSE 'train' END AS split
FROM b
""")
def txt_split_holdout(spark, sf_dir):
    """Deterministic train/holdout split: md5-bucket the stable key and
    route ~10% to holdout. Pure column expression — linear, no shuffle,
    and engine-independent (md5, not Spark's murmur3), so the split
    reproduces anywhere and survives corpus growth."""
    d = _docs(spark, sf_dir)
    b = _md5_bucket(F.col("doc_id"), 100)
    return d.select(
        "doc_id", b.alias("bucket"),
        F.when(b < _HOLDOUT_PCT, "holdout").otherwise("train").alias("split"))


def domain_quota(docs: DataFrame, cap: int, salts: int = 16) -> DataFrame:
    """Per-domain quota sampling, TWO-STAGE SALTED (the mega-domain-safe
    form): stage 1 ranks within (source, salt) and keeps <= cap per salt
    bucket — a provable SUPERSET of the global per-source top-cap (any row
    in the global top-cap is within the top-cap of its own bucket); stage 2
    re-ranks the <= cap*salts survivors per source. The web-corpus skew
    case (one domain = half the corpus) never serializes on a single
    window task: stage 1 spreads it over ``salts`` tasks and stage 2 sees
    at most cap*salts rows per domain, never the domain.

    Priority is the deterministic md5 of doc_id (an engine-reproducible
    uniform sample); ties break on doc_id. Returns (doc_id, source, rn)
    with rn = the exact global rank 1..cap — identical output to the
    single-window form."""
    pri = F.md5(F.col("doc_id").cast("string"))
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(salts))
    w1 = Window.partitionBy("source", "_salt").orderBy("_pri", "doc_id")
    survivors = (docs.select("doc_id", "source", pri.alias("_pri"),
                             salt.alias("_salt"))
                 .withColumn("_rn1", F.row_number().over(w1))
                 .filter(F.col("_rn1") <= cap))
    w2 = Window.partitionBy("source").orderBy("_pri", "doc_id")
    return (survivors.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= cap)
            .select("doc_id", "source", "rn"))


@q("txt_domain_quota", f"""
SELECT doc_id, source, CAST(rn AS INT) AS rn FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= {_DOMAIN_CAP}
""")
def txt_domain_quota(spark, sf_dir):
    """Per-domain quota sampling (domain balancing): keep at most K docs
    per source, chosen by deterministic md5 priority — a uniform random
    sample that is reproducible across engines. Runs the two-stage salted
    form (``domain_quota``); the oracle pins that its output equals the
    single-window global rank."""
    return domain_quota(_docs(spark, sf_dir), _DOMAIN_CAP)


@q("txt_pack_bins", f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, source, n_tokens,
       CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - n_tokens) // {_BIN_BUDGET} AS BIGINT) AS bin
FROM t
""")
def txt_pack_bins(spark, sf_dir):
    """Token-budget sequence packing: assign docs to ~256-token training
    bins per source, in stable doc_id order — bin = floor(prefix_sum /
    budget), the deterministic streaming form of greedy first-fit packing
    (each bin may overflow by at most one doc, never underfill by more
    than the last doc).

    Scale: one running-sum window per source partition; the order column
    is the stable key, so packing is reproducible under any parallelism."""
    d = _docs(spark, sf_dir)
    n = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    t = d.select("doc_id", "source", n.alias("n_tokens"))
    return t.select(
        "doc_id", "source", "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens"))
                / _BIN_BUDGET).alias("bin"))


_DOC_SHINGLE_SQL = """
WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 2)) AS i) g
)
"""


@q("txt_decontaminate", _DOC_SHINGLE_SQL + """
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM sh s
JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0) b USING (shingle)
WHERE s.doc_id % 97 <> 0
GROUP BY s.doc_id
""")
def txt_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training docs sharing any 3-gram
    shingle with the eval set (here: doc_id % 97 == 0 stands in for the
    benchmark corpus). Returns contaminated doc ids with their shared
    shingle count; the clean set is the anti-join complement.

    Scale: the benchmark shingle set is small by construction — broadcast
    it, so the contamination check is a map-side hash probe over the
    training corpus (no shuffle of the big side). Shingles are distinct
    per doc, so the count needs no DISTINCT re-agg."""
    sh = _shingles(_docs(spark, sf_dir))
    bench = (sh.filter(F.col("doc_id") % 97 == 0)
             .select("shingle").distinct())
    return (sh.filter(F.col("doc_id") % 97 != 0)
            .join(F.broadcast(bench), "shingle")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared")))


@q("txt_decontaminate_bloom", ORACLES["txt_decontaminate"])
def txt_decontaminate_bloom(spark, sf_dir):
    """``txt_decontaminate`` with a BLOOM PREFILTER (``cdc.bloom``): the
    benchmark shingle set is summarized into a ~10-bits/key bitset
    (distributed build: vectorized position emit + one ``bit_or`` word
    aggregate), broadcast once, and the training side probes it map-side
    (vectorized pandas UDF over the shared numpy bitset — no shuffle, no
    join). Only the ~1% surviving fraction reaches the exact broadcast
    join, which removes the false positives — the result is identical to
    the join-only plan (same oracle). At 10^8 benchmark keys the bitset
    is ~60x smaller than the exact hash set a broadcast join ships."""
    from cdc.bloom import bloom_prefilter, build_bloom

    sh = _shingles(_docs(spark, sf_dir))
    bench = (sh.filter(F.col("doc_id") % 97 == 0)
             .select("shingle").distinct()
             # consumed twice (bloom build + exact confirm) and probed by
             # a count for sizing — don't recompute the shingle plan
             .localCheckpoint(eager=True))
    bloom = build_bloom(bench, "shingle", expected=max(1024, bench.count()))
    training = sh.filter(F.col("doc_id") % 97 != 0)
    return (bloom_prefilter(training, "shingle", bloom)
            .join(F.broadcast(bench), "shingle")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared")))


@q("dedup_groups", f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 100 = 0
),
w AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM corpus),
sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 2)) AS i) g
),
sig AS (SELECT doc_id, {_MINHASH_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BAND_SQL}),
edges AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
und AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach AS (
  SELECT a AS id, a AS r FROM und
  UNION
  SELECT u.b AS id, reach.r FROM reach JOIN und u ON u.a = reach.id
)
SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS group_id
FROM reach GROUP BY id
""")
def dedup_groups(spark, sf_dir):
    """Transitive near-dup GROUPS — the keeper-selection step a real
    dedup pipeline needs after pair generation: LSH candidate pairs chain
    (a~b, b~c => one group), so components, not pairs, decide keepers.
    Corpus injects TWO copies of every doc_id % 100 == 0 doc (3-member
    groups) and one copy of the other % 50 == 0 docs (2-member groups);
    edges come from the same banded MinHash join as ``dedup_minhash_lsh``
    and components from ``cdc.cc.connected_components`` (iterative
    min-label propagation: one equi-join + one groupBy-min per round,
    rounds = graph diameter — 1–2 for dup near-cliques; the
    large-star/small-star form is the documented long-chain escalation).
    The oracle recomputes the closure with a recursive CTE."""
    from cdc.cc import connected_components

    d = _docs(spark, sf_dir)
    c = d.unionByName(_new_docs(d))
    comp = connected_components(minhash_pairs(c), src="doc_a", dst="doc_b")
    return comp.select(F.col("id").alias("doc_id"),
                       F.col("grp").cast("long").alias("group_id"))


@q("dedup_groups_star", ORACLES["dedup_groups"])
def dedup_groups_star(spark, sf_dir):
    """``dedup_groups`` computed with the large-star/small-star form
    (``cdc.cc.connected_components_star``, Kiveris et al. SoCC'14) instead
    of min-label propagation — the O(log^2 n)-round path a web-scale graph
    with long chains escalates to (propagation needs diameter rounds).
    Same corpus, same banded-MinHash edges, same recursive-CTE oracle:
    both forms must land identical (doc_id, group_id) assignments."""
    from cdc.cc import connected_components_star

    d = _docs(spark, sf_dir)
    c = d.unionByName(_new_docs(d))
    comp = connected_components_star(minhash_pairs(c),
                                     src="doc_a", dst="doc_b")
    return comp.select(F.col("id").alias("doc_id"),
                       F.col("grp").cast("long").alias("group_id"))


@q("dedup_groups_incr", ORACLES["dedup_groups"])
def dedup_groups_incr(spark, sf_dir):
    """``dedup_groups`` computed INCREMENTALLY
    (``cdc.cc.connected_components_incremental``) — the continuous-dedup
    shape: components over the original docs' pairs first (the standing
    assignment), then the injected duplicates' pairs merged in as the
    "new ingest" (O(churn): untouched components pass through without a
    CC round; here the split is a filter on the same banded-MinHash pair
    list, in a real pipeline the ingest emits only the new docs' pairs).
    Same recursive-CTE oracle: the merged assignment must be identical
    to the one-shot recompute."""
    from cdc.cc import connected_components, \
        connected_components_incremental

    d = _docs(spark, sf_dir)
    c = d.unionByName(_new_docs(d))
    pairs = minhash_pairs(c)
    prior = connected_components(
        pairs.filter((F.col("doc_a") < 100000) & (F.col("doc_b") < 100000)),
        src="doc_a", dst="doc_b")
    new = pairs.filter((F.col("doc_a") >= 100000)
                       | (F.col("doc_b") >= 100000))
    comp = connected_components_incremental(prior, new,
                                            src="doc_a", dst="doc_b")
    return comp.select(F.col("id").alias("doc_id"),
                       F.col("grp").cast("long").alias("group_id"))


@q("dedup_groups_cont", ORACLES["dedup_groups"])
def dedup_groups_cont(spark, sf_dir):
    """END-TO-END continuous dedup ingest: everything is derived from the
    STANDING STATE (band table + component assignment of the original
    corpus) and the INGEST BATCH alone — unlike ``dedup_groups_incr``,
    which filters a one-shot pair list, nothing here ever re-shingles or
    re-pairs the standing corpus. The batch computes its own bands,
    probes the standing band table (``minhash_pairs_incremental``,
    O(batch)), and the resulting pairs merge into the standing
    assignment (``connected_components_incremental``, O(churn)). Must be
    identical to the one-shot recompute — same recursive-CTE oracle as
    ``dedup_groups``."""
    from cdc.cc import connected_components, \
        connected_components_incremental

    d = _docs(spark, sf_dir)
    new = _new_docs(d)
    # standing state: consumed twice (prior components + the ingest probe)
    standing = minhash_bands(d).localCheckpoint(eager=True)
    prior = connected_components(
        _pairs_from_bands(standing, standing, symmetric=True),
        src="doc_a", dst="doc_b")
    new_pairs, _ = minhash_pairs_incremental(standing, new)
    comp = connected_components_incremental(prior, new_pairs,
                                            src="doc_a", dst="doc_b")
    return comp.select(F.col("id").alias("doc_id"),
                       F.col("grp").cast("long").alias("group_id"))


# keepers oracle = the dedup_groups closure with its final per-node
# select folded into a CTE and grouped per component
_KEEPERS_SQL = ORACLES["dedup_groups"].replace(
    """SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS group_id
FROM reach GROUP BY id""",
    """, comp AS (
  SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS group_id
  FROM reach GROUP BY id
)
SELECT group_id, CAST(min(doc_id) AS BIGINT) AS keeper,
       CAST(count(*) AS BIGINT) AS n_members
FROM comp GROUP BY group_id""")


@q("dedup_keepers", _KEEPERS_SQL)
def dedup_keepers_q(spark, sf_dir):
    """The KEEPER DECISION TABLE — the final deliverable of a dedup
    pipeline: one keeper per transitive group (the min doc id,
    deterministic) plus the group size, via ``cdc.cc.dedup_keepers`` over
    the same components as ``dedup_groups``."""
    from cdc.cc import connected_components, dedup_keepers

    d = _docs(spark, sf_dir)
    c = d.unionByName(_new_docs(d))
    comp = connected_components(minhash_pairs(c), src="doc_a", dst="doc_b")
    return (dedup_keepers(comp)
            .select(F.col("group_id").cast("long").alias("group_id"),
                    F.col("keeper").cast("long").alias("keeper"),
                    F.col("n_members").cast("long").alias("n_members")))


# -- CDC-complete standing dedup state (round-5 flagship) ----------------------
# The final corpus after the op-typed change epoch: %97==3 docs adopt their
# floor-50 doc's text (joining that dup cluster), the +100000 copies of
# %100==0 docs get a unique sentinel body (leaving their cluster), the
# +200000 copies are DELETED, and fresh +300000 duplicates of %100==25 docs
# are INSERTED. The oracle recomputes groups one-shot over this final
# corpus — any stale band row, unsplit component or surviving deleted doc
# in the standing state hash-mismatches. Singletons are part of the
# standing assignment (grp = own id), so the oracle emits them too.
_UPD_CORPUS = """corpus AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 97 = 3 THEN f.text ELSE d.text END AS text
  FROM documents d JOIN documents f ON f.doc_id = d.doc_id - d.doc_id % 50
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         'replaced ' || CAST(doc_id AS VARCHAR) || ' sentinel unique body'
           AS text
  FROM documents WHERE doc_id % 100 = 0
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
  WHERE doc_id % 50 = 0 AND doc_id % 100 <> 0
  UNION ALL
  SELECT doc_id + 300000 AS doc_id, text FROM documents
  WHERE doc_id % 100 = 25
)"""


@q("dedup_groups_upd", f"""
WITH RECURSIVE {_UPD_CORPUS},
w AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM corpus),
sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 2)) AS i) g
),
sig AS (SELECT doc_id, {_MINHASH_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BAND_SQL}),
edges AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
und AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach AS (
  SELECT a AS id, a AS r FROM und
  UNION
  SELECT u.b AS id, reach.r FROM reach JOIN und u ON u.a = reach.id
),
comp AS (
  SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS group_id
  FROM reach GROUP BY id
)
SELECT doc_id, group_id FROM comp
UNION ALL
SELECT doc_id, CAST(doc_id AS BIGINT) AS group_id FROM corpus
WHERE doc_id NOT IN (SELECT doc_id FROM comp)
""")
def dedup_groups_upd(spark, sf_dir):
    """CDC-COMPLETE standing dedup state (the round-4 weak flag closed):
    documents UPDATE and DELETE flow through
    ``cdc.stream.dedup.apply_doc_changes`` — retire+insert band netting
    from pre/post images (tombstones land in their OLD bucket partitions,
    honoring the part_cols contract), affected components rebuilt from
    current payloads (splits fall out by construction), everything else
    O(changed docs + affected components). The standing GROUPS TABLE after
    the change epoch must equal a one-shot recompute over the FINAL
    corpus — updates that join a cluster, updates that leave one, deletes
    that shrink or dissolve groups, and plain inserts all at once."""
    from cdc.parity.udf_q import _scratch
    from cdc.stream.dedup import (MINHASH, apply_doc_changes, dedup_tables,
                                  ingest_dedup_batch)

    d = _docs(spark, sf_dir)
    root = _scratch("cdc_dedup_upd")
    bands, groups = dedup_tables(f"{root}/b", f"{root}/g", n_partitions=8)
    ingest_dedup_batch(spark, bands, groups, d.unionByName(_new_docs(d)),
                       "e0", family=MINHASH)

    i = F.col("doc_id")
    floor50 = F.col("f.doc_id") == F.col("e.doc_id") - F.col("e.doc_id") % 50
    upd_join = (d.alias("e").filter(F.col("e.doc_id") % 97 == 3)
                .join(d.alias("f"), floor50)
                .select(F.col("e.doc_id").alias("doc_id"),
                        F.lit("U").alias("op"),
                        F.col("f.text").alias("text"),
                        F.col("e.text").alias("text_pre")))
    upd_leave = (d.filter(i % 100 == 0)
                 .select((i + 100000).alias("doc_id"),
                         F.lit("U").alias("op"),
                         F.concat(F.lit("replaced "), i.cast("string"),
                                  F.lit(" sentinel unique body"))
                         .alias("text"),
                         F.col("text").alias("text_pre")))
    dels = (d.filter(i % 100 == 0)
            .select((i + 200000).alias("doc_id"), F.lit("D").alias("op"),
                    F.lit(None).cast("string").alias("text"),
                    F.col("text").alias("text_pre")))
    ins = (d.filter(i % 100 == 25)
           .select((i + 300000).alias("doc_id"), F.lit("I").alias("op"),
                   F.col("text"),
                   F.lit(None).cast("string").alias("text_pre")))
    changes = (upd_join.unionByName(upd_leave)
               .unionByName(dels).unionByName(ins))

    # the post-change corpus — what fetch_docs must serve (in a live
    # pipeline this is the documents table itself, already merged)
    base = (d.alias("e").join(d.alias("f"), floor50)
            .select(F.col("e.doc_id").alias("doc_id"),
                    F.when(F.col("e.doc_id") % 97 == 3, F.col("f.text"))
                    .otherwise(F.col("e.text")).alias("text")))
    final = (base.unionByName(upd_leave.select("doc_id", "text"))
             .unionByName(d.filter((i % 50 == 0) & (i % 100 != 0))
                          .select((i + 100000).alias("doc_id"), "text"))
             .unionByName(ins.select("doc_id", "text")))

    apply_doc_changes(
        spark, bands, groups, changes, "c1", family=MINHASH,
        fetch_docs=lambda sp, ids: final.join(ids, "doc_id", "left_semi"))
    # the standing table stores a row only for docs that have ever been
    # LABELED (pair endpoints / rebuild nodes) — a never-paired doc is
    # implicitly its own group, so at corpus scale the assignment stays
    # O(docs-in-groups), not O(corpus). Materialize the implicit
    # singletons from the live corpus for the full-assignment compare.
    g = (groups.read(spark)
         .select("doc_id", F.col("grp").cast("long").alias("group_id")))
    sing = (final.select("doc_id")
            .join(g.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.col("doc_id").alias("group_id")))
    return g.unionByName(sing)


@q("txt_repetition", """
WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents),
g AS (
  SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS gram
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 2)) AS i) t
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
       round(1.0 - CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 4)
         AS dup_ratio,
       CASE WHEN 1.0 - CAST(count(DISTINCT gram) AS DOUBLE) / count(*) > 0.5
            THEN true ELSE false END AS is_repetitive
FROM g GROUP BY doc_id
""")
def txt_repetition(spark, sf_dir):
    """Repetition filter (the Gopher/RefinedWeb duplicate-n-gram signal):
    per doc, the fraction of 3-gram occurrences that are repeats of an
    earlier gram — boilerplate and looped generations score high. One
    explode + one count/count-distinct aggregate, map-side combinable;
    docs shorter than 3 words have no grams and drop out (same as the
    oracle's empty generate_series)."""
    d = _docs(spark, sf_dir)
    words = F.split(F.trim(F.col("text")), " ")
    idx = F.when(F.size(words) >= 3,
                 F.sequence(F.lit(0), F.size(words) - 3)
                 ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(words, (i + k + 1).cast("int"))
               for k in range(3)]))
    g = d.select("doc_id", F.explode(gram).alias("gram"))
    agg = g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("gram").alias("n_distinct"))
    dup = F.round(1.0 - F.col("n_distinct").cast("double")
                  / F.col("n_grams"), 4)
    return agg.select(
        "doc_id", "n_grams", "n_distinct", dup.alias("dup_ratio"),
        ((1.0 - F.col("n_distinct").cast("double") / F.col("n_grams"))
         > 0.5).alias("is_repetitive"))
