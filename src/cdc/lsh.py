"""MinHash + LSH near-duplicate detection — the ENGINE's standing-state
dedup operators (moved out of the oracle-parity package so the streaming
path doesn't depend on the grading harness).

Everything is JVM-side column expressions (split / transform / md5 /
explode) — no Python in the hot path — and every construction has an
identical-hash DuckDB formulation in ``cdc.parity.textops``, so oracle
candidate pairs match exactly.

Scale notes: the shingle explode is the classic map-side blowup
(~n_words rows per doc); at 100 TB this runs as repartition-by-doc
before the signature groupBy so partial aggregation collapses shingles
locally. The band join is an equi-join on (band, bucket) —
shuffle-partitioned, broadcast-free, skew bounded by band-bucket
cardinality. The incremental probe is O(batch): LSH state is a pure
per-doc function, so a standing corpus is never re-shingled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MINHASH = 8   # minhash signature length
LSH_BANDS = 4   # bands (rows per band = N_MINHASH // LSH_BANDS)


def shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc, as (doc_id, shingle) rows.
    Pure column ops: split -> transform(sequence) -> explode."""
    words = F.split(F.trim(F.col("text")), " ")
    # short docs (< n words) must yield ZERO shingles: an unguarded
    # sequence(0, size-n) DESCENDS when size < n (e.g. [0,-1]) and
    # element_at(words, 0) throws — guard with an empty index array,
    # matching the oracle's empty generate_series(1, len-2).
    idx = F.when(F.size(words) >= n,
                 F.sequence(F.lit(0), F.size(words) - n)
                 ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(words, (i + k + 1).cast("int")) for k in range(n)]))
    return (df.select("doc_id", F.explode(sh).alias("shingle"))
            .dropDuplicates(["doc_id", "shingle"]))


def minhash_bands(c: DataFrame) -> DataFrame:
    """Banded MinHash signature rows (doc_id, band, bucket) for a
    (doc_id, text) corpus: shingle -> K seeded md5 minhashes -> per-band
    bucket hash. This is the STANDING STATE of a continuous dedup
    pipeline — signatures are a pure per-doc function, so a doc's rows
    never change after ingest; at rest the table is bucketed by
    (band, bucket) so ingest probes are join-local."""
    sh = shingles(c)
    r = N_MINHASH // LSH_BANDS
    sig = sh.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat(F.lit(f"{k}:"), F.col("shingle")))).alias(f"mh{k}")
        for k in range(N_MINHASH)])
    # one explode, not a 4-way union: a union would recompute the whole
    # shingle->signature pipeline once per band
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.md5(F.concat(*[F.col(f"mh{k}")
                                  for k in range(b * r, (b + 1) * r)])).alias("bucket"))
        for b in range(LSH_BANDS)])
    return (sig.select("doc_id", F.explode(band_arr).alias("bb"))
            .select("doc_id", F.col("bb.band").alias("band"),
                    F.col("bb.bucket").alias("bucket")))


def canonical_pairs(a_side: DataFrame, b_side: DataFrame, id_col: str,
                    key_cols: tuple[str, ...], out_a: str, out_b: str,
                    symmetric: bool = False,
                    max_bucket: int | None = None) -> DataFrame:
    """Canonical candidate pairs (out_a < out_b) from two banded frames:
    equi-join on ``key_cols``, self-pairs dropped, duplicates (several
    shared buckets, both probe directions) collapsed. Shared by the
    MinHash (doc_id/(band, bucket)) and random-hyperplane
    (vec_id/(band, bval)) paths. ``symmetric=True`` (a self-join) keeps
    only the a < b half — same result, half the join output; an
    asymmetric probe MUST keep ``!=`` or it would miss pairs whose
    smaller id is on the probe side.

    ``max_bucket`` — HOT-BUCKET GUARD for web scale: the join is
    quadratic WITHIN a bucket, so one bucket holding k near-identical
    docs emits k²/2 pairs (a million boilerplate copies -> 5·10¹¹ rows
    out of one task). Buckets on the build side with more than
    ``max_bucket`` members are dropped from the join (one extra
    aggregation on the narrow band frame). Recall note: a pair sharing
    ONLY oversized buckets is missed — at scale such docs are handled as
    a bulk near-identical CLUSTER (every member of an oversized bucket
    is a near-dup of every other; route the bucket itself to the dedup
    decision instead of enumerating its pairs). Default None keeps the
    exact oracle-checked semantics."""
    if max_bucket is not None:
        keep = (b_side.groupBy(*key_cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") <= max_bucket)
                .drop("_n"))
        b_side = b_side.join(keep, list(key_cols), "left_semi")
        if symmetric:
            a_side = b_side
        else:
            a_side = a_side.join(keep, list(key_cols), "left_semi")
    a = a_side.alias("a")
    b2 = b_side.alias("b")
    cond = ((F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) if symmetric
            else (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")))
    for k in key_cols:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    return (a.join(b2, cond)
            .select(F.least(f"a.{id_col}", f"b.{id_col}").alias(out_a),
                    F.greatest(f"a.{id_col}", f"b.{id_col}").alias(out_b))
            .distinct())


def pairs_from_bands(a_bands: DataFrame, b_bands: DataFrame,
                     symmetric: bool = False,
                     max_bucket: int | None = None) -> DataFrame:
    """MinHash instantiation of ``canonical_pairs``."""
    return canonical_pairs(a_bands, b_bands, "doc_id", ("band", "bucket"),
                           "doc_a", "doc_b", symmetric, max_bucket)


def minhash_pairs(c: DataFrame) -> DataFrame:
    """MinHash + LSH candidate pairs (doc_a, doc_b) from a (doc_id, text)
    corpus: shingle -> K seeded md5 minhashes -> banded bucket hash ->
    equi-self-join on (band, bucket). Linear in corpus size + bucket
    fan-out — never all-pairs."""
    bands = minhash_bands(c)
    return pairs_from_bands(bands, bands, symmetric=True)


def minhash_pairs_incremental(standing_bands: DataFrame,
                              new_docs: DataFrame
                              ) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs for ONE ingest batch against a standing corpus —
    O(batch), never O(corpus). Bands are computed ONLY for the new docs
    (LSH state is per-doc, so standing rows never change); the probe is
    one equi-join of the new bands against standing ∪ new on
    (band, bucket), which yields EXACTLY the pairs of the full self-join
    that touch a new doc (pairs among old docs were emitted by earlier
    batches). Returns (pairs, new_bands) — the caller appends new_bands
    to the standing table. At scale the batch side is small (broadcast);
    the standing table is bucketed by (band, bucket) so the probe
    shuffles only the batch. Feed the pairs to
    ``cdc.cc.connected_components_incremental`` for the O(churn) group
    merge — together they are the continuous-dedup ingest path."""
    nb = (minhash_bands(new_docs)
          # consumed twice (probe side + the union) — don't run the
          # shingle -> signature pipeline twice
          .localCheckpoint(eager=True))
    return pairs_from_bands(nb, standing_bands.unionByName(nb)), nb
