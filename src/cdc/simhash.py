"""SimHash near-duplicate detection — the ENGINE's standing-state form of
the third dedup family (MinHash: ``cdc.lsh``; embeddings: ``cdc.vectors``).

State at rest is ONE 32-bit signature per document (bitwise majority of
distinct-word hashes — a pure per-doc function, never recomputed); the
banded rows derive from it by pure bit ops. Pair extraction is a banded
Hamming-bucket equi-join, pigeonhole-COMPLETE for distance <= SIM_MAX_DIST
(<= 3 differing bits can corrupt at most 3 of the 4 bands, so one band
always matches) — linear in corpus size + bucket fan-out, never all-pairs.

Everything is JVM-side column expressions; the DuckDB formulation lives in
``cdc.parity.textops`` (which delegates here) so oracle pairs match
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 32
SIM_BANDS = 4           # 8 bits per band -> 256 values/band keeps the
                        # bucket-join fan-out sub-quadratic at corpus scale
SIM_MAX_DIST = 3        # pigeonhole completeness bound for SIM_BANDS=4


def simhash_signatures(c: DataFrame) -> DataFrame:
    """(doc_id, simhash) 32-bit SimHash per document — a pure per-doc
    function (bitwise majority of distinct-word hashes), so like the
    MinHash/hyperplane band tables it is STANDING STATE a continuous
    pipeline appends to, never recomputes."""
    w = (c.select("doc_id",
                  F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"))
         .dropDuplicates(["doc_id", "word"]))
    h = w.select("doc_id",
                 F.conv(F.substring(F.md5("word"), 1, 8), 16, 10)
                 .cast("long").alias("h"))
    bit_votes = [
        F.sum(F.when((F.col("h").bitwiseAND(F.lit(1 << j))) > 0, 1)
              .otherwise(-1)).alias(f"v{j}")
        for j in range(SIMHASH_BITS)]
    votes = h.groupBy("doc_id").agg(*bit_votes)
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.cast("long").alias("simhash"))


def sim_banded(sig: DataFrame) -> DataFrame:
    """(doc_id, simhash, band, bval): the signature's bands, derived from
    the standing (doc_id, simhash) table by pure bit ops — no shuffle, so
    the signature table alone is the state at rest (a continuous pipeline
    that keeps the BANDED rows as its standing table trades 4x rows for
    partition-pruned (band, bval) probes)."""
    bits_per_band = SIMHASH_BITS // SIM_BANDS
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright(F.col("simhash"), b * bits_per_band)
                 .bitwiseAND(F.lit((1 << bits_per_band) - 1)).alias("bval"))
        for b in range(SIM_BANDS)])
    return (sig.select("doc_id", "simhash", F.explode(band_arr).alias("bb"))
            .select("doc_id", "simhash", F.col("bb.band").alias("band"),
                    F.col("bb.bval").alias("bval")))


def sim_pairs(a_banded: DataFrame, b_banded: DataFrame,
              symmetric: bool = False) -> DataFrame:
    """Banded-join candidates + exact Hamming filter; the simhash rides
    the band rows so the filter needs no signature re-join. Same
    symmetric/asymmetric contract as ``cdc.lsh.canonical_pairs`` (the
    hamming output column keeps this a separate shape): an asymmetric
    probe MUST keep ``!=`` or it would miss pairs whose smaller id is on
    the probe side."""
    a = a_banded.alias("a")
    b = b_banded.alias("b")
    ids = ((F.col("a.doc_id") < F.col("b.doc_id")) if symmetric
           else (F.col("a.doc_id") != F.col("b.doc_id")))
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bval") == F.col("b.bval"))
                   & ids)
            .filter(ham <= SIM_MAX_DIST)
            .select(F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                    F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                    ham.cast("int").alias("hamming"))
            .distinct())


def simhash_bands(docs: DataFrame) -> DataFrame:
    """Banded signature rows for a (doc_id, text) corpus — the per-batch
    ingest form (signature + banding in one pass)."""
    return sim_banded(simhash_signatures(docs))
