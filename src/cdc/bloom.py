"""Broadcastable Bloom filter over a DataFrame column — the prefilter a
web-scale decontamination / membership pass wants: the benchmark (or
blocklist) side is summarized into a few-MB bitset that ships to every
task ONCE, the 100-TB training side probes it map-side (no shuffle, no
join), and the tiny surviving fraction goes through the exact broadcast
join to keep the result identical to the join-only plan (a Bloom filter
has false positives, never false negatives — the exact confirm removes
the former, the latter don't exist).

At 10 bits/key the bitset is ~60x smaller than broadcasting the exact
64-bit hash set, which is the difference between "fits in every
executor" and "doesn't" once the benchmark side reaches 10^8 keys.

Spark's own ``bloom_filter_agg`` is Catalyst-internal (not a registered
SQL function in this build), so the build is expressed as DataFrame ops:
a vectorized pandas stage turns each key hash into its k (word, bit)
positions with the SAME numpy arithmetic the probe uses, and a
``bit_or`` aggregate folds them into 64-bit words — fully distributed;
only the O(n_bits/64) word array is collected and broadcast.

Determinism: hashes come from ``F.xxhash64`` (seed 42) on BOTH sides;
position arithmetic is wrapping int64 numpy on BOTH sides. Nothing
depends on Python ints vs SQL longs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: hash functions per key (k=7 is optimal near 10 bits/key)
BLOOM_K = 7

# odd multiplier for the second hash (splitmix64 finalizer constant) —
# wrapping int64 multiply, identical in build and probe
_H2_MULT = np.int64(-7046029254386353131)   # 0x9E3779B97F4A7C15


def _positions(h: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(len(h), k) int64 bit positions in [0, n_bits) via double hashing
    (h1 + i*h2 mod n_bits, Kirsch–Mitzenmacher). Wrapping int64 overflow
    is intentional and deterministic."""
    with np.errstate(over="ignore"):
        h1 = h.astype(np.int64)
        h2 = (h1 * _H2_MULT) | np.int64(1)     # odd => full period
        i = np.arange(k, dtype=np.int64)
        pos = h1[:, None] + i[None, :] * h2[:, None]
    # numpy % follows the DIVISOR's sign (Python semantics), so this is
    # already in [0, n_bits) — a port to C/Java/SQL remainder semantics
    # must add a floor-mod, or negative hashes lose half the positions
    return pos % np.int64(n_bits)


@dataclass(frozen=True)
class Bloom:
    """Immutable built filter: ``words[i]`` holds bits [64i, 64i+64)."""
    words: np.ndarray          # uint64, length ceil(n_bits/64)
    n_bits: int
    k: int = BLOOM_K

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership for an int64 hash array (numpy bool)."""
        pos = _positions(np.asarray(h, dtype=np.int64), self.n_bits, self.k)
        w = self.words[pos >> 6]
        bit = np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
        return ((w & bit) != 0).all(axis=1)

    @property
    def nbytes(self) -> int:
        return int(self.words.nbytes)

    def __getstate__(self):
        # the broadcast cache holds a SparkContext, which can never be
        # pickled — drop it so a USED Bloom still serializes (UDF closures,
        # persistence); the receiving side re-ships on first use
        d = dict(self.__dict__)
        d.pop("_bc", None)
        return d

    def __setstate__(self, d):
        for k, v in d.items():
            object.__setattr__(self, k, v)

    def broadcast(self, spark: SparkSession):
        """The bitset as a SparkContext broadcast, created ONCE per Bloom
        instance and reused by every later prefilter in the session —
        a per-batch streaming caller no longer accumulates one broadcast
        per call. Rebuilt automatically if the owning SparkContext was
        restarted. Call ``unpersist()`` to reclaim executor memory early:
        ``bloom.broadcast(spark).unpersist()`` (the next use re-ships);
        the broadcast's lifetime is otherwise the Bloom's."""
        sc = spark.sparkContext
        cached = self.__dict__.get("_bc")
        if cached is not None and cached[0] is sc:
            return cached[1]
        bc = sc.broadcast((self.words, self.n_bits, self.k))
        # frozen dataclass: the cache is identity state, not value state
        object.__setattr__(self, "_bc", (sc, bc))
        return bc


def build_bloom(df: DataFrame, col: str, expected: int,
                bits_per_key: int = 10, k: int = BLOOM_K) -> Bloom:
    """Build a Bloom over ``F.xxhash64(col)`` of every row of ``df``.

    Distributed: a pandas stage emits each hash's k (word, set-bit) pairs
    — pre-OR'd per Arrow batch, so the shuffle input is at most
    (batch count x distinct words), not rows x k — and a ``bit_or``
    aggregate folds them; the driver only collects the <= n_bits/64
    non-zero words (one small Spark job, O(filter size) not O(input))."""
    n_bits = max(64, int(expected) * int(bits_per_key))
    n_words = (n_bits + 63) // 64
    hashes = df.select(F.xxhash64(F.col(col)).alias("h"))

    def emit(batches):
        for pdf in batches:
            h = pdf["h"].to_numpy(dtype=np.int64)
            if len(h) == 0:
                continue
            pos = _positions(h, n_bits, k).ravel()
            word = pos >> 6
            bit = np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
            # pre-OR within the batch: one row per distinct word
            uw, inv = np.unique(word, return_inverse=True)
            mask = np.zeros(len(uw), dtype=np.uint64)
            np.bitwise_or.at(mask, inv, bit)
            yield pd.DataFrame({"word": uw,
                                "mask": mask.astype(np.int64)})

    pairs = hashes.mapInPandas(emit, "word long, mask long")
    rows = (pairs.groupBy("word")
            .agg(F.bit_or("mask").alias("mask"))
            .collect())
    acc = np.zeros(n_words, dtype=np.int64)
    for r in rows:
        acc[r["word"]] = r["mask"]
    # reinterpret, don't convert: masks with bit 63 set are negative int64
    return Bloom(words=acc.view(np.uint64), n_bits=n_bits, k=k)


def bloom_prefilter(df: DataFrame, col: str, bloom: Bloom) -> DataFrame:
    """Rows of ``df`` whose ``col`` MIGHT be in the filter — a map-side
    vectorized probe against the broadcast bitset (no shuffle, no join).
    Contains every true member plus ~(1/2^k) false positives: compose
    with the exact join on the survivors for join-identical results.
    The bitset broadcast is cached on the Bloom (one ship per session,
    however many prefilters probe it — see ``Bloom.broadcast``)."""
    bc = bloom.broadcast(df.sparkSession)

    @F.pandas_udf(T.BooleanType())
    def might_contain(h: pd.Series) -> pd.Series:
        words, n_bits, k = bc.value
        res = Bloom(words=words, n_bits=n_bits, k=k).contains(
            h.to_numpy(dtype=np.int64))
        return pd.Series(res)

    return (df.withColumn("__bh", F.xxhash64(F.col(col)))
            .filter(might_contain(F.col("__bh")))
            .drop("__bh"))
