"""Audit / parity tooling (SURVEY.md §2.B U2/U3/A8/J7/O1).

The spec's acceptance criterion is byte-for-byte final-state equality with
a reference snapshot, verified by per-row content sha256. ``parity_diff``
is that check as a DataFrame op: empty result == exact parity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc.dedup import KEY_COLS


def parity_fingerprint(state: DataFrame, keys: Sequence[str] = KEY_COLS,
                       sha_col: str = "_content_sha256") -> DataFrame:
    """Canonical (key..., sha256) projection used on both sides of the
    parity check."""
    return state.select(*keys, F.col(sha_col).alias("content_sha256"))


def parity_diff(state: DataFrame, reference: DataFrame,
                keys: Sequence[str] = KEY_COLS,
                sha_col: str = "_content_sha256",
                ref_sha_col: str | None = None) -> DataFrame:
    """U2 — symmetric difference of (key, sha) sets; empty == parity.
    ``side`` says which input owns each divergent row."""
    a = parity_fingerprint(state, keys, sha_col)
    b = parity_fingerprint(reference, keys, ref_sha_col or sha_col)
    only_a = a.subtract(b).withColumn("side", F.lit("state_only"))
    only_b = b.subtract(a).withColumn("side", F.lit("reference_only"))
    return only_a.unionByName(only_b)


def assert_parity(state: DataFrame, reference: DataFrame, **kw) -> None:
    """Raises with a sample of divergent rows unless the diff is empty."""
    diff = parity_diff(state, reference, **kw)
    sample = diff.limit(10).collect()
    if sample:
        raise AssertionError(f"parity violation; first rows: {sample}")


def batch_conflicts(b1: DataFrame, b2: DataFrame,
                    keys: Sequence[str] = KEY_COLS) -> DataFrame:
    """J7 — keys written by both of two consecutive batches (self-join
    audit feeding conflict dashboards)."""
    a = b1.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_b1"),
                              F.max("lsn").alias("lsn_b1"))
    b = b2.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_b2"),
                              F.max("lsn").alias("lsn_b2"))
    return a.join(b, list(keys), "inner")


def canonical_rows(state: DataFrame, keys: Sequence[str] = KEY_COLS) -> DataFrame:
    """O1/A8 — deterministic golden output: distinct rows, globally sorted
    by key (for golden-file dumps in tests)."""
    return state.distinct().orderBy(*keys)
