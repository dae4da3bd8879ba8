"""Shared helpers for the parity query library."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet batch scan (S1). Explicit path per table; Catalyst pushes
    filters/pruning into the scan automatically."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def merge_dicts(*mods) -> tuple[dict, dict]:
    """Combine (QUERIES, ORACLES) pairs from submodules, rejecting name
    collisions."""
    queries: dict = {}
    oracles: dict = {}
    for m in mods:
        for k, v in m.QUERIES.items():
            if k in queries:
                raise ValueError(f"duplicate parity query name: {k}")
            queries[k] = v
        for k, v in getattr(m, "ORACLES", {}).items():
            if k not in m.QUERIES:
                raise ValueError(f"oracle without query: {k}")
            oracles[k] = v
    return queries, oracles
