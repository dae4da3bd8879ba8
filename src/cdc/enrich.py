"""Pluggable post-merge enrichment operators (SURVEY.md §2.A R12).

The reference pipeline routes each run through per-dataset post-processing
(``--analysis glad|terrai|fires``); the engine's analog is a registry of
named DataFrame -> DataFrame operators applied to the merged state after a
commit. Operators are plain functions of the state frame (plus optional
broadcast dims) — plan-level, so Catalyst fuses them with the read.

Register with the decorator::

    @enrichment("lang_stats")
    def lang_stats(state): ...

and run with ``apply_enrichments(state, ["lang_stats", ...])``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REGISTRY: dict[str, Callable[..., DataFrame]] = {}


def enrichment(name: str):
    """Register a named post-merge operator (R12 dataset routing)."""
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"enrichment already registered: {name}")
        _REGISTRY[name] = fn
        return fn
    return deco


def registered() -> list[str]:
    return sorted(_REGISTRY)


def get(name: str) -> Callable[..., DataFrame]:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown enrichment {name!r}; known: {registered()}") from None


def apply_enrichments(state: DataFrame, names: list[str], **kw) -> dict[str, DataFrame]:
    """Route the merged state through the named operators; each result is an
    independent lazy plan over the same (cached-by-Spark-scan) state."""
    return {n: get(n)(state, **kw) for n in names}


# ---- built-in operators (the glad/terrai/fires analogs) --------------------

@enrichment("lang_stats")
def lang_stats(state: DataFrame, **_) -> DataFrame:
    """Per-language live-file stats (the 'counts per layer' analog)."""
    return (state.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.countDistinct("repo").alias("n_repos"),
                 F.max("_lsn").alias("lsn_high")))


@enrichment("repo_activity")
def repo_activity(state: DataFrame, **_) -> DataFrame:
    """Per-repo freshness/rollup (the 'latest date per area' analog)."""
    return (state.groupBy("repo")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.max("_updated_ts").alias("last_update"),
                 F.max("_lsn").alias("lsn_high")))


@enrichment("path_depth_histogram")
def path_depth_histogram(state: DataFrame, **_) -> DataFrame:
    """Directory-depth histogram (the date-bucketing analog on the path
    dimension)."""
    depth = F.size(F.split(F.col("path"), "/")) - 1
    return (state.withColumn("depth", depth)
            .groupBy("depth").agg(F.count(F.lit(1)).alias("n_files")))


@enrichment("dim_lookup")
def dim_lookup(state: DataFrame, dim: DataFrame | None = None,
               on: str = "lang", **_) -> DataFrame:
    """R8 lookup-join enrichment: broadcast a small dimension onto the
    state (iso<->name analog). ``dim`` must carry the join column."""
    if dim is None:
        raise ValueError("dim_lookup needs dim=<DataFrame>")
    return state.join(F.broadcast(dim), on, "left")
