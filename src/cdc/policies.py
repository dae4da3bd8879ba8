"""V3 — pluggable per-key conflict-resolution policies via ``applyInPandas``.

The engine's default LWW collapse is pure column algebra (cdc.dedup); this
module is the escape hatch for merge policies that column expressions can't
express (custom tie-breaks, content-aware resolution, CRDT-style merges).
Each policy is a pandas function applied per (repo, path) group over Arrow
batches — grouped-map, never row-at-a-time Python.

Scale notes: applyInPandas shuffles by key like the window form, so the
same skew caveats apply (use the default maxby path unless a custom policy
is genuinely needed); groups stream through the Python worker batched, and
per-group pandas work is O(events-per-key), typically tiny.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame

from cdc.dedup import KEY_COLS

Policy = Callable[[pd.DataFrame], pd.DataFrame]
_POLICIES: dict[str, Policy] = {}


def policy(name: str):
    def deco(fn: Policy) -> Policy:
        if name in _POLICIES:
            raise ValueError(f"policy already registered: {name}")
        _POLICIES[name] = fn
        return fn
    return deco


def registered() -> list[str]:
    return sorted(_POLICIES)


@policy("lww")
def lww(g: pd.DataFrame) -> pd.DataFrame:
    """Last-writer-wins by (lsn, batch_id) — must equal the engine's
    column-algebra form bit-for-bit (cross-checked by the oracle suite)."""
    return g.sort_values(["lsn", "batch_id"]).tail(1)


@policy("first_writer")
def first_writer(g: pd.DataFrame) -> pd.DataFrame:
    """Immutable-once semantics: the first event for a key sticks."""
    return g.sort_values(["lsn", "batch_id"]).head(1)


@policy("longest_content")
def longest_content(g: pd.DataFrame) -> pd.DataFrame:
    """Content-aware resolution: keep the longest content, ties to the
    highest lsn (a 'most complete version wins' policy)."""
    g = g.assign(_len=g["content"].str.len().fillna(-1))
    g = g.sort_values(["_len", "lsn"])
    return g.drop(columns=["_len"]).tail(1)


def resolve_with_policy(events: DataFrame, name: str,
                        keys: Sequence[str] = KEY_COLS) -> DataFrame:
    """Collapse an event batch to one row per key under the named policy."""
    try:
        fn = _POLICIES[name]
    except KeyError:
        raise KeyError(f"unknown policy {name!r}; known: {registered()}") from None

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g)

    return events.groupBy(*keys).applyInPandas(run, events.schema)
