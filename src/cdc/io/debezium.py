"""Debezium-style CDC envelope decoding (S-family source adapter).

Debezium is the de-facto public binlog-tail format: each record is a JSON
envelope ``{"payload": {"before": {...}|null, "after": {...}|null,
"op": "c"|"u"|"d"|"r", "ts_ms": <epoch millis>, "source": {"lsn": N}}}``.
``from_debezium`` turns a DataFrame (batch or streaming — e.g. a Kafka
``value`` column) of such envelopes into this engine's canonical event
frame: the row image (``after`` for create/update/snapshot-read, ``before``
for delete), ``op`` collapsed to U/D, ``lsn`` from the source block,
``ts`` from ``ts_ms``.

Everything is ``F.from_json`` + column expressions — JVM-side, one
projection, no Python in the row path — so it composes with the replay
pipeline's single lazy plan and runs unchanged under readStream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc.meta.store import ddl_names


def envelope_schema(row_ddl: str) -> str:
    """The envelope's from_json schema for a given row-image DDL."""
    return (f"payload struct<before: struct<{row_ddl}>, "
            f"after: struct<{row_ddl}>, op: string, ts_ms: bigint, "
            f"source: struct<lsn: bigint>>")


def from_debezium(df: DataFrame, row_ddl: str,
                  value_col: str = "value") -> DataFrame:
    """Decode ``value_col`` (JSON envelope strings) into the canonical
    event columns: one column per row-image field (from ``after``, or
    ``before`` when the op is a delete), plus ``op`` ('c'/'u'/'r' -> 'U',
    'd' -> 'D'), ``lsn``, and ``ts``. Envelopes that fail to parse (or
    carry an unknown op) surface as ``op`` NULL rows rather than being
    dropped silently — route them to a dead-letter sink with
    ``filter(op IS NULL)``; the replay path filters them out."""
    p = F.from_json(F.col(value_col), envelope_schema(row_ddl)).getField("payload")
    is_del = p.getField("op") == "d"
    image: Column = F.when(is_del, p.getField("before")).otherwise(p.getField("after"))
    # depth-aware split: parameterized types (decimal(18,2), struct<...>)
    # carry commas a naive str.split would break on
    row_fields = ddl_names(row_ddl)
    op = (F.when(p.getField("op").isin("c", "u", "r"), "U")
           .when(is_del, "D"))  # anything else -> NULL (dead-letter marker)
    return df.select(
        *[image.getField(name).alias(name) for name in row_fields],
        op.alias("op"),
        p.getField("source").getField("lsn").alias("lsn"),
        F.timestamp_millis(p.getField("ts_ms")).alias("ts"),
    )
