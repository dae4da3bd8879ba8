"""Versioned schema registry driving schema evolution (SURVEY.md §1.2).

Supported evolutions: add column (nullable), type widening along the
lattice int->bigint, float->double, decimal(p,s)->decimal(p+k,s).
Narrowing or renames are rejected — the registry is the single authority
for what each ``schema_version`` in the log means.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WIDENING = {
    ("int", "bigint"), ("int", "long"), ("float", "double"),
    ("smallint", "int"), ("smallint", "bigint"), ("tinyint", "int"),
}

_BASE_V1 = [
    ("lsn", "bigint"), ("ts", "timestamp"), ("op", "string"), ("repo", "string"),
    ("path", "string"), ("commit", "string"), ("lang", "string"), ("content", "string"),
    ("schema_version", "int"), ("batch_id", "bigint"),
]


@dataclass(frozen=True)
class RegistryEntry:
    version: int
    col_name: str
    col_type: str
    added_in: int
    widened_from: str | None


class SchemaRegistry:
    """Ordered set of (version -> full column list) with widening checks."""

    def __init__(self, entries: list[RegistryEntry]):
        self.entries = entries
        self._by_version: dict[int, list[RegistryEntry]] = {}
        for e in entries:
            self._by_version.setdefault(e.version, []).append(e)
        self._validate()

    def _validate(self) -> None:
        versions = self.versions()
        for prev, cur in zip(versions, versions[1:]):
            prev_cols = {e.col_name: e.col_type for e in self._by_version[prev]}
            for e in self._by_version[cur]:
                old = prev_cols.pop(e.col_name, None)
                if old is None:
                    continue  # added column
                if old != e.col_type and (old, e.col_type) not in WIDENING:
                    raise ValueError(f"illegal evolution {e.col_name}: {old} -> {e.col_type}")
            if prev_cols:
                raise ValueError(f"columns dropped in v{cur}: {sorted(prev_cols)}")

    def versions(self) -> list[int]:
        return sorted(self._by_version)

    def latest_version(self) -> int:
        return self.versions()[-1]

    def spark_schema(self, version: int) -> T.StructType:
        ddl = ", ".join(f"{e.col_name} {e.col_type}" for e in self._by_version[version])
        return T.StructType.fromDDL(ddl)

    def latest_schema(self) -> T.StructType:
        return self.spark_schema(self.latest_version())

    def normalize_to_latest(self, df: DataFrame) -> DataFrame:
        """U1 + widening casts: project any registered-version frame onto the
        latest schema — missing (later-added) columns become typed nulls,
        narrow columns are widened. Pure column ops, zero shuffle."""
        out = []
        have = set(df.columns)
        for f in self.latest_schema().fields:
            col = F.col(f.name) if f.name in have else F.lit(None)
            out.append(col.cast(f.dataType).alias(f.name))
        return df.select(*out)

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [(e.version, e.col_name, e.col_type, e.added_in, e.widened_from) for e in self.entries]
        return spark.createDataFrame(
            rows, "version int, col_name string, col_type string, added_in int, widened_from string")


def default_registry() -> SchemaRegistry:
    """FIXTURES.md §3 — v1 base; v2 adds (size_bytes int, score float);
    v3 widens them to (bigint, double)."""
    entries = []
    for name, typ in _BASE_V1:
        for v in (1, 2, 3):
            entries.append(RegistryEntry(v, name, typ, 1, None))
    entries += [
        RegistryEntry(2, "size_bytes", "int", 2, None),
        RegistryEntry(2, "score", "float", 2, None),
        RegistryEntry(3, "size_bytes", "bigint", 2, "int"),
        RegistryEntry(3, "score", "double", 2, "float"),
    ]
    return SchemaRegistry(entries)
