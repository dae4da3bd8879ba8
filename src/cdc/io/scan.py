"""S1/S4/S9 — batch scans with explicit schemas (never inferred in the
engine core; SURVEY.md §1.2 type-system rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def scan_parquet(spark: SparkSession, path: str, ddl: str | None = None) -> DataFrame:
    r = spark.read
    if ddl:
        r = r.schema(ddl)
    return r.parquet(path)


def scan_csv(spark: SparkSession, path: str, ddl: str, sep: str = ",", header: bool = True) -> DataFrame:
    return spark.read.schema(ddl).option("sep", sep).option("header", header).csv(path)


def scan_json(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    return spark.read.schema(ddl).json(path)
