"""cdc — a PySpark-native CDC / incremental-ingest engine.

Brand-new engine (NOT a port) with capability parity inspired by
``wri/gfw-country-pages-analysis-2`` (see SURVEY.md §2.A for the mapping);
the authoritative spec is BASELINE.json: binlog/WAL tail -> per-(repo, path)
LSN dedup + last-writer-wins ranking -> MERGE into a partitioned,
Iceberg-style transactional table with schema evolution, exactly-once
commits, lineage metrics, and explicit skew handling.

Everything is Spark DataFrame API (Catalyst-optimized); pandas/Arrow UDFs
only for content normalization; no per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
