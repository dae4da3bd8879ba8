"""Oracle-checked parity query library.

Each submodule exports ``QUERIES: dict[name -> (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name -> DuckDB SQL]``. ``__spark_entry__`` at the repo
root aggregates them; the driver runs each Spark query against its DuckDB
oracle (row count + schema + order-insensitive value hash).

Design rules (so the hash compare is deterministic):
- alias every computed column identically on both sides;
- round every floating aggregate (Spark's parallel sum order differs from
  DuckDB's sequential one in the last ulp);
- cast DuckDB integer aggregates (HUGEINT by default) down to BIGINT;
- break ties in every top-k / limit with a unique column.
"""

from __future__ import annotations
