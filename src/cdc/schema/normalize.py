"""V1/V2 — Arrow-vectorized pandas-UDF content normalization.

The ONLY Python-side compute in the merge path (BASELINE.json bans per-row
Python; these are pandas UDFs over Arrow batches). Semantics are frozen
because the sha256 invariant is computed over normalized content:

1. CRLF and lone CR -> LF;
2. trailing spaces/tabs stripped at each line end and at end-of-string.

The equivalent ANSI SQL (used by the DuckDB oracle) is exported as
NORMALIZE_SQL so Spark and the oracle provably share semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_TRAIL_NL = r"[ \t]+\n"
_TRAIL_END = r"[ \t]+$"


def _normalize_series(s: pd.Series) -> pd.Series:
    s = s.str.replace("\r\n", "\n", regex=False).str.replace("\r", "\n", regex=False)
    s = s.str.replace(_TRAIL_NL, "\n", regex=True)
    return s.str.replace(_TRAIL_END, "", regex=True)


@F.pandas_udf(StringType())
def normalize_content(s: pd.Series) -> pd.Series:
    """V1 — scalar pandas UDF (Series -> Series)."""
    return _normalize_series(s)


@F.pandas_udf(StringType())
def normalize_content_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """V2 — iterator form: per-worker one-time init amortized across Arrow
    batches (here the compiled regexes; in a richer engine, model/table
    loads)."""
    import re

    trail_nl = re.compile(_TRAIL_NL)
    trail_end = re.compile(_TRAIL_END)
    for s in batches:
        t = s.str.replace("\r\n", "\n", regex=False).str.replace("\r", "\n", regex=False)
        t = t.str.replace(trail_nl, "\n", regex=True)
        yield t.str.replace(trail_end, "", regex=True)


def normalize_sql(col: str) -> str:
    """DuckDB-compatible SQL with byte-identical semantics to the UDFs."""
    x = f"replace(replace({col}, chr(13) || chr(10), chr(10)), chr(13), chr(10))"
    x = f"regexp_replace({x}, '[ \\t]+\\n', chr(10), 'g')"
    return f"regexp_replace({x}, '[ \\t]+$', '')"
