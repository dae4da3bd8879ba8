"""Data-quality expectations — the audit gate of write-audit-publish and a
standalone batch-validation operator (SURVEY.md §2.B enrichment/audit
family; the reference's post-processing sanity checks analog).

Design: every check is a boolean Column predicate ("rows must satisfy
this"), and ALL checks evaluate in ONE whole-stage-codegen aggregate pass
over the frame — `sum(case when not p then 1 end)` per check — so an
audit costs a single narrow scan regardless of how many expectations are
declared. Key-uniqueness (not expressible as a row predicate) rides in
the same pass as `count(*) - count(distinct struct(keys))`.

No Python UDFs, no collect beyond the 1-row aggregate result.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExpectationError(AssertionError):
    """Raised by ``enforce`` / WAP publish gates; carries the per-check
    violation counts in ``.violations``."""

    def __init__(self, violations: Mapping[str, int]):
        self.violations = dict(violations)
        detail = ", ".join(f"{k}={v}" for k, v in sorted(self.violations.items()))
        super().__init__(f"expectations failed: {detail}")


def not_null(*cols: str) -> Column:
    """Convenience predicate: all of ``cols`` are non-null."""
    p = F.lit(True)
    for c in cols:
        p = p & F.col(c).isNotNull()
    return p


def in_range(col: str, lo, hi) -> Column:
    return F.col(col).between(F.lit(lo), F.lit(hi))


def one_of(col: str, values: Sequence) -> Column:
    return F.col(col).isin(list(values))


def check(df: DataFrame, predicates: Mapping[str, Column],
          unique: Sequence[str] | None = None) -> dict[str, int]:
    """Count violations per expectation in one aggregate pass.

    Returns ``{check_name: n_violating_rows}`` (uniqueness reports the
    number of SURPLUS rows: total - distinct keys). A predicate that
    evaluates to NULL (e.g. comparisons on a null column) counts as a
    violation — an unknown is not a pass."""
    aggs = [F.sum(F.when(F.coalesce(p, F.lit(False)), 0).otherwise(1))
             .cast("long").alias(name)
            for name, p in predicates.items()]
    if unique:
        aggs.append(
            (F.count(F.lit(1)) -
             F.count_distinct(F.struct(*[F.col(c) for c in unique])))
            .cast("long").alias(f"unique({','.join(unique)})"))
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0]
    # an empty frame aggregates sums to NULL — zero violations
    return {k: int(v) if v is not None else 0 for k, v in row.asDict().items()}


def enforce(df: DataFrame, predicates: Mapping[str, Column],
            unique: Sequence[str] | None = None) -> dict[str, int]:
    """``check`` + raise ``ExpectationError`` when any count is non-zero.
    Returns the (all-zero) counts when every expectation holds."""
    counts = check(df, predicates, unique=unique)
    bad = {k: v for k, v in counts.items() if v}
    if bad:
        raise ExpectationError(bad)
    return counts


def violations(df: DataFrame, predicates: Mapping[str, Column]) -> DataFrame:
    """The violating rows themselves, tagged with which checks failed —
    the debugging companion to ``check`` (a second scan, filtered, so its
    cost is O(violations) after predicate pushdown where possible)."""
    failed = F.array_compact(F.array(*[
        F.when(~F.coalesce(p, F.lit(False)), F.lit(name))
        for name, p in predicates.items()]))
    return (df.withColumn("_failed_checks", failed)
              .filter(F.size("_failed_checks") > 0))
