"""Write-path schema evolution (union-of-schemas): columns added by a
batch appear table-wide (NULL for old rows); columns a batch's source
dropped stay in the table schema (NULL on the batch's winners, preserved
on losers — row-replacement semantics); coercible type changes widen.
Covers both CoW MERGE and MOR delta commits + compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc.pipeline import apply_batch
from cdc.table.maintenance import compact
from cdc.table.table import CdcTable


def ev(spark, rows, schema="repo string, path string, lsn long, "
                          "content string, op string"):
    return (spark.createDataFrame(rows, schema)
            .select("*",
                    F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
                    F.lit(0).alias("batch_id")))


def by_key(df, *cols):
    return {(r.repo, r.path): tuple(getattr(r, c) for c in cols)
            for r in df.select("repo", "path", *cols).collect()}


LANG = ("repo string, path string, lsn long, content string, op string, "
        "lang string")


def test_cow_add_then_drop_column(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U"),
                                     ("r1", "b", 2, "w1", "U")]),
                "b0", normalize=False, metrics=False)
    # batch adds a column -> old rows read NULL for it
    apply_batch(spark, t, ev(spark, [("r1", "a", 5, "v2", "U", "en")],
                             schema=LANG),
                "b1", normalize=False, metrics=False)
    got = by_key(t.read(spark), "content", "lang")
    assert got == {("r1", "a"): ("v2", "en"), ("r1", "b"): ("w1", None)}
    # batch whose source dropped the column -> column stays in the schema;
    # the batch's winner reads NULL (full-row image), losers keep theirs
    apply_batch(spark, t, ev(spark, [("r1", "b", 7, "w2", "U")]),
                "b2", normalize=False, metrics=False)
    got = by_key(t.read(spark), "content", "lang")
    assert got == {("r1", "a"): ("v2", "en"), ("r1", "b"): ("w2", None)}
    assert "lang" in t.read(spark).columns
    # and overwriting the lang-carrying key without lang nulls it
    apply_batch(spark, t, ev(spark, [("r1", "a", 9, "v3", "U")]),
                "b3", normalize=False, metrics=False)
    assert by_key(t.read(spark), "content", "lang")[("r1", "a")] == ("v3", None)


def test_mor_schema_union_and_compaction(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U"),
                                     ("r1", "b", 2, "w1", "U")]),
                "b0", normalize=False, metrics=False, mode="mor")
    apply_batch(spark, t, ev(spark, [("r1", "a", 5, "v2", "U", "en")],
                             schema=LANG),
                "b1", normalize=False, metrics=False, mode="mor")
    got = by_key(t.read(spark), "content", "lang")
    assert got == {("r1", "a"): ("v2", "en"), ("r1", "b"): ("w1", None)}
    # a later NARROWER delta must not shrink the table schema: the base
    # layer's lang column stays readable
    apply_batch(spark, t, ev(spark, [("r2", "x", 8, "z1", "U")]),
                "b2", normalize=False, metrics=False, mode="mor")
    got = by_key(t.read(spark), "content", "lang")
    assert got == {("r1", "a"): ("v2", "en"), ("r1", "b"): ("w1", None),
                   ("r2", "x"): ("z1", None)}
    # compaction folds the mixed-schema layers into one base; rows identical
    compact(spark, t)
    assert by_key(t.read(spark), "content", "lang") == got
    assert all(f.get("kind") != "delta"
               for f in t.current_snapshot()["files"])


def test_type_widening_int_to_long(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, ev(spark, [("r1", "a", 1, "v1", "U", 7)],
                             schema="repo string, path string, lsn long, "
                                    "content string, op string, score int"),
                "b0", normalize=False, metrics=False)
    apply_batch(spark, t, ev(spark, [("r1", "b", 2, "w1", "U", 2**40)],
                             schema="repo string, path string, lsn long, "
                                    "content string, op string, score long"),
                "b1", normalize=False, metrics=False)
    out = t.read(spark)
    assert dict(out.dtypes)["score"] == "bigint"
    assert by_key(out, "score") == {("r1", "a"): (7,), ("r1", "b"): (2**40,)}
