"""Point-lookup read path: partition pruning, bloom filters, batch probes
(CdcTable.lookup / lookup_keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc.pipeline import apply_batch
from cdc.table.table import CdcTable


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lookup")
    t = CdcTable(str(root / "t"), n_partitions=16, layout="key_hash")
    ev = spark.range(500).select(
        F.concat(F.lit("repo"), (F.col("id") % 100)).alias("repo"),
        F.concat(F.lit("f"), (F.col("id") % 5)).alias("path"),
        F.col("id").alias("lsn"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
        F.lit("U").alias("op"),
        F.concat(F.lit("content-"), F.col("id")).alias("content"),
        F.lit(0).alias("batch_id"))
    apply_batch(spark, t, ev, "b0", normalize=False, metrics=False)
    return t


def test_lookup_returns_the_row_and_prunes_to_one_partition(spark, table):
    df = table.lookup(spark, repo="repo7", path="f2")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["content"].startswith("content-")
    # manifest pruning: every scanned file lives in ONE part= directory
    dirs = {f.rsplit("/", 2)[-2] for f in df.inputFiles()}
    assert len(dirs) == 1 and next(iter(dirs)).startswith("part=")


def test_lookup_missing_key_is_empty_not_error(spark, table):
    assert table.lookup(spark, repo="no-such", path="nope").count() == 0


def test_lookup_validates_key_columns(spark, table):
    with pytest.raises(ValueError, match="missing"):
        table.lookup(spark, repo="repo7")
    with pytest.raises(ValueError, match="extra"):
        table.lookup(spark, repo="repo7", path="f2", bogus=1)


def test_lookup_keys_batch_probe(spark, table):
    probes = spark.createDataFrame(
        [("repo7", "f2"), ("repo11", "f1"), ("no-such", "f0")],
        "repo string, path string")
    got = table.lookup_keys(spark, probes)
    assert {(r.repo, r.path) for r in got.collect()} == {
        ("repo7", "f2"), ("repo11", "f1")}
    # pruned to at most one partition per probe key
    dirs = {f.rsplit("/", 2)[-2] for f in got.inputFiles()}
    assert len(dirs) <= 3


def test_key_columns_carry_bloom_filters(table):
    import os

    import pyarrow.parquet as pq

    data_root = os.path.join(table.root, "data")
    snap_dir = sorted(os.listdir(data_root))[-1]
    files = []
    for dirpath, _, names in os.walk(os.path.join(data_root, snap_dir)):
        files += [os.path.join(dirpath, n) for n in names
                  if n.endswith(".parquet")]
    assert files
    meta = pq.ParquetFile(files[0]).metadata
    names = [meta.schema.column(i).name for i in range(meta.num_columns)]
    rg = meta.row_group(0)
    checked = 0
    for i, name in enumerate(names):
        col = rg.column(i)
        if not hasattr(col, "bloom_filter_offset"):
            pytest.skip("pyarrow too old to expose bloom_filter_offset")
        if name in ("repo", "path"):
            assert col.bloom_filter_offset is not None, f"no bloom on {name}"
            checked += 1
        elif name == "_lsn":
            assert col.bloom_filter_offset is None
    assert checked == 2
