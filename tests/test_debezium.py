"""Debezium envelope decoding (cdc/io/debezium.py): image selection per
op, op collapsing, lsn/ts extraction, dead-letter marking, and
composition with the replay pipeline."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cdc.io.debezium import from_debezium
from cdc.pipeline import apply_batch
from cdc.table.table import CdcTable

ROW_DDL = "repo string, path string, content string"


def env(op, before=None, after=None, lsn=0, ts_ms=1767225600000):
    return json.dumps({"payload": {
        "before": before, "after": after, "op": op, "ts_ms": ts_ms,
        "source": {"lsn": lsn}}})


def test_decode_images_ops_and_dead_letters(spark):
    vals = [
        env("c", after={"repo": "r1", "path": "a", "content": "v1"}, lsn=1),
        env("u", before={"repo": "r1", "path": "a", "content": "v1"},
             after={"repo": "r1", "path": "a", "content": "v2"}, lsn=2),
        env("r", after={"repo": "r1", "path": "b", "content": "w1"}, lsn=3),
        env("d", before={"repo": "r1", "path": "b", "content": "w1"}, lsn=4),
        env("x", after={"repo": "r1", "path": "c", "content": "??"}, lsn=5),
        "not json at all",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    out = from_debezium(df, ROW_DDL).collect()
    got = [(r.repo, r.path, r.content, r.op, r.lsn) for r in out]
    assert got[:4] == [
        ("r1", "a", "v1", "U", 1),
        ("r1", "a", "v2", "U", 2),   # update reads the AFTER image
        ("r1", "b", "w1", "U", 3),   # snapshot-read op maps to upsert
        ("r1", "b", "w1", "D", 4),   # delete reads the BEFORE image
    ]
    # unknown op and unparseable JSON become op-NULL dead letters
    assert [g[3] for g in got[4:]] == [None, None]
    assert got[5][:3] == (None, None, None)
    assert out[0].ts.year == 2026


def test_decoded_stream_feeds_replay(spark, tmp_path):
    vals = [
        env("c", after={"repo": "r1", "path": "a", "content": "v1"}, lsn=1),
        env("u", after={"repo": "r1", "path": "a", "content": "v2"}, lsn=5),
        env("c", after={"repo": "r1", "path": "b", "content": "w1"}, lsn=2),
        env("d", before={"repo": "r1", "path": "b", "content": "w1"}, lsn=6),
        env("x", after={"repo": "zz", "path": "zz", "content": "zz"}, lsn=7),
    ]
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    events = (from_debezium(df, ROW_DDL)
              .filter(F.col("op").isNotNull())   # dead-letter routing
              .withColumn("batch_id", F.lit(0)))
    t = CdcTable(str(tmp_path / "t"), n_partitions=4, layout="key_hash")
    apply_batch(spark, t, events, "b0", normalize=False, metrics=False)
    got = {(r.repo, r.path): r.content for r in t.read(spark).collect()}
    assert got == {("r1", "a"): "v2"}
    assert t.lsn_high() == 6
