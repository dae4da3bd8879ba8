"""V1/V2 pandas-UDF parity + the full CDC replay pipeline (rows-only).

``v1_normalize_sha`` proves the Arrow-vectorized normalization UDF and the
DuckDB SQL formulation share byte-exact semantics — the load-bearing check
for the sha256 invariant (the invariant is computed over *normalized*
content).

``cdc_replay_full`` runs the actual engine end-to-end (generate seeded
log -> transactional replay -> snapshot read). Not SQL-expressible (it
writes a table, commits snapshots, resumes), so no oracle — the pytest
suite checks it against the pure-pandas reducer instead.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from cdc.parity.common import load
from cdc.schema.normalize import normalize_content, normalize_content_iter, normalize_sql

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


_DIRTY = "text || '  ' || chr(13) || chr(10) || 'tail line' || chr(9) || chr(13) || ' end  '"

@q("v1_normalize_sha", f"""
WITH dirty AS (SELECT doc_id, {_DIRTY} AS content FROM documents)
SELECT doc_id,
       {normalize_sql('content')} AS normalized,
       sha256({normalize_sql('content')}) AS norm_sha256
FROM dirty
""")
def v1_normalize_sha(spark, sf_dir):
    """V1 — scalar pandas UDF normalization (CRLF/CR -> LF, trailing
    whitespace stripped) + sha256 of the normalized content."""
    d = load(spark, sf_dir, "documents")
    dirty = F.concat(F.col("text"), F.lit("  \r\ntail line\t\r end  "))
    return (d.withColumn("content", dirty)
            .withColumn("normalized", normalize_content(F.col("content")))
            .select("doc_id", "normalized",
                    F.sha2("normalized", 256).alias("norm_sha256")))


@q("v2_normalize_iter", f"""
WITH dirty AS (SELECT doc_id, {_DIRTY} AS content FROM documents)
SELECT doc_id, sha256({normalize_sql('content')}) AS norm_sha256
FROM dirty
""")
def v2_normalize_iter(spark, sf_dir):
    """V2 — iterator-form pandas UDF (per-worker init amortized across
    Arrow batches); must equal the scalar form byte-for-byte."""
    d = load(spark, sf_dir, "documents")
    dirty = F.concat(F.col("text"), F.lit("  \r\ntail line\t\r end  "))
    return (d.withColumn("content", dirty)
            .withColumn("normalized", normalize_content_iter(F.col("content")))
            .select("doc_id", F.sha2("normalized", 256).alias("norm_sha256")))


@q("cdc_replay_full")  # full engine path: not SQL-expressible -> rows-only
def cdc_replay_full(spark, sf_dir):
    """The flagship: seeded change-event log -> exact dedup -> pandas-UDF
    normalization -> salted LWW -> transactional MERGE commits (2 commit
    groups, exercising resume bookkeeping) -> snapshot read of final state.

    Scale knob: event volume follows the sf directory (sf0.01 ~ 20k
    events). Correctness vs the pure-pandas oracle is asserted in
    tests/test_core_replay.py; the driver records a rows-only check here.
    """
    from cdc.pipeline import replay
    from cdc.table.table import CdcTable
    from cdc.testing.gen import gen_change_events, write_change_log

    sf = os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf")
    try:
        n_keys = max(100, int(100_000 * float(sf) / 2))
    except ValueError:
        n_keys = 500
    work = tempfile.mkdtemp(prefix="cdc_replay_q_")
    try:
        log_dir = os.path.join(work, "log")
        ev = gen_change_events(spark, n_keys=n_keys, mean_events_per_key=8, seed=7)
        write_change_log(ev, log_dir, events_per_file=20_000)
        table = CdcTable(os.path.join(work, "table"), n_partitions=8)
        replay(spark, log_dir, table, batches_per_commit=None, metrics=False)
        out = table.read(spark)
        rows = out.select("repo", "path", "_lsn", "_content_sha256").collect()
        return spark.createDataFrame(
            rows, "repo string, path string, _lsn long, _content_sha256 string")
    finally:
        shutil.rmtree(work, ignore_errors=True)
