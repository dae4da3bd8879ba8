"""M1 gate — in-memory end-to-end: generate -> dedup -> LWW -> merge vs the
independent pandas oracle (FIXTURES.md §4 parity contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc.dedup import dedupe_exact, last_writer_wins
from cdc.merge import empty_state, merge_apply, with_content_sha
from cdc.testing.gen import gen_change_events
from cdc.testing.oracle import expected_state


@pytest.fixture(scope="module")
def events(spark):
    return gen_change_events(spark, n_keys=300, mean_events_per_key=8, seed=7).cache()


def _final_state_pdf(spark, events, via):
    batch = dedupe_exact(events)
    final = last_writer_wins(batch, via=via)
    state0 = empty_state(spark, final)
    new_state = merge_apply(state0, final).filter(~F.col("_deleted"))
    return (
        new_state.select("repo", "path", "commit", "lang",
                         F.sha2("content", 256).alias("content_sha256"),
                         F.col("_lsn").alias("last_lsn"))
        .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )


def test_generator_fixture_properties(events):
    pdf = events.toPandas()
    n_raw = len(pdf)
    n_unique = pdf.drop_duplicates(["batch_id", "lsn"]).shape[0]
    assert n_raw > n_unique, "at-least-once duplicates must exist"
    assert 0.005 < (n_raw - n_unique) / n_raw < 0.05
    # lsn strictly increasing with gaps over the dedup'd set
    lsns = sorted(pdf.drop_duplicates(["lsn"]).lsn)
    assert len(lsns) == len(set(lsns))
    assert lsns[-1] > len(lsns), "gaps expected"
    # first event per key is an insert
    first = pdf.sort_values("lsn").drop_duplicates(["repo", "path"], keep="first")
    assert (first.op == "I").all()
    # hot-repo skew: top-5 repos own the majority of events
    top5 = pdf.repo.value_counts().head(5).sum()
    assert top5 / n_raw > 0.45


@pytest.mark.parametrize("via", ["maxby", "window", "salted", "semi"])
def test_replay_matches_pandas_oracle(spark, events, via):
    got = _final_state_pdf(spark, events, via)
    exp = expected_state(events.toPandas())
    assert len(got) == len(exp)
    assert set(map(tuple, got[["repo", "path", "content_sha256"]].values)) == set(
        map(tuple, exp[["repo", "path", "content_sha256"]].values)
    )
    assert set(map(tuple, got[["repo", "path", "last_lsn"]].values)) == set(
        map(tuple, exp[["repo", "path", "last_lsn"]].values)
    )


def test_merge_is_replay_idempotent(spark, events):
    batch = dedupe_exact(events)
    final = last_writer_wins(batch)
    state1 = merge_apply(empty_state(spark, final), final).cache()
    state2 = merge_apply(state1, final)  # re-apply same batch -> no-op
    assert state2.count() == state1.count()
    diff = state2.exceptAll(state1)
    assert diff.count() == 0


def test_with_content_sha_matches_python_hashlib(spark):
    import hashlib

    df = spark.createDataFrame([("abc",), ("",)], ["content"])
    got = {r.content: r._content_sha256 for r in with_content_sha(df).collect()}
    assert got["abc"] == hashlib.sha256(b"abc").hexdigest()
