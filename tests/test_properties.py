"""Property-based tests (SURVEY.md §5.2): the replay algebra.

For any event set over keyed I/U/D ops:
  (a) permutation invariance — any partition of the events into ordered
      batches MERGEs to the same final state as one batch;
  (b) idempotency — re-applying any batch is a no-op;
  (c) commutativity across batches — applying batches in ANY order yields
      the same state (LSN guard + delete tombstones make MERGE a CRDT-ish
      join-semilattice merge);
  (d) registry evolution — random add/widen chains validate; narrowing or
      column drops are rejected.

Spark round-trips are expensive, so examples are small and bounded.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc.dedup import last_writer_wins
from cdc.merge import empty_state, merge_apply

KEYS = ["k0", "k1", "k2"]
EVENT = st.tuples(
    st.sampled_from(KEYS),                  # path (repo fixed)
    st.sampled_from(["I", "U", "D"]),       # op
    st.text(alphabet="abc", max_size=3),    # content
)
EVENTS = st.lists(EVENT, min_size=1, max_size=12)
SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=[HealthCheck.too_slow])


def to_df(spark, events, lsn0=1):
    rows = []
    for i, (path, op, content) in enumerate(events):
        rows.append(("r", path, f"c{i}", "python",
                     None if op == "D" else content,
                     lsn0 + i, op, (lsn0 + i) // 4))
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, lsn long, op string, batch_id long")
    return df.withColumn("ts", F.timestamp_seconds(F.col("lsn")))


def apply_batches(spark, dfs):
    state = empty_state(spark, dfs[0])
    for df in dfs:
        state = merge_apply(state, last_writer_wins(df))
    return state


def live_set(state):
    return {(r.path, r.content, r._lsn)
            for r in state.filter(~F.col("_deleted"))
            .select("path", "content", "_lsn").collect()}


def oracle(events, lsn0=1):
    st_ = {}
    for i, (path, op, content) in enumerate(events):
        if op == "D":
            st_[path] = None
        else:
            st_[path] = (content, lsn0 + i)
    return {(p, v[0], v[1]) for p, v in st_.items() if v is not None}


@pytest.mark.slow
@given(events=EVENTS, cut=st.integers(min_value=0, max_value=11))
@SETTINGS
def test_permutation_invariance(spark, events, cut):
    df = to_df(spark, events)
    whole = apply_batches(spark, [df])
    cut = min(cut, len(events))
    lo, hi = events[:cut], events[cut:]
    parts = [to_df(spark, lo, 1)] if lo else []
    if hi:
        parts.append(to_df(spark, hi, 1 + len(lo)))
    split = apply_batches(spark, parts) if parts else whole
    assert live_set(whole) == live_set(split) == oracle(events)


@pytest.mark.slow
@given(events=EVENTS)
@SETTINGS
def test_idempotency(spark, events):
    df = to_df(spark, events)
    once = apply_batches(spark, [df])
    twice = apply_batches(spark, [df, df])
    assert live_set(once) == live_set(twice) == oracle(events)


@given(events=EVENTS, cut=st.integers(min_value=1, max_value=11))
@SETTINGS
def test_out_of_order_batches_commute(spark, events, cut):
    """The strong streaming property: a late-delivered low-LSN batch after
    a high-LSN batch must not change the outcome (LSN guard + tombstones)."""
    cut = min(cut, len(events))
    lo, hi = events[:cut], events[cut:]
    if not lo or not hi:
        return
    d_lo, d_hi = to_df(spark, lo, 1), to_df(spark, hi, 1 + len(lo))
    in_order = apply_batches(spark, [d_lo, d_hi])
    reversed_ = apply_batches(spark, [d_hi, d_lo])
    assert live_set(in_order) == live_set(reversed_) == oracle(events)


def test_sha_invariant_matches_python(spark):
    events = [("k0", "I", "abc"), ("k0", "U", "xyz")]
    state = apply_batches(spark, [to_df(spark, events)])
    row = state.filter("path = 'k0'").collect()[0]
    assert row._content_sha256 == hashlib.sha256(b"xyz").hexdigest()


# ---- registry evolution ----------------------------------------------------

WIDEN_CHAIN = {"int": "bigint", "float": "double", "smallint": "int"}


@given(st.lists(st.sampled_from(["add_int", "add_str", "widen"]),
                min_size=1, max_size=5))
@settings(max_examples=25, deadline=None)
def test_registry_accepts_legal_evolutions(steps):
    from cdc.schema.registry import RegistryEntry, SchemaRegistry

    cols = {"lsn": "bigint", "content": "string"}
    entries = [RegistryEntry(1, c, t, 1, None) for c, t in cols.items()]
    version = 1
    for i, step in enumerate(steps):
        version += 1
        if step == "add_int":
            cols[f"extra_i{i}"] = "int"
        elif step == "add_str":
            cols[f"extra_s{i}"] = "string"
        else:
            for c, t in list(cols.items()):
                if t in WIDEN_CHAIN:
                    cols[c] = WIDEN_CHAIN[t]
                    break
        entries += [RegistryEntry(version, c, t, 1, None) for c, t in cols.items()]
    reg = SchemaRegistry(entries)  # must not raise
    assert reg.latest_version() == version
    assert len(reg.latest_schema().fields) == len(cols)


@pytest.mark.parametrize("bad", [
    [("v2", "lsn", "int")],          # narrowing bigint -> int
    [("v2", None, None)],            # dropped column
])
def test_registry_rejects_illegal_evolutions(bad):
    from cdc.schema.registry import RegistryEntry, SchemaRegistry

    entries = [RegistryEntry(1, "lsn", "bigint", 1, None),
               RegistryEntry(1, "content", "string", 1, None)]
    if bad[0][1] is None:  # drop 'content' in v2
        entries += [RegistryEntry(2, "lsn", "bigint", 1, None)]
    else:
        entries += [RegistryEntry(2, "lsn", "int", 1, None),
                    RegistryEntry(2, "content", "string", 1, None)]
    with pytest.raises(ValueError):
        SchemaRegistry(entries)
