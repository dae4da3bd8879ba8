"""Generic conditional MERGE INTO (cdc/merge_into.py): SQL clause
semantics — delete-before-update precedence, per-clause conditions,
default and explicit SET/VALUES expressions."""

from __future__ import annotations

import pytest

from cdc.merge_into import merge_into


def rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10, "keep"), (2, "b", 20, "upd"), (3, "c", 30, "del"),
         (4, "d", 40, "cond-miss")],
        "k int, name string, v int, tag string")
    source = spark.createDataFrame(
        [(2, "B", 99), (3, "C", 1), (4, "D", 5), (5, "E", 50), (6, "F", -1)],
        "k int, name string, v int")
    return target, source


def test_full_clause_set(spark, frames):
    target, source = frames
    out = merge_into(
        target, source, on=("k",),
        matched_delete="s.v = 1",           # k=3 deleted
        matched_update="s.v > t.v",         # k=2 updated; k=4 fails cond
        not_matched_insert="s.v > 0",       # k=5 inserted; k=6 filtered
    )
    assert rows(out) == {
        (1, "a", 10, "keep"),               # untouched
        (2, "B", 99, "upd"),                # updated: shared cols from s, tag kept
        (4, "d", 40, "cond-miss"),          # matched, no clause fired
        (5, "E", 50, None),                 # inserted: target-only col NULL
    }


def test_update_set_and_insert_values_exprs(spark, frames):
    target, source = frames
    out = merge_into(
        target, source, on=("k",),
        matched_update="true",
        update_set={"v": "t.v + s.v", "tag": "'merged'"},
        not_matched_insert="true",
        insert_values={"tag": "'new'"},
    )
    # update_set overrides only the listed columns; unlisted shared
    # columns default to s.<col>
    assert rows(out) == {
        (1, "a", 10, "keep"),
        (2, "B", 119, "merged"),
        (3, "C", 31, "merged"),
        (4, "D", 45, "merged"),
        (5, "E", 50, "new"),
        (6, "F", -1, "new"),
    }


def test_update_disabled_and_delete_only(spark, frames):
    target, source = frames
    out = merge_into(target, source, on=("k",),
                     matched_update=None,
                     matched_delete="true",
                     not_matched_insert=None)
    assert rows(out) == {(1, "a", 10, "keep")}


def test_null_condition_counts_as_false(spark):
    target = spark.createDataFrame([(1, None)], "k int, v int")
    source = spark.createDataFrame([(1, 5)], "k int, v int")
    # t.v is NULL -> s.v > t.v is NULL -> clause must NOT fire
    out = merge_into(target, source, on=("k",), matched_update="s.v > t.v",
                     not_matched_insert=None)
    assert rows(out) == {(1, None)}


def test_bad_key_raises(spark, frames):
    target, source = frames
    with pytest.raises(ValueError):
        merge_into(target, source, on=("nope",))
    with pytest.raises(ValueError):
        merge_into(target, source, on=())
