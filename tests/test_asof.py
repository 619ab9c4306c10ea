"""Unit tests for as-of and interval joins (hand-crafted cases; the
catalog-level DuckDB differential runs in test_catalog.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dagger_spark.ops.asof import asof_join, interval_join


def ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "a"), (1, ts(12), "b"), (2, ts(10), "c"), (9, ts(10), "d")],
        "k int, lts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, ts(9), 9), (1, ts(11), 11), (1, ts(12), 12), (3, ts(8), 8)],
        "k int, rts timestamp, rv int",
    )
    return left, right


def test_asof_basics(frames):
    left, right = frames
    out = asof_join(left, right, "k", "lts", "rts", ["rv", "rts"])
    rows = {(r.k, r.lv): (r.rv, r.rts) for r in out.collect()}
    assert rows[(1, "a")] == (9, ts(9))        # latest <= 10:00
    assert rows[(1, "b")] == (12, ts(12))      # tie at 12:00 matches (<=)
    assert rows[(2, "c")] == (None, None)      # key exists only on left
    assert rows[(9, "d")] == (None, None)
    assert out.count() == left.count()         # left join cardinality


def test_asof_ties_prefer_right_at_same_ts(spark):
    left = spark.createDataFrame([(1, ts(10), "x")], "k int, lts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, ts(10), 1), (1, ts(9), 2)], "k int, rts timestamp, rv int"
    )
    out = asof_join(left, right, "k", "lts", "rts", ["rv"]).collect()
    assert out[0].rv == 1


def test_asof_null_keys_never_match(spark):
    """DuckDB `ASOF JOIN ... ON l.k = r.k` semantics: NULL = NULL is not a
    match.  A NULL-key left row passes through with NULL payload even when a
    NULL-key right row exists; NULL right timestamps never satisfy
    `r.ts <= l.ts`."""
    left = spark.createDataFrame(
        [(None, ts(10), "nullk"), (1, ts(10), "one")],
        "k int, lts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(None, ts(9), 99), (1, ts(9), 7), (1, None, 42)],
        "k int, rts timestamp, rv int",
    )
    out = asof_join(left, right, "k", "lts", "rts", ["rv"])
    rows = {r.lv: r.rv for r in out.collect()}
    assert rows == {"nullk": None, "one": 7}
    assert out.count() == 2


def test_interval_join_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, 100, ts(10, 0, 0)),
            (1, 101, ts(10, 2, 0)),    # 120s from 100  -> pair
            (1, 102, ts(10, 7, 0)),    # 300s from 101  -> pair (inclusive)
            (1, 103, ts(10, 20, 0)),   # far from all
            (2, 200, ts(10, 0, 0)),    # other key
            (2, 201, ts(10, 1, 0)),
        ],
        "user_id int, event_id int, ts timestamp",
    )
    out = interval_join(df, df, "user_id", "ts", "ts", 300)
    pairs = {
        (r.event_id, r.event_id_r)
        for r in out.collect()
        if r.event_id < r.event_id_r
    }
    assert pairs == {(100, 101), (101, 102), (200, 201)}


def test_interval_join_no_duplicate_pairs(spark):
    # rows in the same bucket AND adjacent buckets must not double-match
    df = spark.createDataFrame(
        [(1, 1, ts(10, 0, 0)), (1, 2, ts(10, 0, 30))],
        "user_id int, event_id int, ts timestamp",
    )
    out = interval_join(df, df, "user_id", "ts", "ts", 300)
    matched = [r for r in out.collect() if r.event_id == 1 and r.event_id_r == 2]
    assert len(matched) == 1


def test_asof_null_right_payload_not_stitched(spark):
    """A matched right row with a NULL field must surface that NULL — not
    fall back to an older right row's value for that one column (the
    per-column carry-forward bug: output stitched from two right rows)."""
    left = spark.createDataFrame(
        [(1, ts(12), "x")], "k int, lts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [(1, ts(9), 10, 1), (1, ts(11), None, 3)],
        "k int, rts timestamp, a int, b int",
    )
    out = asof_join(left, right, "k", "lts", "rts", ["a", "b", "rts"])
    row = out.collect()[0]
    # the ts(11) row is the match: a must be NULL (its own value), b=3
    assert row.rts == ts(11)
    assert row.a is None
    assert row.b == 3
