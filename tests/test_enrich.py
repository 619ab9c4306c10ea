"""Longest-prefix-match CIDR enrichment (ops/enrich.cidr_lpm_join).

Semantics pinned here; the catalog twin (`events_cidr_enrich`) carries the
DuckDB differential over the driver events table.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dagger_spark.ops.enrich import cidr_lpm_join  # noqa: E402


def _ip(dotted: str) -> int:
    a, b, c, d = (int(x) for x in dotted.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


FEED_SCHEMA = "prefix_int long, prefix_len int, label string, severity int"


def _events(spark, ips):
    return spark.createDataFrame(
        [(i, _ip(ip)) for i, ip in enumerate(ips)], "eid int, ip long"
    )


def test_most_specific_prefix_wins(spark):
    feed = spark.createDataFrame(
        [
            (_ip("10.0.0.0"), 8, "wide", 1),
            (_ip("10.1.0.0"), 16, "mid", 2),
            (_ip("10.1.2.0"), 24, "narrow", 3),
        ],
        FEED_SCHEMA,
    )
    ev = _events(spark, ["10.1.2.3", "10.1.9.9", "10.9.9.9", "11.0.0.1"])
    out = {
        r["eid"]: (r["label"], r["matched_len"])
        for r in cidr_lpm_join(ev, feed, "ip", ["label", "severity"]).collect()
    }
    assert out[0] == ("narrow", 24)   # matches /8, /16 AND /24 -> /24 wins
    assert out[1] == ("mid", 16)      # matches /8 and /16 -> /16 wins
    assert out[2] == ("wide", 8)
    assert out[3] == (None, None)     # unmatched: NULL payload, row kept


def test_matched_null_payload_field_does_not_fall_through(spark):
    # A /24 row whose severity is NULL must surface that NULL — not stitch
    # in the /8 row's severity (the atomic-struct guarantee).
    feed = spark.createDataFrame(
        [(_ip("10.0.0.0"), 8, "wide", 7), (_ip("10.1.2.0"), 24, "narrow", None)],
        FEED_SCHEMA,
    )
    row = cidr_lpm_join(
        _events(spark, ["10.1.2.3"]), feed, "ip", ["label", "severity"]
    ).collect()[0]
    assert row["label"] == "narrow" and row["severity"] is None
    assert row["matched_len"] == 24


def test_duplicate_feed_networks_do_not_duplicate_events(spark):
    feed = spark.createDataFrame(
        [
            (_ip("10.1.2.0"), 24, "a", 1),
            (_ip("10.1.2.255"), 24, "b", 2),  # same /24 after truncation
        ],
        FEED_SCHEMA,
    )
    out = cidr_lpm_join(
        _events(spark, ["10.1.2.3", "10.1.2.4"]), feed, "ip", ["label"]
    )
    assert out.count() == 2  # exactly one row per event, not a fan-out


def test_len_edges_zero_and_thirtytwo(spark):
    feed = spark.createDataFrame(
        [
            (0, 0, "default", 0),                    # /0 matches everything
            (_ip("83.132.83.215"), 32, "exact", 9),  # /32: shift-by-zero
        ],
        FEED_SCHEMA,
    )
    out = {
        r["eid"]: (r["label"], r["matched_len"])
        for r in cidr_lpm_join(
            _events(spark, ["83.132.83.215", "83.132.83.216"]),
            feed, "ip", ["label", "severity"],
        ).collect()
    }
    assert out[0] == ("exact", 32)
    assert out[1] == ("default", 0)


def test_empty_feed_keeps_rows_with_null_payload(spark):
    feed = spark.createDataFrame([], FEED_SCHEMA)
    out = cidr_lpm_join(_events(spark, ["1.2.3.4"]), feed, "ip", ["label"])
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["label"] is None and rows[0]["matched_len"] is None


def test_plan_event_side_never_shuffles(spark):
    """Every join is a broadcast hash join; the only Exchanges are the
    feed-sized per-length dedups — the event lineage is one map stage."""
    feed = spark.createDataFrame(
        [
            (_ip("10.0.0.0"), 8, "wide", 1),
            (_ip("10.1.0.0"), 16, "mid", 2),
            (_ip("10.1.2.0"), 24, "narrow", 3),
        ],
        FEED_SCHEMA,
    )
    ev = _events(spark, ["10.1.2.3"] * 8)
    df = cidr_lpm_join(ev, feed, "ip", ["label", "severity"])
    df.collect()  # finalize AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==", 1)[0]
    assert plan.count("BroadcastHashJoin") == 3  # one per distinct length
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # every hash Exchange sits under a BroadcastExchange (feed dedup), never
    # on the event lineage: the event side of each join is exchange-free
    for frag in plan.split("BroadcastExchange")[:1]:
        # text before the first BroadcastExchange is the event-side spine
        assert "Exchange hashpartitioning" not in frag


def test_streaming_stateless(spark, tmp_path):
    """The op is stateless projections + broadcast joins — it runs as-is on
    a streaming DataFrame (no watermark, no state store)."""
    src = str(tmp_path / "src")
    ev = _events(spark, ["10.1.2.3", "11.0.0.1"])
    ev.write.parquet(src)
    feed = spark.createDataFrame(
        [(_ip("10.0.0.0"), 8, "wide", 1)], FEED_SCHEMA
    )
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = cidr_lpm_join(stream, feed, "ip", ["label", "severity"])
    q = (
        out.writeStream.format("memory")
        .queryName("cidr_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["eid"]: r["label"]
        for r in spark.sql("SELECT * FROM cidr_stream").collect()
    }
    batch = {
        r["eid"]: r["label"]
        for r in cidr_lpm_join(ev, feed, "ip", ["label", "severity"]).collect()
    }
    assert got == batch == {0: "wide", 1: None}
