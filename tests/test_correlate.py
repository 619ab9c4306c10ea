"""Correlation rules (the Sigma meta-rule surface the reference lacks):
crafted-case semantics, a DuckDB differential oracle over the seed-42
sysmon fixture, and batch == stream."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dagger_spark.expr import to_sql
from dagger_spark.rules.builtin import active_rules
from dagger_spark.rules.correlate import (
    correlate_alerts,
    correlate_alerts_stream,
)
from dagger_spark.schemas import SYSMON_EVENT_SCHEMA


def _pair():
    # two rules that both fire on the seed-42 fixture; deterministic pick
    rules = sorted(active_rules(), key=lambda r: r.name)
    a = next(r for r in rules if r.name == "Direct Syscall of NtOpenProcess")
    b = next(r for r in rules if r.name == "CMSTP Execution Process Access")
    return a, b


WINDOW = 1800


def test_correlation_matches_duckdb_oracle(spark, sysmon_df, duck):
    ra, rb = _pair()
    got = {
        (r["entity"], r["a_uuid"], r["b_uuid"], r["lag_s"])
        for r in correlate_alerts(sysmon_df, ra, rb, window_s=WINDOW).collect()
    }
    sa = to_sql(ra.predicate, "duckdb", case_insensitive=ra.case_insensitive)
    sb = to_sql(rb.predicate, "duckdb", case_insensitive=rb.case_insensitive)
    want = {
        tuple(r)
        for r in duck.execute(f"""
            WITH a AS (SELECT computer_name, uuid,
                              date_trunc('second', timestamp) AS ts
                       FROM sysmon WHERE {sa}),
                 b AS (SELECT computer_name, uuid,
                              date_trunc('second', timestamp) AS ts
                       FROM sysmon WHERE {sb})
            SELECT a.computer_name, a.uuid, b.uuid,
                   CAST(epoch(b.ts) - epoch(a.ts) AS BIGINT)
            FROM a JOIN b ON a.computer_name = b.computer_name
            WHERE epoch(b.ts) - epoch(a.ts) BETWEEN 0 AND {WINDOW}
              AND a.uuid <> b.uuid
        """).fetchall()
    }
    assert got == want and len(got) > 0


def _mk_events(spark, rows):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(uuid, host, offset_s, kind):
        # kind 'a' matches Direct Syscall of NtOpenProcess (event 10,
        # CallTrace startswith UNKNOWN); kind 'b' matches CMSTP Execution
        # Process Access (event 10, CallTrace contains cmlua.dll) — each
        # crafted trace matches exactly one of the two rules
        ed = {f.name: None for f in SYSMON_EVENT_SCHEMA["event_data"].dataType.fields}
        if kind == "a":
            ed.update(CallTrace="UNKNOWN(0000000000000000)|x")
        else:
            ed.update(CallTrace="z|cmlua.dll|w")
        return (host, 10, "h", tuple(ed.values()), uuid,
                t0 + dt.timedelta(seconds=offset_s))

    return spark.createDataFrame([ev(*r) for r in rows], SYSMON_EVENT_SCHEMA)


def test_correlation_window_and_order_semantics(spark):
    ra, rb = _pair()
    events = _mk_events(spark, [
        ("a1", "H1", 0, "a"),
        ("b1", "H1", 100, "b"),    # within window, ordered -> pair
        ("b2", "H1", 2000, "b"),   # beyond 1800 s -> no pair
        ("b3", "H2", 50, "b"),     # different host -> no pair
        ("b4", "H1", -50, "b"),    # B before A -> no pair (ordered)
    ])
    got = {(r["a_uuid"], r["b_uuid"], r["lag_s"])
           for r in correlate_alerts(events, ra, rb, window_s=1800).collect()}
    assert got == {("a1", "b1", 100)}


def test_correlation_batch_equals_stream(spark, tmp_path):
    ra, rb = _pair()
    events = _mk_events(spark, [
        ("a1", "H1", 0, "a"),
        ("b1", "H1", 100, "b"),
        ("a2", "H2", 10, "a"),
        ("b5", "H2", 1700, "b"),
        ("b2", "H1", 2000, "b"),
        ("b4", "H1", -50, "b"),
    ])
    src = tmp_path / "corr_src"
    src.mkdir()
    events.coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(events.schema).parquet(str(src) + "/*")
    q = (
        correlate_alerts_stream(stream, ra, rb, window_s=1800)
        .writeStream.format("memory").queryName("corr_out")
        .option("checkpointLocation", str(tmp_path / "corr_ckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql(
            "SELECT entity, a_uuid, b_uuid, lag_s FROM corr_out").collect()}
    finally:
        q.stop()
    want = {tuple(r) for r in
            correlate_alerts(events, ra, rb, window_s=1800).collect()}
    assert got == want and len(want) == 2
