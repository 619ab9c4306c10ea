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


def test_correlation_stream_through_kafka_sim(spark, tmp_path):
    """The stream leg through the DataSource-V2 kafka simulator (wire
    schema, real per-partition offsets, 2-record micro-batches) — not just
    file sources: correlate_alerts_stream over
    format('kafka_sim') == correlate_alerts over the same wire records
    batch-loaded.  Event time is the transport timestamp (base_ts + line
    index seconds), exactly the reference's METADATA column semantics
    (windows-process-access.sql:24), so the pair lags are crafted by line
    order: window_s=2 admits (a1,b1 lag 1) and (a2,b2 lag 2), excludes the
    cross-host b3 and the lag-5 b4."""
    import json

    from dagger_spark.sources.kafka import kafka_events_from_records
    from dagger_spark.sources.kafka_sim import register_kafka_sim

    register_kafka_sim(spark)
    ra, rb = _pair()

    def payload(uuid, host, kind):
        trace = ("UNKNOWN(0000000000000000)|x" if kind == "a"
                 else "z|cmlua.dll|w")
        return json.dumps({
            "computer_name": host, "event_id": 10, "host": "h",
            "uuid": uuid, "event_data": {"CallTrace": trace},
        })

    lines = [  # line index == transport-timestamp offset in seconds
        payload("a1", "H1", "a"),   # t=0
        payload("b1", "H1", "b"),   # t=1 -> pair, lag 1
        payload("a2", "H2", "a"),   # t=2
        payload("b3", "H3", "b"),   # t=3: other host -> no pair
        payload("b2", "H2", "b"),   # t=4 -> pair, lag 2
        payload("b4", "H1", "b"),   # t=5: lag 5 > window 2 -> no pair
    ]
    src = tmp_path / "ksim_corr.jsonl"
    src.write_text("\n".join(lines) + "\n")

    stream = (
        spark.readStream.format("kafka_sim")
        .option("path", str(src)).option("topic", "events")
        .option("batch_size", 2)
        .load()
    )
    q = (
        # watermark=None at the source: correlate_alerts_stream owns the
        # per-side watermarks, and Spark forbids redefining one downstream
        correlate_alerts_stream(
            kafka_events_from_records(stream, watermark=None),
            ra, rb, window_s=2,
        )
        .writeStream.format("memory").queryName("ksim_corr_out")
        .option("checkpointLocation", str(tmp_path / "ksim_corr_ckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql(
            "SELECT entity, a_uuid, b_uuid, lag_s FROM ksim_corr_out"
        ).collect()}
    finally:
        q.stop()

    batch = (
        spark.read.format("kafka_sim")
        .option("path", str(src)).option("topic", "events")
        .load()
    )
    want = {tuple(r) for r in correlate_alerts(
        kafka_events_from_records(batch), ra, rb, window_s=2
    ).collect()}
    assert got == want == {("H1", "a1", "b1", 1), ("H2", "a2", "b2", 2)}


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
