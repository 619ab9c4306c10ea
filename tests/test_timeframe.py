"""Windowed timeframe rules: batch semantics + DuckDB differential oracle."""

from datetime import datetime, timedelta, timezone

import duckdb
import pytest
from pyspark.sql import functions as F

from dagger_spark.rules.timeframe import apply_timeframe_rule, apply_timeframe_rules
from dagger_spark.schemas import SYSMON_EVENT_SCHEMA
from dagger_spark.sigma import compile_sigma

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)
NAIVE = datetime(2024, 1, 1)  # Spark collects session-UTC naive datetimes


def tf_rule(seconds=60, min_count=3, by=None):
    det = {"sel": {"TargetImage|endswith": "\\lsass.exe"},
           "timeframe": f"{seconds}s",
           "condition": f"sel | count(){' by ' + by if by else ''} >= {min_count}"}
    return compile_sigma({
        "title": "Burst LSASS Access", "author": "t", "description": "d",
        "level": "high", "logsource": {"category": "process_access"},
        "detection": det,
    })


@pytest.fixture(scope="module")
def burst_df(spark, tmp_path_factory):
    """Deterministic bursts: hostA has 4 hits in window [0,60), hostB has 2
    (below threshold), hostA has 2 more in window [60,120)."""
    rows = []

    def ev(i, host, offset_s, target="C:\\Windows\\System32\\lsass.exe", eid=10):
        ed = {f.name: None for f in SYSMON_EVENT_SCHEMA["event_data"].dataType.fields}
        ed["TargetImage"] = target
        return ("CN", eid, host, ed, f"u-{i:03d}", BASE + timedelta(seconds=offset_s))

    i = 0
    for off in (1, 5, 20, 59):
        rows.append(ev(i, "hostA", off)); i += 1
    for off in (10, 30):
        rows.append(ev(i, "hostB", off)); i += 1
    for off in (61, 90):
        rows.append(ev(i, "hostA", off)); i += 1
    # noise: wrong target / wrong event id inside the hot window
    rows.append(ev(i, "hostA", 2, target="C:\\x\\notepad.exe")); i += 1
    rows.append(ev(i, "hostA", 3, eid=1)); i += 1
    df = spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA)
    p = str(tmp_path_factory.mktemp("tf") / "burst.parquet")
    df.write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)


def test_threshold_and_window_boundaries(burst_df):
    rule = tf_rule(60, 3)
    out = apply_timeframe_rule(burst_df, rule).collect()
    assert len(out) == 1  # only hostA window [0,60) reaches 3
    a = out[0]
    assert a["host"] == "hostA"
    assert a["event"]["count"] == 4
    assert a["event"]["start"] == NAIVE + timedelta(seconds=1)
    assert a["event"]["end"] == NAIVE + timedelta(seconds=59)
    assert a["event"]["time"] == a["event"]["end"]
    assert sorted(a["event"]["origin_ids"]) == ["u-000", "u-001", "u-002", "u-003"]
    assert a["rule"]["name"] == "Burst LSASS Access"
    assert a["rule"]["severity"] == 7


def test_lower_threshold_emits_more_windows(burst_df):
    rule = tf_rule(60, 2)
    out = apply_timeframe_rule(burst_df, rule).collect()
    got = {(r["host"], r["event"]["count"]) for r in out}
    assert got == {("hostA", 4), ("hostB", 2), ("hostA", 2)}


def test_duckdb_oracle_window_counts(burst_df, tmp_path):
    """Spark window(ts, 60s) == DuckDB epoch-floor bucketing, count + min/max."""
    p = str(tmp_path / "burst_oracle.parquet")
    burst_df.write.mode("overwrite").parquet(p)
    rule = tf_rule(60, 2)
    out = apply_timeframe_rule(burst_df, rule).select(
        "host",
        F.col("event.count").alias("cnt"),
        F.col("event.start").alias("s"),
        F.col("event.end").alias("e"),
    ).collect()
    got = {(r.host, r.cnt, r.s.replace(tzinfo=timezone.utc), r.e.replace(tzinfo=timezone.utc)) for r in out}
    con = duckdb.connect()
    want = {
        (h, c, s.replace(tzinfo=timezone.utc), e.replace(tzinfo=timezone.utc))
        for h, c, s, e in con.execute(f"""
        SELECT host, count(*) cnt, min("timestamp") s, max("timestamp") e
        FROM read_parquet('{p}/*.parquet')
        WHERE event_id = 10 AND ends_with(lower("event_data"."TargetImage"), lower('\\lsass.exe'))
        GROUP BY host, to_timestamp(floor(epoch("timestamp")/60)*60)
        HAVING count(*) >= 2
        """).fetchall()
    }
    assert got == want


def test_group_by_extra_field(burst_df):
    rule = tf_rule(60, 3, by="TargetImage")
    out = apply_timeframe_rule(burst_df, rule).collect()
    assert len(out) == 1 and out[0]["event"]["count"] == 4


def test_apply_timeframe_rules_requires_tf(burst_df):
    with pytest.raises(ValueError):
        apply_timeframe_rules(burst_df, [])


def test_batch_origin_ids_capped_and_deterministic(spark):
    """With count >> max_origin_ids the collected list holds exactly the cap,
    and specifically the EARLIEST events by (ts, uuid) — the cap is applied
    before aggregation (bounded buffer), not sliced after."""
    rows = []
    for i in range(50):
        ed = {f.name: None for f in SYSMON_EVENT_SCHEMA["event_data"].dataType.fields}
        ed["TargetImage"] = "C:\\Windows\\System32\\lsass.exe"
        rows.append(("CN", 10, "hostA", ed, f"u-{i:03d}", BASE + timedelta(seconds=i)))
    df = spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA)
    out = apply_timeframe_rule(df, tf_rule(60, 3), max_origin_ids=5).collect()
    assert len(out) == 1
    a = out[0]
    assert a["event"]["count"] == 50
    assert a["event"]["origin_ids"] == [f"u-{i:03d}" for i in range(5)]


def test_stream_state_bounded_at_cap(spark, tmp_path):
    """One key receiving >> cap matching events inside one window: the
    streaming state (which IS the emitted list — there is no output-side
    slice) stops accumulating uuids at the cap, while the count keeps
    counting; batch agrees on (window, count, cap)."""
    import shutil
    from dagger_spark.streaming import file_stream_events, run_to_memory

    n = 200
    rows = []
    for i in range(n):
        ed = {f.name: None for f in SYSMON_EVENT_SCHEMA["event_data"].dataType.fields}
        ed["TargetImage"] = "C:\\Windows\\System32\\lsass.exe"
        rows.append(
            ("CN", 10, "hostA", ed, f"u-{i:04d}", BASE + timedelta(seconds=i % 60))
        )
    # a push row far in the future advances the watermark past the window end.
    # It must MATCH the rule: Catalyst pushes the (timestamp-free) rule filter
    # below the EventTimeWatermark node, so only matching rows advance the
    # watermark.  Its own window stays below threshold (count 1 < 3).
    ed = {f.name: None for f in SYSMON_EVENT_SCHEMA["event_data"].dataType.fields}
    ed["TargetImage"] = "C:\\Windows\\System32\\lsass.exe"
    rows.append(("CN", 10, "push", ed, "u-push", BASE + timedelta(seconds=600)))

    src = tmp_path / "cap_src"
    src.mkdir()
    spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )
    rule = tf_rule(60, 3)
    events = file_stream_events(spark, str(src) + "/*", watermark="5 seconds")
    alerts = apply_timeframe_rule(events, rule, max_origin_ids=5)
    q = run_to_memory(alerts, "cap_alerts", str(tmp_path / "cap_ckpt"))
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM cap_alerts").collect()
    finally:
        q.stop()
    assert len(got) == 1
    a = got[0]
    assert a["event"]["count"] == n
    assert len(a["event"]["origin_ids"]) == 5
    all_ids = {f"u-{i:04d}" for i in range(n)}
    assert set(a["event"]["origin_ids"]) <= all_ids

    # batch parity on window identity, count, and cap size
    batch = apply_timeframe_rule(
        spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA), rule, max_origin_ids=5
    ).collect()
    assert len(batch) == 1
    assert batch[0]["event"]["count"] == n
    assert len(batch[0]["event"]["origin_ids"]) == 5
    assert batch[0]["event"]["start"] == a["event"]["start"]
    assert batch[0]["event"]["end"] == a["event"]["end"]


def _lsass_ev(i, host, offset_s):
    ed = {f.name: None for f in SYSMON_EVENT_SCHEMA["event_data"].dataType.fields}
    ed["TargetImage"] = "C:\\Windows\\System32\\lsass.exe"
    return ("CN", 10, host, ed, f"s-{i:03d}", BASE + timedelta(seconds=offset_s))


def test_sliding_catches_boundary_straddling_burst(spark):
    """4 events in a 58 s span straddling the 60 s tumbling boundary
    (t=31,45,61,89): tumbling sees 2+2 and stays silent — the documented
    round-2 under-detection — while slide=30 puts all 4 inside window
    [30,90) and alerts.  This is the Sigma intent: N events within ANY
    timeframe-second span (detected whenever the burst spans < tf - slide)."""
    from dataclasses import replace

    rows = [_lsass_ev(i, "hostA", off) for i, off in enumerate((31, 45, 61, 89))]
    df = spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA)
    tumbling = tf_rule(60, 4)
    assert apply_timeframe_rule(df, tumbling).count() == 0
    sliding = replace(tumbling, timeframe_slide_seconds=30)
    out = apply_timeframe_rule(df, sliding).collect()
    assert len(out) == 1
    a = out[0]
    assert a["host"] == "hostA" and a["event"]["count"] == 4
    assert a["event"]["start"] == NAIVE + timedelta(seconds=31)
    assert a["event"]["end"] == NAIVE + timedelta(seconds=89)
    assert sorted(a["event"]["origin_ids"]) == ["s-000", "s-001", "s-002", "s-003"]


def test_sliding_stream_matches_batch(spark, tmp_path):
    """The same straddling burst through the stateful streaming path: the
    sliding explode multiplies window-state updates (tf/slide per event) but
    emission, counts, bounds, and ids match batch exactly."""
    from dataclasses import replace
    from dagger_spark.streaming import file_stream_events, run_to_memory

    rows = [_lsass_ev(i, "hostA", off) for i, off in enumerate((31, 45, 61, 89))]
    rows.append(_lsass_ev(99, "push", 600))  # advances watermark past window end
    src = tmp_path / "slide_src"
    src.mkdir()
    spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )
    sliding = replace(tf_rule(60, 4), timeframe_slide_seconds=30)
    events = file_stream_events(spark, str(src) + "/*", watermark="5 seconds")
    alerts = apply_timeframe_rule(events, sliding)
    q = run_to_memory(alerts, "slide_alerts", str(tmp_path / "slide_ckpt"))
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM slide_alerts").collect()
    finally:
        q.stop()
    batch = apply_timeframe_rule(
        spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA), sliding
    ).collect()
    assert len(got) == len(batch) == 1
    for s, b in zip(got, batch):
        assert s["host"] == b["host"] == "hostA"
        assert s["event"]["count"] == b["event"]["count"] == 4
        assert s["event"]["start"] == b["event"]["start"]
        assert s["event"]["end"] == b["event"]["end"]
        assert sorted(s["event"]["origin_ids"]) == sorted(b["event"]["origin_ids"])


def test_slide_must_divide_timeframe(spark):
    from dataclasses import replace

    df = spark.createDataFrame(
        [_lsass_ev(0, "hostA", 1)], SYSMON_EVENT_SCHEMA
    )
    for bad in (7, 120, 0, -30):
        rule = replace(tf_rule(60, 3), timeframe_slide_seconds=bad)
        with pytest.raises(ValueError, match="divisor"):
            apply_timeframe_rule(df, rule)


def test_exact_timeframe_catches_what_sliding_misses(spark):
    """Events at t=29,45,61,88: a 59 s span of 4 events.  Tumbling 60 s
    sees 2+2; sliding slide=30 sees at most 3 in [30,90) — both silent.
    Exact semantics trigger at t=88 (its 3rd predecessor t=29 is within
    60 s): count = N, start = the span's first event, ids = all four."""
    from dataclasses import replace

    rows = [_lsass_ev(i, "hostA", off) for i, off in enumerate((29, 45, 61, 88))]
    df = spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA)
    base = tf_rule(60, 4)
    assert apply_timeframe_rule(df, base).count() == 0
    assert apply_timeframe_rule(
        df, replace(base, timeframe_slide_seconds=30)
    ).count() == 0
    out = apply_timeframe_rule(df, replace(base, timeframe_exact=True)).collect()
    assert len(out) == 1
    a = out[0]
    assert a["host"] == "hostA" and a["event"]["count"] == 4
    assert a["event"]["start"] == NAIVE + timedelta(seconds=29)
    assert a["event"]["end"] == NAIVE + timedelta(seconds=88)
    assert a["event"]["origin_ids"] == ["s-000", "s-001", "s-002", "s-003"]


def test_exact_timeframe_episode_suppression(spark):
    """A sustained burst (8 events, 5 s apart, N=3/T=60): every event from
    the 3rd on is a trigger, but only the episode-starting one alerts."""
    from dataclasses import replace

    rows = [_lsass_ev(i, "hostA", 5 * i) for i in range(8)]
    df = spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA)
    out = apply_timeframe_rule(
        df, replace(tf_rule(60, 3), timeframe_exact=True)
    ).collect()
    assert len(out) == 1
    assert out[0]["event"]["origin_ids"] == ["s-000", "s-001", "s-002"]
    # two bursts separated by > T: two episodes, two alerts
    rows2 = rows + [_lsass_ev(10 + i, "hostA", 300 + 5 * i) for i in range(3)]
    df2 = spark.createDataFrame(rows2, SYSMON_EVENT_SCHEMA)
    out2 = apply_timeframe_rule(
        df2, replace(tf_rule(60, 3), timeframe_exact=True)
    ).collect()
    assert len(out2) == 2


def test_exact_timeframe_stream_matches_batch(spark, tmp_path):
    """The arrival-driven stateful twin: same alerts (count, bounds, ids)
    as the batch lag-window formulation, state capped at N-1 pairs/key."""
    from dataclasses import replace
    from dagger_spark.streaming import file_stream_events, run_to_memory

    rows = [_lsass_ev(i, "hostA", off) for i, off in enumerate((29, 45, 61, 88))]
    rows += [_lsass_ev(10 + i, "hostB", 5 * i) for i in range(5)]
    src = tmp_path / "ex_src"
    src.mkdir()
    spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )
    rule = replace(tf_rule(60, 4), timeframe_exact=True)
    events = file_stream_events(spark, str(src) + "/*", watermark="5 seconds")
    q = run_to_memory(
        apply_timeframe_rule(events, rule), "ex_alerts", str(tmp_path / "ex_ck")
    )
    try:
        q.processAllAvailable()
        got = sorted(
            spark.sql("SELECT * FROM ex_alerts").collect(),
            key=lambda r: r["host"],
        )
    finally:
        q.stop()
    batch = sorted(
        apply_timeframe_rule(
            spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA), rule
        ).collect(),
        key=lambda r: r["host"],
    )
    assert len(got) == len(batch) == 2  # hostA span + hostB dense burst
    for s, b in zip(got, batch):
        assert s["host"] == b["host"]
        assert s["event"]["count"] == b["event"]["count"]
        assert s["event"]["start"] == b["event"]["start"]
        assert s["event"]["end"] == b["event"]["end"]
        assert s["event"]["origin_ids"] == b["event"]["origin_ids"]


def test_exact_and_slide_mutually_exclusive(spark):
    from dataclasses import replace

    df = spark.createDataFrame([_lsass_ev(0, "h", 1)], SYSMON_EVENT_SCHEMA)
    bad = replace(tf_rule(60, 3), timeframe_exact=True, timeframe_slide_seconds=30)
    with pytest.raises(ValueError, match="mutually exclusive"):
        apply_timeframe_rule(df, bad)


def test_exact_timeframe_min_count_one(spark, tmp_path):
    """min_count=1 (a compilable Sigma config: 'sel | count() >= 1'):
    every event trivially triggers, episode suppression leaves exactly
    one alert per key, zero history kept — batch == stream, no crash."""
    from dataclasses import replace
    from dagger_spark.streaming import file_stream_events, run_to_memory

    rows = [_lsass_ev(i, "hostA", 5 * i) for i in range(4)]
    rows += [_lsass_ev(10, "hostB", 7)]
    rule = replace(tf_rule(60, 1), timeframe_exact=True)
    df = spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA)
    batch = sorted(
        apply_timeframe_rule(df, rule).collect(), key=lambda r: r["host"]
    )
    assert [(b["host"], b["event"]["count"], b["event"]["origin_ids"])
            for b in batch] == [("hostA", 1, ["s-000"]), ("hostB", 1, ["s-010"])]
    src = tmp_path / "n1_src"
    src.mkdir()
    df.coalesce(1).write.parquet(str(src / "b1"))
    events = file_stream_events(spark, str(src) + "/*", watermark="5 seconds")
    q = run_to_memory(
        apply_timeframe_rule(events, rule), "n1_alerts", str(tmp_path / "n1_ck")
    )
    try:
        q.processAllAvailable()
        got = sorted(
            spark.sql("SELECT * FROM n1_alerts").collect(),
            key=lambda r: r["host"],
        )
    finally:
        q.stop()
    assert [(g["host"], g["event"]["count"], g["event"]["origin_ids"])
            for g in got] == [(b["host"], b["event"]["count"],
                               b["event"]["origin_ids"]) for b in batch]
