"""Sigma Correlations (the modern SigmaHQ meta-rule spec): YAML parsing,
each correlation type's semantics over crafted events, a DuckDB
differential for the windowed-count types, and agreement with the
engine's lower-level correlate/timeframe machinery."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dagger_spark.expr import to_sql
from dagger_spark.rules.builtin import active_rules
from dagger_spark.rules.correlate import correlate_alerts
from dagger_spark.rules.spec import RuleSpec
from dagger_spark.schemas import SYSMON_EVENT_SCHEMA
from dagger_spark.sigma.compiler import SigmaCompileError
from dagger_spark.sigma.correlation import (
    compile_correlation, load_correlations, parse_correlation,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(uuid, host, offset_s, trace="UNKNOWN(0000000000000000)|x",
        target=None):
    ed = {f.name: None for f in
          SYSMON_EVENT_SCHEMA["event_data"].dataType.fields}
    ed.update(CallTrace=trace)
    if target is not None:
        ed.update(TargetImage=target)
    return (host, 10, "h", tuple(ed.values()), uuid,
            T0 + dt.timedelta(seconds=offset_s))


def _events(spark, rows):
    return spark.createDataFrame(rows, SYSMON_EVENT_SCHEMA)


def _registry():
    return {r.name: r for r in active_rules()}


SYSCALL = "Direct Syscall of NtOpenProcess"
CMSTP = "CMSTP Execution Process Access"


# ---------------------------------------------------------------- parsing

def test_parse_rejects_bad_documents():
    base = {"title": "t", "correlation": {
        "type": "event_count", "rules": ["r"], "timespan": "10m",
        "condition": {"gte": 3}}}
    parse_correlation(base)  # sane doc parses
    for mutate in (
        lambda d: d["correlation"].pop("timespan"),
        lambda d: d["correlation"].pop("condition"),
        lambda d: d["correlation"].update(type="nope"),
        lambda d: d["correlation"].update(condition={"ge": 3}),
        lambda d: d["correlation"].update(rules=[]),
    ):
        doc = {"title": "t", "correlation": dict(base["correlation"])}
        mutate(doc)
        with pytest.raises(SigmaCompileError):
            parse_correlation(doc)
    with pytest.raises(SigmaCompileError):
        parse_correlation({"title": "t", "correlation": {
            "type": "value_count", "rules": ["r"], "timespan": "1h",
            "condition": {"gte": 2}}})  # no field
    with pytest.raises(SigmaCompileError):
        parse_correlation({"title": "t", "correlation": {
            "type": "temporal_ordered", "rules": ["a", "b", "c"],
            "timespan": "1h"}})  # chains beyond 2 not implemented


def test_load_correlations_walks_yaml(tmp_path):
    (tmp_path / "corr.yml").write_text(
        """
title: burst
correlation:
  type: event_count
  rules: [base]
  group-by: [computer_name]
  timespan: 5m
  condition:
    gte: 4
---
title: not a correlation
detection:
  condition: sel
""")
    specs = load_correlations(str(tmp_path))
    assert [s.name for s in specs] == ["burst"]
    assert specs[0].timespan_seconds == 300
    assert specs[0].condition_value == 4


def test_unknown_rule_reference_fails_loudly():
    spec = parse_correlation({"title": "x", "correlation": {
        "type": "event_count", "rules": ["no-such-rule"],
        "timespan": "5m", "condition": {"gte": 1}}})
    with pytest.raises(SigmaCompileError, match="unknown rules"):
        compile_correlation(spec, _registry())


# ------------------------------------------------------------ event_count

def test_event_count_semantics_and_duckdb_oracle(spark, duck, sysmon_df):
    """gte:3 in 10-minute tumbling windows by host, differentially checked
    against DuckDB computing the same epoch-aligned windows over the
    seed-42 fixture corpus."""
    spec = parse_correlation({"title": "syscall burst", "correlation": {
        "type": "event_count", "rules": [SYSCALL],
        "group-by": ["computer_name"], "timespan": "10m",
        "condition": {"gte": 3}}})
    run = compile_correlation(spec, _registry())

    rows = [
        _ev("a1", "H1", 0), _ev("a2", "H1", 100), _ev("a3", "H1", 550),
        _ev("a4", "H2", 0), _ev("a5", "H2", 100),      # only 2 -> no alert
        _ev("a6", "H1", 700),                          # next window, alone
    ]
    got = {(r["computer_name"], r["value"]) for r in
           run(_events(spark, rows)).collect()}
    assert got == {("H1", 3)}

    # differential over the real fixture corpus (1h windows, gte:2 — the
    # 2000-row fixture tops out at 3 matches per host-hour)
    spec_h = parse_correlation({"title": "hourly", "correlation": {
        "type": "event_count", "rules": [SYSCALL],
        "group-by": ["computer_name"], "timespan": "1h",
        "condition": {"gte": 2}}})
    run_h = compile_correlation(spec_h, _registry())
    rule = _registry()[SYSCALL]
    sql = to_sql(rule.predicate, "duckdb",
                 case_insensitive=rule.case_insensitive)
    want = {
        (r[0], r[1]) for r in duck.execute(f"""
            SELECT computer_name, count(*) AS c
            FROM (SELECT computer_name,
                         to_timestamp(floor(epoch(timestamp)/3600)*3600) AS w
                  FROM sysmon WHERE {sql})
            GROUP BY computer_name, w HAVING count(*) >= 2
        """).fetchall()
    }
    got2 = {(r["computer_name"], r["value"])
            for r in run_h(sysmon_df).collect()}
    assert got2 == want and len(want) > 0


# ------------------------------------------------------------ value_count

def test_value_count_distinct_field(spark):
    """gte:2 DISTINCT TargetImage per host in one hour: three events but
    only two distinct targets on H1; H2 repeats one target."""
    spec = parse_correlation({"title": "spray", "correlation": {
        "type": "value_count", "rules": [SYSCALL],
        "group-by": ["computer_name"], "timespan": "1h",
        "field": "event_data.TargetImage", "condition": {"gte": 2}}})
    run = compile_correlation(spec, _registry())
    rows = [
        _ev("v1", "H1", 0, target="T1"), _ev("v2", "H1", 10, target="T1"),
        _ev("v3", "H1", 20, target="T2"),
        _ev("v4", "H2", 0, target="T1"), _ev("v5", "H2", 10, target="T1"),
    ]
    got = {(r["computer_name"], r["value"]) for r in
           run(_events(spark, rows)).collect()}
    assert got == {("H1", 2)}


# --------------------------------------------------------------- temporal

def test_temporal_unordered_pairs(spark):
    """temporal (2 rules) alerts in EITHER order within the timespan; the
    ordered variant only forward — the signed lag distinguishes them."""
    reg = _registry()
    rows = [
        _ev("a1", "H1", 0),                                  # syscall
        _ev("b1", "H1", 100, trace="z|cmlua.dll|w"),         # cmstp after
        _ev("b2", "H2", 0, trace="z|cmlua.dll|w"),           # cmstp first
        _ev("a2", "H2", 50),                                 # syscall after
        _ev("b3", "H3", 5000, trace="z|cmlua.dll|w"),        # out of window
        _ev("a3", "H3", 0),
    ]
    ev = _events(spark, rows)

    base = {"rules": [SYSCALL, CMSTP], "group-by": ["computer_name"],
            "timespan": "30m"}
    uno = compile_correlation(parse_correlation(
        {"title": "u", "correlation": dict(type="temporal", **base)}),
        reg)
    ordo = compile_correlation(parse_correlation(
        {"title": "o", "correlation": dict(type="temporal_ordered", **base)}),
        reg)

    got_u = {(r["entity"], r["a_uuid"], r["b_uuid"], r["lag_s"])
             for r in uno(ev).collect()}
    got_o = {(r["entity"], r["a_uuid"], r["b_uuid"], r["lag_s"])
             for r in ordo(ev).collect()}
    assert got_u == {("H1", "a1", "b1", 100), ("H2", "a2", "b2", -50)}
    assert got_o == {("H1", "a1", "b1", 100)}
    # ordered output == the low-level operator verbatim
    want_o = {(r["entity"], r["a_uuid"], r["b_uuid"], r["lag_s"])
              for r in correlate_alerts(
                  ev, reg[SYSCALL], reg[CMSTP], window_s=1800).collect()}
    assert got_o == want_o


def _stream_replay(spark, rows, tmp_path, tag):
    """File-replay a crafted event set as a 2-file stream with a
    far-future sentinel pushing the watermark past every real window."""
    import glob
    import os
    import time

    src = str(tmp_path / f"src_{tag}")
    os.makedirs(src)
    half = max(1, len(rows) // 2)
    sentinel = _ev("zzz", "H-SENTINEL", 10 * 86400)
    df = _events(spark, rows)
    _events(spark, rows[:half]).coalesce(1).write.parquet(src + "/f0")
    _events(spark, rows[half:] + [sentinel]).coalesce(1).write.parquet(
        src + "/f1")
    files = sorted(glob.glob(src + "/f*/part-*.parquet"))
    now = time.time() - 60
    for i, f in enumerate(files):
        os.utime(f, (now + 10 * i, now + 10 * i))
    return spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1).parquet(src + "/f*")


@pytest.mark.parametrize("ctype,extra", [
    ("event_count", {"condition": {"gte": 2}}),
    ("value_count", {"condition": {"gte": 2},
                     "field": "event_data.TargetImage"}),
    ("temporal_ordered", {}),
    ("temporal", {}),
])
def test_correlation_stream_equals_batch(spark, tmp_path, ctype, extra):
    """One compiled callable, both engines: each correlation type replayed
    as a watermarked stream must emit exactly the batch result (the
    sentinel closes the final windows; sentinel rows filtered out)."""
    reg = _registry()
    corr = {"type": ctype, "rules": [SYSCALL] if "count" in ctype
            else [SYSCALL, CMSTP],
            "group-by": ["computer_name"], "timespan": "10m", **extra}
    spec = parse_correlation({"title": f"s_{ctype}", "correlation": corr})
    run = compile_correlation(spec, reg, watermark="0 seconds")

    rows = [  # chronological: the file split must not create late arrivals
        _ev("b2", "H2", 0, trace="z|cmlua.dll|w"),
        _ev("a1", "H1", 0, target="T1"),
        _ev("a3", "H2", 30, target="T1"),
        _ev("a2", "H1", 60, target="T2"),
        _ev("a4", "H2", 90, target="T1"),      # same target: value_count 1
        _ev("b1", "H1", 120, trace="z|cmlua.dll|w"),
        _ev("a5", "H3", 5000, target="T3"),    # lone, other window
    ]
    batch = {tuple(r) for r in run(_events(spark, rows)).collect()
             if "H-SENTINEL" not in tuple(r)}

    q = (
        run(_stream_replay(spark, rows, tmp_path, ctype))
        .writeStream.format("memory").queryName(f"corr_{ctype}")
        .option("checkpointLocation", str(tmp_path / f"ck_{ctype}"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql(
            f"SELECT * FROM corr_{ctype}").collect()
            if "H-SENTINEL" not in tuple(r)}
    finally:
        q.stop()
    assert got == batch and len(batch) > 0


def test_cli_emits_rules_and_correlations(tmp_path, capsys):
    """A mixed directory (base rules + correlation meta-rules) compiles in
    one CLI run: correlation docs don't trip the base compiler, and
    dangling rule references are surfaced in the JSON, not swallowed."""
    from dagger_spark.sigma.__main__ import main

    (tmp_path / "base.yml").write_text("""
title: base rule
logsource: {category: process_access}
detection:
  sel:
    CallTrace|startswith: 'UNKNOWN'
  condition: sel
""")
    (tmp_path / "corr.yml").write_text("""
title: burst of base
correlation:
  type: event_count
  rules: ["base rule", "missing rule"]
  group-by: [computer_name]
  timespan: 10m
  condition: {gte: 5}
""")
    import json

    assert main([str(tmp_path)]) == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert [l.get("kind") for l in lines] == [None, "correlation"]
    assert lines[1]["unresolved_rules"] == ["missing rule"]
    assert lines[1]["timespan_seconds"] == 600


def test_temporal_multi_rule_cooccurrence(spark):
    """3+ referenced rules: all three must fire for one host inside one
    tumbling window (synthetic single-field rules keep the semantics
    isolated from the builtin registry)."""
    regs = {
        f"r{i}": RuleSpec(
            name=f"r{i}",
            predicate_sql=f"event_data.TargetImage = 'X{i}'",
        )
        for i in (1, 2, 3)
    }
    spec = parse_correlation({"title": "chain", "correlation": {
        "type": "temporal", "rules": ["r1", "r2", "r3"],
        "group-by": ["computer_name"], "timespan": "10m"}})
    run = compile_correlation(spec, regs)
    rows = [
        _ev("c1", "H1", 0, target="X1"),
        _ev("c2", "H1", 60, target="X2"),
        _ev("c3", "H1", 120, target="X3"),     # all three inside 10m
        _ev("c4", "H2", 0, target="X1"),
        _ev("c5", "H2", 60, target="X2"),      # only two -> no alert
    ]
    got = [(r["computer_name"], r["n_events"]) for r in
           run(_events(spark, rows)).collect()]
    assert got == [("H1", 3)]


# ---------------------------------------------- review-pinned edge cases

def test_group_by_present_but_invalid_rejected():
    """A bare ``group-by:`` line (explicit null), an empty list, or
    non-string entries are typos — loud SigmaCompileError, not the silent
    default (and not the raw TypeError tuple(None) used to raise)."""
    base = {"type": "event_count", "rules": ["r"], "timespan": "10m",
            "condition": {"gte": 3}}
    for bad in (None, [], [1], ["ok", ""], 7):
        with pytest.raises(SigmaCompileError, match="group-by"):
            parse_correlation({"title": "t", "correlation":
                               dict(base, **{"group-by": bad})})
    # absent key still defaults; bare string still promotes to a list
    assert parse_correlation({"title": "t", "correlation": dict(base)}
                             ).group_by == ("computer_name",)
    assert parse_correlation(
        {"title": "t", "correlation": dict(base, **{"group-by": "host"})}
    ).group_by == ("host",)


def _run_stream(spark, run, rows, tmp_path, tag):
    q = (
        run(_stream_replay(spark, rows, tmp_path, tag))
        .writeStream.format("memory").queryName(f"rev_{tag}")
        .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        return {tuple(r) for r in
                spark.sql(f"SELECT * FROM rev_{tag}").collect()
                if "H-SENTINEL" not in tuple(r)}
    finally:
        q.stop()


def test_value_count_null_field_and_repeated_latest(spark, tmp_path):
    """Two review-found batch/stream divergences, both directions:

    * a NULL field value must not count as a distinct value on the
      streaming leg (batch count(DISTINCT) ignores NULLs), and rows
      carrying NULL must not stretch first/last_seen on either leg;
    * when the window's LATEST event repeats an already-seen value,
      last_seen must still be that latest time (the old dropDuplicates
      leg kept first arrivals, so last_seen lagged batch)."""
    spec = parse_correlation({"title": "vc", "correlation": {
        "type": "value_count", "rules": [SYSCALL],
        "group-by": ["computer_name"], "timespan": "1h",
        "field": "event_data.TargetImage", "condition": {"gte": 1}}})
    run = compile_correlation(spec, _registry(), watermark="0 seconds")
    rows = [
        _ev("n1", "H1", 0, target="T1"),
        _ev("n2", "H1", 10),                  # NULL target
        _ev("n3", "H1", 20, target="T1"),
        _ev("r1", "H2", 0, target="T1"),
        _ev("r2", "H2", 30, target="T2"),
        _ev("r3", "H2", 60, target="T1"),     # latest repeats T1
    ]
    batch = {tuple(r) for r in run(_events(spark, rows)).collect()}
    by_host = {t[1]: t for t in batch}
    # H1: one distinct value; NULL row at +10s contributes nothing
    assert by_host["H1"][4] == 1
    assert by_host["H1"][5] == T0 and by_host["H1"][6] == T0 + dt.timedelta(
        seconds=20)
    # H2: last_seen is the repeated value's LATEST arrival
    assert by_host["H2"][4] == 2
    assert by_host["H2"][6] == T0 + dt.timedelta(seconds=60)
    assert _run_stream(spark, run, rows, tmp_path, "vcnull") == batch


def test_temporal_multi_field_group_by(spark):
    """group-by with 2+ fields correlates on ALL of them: rule A in one
    source-image 'session' must not pair with rule B in another on the
    same host (the old path silently used group_by[0] only)."""
    regs = {
        "ra": RuleSpec(name="ra",
                       predicate_sql="event_data.TargetImage = 'A'"),
        "rb": RuleSpec(name="rb",
                       predicate_sql="event_data.TargetImage = 'B'"),
    }

    def ev2(uuid, host, off, target, source):
        ed = {f.name: None for f in
              SYSMON_EVENT_SCHEMA["event_data"].dataType.fields}
        ed.update(CallTrace="x", TargetImage=target, SourceImage=source)
        return (host, 10, "h", tuple(ed.values()), uuid,
                T0 + dt.timedelta(seconds=off))

    spec = parse_correlation({"title": "mf", "correlation": {
        "type": "temporal_ordered", "rules": ["ra", "rb"],
        "group-by": ["computer_name", "event_data.SourceImage"],
        "timespan": "30m"}})
    run = compile_correlation(spec, regs)
    rows = [
        ev2("a1", "H1", 0, "A", "S1"),
        ev2("b1", "H1", 60, "B", "S1"),   # same (host, source): pair
        ev2("b2", "H1", 30, "B", "S2"),   # same host, other source: no pair
    ]
    got = {(r["entity"]["computer_name"], r["entity"]["SourceImage"],
            r["a_uuid"], r["b_uuid"], r["lag_s"])
           for r in run(_events(spark, rows)).collect()}
    assert got == {("H1", "S1", "a1", "b1", 60)}


def test_temporal_subsecond_floor_lag_batch_equals_stream(spark, tmp_path):
    """Correlation lag is defined at SECOND resolution on both engines:
    A at 10.9s before B at 10.1s has floor lag 0 and must correlate — the
    stream leg's raw-timestamp join predicate alone would exclude it, so
    it is widened 1 s each end and refined on floor seconds after."""
    spec = parse_correlation({"title": "ss", "correlation": {
        "type": "temporal_ordered", "rules": [SYSCALL, CMSTP],
        "group-by": ["computer_name"], "timespan": "10m"}})
    run = compile_correlation(spec, _registry(), watermark="0 seconds")
    rows = [
        _ev("b1", "H1", 10.1, trace="z|cmlua.dll|w"),
        _ev("a1", "H1", 10.9),
    ]
    batch = {tuple(r) for r in run(_events(spark, rows)).collect()}
    assert batch == {("ss", "H1", "a1", "b1", 0)}
    assert _run_stream(spark, run, rows, tmp_path, "subsec") == batch


def test_temporal_multi_rule_stream_equals_batch(spark, tmp_path):
    """3+-rule co-occurrence streamed: the two-level chained aggregate
    reports the TRUE n_events and time extremes, equal to batch (the old
    dropDuplicates leg could only report the distinct-rule count)."""
    regs = {
        f"r{i}": RuleSpec(
            name=f"r{i}", predicate_sql=f"event_data.TargetImage = 'X{i}'")
        for i in (1, 2, 3)
    }
    spec = parse_correlation({"title": "chain3", "correlation": {
        "type": "temporal", "rules": ["r1", "r2", "r3"],
        "group-by": ["computer_name"], "timespan": "10m"}})
    run = compile_correlation(spec, regs, watermark="0 seconds")
    rows = [
        _ev("c1", "H1", 0, target="X1"),
        _ev("c2", "H1", 30, target="X1"),    # repeat of rule 1
        _ev("c3", "H1", 60, target="X2"),
        _ev("c4", "H1", 120, target="X3"),
        _ev("c5", "H2", 0, target="X1"),
        _ev("c6", "H2", 60, target="X2"),    # only two rules -> no alert
    ]
    batch = {tuple(r) for r in run(_events(spark, rows)).collect()}
    assert {(t[1], t[4]) for t in batch} == {("H1", 4)}  # true event count
    assert _run_stream(spark, run, rows, tmp_path, "multi3") == batch


def test_multi_rule_stream_plans_one_watermark_node(spark, tmp_path):
    """Regression guard for the starved-watermark shape: compiling a
    multi-rule correlation as a union of per-rule filtered branches puts
    one EventTimeWatermark node per branch behind a pushed-down rule
    predicate, making the global watermark the MINIMUM over branches — a
    rule that never fires then stalls every window forever.  The explode
    form must plan exactly ONE watermark node (counts/pair types too:
    one per watermarked stream leg)."""
    regs = {
        f"r{i}": RuleSpec(
            name=f"r{i}", predicate_sql=f"event_data.TargetImage = 'X{i}'")
        for i in (1, 2, 3)
    }
    rows = [_ev("w1", "H1", 0, target="X1")]
    d = str(tmp_path / "wm_src")
    _events(spark, rows).write.parquet(d)
    stream = spark.readStream.schema(_events(spark, rows).schema).parquet(d)

    def n_watermarks(sdf):
        plan = sdf._jdf.queryExecution().analyzed().toString()
        return sum(
            1 for line in plan.splitlines() if "EventTimeWatermark" in line
        )

    multi = compile_correlation(parse_correlation({
        "title": "m", "correlation": {
            "type": "temporal", "rules": ["r1", "r2", "r3"],
            "group-by": ["computer_name"], "timespan": "10m"}}), regs)
    assert n_watermarks(multi(stream)) == 1

    counts = compile_correlation(parse_correlation({
        "title": "c", "correlation": {
            "type": "value_count", "rules": ["r1"],
            "group-by": ["computer_name"], "timespan": "10m",
            "field": "event_data.TargetImage",
            "condition": {"gte": 1}}}), regs)
    assert n_watermarks(counts(stream)) == 1


def test_temporal_unordered_dual_match_pair_emitted_once(spark):
    """When BOTH events of a pair match BOTH base rules, the forward and
    reverse legs each produce an orientation of the SAME unordered pair —
    the batch leg must emit it once (forward wins); a pair seen only by
    the reverse leg still survives the dedup anti-join."""
    regs = {
        "rA": RuleSpec(
            name="rA",
            predicate_sql="event_data.TargetImage IN ('A', 'AB')",
        ),
        "rB": RuleSpec(
            name="rB",
            predicate_sql="event_data.TargetImage IN ('B', 'AB')",
        ),
    }
    spec = parse_correlation({"title": "dual", "correlation": {
        "type": "temporal", "rules": ["rA", "rB"],
        "group-by": ["computer_name"], "timespan": "10m"}})
    run = compile_correlation(spec, regs)
    rows = [
        _ev("d1", "H1", 0, target="AB"),    # matches BOTH rules
        _ev("d2", "H1", 60, target="AB"),   # matches BOTH rules
        _ev("e1", "H2", 0, target="B"),     # reverse-only pair: B then A
        _ev("e2", "H2", 60, target="A"),
    ]
    got = {(r["entity"], r["a_uuid"], r["b_uuid"], r["lag_s"]) for r in
           run(_events(spark, rows)).collect()}
    assert got == {("H1", "d1", "d2", 60), ("H2", "e2", "e1", -60)}


@pytest.mark.parametrize("ctype,extra", [
    ("event_count", {"condition": {"gte": 2}}),
    ("value_count", {"condition": {"gte": 2},
                     "field": "event_data.TargetImage"}),
])
def test_count_watermark_advances_on_nonmatching_events(
    spark, tmp_path, ctype, extra
):
    """A micro-batch containing ONLY rule-non-matching events must still
    advance the watermark and flush pending windows.  The old streaming
    shape filtered by the rule predicate after withWatermark; Catalyst
    pushed the (non-event-time) predicate BELOW the EventTimeWatermark
    node, so a rule that stopped firing left its last windows open forever
    — the compiled plan now routes EVERY event through the watermark node
    (explode of a 0/1 array, a generator that cannot be pushed down) and
    excludes non-matches by the zero-row explode output."""
    import glob
    import os
    import time

    corr = {"type": ctype, "rules": [SYSCALL],
            "group-by": ["computer_name"], "timespan": "10m", **extra}
    spec = parse_correlation({"title": f"wm_{ctype}", "correlation": corr})
    run = compile_correlation(spec, _registry(), watermark="0 seconds")

    matching = [
        _ev("m1", "H1", 0, target="T1"),
        _ev("m2", "H1", 60, target="T2"),
    ]
    # the closer matches NO rule: trace misses every registry predicate
    closer = [_ev("zzz", "H-CLOSER", 10 * 86400, trace="benign|clean")]

    src = str(tmp_path / f"wm_src_{ctype}")
    os.makedirs(src)
    _events(spark, matching).coalesce(1).write.parquet(src + "/f0")
    _events(spark, closer).coalesce(1).write.parquet(src + "/f1")
    files = sorted(glob.glob(src + "/f*/part-*.parquet"))
    now = time.time() - 60
    for i, f in enumerate(files):
        os.utime(f, (now + 10 * i, now + 10 * i))
    stream = spark.readStream.schema(
        _events(spark, matching).schema
    ).option("maxFilesPerTrigger", 1).parquet(src + "/f*")

    q = (
        run(stream)
        .writeStream.format("memory").queryName(f"wm_{ctype}")
        .option("checkpointLocation", str(tmp_path / f"wm_ck_{ctype}"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {(r["computer_name"], r["value"]) for r in
               spark.sql(f"SELECT * FROM wm_{ctype}").collect()}
    finally:
        q.stop()
    # the H1 window flushed solely because the non-matching closer
    # advanced the watermark; the closer itself produced no alert
    assert got == {("H1", 2)}


# ------------------------------------------------------- aliases (Sigma v2)

def _ev_u(uuid, host, off, target, user=None, parent_user=None):
    ed = {f.name: None for f in
          SYSMON_EVENT_SCHEMA["event_data"].dataType.fields}
    ed.update(CallTrace="x", TargetImage=target, User=user,
              ParentUser=parent_user)
    return (host, 10, "h", tuple(ed.values()), uuid,
            T0 + dt.timedelta(seconds=off))


_AB_REGS = lambda: {  # noqa: E731
    "ra": RuleSpec(name="ra", predicate_sql="event_data.TargetImage = 'A'"),
    "rb": RuleSpec(name="rb", predicate_sql="event_data.TargetImage = 'B'"),
}


def test_unknown_correlation_keys_rejected():
    """Implement-or-reject (round-6/7 ask): an unrecognized key in the
    correlation block — a typo'd ``alises:`` or ``groupby:`` — must
    raise, never compile a document whose semantics silently differ from
    what its author wrote.  (``generate`` graduated from this list when
    round 8 implemented it.)"""
    base = {"type": "event_count", "rules": ["r"], "timespan": "10m",
            "condition": {"gte": 3}}
    for key in ("generat", "alises", "groupby"):
        with pytest.raises(SigmaCompileError,
                           match="unrecognized correlation keys"):
            parse_correlation({"title": "t",
                               "correlation": dict(base, **{key: True})})


def test_aliases_parse_validation():
    """aliases must be a complete alias -> {rule: field} mapping over
    exactly the referenced rules: partial or dangling mappings would
    leave NULL group keys / dead normalizations with no warning."""
    base = {"type": "temporal", "rules": ["ra", "rb"], "timespan": "10m"}

    def with_aliases(a):
        return {"title": "t", "correlation": dict(base, aliases=a)}

    for bad, msg in (
        ([], "non-empty mapping"),
        ({"who": "event_data.User"}, "must map every referenced"),
        ({"who": {"ra": "f", "rx": "g"}}, "not in correlation.rules"),
        ({"who": {"ra": "f"}}, "no field mapping"),
    ):
        with pytest.raises(SigmaCompileError, match=msg):
            parse_correlation(with_aliases(bad))
    spec = parse_correlation(with_aliases(
        {"who": {"ra": "event_data.User", "rb": "event_data.ParentUser"}}))
    assert spec.alias_map == {
        "who": {"ra": "event_data.User", "rb": "event_data.ParentUser"}}


def test_event_count_aliases_normalize_groups(spark):
    """The spec's design case: rule A carries the entity in User, rule B
    in ParentUser; grouping on the alias counts them TOGETHER.  Without
    normalization alice's 2 ra-matches and 1 rb-match are separate
    (NULL-keyed) groups and the gte-3 alert never fires."""
    spec = parse_correlation({"title": "ac", "correlation": {
        "type": "event_count", "rules": ["ra", "rb"],
        "aliases": {"who": {"ra": "event_data.User",
                            "rb": "event_data.ParentUser"}},
        "group-by": ["who"], "timespan": "10m", "condition": {"gte": 3}}})
    run = compile_correlation(spec, _AB_REGS())
    rows = [
        _ev_u("u1", "H1", 0, "A", user="alice"),
        _ev_u("u2", "H1", 30, "A", user="alice", parent_user="decoy"),
        _ev_u("u3", "H1", 60, "B", parent_user="alice", user="mallory"),
        _ev_u("u4", "H1", 90, "A", user="bob"),
        _ev_u("u5", "H1", 120, "B", parent_user="carol"),
    ]
    got = {(r["who"], r["value"]) for r in
           run(_events(spark, rows)).collect()}
    assert got == {("alice", 3)}


def test_temporal_ordered_aliases_per_side_fields(spark):
    """Pair correlation resolves aliases PER SIDE — rule A's User joins
    rule B's ParentUser exactly (not the count types' first-match
    projection): a1(User=alice) then b1(ParentUser=alice) pair even
    though b1's own User is someone else; b2(ParentUser=bob) does not."""
    spec = parse_correlation({"title": "ap", "correlation": {
        "type": "temporal_ordered", "rules": ["ra", "rb"],
        "aliases": {"who": {"ra": "event_data.User",
                            "rb": "event_data.ParentUser"}},
        "group-by": ["who"], "timespan": "30m"}})
    run = compile_correlation(spec, _AB_REGS())
    rows = [
        _ev_u("a1", "H1", 0, "A", user="alice", parent_user="zoe"),
        _ev_u("b1", "H1", 60, "B", parent_user="alice", user="mallory"),
        _ev_u("b2", "H1", 90, "B", parent_user="bob"),
    ]
    got = {(r["entity"], r["a_uuid"], r["b_uuid"], r["lag_s"]) for r in
           run(_events(spark, rows)).collect()}
    assert got == {("alice", "a1", "b1", 60)}


def test_temporal_aliases_multi_field_struct_keys(spark, tmp_path):
    """Aliased MULTI-field group-by: per-side struct keys with re-aliased
    field names must equi-join field-wise ((computer_name, who) — the
    same host AND the same normalized user), batch == stream."""
    spec = parse_correlation({"title": "am", "correlation": {
        "type": "temporal_ordered", "rules": ["ra", "rb"],
        "aliases": {"who": {"ra": "event_data.User",
                            "rb": "event_data.ParentUser"}},
        "group-by": ["computer_name", "who"], "timespan": "30m"}})
    run = compile_correlation(spec, _AB_REGS(), watermark="0 seconds")
    rows = [
        _ev_u("a1", "H1", 0, "A", user="alice"),
        _ev_u("a2", "H2", 0, "A", user="alice"),   # other host: no pair
        _ev_u("b1", "H1", 60, "B", parent_user="alice"),
    ]
    batch = {tuple(r) for r in run(_events(spark, rows)).collect()}
    assert {(r[1]["computer_name"], r[1]["who"], r[2], r[3], r[4])
            for r in batch} == {("H1", "alice", "a1", "b1", 60)}
    assert _run_stream(spark, run, rows, tmp_path, "am") == batch


def test_temporal_unordered_dual_match_stream_keeps_both_orientations(
    spark, tmp_path
):
    """Documented batch/stream divergence, PINNED (round-7 advice): for a
    pair whose both events match both base rules, the batch leg anti-joins
    the mirror away (one row per unordered pair) while the STREAMING leg
    keeps both orientations — a second watermark assignment over
    stream-stream join results, which the anti-join would need, is
    unsupported.  Each streamed row still describes a real
    (rule_a-match, rule_b-match) pairing; this test freezes both legs'
    exact output shape so neither can drift silently."""
    regs = {
        "rA": RuleSpec(name="rA",
                       predicate_sql="event_data.TargetImage IN ('A', 'AB')"),
        "rB": RuleSpec(name="rB",
                       predicate_sql="event_data.TargetImage IN ('B', 'AB')"),
    }
    spec = parse_correlation({"title": "dual2", "correlation": {
        "type": "temporal", "rules": ["rA", "rB"],
        "group-by": ["computer_name"], "timespan": "10m"}})
    run = compile_correlation(spec, regs, watermark="0 seconds")
    rows = [  # chronological for the 2-file replay
        _ev("d1", "H1", 0, target="AB"),
        _ev("e1", "H2", 0, target="B"),
        _ev("d2", "H1", 60, target="AB"),
        _ev("e2", "H2", 60, target="A"),
    ]
    batch = {tuple(r) for r in run(_events(spark, rows)).collect()}
    assert batch == {("dual2", "H1", "d1", "d2", 60),
                     ("dual2", "H2", "e2", "e1", -60)}
    got = _run_stream(spark, run, rows, tmp_path, "dual2")
    assert got == {
        ("dual2", "H1", "d1", "d2", 60),
        ("dual2", "H1", "d2", "d1", -60),   # the streamed mirror row
        ("dual2", "H2", "e2", "e1", -60),
    }


def test_generate_flag_and_suppression_set():
    """Sigma v2 ``generate``: default false — a rule referenced by a
    correlation stops emitting standalone alerts; ``generate: true``
    keeps both; a rule referenced by BOTH kinds stays unsuppressed
    (union semantics).  Non-boolean values reject loudly."""
    from dagger_spark.sigma.correlation import suppressed_rule_names

    base = {"type": "event_count", "timespan": "10m",
            "condition": {"gte": 2}}

    def corr(rules, **extra):
        return parse_correlation({"title": "c", "correlation":
                                  dict(base, rules=rules, **extra)})

    c1 = corr(["ra", "rb"])                       # default: suppress both
    c2 = corr(["rb", "rc"], generate=True)        # rb re-allowed, rc kept
    assert c1.generate is False and c2.generate is True
    assert suppressed_rule_names([c1, c2]) == {"ra"}
    assert suppressed_rule_names([c1]) == {"ra", "rb"}
    assert suppressed_rule_names([]) == set()
    with pytest.raises(SigmaCompileError, match="generate must be"):
        corr(["ra"], generate="yes")
