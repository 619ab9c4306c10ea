"""events: streaming-shaped analytics in batch (windowed counts, sessions, rules, JSON extraction).

Mechanically split from the single-module catalog.py (round 7, verdict
ask #5): query bodies are verbatim, registration order preserved by
the package __init__ import order, QUERIES identical before/after
(full-catalog oracle replay re-proven).
"""

from __future__ import annotations
from ._base import *  # noqa: F401,F403

# ===========================================================================
# events: streaming-shaped analytics in batch (windowed counts, sessions,
# rules, JSON extraction)
# ===========================================================================

_shared_sql(
    "events_hourly",
    """
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    "tumbling-window aggregation (batch twin of the streaming hourly rollup)",
)

@register(
    "events_burst_detection",
    """
    SELECT date_trunc('hour', ts) AS w_start,
           user_id,
           cast(count(*) AS bigint) AS n_events,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM events
    WHERE event_type = 'error'
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    "timeframe/count rule shape (SURVEY §2.5-T3, the reference's "
    "designed-but-skipped Sigma timeframe gap): tumbling event-time window "
    "+ keyed count with HAVING threshold + min/max bounds — the batch twin "
    "of rules/timeframe.py's streaming windowed aggregation",
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.window(F.col("ts"), "1 hour").alias("__w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .filter(F.col("n_events") >= 2)
        .select(
            F.col("__w.start").alias("w_start"),
            "user_id",
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


@register(
    "events_burst_sliding",
    """
    WITH hits AS (
      SELECT user_id, ts, cast(floor(epoch(ts) / 1800) AS BIGINT) AS halfslot
      FROM events WHERE event_type = 'error'
    ), w AS (
      SELECT user_id, ts, (halfslot - k.k) * 1800 AS wstart_s
      FROM hits CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) k
    )
    SELECT make_timestamp(wstart_s * 1000000) AS w_start, user_id,
           cast(count(*) AS bigint) AS n_events,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM w GROUP BY 1, 2 HAVING count(*) >= 2
    """,
    "sliding-window burst detection (1 h window, 30 min slide): the fix for "
    "tumbling's boundary under-detection — a burst shorter than "
    "window - slide is fully contained in SOME window no matter where it "
    "falls.  Spark explodes each event into its 2 windows (F.window with "
    "slide); the oracle mirrors the epoch-aligned floor arithmetic with a "
    "generate_series cross join.  Same shape rules/timeframe.py runs "
    "batch+streaming when RuleSpec.timeframe_slide_seconds is set",
)
def events_burst_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy(
            F.window(F.col("ts"), "1 hour", "30 minutes").alias("__w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .filter(F.col("n_events") >= 2)
        .select(
            F.col("__w.start").alias("w_start"),
            "user_id",
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


@register(
    "events_burst_exact",
    """
    WITH h AS (
      SELECT user_id, event_id, ts,
             cast(floor(epoch(ts)) AS BIGINT) AS tsec
      FROM events WHERE event_type = 'error'
    ), c AS (
      SELECT user_id, event_id, ts, tsec,
             cast(count(*) OVER (
               PARTITION BY user_id ORDER BY tsec
               RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS n_trail
      FROM h
    ), f AS (
      SELECT user_id, event_id, ts, n_trail,
             CASE WHEN n_trail >= 2 THEN 1 ELSE 0 END AS trig,
             lag(CASE WHEN n_trail >= 2 THEN 1 ELSE 0 END, 1, 0) OVER (
               PARTITION BY user_id ORDER BY tsec, event_id
             ) AS prev_trig
      FROM c
    )
    SELECT user_id, event_id AS trigger_event_id,
           date_trunc('second', ts) AS trigger_ts, n_trail
    FROM f WHERE trig = 1 AND prev_trig = 0
    """,
    "EXACT Sigma timeframe semantics — N events within ANY 3600-second "
    "span, zero discretization loss: trailing RANGE frame over whole epoch "
    "seconds counts each event's preceding hour, an event with n_trail >= 2 "
    "is a trigger, and lag() keeps only episode-starting triggers (previous "
    "event not triggering) so a sustained burst yields one row, not one per "
    "event.  One shuffle keyed by user_id; the frame is time-valued so "
    "same-second rows share one frame in both engines (floor(epoch) == "
    "unix_timestamp truncation parity, see events_rolling_7d)",
)
def events_burst_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    h = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(
            "user_id", "event_id", "ts",
            F.unix_timestamp("ts").alias("tsec"),
        )
    )
    wr = Window.partitionBy("user_id").orderBy("tsec").rangeBetween(-3599, 0)
    wl = Window.partitionBy("user_id").orderBy("tsec", "event_id")
    c = h.withColumn("n_trail", F.count(F.lit(1)).over(wr).cast("long"))
    c = c.withColumn(
        "trig", F.when(F.col("n_trail") >= 2, F.lit(1)).otherwise(F.lit(0))
    ).withColumn("prev_trig", F.lag("trig", 1, 0).over(wl))
    return (
        c.filter((F.col("trig") == 1) & (F.col("prev_trig") == 0))
        .select(
            "user_id",
            F.col("event_id").alias("trigger_event_id"),
            F.date_trunc("second", F.col("ts")).alias("trigger_ts"),
            "n_trail",
        )
    )


@register(
    "events_sigma_corr_counts",
    """
    SELECT 'driver error burst' AS correlation,
           user_id,
           date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           cast(count(*) AS bigint) AS value,
           min(ts) AS first_seen,
           max(ts) AS last_seen
    FROM events
    WHERE event_type = 'error'
    GROUP BY 1, 2, 3, 4
    HAVING count(*) >= 2
    """,
    "Sigma CORRELATION rule (event_count) end-to-end through the real "
    "compiler path on the driver table: YAML document -> parse_correlation "
    "-> compile_correlation -> run over events — the modern SigmaHQ "
    "meta-rule surface the reference skips entirely (sigma-transf/"
    "main.py:194-195 drops every aggregation-shaped rule).  The compiled "
    "plan is one watermark-legal tumbling-window keyed aggregate "
    "(map-side partials; identical code runs streaming, pinned "
    "batch==stream in tests/test_sigma_correlation.py); the oracle mirrors "
    "the epoch-aligned hour windows in plain SQL",
)
def events_sigma_corr_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import yaml

    from ..rules.spec import RuleSpec
    from ..sigma.correlation import compile_correlation, parse_correlation

    doc = yaml.safe_load(
        """
title: driver error burst
level: high
correlation:
  type: event_count
  rules: [driver_error]
  group-by: [user_id]
  timespan: 1h
  condition:
    gte: 2
"""
    )
    spec = parse_correlation(doc)
    registry = {
        "driver_error": RuleSpec(
            name="driver_error", predicate_sql="event_type = 'error'"
        )
    }
    run = compile_correlation(spec, registry, ts_col="ts")
    return run(load_table(spark, sf_dir, "events"))


@register(
    "events_sigma_corr_temporal",
    """
    SELECT 'error then purchase' AS correlation,
           a.user_id AS entity,
           a.event_id AS a_uuid,
           b.event_id AS b_uuid,
           cast(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS bigint) AS lag_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND floor(epoch(b.ts)) >= floor(epoch(a.ts))
     AND floor(epoch(b.ts)) - floor(epoch(a.ts)) <= 1800
     AND a.event_id <> b.event_id
    WHERE a.event_type = 'error' AND b.event_type = 'purchase'
    """,
    "Sigma CORRELATION rule (temporal_ordered) through the compiler on the "
    "driver table: 'error then purchase on the same user within 30 min'.  "
    "Candidate pairs come from the time-bucketed equi-join of "
    "ops/asof.interval_join — per-(entity, bucket) pair space, never a "
    "cartesian — refined by the exact ordered-lag predicate; the oracle is "
    "the naive theta self-join DuckDB can afford at sf0.01.  Correlation "
    "lag is DEFINED at second resolution: the join bounds AND lag_s use "
    "whole-second truncation on both engines (unix_timestamp parity, see "
    "events_rolling_7d) — full-precision oracle bounds would diverge on "
    "sub-second pairs like a=.9s before b=.1s (floor lag 0, admitted).  "
    "Streaming twin is the watermarked stream-stream join with the GC "
    "range predicate widened 1 s each end and the same floor-second "
    "refinement after, batch==stream pinned in tests",
)
def events_sigma_corr_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    import yaml

    from ..rules.spec import RuleSpec
    from ..sigma.correlation import compile_correlation, parse_correlation

    doc = yaml.safe_load(
        """
title: error then purchase
level: high
correlation:
  type: temporal_ordered
  rules: [driver_error, driver_purchase]
  group-by: [user_id]
  timespan: 30m
"""
    )
    spec = parse_correlation(doc)
    registry = {
        "driver_error": RuleSpec(
            name="driver_error", predicate_sql="event_type = 'error'"
        ),
        "driver_purchase": RuleSpec(
            name="driver_purchase", predicate_sql="event_type = 'purchase'"
        ),
    }
    run = compile_correlation(spec, registry, ts_col="ts")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "uuid", F.col("event_id")
    )
    return run(ev)


@register(
    "events_sigma_corr_distinct",
    """
    SELECT 'diverse activity' AS correlation,
           user_id,
           date_trunc('day', ts) AS window_start,
           date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
           cast(count(DISTINCT event_type) AS bigint) AS value,
           min(ts) AS first_seen,
           max(ts) AS last_seen
    FROM events
    WHERE event_type IN ('click', 'view', 'error', 'purchase', 'signup')
    GROUP BY 1, 2, 3, 4
    HAVING count(DISTINCT event_type) >= 5
    """,
    "Sigma CORRELATION rule (value_count) through the compiler on the "
    "driver table: users exercising all 5 event types inside one "
    "epoch-aligned day — windowed count(DISTINCT field) per group key "
    "compared against the condition.  Batch is one keyed "
    "distinct-aggregate; the streaming leg of the same compiled callable "
    "dedupes (window, key, value) under the watermark then counts "
    "survivors (exact distinct, state expires with the window), pinned "
    "batch==stream in tests/test_sigma_correlation.py",
)
def events_sigma_corr_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import yaml

    from ..rules.spec import RuleSpec
    from ..sigma.correlation import compile_correlation, parse_correlation

    doc = yaml.safe_load(
        """
title: diverse activity
correlation:
  type: value_count
  rules: [driver_any]
  group-by: [user_id]
  field: event_type
  timespan: 1d
  condition:
    gte: 5
"""
    )
    spec = parse_correlation(doc)
    registry = {
        "driver_any": RuleSpec(
            name="driver_any",
            predicate_sql=(
                "event_type IN ('click', 'view', 'error', 'purchase', "
                "'signup')"
            ),
        )
    }
    run = compile_correlation(spec, registry, ts_col="ts")
    return run(load_table(spark, sf_dir, "events"))


@register(
    "events_sigma_corr_cooccur",
    """
    SELECT 'incident signature' AS correlation,
           user_id,
           make_timestamp(cast(floor(epoch(ts) / 10800) AS bigint)
                          * 10800 * 1000000) AS window_start,
           make_timestamp((cast(floor(epoch(ts) / 10800) AS bigint) + 1)
                          * 10800 * 1000000) AS window_end,
           cast(count(*) AS bigint) AS n_events,
           min(ts) AS first_seen,
           max(ts) AS last_seen
    FROM events
    WHERE event_type IN ('error', 'purchase', 'signup')
    GROUP BY 1, 2, 3, 4
    HAVING count(DISTINCT event_type) = 3
    """,
    "Sigma CORRELATION rule (temporal, 3+ referenced rules) through the "
    "compiler on the driver table: error AND purchase AND signup all "
    "firing for one user inside one epoch-aligned 3-hour window — the "
    "tumbling co-occurrence form (count of DISTINCT referenced rules == "
    "rule count; the discretization trade is documented in "
    "sigma/correlation.py, same as tumbling timeframe rules).  The oracle "
    "mirrors the epoch window arithmetic with floor(epoch/10800); "
    "n_events counts every matched event in the window because the three "
    "base predicates are disjoint",
)
def events_sigma_corr_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    import yaml

    from ..rules.spec import RuleSpec
    from ..sigma.correlation import compile_correlation, parse_correlation

    doc = yaml.safe_load(
        """
title: incident signature
correlation:
  type: temporal
  rules: [driver_error, driver_purchase, driver_signup]
  group-by: [user_id]
  timespan: 3h
"""
    )
    spec = parse_correlation(doc)
    registry = {
        name: RuleSpec(name=name, predicate_sql=f"event_type = '{etype}'")
        for name, etype in (
            ("driver_error", "error"),
            ("driver_purchase", "purchase"),
            ("driver_signup", "signup"),
        )
    }
    run = compile_correlation(spec, registry, ts_col="ts")
    return run(load_table(spark, sf_dir, "events"))


@register(
    "events_rolling_7d",
    """
    SELECT user_id, event_id,
           date_trunc('second', ts) AS ts_sec,
           -- floor(epoch) to whole seconds: Spark's unix_timestamp
           -- truncates, DuckDB's epoch() keeps the µs fraction — frame
           -- membership at the exact 7-day boundary must agree
           round(sum(value) OVER (
             PARTITION BY user_id
             ORDER BY cast(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ), 2) AS spend_7d,
           cast(count(*) OVER (
             PARTITION BY user_id
             ORDER BY cast(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS bigint) AS n_7d
    FROM events
    WHERE event_type = 'purchase'
    """,
    "rolling 7-day per-user aggregates via a RANGE window frame over epoch "
    "seconds (time-valued, not row-counted: simultaneous rows share one "
    "frame) — one shuffle keyed by user; the per-entity trailing-window "
    "feature shape",
)
def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-604800, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_trunc("second", F.col("ts")).alias("ts_sec"),
        F.round(F.sum("value").over(w), 2).alias("spend_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_7d"),
    )


_shared_sql(
    "events_median_sketch",
    """
    WITH h AS (
      SELECT event_type,
             cast(floor(value / 10.0) AS bigint) AS bin,
             cast(count(*) AS bigint) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, floor(value / 10.0)
    ), t AS (
      SELECT event_type, cast(sum(c) AS bigint) AS n FROM h GROUP BY event_type
    ), cum AS (
      SELECT h.event_type, h.bin, h.c, t.n,
             cast(sum(h.c) OVER (
               PARTITION BY h.event_type ORDER BY h.bin
             ) AS bigint) AS cc
      FROM h JOIN t ON h.event_type = t.event_type
    )
    SELECT event_type,
           cast(min(n) AS bigint) AS n,
           cast(min(CASE WHEN cc * 2 >= n THEN bin END) AS bigint)
             AS median_bin,
           -- cast before the 10.0 multiply: Spark types the literal as
           -- DECIMAL (bigint*decimal stays decimal), DuckDB as DOUBLE
           round(cast(min(CASE WHEN cc * 2 >= n THEN bin END) AS double)
                 * 10.0, 1) AS median_lo
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """,
    "histogram median sketch: fixed-width bins (one groupBy = the mergeable "
    "sketch) + cumulative reconstruction picking the bin where the running "
    "count crosses n/2 — the deterministic, oracle-matchable shape of "
    "approximate quantiles (percentile_approx's KLL can't cross-engine "
    "hash-match; a histogram can).  At 100 TB the sketch is the only "
    "full-data pass; reconstruction runs on |types|x|bins| rows",
)

_shared_sql(
    "events_sessionization",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, ts, value,
             cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           date_trunc('second', min(ts)) AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
    "sessionization (30-min gap) via lag + running sum — gaps-and-islands",
)


@register(
    "events_session_window",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts, value,
             -- Spark's session_window is INCLUSIVE at the gap boundary: an
             -- event exactly 30min after the previous one still merges
             -- (verified empirically: 1800s gap -> one session, 1801s ->
             -- two), so the island break here is > (not >=)
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           date_trunc('second', min(ts)) AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
    "built-in session_window aggregation (30-min gap); oracle is the "
    "gaps-and-islands expansion with Spark's strict-gap merge semantics",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_trunc("second", F.col("session_window.start")).alias("session_start"),
            "n_events",
            "total_value",
        )
    )

# JSON extraction differs by dialect: get_json_object (Spark) vs
# json_extract_string (DuckDB); same aliases, same math.
_SPARK_JSON_STATS = """
    SELECT event_type,
           count(*) AS n,
           round(avg(cast(get_json_object(props, '$.k') AS INT)), 6) AS avg_k,
           max(cast(get_json_object(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
"""
_DUCK_JSON_STATS = """
    SELECT event_type,
           count(*) AS n,
           round(avg(json_extract_string(props, '$.k')::INT), 6) AS avg_k,
           max(json_extract_string(props, '$.k')::INT) AS max_k
    FROM events
    GROUP BY event_type
"""
_shared_sql("events_json_stats", _SPARK_JSON_STATS, "JSON field extraction + stats",
            oracle_sql=_DUCK_JSON_STATS)


@register(
    "events_rules_engine",
    """
    SELECT 'high_value_error' AS rule_name, 7 AS severity, event_id, user_id,
           date_trunc('second', ts) AS ts_sec
    FROM events WHERE event_type = 'error' AND value > 150
    UNION ALL
    SELECT 'signup_k_gt_90', 5, event_id, user_id, date_trunc('second', ts)
    FROM events WHERE event_type = 'signup'
      AND json_extract_string(props, '$.k')::INT > 90
    UNION ALL
    SELECT 'purchase_low_value', 3, event_id, user_id, date_trunc('second', ts)
    FROM events WHERE event_type = 'purchase' AND value < 10
    UNION ALL
    SELECT 'auth_like_pattern', 4, event_id, user_id, date_trunc('second', ts)
    FROM events WHERE regexp_matches(event_type, '^(error|signup)$')
      AND contains(props, '"k": 1')
    """,
    "the SIEM rule-engine shape on the generic events table: multi-predicate "
    "filter + enrich + UNION ALL fan-in (operators F1-F11/P1-P5/U1 of SURVEY §2)",
)
def events_rules_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ts_sec = F.date_trunc("second", F.col("ts")).alias("ts_sec")
    k = F.get_json_object("props", "$.k").cast("int")

    def rule(name, severity, cond):
        return (
            events.filter(cond)
            .select(
                F.lit(name).alias("rule_name"),
                F.lit(severity).cast("int").alias("severity"),
                "event_id", "user_id", ts_sec,
            )
        )

    branches = [
        rule("high_value_error", 7, (F.col("event_type") == "error") & (F.col("value") > 150)),
        rule("signup_k_gt_90", 5, (F.col("event_type") == "signup") & (k > 90)),
        rule("purchase_low_value", 3, (F.col("event_type") == "purchase") & (F.col("value") < 10)),
        rule("auth_like_pattern", 4,
             F.col("event_type").rlike("^(error|signup)$") & F.col("props").contains('"k": 1')),
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


