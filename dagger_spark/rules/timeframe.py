"""Timeframe (count) rules — the reference's designed-but-unimplemented gap.

The reference alert schema reserves ``event.count/start/end``
(windows-process-access.sql:45-47) and every stateless rule hardcodes
``count=1, start=end=time=timestamp`` (…:80), but the compiler SKIPS any
Sigma rule carrying ``detection.timeframe`` (sigma-transf/main.py:194-195).
We implement them Spark-first: tumbling event-time window + keyed aggregation
with a HAVING threshold — ``groupBy(window(ts, tf), keys)`` — populating the
reserved fields.  One code path serves batch and Structured Streaming; in
streaming the caller applies ``withWatermark`` first and runs append mode, so
state is evicted by watermark (SURVEY.md §2.5-T3/T4, §7-M4).

Scale: the shuffle is keyed by (window, host[, extra]) — naturally
high-cardinality and time-local, so partial (map-side) aggregation absorbs
bursts and AQE handles skewed hosts.  State per key is O(1) counters plus
the collected uuid list.  CAVEAT: ``max_origin_ids`` caps the EMITTED list
(slice at output), not the aggregation buffer — ``collect_list`` itself
accumulates every uuid for the window before the slice runs, so a
pathological key (one host emitting millions of matches inside one window)
still buffers them all.  If that profile is real in a deployment, route the
timeframe rules through an ``applyInPandasWithState`` variant (see
streaming/stateful.py) whose per-key state drops uuids past the cap as they
arrive; for the reference-shaped workload (count thresholds of 2-100 per
minutes-wide windows) the output-side cap is the right cost/fidelity trade.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spec import RuleSpec, rule_struct, threat_struct


def apply_timeframe_rule(
    events: DataFrame,
    rule: RuleSpec,
    ts_col: str = "timestamp",
    max_origin_ids: int = 1000,
) -> DataFrame:
    if not rule.timeframe_seconds:
        raise ValueError(f"rule {rule.name!r} has no timeframe")
    ts = F.col(ts_col)
    window = F.window(ts, f"{rule.timeframe_seconds} seconds")
    group_cols = [F.col(k).alias(f"__k{i}") for i, k in enumerate(rule.timeframe_group_by)]
    host_idx = list(rule.timeframe_group_by).index("host") if "host" in rule.timeframe_group_by else None

    agg = (
        events.filter(rule.condition())
        .groupBy(window.alias("__w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("__count"),
            F.min(ts).alias("__start"),
            F.max(ts).alias("__end"),
            F.slice(F.collect_list(F.col("uuid")), 1, max_origin_ids).alias("__origin_ids"),
            F.max(F.col("computer_name")).alias("__computer_name"),
        )
        .filter(F.col("__count") >= int(rule.timeframe_min_count or 2))
    )
    host_col = F.col(f"__k{host_idx}") if host_idx is not None else F.lit(None).cast("string")
    return agg.select(
        F.col("__computer_name").alias("computer_name"),
        host_col.alias("host"),
        F.struct(
            F.lit("signal").alias("kind"),
            F.lit(rule.module).cast("string").alias("module"),
            F.col("__origin_ids").alias("origin_ids"),
            F.col("__count").cast("long").alias("count"),
            F.col("__start").alias("start"),
            F.col("__end").alias("end"),
            F.col("__end").alias("time"),
        ).alias("event"),
        threat_struct(rule).alias("threat"),
        rule_struct(rule).alias("rule"),
    )


def apply_timeframe_rules(
    events: DataFrame,
    rules: Sequence[RuleSpec],
    ts_col: str = "timestamp",
    include_disabled: bool = False,
) -> DataFrame:
    tf_rules = [
        r for r in rules
        if r.timeframe_seconds and (include_disabled or r.enabled)
    ]
    if not tf_rules:
        raise ValueError("no enabled timeframe rules")
    out = apply_timeframe_rule(events, tf_rules[0], ts_col)
    for r in tf_rules[1:]:
        out = out.unionByName(apply_timeframe_rule(events, r, ts_col))
    return out
