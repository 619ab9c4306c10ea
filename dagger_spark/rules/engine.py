"""The rule engine: N predicates over one event relation -> alert rows.

Two physical strategies, identical results (tested):

* ``apply_rules_union`` — the reference's own composition idiom (a UNION ALL
  over a shared view, windows-process-creation.sql:95-135; and the statement
  set sharing one scan, windows-process-access.sql:72-601).  In Spark a union
  of N filter branches re-reads the source once per branch, so this is kept
  for parity/testing and for small N.

* ``apply_rules_single_pass`` — the 100 TB strategy.  ONE scan evaluates all
  predicates per event via an array of ``CASE WHEN``s, explodes the matching
  rule ids (usually 0-1 per event, so the explode does not amplify the data),
  and broadcast-joins the tiny rule-metadata dimension to enrich.  No shuffle,
  no second scan, whole-stage codegen fuses every predicate into one pass.
  This is what the statement set's "share one scan across 17 INSERTs" becomes
  when re-thought Spark-first.

Both work unchanged on batch DataFrames and on Structured Streaming
DataFrames (the broadcast join is stream-static, supported in append mode).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .spec import RuleSpec, alert_projection, rules_metadata_df


def _enabled(rules: Sequence[RuleSpec], include_disabled: bool) -> list:
    return [r for r in rules if include_disabled or r.enabled]


def apply_rules_union(
    events: DataFrame,
    rules: Sequence[RuleSpec],
    ts_col: str = "timestamp",
    include_disabled: bool = False,
) -> DataFrame:
    """UNION-ALL composition (reference EP3 idiom). Stateless rules only."""
    active = [r for r in _enabled(rules, include_disabled) if r.timeframe_seconds is None]
    if not active:
        raise ValueError("no enabled stateless rules")
    branches = [
        events.filter(r.condition()).select(alert_projection(r, ts_col))
        for r in active
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def apply_rules_single_pass(
    events: DataFrame,
    rules: Sequence[RuleSpec],
    ts_col: str = "timestamp",
    include_disabled: bool = False,
    spark: Optional[SparkSession] = None,
) -> DataFrame:
    """Single-scan composition: evaluate all predicates per event, emit
    matching rule ids, broadcast-join metadata.  Scales to thousands of rules
    with one pass over the data and zero shuffles."""
    active = [r for r in _enabled(rules, include_disabled) if r.timeframe_seconds is None]
    if not active:
        raise ValueError("no enabled stateless rules")
    spark = spark or events.sparkSession

    # rule_id must index into the SAME list the metadata df is built from
    matches = F.array_compact(
        F.array(*[F.when(r.condition(), F.lit(i)) for i, r in enumerate(active)])
    )
    ts = F.col(ts_col)
    hits = (
        events.select(
            F.col("computer_name"),
            F.col("host"),
            F.col("uuid"),
            ts.alias("__ts"),
            F.explode(matches).alias("rule_id"),
        )
    )
    meta = F.broadcast(rules_metadata_df(spark, active))
    return hits.join(meta, "rule_id").select(
        F.col("computer_name"),
        F.col("host"),
        F.struct(
            F.lit("signal").alias("kind"),
            F.col("module"),
            F.array(F.col("uuid")).alias("origin_ids"),
            F.lit(1).cast("long").alias("count"),
            F.col("__ts").alias("start"),
            F.col("__ts").alias("end"),
            F.col("__ts").alias("time"),
        ).alias("event"),
        F.col("threat"),
        F.col("rule"),
    )


def apply_rules(
    events: DataFrame,
    rules: Sequence[RuleSpec],
    ts_col: str = "timestamp",
    strategy: str = "single_pass",
    include_disabled: bool = False,
) -> DataFrame:
    if strategy == "single_pass":
        return apply_rules_single_pass(events, rules, ts_col, include_disabled)
    if strategy == "union":
        return apply_rules_union(events, rules, ts_col, include_disabled)
    raise ValueError(f"unknown strategy {strategy!r}")
