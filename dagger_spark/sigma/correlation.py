"""Sigma Correlations — the modern SigmaHQ meta-rule spec, compiled to
Spark.

The reference compiles only stateless per-event rules and SKIPS anything
aggregation-shaped (sigma-transf/main.py:194-195 drops legacy
``detection.timeframe``); the Sigma project has since standardized the
richer *correlation rule* document — a separate YAML object whose
``correlation:`` block references base rules by name:

    correlation:
      type: event_count | value_count | temporal | temporal_ordered
      rules: [base_rule_a, base_rule_b]
      group-by: [computer_name]
      timespan: 10m
      condition: {gte: 100}      # counts only
      field: TargetUserName      # value_count only

This module parses those documents and compiles each to a DataFrame
function over the event stream, reusing the engine's existing scale-shaped
machinery:

* ``event_count`` — events matching ANY referenced rule, tumbling
  event-time window of ``timespan`` per group-by key, count compared with
  the condition operator.  One keyed aggregate, map-side partials.
* ``value_count`` — same shape, ``count(DISTINCT field)``.
* ``temporal`` (2 rules) — both rules fire on the same entity within
  ``timespan`` in EITHER order: the time-bucketed pairwise join of
  ``rules.correlate`` with the ordered constraint relaxed to ``|lag| <=
  timespan``.  Exact (no window discretization), candidate space bounded
  per (entity, time bucket).
* ``temporal_ordered`` (2 rules) — ``rules.correlate.correlate_alerts``
  verbatim: A then B, ``0 <= lag <= timespan``.
* ``temporal`` with 3+ rules — tumbling-window co-occurrence: count of
  DISTINCT referenced rules firing per (group, window) must equal the
  rule count.  Discretization caveat documented: a chain straddling a
  window boundary is missed, the same trade the timeframe rules' tumbling
  default makes (their sliding/exact variants show the escalation path).

Group-by fields default to ``computer_name`` (the entity every reference
rule carries); timespan accepts the Sigma ``<int><s|m|h|d>`` forms.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compiler import SigmaCompileError, _parse_timeframe

_TYPES = ("event_count", "value_count", "temporal", "temporal_ordered")
_OPS = {
    "gte": ">=", "gt": ">", "lte": "<=", "lt": "<", "eq": "=",
}


@dataclass(frozen=True)
class CorrelationSpec:
    name: str
    ctype: str
    rules: Tuple[str, ...]
    timespan_seconds: int
    group_by: Tuple[str, ...] = ("computer_name",)
    condition_op: str = "gte"
    condition_value: int = 1
    field: Optional[str] = None           # value_count distinct field
    level: str = "medium"
    description: str = ""


def parse_correlation(doc: dict, name: str = "") -> CorrelationSpec:
    """One YAML document -> spec, with the spec's required-field rules
    enforced loudly (a silently-defaulted condition would change alert
    semantics)."""
    corr = doc.get("correlation")
    if not isinstance(corr, dict):
        raise SigmaCompileError(f"{name or doc.get('title')!r}: no correlation block")
    ctype = corr.get("type")
    if ctype not in _TYPES:
        raise SigmaCompileError(f"bad correlation type: {ctype!r}")
    rules = corr.get("rules") or []
    if isinstance(rules, str):
        rules = [rules]
    if not rules:
        raise SigmaCompileError("correlation.rules is required")
    timespan = corr.get("timespan")
    if timespan is None:
        raise SigmaCompileError("correlation.timespan is required")
    group_by = corr.get("group-by", corr.get("group_by", ["computer_name"]))
    if isinstance(group_by, str):
        group_by = [group_by]
    cond_op, cond_val = "gte", 1
    if ctype in ("event_count", "value_count"):
        cond = corr.get("condition")
        if not isinstance(cond, dict) or len(cond) != 1:
            raise SigmaCompileError(
                f"{ctype} needs condition: {{gte|gt|lte|lt|eq: N}}"
            )
        ((cond_op, cond_val),) = cond.items()
        if cond_op not in _OPS:
            raise SigmaCompileError(f"bad condition op: {cond_op!r}")
        cond_val = int(cond_val)
    fld = corr.get("field")
    if ctype == "value_count" and not fld:
        raise SigmaCompileError("value_count needs correlation.field")
    if ctype.startswith("temporal") and len(rules) < 2:
        raise SigmaCompileError(f"{ctype} needs >= 2 referenced rules")
    if ctype == "temporal_ordered" and len(rules) != 2:
        raise SigmaCompileError(
            "temporal_ordered chains beyond 2 rules are not implemented"
        )
    return CorrelationSpec(
        name=name or str(doc.get("title", "correlation")),
        ctype=ctype,
        rules=tuple(str(r) for r in rules),
        timespan_seconds=_parse_timeframe(timespan),
        group_by=tuple(group_by),
        condition_op=cond_op,
        condition_value=cond_val,
        field=str(fld) if fld else None,
        level=str(doc.get("level", "medium")),
        description=str(doc.get("description", "")),
    )


def load_correlations(path: str) -> list:
    """Walk a file/directory of YAML documents, returning every
    correlation spec found (multi-doc files supported, same loader
    discipline as the base-rule compiler)."""
    import yaml

    specs = []
    paths = []
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            paths += [os.path.join(root, f) for f in sorted(files)
                      if f.endswith((".yml", ".yaml"))]
    elif os.path.isfile(path):
        paths = [path]
    # a missing path yields no specs — same contract as the base
    # compiler's os.walk over a missing directory (pinned by
    # tests/test_cli_and_sinks.py::test_cli_errors_on_missing_dir)
    for p in paths:
        with open(p) as fh:
            for doc in yaml.safe_load_all(fh):
                if isinstance(doc, dict) and "correlation" in doc:
                    specs.append(parse_correlation(doc, name=str(
                        doc.get("title") or os.path.basename(p))))
    return specs


def _resolve(spec: CorrelationSpec, registry: Dict[str, object]) -> list:
    missing = [r for r in spec.rules if r not in registry]
    if missing:
        raise SigmaCompileError(
            f"correlation {spec.name!r} references unknown rules: {missing}"
        )
    return [registry[r] for r in spec.rules]


def compile_correlation(
    spec: CorrelationSpec,
    registry: Dict[str, object],
    ts_col: str = "timestamp",
    watermark: str = "30 seconds",
) -> Callable[[DataFrame], DataFrame]:
    """Spec -> events-DataFrame function, BATCH AND STREAMING from one
    compile: the returned callable branches on ``events.isStreaming``.

    * counts: the windowed aggregate is stream-legal as-is (watermarked,
      append emission at window close); ``value_count``'s exact DISTINCT
      is not, so the streaming leg dedupes (window, group, field) first
      — ``dropDuplicates`` state is window-scoped and watermark-expired,
      then the same windowed ``count(*)`` counts distinct survivors.
    * temporal pairs: ``correlate_alerts_stream`` (the watermarked
      stream-stream join with the time-range predicate both sides need
      for state GC); the unordered form unions both directions.
    * temporal 3+: the same dedup-then-count trick on (window, group,
      rule-index).

    ``registry`` maps rule NAME -> RuleSpec (e.g. ``{r.name: r for r in
    active_rules()}``)."""
    base_rules = _resolve(spec, registry)
    span = f"{spec.timespan_seconds} seconds"

    def _wm(events: DataFrame) -> DataFrame:
        return (
            events.withWatermark(ts_col, watermark)
            if events.isStreaming and watermark else events
        )

    if spec.ctype in ("event_count", "value_count"):
        cmp_sql = _OPS[spec.condition_op]

        def run_counts(events: DataFrame) -> DataFrame:
            any_rule = base_rules[0].condition()
            for r in base_rules[1:]:
                any_rule = any_rule | r.condition()
            matched = _wm(events).filter(any_rule)
            w = F.window(F.col(ts_col), span)
            if spec.ctype == "value_count" and events.isStreaming:
                # exact windowed DISTINCT, streaming: dedup survivors per
                # (window, group, field) — the window struct carries the
                # event time, so state expires with the watermark — then
                # plain count(*).  first/last_seen are of the SURVIVORS
                # (deterministic: the first arrival per distinct value).
                # the raw ts is carried as MICROS (a plain long): keeping
                # the watermarked column beside the window struct would
                # leave two event-time columns in one stream, which Spark
                # rejects
                dedup = matched.select(
                    w.alias("window"),
                    *[F.col(c) for c in spec.group_by],
                    F.col(spec.field).alias("__v"),
                    F.unix_micros(F.col(ts_col)).alias("__us"),
                ).dropDuplicates(["window", *spec.group_by, "__v"])
                grouped = dedup.groupBy("window", *spec.group_by).agg(
                    F.count(F.lit(1)).cast("long").alias("value"),
                    F.timestamp_micros(F.min("__us")).alias("first_seen"),
                    F.timestamp_micros(F.max("__us")).alias("last_seen"),
                )
            else:
                agg = (
                    F.count_distinct(F.col(spec.field))
                    if spec.ctype == "value_count"
                    else F.count(F.lit(1))
                )
                grouped = matched.groupBy(
                    w, *[F.col(c) for c in spec.group_by]
                ).agg(
                    agg.cast("long").alias("value"),
                    F.min(ts_col).alias("first_seen"),
                    F.max(ts_col).alias("last_seen"),
                )
            return grouped.filter(
                F.expr(f"value {cmp_sql} {spec.condition_value}")
            ).select(
                F.lit(spec.name).alias("correlation"),
                *spec.group_by,
                F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "value", "first_seen", "last_seen",
            )

        return run_counts

    if spec.ctype == "temporal_ordered" or (
        spec.ctype == "temporal" and len(spec.rules) == 2
    ):
        from ..rules.correlate import correlate_alerts, correlate_alerts_stream

        ordered = spec.ctype == "temporal_ordered"
        key = spec.group_by[0]

        def run_pair(events: DataFrame) -> DataFrame:
            def one(a, b):
                if events.isStreaming:
                    return correlate_alerts_stream(
                        events, a, b, key=key, ts_col=ts_col,
                        window_s=spec.timespan_seconds, watermark=watermark,
                    )
                return correlate_alerts(
                    events, a, b, key=key, ts_col=ts_col,
                    window_s=spec.timespan_seconds,
                )

            out = one(base_rules[0], base_rules[1])
            if not ordered:
                rev = one(base_rules[1], base_rules[0]).select(
                    "entity",
                    F.col("b_uuid").alias("a_uuid"),
                    F.col("a_uuid").alias("b_uuid"),
                    (-F.col("lag_s")).alias("lag_s"),
                )
                # a pair at lag 0 appears in both directions; keep one
                out = out.unionByName(rev.filter(F.col("lag_s") < 0))
            return out.select(
                F.lit(spec.name).alias("correlation"),
                "entity", "a_uuid", "b_uuid", "lag_s",
            )

        return run_pair

    # temporal with 3+ rules: tumbling co-occurrence (documented
    # discretization — same trade as tumbling timeframe rules)
    def run_multi(events: DataFrame) -> DataFrame:
        tagged = None
        for i, r in enumerate(base_rules):
            part = _wm(events).filter(r.condition()).select(
                *[F.col(c) for c in spec.group_by],
                F.col(ts_col).alias("__ts"),
                F.lit(i).alias("__rule"),
            )
            tagged = part if tagged is None else tagged.unionByName(part)
        w = F.window(F.col("__ts"), span)
        if events.isStreaming:
            dedup = tagged.select(
                w.alias("window"),
                *[F.col(c) for c in spec.group_by],
                "__rule",
                F.unix_micros(F.col("__ts")).alias("__us"),
            ).dropDuplicates(["window", *spec.group_by, "__rule"])
            grouped = dedup.groupBy("window", *spec.group_by).agg(
                F.count(F.lit(1)).alias("n_rules"),
                # per-rule dedup survivors only — n_events is the DISTINCT
                # rule count's support in streaming mode, documented
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.timestamp_micros(F.min("__us")).alias("first_seen"),
                F.timestamp_micros(F.max("__us")).alias("last_seen"),
            )
        else:
            grouped = tagged.groupBy(
                w, *[F.col(c) for c in spec.group_by]
            ).agg(
                F.count_distinct("__rule").alias("n_rules"),
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.min("__ts").alias("first_seen"),
                F.max("__ts").alias("last_seen"),
            )
        return grouped.filter(
            F.col("n_rules") == len(base_rules)
        ).select(
            F.lit(spec.name).alias("correlation"),
            *spec.group_by,
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events", "first_seen", "last_seen",
        )

    return run_multi
