"""Timeframe (count) rules — the reference's designed-but-unimplemented gap.

The reference alert schema reserves ``event.count/start/end``
(windows-process-access.sql:45-47) and every stateless rule hardcodes
``count=1, start=end=time=timestamp`` (…:80), but the compiler SKIPS any
Sigma rule carrying ``detection.timeframe`` (sigma-transf/main.py:194-195).
We implement them Spark-first, populating the reserved fields, with the
per-key memory bound holding on BOTH execution paths (SURVEY.md §2.5-T3/T4):

* **Batch**: tumbling event-time window + keyed aggregation with a HAVING
  threshold — ``groupBy(window(ts, tf), keys)``.  The origin-id list is
  capped BEFORE aggregation: a ``row_number`` over (window, keys) ordered by
  (ts, uuid) marks the first ``max_origin_ids`` events, and only those feed
  ``collect_list`` — the aggregation buffer never holds more than the cap,
  and the emitted ids are deterministic (earliest by time, uuid tiebreak).
  The rank runs in the same (window, keys) hash partitioning as the final
  aggregate, so the plan stays at one shuffle (plus the partition-local sort
  the determinism buys).

* **Streaming**: ``applyInPandasWithState`` keyed by (window-start, keys)
  with an event-time timeout at window end — the Spark-idiomatic stand-in
  for a Flink KeyedProcessFunction.  Per-key state is (count, min/max ts,
  uuid list, computer_name) and the uuid list STOPS accumulating at
  ``max_origin_ids`` on arrival, so a pathological key (one host emitting
  millions of matches inside one window) holds O(cap) state, not O(matches).
  Alerts emit once, when the watermark passes the window end (append
  semantics — same emission discipline as the windowed-agg formulation);
  rows later than the watermark are filtered before the operator.

Scale: the shuffle is keyed by (window, host[, extra]) — naturally
high-cardinality and time-local, so partial aggregation (batch) / per-key
state (streaming) absorbs bursts and AQE handles skewed hosts.

**Sliding windows** (``RuleSpec.timeframe_slide_seconds``, a divisor of the
timeframe): tumbling discretization under-detects — a burst of >= N events
straddling a window boundary raises nothing, though Sigma's intent is "N
events within ANY timeframe-second span".  With slide s, any burst shorter
than (timeframe - s) seconds is fully contained in some window, at the cost
of each event updating timeframe/s windows (batch: ``F.window(ts, tf, s)``;
streaming: an epoch-aligned explode feeding the same bounded per-window
state).  Both paths share the arithmetic, so batch==stream holds for every
slide.

**Exact semantics** (``RuleSpec.timeframe_exact``): ZERO discretization
loss — an event triggers when its (N-1)-th predecessor (per key, (ts,
uuid) order) lies within T seconds, i.e. literally "N events within ANY
T-second span"; a prev-trigger flag suppresses non-episode-starting
triggers so a sustained burst alerts once.  Batch: one lag/collect window
pass per key.  Streaming: arrival-driven ``applyInPandasWithState`` whose
per-key state is the last N-1 (ts, uuid) pairs + one flag — O(N) bounded,
alerts emit on arrival (no window-close latency).  The in-order caveat:
cross-micro-batch exactness assumes per-key event-time order of arrival
(each batch is sorted internally; watermark drops the too-late).  The
oracle-verified SQL twin of the batch formulation is the
``events_burst_exact`` catalog query.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .spec import RuleSpec, rule_struct, threat_struct

# applyInPandasWithState output: one row per closed (window, keys) group.
_TF_OUT_SCHEMA = T.StructType(
    [
        T.StructField("computer_name", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("__count", T.LongType(), False),
        T.StructField("__start_us", T.LongType(), False),
        T.StructField("__end_us", T.LongType(), False),
        T.StructField("__origin_ids", T.ArrayType(T.StringType()), False),
    ]
)

_TF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("count", T.LongType(), False),
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("ids", T.ArrayType(T.StringType()), False),
        T.StructField("cn", T.StringType(), True),
    ]
)

# exact path: last N-1 event (ts, uuid) pairs + previous trigger flag
_TF_EXACT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tss", T.ArrayType(T.LongType()), False),
        T.StructField("uids", T.ArrayType(T.StringType()), False),
        T.StructField("prev_trig", T.BooleanType(), False),
    ]
)


def _alert_projection(rule: RuleSpec, host_col, start_col, end_col) -> list:
    """Shared final alert shape (identical for batch and streaming)."""
    return [
        F.col("__computer_name").alias("computer_name"),
        host_col.alias("host"),
        F.struct(
            F.lit("signal").alias("kind"),
            F.lit(rule.module).cast("string").alias("module"),
            F.col("__origin_ids").alias("origin_ids"),
            F.col("__count").cast("long").alias("count"),
            start_col.alias("start"),
            end_col.alias("end"),
            end_col.alias("time"),
        ).alias("event"),
        threat_struct(rule).alias("threat"),
        rule_struct(rule).alias("rule"),
    ]


def _slide_seconds(rule: RuleSpec) -> int:
    """Validated slide: defaults to the timeframe itself (tumbling)."""
    tf = int(rule.timeframe_seconds)
    slide = tf if rule.timeframe_slide_seconds is None \
        else int(rule.timeframe_slide_seconds)
    if slide <= 0 or slide > tf or tf % slide:
        raise ValueError(
            f"rule {rule.name!r}: timeframe_slide_seconds={slide} must be a "
            f"positive divisor of timeframe_seconds={tf} (<= it)"
        )
    return slide


def _batch_timeframe(
    events: DataFrame, rule: RuleSpec, ts_col: str, max_origin_ids: int
) -> DataFrame:
    ts = F.col(ts_col)
    slide = _slide_seconds(rule)
    window = F.window(
        ts, f"{rule.timeframe_seconds} seconds", f"{slide} seconds"
    )
    group_by = list(rule.timeframe_group_by)
    keys = [f"__k{i}" for i in range(len(group_by))]
    host_idx = group_by.index("host") if "host" in group_by else None

    prep = (
        events.filter(rule.condition())
        .select(
            window.alias("__w"),
            *[F.col(k).alias(a) for k, a in zip(group_by, keys)],
            ts.alias("__ts"),
            F.col("uuid"),
            F.col("computer_name"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__w", *keys).orderBy("__ts", "uuid")
            ),
        )
    )
    agg = (
        prep.groupBy("__w", *keys)
        .agg(
            F.count(F.lit(1)).alias("__count"),
            F.min("__ts").alias("__start"),
            F.max("__ts").alias("__end"),
            # when() yields NULL past the cap and collect_list skips NULLs:
            # the agg buffer holds at most max_origin_ids uuids
            F.collect_list(
                F.when(F.col("__rn") <= int(max_origin_ids), F.col("uuid"))
            ).alias("__origin_ids"),
            F.max(F.col("computer_name")).alias("__computer_name"),
        )
        .filter(F.col("__count") >= int(rule.timeframe_min_count or 2))
    )
    host_col = (
        F.col(keys[host_idx]) if host_idx is not None else F.lit(None).cast("string")
    )
    return agg.select(
        *_alert_projection(rule, host_col, F.col("__start"), F.col("__end"))
    )


def _stream_timeframe(
    events: DataFrame, rule: RuleSpec, ts_col: str, max_origin_ids: int
) -> DataFrame:
    """Bounded-state streaming path: state stops growing at the cap."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    tf_us = int(rule.timeframe_seconds) * 1_000_000
    slide_us = _slide_seconds(rule) * 1_000_000
    min_count = int(rule.timeframe_min_count or 2)
    cap = int(max_origin_ids)
    group_by = list(rule.timeframe_group_by)
    keys = [f"__k{i}" for i in range(len(group_by))]
    host_idx = group_by.index("host") if "host" in group_by else None
    ts = F.col(ts_col)

    # every window containing t: wstart = floor(t/slide)*slide - k*slide for
    # k in 0..tf/slide-1 (epoch-aligned, matching F.window's sliding
    # alignment on the batch path).  Tumbling is the slide==tf special case
    # (a 1-element sequence), so both variants share one code path; sliding
    # multiplies per-event state updates by tf/slide, still O(cap) per key.
    last_wstart = (F.floor(F.unix_micros(ts) / slide_us) * slide_us).cast("long")
    wstarts = F.sequence(
        last_wstart - F.lit(tf_us - slide_us).cast("long"),
        last_wstart,
        F.lit(slide_us).cast("long"),
    )

    prep = events.filter(rule.condition()).select(
        # keep the original event-time column: it carries the watermark
        # metadata, so rows older than the watermark are filtered before
        # the stateful operator (T4 late-data semantics)
        ts,
        F.explode(wstarts).alias("__wstart_us"),
        F.unix_micros(ts).alias("__ts_us"),
        F.col("uuid").cast("string").alias("__uuid"),
        F.col("computer_name").cast("string").alias("__cn"),
        *[F.col(k).cast("string").alias(a) for k, a in zip(group_by, keys)],
    )

    def update(
        key: Tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        wstart_us = int(key[0])  # arrives as numpy int64; state/timeout APIs need plain int
        host = key[1 + host_idx] if host_idx is not None else None
        if host is not None:
            host = str(host)
        if state.hasTimedOut:
            cnt, s_us, e_us, ids, cn = state.get
            state.remove()
            if cnt >= min_count:
                yield pd.DataFrame(
                    {
                        "computer_name": [cn],
                        "host": [host],
                        "__count": [cnt],
                        "__start_us": [s_us],
                        "__end_us": [e_us],
                        "__origin_ids": [list(ids)],
                    }
                )
            return
        cnt, s_us, e_us, ids, cn = (
            state.get if state.exists else (0, None, None, [], None)
        )
        ids = list(ids)
        for pdf in pdfs:
            if not len(pdf):
                continue
            cnt += len(pdf)
            mn = int(pdf["__ts_us"].min())
            mx = int(pdf["__ts_us"].max())
            s_us = mn if s_us is None else min(s_us, mn)
            e_us = mx if e_us is None else max(e_us, mx)
            room = cap - len(ids)
            if room > 0:
                ids.extend(
                    [u for u in pdf["__uuid"].tolist() if u is not None][:room]
                )
            cns = pdf["__cn"].dropna()
            if len(cns):
                m = cns.max()
                cn = m if cn is None else max(cn, m)
        state.update((cnt, s_us, e_us, ids, cn))
        # fire once the watermark passes the window end (append discipline);
        # for a window already behind the watermark, fire at the next tick
        state.setTimeoutTimestamp(
            max((wstart_us + tf_us) // 1000, state.getCurrentWatermarkMs() + 1)
        )

    agg = (
        prep.groupBy("__wstart_us", *keys)
        .applyInPandasWithState(
            update,
            _TF_OUT_SCHEMA,
            _TF_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
        .withColumnRenamed("computer_name", "__computer_name")
        .withColumnRenamed("host", "__host")
    )
    return agg.select(
        *_alert_projection(
            rule,
            F.col("__host"),
            F.timestamp_micros(F.col("__start_us")),
            F.timestamp_micros(F.col("__end_us")),
        )
    )


def _batch_timeframe_exact(
    events: DataFrame, rule: RuleSpec, ts_col: str, max_origin_ids: int
) -> DataFrame:
    """Exact path, batch: one window pass per key ordered by (ts, uuid).

    An event TRIGGERS when its (N-1)-th predecessor is within T seconds —
    i.e. it is the N-th (or later) event of some T-second span.  An alert
    fires only on EPISODE-STARTING triggers (previous event not a trigger),
    so a sustained burst yields one alert, not one per event.  Alert
    fields: count = N (the threshold — "at least N within T"), start = the
    (N-1)-th predecessor's time, end = trigger time, origin_ids = the N
    involved events' uuids (oldest first, capped).
    """
    tf_us = int(rule.timeframe_seconds) * 1_000_000
    n = int(rule.timeframe_min_count or 2)
    group_by = list(rule.timeframe_group_by)
    keys = [f"__k{i}" for i in range(len(group_by))]
    host_idx = group_by.index("host") if "host" in group_by else None
    ts = F.col(ts_col)

    prep = events.filter(rule.condition()).select(
        *[F.col(k).alias(a) for k, a in zip(group_by, keys)],
        F.unix_micros(ts).alias("__ts_us"),
        F.col("uuid"),
        F.col("computer_name").alias("__computer_name"),
    )
    w = Window.partitionBy(*keys).orderBy("__ts_us", "uuid")
    nth_prev_ts = F.lag("__ts_us", n - 1).over(w)
    trig = nth_prev_ts.isNotNull() & (
        F.col("__ts_us") - nth_prev_ts <= F.lit(tf_us)
    )
    ids = F.collect_list("uuid").over(w.rowsBetween(-(n - 1), 0))
    flagged = prep.select(
        *keys,
        "__ts_us",
        "uuid",
        "__computer_name",
        trig.alias("__trig"),
        nth_prev_ts.alias("__start_us"),
        F.slice(ids, 1, int(max_origin_ids)).alias("__origin_ids"),
    ).withColumn(
        "__prev_trig",
        F.lag("__trig", 1, False).over(
            Window.partitionBy(*keys).orderBy("__ts_us", "uuid")
        ),
    )
    first = flagged.filter(F.col("__trig") & ~F.col("__prev_trig")).withColumn(
        "__count", F.lit(n).cast("long")
    )
    host_col = (
        F.col(keys[host_idx]) if host_idx is not None else F.lit(None).cast("string")
    )
    return first.select(
        *_alert_projection(
            rule,
            host_col,
            F.timestamp_micros(F.col("__start_us")),
            F.timestamp_micros(F.col("__ts_us")),
        )
    )


def _stream_timeframe_exact(
    events: DataFrame, rule: RuleSpec, ts_col: str, max_origin_ids: int
) -> DataFrame:
    """Exact path, streaming: arrival-driven ``applyInPandasWithState``
    keyed by the group fields alone.  Per-key state is the last N-1
    (ts, uuid) pairs plus the previous event's trigger flag — O(N), bounded
    regardless of rate — and alerts emit ON ARRIVAL of the triggering
    event (no window-close latency).  Within a micro-batch events are
    processed in (ts, uuid) order, matching the batch window order;
    cross-batch ordering holds for in-order sources, and rows later than
    the watermark are dropped upstream like every other path.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    tf_us = int(rule.timeframe_seconds) * 1_000_000
    n = int(rule.timeframe_min_count or 2)
    cap = int(max_origin_ids)
    group_by = list(rule.timeframe_group_by)
    keys = [f"__k{i}" for i in range(len(group_by))]
    host_idx = group_by.index("host") if "host" in group_by else None
    ts = F.col(ts_col)

    prep = events.filter(rule.condition()).select(
        ts,  # carries the watermark metadata (late rows filtered upstream)
        F.unix_micros(ts).alias("__ts_us"),
        F.col("uuid").cast("string").alias("__uuid"),
        F.col("computer_name").cast("string").alias("__cn"),
        *[F.col(k).cast("string").alias(a) for k, a in zip(group_by, keys)],
    )

    def update(
        key: Tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        host = key[host_idx] if host_idx is not None else None
        if host is not None:
            host = str(host)
        if state.hasTimedOut:  # no timeouts registered; defensive
            state.remove()
            return
        # state: (flat [ts0, ts1, ...] of last N-1 events, matching uuids,
        # prev_was_trigger)
        tss, uids, prev_trig = (
            state.get if state.exists else ([], [], False)
        )
        tss, uids = list(tss), list(uids)
        pdf_list = [p for p in pdfs if len(p)]
        rows = pd.concat(pdf_list, ignore_index=True) if pdf_list else None
        out = []
        if rows is not None and len(rows):
            rows = rows.sort_values(["__ts_us", "__uuid"], ignore_index=True)
            for t_us, uid, cn in zip(
                rows["__ts_us"].tolist(), rows["__uuid"].tolist(),
                rows["__cn"].tolist(),
            ):
                t_us = int(t_us)
                # n == 1: every event is trivially "1 within T" — the
                # general expression would index tss[-0] (== tss[0]) and
                # crash on empty state; keep NO history for that case
                trig = (
                    True if n == 1
                    else len(tss) >= n - 1 and t_us - tss[-(n - 1)] <= tf_us
                )
                if trig and not prev_trig:
                    involved = uids[-(n - 1):] + [uid] if n > 1 else [uid]
                    out.append(
                        (
                            cn,
                            host,
                            n,
                            tss[-(n - 1)] if n > 1 else t_us,
                            t_us,
                            involved[:cap],
                        )
                    )
                prev_trig = trig
                if n > 1:
                    tss.append(t_us)
                    uids.append(uid)
                    if len(tss) > n - 1:
                        tss, uids = tss[-(n - 1):], uids[-(n - 1):]
        state.update((tss, uids, bool(prev_trig)))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "computer_name", "host", "__count", "__start_us",
                    "__end_us", "__origin_ids",
                ],
            )

    agg = (
        prep.groupBy(*keys)
        .applyInPandasWithState(
            update,
            _TF_OUT_SCHEMA,
            _TF_EXACT_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
        .withColumnRenamed("computer_name", "__computer_name")
        .withColumnRenamed("host", "__host")
    )
    return agg.select(
        *_alert_projection(
            rule,
            F.col("__host"),
            F.timestamp_micros(F.col("__start_us")),
            F.timestamp_micros(F.col("__end_us")),
        )
    )


def apply_timeframe_rule(
    events: DataFrame,
    rule: RuleSpec,
    ts_col: str = "timestamp",
    max_origin_ids: int = 1000,
) -> DataFrame:
    """Windowed count rule → alert rows; per-key memory stays O(max_origin_ids).

    Batch and streaming share semantics (same windows, threshold, alert
    shape); streaming additionally requires ``withWatermark`` on ``ts_col``
    upstream (the event-time timeout and late-row filtering depend on it).
    """
    if not rule.timeframe_seconds:
        raise ValueError(f"rule {rule.name!r} has no timeframe")
    if rule.timeframe_exact:
        if rule.timeframe_slide_seconds is not None:
            raise ValueError(
                f"rule {rule.name!r}: timeframe_exact and "
                "timeframe_slide_seconds are mutually exclusive"
            )
        if events.isStreaming:
            return _stream_timeframe_exact(events, rule, ts_col, max_origin_ids)
        return _batch_timeframe_exact(events, rule, ts_col, max_origin_ids)
    if events.isStreaming:
        return _stream_timeframe(events, rule, ts_col, max_origin_ids)
    return _batch_timeframe(events, rule, ts_col, max_origin_ids)


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
