"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's runtime has no custom state at all (stateless filters; even
its designed-but-skipped timeframe rules are windowed aggs — see
rules/timeframe.py).  This module adds the genuinely-custom-state shape the
north star asks for: arbitrary per-key state evolved across micro-batches,
with watermark-driven timeout eviction — the Spark-idiomatic replacement for
a hand-rolled Flink KeyedProcessFunction.

``running_totals`` is deliberately minimal-but-real: per-key cumulative
event count + value sum, emitted once per micro-batch per updated key
("update" output mode).  State is two doubles per key; eviction on
processing-time timeout keeps it bounded when keys churn (at 100 TB the
key-space is the thing that kills you, not the row count).
"""

from __future__ import annotations

from decimal import Decimal, ROUND_HALF_UP
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)


def running_totals(
    events: DataFrame,
    key_col: str = "host",
    value_col: str = "event_id",
    idle_timeout_ms: int = 0,
) -> DataFrame:
    """Cumulative (count, sum) per key across micro-batches.

    Batch DataFrames get the equivalent groupBy (same output schema), so the
    batch==stream test discipline holds for the stateful path too.
    """
    from pyspark.sql import functions as F

    if not events.isStreaming:
        # coalesce to 0.0: the streaming path's state starts at 0.0 and
        # pandas sum skips NaN, so an all-null group totals 0.0 there —
        # batch must agree (batch==stream discipline)
        return events.groupBy(F.col(key_col).cast("string").alias("key")).agg(
            F.count("*").alias("n_events"),
            F.coalesce(
                F.sum(F.col(value_col).cast("double")), F.lit(0.0)
            ).alias("total_value"),
        )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].astype("float64").sum())
        state.update((n, total))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [total]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        # cast the key to string BEFORE grouping so the emitted 'key' field
        # matches RUNNING_TOTALS_SCHEMA's StringType for any key_col type
        # (the batch path casts identically)
        events.select(
            F.col(key_col).cast("string").alias(key_col), value_col
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update, RUNNING_TOTALS_SCHEMA, _STATE_SCHEMA, "update", timeout
        )
    )


class _RunningTotalsProcessor:
    """StatefulProcessor for running_totals_tws.  Defined lazily (the base
    class import is Spark 4.x-only) via __init_subclass__-free composition:
    build() returns a concrete subclass instance."""

    @staticmethod
    def build(value_col: str, ttl_ms: int):
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor, StatefulProcessorHandle)

        class Processor(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                # TTL is the transformWithState replacement for the old
                # processing-time timeout: state older than ttl_ms is
                # evicted by the store itself (key churn stays bounded)
                self._totals = handle.getValueState(
                    "totals", _STATE_SCHEMA, ttlDurationMs=ttl_ms or None)

            def handleInputRows(self, key, rows, timer_values):
                prior = self._totals.get() if self._totals.exists() else (0, 0.0)
                n, total = int(prior[0]), float(prior[1])
                for pdf in rows:
                    n += len(pdf)
                    total += float(pdf[value_col].astype("float64").sum())
                self._totals.update((n, total))
                yield pd.DataFrame(
                    {"key": [key[0]], "n_events": [n], "total_value": [total]})

            def close(self) -> None:
                pass

        return Processor()


def running_totals_tws(
    events: DataFrame,
    key_col: str = "host",
    value_col: str = "event_id",
    ttl_ms: int = 0,
) -> DataFrame:
    """``running_totals`` on the Spark 4.x ``transformWithStateInPandas``
    API (StatefulProcessor + typed state variables): same semantics, same
    output schema, so the two implementations are drop-in interchangeable
    and parity-tested against each other and against the batch aggregate.

    Why both exist: applyInPandasWithState is the stable 3.x surface;
    transformWithState is where new state features land (state TTL used
    here, ListState/MapState, timers, initial state, state data source
    reader) — at the 100 TB design point TTL-evicted RocksDB state with
    changelog checkpointing is the configuration that survives key churn.

    Runtime requirements (streaming path): the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` package — transformWithState's Python state server speaks
    protobuf to the JVM.  Environments without protobuf fail at query start
    with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE; use
    ``running_totals`` (applyInPandasWithState) there.
    """
    from pyspark.sql import functions as F

    if not events.isStreaming:
        return running_totals(events, key_col, value_col)

    return (
        events.select(F.col(key_col).cast("string").alias(key_col), value_col)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotalsProcessor.build(value_col, ttl_ms),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="Update",
            # ValueState TTL is only legal under ProcessingTime time mode —
            # timeMode="None" with a ttlDurationMs fails at query start
            # (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL)
            timeMode="ProcessingTime" if ttl_ms else "None",
        )
    )


# --------------------------------------------------------------------------
# Streaming CUSUM: the change-point detector as O(1)-per-key custom state
# --------------------------------------------------------------------------

CUSUM_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("cusum_micro", T.LongType(), False),
        T.StructField("n_alarms", T.LongType(), False),
        T.StructField("max_cusum", T.LongType(), False),
    ]
)

ATTRIBUTION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("channel", T.StringType(), False),
        T.StructField("value_cents", T.LongType(), True),
    ]
)

_ATTRIBUTION_STATE = T.StructType(
    [
        T.StructField("t_us", T.LongType(), False),   # last touch, epoch µs
        T.StructField("t_type", T.StringType(), False),
    ]
)


def attribution_events(
    events: DataFrame,
    lookback_days: int = 7,
    touch_types: Tuple[str, ...] = ("view", "click"),
    idle_timeout_ms: int = 0,
) -> DataFrame:
    """Per-purchase last-touch attribution as a STREAMING operator — the
    catalog's ``events_attribution`` window with its unbounded-preceding
    frame replaced by O(1) state per user: the (timestamp, type) of the
    most recent view/click.  That constant footprint is the point: the
    batch window re-scans a user's whole history per run, while the
    stream carries 16 bytes per active user and idle users evict on
    timeout — the only shape that holds on an unbounded clickstream.

    Emits one row per purchase (``update`` mode): channel = the stored
    touch type when its timestamp is within ``lookback_days`` (inclusive
    boundary, matching the catalog query's ``>=``), else 'direct'.
    Batch DataFrames get the identical per-purchase rows via the window
    form, so batch==stream pins the state machine against the window
    semantics.  Rows sort by (ts, event_id) within each micro-batch;
    cross-batch order is arrival order — replay in order, the standard
    stateful caveat (cusum_alarms).  Cents use the same floor(v*100+0.5)
    double expression as the batch side, bit-identical in Python and
    JVM."""
    import math

    from pyspark.sql import functions as F

    lookback_us = lookback_days * 86_400_000_000

    if not events.isStreaming:
        from pyspark.sql.window import Window

        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        is_touch = F.col("event_type").isin(*touch_types)
        touched = events.select(
            "user_id", "ts", "event_id", "event_type", "value",
            F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
            .over(w).alias("t_ts"),
            F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
            .over(w).alias("t_type"),
        )
        return touched.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id",
            F.when(
                F.col("t_ts")
                >= F.col("ts") - F.expr(f"INTERVAL {lookback_days} DAYS"),
                F.col("t_type"),
            ).otherwise(F.lit("direct")).alias("channel"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            .alias("value_cents"),
        )

    touch_set = set(touch_types)

    def fold(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        t_us, t_type = state.get if state.exists else (-1, "")
        out = []
        # a key's micro-batch arrives as an ITERATOR of Arrow-sized chunks
        # (maxRecordsPerBatch): concatenate before sorting — per-chunk
        # sorts would process a purchase before its earlier-ts touch
        # whenever the two land in different chunks (timeframe.py's
        # fold learned the same lesson)
        chunks = [p for p in pdfs if len(p)]
        pdf = (
            pd.concat(chunks, ignore_index=True)
            .sort_values(["ts", "event_id"])
            if chunks else None
        )
        if pdf is not None:
            for row in pdf.itertuples(index=False):
                ts_us = row.ts.value // 1000  # pandas ns -> µs
                if row.event_type in touch_set:
                    t_us, t_type = ts_us, row.event_type
                elif row.event_type == "purchase":
                    fresh = t_us >= 0 and t_us >= ts_us - lookback_us
                    cents = (
                        None if row.value is None or pd.isna(row.value)
                        else math.floor(float(row.value) * 100 + 0.5)
                    )
                    out.append(
                        (key[0], row.ts, row.event_id,
                         t_type if fresh else "direct", cents)
                    )
        state.update((t_us, t_type))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "ts", "event_id", "channel",
                         "value_cents"],
            )

    return (
        events.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=ATTRIBUTION_SCHEMA,
            stateStructType=_ATTRIBUTION_STATE,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms else GroupStateTimeout.NoTimeout
            ),
        )
    )


_CUSUM_STATE = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("s", T.LongType(), False),
        T.StructField("n_alarms", T.LongType(), False),
        T.StructField("max_s", T.LongType(), False),
    ]
)


def cusum_alarms(
    events: DataFrame,
    k_micro: int,
    h_micro: int,
    key_col: str = "event_type",
    value_col: str = "value",
    order_cols: Tuple[str, str] = ("ts", "event_id"),
    idle_timeout_ms: int = 0,
) -> DataFrame:
    """Per-key CUSUM S = max(0, S + (v_micro - k)) with alarms at S > h —
    the events_cusum_shift detector as a STREAMING operator whose state is
    four integers per key, O(1) regardless of stream length (the state a
    100 TB SIEM can actually afford per entity).

    The two paths deliberately use DIFFERENT formulations of the same
    math, and the batch==stream test is therefore a proof of the identity
    itself: streaming folds the literal recursion inside
    ``applyInPandasWithState`` (rows sorted by ``order_cols`` within each
    micro-batch; cross-batch order is arrival order, the standard
    stateful-streaming caveat — replay in order to reproduce batch), while
    batch evaluates the closed form prefix − min(0, running_min(prefix))
    with two window functions (catalog `events_cusum_shift`'s shape).
    Everything integer micro-units, so both paths are exact.
    """
    from pyspark.sql import functions as F

    if not events.isStreaming:
        from pyspark.sql.window import Window

        w = (Window.partitionBy(key_col).orderBy(*order_cols)
             .rowsBetween(Window.unboundedPreceding, 0))
        v = events.filter(F.col(value_col).isNotNull()).select(
            F.col(key_col).cast("string").alias("key"),
            *[F.col(c) for c in order_cols],
            (F.round(F.col(value_col) * 1e6).cast("long") - F.lit(k_micro))
            .alias("y"),
        )
        w2 = (Window.partitionBy("key").orderBy(*order_cols)
              .rowsBetween(Window.unboundedPreceding, 0))
        p = v.withColumn("prefix", F.sum("y").over(w2))
        p = p.withColumn("run_min", F.min("prefix").over(w2))
        s = p.withColumn(
            "cusum", F.col("prefix") - F.least(F.col("run_min"), F.lit(0))
        )
        final_at = ", ".join(order_cols)
        return s.groupBy("key").agg(
            F.count("*").alias("n_events"),
            # last() under groupBy is order-nondeterministic — take the
            # value at the maximum (ts, event_id) explicitly
            F.expr(f"max_by(cusum, struct({final_at}))")
             .alias("cusum_micro"),
            F.sum(F.when(F.col("cusum") > h_micro, 1).otherwise(0))
             .cast("long").alias("n_alarms"),
            F.max("cusum").alias("max_cusum"),
        )

    def fold(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, s, n_alarms, max_s = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        # concatenate the micro-batch's Arrow chunks BEFORE sorting: a
        # per-chunk sort silently folds out of (ts, event_id) order when
        # one key's batch spans maxRecordsPerBatch (CUSUM is
        # order-sensitive; same fix as timeframe.py / attribution)
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).dropna(
                subset=[value_col]
            ).sort_values(list(order_cols))
            for v in pdf[value_col]:
                # HALF-AWAY-FROM-ZERO to match the batch twin's F.round
                # (Spark HALF_UP): Python's round() is banker's
                # (half-to-even) and disagrees by 1 micro-unit whenever
                # v*1e6 lands exactly on *.5.  Spark's round on doubles
                # goes through BigDecimal.valueOf(double) — the SHORTEST
                # decimal repr (Double.toString), not the exact binary
                # expansion — so the Python mirror is Decimal(repr(fv)),
                # which is that same shortest repr.  (Decimal(fv) agrees
                # only while every .5 boundary is exactly representable,
                # i.e. |fv| < 2^52 — true in the micro-unit domain, but
                # repr() is the equivalence that needs no domain caveat.)
                # The floor(fv+0.5) shortcut has a hole at values 1 ulp
                # below an exact .5 boundary, where the addition rounds up
                # across the integer.
                fv = float(v) * 1e6
                vm = int(Decimal(repr(fv)).quantize(Decimal(1),
                                                    rounding=ROUND_HALF_UP))
                s = s + (vm - k_micro)
                if s < 0:
                    s = 0
                if s > max_s:
                    max_s = s
                if s > h_micro:
                    n_alarms += 1
                n += 1
        state.update((n, s, n_alarms, max_s))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [(key[0], n, s, n_alarms, max_s)],
            columns=["key", "n_events", "cusum_micro", "n_alarms",
                     "max_cusum"],
        )

    from pyspark.sql import functions as F

    return (
        events.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("__k"),
            *[F.col(c) for c in order_cols],
            F.col(value_col),
        )
        .groupBy("__k")
        .applyInPandasWithState(
            fold,
            outputStructType=CUSUM_SCHEMA,
            stateStructType=_CUSUM_STATE,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms else GroupStateTimeout.NoTimeout
            ),
        )
    )


_HH_STATE = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType()), False),
        T.StructField("counts", T.ArrayType(T.LongType()), False),
        T.StructField("errs", T.ArrayType(T.LongType()), False),
        T.StructField("n_seen", T.LongType(), False),
    ]
)

_HH_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("item", T.StringType(), False),
        T.StructField("est", T.LongType(), False),
        T.StructField("err", T.LongType(), False),
        T.StructField("n_seen", T.LongType(), False),
    ]
)


def _space_saving_step(summary: dict, item: str, capacity: int) -> None:
    """One Space-Saving update (Metwally et al.): increment a tracked
    item; otherwise insert, evicting the minimum-count entry once at
    capacity — the evictee's count becomes the newcomer's error floor.
    Eviction tie-break is deterministic: the lexicographically LARGEST
    item among the minimum-count entries (any fixed rule works; this one
    keeps batch and stream byte-identical)."""
    got = summary.get(item)
    if got is not None:
        summary[item] = (got[0] + 1, got[1])
    elif len(summary) < capacity:
        summary[item] = (1, 0)
    else:
        evict, (mc, _) = max(
            ((i, ce) for i, ce in summary.items()),
            key=lambda kv: (-kv[1][0], kv[0]),
        )
        del summary[evict]
        summary[item] = (mc + 1, mc)


def heavy_hitters_sketch(
    events: DataFrame,
    item_col: str,
    capacity: int = 32,
    n_shards: int = 8,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming heavy hitters with HARD-BOUNDED state: Space-Saving
    summaries of ``capacity`` counters per shard, items hash-sharded so
    each item lives in exactly ONE shard (no cross-shard merge ambiguity
    — the global candidate set is the plain union of <= n_shards *
    capacity rows).  Guarantees, per shard with N_s processed rows:
    ``est - err <= true <= est`` for tracked items, and every item with
    true count > N_s / capacity is tracked — the classic frequent-items
    contract, at ~(capacity * 40 bytes) state per shard regardless of
    cardinality.  An exact streaming count per item (a keyed aggregate)
    carries state linear in the DISTINCT-item count — unbounded on an
    unbounded stream; this is the bounded-memory alternative, the same
    trade the batch catalog instruments with its sample-then-verify
    ``heavy_hitters_docs``.

    One function, both engines (running_totals discipline): batch inputs
    fold the identical summary per shard via ``applyInPandas`` and emit
    the final snapshot; streams fold through ``applyInPandasWithState``
    (update mode) and re-emit the shard's full summary each micro-batch
    — the reader keeps the rows with the highest ``n_seen`` per shard.
    Rows fold in (ts, id) order within a micro-batch; cross-batch order
    is arrival order — replay in order, the standard stateful caveat
    (cusum_alarms).  NULL items are ignored (they are not a value).
    Eviction ties break deterministically (largest item), so
    batch==stream is exact, pinned in tests/test_stateful.py."""
    from pyspark.sql import functions as F

    shard = F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_shards)).cast("int")
    src = (
        events.filter(F.col(item_col).isNotNull())
        .select(
            shard.alias("__shard"),
            F.col(item_col).cast("string").alias("__item"),
            F.col(ts_col).alias("__ts"),
            F.col(id_col).alias("__id"),
        )
    )

    def _fold_rows(summary: dict, pdf: pd.DataFrame) -> int:
        pdf = pdf.sort_values(["__ts", "__id"])
        for item in pdf["__item"]:
            _space_saving_step(summary, item, capacity)
        return len(pdf)

    def _emit(shard_id: int, summary: dict, n_seen: int) -> pd.DataFrame:
        rows = [
            (shard_id, i, c, e, n_seen) for i, (c, e) in summary.items()
        ]
        return pd.DataFrame(
            rows, columns=["shard", "item", "est", "err", "n_seen"]
        )

    if not events.isStreaming:
        # constant-memory batch fold: hash-shuffle on shard, sort the
        # partition once (so each shard's rows arrive in (ts, id) order),
        # then fold Arrow chunk by Arrow chunk via mapInPandas — state is
        # shards-in-partition * capacity counters, never the shard's rows
        # (groupBy().applyInPandas would materialize the whole shard in
        # one pandas frame).  Chunk iteration preserves the partition
        # sort, and shards never share a summary, so the result is
        # byte-identical to the per-shard sorted fold the stream runs.
        def fold_partition(batches):
            summaries: dict = {}
            for pdf in batches:
                for shard, item in zip(pdf["__shard"], pdf["__item"]):
                    summary, n = summaries.get(shard) or ({}, 0)
                    _space_saving_step(summary, item, capacity)
                    summaries[shard] = (summary, n + 1)
            for shard, (summary, n) in summaries.items():
                yield _emit(int(shard), summary, n)

        return (
            src.repartition("__shard")
            .sortWithinPartitions("__ts", "__id")
            .mapInPandas(fold_partition, _HH_SCHEMA)
        )

    def fold(key, pdfs, state: GroupState):
        if state.exists:
            items, counts, errs, n_seen = state.get
            summary = dict(zip(items, zip(counts, errs)))
        else:
            summary, n_seen = {}, 0
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            n_seen += _fold_rows(
                summary, pd.concat(chunks, ignore_index=True)
            )
        items = list(summary)
        state.update((
            items,
            [summary[i][0] for i in items],
            [summary[i][1] for i in items],
            n_seen,
        ))
        yield _emit(key[0], summary, n_seen)

    return src.groupBy("__shard").applyInPandasWithState(
        fold,
        outputStructType=_HH_SCHEMA,
        stateStructType=_HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming KMV distinct sketch ------------------------------------------

KMV_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("n_kept", T.LongType(), False),
        T.StructField("kth_min", T.LongType(), True),
        T.StructField("est_distinct", T.DoubleType(), True),
    ]
)

_KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("mins", T.ArrayType(T.LongType()), False)]
)


def kmv_distinct_stream(
    events: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Streaming twin of the batch KMV distinct sketch
    (ops/sketch.kmv_sketch → kmv_estimate): per key, the k smallest
    distinct 60-bit value hashes fold into ``applyInPandasWithState``
    state — k longs per key, HARD-BOUNDED regardless of stream
    cardinality (the unbounded-stream alternative to an exact
    count-distinct aggregate whose state grows with every new value).
    Each micro-batch emits the key's current (n_kept, kth_min,
    est_distinct); because KMV merge is order-insensitive and lossless,
    the LAST emission per key equals the batch sketch over the same rows
    exactly — pinned batch==stream in tests/test_stateful.py.

    Hashing runs JVM-SIDE before the stateful op (the same
    ops/sketch.kmv_hash expression the batch path uses), so the Python
    worker only merges sorted integer lists — no per-row Python hashing.
    On a BATCH frame the same call returns the batch sketch estimate
    with identical columns."""
    from pyspark.sql import functions as F

    from ..ops.sketch import kmv_estimate, kmv_hash, kmv_sketch

    if not events.isStreaming:
        # alias the value column: a NESTED value_col ("event_data.Target")
        # flattens to its leaf name under select, so passing the original
        # dotted path to kmv_sketch would fail resolution
        sk = kmv_sketch(
            events.select(
                F.col(key_col).cast("string").alias("key"),
                F.col(value_col).alias("__v"),
            ),
            "__v",
            ["key"],
            k=k,
        )
        return kmv_estimate(sk, ["key"], k=k).select(
            "key", "n_kept", "kth_min", "est_distinct"
        )

    space = float(k - 1) * 1152921504606846976.0  # (k-1) * 2^60

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mins = list(state.get[0]) if state.exists else []
        seen = set(mins)
        for pdf in pdfs:
            seen.update(int(h) for h in pdf["__h"] if h is not None)
        mins = sorted(seen)[:k]
        state.update((mins,))
        n = len(mins)
        kth = mins[-1] if mins else None
        # same single-division estimator as the batch/oracle path: exact
        # below k, (k-1)*2^60/h_(k) at capacity — IEEE-identical division,
        # rounded HALF_UP via Decimal(repr(..)) like every other float
        # this module emits (python round() is half-EVEN; Spark's is not)
        if n < k:
            est = float(n)
        else:
            est = float(
                Decimal(repr(space / kth)).quantize(
                    Decimal("0.001"), ROUND_HALF_UP
                )
            )
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_kept": [n],
                "kth_min": pd.array([kth], dtype="Int64"),
                "est_distinct": [est if mins else None],
            }
        )

    hashed = (
        events.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("key"),
            kmv_hash(F.col(value_col)).alias("__h"),
        )
    )
    return hashed.groupBy("key").applyInPandasWithState(
        update,
        KMV_STREAM_SCHEMA,
        _KMV_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
