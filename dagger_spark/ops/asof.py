"""As-of join and interval (range) join — operators Spark lacks as built-ins
(SURVEY.md §2.7), composed from existing DataFrame ops as the prompt's
option (a): no UDFs, no mapPartitions.

**As-of join** (latest right row with ``r.ts <= l.ts`` per key), union-tag
formulation: tag both inputs, union, sort within key by (ts, tag) and carry
the last-seen right payload forward with ``last(ignorenulls)`` over a
running window, keep left rows.  ONE shuffle (by key) + a partition-local
sort — the sort-merge shape, linear at any scale; no per-row probing, no
range explosion.  Right rows at ts == left ts sort first (tag order), so
ties match, same as DuckDB's ``ASOF JOIN ... ON r.ts <= l.ts`` oracle.

**Interval join** (all pairs with ``|l.ts - r.ts| <= bound`` per key),
time-bucket formulation: quantize time into buckets of the bound's width,
explode each left row into its bucket and the two neighbors, equi-join on
(key, bucket), then apply the exact range predicate.  Turns an unbounded
non-equi join into an equi-join whose per-bucket fan-out is bounded by data
density — the standard way to keep stream-stream/interval joins shuffle-
local at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join: every left row + the most recent right row with
    ``right_ts <= left_ts`` for the same key (nulls when none).

    Output: all left columns + ``right_cols`` (null when unmatched).
    """
    lcols = left.columns
    # NULL never matches NULL under the DuckDB `ASOF JOIN ... ON l.k = r.k`
    # oracle semantics, but Window.partitionBy co-groups NULL keys — so a
    # NULL-key right row could leak into NULL-key left rows.  Drop NULL-key
    # (and NULL-ts: `r.ts <= l.ts` is never satisfied by NULL) right rows up
    # front; NULL-key left rows still pass through with a NULL payload.
    right = right.filter(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
    # the right payload travels as ONE struct, not per-column: a matched
    # right row whose individual field is NULL must surface that NULL, not
    # fall through to an older row's value (per-column last(ignorenulls)
    # would stitch the output from different right rows).  The struct is
    # non-NULL for every right row, so last(ignorenulls) picks the latest
    # right ROW atomically; unmatched lefts get a NULL struct -> NULL fields.
    rstruct_type = (
        "struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols
        ) + ">"
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_type).alias("__r"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l.unionByName(r).withColumn(
        "__last", F.last(F.col("__r"), ignorenulls=True).over(w)
    )
    return (
        u.filter(F.col("__is_left") == 1)
        .select(*lcols, *[F.col(f"__last.{c}").alias(c) for c in right_cols])
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    bound_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with same key and ``|l.ts - r.ts| <= bound``.

    Implemented as a time-bucketed equi-join: left explodes into 3 bucket
    keys (its own + neighbors), right maps to 1; the equi-join on
    (key, bucket) bounds candidates, the exact predicate filters after.
    Left column names keep their `l_`/caller names; right columns are
    suffixed `_r` when they collide.
    """
    if how != "inner":
        raise ValueError("interval_join supports inner only")
    b = F.lit(int(bound_seconds))
    l_bucket = (F.unix_timestamp(F.col(left_ts)) / b).cast("long")
    r_bucket = (F.unix_timestamp(F.col(right_ts)) / b).cast("long")

    collisions = set(left.columns) & set(right.columns)
    r_renamed = right
    for c in collisions:
        r_renamed = r_renamed.withColumnRenamed(c, f"{c}_r")
    rkey = f"{key}_r" if key in collisions else key
    rts = f"{right_ts}_r" if right_ts in collisions else right_ts

    l = left.withColumn("__cand", F.explode(F.array(l_bucket - 1, l_bucket, l_bucket + 1)))
    r = r_renamed.withColumn("__b", (F.unix_timestamp(F.col(rts)) / b).cast("long"))
    joined = l.join(
        r,
        (F.col(key) == F.col(rkey)) & (F.col("__cand") == F.col("__b")),
    )
    in_range = (
        F.abs(F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(rts)))
        <= bound_seconds
    )
    return joined.filter(in_range).drop("__cand", "__b")


def interval_join_direct(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    bound_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """The direct time-RANGE form of :func:`interval_join` — one join whose
    condition is the raw ``|l.ts - r.ts| <= bound`` interval, no bucket
    explosion.

    Why two forms exist: the bucketed form bounds BATCH shuffle fan-out
    (each row meets only its 3 candidate buckets) but its exploded left
    side makes outer semantics wrong (each unmatched bucket-candidate
    would null-emit).  This form is what Structured Streaming's
    symmetric-hash join manager wants verbatim: with watermarks on both
    sides, the event-time range condition is how it bounds state and —
    for ``left_outer``/``right_outer``/``full_outer`` — decides when an
    unmatched row is safe to null-emit (watermark past the range end).
    Use the bucketed form for large batch joins, this one for streaming
    and for any outer interval join; the inner results are identical
    (pinned in tests/test_stream_stream_join.py).

    Column collisions are suffixed ``_r`` like :func:`interval_join`.
    """
    collisions = set(left.columns) & set(right.columns)
    r_renamed = right
    for c in collisions:
        r_renamed = r_renamed.withColumnRenamed(c, f"{c}_r")
    rkey = f"{key}_r" if key in collisions else key
    rts = f"{right_ts}_r" if right_ts in collisions else right_ts
    bound = int(bound_seconds)
    cond = (
        (F.col(key) == F.col(rkey))
        & (F.col(rts) >= F.col(left_ts) - F.expr(f"INTERVAL {bound} SECONDS"))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {bound} SECONDS"))
    )
    return left.join(r_renamed, cond, how)
