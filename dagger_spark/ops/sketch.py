"""Mergeable HDR-histogram quantile sketch — exact integer bucketing.

Percentiles at 100 TB need a MERGEABLE summary: Spark's
``percentile_approx`` yields a one-shot estimate you cannot re-aggregate
(per-group sketches can't roll up to a global without re-reading the raw
data), and exact quantiles need a global sort.  The HDR-histogram bucketing
(exponent + ``2^b`` sub-buckets per octave, as in HdrHistogram / DDSketch's
log-bin family) gives a fixed-size frame whose counts ADD: merging groups,
partitions, days, or snapshots is a plain ``SUM`` groupBy — associative,
commutative, shuffle-light — with relative error bounded by ``2^-b``.

Bucketing is **pure integer arithmetic** — no ``log()`` anywhere:

    v < 2^(b+1):  shift = 0,            m = v          (EXACT, width 1)
    else:         shift = bitlen(v)-1-b, m = v >> shift (m in [2^b, 2^(b+1)))

``bitlen`` comes from ``length(bin(v))`` — identical in Spark and DuckDB —
so the sketch (and therefore the quantile estimate) is bit-reproducible
across engines, unlike any float-log binning where a 1-ulp libm difference
flips a boundary bucket.  Bucket lower bound is ``m << shift``, width
``1 << shift``; distinct ``(shift, m)`` keys map to disjoint value
intervals, so ``m << shift`` is a total order over buckets.

Quantile extraction: rank ``r = ceil(p * n)`` (exact integer arithmetic),
first bucket whose cumulative count reaches ``r``, estimate = bucket
midpoint ``lo + (width-1)//2`` — monotone across buckets, so a ``min()``
over eligible buckets selects it without argmin plumbing.  The cumulative
window runs over the SKETCH frame (<= groups x 64 x 2^b rows), never over
the data — bounded state regardless of input size.

Values must be non-negative integers (scale decimals to micro-units first,
with an explicit ``floor(x*scale + 0.5)`` so both engines agree; a raw
double->int cast truncates in Spark but rounds in DuckDB).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def hdr_bucket(v: F.Column, sub_bits: int = 5):
    """(shift, m) bucket expressions for a non-negative integer column."""
    small = 1 << (sub_bits + 1)
    bitlen = F.length(F.bin(v))
    shift = F.when(v < small, F.lit(0)).otherwise(
        bitlen - F.lit(1 + sub_bits)
    ).cast("int")
    m = F.call_function("shiftrightunsigned", v, shift)
    return shift, m


def hdr_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    sub_bits: int = 5,
) -> DataFrame:
    """Build the sketch: ``group_cols + (shift, m, cnt)``.

    One map-side-combining aggregate over the data; output size is bounded
    by ``|groups| * 64 * 2^sub_bits`` rows regardless of input rows.
    Negative values are excluded (document the domain at the call site).
    """
    v = F.col(value_col).cast("long")
    shift, m = hdr_bucket(v, sub_bits)
    return (
        df.filter(v >= 0)
        .select(*group_cols, shift.alias("shift"), m.alias("m"))
        .groupBy(*group_cols, "shift", "m")
        .agg(F.count("*").alias("cnt"))
    )


def hdr_merge(sketch: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge sketch rows down to ``group_cols`` (possibly []): counts ADD."""
    return sketch.groupBy(*group_cols, "shift", "m").agg(
        F.sum("cnt").alias("cnt")
    )


def hdr_quantiles(
    sketch: DataFrame,
    group_cols: Sequence[str],
    q_pcts: Sequence[int],
) -> DataFrame:
    """Extract percentile estimates from a sketch.

    Returns ``group_cols + (q_pct, n_rows, est)`` — one row per group per
    requested integer percentile.  ``est`` is the midpoint of the first
    bucket whose cumulative count reaches ``ceil(q_pct * n / 100)``.
    """
    lo = F.call_function("shiftleft", F.col("m"), F.col("shift"))
    width = F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.col("shift")
    )
    # midpoint via shift, not float division — exact at any magnitude
    est = lo + F.shiftrightunsigned(width - F.lit(1), 1)
    w = Window.partitionBy(*group_cols).orderBy(lo)
    cum = (
        sketch.withColumn("__cum", F.sum("cnt").over(w))
        .withColumn("__n", F.sum("cnt").over(Window.partitionBy(*group_cols)))
        .withColumn("__est", est)
    )
    qs = F.explode(
        F.array(*[F.lit(int(p)) for p in q_pcts])
    ).alias("q_pct")
    ranked = cum.select(*group_cols, "__cum", "__n", "__est", qs).filter(
        # cum >= ceil(q*n/100)  <=>  100*cum >= q*n  (cum integral) —
        # pure integer comparison, no division anywhere
        F.col("__cum") * F.lit(100) >= F.col("q_pct") * F.col("__n")
    )
    return ranked.groupBy(*group_cols, "q_pct").agg(
        F.min("__n").alias("n_rows"),  # constant per group
        F.min("__est").alias("est"),   # est monotone -> min = first bucket
    )
