"""Skew mitigation: salted joins and two-phase aggregation.

At 100 TB a handful of hot keys (one chatty host, one viral document) can
put 100 GB behind a single reducer.  AQE's skew-join split
(``spark.sql.adaptive.skewJoin.enabled``, on in our session builder) handles
sort-merge joins automatically; these helpers cover the cases AQE cannot:

  * ``salted_join`` — explode a skewed LEFT against a replicated small-ish
    RIGHT: left rows get a random salt in [0, n), right rows are replicated n
    ways, and the join key becomes (key, salt), fanning each hot key across n
    reducers.  Correctness is salt-invariant (each left row matches exactly
    the replica carrying its salt), so results equal the unsalted join —
    pinned by tests/test_skew.py.

  * ``two_phase_agg`` — pre-aggregate on (key, salt) map-side-ish, then
    re-aggregate on key.  For algebraic aggregates (sum/count/min/max) the
    regrouping is exact.  Spark's own hash aggregate already does partial
    aggregation, so this is for the skewed-DISTINCT / high-cardinality-state
    shapes where the partial agg alone doesn't tame the hot key.

Salts use ``rand(seed)`` — deterministic per seed for replayability.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, seed: int = 42, col_name: str = "__salt") -> DataFrame:
    """Uniform random salt in [0, n_salts) per row (deterministic per seed)."""
    return df.withColumn(col_name, (F.rand(seed) * n_salts).cast("int"))


def replicate_salts(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Per-row replication: one copy of every row per salt value."""
    return df.withColumn(
        col_name, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join with the LEFT side's hot keys fanned across ``n_salts`` reducers.

    The right side is replicated n_salts times, so use this when right is
    small-but-not-broadcastable or moderately sized; for genuinely tiny
    right sides just ``F.broadcast`` it instead.

    Only ``inner`` and ``left`` are salt-invariant: under ``right``/``full``
    an unmatched right row would surface once per replica (n_salts copies).
    """
    # normalize Spark's join-type aliases ('left_outer', 'leftouter',
    # case variants) before the guard — they are equally salt-invariant
    norm = how.lower().replace("_", "")
    if norm not in ("inner", "left", "leftouter"):
        raise ValueError(
            "salted_join supports how='inner'|'left'/'left_outer'/'leftouter' "
            f"(case-insensitive) only, got {how!r}: "
            "right/full would emit each unmatched right row n_salts times"
        )
    on = list(on)
    lsalted = with_salt(left, n_salts, seed)
    rsalted = replicate_salts(right, n_salts)
    out = lsalted.join(rsalted, on + ["__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict,
    n_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Skew-resistant grouped aggregation for algebraic functions.

    ``aggs``: {output_col: (input_col, fn)} with fn in sum/count/min/max.
    Phase 1 groups by (keys, salt) — the hot key's rows split n_salts ways;
    phase 2 merges partials by keys (count merges with sum).
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    keys = list(keys)
    salted = with_salt(df, n_salts, seed)
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[phase1_fn[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return p1.groupBy(*keys).agg(
        *[merge_fn[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Z-order (Morton) key: interleave the low ``bits`` bits of two
    non-negative integer columns — bit i of x lands at position 2i, bit i
    of y at 2i+1 — so sorting by the key gives rows locality in BOTH
    dimensions at once.

    This is the multi-dimensional data-skipping layout: files/row-groups
    written in z-key order carry bounded min/max ranges for x AND y, so a
    filter on EITHER column prunes ~sqrt-fashion, where a single-column
    sort prunes only its own column (see the events_zorder_layout catalog
    entry for the measured contrast).  At 100 TB the layout step is
    ``df.repartitionByRange(N, zkey).sortWithinPartitions(zkey)`` before
    the write — a distributed range sort, no global window.

    Pure integer shift/mask expressions (whole-stage codegen, exactly
    replayable in DuckDB with << >> & operators).
    """
    xi = x.cast("long")
    yi = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xi, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yi, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z
