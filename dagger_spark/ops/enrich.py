"""Threat-intel enrichment: longest-prefix-match (LPM) CIDR join.

The SIEM enrichment staple the Sigma surface only approximates: the
compiler's ``|cidr`` modifier (sigma/compiler.py:307) matches ONE literal
network by text prefix; real enrichment joins every event IP against a
*feed* of overlapping networks (tor exits, botnet ranges, cloud/CDN
allocations) and keeps the MOST SPECIFIC match — IP-routing semantics
(longest prefix wins), not first-match.

Formulation — zero shuffles on the event side:

1. The feed is small (threat feeds run 1e3–1e7 rows; the per-length
   slices smaller still) → every join is a **broadcast hash join**.
2. A /L network matches ip iff ``ip >> (32-L) == prefix >> (32-L)`` —
   pure integer arithmetic, no string parsing in the hot path.
3. One LEFT broadcast join **per distinct prefix length present in the
   feed** (≤ 33, typically ≤ 8), probing longest-first; the final label is
   ``coalesce(label_L32, label_L24, …)`` — longest-prefix-wins by
   construction, no per-event groupBy/window, no explode fan-out.

The distinct-length list is a driver-side collect of ≤ 33 rows — the same
bounded literal-class convention as IVF centroids (ops/similarity.py) and
the BNLJ build-side invariant (tests/test_plans.py).  Each per-length slice
is deduplicated on the truncated prefix, so the joins are many-to-one and
row-preserving: the output has exactly one row per input event, unmatched
events carry NULLs.  Stateless projections + broadcast joins also make the
op streaming-capable as-is (no watermark needed).

At 100 TB: the event side is never shuffled, never exploded; the feed
broadcasts once per length; the whole chain is one codegen'd map stage.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def cidr_lpm_join(
    events: DataFrame,
    feed: DataFrame,
    ip_col: str,
    payload_cols: Sequence[str],
    prefix_col: str = "prefix_int",
    len_col: str = "prefix_len",
    out_len_col: str = "matched_len",
) -> DataFrame:
    """Longest-prefix-match left join of ``events`` against a CIDR ``feed``.

    ``events[ip_col]``: IPv4 as a non-negative integer (< 2^32).
    ``feed``: one row per network — ``prefix_col`` the network address as an
    integer, ``len_col`` the mask length (0–32), plus ``payload_cols``.

    Returns all event columns + ``payload_cols`` from the most specific
    matching network (NULL when none) + ``out_len_col`` (the matched mask
    length, NULL when none).  Exactly one output row per input event.
    """
    # Bounded driver-side collect: ≤ 33 distinct mask lengths (documented
    # literal-class convention, see module docstring).
    lens = sorted(
        (
            r[0]
            for r in feed.select(len_col).distinct().collect()
            if r[0] is not None and 0 <= r[0] <= 32
        ),
        reverse=True,
    )
    if not lens:  # empty feed: all-NULL payload, still one row per event
        return events.select(
            *events.columns,
            *[
                F.lit(None).cast(feed.schema[c].dataType).alias(c)
                for c in payload_cols
            ],
            F.lit(None).cast("int").alias(out_len_col),
        )
    out = events
    for L in lens:
        # Truncate the feed's network address to L bits and dedup: a feed
        # listing the same /L network twice must not duplicate event rows.
        # The payload travels as ONE struct (non-NULL for every feed row) so
        # the length-descending coalesce below picks a matched ROW atomically
        # — a matched row whose individual field is NULL must surface that
        # NULL, not fall through to a shorter prefix's value (same trick as
        # ops/asof.py's __r struct).
        slice_l = (
            feed.filter(F.col(len_col) == L)
            .select(
                F.shiftrightunsigned(F.col(prefix_col), 32 - L).alias("__t"),
                F.struct(
                    F.lit(L).alias("__len"),
                    *[F.col(c) for c in payload_cols],
                ).alias(f"__m_{L}"),
            )
            .dropDuplicates(["__t"])
        )
        out = out.join(
            F.broadcast(slice_l),
            F.shiftrightunsigned(F.col(ip_col), 32 - L) == F.col("__t"),
            "left",
        ).drop("__t")
    best = F.coalesce(*[F.col(f"__m_{L}") for L in lens])
    return out.select(
        *events.columns,
        *[best[c].alias(c) for c in payload_cols],
        best["__len"].alias(out_len_col),
    )
