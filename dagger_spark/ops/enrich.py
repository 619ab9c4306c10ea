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

from typing import Callable, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _leveled_best_join(
    events: DataFrame,
    fbg: DataFrame,
    probe_key: "Callable[[int], Column]",
    payload_cols: Sequence[str],
    payload_types: Sequence,
    pick: str,
    out_field: str,
    out_col: str,
    out_type: str,
    broadcast_feed: bool = True,
) -> DataFrame:
    """The shared probe scaffold of the three leveled enrichment joins
    (CIDR longest-prefix, range narrowest-span, domain deepest-zone).

    ``fbg`` is the checkpointed per-level slice frame ``(__l, __t, __m)``
    — one min-struct candidate per (level, bucket).  This helper collects
    the bounded level list, handles the empty-feed all-NULL early return,
    runs one LEFT (by default broadcast) join per level on
    ``probe_key(L) == __t``, resolves the winner (``pick='coalesce'``:
    level priority, highest level wins; ``pick='least'``: struct order
    across levels), and surfaces ``out_field`` from the winning struct as
    ``out_col``.  Exactly one output row per input event.
    """
    collide = [
        c for c in events.columns if c == "__t" or c.startswith("__m_")
    ]
    if collide:
        raise ValueError(
            f"event columns collide with probe scratch names: {collide}"
        )
    # Bounded driver-side collect: <= 33 distinct levels (documented
    # literal-class convention, see module docstring).
    lens = sorted(
        (r[0] for r in fbg.select("__l").distinct().collect()), reverse=True
    )
    if not lens:  # empty/invalid feed: all-NULL payload, one row per event
        return events.select(
            *events.columns,
            *[
                F.lit(None).cast(t).alias(c)
                for c, t in zip(payload_cols, payload_types)
            ],
            F.lit(None).cast(out_type).alias(out_col),
        )
    out = events
    for L in lens:
        slice_l = (
            fbg.filter(F.col("__l") == L)
            .select("__t", F.col("__m").alias(f"__m_{L}"))
        )
        if broadcast_feed:
            slice_l = F.broadcast(slice_l)
        out = out.join(slice_l, probe_key(L) == F.col("__t"), "left").drop(
            "__t"
        )
    cols = [F.col(f"__m_{L}") for L in lens]
    if pick == "coalesce":
        best = F.coalesce(*cols)
    else:  # least() skips NULLs (unmatched levels) — all-NULL stays NULL
        best = F.least(*cols) if len(cols) > 1 else cols[0]
    return out.select(
        *events.columns,
        *[best[c].alias(c) for c in payload_cols],
        best[out_field].alias(out_col),
    )


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
    # ONE feed-side pass builds every (length, truncated-prefix) slice; the
    # payload travels as ONE struct (non-NULL for every feed row) so the
    # length-descending coalesce below picks a matched ROW atomically — a
    # matched row whose individual field is NULL must surface that NULL,
    # not fall through to a shorter prefix's value (same trick as
    # ops/asof.py's __r struct).  A feed listing the same /L network twice
    # must not duplicate event rows: min(struct) keeps exactly one,
    # DETERMINISTICALLY (lexicographic struct order — an upgrade over the
    # arbitrary-row dropDuplicates pick).  localCheckpoint materializes the
    # tiny frame (feed side only — events may be a streaming DataFrame) so
    # the per-length probe slices and the lens collect are filters over it,
    # not 1 + #lens recomputations of the feed lineage.
    L = F.col(len_col)
    # shiftrightunsigned over LONG on both sides: Java's int >>> masks the
    # shift amount mod 32, so an IntegerType ip/prefix column shifted by
    # 32 (the /0 default-route level) would be a NO-OP instead of 0 — the
    # catch-all entry would then match only ip == prefix.  Long >>>
    # masks mod 64, so shift-by-32 of any value < 2^32 is exactly 0.
    fbg = (
        feed.filter(L.isNotNull() & (L >= 0) & (L <= 32))
        .select(
            L.cast("int").alias("__l"),
            F.call_function(
                "shiftrightunsigned",
                F.col(prefix_col).cast("long"),
                F.lit(32) - L.cast("int"),
            ).alias("__t"),
            F.struct(
                L.cast("int").alias("__len"),
                *[F.col(c) for c in payload_cols],
            ).alias("__m"),
        )
        .groupBy("__l", "__t")
        .agg(F.min("__m").alias("__m"))
        .localCheckpoint(eager=True)
    )
    return _leveled_best_join(
        events,
        fbg,
        lambda L: F.shiftrightunsigned(F.col(ip_col).cast("long"), 32 - L),
        payload_cols,
        [feed.schema[c].dataType for c in payload_cols],
        pick="coalesce",
        out_field="__len",
        out_col=out_len_col,
        out_type="int",
    )


# --- arbitrary [start, end] range feeds (geo-IP / ASN allocations) ---------
#
# Real allocation feeds (geo-IP, RIR delegations, ASN blocks) are arbitrary
# inclusive integer ranges, NOT CIDR-aligned.  The classic distributed range
# join (bin both sides to fixed-width buckets, join on bucket, re-filter)
# forces a bucket-width trade-off: one width cannot serve both a /0-sized
# default route and single-address sinkholes.  Instead we make the feed
# multi-resolution: every range decomposes into its <= 62 MAXIMAL ALIGNED
# CIDR blocks (the textbook decomposition — greedily take the largest
# aligned block starting at the cursor), so each block registers at its OWN
# resolution and `ip_range_join` probes once per distinct block length
# (<= 33 broadcast joins, same bounded literal-class convention as
# cidr_lpm_join).  A block is fully contained in its source range, so a
# block hit IS a range hit — no residual start/end re-filter.
#
# Unlike longest-prefix-wins, overlapping RANGES resolve by NARROWEST RANGE
# (smallest span): a /25-block of a wide RIR allocation must lose to a
# /24-block of a narrower VPN range.  Because a level-L block covers
# exactly its bucket, every candidate in a bucket matches every event
# hashing there — so each (level, bucket) keeps only its MINIMUM
# (span, start, payload) struct, the probe joins stay one-to-one, and the
# winner is least() over the per-level structs.  The event side is never
# shuffled and never fanned out; the broadcast holds one struct per bucket
# however dense the feed.


def range_to_blocks(
    start: int, end: int, length_step: int = 1
) -> List[Tuple[int, int]]:
    """Decompose inclusive IPv4 range [start, end] into maximal aligned
    CIDR blocks.  Returns [(truncated_prefix, prefix_len)] where
    ``truncated_prefix = block_address >> (32 - prefix_len)``; empty when
    the range is invalid (start > end or outside [0, 2^32)).

    Greedy: the block at the cursor is the largest power-of-two size that
    is both alignment-permitted (``cur & -cur``) and fits in the remaining
    span.  <= 62 blocks for any range; exactly partitions [start, end].

    ``length_step`` > 1 snaps every block length UP to the next multiple
    of the step, capped at 32 (splitting the block into <= 2^(step-1)
    sub-blocks), so the feed occupies at most ``2 + 32//step`` distinct
    lengths (the multiples of the step in range, plus 32, plus 0 for a
    full-space block) — trading a bounded feed-size blow-up for a hard
    cap on `ip_range_join`'s probe-join count.
    """
    if start is None or end is None or start > end or start < 0:
        return []
    if end >= 1 << 32:
        return []
    blocks: List[Tuple[int, int]] = []
    cur = int(start)
    end = int(end)
    while cur <= end:
        size = cur & -cur if cur else 1 << 32
        while size > end - cur + 1:
            size >>= 1
        plen = 33 - size.bit_length()  # size == 2^(32 - plen)
        q = min(32, -(-plen // length_step) * length_step)
        base = cur >> (32 - q) if q else 0
        blocks.extend((base + i, q) for i in range(1 << (q - plen)))
        cur += size
    return blocks


def decompose_ranges_np(starts, ends, length_step: int = 1):
    """Vectorized `range_to_blocks` over row arrays — the Arrow-batch hot
    path (a 100k-range feed decomposes into millions of blocks; the pure
    Python loop builds them one tuple at a time, ~30x slower).

    Returns ``(row_idx, trunc, plen)`` numpy int64 arrays: one entry per
    emitted block, ``row_idx`` pointing back into the input arrays.
    Exactly equivalent to ``range_to_blocks(s, e, length_step)`` per row
    (pinned by tests/test_enrich.py's randomized equivalence test).
    """
    import numpy as np

    cur = np.asarray(starts, dtype=np.int64).copy()
    end = np.asarray(ends, dtype=np.int64)
    idx = np.arange(len(cur), dtype=np.int64)
    live = (cur >= 0) & (cur <= end) & (end < (1 << 32))
    cur, end, idx = cur[live], end[live], idx[live]
    out_i, out_t, out_l = [], [], []
    while len(cur):
        # largest aligned size at the cursor (cursor 0 -> full space),
        # capped to the largest power of two fitting the remaining span
        align = np.where(cur > 0, cur & -cur, 1 << 32)
        rem = end - cur + 1
        # 2^floor(log2(rem)): exact for rem < 2^53 (here < 2^33)
        fit = np.int64(1) << np.floor(np.log2(rem)).astype(np.int64)
        size = np.minimum(align, fit)
        plen = 32 - np.floor(np.log2(size)).astype(np.int64)
        # quantize UP to the step grid, splitting into 2^(q-plen) sub-blocks
        q = np.minimum(32, -(-plen // length_step) * length_step)
        splits = (np.int64(1) << (q - plen)).astype(np.int64)
        base = np.where(q > 0, cur >> (32 - q).astype(np.int64), 0)
        reps = np.repeat(np.arange(len(cur)), splits)
        # within-row 0..splits-1 counter via the repeat-cumsum trick
        offs = np.arange(len(reps)) - np.repeat(
            np.concatenate(([0], np.cumsum(splits)[:-1])), splits
        )
        out_i.append(idx[reps])
        out_t.append(base[reps] + offs)
        out_l.append(np.repeat(q, splits))
        cur = cur + size
        still = cur <= end
        cur, end, idx = cur[still], end[still], idx[still]
    if not out_i:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return (
        np.concatenate(out_i),
        np.concatenate(out_t),
        np.concatenate(out_l),
    )


def ip_range_join(
    events: DataFrame,
    feed: DataFrame,
    ip_col: str,
    payload_cols: Sequence[str],
    start_col: str = "ip_start",
    end_col: str = "ip_end",
    out_span_col: str = "matched_span",
    length_step: int = 4,
    broadcast_feed: bool = True,
) -> DataFrame:
    """Narrowest-range-wins left join of ``events`` against an interval feed.

    ``events[ip_col]``: IPv4 as a non-negative integer (< 2^32).
    ``feed``: one row per range — inclusive ``[start_col, end_col]`` integer
    bounds plus ``payload_cols``.  Ranges may overlap arbitrarily; the match
    with the smallest span wins, ties broken by (start, payload...) struct
    order — deterministic whenever no two feed rows share (span, start).

    ``length_step`` caps the probe-join count at ``1 + 32/step`` (default
    4 -> at most 9 broadcast joins) by quantizing block lengths to a
    multiple-of-step grid; see `range_to_blocks`.  Step 1 keeps the
    minimal feed expansion but may probe up to 33 levels.

    ``broadcast_feed=False`` drops the broadcast hint for feeds too large
    to ship to every executor (>~1e6 rows): the per-level joins degrade
    gracefully to shuffled hash joins — the event side then shuffles once
    per level, the price of a beyond-broadcast feed.

    Returns all event columns + ``payload_cols`` from the winning range
    (NULL when none) + ``out_span_col`` (the winning range's size in
    addresses, NULL when none).  Exactly one output row per input event.
    """
    from pyspark.sql import types as T

    pay_fields = [
        T.StructField(c, feed.schema[c].dataType) for c in payload_cols
    ]
    block_schema = T.StructType(
        [
            T.StructField("__span", T.LongType()),
            T.StructField("__start", T.LongType()),
            *pay_fields,
            T.StructField("__l", T.IntegerType()),
            T.StructField("__t", T.LongType()),
        ]
    )

    # Arrow-columnar decomposition: decompose_ranges_np does the bit math
    # over whole batches and the payload is carried by a vectorized take —
    # no per-block Python objects anywhere (the array-UDF+explode
    # formulation built millions of tuples for large feeds, ~30x slower).
    def _decompose(batches):
        for pdf in batches:
            s = pdf[start_col].fillna(-1).astype("int64").to_numpy()
            e = pdf[end_col].fillna(-1).astype("int64").to_numpy()
            i, t, ln = decompose_ranges_np(s, e, length_step)
            out = pdf.iloc[i].reset_index(drop=True)
            res = pd.DataFrame(
                {
                    "__span": out[end_col].astype("int64")
                    - out[start_col].astype("int64") + 1,
                    "__start": out[start_col].astype("int64"),
                }
            )
            for c in payload_cols:
                res[c] = out[c]
            res["__l"] = ln.astype("int32")
            res["__t"] = t
            yield res

    fb = feed.select(start_col, end_col, *payload_cols).mapInPandas(
        _decompose, block_schema
    )
    # Candidate struct field order IS the tie-break order: span, start, then
    # payload — struct comparison is lexicographic by field.
    cand = F.struct(
        F.col("__span"), F.col("__start"), *[F.col(c) for c in payload_cols]
    )
    # A level-L block covers EXACTLY its bucket, so every candidate in a
    # bucket matches every event that hashes to the bucket — only the
    # per-(level, bucket) MINIMUM can ever win.  min(struct), not
    # collect_list: the broadcast holds one struct per bucket however dense
    # the feed, and the per-event pick is least() over <= n_levels structs
    # instead of sorting a candidate array (a 100k-range feed was spending
    # its time broadcasting and sorting multi-thousand-entry lists at the
    # coarse levels).  ONE feed-side pass; localCheckpoint materializes it
    # (feed side only — the events side may be a streaming DataFrame) so
    # the per-length probe slices and the lens collect below are filters
    # over it, not 1 + #lens recomputations of the decompose/aggregate
    # lineage.
    fbg = (
        fb.groupBy("__l", "__t")
        .agg(F.min(cand).alias("__m"))
        .localCheckpoint(eager=True)
    )
    return _leveled_best_join(
        events,
        fbg,
        # long-cast: see cidr_lpm_join — int >>> 32 is a no-op, breaking
        # the L=0 full-space block for IntegerType ip columns
        lambda L: F.shiftrightunsigned(F.col(ip_col).cast("long"), 32 - L),
        payload_cols,
        [feed.schema[c].dataType for c in payload_cols],
        pick="least",
        out_field="__span",
        out_col=out_span_col,
        out_type="long",
        broadcast_feed=broadcast_feed,
    )


# --- domain-suffix feeds (DNS blocklists / zone reputation) ----------------
#
# The DNS sibling of cidr_lpm_join: a feed row "ads.example.com" matches the
# exact domain and every subdomain beneath it; overlapping entries resolve
# by MOST LABELS (deepest zone) — the DNS hierarchy's longest-prefix-match,
# read right-to-left.  The same bounded probe discipline applies: one LEFT
# broadcast join per distinct label depth present in the feed (bounded
# driver-side collect — real blocklists run 1-6 labels), the probe key is
# the event domain's last-L-labels suffix (pure split/slice/join
# expressions, codegen'd), the payload travels as an atomic struct, and the
# winner is a depth-descending coalesce.  Zero shuffles, no explode, no
# window on the event side; feed slices are built in one checkpointed pass
# with the same deterministic min(struct) duplicate pick as the LPM join.
#
# Inputs are assumed normalized (lowercase, no trailing dot) — normalize at
# ingest, not per probe join.


def domain_suffix_join(
    events: DataFrame,
    feed: DataFrame,
    domain_col: str,
    payload_cols: Sequence[str],
    suffix_col: str = "suffix",
    out_labels_col: str = "matched_labels",
) -> DataFrame:
    """Deepest-zone-wins left join of ``events`` against a domain feed.

    ``events[domain_col]``: normalized dotted domain (``a.b.example.com``).
    ``feed``: one row per zone — ``suffix_col`` the zone apex (matched
    exactly or as a ``.``-boundary suffix) plus ``payload_cols``.

    Returns all event columns + ``payload_cols`` from the deepest matching
    zone (NULL when none) + ``out_labels_col`` (the matched zone's label
    count, NULL when none).  Exactly one output row per input event.
    """
    labels = F.size(F.split(F.col(suffix_col), r"\."))
    fbg = (
        feed.filter(F.col(suffix_col).isNotNull() & (F.col(suffix_col) != ""))
        .select(
            labels.alias("__l"),
            F.col(suffix_col).alias("__t"),
            F.struct(
                labels.alias("__n"),
                *[F.col(c) for c in payload_cols],
            ).alias("__m"),
        )
        .groupBy("__l", "__t")
        .agg(F.min("__m").alias("__m"))
        .localCheckpoint(eager=True)
    )
    parts = F.split(F.col(domain_col), r"\.")
    return _leveled_best_join(
        events,
        fbg,
        # last-L-labels probe key; NULL (never-matching) when the domain
        # is shallower than the zone depth
        lambda L: F.when(
            F.size(parts) >= L, F.array_join(F.slice(parts, -L, L), ".")
        ),
        payload_cols,
        [feed.schema[c].dataType for c in payload_cols],
        pick="coalesce",
        out_field="__n",
        out_col=out_labels_col,
        out_type="int",
    )
