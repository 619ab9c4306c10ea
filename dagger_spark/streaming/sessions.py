"""Session-scoped row-pattern matching, batch AND streaming from one
expression tree.

The reference deliberately skips every aggregation-shaped Sigma feature
(sigma-transf/main.py:194-195 drops ``timeframe`` rules), so sequence
detection over sessions is part of the gap this engine fills (SURVEY.md
§2.5-T3).  ``session_pattern_counts`` is the streaming-native form of the
catalog's ``events_pattern_match_sessions`` (driver-verified against its
DuckDB gaps-and-islands oracle): group by ``session_window`` (Spark's
native gap-session operator — INCLUSIVE at the gap boundary, matching the
catalog SQL's ``> INTERVAL`` island break), assemble each session's
ordered event-initial string, and count non-overlapping regex matches.

State per key is O(session) — a session's worth of (ts, id, initial)
structs in the aggregation buffer, garbage-collected once the watermark
passes the session gap — never O(user history); that bound is exactly why
the session form exists beside the whole-history ``events_pattern_match``.

Because every piece (session_window, collect_list, array_sort, regexp)
is engine-agnostic Column algebra, the SAME function evaluates on a batch
DataFrame, which is how the batch==stream test pins the twin without a
second implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_pattern_counts(
    events: DataFrame,
    pattern: str = "vc*p",
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    matched_only: bool = True,
) -> DataFrame:
    """Per (user, gap-session): the ordered event-initial sequence length
    and the count of non-overlapping ``pattern`` matches; sessions with no
    match are dropped (the alert shape) unless ``matched_only=False``.

    Ordering inside a session is (ts, event_id) — the unique tiebreak the
    catalog oracle uses — via array_sort over (ts, id, initial) structs."""
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col),
                        F.col(id_col),
                        F.substring(type_col, 1, 1).alias("i"),
                    )
                )
            ),
            lambda x: x["i"],
        ),
        "",
    )
    agg = (
        events.groupBy(F.col(user_col), F.session_window(ts_col, gap))
        .agg(seq.alias("s"))
    )
    n = F.coalesce(F.regexp_count(F.col("s"), F.lit(pattern)), F.lit(0))
    out = agg.select(
        F.col(user_col),
        F.col("session_window.start").alias("session_start"),
        F.length("s").cast("long").alias("n_events"),
        n.cast("long").alias("n_patterns"),
    )
    return out.filter(F.col("n_patterns") > 0) if matched_only else out


def dynamic_gap_sessions(
    events: DataFrame,
    gaps: dict,
    default_gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Gap-sessions where the quiet-gap is PER EVENT (Spark's dynamic
    ``session_window(ts, gapDuration=Column)``): each event holds its
    session open for its own type's duration, overlapping extensions
    merge.  The SIEM use: an error/alert event keeps the incident
    session alive longer than routine clicks, without a second pass.

    ``gaps`` maps event-type -> interval string; unlisted types get
    ``default_gap``.  Same batch/stream duality as the static-gap form —
    one Column tree, watermarked append mode finalizes a session when
    the watermark clears ITS OWN last gap (pinned batch==stream in
    tests/test_streaming.py).  Returns (user, start, end, n_events)."""
    gap_col = None
    for typ, dur in sorted(gaps.items()):
        cond = F.col(type_col) == typ
        gap_col = (F.when(cond, F.lit(dur)) if gap_col is None
                   else gap_col.when(cond, F.lit(dur)))
    gap_col = (F.lit(default_gap) if gap_col is None
               else gap_col.otherwise(F.lit(default_gap)))
    sw = F.session_window(F.col(ts_col), gap_col)
    return events.groupBy(F.col(user_col), sw.alias("w")).agg(
        F.count(F.lit(1)).alias("n_events")
    ).select(
        user_col,
        F.col("w.start").alias("start"),
        F.col("w.end").alias("end"),
        "n_events",
    )
