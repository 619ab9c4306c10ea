"""Fuzzed-corpus differential testing for the events-family operators.

Randomized event streams salted with the boundary cases that break
time-series semantics across engines: exact session-gap boundaries (the
strict-vs-inclusive 30-min edge), timestamp ties within a user, values
exactly on rule thresholds, error→purchase sequences at equal timestamps
(as-of boundary), and bursts inside one window.  Timestamps are generated
at whole-microsecond resolution and written as parquet TIMESTAMP(NANOS) —
the driver's physical type — so the ns→µs load path is exercised too.
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.check_catalog import normalize  # noqa: E402

from dagger_spark.catalog import QUERIES  # noqa: E402

EVENT_QUERIES = [
    "events_hourly",
    "events_sessionization",
    "events_session_window",
    "events_multires_rollup",
    "events_burst_detection",
    "events_json_stats",
    "events_rules_engine",
    "asof_join_error_purchase",
    "interval_join_events",
    "skew_resistant_agg",
    "events_rolling_7d",
    "events_median_sketch",
    "distinct_twophase",
    "events_cohort_retention",
    "events_cms_counts",
    "events_funnel",
    "events_zorder_layout",
    "events_pattern_match",
    "events_gapfill",
    "events_alert_debounce",
    "events_hll_intersect",
    "events_winsorized_stats",
    # round-3 continuation wave
    "events_rate_anomaly",
    "events_partial_merge",
    "events_decayed_score",
    "events_markov_transitions",
    "events_conversion_lag",
    "trimmed_mean_pandas",
    "events_assoc_rules",
    "events_cusum_shift",
    "events_seasonal_decompose",
    "hll_scratch_events",
    "events_theilsen_trend",
    "events_mad_outliers",
    "events_benford_check",
    "events_wau_stickiness",
    # round 6: exact global percentile_cont on the two-pass rank — the
    # fuzz corpus's 6-decimal values make micro-unit interpolation land
    # on *.5 boundaries, exactly the cross-engine hazard it must survive
    "events_exact_quantiles",
    # round-6 continuation: the fuzz ties/negative values hit exactly the
    # edges these pin — OHLC open/close ties break on event_id, the
    # histogram's floor division must hold for negative cents, and the
    # attribution lookback sees same-timestamp touch/purchase pairs
    "events_attribution",
    "events_ohlc_bars",
    "events_value_histogram",
    "events_sql_udf_rollup",
    "events_hdr_weekly_rollup",
]

_TYPES = ["error", "purchase", "click", "view", "signup"]


def _random_events(seed: int, n: int = 400) -> pd.DataFrame:
    # negative seed = NEGATIVE-MEAN corpus: background values in
    # [-200, 5] so sum(vm) < 0, exercising the floor-vs-truncate edge in
    # integer divisions (cusum's k = floor(mean) with negative mean —
    # DuckDB's bare // truncates toward zero and would diverge)
    neg = seed < 0
    rng = random.Random(abs(seed))
    t0 = datetime(2024, 3, 1)
    rows = []

    def add(ts, user, etype, value, k):
        rows.append(
            (len(rows), ts, user, etype, value, json.dumps({"k": k}))
        )

    # background traffic
    lo, hi = (-200, 5) if neg else (-5, 200)
    for i in range(n - 60):
        ts = t0 + timedelta(
            seconds=rng.randint(0, 3 * 86400), microseconds=rng.randint(0, 999999)
        )
        # every 5th value keeps FULL 6-decimal precision: vm = round(v*1e6)
        # is then odd-capable, so percentile interpolation can land on *.5
        # medians/MADs — the exact case where a bare double->BIGINT cast
        # diverges across engines (events_mad_outliers pins floor())
        v = rng.uniform(lo, hi)
        add(ts, rng.randint(1, 8), rng.choice(_TYPES),
            round(v, 6) if i % 5 == 0 else round(v, 2),
            rng.choice([1, 2, 10, 15, 91, 100]))
    # exact 30-minute session-gap boundaries (strict-merge edge) + just-under
    base = t0 + timedelta(hours=50)
    for i, gap in enumerate([1800, 1800, 1799, 1801]):
        add(base, 20 + i, "click", 1.0, 1)
        add(base + timedelta(seconds=gap), 20 + i, "click", 2.0, 2)
    # timestamp ties within one user (order must break by event_id)
    tie = t0 + timedelta(hours=60)
    for _ in range(4):
        add(tie, 30, "view", 3.0, 10)
    # threshold-exact rule values
    for v in (150.0, 150.01, 149.99, 10.0, 9.99):
        add(t0 + timedelta(hours=61, seconds=len(rows)), 31, "error", v, 1)
        add(t0 + timedelta(hours=62, seconds=len(rows)), 31, "purchase", v, 15)
    # error→purchase as-of sequences incl. equal-timestamp boundary
    a = t0 + timedelta(hours=70)
    add(a, 40, "error", 50.0, 2)
    add(a, 40, "purchase", 60.0, 2)           # same instant
    add(a + timedelta(seconds=1), 40, "purchase", 61.0, 2)
    add(a + timedelta(minutes=9), 41, "error", 50.0, 2)
    add(a + timedelta(minutes=14), 41, "purchase", 70.0, 2)  # 300s bound edge
    # a burst: 5 errors for one user inside one hour
    b = t0 + timedelta(hours=80)
    for i in range(5):
        add(b + timedelta(minutes=i * 7), 50, "error", 5.0, 91)
    # NULL handling parity: NULL values (aggregates must skip identically)
    # and NULL user_ids (grouping/windows treat NULL as one key in both
    # engines; equi-joins drop it in both)
    c = t0 + timedelta(hours=90)
    add(c, 60, "purchase", None, 2)
    add(c + timedelta(seconds=30), 60, "purchase", None, 3)
    add(c + timedelta(minutes=1), 60, "purchase", 12.5, 4)
    add(c + timedelta(minutes=1, seconds=30), None, "purchase", 99.0, 2)
    add(c + timedelta(minutes=2), None, "error", 44.0, 91)
    add(c + timedelta(minutes=3), None, "click", None, 1)

    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    return df.sample(frac=1.0, random_state=abs(seed)).reset_index(drop=True)


@pytest.fixture(scope="module", params=[11, 4242, -77])
def fuzz_events_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzzevents{request.param}")
    pdf = _random_events(request.param)
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("ns")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        os.path.join(str(d), "events.parquet"),
    )
    # the shared-SQL query path registers views for every testdata table;
    # satisfy the non-events ones with symlinks to the smallest real sf dir
    for t in ("region nation customer supplier part orders lineitem "
              "documents embeddings").split():
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet",
            os.path.join(str(d), f"{t}.parquet"),
        )
    return str(d)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_query_matches_oracle_on_fuzzed_stream(spark, fuzz_events_dir, name):
    q = QUERIES[name]
    sdf = q.fn(spark, fuzz_events_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{fuzz_events_dir}/events.parquet')"
    )
    ddf = con.execute(q.oracle).fetchdf()
    a, b = normalize(sdf), normalize(ddf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} spark vs {len(b)} duckdb rows"
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        raise AssertionError(
            f"{name}: {int(neq.sum())}/{len(a)} rows differ\n"
            + str(pd.concat([a[neq].head(3), b[neq].head(3)], keys=["spark", "duck"]))
        )
