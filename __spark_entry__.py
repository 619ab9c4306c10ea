"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
north-star LLM-pipeline operators as named queries over the driver testdata;
``oracle_sql()`` returns the DuckDB twin for each SQL-expressible one (see
dagger_spark/catalog.py for the pairing conventions: identical aliases,
date_trunc'd timestamps, exact-decimal-width rounding, double-cast dots).

Rows-only entries (no oracle, 11 of 242): the fixture-driven rules engine +
correlation (per-rule DuckDB parity lives in tests/test_rules_engine.py —
the fixture table is not among the driver's DuckDB views), the Pandas-UDF
multimodal stages including the perceptual-hash dedup chain, and the zlib
compression filter.  Everything else is oracle-paired; see README.md and
dagger_spark/catalog.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dagger_spark.catalog import QUERIES, flagship  # noqa: E402

# Driver-window rotation (round 10): the correctness gate verifies the
# FIRST ~50 queries.  Priorities, in order: (1) every oracle-paired query
# that has never earned a driver row — the 10 round-10 additions; (2)
# queries whose implementation changed this round and must re-earn their
# rows — mmr_rerank_embeddings (collision-free string pair keys replace
# the q*1e6+n arithmetic), orders_customer_bucketed_join (scoped planner
# conf + eager bounded collect), ann_ivf_sq8_indexed (ns-mtime
# fingerprint + publish-race verification in ops/ivf_index.py); (3) the
# STALEST rows (round-9 verdict ask #1): priorities 1-2 leave 37 slots,
# spent on all 18 queries whose last green row is round 4 and the 19
# alphabetically-first of the 33 round-5 rows (the remaining 14 queue for
# round 11).  The round this window was authored in: tests/test_rotation.py
# fails the suite if a later round's CORRECTNESS artifact exists without
# the window having been re-authored — the mechanical stall guard.
_WINDOW_ROUND = 10

_DRIVER_WINDOW = [
    # -- (1) never-driver-verified: the 10 round-10 additions --
    "ann_ivf_sq8_appended",      # incremental IVF index append (frozen grid)
    "mmr_rerank_grouped",        # corpus-scale MMR via applyInPandas
    "events_incremental_rollup", # partial-agg merge == full recompute (IVM)
    "events_ewma_anomaly",       # truncated-EWMA burst/dropoff monitor
    "padding_waste_docs",        # length-bucketed batching efficiency
    "langid_confusion_docs",     # lang-id confusion vs declared lang
    "dedup_method_agreement_docs",  # pair-set agreement across dedup methods
    "sq8_residual_error_embeddings",  # residual-vs-raw SQ8 error gauge
    "minhash_delta_pairs_docs",  # delta-vs-corpus LSH candidate pairs
    "bm25_incremental_stats_docs",  # state+delta merged retrieval stats
    # -- (2) changed code re-earns its row --
    "mmr_rerank_embeddings",     # collision-free pair keys this round
    "orders_customer_bucketed_join",  # scoped conf + bounded eager collect
    "ann_ivf_sq8_indexed",       # ivf_index fingerprint/publish-race fixes
    # -- (3) stalest rows: last green in round 4 --
    "events_cohort_retention",
    "events_funnel",
    "events_multires_rollup",
    "jaccard_exact_join",
    "jaccard_pairs_docs",
    "kmeans_step_embeddings",
    "mixture_sample_docs",
    "pii_scan_docs",
    "q18_large_orders",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "repetition_docs",
    "semdedup_embeddings",
    "simhash_docs",
    "substring_dedup_docs",
    "text_stats_docs",
    "tfidf_top_terms",
    "window_funcs_showcase",
    # -- (3) stalest rows: last green in round 5 (alphabetically first 19
    #    of 33; the remaining 14 queue for round 11) --
    "classifier_calibration_docs",
    "cube_orders",
    "customer_hierarchy",
    "events_alert_debounce",
    "events_burst_exact",
    "events_burst_sliding",
    "events_cusum_shift",
    "events_gapfill",
    "events_mad_outliers",
    "events_median_sketch",
    "events_pattern_match",
    "events_pattern_match_sessions",
    "events_rolling_7d",
    "events_seasonal_decompose",
    "events_session_window",
    "events_theilsen_trend",
    "events_winsorized_stats",
    "heavy_hitters_docs",
    "jaccard_zipf_join",
]


def _ordered_queries() -> dict:
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    if missing:  # fail loudly: a typo here would silently shrink the gate
        raise KeyError(f"driver-window names not in catalog: {missing}")
    out = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    for name, q in QUERIES.items():
        if name not in out:
            out[name] = q
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the engine's identity —
    multi-rule detection fan-in (filter + enrich + UNION ALL) over events."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in _ordered_queries().items()
        if q.oracle is not None
    }
