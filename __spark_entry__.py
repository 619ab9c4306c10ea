"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
north-star LLM-pipeline operators as named queries over the driver testdata;
``oracle_sql()`` returns the DuckDB twin for each SQL-expressible one (see
dagger_spark/catalog.py for the pairing conventions: identical aliases,
date_trunc'd timestamps, exact-decimal-width rounding, double-cast dots).

Rows-only entries (no oracle, 11 of 232): the fixture-driven rules engine +
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

# Driver-window rotation (round 9): the correctness gate verifies the FIRST
# ~50 queries.  Priorities, in order: (1) every oracle-paired query that
# has never earned a driver row — the 7 round-9 additions; (2) queries
# whose implementation changed this round and must re-earn their rows —
# novelty_docs (string shingles now hashed to 60-bit ints pre-shuffle in
# BOTH engines); (3) the 7 family anchors; (4) the STALEST rows (round-8
# verdict ask #3): priorities 1-3 leave 35 slots, spent on the 25 queries
# whose only green rows date from round 2 (TPC-H tails, early event
# analytics, set ops) plus the 10 oldest round-4 rows — shared helpers
# under all of them have moved twice since (catalog split, round-6 rank
# rewrite).  The round this window was authored in: tests/test_rotation.py
# fails the suite if a later round's CORRECTNESS artifact exists without
# the window having been re-authored — the mechanical stall guard.
_WINDOW_ROUND = 9

_DRIVER_WINDOW = [
    # -- (1) never-driver-verified: the 7 round-9 additions --
    "ann_ivf_sq8_indexed",       # materialized IVF+SQ8 index, DPP-pruned
    "mmr_rerank_embeddings",     # MMR diversified reranking
    "power_iteration_embeddings",# covariance-free power iteration
    "lsh_blocking_quality_docs", # LSH blocking reduction/completeness
    "mixture_temperature_docs",  # share^0.7 mixture rebalancing
    "embedding_outliers",        # centroid-distance z-score outliers
    "key_skew_report_events",    # shuffle-key skew diagnostics (Gini)
    "orders_customer_bucketed_join",  # exchange/sort-free bucketed join
    "ann_ndcg_embeddings",       # nDCG@5 + MRR over the ANN ladder
    "dedup_impact_docs",         # per-source dedup token accounting
    "events_zorder_scan",        # materialized z-order, measured skip
    "conformal_coverage_docs",   # split-conformal coverage gauge
    # -- (2) changed code re-earns its row --
    "novelty_docs",              # shingles hashed pre-shuffle this round
    # -- (3) anchors (one per load-bearing family) --
    "q1_pricing_summary",        # TPC-H aggregate
    "q9_profit_by_nation",       # multi-way join
    "events_rules_engine",       # SIEM rule fan-in (the reference's core)
    "events_burst_detection",    # timeframe rules (reference's skipped gap)
    "exact_dedup_docs",          # exact dedup
    "minhash_pairs_docs",        # MinHash+LSH
    "events_exact_quantiles",    # ops/rank two-pass exact quantiles
    # -- (4) stalest rows: last green in round 2 --
    "distinct_agg",
    "distinct_twophase",
    "events_approx_distinct",
    "events_hourly",
    "events_json_stats",
    "grouped_stats_pandas",
    "orders_rollup",
    "percentile_prices",
    "pivot_returnflag_qty",
    "q10_returned_items",
    "q11_important_nations",
    "q12_late_shipments",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_part_suppliers",
    "q4_priority_check",
    "q5_region_volume",
    "q7_nation_trade",
    "revenue_moving_avg",
    "scalar_funcs_showcase",
    "set_except",
    "set_intersect",
    # -- (4) stalest rows: last green in round 4 --
    "anti_join_no_orders",
    "bloom_decontam_docs",
    "correlated_subquery",
    "decontam_docs",
    "embedding_neardup",
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
