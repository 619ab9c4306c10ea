"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
north-star LLM-pipeline operators as named queries over the driver testdata;
``oracle_sql()`` returns the DuckDB twin for each SQL-expressible one (see
dagger_spark/catalog.py for the pairing conventions: identical aliases,
date_trunc'd timestamps, exact-decimal-width rounding, double-cast dots).

Rows-only entries (no oracle, 11 of 199): the fixture-driven rules engine +
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

# Driver-window rotation (round 6): the correctness gate verifies the FIRST
# ~50 queries.  Round 5's rotation converted 35 never-verified names; the
# union of driver-verified names across r1-r5 is 110 of 173, leaving 52
# oracle-paired queries never driver-checked.  This window keeps 13 family
# anchors, adds zipf_slope_docs + events_zorder_layout as anchors because
# both were REWRITTEN this round onto ops/rank's range-partitioned global
# rank (re-verification of changed code beats re-proving two five-times-green
# joins — semi_join_high_value / skew_salted_join stand down, both r1-r5
# verified and pinned in tests), then 35 of the 52 never-checked names —
# including the other three ops/rank rewrites (quantile_normalize_docs,
# customer_abc_analysis, customer_rfm_segments).  The remaining 17 queue
# first for round 7, which completes full-catalog driver coverage.  The
# rotation-advances invariant is pinned in tests/test_rotation.py.
# The round this window was authored in: tests/test_rotation.py checks the
# rotation against the CORRECTNESS artifacts of STRICTLY EARLIER rounds
# (this round's own artifact lands after the code is frozen), and fails the
# suite if a later round's artifact exists without the window having been
# re-authored — the mechanical stall guard.
_WINDOW_ROUND = 6

_DRIVER_WINDOW = [
    # -- anchors (one per family; two slots given to this round's rewrites) --
    "q1_pricing_summary",        # TPC-H aggregate
    "q9_profit_by_nation",       # multi-way join
    "top_customers_per_nation",  # window functions
    "grouping_sets_orders",      # grouping sets
    "events_rules_engine",       # SIEM rule fan-in (the reference's core)
    "events_burst_detection",    # timeframe rules (reference's skipped gap)
    "events_sessionization",     # gaps-and-islands
    "exact_dedup_docs",          # exact dedup
    "minhash_pairs_docs",        # MinHash+LSH
    "dedup_clusters_docs",       # connected components
    "ann_recall",                # ANN family gauge
    "merge_upsert_orders",       # MERGE
    "asof_join_error_purchase",  # as-of join
    "zipf_slope_docs",           # REWRITTEN r6: rank via ops/rank
    "events_zorder_layout",      # REWRITTEN r6: ntile via ops/rank
    # -- never driver-checked before round 6 --
    "quantile_normalize_docs",   # REWRITTEN r6: pooled rank via ops/rank
    "customer_abc_analysis",     # REWRITTEN r6: cumsum via ops/rank
    "customer_rfm_segments",     # REWRITTEN r6: 3x ntile via ops/rank
    "simhash_multiprobe",        # multiprobe simhash buckets
    "docs_stratified_sample",    # per-source stratified sampling
    "training_manifest",         # manifest aggregation
    "skew_resistant_agg",        # two-level salted aggregate
    "chunk_dedup_docs",          # chunk-level dedup
    "dedup_canonical_docs",      # canonical survivorship
    "weighted_sample_docs",      # weighted sampling (A-ExpJ)
    "pack_sequences_docs",       # sequence packing
    "incremental_dedup_docs",    # incremental (bloom) dedup
    "ann_rp",                    # random-projection ANN
    "bpe_pair_counts_docs",      # BPE pair statistics
    "corpus_diff_docs",          # corpus A/B diff
    "dq_checks_orders",          # data-quality assertion suite
    "quality_policy_docs",       # composable quality policy
    "events_hll_intersect",      # HLL intersection (inclusion-exclusion)
    "contrastive_triplets",      # contrastive triplet mining
    "profile_documents",         # column profiling
    "quality_classifier_docs",   # quality classifier features
    "cdc_chunk_docs",            # content-defined chunking
    "unpivot_lineitem_metrics",  # UNPIVOT
    "events_rate_anomaly",       # rate anomaly detection
    "events_partial_merge",      # mergeable partial aggregates
    "editdist_neardup_docs",     # edit-distance near-dup
    "events_markov_transitions", # Markov transition matrix
    "events_conversion_lag",     # conversion lag distribution
    "k_anonymity_docs",          # k-anonymity audit
    "containment_pairs_docs",    # containment (subset) pairs
    "events_assoc_rules",        # association rules
    "events_benford_check",      # Benford first-digit audit
    "events_wau_stickiness",     # DAU/WAU stickiness
    "events_exact_quantiles",    # NEW r6: exact global percentile_cont
    "curriculum_stages_docs",    # NEW r6: curriculum staging on ops/rank
    # -- the 19 still-unverified names queue first for round 7 --
    "part_basket_pairs", "language_id_ngram_docs",
    "window_rank_showcase", "array_funcs_docs", "sentences_docs",
    "normalize_docs", "docs_hash_sample", "language_id_docs", "chunk_docs",
    "token_counts_docs", "fingerprint_docs", "html_strip_docs",
    "line_scrub_docs", "phrase_search_docs", "keywords_per_doc",
    "bigram_logprob_docs", "events_decayed_score", "docs_pack_bins",
    "trimmed_mean_pandas",
    # -- new in r6, never driver-checked: queue with the r7 tail --
    "events_sigma_corr_counts", "events_sigma_corr_temporal",
    "events_sigma_corr_distinct", "events_sigma_corr_cooccur",
    "corpus_shuffle_shards", "drift_psi_docs", "events_cidr_enrich",
    "events_ip_range_enrich", "lineitem_hdr_quantiles",
    "events_domain_enrich", "events_hdr_weekly_rollup",
    "events_attribution", "events_ohlc_bars", "events_value_histogram",
    "corpus_merkle_diff", "cluster_split_docs", "label_prop_docs",
    "embedding_norms_arrow", "events_sql_udf_rollup",
    "orders_pit_priority", "events_ab_test", "hybrid_rrf_docs",
    "orders_skyline",
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
