"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
north-star LLM-pipeline operators as named queries over the driver testdata;
``oracle_sql()`` returns the DuckDB twin for each SQL-expressible one (see
dagger_spark/catalog.py for the pairing conventions: identical aliases,
date_trunc'd timestamps, exact-decimal-width rounding, double-cast dots).

Rows-only entries (no oracle, 11 of 220): the fixture-driven rules engine +
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

# Driver-window rotation (round 8): the correctness gate verifies the FIRST
# ~50 queries.  Round 7 completed full oracle-paired driver coverage of the
# catalog that existed then, so windows are now free rotation PLUS the
# standing priorities, in order: (1) every oracle-paired query that has
# never earned a driver row — the 9 round-7 additions (replay-green at
# sf0.01 in both the builder's and the judge's runs; round-7 verdict ask
# #2) and the 12 round-8 additions; (2) queries whose implementation changed
# this round and must re-earn their rows — the four Sigma correlation types
# (the aliases feature reworked compile_correlation's shared pair/count
# paths) and chi2_tokens_docs (the int64-overflow double-cast rewrote its
# expression tree in both engines); (3) the 7 family anchors; (4) free
# rotation across families whose driver rows date from the earliest rounds
# (ANN ladder, graph, sketches, rank, enrichment, quality, TPC-H tails).
# The round this window was authored in: tests/test_rotation.py fails the
# suite if a later round's CORRECTNESS artifact exists without the window
# having been re-authored — the mechanical stall guard.
_WINDOW_ROUND = 8

_DRIVER_WINDOW = [
    # -- (1) never-driver-verified: the 9 round-7 additions --
    "l_diversity_docs",          # privacy triad: l-diversity
    "t_closeness_docs",          # privacy triad: t-closeness
    "orders_woe_binning",        # WOE/IV decile binning
    "kmv_distinct_events",       # KMV distinct sketch + merge rollup
    "kmv_source_overlap_docs",   # KMV pairwise set-op estimates
    "dsir_weights_docs",         # DSIR importance weights
    "maxsim_retrieval_docs",     # MaxSim late-interaction retrieval
    "sq8_error_embeddings",      # int8 scalar quantization error
    "chi2_tokens_docs",          # chi-square token selection (+ overflow fix)
    # -- (1) never-driver-verified: the 12 round-8 additions --
    "classifier_auc_docs",       # exact ROC-AUC via rank-sum
    "pmi_collocations_docs",     # PMI bigram collocations
    "source_kl_divergence_docs", # per-source KL vs corpus blend
    "matryoshka_recall_embeddings",  # prefix-dim retrieval recall
    "label_centroid_sim_embeddings", # centroid cosine matrix
    "novelty_docs",              # per-doc n-gram novelty
    "classifier_kappa_docs",     # Cohen's kappa between quality raters
    "hard_negatives_embeddings", # contrastive hard-negative mining
    "source_dup_matrix_docs",    # cross-source near-dup matrix
    "fertility_by_lang_docs",    # tokenizer fertility audit
    "events_psi_drift_windows",  # windowed PSI vs frozen reference
    "ann_ivf_sq8",               # IVF over int8-quantized corpus
    # -- (2) changed code re-earns its row (aliases rework shares these
    #    compile paths; batch semantics unchanged by design) --
    "events_sigma_corr_counts",  # Sigma correlation: event_count
    "events_sigma_corr_distinct",# Sigma correlation: value_count
    "events_sigma_corr_temporal",# Sigma correlation: temporal_ordered
    "events_sigma_corr_cooccur", # Sigma correlation: temporal 3+ rules
    # -- (3) anchors (one per load-bearing family) --
    "q1_pricing_summary",        # TPC-H aggregate
    "q9_profit_by_nation",       # multi-way join
    "events_rules_engine",       # SIEM rule fan-in (the reference's core)
    "events_burst_detection",    # timeframe rules (reference's skipped gap)
    "exact_dedup_docs",          # exact dedup
    "minhash_pairs_docs",        # MinHash+LSH
    "events_exact_quantiles",    # ops/rank two-pass exact quantiles
    # -- (4) free rotation: families whose rows date from rounds 1-2 --
    "ann_brute_force",           # exact cosine top-k
    "ann_lsh",                   # sign-LSH bucketed ANN
    "ann_ivf",                   # IVF partition-pruned ANN
    "ann_pq_adc",                # product-quantization ADC
    "ann_recall",                # ANN recall gauge
    "pagerank_docs",             # distributed Pregel PageRank
    "triangle_count_docs",       # triangle counting
    "kcore_docs",                # k-core decomposition
    "events_hll_rollup",         # HLL sketch rollup
    "events_cms_counts",         # count-min sketch
    "hll_scratch_events",        # from-scratch HLL
    "customer_abc_analysis",     # Pareto ABC on global_cumsum
    "curriculum_stages_docs",    # curriculum staging on global ranks
    "asof_join_error_purchase",  # as-of join
    "interval_join_events",      # interval join
    "gopher_quality_docs",       # Gopher quality gates
    "bm25_topk_docs",            # BM25 retrieval
    "bpe_encode_docs",           # BPE tokenizer apply
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
