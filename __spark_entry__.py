"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
north-star LLM-pipeline operators as named queries over the driver testdata;
``oracle_sql()`` returns the DuckDB twin for each SQL-expressible one (see
dagger_spark/catalog.py for the pairing conventions: identical aliases,
date_trunc'd timestamps, exact-decimal-width rounding, double-cast dots).

Rows-only entries (no oracle, 11 of 252): the fixture-driven rules engine +
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

# Driver-window rotation (round 11): the correctness gate verifies the
# FIRST ~50 queries.  Priorities, in order: (1) every oracle-paired query
# that has never earned a driver row — the 10 round-11 additions (the
# DELETE/APPEND arms of the index/corpus/cluster lifecycle, filtered and
# refined retrieval, the staleness gauge); (2) queries whose
# implementation changed this round and must re-earn their rows —
# ann_ivf_sq8_appended + ann_ivf_sq8_indexed (ops/ivf_index.py grew the
# tombstone anti-join on the probe path, the dimension-checked staleness
# gate, and crash-safe compaction), events_ewma_anomaly (+1e-9 nudge on
# the top-20 sort key, both engines), dedup_method_agreement_docs and
# sq8_residual_error_embeddings (eager bounded compute + unpersist — the
# advice-r10 cache-leak fixes), mmr_rerank_grouped (short-candidate-list
# guard in the greedy kernel); (3) the STALEST rows (round-10 verdict ask
# #1): all 14 remaining round-5 rows — this retires the round-5 cohort
# entirely — and the 20 alphabetically-first of the 39 round-6 rows (the
# remaining 19 queue for round 12, after which the window is pure
# freshness rotation).  tests/test_rotation.py fails the suite if a later
# round's CORRECTNESS artifact exists without the window having been
# re-authored — the mechanical stall guard.
_WINDOW_ROUND = 11

_DRIVER_WINDOW = [
    # -- (1) never-driver-verified: the 10 round-11 additions --
    "ann_ivf_sq8_deleted",       # tombstone-delete path of the IVF index
    "minhash_retire_pairs_docs", # document retirement of the dedup state
    "dedup_retire_clusters_docs",  # affected-component cluster recompute
    "dedup_append_clusters_docs",  # cluster admission == full recompute
    "events_retire_rollup",      # IVM retraction merge == reduced recompute
    "bm25_retire_stats_docs",    # retrieval-stats retraction
    "ann_filtered_topk_embeddings",  # metadata-filtered vector search
    "ann_ivf_sq8_filtered",      # filtered search from the index alone
    "ann_ivf_sq8_refined",       # two-stage exact re-scoring over index recall
    "sq8_grid_staleness_embeddings", # append-gate rebuild-decision gauge
    # -- (2) changed code re-earns its row --
    "ann_ivf_sq8_appended",      # ivf_index tombstone/gate/compaction changes
    "ann_ivf_sq8_indexed",       # same module, shared probe path
    "events_ewma_anomaly",       # sort-key 1e-9 nudge (advice r10)
    "dedup_method_agreement_docs",   # eager compute + unpersist
    "sq8_residual_error_embeddings", # eager compute + unpersist
    "mmr_rerank_grouped",        # greedy-kernel short-list guard
    # -- (3) stalest rows: the last 14 round-5 rows (cohort retired) --
    "lsh_recall_docs",
    "pipeline_verdict_docs",
    "q13_order_distribution",
    "q21_waiting_supplier",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q8_market_share",
    "scd2_customer_priority",
    "semi_join_high_value",
    "simhash_neardup",
    "skew_salted_join",
    "token_entropy_docs",
    "unigram_logprob_docs",
    "winnowing_docs",
    # -- (3) stalest rows: last green in round 6 (alphabetically first 20
    #    of 39; the remaining 19 queue for round 12) --
    "ann_rp",
    "bpe_pair_counts_docs",
    "cdc_chunk_docs",
    "chunk_dedup_docs",
    "containment_pairs_docs",
    "contrastive_triplets",
    "corpus_diff_docs",
    "customer_rfm_segments",
    "dedup_canonical_docs",
    "dedup_clusters_docs",
    "docs_stratified_sample",
    "dq_checks_orders",
    "editdist_neardup_docs",
    "events_assoc_rules",
    "events_benford_check",
    "events_conversion_lag",
    "events_hll_intersect",
    "events_markov_transitions",
    "events_partial_merge",
    "events_rate_anomaly",
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
