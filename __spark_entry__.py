"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
north-star LLM-pipeline operators as named queries over the driver testdata;
``oracle_sql()`` returns the DuckDB twin for each SQL-expressible one (see
dagger_spark/catalog.py for the pairing conventions: identical aliases,
date_trunc'd timestamps, exact-decimal-width rounding, double-cast dots).

Rows-only entries (no oracle, 11 of 255): the fixture-driven rules engine +
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

# Driver-window rotation (round 12): the correctness gate verifies the
# FIRST ~50 queries.  Priorities, in order: (1) every oracle-paired query
# that has never earned a driver row — the 3 round-12 additions (the
# dedup state AT REST: clusters/pairs read after a one-time admission,
# clusters after a one-time retirement — the maintained read path the
# round-11 stand-ins couldn't bench); (2) queries whose implementation
# changed this round and must re-earn their rows — the IVF-index family
# (ops/ivf_index.py grew the writer lease, the tombstone id-reuse gate,
# delete dedupe, the all-empty compaction guard, and the _oob_expr
# refactor), the rollup pair (+1e-9 nudge on sum_value in both engines,
# advice r11), and lsh_recall_docs (self-contained checkpointed stage +
# single cfg-tagged self-join — the bimodality fix); (3) the STALEST
# rows (round-11 verdict ask #1): all 19 remaining round-6 rows — this
# retires the round-6 cohort entirely, closing window curation — and the
# 20 alphabetically-first of the 39 round-7 rows (the remaining 19 queue
# for round 13; the window is pure freshness rotation from here).
# tests/test_rotation.py fails the suite if a later round's CORRECTNESS
# artifact exists without the window having been re-authored — the
# mechanical stall guard.
_WINDOW_ROUND = 12

_DRIVER_WINDOW = [
    # -- (1) never-driver-verified: the 3 round-12 additions --
    "dedup_state_clusters_docs",  # state-at-rest admission, maintained read
    "dedup_state_pairs_docs",     # pair table: base ∪ deltas, tombstone mask
    "dedup_state_retire_docs",    # state-at-rest retirement (splits)
    # -- (2) changed code re-earns its row --
    "ann_ivf_sq8_indexed",       # ivf_index: lease + gates + oob refactor
    "ann_ivf_sq8_appended",      # append path: id-reuse gate
    "ann_ivf_sq8_deleted",       # delete path: (vec_id, cell) dedupe
    "ann_ivf_sq8_filtered",      # shared probe path
    "ann_ivf_sq8_refined",       # shared probe path
    "events_incremental_rollup", # +1e-9 nudge, both engines (advice r11)
    "events_retire_rollup",      # +1e-9 nudge, both engines (advice r11)
    "lsh_recall_docs",           # bimodality fix: own checkpointed stage
    # -- (3) stalest rows: the last 19 round-6 rows (cohort retired;
    #    window curation complete — pure freshness rotation from r13) --
    "events_sessionization",
    "events_wau_stickiness",
    "events_zorder_layout",
    "grouping_sets_orders",
    "incremental_dedup_docs",
    "k_anonymity_docs",
    "merge_upsert_orders",
    "pack_sequences_docs",
    "profile_documents",
    "quality_classifier_docs",
    "quality_policy_docs",
    "quantile_normalize_docs",
    "simhash_multiprobe",
    "skew_resistant_agg",
    "top_customers_per_nation",
    "training_manifest",
    "unpivot_lineitem_metrics",
    "weighted_sample_docs",
    "zipf_slope_docs",
    # -- (3) stalest rows: last green in round 7 (alphabetically first 20
    #    of 39; the remaining 19 queue for round 13) --
    "array_funcs_docs",
    "bigram_logprob_docs",
    "chunk_docs",
    "cluster_split_docs",
    "corpus_merkle_diff",
    "corpus_shuffle_shards",
    "customer_frequency_ranks",
    "docs_hash_sample",
    "docs_pack_bins",
    "drift_psi_docs",
    "embedding_norms_arrow",
    "events_ab_test",
    "events_attribution",
    "events_cidr_enrich",
    "events_decayed_score",
    "events_domain_enrich",
    "events_hdr_weekly_rollup",
    "events_ip_range_enrich",
    "events_ohlc_bars",
    "events_sql_udf_rollup",
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
