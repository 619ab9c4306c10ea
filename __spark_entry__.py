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

# Driver-window rotation (round 13 — pure freshness from here; curation
# completed in round 12 with the floor at round 7).  Priorities, in
# order: (1) never-driver-verified oracle-paired additions — the two
# round-13 entries (the IVF cell-skew gauge and the hot-cell split probe,
# verdict ask #6); (2) changed code re-earns its row — the whole IVF
# index family (ops/ivf_index.py moved onto the versioned-manifest
# pointer protocol: file-level postings manifest, exactly-once streaming
# watermarks, manifest-drained tombstones, split tree — verdict ask #1)
# and the dedup-state trio (auto-compaction in the mutation path, shared
# ops/manifest refactor, the _apply_once seq-race fix — verdict ask #2 +
# advice r12); (3) the STALEST rows by last-green round: all 19 remaining
# round-7 rows (retiring that cohort), then the 21 alphabetically-first
# round-8 rows (the remaining 21 r8 rows queue for round 14).
# tests/test_rotation.py fails the suite if a later round's CORRECTNESS
# artifact exists without the window having been re-authored — the
# mechanical stall guard.
_WINDOW_ROUND = 13

_DRIVER_WINDOW = [
    # -- (1) never-driver-verified: the 2 round-13 additions --
    "ivf_cell_sizes_embeddings",  # postings-cell skew gauge (ask #6)
    "ann_ivf_sq8_split",          # hot-cell split probe, oracle verbatim
    # -- (2) changed code re-earns its row --
    "ann_ivf_sq8_indexed",        # manifest-resolved probe path
    "ann_ivf_sq8_appended",       # append -> staged files + pointer swing
    "ann_ivf_sq8_deleted",        # tombstones in the manifest
    "ann_ivf_sq8_filtered",       # shared probe path
    "ann_ivf_sq8_refined",        # shared probe path
    "dedup_state_clusters_docs",  # auto-compact + _apply_once + manifest
    "dedup_state_pairs_docs",     # shared ops/manifest refactor
    "dedup_state_retire_docs",    # retire leg auto-compact param
    # -- (3) stalest: all 19 remaining round-7 rows (cohort retired) --
    "events_value_histogram",
    "fingerprint_docs",
    "html_strip_docs",
    "hybrid_rrf_docs",
    "keywords_per_doc",
    "label_prop_docs",
    "language_id_docs",
    "language_id_ngram_docs",
    "line_scrub_docs",
    "lineitem_hdr_quantiles",
    "normalize_docs",
    "orders_pit_priority",
    "orders_skyline",
    "part_basket_pairs",
    "phrase_search_docs",
    "sentences_docs",
    "token_counts_docs",
    "trimmed_mean_pandas",
    "window_rank_showcase",
    # -- (3) stalest: last green in round 8 (alphabetically first 21 of
    #    42; the remaining 21 queue for round 14) --
    "ann_brute_force",
    "ann_ivf",
    "ann_ivf_sq8",
    "ann_lsh",
    "ann_pq_adc",
    "ann_recall",
    "asof_join_error_purchase",
    "bm25_topk_docs",
    "bpe_encode_docs",
    "chi2_tokens_docs",
    "classifier_auc_docs",
    "classifier_kappa_docs",
    "curriculum_stages_docs",
    "customer_abc_analysis",
    "dsir_weights_docs",
    "events_cms_counts",
    "events_hll_rollup",
    "events_psi_drift_windows",
    "events_sigma_corr_cooccur",
    "events_sigma_corr_counts",
    "events_sigma_corr_distinct",
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
