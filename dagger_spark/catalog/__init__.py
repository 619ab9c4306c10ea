"""The driver-facing query catalog: every operator exposed as a named query
over the testdata tables, each (where SQL-expressible) paired with an ANSI
SQL twin that DuckDB replays for the differential-correctness gate.

Split into per-family modules in round 7 (the single catalog.py had grown
to 9,7xx lines — 45% of the package); query bodies are verbatim and the
registration order is preserved by the import order below, so QUERIES is
identical before and after (full-catalog oracle replay re-proven).  The
pairing conventions (identical aliases, date_trunc'd timestamps,
exact-decimal rounding, double-cast dots, unique top-k tiebreaks) are
documented in ._base.
"""

from __future__ import annotations

# shared machinery first (defines QUERIES), then the family modules in the
# original single-file registration order — QUERIES insertion order is the
# driver-facing contract
from ._base import *  # noqa: F401,F403
from ._base import QUERIES, CatalogQuery, _load_wide, _shared_sql, register  # noqa: F401
from . import tpch  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import docs  # noqa: F401,E402
from . import embeddings  # noqa: F401,E402
from . import asof  # noqa: F401,E402
from . import rows_only  # noqa: F401,E402
from . import quality  # noqa: F401,E402
from . import wave1  # noqa: F401,E402
from . import wave2  # noqa: F401,E402
from . import round7  # noqa: F401,E402
from . import round8  # noqa: F401,E402
from . import round9  # noqa: F401,E402
from . import round10  # noqa: F401,E402
from . import round11  # noqa: F401,E402
from . import round12  # noqa: F401,E402
from . import round13  # noqa: F401,E402

# names imported from `dagger_spark.catalog` outside the package
from .quality import flagship  # noqa: F401,E402
from .rows_only import _media_fixture  # noqa: F401,E402
from .quality import _pattern_sessions_sql  # noqa: F401,E402
from .wave1 import _BPE_MERGES  # noqa: F401,E402

# ===========================================================================
# Driver-window curation
# ===========================================================================
# The round-robin driver's differential-correctness gate checks exactly the
# FIRST 50 entries of __spark_entry__.queries() in registration order.  Code
# order above groups queries by family for readability, which left the whole
# LLM-data-pipeline family (dedup, ANN, text quality) outside the window for
# two rounds.  Rebuild QUERIES here so the first 50 names form a curated,
# family-balanced sample — TPC-H joins/aggs/windows, event analytics and the
# streaming rules engine, every dedup flavor, the ANN ladder, quality/text
# ops, and the as-of/interval joins — all of them oracle-paired.  The
# remaining queries keep their relative code order after position 50.
_DRIVER_WINDOW = [
    # TPC-H batch analytics (joins, aggs, windows, subqueries)
    "q1_pricing_summary", "q3_shipping_priority", "q6_forecast_revenue",
    "q9_profit_by_nation", "q18_large_orders", "top_customers_per_nation",
    "grouping_sets_orders", "correlated_subquery", "semi_join_high_value",
    "anti_join_no_orders", "window_funcs_showcase", "skew_salted_join",
    # event analytics + streaming-equivalent rules
    "events_multires_rollup", "events_hll_rollup", "events_burst_detection",
    "events_sessionization", "events_rules_engine", "events_cms_counts",
    "events_funnel", "events_cohort_retention", "events_zorder_layout",
    # deduplication family (simhash_neardup's slot now carries the
    # from-scratch HLL so the sketch family has a driver-verified row;
    # simhash_docs still covers the simhash signatures)
    "exact_dedup_docs", "minhash_pairs_docs", "dedup_clusters_docs",
    "jaccard_pairs_docs", "jaccard_exact_join", "substring_dedup_docs",
    "simhash_docs", "hll_scratch_events", "semdedup_embeddings",
    "embedding_neardup",
    # similarity search / embeddings
    "ann_brute_force", "ann_lsh", "ann_ivf", "ann_pq_adc", "ann_recall",
    "kmeans_step_embeddings",
    # text quality / decontamination / mixture — three continuation-wave
    # families enter the window: tokenizer APPLY (bpe_encode), warehouse
    # MERGE, and the graph family (triangle counting); the displaced
    # chunk_docs / language_id_ngram / token_counts remain green in the
    # full local gate
    "gopher_quality_docs", "repetition_docs", "pii_scan_docs",
    "mixture_sample_docs", "bloom_decontam_docs", "decontam_docs",
    "bpe_encode_docs", "text_stats_docs", "merge_upsert_orders",
    "tfidf_top_terms", "triangle_count_docs",
    # custom temporal joins
    "asof_join_error_purchase", "interval_join_events",
]

assert len(_DRIVER_WINDOW) == 50, len(_DRIVER_WINDOW)
_missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
assert not _missing, f"curated names not registered: {_missing}"
_window_set = set(_DRIVER_WINDOW)
_reordered = {n: QUERIES[n] for n in _DRIVER_WINDOW} | {
    n: q for n, q in QUERIES.items() if n not in _window_set
}
QUERIES.clear()
QUERIES.update(_reordered)
