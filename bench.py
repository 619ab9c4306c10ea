#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "suite_wall_sec", "value": <total>, "unit": "sec",
   "queries": {"q1_pricing_summary": <sec>, ...}, "sf": <sf>}

Included workloads: the TPC-H-ish analytics suite, the streaming-shaped
events queries, the LLM-pipeline operators (dedup/minhash/simhash/ANN), and
the reference workload itself — all 25 active detection rules evaluated
single-pass over 256k synthesized sysmon events (reported as seconds like
the rest; the events/s figure is value-derivable).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# Workloads with a named reason NOT to bench (empty today — every catalog
# entry is measured; an entry here must say why, and the reason lands in
# bench_full.json so the gap is visible, never silent)
BENCH_EXCLUDED: dict = {}

# Hand-ORDERED prefix: preserves the measured suite order (cache-sharing
# adjacencies like minhash_pairs -> jaccard_pairs, and round-over-round
# first-run comparability).  This is an ordering artifact, NOT the
# coverage list: the bench list is DERIVED from the catalog (round-12
# verdict ask #3) — every catalog entry not in this prefix and not in
# BENCH_EXCLUDED is appended in registration order, so a new entry can
# never silently drop out of measurement.
_ORDERED_PREFIX = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "q6_forecast_revenue",
    "q7_nation_trade",
    "q9_profit_by_nation",
    "q8_market_share",
    "q10_returned_items",
    "q12_late_shipments",
    "q13_order_distribution",
    "q19_disjunctive_revenue",
    "q21_waiting_supplier",
    "revenue_moving_avg",
    "q18_large_orders",
    "top_customers_per_nation",
    "orders_rollup",
    "correlated_subquery",
    "events_hourly",
    "events_sessionization",
    "events_session_window",
    "events_multires_rollup",
    "skew_resistant_agg",
    "events_rules_engine",
    "events_json_stats",
    "tfidf_top_terms",
    "kmeans_step_embeddings",
    "exact_dedup_docs",
    "minhash_pairs_docs",
    "jaccard_pairs_docs",
    "simhash_docs",
    "simhash_neardup",
    "ann_brute_force",
    "ann_lsh",
    "ann_ivf",
    "embedding_neardup",
    "gopher_quality_docs",
    "repetition_docs",
    "pii_scan_docs",
    "chunk_docs",
    "decontam_docs",
    "semdedup_embeddings",
    "ann_pq_adc",
    "substring_dedup_docs",
    "mixture_sample_docs",
    "normalize_docs",
    "events_cohort_retention",
    "events_cms_counts",
    "bloom_decontam_docs",
    "events_funnel",
    "ann_recall",
    "events_zorder_layout",
    "sentences_docs",
    "jaccard_exact_join",
    # round-3 additions
    "events_burst_sliding",
    "events_burst_exact",
    "jaccard_zipf_join",
    "multimodal_pixels",
    "chunk_dedup_docs",
    "bm25_topk_docs",
    "dedup_canonical_docs",
    "weighted_sample_docs",
    "heavy_hitters_docs",
    "token_entropy_docs",
    "pack_sequences_docs",
    "incremental_dedup_docs",
    "pipeline_verdict_docs",
    "quality_classifier_docs",
    "unigram_logprob_docs",
    "winnowing_docs",
    "ann_rp",
    "bpe_pair_counts_docs",
    "html_strip_docs",
    "profile_documents",
    "multimodal_audio",
    "phrase_search_docs",
    "corpus_diff_docs",
    "multimodal_frames",
    "sysmon_rules_correlated",
    "multimodal_video_pixels",
    "dq_checks_orders",
    "scd2_customer_priority",
    "pagerank_docs",
    "events_pattern_match",
    "events_gapfill",
    "events_alert_debounce",
    "contrastive_triplets",
    "customer_hierarchy",
    "events_hll_intersect",
    "events_winsorized_stats",
    "quality_policy_docs",
    "classifier_calibration_docs",
    # round-3 continuation wave
    "bpe_encode_docs",
    "line_scrub_docs",
    "cdc_chunk_docs",
    "merge_upsert_orders",
    "unpivot_lineitem_metrics",
    "bigram_logprob_docs",
    "events_rate_anomaly",
    "events_partial_merge",
    "events_decayed_score",
    "editdist_neardup_docs",
    "triangle_count_docs",
    "events_markov_transitions",
    "events_conversion_lag",
    "k_anonymity_docs",
    "containment_pairs_docs",
    "trimmed_mean_pandas",
    "zipf_slope_docs",
    "multimodal_phash",
    "lsh_recall_docs",
    "kcore_docs",
    "events_assoc_rules",
    "events_cusum_shift",
    "keywords_per_doc",
    "events_seasonal_decompose",
    "quantile_normalize_docs",
    "hll_scratch_events",
    "compress_ratio_docs",
    "events_theilsen_trend",
    "multimodal_phash_clusters",
    "window_rank_showcase",
    "events_mad_outliers",
    "events_benford_check",
    "customer_abc_analysis",
    "events_wau_stickiness",
    "customer_rfm_segments",
    "part_basket_pairs",
    # round-5/6 additions
    "events_pattern_match_sessions",
    "events_exact_quantiles",
    "curriculum_stages_docs",
    "customer_frequency_ranks",
    "events_sigma_corr_counts",
    "events_sigma_corr_temporal",
    "events_sigma_corr_distinct",
    "events_sigma_corr_cooccur",
    "corpus_shuffle_shards",
    "drift_psi_docs",
    "events_cidr_enrich",
    "events_ip_range_enrich",
    "events_domain_enrich",
    "lineitem_hdr_quantiles",
    "events_hdr_weekly_rollup",
    "events_attribution",
    "events_ohlc_bars",
    "events_value_histogram",
    "corpus_merkle_diff",
    "cluster_split_docs",
    "label_prop_docs",
    "embedding_norms_arrow",
    "events_sql_udf_rollup",
    "orders_pit_priority",
    "events_ab_test",
    "hybrid_rrf_docs",
    "orders_skyline",
    # round-7 additions
    "l_diversity_docs",
    "orders_woe_binning",
    "kmv_distinct_events",
    "dsir_weights_docs",
    "maxsim_retrieval_docs",
    "sq8_error_embeddings",
    "t_closeness_docs",
    "kmv_source_overlap_docs",
    "chi2_tokens_docs",
    # round-8 additions
    "classifier_auc_docs",
    "pmi_collocations_docs",
    "source_kl_divergence_docs",
    "matryoshka_recall_embeddings",
    "label_centroid_sim_embeddings",
    "novelty_docs",
    "classifier_kappa_docs",
    "hard_negatives_embeddings",
    "source_dup_matrix_docs",
    "fertility_by_lang_docs",
    "events_psi_drift_windows",
    "ann_ivf_sq8",
    # round-9 additions
    "ann_ivf_sq8_indexed",
    "mmr_rerank_embeddings",
    "power_iteration_embeddings",
    "lsh_blocking_quality_docs",
    "mixture_temperature_docs",
    "embedding_outliers",
    "key_skew_report_events",
    "orders_customer_bucketed_join",
    "ann_ndcg_embeddings",
    "dedup_impact_docs",
    "events_zorder_scan",
    "conformal_coverage_docs",
    # round-10 additions
    "ann_ivf_sq8_appended",
    "mmr_rerank_grouped",
    "events_incremental_rollup",
    "events_ewma_anomaly",
    "padding_waste_docs",
    "langid_confusion_docs",
    "dedup_method_agreement_docs",
    "sq8_residual_error_embeddings",
    "minhash_delta_pairs_docs",
    "bm25_incremental_stats_docs",
    # round-11 additions (the DELETE arm of the lifecycle + retrieval ops)
    "ann_ivf_sq8_deleted",
    "minhash_retire_pairs_docs",
    "dedup_retire_clusters_docs",
    "dedup_append_clusters_docs",
    "events_retire_rollup",
    "bm25_retire_stats_docs",
    "ann_filtered_topk_embeddings",
    "ann_ivf_sq8_filtered",
    "ann_ivf_sq8_refined",
    "sq8_grid_staleness_embeddings",
    # round-12 additions: the dedup state AT REST — what these bench is
    # the maintained READ path (state built + mutated once per corpus
    # fingerprint; the mutations' ∝-delta cost is tools/dedup_probe.py)
    "dedup_state_clusters_docs",
    "dedup_state_pairs_docs",
    "dedup_state_retire_docs",
]


def _headline() -> list:
    """The derived bench list: hand-ordered prefix + every remaining
    catalog entry (registration order) minus the named exclusions.
    Asserts full coverage so a catalog/bench drift fails loudly."""
    from dagger_spark.catalog import QUERIES

    seen = set(_ORDERED_PREFIX)
    missing = [n for n in _ORDERED_PREFIX if n not in QUERIES]
    if missing:
        raise KeyError(f"bench prefix names not in catalog: {missing}")
    out = list(_ORDERED_PREFIX) + [
        n for n in QUERIES
        if n not in seen and n not in BENCH_EXCLUDED
    ]
    uncovered = set(QUERIES) - set(out) - set(BENCH_EXCLUDED)
    assert not uncovered, f"catalog entries neither benched nor excluded: {uncovered}"
    return out

SYSMON_BENCH_ROWS = 2_560_000

# Scan-split tuning for LOCAL bench scale: the sf0.1 parquet files are all
# under 11 MB, so Spark's default 128 MB maxPartitionBytes reads every table
# as ONE partition and the whole suite runs single-core scans.  1 MB splits
# engage all cores (lineitem -> ~11 tasks, sysmon 24 MB -> ~24).  At the
# 100 TB design point files are row-group-sized properly and the 128 MB
# default is correct — this knob compensates for miniature test files, it is
# not the production setting.
SPLIT_CONF = {
    "spark.sql.files.maxPartitionBytes": os.environ.get(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", str(1024 * 1024)
    ),
    "spark.sql.files.openCostInBytes": str(64 * 1024),
}


def _sysmon_bench_path() -> str:
    """Synthesize (once) a large sysmon parquet by tiling the deterministic
    fixture table; cached under /tmp keyed by row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"/tmp/dagger_bench_sysmon_{SYSMON_BENCH_ROWS}.parquet"
    if not os.path.exists(path):
        from dagger_spark.fixtures import sysmon_arrow_table

        base = sysmon_arrow_table(2000, seed=42)
        reps = SYSMON_BENCH_ROWS // base.num_rows
        # small row groups keep the single file splittable across all cores
        pq.write_table(pa.concat_tables([base] * reps), path, row_group_size=8192)
    return path


STREAM_FILES = 64
# 64 files x 40k rows, 32 per trigger -> 2 micro-batches, each one exact
# 32-core wave of right-sized tasks.  Round-5 profiling
# (recentProgress.durationMs) found the whole 0.48x batch-vs-stream gap was
# FIXED cost, two kinds: (a) ~400 ms per micro-batch beside addBatch
# (getBatch/listing ~180, latestOffset ~45, queryPlanning ~60,
# walCommit+commitOffsets ~75) times FOUR batches under the old 256f/64pt
# shape, and (b) per-TASK overhead on 128 tiny 10k-row tasks per batch —
# while steady-state addBatch per-row cost already matched batch mode.
# 2 batches x 32 tasks of 40k rows measured 1.03M ev/s on the first timed
# run (batch parity, alerts identical); two batches are kept deliberately so
# the timed leg still exercises a real offset-log advance between
# micro-batches.  The Kafka equivalent is sizing maxOffsetsPerTrigger (and
# topic partition count) to the consumer's sustainable batch, exactly what
# a throughput deployment does.
STREAM_FILES_PER_TRIGGER = 32


def _sysmon_stream_dir() -> str:
    """Directory of 64 parquet files (40k rows each) for micro-batch replay.
    32 files per trigger -> 2 micro-batches, each one full 32-core wave —
    the file-source stand-in for a partitioned Kafka topic (one task per
    partition per batch).  A single big file per trigger would run each
    micro-batch on ONE core (file-stream sources don't split files);
    conversely many tiny files (the old 256x10k layout) drown the batch in
    per-task overhead — 128 x 10k-row tasks cost ~0.7 s/batch more than
    32 x 40k-row tasks for identical row counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = f"/tmp/dagger_bench_sysmon_stream_{SYSMON_BENCH_ROWS}_{STREAM_FILES}f"
    done = os.path.join(d, "_DONE")
    if not os.path.exists(done):
        from dagger_spark.fixtures import sysmon_arrow_table

        os.makedirs(d, exist_ok=True)
        base = sysmon_arrow_table(2000, seed=42)
        per_file = SYSMON_BENCH_ROWS // STREAM_FILES
        tiled = pa.concat_tables([base] * (per_file // base.num_rows))
        for i in range(STREAM_FILES):
            pq.write_table(tiled, os.path.join(d, f"part-{i:03d}.parquet"),
                           row_group_size=8192)
        open(done, "w").close()
    return d


def _sysmon_stream_dir_sorted() -> str:
    """Time-ordered variant of _sysmon_stream_dir for the EVENT-TIME
    windowed streaming monitors (PSI / HDR quantiles): each file is a
    consecutive timestamp slice, so micro-batch replay advances the
    watermark monotonically and append-mode windows actually close.  The
    unsorted dir (every file spanning the full day) models a
    partitioned-by-key topic and would mark ~all rows late after the
    first micro-batch; this one models time-bucketed object-store drops —
    the layout an event-time monitor replay assumes."""
    import pyarrow.parquet as pq

    d = f"/tmp/dagger_bench_sysmon_streamts_{SYSMON_BENCH_ROWS}_{STREAM_FILES}f"
    done = os.path.join(d, "_DONE")
    if not os.path.exists(done):
        os.makedirs(d, exist_ok=True)
        tbl = pq.read_table(_sysmon_bench_path()).sort_by("timestamp")
        per_file = tbl.num_rows // STREAM_FILES
        for i in range(STREAM_FILES):
            pq.write_table(
                tbl.slice(i * per_file, per_file),
                os.path.join(d, f"part-{i:03d}.parquet"),
                row_group_size=8192,
            )
        open(done, "w").close()
    return d


def main() -> None:
    from dagger_spark.catalog import QUERIES
    from dagger_spark.rules.builtin import active_rules
    from dagger_spark.rules.engine import apply_rules_single_pass
    from dagger_spark.session import get_spark

    spark = get_spark(
        "dagger_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf=SPLIT_CONF,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    # machine-noise gauges (round-4 lesson: the driver's bench ran under
    # concurrent load and recorded a phantom 30% regression — BENCH_r04 215 s
    # vs 165 s idle on the identical tree).  loadavg at start/end plus a
    # fixed CPU-bound calibration job timed before and after the suite make
    # contamination diagnosable from the artifact alone: high loadavg or
    # calibration drift >> 1x means the suite numbers are load-inflated,
    # not code regressions.
    def _calibrate() -> float:
        t0 = time.perf_counter()
        spark.range(400_000_000).selectExpr(
            "count(if(id % 7 = 0, id, null)) AS c"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    loadavg_start = [round(x, 2) for x in os.getloadavg()]
    # MEASUREMENT FIX (round 14, documented in OPTIMIZATION_r14.md): the
    # first calibration run in a fresh JVM measures JIT compilation of the
    # generated loop, not the machine — same box, minutes apart: 1.28-1.42s
    # cold vs 0.24-0.43s warm.  That skew sat above the 1.0s gate and
    # refused idle captures (and was misread as the host CPU cap).  Run the
    # job once untimed so calibration_start/end are BOTH warm-JIT machine
    # gauges and comparable to each other; the cold first run is kept in
    # the artifact as calibration_cold_sec (the old semantics).
    calib_cold = _calibrate()
    calib_start = min(_calibrate(), _calibrate())
    # warm parquet footers + file listings so the first timed query measures
    # its own plan/execution, not one-time session I/O bootstrap
    from dagger_spark.sources.files import ALL_TABLES, load_table

    for t in ALL_TABLES:
        load_table(spark, SF_DIR, t).schema

    # media fixtures: the multimodal catalog fns read deterministic blob
    # parquet materialized once per machine (catalog._media_fixture).
    # Building a query's plan triggers that one-time write, so touch each
    # media query here, BEFORE the timed loop — run-1 timings then measure
    # decode work against stored blobs, exactly like every parquet workload
    # reads pre-existing testdata.  (BENCH_r06's media numbers folded
    # per-run fixture synthesis into every timed run — a ~4x overstatement
    # that made real regressions in this family undetectable.)
    for name in (
        "multimodal_pixels", "multimodal_audio", "multimodal_frames",
        "multimodal_video_pixels", "multimodal_phash",
        "multimodal_phash_clusters", "multimodal_meta",
        "multimodal_features",
    ):
        QUERIES[name].fn(spark, SF_DIR)

    # stateful fixtures: same measurement principle as the media block
    # above (round 13, guide §1.4).  These entries read a state/layout
    # materialized ONCE per machine + corpus fingerprint (dedup state
    # dirs, the IVF+SQ8 index, the z-order/x-order written layouts, the
    # bucketed warehouse, the Zipf fixture corpus) — the operator under
    # measurement is the maintained READ/mutation path, the state is its
    # input.  On a machine with a fresh /tmp the one-time builds
    # (~60-90 s total) otherwise land inside run 1 of each entry and
    # inflate the first-run suite total with fixture synthesis that is
    # not the query's work; best-of-N was never affected.  Touching each
    # fn here builds the fixtures before the timed loop.  clearCache
    # between touches mirrors the timed loop's cache discipline.
    for name in (
        "dedup_state_clusters_docs", "dedup_state_pairs_docs",
        "dedup_state_retire_docs",
        "ann_ivf_sq8_indexed", "ann_ivf_sq8_appended",
        "ann_ivf_sq8_deleted", "ann_ivf_sq8_filtered",
        "ann_ivf_sq8_refined", "ann_ivf_sq8_split",
        "ivf_cell_sizes_embeddings",
        "events_zorder_scan", "jaccard_zipf_join",
        "orders_customer_bucketed_join", "sysmon_rules_correlated",
    ):
        QUERIES[name].fn(spark, SF_DIR)
        spark.catalog.clearCache()

    timings: dict = {}
    best: dict = {}
    spread: dict = {}
    # Each query runs N_RUNS times (default 3, round-7 verdict: with
    # best-of-2 the observed 15% run-to-run swing could hide a real 2x
    # regression in a 1-second query).  "queries" keeps the FIRST run — the
    # same accounting as earlier rounds, so suite totals stay comparable —
    # while "queries_best" carries min-of-runs and "queries_spread" the
    # max-min gap: first-run numbers embed whatever JIT/page-cache state
    # the suite order left behind, so round-over-round regression detection
    # should diff the best numbers and treat any query whose spread rivals
    # its best as noise-dominated rather than regressed.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # minhash_pairs + jaccard_pairs deliberately share ONE persisted
    # signature stage (catalog._dedup_stage — tokenize/shingle/md5/min-fold
    # the corpus once, the real-pipeline shape), so the cache survives
    # between those two; minhash_pairs' timing carries the stage build.
    no_clear_after = {"minhash_pairs_docs"}
    headline = _headline()
    for name in headline:
        q = QUERIES[name]
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            rows = q.fn(spark, SF_DIR).collect()
            runs.append(round(time.perf_counter() - t0, 3))
            del rows
        timings[name] = runs[0]
        best[name] = min(runs)
        spread[name] = round(max(runs) - min(runs), 3)
        # the LSH/dedup pipelines persist intermediates for within-query
        # reuse; their blocks are dead once the query is collected — drop
        # them so storage memory doesn't accumulate across the suite
        if name not in no_clear_after:
            spark.catalog.clearCache()

    # reference workload: 25 rules x 2.56M events, single-pass engine
    sysmon = spark.read.parquet(_sysmon_bench_path())
    rules = active_rules()
    leg_runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        n_alerts = apply_rules_single_pass(sysmon, rules).count()
        leg_runs.append(time.perf_counter() - t0)
    dt = leg_runs[0]
    timings["sysmon_rules_2_56m"] = round(dt, 3)
    best["sysmon_rules_2_56m"] = round(min(leg_runs), 3)
    spread["sysmon_rules_2_56m"] = round(max(leg_runs) - min(leg_runs), 3)

    # same workload as a Structured Streaming micro-batch replay (64 files,
    # 32 per trigger -> 2 micro-batches through the identical single-pass
    # pipeline, 32-way parallel within each batch)
    import tempfile

    from dagger_spark.streaming import build_alert_stream, file_stream_events

    stream_alerts = {"n": 0}

    def _count_batch(bdf, _bid):
        stream_alerts["n"] += bdf.count()

    # one-file streaming warmup (untimed): first streaming query per session
    # pays state-store/listener init + streaming-plan codegen (~1-2 s) that
    # the batch side already amortized over the 35 queries above — warm it so
    # the timed run measures the pipeline, not session bootstrap
    import pyarrow.parquet as _pq
    warm_dir = tempfile.mkdtemp(prefix="dagger_bench_warm_")
    for i in range(2):  # 2 files + 1/trigger = 2 warm micro-batches: the
        # second batch is what exercises the offset-log-advance path the
        # timed run hits, and JIT profiling of the rule pipeline needs more
        # than one compilation-triggering batch (measured: the first timed
        # streaming run in a session ran ~40% slower than the fourth)
        _pq.write_table(
            _pq.read_table(_sysmon_bench_path()).slice(i * 10_000, 10_000),
            os.path.join(warm_dir, f"part-{i:03d}.parquet"),
        )
    wq = (
        build_alert_stream(
            file_stream_events(spark, warm_dir, watermark=None,
                               max_files_per_trigger=1),
            active_rules(),
        )
        .writeStream.foreachBatch(lambda b, i: b.count())
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dagger_bench_wck_"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    wq.awaitTermination()

    # best-of-N like every batch leg (round-9 verdict ask #3: the single-run
    # number contradicted tools/stream_adjudicate.py's idle best-of-3 — one
    # methodology, one authoritative events/s figure)
    stream_runs = []
    for ri in range(n_runs):
        run_alerts = {"n": 0}

        def _count_run(bdf, _bid, run_alerts=run_alerts):
            run_alerts["n"] += bdf.count()

        events = file_stream_events(
            spark, _sysmon_stream_dir(), watermark=None,
            max_files_per_trigger=STREAM_FILES_PER_TRIGGER)
        t0 = time.perf_counter()
        q = (
            build_alert_stream(events, rules)
            .writeStream.foreachBatch(_count_run)
            .option("checkpointLocation",
                    tempfile.mkdtemp(prefix="dagger_bench_ckpt_"))
            .outputMode("append")
            # AvailableNow = the idiomatic backlog-replay trigger: drain all
            # available input as micro-batches, then terminate — no idle
            # trigger-scheduling gaps between batches
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        stream_runs.append(round(time.perf_counter() - t0, 3))
        if ri == 0:
            stream_alerts["n"] = run_alerts["n"]
    dt_stream = stream_runs[0]
    timings["sysmon_rules_stream_2_56m"] = dt_stream
    best["sysmon_rules_stream_2_56m"] = min(stream_runs)
    spread["sysmon_rules_stream_2_56m"] = round(
        max(stream_runs) - min(stream_runs), 3
    )

    # CONFIG-MATCHED stream-vs-batch pair (round-10 verdict ask #5): the
    # legs above share the suite's miniature-file SPLIT_CONF, which skews
    # the comparison (the 1 MB split knob exists to parallelize tiny batch
    # fixtures; production runs the 128 MB default).  Re-run BOTH legs
    # under Spark's DEFAULT scan config — the batch side on its single
    # file (6 byte-range splits at default), the stream side on its
    # 64-file fixture (one task per file per micro-batch, the partitioned-
    # topic shape) — and let THIS pair carry the authoritative in-suite
    # ratio, the same methodology tools/stream_adjudicate.py used
    # (best-of-N, idle 1.208x).  Scan confs are runtime-settable; restored
    # right after.
    _scan_defaults = {
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
    }
    _scan_saved = {k: spark.conf.get(k) for k in _scan_defaults}
    for k, v in _scan_defaults.items():
        spark.conf.set(k, v)
    try:
        sysmon_default = spark.read.parquet(_sysmon_bench_path())
        apply_rules_single_pass(sysmon_default, rules).count()  # warm
        mb_runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            mb_alerts = apply_rules_single_pass(sysmon_default, rules).count()
            mb_runs.append(round(time.perf_counter() - t0, 3))
        ms_runs = []
        ms_alerts = {"n": 0}
        for ri in range(n_runs):
            run_n = {"n": 0}

            def _count_m(bdf, _bid, run_n=run_n):
                run_n["n"] += bdf.count()

            ev = file_stream_events(
                spark, _sysmon_stream_dir(), watermark=None,
                max_files_per_trigger=STREAM_FILES_PER_TRIGGER)
            t0 = time.perf_counter()
            mq = (
                build_alert_stream(ev, rules)
                .writeStream.foreachBatch(_count_m)
                .option("checkpointLocation",
                        tempfile.mkdtemp(prefix="dagger_bench_mck_"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            mq.awaitTermination()
            ms_runs.append(round(time.perf_counter() - t0, 3))
            if ri == 0:
                ms_alerts["n"] = run_n["n"]
    finally:
        for k, v in _scan_saved.items():
            spark.conf.set(k, v)
    timings["sysmon_rules_batch_defaultconf_2_56m"] = mb_runs[0]
    best["sysmon_rules_batch_defaultconf_2_56m"] = min(mb_runs)
    spread["sysmon_rules_batch_defaultconf_2_56m"] = round(
        max(mb_runs) - min(mb_runs), 3
    )
    timings["sysmon_rules_stream_defaultconf_2_56m"] = ms_runs[0]
    best["sysmon_rules_stream_defaultconf_2_56m"] = min(ms_runs)
    spread["sysmon_rules_stream_defaultconf_2_56m"] = round(
        max(ms_runs) - min(ms_runs), 3
    )

    # bounded-state streaming distinct-count (round-7 verdict ask #6): the
    # streaming KMV sketch replayed over the SAME 2.56M-event micro-batch
    # layout — distinct TargetImage per computer_name, k=64 longs of state
    # per key regardless of stream cardinality.  Correctness rides along:
    # the last emission per key must equal the batch sketch over the same
    # rows (KMV merge is order-insensitive and lossless).
    from pyspark.sql import functions as F

    from dagger_spark.streaming.stateful import kmv_distinct_stream

    def _kmv_input(df):
        return df.select(
            "computer_name",
            F.col("event_data.TargetImage").alias("target"),
        )

    # untimed warmup: the first applyInPandasWithState query per session
    # pays Python-worker + state-store init the JVM-side legs above never
    # touched
    wk = (
        kmv_distinct_stream(
            _kmv_input(file_stream_events(spark, warm_dir, watermark=None,
                                          max_files_per_trigger=1)),
            "computer_name", "target", k=64,
        )
        .writeStream.foreachBatch(lambda b, i: b.count())
        .option("checkpointLocation",
                tempfile.mkdtemp(prefix="dagger_bench_kmvwck_"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    wk.awaitTermination()

    kmv_latest: dict = {}
    kmv_runs = []
    for kri in range(n_runs):  # best-of-N (round 13: no more single-run legs)
        run_latest: dict = {}

        def _kmv_batch(bdf, _bid, run_latest=run_latest):
            for r in bdf.collect():
                run_latest[r["key"]] = (r["n_kept"], r["kth_min"],
                                        r["est_distinct"])

        t0 = time.perf_counter()
        kq = (
            kmv_distinct_stream(
                _kmv_input(file_stream_events(
                    spark, _sysmon_stream_dir(), watermark=None,
                    max_files_per_trigger=STREAM_FILES_PER_TRIGGER)),
                "computer_name", "target", k=64,
            )
            .writeStream.foreachBatch(_kmv_batch)
            .option("checkpointLocation",
                    tempfile.mkdtemp(prefix="dagger_bench_kmvck_"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        kq.awaitTermination()
        kmv_runs.append(round(time.perf_counter() - t0, 3))
        if kri == 0:
            kmv_latest = run_latest
    dt_kmv = min(kmv_runs)
    timings["kmv_distinct_stream_2_56m"] = kmv_runs[0]
    best["kmv_distinct_stream_2_56m"] = dt_kmv
    spread["kmv_distinct_stream_2_56m"] = round(
        max(kmv_runs) - min(kmv_runs), 3
    )
    kmv_batch_ref = {
        r["key"]: (r["n_kept"], r["kth_min"], r["est_distinct"])
        for r in kmv_distinct_stream(
            _kmv_input(sysmon), "computer_name", "target", k=64
        ).collect()
    }

    # event-time streaming monitors (round-8 additions; round-8 verdict ask
    # #6): windowed PSI drift + HDR quantiles replayed over the TIME-SORTED
    # micro-batch layout (watermark advances monotonically, append windows
    # close).  Metric value = CommandLine length (NULLs fold to bucket 0 —
    # non-process events).  Parity flag: every emitted window row must
    # equal the batch twin's row for that window, with >= 20 of the 24
    # hourly windows emitted (the final window can never close — no event
    # ever passes its end-of-data watermark).
    from dagger_spark.streaming.drift import (
        hdr_quantiles_stream, psi_drift_stream,
    )

    PSI_CUTS = [4.0, 16.0, 40.0, 64.0, 96.0]
    PSI_REF = [400, 300, 500, 400, 250, 150]  # frozen reference histogram

    def _mon_input(df):
        return df.select(
            F.col("timestamp").alias("ts"),
            F.length(F.col("event_data.CommandLine")).cast("double").alias("v"),
        )

    sorted_dir = _sysmon_stream_dir_sorted()
    mon_detail = {}
    for mon_name, build in (
        ("psi", lambda df: psi_drift_stream(
            _mon_input(df), "v", PSI_CUTS, PSI_REF, ts_col="ts",
            window="1 hour")),
        ("hdr", lambda df: hdr_quantiles_stream(
            _mon_input(df), "v", ts_col="ts", window="1 hour")),
    ):
        wm = (
            build(file_stream_events(spark, warm_dir, watermark=None,
                                     max_files_per_trigger=1))
            .writeStream.foreachBatch(lambda b, i: b.count())
            .option("checkpointLocation",
                    tempfile.mkdtemp(prefix=f"dagger_bench_{mon_name}wck_"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        wm.awaitTermination()

        # best-of-N like every other leg (round 13: these two monitors and
        # the KMV leg were the last SINGLE-RUN legs in the suite — one
        # late-capture load spike put a 5.5x outlier into the committed
        # baseline with no spread column to adjudicate it by)
        mon_rows: list = []
        mon_runs = []
        for mri in range(n_runs):
            run_rows: list = []

            def _mon_batch(bdf, _bid, run_rows=run_rows):
                run_rows.extend(tuple(r) for r in bdf.collect())

            t0 = time.perf_counter()
            mq = (
                build(file_stream_events(
                    spark, sorted_dir, watermark=None,
                    max_files_per_trigger=STREAM_FILES_PER_TRIGGER))
                .writeStream.foreachBatch(_mon_batch)
                .option("checkpointLocation",
                        tempfile.mkdtemp(prefix=f"dagger_bench_{mon_name}ck_"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            mq.awaitTermination()
            mon_runs.append(round(time.perf_counter() - t0, 3))
            if mri == 0:
                mon_rows = run_rows
        dt_mon = min(mon_runs)
        timings[f"{mon_name}_stream_2_56m"] = mon_runs[0]
        best[f"{mon_name}_stream_2_56m"] = dt_mon
        spread[f"{mon_name}_stream_2_56m"] = round(
            max(mon_runs) - min(mon_runs), 3
        )
        batch_rows = {
            tuple(r)
            for r in build(spark.read.parquet(_sysmon_bench_path())).collect()
        }
        stream_set = set(mon_rows)
        mon_detail[f"{mon_name}_stream_events_per_sec"] = round(
            SYSMON_BENCH_ROWS / dt_mon
        )
        mon_detail[f"{mon_name}_stream_matches_batch"] = (
            stream_set <= batch_rows and len(stream_set) >= 20
        )
        mon_detail[f"{mon_name}_stream_windows"] = len(stream_set)

    total = round(sum(timings.values()), 3)
    sf = None
    base = os.path.basename(SF_DIR.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass
    calib_end = _calibrate()
    loadavg_end = [round(x, 2) for x in os.getloadavg()]
    detail = {
        "sysmon_rules_events_per_sec": round(
            SYSMON_BENCH_ROWS / min(leg_runs)
        ),
        "sysmon_rules_stream_events_per_sec": round(
            SYSMON_BENCH_ROWS / min(stream_runs)
        ),
        # split-conf pair ratio, kept for round-over-round comparability
        # (the split knob exists to parallelize miniature batch fixtures
        # and skews this pair toward batch)
        "sysmon_rules_stream_vs_batch_splitconf": round(
            min(leg_runs) / min(stream_runs), 3
        ),
        # AUTHORITATIVE in-suite stream-vs-batch ratio: both legs re-run
        # under Spark's DEFAULT scan config (config-matched by
        # construction), best-of-N — the same methodology and result as
        # tools/stream_adjudicate.py's idle adjudication
        "sysmon_stream_vs_batch_matched_conf": round(
            min(mb_runs) / min(ms_runs), 3
        ),
        "stream_methodology": (
            "best-of-%d availableNow replay.  The authoritative ratio is "
            "sysmon_stream_vs_batch_matched_conf: batch and stream legs "
            "both re-run under Spark's default scan config "
            "(sysmon_rules_*_defaultconf_2_56m)" % n_runs
        ),
        "sysmon_alerts": n_alerts,
        "sysmon_stream_alerts": stream_alerts["n"],
        "sysmon_matched_conf_alerts_equal": (
            n_alerts == mb_alerts == ms_alerts["n"] == stream_alerts["n"]
        ),
        "kmv_stream_events_per_sec": round(SYSMON_BENCH_ROWS / dt_kmv),
        "kmv_stream_matches_batch": kmv_latest == kmv_batch_ref,
        "kmv_stream_keys": len(kmv_latest),
        **mon_detail,
        "cpus": CPUS,
        # noise gauges: loadavg counts OTHER processes too (this bench alone
        # keeps 1-min loadavg well under CPUS on an idle box); calibration
        # drift (end/start of the identical fixed job) >> 1 means the
        # machine got busier while the suite ran
        "loadavg_start_1m_5m_15m": loadavg_start,
        "loadavg_end_1m_5m_15m": loadavg_end,
        # calibration_start/end are warm-JIT machine gauges (round 14);
        # calibration_cold keeps the old first-run-in-fresh-JVM number
        "calibration_cold_sec": calib_cold,
        "calibration_start_sec": calib_start,
        "calibration_end_sec": calib_end,
        # media fixtures are pre-materialized to /tmp parquet before the
        # timed loop (see above): multimodal_* numbers time the query only
        "media_fixtures_prematerialized": True,
        # round 13 (guide §1.4): stateful fixtures (dedup state dirs, the
        # IVF+SQ8 index, z-order layouts, bucketed warehouse, Zipf
        # corpus) are likewise pre-materialized untimed — on a fresh /tmp
        # their one-time builds used to land in run 1 of each entry
        # (e.g. dedup_state_clusters_docs first-run 40 s for a 0.35 s
        # read path); best-of-N numbers were never affected
        "stateful_fixtures_prematerialized": True,
        # coverage contract (round-12 verdict ask #3): the bench list is
        # DERIVED from the catalog — every entry is measured unless it
        # appears here with a reason
        "bench_excluded": BENCH_EXCLUDED,
        "bench_catalog_queries": len(headline),
        # accounting: "queries"/"value" keep FIRST-run numbers (comparable
        # to earlier rounds), "queries_best" is min-of-N and
        # "queries_spread" max-min — regression diffs should use best and
        # treat spread-dominated entries as noise (round-7 adjudication:
        # bm25_topk_docs' +1.09 s was first-run state, best-of-3 ~1.1 s)
        "accounting": "first-run in queries/value; diff queries_best; "
                      "spread ~ best means noise-dominated",
    }
    # FULL per-query dicts go to a repo file: the single stdout line with
    # all ~130 queries outgrew the driver's tail-capture window in round 3
    # (BENCH_r03.json recorded "parsed": null), losing the round's official
    # bench artifact.  Stdout carries a compact line — suite wall, counts,
    # throughput detail, and only the TOP-10 slowest queries (~1 KB) — while
    # bench_full.json keeps first-run + best-of-N for every workload so
    # round-over-round regression diffs stay possible.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
    )
    # IDLE GATE on the COMMITTED artifact (round-9 verdict ask #2: the r9
    # bench_full.json was written at loadavg 6.57 against the repo's own
    # idle-only convention, inflating best-of-3 +12% on shared workloads
    # with zero plan changes).  A contended run still prints its stdout
    # line (the driver's capture must never be lost), but refuses to
    # overwrite the repo's regression baseline — mirroring scale_probe's
    # _DONE discipline.  SPARK_GRAFT_BENCH_FORCE_FULL=1 overrides.
    # TWO gates on the committed artifact: loadavg catches co-running
    # processes; the calibration gate (round 13) catches the
    # idle-but-slow failure mode this box exhibits — host-level CPU
    # capping degraded sustained-load evenings to ~half speed with
    # loadavg near zero (calibration_start 0.22-0.33 healthy, 1.3-2.8
    # observed while capped), which poisoned two would-be baselines the
    # loadavg gate happily passed
    max_calib = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_CALIB", "1.0"))
    contended = (
        loadavg_start[0] > 2.0 or calib_start > max_calib
    ) and not os.environ.get("SPARK_GRAFT_BENCH_FORCE_FULL")
    detail["bench_full_written"] = not contended
    if contended:
        detail["bench_full_skipped_reason"] = (
            f"loadavg_start_1m {loadavg_start[0]} (gate 2.0) / "
            f"calibration_start {calib_start}s (gate {max_calib}s) — "
            "contended or CPU-capped run; bench_full.json (the committed "
            "regression baseline) left untouched"
        )
        print(
            f"WARNING: loadavg {loadavg_start[0]} or calibration "
            f"{calib_start}s over gate — NOT overwriting bench_full.json",
            file=sys.stderr,
        )
    else:
        with open(full_path, "w") as f:
            json.dump({
                "metric": "suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_best": best,
                "queries_spread": spread,
                "bench_runs": n_runs,
                "sf": sf,
                "detail": detail,
            }, f, indent=1, sort_keys=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": slowest,       # top-10 slowest; full dict in bench_full.json
        "n_queries": len(timings),
        "bench_runs": n_runs,
        "sf": sf,
        "detail": detail,
        "full": "bench_full.json",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
