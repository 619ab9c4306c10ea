"""Round-10 catalog additions.

Leads with the two round-9 verdict asks that earn new oracle-paired rows:
the INCREMENTAL-APPEND form of the materialized IVF+SQ8 index (ask #6 —
at 100 TB the common index operation is append, not rebuild) and the
CORPUS-SCALE form of MMR reranking (ask #4 — per-query applyInPandas
greedy: one shuffle, zero driver round-trips, state bounded by the
candidate list, the shape a million-query offline batch needs).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._base import (
    CatalogQuery,
    DataFrame,
    F,
    QUERIES,
    SparkSession,
    _load_wide,
    register,
)
from .round8 import _ivf_sq8_oracle
from .round9 import _MMR_K, _MMR_LAM, _MMR_TOP, _mmr_oracle


# ===========================================================================
# Incremental IVF+SQ8 index append (round-9 verdict ask #6)
# ===========================================================================


def _incremental_index(spark: SparkSession, sf_dir: str, n_centroids: int = 16) -> str:
    """Build the base index from the corpus MINUS a held-out delta, then
    APPEND the delta with the frozen grid/centroids — returns an index dir
    whose postings cover the full corpus but were never built in one shot.

    Delta selection keeps the append provably grid-safe: every vector that
    achieves a per-dimension min or max stays in the base (frozen grid ==
    full-corpus grid), as do the centroid seed ids (< n_centroids); the
    delta is the 32 largest remaining ids.  Idempotent per corpus
    fingerprint via the index manifest's op sequence: seq 0 means the
    append has not been applied to this fingerprint's base yet; a racing
    second builder (suite vs bench — advice r12) loses the expect_seq
    compare-and-swap, re-reads the manifest, and treats seq > 0 as
    already-applied instead of failing the run.
    """
    import os

    from ..ops.ivf_index import (
        append_to_sq8_ivf_index,
        build_sq8_ivf_index,
        index_dir_for,
    )
    from ..ops.lease import ConcurrentWriterError, retry_concurrent
    from ..ops.manifest import read_manifest
    from ..sources.files import load_table

    idx = index_dir_for(sf_dir, n_centroids) + "_inc"
    if os.path.exists(os.path.join(idx, "_BUILT")) and (
        read_manifest(idx)["seq"] > 0
    ):
        return idx

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    vals = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("j", "x"),
    )
    stats = vals.groupBy("j").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    ext = [
        r["vec_id"]
        for r in vals.join(F.broadcast(stats), "j")
        .filter((F.col("x") == F.col("mn")) | (F.col("x") == F.col("mx")))
        .select("vec_id")
        .distinct()
        .collect()
    ]  # bounded: <= 2*dim extreme achievers (+rare ties), build-time only
    delta_ids = [
        r["vec_id"]
        for r in emb.select("vec_id")
        .filter(~F.col("vec_id").isin(ext) & (F.col("vec_id") >= n_centroids))
        .orderBy(F.desc("vec_id"))
        .limit(32)
        .collect()
    ]
    base = emb.filter(~F.col("vec_id").isin(delta_ids))
    built = build_sq8_ivf_index(
        spark, sf_dir, n_centroids, corpus=base, tag="inc"
    )
    if read_manifest(built)["seq"] == 0:
        try:
            retry_concurrent(
                lambda: append_to_sq8_ivf_index(
                    spark, built,
                    emb.filter(F.col("vec_id").isin(delta_ids)),
                    expect_seq=0,
                )
            )
        except (ValueError, ConcurrentWriterError):
            # a concurrent run applied the same append between our seq
            # check and the mutation (the CAS refused) — idempotent iff
            # it really landed
            if read_manifest(built)["seq"] == 0:
                raise
    return built


@register(
    "ann_ivf_sq8_appended",
    None,  # oracle attached below: ann_ivf_sq8's composed oracle verbatim
    "The materialized IVF+SQ8 index's INCREMENTAL-APPEND path — the 100 TB "
    "common case (ops/ivf_index.append_to_sq8_ivf_index): new vectors are "
    "SQ8-encoded against the FROZEN per-dimension grid, assigned to the "
    "FROZEN coarse cells (both ride as plan-time literals), and their "
    "codes appended to the cells' postings partitions — cost proportional "
    "to the DELTA, never the corpus, vs the rebuild-only path that "
    "re-quantizes everything.  A grid-staleness gate REFUSES out-of-grid "
    "vectors (their codes would silently distort) — the rebuild signal.  "
    "This entry builds the base index minus a 32-vector delta, appends the "
    "delta, and answers top-k from the stitched index; results are "
    "bit-identical to the full one-shot build (grid kept complete by "
    "holding per-dim extreme achievers in the base — pinned by "
    "tests/test_ivf_index.py) and to ann_ivf_sq8's composed oracle",
)
def ann_ivf_sq8_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.ivf_index import sq8_ivf_topk

    idx = _incremental_index(spark, sf_dir, n_centroids=16)
    return sq8_ivf_topk(spark, idx, k=5, nprobe=2, n_queries=8)


QUERIES["ann_ivf_sq8_appended"] = CatalogQuery(
    QUERIES["ann_ivf_sq8_appended"].fn,
    _ivf_sq8_oracle(),
    QUERIES["ann_ivf_sq8_appended"].description,
)


# ===========================================================================
# Corpus-scale MMR: per-query applyInPandas greedy (round-9 verdict ask #4)
# ===========================================================================

_MMR_GROUPED_SCHEMA = (
    "query_id bigint, mmr_rank int, neighbor_id bigint, mmr_score double"
)


def _mmr_greedy_pdf(pdf):
    """Exact per-query greedy MMR over one query's candidate list.

    Replicates the literal-loop form's arithmetic BIT-FOR-BIT so the two
    forms are interchangeable (parity pinned by test_round10_queries):
    pairwise sims multiply in float32 then accumulate sequentially in
    float64 (Spark's zip_with(x*y) over array<float> + aggregate into a
    double acc), rounding is decimal HALF_UP on the double's shortest repr
    (Spark Round semantics), selection orders by round(raw, 9) desc with
    neighbor_id tiebreak.
    """
    import numpy as np
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    def rnd(x: float, d: int) -> float:
        q = Decimal(1).scaleb(-d)
        return float(Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP))

    pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
    qid = int(pdf["query_id"].iloc[0])
    ids = pdf["neighbor_id"].to_numpy()
    scores = pdf["score"].to_numpy(dtype=np.float64)
    V32 = np.array([np.asarray(v, dtype=np.float32) for v in pdf["vec"]])
    n = len(pdf)

    def seq_sum(prod32: np.ndarray) -> float:
        # float32 elementwise product, then left-to-right float64 fold —
        # cumsum IS sequential accumulation
        return float(np.cumsum(prod32.astype(np.float64))[-1]) if len(prod32) else 0.0

    norms = np.array([np.sqrt(seq_sum(V32[i] * V32[i])) for i in range(n)])
    sims = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            d = norms[i] * norms[j]
            s = rnd(seq_sum(V32[i] * V32[j]) / d, 6) if d > 0 else 0.0
            sims[i, j] = sims[j, i] = s

    lam, mu = _MMR_LAM, 1 - _MMR_LAM
    # round 1: best relevance, neighbor_id tiebreak (ids are sorted asc, so
    # argmax returns the first/lowest id among ties)
    first = int(np.argmax(scores))
    selected = [first]
    out = [(qid, 1, int(ids[first]), rnd(lam * scores[first] + 1e-9, 6))]
    for t in range(2, _MMR_K + 1):
        best, best_key = None, None
        for i in range(n):
            if i in selected:
                continue
            pen = max(sims[i, s] for s in selected)
            raw = lam * scores[i] - mu * pen
            key = (-rnd(raw, 9), int(ids[i]))
            if best_key is None or key < best_key:
                best, best_key, best_raw = i, key, raw
        if best is None:
            # fewer candidates than _MMR_K: selection exhausted — emit the
            # short list rather than appending None (advice r10)
            break
        selected.append(best)
        out.append((qid, t, int(ids[best]), rnd(best_raw + 1e-9, 6)))
    return pd.DataFrame(
        out, columns=["query_id", "mmr_rank", "neighbor_id", "mmr_score"]
    )


@register(
    "mmr_rerank_grouped",
    None,  # generated oracle attached below (shared with the literal-loop)
    "MMR diversified reranking in its CORPUS-SCALE form: after the "
    "distributed relevance retrieval (the same brute_force_topk stage as "
    "mmr_rerank_embeddings), the greedy selection runs per query inside "
    "groupBy(query_id).applyInPandas — one shuffle keyed by query_id, "
    "ZERO driver round-trips, per-group state bounded by the candidate "
    "list (<= 20 vectors), Arrow-batched.  The literal-loop form "
    "(mmr_rerank_embeddings) pays ~8 driver round-trips and isin-literal "
    "growth per query BATCH — right for bounded interactive batches; this "
    "form is flat per query and is what a million-query offline rerank "
    "runs.  Arithmetic is replicated bit-for-bit (float32 products + "
    "sequential float64 accumulation + HALF_UP rounding), so the two "
    "forms return IDENTICAL rows — pinned by parity test and by sharing "
    "the unrolled-CTE oracle",
)
def mmr_rerank_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.similarity import brute_force_topk

    emb = _load_wide(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("embedding").isNotNull())
    queries = corpus.filter(F.col("vec_id") < 8)
    cand = brute_force_topk(corpus, queries, k=_MMR_TOP).select(
        "query_id", "neighbor_id", "score"
    )
    vecs = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vec")
    )
    # broadcast the CANDIDATE side (queries x 20 rows) against the corpus
    # scan — never the corpus
    feats = vecs.join(F.broadcast(cand), "neighbor_id").select(
        "query_id", "neighbor_id", "score", "vec"
    )
    out = feats.groupBy("query_id").applyInPandas(
        _mmr_greedy_pdf, schema=_MMR_GROUPED_SCHEMA
    )
    return out.orderBy("query_id", "mmr_rank")


QUERIES["mmr_rerank_grouped"] = CatalogQuery(
    QUERIES["mmr_rerank_grouped"].fn,
    _mmr_oracle(),
    QUERIES["mmr_rerank_grouped"].description,
)


# ===========================================================================
# Incremental view maintenance: partial-aggregate merge == full recompute
# ===========================================================================


@register(
    "events_incremental_rollup",
    """
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           count(*)::BIGINT             AS n_events,
           round(sum(value) + 1e-9, 2)  AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY hour_start, event_type
    """,
    "Incremental rollup maintenance (the materialized-view pattern every "
    "100 TB warehouse runs): the hourly (hour, event_type) aggregate is "
    "maintained as STATE + DELTA — events split 90/10 by event_id, the "
    "base aggregated once (yesterday's materialized state), the delta "
    "aggregated alone (today's increment), and the two PARTIAL aggregates "
    "merged by a re-aggregation over their union (counts add, sums add — "
    "the algebraic-aggregate property that makes incremental maintenance "
    "exact).  The oracle is the FULL recompute over all events: "
    "increment-then-merge must be indistinguishable from recomputing, "
    "which is precisely the IVM correctness contract.  Scale shape: the "
    "merge re-aggregates STATE-sized input (hours x types), never the "
    "event history",
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.files import load_table

    ev = load_table(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("__sv"),
        )

    state = partial(ev.filter(F.pmod(F.col("event_id"), F.lit(10)) != 0))
    delta = partial(ev.filter(F.pmod(F.col("event_id"), F.lit(10)) == 0))
    return (
        state.unionAll(delta)
        .groupBy("hour_start", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            # +1e-9 nudge (advice r11, applied family-wide): merged partial
            # sums can differ from a direct recompute by a ulp — both
            # engines nudge identically so .xx5 boundaries never flip
            F.round(F.sum("__sv") + F.lit(1e-9), 2).alias("sum_value"),
        )
        .orderBy("hour_start", "event_type")
    )


# ===========================================================================
# EWMA anomaly monitor over hourly event-type series
# ===========================================================================

_EWMA_ALPHA = 0.25  # dyadic: every weight 0.75^i is an EXACT double
_EWMA_LAGS = 16
_EWMA_W = [(1 - _EWMA_ALPHA) ** i for i in range(_EWMA_LAGS)]
_EWMA_NORM = sum(_EWMA_W)  # exact: dyadic rationals on a common 2^-30 grid


def _ewma_sql_expr() -> str:
    terms = " + ".join(
        f"coalesce(lag(cnt, {i + 1}) OVER w, 0) * {w!r}"
        for i, w in enumerate(_EWMA_W)
    )
    return f"({terms}) / {_EWMA_NORM!r}"


@register(
    "events_ewma_anomaly",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_start,
             count(*)::BIGINT AS cnt
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), scored AS (
      SELECT event_type, hour_start, cnt,
             {_ewma_sql_expr()} AS forecast,
             row_number() OVER w AS rn
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_start)
    )
    SELECT event_type, hour_start, cnt AS n_events,
           round(forecast + 1e-9, 6)         AS forecast,
           round(cnt - forecast + 1e-9, 6)   AS deviation
    FROM scored WHERE rn > {_EWMA_LAGS}
    ORDER BY round(abs(cnt - forecast) + 1e-9, 6) DESC, event_type, hour_start
    LIMIT 20
    """,
    "EWMA anomaly monitor (alpha = 0.25) over the hourly per-event-type "
    "count series: forecast_t = truncated-16-lag exponentially weighted "
    "mean of the PRECEDING observations, deviation = actual - forecast; "
    "top-20 absolute deviations.  The classical single-knob burst/dropoff "
    "detector beside the CUSUM/MAD monitors.  Cross-engine exactness by "
    "construction: alpha dyadic -> every weight 0.75^i is an exact "
    "double, count*weight products are exact dyadics on a common 2^-30 "
    "grid, so the 16-term sum is EXACT under any summation order — the "
    "only rounding is the final division.  Scale shape: one keyed "
    "aggregate to hours x types, then a PARTITIONED (by event_type) "
    "16-lag window over the series — never a data-sized or "
    "single-partition window",
)
def events_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.files import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("hour_start")
    forecast = sum(
        (
            F.coalesce(F.lag("cnt", i + 1).over(w), F.lit(0)) * F.lit(wi)
            for i, wi in enumerate(_EWMA_W)
        ),
        start=F.lit(0.0),
    ) / F.lit(_EWMA_NORM)
    scored = hourly.select(
        "event_type",
        "hour_start",
        "cnt",
        forecast.alias("__f"),
        F.row_number().over(w).alias("__rn"),
    ).filter(F.col("__rn") > _EWMA_LAGS)
    return (
        scored.select(
            "event_type",
            "hour_start",
            F.col("cnt").alias("n_events"),
            F.round(F.col("__f") + F.lit(1e-9), 6).alias("forecast"),
            F.round(F.col("cnt") - F.col("__f") + F.lit(1e-9), 6).alias(
                "deviation"
            ),
            # +1e-9 nudge like every other rounded value (advice r10):
            # HALF_UP-on-shortest-repr vs scaled-double rounding can
            # otherwise flip top-20 membership at representation boundaries
            F.round(
                F.abs(F.col("cnt") - F.col("__f")) + F.lit(1e-9), 6
            ).alias("__key"),
        )
        .orderBy(F.desc("__key"), "event_type", "hour_start")
        .limit(20)
        .drop("__key")
    )


# ===========================================================================
# Length-bucketed batching efficiency (padding waste)
# ===========================================================================

_PAD_BATCH = 16


@register(
    "padding_waste_docs",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                  ELSE len(string_split_regex(trim(coalesce(text, '')),
                                              '\\s+')) END::BIGINT AS tok
      FROM documents
    ), naive AS (
      SELECT tok, (row_number() OVER (ORDER BY doc_id) - 1) // {_PAD_BATCH}
               AS batch
      FROM toks
    ), srt AS (
      SELECT tok, (row_number() OVER (ORDER BY tok, doc_id) - 1)
               // {_PAD_BATCH} AS batch
      FROM toks
    ), naive_b AS (
      SELECT sum(max_tok * n)::BIGINT AS padded FROM (
        SELECT max(tok) AS max_tok, count(*) AS n FROM naive GROUP BY batch)
    ), srt_b AS (
      SELECT sum(max_tok * n)::BIGINT AS padded FROM (
        SELECT max(tok) AS max_tok, count(*) AS n FROM srt GROUP BY batch)
    ), tot AS (
      SELECT count(*)::BIGINT AS n_docs, sum(tok)::BIGINT AS total_tokens
      FROM toks
    )
    SELECT n_docs, total_tokens,
           naive_b.padded AS naive_padded,
           srt_b.padded   AS sorted_padded,
           round(CAST(naive_b.padded - total_tokens AS DOUBLE)
                 / naive_b.padded + 1e-9, 6)  AS naive_waste_share,
           round(CAST(srt_b.padded - total_tokens AS DOUBLE)
                 / srt_b.padded + 1e-9, 6)    AS sorted_waste_share,
           round(CAST(naive_b.padded - srt_b.padded AS DOUBLE)
                 / naive_b.padded + 1e-9, 6)  AS savings_share
    FROM tot, naive_b, srt_b
    """,
    f"Length-bucketed batching efficiency — the padding-waste gauge every "
    f"training pipeline consults before fixing its batching strategy: "
    f"docs are grouped into batches of {_PAD_BATCH} either in arrival "
    f"(doc_id) order or sorted by token length; each batch pads to its "
    f"longest member, and the gauge reports total padded tokens, waste "
    f"share for both strategies, and the savings from length-sorting.  "
    f"All token arithmetic is integer (exact cross-engine); the only "
    f"doubles are the three final shares.  Scale shape: the global "
    f"row_numbers run on ops/rank's two-pass range-partitioned primitive "
    f"(one boundary sketch reused across both orderings' buckets), then "
    f"batch-keyed aggregates — no single-partition window",
)
def padding_waste_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.rank import boundaries_for, global_row_number
    from ..ops.text import token_count

    docs = _load_wide(spark, sf_dir, "documents")
    # persist the token counts: the regex tokenization pass is referenced
    # by both orderings' rank passes, the shared boundary sketch, and the
    # totals aggregate — unpersisted, token_count re-runs for each
    # (guide §7.2); the frame is corpus-rows x 2 narrow columns
    toks = docs.select(
        "doc_id", token_count(F.col("text")).alias("tok")
    ).persist()
    # ONE boundary-sketch pass serves both orderings (ops/rank
    # boundaries_for — the description's promise, now structural)
    bnds = boundaries_for(
        toks, {"naive": F.col("doc_id"), "sorted": F.col("tok")}
    )

    def padded_total(df, order_cols, alias, bkey):
        ranked = global_row_number(
            df, order_cols, "__rn",
            part_key=order_cols[0], boundaries=bnds[bkey],
        )
        per_batch = ranked.withColumn(
            "__batch", ((F.col("__rn") - 1) / _PAD_BATCH).cast("long")
        ).groupBy("__batch").agg(
            F.max("tok").alias("__mx"), F.count(F.lit(1)).alias("__n")
        )
        return per_batch.agg(
            F.sum(F.col("__mx") * F.col("__n")).cast("long").alias(alias)
        )

    naive = padded_total(toks, [F.col("doc_id")], "naive_padded", "naive")
    srt = padded_total(
        toks, [F.col("tok"), F.col("doc_id")], "sorted_padded", "sorted"
    )
    tot = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("total_tokens"),
    )
    return (
        tot.crossJoin(F.broadcast(naive))
        .crossJoin(F.broadcast(srt))
        .select(
            "n_docs",
            "total_tokens",
            "naive_padded",
            "sorted_padded",
            F.round(
                (F.col("naive_padded") - F.col("total_tokens")).cast("double")
                / F.col("naive_padded")
                + F.lit(1e-9),
                6,
            ).alias("naive_waste_share"),
            F.round(
                (F.col("sorted_padded") - F.col("total_tokens")).cast("double")
                / F.col("sorted_padded")
                + F.lit(1e-9),
                6,
            ).alias("sorted_waste_share"),
            F.round(
                (F.col("naive_padded") - F.col("sorted_padded")).cast("double")
                / F.col("naive_padded")
                + F.lit(1e-9),
                6,
            ).alias("savings_share"),
        )
    )


# ===========================================================================
# Language-ID confusion matrix vs declared lang
# ===========================================================================


def _langid_confusion_oracle() -> str:
    """Composed from language_id_docs' REGISTERED oracle (the predicted
    label definition cannot drift from the operator this audits)."""
    pred = QUERIES["language_id_docs"].oracle
    return f"""
    WITH pred AS ({pred}),
    joined AS (
      SELECT d.lang AS declared_lang, p.lang_pred
      FROM documents d JOIN pred p ON d.doc_id = p.doc_id
    ), conf AS (
      SELECT declared_lang, lang_pred, count(*)::BIGINT AS n_docs
      FROM joined GROUP BY declared_lang, lang_pred
    ), tot AS (
      SELECT declared_lang, sum(n_docs)::BIGINT AS n_declared
      FROM conf GROUP BY declared_lang
    )
    SELECT c.declared_lang, c.lang_pred, c.n_docs,
           round(CAST(c.n_docs AS DOUBLE) / t.n_declared + 1e-9, 6)
             AS share_of_declared
    FROM conf c JOIN tot t USING (declared_lang)
    ORDER BY declared_lang, lang_pred
    """


@register(
    "langid_confusion_docs",
    None,  # composed oracle attached below
    "Language-ID quality audit: confusion matrix of the stopword-vote "
    "detector's prediction against the corpus's DECLARED lang column, "
    "with each cell's share of its declared language (the per-language "
    "recall diagonal).  The gauge that decides whether lang-id is good "
    "enough to drive mixture weights / per-language dedup at 100 TB — "
    "zh has no stopword profile, so its row pins the detector's honest "
    "'und' fallback rather than a silent wrong guess.  Oracle composed "
    "from language_id_docs' registered oracle, so the predicted-label "
    "definition provably cannot drift from the operator being audited.  "
    "Scale shape: one detector map + two tiny keyed aggregates (langs^2 "
    "rows); the broadcast total join is language-cardinality sized",
)
def langid_confusion_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.text import language_id

    docs = _load_wide(spark, sf_dir, "documents")
    joined = docs.select(
        F.col("lang").alias("declared_lang"),
        language_id(F.col("text")).alias("lang_pred"),
    )
    conf = joined.groupBy("declared_lang", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = conf.groupBy("declared_lang").agg(
        F.sum("n_docs").cast("long").alias("n_declared")
    )
    return (
        conf.join(F.broadcast(tot), "declared_lang")
        .select(
            "declared_lang",
            "lang_pred",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("n_declared")
                + F.lit(1e-9),
                6,
            ).alias("share_of_declared"),
        )
        .orderBy("declared_lang", "lang_pred")
    )


QUERIES["langid_confusion_docs"] = CatalogQuery(
    QUERIES["langid_confusion_docs"].fn,
    _langid_confusion_oracle(),
    QUERIES["langid_confusion_docs"].description,
)


# ===========================================================================
# Dedup-method agreement matrix
# ===========================================================================

_AGREE_METHODS = ("jaccard_pairs_docs", "minhash_pairs_docs", "simhash_neardup")


def _agreement_oracle() -> str:
    """Composed from the three pair-methods' REGISTERED oracles (nested
    CTEs) — the method definitions cannot drift from this gauge."""
    ctes = ", ".join(
        f"m_{m} AS (SELECT id_a, id_b FROM ({QUERIES[m].oracle}))"
        for m in _AGREE_METHODS
    )
    selects = []
    for i, a in enumerate(_AGREE_METHODS):
        for b in _AGREE_METHODS[i + 1 :]:
            selects.append(f"""
      SELECT '{a}' AS method_a, '{b}' AS method_b,
             (SELECT count(*) FROM m_{a})::BIGINT AS n_a,
             (SELECT count(*) FROM m_{b})::BIGINT AS n_b,
             (SELECT count(*) FROM m_{a} x JOIN m_{b} y
                ON x.id_a = y.id_a AND x.id_b = y.id_b)::BIGINT AS n_common
            """)
    union = " UNION ALL ".join(selects)
    return f"""
    WITH {ctes}
    SELECT method_a, method_b, n_a, n_b, n_common,
           round(CAST(n_common AS DOUBLE)
                 / (n_a + n_b - n_common) + 1e-9, 6) AS pair_jaccard
    FROM ({union})
    ORDER BY method_a, method_b
    """


@register(
    "dedup_method_agreement_docs",
    None,  # composed oracle attached below
    "Dedup-method agreement matrix: the three near-dup pair detectors "
    "(exact n-gram Jaccard join, MinHash+LSH, SimHash hamming) compared "
    "pairwise on the pair sets they emit — |A∩B| and Jaccard overlap per "
    "method pair.  The triage gauge a 100 TB dedup deployment reads "
    "before picking its method ladder: high agreement means the cheap "
    "method can gate the expensive one; low agreement means they catch "
    "DIFFERENT duplicate classes and must compose.  Every pair frame is "
    "the method's own registered catalog entry (and the oracle embeds "
    "their registered SQL as CTEs), so this gauge can never drift from "
    "the methods it audits.  Scale shape: pair-set-sized joins and 1-row "
    "aggregates — the corpus is only touched through the methods' own "
    "banded/blocked plans, never all-pairs",
)
def dedup_method_agreement_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = {
        # persist: each pair frame is read by its own count AND two
        # intersection joins — without the cache every read re-runs the
        # whole banded/blocked dedup pipeline behind it (measured at 20x:
        # 6.7x -> ~linear); the cached frames are pair-set sized.  The
        # counts below are computed EAGERLY (9 bounded actions) so the
        # caches can be dropped before returning (advice r10: the lazy
        # form leaked three cached frames into the shared session)
        m: QUERIES[m].fn(spark, sf_dir).select("id_a", "id_b").persist()
        for m in _AGREE_METHODS
    }
    rows = []
    try:
        # overlap the independent jobs (guide §2.6): the three method
        # pipelines are independent until the intersection joins, and
        # each one's tail leaves most cores idle — submitting the three
        # cache-materializing counts from a small thread pool lets the
        # next pipeline's tasks back-fill the current one's stragglers
        # (FIFO scheduling = exactly that back-fill).  Then the three
        # intersection counts, which read only the materialized caches,
        # overlap the same way.  Counts are deterministic, so the result
        # rows are unchanged.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            n = dict(
                zip(
                    _AGREE_METHODS,
                    pool.map(lambda m: frames[m].count(), _AGREE_METHODS),
                )
            )
            combos = [
                (a, b)
                for i, a in enumerate(_AGREE_METHODS)
                for b in _AGREE_METHODS[i + 1 :]
            ]
            ncs = list(
                pool.map(
                    lambda ab: frames[ab[0]]
                    .join(frames[ab[1]], ["id_a", "id_b"])
                    .count(),
                    combos,
                )
            )
        rows = [
            (a, b, n[a], n[b], nc) for (a, b), nc in zip(combos, ncs)
        ]
    finally:
        for f in frames.values():
            f.unpersist()
    lit = spark.createDataFrame(
        rows,
        "method_a string, method_b string, n_a long, n_b long, n_common long",
    )
    # the only double (pair_jaccard) is still rounded Spark-side so the
    # HALF_UP semantics match every other catalog ratio
    return lit.select(
        "method_a",
        "method_b",
        "n_a",
        "n_b",
        "n_common",
        F.round(
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            + F.lit(1e-9),
            6,
        ).alias("pair_jaccard"),
    ).orderBy("method_a", "method_b")


QUERIES["dedup_method_agreement_docs"] = CatalogQuery(
    QUERIES["dedup_method_agreement_docs"].fn,
    _agreement_oracle(),
    QUERIES["dedup_method_agreement_docs"].description,
)


# ===========================================================================
# Residual SQ8: quantize (v - centroid) instead of v — the IVF-PQ insight
# ===========================================================================


@register(
    "sq8_residual_error_embeddings",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ), cents AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), assign AS (
      SELECT e.vec_id, cents.cid,
             round(CASE WHEN sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)) > 0
                        THEN list_dot_product(e.v, cv)
                             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)))
                        ELSE 0.0 END, 9) AS s
      FROM e, cents
    ), cell AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, cid DESC) AS rnk
        FROM assign
      ) WHERE rnk = 1
    ), vals AS (
      SELECT e.vec_id, cell.cell,
             generate_subscripts(e.v, 1) - 1 AS j,
             unnest(e.v) AS x
      FROM e JOIN cell USING (vec_id)
    ), cvals AS (
      SELECT cid, generate_subscripts(cv, 1) - 1 AS j, unnest(cv) AS c
      FROM cents
    ), joined AS (
      SELECT vals.vec_id, vals.j, vals.x, vals.x - cvals.c AS r
      FROM vals JOIN cvals ON vals.cell = cvals.cid AND vals.j = cvals.j
    ), st AS (
      SELECT j, min(x) AS mn_x, max(x) AS mx_x,
                min(r) AS mn_r, max(r) AS mx_r
      FROM joined GROUP BY j
    ), coded AS (
      SELECT joined.*,
             CASE WHEN st.mx_x = st.mn_x THEN 0
                  ELSE CAST(round((x - st.mn_x) * 255.0
                                  / (st.mx_x - st.mn_x)) AS BIGINT)
             END AS code_x,
             CASE WHEN st.mx_r = st.mn_r THEN 0
                  ELSE CAST(round((r - st.mn_r) * 255.0
                                  / (st.mx_r - st.mn_r)) AS BIGINT)
             END AS code_r,
             st.mn_x, st.mx_x, st.mn_r, st.mx_r
      FROM joined JOIN st USING (j)
    ), errs AS (
      SELECT x - (mn_x + code_x * (mx_x - mn_x) / 255.0) AS err_plain,
             r - (mn_r + code_r * (mx_r - mn_r) / 255.0) AS err_resid
      FROM coded
    )
    SELECT 'plain_sq8' AS method, count(*)::BIGINT AS n,
           round(avg(err_plain * err_plain) * 1e6 + 1e-9, 6) AS mse_e6,
           round(max(abs(err_plain)) * 1000 + 1e-9, 6) AS max_abs_err_e3
    FROM errs
    UNION ALL
    SELECT 'residual_sq8', count(*)::BIGINT,
           round(avg(err_resid * err_resid) * 1e6 + 1e-9, 6),
           round(max(abs(err_resid)) * 1000 + 1e-9, 6)
    FROM errs
    ORDER BY method
    """,
    "Residual scalar quantization gauge — production IVF indexes (FAISS "
    "IVF-PQ/IVF-SQ) often quantize the residual (v - nearest_centroid) "
    "instead of the raw vector, betting that residuals concentrate near "
    "zero so the same 256 levels span a narrower range.  This gauge runs "
    "BOTH quantizers over the same corpus/cell assignment (the ann_ivf "
    "ladder's deterministic id<16 centroids, identical argmax-cosine "
    "assignment) and reports MSE and max-abs error side by side — the "
    "DECISION measurement, not an assumption: on this corpus's isotropic "
    "synthetic embeddings the residual grid is measurably WORSE (mse_e6 "
    "~1.01 vs ~0.72 — subtracting a near-independent centroid widens the "
    "per-dim spread by ~sqrt(2)), exactly the honest negative a tuning "
    "pass needs before paying for residual encoding; on clustered "
    "production embeddings the sign flips, and this gauge is how you "
    "know.  Scale shape: one posexplode + centroid-dim broadcast join "
    "(16 x dim rows) + dim-keyed grid stats broadcast back + 1-row error "
    "rollups; centroids ride as plan-time literals exactly like the ANN "
    "ladder",
)
def sq8_residual_error_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.similarity import _cell_of_from_centroids, norm
    from ..sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = [
        (r["vec_id"], list(r["v"]))
        for r in e.filter(F.col("vec_id") < 16).collect()
    ]  # bounded: n_centroids rows (the ANN ladder's plan-time literals)
    cell_of = _cell_of_from_centroids(cents)
    assigned = e.select(
        "vec_id",
        "v",
        cell_of(F.col("v"), norm(F.col("v")), 1)[0]["c"].alias("cell"),
    ).persist()
    # persist: the exploded residual frame below feeds BOTH the grid-stats
    # aggregate and the coding pass, so without the cache the 16-cosine
    # assignment map would run twice over the corpus.  In a production IVF
    # deployment this frame is the index's materialized cell column (built
    # once, at rest) — caching it here is the bounded local stand-in.  The
    # 2-row result is collected EAGERLY at the end of this fn so the cache
    # can be dropped before returning (advice r10: the lazy form leaked the
    # cached corpus into the shared session)
    vals = assigned.select(
        "vec_id", "cell", F.posexplode("v").alias("j", "x")
    )
    cdf = spark.createDataFrame(
        [(cid, j, float(c)) for cid, cv in cents for j, c in enumerate(cv)],
        "cid int, j int, c double",
    )
    # persist the exploded residual frame too: it feeds BOTH the grid-stats
    # aggregate and the coding pass, so without this cache the
    # posexplode + centroid broadcast join runs twice over corpus x dim
    # rows (the assignment persist above only de-duplicated the 16-cosine
    # map, not the explode/join; guide §7.2)
    joined = vals.join(
        F.broadcast(cdf),
        (F.col("cell") == F.col("cid")) & (vals["j"] == cdf["j"]),
    ).select(
        "vec_id", vals["j"].alias("j"), "x",
        (F.col("x") - F.col("c")).alias("r"),
    ).persist()
    st = joined.groupBy("j").agg(
        F.min("x").alias("mn_x"), F.max("x").alias("mx_x"),
        F.min("r").alias("mn_r"), F.max("r").alias("mx_r"),
    )

    def code(v, mn, mx):
        return (
            F.when(mx == mn, F.lit(0))
            .otherwise(F.round((v - mn) * F.lit(255.0) / (mx - mn), 0))
            .cast("long")
        )

    coded = joined.join(F.broadcast(st), "j").select(
        (
            F.col("x")
            - (
                F.col("mn_x")
                + code(F.col("x"), F.col("mn_x"), F.col("mx_x"))
                * (F.col("mx_x") - F.col("mn_x"))
                / F.lit(255.0)
            )
        ).alias("err_plain"),
        (
            F.col("r")
            - (
                F.col("mn_r")
                + code(F.col("r"), F.col("mn_r"), F.col("mx_r"))
                * (F.col("mx_r") - F.col("mn_r"))
                / F.lit(255.0)
            )
        ).alias("err_resid"),
    )

    # ONE aggregation pass computes both methods' stats (a union of two
    # per-method rollups would re-execute the whole explode/join lineage
    # twice — measured at 20x: 7.3x -> ~linear), then the 1-row result
    # explodes into the two method rows
    stats = coded.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("err_plain") * F.col("err_plain")).alias("__msep"),
        F.max(F.abs(F.col("err_plain"))).alias("__maxp"),
        F.avg(F.col("err_resid") * F.col("err_resid")).alias("__mser"),
        F.max(F.abs(F.col("err_resid"))).alias("__maxr"),
    )

    def row(label: str, mse, mx):
        return F.struct(
            F.lit(label).alias("method"),
            F.col("n").alias("n"),
            F.round(mse * F.lit(1e6) + F.lit(1e-9), 6).alias("mse_e6"),
            F.round(mx * F.lit(1000.0) + F.lit(1e-9), 6).alias(
                "max_abs_err_e3"
            ),
        )

    try:
        collected = (
            stats.select(
                F.explode(
                    F.array(
                        row("plain_sq8", F.col("__msep"), F.col("__maxp")),
                        row("residual_sq8", F.col("__mser"), F.col("__maxr")),
                    )
                ).alias("__r")
            )
            .select("__r.*")
            .orderBy("method")
            .collect()
        )  # bounded: exactly 2 method rows
    finally:
        assigned.unpersist()
        joined.unpersist()
    return spark.createDataFrame(
        [tuple(r) for r in collected],
        "method string, n long, mse_e6 double, max_abs_err_e3 double",
    ).orderBy("method")


# ===========================================================================
# Incremental dedup: delta-vs-corpus candidate pairs (the new-slice shape)
# ===========================================================================


def _delta_pairs_oracle() -> str:
    """Composed from the minhash family's shared CTE chain (docs.py's
    _DUCK_MINHASH_CTE — the exact text minhash_pairs_docs' oracle embeds),
    restricted to pairs touching the delta slice."""
    from .docs import _DUCK_MINHASH_CTE

    return (
        _DUCK_MINHASH_CTE
        + """
    SELECT DISTINCT least(l.doc_id, r.doc_id)    AS id_a,
                    greatest(l.doc_id, r.doc_id) AS id_b
    FROM buckets l JOIN buckets r
      ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id <> r.doc_id
    WHERE l.doc_id % 10 = 0
    ORDER BY id_a, id_b
    """
    )


@register(
    "minhash_delta_pairs_docs",
    None,  # composed oracle attached below
    "Incremental near-dup detection — the production arrival shape "
    "(mirrors ann_ivf_sq8_appended on the dedup side): a NEW slice of "
    "documents (doc_id % 10 == 0 here) is checked for near-duplicates "
    "against the existing corpus AND itself by joining only the DELTA's "
    "LSH buckets against the corpus bucket table — never corpus x "
    "corpus.  The join's left side is delta-bucket-sized and the shuffle "
    "key is (band, bucket), so at 100 TB the cost of admitting a slice "
    "is proportional to the slice (the corpus-side bucket table is "
    "maintained at rest, exactly like the IVF postings).  Signatures "
    "come from the family's shared persisted stage — one tokenize/md5 "
    "pass total; pinned equal to the delta-touching subset of "
    "minhash_pairs_docs' full self-join.  Oracle: the registered minhash "
    "CTE chain restricted to delta-touching pairs",
)
def minhash_delta_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.dedup import lsh_buckets
    from .docs import _dedup_stage

    sigs = _dedup_stage(spark, sf_dir)
    buckets = lsh_buckets(sigs, 4, 4)
    delta = buckets.filter(F.pmod(F.col("id"), F.lit(10)) == 0).select(
        F.col("id").alias("__did"),
        F.col("band").alias("__db"),
        F.col("bucket").alias("__dbk"),
    )
    pairs = (
        delta.join(
            buckets,
            (F.col("__db") == F.col("band"))
            & (F.col("__dbk") == F.col("bucket"))
            & (F.col("__did") != F.col("id")),
        )
        .select(
            F.least(F.col("__did"), F.col("id")).alias("id_a"),
            F.greatest(F.col("__did"), F.col("id")).alias("id_b"),
        )
        .distinct()
    )
    return pairs.orderBy("id_a", "id_b")


QUERIES["minhash_delta_pairs_docs"] = CatalogQuery(
    QUERIES["minhash_delta_pairs_docs"].fn,
    _delta_pairs_oracle(),
    QUERIES["minhash_delta_pairs_docs"].description,
)


# ===========================================================================
# Incremental BM25 corpus statistics (state + delta merge == full recompute)
# ===========================================================================


@register(
    "bm25_incremental_stats_docs",
    """
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(coalesce(text, '')) = '' THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(coalesce(text, '')), '\\s+')
             END AS t
      FROM documents
    ), lens AS (
      SELECT doc_id, t, len(t) AS dl FROM toks WHERE len(t) > 0
    ), per AS (
      SELECT term, count(*)::BIGINT AS doc_freq FROM (
        SELECT doc_id, unnest(list_distinct(t)) AS term FROM lens
      ) GROUP BY term
    ), st AS (
      SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM lens
    )
    SELECT term, doc_freq,
           round(ln((n_docs - doc_freq + 0.5) / (doc_freq + 0.5) + 1.0)
                 + 1e-9, 6)                                   AS idf,
           n_docs,
           round(CAST(sum_dl AS DOUBLE) / n_docs + 1e-9, 6)   AS avgdl
    FROM per, st
    ORDER BY doc_freq DESC, term
    LIMIT 20
    """,
    "Incremental maintenance of BM25's corpus statistics (df per term, "
    "N, avgdl) — the retrieval-side twin of events_incremental_rollup: "
    "the corpus splits into STATE (doc_id % 10 != 0) and DELTA, each "
    "side aggregates its own per-term document frequencies and "
    "length/count totals, and the merge is a re-aggregation of the two "
    "partial stat tables (df adds, N adds, sum_dl adds — all algebraic, "
    "so admitting a new slice costs one delta scan plus a "
    "vocabulary-sized merge, never a corpus rescan).  idf/avgdl derive "
    "from the merged stats; oracle is the FULL recompute.  Output: "
    "top-20 document-frequency terms with their BM25 idf and the merged "
    "corpus constants",
)
def bm25_incremental_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.text import tokens

    docs = _load_wide(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id", tokens(F.col("text")).alias("t")
    ).filter(F.size("t") > 0)

    def partials(df: DataFrame):
        per = (
            df.select(
                "doc_id", F.explode(F.array_distinct("t")).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
        )
        st = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size("t")).cast("long").alias("sum_dl"),
        )
        return per, st

    state_per, state_st = partials(
        lens.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    )
    delta_per, delta_st = partials(
        lens.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    )
    per = (
        state_per.unionAll(delta_per)
        .groupBy("term")
        .agg(F.sum("doc_freq").cast("long").alias("doc_freq"))
    )
    st = state_st.unionAll(delta_st).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_dl").cast("long").alias("sum_dl"),
    )
    return (
        per.crossJoin(F.broadcast(st))
        .select(
            "term",
            "doc_freq",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
                    / (F.col("doc_freq") + F.lit(0.5))
                    + F.lit(1.0)
                )
                + F.lit(1e-9),
                6,
            ).alias("idf"),
            "n_docs",
            F.round(
                F.col("sum_dl").cast("double") / F.col("n_docs") + F.lit(1e-9),
                6,
            ).alias("avgdl"),
        )
        .orderBy(F.desc("doc_freq"), "term")
        .limit(20)
    )
