"""continuation wave 2: correlations, enrichment joins, HDR sketches, rank family, skyline, RRF.

Mechanically split from the single-module catalog.py (round 7, verdict
ask #5): query bodies are verbatim, registration order preserved by
the package __init__ import order, QUERIES identical before/after
(full-catalog oracle replay re-proven).
"""

from __future__ import annotations
from ._base import *  # noqa: F401,F403
from .docs import (  # noqa: F401
    _DUCK_MINHASH_CTE, _DUCK_TOKS, _dedup_stage,
)
from .quality import _BM25_B, _BM25_K1, _bm25_scores  # noqa: F401

_shared_sql(
    "window_rank_showcase",
    """
    WITH r AS (
      SELECT o_orderpriority,
             o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             ntile(4) OVER w                          AS quartile,
             round(percent_rank() OVER w + 1e-9, 6)   AS pct_rank,
             round(cume_dist() OVER w + 1e-9, 6)      AS cume,
             dense_rank() OVER w                      AS drank
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY round(o_totalprice * 100), o_orderkey)
    )
    SELECT o_orderpriority,
           CAST(quartile AS BIGINT)       AS quartile,
           count(*)                       AS n,
           CAST(sum(cents) AS BIGINT)     AS cents_total,
           round(min(pct_rank), 6)        AS min_pct_rank,
           round(max(cume), 6)            AS max_cume,
           CAST(max(drank) AS BIGINT)     AS max_dense_rank
    FROM r GROUP BY o_orderpriority, quartile
    """,
    "The ranking-function family not exercised elsewhere — ntile, "
    "percent_rank, cume_dist, dense_rank over one named window — rolled "
    "to per-(priority, quartile) aggregates.  Rank-derived ratios are "
    "exact rationals ((rank-1)/(n-1), rank/n) so the doubles are "
    "deterministic; the (cents, orderkey) ordering is unique, making "
    "ntile's boundary assignment identical in both engines; money "
    "aggregated in integer cents.  One window + one rollup on the same "
    "partitioning",
)


_shared_sql(
    "events_mad_outliers",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ), med AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY vm) AS m
      FROM v GROUP BY event_type
    ), dev AS (
      -- floor() BEFORE the BIGINT cast: percentile_cont interpolates, so m
      -- can be *.5, and a bare double->BIGINT cast diverges across engines
      -- (DuckDB rounds half away from zero, Spark truncates).  floor() is
      -- identical in both; the cast of an integral double is then exact.
      SELECT v.event_type, v.vm,
             CAST(abs(v.vm - CAST(floor(med.m) AS BIGINT)) AS BIGINT) AS ad,
             CAST(floor(med.m) AS BIGINT) AS m
      FROM v JOIN med ON v.event_type = med.event_type
    ), mad AS (
      SELECT event_type, m,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY ad) AS mad
      FROM dev GROUP BY event_type, m
    )
    -- BROADCAST: mad is group-cardinality-sized but percentile aggs leave
    -- it stats-less, defaulting this join to sort-merge (plan audit); the
    -- hint rides in a comment DuckDB ignores
    SELECT /*+ BROADCAST(a) */
           d.event_type,
           count(*)                         AS n,
           CAST(d.m AS BIGINT)              AS median_micro,
           CAST(floor(a.mad) AS BIGINT)     AS mad_micro,
           CAST(sum(CASE WHEN abs(d.vm - d.m) * 10000
                          > 3 * 14826 * CAST(floor(a.mad) AS BIGINT)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a ON d.event_type = a.event_type
    GROUP BY d.event_type, d.m, a.mad
    """,
    "MAD (median absolute deviation) robust outlier flagging — the "
    "third member of the robust-stats family beside winsorized means "
    "and Theil-Sen: a point is an outlier when |x - median| > 3 * "
    "1.4826 * MAD, and the test is CROSS-MULTIPLIED to integers "
    "(|x-m| * 10000 > 3 * 14826 * MAD) so the sigma-equivalence "
    "constant never becomes a float in the decision.  Both medians sit "
    "at the dyadic 0.5; values in integer micro-units.  Note the "
    "deliberate subtlety: percentile_cont interpolates between two "
    "integers, so the median can be *.5 — and a bare double->BIGINT "
    "cast is ENGINE-DIVERGENT on halves (DuckDB rounds half away from "
    "zero, Spark truncates), so both m and MAD go through an explicit "
    "floor() first, which is identical everywhere.  Two group-keyed "
    "aggregates + one broadcast join back",
)


_shared_sql(
    "events_benford_check",
    """
    WITH digits AS (
      SELECT substr(CAST(CAST(round(value * 100) AS BIGINT) AS STRING),
                    1, 1) AS d
      FROM events
      WHERE value IS NOT NULL AND value >= 1
    ), obs AS (
      SELECT d, count(*) AS n FROM digits GROUP BY d
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM obs),
    expected AS (
      -- log10(1+1/d) in integer TEN-THOUSANDTHS: the chi-square numerator
      -- (n*1e4 - pe4*t)^2 is then an EXACT integer and the term is ONE
      -- double division — a float p*t recomputed under different engine
      -- type promotions diverged by 1 ulp at sf0.001 (0.063840 vs
      -- 0.063841), caught by the gate.  Exact up to ~1M rows (then the
      -- squared numerator would need the next unit down).
      SELECT * FROM (VALUES
        ('1', 3010), ('2', 1761), ('3', 1249),
        ('4', 969),  ('5', 792),  ('6', 669),
        ('7', 580),  ('8', 512),  ('9', 458)
      ) AS e(d, pe4)
    )
    SELECT e.d AS digit,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n,
           round(coalesce(o.n, 0) / CAST(t.t AS DOUBLE) + 1e-9, 6)
             AS observed_p,
           round(e.pe4 / 10000.0 + 1e-9, 6) AS benford_p,
           round((coalesce(o.n, 0) * 10000 - e.pe4 * t.t)
                 * (coalesce(o.n, 0) * 10000 - e.pe4 * t.t)
                 / (CAST(e.pe4 AS DOUBLE) * t.t * 10000) + 1e-9, 6)
             AS chi2_term
    FROM expected e
    LEFT JOIN obs o ON e.d = o.d
    CROSS JOIN tot t
    """,
    "Benford's-law first-digit audit — the classic fraud/fabrication "
    "screen for financial and count data: observed first-digit "
    "frequencies against log10(1+1/d) expectations with per-digit "
    "chi-square contributions (sum them and compare to the chi2(8) "
    "critical value; a uniform synthetic corpus fails Benford loudly, "
    "which is itself the honest result here).  The first digit comes "
    "from the INTEGER-CENTS string, not float formatting — engines "
    "render doubles differently but render BIGINTs identically — and "
    "values < 1 are excluded (their cents first-digit is not their "
    "value's first significant digit; documented boundary).  One "
    "digit aggregate; expectation table is 9 literal rows",
)


_ABC_ORACLE = """
    WITH rev AS (
      SELECT o_custkey AS cust,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT cust, cents,
             sum(cents) OVER (ORDER BY cents DESC, cust
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
             sum(cents) OVER ()                          AS total_cents
      FROM rev
    ), classed AS (
      -- total_cents rides along as a column (it is constant across rows);
      -- round 5 removed a `classed CROSS JOIN (SELECT DISTINCT
      -- total_cents...)` here — Spark planned it as a BNLJ that broadcast
      -- the O(customers) classed side instead of the 1-row distinct,
      -- exactly the unbounded-broadcast shape the plan invariant forbids
      SELECT cust, cents, total_cents,
             CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                  WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked
    )
    SELECT abc,
           count(*)                     AS n_customers,
           CAST(sum(cents) AS BIGINT)   AS cents,
           round(sum(cents) / CAST(max(total_cents) AS DOUBLE) + 1e-9, 6)
             AS revenue_share
    FROM classed
    GROUP BY abc
    """


@register(
    "customer_abc_analysis",
    _ABC_ORACLE,
    "ABC / Pareto revenue classification — the inventory-and-account "
    "management classic: customers ranked by revenue, class A = the head "
    "covering 80% of cumulative revenue, B to 95%, C the tail.  Class "
    "boundaries are CROSS-MULTIPLIED integer comparisons "
    "(cum*100 <= total*80) on exact cent sums, so classification never "
    "touches a float; the (cents desc, cust) ordering is unique so the "
    "running sum is identical in both engines.  The global ordered "
    "cumulative sum (and the grand total riding beside it) runs on "
    "ops/rank.global_cumsum — two skew-free shuffles, no "
    "single-partition WindowExec — so the customer-cardinality pass "
    "survives 100x where the old `sum() OVER (ORDER BY ...)` funneled "
    "every customer through one partition",
)
def customer_abc_analysis(spark, sf_dir):
    from ..ops.rank import global_cumsum

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    ranked = global_cumsum(
        rev, [F.col("cents").desc(), F.col("cust")], "cents",
        "cum_cents", part_key=-F.col("cents"), total_col="total_cents",
    )
    classed = ranked.withColumn(
        "abc",
        F.when(F.col("cum_cents") * 100 <= F.col("total_cents") * 80, "A")
        .when(F.col("cum_cents") * 100 <= F.col("total_cents") * 95, "B")
        .otherwise("C"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
        F.round(
            F.sum("cents") / F.max("total_cents").cast("double") + F.lit(1e-9),
            6,
        ).alias("revenue_share"),
    )


_shared_sql(
    "events_wau_stickiness",
    """
    WITH d AS (
      SELECT date_trunc('week', ts) AS wk, date_trunc('day', ts) AS day,
             user_id
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), dau AS (
      SELECT wk, day, count(DISTINCT user_id) AS dau
      FROM d GROUP BY wk, day
    ), wau AS (
      SELECT wk, count(DISTINCT user_id) AS wau FROM d GROUP BY wk
    )
    SELECT w.wk AS wk,
           CAST(w.wau AS BIGINT)                        AS wau,
           CAST(count(*) AS BIGINT)                     AS n_days,
           CAST(sum(a.dau) AS BIGINT)                   AS dau_sum,
           round(sum(a.dau) / CAST(count(*) AS DOUBLE) + 1e-9, 6)
             AS avg_dau,
           round(sum(a.dau)
                 / CAST(count(*) * w.wau AS DOUBLE) + 1e-9, 6)
             AS stickiness
    FROM wau w JOIN dau a ON w.wk = a.wk
    GROUP BY w.wk, w.wau
    """,
    "DAU/WAU engagement and the stickiness ratio (avg daily actives over "
    "weekly actives — the product-analytics health metric): exact "
    "distinct counts per day and week, ratios derived from integer sums "
    "with single final divisions.  Two distinct aggregates on the same "
    "(week)-aligned partitioning; at 100 TB this is the query the "
    "persisted HLL partials (events_hll_rollup / events_partial_merge) "
    "answer without rescanning raw events — the exact form here IS the "
    "oracle for that approximation",
)


_RFM_ORACLE = """
    WITH base AS (
      SELECT o_custkey AS cust,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT cust, frequency, cents,
             ntile(4) OVER (ORDER BY last_order DESC, cust) AS r,
             ntile(4) OVER (ORDER BY frequency DESC, cust)  AS f,
             ntile(4) OVER (ORDER BY cents DESC, cust)      AS m
      FROM base
    )
    SELECT r, f, m,
           count(*)                    AS n_customers,
           CAST(sum(cents) AS BIGINT)  AS cents,
           CAST(min(frequency) AS BIGINT) AS min_freq,
           CAST(max(frequency) AS BIGINT) AS max_freq
    FROM scored
    GROUP BY r, f, m
    """


@register(
    "customer_rfm_segments",
    _RFM_ORACLE,
    "RFM segmentation — the CRM workhorse: every customer quartile-scored "
    "on Recency (latest order first), Frequency, and Monetary value "
    "(exact cents), rolled to the 4x4x4 segment grid with per-segment "
    "counts and revenue.  Each ntile ordering carries the unique cust "
    "tiebreak, so quartile boundaries are engine-identical; money never "
    "leaves integer cents.  The three global quartilings chain "
    "ops/rank.global_ntile (range-partitioned rank + the exact "
    "first-rem-buckets-one-larger formula, differential-tested against "
    "SQL ntile) — no single-partition WindowExec; the fact-table pass "
    "is just the per-customer aggregate",
)
def customer_rfm_segments(spark, sf_dir):
    from ..ops.rank import global_ntile

    # NOTE (r13): measured A/B at sf0.1 says do NOT persist this rollup —
    # caching adds a materialization barrier and pins the cached side's
    # partitioning (AQE cannot coalesce InMemoryTableScan output), and the
    # recompute is one cheap scan+partial-agg per reference (2.9 s vs
    # 3.6 s best-of-3 with the cache).
    base = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    # three tiles each computed from BASE and joined on cust (not chained:
    # chaining would make each boundary-sketch pass recompute its
    # predecessors), with ONE combined boundaries_for pass instead of
    # three per-tile sketch jobs over the orders aggregate
    from ..ops.rank import boundaries_for

    part_keys = {
        # ntz has no numeric cast; ltz->double is monotone in the
        # timestamp, which is all bucketing needs
        "r": -F.col("last_order").cast("timestamp_ltz").cast("double"),
        "f": -F.col("frequency").cast("double"),
        "m": -F.col("cents").cast("double"),
    }
    bnds = boundaries_for(base, part_keys)

    def tile(col, name):
        return global_ntile(
            base.select("cust", col),
            [F.col(col).desc(), F.col("cust")],
            4, name, part_key=part_keys[name], boundaries=bnds[name],
        ).select("cust", name)

    scored = (
        base
        .join(tile("last_order", "r"), "cust")
        .join(tile("frequency", "f"), "cust")
        .join(tile("cents", "m"), "cust")
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
        F.min("frequency").cast("long").alias("min_freq"),
        F.max("frequency").cast("long").alias("max_freq"),
    )


_shared_sql(
    "part_basket_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), n_orders AS (
      SELECT count(DISTINCT ok) AS n FROM items
    ), part_n AS (
      SELECT pk, count(*) AS n FROM items GROUP BY pk
    ), pairs AS (
      SELECT a.pk AS p1, b.pk AS p2, count(*) AS n_both
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
    )
    SELECT p.p1, p.p2,
           CAST(p.n_both AS BIGINT) AS n_both,
           CAST(a.n AS BIGINT)      AS n_p1,
           CAST(b.n AS BIGINT)      AS n_p2,
           round((p.n_both * o.n)
                 / CAST(a.n * b.n AS DOUBLE) + 1e-9, 6) AS lift
    FROM pairs p
    JOIN part_n a ON p.p1 = a.pk
    JOIN part_n b ON p.p2 = b.pk
    CROSS JOIN n_orders o
    WHERE p.n_both >= 3
    """,
    "Market-basket pairs on the REAL basket structure (parts co-purchased "
    "within an order) — the canonical affinity mine, complementing "
    "events_assoc_rules' behavioral variant: within-order self-join on "
    "the deduplicated (order, part) table, support floor n_both >= 3, "
    "lift cross-multiplied before its single division.  Scale: the "
    "self-join is order-keyed (baskets are small, the join fans out "
    "per-basket quadratically in basket SIZE, not order count) and the "
    "part-frequency side broadcasts — the exact shape A-Priori's first "
    "pass runs at any scale.  Spark side (round 13): the deduplicated "
    "item table is cached once — its lineage is a lineitem-wide DISTINCT "
    "shuffle, and the SQL form re-ran that shuffle for each of its four "
    "references (self-join both sides, part counts, order count)",
)


def _part_basket_pairs_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of the registered SQL (round 13, guide §2.4): WITH
    is a view in Spark, so the SQL form re-computed the `items` DISTINCT
    (a lineitem-wide shuffle) once per reference — four times.  One
    persisted frame serves all four; every expression below mirrors the
    SQL literally (count(*) bigint, integer lift cross-multiplication,
    one rounded division), so the oracle is unchanged and hash-verified."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        .persist()
    )
    n_orders = items.agg(F.countDistinct("ok").alias("n"))
    part_n = items.groupBy("pk").agg(F.count(F.lit(1)).alias("n"))
    a_side = items.select(F.col("ok").alias("__ok"), F.col("pk").alias("p1"))
    pairs = (
        a_side.join(
            items, (F.col("__ok") == F.col("ok")) & (F.col("p1") < F.col("pk"))
        )
        .groupBy("p1", F.col("pk").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    pn1 = part_n.select(F.col("pk").alias("__p1"), F.col("n").alias("__n1"))
    pn2 = part_n.select(F.col("pk").alias("__p2"), F.col("n").alias("__n2"))
    return (
        pairs.join(F.broadcast(pn1), F.col("p1") == F.col("__p1"))
        .join(F.broadcast(pn2), F.col("p2") == F.col("__p2"))
        .crossJoin(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            F.col("n_both").cast("long").alias("n_both"),
            F.col("__n1").cast("long").alias("n_p1"),
            F.col("__n2").cast("long").alias("n_p2"),
            F.round(
                (F.col("n_both") * F.col("n"))
                / (F.col("__n1") * F.col("__n2")).cast("double")
                + F.lit(1e-9),
                6,
            ).alias("lift"),
        )
    )


QUERIES["part_basket_pairs"] = CatalogQuery(
    _part_basket_pairs_fn,
    QUERIES["part_basket_pairs"].oracle,
    QUERIES["part_basket_pairs"].description,
)


@register(
    "events_exact_quantiles",
    """
    WITH v AS (
      SELECT CAST(round(value * 1e6) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY vm) / 1e6
                 + 1e-9, 6) AS p25,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY vm) / 1e6
                 + 1e-9, 6) AS p50,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY vm) / 1e6
                 + 1e-9, 6) AS p75
    FROM v
    """,
    "EXACT global percentile_cont over the full corpus — the ground-truth "
    "complement to the approximate sketches (events_median_sketch's "
    "histogram, percentile_approx): ops/rank.global_quantiles_exact ranks "
    "every row with the two-pass range-partitioned rank, then one "
    "conditional grand aggregate picks the straddling positions and "
    "interpolates.  Values in integer micro-units and dyadic q make the "
    "interpolation exactly double-representable, so DuckDB "
    "percentile_cont parity is bit-exact — an EXACT distributed global "
    "quantile, hash-gated, with no single-partition sort anywhere (the "
    "shape a naive sort-then-index implementation gets wrong at scale)",
)
def events_exact_quantiles(spark, sf_dir):
    from ..ops.rank import global_quantiles_exact

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 1e6).cast("long").alias("vm"),
            "event_id",
        )
    )
    qx = global_quantiles_exact(ev, "vm", "event_id", [0.25, 0.5, 0.75])
    return qx.select(
        "n",
        F.round(F.col("p25") / 1e6 + F.lit(1e-9), 6).alias("p25"),
        F.round(F.col("p50") / 1e6 + F.lit(1e-9), 6).alias("p50"),
        F.round(F.col("p75") / 1e6 + F.lit(1e-9), 6).alias("p75"),
    )


@register(
    "curriculum_stages_docs",
    f"""
    WITH t AS (
      SELECT doc_id, len({_DUCK_TOKS}) AS n_toks FROM documents
    ), staged AS (
      SELECT doc_id, n_toks,
             ntile(4) OVER (ORDER BY n_toks, doc_id) AS stage
      FROM t
    )
    SELECT stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_toks) AS BIGINT) AS min_toks,
           CAST(max(n_toks) AS BIGINT) AS max_toks,
           CAST(sum(n_toks) AS BIGINT) AS total_toks
    FROM staged GROUP BY stage
    """,
    "Curriculum staging — order the corpus easiest-first (token count "
    "ascending, the classic length-based curriculum proxy) and cut it "
    "into 4 equal training stages with per-stage token budgets: the "
    "corpus-ordering pass a curriculum-learning pipeline runs before "
    "writing stage manifests.  The global ordering runs on "
    "ops/rank.global_ntile (range-partitioned two-pass, no "
    "single-partition window), with the unique doc_id tiebreak making "
    "stage boundaries engine-identical; token counts share "
    "token_counts_docs' whitespace parity rules.  One rank pass + one "
    "4-group rollup",
)
def curriculum_stages_docs(spark, sf_dir):
    from ..ops.rank import global_ntile

    docs = _load_wide(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_toks")
    )
    staged = global_ntile(docs, ["n_toks", "doc_id"], 4, "stage")
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_toks").cast("long").alias("min_toks"),
        F.max("n_toks").cast("long").alias("max_toks"),
        F.sum("n_toks").cast("long").alias("total_toks"),
    )


@register(
    "customer_frequency_ranks",
    """
    WITH base AS (
      SELECT o_custkey AS cust, count(*) AS freq
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT freq,
             rank()       OVER (ORDER BY freq DESC) AS rnk,
             dense_rank() OVER (ORDER BY freq DESC) AS drnk
      FROM base
    )
    SELECT freq, rnk, drnk, CAST(count(*) AS BIGINT) AS n_customers
    FROM ranked GROUP BY freq, rnk, drnk
    """,
    "Tie-aware global leaderboard: every customer ranked by order count "
    "with BOTH rank() (gaps after tie groups) and dense_rank() — order "
    "counts are heavily tied (a few dozen distinct values over all "
    "customers), so this pins ops/rank.global_rank's tie semantics "
    "end-to-end against the SQL window functions: tie groups never span "
    "range buckets (equal part keys share a bucket), making "
    "local-rank + prior-bucket row count (rank) / prior-bucket DISTINCT "
    "count (dense) exact.  Output rolled to one row per tie group",
)
def customer_frequency_ranks(spark, sf_dir):
    from ..ops.rank import boundaries_for, global_rank

    base = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pk = -F.col("freq").cast("double")
    bnds = boundaries_for(base, {"k": pk})["k"]
    order = [F.col("freq").desc()]
    rk = global_rank(base, order, "rnk", part_key=pk, boundaries=bnds)
    dr = global_rank(
        base, order, "drnk", dense=True, part_key=pk, boundaries=bnds,
    )
    return (
        rk.select("cust", "freq", "rnk")
        .join(dr.select("cust", "drnk"), "cust")
        .groupBy("freq", "rnk", "drnk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


@register(
    "corpus_shuffle_shards",
    """
    WITH keyed AS (
      SELECT doc_id,
             md5('42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
    ), ranked AS (
      SELECT doc_id, shuffle_key,
             CAST(row_number() OVER (ORDER BY shuffle_key, doc_id)
                  AS BIGINT) AS pos,
             CAST(ntile(16) OVER (ORDER BY shuffle_key, doc_id) - 1
                  AS INT) AS shard
      FROM keyed
    )
    SELECT doc_id, shuffle_key, pos, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY pos)
                AS BIGINT) AS shard_pos
    FROM ranked
    """,
    "Deterministic global corpus shuffle + contiguous shard split "
    "(ops/rank.shuffled_shards): md5(seed:id) keys give a replayable "
    "permutation (identical hex in Spark and DuckDB, so the oracle "
    "replays the EXACT order), global position via the range-partitioned "
    "row_number (part key = leading 15 hex digits via conv — monotone in "
    "the key's byte order, and uniform, so buckets self-balance under any "
    "id skew), shard id from the exact ntile arithmetic and shard_pos "
    "from its closed-form inverse — one sketch pass + one bucketed window "
    "shuffle, no single-partition sort.  This is the 'shuffle the corpus, "
    "split into n training files' step every LLM pipeline ends with",
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.rank import shuffled_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shuffled_shards(docs, "doc_id", seed=42, n_shards=16)


@register(
    "drift_psi_docs",
    """
    WITH tagged AS (
      SELECT CAST(floor(n_chars / 64) AS BIGINT) AS bin_chars,
             lang AS bin_lang,
             substring(md5('7:' || CAST(doc_id AS VARCHAR)), 32, 1) < '8'
               AS is_ref
      FROM documents
    ), nc AS (
      SELECT bin_chars,
             sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS rn,
             sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cn
      FROM tagged GROUP BY 1
    ), nct AS (
      SELECT rn, cn, sum(rn) OVER () AS tr, sum(cn) OVER () AS tc,
             count(*) OVER () AS nb
      FROM nc
    ), lc AS (
      SELECT bin_lang,
             sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS rn,
             sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cn
      FROM tagged GROUP BY 1
    ), lct AS (
      SELECT rn, cn, sum(rn) OVER () AS tr, sum(cn) OVER () AS tc,
             count(*) OVER () AS nb
      FROM lc
    ), scored AS (
      SELECT 'n_chars' AS feature, CAST(max(nb) AS BIGINT) AS n_bins,
             sum(((cn + 0.5) / (tc + 0.5 * nb)
                  - (rn + 0.5) / (tr + 0.5 * nb))
                 * ln(((cn + 0.5) / (tc + 0.5 * nb))
                      / ((rn + 0.5) / (tr + 0.5 * nb)))) AS raw_psi
      FROM nct
      UNION ALL
      SELECT 'lang', CAST(max(nb) AS BIGINT),
             sum(((cn + 0.5) / (tc + 0.5 * nb)
                  - (rn + 0.5) / (tr + 0.5 * nb))
                 * ln(((cn + 0.5) / (tc + 0.5 * nb))
                      / ((rn + 0.5) / (tr + 0.5 * nb))))
      FROM lct
    )
    SELECT feature, n_bins, round(raw_psi + 1e-9, 6) AS psi,
           CASE WHEN raw_psi < 0.1 THEN 'stable'
                WHEN raw_psi < 0.25 THEN 'moderate'
                ELSE 'shifted' END AS verdict
    FROM scored
    """,
    "Corpus drift between two snapshots (ops/quality.drift_psi): "
    "Population Stability Index over a binned doc-length feature and the "
    "lang categorical, snapshots split by an md5 hash bit (deterministic "
    "in both engines).  Laplace-smoothed p = (n+0.5)/(N+0.5*bins) keeps "
    "empty bins defined; conventional <0.1/<0.25 verdict thresholds.  "
    "Scale shape: ONE map-side-combining aggregate over the corpus per "
    "feature, then arithmetic over the <= n_bins frame — no joins, no "
    "data-sized windows.  The pre-mix QA gate for crawl snapshot drift",
)
def drift_psi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.quality import drift_psi

    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        F.floor(F.col("n_chars") / 64).cast("long").alias("bin_chars"),
        F.col("lang").alias("bin_lang"),
        (
            F.substring(
                F.md5(F.concat(F.lit("7:"), F.col("doc_id").cast("string"))),
                32, 1,
            ) < "8"
        ).alias("is_ref"),
    )
    return drift_psi(tagged, "bin_chars", feature_name="n_chars").unionByName(
        drift_psi(tagged, "bin_lang", feature_name="lang")
    )


# --- threat-intel CIDR enrichment (longest-prefix match) -------------------
# The feed is engineered so the overlap semantics fire at every sf: user_ids
# 0..14 exist even at sf0.001, and ip = knuth_hash(user_id) is deterministic
# in both engines, so nested prefixes around hash(7) = 83.132.83.215 and
# hash(1) = 158.55.121.177 guarantee multi-length matches that only
# longest-prefix-wins resolves; hash(3) pins the /32 (shift-by-zero) edge.
_CIDR_FEED = [  # (dotted_cidr, label, severity)
    ("83.0.0.0/8", "cdn", 1),
    ("83.132.0.0/16", "scanner", 2),
    ("83.132.83.0/24", "tor-exit", 3),
    ("158.0.0.0/8", "cloud", 1),
    ("158.55.0.0/16", "botnet-c2", 4),
    ("0.0.0.0/8", "bogon", 2),
    ("8.0.0.0/8", "cloud", 1),
    ("218.166.109.19/32", "honeypot", 5),
]


def _cidr_parse(entry):
    net, _, ln = entry[0].partition("/")
    a, b, c, d = (int(x) for x in net.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d, int(ln)


def _cidr_feed_values_sql() -> str:
    rows = []
    for entry in _CIDR_FEED:
        p, ln = _cidr_parse(entry)
        div = 1 << (32 - ln)
        rows.append(f"({p // div}, {div}, {ln}, '{entry[1]}', {entry[2]})")
    return ",\n      ".join(rows)


@register(
    "events_cidr_enrich",
    f"""
    WITH feed(trunc, divisor, prefix_len, label, severity) AS (VALUES
      {_cidr_feed_values_sql()}
    ),
    ev AS (
      SELECT event_id, user_id,
             (user_id * 2654435761) % 4294967296 AS ip
      FROM events
    ),
    m AS (
      SELECT e.event_id, e.user_id, f.label, f.severity, f.prefix_len,
             row_number() OVER (
               PARTITION BY e.event_id ORDER BY f.prefix_len DESC
             ) AS rn
      FROM ev e LEFT JOIN feed f ON (e.ip // f.divisor) = f.trunc
    )
    SELECT label, severity, prefix_len AS matched_len,
           count(*)               AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM m WHERE rn = 1
    GROUP BY label, severity, prefix_len
    """,
    "Threat-intel enrichment via longest-prefix-match CIDR join "
    "(ops/enrich.cidr_lpm_join): every event IP (a Knuth multiplicative "
    "hash of user_id — deterministic in both engines) joined against a "
    "feed of overlapping networks, most specific prefix wins — "
    "IP-routing semantics, the real-feed generalization of the Sigma "
    "|cidr modifier's single-network text match "
    "(sigma/compiler.py:307; the reference surface has no feed join at "
    "all).  Spark: one LEFT broadcast hash join per distinct mask "
    "length (feed side truncated + deduped, payload as an atomic "
    "struct), label = length-descending coalesce — ZERO shuffles on the "
    "event side, no explode, no per-event window; the oracle's "
    "row_number-over-prefix_len formulation is the semantics spec.  "
    "Unmatched events surface as the NULL-label row, so coverage is "
    "audited in the same result",
)
def events_cidr_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.enrich import cidr_lpm_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        ((F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296))
        .alias("ip"),
    )
    feed = spark.createDataFrame(
        [(*_cidr_parse(e), e[1], e[2]) for e in _CIDR_FEED],
        "prefix_int long, prefix_len int, label string, severity int",
    )
    enriched = cidr_lpm_join(ev, feed, "ip", ["label", "severity"])
    return enriched.groupBy(
        "label", "severity", "matched_len"
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- geo-IP / ASN range enrichment (narrowest-range-wins) ------------------
# Arbitrary (non-CIDR-aligned) inclusive ranges over the same deterministic
# knuth_hash(user_id) IP space as events_cidr_enrich, engineered so the
# overlap semantics fire at every sf (user_ids 0..14 exist at sf0.001):
#   hash(7)=1401181143  in rir-apnic ⊃ asn-transit ⊃ vpn-exit (3-deep nest,
#                        none CIDR-aligned — narrowest range must win)
#   hash(1)=2654435761  in geo-de AND geo-fr (EQUAL span 101 — the start
#                        tie-break decides)
#   hash(3)=3668339987  single-address sinkhole (span-1 /32 block edge)
#   hash(0)=0           bogon-low start-of-space edge
#   internet [0,2^32-1] catch-all — the /0 single-block edge; every event
#                        matches it, so it wins exactly when nothing
#                        narrower does (no NULL row in this query)
_RANGE_FEED = [  # (ip_start, ip_end, label, kind)
    (1400000000, 1500000000, "rir-apnic", "rir"),
    (1401181000, 1401182000, "asn-transit", "asn"),
    (1401181100, 1401181150, "vpn-exit", "vpn"),
    (2654435700, 2654435800, "geo-de", "geo"),
    (2654435711, 2654435811, "geo-fr", "geo"),
    (3668339987, 3668339987, "sinkhole", "sinkhole"),
    (0, 100000000, "bogon-low", "bogon"),
    (147000000, 148000000, "cdn-edge", "cdn"),
    (387276000, 387277000, "iot-botnet", "botnet"),
    (0, 4294967295, "internet", "default"),
]


def _range_feed_values_sql() -> str:
    return ",\n      ".join(
        f"({s}, {e}, '{lb}', '{k}')" for s, e, lb, k in _RANGE_FEED
    )


@register(
    "events_ip_range_enrich",
    f"""
    WITH feed(s, e, label, kind) AS (VALUES
      {_range_feed_values_sql()}
    ),
    ev AS (
      SELECT event_id, user_id,
             (user_id * 2654435761) % 4294967296 AS ip
      FROM events
    ),
    m AS (
      SELECT e.event_id, e.user_id, f.label, f.kind,
             f.e - f.s + 1 AS span,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY f.e - f.s + 1, f.s, f.label, f.kind
             ) AS rn
      FROM ev e LEFT JOIN feed f ON e.ip BETWEEN f.s AND f.e
    )
    SELECT label, kind, span AS matched_span,
           count(*)                AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM m WHERE rn = 1
    GROUP BY label, kind, span
    """,
    "Geo-IP/ASN-style enrichment via NARROWEST-RANGE-WINS interval join "
    "(ops/enrich.ip_range_join): event IPs against a feed of arbitrary — "
    "deliberately non-CIDR-aligned — overlapping [start,end] allocations; "
    "the smallest span wins, ties broken by start (geo-de vs geo-fr pins "
    "the tie).  Complements events_cidr_enrich: range-level specificity, "
    "not block-level — a narrow range must beat a wide range even where "
    "the wide range's covering block has the longer prefix.  Spark: each "
    "range decomposes feed-side into its <=62 maximal aligned CIDR blocks "
    "(Arrow pandas UDF), blocks group per length into per-bucket candidate "
    "lists, then one one-to-one LEFT broadcast join per distinct block "
    "length; the winner is picked per event by a codegen'd "
    "array_sort-by-(span,start,payload) expression — ZERO shuffles on the "
    "event side, no explode fan-out, no per-event window; the oracle's "
    "BETWEEN-join + row_number formulation is the semantics spec.  The "
    "[0,2^32-1] catch-all exercises the /0 single-block edge and makes "
    "every event resolve",
)
def events_ip_range_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.enrich import ip_range_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        ((F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296))
        .alias("ip"),
    )
    feed = spark.createDataFrame(
        _RANGE_FEED, "ip_start long, ip_end long, label string, kind string"
    )
    enriched = ip_range_join(ev, feed, "ip", ["label", "kind"])
    return enriched.groupBy("label", "kind", "matched_span").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- domain-suffix enrichment (deepest-zone-wins) --------------------------
# Deterministic domains derived from user_id residues so both engines build
# the identical corpus: h{u%7}.s{u%3}.example{u%5}.com.  The feed nests
# com ⊃ example3.com ⊃ s2.example3.com ⊃ h1.s2.example3.com (u ≡ 8 mod 105
# hits all four — u=8 exists at every sf, so the full depth chain fires at
# sf0.001); 'net' never matches (all domains are .com) and the 'com'
# catch-all makes every event resolve, exercising the depth-1 edge.
_DOMAIN_FEED = [  # (suffix, label, category)
    ("com", "tld-generic", "tld"),
    ("net", "tld-unused", "tld"),
    ("example3.com", "zone-three", "zone"),
    ("example1.com", "zone-one", "zone"),
    ("s2.example3.com", "sub-two", "subzone"),
    ("h1.s2.example3.com", "host-pin", "host"),
]


def _domain_feed_values_sql() -> str:
    return ",\n      ".join(
        f"('{s}', {s.count('.') + 1}, '{lb}', '{k}')"
        for s, lb, k in _DOMAIN_FEED
    )


@register(
    "events_domain_enrich",
    f"""
    WITH feed(suffix, n_labels, label, category) AS (VALUES
      {_domain_feed_values_sql()}
    ),
    ev AS (
      SELECT event_id, user_id,
             'h' || CAST(user_id % 7 AS VARCHAR)
             || '.s' || CAST(user_id % 3 AS VARCHAR)
             || '.example' || CAST(user_id % 5 AS VARCHAR)
             || '.com' AS domain
      FROM events
    ),
    m AS (
      SELECT e.event_id, e.user_id, f.label, f.category, f.n_labels,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY f.n_labels DESC, f.suffix
             ) AS rn
      FROM ev e LEFT JOIN feed f
        ON e.domain = f.suffix OR e.domain LIKE '%.' || f.suffix
    )
    SELECT label, category, n_labels AS matched_labels,
           count(*)                AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM m WHERE rn = 1
    GROUP BY label, category, n_labels
    """,
    "DNS blocklist/zone-reputation enrichment via DEEPEST-ZONE-WINS "
    "suffix join (ops/enrich.domain_suffix_join) — the DNS sibling of "
    "events_cidr_enrich: a feed entry matches its exact domain and every "
    "subdomain at a dot boundary, overlapping zones resolve by label "
    "depth (com ⊂ example3.com ⊂ s2.example3.com ⊂ h1.s2.example3.com, "
    "the full nest firing at every sf).  Spark: one LEFT broadcast join "
    "per distinct feed depth, probe key = the domain's last-L-labels "
    "suffix (split/slice/array_join, codegen'd), atomic payload struct, "
    "depth-descending coalesce; feed slices built in one checkpointed "
    "pass with the deterministic min(struct) duplicate pick — ZERO "
    "event-side shuffles, no explode, no per-event window.  The "
    "oracle's LIKE-'%.suffix' + row_number-by-depth formulation is the "
    "semantics spec; 'net' pins the never-matching entry and the 'com' "
    "catch-all the depth-1 edge",
)
def events_domain_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.enrich import domain_suffix_join

    u = F.col("user_id")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.concat(
            F.lit("h"), (u % 7).cast("string"),
            F.lit(".s"), (u % 3).cast("string"),
            F.lit(".example"), (u % 5).cast("string"),
            F.lit(".com"),
        ).alias("domain"),
    )
    feed = spark.createDataFrame(
        _DOMAIN_FEED, "suffix string, label string, category string"
    )
    enriched = domain_suffix_join(ev, feed, "domain", ["label", "category"])
    return enriched.groupBy("label", "category", "matched_labels").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- mergeable HDR-histogram quantiles -------------------------------------


@register(
    "lineitem_hdr_quantiles",
    """
    WITH v AS (
      SELECT l_returnflag AS grp,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ),
    vb AS (
      SELECT grp, cents,
             CASE WHEN cents < 64 THEN 0
                  ELSE length(bin(cents)) - 6 END AS shift
      FROM v
    ),
    sk AS (
      SELECT grp, shift, (cents >> shift) AS m, count(*) AS cnt
      FROM vb GROUP BY grp, shift, m
    ),
    allsk AS (
      SELECT grp, shift, m, cnt FROM sk
      UNION ALL
      SELECT 'ALL' AS grp, shift, m, SUM(cnt) AS cnt
      FROM sk GROUP BY shift, m
    ),
    cum AS (
      SELECT grp,
             (m << shift) + (((CAST(1 AS BIGINT) << shift) - 1) >> 1) AS est,
             SUM(cnt) OVER (PARTITION BY grp ORDER BY (m << shift)) AS c,
             SUM(cnt) OVER (PARTITION BY grp) AS n
      FROM allsk
    ),
    q(q_pct) AS (VALUES (50), (90), (99))
    SELECT c.grp, q.q_pct,
           CAST(min(c.n) AS BIGINT) AS n_rows,
           min(c.est)               AS est
    FROM cum c CROSS JOIN q
    WHERE c.c * 100 >= q.q_pct * c.n
    GROUP BY c.grp, q.q_pct
    """,
    "Per-returnflag p50/p90/p99 of extended price via the MERGEABLE "
    "HDR-histogram sketch (ops/sketch.py) — exponent + 32-sub-bucket "
    "integer binning (rel. error <= 1/32), bucketed with "
    "length(bin(v))-style pure integer arithmetic so the sketch is "
    "bit-identical in Spark and DuckDB (any float-log binning flips "
    "boundary buckets on 1-ulp libm differences).  The 'ALL' rows are "
    "produced by MERGING the per-flag sketches (counts just add — the "
    "property percentile_approx lacks) while the oracle computes 'ALL' "
    "directly over the raw rows: the hash-match IS the mergeability "
    "proof, oracle-checked.  One map-side-combining pass builds the "
    "sketch (localCheckpoint'd, <= groups x 64 x 32 rows); windows and "
    "rank extraction run over that bounded frame, never over the data — "
    "at 100 TB the only data-sized op is the initial aggregate",
)
def lineitem_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.sketch import hdr_merge, hdr_quantiles, hdr_sketch

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_extendedprice") * F.lit(100) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    sk = hdr_sketch(li, "cents", ["grp"], sub_bits=5)
    has_dir = spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()
    sk = (sk.checkpoint(eager=True) if has_dir
          else sk.localCheckpoint(eager=True))
    merged = hdr_merge(sk, []).select(
        F.lit("ALL").alias("grp"), "shift", "m", "cnt"
    )
    both = sk.unionByName(merged)
    return hdr_quantiles(both, ["grp"], [50, 90, 99])


@register(
    "events_hdr_weekly_rollup",
    """
    WITH v AS (
      SELECT date_trunc('week', ts) AS wk,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
      WHERE value >= 0
    ),
    vb AS (
      SELECT wk, cents,
             CASE WHEN cents < 64 THEN 0
                  ELSE length(bin(cents)) - 6 END AS shift
      FROM v
    ),
    sk AS (
      SELECT wk, shift, (cents >> shift) AS m, count(*) AS cnt
      FROM vb GROUP BY wk, shift, m
    ),
    cum AS (
      SELECT wk,
             (m << shift) + (((CAST(1 AS BIGINT) << shift) - 1) >> 1) AS est,
             SUM(cnt) OVER (PARTITION BY wk ORDER BY (m << shift)) AS c,
             SUM(cnt) OVER (PARTITION BY wk) AS n
      FROM sk
    ),
    q(q_pct) AS (VALUES (50), (95))
    SELECT c.wk, q.q_pct,
           CAST(min(c.n) AS BIGINT) AS n_rows,
           min(c.est)               AS est
    FROM cum c CROSS JOIN q
    WHERE c.c * 100 >= q.q_pct * c.n
    GROUP BY c.wk, q.q_pct
    """,
    "Weekly p50/p95 of event value via HIERARCHICAL sketch rollup — the "
    "operational shape mergeability exists for: Spark builds DAILY HDR "
    "sketches (one map-side-combining pass over the events), then the "
    "week frames are a plain SUM-merge of the day frames (hdr_merge — "
    "no second pass over the data), while the oracle computes the "
    "weekly sketch DIRECTLY from the raw rows.  The hash-match proves "
    "the day→week merge is lossless at a second granularity beyond "
    "lineitem_hdr_quantiles' group→ALL roll-up.  At 100 TB this is the "
    "incremental-percentile pattern: persist tiny per-day frames, "
    "answer any week/month/quarter percentile by summing frames — the "
    "raw data is read once per day, ever",
)
def events_hdr_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.sketch import hdr_merge, hdr_quantiles, hdr_sketch

    # the HDR binning is defined on NON-NEGATIVE integers (bit-length
    # bucketing has no two's-complement branch, deliberately — see
    # ops/sketch.py); the value metric's domain is declared explicitly
    # here so both engines agree on it (negative-mean fuzz corpora)
    daily = load_table(spark, sf_dir, "events").filter(
        F.col("value") >= 0
    ).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.floor(F.col("value") * F.lit(100) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    dsk = hdr_sketch(daily, "cents", ["day"], sub_bits=5)
    wsk = hdr_merge(
        dsk.withColumn(
            "wk", F.date_trunc("week", F.col("day"))
        ),
        ["wk"],
    )
    return hdr_quantiles(wsk, ["wk"], [50, 95])


@register(
    "events_attribution",
    """
    WITH t AS (
      SELECT event_id, ts, user_id, event_type, value,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN ts END IGNORE NULLS) OVER w AS t_ts,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS) OVER w
               AS t_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN t_ts >= ts - INTERVAL 7 DAY THEN t_type
                ELSE 'direct' END AS channel,
           count(*) AS n_purchases,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM t
    WHERE event_type = 'purchase'
    GROUP BY CASE WHEN t_ts >= ts - INTERVAL 7 DAY THEN t_type
                  ELSE 'direct' END
    """,
    "last-touch marketing attribution: each purchase's revenue goes to the "
    "most recent preceding view/click by the same user within a 7-day "
    "lookback, else 'direct'.  ONE user-keyed window (last ... IGNORE "
    "NULLS over the preceding frame) finds the touch without a "
    "self-join — at 100 TB this is a single hash shuffle on user_id with "
    "O(1) per-row state, where the naive events-x-events as-of self-join "
    "would shuffle the table twice.  Revenue in integer cents so the "
    "per-channel sums are order-free; both window columns null together, "
    "so the 7-day CASE needs no separate presence flag",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the batch leg of the streaming operator (one source of truth for the
    # window form; batch==stream pinned in tests/test_stateful.py)
    from ..streaming.stateful import attribution_events

    per_purchase = attribution_events(load_table(spark, sf_dir, "events"))
    return per_purchase.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("value_cents").cast("long").alias("revenue_cents"),
    )


@register(
    "events_ohlc_bars",
    """
    WITH b AS (
      SELECT date_trunc('hour', ts) AS bar_hour, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY date_trunc('hour', ts),
                                event_type
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY date_trunc('hour', ts),
                                event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT bar_hour, event_type,
           CAST(min(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT)
             AS open_cents,
           max(cents) AS high_cents,
           min(cents) AS low_cents,
           CAST(min(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT)
             AS close_cents,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM b
    GROUP BY bar_hour, event_type
    """,
    "hourly OHLC bars per event type — the time-series downsampling every "
    "metrics store runs.  Spark computes open/close with min_by/max_by "
    "over a (ts, event_id) ORDER STRUCT in the SAME single "
    "hash-aggregate as high/low/count (one map-side-combining shuffle, "
    "no window, no sort), where the oracle needs two window passes — "
    "the argmin-in-aggregate form is the one that scales.  Integer "
    "cents; (ts, event_id) is a total order so open/close are unique",
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("bar_hour"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.struct("ts", "event_id").alias("ord"),
    )
    return ev.groupBy("bar_hour", "event_type").agg(
        F.min_by("cents", F.col("ord")).cast("long").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max_by("cents", F.col("ord")).cast("long").alias("close_cents"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


@register(
    "events_value_histogram",
    """
    WITH c AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
      WHERE value IS NOT NULL
    ), ext AS (
      SELECT min(cents) AS mn, max(cents) AS mx FROM c
    ), binned AS (
      SELECT event_type, mn, mx,
             CASE WHEN mx > mn
                  THEN least(15, CAST(floor((cents - mn) * 16.0 / (mx - mn))
                                      AS BIGINT))
                  ELSE 0 END AS bin
      FROM c CROSS JOIN ext
    )
    SELECT event_type, CAST(bin AS INT) AS bin,
           CAST(mn + floor(bin * (mx - mn) / 16.0) AS BIGINT) AS lo_cents,
           count(*) AS n
    FROM binned
    GROUP BY event_type, bin, mn, mx
    """,
    "equi-width value histogram per event type: global [min, max] from "
    "ONE tiny aggregate broadcast back (a 1-row cross join, not a "
    "window), then bin = floor((v-min)*16/(max-min)) capped at 15 — a "
    "second map-side-combining aggregate.  Two passes total, both "
    "full-codegen; this is the profiling histogram a catalog computes "
    "per column at scale.  All arithmetic on integer cents; the double "
    "division is exact-floored because numerator and denominator are "
    "exactly-representable integers (< 2^52), so both engines bin "
    "identically",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL values are NOT observations: least(15, NULL) would otherwise
    # count them in the top bin (least skips null operands in BOTH
    # engines); profile_documents reports null fractions separately
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    ext = ev.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    binned = ev.crossJoin(F.broadcast(ext)).withColumn(
        "bin",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.lit(15).cast("long"),
                F.floor(
                    (F.col("cents") - F.col("mn")) * F.lit(16.0)
                    / (F.col("mx") - F.col("mn"))
                ),
            ),
        ).otherwise(F.lit(0).cast("long")),
    )
    return binned.groupBy("event_type", "bin", "mn", "mx").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "event_type",
        F.col("bin").cast("int").alias("bin"),
        (
            F.col("mn")
            + F.floor(F.col("bin") * (F.col("mx") - F.col("mn")) / F.lit(16.0))
        ).cast("long").alias("lo_cents"),
        "n",
    )


@register(
    "corpus_merkle_diff",
    """
    WITH a AS (
      SELECT doc_id % 64 AS bucket,
             count(*) AS old_n,
             CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT)
                  AS BIGINT) AS old_xor
      FROM documents WHERE doc_id % 11 <> 0
      GROUP BY doc_id % 64
    ), b AS (
      SELECT doc_id % 64 AS bucket,
             count(*) AS new_n,
             CAST(bit_xor(('0x' || substr(md5(
                    CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                         ELSE text END), 1, 15))::BIGINT)
                  AS BIGINT) AS new_xor
      FROM documents WHERE doc_id % 13 <> 0
      GROUP BY doc_id % 64
    )
    SELECT coalesce(a.bucket, b.bucket) AS bucket,
           coalesce(a.old_n, 0) AS old_n, coalesce(b.new_n, 0) AS new_n,
           coalesce(a.old_xor, 0) AS old_xor,
           coalesce(b.new_xor, 0) AS new_xor,
           coalesce(a.old_n, 0) <> coalesce(b.new_n, 0)
             OR coalesce(a.old_xor, 0) <> coalesce(b.new_xor, 0) AS dirty
    FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    """,
    "Merkle-bucketed snapshot reconciliation — corpus_diff_docs' scale "
    "path: instead of full-outer-joining every (id, hash) pair, each "
    "snapshot folds into 64 bucket digests (count + order-free bit_xor "
    "of 60-bit content hashes, one map-side-combining aggregate per "
    "side), and only buckets whose digests differ need a row-level "
    "rescan.  At 100 TB the compare touches 64 rows, not 10^11 ids; "
    "dirty buckets bound the expensive pass to changed data.  Same "
    "synthetic snapshots as corpus_diff_docs (old drops id%11=0, new "
    "drops %13=0 and edits %7=0), so the bucket verdicts are "
    "cross-checkable against its row-level statuses",
)
def corpus_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_wide(spark, sf_dir, "documents")

    def digest(side: DataFrame, n_col: str, x_col: str) -> DataFrame:
        h = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast(
            "long"
        )
        return side.groupBy((F.col("doc_id") % 64).alias("bucket")).agg(
            F.count(F.lit(1)).alias(n_col),
            F.bit_xor(h).cast("long").alias(x_col),
        )

    old = digest(docs.filter(F.col("doc_id") % 11 != 0), "old_n", "old_xor")
    new = digest(
        docs.filter(F.col("doc_id") % 13 != 0).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
        ),
        "new_n", "new_xor",
    )
    j = old.join(new.hint("shuffle_hash"), "bucket", "full_outer").select(
        "bucket",
        F.coalesce("old_n", F.lit(0)).alias("old_n"),
        F.coalesce("new_n", F.lit(0)).alias("new_n"),
        F.coalesce("old_xor", F.lit(0).cast("long")).alias("old_xor"),
        F.coalesce("new_xor", F.lit(0).cast("long")).alias("new_xor"),
    )
    return j.withColumn(
        "dirty",
        (F.col("old_n") != F.col("new_n"))
        | (F.col("old_xor") != F.col("new_xor")),
    )


@register(
    "cluster_split_docs",
    _DUCK_MINHASH_CTE.replace("WITH toks", "WITH RECURSIVE toks") + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), sym AS (
      SELECT id_a AS a, id_b AS b FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    ), reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ), clu AS (
      SELECT d.doc_id,
             cast(least(d.doc_id, coalesce(m.mn, d.doc_id)) AS bigint)
               AS cluster
      FROM documents d
      LEFT JOIN (SELECT a, min(b) AS mn FROM reach GROUP BY a) m
        ON d.doc_id = m.a
    )
    SELECT doc_id, cluster,
           CASE WHEN substr(md5('split:' || CAST(cluster AS VARCHAR)), 1, 1)
                     <= 'b' THEN 'train'
                WHEN substr(md5('split:' || CAST(cluster AS VARCHAR)), 1, 1)
                     IN ('c', 'd') THEN 'val'
                ELSE 'test' END AS split
    FROM clu
    """,
    "leakage-free train/val/test split: the split hash is taken over the "
    "near-dup CLUSTER id (connected components of the LSH pair graph), "
    "not the document id, so near-duplicates can never straddle the "
    "train/eval boundary — the contamination mode a doc-level hash split "
    "invites and eval decontamination then has to patch.  75/12.5/12.5 "
    "by the first hex char of md5('split:'||cluster) ('0'-'b' / 'c','d' "
    "/ 'e','f') — deterministic, engine-identical, and stable across "
    "corpus growth for unchanged clusters.  Cost beyond the CC pass the "
    "dedup family already runs: one hash projection, zero extra shuffles",
)
def cluster_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.dedup import dedup_clusters

    docs = _load_wide(spark, sf_dir, "documents")
    clusters = dedup_clusters(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )
    c1 = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("cluster").cast("string"))), 1, 1
    )
    return clusters.select(
        "doc_id", "cluster",
        F.when(c1 <= F.lit("b"), F.lit("train"))
        .when(c1.isin("c", "d"), F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def _label_prop_oracle(rounds: int = 4) -> str:
    """The same synchronous rounds unrolled as chained CTEs (aggregation is
    illegal in a recursive member; the unroll mirrors the Spark loop)."""
    parts = [_DUCK_MINHASH_CTE + """
    , cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ), sym AS (
      SELECT id_a AS node, id_b AS nbr FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    ), l0 AS (
      SELECT doc_id AS node, CAST(doc_id AS BIGINT) AS lbl FROM documents
    )"""]
    for k in range(1, rounds + 1):
        parts.append(f""", v{k} AS (
      SELECT s.node, l.lbl, count(*) AS c
      FROM sym s JOIN l{k - 1} l ON s.nbr = l.node
      GROUP BY s.node, l.lbl
    ), w{k} AS (
      SELECT node, lbl,
             row_number() OVER (PARTITION BY node
                                ORDER BY c DESC, lbl ASC) AS rn
      FROM v{k}
    ), l{k} AS (
      SELECT p.node, coalesce(w.lbl, p.lbl) AS lbl
      FROM l{k - 1} p
      LEFT JOIN (SELECT node, lbl FROM w{k} WHERE rn = 1) w
        ON p.node = w.node
    )""")
    parts.append(f"""
    SELECT node AS doc_id, CAST(lbl AS BIGINT) AS community
    FROM l{rounds}
    """)
    return "".join(parts)


@register(
    "label_prop_docs",
    _label_prop_oracle(4),
    "label-propagation community detection over the document similarity "
    "graph (ops/graph.label_propagation): four SYNCHRONOUS rounds where "
    "each node adopts its neighbors' majority label, ties to the "
    "smallest — deterministic by construction (fixed rounds + total tie "
    "order) where classic LPA randomizes, which is what lets the "
    "unrolled-CTE oracle hash-match.  Communities differ from connected "
    "components: a sparse bridge between two dense near-dup blobs does "
    "NOT merge them under local majority.  Per round: one nbr-keyed "
    "join + one (node,label) count + one max_by reduce — three bounded "
    "shuffles, one label per node of state, lineage truncated on a "
    "stride like pagerank_int",
)
def label_prop_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.dedup import minhash_candidate_pairs
    from ..ops.graph import label_propagation

    docs = _load_wide(spark, sf_dir, "documents")
    # persist the pair list: the symmetrization references it twice (both
    # union directions), so the LSH bucket self-join would otherwise run
    # twice inside label_propagation's edge materialization (guide §7.2)
    cand = minhash_candidate_pairs(
        docs, num_hashes=16, bands=4, sigs=_dedup_stage(spark, sf_dir)
    )
    sym = cand.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        cand.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    return label_propagation(nodes, sym, rounds=4).withColumnRenamed(
        "id", "doc_id"
    )


_shared_sql(
    "orders_pit_priority",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderpriority AS p,
             date_trunc('second', o_orderdate) AS d, o_orderkey AS k,
             lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev
      FROM orders
    ), changes AS (
      SELECT o_custkey, p, d, k FROM ordered
      WHERE prev IS NULL OR p <> prev
    ), scd AS (
      SELECT o_custkey, p AS priority, d AS valid_from,
             lead(d) OVER (
               PARTITION BY o_custkey ORDER BY d, k
             ) AS valid_to
      FROM changes
    ), pit AS (
      SELECT /*+ SHUFFLE_HASH(s) */
             o.o_custkey, o.o_orderpriority AS actual, s.priority AS pit_p
      FROM orders o JOIN scd s
        ON o.o_custkey = s.o_custkey
       AND date_trunc('second', o.o_orderdate) >= s.valid_from
       AND (s.valid_to IS NULL
            OR date_trunc('second', o.o_orderdate) < s.valid_to)
    )
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN actual = pit_p THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pit_correct
    FROM pit
    GROUP BY o_custkey
    """,
    "POINT-IN-TIME join against the SCD2 dimension scd2_customer_priority "
    "builds: each order joins the priority version whose [valid_from, "
    "valid_to) range covers its date — the as-of lookup every "
    "slowly-changing-dimension warehouse runs.  Ranges partition each "
    "customer's timeline (empty [d,d) versions from same-date changes "
    "match nothing), so every order matches EXACTLY one version; "
    "n_pit_correct < n_orders precisely where two same-date orders carry "
    "different priorities — date-granularity PIT cannot distinguish "
    "intra-date order, and the gate pins that honestly rather than "
    "papering over it.  Scale shape: the range condition rides the "
    "custkey EQUI-join (co-partitioned, SHUFFLE_HASH-hinted — a comment "
    "to DuckDB), never a range-only join",
)


@register(
    "events_ab_test",
    """
    WITH assign AS (
      SELECT user_id,
             substr(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 1) < '8'
               AS in_a,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS converted
      FROM events
      GROUP BY user_id
    ), arms AS (
      SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN in_a THEN converted ELSE 0 END) AS BIGINT)
               AS ca,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE converted END) AS BIGINT)
               AS cb
      FROM assign
    ), stats AS (
      SELECT na, nb, ca, cb,
             CASE WHEN na * nb * (ca + cb)
                       * ((na + nb) - (ca + cb)) = 0 THEN NULL
             ELSE ((ca * nb - cb * na) * (ca * nb - cb * na))
                  * CAST(na + nb AS DOUBLE)
                  / (CAST(na AS DOUBLE) * nb * (ca + cb)
                     * ((na + nb) - (ca + cb))) END AS z2_raw,
             CASE WHEN na + nb = 0 THEN NULL
                  ELSE ((na - nb) * (na - nb)) / CAST(na + nb AS DOUBLE)
                  END AS srm_raw
      FROM arms
    )
    SELECT na, nb, ca, cb,
           round(CASE WHEN na = 0 THEN NULL
                 ELSE ca / CAST(na AS DOUBLE) END, 6) AS rate_a,
           round(CASE WHEN nb = 0 THEN NULL
                 ELSE cb / CAST(nb AS DOUBLE) END, 6) AS rate_b,
           round(z2_raw, 6) AS z2,
           CASE WHEN z2_raw IS NULL THEN 'undefined'
                WHEN z2_raw > 3.841459 THEN 'significant'
                ELSE 'not_significant' END AS verdict,
           round(srm_raw, 6) AS srm_chi2,
           CASE WHEN srm_raw > 3.841459 THEN 'srm_suspect'
                ELSE 'srm_ok' END AS srm_verdict
    FROM stats
    """,
    "A/B experiment readout: users hash-split into arms (md5 first hex "
    "char — deterministic, engine-identical, the same assignment a "
    "feature-flag service derives), per-user conversion = any purchase, "
    "then the two-proportion pooled z² test and the sample-ratio-"
    "mismatch chi² guard (an SRM hit means the ASSIGNMENT is broken and "
    "the p-value is meaningless — the first thing a real experiment "
    "platform checks).  One user-keyed aggregate + one 4-integer frame; "
    "the test statistics are arithmetic over exact integer counts "
    "(identical expression text both engines), so determinism holds "
    "without micro-unit scaffolding.  z²>3.841459 == two-sided p<0.05 "
    "at 1 df",
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        (
            F.substring(
                F.md5(F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))),
                1, 1,
            ) < F.lit("8")
        ).alias("in_a"),
        # 'power-buyer' conversion (>= 14 purchases, the per-user median):
        # any-purchase converts EVERY testdata user and the z-test
        # degenerates; this definition splits ~50/50 at every sf
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ) >= 14, 1,
        ).otherwise(0).alias("converted"),
    )
    arms = assign.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("long").alias("nb"),
        F.sum(F.when(F.col("in_a"), F.col("converted")).otherwise(0))
        .cast("long").alias("ca"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(F.col("converted")))
        .cast("long").alias("cb"),
    )
    na, nb, ca, cb = (F.col(c) for c in ("na", "nb", "ca", "cb"))
    diff = ca * nb - cb * na
    pooled = ca + cb
    # degenerate designs (an empty arm, zero or total conversion) have no
    # defined z²: NULL in both engines, never a division error (ANSI)
    defined = (na * nb * pooled * ((na + nb) - pooled)) != 0
    z2 = F.when(
        defined,
        (diff * diff) * (na + nb).cast("double")
        / (na.cast("double") * nb * pooled * ((na + nb) - pooled)),
    )
    srm = F.when(
        (na + nb) > 0, ((na - nb) * (na - nb)) / (na + nb).cast("double")
    )
    return arms.select(
        "na", "nb", "ca", "cb",
        F.round(F.when(na > 0, ca / na.cast("double")), 6).alias("rate_a"),
        F.round(F.when(nb > 0, cb / nb.cast("double")), 6).alias("rate_b"),
        F.round(z2, 6).alias("z2"),
        F.when(z2.isNull(), F.lit("undefined"))
        .when(z2 > F.lit(3.841459), F.lit("significant"))
        .otherwise(F.lit("not_significant")).alias("verdict"),
        F.round(srm, 6).alias("srm_chi2"),
        F.when(srm > F.lit(3.841459), F.lit("srm_suspect"))
        .otherwise(F.lit("srm_ok")).alias("srm_verdict"),
    )


_RRF_K = 60


@register(
    "hybrid_rrf_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {{_DUCK_TOKS}} AS t FROM documents
    ), lens AS (
      SELECT doc_id, t, len(t) AS dl FROM toks WHERE len(t) > 0
    ), stats AS (
      SELECT avg(dl) AS avgdl, count(*) AS n FROM lens
    ), q AS (SELECT unnest(['spark', 'hash', 'window']) AS term),
    tf AS (
      SELECT l.doc_id, l.dl, q.term,
             len(list_filter(l.t, x -> x = q.term)) AS f
      FROM lens l CROSS JOIN q
    ), dfq AS (
      SELECT term, sum(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS nd
      FROM tf GROUP BY term
    ), lex AS (
      SELECT tf.doc_id,
             round(sum(
               ln((s.n - dfq.nd + 0.5) / (dfq.nd + 0.5) + 1.0)
               * (tf.f * ({_BM25_K1} + 1.0))
               / (tf.f + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * tf.dl / s.avgdl))
             ), 6) AS score
      FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN stats s
      WHERE tf.f > 0
      GROUP BY tf.doc_id
    ), lex_r AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM lex
    ), qv AS (
      SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0
    ), sem AS (
      SELECT e.vec_id AS doc_id,
             CASE WHEN sqrt(list_dot_product(qv.v, qv.v))
                       * sqrt(list_dot_product(e.v, e.v)) > 0
                  THEN round(list_dot_product(qv.v, e.v)
                       / (sqrt(list_dot_product(qv.v, qv.v))
                          * sqrt(list_dot_product(e.v, e.v))), 6)
                  ELSE 0.0 END AS score
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            WHERE embedding IS NOT NULL) e
      CROSS JOIN qv
      WHERE e.vec_id <> 0
    ), sem_r AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM sem
    ), fused AS (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             coalesce(1000000 // ({_RRF_K} + l.r), 0)
               + coalesce(1000000 // ({_RRF_K} + s.r), 0) AS rrf_micro,
             l.r AS lex_rank, s.r AS sem_rank
      FROM lex_r l FULL OUTER JOIN sem_r s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
           lex_rank, sem_rank
    FROM fused
    ORDER BY rrf_micro DESC, doc_id
    LIMIT 20
    """.replace("{_DUCK_TOKS}", _DUCK_TOKS),
    "HYBRID retrieval via reciprocal-rank fusion — the modern search "
    "stack's default: the BM25 lexical leg and an embedding-cosine "
    "semantic leg (query = doc 0's vector) are each ranked GLOBALLY "
    "with ops/rank.global_row_number (two-pass range-partitioned — a "
    "corpus-wide ordering with no single-partition window), then fused "
    "as sum of 1e6 div (60 + rank) — integer floor contributions, so "
    "the fusion is exact and order-free and the hash gate needs no "
    "epsilon.  Docs reached by only one leg keep that leg's "
    "contribution (full outer, SHUFFLE_HASH).  RRF's k=60 is the "
    "Cormack et al. constant; rank fusion needs no score calibration "
    "between legs, which is exactly why it is the production default",
)
def hybrid_rrf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.rank import global_row_number

    docs = _load_wide(spark, sf_dir, "documents")
    # persist both score legs: global_row_number reads its input twice
    # (boundary sketch + rank window), and the legs' lineages are the
    # full BM25 pipeline / corpus-wide cosine scan respectively —
    # unpersisted, each corpus pass runs twice (guide §7.2).  Both frames
    # are (doc_id, score) narrow.
    lex = _bm25_scores(spark, docs).persist()
    lex_r = global_row_number(
        lex, [F.col("score").desc(), F.col("doc_id")], "lex_rank",
        part_key=-F.col("score"),
    ).select("doc_id", "lex_rank")

    # semantic leg: cosine vs doc 0's embedding, corpus-wide
    from ..ops.similarity import cosine_sim

    emb = (
        _load_wide(spark, sf_dir, "embeddings")
        # mirror the oracle's IS NOT NULL: a null-embedding doc must get
        # no semantic rank, not a rank at cosine 0.0
        .filter(F.col("embedding").isNotNull())
        .withColumn("v", F.col("embedding").cast("array<double>"))
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sem = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_sim(F.col("qv"), F.col("v")), 6).alias("score"),
        )
        .persist()
    )
    sem_r = global_row_number(
        sem, [F.col("score").desc(), F.col("doc_id")], "sem_rank",
        part_key=-F.col("score"),
    ).select("doc_id", "sem_rank")

    rrf = F.coalesce(
        F.expr(f"1000000 div ({_RRF_K} + lex_rank)"), F.lit(0).cast("long")
    ) + F.coalesce(
        F.expr(f"1000000 div ({_RRF_K} + sem_rank)"), F.lit(0).cast("long")
    )
    return (
        lex_r.join(sem_r.hint("shuffle_hash"), "doc_id", "full_outer")
        .select(
            "doc_id", rrf.cast("long").alias("rrf_micro"),
            "lex_rank", "sem_rank",
        )
        .orderBy(F.col("rrf_micro").desc(), "doc_id")
        .limit(20)
    )


@register(
    "embedding_norms_arrow",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CASE WHEN embedding IS NULL
                     OR len(list_filter(embedding, x -> x IS NULL)) > 0
                THEN NULL
                ELSE CAST(coalesce(list_sum(list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                 AS BIGINT)
                            * CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                   AS BIGINT))), 0)
                     AS BIGINT) END AS sq_norm_micro
    FROM embeddings
    """,
    "micro-quantized squared L2 norms via mapInArrow "
    "(ops/arrow.sq_norms_arrow) — the Arrow-native UDF flavor: batches "
    "stay in Arrow on both edges, the kernel is one flattened numpy pass "
    "over zero-copy buffers (no per-cell pandas objects).  Elements "
    "quantize with the engine-shared floor(x*1e6+0.5) double expression "
    "and sum in int64, so the result is EXACT — this oracle hash-match "
    "plus the JVM-expression-twin equality in tests/test_arrow_ops.py "
    "pin the plumbing (schema contract, offsets, zero-length windows) "
    "that every future Arrow kernel rides on",
)
def embedding_norms_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.arrow import sq_norms_arrow

    return sq_norms_arrow(_load_wide(spark, sf_dir, "embeddings"))


@register(
    "events_sql_udf_rollup",
    """
    SELECT event_type,
           date_trunc('day', ts) AS day,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    """,
    "daily revenue rollup through a SQL-DEFINED FUNCTION (Spark 4 CREATE "
    "FUNCTION ... RETURN): the shared cents() micro-unit convention as a "
    "named, reusable SQL UDF.  Catalyst INLINES the body into the plan — "
    "codegen'd expression, zero UDF-serve cost, no Python boundary "
    "(asserted in tests/test_sql_surface.py: no BatchEvalPython in the "
    "plan) — so teams get the abstraction of a function library at the "
    "price of a macro.  The oracle is the inlined expression, proving "
    "the UDF changes nothing semantically",
)
def events_sql_udf_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cents(v DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(v * 100 + 0.5) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT event_type,
               date_trunc('day', ts) AS day,
               count(*) AS n,
               CAST(sum(cents(value)) AS BIGINT) AS revenue_cents
        FROM events
        GROUP BY event_type, date_trunc('day', ts)
        """
    )


@register(
    "orders_skyline",
    """
    WITH u AS (
      SELECT o_orderkey, o_orderdate,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
      FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT a.o_orderkey, a.o_orderdate, a.price_cents
    FROM u a
    WHERE NOT EXISTS (
      SELECT 1 FROM u b
      WHERE b.price_cents <= a.price_cents
        AND b.o_orderdate >= a.o_orderdate
        AND (b.price_cents < a.price_cents
             OR b.o_orderdate > a.o_orderdate)
    )
    """,
    "Pareto frontier (skyline) of urgent orders — cheapest for how "
    "recent: no other urgent order is both <= price and >= date with one "
    "strict.  The oracle is the textbook NOT EXISTS all-pairs dominance "
    "self-join (quadratic, affordable for DuckDB at sf0.01); the Spark "
    "leg is ops/rank.skyline2d — per-x aggregate + exclusive two-pass "
    "range-bucketed global prefix max + join-back, no all-pairs join and "
    "no single-partition window, so the frontier of 10^9 orders costs "
    "two keyed shuffles.  Prices compare as exact cents (micro-unit "
    "convention), so dominance ties hash identically in both engines",
)
def orders_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.rank import skyline2d

    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_cents"),
        )
    )
    return skyline2d(urgent, "price_cents", "o_orderdate")


